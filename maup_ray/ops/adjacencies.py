"""adjacencies — pairwise boundary-intersection self-join
(ref: adjacencies.py:18-97).

Output rows (id_i, id_j, [geometry], length, area, dim) with
``id_i < id_j`` (ref :22). ``length`` follows the reference's
GeoSeries.length semantics: perimeter for positive-area overlap pieces,
line length for shared edges, 0 for point touches — so
rook = ``length > 0`` (ref :68-69) and overlaps = ``area > 0``
(ref :71-79, count_overlaps repair.py:368-375).

Two physical plans:
* pa.Table input → local bbox-tree self-join (small side, e.g. the
  broadcast district table).
* Dataset input → cell-partitioned self-join: each geometry is
  replicated to the fixed-resolution cells its bbox covers
  (flat-map shape), pairs are computed inside ``groupby(cell)``
  groups, and a pair straddling several shared cells is emitted only
  in the canonical cell (the cell containing the pair's bbox-overlap
  min corner) — the min-cell dedup rule from SURVEY.md §2 op 8.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..geom.boolean import boundary_intersection, intersection
from ..geom.core import area as poly_area
from ..geom.core import bounds, perimeter
from ..geom.strtree import BBoxTree
from ..geom.wkb import (
    decode_polygons,
    encode_lines,
    encode_multipolygon,
    encode_points,
)

__all__ = ["adjacencies", "count_overlaps", "islands"]

DEFAULT_CELL_RES = 8


def _pair_rows(geom_i, geom_j):
    """(wkb_or_None, length, area, dim) of the pair intersection, or
    None when disjoint."""
    polys = intersection(geom_i, geom_j)
    ar = poly_area(polys) if polys else 0.0
    if polys and ar > 0:
        return encode_multipolygon(polys), perimeter(polys), ar, 2
    lines, pts, ln = boundary_intersection(geom_i, geom_j)
    if lines:
        return encode_lines(lines), ln, 0.0, 1
    if len(pts):
        return encode_points(pts), 0.0, 0.0, 0
    return None


def _all_axis_rects(geoms) -> bool:
    """True when every geometry is a single 4-vertex axis-aligned ring
    (each edge horizontal or vertical) — the bbox IS the geometry."""
    for g in geoms:
        if len(g) != 1 or len(g[0]) != 1:
            return False
        r = g[0][0]
        if len(r) != 4:
            return False
        d = np.roll(r, -1, axis=0) - r
        if not bool(np.all((d[:, 0] == 0.0) | (d[:, 1] == 0.0))):
            return False
    return True


def _rect_pairs_table(ids, bboxes, ai, bi, adjacency_type, id_type):
    """Vectorized pair metrics for axis-aligned rects: the SAME
    greatest/least expressions as the SQL oracle (and as the scalar
    clip produces), no per-pair Python."""
    A, B = bboxes[ai], bboxes[bi]
    w = np.minimum(A[:, 2], B[:, 2]) - np.maximum(A[:, 0], B[:, 0])
    h = np.minimum(A[:, 3], B[:, 3]) - np.maximum(A[:, 1], B[:, 1])
    touch = (w >= 0) & (h >= 0)
    dim2 = (w > 0) & (h > 0)
    dim1 = touch & ~dim2 & ((w > 0) | (h > 0))
    area = np.where(dim2, w * h, 0.0)
    length = np.where(
        dim2, 2 * (w + h), np.where(dim1, np.maximum(w, h), 0.0)
    )
    dim = np.where(dim2, 2, np.where(dim1, 1, 0)).astype(np.int8)
    keep = touch if adjacency_type == "queen" else (touch & (length > 0))
    ai, bi = ai[keep], bi[keep]
    ids_arr = np.asarray(ids, dtype=object)
    return pa.table(
        {
            "id_i": pa.array(list(ids_arr[ai]), type=id_type),
            "id_j": pa.array(list(ids_arr[bi]), type=id_type),
            "length": pa.array(length[keep]),
            "area": pa.array(area[keep]),
            "dim": pa.array(dim[keep], type=pa.int8()),
        }
    )


def _pairs_table(
    ids, geoms, bboxes, adjacency_type, include_geometry, id_type,
    pair_mask_fn=None,
):
    tree = BBoxTree(bboxes)
    ai, bi = tree.query_bbox(bboxes)
    keep = ai < bi
    ai, bi = ai[keep], bi[keep]
    if pair_mask_fn is not None and len(ai):
        m = pair_mask_fn(ai, bi)
        ai, bi = ai[m], bi[m]
    if not include_geometry and len(ai) and _all_axis_rects(geoms):
        return _rect_pairs_table(
            ids, bboxes, ai, bi, adjacency_type, id_type
        )
    out = {"id_i": [], "id_j": [], "geometry": [], "length": [], "area": [], "dim": []}
    for i, j in zip(ai, bi):
        r = _pair_rows(geoms[i], geoms[j])
        if r is None:
            continue
        wkb, ln, ar, dim = r
        if adjacency_type == "rook" and ln <= 0:
            continue
        out["id_i"].append(ids[i])
        out["id_j"].append(ids[j])
        out["geometry"].append(wkb)
        out["length"].append(ln)
        out["area"].append(ar)
        out["dim"].append(dim)
    cols = {
        "id_i": pa.array(out["id_i"], type=id_type),
        "id_j": pa.array(out["id_j"], type=id_type),
    }
    if include_geometry:
        cols["geometry"] = pa.array(out["geometry"], type=pa.binary())
    cols["length"] = pa.array(out["length"], type=pa.float64())
    cols["area"] = pa.array(out["area"], type=pa.float64())
    cols["dim"] = pa.array(out["dim"], type=pa.int8())
    return pa.table(cols)


def _local_adjacencies(
    table: pa.Table, id_col, geometry_col, adjacency_type, include_geometry
):
    order = pa.compute.sort_indices(table[id_col])
    table = table.take(order)
    ids = table[id_col].to_pylist()
    geoms = [decode_polygons(b.as_py()) for b in table[geometry_col]]
    bboxes = np.array([bounds(g) for g in geoms]).reshape(-1, 4)
    return _pairs_table(
        ids, geoms, bboxes, adjacency_type, include_geometry,
        table[id_col].type,
    )


def adjacencies(
    geoms,
    *,
    id_col: str = "id",
    geometry_col: str = "geometry",
    adjacency_type: str = "rook",
    include_geometry: bool = True,
    cell_res: int = DEFAULT_CELL_RES,
    extent=None,
    concurrency: int = 8,
):
    if adjacency_type not in ("rook", "queen"):
        raise ValueError("adjacency_type must be 'rook' or 'queen'")
    if isinstance(geoms, pa.Table):
        return _local_adjacencies(
            geoms, id_col, geometry_col, adjacency_type, include_geometry
        )
    return _partitioned_adjacencies(
        geoms, id_col, geometry_col, adjacency_type, include_geometry,
        cell_res, extent, concurrency,
    )


def _partitioned_adjacencies(
    ds, id_col, geometry_col, adjacency_type, include_geometry,
    cell_res, extent, concurrency,
):
    """Dataset self-join: replicate rows to covered cells, pair within
    cell groups, dedup straddling pairs by the canonical min-cell."""
    from ..geom.cells import CellGrid

    if extent is None:
        from ..synth.districts import EXTENT

        extent = (0.0, 0.0, float(EXTENT))
    grid = CellGrid(*extent)

    def expand(batch: pa.Table) -> pa.Table:
        rows = {"cell": [], id_col: [], geometry_col: [], "_minx": [], "_miny": []}
        for rid, g in zip(batch[id_col].to_pylist(), batch[geometry_col]):
            wkb = g.as_py()
            bb = bounds(decode_polygons(wkb))
            cells = grid.cells_for_bbox(*bb, cell_res)
            for c in cells:
                rows["cell"].append(int(c))
                rows[id_col].append(rid)
                rows[geometry_col].append(wkb)
                rows["_minx"].append(bb[0])
                rows["_miny"].append(bb[1])
        return pa.table(
            {
                "cell": pa.array(rows["cell"], type=pa.uint64()),
                id_col: pa.array(rows[id_col], type=batch[id_col].type),
                geometry_col: pa.array(rows[geometry_col], type=pa.binary()),
                "_minx": pa.array(rows["_minx"], type=pa.float64()),
                "_miny": pa.array(rows["_miny"], type=pa.float64()),
            }
        )

    id_type_holder = {}

    def per_cell(df):
        # pandas group (map_groups default); rebuild arrow
        cell = int(df["cell"].iloc[0])
        ids = df[id_col].tolist()
        geoms = [decode_polygons(b) for b in df[geometry_col]]
        bboxes = np.array([bounds(g) for g in geoms]).reshape(-1, 4)
        order = np.argsort(np.asarray(ids, dtype=object), kind="stable")
        ids = [ids[i] for i in order]
        geoms = [geoms[i] for i in order]
        bboxes = bboxes[order]

        def canonical_vec(ai, bi):
            minx = np.maximum(bboxes[ai, 0], bboxes[bi, 0])
            miny = np.maximum(bboxes[ai, 1], bboxes[bi, 1])
            c = grid.cell_of_points(minx, miny, cell_res)
            return c.astype(np.int64) == cell

        id_type = pa.string() if isinstance(ids[0], str) else pa.int64()
        tbl = _pairs_table(
            ids, geoms, bboxes, adjacency_type, include_geometry, id_type,
            pair_mask_fn=canonical_vec,
        )
        return tbl.to_pandas()

    return ds.map_batches(
        expand, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("cell").map_groups(per_cell)


def count_overlaps(geoms, **kw) -> int:
    """ref: repair.py:368-375."""
    adj = adjacencies(geoms, include_geometry=False, adjacency_type="queen", **kw)
    if isinstance(adj, pa.Table):
        return int(
            pa.compute.sum(
                pa.compute.greater(adj["area"], 0.0).cast(pa.int64())
            ).as_py()
            or 0
        )
    return adj.filter(expr="area > 0").count()


def islands(geoms, adj=None, id_col: str = "id", **kw):
    """Ids participating in no adjacency pair (ref: adjacencies.py:81-94).
    Anti-join of ids against ids-in-pairs."""
    if adj is None:
        adj = adjacencies(geoms, include_geometry=False, **kw)
    if isinstance(geoms, pa.Table):
        in_pairs = set(adj["id_i"].to_pylist()) | set(adj["id_j"].to_pylist())
        mask = [i not in in_pairs for i in geoms[id_col].to_pylist()]
        return geoms.filter(pa.array(mask))
    # Dataset path — hash anti-join on id. Islands are RARE, so the
    # id-universe side of the anti-join must never land on the driver:
    # shuffle only 8-byte ids + an int flag (per-batch pre-deduped),
    # reduce with a keyed Sum (scalar agg — Ray's Unique agg crashes on
    # ndarray accumulators at high block counts, CORRECTNESS_r02), and
    # broadcast only the SMALL island id set for the final geometry
    # filter (pc.is_in, no Python loop).
    import ray
    from ray.data.aggregate import Sum

    def geom_ids(b: pa.Table) -> pa.Table:
        ids = pc.unique(b[id_col].combine_chunks())
        return pa.table(
            {
                "_pid": ids,
                "_flag": pa.array(
                    np.zeros(len(ids), dtype=np.int64)
                ),
            }
        )

    def pair_ids(b: pa.Table) -> pa.Table:
        ids = pc.unique(
            pa.concat_arrays(
                [b["id_i"].combine_chunks(), b["id_j"].combine_chunks()]
            )
        )
        return pa.table(
            {
                "_pid": ids,
                "_flag": pa.array(np.ones(len(ids), dtype=np.int64)),
            }
        )

    flagged = geoms.map_batches(
        geom_ids, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        adj.map_batches(
            pair_ids, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    island_rows = (
        flagged.groupby("_pid")
        .aggregate(Sum(on="_flag", alias_name="_flag"))
        .filter(expr="_flag == 0")
        .take_all()
    )
    island_arr = pa.array([r["_pid"] for r in island_rows])
    ref = ray.put(island_arr)

    def keep_islands(batch: pa.Table) -> pa.Table:
        vals = ray.get(ref)
        if len(vals) == 0:
            return batch.slice(0, 0)
        return batch.filter(pc.is_in(batch[id_col], value_set=vals))

    return geoms.map_batches(
        keep_islands, batch_format="pyarrow", zero_copy_batch=True
    )
