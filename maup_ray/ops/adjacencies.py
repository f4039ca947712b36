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
    None when disjoint.

    Areal overlap is subject to the quantization floor: the boolean
    engine snaps to a 2^-30-relative grid, so chained ops on different
    snap grids can leave one-grid-cell-wide slivers along shared
    borders. A piece whose area ≤ tol × perimeter (i.e. its mean width
    is below ~2 grid cells) is below the engine's representational
    resolution and is classified as the shared BOUNDARY it really is,
    matching the reference's everything-on-one-snapped-grid semantics
    (ref repair.py:368-375 counts inters.area > 0 on pre-snapped
    geometry)."""
    polys = intersection(geom_i, geom_j)
    ar = poly_area(polys) if polys else 0.0
    if polys and ar > 0:
        from ..geom.boolean import _default_tol

        tol = _default_tol([geom_i, geom_j])
        per = perimeter(polys)
        if ar <= tol * per:
            polys, ar = [], 0.0
        else:
            # exact verify for SUSPICIOUS slivers. Suspicious = mean
            # width under ~64 grid cells, or area exceeding the
            # isoperimetric bound per²/4π (impossible for simple
            # rings — the stitched result self-intersects). Such a
            # piece is either a GENUINE hairline overlap in the input
            # (Denver 2020 orig: 27 published sub-cell overlaps the
            # snap widens to one grid cell) or a snap-weld ARTIFACT
            # (Denver 2020 repaired: precincts 1310916919/1310916920
            # weld into a 2⁻¹⁰ sq-ft phantom; the reference reports
            # 0). Grid refinement cannot tell them apart — both
            # vanish on a finer grid — so the verdict comes from
            # exact rational predicates on the UN-snapped inputs
            # (geom/exactpred.py): genuine ⇔ proper boundary
            # crossing or strict vertex containment near the sliver.
            suspicious = (
                ar <= 64.0 * tol * per
                or ar > per * per / (4.0 * np.pi)
            )
            if suspicious:
                from ..geom.exactpred import overlap_evidence

                bx = bounds(polys)
                m = 8.0 * tol
                box = (bx[0] - m, bx[1] - m, bx[2] + m, bx[3] + m)
                if not overlap_evidence(geom_i, geom_j, box):
                    polys, ar = [], 0.0
            if ar > 0:
                return encode_multipolygon(polys), per, ar, 2
    lines, pts, ln = boundary_intersection(geom_i, geom_j)
    # the mirror-image failure mode: a GENUINE overlap that is
    # thinner than a snap cell collapses to a shared boundary (or to
    # nothing) on the grid. The same exact predicates recover it —
    # GEOS-parity for ``area > 0`` pair counting on dirty corpora
    # (Denver 2020 orig publishes 27 such hairline overlaps). The
    # reported area/geometry come from a locally refined grid (the
    # true area is sub-cell); synthetic exact-integer corpora never
    # take this branch, so oracled queries are unaffected.
    if lines or len(pts):
        from ..geom.boolean import _default_tol
        from ..geom.exactpred import overlap_evidence

        tol = _default_tol([geom_i, geom_j])
        if lines:
            bx = bounds(lines)
        else:
            bx = (pts[:, 0].min(), pts[:, 1].min(),
                  pts[:, 0].max(), pts[:, 1].max())
        m = 8.0 * tol
        box = (bx[0] - m, bx[1] - m, bx[2] + m, bx[3] + m)
        if overlap_evidence(geom_i, geom_j, box):
            fine = tol / (1 << 20)
            p2 = intersection(geom_i, geom_j, tol=fine)
            a2 = poly_area(p2) if p2 else 0.0
            if p2 and a2 > 0:
                return encode_multipolygon(p2), perimeter(p2), a2, 2
            # below even the refined grid: positive area (one fine
            # cell) so the pair COUNTS as an overlap, but an EMPTY
            # polygon geometry — consumers like resolve_overlaps
            # then subtract nothing, matching the reference's
            # documented "all overlaps may not be resolved" floating-
            # point caveat (ref repair.py:138-141)
            return (
                encode_multipolygon([]),
                ln if lines else 0.0,
                fine * fine,
                2,
            )
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


def _empty_pairs(id_type, include_geometry) -> pa.Table:
    fields = [("id_i", id_type), ("id_j", id_type)]
    if include_geometry:
        fields.append(("geometry", pa.binary()))
    fields += [
        ("length", pa.float64()),
        ("area", pa.float64()),
        ("dim", pa.int8()),
    ]
    return pa.schema(fields).empty_table()


def _rect_ring(bb: np.ndarray) -> list:
    """Reconstruct the axis-rect MultiPolygon from its bbox (rect rows
    ship no WKB payload through the shuffle)."""
    x0, y0, x1, y1 = bb
    return [[np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])]]


def _partitioned_adjacencies(
    ds, id_col, geometry_col, adjacency_type, include_geometry,
    cell_res, extent, concurrency,
):
    """Dataset self-join: replicate rows to covered cells, pair within
    cell groups, dedup straddling pairs by the canonical min-cell.

    100-TB shape (VERDICT r2 #3): the expansion is one vectorized pass
    (bulk quad decode where the column is uniform, np.repeat cell
    ranges, Arrow take), axis-rect rows ship an EMPTY geometry payload
    through the shuffle (the bbox they carry anyway IS the geometry),
    and pairing runs once per hash partition via
    ``ops.shuffle.hash_group_apply`` — single-occupancy cells are
    skipped outright instead of paying per-group dispatch. General
    polygons still replicate their WKB to each covered cell (inherent
    to cell-partitioned pair computation; bounded by sizing cell_res
    to the typical geometry extent)."""
    from ..geom.cells import CellGrid
    from ..geom.wkb import decode_quads_bulk
    from .shuffle import hash_group_apply

    if extent is None:
        from ..synth.districts import EXTENT

        extent = (0.0, 0.0, float(EXTENT))
    grid = CellGrid(*extent)
    n_side = 1 << cell_res
    cw = grid.size / n_side

    def expand(batch: pa.Table) -> pa.Table:
        garr = batch[geometry_col]
        if isinstance(garr, pa.ChunkedArray):
            garr = garr.combine_chunks()
        n = len(batch)
        coords = decode_quads_bulk(garr)
        bb = np.empty((n, 4), dtype=np.float64)
        if coords is not None:
            bb[:, 0] = coords[:, :, 0].min(axis=1)
            bb[:, 1] = coords[:, :, 1].min(axis=1)
            bb[:, 2] = coords[:, :, 0].max(axis=1)
            bb[:, 3] = coords[:, :, 1].max(axis=1)
            dx = coords[:, [1, 2, 3, 0], 0] - coords[:, :, 0]
            dy = coords[:, [1, 2, 3, 0], 1] - coords[:, :, 1]
            is_rect = np.all((dx == 0.0) | (dy == 0.0), axis=1)
        else:
            is_rect = np.zeros(n, dtype=bool)
            for i, b in enumerate(garr):
                g = decode_polygons(b.as_py())
                bb[i] = bounds(g)
                is_rect[i] = _all_axis_rects([g])
        # vectorized covered-cell ranges (same arithmetic as
        # CellGrid.cells_for_bbox)
        cx0 = np.clip((bb[:, 0] - grid.x0) // cw, 0, n_side - 1).astype(np.int64)
        cy0 = np.clip((bb[:, 1] - grid.y0) // cw, 0, n_side - 1).astype(np.int64)
        cx1 = np.clip((bb[:, 2] - grid.x0) // cw, 0, n_side - 1).astype(np.int64)
        cy1 = np.clip((bb[:, 3] - grid.y0) // cw, 0, n_side - 1).astype(np.int64)
        nx = cx1 - cx0 + 1
        counts = nx * (cy1 - cy0 + 1)
        total = int(counts.sum())
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)
        cum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=cum[1:])
        pos = np.arange(total, dtype=np.int64) - cum[:-1][rows]
        ci = cx0[rows] + pos % nx[rows]
        cj = cy0[rows] + pos // nx[rows]
        idx = pa.array(rows)
        geom_masked = pc.if_else(
            pa.array(is_rect),
            pa.scalar(b"", type=pa.binary()),
            garr,
        )
        return pa.table(
            {
                "cell": pa.array(
                    grid.pack(ci, cj, cell_res), type=pa.uint64()
                ),
                id_col: batch[id_col].take(idx),
                geometry_col: geom_masked.take(idx),
                "_minx": pa.array(bb[rows, 0]),
                "_miny": pa.array(bb[rows, 1]),
                "_maxx": pa.array(bb[rows, 2]),
                "_maxy": pa.array(bb[rows, 3]),
            }
        )

    def adj_part(tbl, starts):
        if tbl is None:
            return _empty_pairs(pa.int64(), include_geometry)
        id_type = tbl.schema.field(id_col).type
        if len(starts) == 0:
            return _empty_pairs(id_type, include_geometry)
        cells = tbl["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        garr = tbl[geometry_col].combine_chunks()
        glen = pc.binary_length(garr).to_numpy(zero_copy_only=False)
        bbox = np.stack(
            [tbl[c].to_numpy() for c in ("_minx", "_miny", "_maxx", "_maxy")],
            axis=1,
        )
        ids_np = tbl[id_col].to_numpy(zero_copy_only=False)
        ends = np.append(starts[1:], len(cells))
        sizes = ends - starts
        out_tabs = []
        for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
            cellv = int(cells[s])
            order = np.argsort(ids_np[s:e], kind="stable") + s
            bbs = bbox[order]
            gl = glen[order]

            def canonical_vec(ai, bi, bbs=bbs, cellv=cellv):
                minx = np.maximum(bbs[ai, 0], bbs[bi, 0])
                miny = np.maximum(bbs[ai, 1], bbs[bi, 1])
                c = grid.cell_of_points(minx, miny, cell_res)
                return c.astype(np.int64) == cellv

            ids = list(ids_np[order])
            if not include_geometry and (gl == 0).all():
                # pure-rect cell: metrics from bboxes, zero decode
                tree = BBoxTree(bbs)
                ai, bi = tree.query_bbox(bbs)
                keep = ai < bi
                ai, bi = ai[keep], bi[keep]
                if len(ai):
                    m = canonical_vec(ai, bi)
                    ai, bi = ai[m], bi[m]
                if len(ai) == 0:
                    continue
                out_tabs.append(
                    _rect_pairs_table(
                        ids, bbs, ai, bi, adjacency_type, id_type
                    )
                )
                continue
            geoms = [
                _rect_ring(bbs[j])
                if gl[j] == 0
                else decode_polygons(garr[int(order[j])].as_py())
                for j in range(len(ids))
            ]
            out_tabs.append(
                _pairs_table(
                    ids, geoms, bbs, adjacency_type, include_geometry,
                    id_type, pair_mask_fn=canonical_vec,
                )
            )
        if not out_tabs:
            return _empty_pairs(id_type, include_geometry)
        return pa.concat_tables(out_tabs)

    return hash_group_apply(
        ds.map_batches(
            expand, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["cell"],
        adj_part,
    )


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

    from .shuffle import hash_group_apply

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
    def island_part(tbl, starts):
        if tbl is None:
            return pa.schema([("_pid", pa.int64())]).empty_table()
        if len(starts) == 0:
            return tbl.select(["_pid"])
        flags = tbl["_flag"].to_numpy()
        sums = np.add.reduceat(flags, starts)
        keep = starts[sums == 0]
        return tbl.select(["_pid"]).take(pa.array(keep))

    island_tabs = [
        t
        for t in ray.get(
            hash_group_apply(
                flagged, ["_pid"], island_part, return_refs=True
            )
        )
        if t.num_rows
    ]
    island_arr = (
        pa.concat_tables(island_tabs)["_pid"].combine_chunks()
        if island_tabs
        else pa.array([])
    )
    ref = ray.put(island_arr)

    def keep_islands(batch: pa.Table) -> pa.Table:
        vals = ray.get(ref)
        if len(vals) == 0:
            return batch.slice(0, 0)
        return batch.filter(pc.is_in(batch[id_col], value_set=vals))

    return geoms.map_batches(
        keep_islands, batch_format="pyarrow", zero_copy_batch=True
    )
