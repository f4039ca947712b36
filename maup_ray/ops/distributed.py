"""Distributed wide-op building blocks: hierarchical union, hot-cell
splitting, distributed holes-of-union / doctor.

* ``union_all_distributed`` — tree-reduce union: geometries are keyed
  by a coarse cell of their bbox center, unioned per cell in
  ``map_groups`` (local arrangement), then the per-cell partial unions
  cascade up parent cells until one group remains. Avoids the
  reference's single O(everything) union_all (repair.py:84) that
  cannot fit one node at 10^12 scale.
* ``with_hot_cell_split`` — skew handling: after keying rows by cell,
  any cell whose row count exceeds ``max_rows`` is re-keyed to child
  cells (finer resolution), repeatedly. The returned key column feeds
  groupby/repartition so no single shuffle partition explodes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import boolean
from ..geom.cells import CellGrid
from ..geom.core import bounds
from ..geom.wkb import decode_polygons, encode_multipolygon

__all__ = [
    "union_all_distributed",
    "with_hot_cell_split",
    "holes_of_union_distributed",
    "crop_to_distributed",
    "expand_to_distributed",
]


def _cell_of_geom_batch(batch, grid: CellGrid, res: int, geometry_col):
    cells = []
    for b in batch[geometry_col]:
        g = decode_polygons(b.as_py())
        minx, miny, maxx, maxy = bounds(g)
        c = grid.cell_of_points(
            np.array([(minx + maxx) * 0.5]), np.array([(miny + maxy) * 0.5]), res
        )[0]
        cells.append(int(c))
    return batch.append_column("cell", pa.array(cells, type=pa.uint64()))


def union_all_distributed(
    ds,
    extent,
    start_res: int = 6,
    geometry_col: str = "geometry",
    driver_limit_bytes: int = 32 << 20,
):
    """Tree-reduce union of a geometry Dataset → MultiPolygon (driver
    gets ONE small geometry at the end; intermediate unions happen in
    parallel per cell, cascading res → res-1 → ... → 0).

    Measured-size switch: after each union level the materialized
    per-cell result is measured, and once it fits under
    ``driver_limit_bytes`` the remaining cascade collapses into one
    driver-side union — each extra groupby level is a full Dataset
    shuffle job whose fixed cost dwarfs the (already tiny) remaining
    union work. Unions shrink fast (interior boundaries vanish), so
    on real inputs only the first level or two run distributed; at
    true corpus scale the cascade keeps going until the measurement
    says otherwise."""
    import ray

    grid = CellGrid(*extent)

    keyed = ds.map_batches(
        lambda b: _cell_of_geom_batch(b, grid, start_res, geometry_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(["cell", geometry_col])

    def union_group(df):
        import pandas as pd

        geoms = [decode_polygons(b) for b in df[geometry_col]]
        u = boolean.union_all(geoms)
        return pd.DataFrame(
            {
                "cell": [int(df["cell"].iloc[0])],
                geometry_col: [encode_multipolygon(u)],
            }
        )

    level = keyed
    for res in range(start_res, 0, -1):
        level = level.groupby("cell").map_groups(union_group).materialize()

        if level.size_bytes() <= driver_limit_bytes:
            tabs = [
                t for t in ray.get(level.to_arrow_refs()) if t.num_rows
            ]
            geoms = [
                decode_polygons(b.as_py())
                for t in tabs
                for b in t[geometry_col]
            ]
            return boolean.union_all(geoms) if len(geoms) > 1 else (
                geoms[0] if geoms else []
            )

        def reparent(batch, res=res):
            cells = batch["cell"].to_numpy().astype(np.uint64)
            parents = grid.parent(cells, 1)
            i = batch.column_names.index("cell")
            return batch.set_column(
                i, "cell", pa.array(parents, type=pa.uint64())
            )

        level = level.map_batches(
            reparent, batch_format="pyarrow", zero_copy_batch=True
        )
    final = level.groupby("cell").map_groups(union_group).to_pandas()
    geoms = [decode_polygons(b) for b in final[geometry_col]]
    return boolean.union_all(geoms) if len(geoms) > 1 else (
        geoms[0] if geoms else []
    )


def holes_of_union_distributed(ds, extent, **kw):
    """Distributed holes-of-union (gaps): tree-reduce union, then
    extract interior rings (small result on the driver)."""
    u = union_all_distributed(ds, extent, **kw)
    return boolean.holes(u)


def doctor_distributed(
    ds,
    extent,
    geometry_col: str = "geometry",
    id_col: str = "id",
    cell_res: int = 8,
    accept_holes: bool = False,
) -> dict:
    """Dataset-scale doctor (ref: repair.py:311-365): overlaps via the
    cell-partitioned adjacency self-join, gaps via tree-reduce union —
    no full materialization of the geometry table on the driver."""
    from .adjacencies import adjacencies

    if not isinstance(ds, pa.Table):
        # two consumers (overlap self-join + gap union) — pin blocks
        # once instead of re-executing the upstream lineage per pass
        ds = ds.materialize()
    adj = adjacencies(
        ds,
        id_col=id_col,
        geometry_col=geometry_col,
        adjacency_type="queen",
        include_geometry=False,
        cell_res=cell_res,
        extent=extent,
    )
    n_overlaps = adj.filter(expr="area > 0").count()
    gaps = holes_of_union_distributed(ds, extent, geometry_col=geometry_col)
    checks = {
        "n_overlaps": n_overlaps,
        "n_gaps": len(gaps),
    }
    checks["ok"] = n_overlaps == 0 and (accept_holes or len(gaps) == 0)
    return checks


def with_hot_cell_split(
    ds,
    extent,
    res: int,
    max_rows: int = 100_000,
    max_extra_levels: int = 4,
    x_col: str = "x",
    y_col: str = "y",
):
    """Attach a skew-resistant ``cell`` key column to a point Dataset.

    Cells over ``max_rows`` are re-keyed at progressively finer
    resolution (children of hot cells only), bounding the largest
    shuffle partition. Returns the keyed Dataset; the hot-cell counts
    come from a cheap count-per-cell aggregate (ids only — no payload
    moves during the probe)."""
    from ray.data.aggregate import Count

    grid = CellGrid(*extent)

    def key_at(batch: pa.Table, res_map=None, base_res=res) -> pa.Table:
        x = batch[x_col].to_numpy()
        y = batch[y_col].to_numpy()
        cells = grid.cell_of_points(x, y, base_res)
        if res_map:
            # res_map is keyed by BASE-res cell ids: look each row's base
            # cell up once and jump straight to its final refined level.
            # (Iteratively re-testing already-refined ids against the
            # base-keyed map made levels >= 2 unreachable — ADVICE r1.)
            levels = np.fromiter(
                (res_map.get(int(c), 0) for c in cells),
                dtype=np.int64,
                count=len(cells),
            )
            if levels.any():
                cells = cells.copy()
                for extra in np.unique(levels[levels > 0]):
                    m = levels == extra
                    cells[m] = grid.cell_of_points(
                        x[m], y[m], base_res + int(extra)
                    )
        if "cell" in batch.column_names:
            i = batch.column_names.index("cell")
            return batch.set_column(
                i, "cell", pa.array(cells, type=pa.uint64())
            )
        return batch.append_column(
            "cell", pa.array(cells, type=pa.uint64())
        )

    # probe pass: count at the FINEST candidate resolution (key columns
    # only — no payload moves), then roll counts up driver-side. The
    # finest-count table is small (occupied cells only) and gives the
    # true per-subtree distribution, so the chosen level actually bounds
    # every descendant partition — a log4(n/max_rows) estimate from
    # base-res counts assumes uniform spread and fails on point masses.
    import pandas as pd

    probe = (
        ds.select_columns([x_col, y_col])
        .map_batches(
            lambda b: key_at(b, None, res + max_extra_levels),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("cell")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    counts_by_extra = {max_extra_levels: probe}
    cur = probe
    for extra in range(max_extra_levels - 1, -1, -1):
        p = grid.parent(cur["cell"].to_numpy().astype(np.uint64), 1)
        cur = (
            pd.DataFrame({"cell": p, "n": cur["n"].to_numpy()})
            .groupby("cell", as_index=False)["n"]
            .sum()
        )
        counts_by_extra[extra] = cur
    base_counts = counts_by_extra[0]
    hot_cells = [
        int(c)
        for c, n in zip(base_counts["cell"], base_counts["n"])
        if n > max_rows
    ]
    res_map: dict[int, int] = {}
    for extra in range(1, max_extra_levels + 1):
        remaining = [c for c in hot_cells if c not in res_map]
        if not remaining:
            break
        df = counts_by_extra[extra]
        anc = grid.parent(df["cell"].to_numpy().astype(np.uint64), extra)
        mx = (
            pd.DataFrame({"b": anc.astype(np.int64), "n": df["n"].to_numpy()})
            .groupby("b")["n"]
            .max()
        )
        for c in remaining:
            # base ids fit in int63 (res<=28 => top bit clear)
            if mx.get(np.uint64(c).astype(np.int64), np.inf) <= max_rows:
                res_map[c] = extra
    for c in hot_cells:  # point masses: best we can do is the finest level
        res_map.setdefault(c, max_extra_levels)
    return ds.map_batches(
        lambda b: key_at(b, res_map),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def crop_to_distributed(
    ds,
    target: pa.Table,
    geometry_col: str = "geometry",
):
    """Dataset-scale crop_to (ref: repair.py:261-280): union(target) is
    computed ONCE on the (small) target table, broadcast via ray.put,
    and every source batch clips against it inside map_batches — no
    shuffle, the geometry column streams. Rows cropped to zero area
    keep an empty geometry (callers count them with a filter; the
    reference's AreaCroppingWarning count is that filter's count)."""
    import ray

    from ..crs import check_same_crs
    from ..geom.wkb import decode_polygons as _dec

    check_same_crs(ds, target)
    tu = boolean.union_all(
        [_dec(b.as_py()) for b in target[geometry_col]]
    )
    tu_ref = ray.put(encode_multipolygon(tu))

    def clip(batch: pa.Table) -> pa.Table:
        from ..geom.core import bounds as _bounds
        from ..geom.wkb import decode_quads_bulk, encode_rings_bulk

        tgt = decode_polygons(ray.get(tu_ref))
        garr = batch[geometry_col]
        if isinstance(garr, pa.ChunkedArray):
            garr = garr.combine_chunks()
        i = batch.column_names.index(geometry_col)
        # rect fast path: when the target union is ONE axis rect and
        # the batch is uniform axis-rect quads, the clip is pure
        # vectorized min/max — no per-row boolean.intersection (the
        # same rect discipline as the adjacency shuffle fast path)
        coords = decode_quads_bulk(garr)
        if coords is not None and len(tgt) == 1 and len(tgt[0]) == 1:
            tr = tgt[0][0]
            dx = tr[[1, 2, 3, 0], 0] - tr[:, 0]
            dy = tr[[1, 2, 3, 0], 1] - tr[:, 1]
            sdx = coords[:, [1, 2, 3, 0], 0] - coords[:, :, 0]
            sdy = coords[:, [1, 2, 3, 0], 1] - coords[:, :, 1]
            if np.all((dx == 0.0) | (dy == 0.0)) and np.all(
                (sdx == 0.0) | (sdy == 0.0)
            ):
                tx0, ty0, tx1, ty1 = _bounds(tgt)
                x0 = np.maximum(coords[:, :, 0].min(axis=1), tx0)
                y0 = np.maximum(coords[:, :, 1].min(axis=1), ty0)
                x1 = np.minimum(coords[:, :, 0].max(axis=1), tx1)
                y1 = np.minimum(coords[:, :, 1].max(axis=1), ty1)
                alive = (x1 > x0) & (y1 > y0)
                n = len(x0)
                P = np.empty((n, 4, 2), dtype=np.float64)
                P[:, 0, 0] = x0
                P[:, 0, 1] = y0
                P[:, 1, 0] = x1
                P[:, 1, 1] = y0
                P[:, 2, 0] = x1
                P[:, 2, 1] = y1
                P[:, 3, 0] = x0
                P[:, 3, 1] = y1
                enc = encode_rings_bulk(
                    P, np.full(n, 4, dtype=np.int64)
                ).to_pylist()
                empty = encode_multipolygon([])
                out = [
                    enc[j] if alive[j] else empty for j in range(n)
                ]
                return batch.set_column(
                    i, geometry_col,
                    pa.array(out, type=pa.binary()),
                )
        out = []
        for b in garr:
            g = decode_polygons(b.as_py())
            out.append(encode_multipolygon(boolean.intersection(g, tgt)))
        return batch.set_column(
            i, geometry_col, pa.array(out, type=pa.binary())
        )

    return ds.map_batches(clip, batch_format="pyarrow", zero_copy_batch=True)


def expand_to_distributed(
    ds,
    target: pa.Table,
    extent,
    geometry_col: str = "geometry",
    id_col: str = "id",
    start_res: int = 6,
):
    """Dataset-scale expand_to (ref: repair.py:283-308):

    1. union(sources) by the tree-reduce distributed union (never
       materializing the source table on the driver),
    2. leftovers = target − union(sources) on the driver (small: the
       target table and the final union are driver-sized),
    3. each leftover absorbs into the source sharing the longest
       boundary: shared lengths are computed DISTRIBUTED (leftovers
       broadcast, one map_batches pass over sources, tiny keyed argmax),
       and the winning rows are patched in a final map_batches.
    """
    import ray

    from ..crs import check_same_crs
    from ..geom.core import ensure_multi
    from ..geom.core import area as _area
    from ..geom.wkb import decode_polygons as _dec

    check_same_crs(ds, target)
    # the source Dataset is consumed THREE times (tree-union, shared-
    # length pass, patch pass) — pin the blocks once or the upstream
    # lineage re-executes per pass (object store spills if needed;
    # same discipline as msf_boruvka's edge pin)
    ds = ds.materialize()
    su = union_all_distributed(
        ds, extent, start_res=start_res, geometry_col=geometry_col
    )
    leftovers = []
    for b in target[geometry_col]:
        d = boolean.difference(_dec(b.as_py()), su)
        for poly in ensure_multi(d):
            if _area([poly]) > 0:
                leftovers.append([poly])
    if not leftovers:
        return ds
    left_ref = ray.put([encode_multipolygon(g) for g in leftovers])

    from .smart_repair import _shared_len as _shared_boundary_len

    def lengths(batch: pa.Table) -> pa.Table:
        from ..geom.core import bounds as _bounds

        lw = [decode_polygons(x) for x in ray.get(left_ref)]
        # bbox prefilter: shared boundary needs touching bboxes; the
        # vectorized test prunes the per-row candidate set from ALL
        # leftovers to the 0-2 that can actually touch (without it the
        # pass is O(sources × leftovers) — a corpus-scale killer)
        lb = np.array([_bounds(g) for g in lw]).reshape(-1, 4)
        ids_out, piece_out, len_out = [], [], []
        for rid, b in zip(
            batch[id_col].to_pylist(), batch[geometry_col]
        ):
            g = decode_polygons(b.as_py())
            gb = _bounds(g)
            cand = np.flatnonzero(
                (lb[:, 0] <= gb[2]) & (lb[:, 2] >= gb[0])
                & (lb[:, 1] <= gb[3]) & (lb[:, 3] >= gb[1])
            )
            for pi in cand:
                ln = _shared_boundary_len(lw[pi], g)
                if ln > 0:
                    ids_out.append(rid)
                    piece_out.append(int(pi))
                    len_out.append(ln)
        return pa.table(
            {
                id_col: pa.array(ids_out, type=batch[id_col].type),
                "piece": pa.array(piece_out, type=pa.int64()),
                "shared_len": pa.array(len_out, type=pa.float64()),
            }
        )

    cand = ds.map_batches(
        lengths, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # tiny: one row per (leftover, touching source)
    if len(cand) == 0:
        return ds
    # argmax per piece, ties to first id in sorted order (absorb parity)
    cand = cand.sort_values(
        ["piece", "shared_len", id_col], ascending=[True, False, True],
        kind="stable",
    )
    winners = cand.drop_duplicates(subset=["piece"])
    assign_map = {}
    for _, row in winners.iterrows():
        assign_map.setdefault(row[id_col], []).append(int(row["piece"]))
    amap_ref = ray.put(assign_map)

    def patch(batch: pa.Table) -> pa.Table:
        amap = ray.get(amap_ref)
        lw = [decode_polygons(x) for x in ray.get(left_ref)]
        out = []
        for rid, b in zip(batch[id_col].to_pylist(), batch[geometry_col]):
            if rid not in amap:
                # non-winners pass through untouched — decode/encode
                # of every row made this pass O(n) geometry codec work
                # for a handful of winners
                out.append(b.as_py())
                continue
            g = decode_polygons(b.as_py())
            for pi in amap.get(rid, ()):
                g = boolean.union(g, lw[pi])
            out.append(encode_multipolygon(g))
        i = batch.column_names.index(geometry_col)
        return batch.set_column(
            i, geometry_col, pa.array(out, type=pa.binary())
        )

    return ds.map_batches(patch, batch_format="pyarrow", zero_copy_batch=True)
