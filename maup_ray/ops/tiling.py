"""Hierarchical-cell tiling ops — the H3/S2-parity layer over
``geom/cells.py`` (H3 ``compact``/``uncompact`` equivalents; true hex
H3 is not available offline and not semantically required,
SURVEY.md §7.1).

``compact`` turns a corpus-sized set of same-resolution covering
cells into the minimal multi-resolution ancestor set — the standard
trick for shrinking per-region tile inventories (a fully-covered
region stores 1 coarse cell instead of 4^k fine ones) before they are
broadcast as spatial filters or used as partition manifests.

Scale shape: ONE anchor-keyed hash shuffle. Every cell ships with its
resolution-``anchor_res`` ancestor as the partition key, so each hash
partition holds complete r-subtrees and the whole promotion loop
(res R → anchor_res) runs vectorized inside the partition with zero
further communication — completeness of an ancestor above
``anchor_res`` is decidable entirely within its own subtree. The only
cross-partition facts are fully-covered *anchor* subtrees; those
survivors are ≤ 4^anchor_res rows by construction (guarded), so the
final promotion (anchor_res → 0) is a driver-side no-op-sized pass.
Inputs need not be distinct — per-batch dedup runs before the shuffle
so duplicated coverage rows never move.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.cells import MAX_RES, CellGrid, compact_cells

__all__ = ["compact", "uncompact_table"]


def compact(ds, cell_col: str = "cell", anchor_res: int = 3):
    """Distributed H3-style compact over a Dataset (or Table) of
    same-resolution uint64 cell ids → Dataset/Table of the minimal
    ancestor cover, as ``(res, cx, cy)`` int64 columns.

    ``anchor_res`` is the partition resolution: must satisfy
    0 ≤ anchor_res ≤ input res. Survivor cells at exactly
    ``anchor_res`` (fully-covered anchor subtrees, ≤ 4^anchor_res of
    them) finish on the driver."""
    if not 0 <= anchor_res <= MAX_RES:
        raise ValueError("anchor_res out of range")

    def pre(b: pa.Table) -> pa.Table:
        cells = np.unique(b[cell_col].to_numpy().astype(np.uint64))
        res = CellGrid.res_of(cells)
        if len(res) and int(res.min()) < anchor_res:
            raise ValueError(
                "compact: input cells coarser than anchor_res"
            )
        shift = (res - anchor_res).astype(np.uint64)
        code = cells & ((np.uint64(1) << np.uint64(58)) - np.uint64(1))
        anchor = (code >> (np.uint64(2) * shift)) | (
            np.uint64(anchor_res) << np.uint64(58)
        )
        return pa.table(
            {
                "anchor": pa.array(anchor.astype(np.int64)),
                "cell": pa.array(cells.astype(np.int64)),
            }
        )

    def part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        if tbl is None or len(tbl) == 0:
            return pa.schema([("cell", pa.int64())]).empty_table()
        cells = tbl["cell"].to_numpy().astype(np.uint64)
        out = compact_cells(cells, min_res=anchor_res)
        return pa.table({"cell": pa.array(out.astype(np.int64))})

    def to_rcxy(cells: np.ndarray) -> pa.Table:
        cx, cy, res = CellGrid.unpack(cells)
        t = pa.table(
            {
                "res": pa.array(res),
                "cx": pa.array(cx),
                "cy": pa.array(cy),
            }
        )
        return t.combine_chunks().sort_by(
            [("res", "ascending"), ("cx", "ascending"),
             ("cy", "ascending")]
        )

    if isinstance(ds, pa.Table):
        cells = np.unique(ds[cell_col].to_numpy().astype(np.uint64))
        return to_rcxy(compact_cells(cells))

    from .shuffle import hash_group_apply

    pre_ds = ds.map_batches(
        pre, batch_format="pyarrow", zero_copy_batch=True
    )
    compacted = hash_group_apply(pre_ds, ["anchor"], part)

    def split_final(b: pa.Table) -> pa.Table:
        cells = b["cell"].to_numpy().astype(np.uint64)
        res = CellGrid.res_of(cells)
        return to_rcxy(cells[res > anchor_res])

    def anchors_only(b: pa.Table) -> pa.Table:
        cells = b["cell"].to_numpy().astype(np.uint64)
        res = CellGrid.res_of(cells)
        return pa.table(
            {"cell": pa.array(cells[res == anchor_res].astype(np.int64))}
        )

    # blocks of `compacted` are object-store-resident partition outputs
    # (hash_group_apply materializes), so consuming them twice below
    # does NOT recompute the shuffle.
    final_ds = compacted.map_batches(
        split_final, batch_format="pyarrow", zero_copy_batch=True
    )
    top = compacted.map_batches(
        anchors_only, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # ≤ 4^anchor_res rows by construction
    if len(top) > (1 << (2 * anchor_res)):
        raise AssertionError("compact: anchor survivor bound violated")
    if top:
        import ray.data

        top_cells = np.array(
            [r["cell"] for r in top], dtype=np.int64
        ).astype(np.uint64)
        topped = compact_cells(top_cells, min_res=0)
        final_ds = final_ds.union(
            ray.data.from_arrow(to_rcxy(topped))
        )
    return final_ds


def uncompact_table(tbl: pa.Table, res: int) -> pa.Table:
    """Inverse of :func:`compact` for a (small) ``(res, cx, cy)``
    table: expand every cell back to resolution ``res`` →
    ``(cx, cy)`` sorted. Driver-local (the compacted set is the small
    artifact; the expansion is for tests / manifest enumeration)."""
    from ..geom.cells import children

    g_res = tbl["res"].to_numpy().astype(np.int64)
    if np.any(g_res > res):
        raise ValueError("uncompact: cell finer than target res")
    grid = CellGrid(0, 0, 1)  # pack/unpack are extent-independent
    cur = grid.pack(
        tbl["cx"].to_numpy().astype(np.int64),
        tbl["cy"].to_numpy().astype(np.int64),
        0,
    )
    # re-pack with true resolutions
    cur = (
        (cur & ((np.uint64(1) << np.uint64(58)) - np.uint64(1)))
        | (g_res.astype(np.uint64) << np.uint64(58))
    )
    done = []
    while len(cur):
        r = CellGrid.res_of(cur)
        done.append(cur[r == res])
        todo = cur[r < res]
        cur = (
            children(todo).ravel()
            if len(todo)
            else np.array([], dtype=np.uint64)
        )
    allc = np.sort(np.concatenate(done)) if done else cur
    cx, cy, _ = CellGrid.unpack(allc)
    out = pa.table({"cx": pa.array(cx), "cy": pa.array(cy)})
    return out.combine_chunks().sort_by(
        [("cx", "ascending"), ("cy", "ascending")]
    )
