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

__all__ = ["compact", "uncompact_table", "morton_key",
           "zorder_partition"]


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


def morton_key(cx: np.ndarray, cy: np.ndarray, res: int) -> np.ndarray:
    """Z-order (Morton) interleave of two ``res``-bit cell coordinates
    → int64 keys whose ascending order is the space-filling curve. Bit
    b of cx lands at position 2b+1, of cy at 2b — the exact unrolled
    shift/mask dag the SQL mirror emits, so keys are bit-identical."""
    cx = cx.astype(np.int64)
    cy = cy.astype(np.int64)
    out = np.zeros(len(cx), dtype=np.int64)
    for b in range(res):
        out |= ((cx >> b) & 1) << (2 * b + 1)
        out |= ((cy >> b) & 1) << (2 * b)
    return out


def zorder_partition(
    ds,
    id_col: str,
    x_col: str = "x",
    y_col: str = "y",
    res: int = 10,
    n_parts: int = 32,
    extent: float | None = None,
):
    """Balanced Z-order range partitioner — the explicit spatial
    partitioning step of the north rule: points → res-bit cell →
    Morton key → EQUAL-COUNT range cut into ``n_parts`` (partition of
    row rank r (1-based) is ``(r−1)·P // n`` — exact integer ntile),
    reported as the partition manifest (part, n_rows, min/max morton
    key) a writer would use for range pruning and a scheduler for
    skew splitting.

    The rank comes from ``ops/window.global_row_number`` — the
    engine's one legitimate total-order sort (sample → range split →
    per-range sort; rows move ONCE). Ranks tie-break on ``id_col`` so
    the cut is deterministic. The manifest is per-block partial
    (part, n, min, max) rows, merged on the driver — O(P·blocks),
    never O(rows)."""
    import ray

    from ..geom.cells import CellGrid
    from .agg import grouped_sums_exact  # noqa: F401 (pattern ref)
    from .window import global_row_number

    if extent is None:
        raise ValueError("zorder_partition: extent required")
    grid = CellGrid(0.0, 0.0, float(extent))

    def key_batch(b: pa.Table) -> pa.Table:
        cells = grid.cell_of_points(
            b[x_col].to_numpy(), b[y_col].to_numpy(), res
        )
        cx, cy, _ = CellGrid.unpack(cells)
        return pa.table(
            {
                id_col: b[id_col],
                "mkey": pa.array(morton_key(cx, cy, res)),
            }
        )

    keyed = ds.map_batches(
        key_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    ranked = global_row_number(keyed, ["mkey", id_col])
    total = ranked.count()
    P = int(n_parts)

    def manifest_part(b: pa.Table) -> pa.Table:
        r = b["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        mk = b["mkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (r - 1) * P // total
        t = pa.table({"part": pa.array(part), "mkey": pa.array(mk)})
        g = t.group_by(["part"], use_threads=False).aggregate(
            [("mkey", "min"), ("mkey", "max"), ([], "count_all")]
        )
        return g.rename_columns(["part", "mkey_min", "mkey_max", "n"])

    parts = ranked.map_batches(
        manifest_part, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = pa.concat_tables(
        [t for t in ray.get(parts.materialize().to_arrow_refs())
         if t.num_rows]
    )
    out = merged.group_by(["part"], use_threads=False).aggregate(
        [("mkey_min", "min"), ("mkey_max", "max"), ("n", "sum")]
    )
    return out.rename_columns(
        ["part", "mkey_min", "mkey_max", "n_rows"]
    ).sort_by("part")
