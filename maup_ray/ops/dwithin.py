"""Distance-predicate spatial self-join — all pairs within radius R
(the geo "range join"; the fixed-radius companion to the kNN self-join
in ``ops/knn.py``).

Plan (the standard distributed grid join): with cell size ≥ 2R a
point's R-disk (diameter 2R ≤ cell) intersects at most a 2×2 block of
grid cells, so each
point replicates to ≤ 4 cells (≤ 4× blowup of a 41 B projection — the
payload never moves) with a ``home`` flag on the cell that contains
it. One keyed shuffle on the cell id co-locates every candidate pair,
and each partition runs ONE vectorized home×resident distance pass.

Dedup is structural, not a post-shuffle distinct: pair (a, b) with
id_a < id_b is emitted only where ``a`` is HOME and ``b`` is resident.
b is within R of a, so b's replica set covers a's home cell (b's disk
intersects it) — the pair is found there; the mirrored test in b's
home cell fails id_b < id_a. Exactly one emission, no pair shuffle.

Exactness: with dyadic coordinates (the engine's +0.5-offset integer
lattice) dx, dy are exact integers, d2 = dx²+dy² is an exact int64-
valued double, and R² compares exactly when R is a power of two — the
SQL cross-join oracle matches bit for bit.

Scale notes (100 TB): replication is bounded 4×; a pathological cell
(dense urban core) lands in one partition — split it by choosing a
smaller cell_size (must stay ≥ 2R) or salt + re-merge upstream, the
documented ``hash_group_apply`` skew caveat. Partition count is
bytes-aware (`_choose_partitions`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .shuffle import hash_group_apply

__all__ = ["dwithin_self_join"]


def dwithin_self_join(
    ds,
    radius: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    cell_size: float | None = None,
):
    """All unordered point pairs with squared distance ≤ radius² →
    (id_a, id_b, d2), id_a < id_b. Coordinates must be non-negative
    (grid floor); ``cell_size`` defaults to ``2*radius`` and must be
    ≥ 2*radius for the 2×2 cover argument to hold."""
    cs = float(cell_size if cell_size is not None else 2 * radius)
    if cs < 2 * radius:
        raise ValueError("dwithin: cell_size must be >= 2*radius")
    r2 = float(radius) * float(radius)

    def replicate(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        x = batch[x_col].to_numpy(zero_copy_only=False)
        y = batch[y_col].to_numpy(zero_copy_only=False)
        cxh = np.floor(x / cs).astype(np.int64)
        cyh = np.floor(y / cs).astype(np.int64)
        cx0 = np.floor((x - radius) / cs).astype(np.int64)
        cx1 = np.floor((x + radius) / cs).astype(np.int64)
        cy0 = np.floor((y - radius) / cs).astype(np.int64)
        cy1 = np.floor((y + radius) / cs).astype(np.int64)
        outs = []
        for i, cxi in enumerate((cx0, cx1)):
            for j, cyi in enumerate((cy0, cy1)):
                # skip duplicate combos when the disk spans one col/row
                valid = np.ones(len(ids), dtype=bool)
                if i == 1:
                    valid &= cx1 != cx0
                if j == 1:
                    valid &= cy1 != cy0
                if not valid.any():
                    continue
                sel = np.flatnonzero(valid)
                outs.append(
                    pa.table(
                        {
                            "cellx": pa.array(cxi[sel]),
                            "celly": pa.array(cyi[sel]),
                            "pid": pa.array(ids[sel]),
                            "px": pa.array(x[sel]),
                            "py": pa.array(y[sel]),
                            "home": pa.array(
                                (
                                    (cxi[sel] == cxh[sel])
                                    & (cyi[sel] == cyh[sel])
                                ).astype(np.int8)
                            ),
                        }
                    )
                )
        return pa.concat_tables(outs)

    rep = (
        replicate(ds)
        if isinstance(ds, pa.Table)
        else ds.map_batches(
            replicate, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def pairs_part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
                "d2": pa.array([], type=pa.float64()),
            }
        )
        if tbl is None or len(tbl) == 0:
            return empty
        n = len(tbl)
        ids = tbl["pid"].to_numpy(zero_copy_only=False)
        x = tbl["px"].to_numpy(zero_copy_only=False)
        y = tbl["py"].to_numpy(zero_copy_only=False)
        home = tbl["home"].to_numpy(zero_copy_only=False).astype(bool)
        sizes = np.diff(np.append(starts, n))
        g = len(starts)
        gid = np.repeat(np.arange(g, dtype=np.int64), sizes)
        hrows = np.flatnonzero(home)
        if len(hrows) == 0:
            return empty
        asz = sizes[gid[hrows]]
        total = int(asz.sum())
        rep_h = np.repeat(hrows, asz)
        csum = np.cumsum(asz) - asz
        j = np.arange(total, dtype=np.int64) - np.repeat(csum, asz)
        rep_o = np.repeat(starts[gid[hrows]], asz) + j
        dx = x[rep_h] - x[rep_o]
        dy = y[rep_h] - y[rep_o]
        d2 = dx * dx + dy * dy
        m = (d2 <= r2) & (ids[rep_h] < ids[rep_o])
        return pa.table(
            {
                "id_a": pa.array(ids[rep_h][m]),
                "id_b": pa.array(ids[rep_o][m]),
                "d2": pa.array(d2[m]),
            }
        )

    return hash_group_apply(rep, ["cellx", "celly"], pairs_part)
