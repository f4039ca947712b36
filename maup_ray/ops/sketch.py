"""HyperLogLog approximate COUNT DISTINCT — the sketch path for
cardinalities where the exact pair-shuffle (`ops/curate.count_distinct`)
is overkill: one streaming pass, O(2^p) bytes per (column × block)
partial, NO shuffle at all.

Algorithm: standard 64-bit HLL (Flajolet et al. 2007 AofA paper /
Heule et al. 2013 "HyperLogLog in Practice", both public): per row,
a splitmix-avalanched 64-bit hash (the ops/shuffle key-hash kernel —
polars xxhash for strings, run-stable) splits into a p-bit register
index and a (64-p)-bit suffix whose leading-zero count feeds a
register max. Partials are the registers themselves, merged with an
elementwise max (associative + commutative ⇒ partition-invariant and
DETERMINISTIC: the estimate is a pure function of the input VALUE SET
for a fixed run's hash seed — duplicates and block structure cannot
change any register).

Estimator: raw alpha·m²/Σ2^-M with the small-range linear-counting
correction (E ≤ 2.5m and empty registers present). The 64-bit hash
makes the classic large-range correction unnecessary (Heule et al.
§4). Expected relative error ≈ 1.04/√m ≈ 0.8% at the default p=14
(16 KiB per partial).

At 100 TB this is the right shape for dashboard/profile cardinalities:
the exact operator moves one (group,value)-pair row per distinct pair
through a shuffle; this moves 16 KiB per block and touches nothing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .shuffle import _hash_keys

__all__ = ["hll_partial", "hll_merge", "hll_estimate", "approx_distinct"]


def _clz64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros for uint64 (no float log2 —
    values above 2^53 round and can misreport the top bit position)."""
    x = x.copy()
    lz = np.zeros(len(x), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        top_clear = x < (np.uint64(1) << np.uint64(64 - s))
        lz[top_clear] += s
        x[top_clear] <<= np.uint64(s)
    # x == 0 accumulates 63 above; true clz(0) = 64
    lz[x == 0] = 64
    return lz


def hll_partial(tbl: pa.Table, col: str, p: int = 14) -> np.ndarray:
    """One block's registers (uint8[2^p]) for ``col``. Nulls are
    skipped (SQL COUNT DISTINCT semantics)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    column = tbl[col]
    if isinstance(column, pa.ChunkedArray):
        column = column.combine_chunks()
    if column.null_count:
        tbl = tbl.filter(column.is_valid())
    if tbl.num_rows == 0:
        return regs
    h = _hash_keys(tbl, [col])
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)
    rho = np.where(w == 0, 64 - p + 1, _clz64(w) + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(parts) -> np.ndarray:
    out = None
    for r in parts:
        out = r.copy() if out is None else np.maximum(out, r)
    return out


def hll_estimate(regs: np.ndarray) -> int:
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    E = alpha * m * m / float(np.sum(np.ldexp(1.0, -regs.astype(np.int64))))
    if E <= 2.5 * m:
        V = int(np.count_nonzero(regs == 0))
        if V > 0:
            E = m * np.log(m / float(V))
    return int(round(E))


def approx_distinct(ds, cols, p: int = 14) -> pa.Table:
    """→ (column, approx_distinct) — one streaming pass computes every
    column's sketch; per block only len(cols) × 2^p register bytes
    reach the driver."""
    cols = list(cols)

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "column": pa.array(cols, type=pa.string()),
                "regs": pa.array(
                    [hll_partial(batch, c, p).tobytes() for c in cols],
                    type=pa.binary(),
                ),
            }
        )

    if isinstance(ds, pa.Table):
        rows = partial(ds).to_pylist()
    else:
        rows = ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
    merged = {c: np.zeros(1 << p, dtype=np.uint8) for c in cols}
    for r in rows:
        np.maximum(
            merged[r["column"]],
            np.frombuffer(r["regs"], dtype=np.uint8),
            out=merged[r["column"]],
        )
    return pa.table(
        {
            "column": pa.array(cols, type=pa.string()),
            "approx_distinct": pa.array(
                [hll_estimate(merged[c]) for c in cols],
                type=pa.int64(),
            ),
        }
    )
