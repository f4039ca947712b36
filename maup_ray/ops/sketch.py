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
import pyarrow.compute as pc

from .shuffle import _hash_keys

__all__ = [
    "hll_partial",
    "hll_merge",
    "hll_estimate",
    "approx_distinct",
    "histogram_quantiles",
]


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


# ------------------------------------------------- histogram quantiles


def histogram_quantiles(
    ds,
    key: str,
    value_col: str,
    qs: tuple[tuple[int, int], ...] = ((1, 4), (1, 2), (9, 10),
                                       (99, 100)),
    q_names: tuple[str, ...] = ("p25", "p50", "p90", "p99"),
    bins: int = 65536,
) -> pa.Table:
    """Grouped APPROXIMATE quantiles for continuous domains — the
    100-TB complement to ``ops/curate.grouped_quantiles`` (whose
    distinct-value histogram is exact but degenerates when every
    value is unique, e.g. doubles).

    Two streaming passes, both mergeable with EXACT arithmetic so the
    result is deterministic and partition-invariant (and therefore
    SQL-oracle-able despite being approximate): pass 1 reduces exact
    per-group (min, max, n); pass 2 bins every value into
    ``floor((x−lo)/(hi−lo)·B)`` (clamped to B−1) and reduces sparse
    integer (key, bin, cnt) partials through one key-hash exchange.
    Each quantile is the lower edge of the first bin whose cumulative
    count reaches ``ceil(q·n)`` (integer-rational threshold — never
    float ceil): value error ≤ (hi−lo)/B per group, rank error
    unbounded only if a single bin concentrates mass (the honest
    histogram-sketch caveat; raise ``bins`` or use the exact op).

    ``key`` cardinality must be dimension-sized: the per-group
    (lo, hi, n) table is driver-merged and shipped in the pass-2
    closure. ``qs`` are integer rationals (num, den), one ``q_names``
    column each."""
    import ray
    import ray.data

    from .shuffle import hash_group_apply

    if len(qs) != len(q_names):
        raise ValueError("histogram_quantiles: qs/q_names mismatch")
    if isinstance(ds, pa.Table):
        ds = ray.data.from_arrow(ds)
    B = int(bins)

    def mm_partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key, value_col])
        v = t[value_col]
        valid = pc.is_valid(v)
        if not pc.all(valid).as_py():
            t = t.filter(valid)
        g = t.group_by([key], use_threads=False).aggregate(
            [(value_col, "min"), (value_col, "max"),
             (value_col, "count")]
        )
        # Arrow group_by column order is not keys-first: map by NAME
        return pa.table(
            {
                key: g[key],
                "lo": g[f"{value_col}_min"],
                "hi": g[f"{value_col}_max"],
                "n": pc.cast(g[f"{value_col}_count"], pa.int64()),
            }
        )

    parts = []
    mapped = ds.map_batches(
        mm_partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    for r in mapped.to_arrow_refs():
        t = ray.get(r)
        if t.num_columns and t.num_rows:
            parts.append(t)
    if not parts:
        raise ValueError("histogram_quantiles: empty input")
    g = (
        pa.concat_tables(parts)
        .group_by([key], use_threads=False)
        .aggregate([("lo", "min"), ("hi", "max"), ("n", "sum")])
    )
    mm = pa.table(
        {
            key: g[key],
            "lo": g["lo_min"],
            "hi": g["hi_max"],
            "n": pc.cast(g["n_sum"], pa.int64()),
        }
    ).sort_by(key)
    keys_arr = mm[key].combine_chunks()
    lo = mm["lo"].to_numpy(zero_copy_only=False)
    hi = mm["hi"].to_numpy(zero_copy_only=False)
    nn = mm["n"].to_numpy(zero_copy_only=False).astype(np.int64)

    def bin_partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key, value_col])
        v = t[value_col]
        valid = pc.is_valid(v)
        if not pc.all(valid).as_py():
            t = t.filter(valid)
        kidx = pc.index_in(t[key], value_set=keys_arr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        x = t[value_col].to_numpy(zero_copy_only=False)
        l, h = lo[kidx], hi[kidx]
        span = h - l
        with np.errstate(divide="ignore", invalid="ignore"):
            raw = np.floor((x - l) / span * float(B))
        b = np.where(span > 0,
                     np.minimum(raw, float(B - 1)), 0.0).astype(np.int64)
        g = (
            pa.table({key: t[key], "bin": pa.array(b)})
            .group_by([key, "bin"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                key: g[key],
                "bin": g["bin"],
                "cnt": pc.cast(g["count_all"], pa.int64()),
            }
        )

    lo_by, hi_by, n_by = {}, {}, {}
    for i, k in enumerate(keys_arr.to_pylist()):
        lo_by[k], hi_by[k], n_by[k] = float(lo[i]), float(hi[i]), int(nn[i])

    out_fields = [(key, mm.schema.field(key).type)] + [
        (nm, pa.float64()) for nm in q_names
    ] + [("n", pa.int64())]

    def reduce_part(tbl: pa.Table | None, starts) -> pa.Table:
        schema = pa.schema(out_fields)
        if tbl is None or tbl.num_rows == 0:
            return schema.empty_table()
        starts = np.asarray(starts, dtype=np.int64)
        ntot = tbl.num_rows
        bvals = tbl["bin"].to_numpy(zero_copy_only=False)
        cvals = tbl["cnt"].to_numpy(zero_copy_only=False)
        rows = {key: [], "n": []}
        for nm in q_names:
            rows[nm] = []
        ends = np.r_[starts[1:], ntot]
        kk = tbl[key].take(pa.array(starts)).to_pylist()
        for s, e, k in zip(starts, ends, kk):
            bs, cs = bvals[s:e], cvals[s:e]
            # duplicate bins from different blocks: combine (sorted
            # by bin via sort_cols)
            chg = np.r_[True, bs[1:] != bs[:-1]]
            ub = bs[chg]
            uc = np.add.reduceat(cs, np.flatnonzero(chg))
            cum = np.cumsum(uc)
            l, h, n = lo_by[k], hi_by[k], n_by[k]
            rows[key].append(k)
            rows["n"].append(n)
            width = (h - l) / float(B)
            for (num, den), nm in zip(qs, q_names):
                if h <= l:
                    rows[nm].append(l)
                    continue
                t_rank = (num * n + den - 1) // den
                j = int(np.searchsorted(cum, t_rank))
                rows[nm].append(l + float(ub[j]) * width)
        return pa.table(
            {n: pa.array(v, type=dict(out_fields)[n])
             for n, v in rows.items()}
        )

    partials = ds.map_batches(
        bin_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    out = hash_group_apply(partials, [key], reduce_part,
                           sort_cols=["bin"])
    tabs = [
        t for t in (ray.get(r) for r in
                    out.materialize().to_arrow_refs())
        if t.num_columns and t.num_rows
    ]
    if not tabs:
        return pa.schema(out_fields).empty_table()
    return pa.concat_tables(tabs).combine_chunks().sort_by(key)


# --------------------------------------------------- count-min sketch

CMS_PRIME = 2147483647  # 2^31 − 1 (Mersenne; universal-hash modulus)
# multipliers deliberately LARGE (≈ P): with a small multiplier and
# small keys, a·x + b never wraps past P, the mod-P is the identity,
# and bucket = (a·x + b) mod w stays LINEAR in x — every pair of keys
# congruent mod w then collides in ALL rows (observed: 500× overcount
# on small-id streams). A multiplier ≥ P/2 wraps from x = 2 on, which
# is what the Carter–Wegman argument actually relies on.
CMS_HASHES = (
    (1103515245, 12345),
    (1588635695, 7919),
    (2027839751, 104729),
    (1754129665, 65537),
)


def _cms_bucket(keys: np.ndarray, a: int, b: int, w: int) -> np.ndarray:
    """((a·key + b) mod P) mod w — exact int64 (key in [0, 2^31):
    a·key < 2^62, mirrored verbatim by the oracle's BIGINT %)."""
    return ((keys * np.int64(a) + np.int64(b)) % np.int64(CMS_PRIME)) % np.int64(w)


def count_min(ds, key_col: str, w: int = 256, d: int | None = None):
    """Count-min sketch of an int64 key column — the bounded-memory
    frequency summary (Cormode & Muthukrishnan 2005): d×w int64
    counters, estimate(k) = min_i C[i, h_i(k)] ≥ true count, with the
    classic ε = e/w overcount bound.

    Deterministic and PARTITION-INVARIANT by construction: counters
    are exact integer sums (order-independent), the d affine-mod hash
    rows are fixed constants — so the whole sketch, and every
    estimate, is a pure function of the input multiset and mirrors a
    SQL oracle exactly (the approx_percentiles discipline: a sketch,
    but a bit-reproducible one).

    Scale shape: per batch, one np.unique pre-combine + d scatter-adds
    emit ≤ d·distinct sparse (i, bkt, c) partial rows; a driver merge
    bounded by d·w finishes. No shuffle of the input.

    Returns the dense (d, w) int64 counter matrix."""
    from .agg import grouped_sum_count

    hashes = CMS_HASHES[: (d or len(CMS_HASHES))]

    def partial(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(keys, return_counts=True)
        rows, bkts, cs = [], [], []
        for i, (a, bb) in enumerate(hashes):
            bkt = _cms_bucket(uniq, a, bb, w)
            # pre-combine within the batch: buckets can collide
            ub, inv = np.unique(bkt, return_inverse=True)
            s = np.zeros(len(ub), dtype=np.int64)
            np.add.at(s, inv, cnt)
            rows.append(np.full(len(ub), i, dtype=np.int64))
            bkts.append(ub)
            cs.append(s)
        return pa.table(
            {
                "i": pa.array(np.concatenate(rows)),
                "bkt": pa.array(np.concatenate(bkts)),
                "c": pa.array(np.concatenate(cs)),
            }
        )

    t = grouped_sum_count(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["i", "bkt"],
        sum_cols=["c"],
        final="driver",
    )
    mat = np.zeros((len(hashes), w), dtype=np.int64)
    mat[
        t["i"].to_numpy(zero_copy_only=False),
        t["bkt"].to_numpy(zero_copy_only=False),
    ] = t["c"].to_numpy(zero_copy_only=False)
    return mat


def cms_estimate(mat: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """min over the d rows of each key's counter — the CMS point
    estimate (≥ truth, exact integers)."""
    keys = np.asarray(keys, dtype=np.int64)
    w = mat.shape[1]
    est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
    for i, (a, b) in enumerate(CMS_HASHES[: mat.shape[0]]):
        est = np.minimum(est, mat[i, _cms_bucket(keys, a, b, w)])
    return est
