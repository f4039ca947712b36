"""Corpus-curation primitives: deterministic hash sampling, per-group
top-k, and exact grouped quantiles.

These are the relational workhorses of a training-data pipeline
(holdout splits, per-user/“per-source best-k” selection, score
distribution monitoring) expressed in the engine's scale shapes:

* :func:`hash_sample` — stateless ``map_batches`` filter; nothing
  shuffles, the sample decision is a pure function of the id so the
  split is reproducible across runs and machines.
* :func:`top_k_per_group` — per-batch partial top-k (combiner) BEFORE
  the keyed shuffle, so at most ``k`` rows per (group × input block)
  move; the final per-group top-k runs once per hash partition
  (``ops/shuffle.hash_group_apply``), fully vectorized.
* :func:`grouped_quantiles` — exact distributed quantiles over a
  bounded integer domain: per-batch ``(key, value)`` count histograms
  (``ops/agg.grouped_sum_count`` partial-agg discipline) shuffle only
  distinct-value counts, then one cumulative walk per key. Exactness
  matches DuckDB's ``quantile_disc``: the q-th quantile is the
  smallest value whose cumulative count reaches ``ceil(q·n)``, with q
  handled as an exact rational (DuckDB parses ``0.9`` as DECIMAL) so
  no float rounding can shift the index.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "grouped_value_topk",
    "heavy_hitters",
    "hash_sample",
    "top_k_per_group",
    "grouped_quantiles",
    "grouped_quantiles_cont",
    "grouped_distinct_count",
    "grouped_mode",
    "grouped_outliers",
    "cooccurrence_counts",
    "weighted_sample",
    "winsorize",
    "grouped_iqr_outliers",
]


def grouped_outliers(
    ds,
    key_col: str,
    value_col: str,
    sigmas: tuple[int, int] = (3, 1),
    keep_cols=(),
):
    """Rows more than ``sigmas`` (a rational num/den) population
    standard deviations ABOVE their group mean — the grouped
    anomaly-filter shape, exact to the last bit.

    Two streaming phases over an INT64 ``value_col`` (callers
    quantize, e.g. cents):

    1. per-group exact integer moments (n, S=Σv, Q=Σv²) — per-batch
       Arrow C++ partials (per-block Σv² stays inside int64 for
       v² ≤ 2^40 at 2^22 rows/block, the engine's block bound), then
       a Python-int driver merge (ops/agg.grouped_sums_exact) because
       the CROSS-block Σv² exceeds int64 at web scale and an Arrow
       merge would wrap silently;
    2. the z-test collapses to ONE int64 compare per row against a
       per-group integer threshold: with D = nQ − S² and k = num/den,
       v > μ + kσ  ⟺  den·(vn−S) > 0 ∧ (den·(vn−S))² > num²·D
                   ⟺  v ≥ T,  T = ceil((S + ceil((isqrt(num²·D)+1)/den))/n),
       computed once on the driver in arbitrary-precision Python ints
       (exact integer sqrt — no float rounding step), then applied in
       a stateless vectorized filter (thresholds ride the stage
       closure; groups were all seen in phase 1 so every lookup hits).

    Returns a Dataset with columns [key_col, value_col] + keep_cols.
    """
    import math

    from .agg import grouped_sums_exact

    num, den = int(sigmas[0]), int(sigmas[1])
    if num <= 0 or den <= 0:
        raise ValueError("sigmas must be a positive rational (num, den)")
    keep = list(keep_cols)

    def moments(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = b[value_col]
        if not pa.types.is_integer(v.type):
            raise TypeError(
                f"grouped_outliers: {value_col} must be integer "
                "(quantize upstream — exactness contract)"
            )
        return pa.table(
            {
                key_col: b[key_col],
                "s": v,
                "q": pc.multiply(v, v),
            }
        )

    mom = grouped_sums_exact(
        ds.map_batches(
            moments, batch_format="pyarrow", zero_copy_batch=True
        ),
        [key_col],
        sum_cols=["s", "q"],
        count_col="n",
    )
    thresholds: dict = {}
    for r in mom:
        n, s, q = int(r["n"]), int(r["s"]), int(r["q"])
        d = n * q - s * s  # ≥ 0 by Cauchy–Schwarz
        t = math.isqrt(num * num * d)
        a_min = -((-(t + 1)) // den)  # ceil((t+1)/den)
        thresholds[r[key_col]] = -((-(s + a_min)) // n)  # ceil(.../n)

    keys = list(thresholds)
    thr = np.array([thresholds[k] for k in keys], dtype=np.int64)
    key_arr = pa.array(keys)

    def flag(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pos = pc.index_in(b[key_col], key_arr).to_numpy(
            zero_copy_only=False
        )
        v = b[value_col].to_numpy(zero_copy_only=False)
        mask = v >= thr[pos]
        return b.select([key_col, value_col] + keep).filter(
            pa.array(mask)
        )

    return ds.map_batches(
        flag, batch_format="pyarrow", zero_copy_batch=True
    )


def grouped_distinct_count(ds, key: str, value: str, count_col: str = "n"):
    """Exact per-``key`` COUNT(DISTINCT value) — the aggregate Ray's
    own ``Unique`` cannot compute at scale (its accumulator merge
    crashes on ndarray partials at high block counts; the r2 islands
    lesson).

    Shape: per-batch pair dedup (Arrow ``group_by``, so each block
    contributes each (key, value) pair once) → ONE hash shuffle of
    the deduped 16-B pairs partitioned by pair → per-partition pair
    dedup + per-key partial counts (a pair lives in exactly one
    partition, so partial counts are disjoint) → driver sum over the
    tiny (n_partitions × n_keys) partials. The values themselves
    never gather anywhere."""
    import ray

    from .shuffle import hash_group_apply

    def dedup_batch(batch: pa.Table) -> pa.Table:
        return batch.select([key, value]).group_by(
            [key, value], use_threads=False
        ).aggregate([])

    pairs = ds.map_batches(
        dedup_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def count_part(tbl, starts):
        key_t = pa.int64() if tbl is None else tbl.schema.field(key).type
        if tbl is None or len(starts) == 0:
            return pa.table(
                {
                    key: pa.array([], type=key_t),
                    count_col: pa.array([], type=pa.int64()),
                }
            )
        # rows at `starts` are the distinct (key, value) pairs of this
        # partition; count them per key
        firsts = tbl[key].take(pa.array(starts))
        g = pa.table({key: firsts}).group_by(
            [key], use_threads=False
        ).aggregate([([], "count_all")])
        g = g.rename_columns(
            [count_col if c == "count_all" else c for c in g.column_names]
        )
        return g.select([key, count_col])

    parts = hash_group_apply(pairs, [key, value], count_part)
    merged = pa.concat_tables(
        [ray.get(r) for r in parts.materialize().to_arrow_refs()]
    )
    if merged.num_rows == 0:
        return merged
    out = merged.group_by([key], use_threads=False).aggregate(
        [(count_col, "sum")]
    )
    out = out.rename_columns(
        [key if c == key else count_col for c in out.column_names]
    )
    return out.select([key, count_col]).sort_by(key)


def hash_sample(ds, id_col: str, keep: int, mod: int = 100,
                a: int = 48271, b: int = 11):
    """Deterministic bucket sample: keep rows where
    ``(id*a + b) mod mod < keep`` — a keep/mod fraction.

    The affine-mod bucket is SQL-expressible (the correctness oracle
    runs the same expression); a production split over adversarial id
    spaces would swap in a 64-bit mixer (splitmix64) with uint64
    wraparound — same shape, same cost, not expressible in portable
    SQL, which is why the oracled variant uses the affine form.

    Ids must satisfy ``|id*a + b| < 2^63``: numpy would wrap silently
    where the SQL oracle raises, a silent engine/oracle divergence
    (ADVICE r3) — so out-of-range ids raise here too.
    """
    id_limit = (2**63 - 1 - abs(b)) // a

    def f(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(ids) and max(abs(int(ids.max())), abs(int(ids.min()))) > id_limit:
            raise ValueError(
                f"hash_sample: |{id_col}| exceeds {id_limit} and the "
                "affine step would overflow int64 (DuckDB raises, "
                "numpy wraps); rescale ids or use a 64-bit mixer split"
            )
        return batch.filter(pa.array((ids * a + b) % mod < keep))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


_LEHMER_A = 48271
_LEHMER_P = 2147483647  # 2^31 − 1 (prime; Park–Miller minstd modulus)


def weighted_sample(ds, id_col: str, weight_col: str, max_weight: int):
    """Deterministic weighted (importance) sample: keep row i iff
    ``h(id) · max_weight  <  w_i · P`` — inclusion probability
    ≈ w_i / max_weight, a pure function of the id, so the sample is
    reproducible across runs, machines and partitionings (the
    importance-sampling curation shape: keep high-value rows at higher
    rates without a shuffle or a random state).

    ``h`` is TWO steps of the Park–Miller minstd generator,
    ``h = (((id mod (P−1)) + 1)·a mod P)·a mod P`` with a = 48271,
    P = 2^31−1: one affine step is LINEAR for ids below P/a (no
    wraparound → the "sample" would just be an id-range cut); the
    second multiplication wraps for every seed, giving uniform h even
    on dense small-id domains. Seeds land in [1, P−1] by construction,
    so h ∈ [1, P−1]: w = 0 rows are never kept, w = max_weight always.

    Stateless vectorized ``map_batches`` filter — nothing moves, same
    scale shape as :func:`hash_sample`. Exactness: every product is
    bounded by P·max(a, max_weight) < 2^62, pure int64, mirrored
    token-for-token by the SQL oracle. ``weight_col`` must be int64 in
    [0, max_weight]; out-of-range weights raise (a silent clamp would
    diverge from the oracle). Ids must be non-negative.
    """
    if max_weight <= 0 or max_weight > 2**31:
        raise ValueError(
            "weighted_sample: need 0 < max_weight ≤ 2^31 "
            "(int64 product bound)"
        )

    def f(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        w = batch[weight_col].to_numpy(zero_copy_only=False)
        if len(ids):
            if int(ids.min()) < 0:
                raise ValueError(
                    f"weighted_sample: {id_col} must be non-negative"
                )
            if w.dtype.kind not in "iu":
                raise TypeError(
                    f"weighted_sample: {weight_col} must be integer "
                    "(quantize upstream — exactness contract)"
                )
            if int(w.min()) < 0 or int(w.max()) > max_weight:
                raise ValueError(
                    f"weighted_sample: {weight_col} outside "
                    f"[0, {max_weight}]"
                )
        seed = ids % (_LEHMER_P - 1) + 1
        h = (seed * _LEHMER_A % _LEHMER_P) * _LEHMER_A % _LEHMER_P
        return batch.filter(
            pa.array(
                h * max_weight < w.astype(np.int64) * _LEHMER_P
            )
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _group_topk(gidx: np.ndarray, order: np.ndarray, tie: np.ndarray,
                k: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-group top-k: row indices of the k best rows per
    group (``order`` DESC, ``tie`` ASC) and their 1-based ranks."""
    # lexsort: last key is primary
    perm = np.lexsort((tie, -order, gidx))
    g_sorted = gidx[perm]
    # rank within group along the sorted order
    starts = np.flatnonzero(np.diff(g_sorted, prepend=g_sorted[0] - 1))
    rank = np.arange(len(perm), dtype=np.int64) - np.repeat(
        starts, np.diff(np.append(starts, len(perm)))
    )
    keep = rank < k
    return perm[keep], rank[keep] + 1


def top_k_per_group(
    ds,
    group_col: str,
    order_col: str,
    k: int,
    tie_col: str,
    rank_col: str = "rank",
):
    """Top ``k`` rows per group by ``order_col`` DESC (ties broken by
    ``tie_col`` ASC), with a 1-based ``rank_col`` — the distributed
    ``row_number() OVER (PARTITION BY g ORDER BY v DESC, t) <= k``.

    Columns must be integer-typed (the exactness discipline: ordering
    and ranks are then identical to the SQL oracle's)."""
    from .shuffle import hash_group_apply

    cols = [group_col, order_col, tie_col]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(cols)
        g = batch[group_col].to_numpy(zero_copy_only=False)
        # per-batch combiner: group values are unsorted, so factorize
        # via np.unique codes (order within a code doesn't matter)
        codes = np.unique(g, return_inverse=True)[1]
        idx, _ = _group_topk(
            codes,
            batch[order_col].to_numpy(zero_copy_only=False),
            batch[tie_col].to_numpy(zero_copy_only=False),
            k,
        )
        return batch.select(cols).take(pa.array(np.sort(idx)))

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def final(tbl, starts):
        empty = pa.table(
            {
                **{c: pa.array([], type=pa.int64()) for c in cols},
                rank_col: pa.array([], type=pa.int64()),
            }
        )
        if tbl is None or tbl.num_rows == 0:
            return empty
        counts = np.diff(np.append(starts, tbl.num_rows))
        gidx = np.repeat(np.arange(len(starts)), counts)
        idx, rank = _group_topk(
            gidx,
            tbl[order_col].to_numpy(zero_copy_only=False),
            tbl[tie_col].to_numpy(zero_copy_only=False),
            k,
        )
        order = np.argsort(idx, kind="stable")
        out = tbl.select(cols).take(pa.array(idx[order]))
        return out.append_column(rank_col, pa.array(rank[order]))

    return hash_group_apply(partials, [group_col], final)


def grouped_quantiles(
    ds,
    key: str,
    value_col: str,
    qs: tuple[tuple[int, int], ...] = ((1, 2), (9, 10), (99, 100)),
    q_names: tuple[str, ...] = ("p50", "p90", "p99"),
    count_col: str = "n",
    final: str = "shuffle",
):
    """Exact per-``key`` quantiles of an integer ``value_col`` via a
    distributed count histogram.

    ``qs`` are exact rationals (num, den); the q-quantile is the
    smallest value whose cumulative count ≥ ceil(q·n) — DuckDB
    ``quantile_disc`` semantics under DECIMAL q. The shuffle carries
    only (key, value, count) distinct-value rows, never the inputs;
    correctness does not depend on the value domain's size, cost is
    O(distinct values per key).

    ``final="shuffle"`` (default) runs the histogram merge and the
    cumulative walk distributed — the path when keys × distinct
    values is itself wide. ``final="driver"`` merges the per-batch
    partials on the driver and walks locally, returning a
    ``pa.Table`` — right when the domain is provably bounded (e.g.
    integer cents) and the key count is tiny, where two keyed-shuffle
    jobs' fixed cost dwarfs the work (the grouped_sum_count
    driver-final discipline)."""
    from .agg import grouped_sum_count
    from .shuffle import hash_group_apply

    if final == "driver":
        merged = grouped_sum_count(
            ds, [key, value_col], count_col="_c", final="driver"
        )
        merged = merged.combine_chunks().sort_by(
            [(key, "ascending"), (value_col, "ascending")]
        )
        from .shuffle import group_starts

        starts = group_starts(merged, [key])
        return _quantile_walk(
            merged, starts, key, value_col, qs, q_names, count_col
        )
    hist = grouped_sum_count(
        ds, [key, value_col], count_col="_c", final="shuffle"
    )

    def walk(tbl, starts):
        return _quantile_walk(
            tbl, starts, key, value_col, qs, q_names, count_col
        )

    # sort_cols: the cumulative walk needs ascending value order
    return hash_group_apply(hist, [key], walk, sort_cols=(value_col,))


def grouped_quantiles_cont(
    ds,
    key: str,
    value_col: str,
    qs: tuple[tuple[int, int], ...] = ((1, 4), (1, 2), (9, 10)),
    q_names: tuple[str, ...] = ("p25", "p50", "p90"),
    count_col: str = "n",
    final: str = "shuffle",
):
    """Exact-parity INTERPOLATED per-key quantiles (SQL
    ``quantile_cont`` / ``percentile_cont``) over the same
    distinct-value count histogram as ``grouped_quantiles`` — the
    shuffle still carries only (key, value, count) rows.

    DuckDB's arithmetic was probed bitwise (300/300 random cases):
    ``pos = double(q)·(n−1)`` , ``idx = floor(pos)``, ``frac = pos −
    idx``, ``result = lo·(1−frac) + hi·frac`` — every step in IEEE
    doubles, with ``double(q)`` the correctly-rounded quotient of the
    exact rational (num/den here). lo/hi are the idx-th / (idx+1)-th
    order statistics, found by a cumulative-count searchsorted on the
    histogram (never an expansion of the multiset). Exactness bound:
    |value| < 2^53 so the int→double casts are exact.
    """
    from .agg import grouped_sum_count
    from .shuffle import hash_group_apply

    if final == "driver":
        merged = grouped_sum_count(
            ds, [key, value_col], count_col="_c", final="driver"
        )
        merged = merged.combine_chunks().sort_by(
            [(key, "ascending"), (value_col, "ascending")]
        )
        from .shuffle import group_starts

        starts = group_starts(merged, [key])
        return _quantile_cont_walk(
            merged, starts, key, value_col, qs, q_names, count_col
        )
    hist = grouped_sum_count(
        ds, [key, value_col], count_col="_c", final="shuffle"
    )

    def walk(tbl, starts):
        return _quantile_cont_walk(
            tbl, starts, key, value_col, qs, q_names, count_col
        )

    return hash_group_apply(hist, [key], walk, sort_cols=(value_col,))


def _quantile_cont_walk(
    tbl, starts, key, value_col, qs, q_names, count_col
):
    """Interpolated-quantile walk over a (key, value, _c) histogram
    sorted by (key, value)."""
    key_t = pa.int64() if tbl is None else tbl.schema.field(key).type
    if tbl is None or tbl.num_rows == 0:
        return pa.table(
            {
                key: pa.array([], type=key_t),
                count_col: pa.array([], type=pa.int64()),
                **{nm: pa.array([], type=pa.float64()) for nm in q_names},
            }
        )
    counts = np.diff(np.append(starts, tbl.num_rows))
    vals = tbl[value_col].to_numpy(zero_copy_only=False)
    cnts = tbl["_c"].to_numpy(zero_copy_only=False)
    qds = [np.float64(num) / np.float64(den) for num, den in qs]
    out_q = {nm: [] for nm in q_names}
    ns = []
    for s, c in zip(starts, counts):
        v = vals[s : s + c]
        n_ = cnts[s : s + c]
        cum = np.cumsum(n_)
        total = int(cum[-1])
        ns.append(total)
        for qd, nm in zip(qds, q_names):
            pos = qd * np.float64(total - 1)
            idx = int(np.floor(pos))
            frac = pos - np.float64(idx)
            lo = np.float64(v[int(np.searchsorted(cum, idx + 1))])
            hi = (
                np.float64(v[int(np.searchsorted(cum, idx + 2))])
                if idx + 1 <= total - 1
                else lo
            )
            out_q[nm].append(
                float(lo * (np.float64(1.0) - frac) + hi * frac)
            )
    return pa.table(
        {
            key: tbl[key].take(pa.array(starts)),
            count_col: pa.array(np.asarray(ns, dtype=np.int64)),
            **{
                nm: pa.array(np.asarray(out_q[nm], dtype=np.float64))
                for nm in q_names
            },
        }
    )


def _quantile_walk(tbl, starts, key, value_col, qs, q_names, count_col):
    """Cumulative-count quantile walk over a (key, value, _c) histogram
    sorted by (key, value); groups start at ``starts``."""
    key_t = pa.int64() if tbl is None else tbl.schema.field(key).type
    if tbl is None or tbl.num_rows == 0:
        return pa.table(
            {
                key: pa.array([], type=key_t),
                count_col: pa.array([], type=pa.int64()),
                **{nm: pa.array([], type=pa.int64()) for nm in q_names},
            }
        )
    counts = np.diff(np.append(starts, tbl.num_rows))
    vals = tbl[value_col].to_numpy(zero_copy_only=False)
    cnts = tbl["_c"].to_numpy(zero_copy_only=False)
    out_q = {nm: [] for nm in q_names}
    ns = []
    for s, c in zip(starts, counts):
        v = vals[s : s + c]
        n_ = cnts[s : s + c]
        cum = np.cumsum(n_)
        total = int(cum[-1])
        ns.append(total)
        for (num, den), nm in zip(qs, q_names):
            t = -((-num * total) // den)  # ceil(num*total/den), exact
            j = int(np.searchsorted(cum, max(t, 1)))
            out_q[nm].append(int(v[min(j, len(v) - 1)]))
    return pa.table(
        {
            key: tbl[key].take(pa.array(starts)),
            count_col: pa.array(np.asarray(ns, dtype=np.int64)),
            **{
                nm: pa.array(np.asarray(out_q[nm], dtype=np.int64))
                for nm in q_names
            },
        }
    )


def grouped_mode(
    ds,
    key: str,
    value: str,
    count_col: str = "n_occ",
    out_col: str | None = None,
):
    """Exact per-``key`` mode of ``value`` (most frequent value; ties
    broken by smallest value) → ``(key, out_col, count_col)``.

    Scale shape — the partial-aggregation discipline twice over:
    1. per-batch ``(key, value)`` count partials (Arrow C++ group_by),
       so the shuffle moves distinct pairs per block, never rows;
    2. ONE key-hash shuffle of the partials
       (``ops/shuffle.hash_group_apply``); each partition merges its
       pair counts with ``reduceat`` and picks each key's argmax with
       one Arrow sort — no per-group dispatch, no driver collect.
    Deterministic: the ``(count DESC, value ASC)`` order makes the
    winner unique, matching the SQL
    ``row_number() OVER (... ORDER BY count(*) DESC, value) = 1``.
    """
    out_col = out_col or value

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select([key, value])
            .group_by([key, value], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([key, value, count_col])

    def final(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        key_t = tbl.schema.field(key).type if tbl is not None else pa.int64()
        val_t = (
            tbl.schema.field(value).type if tbl is not None else pa.string()
        )
        schema = pa.schema(
            [(key, key_t), (out_col, val_t), (count_col, pa.int64())]
        )
        if tbl is None or len(tbl) == 0:
            return schema.empty_table()
        # merge partial counts for identical (key, value) pairs: rows
        # arrive sorted by (key, value), so pair boundaries are where
        # either column changes — reduceat over the counts
        n = len(tbl)
        cnt = tbl[count_col].to_numpy(zero_copy_only=False).astype(np.int64)
        kc = tbl[key].to_numpy(zero_copy_only=False)
        ve = tbl[value]
        if isinstance(ve, pa.ChunkedArray):
            ve = (
                ve.chunk(0)
                if ve.num_chunks == 1
                else pa.concat_arrays(ve.chunks)
            )
        # integer codes for the change-point scan (works for any value
        # type, including strings, without python compares)
        vn = ve.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        change = np.ones(n, dtype=bool)
        change[1:] = (kc[1:] != kc[:-1]) | (vn[1:] != vn[:-1])
        seg = np.flatnonzero(change)
        totals = np.add.reduceat(cnt, seg)
        merged = pa.table(
            {
                key: tbl[key].take(pa.array(seg)),
                out_col: ve.take(pa.array(seg)),
                count_col: pa.array(totals),
            }
        )
        # per-key argmax: one Arrow sort puts each key's winner first
        merged = merged.combine_chunks().sort_by(
            [(key, "ascending"), (count_col, "descending"),
             (out_col, "ascending")]
        )
        km = merged[key].to_numpy(zero_copy_only=False)
        first = np.ones(len(merged), dtype=bool)
        first[1:] = km[1:] != km[:-1]
        return merged.filter(pa.array(first))

    from .shuffle import group_starts, hash_group_apply

    if isinstance(ds, pa.Table):
        t = partial(ds).combine_chunks().sort_by(
            [(key, "ascending"), (value, "ascending")]
        )
        return final(t, group_starts(t, [key]))
    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_group_apply(
        partials, [key], final, sort_cols=(value,)
    )


def cooccurrence_counts(
    ds,
    key_col: str,
    item_col: str,
    count_col: str = "n_keys",
):
    """Pairwise co-occurrence counts — for every unordered item pair
    (a < b), in how many keys do both appear? (The market-basket /
    co-click matrix shape.)

    One keyed exchange of the DISTINCT (key, item) projection; per
    partition ONE vectorized pass: rows sorted by (key, item), dedup,
    then the same segment-arange pair expansion as
    ``ops/graph.triangle_count`` (a key with d distinct items emits
    d(d−1)/2 pairs — bound the basket size upstream, the documented
    skew caveat), finished by an Arrow C++ pair-count per partition.
    Partials are ≤ |item domain|² rows each; the driver merge is one
    tiny group_by-sum over them — exact integer counts throughout.

    Returns a pa.Table (item_a, item_b, count_col) with item_a < item_b.
    """
    from .shuffle import hash_group_apply

    def prune(b: pa.Table) -> pa.Table:
        # per-batch dedup shrinks the exchange; the partition pass
        # re-dedups globally
        return (
            b.select([key_col, item_col])
            .group_by([key_col, item_col], use_threads=False)
            .aggregate([])
        )

    pruned = (
        prune(ds)
        if isinstance(ds, pa.Table)
        else ds.map_batches(
            prune, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def pairs_part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        schema = pa.schema(
            [
                pa.field(
                    "item_a",
                    tbl.schema.field(item_col).type
                    if tbl is not None
                    else pa.string(),
                ),
                pa.field(
                    "item_b",
                    tbl.schema.field(item_col).type
                    if tbl is not None
                    else pa.string(),
                ),
                pa.field(count_col, pa.int64()),
            ]
        )
        if tbl is None or len(tbl) == 0:
            return schema.empty_table()
        items = tbl[item_col].combine_chunks()
        k = tbl[key_col].to_numpy(zero_copy_only=False)
        iv = np.asarray(items.to_numpy(zero_copy_only=False))
        n = len(k)
        keepm = np.empty(n, dtype=bool)
        keepm[0] = True
        keepm[1:] = (k[1:] != k[:-1]) | (iv[1:] != iv[:-1])
        sel = np.flatnonzero(keepm)
        k = k[sel]
        items = items.take(pa.array(sel))
        n = len(k)
        gs = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        ends = np.append(gs[1:], n)
        rights = np.repeat(ends, ends - gs) - np.arange(n) - 1
        total = int(rights.sum())
        if not total:
            return schema.empty_table()
        left = np.repeat(np.arange(n), rights)
        offs = np.cumsum(rights) - rights
        right = (
            np.arange(total)
            - np.repeat(offs, rights)
            + np.repeat(np.arange(n) + 1, rights)
        )
        pairs = pa.table(
            {
                "item_a": items.take(pa.array(left)),
                "item_b": items.take(pa.array(right)),
            }
        )
        g = pairs.group_by(
            ["item_a", "item_b"], use_threads=False
        ).aggregate([([], "count_all")])
        return g.rename_columns(["item_a", "item_b", count_col])

    import ray

    partials = hash_group_apply(
        pruned, [key_col], pairs_part, sort_cols=[item_col]
    )
    tabs = [
        t
        for t in (
            ray.get(r) for r in partials.materialize().to_arrow_refs()
        )
        if t.num_rows
    ]
    if not tabs:
        return pa.schema(
            [
                pa.field("item_a", pa.string()),
                pa.field("item_b", pa.string()),
                pa.field(count_col, pa.int64()),
            ]
        ).empty_table()
    merged = (
        pa.concat_tables(tabs)
        .group_by(["item_a", "item_b"], use_threads=False)
        .aggregate([(count_col, "sum")])
    )
    return merged.rename_columns(["item_a", "item_b", count_col])


def winsorize(
    ds,
    key_col: str,
    value_col: str,
    q: tuple[int, int] = (9, 10),
    keep_cols=(),
    out_col: str | None = None,
):
    """Grouped winsorization: cap each row's integer ``value_col`` at
    its group's exact q-quantile — the outlier-repair twin of
    :func:`grouped_outliers` (clamp instead of filter).

    Two streaming phases: (1) the group caps come from
    :func:`grouped_quantiles` (distinct-value count histograms — the
    corpus never shuffles, cost is O(distinct values per key)),
    driver-final because winsorize keys are low-cardinality by the
    same contract; (2) one stateless vectorized clamp pass
    (``min(v, cap[key])`` via index_in + element-wise min — groups
    were all seen in phase 1 so every lookup hits). Quantile
    semantics are DuckDB ``quantile_disc`` under exact rational q, so
    the capped values are bit-exact vs the SQL oracle.

    Returns a Dataset with [key_col, out_col] + keep_cols, where
    ``out_col`` (default ``value_col``) is the capped value.
    """
    out_col = out_col or value_col
    keep = list(keep_cols)
    caps_tbl = grouped_quantiles(
        ds, key_col, value_col, qs=(tuple(q),), q_names=("cap",),
        final="driver",
    )
    keys_arr = caps_tbl[key_col].combine_chunks()
    caps = caps_tbl["cap"].to_numpy(zero_copy_only=False).astype(np.int64)

    def clamp(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pos = pc.index_in(b[key_col], keys_arr).to_numpy(
            zero_copy_only=False
        )
        v = b[value_col].to_numpy(zero_copy_only=False)
        capped = np.minimum(v, caps[pos])
        out = {key_col: b[key_col], out_col: pa.array(capped)}
        for c in keep:
            out[c] = b[c]
        return pa.table(out)

    return ds.map_batches(
        clamp, batch_format="pyarrow", zero_copy_batch=True
    )


def heavy_hitters(ds, col: str, k: int, tokenize: bool = False):
    """EXACT frequent-item detection at sketch cost — all values with
    frequency STRICTLY above n/(k+1) of the stream, by the two-pass
    Misra-Gries discipline:

    pass 1 (candidates): each block keeps only its top-k values by
    exact in-block count. Any global heavy hitter (freq > n/(k+1))
    must exceed the n_b/(k+1) share in at least one block (averaging
    argument), and within a block at most k values can tie-or-beat a
    qualifying value's count (else the block total would exceed n_b),
    so EVERY heavy hitter survives some block's top-k under any tie
    handling. Only k value strings leave each block.

    pass 2 (verify): the candidate set broadcasts; each block emits
    exact counts of candidates present plus one null-keyed row with
    its total item count. One merge of <= (k+1) rows per block, then
    the integer cross-multiply filter ``cnt * (k+1) > n`` (no float
    threshold).

    Unlike a full count shuffle (frequent_ngrams), the moving payload
    is O(k) per block regardless of vocabulary size -- the
    bounded-memory heavy-hitter shape for streams whose distinct-value
    count is itself corpus-sized. Output: (value, n_occ) sorted by
    value, exact counts.

    ``tokenize=True`` treats ``col`` as single-space-joined text and
    streams its tokens (matching string_split semantics)."""
    import pyarrow.compute as pc
    import ray

    def values_of(batch: pa.Table):
        arr = batch[col]
        if tokenize:
            arr = pc.list_flatten(pc.split_pattern(arr, " "))
        # nulls are not values: they must neither qualify nor inflate
        # the stream length n (matches GROUP BY over non-null rows)
        return arr.combine_chunks().drop_null()

    def candidates(batch: pa.Table) -> pa.Table:
        arr = values_of(batch)
        if len(arr) == 0:
            return pa.table({"value": pa.array([], type=pa.string())})
        vc = arr.value_counts()
        t = pa.table(
            {"value": vc.field("values"), "n": vc.field("counts")}
        ).sort_by([("n", "descending"), ("value", "ascending")])
        return t.slice(0, k).select(["value"])

    if isinstance(ds, pa.Table):
        cand_tabs = [candidates(ds)]
    else:
        cand_ds = ds.map_batches(
            candidates, batch_format="pyarrow", zero_copy_batch=True
        )
        cand_tabs = [
            t for t in ray.get(cand_ds.materialize().to_arrow_refs())
            if t.num_rows
        ]
    if not cand_tabs:
        return pa.table(
            {
                "value": pa.array([], type=pa.string()),
                "n_occ": pa.array([], type=pa.int64()),
            }
        )
    cand = pc.unique(
        pa.concat_tables(cand_tabs)["value"].combine_chunks()
    )
    cand_ref = ray.put(cand)

    def verify(batch: pa.Table) -> pa.Table:
        arr = values_of(batch)
        n_b = len(arr)
        cs = ray.get(cand_ref)
        hit = arr.filter(pc.fill_null(pc.is_in(arr, value_set=cs), False))
        vc = hit.value_counts()
        return pa.table(
            {
                "value": pa.concat_arrays(
                    [pc.cast(vc.field("values"), pa.string()),
                     pa.array([None], type=pa.string())]
                ),
                "cnt": pa.concat_arrays(
                    [pc.cast(vc.field("counts"), pa.int64()),
                     pa.array([n_b], type=pa.int64())]
                ),
            }
        )

    if isinstance(ds, pa.Table):
        parts = [verify(ds)]
    else:
        ver_ds = ds.map_batches(
            verify, batch_format="pyarrow", zero_copy_batch=True
        )
        parts = [
            t for t in ray.get(ver_ds.materialize().to_arrow_refs())
            if t.num_rows
        ]
    merged = pa.concat_tables(parts).combine_chunks()
    g = merged.group_by("value").aggregate([("cnt", "sum")])
    total = int(
        pc.sum(
            g.filter(pc.is_null(g["value"]))["cnt_sum"]
        ).as_py() or 0
    )
    g = g.filter(pc.is_valid(g["value"]))
    cnt = g["cnt_sum"]
    keep = pc.greater(
        pc.multiply(cnt, pa.scalar(k + 1, pa.int64())),
        pa.scalar(total, pa.int64()),
    )
    out = pa.table(
        {"value": g["value"], "n_occ": cnt}
    ).filter(keep)
    return out.combine_chunks().sort_by("value")


def grouped_value_topk(ds, key: str, value: str, k: int):
    """Top-k most-frequent VALUES per key with exact counts — the
    "dominant categories per group" reporting staple, i.e.
    ``row_number() OVER (PARTITION BY key ORDER BY count(*) DESC,
    value) <= k`` over the (key, value) count table.

    Scale shape: per-batch Arrow group_by reduces each block to
    distinct (key, value, count) partials — only those move through
    ONE key-hash exchange; each reduce partition re-merges its
    partials with one Arrow group_by and picks top-k per key with one
    vectorized lexsort (count DESC, value ASC total order). Output is
    exact counts, (key, rank) sorted."""
    import ray

    from .shuffle import hash_group_apply

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([key, value]).group_by(
            [key, value], use_threads=False
        ).aggregate([([], "count_all")])
        return g.rename_columns([key, value, "n_occ"])

    partials = (
        partial(ds) if isinstance(ds, pa.Table)
        else ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def final(tbl, starts):
        empty = pa.table(
            {
                key: pa.array([], type=pa.int64()),
                value: pa.array([], type=pa.string()),
                "n_occ": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
            }
        )
        if tbl is None or tbl.num_rows == 0:
            return empty
        m = tbl.group_by([key, value], use_threads=False).aggregate(
            [("n_occ", "sum")]
        )
        gidx = m[key].to_numpy(zero_copy_only=False)
        cnt = m["n_occ_sum"].to_numpy(zero_copy_only=False)
        vals = m[value].to_numpy(zero_copy_only=False)
        idx, rank = _group_topk(gidx, cnt, vals, k)
        return pa.table(
            {
                key: pa.array(gidx[idx], type=m.schema.field(key).type),
                value: pa.array(vals[idx],
                                type=m.schema.field(value).type),
                "n_occ": pa.array(cnt[idx], type=pa.int64()),
                "rank": pa.array(rank, type=pa.int64()),
            }
        )

    refs = hash_group_apply(partials, [key], final, return_refs=True)
    tabs = [t for t in ray.get(refs) if t is not None and t.num_rows]
    if not tabs:
        return final(None, [])
    return pa.concat_tables(tabs).combine_chunks().sort_by(
        [(key, "ascending"), ("rank", "ascending")]
    )


def grouped_iqr_outliers(ds, key: str, value_col: str):
    """Per-key Tukey-fence outlier census over an integer column —
    the box-plot data-quality readout: exact q1/q3 (quantile_disc
    semantics, ``grouped_quantiles``), then counts strictly outside
    [q1 − 1.5·IQR, q3 + 1.5·IQR]. The 1.5 factor is kept exact by
    integer cross-multiplication:

        v < q1 − 1.5·(q3−q1)  ⟺  2v < 5·q1 − 3·q3
        v > q3 + 1.5·(q3−q1)  ⟺  2v > 5·q3 − 3·q1

    → pa.Table (key, q1, q3, n_low, n_high), sorted by key.

    Scale shape: phase 1 ships only distinct-(key, value) histogram
    rows; phase 2 is a stateless vectorized count with the tiny
    fence map in the closure (per-batch partials, exact Python-int
    driver merge). |5·q| must fit int64 — cents magnitudes leave
    50+ bits of slack."""
    import ray

    from .agg import grouped_sums_exact

    qt = grouped_quantiles(
        ds, key, value_col, qs=((1, 4), (3, 4)), q_names=("q1", "q3")
    )
    if not isinstance(qt, pa.Table):
        qt = pa.concat_tables(
            [t for t in ray.get(qt.materialize().to_arrow_refs())
             if t.num_rows]
        )
    qt = qt.combine_chunks().sort_by(key)
    fences = {
        k: (5 * int(a) - 3 * int(b), 5 * int(b) - 3 * int(a))
        for k, a, b in zip(
            qt[key].to_pylist(), qt["q1"].to_pylist(),
            qt["q3"].to_pylist()
        )
    }

    def count_part(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        keys = b[key]
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ks = sorted(fences)
        idx = pc2.index_in(
            keys,
            value_set=pa.array(
                ks, type=keys.type if not isinstance(
                    keys, pa.ChunkedArray) else keys.type
            ),
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.array([fences[k][0] for k in ks], dtype=np.int64)[idx]
        hi = np.array([fences[k][1] for k in ks], dtype=np.int64)[idx]
        return pa.table(
            {
                key: keys,
                "lo": pa.array((2 * v < lo).astype(np.int64)),
                "hi": pa.array((2 * v > hi).astype(np.int64)),
            }
        )

    rows = grouped_sums_exact(
        ds.map_batches(count_part, batch_format="pyarrow",
                       zero_copy_batch=True),
        [key], sum_cols=["lo", "hi"],
    )
    cnt = {r[key]: (int(r["lo"]), int(r["hi"])) for r in rows}
    ks = qt[key].to_pylist()
    return pa.table(
        {
            key: qt[key],
            "q1": qt["q1"],
            "q3": qt["q3"],
            "n_low": pa.array(
                [cnt.get(k, (0, 0))[0] for k in ks], type=pa.int64()
            ),
            "n_high": pa.array(
                [cnt.get(k, (0, 0))[1] for k in ks], type=pa.int64()
            ),
        }
    )
