"""Exact grouped distribution statistics — Gini concentration,
weighted median, and median-absolute-deviation — over integer-quantized
value columns.

These are the "how skewed / how concentrated / how spread is this
group" monitors a training-data curation pipeline runs continuously
(source-contribution inequality, robust per-domain score spread,
quantity-weighted price levels), expressed in the engine's one
scale shape for order statistics: the **distinct-value count
histogram** (``ops/curate.grouped_quantiles`` discipline). Per-batch
Arrow group_by partials mean only distinct ``(key, value, count)``
rows ever move — the corpus itself never shuffles — and every
statistic below is a pure function of that histogram, so cost is
O(distinct values per key) regardless of row count.

Exactness discipline (CLAUDE.md): all inputs are int64 (callers
quantize, e.g. cents); every intermediate is an exact integer
(numpy int64 under a proven bound, arbitrary-precision Python ints
past it — never a silent wrap, never a float partial); the only
float each statistic emits is ONE final correctly-rounded IEEE
division of two exact integers, mirrored token-for-token in the
DuckDB oracle (``CAST(num AS DOUBLE) / CAST(den AS DOUBLE)``).

Gini from a histogram (why it is tie-invariant): with distinct sorted
values v_1<…<v_m, counts c_j and prefix P_j = Σ_{i<j} c_i, the rank
positions of v_j are P_j+1 … P_j+c_j whose sum is
c_j·P_j + c_j(c_j+1)/2, so

    Σ_sorted rank·x  =  Σ_j v_j·(c_j·P_j + c_j(c_j+1)/2)
    gini             =  (2·Σ rank·x − (n+1)·Σx) / (n·Σx)

which equals the SQL ``row_number()``-based formula for EVERY
tie-breaking order (equal values swap equal x between ranks).

ref parity note: the reference repo has no statistics module; these
are part of the beyond-reference training-data family the engine adds
(see SURVEY.md §2 "LLM-data-pipeline operators").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["grouped_spearman", "grouped_impurity",
           "grouped_gini", "grouped_weighted_median", "grouped_mad",
           "grouped_mode", "grouped_ols", "grouped_ttest", "theil_sen", "ks_2samp", "mannwhitney_u", "gini_split_scan"]


def _int64_safe(bound: int) -> bool:
    """True when every intermediate ≤ ``bound`` fits int64 with slack."""
    return bound < (1 << 62)


def _gini_walk(tbl, starts, key, value_col, count_col, gini_col):
    """Per-group Gini over a (key, value, _c) histogram sorted by
    (key, value); groups start at ``starts``."""
    key_t = pa.int64() if tbl is None else tbl.schema.field(key).type
    if tbl is None or tbl.num_rows == 0:
        return pa.table(
            {
                key: pa.array([], type=key_t),
                count_col: pa.array([], type=pa.int64()),
                gini_col: pa.array([], type=pa.float64()),
            }
        )
    counts = np.diff(np.append(starts, tbl.num_rows))
    vals = tbl[value_col].to_numpy(zero_copy_only=False)
    cnts = tbl["_c"].to_numpy(zero_copy_only=False)
    ns, ginis = [], []
    for s, c in zip(starts, counts):
        v = vals[s : s + c]
        cj = cnts[s : s + c]
        cum = np.cumsum(cj)
        n = int(cum[-1])
        maxabs = int(np.max(np.abs(v))) if len(v) else 0
        # every term below is ≤ 2·maxabs·n² (RS) or (n+1)·maxabs·n (S
        # term) — check the loose common bound once, exactly, in
        # Python ints, then pick the fast path
        if _int64_safe(4 * max(maxabs, 1) * n * n):
            prefix = cum - cj
            s_ = int(np.sum(v * cj))
            rs = int(np.sum(v * (cj * prefix + cj * (cj + 1) // 2)))
        else:  # arbitrary-precision fallback: exact past 2^62
            vl, cl = v.tolist(), cj.tolist()
            p, s_, rs = 0, 0, 0
            for vv, cc in zip(vl, cl):
                s_ += vv * cc
                rs += vv * (cc * p + cc * (cc + 1) // 2)
                p += cc
        num = 2 * rs - (n + 1) * s_  # exact Python int
        den = n * s_
        ns.append(n)
        # the ONE rounding step: float() of an int is correctly
        # rounded (CPython), as is CAST(HUGEINT AS DOUBLE) in DuckDB,
        # and x/y on two doubles — the oracle mirrors this expression
        ginis.append(float(num) / float(den) if den else float("nan"))
    return pa.table(
        {
            key: tbl[key].take(pa.array(starts)),
            count_col: pa.array(np.asarray(ns, dtype=np.int64)),
            gini_col: pa.array(np.asarray(ginis, dtype=np.float64)),
        }
    )


def grouped_gini(
    ds,
    key: str,
    value_col: str,
    count_col: str = "n",
    gini_col: str = "gini",
    final: str = "shuffle",
):
    """Exact per-``key`` Gini coefficient of integer ``value_col``.

    ``final="shuffle"`` walks each key's histogram inside one
    ``hash_group_apply`` partition (wide-key path); ``final="driver"``
    merges the per-batch partials on the driver and returns a
    ``pa.Table`` — right when keys are few and the value domain is
    bounded (integer cents), where two keyed-shuffle jobs' fixed cost
    dwarfs the work (the ``grouped_quantiles`` driver-final
    discipline).
    """
    from .agg import grouped_sum_count
    from .shuffle import group_starts, hash_group_apply

    if final == "driver":
        merged = grouped_sum_count(
            ds, [key, value_col], count_col="_c", final="driver"
        )
        merged = merged.combine_chunks().sort_by(
            [(key, "ascending"), (value_col, "ascending")]
        )
        starts = group_starts(merged, [key])
        return _gini_walk(merged, starts, key, value_col, count_col, gini_col)
    hist = grouped_sum_count(
        ds, [key, value_col], count_col="_c", final="shuffle"
    )

    def walk(tbl, starts):
        return _gini_walk(tbl, starts, key, value_col, count_col, gini_col)

    return hash_group_apply(hist, [key], walk, sort_cols=(value_col,))


def _wmedian_walk(tbl, starts, key, value_col, total_col, out_col):
    """Per-group weighted median over a (key, value, _w) weighted
    histogram sorted by (key, value): the smallest value whose
    cumulative weight reaches ceil(W/2) — i.e. 2·cum ≥ W, the
    lower weighted median."""
    key_t = pa.int64() if tbl is None else tbl.schema.field(key).type
    if tbl is None or tbl.num_rows == 0:
        return pa.table(
            {
                key: pa.array([], type=key_t),
                total_col: pa.array([], type=pa.int64()),
                out_col: pa.array([], type=pa.int64()),
            }
        )
    counts = np.diff(np.append(starts, tbl.num_rows))
    vals = tbl[value_col].to_numpy(zero_copy_only=False)
    ws = tbl["_w"].to_numpy(zero_copy_only=False)
    tot, med = [], []
    for s, c in zip(starts, counts):
        cum = np.cumsum(ws[s : s + c])
        w_total = int(cum[-1])
        # 2·cum ≥ W  ⟺  cum ≥ ceil(W/2) — no doubling, no overflow
        j = int(np.searchsorted(cum, (w_total + 1) // 2))
        tot.append(w_total)
        med.append(int(vals[s + min(j, c - 1)]))
    return pa.table(
        {
            key: tbl[key].take(pa.array(starts)),
            total_col: pa.array(np.asarray(tot, dtype=np.int64)),
            out_col: pa.array(np.asarray(med, dtype=np.int64)),
        }
    )


def grouped_weighted_median(
    ds,
    key: str,
    value_col: str,
    weight_col: str,
    total_col: str = "w_total",
    out_col: str = "wmedian",
    final: str = "shuffle",
):
    """Exact per-``key`` weighted (lower) median: the smallest value
    v with 2·Σ_{x≤v} w(x) ≥ Σ w. Weights and values are int64; the
    per-batch partial sums weight per distinct (key, value), so the
    shuffle carries the weighted histogram, never rows. ``final`` as
    in :func:`grouped_gini`."""
    from .agg import grouped_sum_count
    from .shuffle import group_starts, hash_group_apply

    proj = ds.map_batches(
        lambda b: pa.table(
            {key: b[key], value_col: b[value_col], "_w": b[weight_col]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if final == "driver":
        merged = grouped_sum_count(
            proj, [key, value_col], sum_cols=["_w"], final="driver"
        )
        merged = merged.combine_chunks().sort_by(
            [(key, "ascending"), (value_col, "ascending")]
        )
        starts = group_starts(merged, [key])
        return _wmedian_walk(
            merged, starts, key, value_col, total_col, out_col
        )
    hist = grouped_sum_count(
        proj, [key, value_col], sum_cols=["_w"], final="shuffle"
    )

    def walk(tbl, starts):
        return _wmedian_walk(tbl, starts, key, value_col, total_col, out_col)

    return hash_group_apply(hist, [key], walk, sort_cols=(value_col,))


def grouped_mad(
    ds,
    key: str,
    value_col: str,
    median_col: str = "median",
    mad_col: str = "mad",
    final: str = "driver",
):
    """Exact per-``key`` median absolute deviation:
    ``mad = quantile_disc(|v − median(v)|, 0.5)`` with
    ``median = quantile_disc(v, 0.5)`` — the robust spread monitor.

    Two histogram passes: pass 1 computes each key's exact discrete
    median; pass 2 re-reads the input with the (small) median map
    riding the stage closure, quantizes ``|v − m|`` per row
    (int64-exact), and walks the deviation histogram. Only distinct
    (key, value) counts ever shuffle; the median map is one row per
    key (broadcast-small by construction).

    Returns a pa.Table (``final="driver"``, the few-key path) or a
    Dataset (``final="shuffle"``) with columns
    ``[key, median_col, mad_col]``.
    """
    from .curate import grouped_quantiles

    med = grouped_quantiles(
        ds,
        key,
        value_col,
        qs=((1, 2),),
        q_names=(median_col,),
        count_col="_n",
        final="driver",
    )
    med_keys = med[key].to_pylist()
    med_vals = np.asarray(med[median_col].to_pylist(), dtype=np.int64)
    key_arr = pa.array(med_keys)

    def absdev(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # every key was seen in pass 1 ⇒ index_in never misses
        idx = pc.index_in(b[key], key_arr).to_numpy(zero_copy_only=False)
        v = b[value_col].to_numpy(zero_copy_only=False)
        dev = np.abs(v - med_vals[idx.astype(np.int64)])
        return pa.table({key: b[key], "_dev": pa.array(dev)})

    devs = ds.map_batches(absdev, batch_format="pyarrow", zero_copy_batch=True)
    mad = grouped_quantiles(
        devs,
        key,
        "_dev",
        qs=((1, 2),),
        q_names=(mad_col,),
        count_col="_n",
        final=final,
    )
    if final != "driver":
        raise NotImplementedError(
            "grouped_mad final='shuffle' join-back not wired; use "
            "final='driver' (few-key contract) — the deviation "
            "histogram pass itself is already distributed"
        )
    mad = mad.combine_chunks().sort_by([(key, "ascending")])
    med = med.combine_chunks().sort_by([(key, "ascending")])
    return pa.table(
        {
            key: med[key],
            median_col: med[median_col],
            mad_col: mad[mad_col],
        }
    )


def _mode_walk(tbl, starts, key, value_col, count_col):
    """Per-group mode over a (key, value, _c) histogram sorted by
    (key, value): the row with max count, ties broken by SMALLEST
    value (first max in value order — matching the SQL
    ``row_number() OVER (ORDER BY cnt DESC, value)`` tie-break)."""
    if tbl is None or tbl.num_rows == 0:
        key_t = pa.int64() if tbl is None else tbl.schema.field(key).type
        val_t = (
            pa.int64() if tbl is None else tbl.schema.field(value_col).type
        )
        return pa.table(
            {
                key: pa.array([], type=key_t),
                value_col: pa.array([], type=val_t),
                count_col: pa.array([], type=pa.int64()),
            }
        )
    cnt = tbl["_c"].to_numpy(zero_copy_only=False)
    sizes = np.diff(np.append(starts, tbl.num_rows))
    gmax = np.maximum.reduceat(cnt, starts)
    hit = np.flatnonzero(cnt == np.repeat(gmax, sizes))
    pos = hit[np.searchsorted(hit, starts)]  # first max per group
    import pyarrow.compute as pc

    return pa.table(
        {
            key: pc.take(tbl[key], pa.array(starts)),
            value_col: pc.take(tbl[value_col], pa.array(pos)),
            count_col: pa.array(gmax.astype(np.int64)),
        }
    )


def grouped_mode(
    ds,
    key: str,
    value_col: str,
    count_col: str = "cnt",
    final: str = "shuffle",
):
    """Exact per-``key`` mode (most frequent ``value_col``, ties to the
    smallest value) on the distinct-value count-histogram shape: only
    (key, value, count) partials ever move, the corpus never shuffles.
    ``value_col`` may be int or string (hash_group_apply hashes string
    keys via polars). ``final="driver"`` merges partials driver-side —
    the few-key bounded-domain shortcut (grouped_quantiles discipline).
    """
    from .agg import grouped_sum_count
    from .shuffle import group_starts, hash_group_apply

    if final == "driver":
        if isinstance(ds, pa.Table):
            merged = ds.group_by(
                [key, value_col], use_threads=False
            ).aggregate([([], "count_all")])
            merged = merged.rename_columns([key, value_col, "_c"])
        else:
            merged = grouped_sum_count(
                ds, [key, value_col], count_col="_c", final="driver"
            )
        merged = merged.combine_chunks().sort_by(
            [(key, "ascending"), (value_col, "ascending")]
        )
        starts = group_starts(merged, [key])
        return _mode_walk(merged, starts, key, value_col, count_col)
    hist = grouped_sum_count(
        ds, [key, value_col], count_col="_c", final="shuffle"
    )

    def walk(tbl, starts):
        return _mode_walk(tbl, starts, key, value_col, count_col)

    return hash_group_apply(hist, [key], walk, sort_cols=(value_col,))


def grouped_impurity(ds, key: str, cat_col: str) -> "pa.Table":
    """Gini IMPURITY of a categorical distribution per key (the
    decision-tree split criterion, distinct from ``grouped_gini``'s
    Lorenz concentration index):

        impurity(g) = 1 - sum_c (n_gc / n_g)^2 = (n_g^2 - sum_c n_gc^2) / n_g^2

    Scale shape: per-batch Arrow group_by partials reduce the corpus
    to distinct ``(key, category, count)`` rows -- only those move
    (grouped_sum_count final="driver"; cardinality = |keys| x
    |categories|, dimension-sized by assumption). All integer algebra
    runs in Python ints (exact at any magnitude); the one float per
    key is a single correctly-rounded division mirrored by the
    oracle's HUGEINT -> DOUBLE casts."""
    import pyarrow as pa

    from .agg import grouped_sum_count

    counts = grouped_sum_count(
        ds, [key, cat_col], count_col="n", final="driver"
    )
    per = {}
    for r in counts.to_pylist():
        n_g, ss = per.get(r[key], (0, 0))
        c = int(r["n"])
        per[r[key]] = (n_g + c, ss + c * c)
    keys = sorted(per)
    imp = [
        float(per[k][0] ** 2 - per[k][1]) / float(per[k][0] ** 2)
        for k in keys
    ]
    key_type = counts.schema.field(key).type  # preserve source dtype
    return pa.table(
        {
            key: pa.array(keys, type=key_type),
            "impurity": pa.array(imp, type=pa.float64()),
            "n": pa.array(
                [per[k][0] for k in keys], type=pa.int64()
            ),
        }
    )


def _midrank2(v: "np.ndarray") -> "np.ndarray":
    """2× midranks of v (ties share the average rank; doubling keeps
    them integers): for value with count c and P smaller values,
    midrank2 = 2P + c + 1."""
    order = np.argsort(v, kind="stable")
    sv = v[order]
    uniq_starts = np.flatnonzero(
        np.diff(sv, prepend=sv[0] - 1 if len(sv) else 0)
    )
    counts = np.diff(np.append(uniq_starts, len(sv)))
    prefix = np.append(0, np.cumsum(counts))[:-1]
    m2u = 2 * prefix + counts + 1
    out = np.empty(len(v), dtype=np.int64)
    out[order] = np.repeat(m2u, counts)
    return out


def grouped_spearman(ds, key: str, x_col: str, y_col: str) -> pa.Table:
    """Exact Spearman rank correlation per key — Pearson over
    tie-averaged ranks, with every moment an exact integer:
    midranks are kept ×2 (so ties stay integral), the five sums
    Σrx, Σry, Σrx·ry, Σrx², Σry² accumulate as int64 under a proven
    4·(2n+1)²·n < 2^62 bound (arbitrary-precision Python ints past
    it), and the ONE float per key is the mirrored IEEE expression

        rho = num / sqrt(denx · deny),  num = n·Sxy − Sx·Sy, …

    token-for-token equal to the oracle's HUGEINT→DOUBLE form (the
    ×2 scaling cancels algebraically, so no rescale step exists to
    round differently).

    Scale shape: Spearman needs per-row rank PAIRS within a key, so
    each key's rows co-locate through ONE hash exchange of pruned
    (key, x, y) triples; ranking + moments run vectorized per group
    inside the reduce partition. A single giant key serializes its
    group (documented skew hatch: pre-bucket values to histograms
    if that bites)."""
    import math

    import ray

    from .shuffle import hash_group_apply

    import pyarrow.compute as pc

    def prune(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key: batch[key],
                "x": pc.cast(batch[x_col], pa.int64()),
                "y": pc.cast(batch[y_col], pa.int64()),
            }
        )

    pruned = (
        prune(ds) if isinstance(ds, pa.Table)
        else ds.map_batches(
            prune, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def final(tbl, starts):
        empty = pa.table(
            {
                key: pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "rho": pa.array([], type=pa.float64()),
            }
        )
        if tbl is None or tbl.num_rows == 0:
            return empty
        keys = tbl[key].to_numpy(zero_copy_only=False)
        xs = tbl["x"].to_numpy(zero_copy_only=False)
        ys = tbl["y"].to_numpy(zero_copy_only=False)
        ends = np.append(starts[1:], tbl.num_rows)
        out_k, out_n, out_rho = [], [], []
        for s, e in zip(starts, ends):
            n = int(e - s)
            rx = _midrank2(xs[s:e])
            ry = _midrank2(ys[s:e])
            if _int64_safe(4 * (2 * n + 1) ** 2 * n):
                sx, sy = int(rx.sum()), int(ry.sum())
                sxy = int((rx * ry).sum())
                sxx = int((rx * rx).sum())
                syy = int((ry * ry).sum())
            else:  # web-scale group: exact Python ints
                sx = sum(map(int, rx)); sy = sum(map(int, ry))
                sxy = sum(int(a) * int(b) for a, b in zip(rx, ry))
                sxx = sum(int(a) ** 2 for a in rx)
                syy = sum(int(b) ** 2 for b in ry)
            num = n * sxy - sx * sy
            denx = n * sxx - sx * sx
            deny = n * syy - sy * sy
            rho = (
                float(num) / math.sqrt(float(denx) * float(deny))
                if denx > 0 and deny > 0 else None
            )
            out_k.append(int(keys[s]))
            out_n.append(n)
            out_rho.append(rho)
        return pa.table(
            {
                key: pa.array(out_k, type=pa.int64()),
                "n": pa.array(out_n, type=pa.int64()),
                "rho": pa.array(out_rho, type=pa.float64()),
            }
        )

    refs = hash_group_apply(pruned, [key], final, return_refs=True)
    tabs = [t for t in ray.get(refs) if t is not None and t.num_rows]
    if not tabs:
        return final(None, [])
    return pa.concat_tables(tabs).combine_chunks().sort_by(key)


def grouped_kendall(ds, key: str, x_col: str, y_col: str) -> pa.Table:
    """Exact Kendall rank correlation (tau-b) per key: over all
    unordered within-key pairs, C−D = Σ sign(Δx)·sign(Δy) and the
    tie-aware denominator √((n₀−n₁)(n₀−n₂)) with n₀ = n(n−1)/2,
    n₁/n₂ = pairs tied in x/y. Every count is an exact integer; the
    ONE float per key is the mirrored IEEE expression

        tau = float(C−D) / sqrt(float(n₀−n₁) · float(n₀−n₂))

    token-for-token equal to the oracle's CAST(… AS DOUBLE)/sqrt form
    (sqrt and / are correctly rounded on both engines). Keys with
    n < 2 are dropped (no pairs); a zero denominator yields null.

    Scale shape: like Spearman, Kendall needs within-key row pairs,
    so each key's pruned (key, x, y) triples co-locate through ONE
    hash exchange; pair enumeration is vectorized ACROSS every group
    of a partition (repeat/offset index arithmetic — no per-group
    Python loop) and the three pair sums reduce per group with
    np.add.reduceat. Pair count is Σ n_g², so per-key row counts must
    stay partition-sized — the documented bounded-group assumption
    shared with sessions/rolling (pre-aggregate or sample a
    pathological key upstream; the certified alternative at web scale
    is a merge-sort inversion count, not implemented).
    """
    import math  # noqa: F401  (kept for parity with the docstring)

    import ray

    import pyarrow.compute as pc

    from .shuffle import hash_group_apply

    def prune(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key: batch[key],
                "x": pc.cast(batch[x_col], pa.int64()),
                "y": batch[y_col],
            }
        )

    pruned = (
        prune(ds) if isinstance(ds, pa.Table)
        else ds.map_batches(
            prune, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def final(tbl, starts):
        empty = pa.table(
            {
                key: pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "tau": pa.array([], type=pa.float64()),
            }
        )
        if tbl is None or tbl.num_rows == 0:
            return empty
        keys = tbl[key].to_numpy(zero_copy_only=False)
        xs = tbl["x"].to_numpy(zero_copy_only=False)
        ys = tbl["y"].to_numpy(zero_copy_only=False)
        n = len(keys)
        starts = np.asarray(starts, dtype=np.int64)
        sizes = np.diff(np.append(starts, n))
        valid = sizes >= 2
        if not valid.any():
            return empty
        # pair enumeration across ALL groups at once: local position p
        # pairs with the n_g−1−p following rows of its group
        pos = np.arange(n) - np.repeat(starts, sizes)
        cnt = np.repeat(sizes, sizes) - 1 - pos
        T = int(cnt.sum())
        left = np.repeat(np.arange(n), cnt)
        run0 = np.cumsum(cnt) - cnt
        right = np.arange(T) - np.repeat(run0, cnt) + left + 1
        sx = np.sign(xs[right] - xs[left]).astype(np.int64)
        dyl, dyr = ys[left], ys[right]
        sy = (dyr > dyl).astype(np.int64) - (dyr < dyl).astype(np.int64)
        # pairs of one group are contiguous, and size<2 groups emit no
        # pairs — so valid groups' ranges tile [0, T) back-to-back and
        # reduceat at their starts is the exact per-group sum
        pg = (sizes * (sizes - 1)) // 2
        pstart = (np.cumsum(pg) - pg)[valid]
        cd = np.add.reduceat(sx * sy, pstart)
        n1 = np.add.reduceat((sx == 0).astype(np.int64), pstart)
        n2 = np.add.reduceat((sy == 0).astype(np.int64), pstart)
        n0 = pg[valid]
        denx, deny = n0 - n1, n0 - n2
        ok = (denx > 0) & (deny > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            tauv = cd.astype(np.float64) / np.sqrt(
                denx.astype(np.float64) * deny.astype(np.float64)
            )
        return pa.table(
            {
                key: pa.array(keys[starts[valid]], type=pa.int64()),
                "n": pa.array(sizes[valid].astype(np.int64)),
                "tau": pa.array(
                    np.where(ok, tauv, 0.0), type=pa.float64(),
                    mask=~ok,
                ),
            }
        )

    refs = hash_group_apply(pruned, [key], final, return_refs=True)
    tabs = [t for t in ray.get(refs) if t is not None and t.num_rows]
    if not tabs:
        return final(None, [])
    return pa.concat_tables(tabs).combine_chunks().sort_by(key)


def grouped_ols(ds, key: str, x_col: str, y_col: str) -> pa.Table:
    """Grouped simple linear regression (OLS slope + intercept) of
    integer ``y_col`` on integer ``x_col`` — the per-segment trend
    statistic (``regr_slope`` / ``regr_intercept``) a curation
    pipeline runs to monitor drift per source/type over time.

    Exactness: per-batch Arrow group_by sums of the five integer
    moments (n, Σx, Σy, Σx², Σxy) — int64-safe inside a batch under
    the caller's domain bound, asserted here — are merged on the
    driver in Python ints (``grouped_sums_exact`` discipline, exact at
    any magnitude), and each output is ONE correctly-rounded IEEE
    division of two exact integers:

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)

    mirrored in SQL by ``CAST(HUGEINT AS DOUBLE) / CAST(... AS
    DOUBLE)`` (the gini-validated cast pair). Zero-variance-x groups
    emit null slope/intercept.

    Scale shape: the corpus never shuffles — only ≤ n_groups partial
    rows per block reach the driver (low-cardinality-key contract of
    ``grouped_sums_exact``).
    """
    from .agg import grouped_sums_exact

    def partial(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(x)
        if n:
            mx = int(np.abs(x).max())
            my = int(np.abs(y).max())
            if max(mx * mx, mx * my) * n >= (1 << 62):
                raise AssertionError(
                    "grouped_ols: per-batch moment bound exceeded — "
                    "rescale x/y (e.g. days not µs) so |x|²·rows and "
                    "|x·y|·rows fit int64"
                )
        return pa.table(
            {
                key: b[key],
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxx": pa.array(x * x),
                "sxy": pa.array(x * y),
            }
        )

    if isinstance(ds, pa.Table):
        # driver-local replica: one Arrow group_by over the int64
        # moment columns (same per-batch bound assertion applies)
        g = partial(ds).group_by([key], use_threads=False).aggregate(
            [("sx", "sum"), ("sy", "sum"), ("sxx", "sum"),
             ("sxy", "sum"), ([], "count_all")]
        )
        g = g.rename_columns([key, "sx", "sy", "sxx", "sxy", "n"])
        rows = g.to_pylist()
    else:
        rows = grouped_sums_exact(
            ds.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            [key], sum_cols=["sx", "sy", "sxx", "sxy"],
            count_col="n",
        )
    rows.sort(key=lambda r: r[key])
    ks, ns, slopes, icepts = [], [], [], []
    for r in rows:
        n = int(r["n"])
        sx, sy = int(r["sx"]), int(r["sy"])
        sxx, sxy = int(r["sxx"]), int(r["sxy"])
        den = n * sxx - sx * sx
        ks.append(r[key])
        ns.append(n)
        if den == 0:
            slopes.append(None)
            icepts.append(None)
        else:
            slopes.append(float(n * sxy - sx * sy) / float(den))
            icepts.append(float(sy * sxx - sx * sxy) / float(den))
    key_type = pa.int64() if ks and isinstance(ks[0], int) else pa.string()
    return pa.table(
        {
            key: pa.array(ks, type=key_type),
            "n": pa.array(ns, type=pa.int64()),
            "slope": pa.array(slopes, type=pa.float64()),
            "intercept": pa.array(icepts, type=pa.float64()),
        }
    )


def grouped_ttest(ds, key: str, cohort_col: str, value_col: str) -> pa.Table:
    """Grouped two-sample pooled t² statistic — the A/B-experiment
    readout (is cohort 1's mean different from cohort 0's?), exact:
    with per-cohort integer moments (n_i, s_i = Σv, q_i = Σv²),

        A  = n1·q1 − s1²          (cohort-1 scaled SS)
        B  = n0·q0 − s0²
        D  = s1·n0 − s0·n1        (scaled mean difference)
        t² = D²·(n0+n1−2) / ((A·n0 + B·n1)·(n0+n1))

    — the pooled-variance Student t squared, derived so numerator and
    denominator are EXACT integers (Python ints on the driver merge,
    HUGEINT in the SQL mirror) and t² is ONE correctly-rounded
    division. mean0/mean1 are likewise single mirrored divisions.
    Groups where either cohort has < 2 rows, or with zero pooled
    variance, emit null t².

    ``cohort_col`` must be 0/1 int64. Scale shape: per-batch Arrow
    (key, cohort) moment partials; the corpus never shuffles
    (grouped_sums_exact low-cardinality-key contract).
    """
    from .agg import grouped_sums_exact

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v):
            mv = int(np.abs(v).max())
            if mv * mv * len(v) >= (1 << 62):
                raise AssertionError(
                    "grouped_ttest: per-batch Σv² bound exceeded — "
                    "rescale the value column"
                )
        return pa.table(
            {
                key: b[key],
                cohort_col: b[cohort_col],
                "s": pa.array(v),
                "q": pa.array(v * v),
            }
        )

    if isinstance(ds, pa.Table):
        g = partial(ds).group_by(
            [key, cohort_col], use_threads=False
        ).aggregate([("s", "sum"), ("q", "sum"), ([], "count_all")])
        g = g.rename_columns([key, cohort_col, "s", "q", "n"])
        rows = g.to_pylist()
    else:
        rows = grouped_sums_exact(
            ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True),
            [key, cohort_col], sum_cols=["s", "q"], count_col="n",
        )
    sides: dict = {}
    for r in rows:
        sides.setdefault(r[key], {})[int(r[cohort_col])] = (
            int(r["n"]), int(r["s"]), int(r["q"])
        )
    ks = sorted(sides)
    n0s, n1s, m0s, m1s, tsqs = [], [], [], [], []
    for k in ks:
        n0, s0, q0 = sides[k].get(0, (0, 0, 0))
        n1, s1, q1 = sides[k].get(1, (0, 0, 0))
        n0s.append(n0)
        n1s.append(n1)
        m0s.append(float(s0) / float(n0) if n0 else None)
        m1s.append(float(s1) / float(n1) if n1 else None)
        if n0 < 2 or n1 < 2:
            tsqs.append(None)
            continue
        A = n1 * q1 - s1 * s1
        B = n0 * q0 - s0 * s0
        D = s1 * n0 - s0 * n1
        den = (A * n0 + B * n1) * (n0 + n1)
        tsqs.append(
            float(D * D * (n0 + n1 - 2)) / float(den)
            if den > 0
            else None
        )
    key_type = pa.int64() if ks and isinstance(ks[0], int) else pa.string()
    return pa.table(
        {
            key: pa.array(ks, type=key_type),
            "n0": pa.array(n0s, type=pa.int64()),
            "n1": pa.array(n1s, type=pa.int64()),
            "mean0": pa.array(m0s, type=pa.float64()),
            "mean1": pa.array(m1s, type=pa.float64()),
            "tsq": pa.array(tsqs, type=pa.float64()),
        }
    )


def theil_sen(ds, key: str, x_col: str, y_col: str) -> pa.Table:
    """Grouped Theil–Sen robust slope — the median of all pairwise
    slopes (y_j − y_i)/(x_j − x_i) over i < j in x order, the outlier
    -resistant alternative to OLS for noisy per-key trend lines.

    Exactness: each pairwise slope is FLOOR-QUANTIZED to
    ``floor(Δy·2^30 / Δx)`` — one exact integer floor division per
    pair (Python ints, no float step), so the median is a SELECTION
    over exact int64 values: the smallest slope with cumulative count
    ≥ ceil(n_pairs/2) (DuckDB ``quantile_disc(0.5)``; the SQL mirror
    corrects DuckDB's truncate-toward-zero ``//`` to floor with a
    remainder CASE). Duplicate x within a key is an error (slope
    undefined).

    Scale shape: (key, x) must be low-cardinality (periods, not raw
    rows) — per-batch Arrow sum partials of y, exact Python-int
    driver merge (grouped_sums_exact), then the O(periods²) pair
    scan runs on the driver per key. → (key, n_points, n_pairs,
    qslope_med), sorted by key."""
    from .agg import grouped_sums_exact

    if isinstance(ds, pa.Table):
        g = ds.group_by([key, x_col], use_threads=False).aggregate(
            [(y_col, "sum")]
        )
        rows = [
            {key: k, x_col: x, y_col: int(v)}
            for k, x, v in zip(
                g[key].to_pylist(), g[x_col].to_pylist(),
                g[f"{y_col}_sum"].to_pylist()
            )
        ]
    else:
        rows = grouped_sums_exact(ds, [key, x_col], sum_cols=[y_col])
    rows.sort(key=lambda r: (r[key], r[x_col]))
    SCALE = 1 << 30
    keys, npts, nprs, meds = [], [], [], []
    i, m = 0, len(rows)
    while i < m:
        k = rows[i][key]
        j = i
        while j < m and rows[j][key] == k:
            j += 1
        xs = [int(r[x_col]) for r in rows[i:j]]
        ys = [int(r[y_col]) for r in rows[i:j]]
        n = len(xs)
        if len(set(xs)) != n:
            raise ValueError(
                f"theil_sen: duplicate x within key {k!r}"
            )
        slopes = []
        for a in range(n):
            for b in range(a + 1, n):
                num = (ys[b] - ys[a]) * SCALE
                den = xs[b] - xs[a]
                slopes.append(num // den)  # Python floor division
        slopes.sort()
        np_ = len(slopes)
        if np_ == 0:
            med = None
        else:
            med = slopes[(np_ + 1) // 2 - 1]
            if not -(1 << 63) <= med < (1 << 63):
                raise AssertionError(
                    "theil_sen: quantized slope exceeds int64 — "
                    "rescale y"
                )
        keys.append(k)
        npts.append(n)
        nprs.append(np_)
        meds.append(med)
        i = j
    key_t = pa.int64() if keys and isinstance(keys[0], int) else pa.string()
    return pa.table(
        {
            key: pa.array(keys, type=key_t),
            "n_points": pa.array(npts, type=pa.int64()),
            "n_pairs": pa.array(nprs, type=pa.int64()),
            "qslope_med": pa.array(meds, type=pa.int64()),
        }
    )


def ks_2samp(ds, side_col: str, value_col: str) -> pa.Table:
    """Exact two-sample Kolmogorov–Smirnov statistic — the
    distribution-drift test between two cohorts of an integer column
    (``side_col`` ∈ {0, 1}):

        D = max_v |F1(v)·n0 − F0(v)·n1| / (n1·n0)

    The numerator is computed over the DISTINCT value grid with exact
    integer cumulative counts (supremum over step points is attained
    at data values), so ``d_num`` is exact and ``d`` is ONE mirrored
    HUGEINT→DOUBLE division. → one row (n1, n0, d_num, d).

    Scale shape: per-batch Arrow (value, side-count) partials — only
    the distinct-value histogram moves (the grouped_quantiles
    contract; cost is O(distinct values), never O(rows)); the
    cumulative walk runs on the driver in Python ints."""
    from .agg import grouped_sums_exact

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        s = b[side_col]
        return pa.table(
            {
                value_col: b[value_col],
                "c1": pc2.cast(s, pa.int64()),
                "c0": pc2.subtract(
                    pa.scalar(1, type=pa.int64()),
                    pc2.cast(s, pa.int64()),
                ),
            }
        )

    if isinstance(ds, pa.Table):
        t = partial(ds)
        g = t.group_by([value_col], use_threads=False).aggregate(
            [("c1", "sum"), ("c0", "sum")]
        )
        rows = [
            {value_col: v, "c1": int(a), "c0": int(b_)}
            for v, a, b_ in zip(
                g[value_col].to_pylist(), g["c1_sum"].to_pylist(),
                g["c0_sum"].to_pylist()
            )
        ]
    else:
        rows = grouped_sums_exact(
            ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True),
            [value_col], sum_cols=["c1", "c0"],
        )
    rows.sort(key=lambda r: r[value_col])
    n1 = sum(int(r["c1"]) for r in rows)
    n0 = sum(int(r["c0"]) for r in rows)
    if n1 == 0 or n0 == 0:
        raise ValueError("ks_2samp: both sides must be non-empty")
    f1 = f0 = 0
    d_num = 0
    for r in rows:
        f1 += int(r["c1"])
        f0 += int(r["c0"])
        d_num = max(d_num, abs(f1 * n0 - f0 * n1))
    if d_num >= (1 << 63):
        raise AssertionError("ks_2samp: d_num exceeds int64")
    return pa.table(
        {
            "n1": pa.array([n1], type=pa.int64()),
            "n0": pa.array([n0], type=pa.int64()),
            "d_num": pa.array([d_num], type=pa.int64()),
            "d": pa.array(
                [float(d_num) / float(n1 * n0)], type=pa.float64()
            ),
        }
    )


def mannwhitney_u(ds, side_col: str, value_col: str) -> pa.Table:
    """Exact Mann–Whitney U (Wilcoxon rank-sum) between two cohorts
    of an integer column — the nonparametric A/B test that, unlike
    the t-test, survives heavy tails. Ties get midranks; to stay
    integer the op reports ``u2 = 2·U1`` exactly:

        2·R1 = Σ_v c1_v · (2·cum_before_v + cnt_v + 1)
        u2   = 2·R1 − n1·(n1 + 1),      u = u2 / 2.0

    (c1_v / c0_v = per-side counts at distinct value v; cum_before =
    rows of either side strictly below v). One mirrored halving for
    ``u``; everything else is exact Python-int arithmetic.

    Scale shape: identical to ``ks_2samp`` — only the distinct-value
    histogram moves, the walk runs on the driver."""
    from .agg import grouped_sums_exact

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        s = b[side_col]
        return pa.table(
            {
                value_col: b[value_col],
                "c1": pc2.cast(s, pa.int64()),
                "c0": pc2.subtract(
                    pa.scalar(1, type=pa.int64()),
                    pc2.cast(s, pa.int64()),
                ),
            }
        )

    if isinstance(ds, pa.Table):
        t = partial(ds)
        g = t.group_by([value_col], use_threads=False).aggregate(
            [("c1", "sum"), ("c0", "sum")]
        )
        rows = [
            {value_col: v, "c1": int(a), "c0": int(b_)}
            for v, a, b_ in zip(
                g[value_col].to_pylist(), g["c1_sum"].to_pylist(),
                g["c0_sum"].to_pylist()
            )
        ]
    else:
        rows = grouped_sums_exact(
            ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True),
            [value_col], sum_cols=["c1", "c0"],
        )
    rows.sort(key=lambda r: r[value_col])
    n1 = sum(int(r["c1"]) for r in rows)
    n0 = sum(int(r["c0"]) for r in rows)
    if n1 == 0 or n0 == 0:
        raise ValueError("mannwhitney_u: both sides must be non-empty")
    cumb = 0
    r2 = 0
    for r in rows:
        c1, c0 = int(r["c1"]), int(r["c0"])
        cnt = c1 + c0
        r2 += c1 * (2 * cumb + cnt + 1)
        cumb += cnt
    u2 = r2 - n1 * (n1 + 1)
    if not 0 <= u2 < (1 << 63):
        raise AssertionError("mannwhitney_u: u2 out of int64 range")
    return pa.table(
        {
            "n1": pa.array([n1], type=pa.int64()),
            "n0": pa.array([n0], type=pa.int64()),
            "u2": pa.array([u2], type=pa.int64()),
            "u": pa.array([u2 / 2.0], type=pa.float64()),
        }
    )


def gini_split_scan(ds, key: str, label_col: str,
                    value_col: str) -> pa.Table:
    """Decision-tree split scan — for every candidate threshold t
    (each distinct value; split is v ≤ t) of an integer feature and a
    0/1 label, the EXACT scaled Gini impurity numerators of both
    sides:

        gl_num = n_L² − m1² − m0²        (× n_L gives n_L²·gini_L)
        gr_num = n_R² − r1² − r0²

    (m/r = per-side class counts). Impurities stay rational —
    weighted gini = gl_num/n_L + gr_num/n_R — so the op reports the
    integer numerators and side sizes and leaves the (tiny) argmin
    to the consumer, keeping everything bit-exact and SQL-mirrored.
    Thresholds with an empty right side are dropped.

    Scale shape: the ks_2samp discipline — only the distinct-value
    histogram (key, value, c1, c0) moves; cumulative walk on the
    driver. → (key, threshold, n_l, n_r, gl_num, gr_num)."""
    from .agg import grouped_sums_exact

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        y = b[label_col]
        return pa.table(
            {
                key: b[key],
                value_col: b[value_col],
                "c1": pc2.cast(y, pa.int64()),
                "c0": pc2.subtract(
                    pa.scalar(1, type=pa.int64()),
                    pc2.cast(y, pa.int64()),
                ),
            }
        )

    rows = grouped_sums_exact(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        [key, value_col], sum_cols=["c1", "c0"],
    )
    rows.sort(key=lambda r: (r[key], r[value_col]))
    ks, ts, nls, nrs, gls, grs = [], [], [], [], [], []
    i, m = 0, len(rows)
    while i < m:
        k = rows[i][key]
        j = i
        while j < m and rows[j][key] == k:
            j += 1
        seg = rows[i:j]
        t1 = sum(int(r["c1"]) for r in seg)
        t0 = sum(int(r["c0"]) for r in seg)
        n = t1 + t0
        m1 = m0 = 0
        for r in seg:
            m1 += int(r["c1"])
            m0 += int(r["c0"])
            n_l = m1 + m0
            n_r = n - n_l
            if n_r == 0:
                continue
            r1, r0 = t1 - m1, t0 - m0
            gl = n_l * n_l - m1 * m1 - m0 * m0
            gr = n_r * n_r - r1 * r1 - r0 * r0
            if gl >= (1 << 63) or gr >= (1 << 63):
                raise AssertionError(
                    "gini_split_scan: numerator exceeds int64"
                )
            ks.append(k)
            ts.append(int(r[value_col]))
            nls.append(n_l)
            nrs.append(n_r)
            gls.append(gl)
            grs.append(gr)
        i = j
    key_t = pa.int64() if ks and isinstance(ks[0], int) else pa.string()
    return pa.table(
        {
            key: pa.array(ks, type=key_t),
            "threshold": pa.array(ts, type=pa.int64()),
            "n_l": pa.array(nls, type=pa.int64()),
            "n_r": pa.array(nrs, type=pa.int64()),
            "gl_num": pa.array(gls, type=pa.int64()),
            "gr_num": pa.array(grs, type=pa.int64()),
        }
    )
