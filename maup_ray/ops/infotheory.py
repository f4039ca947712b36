"""Exact-quantized information-theory statistics — grouped Shannon
entropy, mutual information, and chi-square / Cramér's V over
categorical columns.

These are the feature-selection / drift monitors a training-data
curation pipeline runs continuously (how mixed is each source's
language distribution, does a label leak into a covariate, did a
categorical mix shift between snapshots), expressed in the engine's
one scale shape for categorical statistics: the **distinct-cell count
histogram**. Per-batch Arrow group_by partials reduce the corpus to
``(key, category..., count)`` rows — only those ever move — and every
statistic below is a pure function of that histogram.

Exactness discipline (CLAUDE.md): the logarithm quantizes to a
2^-30 FLOOR grid — ``q(v) = floor(ln(v)·2^30)`` — so every per-group
accumulation is exact integer arithmetic (order-independent), and each
output is a short chain of correctly-rounded IEEE ops mirrored
token-for-token in the DuckDB oracle. Why FLOOR and not round: libm
``ln`` matches DuckDB's ``ln`` bit-exactly (validated over 1..4.19M +
large spot values, zero mismatches), and the ×2^30 multiply is a pure
exponent shift (no rounding), so both sides floor the bit-identical
double — whereas ``round`` diverges on half-way ties (Python
half-even vs DuckDB half-away: 6 ties found in 1..4.19M, first at
211 245). ``text/lm.py`` predates this and keeps ``round`` with its
validated ≤200k domain; NEW quantized-log code must use
:func:`qlog_floor`.

Integer-overflow discipline: entropy/MI terms are ``c·(Σ±q)`` with
``q ≤ ln(n)·2^30``; the int64 fast path is guarded by a proven bound
(``4·n·q(n) < 2^62``) with an exact Python-int fallback past it, never
a silent wrap. Chi-square terms ``(2^30·n·c²)//(cx·cy)`` exceed int64
at n≈2000, so they always run in Python ints over the (few,
categorical-sized) cells — O(cells), never O(rows).

ref parity note: the reference repo has no statistics module; these
belong to the beyond-reference training-data family (SURVEY.md §2
"LLM-data-pipeline operators").
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

__all__ = [
    "qlog_floor",
    "grouped_entropy",
    "grouped_mutual_info",
    "grouped_chi2",
    "IT_SCALE_BITS",
]

IT_SCALE_BITS = 30
_SCALE = 1 << IT_SCALE_BITS


def qlog_floor(counts: np.ndarray) -> np.ndarray:
    """``floor(ln(c)·2^30)`` per element, int64, via libm ``math.log``
    over the distinct values only (exactness contract in the module
    docstring; numpy's SIMD log may differ from libm in the last ulp
    and is deliberately not used)."""
    uniq, inv = np.unique(counts, return_inverse=True)
    q = np.array(
        [int(math.floor(math.log(float(c)) * float(_SCALE))) for c in uniq],
        dtype=np.int64,
    )
    return q[inv]


def _qlog1(v: int) -> int:
    return int(math.floor(math.log(float(v)) * float(_SCALE)))


def _int64_entropy_safe(n_max: int) -> bool:
    """True when every entropy/MI intermediate for groups of ≤ n_max
    rows fits int64 with slack: terms are bounded by 4·n·q(n)."""
    return n_max > 0 and 4 * n_max * _qlog1(max(n_max, 2)) < (1 << 62)


def _empty(key_t, cols):
    return pa.table(
        {name: pa.array([], type=t) for name, t in [("k", key_t)] + cols}
    )


def _entropy_walk(tbl, starts, key, cat_col, n_col, out_col):
    """Per-group Shannon entropy (nats) over a (key, cat, _c)
    histogram sorted by (key, cat); groups start at ``starts``.

        H = (n·q(n) − Σ_a c_a·q(c_a)) / (n·2^30),  q(v)=floor(ln v·2^30)

    numerator and denominator are exact integers; the one float is a
    single correctly-rounded division mirrored by the oracle's
    HUGEINT→DOUBLE casts."""
    key_t = pa.int64() if tbl is None else tbl.schema.field(key).type
    if tbl is None or tbl.num_rows == 0:
        t = _empty(key_t, [(n_col, pa.int64()), (out_col, pa.float64())])
        return t.rename_columns([key, n_col, out_col])
    c = tbl["_c"].to_numpy(zero_copy_only=False).astype(np.int64)
    ns = np.add.reduceat(c, starts)
    n_max = int(ns.max())
    if _int64_entropy_safe(n_max):
        qc = qlog_floor(c)
        sum_cq = np.add.reduceat(c * qc, starts)
        qn = qlog_floor(ns)
        num = ns * qn - sum_cq
        ent = num.astype(np.float64) / (ns * np.int64(_SCALE)).astype(
            np.float64
        )
    else:  # exact Python-int fallback (arbitrary magnitude)
        counts = np.diff(np.append(starts, len(c)))
        ent = np.empty(len(starts), dtype=np.float64)
        for i, (s, g) in enumerate(zip(starts, counts)):
            n = int(ns[i])
            num = n * _qlog1(n) - sum(
                int(cv) * _qlog1(int(cv)) for cv in c[s : s + g]
            )
            ent[i] = float(num) / float(n * _SCALE)
    return pa.table(
        {
            key: tbl[key].take(pa.array(starts)),
            n_col: pa.array(ns),
            out_col: pa.array(ent),
        }
    )


def grouped_entropy(
    ds,
    key: str,
    cat_col: str,
    n_col: str = "n",
    out_col: str = "entropy",
    final: str = "shuffle",
):
    """Shannon entropy (nats) of the ``cat_col`` distribution within
    each ``key`` group. ``final="shuffle"`` walks each key's histogram
    inside one ``hash_group_apply`` partition (wide-key path, returns
    a Dataset); ``final="driver"`` merges the per-batch partials on
    the driver and returns a ``pa.Table`` (few-key path)."""
    from .agg import grouped_sum_count
    from .shuffle import group_starts, hash_group_apply

    if final == "driver":
        merged = grouped_sum_count(
            ds, [key, cat_col], count_col="_c", final="driver"
        )
        merged = merged.combine_chunks().sort_by(
            [(key, "ascending"), (cat_col, "ascending")]
        )
        starts = group_starts(merged, [key])
        return _entropy_walk(merged, starts, key, cat_col, n_col, out_col)
    hist = grouped_sum_count(
        ds, [key, cat_col], count_col="_c", final="shuffle"
    )

    def walk(tbl, starts):
        return _entropy_walk(tbl, starts, key, cat_col, n_col, out_col)

    return hash_group_apply(hist, [key], walk, sort_cols=(cat_col,))


def _cell_marginals(tbl, starts, key, x_col, y_col):
    """Per-cell marginals over a (key, x, y, _c) histogram sorted by
    (key, x, y): returns (c, n_row, cx_row, cy_row, gid) int64 arrays
    aligned with rows, plus per-group totals ``ns``.

    cx rides the sort ((key,x) runs are contiguous); cy needs a
    composite-code scatter-add since y values are not contiguous in
    this order."""
    nrows = tbl.num_rows
    c = tbl["_c"].to_numpy(zero_copy_only=False).astype(np.int64)
    ns = np.add.reduceat(c, starts)
    sizes = np.diff(np.append(starts, nrows))
    gid = np.repeat(np.arange(len(starts), dtype=np.int64), sizes)
    n_row = np.repeat(ns, sizes)

    # (key, x) runs: change points of gid or x
    x_codes = (
        tbl[x_col].combine_chunks().dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
    )
    chg = np.zeros(nrows, dtype=bool)
    chg[0] = True
    chg[1:] = (gid[1:] != gid[:-1]) | (x_codes[1:] != x_codes[:-1])
    kx_starts = np.flatnonzero(chg)
    cx = np.add.reduceat(c, kx_starts)
    cx_row = np.repeat(cx, np.diff(np.append(kx_starts, nrows)))

    # (key, y): composite code gid·|Y| + y_code, exact int64 scatter-add
    y_codes = (
        tbl[y_col].combine_chunks().dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
    )
    m = int(y_codes.max()) + 1 if nrows else 1
    comp = gid * m + y_codes
    uniq, inv = np.unique(comp, return_inverse=True)
    cy = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(cy, inv, c)
    cy_row = cy[inv]
    return c, n_row, cx_row, cy_row, gid, ns, x_codes, y_codes


def _mi_walk(tbl, starts, key, x_col, y_col, n_col, out_col):
    """Per-group mutual information (nats) between x and y:

        MI = Σ_cells c·(q(c) + q(n) − q(cx) − q(cy)) / (n·2^30)

    numerator exact int (order-independent), one mirrored division."""
    key_t = pa.int64() if tbl is None else tbl.schema.field(key).type
    if tbl is None or tbl.num_rows == 0:
        t = _empty(key_t, [(n_col, pa.int64()), (out_col, pa.float64())])
        return t.rename_columns([key, n_col, out_col])
    c, n_row, cx_row, cy_row, gid, ns, _, _ = _cell_marginals(
        tbl, starts, key, x_col, y_col
    )
    n_max = int(ns.max())
    if _int64_entropy_safe(n_max):
        term = c * (
            qlog_floor(c)
            + qlog_floor(n_row)
            - qlog_floor(cx_row)
            - qlog_floor(cy_row)
        )
        num = np.add.reduceat(term, starts)
        mi = num.astype(np.float64) / (ns * np.int64(_SCALE)).astype(
            np.float64
        )
    else:
        mi = np.empty(len(starts), dtype=np.float64)
        bounds = np.append(starts, len(c))
        for i in range(len(starts)):
            s, e = int(bounds[i]), int(bounds[i + 1])
            n = int(ns[i])
            num = sum(
                int(c[j])
                * (
                    _qlog1(int(c[j]))
                    + _qlog1(n)
                    - _qlog1(int(cx_row[j]))
                    - _qlog1(int(cy_row[j]))
                )
                for j in range(s, e)
            )
            mi[i] = float(num) / float(n * _SCALE)
    return pa.table(
        {
            key: tbl[key].take(pa.array(starts)),
            n_col: pa.array(ns),
            out_col: pa.array(mi),
        }
    )


def grouped_mutual_info(
    ds,
    key: str,
    x_col: str,
    y_col: str,
    n_col: str = "n",
    out_col: str = "mi",
    final: str = "shuffle",
):
    """Mutual information (nats) between categorical ``x_col`` and
    ``y_col`` within each ``key`` group — the label-leak / redundancy
    detector. Same final modes as :func:`grouped_entropy`."""
    from .agg import grouped_sum_count
    from .shuffle import group_starts, hash_group_apply

    if final == "driver":
        merged = grouped_sum_count(
            ds, [key, x_col, y_col], count_col="_c", final="driver"
        )
        merged = merged.combine_chunks().sort_by(
            [(key, "ascending"), (x_col, "ascending"), (y_col, "ascending")]
        )
        starts = group_starts(merged, [key])
        return _mi_walk(merged, starts, key, x_col, y_col, n_col, out_col)
    hist = grouped_sum_count(
        ds, [key, x_col, y_col], count_col="_c", final="shuffle"
    )

    def walk(tbl, starts):
        return _mi_walk(tbl, starts, key, x_col, y_col, n_col, out_col)

    return hash_group_apply(hist, [key], walk, sort_cols=(x_col, y_col))


def _chi2_walk(tbl, starts, key, x_col, y_col, n_col):
    """Per-group Pearson chi-square of independence and Cramér's V
    over a (key, x, y, _c) histogram:

        t_cell = (2^30·n·c²) // (cx·cy)          (exact floor per cell)
        chi2   = (Σt − n·2^30) / 2^30            (one HUGEINT→DOUBLE cast
                                                  + exact /2^30)
        V      = sqrt(chi2 / (n·min(r−1, s−1)))  (NULL when min(r,s)=1)

    The floor makes chi2 approximate-but-deterministic (error
    < cells·2^-30), mirrored exactly by HUGEINT ``//`` in the oracle.
    Terms exceed int64 at n≈2000 so they always run in Python ints
    over the (categorical-sized) cell list — O(cells), not O(rows)."""
    key_t = pa.int64() if tbl is None else tbl.schema.field(key).type
    cols = [
        (n_col, pa.int64()),
        ("r", pa.int64()),
        ("s", pa.int64()),
        ("chi2", pa.float64()),
        ("cramers_v", pa.float64()),
    ]
    if tbl is None or tbl.num_rows == 0:
        t = _empty(key_t, cols)
        return t.rename_columns([key] + [c for c, _ in cols])
    c, n_row, cx_row, cy_row, gid, ns, x_codes, y_codes = _cell_marginals(
        tbl, starts, key, x_col, y_col
    )
    bounds = np.append(starts, len(c))
    n_g = len(starts)
    rs = np.empty(n_g, dtype=np.int64)
    ss = np.empty(n_g, dtype=np.int64)
    chi2 = np.empty(n_g, dtype=np.float64)
    vs: list[float | None] = []
    for i in range(n_g):
        s0, e0 = int(bounds[i]), int(bounds[i + 1])
        n = int(ns[i])
        tsum = 0
        for j in range(s0, e0):
            cv = int(c[j])
            tsum += (_SCALE * n * cv * cv) // (int(cx_row[j]) * int(cy_row[j]))
        r = len(set(x_codes[s0:e0].tolist()))
        s = len(set(y_codes[s0:e0].tolist()))
        rs[i], ss[i] = r, s
        chi2[i] = float(tsum - n * _SCALE) / float(_SCALE)
        m = min(r - 1, s - 1)
        vs.append(
            math.sqrt(chi2[i] / float(n * m)) if m >= 1 else None
        )
    return pa.table(
        {
            key: tbl[key].take(pa.array(starts)),
            n_col: pa.array(ns),
            "r": pa.array(rs),
            "s": pa.array(ss),
            "chi2": pa.array(chi2),
            "cramers_v": pa.array(vs, type=pa.float64()),
        }
    )


def grouped_chi2(
    ds,
    key: str,
    x_col: str,
    y_col: str,
    n_col: str = "n",
    final: str = "shuffle",
):
    """Chi-square independence statistic + Cramér's V between
    categorical ``x_col`` and ``y_col`` per ``key`` group. Same final
    modes as :func:`grouped_entropy`; output columns
    ``[key, n, r, s, chi2, cramers_v]`` (r/s = distinct x/y counts)."""
    from .agg import grouped_sum_count
    from .shuffle import group_starts, hash_group_apply

    if final == "driver":
        merged = grouped_sum_count(
            ds, [key, x_col, y_col], count_col="_c", final="driver"
        )
        merged = merged.combine_chunks().sort_by(
            [(key, "ascending"), (x_col, "ascending"), (y_col, "ascending")]
        )
        starts = group_starts(merged, [key])
        return _chi2_walk(merged, starts, key, x_col, y_col, n_col)
    hist = grouped_sum_count(
        ds, [key, x_col, y_col], count_col="_c", final="shuffle"
    )

    def walk(tbl, starts):
        return _chi2_walk(tbl, starts, key, x_col, y_col, n_col)

    return hash_group_apply(hist, [key], walk, sort_cols=(x_col, y_col))
