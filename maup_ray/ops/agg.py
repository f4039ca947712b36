"""Pre-aggregated grouped reductions.

``grouped_sum_count`` pushes the combine INSIDE map_batches (Arrow's
C++ ``Table.group_by`` per batch), so the all-to-all shuffle moves only
per-batch partials (n_groups × n_blocks rows) instead of every input
row — the "partial aggregation before the wide shuffle" discipline for
count/sum-shaped reductions over low-cardinality keys. At 10^12 rows
with 256 districts this is the difference between shuffling 10^12 rows
and shuffling ~256 × n_blocks.

Sums stay exact when the inputs are integers (int64 partial sums re-sum
exactly in any order — the same exactness discipline the SQL oracles
rely on).
"""

from __future__ import annotations

import pyarrow as pa

__all__ = [
    "grouped_sum_count",
    "grouped_sums_exact",
    "grouped_minmax",
    "grouped_rollup",
    "profile_columns",
]


def grouped_sum_count(
    ds,
    keys,
    sum_cols=(),
    count_col: str | None = None,
    final: str = "shuffle",
):
    """groupby(keys) computing sum(c) per ``sum_cols`` (aliased to the
    same names) and optionally count(*) as ``count_col``.

    ``final`` picks the second stage over the partials:
    * ``"shuffle"`` (default) — Ray keyed aggregate; right when the
      group count itself is large.
    * ``"hash"`` — the same large-group-count scale shape but through
      ``ops/shuffle.hash_group_apply`` (one key-hash exchange of the
      partials + a reduceat merge per partition), skipping the Ray
      Aggregate operator's multi-second actor spin-up. Requires
      integer sum columns (reduceat merge order differs across block
      structures; integer sums are order-independent, float sums are
      not — use "shuffle" for floats).
    * ``"driver"`` — collect the partial tables (≤ n_groups rows per
      input block) and merge with one Arrow group_by on the driver;
      right for LOW-cardinality keys, where the shuffle operator's
      fixed cost dwarfs the actual work. Driver bytes are bounded by
      n_blocks × n_groups × row_width — the caller asserts that's
      small by picking this mode.

    Returns a Dataset (shuffle) or pa.Table (driver) with columns
    keys + sum_cols + [count_col].
    """
    keys = list(keys)
    sum_cols = list(sum_cols)

    def partial(batch: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sum_cols]
        if count_col is not None:
            aggs.append(([], "count_all"))
        g = batch.group_by(keys, use_threads=False).aggregate(aggs)
        names = []
        for f in g.column_names:
            if f.endswith("_sum"):
                names.append(f[: -len("_sum")])
            elif f == "count_all":
                names.append(count_col)
            else:
                names.append(f)
        return g.rename_columns(names)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    if final == "hash":
        import numpy as np

        from .shuffle import hash_group_apply

        vcols = sum_cols + ([count_col] if count_col is not None else [])

        def merge(tbl: pa.Table | None, starts):
            if tbl is None or len(tbl) == 0:
                fields = (
                    [
                        pa.field(k, tbl.schema.field(k).type)
                        for k in keys + vcols
                    ]
                    if tbl is not None
                    else [pa.field(c, pa.int64()) for c in keys + vcols]
                )
                return pa.schema(fields).empty_table()
            idx = pa.array(starts)
            cols = {k: tbl[k].take(idx) for k in keys}
            for c in vcols:
                v = tbl[c].to_numpy(zero_copy_only=False)
                if v.dtype.kind not in "iu":
                    raise TypeError(
                        f"grouped_sum_count(final='hash'): column {c} "
                        "is not integer; reduceat float merge order is "
                        "block-structure-dependent — use final='shuffle'"
                    )
                cols[c] = pa.array(np.add.reduceat(v, starts))
            return pa.table(cols)

        return hash_group_apply(partials, keys, merge)
    if final == "driver":
        import ray

        # materialize first: bare to_arrow_refs() re-executes the WHOLE
        # upstream plan a second time for the schema fetch (limit-1
        # rerun observed on the headline pipeline)
        raw = [ray.get(r) for r in partials.materialize().to_arrow_refs()]
        tabs = [t for t in raw if t.num_rows]
        if not tabs:
            # all-empty input: return a typed empty result instead of
            # calling group_by on a schema-less table (ADVICE r2).
            want = keys + sum_cols + (
                [count_col] if count_col is not None else []
            )
            for t in raw:
                if all(c in t.column_names for c in want):
                    return t.select(want)
            try:
                sch = ds.schema().base_schema
                fields = [
                    pa.field(c, sch.field(c).type) for c in keys + sum_cols
                ]
            except Exception:
                fields = [
                    pa.field(c, pa.int64()) for c in keys + sum_cols
                ]
            if count_col is not None:
                fields.append(pa.field(count_col, pa.int64()))
            return pa.schema(fields).empty_table()
        merged = pa.concat_tables(tabs)
        aggs = [(c, "sum") for c in sum_cols]
        if count_col is not None:
            aggs.append((count_col, "sum"))
        out = merged.group_by(keys, use_threads=False).aggregate(aggs)
        # rename by name-matching (Arrow group_by's output order is not
        # keys-first)
        names = [
            f[: -len("_sum")] if f.endswith("_sum") else f
            for f in out.column_names
        ]
        out = out.rename_columns(names)
        return out.select(keys + sum_cols + (
            [count_col] if count_col is not None else []
        ))
    from ray.data.aggregate import Sum

    aggs = [Sum(on=c, alias_name=c) for c in sum_cols]
    if count_col is not None:
        aggs.append(Sum(on=count_col, alias_name=count_col))
    return partials.groupby(keys).aggregate(*aggs)


def grouped_sums_exact(ds, keys, sum_cols=(), count_col: str | None = None):
    """Arbitrary-precision grouped sums for LOW-cardinality keys —
    the second-moment merge ``final="driver"`` cannot do safely at web
    scale: per-BLOCK int64 Arrow partials are overflow-safe (Σv² ≤
    2^22 rows × 2^40 per row inside a block), but the cross-block
    total (10^12 rows × v²) exceeds int64, and an Arrow/numpy merge
    would WRAP SILENTLY. Here the driver merge runs in Python ints —
    exact at any magnitude.

    Returns ``list[dict]`` (keys + sums + count as Python ints), one
    dict per group — the shape the moment-consuming callers (covar,
    grouped_outliers) feed their exact arithmetic from. Driver bytes
    are bounded by n_blocks × n_groups partial rows.
    """
    import ray

    keys = list(keys)
    sum_cols = list(sum_cols)

    def partial(batch: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sum_cols]
        if count_col is not None:
            aggs.append(([], "count_all"))
        g = batch.group_by(keys, use_threads=False).aggregate(aggs)
        names = []
        for f in g.column_names:
            if f.endswith("_sum"):
                names.append(f[: -len("_sum")])
            elif f == "count_all":
                names.append(count_col)
            else:
                names.append(f)
        return g.rename_columns(names)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    vals = sum_cols + ([count_col] if count_col is not None else [])
    tabs = [
        t
        for t in (ray.get(r) for r in
                  partials.materialize().to_arrow_refs())
        if t is not None and t.num_rows
    ]
    if not tabs:
        return []
    merged = pa.concat_tables(tabs).combine_chunks()

    # Certified int64 fast path: every intermediate partial sum of a
    # column is bounded by Σ|v| ≤ max|v|·N (any addition order), so
    # max|v|·N < 2^62 PROVES the Arrow group_by merge cannot wrap —
    # exact integers either way, just vectorized. The bound check runs
    # in Python ints (itself overflow-free). Mixed-sign columns are
    # covered by the absolute bound.
    import pyarrow.compute as pc  # noqa: F811 (module-local alias)

    n = merged.num_rows
    safe = True
    for c in vals:
        mn = pc.min(merged[c]).as_py()
        mx = pc.max(merged[c]).as_py()
        if mn is None:
            continue
        if max(abs(int(mn)), abs(int(mx))) * n >= (1 << 62):
            safe = False
            break
    if safe:
        g = merged.group_by(keys, use_threads=False).aggregate(
            [(c, "sum") for c in vals]
        )
        out = []
        cols = {c: g[f"{c}_sum"].to_pylist() for c in vals}
        kcols = {c: g[c].to_pylist() for c in keys}
        for i in range(g.num_rows):
            d = {c: kcols[c][i] for c in keys}
            d.update({c: int(cols[c][i]) for c in vals})
            out.append(d)
        return out

    # web-scale magnitudes: arbitrary-precision Python-int merge
    acc: dict = {}
    for row in merged.to_pylist():
        k = tuple(row[c] for c in keys)
        slot = acc.get(k)
        if slot is None:
            acc[k] = {c: int(row[c]) for c in vals}
        else:
            for c in vals:
                slot[c] += int(row[c])
    out = []
    for k, sums in acc.items():
        d = dict(zip(keys, k))
        d.update(sums)
        out.append(d)
    return out


def grouped_rollup(ds, keys, sum_cols=(), count_col: str | None = None):
    """SQL ``GROUP BY ROLLUP(keys)`` — every prefix level of the key
    hierarchy in one result, rolled-up key columns NULL (the reporting
    hierarchy shape: region → nation → grand total).

    Scale shape: the corpus is reduced ONCE by the finest-level
    ``grouped_sum_count`` partial discipline (per-batch Arrow combine →
    n_groups × n_blocks partial rows); every coarser level then re-sums
    the finest AGGREGATE, which has at most ∏|key domains| rows —
    driver-local by construction for a reporting hierarchy. Integer
    sum partials re-sum exactly at every level, so the rollup is
    order- and partition-invariant.

    Returns a pa.Table with columns keys + sum_cols + [count_col] and
    len(keys)+1 stacked levels (finest first, grand total last).
    """
    import pyarrow.compute as pc

    keys = list(keys)
    vals = list(sum_cols) + ([count_col] if count_col is not None else [])
    finest = grouped_sum_count(
        ds, keys, sum_cols=list(sum_cols), count_col=count_col,
        final="driver",
    )
    out_cols = keys + vals
    levels = [finest.select(out_cols)]
    for lvl in range(len(keys) - 1, -1, -1):
        gk = keys[:lvl]
        if gk:
            g = finest.group_by(gk, use_threads=False).aggregate(
                [(c, "sum") for c in vals]
            )
            names = [
                f[: -len("_sum")] if f.endswith("_sum") else f
                for f in g.column_names
            ]
            g = g.rename_columns(names)
        else:
            g = pa.table(
                {
                    c: pa.array(
                        [pc.sum(finest[c]).as_py()],
                        type=finest.schema.field(c).type,
                    )
                    for c in vals
                }
            )
        n = len(g)
        cols = {}
        for k in keys:
            cols[k] = (
                g[k]
                if k in gk
                else pa.nulls(n, type=finest.schema.field(k).type)
            )
        for c in vals:
            cols[c] = g[c]
        levels.append(pa.table(cols).select(out_cols))
    return pa.concat_tables(levels)


def grouped_cube(ds, keys, sum_cols=(), count_col: str | None = None):
    """SQL ``GROUP BY CUBE(keys)`` — every SUBSET of the key set in
    one result, absent key columns NULL (the cross-tab / OLAP shape).

    Same scale discipline as grouped_rollup: ONE corpus reduction to
    the finest aggregate (per-batch integer partials), then the other
    2^k − 1 groupings re-sum that driver-local aggregate exactly.
    """
    import pyarrow.compute as pc

    keys = list(keys)
    vals = list(sum_cols) + ([count_col] if count_col is not None else [])
    finest = grouped_sum_count(
        ds, keys, sum_cols=list(sum_cols), count_col=count_col,
        final="driver",
    )
    out_cols = keys + vals
    levels = [finest.select(out_cols)]
    for mask in range(2 ** len(keys) - 2, -1, -1):
        gk = [k for i, k in enumerate(keys) if (mask >> i) & 1]
        if gk:
            g = finest.group_by(gk, use_threads=False).aggregate(
                [(c, "sum") for c in vals]
            )
            names = [
                f[: -len("_sum")] if f.endswith("_sum") else f
                for f in g.column_names
            ]
            g = g.rename_columns(names)
        else:
            g = pa.table(
                {
                    c: pa.array(
                        [pc.sum(finest[c]).as_py()],
                        type=finest.schema.field(c).type,
                    )
                    for c in vals
                }
            )
        n = len(g)
        cols = {}
        for k in keys:
            cols[k] = (
                g[k]
                if k in gk
                else pa.nulls(n, type=finest.schema.field(k).type)
            )
        for c in vals:
            cols[c] = g[c]
        levels.append(pa.table(cols).select(out_cols))
    return pa.concat_tables(levels)


def grouped_minmax(
    ds,
    keys,
    cols,
    count_col: str | None = None,
):
    """groupby(keys) computing min_<c>/max_<c> per ``cols`` (+ optional
    count(*)) — the bbox-style geometry-keyed aggregate. Same
    partial-before-shuffle shape as ``grouped_sum_count``: each batch
    groups locally (Arrow C++), so only n_groups × n_blocks partial
    rows reach the driver merge. min/max partials re-merge exactly for
    any orderable type (no float-order caveat). Driver-final only —
    callers assert low key cardinality by choosing this op; a
    corpus-sized key domain needs ``grouped_sum_count(final="hash")``
    with min/max folded into a hash_group_apply instead."""
    import ray

    keys = list(keys)
    cols = list(cols)

    def partial(batch: pa.Table) -> pa.Table:
        aggs = [(c, "min") for c in cols] + [(c, "max") for c in cols]
        if count_col is not None:
            aggs.append(([], "count_all"))
        g = batch.group_by(keys, use_threads=False).aggregate(aggs)
        names = []
        for f in g.column_names:
            if f.endswith("_min"):
                names.append(f"min_{f[:-4]}")
            elif f.endswith("_max"):
                names.append(f"max_{f[:-4]}")
            elif f == "count_all":
                names.append(count_col)
            else:
                names.append(f)
        return g.rename_columns(names)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    raw = [ray.get(r) for r in partials.materialize().to_arrow_refs()]
    tabs = [t for t in raw if t.num_rows]
    vnames = [f"min_{c}" for c in cols] + [f"max_{c}" for c in cols]
    want = keys + vnames + ([count_col] if count_col is not None else [])
    if not tabs:
        for t in raw:
            if all(c in t.column_names for c in want):
                return t.select(want)
        return pa.schema(
            [pa.field(c, pa.int64()) for c in want]
        ).empty_table()
    merged = pa.concat_tables(tabs)
    aggs = [(f"min_{c}", "min") for c in cols] + [
        (f"max_{c}", "max") for c in cols
    ]
    if count_col is not None:
        aggs.append((count_col, "sum"))
    out = merged.group_by(keys, use_threads=False).aggregate(aggs)
    names = []
    for f in out.column_names:
        for suf in ("_min", "_max", "_sum"):
            if f.endswith(suf):
                f = f[: -len(suf)]
                break
        names.append(f)
    return out.rename_columns(names).select(want)


def profile_columns(ds, cols):
    """Per-column profile (count, nulls, min, max) in ONE streaming
    pass: per-batch scalar partials (pc.min_max / null counts — a few
    numbers per block per column), merged on the driver. Exact for any
    orderable type; numeric min/max surface as float64. Returns a
    pa.Table (column, n, n_null, min_v, max_v) sorted by column —
    the `describe` utility every ingestion pipeline runs first."""
    import numpy as np
    import pyarrow.compute as pc

    cols = list(cols)

    def partial(batch: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs = [], [], [], [], []
        for c in cols:
            arr = batch[c]
            mm = pc.min_max(arr)
            names.append(c)
            ns.append(len(arr))
            nulls.append(arr.null_count)
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
            mins.append(float(mn) if mn is not None else None)
            maxs.append(float(mx) if mx is not None else None)
        return pa.table(
            {
                "column": pa.array(names, type=pa.string()),
                "n": pa.array(np.asarray(ns, dtype=np.int64)),
                "n_null": pa.array(np.asarray(nulls, dtype=np.int64)),
                "min_v": pa.array(mins, type=pa.float64()),
                "max_v": pa.array(maxs, type=pa.float64()),
            }
        )

    import ray

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = pa.concat_tables(
        [
            t
            for t in (
                ray.get(r) for r in parts.materialize().to_arrow_refs()
            )
            if t.num_rows
        ]
    )
    g = merged.group_by(["column"], use_threads=False).aggregate(
        [("n", "sum"), ("n_null", "sum"), ("min_v", "min"), ("max_v", "max")]
    )
    names = []
    for c in g.column_names:
        for suf in ("_sum", "_min", "_max"):
            if c.endswith(suf):
                c = c[: -len(suf)]
                break
        names.append(c)
    g = g.rename_columns(names)
    return g.select(["column", "n", "n_null", "min_v", "max_v"]).sort_by(
        "column"
    )
