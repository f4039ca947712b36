"""prorate + normalize — disaggregate-then-reaggregate (ref:
intersections.py:55-99, normalize.py:4-11).

Ray-Data-first shapes:

* ``prorate`` — broadcast-hash join of the (small) source attribute
  table inside map_batches (no shuffle for the join), per-batch
  vectorized multiply, then ONE keyed shuffle:
  ``groupby(target_id).aggregate(...)`` with partial (per-block)
  pre-aggregation done by Ray Data's aggregate implementation.
* ``normalize`` — grouped weight normalization as
  ``groupby(source_id).map_groups`` (fully distributed; no broadcast
  of denominators), 0/0 → 0 (ref fine print 5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["prorate", "normalize"]

_AGGS = {"sum", "mean", "max", "min"}


class _ProrateJoin:
    """Per-batch: join data columns on source_id and multiply by weight."""

    def __init__(
        self, data, columns, source_id_col, target_id_col, weight_col,
        drop_missing=False, fill_zero=False,
    ):
        from .assign import _resolve_table

        tbl = _resolve_table(data)
        self.df = tbl.select([source_id_col] + list(columns)).to_pandas()
        self.df = self.df.set_index(source_id_col)
        self.columns = list(columns)
        self.source_id_col = source_id_col
        self.target_id_col = target_id_col
        self.weight_col = weight_col
        self.drop_missing = drop_missing
        self.fill_zero = fill_zero

    def __call__(self, batch: pa.Table) -> pa.Table:
        sid = batch[self.source_id_col].to_pandas()
        # Aggregation parity with the reference's pandas skip-NaN
        # semantics (ref intersections.py:80 + groupby.agg):
        # * sum → ``fill_zero``: missing-source products become +0 and
        #   the row is KEPT, so a target whose sources are ALL missing
        #   still aggregates to 0 like pandas (ADVICE r2).
        # * mean/max/min → ``drop_missing``: dropping NaN rows equals
        #   pandas skipna for any group with ≥1 present source; a
        #   target with ALL sources missing is dropped (pandas yields
        #   NaN) — documented divergence of the distributed plan.
        # * aggregate_by=None keeps NaN rows, matching the reference's
        #   disaggregated frame.
        if self.drop_missing and not self.fill_zero:
            present = sid.isin(self.df.index).to_numpy()
            if not present.all():
                batch = batch.filter(pa.array(present))
                sid = sid[present]
        w = batch[self.weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        looked = self.df.reindex(sid)
        cols = {
            self.source_id_col: batch[self.source_id_col],
            self.target_id_col: batch[self.target_id_col],
        }
        for c in self.columns:
            vals = looked[c].to_numpy(dtype=np.float64) * w
            if self.fill_zero:
                vals = np.where(np.isnan(vals), 0.0, vals)
            cols[c] = pa.array(vals)
        return pa.table(cols)


def prorate(
    relationship,
    data: pa.Table,
    columns,
    *,
    weight_col: str = "weight",
    source_id_col: str = "source_id",
    target_id_col: str = "target_id",
    aggregate_by="sum",
    broadcast_limit: int = 2_000_000,
):
    """``relationship``: Dataset/Table (source_id, target_id, weight).
    ``data``: Arrow table (broadcast) or Dataset (plan picked by size:
    broadcast under ``broadcast_limit`` rows, else hash co-shuffle).

    aggregate_by=None returns the disaggregated (source,target) rows
    without reaggregation — the plain-assignment behavior pinned at
    tests/test_prorate.py:43-56 (ref fine print 4).
    """
    import ray

    columns = list(columns)
    if not isinstance(data, pa.Table):
        # Dataset attribute side: pick the physical plan by size.
        # Small side (row count from parquet/block metadata — cheap) →
        # broadcast-hash join, the same small-side discipline as
        # normalize's broadcast_limit. Anything bigger → hash-partition
        # co-shuffle join (both sides shuffled on source_id). Ray's
        # shuffle join costs ~6x the broadcast plan at bench scale, so
        # broadcast whenever the side provably fits a worker heap.
        n_data = data.count()
        if n_data > broadcast_limit or n_data == 0:
            return _prorate_hash_join(
                relationship, data, columns, weight_col, source_id_col,
                target_id_col, aggregate_by,
            )
        tabs = [
            t
            for t in (ray.get(r) for r in data.materialize().to_arrow_refs())
            if t.num_rows
        ]
        data = pa.concat_tables(tabs)
    join_kwargs = dict(
        data=data,
        columns=columns,
        source_id_col=source_id_col,
        target_id_col=target_id_col,
        weight_col=weight_col,
        drop_missing=aggregate_by is not None,
        fill_zero=aggregate_by == "sum",
    )
    if isinstance(relationship, pa.Table):
        # local path: keep NaN rows and let pandas' skipna agg decide —
        # bit-for-bit reference semantics for EVERY aggregate,
        # including all-missing target groups (sum→0, mean→NaN)
        local_kwargs = dict(
            join_kwargs, drop_missing=False, fill_zero=False
        )
        out = _ProrateJoin(**local_kwargs)(relationship)
        if aggregate_by is None:
            return out
        df = out.to_pandas()
        agg = (
            df.groupby(target_id_col, sort=True)[columns]
            .agg(aggregate_by)
            .reset_index()
        )
        return pa.Table.from_pandas(agg, preserve_index=False)
    if isinstance(data, pa.Table):
        join_kwargs["data"] = ray.put(data)
    # task mode + per-worker cached instance (not an actor pool): actor
    # pools respawn on every Dataset execution; warm worker processes
    # amortize the broadcast-table fetch across jobs (same pattern as
    # assign's _cached_instance)
    from .assign import _cached_instance

    ref = join_kwargs["data"]
    key = (
        "prorate",
        ref.hex() if isinstance(ref, ray.ObjectRef) else id(ref),
        tuple(columns),
        source_id_col,
        target_id_col,
        weight_col,
        join_kwargs["drop_missing"],
        join_kwargs["fill_zero"],
    )

    def fn(batch: pa.Table) -> pa.Table:
        return _cached_instance(_ProrateJoin, key, join_kwargs)(batch)

    ds = relationship.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )
    if aggregate_by is None:
        return ds
    return _grouped_agg(ds, columns, target_id_col, aggregate_by)


def _prorate_hash_join(
    relationship, data, columns, weight_col, source_id_col,
    target_id_col, aggregate_by,
):
    import ray

    num_partitions = max(
        8, int(ray.cluster_resources().get("CPU", 8))
    )
    # Join-type parity with the broadcast plan (_ProrateJoin):
    # * sum → left_outer + zero-fill, so a target whose sources are ALL
    #   missing still aggregates to 0 like pandas skip-NaN (ADVICE r2).
    # * mean/max/min → inner: equals pandas skipna for groups with ≥1
    #   present source; all-missing groups are dropped (documented
    #   divergence — pandas yields NaN).
    # * aggregate_by=None → left_outer keeping NaN rows, matching the
    #   reference's disaggregated frame.
    fill_zero = aggregate_by == "sum"
    joined = relationship.join(
        data,
        join_type="inner"
        if (aggregate_by is not None and not fill_zero)
        else "left_outer",
        num_partitions=num_partitions,
        on=(source_id_col,),
    )

    def mul(batch: pa.Table) -> pa.Table:
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cols = {
            source_id_col: batch[source_id_col],
            target_id_col: batch[target_id_col],
        }
        for c in columns:
            v = batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            vals = v * w
            if fill_zero:
                vals = np.where(np.isnan(vals), 0.0, vals)
            cols[c] = pa.array(vals)
        return pa.table(cols)

    out = joined.map_batches(mul, batch_format="pyarrow", zero_copy_batch=True)
    if aggregate_by is None:
        return out
    return _grouped_agg(out, columns, target_id_col, aggregate_by)


def _grouped_agg(ds, columns, target_id_col, aggregate_by):
    """Grouped reaggregation. The common string aggs run as per-batch
    Arrow partials + a hash-partitioned final combine
    (ops.shuffle.hash_group_apply) — the shuffle moves only
    n_groups × n_blocks partial rows and skips the sort-based
    Aggregate operator's multi-second fixed cost. Partial sums stay
    exact for the integer-valued products the oracles rely on (every
    partial is exact, so order cannot matter). Any other
    pandas-acceptable agg (callable, 'median', ...) falls back to
    groupby().map_groups — reference parity with intersections.py:70-72
    (`.agg(aggregate_by)` accepts anything pandas does)."""
    if isinstance(aggregate_by, str) and aggregate_by in _AGGS:
        from .shuffle import hash_group_apply

        mean = aggregate_by == "mean"
        inner = "sum" if mean else aggregate_by

        def partial(batch: pa.Table) -> pa.Table:
            aggs = [(c, inner) for c in columns]
            if mean:
                aggs.append(([], "count_all"))
            g = batch.group_by([target_id_col], use_threads=False).aggregate(
                aggs
            )
            names = []
            for f in g.column_names:
                if f.endswith(f"_{inner}"):
                    names.append(f[: -len(inner) - 1])
                elif f == "count_all":
                    names.append("__n")
                else:
                    names.append(f)
            return g.rename_columns(names)

        def final_part(tbl, starts):
            if tbl is None:
                fields = [(target_id_col, pa.int64())] + [
                    (c, pa.float64()) for c in columns
                ]
                return pa.schema(fields).empty_table()
            aggs = [(c, inner) for c in columns]
            if mean:
                aggs.append(("__n", "sum"))
            g = tbl.group_by([target_id_col], use_threads=False).aggregate(
                aggs
            )
            names = []
            for f in g.column_names:
                if f.endswith(f"_{inner}") or f == "__n_sum":
                    names.append(
                        "__n" if f == "__n_sum" else f[: -len(inner) - 1]
                    )
                else:
                    names.append(f)
            g = g.rename_columns(names)
            cols = {target_id_col: g[target_id_col]}
            for c in columns:
                if mean:
                    cols[c] = pa.array(
                        g[c].to_numpy(zero_copy_only=False)
                        / g["__n"].to_numpy(zero_copy_only=False)
                    )
                else:
                    cols[c] = g[c]
            return pa.table(cols)

        return hash_group_apply(
            ds.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            [target_id_col],
            final_part,
        )

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(target_id_col)[columns].agg(aggregate_by)
        return agg.reset_index()

    return ds.groupby(target_id_col).map_groups(per_group)


def _normalize_group(df: pd.DataFrame, weight_col: str) -> pd.DataFrame:
    total = df[weight_col].sum()
    if total == 0:
        df[weight_col] = 0.0  # 0/0 → 0 (ref: normalize.py:11)
    else:
        df[weight_col] = df[weight_col] / total
    return df


def normalize(
    weights,
    *,
    level: str = "source_id",
    weight_col: str = "weight",
    strategy: str = "auto",
    broadcast_limit: int = 2_000_000,
):
    """Normalize ``weight_col`` to sum to 1 within each ``level`` group
    (ref: normalize.py:4-11).

    Physical plans: ``broadcast`` — grouped sums (partial+final
    aggregate, tiny shuffle) pulled to the driver and re-broadcast as a
    per-batch divide lookup (no row shuffle at all); ``shuffle`` —
    hash-partitioned grouped apply (ops.shuffle), fully distributed,
    for when the number of groups itself is too large to broadcast.
    ``auto`` counts the (cheap, already-aggregated) sums and picks."""
    if isinstance(weights, pa.Table):
        df = weights.to_pandas()
        out = (
            df.groupby(level, group_keys=False, sort=False)[df.columns]
            .apply(lambda g: _normalize_group(g, weight_col))
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def _shuffle_plan(ds):
        from .shuffle import hash_group_apply

        def norm_part(tbl, starts):
            if tbl is None:
                return pa.schema(
                    [(level, pa.int64()), (weight_col, pa.float64())]
                ).empty_table()
            if len(starts) == 0:
                return tbl
            w = (
                tbl[weight_col]
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
            sizes = np.diff(np.append(starts, len(w)))
            denom = np.repeat(np.add.reduceat(w, starts), sizes)
            with np.errstate(invalid="ignore", divide="ignore"):
                out = np.where(denom == 0, 0.0, w / denom)  # 0/0 → 0
            i = tbl.column_names.index(weight_col)
            return tbl.set_column(i, weight_col, pa.array(out))

        return hash_group_apply(ds, [level], norm_part)

    if strategy == "shuffle":
        return _shuffle_plan(weights)
    # two passes read the weights (sums, then divide): materialize once
    # so the upstream pipeline doesn't re-execute (blocks stay in the
    # object store and spill under pressure)
    weights = weights.materialize()
    # partial per-batch sums + driver merge: the broadcast plan pulls
    # the per-group totals to the driver ANYWAY (that's the broadcast),
    # so skip the keyed Aggregate operator's fixed cost outright —
    # driver bytes stay bounded by n_groups (broadcast_limit-guarded)
    from .agg import grouped_sum_count

    sums_tbl = grouped_sum_count(
        weights.map_batches(
            lambda b: pa.table(
                {level: b[level], "__total": b[weight_col]}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        [level],
        sum_cols=["__total"],
        final="driver",
    )
    if strategy == "auto":
        if sums_tbl.num_rows > broadcast_limit:
            return _shuffle_plan(weights)
    import ray

    totals = sums_tbl.to_pandas().set_index(level)["__total"]
    totals_ref = ray.put(totals)

    def divide(batch: pa.Table) -> pa.Table:
        t = ray.get(totals_ref)
        keys = batch[level].to_pandas()
        denom = t.reindex(keys).to_numpy(dtype=np.float64)
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            out = np.where(denom == 0, 0.0, w / denom)  # 0/0 → 0 (ref)
        i = batch.column_names.index(weight_col)
        return batch.set_column(i, weight_col, pa.array(out))

    return weights.map_batches(
        divide, batch_format="pyarrow", zero_copy_batch=True
    )
