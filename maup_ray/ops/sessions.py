"""Event sessionization — gap-based streaming windows per key.

``sessionize``: events grouped per user; a new session starts when the
gap to the previous event exceeds ``gap``. One keyed shuffle
(groupby(user_id)), per-group vectorized diff/cumsum — the canonical
stateful streaming window re-expressed as a batch groupby (ordering
within the group is by timestamp, not arrival). Integer-microsecond
timestamps keep every comparison exact (SQL-oracle-safe).

PARTITIONING ASSUMPTION: one group per user — correct sessionization
requires every event of a user in one place, so per-user skew is
inherent to the semantics. A pathologically hot user (10^9 events)
bounds that group's memory; mitigate upstream by splitting such users
on coarse time ranges and stitching the boundary sessions (the
standard two-pass fix), which this op deliberately does NOT hide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["sessionize", "funnel", "retention", "session_paths"]


def sessionize(
    events,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
):
    """→ (user_id, session_id, n_events, session_start, session_end)
    with session_id numbered per user in time order from 1."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_col, kind="stable")
        # Timedelta comparison is unit-independent (datetime64[us] from
        # Arrow vs [ns] from pandas both work; raw int64 would not)
        new = (df[ts_col].diff() > gap).to_numpy().astype(np.int64)
        new[0] = 1
        sid = np.cumsum(new)
        g = pd.DataFrame(
            {
                user_col: df[user_col].to_numpy(),
                "session_id": sid,
                ts_col: df[ts_col].to_numpy(),
            }
        )
        out = g.groupby("session_id", sort=True).agg(
            **{
                user_col: (user_col, "first"),
                "n_events": (ts_col, "size"),
                "session_start": (ts_col, "min"),
                "session_end": (ts_col, "max"),
            }
        )
        out = out.reset_index()
        return out[
            [user_col, "session_id", "n_events", "session_start", "session_end"]
        ]

    if isinstance(events, pa.Table):
        df = events.to_pandas()
        parts = [
            per_user(g)
            for _, g in df.groupby(user_col, sort=True)
        ]
        return pa.Table.from_pandas(
            pd.concat(parts, ignore_index=True), preserve_index=False
        )
    # Dataset path: hash-partition grouped apply with ONE vectorized
    # pass per partition (rows arrive sorted by (user, ts); session
    # boundaries and per-session aggregates are pure diff/cumsum/
    # reduce-by-boundary arithmetic — no per-user pandas dispatch)
    from .shuffle import hash_group_apply

    def sess_part(tbl, starts):
        ts_type = (
            tbl.schema.field(ts_col).type
            if tbl is not None
            else pa.timestamp("us")
        )
        user_type = (
            tbl.schema.field(user_col).type
            if tbl is not None
            else pa.int64()
        )
        schema = pa.schema(
            [
                (user_col, user_type),
                ("session_id", pa.int64()),
                ("n_events", pa.int64()),
                ("session_start", ts_type),
                ("session_end", ts_type),
            ]
        )
        if tbl is None or len(starts) == 0:
            return schema.empty_table()
        n = len(tbl)
        ts = tbl[ts_col].to_numpy(zero_copy_only=False)
        gap_td = np.timedelta64(int(gap_minutes * 60 * 1_000_000), "us")
        new_sess = np.ones(n, dtype=bool)
        if n > 1:
            new_sess[1:] = (ts[1:] - ts[:-1]) > gap_td
        new_sess[starts] = True
        cs = np.cumsum(new_sess)
        sizes = np.diff(np.append(starts, n))
        sid = cs - np.repeat(cs[starts], sizes) + 1
        sb = np.flatnonzero(new_sess)
        se = np.append(sb[1:], n)
        return pa.table(
            {
                user_col: tbl[user_col].take(pa.array(sb)),
                "session_id": pa.array(sid[sb]),
                "n_events": pa.array(se - sb),
                "session_start": pa.array(ts[sb]).cast(ts_type),
                "session_end": pa.array(ts[se - 1]).cast(ts_type),
            }
        )

    return hash_group_apply(
        events, [user_col], sess_part, sort_cols=(ts_col,)
    )


def funnel(
    events,
    steps,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
):
    """Conversion-funnel analysis: → (user_col, steps_completed) for
    every user present in the stream, greedy earliest-first matching —
    step k+1 must occur STRICTLY after the matched step-k timestamp
    (min-ts semantics, so the result is order-independent and the SQL
    oracle's chained `min(ts) ... > prev` subqueries mirror it
    exactly).

    Scale shape: one user-keyed hash shuffle (the sessionize
    discipline), then one vectorized pass per partition — per step,
    one equality mask + one segment-min (`np.minimum.reduceat` over
    the user-contiguous sort), never a per-user loop."""
    steps = list(steps)

    def funnel_part(tbl, starts):
        user_type = (
            tbl.schema.field(user_col).type
            if tbl is not None
            else pa.int64()
        )
        schema = pa.schema(
            [
                (user_col, user_type),
                ("steps_completed", pa.int64()),
            ]
        )
        if tbl is None or len(starts) == 0:
            return schema.empty_table()
        n = len(tbl)
        nu = len(starts)
        sizes = np.diff(np.append(starts, n))
        uidx = np.repeat(np.arange(nu), sizes)
        tsi = (
            tbl[ts_col]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        LO, HI = np.iinfo(np.int64).min, np.iinfo(np.int64).max
        prev = np.full(nu, LO, dtype=np.int64)
        completed = np.zeros(nu, dtype=np.int64)
        for s in steps:
            is_s = (
                pc.equal(tbl[type_col], s)
                .to_numpy(zero_copy_only=False)
            )
            is_s = np.asarray(is_s, dtype=bool)
            cand = np.where(is_s & (tsi > prev[uidx]), tsi, HI)
            mins = np.minimum.reduceat(cand, starts)
            hit = mins < HI
            completed += hit.astype(np.int64)
            # unmatched users get prev=HI: no later step can match,
            # so completed counts the maximal PREFIX of the sequence
            prev = mins
        return pa.table(
            {
                user_col: tbl[user_col].take(pa.array(starts)),
                "steps_completed": pa.array(completed),
            }
        )

    if isinstance(events, pa.Table):
        # driver-local replica: sort by (user, ts) and reuse the
        # partition kernel with computed group starts
        import pyarrow.compute as _pc

        order = _pc.sort_indices(
            events,
            sort_keys=[(user_col, "ascending"), (ts_col, "ascending")],
        )
        t = events.take(order)
        u = t[user_col].to_numpy(zero_copy_only=False)
        starts = np.r_[0, 1 + np.flatnonzero(u[1:] != u[:-1])]
        return funnel_part(t, starts)

    from .shuffle import hash_group_apply

    return hash_group_apply(
        events, [user_col], funnel_part, sort_cols=(ts_col,)
    )


def retention(
    events,
    user_col: str = "user_id",
    ts_col: str = "ts",
):
    """Cohort retention: → (cohort, offset_days, n_users) — for every
    user, cohort = first active calendar day, and each of the user's
    distinct active days contributes one count at its day offset from
    the cohort. The classic product-analytics rollup
    (``count(distinct user)`` per cohort × day-offset).

    Scale shape: per-batch distinct ``(user, day)`` projection (day =
    exact int32 epoch-days, 12 B/row) → ONE user-keyed hash shuffle;
    each partition re-dedups its pairs (per-batch distinct is not
    global), reads every user's cohort as the group-start day of the
    (user, day)-sorted run, and pre-counts (cohort, offset) pairs —
    users land in exactly one partition, so partition counts are
    disjoint user sets and the final reduce is a plain integer sum
    over ≤ |days|² partial rows per partition."""
    _DAY_US = 86_400_000_000

    def days(b: pa.Table) -> pa.Table:
        from .temporal import _ts_i64

        d = (_ts_i64(b[ts_col]) // _DAY_US).astype(np.int32)
        t = pa.table({user_col: b[user_col], "day": pa.array(d)})
        return t.group_by([user_col, "day"], use_threads=False).aggregate([])

    def part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        schema = pa.schema(
            [
                ("cohort", pa.date32()),
                ("offset_days", pa.int64()),
                ("n_users", pa.int64()),
            ]
        )
        if tbl is None or len(tbl) == 0:
            return schema.empty_table()
        u = tbl[user_col].to_numpy(zero_copy_only=False)
        d = tbl["day"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(u)
        # global (user, day) dedup: rows are sorted by (user, day)
        keep = np.ones(n, dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        u, d = u[keep], d[keep]
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        gstart = np.flatnonzero(first)
        sizes = np.diff(np.append(gstart, len(u)))
        cohort = np.repeat(d[gstart], sizes)
        off = d - cohort
        pairs = pa.table(
            {
                "cohort": pa.array(cohort.astype(np.int32), pa.date32()),
                "offset_days": pa.array(off),
            }
        )
        g = pairs.group_by(["cohort", "offset_days"], use_threads=False)
        out = g.aggregate([([], "count_all")])
        return out.rename_columns(["cohort", "offset_days", "n_users"])

    from .shuffle import group_starts, hash_group_apply

    if isinstance(events, pa.Table):
        t = days(events).combine_chunks().sort_by(
            [(user_col, "ascending"), ("day", "ascending")]
        )
        partial = part(t, group_starts(t, [user_col]))
        g = partial.group_by(
            ["cohort", "offset_days"], use_threads=False
        ).aggregate([("n_users", "sum")])
        g = g.rename_columns(["cohort", "offset_days", "n_users"])
        return g.combine_chunks().sort_by(
            [("cohort", "ascending"), ("offset_days", "ascending")]
        )
    pre = events.map_batches(
        days, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = hash_group_apply(pre, [user_col], part, sort_cols=("day",))
    from .agg import grouped_sum_count

    out = grouped_sum_count(
        partials,
        ["cohort", "offset_days"],
        sum_cols=["n_users"],
        final="driver",
    )
    return out.combine_chunks().sort_by(
        [("cohort", "ascending"), ("offset_days", "ascending")]
    )


def session_paths(
    events,
    gap_minutes: float = 360.0,
    min_count: int = 5,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    sep: str = " ",
):
    """Frequent session paths — the product-analytics "what do users
    do in one sitting" rollup: sessionize per user (gap rule as in
    ``sessionize``, ordering totalized by ``(ts, id)``), concatenate
    each session's event types in order into a path string, and
    return every path occurring in ``>= min_count`` sessions as
    ``(path, n_sessions)`` sorted by path.

    The threshold (not top-k) form is deliberate: per-partition
    partial counts make an above-threshold filter exact after one
    (path)-keyed sum, while an exact global top-k of counts spread
    across blocks would need the heavy-hitters two-pass — same reason
    ``frequent_ngrams`` is threshold-shaped.

    Scale shape: ONE user-keyed exchange of the pruned (user, ts, id,
    type) projection; per partition the paths are built in one
    vectorized pass (session boundaries -> ListArray offsets ->
    ``pc.binary_join``, no per-session loop) and immediately reduced
    to (path, count) partials, so the second, path-keyed exchange
    moves only distinct paths; only above-threshold paths reach the
    driver.
    """
    gap_us = int(gap_minutes * 60 * 1_000_000)

    def prune(b: pa.Table) -> pa.Table:
        return b.select([user_col, ts_col, id_col, type_col])

    def paths_part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        schema = pa.schema(
            [("path", pa.string()), ("n_sessions", pa.int64())]
        )
        if tbl is None or tbl.num_rows == 0:
            return schema.empty_table()
        from .temporal import _ts_i64

        n = tbl.num_rows
        ts = _ts_i64(tbl[ts_col])
        new_sess = np.ones(n, dtype=bool)
        if n > 1:
            new_sess[1:] = (ts[1:] - ts[:-1]) > gap_us
        new_sess[np.asarray(starts, dtype=np.int64)] = True
        sb = np.flatnonzero(new_sess)
        offsets = np.append(sb, n).astype(np.int32)
        values = tbl[type_col]
        if isinstance(values, pa.ChunkedArray):
            # ChunkedArray.combine_chunks() returns a plain Array
            values = values.combine_chunks()
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), values
        )
        paths = pc.binary_join(lists, sep)
        part = pa.table({"path": paths})
        g = part.group_by(["path"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["path", "n_sessions"])

    def final(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        schema = pa.schema(
            [("path", pa.string()), ("n_sessions", pa.int64())]
        )
        if tbl is None or len(starts) == 0:
            return schema.empty_table()
        starts = np.asarray(starts, dtype=np.int64)
        cnt = tbl["n_sessions"].to_numpy(zero_copy_only=False)
        sums = np.add.reduceat(cnt, starts)
        keep = sums >= min_count
        return pa.table(
            {
                "path": tbl["path"].take(pa.array(starts[keep])),
                "n_sessions": pa.array(sums[keep]),
            }
        )

    from .shuffle import group_starts, hash_group_apply

    if isinstance(events, pa.Table):
        t = prune(events).combine_chunks().sort_by(
            [(user_col, "ascending"), (ts_col, "ascending"),
             (id_col, "ascending")]
        )
        partial = paths_part(t, group_starts(t, [user_col]))
        s = partial.combine_chunks().sort_by([("path", "ascending")])
        return final(s, group_starts(s, ["path"]))

    pruned = events.map_batches(
        prune, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = hash_group_apply(
        pruned, [user_col], paths_part, sort_cols=(ts_col, id_col)
    )
    import ray

    refs = hash_group_apply(partials, ["path"], final, return_refs=True)
    tabs = [t for t in ray.get(refs) if t is not None and t.num_rows]
    if not tabs:
        return final(None, [])
    return pa.concat_tables(tabs).combine_chunks().sort_by(
        [("path", "ascending")]
    )
