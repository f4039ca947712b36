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

__all__ = ["sessionize", "funnel"]


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
