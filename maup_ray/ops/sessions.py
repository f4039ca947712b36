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

__all__ = ["sessionize"]


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
    return events.groupby(user_col).map_groups(per_user)
