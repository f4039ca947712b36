"""Temporal joins and windows — as-of join, interval (range) join,
per-key rolling windowed aggregate.

The reference is a purely spatial library (no temporal operators);
these are beyond-reference operators on the custom-operator axis the
engine is asked to cover (as-of join / range join / windowed
aggregate), over the driver's ``events`` stream table. All three use
the same Ray-Data-first shape: hash-partition on the equality key (or
a coarse time bucket when the join has no key), sort each partition
once, and run ONE vectorized pass per partition via
``ops.shuffle.hash_group_apply`` — no per-row Python in the hot path.

Exactness discipline (CLAUDE.md): timestamps are compared as int64
microseconds and windowed sums run over int64 columns via prefix
sums, so every result is exact and order-independent — the DuckDB
window/join oracles match bit-for-bit.

Scale notes (100 TB shapes):
* ``rolling_window`` / ``asof_join`` shuffle only the pruned key/ts/id
  projection (~32 B/row); per-key skew is inherent to the semantics
  (same caveat as sessionize — split pathological keys on coarse time
  ranges upstream).
* ``range_join_agg`` has NO equality key: it co-partitions both sides
  on a coarse time bucket sized >= the max interval length, so each
  interval replicates to at most 2 buckets (bounded 2x blowup of the
  24 B interval rows; points never replicate), and partial aggregates
  are summed per interval in a second keyed pass. This is the
  standard distributed interval-join plan; a skewed bucket is split by
  the shuffle's partition count, not by interval replication.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "rolling_window",
    "grouped_ewma",
    "grouped_autocorr",
    "asof_join",
    "range_join_agg",
    "lag_deltas",
    "time_weighted_avg",
    "running_total",
    "merge_intervals",
    "interval_overlap_join",
    "intervalize",
    "interval_coverage",
    "cusum_changepoint",
    "gap_median",
    "peak_concurrency",
]

_US = 1_000_000


def _ts_i64(col) -> np.ndarray:
    """timestamp[us] column -> int64 microseconds (zero-copy view)."""
    v = col.to_numpy(zero_copy_only=False)
    if v.dtype.kind == "M":
        return v.astype("datetime64[us]").view(np.int64)
    return v.astype(np.int64)


# ------------------------------------------------------ rolling window


def _group_shifts(ts: np.ndarray, starts: np.ndarray, w: int):
    """Per-group offsets making ``ts + shift`` globally non-decreasing
    with >w gaps between groups, so ONE global searchsorted answers
    every within-group window query (no per-group Python). Returns
    (shift_per_group, sizes) or (None, sizes) on int64 overflow risk
    (caller falls back to a per-group loop)."""
    n = len(ts)
    sizes = np.diff(np.append(starts, n))
    if len(starts) <= 1:
        return np.zeros(len(starts), dtype=np.int64), sizes
    b = starts[1:]
    d = ts[b - 1] - ts[b] + w + 1
    shift = np.concatenate(
        [[0], np.cumsum(np.maximum(d, 0), dtype=np.int64)]
    )
    # guard: adjusted values must stay far from int64 range (the
    # searchsorted probe subtracts w once more)
    if int(shift[-1]) + int(ts.max(initial=0)) + w >= 2**62:
        return None, sizes
    return shift, sizes


def _window_bounds(ts, starts, w):
    """(left, right) index bounds of the window [ts_i - w, ts_i] within
    row i's group, for all rows at once. ts int64 us, sorted within
    each group; groups contiguous with ``starts`` offsets."""
    n = len(ts)
    shift, sizes = _group_shifts(ts, starts, w)
    if shift is not None:
        adj = ts + np.repeat(shift, sizes)
        left = np.searchsorted(adj, adj - w, side="left")
        right = np.searchsorted(adj, adj, side="right")
        return left, right
    # overflow fallback: per-group searchsorted (same arithmetic)
    left = np.empty(n, dtype=np.int64)
    right = np.empty(n, dtype=np.int64)
    bounds = np.append(starts, n)
    for g in range(len(starts)):
        s, e = bounds[g], bounds[g + 1]
        seg = ts[s:e]
        left[s:e] = s + np.searchsorted(seg, seg - w, side="left")
        right[s:e] = s + np.searchsorted(seg, seg, side="right")
    return left, right


def rolling_window(
    events,
    window_minutes: float = 60.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    sum_col: str = "event_id",
    count_name: str = "n_win",
    sum_name: str = "eid_sum",
):
    """Per-key rolling windowed aggregate: for every event, the count
    and int64 sum of ``sum_col`` over that key's events in
    ``[ts - window, ts]`` (both bounds inclusive, peers included) —
    SQL ``RANGE BETWEEN <window> PRECEDING AND CURRENT ROW``.

    -> (id_col, key_col, ts_col, count_name, sum_name)."""
    w = int(round(window_minutes * 60 * _US))

    def roll_part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        if tbl is None:
            return pa.schema(
                [
                    (id_col, pa.int64()),
                    (key_col, pa.int64()),
                    (ts_col, pa.timestamp("us")),
                    (count_name, pa.int64()),
                    (sum_name, pa.int64()),
                ]
            ).empty_table()
        ts = _ts_i64(tbl[ts_col])
        if len(tbl) == 0:
            left = right = np.empty(0, dtype=np.int64)
        else:
            left, right = _window_bounds(ts, starts, w)
        v = tbl[sum_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(v, dtype=np.int64)])
        return pa.table(
            {
                id_col: tbl[id_col],
                key_col: tbl[key_col],
                ts_col: tbl[ts_col],
                count_name: pa.array(right - left),
                sum_name: pa.array(cs[right] - cs[left]),
            }
        )

    if isinstance(events, pa.Table):
        from .shuffle import group_starts

        tbl = events.combine_chunks().sort_by(
            [(key_col, "ascending"), (ts_col, "ascending")]
        )
        return roll_part(tbl, group_starts(tbl, [key_col]))
    from .shuffle import hash_group_apply

    return hash_group_apply(
        events, [key_col], roll_part, sort_cols=(ts_col,)
    )


# ----------------------------------------------------------- asof join


def grouped_ewma(
    events,
    k_lags: int = 8,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "v",
    out_col: str = "ewma",
):
    """Per-key trailing exponential moving average with DYADIC
    half-weights, truncated at ``k_lags`` rows — the smoothing shape
    of a monitoring/feature pipeline, made exact:

        num_t = Σ_{j<m} v_{t-j} · 2^(k-1-j),   m = min(k, pos+1)
        den_t = Σ_{j<m} 2^(k-1-j)
        ewma_t = num_t / den_t

    num/den are exact int64 (weights are powers of two, v integer;
    bound: |v|·2^k per row), so the only float is ONE mirrored
    division — unlike the classic α-recurrence, whose float
    accumulation is order- and history-dependent. Rows order by
    (ts, id) within each key; the k-row truncation is what makes the
    SQL mirror a bounded rn self-join (weight ``1 << (k-1-(rn_a-rn_b))``).

    Scale shape: one keyed hash exchange, then k vectorized global
    shifts per partition (the in-group position mask keeps lags from
    crossing group boundaries — groups are contiguous after the
    partition sort). Returns (id, key, num, den, ewma) per input row.
    """

    def ewma_part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        if tbl is None or tbl.num_rows == 0:
            return pa.schema(
                [
                    (id_col, pa.int64()),
                    (key_col, pa.int64()),
                    ("num", pa.int64()),
                    ("den", pa.int64()),
                    (out_col, pa.float64()),
                ]
            ).empty_table()
        n = tbl.num_rows
        sizes = np.diff(np.append(starts, n))
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
        v = tbl[value_col].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        num = np.zeros(n, dtype=np.int64)
        den = np.zeros(n, dtype=np.int64)
        for j in range(k_lags):
            w = np.int64(1 << (k_lags - 1 - j))
            avail = pos >= j
            shifted = np.empty(n, dtype=np.int64)
            if j:
                shifted[j:] = v[:-j]
                shifted[:j] = 0
            else:
                shifted[:] = v
            num += np.where(avail, shifted * w, 0)
            den += np.where(avail, w, 0)
        ewma = num.astype(np.float64) / den.astype(np.float64)
        return pa.table(
            {
                id_col: tbl[id_col],
                key_col: tbl[key_col],
                "num": pa.array(num),
                "den": pa.array(den),
                out_col: pa.array(ewma),
            }
        )

    if isinstance(events, pa.Table):
        from .shuffle import group_starts

        tbl = events.combine_chunks().sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"),
             (id_col, "ascending")]
        )
        return ewma_part(tbl, group_starts(tbl, [key_col]))
    from .shuffle import hash_group_apply

    return hash_group_apply(
        events, [key_col], ewma_part, sort_cols=(ts_col, id_col)
    )


def grouped_autocorr(
    events,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "v",
):
    """Per-key lag-1 autocorrelation of an integer value series in
    ``(ts, id)`` order — the serial-dependence monitor (is this
    user's/sensor's signal trending or i.i.d.?) of a feature pipeline.

    Over each key's consecutive pairs (x=prev, y=cur), m = n−1 pairs:

        num = m·Σxy − Σx·Σy
        d1  = m·Σx² − (Σx)²      d2 = m·Σy² − (Σy)²
        r   = num / sqrt(d1 · d2)

    All sums and the three moments are exact int64 (domain bound
    asserted: m²·max(v)² must fit), so num/d1/d2 hash-compare as
    integers; ``r`` is the fixed IEEE dag ``CAST(num AS DOUBLE) /
    sqrt(CAST(d1 AS DOUBLE) · CAST(d2 AS DOUBLE))`` — sqrt is
    correctly rounded by IEEE-754, so DuckDB's libm mirrors it
    bit-exactly (the kendall-tau dag, ops/stats.py). Zero-variance
    sides emit null r. Keys with < 2 pairs are dropped.

    Scale shape: ONE keyed hash exchange of the pruned (key, ts, id,
    v) projection; per partition one sort + one vectorized shifted
    pass (groups are contiguous, so every group finishes locally —
    no driver merge).
    """

    def part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        empty = pa.schema(
            [
                (key_col, pa.int64()),
                ("m", pa.int64()),
                ("num", pa.int64()),
                ("d1", pa.int64()),
                ("d2", pa.int64()),
                ("r", pa.float64()),
            ]
        ).empty_table()
        if tbl is None or tbl.num_rows == 0:
            return empty
        n = tbl.num_rows
        starts = np.asarray(starts, dtype=np.int64)
        sizes = np.diff(np.append(starts, n))
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
        v = tbl[value_col].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        mv = int(np.abs(v).max()) if n else 0
        mg = int(sizes.max()) if len(sizes) else 0
        if mg * mg * mv * mv >= (1 << 62):
            raise AssertionError(
                "grouped_autocorr: m²·max|v|² exceeds int64 — "
                "rescale the value column"
            )
        prev = np.empty(n, dtype=np.int64)
        prev[1:] = v[:-1]
        prev[0] = 0
        valid = pos >= 1
        x = np.where(valid, prev, 0)
        y = np.where(valid, v, 0)
        sx = np.add.reduceat(x, starts)
        sy = np.add.reduceat(y, starts)
        sxx = np.add.reduceat(x * x, starts)
        syy = np.add.reduceat(y * y, starts)
        sxy = np.add.reduceat(x * y, starts)
        m = sizes - 1
        keep = m >= 2
        if not keep.any():
            return empty
        m, sx, sy = m[keep], sx[keep], sy[keep]
        sxx, syy, sxy = sxx[keep], syy[keep], sxy[keep]
        num = m * sxy - sx * sy
        d1 = m * sxx - sx * sx
        d2 = m * syy - sy * sy
        ok = (d1 > 0) & (d2 > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            r = num.astype(np.float64) / np.sqrt(
                d1.astype(np.float64) * d2.astype(np.float64)
            )
        return pa.table(
            {
                key_col: tbl[key_col].take(pa.array(starts[keep])),
                "m": pa.array(m),
                "num": pa.array(num),
                "d1": pa.array(d1),
                "d2": pa.array(d2),
                "r": pa.array(
                    np.where(ok, r, 0.0), type=pa.float64(), mask=~ok
                ),
            }
        )

    if isinstance(events, pa.Table):
        from .shuffle import group_starts

        tbl = events.combine_chunks().sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"),
             (id_col, "ascending")]
        )
        return part(tbl, group_starts(tbl, [key_col]))
    from .shuffle import hash_group_apply

    return hash_group_apply(
        events, [key_col], part, sort_cols=(ts_col, id_col)
    )


def asof_join(
    left,
    right,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_id_col: str = "event_id",
    right_id_col: str = "event_id",
    value_cols: tuple = (),
    out_left_id: str = "left_id",
    out_right_id: str = "right_id",
    direction: str = "backward",
):
    """Left as-of join: for each left row, the latest right row of the
    same key with ``right.ts <= left.ts`` (ties on ts broken by max
    right id — deterministic). Unmatched left rows keep nulls.
    ``direction="forward"`` mirrors it (pandas merge_asof parity):
    the EARLIEST right row with ``right.ts >= left.ts``, equal-ts
    ties broken by MIN right id. Both directions ride the same sorted
    union — the side flag swaps so the qualifying side lands adjacent
    in sort order, and the fill runs as a prefix-max (backward) or
    suffix-min (forward) of right indices.

    -> (out_left_id, key_col, ts_col, out_right_id, *value_cols) with
    one row per left row. Each value_cols element is a right-side
    column name or a ``(src, out)`` rename pair. Accepts Tables or
    Datasets; both sides are projected to (key, ts, id, values) before
    the shuffle, unioned with a side flag, and resolved in one
    vectorized forward-fill pass per hash partition."""
    pairs = [
        (c, c) if isinstance(c, str) else tuple(c) for c in value_cols
    ]
    val = [out for _, out in pairs]
    # value columns keep their SOURCE Arrow type end to end (a float64
    # cast here corrupted int64 values above 2^53 — ADVICE r3); the
    # left side's typed nulls are derived from the right schema
    rsch = right.schema if isinstance(right, pa.Table) else right.schema()
    if hasattr(rsch, "base_schema"):  # ray.data.Schema wrapper
        rsch = rsch.base_schema
    val_types = {out: rsch.field(src).type for src, out in pairs}
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    fwd = direction == "forward"
    nearest = direction == "nearest"
    # sort is (key, ts, _side ASC, _id ASC); the flag assignment puts
    # the INCLUSIVE side adjacent: backward = rights before lefts at
    # equal ts, forward = lefts before rights. "nearest" uses the
    # BACKWARD layout: both candidates are computed in one pass and
    # an equal-ts right (distance 0) is exactly the backward
    # candidate, which wins distance ties by definition (pandas
    # merge_asof parity), so the forward scan not seeing equal-ts
    # rights in this layout can never change the answer.
    left_flag, right_flag = (0, 1) if fwd else (1, 0)

    def proj_left(b: pa.Table) -> pa.Table:
        n = len(b)
        cols = {
            key_col: b[key_col],
            ts_col: b[ts_col],
            "_id": b[left_id_col],
            "_side": pa.array(
                np.full(n, left_flag, dtype=np.int8)
            ),
        }
        for out in val:
            cols[out] = pa.nulls(n, type=val_types[out])
        return pa.table(cols)

    def proj_right(b: pa.Table) -> pa.Table:
        n = len(b)
        cols = {
            key_col: b[key_col],
            ts_col: b[ts_col],
            "_id": b[right_id_col],
            "_side": pa.array(
                np.full(n, right_flag, dtype=np.int8)
            ),
        }
        for src, out in pairs:
            cols[out] = b[src]
        return pa.table(cols)

    def asof_part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        schema = pa.schema(
            [
                (out_left_id, pa.int64()),
                (key_col, pa.int64() if tbl is None else tbl.schema.field(key_col).type),
                (ts_col, pa.timestamp("us") if tbl is None else tbl.schema.field(ts_col).type),
                (out_right_id, pa.int64()),
            ]
            + [(c, val_types[c]) for c in val]
        )
        if tbl is None or len(tbl) == 0:
            return schema.empty_table()
        n = len(tbl)
        side = tbl["_side"].to_numpy(zero_copy_only=False)
        is_left = side == left_flag
        # fill the nearest RIGHT row index; a carried index from a
        # neighboring group is outside this group's [start, end), so
        # the group reset is a single comparison (indices are global
        # and increasing — no per-group state)
        idx = np.arange(n, dtype=np.int64)
        sizes = np.diff(np.append(starts, n))
        if fwd:
            nxt = np.minimum.accumulate(
                np.where(~is_left, idx, n)[::-1]
            )[::-1]
            gend = np.repeat(starts + sizes, sizes)
            ok = nxt < gend
            last = nxt
        else:
            last = np.maximum.accumulate(np.where(~is_left, idx, -1))
            gstart = np.repeat(starts, sizes)
            ok = last >= gstart
            if nearest:
                nxt = np.minimum.accumulate(
                    np.where(~is_left, idx, n)[::-1]
                )[::-1]
                gend = np.repeat(starts + sizes, sizes)
                ok_f = nxt < gend
                tsv = tbl[ts_col].to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                # distances are non-negative by construction; ties
                # (incl. the equal-ts distance-0 case) go backward
                d_b = np.where(ok, tsv - tsv[np.where(ok, last, 0)],
                               np.int64(0))
                d_f = np.where(ok_f, tsv[np.where(ok_f, nxt, 0)] - tsv,
                               np.int64(0))
                use_f = ok_f & (~ok | (d_f < d_b))
                last = np.where(use_f, nxt, last)
                ok = ok | ok_f
        sel = np.flatnonzero(is_left)
        match = pa.array(
            np.where(ok[sel], last[sel], 0), mask=~ok[sel]
        )
        lrows = tbl.take(pa.array(sel))
        cols = {
            out_left_id: lrows["_id"],
            key_col: lrows[key_col],
            ts_col: lrows[ts_col],
            out_right_id: tbl["_id"].take(match),
        }
        for c in val:
            cols[c] = tbl[c].take(match)
        return pa.table(cols)

    if isinstance(left, pa.Table):
        from .shuffle import group_starts

        u = pa.concat_tables([proj_left(left), proj_right(right)])
        u = u.combine_chunks().sort_by(
            [
                (key_col, "ascending"),
                (ts_col, "ascending"),
                ("_side", "ascending"),
                ("_id", "ascending"),
            ]
        )
        return asof_part(u, group_starts(u, [key_col]))
    from .shuffle import hash_group_apply

    ds = left.map_batches(
        proj_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(
            proj_right, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    # sort order within a key group: ts asc, rights (side 0) before
    # lefts at equal ts (<= is inclusive), max-id right last at equal
    # (ts, side) — the fill picks the deterministic tie-break winner
    return hash_group_apply(
        ds, [key_col], asof_part, sort_cols=(ts_col, "_side", "_id")
    )


# ------------------------------------------------- range/interval join


def range_join_agg(
    points,
    intervals,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    interval_id_col: str = "interval_id",
    sum_col: str = "event_id",
    bucket_minutes: float | None = None,
    count_name: str = "n_win",
    sum_name: str = "eid_sum",
):
    """Interval join + aggregate with NO equality key: for each
    interval ``[start, end)``, the count and int64 sum of ``sum_col``
    over points with ``start <= ts < end``. Inner-join semantics —
    intervals with zero matching points are dropped.

    -> (interval_id_col, count_name, sum_name).

    Both sides co-partition on a coarse time bucket of width
    ``bucket_minutes`` (must be >= the longest interval; asserted per
    batch): a point lands in exactly ONE bucket, an interval
    replicates to the <= 2 buckets it overlaps, and per-bucket partial
    aggregates are summed per interval in a second keyed pass — points
    are never double-counted and never replicated."""
    if bucket_minutes is None:
        raise ValueError(
            "bucket_minutes is required and must be >= the longest "
            "interval (checked per batch)"
        )
    wb = int(round(bucket_minutes * 60 * _US))

    def proj_points(b: pa.Table) -> pa.Table:
        ts = _ts_i64(b[ts_col])
        v = b[sum_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_bucket": pa.array(ts // wb),
                "_side": pa.array(np.zeros(len(b), dtype=np.int8)),
                "_t0": pa.array(ts),
                "_t1": pa.array(np.zeros(len(b), dtype=np.int64)),
                "_iid": pa.array(v),  # carries the point's summand
            }
        )

    def proj_intervals(b: pa.Table) -> pa.Table:
        t0 = _ts_i64(b[start_col])
        t1 = _ts_i64(b[end_col])
        if np.any(t1 - t0 > wb):
            raise ValueError(
                "range_join_agg: interval longer than bucket_minutes"
            )
        iid = b[interval_id_col].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        b0 = t0 // wb
        # end is exclusive: a bucket is touched iff t0 < bucket_hi and
        # t1 > bucket_lo; last touched bucket is (t1-1)//wb
        b1 = np.maximum((t1 - 1) // wb, b0)
        reps = (b1 - b0 + 1).astype(np.int64)
        r = np.repeat(np.arange(len(b0)), reps)
        off = np.concatenate([[0], np.cumsum(reps)])[:-1]
        bucket = b0[r] + (np.arange(len(r)) - off[r])
        return pa.table(
            {
                "_bucket": pa.array(bucket),
                "_side": pa.array(np.ones(len(r), dtype=np.int8)),
                "_t0": pa.array(t0[r]),
                "_t1": pa.array(t1[r]),
                "_iid": pa.array(iid[r]),
            }
        )

    def sweep_part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        schema = pa.schema(
            [
                (interval_id_col, pa.int64()),
                (count_name, pa.int64()),
                (sum_name, pa.int64()),
            ]
        )
        if tbl is None or len(tbl) == 0:
            return schema.empty_table()
        n = len(tbl)
        side = tbl["_side"].to_numpy(zero_copy_only=False)
        t0 = tbl["_t0"].to_numpy(zero_copy_only=False)
        t1 = tbl["_t1"].to_numpy(zero_copy_only=False)
        iid = tbl["_iid"].to_numpy(zero_copy_only=False)
        bounds = np.append(starts, n)
        outs = []
        # loop is per BUCKET (coarse, bounded by time-range/width/P),
        # with fully vectorized work inside — the map_groups idiom
        for g in range(len(starts)):
            s, e = bounds[g], bounds[g + 1]
            gs = side[s:e]
            np_pts = int(np.searchsorted(gs, 1))  # points sort first
            pts_ts = t0[s : s + np_pts]
            if np_pts == 0 or np_pts == e - s:
                continue  # no points or no intervals in this bucket
            pv = iid[s : s + np_pts]
            cs = np.concatenate([[0], np.cumsum(pv, dtype=np.int64)])
            i0 = t0[s + np_pts : e]
            i1 = t1[s + np_pts : e]
            lo = np.searchsorted(pts_ts, i0, side="left")
            hi = np.searchsorted(pts_ts, i1, side="left")
            outs.append(
                pa.table(
                    {
                        interval_id_col: pa.array(iid[s + np_pts : e]),
                        count_name: pa.array(hi - lo),
                        sum_name: pa.array(cs[hi] - cs[lo]),
                    }
                )
            )
        if not outs:
            return schema.empty_table()
        return pa.concat_tables(outs)

    def final_part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        schema = pa.schema(
            [
                (interval_id_col, pa.int64()),
                (count_name, pa.int64()),
                (sum_name, pa.int64()),
            ]
        )
        if tbl is None or len(tbl) == 0:
            return schema.empty_table()
        n = len(tbl)
        k = tbl[interval_id_col].to_numpy(zero_copy_only=False)
        c = tbl[count_name].to_numpy(zero_copy_only=False)
        v = tbl[sum_name].to_numpy(zero_copy_only=False)
        tc = np.add.reduceat(c, starts)
        tv = np.add.reduceat(v, starts)
        keep = tc > 0  # inner-join: drop zero-match intervals
        return pa.table(
            {
                interval_id_col: pa.array(k[starts][keep]),
                count_name: pa.array(tc[keep]),
                sum_name: pa.array(tv[keep]),
            }
        )

    from .shuffle import group_starts, hash_group_apply

    if isinstance(points, pa.Table):
        u = pa.concat_tables(
            [proj_points(points), proj_intervals(intervals)]
        )
        u = u.combine_chunks().sort_by(
            [
                ("_bucket", "ascending"),
                ("_side", "ascending"),
                ("_t0", "ascending"),
            ]
        )
        part = sweep_part(u, group_starts(u, ["_bucket"]))
        part = part.combine_chunks().sort_by(
            [(interval_id_col, "ascending")]
        )
        return final_part(part, group_starts(part, [interval_id_col]))
    ds = points.map_batches(
        proj_points, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        intervals.map_batches(
            proj_intervals, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    partials = hash_group_apply(
        ds, ["_bucket"], sweep_part, sort_cols=("_side", "_t0")
    )
    return hash_group_apply(
        partials, [interval_id_col], final_part
    )


# ------------------------------------------------------- lag deltas


def lag_deltas(
    events,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    out_col: str = "gap_us",
):
    """Per-key LAG delta: for every row, the int64 microseconds since
    the key's PREVIOUS event in ``(ts, id)`` order (null for each
    key's first row) — the window-function shape
    ``ts - LAG(ts) OVER (PARTITION BY key ORDER BY ts, id)``.

    Scale shape: ships only the pruned ``(key, ts, id)`` projection
    (~24 B/row) through ONE key-hash shuffle; each partition is sorted
    once (Arrow C++) and the deltas are a single vectorized diff —
    group firsts are nulled via the partition's group-start offsets.
    Exact by construction (int64 microsecond arithmetic, no floats).
    """

    def part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        key_t = (
            tbl.schema.field(key_col).type if tbl is not None else pa.int64()
        )
        id_t = (
            tbl.schema.field(id_col).type if tbl is not None else pa.int64()
        )
        schema = pa.schema(
            [(id_col, id_t), (key_col, key_t), (out_col, pa.int64())]
        )
        if tbl is None or len(starts) == 0:
            return schema.empty_table()
        ts = _ts_i64(tbl[ts_col])
        n = len(ts)
        gaps = np.zeros(n, dtype=np.int64)
        gaps[1:] = ts[1:] - ts[:-1]
        first = np.zeros(n, dtype=bool)
        first[starts] = True
        return pa.table(
            {
                id_col: tbl[id_col],
                key_col: tbl[key_col],
                out_col: pa.array(gaps, mask=first),
            }
        )

    from .shuffle import group_starts, hash_group_apply

    if isinstance(events, pa.Table):
        t = events.combine_chunks().sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"),
             (id_col, "ascending")]
        )
        return part(t, group_starts(t, [key_col]))
    return hash_group_apply(
        events, [key_col], part, sort_cols=(ts_col, id_col)
    )


def running_total(
    events,
    value_col: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    out_col: str = "running_sum",
):
    """Per-key cumulative sum in ``(ts, id)`` order — the
    ``SUM(v) OVER (PARTITION BY key ORDER BY ts, id ROWS UNBOUNDED
    PRECEDING)`` window shape, exact for integer ``value_col``.

    Same scale shape as :func:`lag_deltas`: one pruned-projection
    keyed shuffle, then ONE vectorized pass per partition — a global
    cumsum re-based per group by subtracting each group's prefix
    offset (no per-key loop)."""

    def part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        key_t = (
            tbl.schema.field(key_col).type if tbl is not None else pa.int64()
        )
        id_t = (
            tbl.schema.field(id_col).type if tbl is not None else pa.int64()
        )
        schema = pa.schema(
            [(id_col, id_t), (key_col, key_t), (out_col, pa.int64())]
        )
        if tbl is None or len(starts) == 0:
            return schema.empty_table()
        v = tbl[value_col].to_numpy(zero_copy_only=False)
        if v.dtype.kind not in "iu":
            raise TypeError(
                "running_total: value_col must be integer (float "
                "cumsum is order-sensitive; convert to integer units)"
            )
        cs = np.cumsum(v.astype(np.int64))
        n = len(v)
        sizes = np.diff(np.append(starts, n))
        base = np.repeat(cs[starts] - v[starts], sizes)
        return pa.table(
            {
                id_col: tbl[id_col],
                key_col: tbl[key_col],
                out_col: pa.array(cs - base),
            }
        )

    from .shuffle import group_starts, hash_group_apply

    if isinstance(events, pa.Table):
        t = events.combine_chunks().sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"),
             (id_col, "ascending")]
        )
        return part(t, group_starts(t, [key_col]))
    return hash_group_apply(
        events, [key_col], part, sort_cols=(ts_col, id_col)
    )


def merge_intervals(ds, key_cols, start_col: str, end_col: str,
                    n_col: str = "n_merged"):
    """Gaps-and-islands: merge overlapping-or-touching integer
    ``[start, end]`` intervals per key into maximal islands — the
    availability/session-coverage shape (SQL: running ``max(end)``
    window → new-island flags → island groupby).

    One keyed exchange of the (keys, start, end) projection; per
    partition ONE vectorized pass: rows sorted by (keys, start, end),
    the within-group running max(end) computed in RANK space with a
    per-group offset (monotone rank transform preserves every
    comparison exactly and bounds the offset arithmetic inside int64
    for any partition below ~10^9 rows), islands cut where
    start > prev running max (strict — touching intervals merge).
    Island output is invariant to the order of tied (start, end) rows,
    so no tie-break column is needed and the result is
    partition-invariant.

    Returns keys + [start_col, end_col, n_col] per island.
    """
    from .shuffle import hash_group_apply

    keys = list(key_cols)
    cols = keys + [start_col, end_col]

    def prune(b: pa.Table) -> pa.Table:
        return b.select(cols)

    pruned = (
        prune(ds)
        if isinstance(ds, pa.Table)
        else ds.map_batches(
            prune, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        if tbl is None or len(tbl) == 0:
            if tbl is not None:
                t = tbl.select(cols)
                return t.append_column(
                    n_col, pa.array([], type=pa.int64())
                )
            fields = [pa.field(c, pa.int64()) for c in cols + [n_col]]
            return pa.schema(fields).empty_table()
        s = tbl[start_col].to_numpy(zero_copy_only=False)
        e = tbl[end_col].to_numpy(zero_copy_only=False)
        n = len(s)
        # rank space: strict/equal compares survive the monotone map
        uniq = np.unique(np.concatenate([s, e]))
        rs = np.searchsorted(uniq, s)
        re_ = np.searchsorted(uniq, e)
        is_gs = np.zeros(n, dtype=bool)
        is_gs[starts] = True
        gidx = np.cumsum(is_gs) - 1
        big = np.int64(len(uniq) + 1)
        acc = np.maximum.accumulate(re_ + gidx * big)
        prev = np.empty_like(acc)
        prev[0] = -1
        prev[1:] = acc[:-1]
        # first row of a group sees prev_rank < 0 → always an island
        new_island = rs > (prev - gidx * big)
        isl = np.flatnonzero(new_island)
        sizes = np.diff(np.append(isl, n))
        out = {k: tbl[k].take(pa.array(isl)) for k in keys}
        out[start_col] = pa.array(s[isl])
        out[end_col] = pa.array(np.maximum.reduceat(e, isl))
        out[n_col] = pa.array(sizes.astype(np.int64))
        return pa.table(out)

    if isinstance(pruned, pa.Table):
        from .shuffle import group_starts

        t = pruned.combine_chunks().sort_by(
            [(c, "ascending") for c in cols]
        )
        return part(t, group_starts(t, keys))
    return hash_group_apply(
        pruned, keys, part, sort_cols=[start_col, end_col]
    )


# ------------------------------------------- interval × interval join


def interval_overlap_join(
    intervals,
    bucket_us: int,
    id_col: str = "id",
    start_col: str = "s",
    end_col: str = "e",
):
    """Self-join of half-open intervals ``[s, e)`` on strict overlap →
    one row per unordered overlapping pair: ``(id_a, id_b,
    overlap_us)`` with ``id_a < id_b`` and ``overlap_us =
    min(e_a, e_b) − max(s_a, s_b)``.

    Plan (the temporal analogue of the ``dwithin`` grid join): every
    interval replicates to the fixed-width time buckets it covers —
    ≤ 2 of them, ENFORCED by requiring ``e − s ≤ bucket_us`` — and one
    keyed shuffle on the bucket co-locates every candidate pair.
    Dedup is structural: pair (a, b) is emitted only in the canonical
    bucket ``floor(max(s_a, s_b) / bucket_us)``. Both intervals of an
    overlapping pair contain the instant ``max(s_a, s_b)``, so both
    replicas are present there, and no other bucket emits it — exactly
    one emission, no post-shuffle distinct.

    Per partition (sorted by (s, id)): for row i the candidate earlier
    starters are ``j ∈ [searchsorted(s, s_i − maxlen), i)`` — a
    contiguous window because interval length is bounded — expanded
    with one vectorized repeat/arange pass and filtered on
    ``e_j > s_i`` (strict overlap) plus the canonical-bucket test.
    Candidate count per row is O(density × maxlen), the same order as
    the output itself, so no super-linear blowup.

    All-integer µs arithmetic → bit-exact vs the SQL self-join oracle.

    Scale notes (100 TB): replication ≤ 2×, payload is a 24 B
    projection; a pathological bucket (all intervals in one epoch
    window) lands in one partition — shrink ``bucket_us`` (must stay
    ≥ max length) or pre-split hot buckets, the documented
    ``hash_group_apply`` skew caveat."""
    W = int(bucket_us)
    out_schema = pa.schema(
        [
            ("id_a", pa.int64()),
            ("id_b", pa.int64()),
            ("overlap_us", pa.int64()),
        ]
    )

    def replicate(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = batch[end_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(s) and int(np.max(e - s)) > W:
            raise ValueError(
                "interval_overlap_join: interval length exceeds "
                "bucket_us — the ≤2-bucket cover argument needs "
                "max(e - s) <= bucket_us"
            )
        live = e > s  # zero-length intervals can never overlap
        ids, s, e = ids[live], s[live], e[live]
        b0 = s // W
        b1 = (e - 1) // W
        two = b1 != b0
        bucket = np.concatenate([b0, b1[two]])
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "iid": pa.array(np.concatenate([ids, ids[two]])),
                "s": pa.array(np.concatenate([s, s[two]])),
                "e": pa.array(np.concatenate([e, e[two]])),
            }
        )

    def pairs(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        if tbl is None or tbl.num_rows == 0:
            return out_schema.empty_table()
        bucket = tbl["bucket"].to_numpy(zero_copy_only=False)
        ids = tbl["iid"].to_numpy(zero_copy_only=False)
        s = tbl["s"].to_numpy(zero_copy_only=False)
        e = tbl["e"].to_numpy(zero_copy_only=False)
        outs = []
        ends = np.append(starts[1:], len(bucket))
        for p, q in zip(starts, ends):  # per bucket in this partition
            bs, be, bi = s[p:q], e[p:q], ids[p:q]
            n = q - p
            if n < 2:
                continue
            order = np.lexsort((bi, bs))
            bs, be, bi = bs[order], be[order], bi[order]
            maxlen = int(np.max(be - bs))
            lo = np.searchsorted(bs, bs - maxlen, side="left")
            cnt = np.arange(n) - lo
            total = int(cnt.sum())
            if total == 0:
                continue
            i_idx = np.repeat(np.arange(n), cnt)
            ofs = np.concatenate([[0], np.cumsum(cnt)])[:-1]
            j_idx = np.arange(total) - np.repeat(ofs, cnt) + np.repeat(
                lo, cnt
            )
            keep = be[j_idx] > bs[i_idx]
            # canonical bucket: this one must contain max(s) = s_i
            keep &= (bs[i_idx] // W) == bucket[p]
            i_idx, j_idx = i_idx[keep], j_idx[keep]
            ia = np.minimum(bi[i_idx], bi[j_idx])
            ib = np.maximum(bi[i_idx], bi[j_idx])
            ov = np.minimum(be[i_idx], be[j_idx]) - bs[i_idx]
            outs.append(
                pa.table(
                    {
                        "id_a": pa.array(ia),
                        "id_b": pa.array(ib),
                        "overlap_us": pa.array(ov),
                    },
                    schema=out_schema,
                )
            )
        if not outs:
            return out_schema.empty_table()
        return pa.concat_tables(outs)

    from .shuffle import hash_group_apply

    if isinstance(intervals, pa.Table):
        rep = replicate(intervals)
    else:
        rep = intervals.map_batches(
            replicate, batch_format="pyarrow", zero_copy_batch=True
        )
    return hash_group_apply(rep, ["bucket"], pairs, sort_cols=("s", "iid"))


def time_weighted_avg(
    events,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value_cents",
):
    """Per-key time-weighted average (TWAP): each value holds from its
    event until the key's NEXT event; the last event carries zero
    duration. Output rows ``(key, n, num, span_us, twap)`` where
    ``num = Σ vᵢ·(tᵢ₊₁−tᵢ)`` and ``span_us = t_last − t_first`` are
    exact int64 and ``twap = num / span_us`` is ONE correctly-rounded
    IEEE division (null when the key has a single event / zero span).

    Scale shape: same as :func:`lag_deltas` — one key-hash shuffle of
    the pruned ``(key, ts, id, value)`` projection, one Arrow sort +
    one vectorized diff/reduceat pass per partition. ``value_col``
    must be int64 (pre-quantize floats upstream — the exactness
    contract needs integer products). Overflow bound: per-key
    ``Σ|v|·dur ≤ max|v| · span_us`` (the durations telescope), so
    int64 holds to |v|·span ≤ 2^63 — e.g. 10⁶ cents over ~290 years;
    guard-checked per partition.
    """
    from .shuffle import group_starts, hash_group_apply

    cols = [key_col, ts_col, id_col, value_col]

    def prune(b: pa.Table) -> pa.Table:
        if not pa.types.is_integer(b.schema.field(value_col).type):
            raise TypeError(
                f"time_weighted_avg needs an integer {value_col!r}; "
                "quantize floats upstream"
            )
        return b.select(cols)

    def part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        key_t = (
            tbl.schema.field(key_col).type if tbl is not None else pa.int64()
        )
        schema = pa.schema(
            [
                (key_col, key_t),
                ("n", pa.int64()),
                ("num", pa.int64()),
                ("span_us", pa.int64()),
                ("twap", pa.float64()),
            ]
        )
        if tbl is None or len(starts) == 0:
            return schema.empty_table()
        ts = _ts_i64(tbl[ts_col])
        v = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ts)
        ends = np.append(starts[1:], n)
        dur = np.zeros(n, dtype=np.int64)
        dur[:-1] = ts[1:] - ts[:-1]
        dur[ends - 1] = 0  # last event of each key holds nothing
        prod = v * dur
        num = np.add.reduceat(prod, starts)
        span = ts[ends - 1] - ts[starts]
        cnt = (ends - starts).astype(np.int64)
        # overflow guard: the reduceat ran in int64; recompute the
        # magnitude bound exactly (max|v| per group × span)
        vmax = np.maximum.reduceat(np.abs(v), starts)
        if (vmax.astype(object) * span.astype(object) > 2**62).any():
            raise OverflowError(
                "time_weighted_avg int64 bound exceeded; rescale values"
            )
        zero = span == 0
        twap = np.divide(
            num.astype(np.float64),
            span.astype(np.float64),
            out=np.zeros(len(span)),
            where=~zero,
        )
        return pa.table(
            {
                key_col: tbl[key_col].take(pa.array(starts)),
                "n": pa.array(cnt),
                "num": pa.array(num),
                "span_us": pa.array(span),
                "twap": pa.array(twap, mask=zero),
            },
            schema=schema,
        )

    if isinstance(events, pa.Table):
        t = prune(events).combine_chunks().sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"),
             (id_col, "ascending")]
        )
        return part(t, group_starts(t, [key_col]))
    pruned = events.map_batches(
        prune, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_group_apply(
        pruned, [key_col], part, sort_cols=(ts_col, id_col)
    )


def transition_counts(
    events,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    state_col: str = "event_type",
    distinct_keys: bool = False,
):
    """First-order state-transition counts (the Markov-chain /
    session-flow statistic): for every key's event sequence in
    ``(ts, id)`` order, count each consecutive (src_state, dst_state)
    pair corpus-wide. With ``distinct_keys=True`` the count is the
    SUPPORT — how many distinct keys exhibit the transition at least
    once (the sequence-mining reading) — exact because a key's whole
    sequence lives in one partition, so the per-partition
    (key, src, dst) dedup is global.

    Scale shape: ONE key-hash exchange of the pruned
    (key, ts, id, state) projection; each partition sorts once,
    reads the successor with a single vectorized shift (group lasts
    masked via the start offsets), and pre-reduces to its distinct
    (src, dst, n) rows — so the driver merge sees at most
    |states|² rows per partition. Exact integer counts.
    """
    import ray

    from .shuffle import group_starts, hash_group_apply

    def part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        schema = pa.schema(
            [
                ("src", pa.string()),
                ("dst", pa.string()),
                ("n", pa.int64()),
            ]
        )
        if tbl is None or len(starts) == 0:
            return schema.empty_table()
        n = tbl.num_rows
        st = tbl[state_col]
        src_idx = np.arange(n - 1, dtype=np.int64)
        # the last row of each group has no successor: a row is a
        # valid transition source iff its NEXT row starts no new group
        nxt_is_start = np.zeros(n, dtype=bool)
        nxt_is_start[starts] = True
        valid = ~nxt_is_start[1:]
        src_idx = src_idx[valid]
        cols = {
            "src": st.take(pa.array(src_idx)),
            "dst": st.take(pa.array(src_idx + 1)),
        }
        if distinct_keys:
            cols["_k"] = tbl[key_col].take(pa.array(src_idx))
            pairs = pa.table(cols).group_by(
                ["_k", "src", "dst"], use_threads=False
            ).aggregate([])
            pairs = pairs.select(["src", "dst"])
        else:
            pairs = pa.table(cols)
        g = pairs.group_by(["src", "dst"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["src", "dst", "n"])

    if isinstance(events, pa.Table):
        u = events.select(
            [key_col, ts_col, id_col, state_col]
        ).sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"),
             (id_col, "ascending")]
        )
        parts = [part(u, group_starts(u, [key_col]))]
    else:
        pruned = events.select_columns(
            [key_col, ts_col, id_col, state_col]
        )
        refs = hash_group_apply(
            pruned, [key_col], part, sort_cols=(ts_col, id_col),
            return_refs=True,
        )
        parts = [t for t in ray.get(refs) if t is not None and t.num_rows]
    if not parts:
        return part(None, np.array([], dtype=np.int64))
    merged = pa.concat_tables(parts).combine_chunks()
    g = merged.group_by(["src", "dst"], use_threads=False).aggregate(
        [("n", "sum")]
    )
    return g.rename_columns(["src", "dst", "n"]).sort_by(
        [("src", "ascending"), ("dst", "ascending")]
    )


def intervalize(
    events,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_cols=("value",),
    open_end_us: int | None = None,
):
    """SCD2 intervalization: turn a change-event stream into validity
    intervals — for each key's events in ``(ts, id)`` order, emit
    ``valid_from = ts`` and ``valid_to =`` the key's NEXT event time
    (null for the key's last event, i.e. the currently-open record —
    or the ``open_end_us`` sentinel microsecond timestamp if given,
    the classic ``9999-12-31`` warehouse high date).
    Equivalent to ``LEAD(ts) OVER (PARTITION BY key ORDER BY ts, id)``
    — the standard warehouse construction of slowly-changing-dimension
    type-2 tables from CDC logs.

    Scale shape: ONE key-hash exchange of the pruned projection
    (key, ts, id, values); each partition is sorted once (Arrow C++)
    and the lead is a single vectorized shift re-based per group by
    the partition's group-start offsets. Value columns ride through in
    their SOURCE Arrow types (the asof_join int64-preservation
    lesson); timestamps stay int64 microseconds end to end — exact.
    """
    value_cols = list(value_cols)

    def part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        if tbl is None or tbl.num_rows == 0:
            fields = [
                (id_col, pa.int64()),
                (key_col, pa.int64()),
                ("valid_from", pa.timestamp("us")),
                ("valid_to", pa.timestamp("us")),
            ] + [(c, pa.float64()) for c in value_cols]
            return pa.schema(fields).empty_table()
        ts = _ts_i64(tbl[ts_col])
        n = len(ts)
        ts_t = tbl.schema.field(ts_col).type
        if not pa.types.is_timestamp(ts_t):
            ts_t = pa.timestamp("us")
        nxt = np.empty(n, dtype=np.int64)
        nxt[:-1] = ts[1:]
        nxt[-1] = 0
        last = np.zeros(n, dtype=bool)
        last[starts[1:] - 1] = True
        last[-1] = True
        if open_end_us is not None:
            nxt[last] = open_end_us
            valid_to = pc.cast(pa.array(nxt), ts_t)
        else:
            valid_to = pc.cast(pa.array(nxt, mask=last), ts_t)
        cols = {
            id_col: tbl[id_col],
            key_col: tbl[key_col],
            "valid_from": pc.cast(pa.array(ts), ts_t),
            "valid_to": valid_to,
        }
        for c in value_cols:
            cols[c] = tbl[c]
        return pa.table(cols)

    from .shuffle import group_starts, hash_group_apply

    if isinstance(events, pa.Table):
        t = events.combine_chunks().sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"),
             (id_col, "ascending")]
        )
        return part(t, group_starts(t, [key_col]))
    return hash_group_apply(
        events, [key_col], part, sort_cols=(ts_col, id_col)
    )


# ------------------------------------------------- interval coverage


def interval_coverage(
    ds,
    key_col: str = "user_id",
    start_col: str = "s",
    end_col: str = "e",
):
    """Per-key total length of the UNION of half-open intervals
    [start, end) — the de-overlapped "time actually covered" measure
    (user active time, sensor uptime, span footprint).

    Sweep-line over boundary events: the map phase emits two 24 B
    rows per interval ((key, t, ±1), starts ordered before ends at
    equal t so touching intervals merge); ONE key-hash exchange
    co-locates each key's boundary stream, and the reduce is three
    vectorized passes — within-group cumsum (global cumsum minus the
    value at each group start: exact integer reset), a shifted-next-t
    segment sum over active>0 rows, and reduceat per-group totals.
    Start/end must be integer-valued (µs epochs, frame indices…) so
    every sum is exact and order of equal-timestamp ties provably
    cannot change any output (the tied rows' contributions telescope).

    → (key_col, covered, n_intervals, n_components) where components
    count maximal merged runs (touching intervals count as one)."""
    import ray.data

    from .shuffle import hash_group_apply

    def boundaries(b: pa.Table) -> pa.Table:
        s = b[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = b[end_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if np.any(e <= s):
            raise ValueError(
                "interval_coverage: intervals must satisfy end > start"
            )
        k = b[key_col]
        n = len(b)
        return pa.table(
            {
                key_col: pa.concat_arrays(
                    [k.combine_chunks()] * 2
                ),
                "t": pa.array(np.concatenate([s, e])),
                # starts (d=0) sort before ends (d=1) at equal t →
                # touching intervals merge into one component
                "d": pa.array(np.r_[np.zeros(n, np.int8),
                                    np.ones(n, np.int8)]),
                "delta": pa.array(np.r_[np.ones(n, np.int64),
                                        -np.ones(n, np.int64)]),
            }
        )

    if isinstance(ds, pa.Table):
        ds = ray.data.from_arrow(ds)
    ev = ds.map_batches(boundaries, batch_format="pyarrow",
                        zero_copy_batch=True)

    def part(tbl: pa.Table | None, starts) -> pa.Table:
        schema = pa.schema(
            [
                (key_col, pa.int64() if tbl is None
                 else tbl.schema.field(key_col).type),
                ("covered", pa.int64()),
                ("n_intervals", pa.int64()),
                ("n_components", pa.int64()),
            ]
        )
        if tbl is None or tbl.num_rows == 0:
            return schema.empty_table()
        starts = np.asarray(starts, dtype=np.int64)
        n = tbl.num_rows
        t = tbl["t"].to_numpy(zero_copy_only=False)
        delta = tbl["delta"].to_numpy(zero_copy_only=False)
        sizes = np.diff(np.append(starts, n))
        # within-group cumsum: global cumsum minus the pre-group total
        cs = np.cumsum(delta)
        pre = np.repeat(cs[starts] - delta[starts], sizes)
        active = cs - pre
        # segment to the next boundary in the SAME group
        nxt = np.empty(n, dtype=np.int64)
        nxt[:-1] = t[1:]
        nxt[-1] = 0
        last_of_group = np.zeros(n, dtype=bool)
        last_of_group[starts + sizes - 1] = True
        seg = np.where(last_of_group | (active <= 0), 0, nxt - t)
        covered = np.add.reduceat(seg, starts)
        n_iv = np.add.reduceat((delta > 0).astype(np.int64), starts)
        comp = np.add.reduceat(
            ((delta > 0) & (active == 1)).astype(np.int64), starts
        )
        return pa.table(
            {
                key_col: tbl[key_col].take(pa.array(starts)),
                "covered": pa.array(covered),
                "n_intervals": pa.array(n_iv),
                "n_components": pa.array(comp),
            }
        )

    return hash_group_apply(ev, [key_col], part, sort_cols=("t", "d"))


def cusum_changepoint(ds, key_col: str, order_col: str,
                      value_col: str) -> pa.Table:
    """Exact CUSUM changepoint per key over an ordered integer series
    — "where does this metric's level shift?" made order-independent
    and bit-reproducible.

    With the key's periods sorted by ``order_col`` (values v_1..v_n,
    prefix sums P_k, total S), the classic CUSUM deviation at k is
    P_k − k·S/n; scaling by n keeps it integer:

        dev_k = n·P_k − k·S        (exact, every k)

    The changepoint is the EARLIEST period attaining max |dev_k|
    (k = 1..n), reported with that max. Output per key:
    (key, n_periods, cp = order at argmax, max_dev int64).

    Scale shape: ``value_col`` must already be integer (cents
    discipline) and (key × order) low-cardinality (periods, not raw
    rows) — per-batch Arrow sum partials, exact Python-int driver
    merge (ops/agg.grouped_sums_exact), then the O(keys·periods) scan
    runs on the driver in arbitrary precision. max_dev must fit int64
    (n·|S| < 2^63 — raise, never wrap)."""
    from .agg import grouped_sums_exact

    if isinstance(ds, pa.Table):
        g = ds.group_by([key_col, order_col], use_threads=False).aggregate(
            [(value_col, "sum")]
        )
        rows = [
            {key_col: k, order_col: o, value_col: int(v)}
            for k, o, v in zip(
                g[key_col].to_pylist(),
                g[order_col].to_pylist(),
                g[f"{value_col}_sum"].to_pylist(),
            )
        ]
    else:
        rows = grouped_sums_exact(
            ds, [key_col, order_col], sum_cols=[value_col]
        )
    rows.sort(key=lambda r: (r[key_col], r[order_col]))
    keys, ns, cps, devs = [], [], [], []
    i, m = 0, len(rows)
    while i < m:
        k = rows[i][key_col]
        j = i
        while j < m and rows[j][key_col] == k:
            j += 1
        vals = [int(r[value_col]) for r in rows[i:j]]
        n = len(vals)
        S = sum(vals)
        best, best_idx, P = -1, 0, 0
        for idx, v in enumerate(vals):
            P += v
            d = abs(n * P - (idx + 1) * S)
            if d > best:
                best, best_idx = d, idx
        if best >= (1 << 63):
            raise AssertionError(
                "cusum_changepoint: |n·P − k·S| exceeds int64 — "
                "rescale the value column"
            )
        keys.append(k)
        ns.append(n)
        cps.append(rows[i + best_idx][order_col])
        devs.append(best)
        i = j
    key_t = pa.int64() if keys and isinstance(keys[0], int) else pa.string()
    return pa.table(
        {
            key_col: pa.array(keys, type=key_t),
            "n_periods": pa.array(ns, type=pa.int64()),
            "cp": pa.array(cps),
            "max_dev": pa.array(devs, type=pa.int64()),
        }
    )


def gap_median(ds, key_col: str, day_col: str):
    """Per-key median gap between consecutive DISTINCT active days —
    the reorder-interval / visit-cadence metric. Keys with < 2
    distinct days emit nothing (no gap exists).

    Exactness: gaps are integer day differences; the median is the
    quantile_disc selection (smallest gap with cumulative count ≥
    ceil(n/2)) — no interpolation, no floats anywhere.

    Scale shape: per-batch (key, day) dedup, ONE key-keyed hash
    exchange of the 12 B pairs, then per partition ONE lexsort of
    (group, gap) and a vectorized per-group rank pick — no Python
    per key. → (key, n_gaps, med_gap) Dataset."""

    def pre(b: pa.Table) -> pa.Table:
        return b.select([key_col, day_col]).group_by(
            [key_col, day_col], use_threads=False
        ).aggregate([])

    pruned = ds.map_batches(
        pre, batch_format="pyarrow", zero_copy_batch=True
    )

    _EMPTY = None

    def part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        key_t = (
            tbl.schema.field(key_col).type
            if tbl is not None
            else pa.int64()
        )
        schema = pa.schema(
            [
                (key_col, key_t),
                ("n_gaps", pa.int64()),
                ("med_gap", pa.int64()),
            ]
        )
        if tbl is None or tbl.num_rows == 0:
            return schema.empty_table()
        n = tbl.num_rows
        starts = np.asarray(starts, dtype=np.int64)
        sizes = np.diff(np.append(starts, n))
        gidx = np.repeat(np.arange(len(starts), dtype=np.int64), sizes)
        d = tbl[day_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # rows sorted by (key, day); cross-batch duplicates possible
        dup = np.zeros(n, dtype=bool)
        dup[1:] = (gidx[1:] == gidx[:-1]) & (d[1:] == d[:-1])
        keep = ~dup
        d, gidx = d[keep], gidx[keep]
        # consecutive gaps within each group
        valid = np.zeros(len(d), dtype=bool)
        valid[1:] = gidx[1:] == gidx[:-1]
        gap = np.empty(len(d), dtype=np.int64)
        gap[1:] = d[1:] - d[:-1]
        g_of = gidx[valid]
        gaps = gap[valid]
        if len(gaps) == 0:
            return schema.empty_table()
        order = np.lexsort((gaps, g_of))
        g_s, gp_s = g_of[order], gaps[order]
        gs = np.flatnonzero(np.r_[True, g_s[1:] != g_s[:-1]])
        cnt = np.diff(np.append(gs, len(g_s)))
        pick = gs + (cnt + 1) // 2 - 1  # ceil(n/2)-th smallest
        first_row = starts[g_s[gs]]
        return pa.table(
            {
                key_col: tbl[key_col].take(pa.array(first_row)),
                "n_gaps": pa.array(cnt.astype(np.int64)),
                "med_gap": pa.array(gp_s[pick]),
            }
        )

    from .shuffle import hash_group_apply

    return hash_group_apply(
        pruned, [key_col], part, sort_cols=(day_col,)
    )


def peak_concurrency(
    ds,
    key_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
):
    """Per-key maximum interval-overlap depth — "how many sessions
    were open at once at the worst moment" (capacity planning /
    rate-limit sizing; the DEPTH complement of interval_coverage's
    union length). Intervals are half-open [start, end).

    Sweep: each interval emits (+1 at start, −1 at end); per key the
    events sort by (t, delta, id) — the −1 BEFORE +1 at equal t is
    what makes [a, b) + [b, c) depth 1, not 2 — and the running sum's
    max is the peak, reported with the EARLIEST timestamp attaining
    it. Exact ints; mirrored by a window cumsum.

    Scale shape: one keyed hash exchange of (key, t, delta, id)
     24 B rows (2 per interval); per partition one vectorized cumsum
    + grouped max/argmax (reduceat) — no per-row Python.
    → (key, peak, peak_ts)."""

    def explode(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table(
            {
                key_col: pa.concat_arrays(
                    [b[key_col].combine_chunks()] * 2
                ),
                "_t": pa.concat_arrays(
                    [
                        b[start_col].combine_chunks(),
                        b[end_col].combine_chunks(),
                    ]
                ),
                "_d": pa.array(
                    np.concatenate(
                        [
                            np.ones(n, dtype=np.int64),
                            -np.ones(n, dtype=np.int64),
                        ]
                    )
                ),
                "_i": pa.concat_arrays(
                    [b[id_col].combine_chunks()] * 2
                ),
            }
        )

    exploded = ds.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )

    def part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        key_t = (
            tbl.schema.field(key_col).type
            if tbl is not None
            else pa.int64()
        )
        t_t = (
            tbl.schema.field("_t").type if tbl is not None
            else pa.int64()
        )
        schema = pa.schema(
            [
                (key_col, key_t),
                ("peak", pa.int64()),
                ("peak_ts", t_t),
            ]
        )
        if tbl is None or tbl.num_rows == 0:
            return schema.empty_table()
        n = tbl.num_rows
        starts = np.asarray(starts, dtype=np.int64)
        sizes = np.diff(np.append(starts, n))
        gidx = np.repeat(np.arange(len(starts), dtype=np.int64), sizes)
        d = tbl["_d"].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-group running depth: global cumsum minus the cumsum
        # offset at each group's start
        cs = np.cumsum(d)
        base = np.concatenate(([0], cs[starts[1:] - 1]))
        depth = cs - np.repeat(base, sizes)
        mx = np.maximum.reduceat(depth, starts)
        r = np.arange(n, dtype=np.int64)
        cand = np.where(depth == mx[gidx], r, np.int64(n))
        first = np.minimum.reduceat(cand, starts)
        return pa.table(
            {
                key_col: tbl[key_col].take(pa.array(starts)),
                "peak": pa.array(mx),
                "peak_ts": tbl["_t"].take(pa.array(first)),
            }
        )

    from .shuffle import hash_group_apply

    return hash_group_apply(
        exploded, [key_col], part, sort_cols=("_t", "_d", "_i")
    )
