"""ops.temporal — as-of join, range/interval join, rolling windows.

Brute-force O(n^2) oracles over small seeded inputs with PLANTED
collisions (duplicate timestamps, interval-boundary hits, empty
windows) — the reference-test pattern (SURVEY §5.2)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maup_ray.ops.temporal import asof_join, range_join_agg, rolling_window

US = 1_000_000


def _events(n=400, n_users=7, seed=11, coarse=True):
    rng = np.random.RandomState(seed)
    # coarse second-resolution stamps force duplicate ts (peers)
    span = 3 * 3600 if coarse else 30 * 24 * 3600
    ts = rng.randint(0, span, n) * US
    if coarse:
        ts = (ts // (60 * US)) * (60 * US)  # minute grid → many ties
    return pa.table(
        {
            "event_id": pa.array(np.arange(n)),
            "user_id": pa.array(rng.randint(0, n_users, n)),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "value": pa.array(np.round(rng.uniform(0, 100, n), 2)),
        }
    )


def _brute_rolling(t: pa.Table, w_us: int):
    df = t.to_pandas()
    tsv = df["ts"].astype("datetime64[us]").astype(np.int64)
    rows = []
    for i in range(len(df)):
        m = (
            (df["user_id"] == df["user_id"][i])
            & (tsv >= tsv[i] - w_us)
            & (tsv <= tsv[i])
        )
        rows.append((df["event_id"][i], int(m.sum()), int(df["event_id"][m].sum())))
    return rows


class TestRollingWindow:
    def test_matches_brute_force(self):
        t = _events()
        out = rolling_window(t, window_minutes=30.0).to_pandas()
        out = out.set_index("event_id").sort_index()
        for eid, n, s in _brute_rolling(t, 30 * 60 * US):
            assert out.loc[eid, "n_win"] == n
            assert out.loc[eid, "eid_sum"] == s

    def test_dataset_matches_table(self, ray_session):
        import ray.data

        t = _events(seed=5)
        want = (
            rolling_window(t, window_minutes=45.0)
            .to_pandas()
            .sort_values("event_id", ignore_index=True)
        )
        got = (
            rolling_window(
                ray.data.from_arrow(t).repartition(5), window_minutes=45.0
            )
            .to_pandas()
            .sort_values("event_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, want)

    def test_overflow_fallback_same_result(self, monkeypatch):
        # force the per-group-loop fallback and assert bit-identical
        from maup_ray.ops import temporal

        t = _events(seed=7)
        want = rolling_window(t, window_minutes=30.0)
        orig = temporal._group_shifts
        monkeypatch.setattr(
            temporal,
            "_group_shifts",
            lambda ts, starts, w: (None, orig(ts, starts, w)[1]),
        )
        got = rolling_window(t, window_minutes=30.0)
        assert got.equals(want)


def _brute_asof(trades: pa.Table, quotes: pa.Table):
    td, qd = trades.to_pandas(), quotes.to_pandas()
    out = {}
    for i in range(len(td)):
        c = qd[(qd["user_id"] == td["user_id"][i]) & (qd["ts"] <= td["ts"][i])]
        if len(c) == 0:
            out[td["event_id"][i]] = (None, None)
        else:
            c = c.sort_values(["ts", "event_id"])
            out[td["event_id"][i]] = (
                int(c["event_id"].iloc[-1]),
                float(c["value"].iloc[-1]),
            )
    return out


class TestAsofJoin:
    def test_matches_brute_force(self):
        t = _events(seed=3)
        eid = t["event_id"].to_numpy()
        trades = t.filter(pa.array(eid % 2 == 1)).select(
            ["event_id", "user_id", "ts"]
        )
        quotes = t.filter(pa.array(eid % 2 == 0))
        out = asof_join(
            trades,
            quotes,
            value_cols=(("value", "quote_value"),),
            out_left_id="trade_id",
            out_right_id="quote_id",
        ).to_pandas()
        assert len(out) == len(trades)
        want = _brute_asof(trades, quotes)
        for _, r in out.iterrows():
            wq, wv = want[r["trade_id"]]
            if wq is None:
                assert pd.isna(r["quote_id"]) and pd.isna(r["quote_value"])
            else:
                assert r["quote_id"] == wq
                assert r["quote_value"] == wv

    def test_equal_ts_quote_visible_and_max_id_wins(self):
        # trade at the exact ts of TWO quotes: inclusive match, tie →
        # max quote id
        ts = pa.array(
            np.array([1000 * US, 1000 * US, 1000 * US], dtype="datetime64[us]")
        )
        trades = pa.table(
            {
                "event_id": pa.array([7]),
                "user_id": pa.array([1]),
                "ts": ts.slice(0, 1),
            }
        )
        quotes = pa.table(
            {
                "event_id": pa.array([2, 4]),
                "user_id": pa.array([1, 1]),
                "ts": ts.slice(1, 2),
                "value": pa.array([1.5, 2.5]),
            }
        )
        out = asof_join(
            trades, quotes, value_cols=("value",)
        ).to_pandas()
        assert out["right_id"].tolist() == [4]
        assert out["value"].tolist() == [2.5]

    def test_dataset_matches_table(self, ray_session):
        import ray.data

        t = _events(seed=9)
        eid = t["event_id"].to_numpy()
        trades = t.filter(pa.array(eid % 2 == 1)).select(
            ["event_id", "user_id", "ts"]
        )
        quotes = t.filter(pa.array(eid % 2 == 0))
        kw = dict(
            value_cols=(("value", "quote_value"),),
            out_left_id="trade_id",
            out_right_id="quote_id",
        )
        want = (
            asof_join(trades, quotes, **kw)
            .to_pandas()
            .sort_values("trade_id", ignore_index=True)
        )
        got = (
            asof_join(
                ray.data.from_arrow(trades).repartition(4),
                ray.data.from_arrow(quotes).repartition(3),
                **kw,
            )
            .to_pandas()
            .sort_values("trade_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, want)


def _brute_range(points: pa.Table, iv: pa.Table):
    pd_, id_ = points.to_pandas(), iv.to_pandas()
    rows = {}
    for i in range(len(id_)):
        m = (pd_["ts"] >= id_["start"][i]) & (pd_["ts"] < id_["end"][i])
        if m.sum():
            rows[id_["interval_id"][i]] = (
                int(m.sum()),
                int(pd_["event_id"][m].sum()),
            )
    return rows


class TestRangeJoinAgg:
    def _intervals(self, t, k=17, w_us=3600 * US):
        eid = t["event_id"].to_numpy()
        a = t.filter(pa.array(eid % k == 0))
        ts = a["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        return pa.table(
            {
                "interval_id": a["event_id"],
                "start": a["ts"],
                "end": pa.array((ts + w_us).astype("datetime64[us]")),
            }
        )

    def test_matches_brute_force(self):
        t = _events(seed=13)
        iv = self._intervals(t)
        out = range_join_agg(
            t.select(["event_id", "ts"]), iv, bucket_minutes=60.0
        ).to_pandas()
        want = _brute_range(t, iv)
        assert len(out) == len(want)
        for _, r in out.iterrows():
            assert (r["n_win"], r["eid_sum"]) == want[r["interval_id"]]

    def test_boundary_exclusive_and_bucket_straddle(self):
        # points exactly at start (in), exactly at end (out), interval
        # straddling a bucket boundary
        pts_ts = np.array(
            [3590 * US, 3600 * US, 7199 * US, 7200 * US], dtype="datetime64[us]"
        )
        points = pa.table(
            {"event_id": pa.array([1, 2, 3, 4]), "ts": pa.array(pts_ts)}
        )
        iv = pa.table(
            {
                "interval_id": pa.array([100]),
                "start": pa.array(
                    np.array([3600 * US], dtype="datetime64[us]")
                ),
                "end": pa.array(
                    np.array([7200 * US], dtype="datetime64[us]")
                ),
            }
        )
        out = range_join_agg(points, iv, bucket_minutes=60.0).to_pandas()
        # [3600s, 7200s): includes events 2 and 3 only
        assert out["n_win"].tolist() == [2]
        assert out["eid_sum"].tolist() == [5]

    def test_zero_match_interval_dropped(self):
        points = pa.table(
            {
                "event_id": pa.array([1]),
                "ts": pa.array(np.array([0], dtype="datetime64[us]")),
            }
        )
        iv = pa.table(
            {
                "interval_id": pa.array([9]),
                "start": pa.array(
                    np.array([10**12], dtype="datetime64[us]")
                ),
                "end": pa.array(
                    np.array([10**12 + 60 * US], dtype="datetime64[us]")
                ),
            }
        )
        out = range_join_agg(points, iv, bucket_minutes=60.0)
        assert len(out) == 0

    def test_interval_longer_than_bucket_raises(self):
        t = _events(seed=13)
        iv = self._intervals(t, w_us=2 * 3600 * US)
        with pytest.raises(ValueError, match="longer than bucket"):
            range_join_agg(
                t.select(["event_id", "ts"]), iv, bucket_minutes=60.0
            )

    def test_dataset_matches_table(self, ray_session):
        import ray.data

        t = _events(seed=21, coarse=False)
        iv = self._intervals(t, k=11)
        want = (
            range_join_agg(
                t.select(["event_id", "ts"]), iv, bucket_minutes=60.0
            )
            .to_pandas()
            .sort_values("interval_id", ignore_index=True)
        )
        got = (
            range_join_agg(
                ray.data.from_arrow(t.select(["event_id", "ts"])).repartition(6),
                ray.data.from_arrow(iv).repartition(2),
                bucket_minutes=60.0,
            )
            .to_pandas()
            .sort_values("interval_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, want)


class TestAsofJoinTypePreservation:
    def test_int64_values_above_2_53_round_trip(self):
        # ADVICE r3 (medium): a float64 cast on value_cols corrupted
        # int64 values above 2^53 — values must carry their source
        # Arrow type end to end, including the null placeholders
        big = 2**60 + 1
        trades = pa.table(
            {
                "event_id": pa.array([1, 3], type=pa.int64()),
                "user_id": pa.array([7, 7], type=pa.int64()),
                "ts": pa.array([10, 30], type=pa.timestamp("us")),
            }
        )
        quotes = pa.table(
            {
                "event_id": pa.array([2], type=pa.int64()),
                "user_id": pa.array([7], type=pa.int64()),
                "ts": pa.array([20], type=pa.timestamp("us")),
                "value": pa.array([big], type=pa.int64()),
            }
        )
        out = asof_join(
            trades,
            quotes,
            value_cols=(("value", "quote_value"),),
            out_left_id="trade_id",
            out_right_id="quote_id",
        )
        assert out.schema.field("quote_value").type == pa.int64()
        by_id = dict(
            zip(
                out["trade_id"].to_pylist(),
                out["quote_value"].to_pylist(),
            )
        )
        assert by_id[1] is None  # no quote yet -> typed null
        assert by_id[3] == big  # bit-exact, no 2^53 rounding


class TestFunnel:
    def _events(self):
        import pandas as pd

        rows = [
            # u1 completes all three in order
            (1, "2024-01-01 10:00", "view"),
            (1, "2024-01-01 10:05", "click"),
            (1, "2024-01-01 10:10", "purchase"),
            # u2: purchase BEFORE view/click chain -> only 2 steps
            (2, "2024-01-01 09:00", "purchase"),
            (2, "2024-01-01 10:00", "view"),
            (2, "2024-01-01 10:05", "click"),
            # u3: click only (no view first) -> 0 steps
            (3, "2024-01-01 10:00", "click"),
            (3, "2024-01-01 10:01", "purchase"),
            # u4: same-ts view and click -> strict-after rejects click
            (4, "2024-01-01 10:00", "view"),
            (4, "2024-01-01 10:00", "click"),
            # u5: greedy earliest view still lets a later click count
            (5, "2024-01-01 08:00", "view"),
            (5, "2024-01-01 09:00", "view"),
            (5, "2024-01-01 09:30", "click"),
        ]
        return pa.table(
            {
                "user_id": pa.array(
                    [r[0] for r in rows], type=pa.int64()
                ),
                "ts": pa.array(
                    pd.to_datetime([r[1] for r in rows])
                ).cast(pa.timestamp("us")),
                "event_type": pa.array([r[2] for r in rows]),
            }
        )

    def test_prefix_and_strict_after_semantics(self, ray_session):
        from maup_ray.ops.sessions import funnel

        out = funnel(
            self._events(), ["view", "click", "purchase"]
        )
        got = dict(
            zip(
                out["user_id"].to_pylist(),
                out["steps_completed"].to_pylist(),
            )
        )
        assert got == {1: 3, 2: 2, 3: 0, 4: 1, 5: 2}

    def test_dataset_matches_local(self, ray_session):
        import ray.data

        from maup_ray.ops.sessions import funnel

        t = self._events()
        local = (
            funnel(t, ["view", "click", "purchase"])
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        for p in (1, 4):
            dist = (
                funnel(
                    ray.data.from_arrow(t).repartition(p),
                    ["view", "click", "purchase"],
                )
                .to_pandas()
                .sort_values("user_id")
                .reset_index(drop=True)
            )
            assert dist.equals(local)


class TestLagDeltas:
    def _events(self, n=400, users=7, seed=3):
        rng = np.random.default_rng(seed)
        ts = np.datetime64("2021-05-01T00:00:00", "us") + rng.integers(
            0, 3_600_000_000, n
        ).astype("timedelta64[us]")
        return pa.table(
            {
                "user_id": pa.array(
                    rng.integers(0, users, n), type=pa.int64()
                ),
                "ts": pa.array(ts),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
            }
        )

    def test_matches_pandas_brute(self):
        from maup_ray.ops.temporal import lag_deltas

        tbl = self._events()
        got = (
            lag_deltas(tbl)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
        d = df.groupby("user_id")["ts"].diff().to_numpy()
        # exact integer microseconds (total_seconds()*1e6 rounds)
        df["gap_us"] = np.where(
            np.isnat(d),
            np.nan,
            d.astype("timedelta64[us]").view(np.int64).astype(np.float64),
        )
        want = df.sort_values("event_id").reset_index(drop=True)
        assert np.array_equal(
            got["gap_us"].to_numpy(),
            want["gap_us"].to_numpy(),
            equal_nan=True,
        )

    def test_dataset_matches_table(self, ray_session):
        import ray.data

        from maup_ray.ops.temporal import lag_deltas

        tbl = self._events(n=300)
        a = lag_deltas(tbl).to_pandas()
        b = lag_deltas(
            ray.data.from_arrow(tbl).repartition(5)
        ).to_pandas()
        a = a.sort_values("event_id").reset_index(drop=True)
        b = b.sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestRunningTotal:
    def test_matches_pandas_and_partition_invariant(self, ray_session):
        import ray.data

        from maup_ray.ops.temporal import running_total

        rng = np.random.default_rng(9)
        n = 350
        ts = np.datetime64("2021-05-01", "us") + rng.integers(
            0, 3_600_000_000, n
        ).astype("timedelta64[us]")
        tbl = pa.table(
            {
                "user_id": pa.array(
                    rng.integers(0, 6, n), type=pa.int64()
                ),
                "ts": pa.array(ts),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "v": pa.array(
                    rng.integers(-50, 100, n), type=pa.int64()
                ),
            }
        )
        got = (
            running_total(tbl, "v")
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
        df["running_sum"] = df.groupby("user_id")["v"].cumsum()
        want = df.sort_values("event_id").reset_index(drop=True)
        assert list(got["running_sum"]) == list(want["running_sum"])
        ds_out = (
            running_total(ray.data.from_arrow(tbl).repartition(5), "v")
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, ds_out)

    def test_float_values_rejected(self):
        from maup_ray.ops.temporal import running_total

        tbl = pa.table(
            {
                "user_id": pa.array([1], type=pa.int64()),
                "ts": pa.array(
                    np.array(["2020-01-01"], dtype="datetime64[us]")
                ),
                "event_id": pa.array([0], type=pa.int64()),
                "v": pa.array([0.5]),
            }
        )
        with pytest.raises(TypeError, match="integer"):
            running_total(tbl, "v")


class TestMergeIntervals:
    def _brute(self, k, s, e):
        """Per-key sort-and-sweep island merge."""
        rows = sorted(zip(k, s, e))
        out = []
        for key, st, en in rows:
            if out and out[-1][0] == key and st <= out[-1][2]:
                last = out[-1]
                out[-1] = (key, last[1], max(last[2], en), last[3] + 1)
            else:
                out.append((key, st, en, 1))
        return sorted(out)

    @pytest.mark.parametrize("n_blocks", [1, 7])
    def test_matches_brute(self, ray_session, n_blocks):
        import ray.data

        from maup_ray.ops.temporal import merge_intervals

        rng = np.random.RandomState(3)
        n = 2500
        k = rng.randint(0, 40, n).astype(np.int64)
        s = rng.randint(0, 10_000, n).astype(np.int64)
        e = s + rng.randint(0, 600, n)
        t = pa.table(
            {
                "k": pa.array(k),
                "s": pa.array(s),
                "e": pa.array(e),
            }
        )
        want = self._brute(k, s, e)
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        got_df = (
            merge_intervals(ds, ["k"], "s", "e")
            .to_pandas()
            .sort_values(["k", "s"], ignore_index=True)
        )
        got = sorted(
            zip(
                got_df["k"], got_df["s"], got_df["e"],
                got_df["n_merged"],
            )
        )
        assert got == want

    def test_touching_merge_and_gap_split(self, ray_session):
        from maup_ray.ops.temporal import merge_intervals

        t = pa.table(
            {
                "k": pa.array([1, 1, 1, 1], type=pa.int64()),
                "s": pa.array([0, 10, 25, 10], type=pa.int64()),
                "e": pa.array([10, 20, 30, 20], type=pa.int64()),
            }
        )
        # table input → table output (single partition path)
        got = merge_intervals(t, ["k"], "s", "e").to_pandas()
        got = got.sort_values("s", ignore_index=True)
        # [0,10] touches [10,20] (twice, tied) → one island; gap to [25,30]
        assert got["s"].tolist() == [0, 25]
        assert got["e"].tolist() == [20, 30]
        assert got["n_merged"].tolist() == [3, 1]

    def test_containment(self, ray_session):
        from maup_ray.ops.temporal import merge_intervals

        t = pa.table(
            {
                "k": pa.array([0, 0], type=pa.int64()),
                "s": pa.array([0, 2], type=pa.int64()),
                "e": pa.array([100, 5], type=pa.int64()),
            }
        )
        got = merge_intervals(t, ["k"], "s", "e").to_pandas()
        assert len(got) == 1
        assert int(got["e"].iloc[0]) == 100


class TestTimeWeightedAvg:
    def _mk(self, n=400, seed=9):
        rng = np.random.default_rng(seed)
        return pa.table(
            {
                "user_id": pa.array(rng.integers(0, 20, n)),
                "ts": pa.array(
                    rng.integers(0, 10**7, n), type=pa.timestamp("us")
                ),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "value_cents": pa.array(rng.integers(-500, 500, n)),
            }
        )

    def _brute(self, t):
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
        rows = []
        for k, g in df.groupby("user_id"):
            ts = g.ts.astype("int64").to_numpy()
            v = g.value_cents.to_numpy()
            num = int((v[:-1] * np.diff(ts)).sum()) if len(ts) > 1 else 0
            span = int(ts[-1] - ts[0])
            rows.append(
                (
                    k,
                    len(g),
                    num,
                    span,
                    float(num) / float(span) if span else None,
                )
            )
        return rows

    def test_matches_brute(self, ray_session):
        import ray.data

        from maup_ray.ops.temporal import time_weighted_avg

        t = self._mk()
        got = (
            time_weighted_avg(ray.data.from_arrow(t).repartition(4))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        want = self._brute(t)
        assert len(got) == len(want)
        for row, (k, n, num, span, twap) in zip(
            got.itertuples(index=False), want
        ):
            assert (row.user_id, row.n, row.num, row.span_us) == (
                k, n, num, span,
            )
            if twap is None:
                assert pd.isna(row.twap)
            else:
                assert row.twap == twap  # bit-exact: one IEEE division

    def test_table_input_and_float_guard(self):
        from maup_ray.ops.temporal import time_weighted_avg

        t = self._mk(n=50, seed=2)
        out = time_weighted_avg(t).to_pandas()
        assert len(out) == t.to_pandas().user_id.nunique()
        bad = t.set_column(
            3,
            "value_cents",
            pa.array(np.ones(50), type=pa.float64()),
        )
        with pytest.raises(TypeError):
            time_weighted_avg(bad)

    def test_single_event_key_null_twap(self):
        from maup_ray.ops.temporal import time_weighted_avg

        t = pa.table(
            {
                "user_id": pa.array([7], type=pa.int64()),
                "ts": pa.array([123], type=pa.timestamp("us")),
                "event_id": pa.array([0], type=pa.int64()),
                "value_cents": pa.array([42], type=pa.int64()),
            }
        )
        out = time_weighted_avg(t).to_pandas()
        assert out.n.iloc[0] == 1 and out.span_us.iloc[0] == 0
        assert pd.isna(out.twap.iloc[0])


class TestAsofForward:
    def test_matches_brute_force_and_mirror(self, ray_session):
        import ray.data

        from maup_ray.ops.temporal import asof_join

        rng = np.random.default_rng(12)
        nl, nr = 120, 80
        lt = pa.table(
            {
                "event_id": pa.array(np.arange(nl), type=pa.int64()),
                "user_id": pa.array(
                    rng.integers(0, 6, nl), type=pa.int64()
                ),
                "ts": pa.array(
                    rng.integers(0, 500, nl), type=pa.int64()
                ),
            }
        )
        rt = pa.table(
            {
                "event_id": pa.array(
                    np.arange(1000, 1000 + nr), type=pa.int64()
                ),
                "user_id": pa.array(
                    rng.integers(0, 6, nr), type=pa.int64()
                ),
                "ts": pa.array(
                    rng.integers(0, 500, nr), type=pa.int64()
                ),
                "value": pa.array(
                    rng.integers(0, 99, nr), type=pa.int64()
                ),
            }
        )
        out = asof_join(
            ray.data.from_arrow(lt).repartition(3),
            ray.data.from_arrow(rt).repartition(2),
            value_cols=("value",),
            direction="forward",
        )
        got = {
            r["left_id"]: (r["right_id"], r["value"])
            for r in out.to_pandas().to_dict("records")
        }
        R = rt.to_pylist()
        for lrow in lt.to_pylist():
            cands = [
                r for r in R
                if r["user_id"] == lrow["user_id"]
                and r["ts"] >= lrow["ts"]
            ]
            if cands:
                best = min(cands, key=lambda r: (r["ts"], r["event_id"]))
                want = (best["event_id"], best["value"])
            else:
                want = (None, None)
            g = got[lrow["event_id"]]
            g = (None if g[0] is None or g[0] != g[0] else int(g[0]),
                 None if g[1] is None or g[1] != g[1] else int(g[1]))
            assert g == want, (lrow, g, want)

    def test_unknown_direction_raises(self):
        from maup_ray.ops.temporal import asof_join

        with pytest.raises(ValueError, match="direction"):
            asof_join(
                pa.table({"user_id": [], "ts": [], "event_id": []}),
                pa.table({"user_id": [], "ts": [], "event_id": []}),
                direction="sideways",
            )


class TestAsofNearest:
    def test_matches_brute_force(self, ray_session):
        import ray.data

        from maup_ray.ops.temporal import asof_join

        rng = np.random.default_rng(31)
        nl, nr = 150, 90
        lt = pa.table(
            {
                "event_id": pa.array(np.arange(nl), type=pa.int64()),
                "user_id": pa.array(
                    rng.integers(0, 5, nl), type=pa.int64()
                ),
                "ts": pa.array(
                    rng.integers(0, 300, nl), type=pa.int64()
                ),
            }
        )
        rt = pa.table(
            {
                "event_id": pa.array(
                    np.arange(1000, 1000 + nr), type=pa.int64()
                ),
                "user_id": pa.array(
                    rng.integers(0, 5, nr), type=pa.int64()
                ),
                "ts": pa.array(
                    rng.integers(0, 300, nr), type=pa.int64()
                ),
                "value": pa.array(
                    rng.integers(0, 99, nr), type=pa.int64()
                ),
            }
        )
        out = asof_join(
            ray.data.from_arrow(lt).repartition(4),
            ray.data.from_arrow(rt).repartition(3),
            value_cols=("value",),
            direction="nearest",
        )
        got = {
            r["left_id"]: r["right_id"]
            for r in out.to_pandas().to_dict("records")
        }
        R = rt.to_pylist()
        for lrow in lt.to_pylist():
            mine = [r for r in R if r["user_id"] == lrow["user_id"]]
            back = [r for r in mine if r["ts"] <= lrow["ts"]]
            fwd = [r for r in mine if r["ts"] > lrow["ts"]]
            b = max(back, key=lambda r: (r["ts"], r["event_id"])) \
                if back else None
            f = min(fwd, key=lambda r: (r["ts"], r["event_id"])) \
                if fwd else None
            if b is None and f is None:
                want = None
            elif b is None:
                want = f["event_id"]
            elif f is None:
                want = b["event_id"]
            else:
                d_b = lrow["ts"] - b["ts"]
                d_f = f["ts"] - lrow["ts"]
                # distance ties (incl. equal-ts dist 0) go BACKWARD
                want = f["event_id"] if d_f < d_b else b["event_id"]
            g = got[lrow["event_id"]]
            g = None if g is None or g != g else int(g)
            assert g == want, (lrow, g, want)

    def test_equal_ts_prefers_backward_max_id(self, ray_session):
        from maup_ray.ops.temporal import asof_join

        lt = pa.table(
            {
                "event_id": pa.array([1], type=pa.int64()),
                "user_id": pa.array([0], type=pa.int64()),
                "ts": pa.array([100], type=pa.int64()),
            }
        )
        rt = pa.table(
            {
                "event_id": pa.array([10, 11, 12], type=pa.int64()),
                "user_id": pa.array([0, 0, 0], type=pa.int64()),
                # equal-ts (dist 0) must beat the closer-looking
                # forward row at 101
                "ts": pa.array([100, 100, 101], type=pa.int64()),
                "value": pa.array([5, 6, 7], type=pa.int64()),
            }
        )
        out = asof_join(lt, rt, value_cols=("value",),
                        direction="nearest").to_pylist()
        assert out[0]["right_id"] == 11  # max id at the equal ts


class TestTransitionCounts:
    def test_matches_brute_force(self, ray_session):
        import ray.data

        from maup_ray.ops.temporal import transition_counts

        rng = np.random.default_rng(3)
        n = 300
        tbl = pa.table(
            {
                "user_id": pa.array(
                    rng.integers(0, 8, n), type=pa.int64()
                ),
                "ts": pa.array(rng.integers(0, 900, n), type=pa.int64()),
                "event_id": pa.array(np.arange(n), type=pa.int64()),
                "event_type": pa.array(
                    np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
                ),
            }
        )
        got = transition_counts(
            ray.data.from_arrow(tbl).repartition(5)
        )
        from collections import Counter

        rows = sorted(
            tbl.to_pylist(),
            key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
        )
        want = Counter()
        for a, b in zip(rows, rows[1:]):
            if a["user_id"] == b["user_id"]:
                want[(a["event_type"], b["event_type"])] += 1
        assert {
            (r["src"], r["dst"]): r["n"] for r in got.to_pylist()
        } == dict(want)
        # table path equals dataset path
        assert transition_counts(tbl).equals(got)


class TestIntervalize:
    def test_matches_brute_force(self, ray_session):
        import ray.data

        from maup_ray.ops.temporal import intervalize

        rng = np.random.default_rng(5)
        n = 300
        k = rng.integers(0, 7, size=n)
        ts = rng.integers(0, 50, size=n) * 1_000_000
        ids = np.arange(n, dtype=np.int64)
        v = rng.integers(-100, 100, size=n)
        tbl = pa.table(
            {
                "user_id": pa.array(k, type=pa.int64()),
                "event_id": pa.array(ids),
                "ts": pa.array(ts, type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "value": pa.array(v, type=pa.int64()),
            }
        )
        got = (
            intervalize(
                ray.data.from_arrow(tbl).repartition(6),
                value_cols=("value",),
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        # int64 value survives in its source type (asof lesson)
        assert got["value"].dtype == np.int64
        order = np.lexsort((ids, ts, k))
        nxt = {}
        for pos in range(len(order) - 1, -1, -1):
            i = order[pos]
            key = k[i]
            nxt_ts = nxt.get(("lead", key))
            exp = None if nxt_ts is None else nxt_ts
            nxt[("exp", i)] = exp
            nxt[("lead", key)] = ts[i]
        for i in range(n):
            row = got.iloc[i]
            assert row["event_id"] == i
            exp = nxt[("exp", i)]
            vt = row["valid_to"]
            if exp is None:
                assert vt is None or vt != vt  # NaT
            else:
                assert vt.value // 1000 == exp
            assert row["valid_from"].value // 1000 == ts[i]

    def test_open_end_sentinel_and_table_path(self, ray_session):
        from maup_ray.ops.temporal import intervalize

        tbl = pa.table(
            {
                "user_id": pa.array([1, 1], type=pa.int64()),
                "event_id": pa.array([5, 6], type=pa.int64()),
                "ts": pa.array([10, 20], type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "value": pa.array([1.0, 2.0]),
            }
        )
        out = intervalize(tbl, open_end_us=999)
        vt = out["valid_to"].to_pylist()
        assert vt[0].microsecond == 20
        assert vt[1].microsecond == 999
        assert out["valid_to"].null_count == 0


class TestIntervalCoverage:
    @staticmethod
    def _brute(ivs):
        """per-key union length + component count via point merge."""
        from collections import defaultdict

        by = defaultdict(list)
        for k, s, e in ivs:
            by[k].append((s, e))
        out = {}
        for k, xs in by.items():
            xs.sort()
            comps = []
            cs, ce = xs[0]
            for s, e in xs[1:]:
                if s <= ce:  # overlap or touch → merge
                    ce = max(ce, e)
                else:
                    comps.append((cs, ce))
                    cs, ce = s, e
            comps.append((cs, ce))
            out[k] = (
                sum(e - s for s, e in comps),
                len(xs),
                len(comps),
            )
        return out

    def _run(self, ivs, parts=1):
        import ray.data

        from maup_ray.ops.temporal import interval_coverage

        t = pa.table(
            {
                "user_id": pa.array([k for k, _, _ in ivs], pa.int64()),
                "s": pa.array([s for _, s, _ in ivs], pa.int64()),
                "e": pa.array([e for _, _, e in ivs], pa.int64()),
            }
        )
        ds = ray.data.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        df = interval_coverage(ds).to_pandas()
        return {
            int(r["user_id"]): (
                int(r["covered"]), int(r["n_intervals"]),
                int(r["n_components"]),
            )
            for _, r in df.iterrows()
        }

    def test_matches_bruteforce(self, ray_session):
        rng = np.random.default_rng(41)
        ivs = []
        for _ in range(400):
            k = int(rng.integers(0, 8))
            s = int(rng.integers(0, 1000))
            e = s + int(rng.integers(1, 60))
            ivs.append((k, s, e))
        assert self._run(ivs, parts=5) == self._brute(ivs)

    def test_touching_intervals_merge(self, ray_session):
        got = self._run([(1, 0, 5), (1, 5, 9), (1, 20, 21)])
        assert got[1] == (10, 3, 2)

    def test_duplicate_intervals(self, ray_session):
        got = self._run([(2, 0, 10), (2, 0, 10), (2, 3, 4)])
        assert got[2] == (10, 3, 1)

    def test_bad_interval_raises(self, ray_session):
        import ray

        with pytest.raises(
            (ValueError, ray.exceptions.RayTaskError),
            match="end > start",
        ):
            self._run([(1, 5, 5)])


class TestGroupedEwma:
    @staticmethod
    def _brute(keys, ts, ids, vals, k=8):
        import collections

        rows = sorted(zip(keys, ts, ids, vals))
        hist = collections.defaultdict(list)
        out = {}
        for key, t, i, v in rows:
            hist[key].append(v)
            h = hist[key][-k:]
            num = sum(
                x * (1 << (k - 1 - j)) for j, x in enumerate(reversed(h))
            )
            den = sum(1 << (k - 1 - j) for j in range(len(h)))
            out[i] = (num, den, num / den)
        return out

    def test_matches_brute(self, ray_session):
        import ray.data
        from datetime import datetime, timedelta

        from maup_ray.ops.temporal import grouped_ewma

        rng = np.random.RandomState(3)
        n = 600
        keys = rng.randint(0, 9, n).astype(np.int64)
        ids = np.arange(n, dtype=np.int64)
        secs = rng.randint(0, 5000, n)
        base = datetime(2024, 1, 1)
        ts = np.array(
            [base + timedelta(seconds=int(s)) for s in secs],
            dtype="datetime64[us]",
        )
        vals = rng.randint(-500, 500, n).astype(np.int64)
        tbl = pa.table(
            {
                "event_id": pa.array(ids),
                "user_id": pa.array(keys),
                "ts": pa.array(ts),
                "v": pa.array(vals),
            }
        )
        want = self._brute(
            keys.tolist(),
            ts.astype(np.int64).tolist(),
            ids.tolist(),
            vals.tolist(),
        )
        # Dataset path (keyed shuffle) and Table path must both match
        for src in (ray.data.from_arrow(tbl).repartition(5), tbl):
            res = grouped_ewma(src)
            t = (
                res
                if isinstance(res, pa.Table)
                else pa.concat_tables(
                    [
                        r
                        for r in (
                            __import__("ray").get(x)
                            for x in res.materialize().to_arrow_refs()
                        )
                        if r.num_rows
                    ]
                )
            )
            got = {
                r["event_id"]: (r["num"], r["den"], r["ewma"])
                for r in t.to_pylist()
            }
            assert got == want

    def test_warmup_weights(self, ray_session):
        from datetime import datetime, timedelta

        from maup_ray.ops.temporal import grouped_ewma

        base = datetime(2024, 1, 1)
        tbl = pa.table(
            {
                "event_id": pa.array([0, 1, 2], type=pa.int64()),
                "user_id": pa.array([7, 7, 7], type=pa.int64()),
                "ts": pa.array(
                    [base + timedelta(seconds=s) for s in range(3)],
                    type=pa.timestamp("us"),
                ),
                "v": pa.array([100, 200, 400], type=pa.int64()),
            }
        )
        out = grouped_ewma(tbl, k_lags=2).to_pylist()
        by = {r["event_id"]: r for r in out}
        # row 0: only itself, weight 2 → ewma = v
        assert by[0]["num"] == 200 and by[0]["den"] == 2
        assert by[0]["ewma"] == 100.0
        # row 1: 2·200 + 1·100 over 3
        assert by[1]["num"] == 500 and by[1]["den"] == 3
        assert by[1]["ewma"] == 500 / 3
        # row 2: 2·400 + 1·200 over 3
        assert by[2]["num"] == 1000 and by[2]["den"] == 3
