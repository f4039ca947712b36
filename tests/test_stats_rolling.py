"""ops/window.grouped_rolling_median and ops/stats.grouped_ttest —
brute-force pandas/statistics replicas + partition invariance +
warm-up/degenerate-cohort edge cases."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maup_ray.ops.stats import grouped_ttest
from maup_ray.ops.window import grouped_rolling_median


def _collect(ds) -> pd.DataFrame:
    import ray

    if isinstance(ds, pa.Table):
        return ds.to_pandas()
    tabs = [ray.get(r) for r in ds.materialize().to_arrow_refs()]
    tabs = [t for t in tabs if t.num_rows] or tabs[:1]
    return pa.concat_tables(tabs).to_pandas()


class TestGroupedRollingMedian:
    def _brute(self, df, window):
        out = {}
        for k, g in df.groupby("k"):
            g = g.sort_values(["ts", "i"]).reset_index(drop=True)
            for r in range(len(g)):
                w = np.sort(
                    g["v"].iloc[max(0, r - window + 1): r + 1]
                    .to_numpy()
                    .astype(np.float64)
                )
                n = len(w)
                if n % 2 == 1:
                    med = float(w[(n - 1) // 2])
                else:
                    lo, hi = w[n // 2 - 1], w[n // 2]
                    med = float(lo + (hi - lo) * 0.5)
                out[(int(k), int(g["i"].iloc[r]))] = med
        return out

    def test_matches_brute(self, ray_session):
        import ray.data

        rng = np.random.RandomState(11)
        n = 3000
        df = pd.DataFrame(
            {
                "k": rng.randint(0, 17, n).astype(np.int64),
                "ts": rng.randint(0, 400, n).astype(np.int64),
                "i": np.arange(n, dtype=np.int64),
                "v": rng.randint(-500, 500, n).astype(np.int64),
            }
        )
        for window in (1, 4, 5):
            got = _collect(
                grouped_rolling_median(
                    ray.data.from_pandas(df).repartition(6),
                    "k", "ts", "i", "v", window=window,
                )
            )
            want = self._brute(df, window)
            assert len(got) == n
            for _, r in got.iterrows():
                assert want[(int(r["k"]), int(r["i"]))] == r["med"], (
                    r["k"], r["i"], window)

    def test_table_path_and_warmup(self, ray_session):
        # warm-up rows use the shorter prefix frame (SQL ROWS parity)
        t = pa.table(
            {
                "k": pa.array([1] * 5, type=pa.int64()),
                "ts": pa.array(range(5), type=pa.int64()),
                "i": pa.array(range(5), type=pa.int64()),
                "v": pa.array([4, 0, 8, 2, 6], type=pa.int64()),
            }
        )
        got = _collect(
            grouped_rolling_median(t, "k", "ts", "i", "v", window=3)
        ).sort_values("i")
        # frames: [4] [4,0] [4,0,8] [0,8,2] [8,2,6]
        assert got["med"].tolist() == [4.0, 2.0, 4.0, 2.0, 6.0]
        with pytest.raises(ValueError):
            grouped_rolling_median(t, "k", "ts", "i", "v", window=0)


class TestGroupedTtest:
    def _brute_row(self, v0, v1):
        n0, n1 = len(v0), len(v1)
        s0, s1 = int(sum(v0)), int(sum(v1))
        q0 = int(sum(x * x for x in v0))
        q1 = int(sum(x * x for x in v1))
        A = n1 * q1 - s1 * s1
        B = n0 * q0 - s0 * s0
        D = s1 * n0 - s0 * n1
        den = (A * n0 + B * n1) * (n0 + n1)
        tsq = (
            float(D * D * (n0 + n1 - 2)) / float(den)
            if n0 >= 2 and n1 >= 2 and den > 0
            else None
        )
        return (
            n0, n1,
            float(s0) / n0 if n0 else None,
            float(s1) / n1 if n1 else None,
            tsq,
        )

    def test_matches_brute_and_scipy_form(self, ray_session):
        import ray.data

        rng = np.random.RandomState(7)
        n = 4000
        df = pd.DataFrame(
            {
                "k": rng.randint(0, 6, n).astype(np.int64),
                "c": rng.randint(0, 2, n).astype(np.int64),
                "v": rng.randint(-300, 300, n).astype(np.int64),
            }
        )
        got = _collect(
            grouped_ttest(
                ray.data.from_pandas(df).repartition(5), "k", "c", "v"
            )
        ).set_index("k")
        assert len(got) == 6
        for k, g in df.groupby("k"):
            v0 = g.loc[g["c"] == 0, "v"].tolist()
            v1 = g.loc[g["c"] == 1, "v"].tolist()
            n0, n1, m0, m1, tsq = self._brute_row(v0, v1)
            r = got.loc[int(k)]
            assert (int(r["n0"]), int(r["n1"])) == (n0, n1)
            assert r["mean0"] == m0 and r["mean1"] == m1
            assert r["tsq"] == tsq
            # cross-check the integer identity against the textbook
            # pooled-t formula in floats
            sp2 = (
                (np.var(v0, ddof=1) * (n0 - 1)
                 + np.var(v1, ddof=1) * (n1 - 1))
                / (n0 + n1 - 2)
            )
            t_ref = (np.mean(v1) - np.mean(v0)) / np.sqrt(
                sp2 * (1.0 / n0 + 1.0 / n1)
            )
            assert abs(tsq - t_ref**2) < 1e-9 * max(1.0, t_ref**2)

    def test_degenerate_cohorts_table_path(self, ray_session):
        # k=1: cohort 1 has a single row -> tsq null; k=2: zero pooled
        # variance -> null; k=3: cohort 0 empty -> mean0 null
        t = pa.table(
            {
                "k": pa.array([1, 1, 1, 2, 2, 2, 2, 3, 3],
                              type=pa.int64()),
                "c": pa.array([0, 0, 1, 0, 0, 1, 1, 1, 1],
                              type=pa.int64()),
                "v": pa.array([5, 7, 6, 4, 4, 4, 4, 9, 1],
                              type=pa.int64()),
            }
        )
        got = _collect(grouped_ttest(t, "k", "c", "v")).set_index("k")
        assert np.isnan(got.loc[1, "tsq"])
        assert np.isnan(got.loc[2, "tsq"])
        assert got.loc[2, "mean0"] == 4.0 and got.loc[2, "mean1"] == 4.0
        assert np.isnan(got.loc[3, "mean0"]) and np.isnan(got.loc[3, "tsq"])
        assert int(got.loc[3, "n0"]) == 0


class TestTheilSen:
    def test_matches_brute_and_floor_semantics(self, ray_session):
        import ray.data

        from maup_ray.ops.stats import theil_sen

        rng = np.random.RandomState(41)
        frames = []
        for k in range(4):
            xs = rng.choice(200, size=30, replace=False).astype(np.int64)
            ys = rng.randint(-5000, 5000, 30).astype(np.int64)
            frames.append(
                pd.DataFrame({"k": k, "x": xs, "y": ys})
            )
        df = pd.concat(frames, ignore_index=True)
        got = theil_sen(
            ray.data.from_pandas(df).repartition(5), "k", "x", "y"
        )
        rows = {
            r["k"]: (r["n_points"], r["n_pairs"], r["qslope_med"])
            for r in got.to_pylist()
        }
        for k, g in df.groupby("k"):
            g = g.sort_values("x")
            xs, ys = g["x"].tolist(), g["y"].tolist()
            slopes = sorted(
                ((ys[j] - ys[i]) << 30) // (xs[j] - xs[i])
                for i in range(len(xs))
                for j in range(i + 1, len(xs))
            )
            med = slopes[(len(slopes) + 1) // 2 - 1]
            assert rows[int(k)] == (len(xs), len(slopes), med)

    def test_duplicate_x_raises(self, ray_session):
        from maup_ray.ops.stats import theil_sen

        t = pa.table(
            {
                "k": pa.array([1, 1], type=pa.int64()),
                "x": pa.array([3, 3], type=pa.int64()),
                "y": pa.array([1, 2], type=pa.int64()),
            }
        )
        # duplicate x rows PRE-AGGREGATE (sum) in the (k, x) partials
        # — that is the documented periods contract, so no error here
        out = theil_sen(t, "k", "x", "y")
        assert out["n_points"].to_pylist() == [1]
        assert out["qslope_med"].to_pylist() == [None]
        # but two DISTINCT rows with equal x cannot happen post-agg;
        # exercise the single-point group path instead
        t2 = pa.table(
            {
                "k": pa.array([1, 1, 2], type=pa.int64()),
                "x": pa.array([0, 7, 4], type=pa.int64()),
                "y": pa.array([0, -7, 9], type=pa.int64()),
            }
        )
        out2 = theil_sen(t2, "k", "x", "y")
        rows = {r["k"]: r for r in out2.to_pylist()}
        # floor(-7·2^30/7) = -2^30 exactly
        assert rows[1]["qslope_med"] == -(1 << 30)
        assert rows[2]["n_pairs"] == 0
        assert rows[2]["qslope_med"] is None


class TestGapMedian:
    def test_matches_brute(self, ray_session):
        import ray.data

        from maup_ray.ops.temporal import gap_median

        rng = np.random.RandomState(53)
        n = 4000
        k = rng.randint(0, 40, n).astype(np.int64)
        d = rng.randint(0, 90, n).astype(np.int64)
        got = (
            gap_median(
                ray.data.from_arrow(
                    pa.table({"k": pa.array(k), "day": pa.array(d)})
                ).repartition(6),
                "k", "day",
            )
        )
        import ray

        tabs = [ray.get(r) for r in got.materialize().to_arrow_refs()]
        tabs = [t for t in tabs if t.num_rows] or tabs[:1]
        rows = {
            r["k"]: (r["n_gaps"], r["med_gap"])
            for r in pa.concat_tables(tabs).to_pylist()
        }
        import math

        want = {}
        for kk in range(40):
            days = sorted(set(d[k == kk].tolist()))
            gaps = sorted(
                b - a for a, b in zip(days, days[1:])
            )
            if gaps:
                want[kk] = (
                    len(gaps),
                    gaps[math.ceil(len(gaps) / 2) - 1],
                )
        assert rows == want

    def test_single_day_key_emits_nothing(self, ray_session):
        import ray.data

        from maup_ray.ops.temporal import gap_median

        t = pa.table(
            {
                "k": pa.array([1, 1, 2], type=pa.int64()),
                "day": pa.array([5, 5, 3], type=pa.int64()),
            }
        )
        got = gap_median(ray.data.from_arrow(t), "k", "day")
        import ray

        n = sum(
            t2.num_rows
            for t2 in ray.get(got.materialize().to_arrow_refs())
        )
        assert n == 0


class TestGiniSplitScan:
    def test_matches_brute(self, ray_session):
        import ray.data

        from maup_ray.ops.stats import gini_split_scan

        rng = np.random.RandomState(61)
        n = 3000
        k = rng.randint(0, 3, n).astype(np.int64)
        y = rng.randint(0, 2, n).astype(np.int64)
        v = rng.randint(0, 50, n).astype(np.int64)
        got = gini_split_scan(
            ray.data.from_arrow(
                pa.table({"k": pa.array(k), "y": pa.array(y),
                          "v": pa.array(v)})
            ).repartition(5),
            "k", "y", "v",
        )
        rows = {
            (r["k"], r["threshold"]): (
                r["n_l"], r["n_r"], r["gl_num"], r["gr_num"]
            )
            for r in got.to_pylist()
        }
        want = {}
        for kk in range(3):
            vv, yy = v[k == kk], y[k == kk]
            for t in sorted(set(vv.tolist()))[:-1]:
                L, R = yy[vv <= t], yy[vv > t]
                m1, m0 = int(L.sum()), int(len(L) - L.sum())
                r1, r0 = int(R.sum()), int(len(R) - R.sum())
                want[(kk, t)] = (
                    len(L), len(R),
                    len(L) ** 2 - m1 * m1 - m0 * m0,
                    len(R) ** 2 - r1 * r1 - r0 * r0,
                )
        assert rows == want
        # perfectly separable split: both numerators are zero at the
        # boundary threshold (pure sides)
        assert want[(0, sorted(set(v[k == 0].tolist()))[0])][2] >= 0
        pure = {
            (kk, t): w for (kk, t), w in want.items()
            if w[2] == 0 and w[3] == 0
        }
        # (existence depends on the draw; the identity is what the
        # engine mirrors, asserted above row-for-row)
        assert isinstance(pure, dict)


class TestPeakConcurrency:
    def test_matches_brute(self, ray_session):
        import ray.data

        from maup_ray.ops.temporal import peak_concurrency

        rng = np.random.RandomState(71)
        n = 2000
        k = rng.randint(0, 5, n).astype(np.int64)
        s = rng.randint(0, 500, n).astype(np.int64)
        ln = rng.randint(1, 40, n).astype(np.int64)
        e = s + ln
        ids = np.arange(n, dtype=np.int64)
        got = _collect(
            peak_concurrency(
                ray.data.from_arrow(
                    pa.table({"k": pa.array(k), "s": pa.array(s),
                              "e": pa.array(e), "i": pa.array(ids)})
                ).repartition(6),
                "k", "s", "e", "i",
            )
        )
        rows = {
            int(r["k"]): (int(r["peak"]), int(r["peak_ts"]))
            for _, r in got.iterrows()
        }
        for kk in range(5):
            evs = sorted(
                [(int(a), 1, int(i)) for a, i in
                 zip(s[k == kk], ids[k == kk])]
                + [(int(b), -1, int(i)) for b, i in
                   zip(e[k == kk], ids[k == kk])]
            )
            depth = best = 0
            best_t = None
            for t, d, _ in evs:
                depth += d
                if depth > best:
                    best, best_t = depth, t
            assert rows[kk] == (best, best_t), kk

    def test_half_open_touching(self, ray_session):
        import ray.data

        from maup_ray.ops.temporal import peak_concurrency

        # [0,5) and [5,9): depth never 2 (half-open, -1 before +1)
        t = pa.table(
            {
                "k": pa.array([1, 1], type=pa.int64()),
                "s": pa.array([0, 5], type=pa.int64()),
                "e": pa.array([5, 9], type=pa.int64()),
                "i": pa.array([1, 2], type=pa.int64()),
            }
        )
        got = _collect(peak_concurrency(
            ray.data.from_arrow(t), "k", "s", "e", "i"))
        assert got["peak"].tolist() == [1]
        assert got["peak_ts"].tolist() == [0]


class TestRollingMinMax:
    def test_matches_brute(self, ray_session):
        import ray.data

        from maup_ray.ops.window import grouped_rolling_minmax

        rng = np.random.RandomState(91)
        n = 2500
        df = pd.DataFrame(
            {
                "k": rng.randint(0, 13, n).astype(np.int64),
                "ts": rng.randint(0, 300, n).astype(np.int64),
                "i": np.arange(n, dtype=np.int64),
                "v": rng.randint(-900, 900, n).astype(np.int64),
            }
        )
        got = _collect(
            grouped_rolling_minmax(
                ray.data.from_pandas(df).repartition(5),
                "k", "ts", "i", "v", window=4,
            )
        )
        rows = {
            (int(r["k"]), int(r["i"])): (int(r["vmin"]),
                                         int(r["vmax"]))
            for _, r in got.iterrows()
        }
        for k, g in df.groupby("k"):
            g = g.sort_values(["ts", "i"]).reset_index(drop=True)
            for r in range(len(g)):
                w = g["v"].iloc[max(0, r - 3): r + 1]
                assert rows[(int(k), int(g["i"].iloc[r]))] == (
                    int(w.min()), int(w.max())
                )

    def test_window_one_is_identity(self, ray_session):
        from maup_ray.ops.window import grouped_rolling_minmax

        t = pa.table(
            {
                "k": pa.array([1, 1], type=pa.int64()),
                "ts": pa.array([1, 2], type=pa.int64()),
                "i": pa.array([1, 2], type=pa.int64()),
                "v": pa.array([7, -3], type=pa.int64()),
            }
        )
        got = grouped_rolling_minmax(t, "k", "ts", "i", "v", window=1)
        assert got["vmin"].to_pylist() == [7, -3]
        assert got["vmax"].to_pylist() == [7, -3]
