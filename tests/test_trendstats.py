"""ops.stats.grouped_ols, ops.temporal.grouped_autocorr,
ops.sessions.session_paths — brute-force oracles over small seeded
inputs with planted edge cases (duplicate timestamps, zero-variance
groups, below-min-pairs groups, gap-exactly-equal boundaries), both
Table and Dataset paths (SURVEY §5.2 test discipline)."""

import math
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pytest


def _collect(res):
    import ray

    if isinstance(res, pa.Table):
        return res
    tabs = [
        t
        for t in (
            ray.get(r) for r in res.materialize().to_arrow_refs()
        )
        if t.num_rows
    ]
    return pa.concat_tables(tabs)


class TestGroupedOLS:
    def _brute(self, keys, xs, ys):
        out = {}
        for k in sorted(set(keys)):
            x = [int(a) for a, kk in zip(xs, keys) if kk == k]
            y = [int(b) for b, kk in zip(ys, keys) if kk == k]
            n = len(x)
            sx, sy = sum(x), sum(y)
            sxx = sum(a * a for a in x)
            sxy = sum(a * b for a, b in zip(x, y))
            den = n * sxx - sx * sx
            if den == 0:
                out[k] = (n, None, None)
            else:
                out[k] = (
                    n,
                    float(n * sxy - sx * sy) / float(den),
                    float(sy * sxx - sx * sxy) / float(den),
                )
        return out

    def test_matches_brute(self, ray_session):
        import ray.data

        from maup_ray.ops.stats import grouped_ols

        rng = np.random.RandomState(7)
        n = 500
        keys = rng.randint(0, 6, n).astype(np.int64)
        x = rng.randint(-40, 40, n).astype(np.int64)
        y = rng.randint(-1000, 1000, n).astype(np.int64)
        # group 5: zero x-variance → null slope/intercept
        x[keys == 5] = 17
        tbl = pa.table(
            {"k": pa.array(keys), "x": pa.array(x), "y": pa.array(y)}
        )
        want = self._brute(keys.tolist(), x.tolist(), y.tolist())
        for src in (ray.data.from_arrow(tbl).repartition(4), tbl):
            got = grouped_ols(src, "k", "x", "y")
            rows = {
                r["k"]: (r["n"], r["slope"], r["intercept"])
                for r in got.to_pylist()
            }
            assert rows == want

    def test_batch_bound_guard(self, ray_session):
        from maup_ray.ops.stats import grouped_ols

        big = 1 << 31
        tbl = pa.table(
            {
                "k": pa.array([0, 0], type=pa.int64()),
                "x": pa.array([big, big], type=pa.int64()),
                "y": pa.array([1, 2], type=pa.int64()),
            }
        )
        with pytest.raises(AssertionError, match="rescale"):
            grouped_ols(tbl, "k", "x", "y")


class TestGroupedAutocorr:
    def _brute(self, df):
        out = {}
        for k, g in df.groupby("user_id"):
            g = g.sort_values(["ts", "event_id"], kind="stable")
            v = [int(z) for z in g["v"]]
            if len(v) < 3:  # m = n-1 pairs, need m >= 2
                continue
            xs, ys = v[:-1], v[1:]
            m = len(xs)
            sx, sy = sum(xs), sum(ys)
            sxx = sum(a * a for a in xs)
            syy = sum(b * b for b in ys)
            sxy = sum(a * b for a, b in zip(xs, ys))
            num = m * sxy - sx * sy
            d1 = m * sxx - sx * sx
            d2 = m * syy - sy * sy
            r = (
                float(num) / math.sqrt(float(d1) * float(d2))
                if d1 > 0 and d2 > 0
                else None
            )
            out[k] = (m, num, d1, d2, r)
        return out

    def test_matches_brute(self, ray_session):
        import pandas as pd
        import ray.data

        from maup_ray.ops.temporal import grouped_autocorr

        rng = np.random.RandomState(5)
        n = 700
        base = datetime(2024, 3, 1)
        # minute grid → many duplicate ts within a user (tie order by id)
        ts = np.array(
            [
                base + timedelta(minutes=int(m))
                for m in rng.randint(0, 120, n)
            ],
            dtype="datetime64[us]",
        )
        keys = rng.randint(0, 11, n).astype(np.int64)
        v = rng.randint(-300, 300, n).astype(np.int64)
        # user 9: constant value → d1 = d2 = 0 → null r
        v[keys == 9] = 42
        # user 10: exactly 2 rows → 1 pair → dropped
        m10 = np.flatnonzero(keys == 10)
        keys[m10[2:]] = 0
        tbl = pa.table(
            {
                "user_id": pa.array(keys),
                "ts": pa.array(ts),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "v": pa.array(v),
            }
        )
        df = pd.DataFrame(
            {
                "user_id": keys,
                "ts": ts,
                "event_id": np.arange(n),
                "v": v,
            }
        )
        want = self._brute(df)
        assert any(w[4] is None for w in want.values())  # planted null
        for src in (ray.data.from_arrow(tbl).repartition(5), tbl):
            got = _collect(grouped_autocorr(src))
            rows = {
                r["user_id"]: (r["m"], r["num"], r["d1"], r["d2"], r["r"])
                for r in got.to_pylist()
            }
            assert rows == want


class TestSessionPaths:
    GAP_MIN = 30.0

    def _brute(self, df, min_count):
        gap_us = int(self.GAP_MIN * 60 * 1_000_000)
        paths = {}
        for _, g in df.groupby("user_id"):
            g = g.sort_values(["ts", "event_id"], kind="stable")
            tsv = g["ts"].astype("datetime64[us]").astype(np.int64)
            cur = []
            prev = None
            for t, et in zip(tsv, g["event_type"]):
                if prev is not None and t - prev > gap_us:
                    p = " ".join(cur)
                    paths[p] = paths.get(p, 0) + 1
                    cur = []
                cur.append(et)
                prev = t
            if cur:
                p = " ".join(cur)
                paths[p] = paths.get(p, 0) + 1
        return {p: c for p, c in paths.items() if c >= min_count}

    def test_matches_brute(self, ray_session):
        import pandas as pd
        import ray.data

        from maup_ray.ops.sessions import session_paths

        rng = np.random.RandomState(13)
        n = 900
        base = datetime(2024, 6, 1)
        keys = rng.randint(0, 25, n).astype(np.int64)
        # 10-minute grid; gaps of EXACTLY 30 min occur and must NOT
        # split (strict > rule)
        ts = np.array(
            [
                base + timedelta(minutes=int(10 * m))
                for m in rng.randint(0, 40, n)
            ],
            dtype="datetime64[us]",
        )
        types = np.array(["a", "b", "c"])[rng.randint(0, 3, n)]
        tbl = pa.table(
            {
                "user_id": pa.array(keys),
                "ts": pa.array(ts),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "event_type": pa.array(types),
            }
        )
        df = pd.DataFrame(
            {
                "user_id": keys,
                "ts": ts,
                "event_id": np.arange(n),
                "event_type": types,
            }
        )
        for mc in (1, 3):
            want = self._brute(df, mc)
            for src in (ray.data.from_arrow(tbl).repartition(4), tbl):
                got = session_paths(
                    src, gap_minutes=self.GAP_MIN, min_count=mc
                )
                got = got if isinstance(got, pa.Table) else _collect(got)
                rows = {
                    r["path"]: r["n_sessions"] for r in got.to_pylist()
                }
                assert rows == want
        # determinism: sorted by path
        got = session_paths(tbl, gap_minutes=self.GAP_MIN, min_count=1)
        ps = got["path"].to_pylist()
        assert ps == sorted(ps)

    def test_exact_gap_boundary_is_same_session(self, ray_session):
        from maup_ray.ops.sessions import session_paths

        base = datetime(2024, 1, 1)
        tbl = pa.table(
            {
                "user_id": pa.array([1, 1, 1], type=pa.int64()),
                "ts": pa.array(
                    [
                        base,
                        base + timedelta(minutes=30),  # == gap: same
                        base + timedelta(minutes=61),  # > gap: new
                    ],
                    type=pa.timestamp("us"),
                ),
                "event_id": pa.array([0, 1, 2], type=pa.int64()),
                "event_type": pa.array(["a", "b", "c"]),
            }
        )
        got = session_paths(tbl, gap_minutes=30.0, min_count=1)
        rows = {r["path"]: r["n_sessions"] for r in got.to_pylist()}
        assert rows == {"a b": 1, "c": 1}
