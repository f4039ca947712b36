"""ops/stats: grouped Gini / weighted median / MAD — DuckDB parity,
shuffle-vs-driver equivalence, tie invariance, and the exact
arbitrary-precision fallback past int64."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_df(obj):
    import pandas as pd

    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if isinstance(obj, pd.DataFrame):
        return obj
    return obj.to_pandas()


def _brute_gini(v):
    """Textbook sorted-rank Gini in exact Python ints."""
    xs = sorted(int(x) for x in v)
    n = len(xs)
    s = sum(xs)
    rs = sum((i + 1) * x for i, x in enumerate(xs))
    return float(2 * rs - (n + 1) * s) / float(n * s)


class TestGroupedGini:
    def test_matches_duckdb_and_brute(self, ray_session):
        import duckdb
        import ray.data

        from maup_ray.ops.stats import grouped_gini

        rng = np.random.RandomState(3)
        n = 4000
        tbl = pa.table(
            {
                "k": pa.array(
                    rng.choice(["a", "b", "c"], n).astype(object),
                    type=pa.string(),
                ),
                "v": pa.array(
                    rng.randint(1, 5000, n).astype(np.int64)
                ),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(5)
        out = (
            _to_df(grouped_gini(ds, "k", "v", final="driver"))
            .sort_values("k")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", tbl)
        want = con.execute(
            """WITH r AS (SELECT k, v,
                  CAST(row_number() OVER (PARTITION BY k ORDER BY v)
                       AS HUGEINT) AS rn FROM t),
               a AS (SELECT k, count(*) AS n,
                     sum(CAST(v AS HUGEINT)) AS s, sum(rn*v) AS rs
                     FROM r GROUP BY k)
               SELECT k, CAST(n AS BIGINT) AS n,
                 CAST(2*rs - (CAST(n AS HUGEINT)+1)*s AS DOUBLE)
                   / CAST(CAST(n AS HUGEINT)*s AS DOUBLE) AS gini
               FROM a ORDER BY k"""
        ).df()
        assert list(out["n"]) == list(want["n"])
        # bit-exact, not allclose — the exactness contract
        assert [g.hex() for g in out["gini"]] == [
            g.hex() for g in want["gini"]
        ]
        df = tbl.to_pandas()
        for k, grp in df.groupby("k"):
            got = float(out.set_index("k")["gini"][k])
            assert got.hex() == _brute_gini(grp["v"]).hex()

    def test_shuffle_equals_driver(self, ray_session):
        import ray.data

        from maup_ray.ops.stats import grouped_gini

        rng = np.random.RandomState(7)
        tbl = pa.table(
            {
                "k": pa.array(
                    rng.randint(0, 12, 2000).astype(np.int64)
                ),
                "v": pa.array(
                    rng.randint(0, 300, 2000).astype(np.int64)
                ),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(4)
        a = (
            _to_df(grouped_gini(ds, "k", "v", final="driver"))
            .sort_values("k")
            .reset_index(drop=True)
        )
        b = (
            _to_df(grouped_gini(ds, "k", "v", final="shuffle"))
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert list(a["n"]) == list(b["n"])
        assert [x.hex() for x in a["gini"]] == [
            x.hex() for x in b["gini"]
        ]

    def test_bignum_fallback_exact(self, ray_session):
        """Values near 2^40 with n large enough that rank·value sums
        blow past 2^62 — the walk must take the Python-int path and
        still be bit-exact vs the brute formula."""
        import ray.data

        from maup_ray.ops.stats import _gini_walk, grouped_gini

        rng = np.random.RandomState(11)
        n = 3000
        base = np.int64(1) << np.int64(40)
        v = (base + rng.randint(0, 1 << 20, n)).astype(np.int64)
        tbl = pa.table(
            {
                "k": pa.array(np.zeros(n, dtype=np.int64)),
                "v": pa.array(v),
            }
        )
        # force the guard decision check: 4·maxabs·n² ≥ 2^62 here
        assert 4 * int(v.max()) * n * n >= (1 << 62)
        ds = ray.data.from_arrow(tbl).repartition(3)
        out = _to_df(grouped_gini(ds, "k", "v", final="driver"))
        assert float(out["gini"][0]).hex() == _brute_gini(v).hex()

    def test_tie_invariance(self, ray_session):
        """Heavy ties: histogram formula equals brute row_number Gini
        regardless of tie order (the derivation's claim)."""
        import ray.data

        from maup_ray.ops.stats import grouped_gini

        v = np.array([5, 5, 5, 1, 1, 9, 9, 9, 9, 2], dtype=np.int64)
        tbl = pa.table(
            {"k": pa.array(["x"] * len(v)), "v": pa.array(v)}
        )
        ds = ray.data.from_arrow(tbl).repartition(2)
        out = _to_df(grouped_gini(ds, "k", "v", final="driver"))
        assert float(out["gini"][0]).hex() == _brute_gini(v).hex()


class TestGroupedWeightedMedian:
    def test_matches_duckdb(self, ray_session):
        import duckdb
        import ray.data

        from maup_ray.ops.stats import grouped_weighted_median

        rng = np.random.RandomState(5)
        n = 3000
        tbl = pa.table(
            {
                "k": pa.array(
                    rng.choice(["p", "q"], n).astype(object),
                    type=pa.string(),
                ),
                "v": pa.array(rng.randint(0, 400, n).astype(np.int64)),
                "w": pa.array(rng.randint(1, 50, n).astype(np.int64)),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(4)
        out = (
            _to_df(grouped_weighted_median(ds, "k", "v", "w", final="driver"))
            .sort_values("k")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", tbl)
        want = con.execute(
            """WITH g AS (SELECT k, v, sum(w) AS w FROM t GROUP BY k, v),
               s AS (SELECT k, v,
                     sum(w) OVER (PARTITION BY k ORDER BY v) AS cw,
                     sum(w) OVER (PARTITION BY k) AS tw FROM g)
               SELECT k, CAST(any_value(tw) AS BIGINT) AS w_total,
                      min(v) AS wmedian
               FROM s WHERE cw >= (tw + 1) // 2
               GROUP BY k ORDER BY k"""
        ).df()
        assert list(out["w_total"]) == list(want["w_total"])
        assert list(out["wmedian"]) == list(want["wmedian"])

    def test_shuffle_equals_driver(self, ray_session):
        import ray.data

        from maup_ray.ops.stats import grouped_weighted_median

        rng = np.random.RandomState(8)
        tbl = pa.table(
            {
                "k": pa.array(rng.randint(0, 9, 1500).astype(np.int64)),
                "v": pa.array(rng.randint(0, 99, 1500).astype(np.int64)),
                "w": pa.array(rng.randint(1, 7, 1500).astype(np.int64)),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(3)
        a = (
            _to_df(grouped_weighted_median(ds, "k", "v", "w", final="driver"))
            .sort_values("k")
            .reset_index(drop=True)
        )
        b = (
            _to_df(
                grouped_weighted_median(ds, "k", "v", "w", final="shuffle")
            )
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert a.equals(b)

    def test_unit_weights_equal_median(self, ray_session):
        """With all weights 1, the weighted median is quantile_disc
        0.5 — cross-checks the two histogram walks against each
        other."""
        import ray.data

        from maup_ray.ops.curate import grouped_quantiles
        from maup_ray.ops.stats import grouped_weighted_median

        rng = np.random.RandomState(13)
        tbl = pa.table(
            {
                "k": pa.array(rng.randint(0, 4, 900).astype(np.int64)),
                "v": pa.array(rng.randint(0, 50, 900).astype(np.int64)),
                "w": pa.array(np.ones(900, dtype=np.int64)),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(3)
        wm = (
            _to_df(grouped_weighted_median(ds, "k", "v", "w", final="driver"))
            .sort_values("k")
            .reset_index(drop=True)
        )
        med = (
            _to_df(
                grouped_quantiles(
                    ds, "k", "v", qs=((1, 2),), q_names=("m",),
                    final="driver",
                )
            )
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert list(wm["wmedian"]) == list(med["m"])


class TestGroupedMad:
    def test_matches_duckdb(self, ray_session):
        import duckdb
        import ray.data

        from maup_ray.ops.stats import grouped_mad

        rng = np.random.RandomState(21)
        n = 2500
        tbl = pa.table(
            {
                "k": pa.array(
                    rng.choice(["a", "b", "c", "d"], n).astype(object),
                    type=pa.string(),
                ),
                "v": pa.array(
                    rng.randint(-500, 500, n).astype(np.int64)
                ),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(4)
        out = (
            _to_df(grouped_mad(ds, "k", "v"))
            .sort_values("k")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", tbl)
        want = con.execute(
            """WITH m AS (SELECT k, quantile_disc(v, 0.5) AS med
                          FROM t GROUP BY k)
               SELECT t.k, any_value(m.med) AS median,
                      quantile_disc(abs(t.v - m.med), 0.5) AS mad
               FROM t JOIN m USING (k) GROUP BY t.k ORDER BY t.k"""
        ).df()
        assert list(out["median"]) == list(want["median"])
        assert list(out["mad"]) == list(want["mad"])

    def test_partition_invariance(self, ray_session):
        import ray.data

        from maup_ray.ops.stats import grouped_mad

        rng = np.random.RandomState(2)
        tbl = pa.table(
            {
                "k": pa.array(rng.randint(0, 5, 1200).astype(np.int64)),
                "v": pa.array(rng.randint(0, 800, 1200).astype(np.int64)),
            }
        )
        outs = []
        for p in (1, 7):
            ds = ray.data.from_arrow(tbl).repartition(p)
            outs.append(
                _to_df(grouped_mad(ds, "k", "v"))
                .sort_values("k")
                .reset_index(drop=True)
            )
        assert outs[0].equals(outs[1])


class TestGroupedMode:
    def test_matches_brute_and_duckdb(self, ray_session):
        import duckdb
        import ray.data

        from maup_ray.ops.stats import grouped_mode

        rng = np.random.RandomState(11)
        n = 3000
        tbl = pa.table(
            {
                "k": pa.array(
                    rng.randint(0, 7, n).astype(np.int64)
                ),
                "v": pa.array(
                    rng.choice(
                        ["aa", "bb", "cc", "dd", "ee"], n
                    ).astype(object),
                    type=pa.string(),
                ),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(5)
        got = (
            grouped_mode(ds, "k", "v")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", tbl)
        want = con.execute(
            """
            WITH c AS (SELECT k, v, count(*) AS cnt FROM t GROUP BY 1,2),
            r AS (SELECT k, v, cnt, row_number() OVER
                    (PARTITION BY k ORDER BY cnt DESC, v) AS rn FROM c)
            SELECT k, v, cnt FROM r WHERE rn = 1 ORDER BY k
            """
        ).df()
        con.close()
        assert got["k"].tolist() == want["k"].tolist()
        assert got["v"].tolist() == want["v"].tolist()
        assert got["cnt"].tolist() == want["cnt"].tolist()

    def test_driver_equals_shuffle_and_tie_break(self, ray_session):
        import ray.data

        from maup_ray.ops.stats import grouped_mode

        # planted tie: k=0 has 'b' and 'a' twice each -> 'a' wins
        tbl = pa.table(
            {
                "k": pa.array([0, 0, 0, 0, 1, 1, 1], type=pa.int64()),
                "v": pa.array(
                    ["b", "a", "b", "a", "z", "z", "y"], type=pa.string()
                ),
            }
        )
        drv = grouped_mode(tbl, "k", "v", final="driver")
        assert drv["v"].to_pylist() == ["a", "z"]
        assert drv["cnt"].to_pylist() == [2, 2]
        ds = ray.data.from_arrow(tbl).repartition(3)
        shf = (
            grouped_mode(ds, "k", "v")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert shf["v"].tolist() == ["a", "z"]
        assert shf["cnt"].tolist() == [2, 2]


class TestGroupedImpurity:
    def test_matches_brute_force_and_bounds(self, ray_session):
        import ray.data

        from maup_ray.ops.stats import grouped_impurity

        rng = np.random.default_rng(5)
        k = rng.integers(0, 6, size=400)
        cats = np.array(["a", "b", "c", "d"])[rng.integers(0, 4, 400)]
        # one pure group -> impurity exactly 0
        k = np.r_[k, [9, 9, 9]]
        cats = np.r_[cats, ["x", "x", "x"]]
        tbl = pa.table(
            {
                "k": pa.array(k, type=pa.int64()),
                "c": pa.array(cats, type=pa.string()),
            }
        )
        got = grouped_impurity(
            ray.data.from_arrow(tbl).repartition(5), "k", "c"
        )
        from collections import Counter

        for r in got.to_pylist():
            grp = cats[k == r["k"]]
            cnt = Counter(grp.tolist())
            n = len(grp)
            want = float(n * n - sum(c * c for c in cnt.values())) / float(
                n * n
            )
            assert r["impurity"] == want
            assert r["n"] == n
            assert 0.0 <= r["impurity"] < 1.0
        pure = [r for r in got.to_pylist() if r["k"] == 9][0]
        assert pure["impurity"] == 0.0

    def test_key_dtype_preserved(self, ray_session):
        import ray.data

        from maup_ray.ops.stats import grouped_impurity

        tbl = pa.table(
            {
                "k": pa.array([1, 1, 2], type=pa.int32()),
                "c": pa.array(["a", "b", "a"]),
            }
        )
        got = grouped_impurity(ray.data.from_arrow(tbl), "k", "c")
        assert got.schema.field("k").type == pa.int32()


class TestGroupedSpearman:
    def test_matches_scipy_free_reference(self, ray_session):
        import ray.data

        from maup_ray.ops.stats import grouped_spearman

        rng = np.random.default_rng(7)
        n = 600
        k = rng.integers(0, 4, size=n)
        x = rng.integers(0, 30, size=n)  # heavy ties
        # y correlated with x plus noise
        y = x * 3 + rng.integers(-10, 10, size=n)
        tbl = pa.table(
            {"k": pa.array(k, type=pa.int64()),
             "x": pa.array(x, type=pa.int64()),
             "y": pa.array(y, type=pa.int64())}
        )
        got = grouped_spearman(
            ray.data.from_arrow(tbl).repartition(5), "k", "x", "y"
        )

        def mr(v):
            order = np.argsort(v, kind="stable")
            sv = v[order]
            starts = np.flatnonzero(
                np.diff(sv, prepend=sv[0] - 1)
            )
            cnt = np.diff(np.append(starts, len(sv)))
            pref = np.append(0, np.cumsum(cnt))[:-1]
            m = (2 * pref + cnt + 1) / 2.0
            out = np.empty(len(v))
            out[order] = np.repeat(m, cnt)
            return out

        for r in got.to_pylist():
            m = k == r["k"]
            rx, ry = mr(x[m]), mr(y[m])
            # pearson of midranks
            nn = m.sum()
            num = nn * (rx * ry).sum() - rx.sum() * ry.sum()
            den = np.sqrt(
                (nn * (rx * rx).sum() - rx.sum() ** 2)
                * (nn * (ry * ry).sum() - ry.sum() ** 2)
            )
            assert abs(r["rho"] - num / den) < 1e-12
            assert r["rho"] > 0.8  # planted correlation
            assert r["n"] == nn

    def test_perfect_and_constant(self, ray_session):
        import ray.data

        from maup_ray.ops.stats import grouped_spearman

        tbl = pa.table(
            {
                "k": pa.array([0] * 5 + [1] * 5, type=pa.int64()),
                "x": pa.array([1, 2, 3, 4, 5] + [1, 2, 3, 4, 5],
                              type=pa.int64()),
                "y": pa.array([2, 4, 6, 8, 10] + [7, 7, 7, 7, 7],
                              type=pa.int64()),
            }
        )
        got = {r["k"]: r["rho"]
               for r in grouped_spearman(
                   ray.data.from_arrow(tbl), "k", "x", "y"
               ).to_pylist()}
        assert got[0] == 1.0        # perfect monotone
        assert got[1] is None       # constant y -> undefined


class TestGroupedKendall:
    def test_matches_brute_force(self, ray_session):
        import ray.data

        from maup_ray.ops.stats import grouped_kendall

        rng = np.random.default_rng(11)
        n = 400
        k = rng.integers(0, 5, size=n)
        x = rng.integers(0, 20, size=n)  # heavy ties in both axes
        y = x * 2 + rng.integers(-5, 5, size=n)
        tbl = pa.table(
            {"k": pa.array(k, type=pa.int64()),
             "x": pa.array(x, type=pa.int64()),
             "y": pa.array(y, type=pa.int64())}
        )
        got = grouped_kendall(
            ray.data.from_arrow(tbl).repartition(7), "k", "x", "y"
        )

        def brute(xs, ys):
            cd = n1 = n2 = 0
            m = len(xs)
            for i in range(m):
                for j in range(i + 1, m):
                    sx = int(xs[j] > xs[i]) - int(xs[j] < xs[i])
                    sy = int(ys[j] > ys[i]) - int(ys[j] < ys[i])
                    cd += sx * sy
                    n1 += sx == 0
                    n2 += sy == 0
            n0 = m * (m - 1) // 2
            return float(cd) / np.sqrt(
                float(n0 - n1) * float(n0 - n2)
            )

        rows = got.to_pylist()
        assert {r["k"] for r in rows} == set(np.unique(k).tolist())
        for r in rows:
            m = k == r["k"]
            assert r["n"] == int(m.sum())
            assert r["tau"] == brute(x[m], y[m])
            assert r["tau"] > 0.5  # planted concordance

    def test_edge_cases(self, ray_session):
        import ray.data

        from maup_ray.ops.stats import grouped_kendall

        tbl = pa.table(
            {
                # key 0: perfect discordance; key 1: constant y
                # (null tau); key 2: single row (dropped)
                "k": pa.array([0, 0, 0, 1, 1, 2], type=pa.int64()),
                "x": pa.array([1, 2, 3, 1, 2, 9], type=pa.int64()),
                "y": pa.array([9, 5, 1, 4, 4, 0], type=pa.int64()),
            }
        )
        got = {r["k"]: r
               for r in grouped_kendall(
                   ray.data.from_arrow(tbl), "k", "x", "y"
               ).to_pylist()}
        assert set(got) == {0, 1}
        assert got[0]["tau"] == -1.0
        assert got[1]["tau"] is None
