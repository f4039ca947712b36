"""Curation primitives: hash sampling, per-group top-k, exact grouped
quantiles — brute-force oracles on small inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _to_df(ds) -> pd.DataFrame:
    return ds.to_pandas()


class TestHashSample:
    def test_matches_expression(self, ray_session):
        import ray.data

        from maup_ray.ops.curate import hash_sample

        ids = np.arange(1000, dtype=np.int64)
        ds = ray.data.from_arrow(pa.table({"doc_id": ids}))
        out = _to_df(hash_sample(ds, "doc_id", keep=13))
        want = ids[(ids * 48271 + 11) % 100 < 13]
        assert sorted(out["doc_id"]) == sorted(want)

    def test_deterministic_across_runs(self, ray_session):
        import ray.data

        from maup_ray.ops.curate import hash_sample

        ids = np.arange(500, dtype=np.int64)
        ds = ray.data.from_arrow(pa.table({"doc_id": ids}))
        a = sorted(_to_df(hash_sample(ds, "doc_id", keep=7))["doc_id"])
        b = sorted(_to_df(hash_sample(ds, "doc_id", keep=7))["doc_id"])
        assert a == b


class TestTopKPerGroup:
    def _brute(self, df, k):
        df = df.sort_values(
            ["g", "v", "t"], ascending=[True, False, True]
        )
        df["rank"] = df.groupby("g").cumcount() + 1
        return df[df["rank"] <= k].reset_index(drop=True)

    @pytest.mark.parametrize("blocks", [1, 4])
    def test_matches_brute(self, ray_session, blocks):
        import ray.data

        from maup_ray.ops.curate import top_k_per_group

        rng = np.random.RandomState(3)
        n = 400
        tbl = pa.table(
            {
                "g": pa.array(rng.randint(0, 30, n).astype(np.int64)),
                "v": pa.array(rng.randint(0, 10, n).astype(np.int64)),
                "t": pa.array(np.arange(n, dtype=np.int64)),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        out = (
            _to_df(top_k_per_group(ds, "g", "v", 3, "t"))
            .sort_values(["g", "rank"])
            .reset_index(drop=True)
        )
        want = (
            self._brute(tbl.to_pandas(), 3)
            .sort_values(["g", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            out[["g", "v", "t", "rank"]], want[["g", "v", "t", "rank"]]
        )

    def test_ties_break_by_tie_col(self, ray_session):
        import ray.data

        from maup_ray.ops.curate import top_k_per_group

        tbl = pa.table(
            {
                "g": pa.array([1, 1, 1, 1], type=pa.int64()),
                "v": pa.array([5, 5, 5, 5], type=pa.int64()),
                "t": pa.array([40, 10, 30, 20], type=pa.int64()),
            }
        )
        out = _to_df(
            top_k_per_group(ray.data.from_arrow(tbl), "g", "v", 2, "t")
        ).sort_values("rank")
        assert list(out["t"]) == [10, 20]
        assert list(out["rank"]) == [1, 2]


class TestGroupedDistinctCount:
    @pytest.mark.parametrize("blocks", [1, 6])
    def test_matches_pandas(self, ray_session, blocks):
        import ray.data

        from maup_ray.ops.curate import grouped_distinct_count

        rng = np.random.RandomState(31)
        n = 3000
        df = pd.DataFrame(
            {
                "k": rng.choice(["a", "b", "c"], n),
                "v": rng.randint(0, 80, n).astype(np.int64),
            }
        )
        # duplicates across blocks must not double-count
        ds = ray.data.from_pandas(df).repartition(blocks)
        out = (
            grouped_distinct_count(ds, "k", "v")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = (
            df.groupby("k")["v"].nunique().sort_index()
        )
        assert list(out["k"]) == list(want.index)
        assert list(out["n"]) == list(want.values)


class TestGroupedQuantiles:
    def test_matches_duckdb(self, ray_session):
        import duckdb
        import ray.data

        from maup_ray.ops.curate import grouped_quantiles

        rng = np.random.RandomState(9)
        n = 3000
        tbl = pa.table(
            {
                "k": pa.array(
                    rng.choice(["a", "b", "c"], n).astype(object),
                    type=pa.string(),
                ),
                "v": pa.array(rng.randint(0, 97, n).astype(np.int64)),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(3)
        out = (
            _to_df(grouped_quantiles(ds, "k", "v"))
            .sort_values("k")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", tbl)
        want = con.execute(
            """SELECT k, count(*) AS n,
                 quantile_disc(v, 0.5) AS p50,
                 quantile_disc(v, 0.9) AS p90,
                 quantile_disc(v, 0.99) AS p99
               FROM t GROUP BY k ORDER BY k"""
        ).df()
        for c in ("n", "p50", "p90", "p99"):
            assert list(out[c]) == list(want[c]), c

    def test_driver_final_equals_shuffle(self, ray_session):
        import ray.data

        from maup_ray.ops.curate import grouped_quantiles

        rng = np.random.RandomState(17)
        n = 2000
        tbl = pa.table(
            {
                "k": pa.array(
                    rng.choice(["x", "y"], n).astype(object),
                    type=pa.string(),
                ),
                "v": pa.array(rng.randint(0, 53, n).astype(np.int64)),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(4)
        dist = (
            grouped_quantiles(ds, "k", "v")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        drv = (
            grouped_quantiles(ds, "k", "v", final="driver")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(dist, drv)

    def test_single_value_group(self, ray_session):
        import ray.data

        from maup_ray.ops.curate import grouped_quantiles

        tbl = pa.table(
            {
                "k": pa.array(["x"] * 5, type=pa.string()),
                "v": pa.array([42] * 5, type=pa.int64()),
            }
        )
        out = _to_df(grouped_quantiles(ray.data.from_arrow(tbl), "k", "v"))
        assert out.iloc[0]["p50"] == 42 == out.iloc[0]["p99"]
        assert out.iloc[0]["n"] == 5


class TestProfileColumns:
    def test_counts_nulls_minmax_across_blocks(self, ray_session):
        import ray.data

        from maup_ray.ops.agg import profile_columns

        tbl = pa.table(
            {
                "a": pa.array([1, None, 3, None, 5], type=pa.int64()),
                "b": pa.array([2.5, 0.5, None, 9.0, -1.0]),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(3)
        out = profile_columns(ds, ["a", "b"]).to_pandas()
        a = out[out["column"] == "a"].iloc[0]
        b = out[out["column"] == "b"].iloc[0]
        assert a["n"] == 5 and a["n_null"] == 2
        assert a["min_v"] == 1.0 and a["max_v"] == 5.0
        assert b["n"] == 5 and b["n_null"] == 1
        assert b["min_v"] == -1.0 and b["max_v"] == 9.0

    def test_all_null_column(self, ray_session):
        import ray.data

        from maup_ray.ops.agg import profile_columns

        tbl = pa.table({"a": pa.array([None, None], type=pa.int64())})
        out = profile_columns(
            ray.data.from_arrow(tbl), ["a"]
        ).to_pandas()
        assert out.iloc[0]["n_null"] == 2
        assert np.isnan(out.iloc[0]["min_v"])


class TestHashSampleOverflowGuard:
    def test_out_of_range_ids_raise_instead_of_wrapping(self, ray_session):
        # ADVICE r3: numpy wraps (id*a+b) silently where the DuckDB
        # oracle raises OutOfRange — the engine must raise too
        import ray.data

        from maup_ray.ops.curate import hash_sample

        t = pa.table(
            {"id": pa.array([2**62], type=pa.int64())}
        )
        ds = ray.data.from_arrow(t)
        with pytest.raises(Exception, match="overflow|exceeds"):
            hash_sample(ds, "id", keep=35).to_pandas()

    def test_in_range_ids_unaffected(self, ray_session):
        import ray.data

        from maup_ray.ops.curate import hash_sample

        ids = np.arange(1000, dtype=np.int64)
        t = pa.table({"id": pa.array(ids)})
        got = (
            hash_sample(ray.data.from_arrow(t), "id", keep=35)
            .to_pandas()["id"]
            .to_numpy()
        )
        want = ids[(ids * 48271 + 11) % 100 < 35]
        assert np.array_equal(np.sort(got), want)


class TestHyperLogLog:
    def test_small_range_is_exact_and_error_bounded(self):
        from maup_ray.ops.sketch import approx_distinct

        rng = np.random.RandomState(3)
        n_distinct = 50_000
        vals = rng.randint(0, n_distinct, size=200_000) * 7919 + 13
        t = pa.table({"v": pa.array(vals, type=pa.int64())})
        est = approx_distinct(t, ["v"], p=14)["approx_distinct"][0].as_py()
        exact = len(np.unique(vals))
        assert abs(est - exact) / exact < 0.02  # 1.04/sqrt(2^14) ≈ 0.8%
        # tiny cardinality sits in the linear-counting regime: exact
        t2 = pa.table({"v": pa.array([1, 2, 3, 2, 1], type=pa.int64())})
        assert (
            approx_distinct(t2, ["v"], p=12)["approx_distinct"][0].as_py()
            == 3
        )

    def test_partition_and_duplicate_invariant(self, ray_session):
        import ray.data

        from maup_ray.ops.sketch import approx_distinct

        vals = np.arange(10_000, dtype=np.int64) * 104729
        t = pa.table({"v": pa.array(vals)})
        dup = pa.concat_tables([t, t, t.slice(0, 500)])
        outs = [
            approx_distinct(
                ray.data.from_arrow(x).repartition(p), ["v"], p=13
            )["approx_distinct"][0].as_py()
            for x, p in [(t, 1), (t, 9), (dup, 4)]
        ]
        # registers are max-merged: block structure AND duplicates
        # cannot change any register, hence identical estimates
        assert outs[0] == outs[1] == outs[2]

    def test_nulls_skipped(self):
        from maup_ray.ops.sketch import approx_distinct

        t = pa.table(
            {"v": pa.array([1, None, 2, None, 1], type=pa.int64())}
        )
        assert (
            approx_distinct(t, ["v"], p=12)["approx_distinct"][0].as_py()
            == 2
        )

    def test_query_pinned_values(self, ray_session):
        """Deterministic register contents ⇒ pinned estimates at
        sf0.001 (exact values: 1000/15/5/100)."""
        from maup_ray.pipelines import q_approx_distinct

        got = {
            r["column"]: r["approx_distinct"]
            for r in q_approx_distinct("/root/testdata/sf0.001")
            .to_pandas()
            .to_dict("records")
        }
        assert got == {
            "event_id": 998,  # 0.2% off the exact 1000 — in spec
            "user_id": 15,
            "event_type": 5,
            "props": 100,
        }


class TestGroupedMode:
    def _tbl(self, n=500, users=13, types=5, seed=11):
        rng = np.random.default_rng(seed)
        return pa.table(
            {
                "user_id": pa.array(
                    rng.integers(0, users, n), type=pa.int64()
                ),
                "event_type": pa.array(
                    [f"t{v}" for v in rng.integers(0, types, n)]
                ),
            }
        )

    def test_matches_pandas_brute_with_tie_rule(self, ray_session):
        from maup_ray.ops.curate import grouped_mode

        tbl = self._tbl()
        got = (
            grouped_mode(tbl, "user_id", "event_type", out_col="top")
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        df = tbl.to_pandas()
        cnt = (
            df.groupby(["user_id", "event_type"])
            .size()
            .reset_index(name="n")
        )
        cnt = cnt.sort_values(
            ["user_id", "n", "event_type"],
            ascending=[True, False, True],
        )
        want = cnt.groupby("user_id").head(1).reset_index(drop=True)
        assert list(got["user_id"]) == list(want["user_id"])
        assert list(got["top"]) == list(want["event_type"])
        assert list(got["n_occ"]) == list(want["n"])

    def test_partition_invariant(self, ray_session):
        import ray.data

        from maup_ray.ops.curate import grouped_mode

        tbl = self._tbl(n=700, seed=4)
        a = (
            grouped_mode(tbl, "user_id", "event_type")
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        for blocks in (2, 9):
            b = (
                grouped_mode(
                    ray.data.from_arrow(tbl).repartition(blocks),
                    "user_id",
                    "event_type",
                )
                .to_pandas()
                .sort_values("user_id")
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(a, b)


class TestGroupedSumCountHashMode:
    def test_hash_matches_shuffle_and_driver(self, ray_session):
        import ray.data

        from maup_ray.ops.agg import grouped_sum_count

        rng = np.random.default_rng(5)
        tbl = pa.table(
            {
                "k": pa.array(rng.integers(0, 37, 2000), type=pa.int64()),
                "v": pa.array(rng.integers(0, 100, 2000), type=pa.int64()),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(7)
        a = (
            grouped_sum_count(ds, ["k"], ["v"], "n", final="hash")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        b = (
            grouped_sum_count(ds, ["k"], ["v"], "n", final="driver")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a[["k", "v", "n"]], b[["k", "v", "n"]])

    def test_hash_rejects_float_sums(self, ray_session):
        import ray.data

        from maup_ray.ops.agg import grouped_sum_count

        tbl = pa.table(
            {
                "k": pa.array([1, 1, 2], type=pa.int64()),
                "v": pa.array([0.5, 0.25, 1.0]),
            }
        )
        ds = ray.data.from_arrow(tbl)
        with pytest.raises(
            (TypeError, Exception), match="not integer|RayTaskError"
        ):
            grouped_sum_count(
                ds, ["k"], ["v"], final="hash"
            ).to_pandas()


class TestRetention:
    def test_handcrafted_cohorts(self):
        from maup_ray.ops.sessions import retention

        ts = pa.array(
            np.array(
                [
                    "2020-01-01T05:00:00",  # u1 cohort day 0
                    "2020-01-01T07:00:00",  # u1 same day (dedup)
                    "2020-01-03T01:00:00",  # u1 offset 2
                    "2020-01-02T01:00:00",  # u2 cohort
                    "2020-01-04T02:00:00",  # u2 offset 2
                    "2020-01-01T09:00:00",  # u3 cohort day 0
                ],
                dtype="datetime64[us]",
            )
        )
        t = pa.table(
            {
                "user_id": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
                "ts": ts,
            }
        )
        out = retention(t).to_pandas()
        out["cohort"] = out["cohort"].astype(str)
        rows = set(
            zip(out["cohort"], out["offset_days"], out["n_users"])
        )
        assert rows == {
            ("2020-01-01", 0, 2),
            ("2020-01-01", 2, 1),
            ("2020-01-02", 0, 1),
            ("2020-01-02", 2, 1),
        }

    def test_dataset_matches_table_with_cross_block_dups(
        self, ray_session
    ):
        import ray.data

        from maup_ray.ops.sessions import retention

        rng = np.random.default_rng(2)
        n = 400
        ts = np.datetime64("2021-03-01", "us") + rng.integers(
            0, 20 * 86_400_000_000, n
        ).astype("timedelta64[us]")
        tbl = pa.table(
            {
                "user_id": pa.array(
                    rng.integers(0, 25, n), type=pa.int64()
                ),
                "ts": pa.array(ts),
            }
        )
        a = retention(tbl).to_pandas()
        b = retention(
            ray.data.from_arrow(tbl).repartition(7)
        ).to_pandas()
        pd.testing.assert_frame_equal(a, b)


class TestGroupedRollup:
    def _tbl(self, n=3000, seed=7):
        rng = np.random.default_rng(seed)
        return pa.table(
            {
                "a": pa.array(
                    np.char.add("r", rng.integers(0, 4, n).astype(str))
                ),
                "b": pa.array(
                    np.char.add("n", rng.integers(0, 13, n).astype(str))
                ),
                "v": pa.array(rng.integers(-50, 50, n), type=pa.int64()),
            }
        )

    @pytest.mark.parametrize("n_blocks", [1, 8])
    def test_matches_duckdb_rollup(self, ray_session, n_blocks):
        import duckdb
        import ray.data

        from maup_ray.ops.agg import grouped_rollup

        t = self._tbl()
        want = duckdb.sql(
            """SELECT a, b, CAST(sum(v) AS BIGINT) AS v,
                      count(*) AS n
               FROM t GROUP BY ROLLUP(a, b)
               ORDER BY a NULLS LAST, b NULLS LAST"""
        ).arrow()
        got = grouped_rollup(
            ray.data.from_arrow(t).repartition(n_blocks),
            ["a", "b"],
            sum_cols=["v"],
            count_col="n",
        ).sort_by(
            [("a", "ascending"), ("b", "ascending")]
        )
        # Arrow sort puts nulls last by default — same as the SQL
        pd.testing.assert_frame_equal(
            got.to_pandas(), want.to_pandas().astype({"n": "int64"})
        )

    def test_level_count_and_exact_totals(self, ray_session):
        import ray.data

        from maup_ray.ops.agg import grouped_rollup

        t = self._tbl(n=500, seed=3)
        out = grouped_rollup(
            ray.data.from_arrow(t), ["a", "b"], sum_cols=["v"],
            count_col="n",
        )
        df = out.to_pandas()
        grand = df[df["a"].isna()]
        assert len(grand) == 1
        assert int(grand["v"].iloc[0]) == int(t["v"].to_pandas().sum())
        assert int(grand["n"].iloc[0]) == len(t)
        # every level's totals re-sum to the grand total
        lvl_finest = df[df["b"].notna()]
        assert int(lvl_finest["v"].sum()) == int(grand["v"].iloc[0])


class TestGroupedOutliers:
    def _brute(self, k, v, num, den):
        """Exact rational z-test per group, arbitrary-precision."""
        import math

        out = np.zeros(len(v), dtype=bool)
        for g in np.unique(k):
            m = k == g
            vv = v[m]
            n, s = len(vv), int(vv.sum())
            q = int((vv.astype(object) ** 2).sum())
            d = n * q - s * s
            a = vv.astype(object) * n - s
            out[m] = [
                int(x) * den > 0
                and (int(x) * den) ** 2 > num * num * d
                for x in a
            ]
        return out

    @pytest.mark.parametrize("n_blocks", [1, 7])
    @pytest.mark.parametrize("num,den", [(3, 1), (3, 2), (1, 1)])
    def test_matches_brute(self, ray_session, n_blocks, num, den):
        import ray.data

        from maup_ray.ops.curate import grouped_outliers

        rng = np.random.default_rng(11)
        n = 3000
        k = rng.integers(0, 6, n)
        # heavy-tailed-ish: mostly small, a few large spikes
        v = rng.integers(-100, 100, n)
        v[rng.integers(0, n, 30)] += 5000
        t = pa.table(
            {
                "g": pa.array(k, type=pa.int64()),
                "v": pa.array(v, type=pa.int64()),
                "id": pa.array(np.arange(n, dtype=np.int64)),
            }
        )
        want_ids = sorted(
            np.arange(n)[self._brute(k, v, num, den)].tolist()
        )
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        got = (
            grouped_outliers(
                ds, "g", "v", sigmas=(num, den), keep_cols=["id"]
            )
            .to_pandas()
        )
        assert sorted(got["id"].tolist()) == want_ids

    def test_constant_group_no_outliers(self, ray_session):
        import ray.data

        from maup_ray.ops.curate import grouped_outliers

        t = pa.table(
            {
                "g": pa.array([0] * 50, type=pa.int64()),
                "v": pa.array([7] * 50, type=pa.int64()),
            }
        )
        got = grouped_outliers(
            ray.data.from_arrow(t), "g", "v"
        ).to_pandas()
        assert len(got) == 0

    def test_rejects_float_values(self, ray_session):
        import ray.data

        from maup_ray.ops.curate import grouped_outliers

        t = pa.table({"g": pa.array([0]), "v": pa.array([0.5])})
        with pytest.raises(Exception, match="integer|RayTaskError"):
            grouped_outliers(
                ray.data.from_arrow(t), "g", "v"
            ).to_pandas()


class TestCooccurrence:
    @pytest.mark.parametrize("n_blocks", [1, 7])
    def test_matches_brute(self, ray_session, n_blocks):
        import itertools

        import ray.data

        from maup_ray.ops.curate import cooccurrence_counts

        rng = np.random.RandomState(5)
        n = 4000
        k = rng.randint(0, 300, n).astype(np.int64)
        items = np.char.add("t", rng.randint(0, 8, n).astype(str))
        want: dict = {}
        per_key: dict = {}
        for kk, it in zip(k, items):
            per_key.setdefault(kk, set()).add(it)
        for s in per_key.values():
            for a, b in itertools.combinations(sorted(s), 2):
                want[(a, b)] = want.get((a, b), 0) + 1
        t = pa.table({"k": pa.array(k), "item": pa.array(items)})
        got = cooccurrence_counts(
            ray.data.from_arrow(t).repartition(n_blocks),
            "k",
            "item",
            count_col="n",
        ).to_pandas()
        got_d = {
            (r.item_a, r.item_b): r.n for r in got.itertuples()
        }
        assert got_d == want
        # orientation invariant: every pair is emitted a < b
        assert (got["item_a"] < got["item_b"]).all()

    def test_single_item_keys_emit_nothing(self, ray_session):
        import ray.data

        from maup_ray.ops.curate import cooccurrence_counts

        t = pa.table(
            {
                "k": pa.array([1, 2, 3], type=pa.int64()),
                "item": pa.array(["a", "b", "a"]),
            }
        )
        got = cooccurrence_counts(
            ray.data.from_arrow(t), "k", "item"
        )
        assert len(got) == 0

    def test_duplicates_count_once(self, ray_session):
        import ray.data

        from maup_ray.ops.curate import cooccurrence_counts

        # same (key, item) repeated many times → still one pair
        t = pa.table(
            {
                "k": pa.array([7] * 10, type=pa.int64()),
                "item": pa.array(["x", "y"] * 5),
            }
        )
        got = cooccurrence_counts(
            ray.data.from_arrow(t).repartition(3), "k", "item"
        ).to_pandas()
        assert len(got) == 1
        assert got["n_keys"].iloc[0] == 1


class TestGroupedSumsExact:
    def test_cross_block_overflow_is_exact(self, ray_session):
        """Per-block Σv² fits int64 but the cross-block total exceeds
        2^63 — an Arrow/numpy driver merge would wrap silently; the
        Python-int merge must be exact."""
        import ray.data

        from maup_ray.ops.agg import grouped_sums_exact

        v = 1 << 31  # v² = 2^62 per row
        t = pa.table(
            {
                "k": pa.array([0, 0, 0, 1], type=pa.int64()),
                "q": pa.array([v * v] * 3 + [5], type=pa.int64()),
            }
        )
        # one row per block → partials are fine, the TOTAL overflows
        rows = grouped_sums_exact(
            ray.data.from_arrow(t).repartition(4), ["k"], ["q"],
            count_col="n",
        )
        by_k = {r["k"]: r for r in rows}
        assert by_k[0]["q"] == 3 * (1 << 62)  # > 2^63: needs bigint
        assert by_k[0]["q"] > (1 << 63) - 1
        assert by_k[0]["n"] == 3
        assert by_k[1]["q"] == 5

    def test_matches_driver_mode_in_range(self, ray_session):
        import ray.data

        from maup_ray.ops.agg import grouped_sum_count, grouped_sums_exact

        rng = np.random.default_rng(9)
        t = pa.table(
            {
                "k": pa.array(rng.integers(0, 9, 1000), type=pa.int64()),
                "v": pa.array(
                    rng.integers(-1000, 1000, 1000), type=pa.int64()
                ),
            }
        )
        ds = ray.data.from_arrow(t).repartition(5)
        a = {
            r["k"]: (r["v"], r["n"])
            for r in grouped_sums_exact(ds, ["k"], ["v"], count_col="n")
        }
        b_tbl = grouped_sum_count(
            ds, ["k"], ["v"], count_col="n", final="driver"
        )
        b = {
            r["k"]: (r["v"], r["n"]) for r in b_tbl.to_pylist()
        }
        assert a == b


class TestWeightedSample:
    def test_edge_weights_and_determinism(self, ray_session):
        import ray.data

        from maup_ray.ops.curate import weighted_sample

        n = 2000
        ids = np.arange(n, dtype=np.int64)
        w = np.zeros(n, dtype=np.int64)
        w[: n // 3] = 0          # never kept
        w[n // 3: 2 * n // 3] = 1000  # always kept (== max_weight)
        w[2 * n // 3:] = 500     # ~half kept
        t = pa.table({"id": pa.array(ids), "w": pa.array(w)})
        got1 = weighted_sample(
            ray.data.from_arrow(t).repartition(1), "id", "w", 1000
        ).to_pandas()
        got7 = weighted_sample(
            ray.data.from_arrow(t).repartition(7), "id", "w", 1000
        ).to_pandas()
        # deterministic: identical sample for any partitioning
        assert sorted(got1["id"]) == sorted(got7["id"])
        kept = set(got1["id"])
        assert not (kept & set(ids[: n // 3]))
        assert set(ids[n // 3: 2 * n // 3]) <= kept
        mid = kept & set(ids[2 * n // 3:])
        assert 0.3 < len(mid) / (n / 3) < 0.7  # ≈ w/max = 0.5

    def test_out_of_range_weight_raises(self, ray_session):
        import ray.data

        from maup_ray.ops.curate import weighted_sample

        t = pa.table(
            {
                "id": pa.array([1], type=pa.int64()),
                "w": pa.array([1001], type=pa.int64()),
            }
        )
        with pytest.raises(Exception, match="outside|RayTaskError"):
            weighted_sample(
                ray.data.from_arrow(t), "id", "w", 1000
            ).to_pandas()

    def test_bad_params_raise(self, ray_session):
        import ray.data

        from maup_ray.ops.curate import weighted_sample

        t = pa.table(
            {"id": pa.array([1], type=pa.int64()),
             "w": pa.array([1], type=pa.int64())}
        )
        with pytest.raises(ValueError):
            weighted_sample(ray.data.from_arrow(t), "id", "w", 0)
        with pytest.raises(ValueError):
            weighted_sample(
                ray.data.from_arrow(t), "id", "w", 2**32
            )


class TestWinsorize:
    @pytest.mark.parametrize("n_blocks", [1, 6])
    def test_matches_duckdb(self, ray_session, n_blocks):
        import duckdb
        import ray.data

        from maup_ray.ops.curate import winsorize

        rng = np.random.RandomState(7)
        n = 3000
        t = pa.table(
            {
                "k": pa.array(rng.randint(0, 5, n).astype(np.int64)),
                "v": pa.array(rng.randint(0, 500, n).astype(np.int64)),
                "id": pa.array(np.arange(n, dtype=np.int64)),
            }
        )
        want = duckdb.sql(
            """WITH caps AS (SELECT k, quantile_disc(v, 0.9) AS cap
                             FROM t GROUP BY k)
               SELECT t.k, least(t.v, caps.cap) AS v, t.id
               FROM t JOIN caps USING (k) ORDER BY id"""
        ).df()
        got = (
            winsorize(
                ray.data.from_arrow(t).repartition(n_blocks),
                "k",
                "v",
                q=(9, 10),
                keep_cols=["id"],
            )
            .to_pandas()
            .sort_values("id", ignore_index=True)[["k", "v", "id"]]
        )
        pd.testing.assert_frame_equal(got, want)

    def test_cap_is_reached_not_exceeded(self, ray_session):
        import ray.data

        from maup_ray.ops.curate import winsorize

        t = pa.table(
            {
                "k": pa.array([0] * 10, type=pa.int64()),
                "v": pa.array(list(range(1, 11)), type=pa.int64()),
            }
        )
        got = winsorize(
            ray.data.from_arrow(t), "k", "v", q=(1, 2)
        ).to_pandas()
        # p50 of 1..10 (quantile_disc, ceil(0.5*10)=5th value) = 5
        assert got["v"].max() == 5
        assert len(got) == 10


class TestHeavyHitters:
    """Exact Misra-Gries two-pass heavy hitters: guarantee says ALL
    values with freq > n/(k+1) are found with exact counts, none
    below the cut."""

    @staticmethod
    def _brute(vals, k):
        from collections import Counter

        c = Counter(vals)
        n = len(vals)
        return {
            v: m for v, m in c.items() if m * (k + 1) > n
        }

    def test_zipf_planted_skew(self, ray_session):
        import ray.data

        from maup_ray.ops.curate import heavy_hitters

        rng = np.random.default_rng(3)
        # zipf-ish: few dominant values over a long uniform tail
        head = ["hh0"] * 900 + ["hh1"] * 500 + ["hh2"] * 260
        tail = [f"t{int(i)}" for i in rng.integers(0, 800, size=2400)]
        vals = head + tail
        rng.shuffle(vals)
        tbl = pa.table({"v": pa.array(vals, type=pa.string())})
        for k in (3, 8, 25):
            want = self._brute(vals, k)
            got = heavy_hitters(
                ray.data.from_arrow(tbl).repartition(7), "v", k
            )
            assert dict(
                zip(got["value"].to_pylist(), got["n_occ"].to_pylist())
            ) == want

    def test_threshold_boundary_exact(self, ray_session):
        import ray.data

        from maup_ray.ops.curate import heavy_hitters

        # n = 40, k = 3 -> cut is freq > 10: exactly-10 must NOT pass
        vals = ["a"] * 11 + ["b"] * 10 + ["c"] * 10 + ["d"] * 9
        tbl = pa.table({"v": pa.array(vals, type=pa.string())})
        got = heavy_hitters(ray.data.from_arrow(tbl).repartition(5),
                            "v", 3)
        assert got["value"].to_pylist() == ["a"]
        assert got["n_occ"].to_pylist() == [11]

    def test_tokenize_matches_flat(self, ray_session):
        import ray.data

        from maup_ray.ops.curate import heavy_hitters

        rng = np.random.default_rng(9)
        words = np.array(["x", "y", "z", "w", "q"])
        docs = [
            " ".join(words[rng.integers(0, 5, size=int(m))])
            for m in rng.integers(1, 12, size=120)
        ]
        flat = [w for d in docs for w in d.split(" ")]
        want = self._brute(flat, 2)
        tbl = pa.table({"text": pa.array(docs)})
        got = heavy_hitters(
            ray.data.from_arrow(tbl).repartition(4), "text", 2,
            tokenize=True,
        )
        assert dict(
            zip(got["value"].to_pylist(), got["n_occ"].to_pylist())
        ) == want

    def test_table_path_and_empty(self):
        from maup_ray.ops.curate import heavy_hitters

        tbl = pa.table({"v": pa.array(["a", "a", "b"])})
        got = heavy_hitters(tbl, "v", 1)
        assert got["value"].to_pylist() == ["a"]
        empty = pa.table({"v": pa.array([], type=pa.string())})
        assert heavy_hitters(empty, "v", 2).num_rows == 0


class TestGroupedSumsExact:
    def test_fast_path_equals_bigint_path(self, ray_session):
        import ray.data

        from maup_ray.ops.agg import grouped_sums_exact

        rng = np.random.default_rng(2)
        k = rng.integers(0, 9, size=2000)
        v = rng.integers(-(10**6), 10**6, size=2000)
        tbl = pa.table(
            {"k": pa.array(k, type=pa.int64()),
             "v": pa.array(v, type=pa.int64())}
        )
        ds = ray.data.from_arrow(tbl).repartition(7)
        small = grouped_sums_exact(ds, ["k"], sum_cols=["v"],
                                   count_col="n")
        # magnitudes chosen to stay inside the per-BLOCK int64
        # contract (rows-in-block x shift << 2^63) while pushing the
        # MERGE bound max|partial|*n past 2^62 -> the arbitrary-
        # precision branch; subtracting the shift afterward must
        # reproduce the fast path
        shift = 1 << 53
        tbl2 = pa.table(
            {"k": tbl["k"],
             "v": pa.array(v + shift, type=pa.int64())}
        )
        big = grouped_sums_exact(
            ray.data.from_arrow(tbl2).repartition(7), ["k"],
            sum_cols=["v"], count_col="n",
        )
        sm = {r["k"]: (r["v"], r["n"]) for r in small}
        bg = {r["k"]: (r["v"] - r["n"] * shift, r["n"]) for r in big}
        assert sm == bg
        # and the fast path matches a straight numpy oracle
        for key, (s, n) in sm.items():
            m = k == key
            assert s == int(v[m].sum()) and n == int(m.sum())
        # past-int64 totals stay exact (no wrap anywhere)
        assert all(r["v"] > (1 << 59) for r in big)


class TestGroupedValueTopk:
    def test_matches_brute_force_with_ties(self, ray_session):
        import ray.data

        from maup_ray.ops.curate import grouped_value_topk

        rng = np.random.default_rng(8)
        keys = rng.integers(0, 12, size=800)
        vals = np.array(["a", "b", "c", "d", "e"])[
            rng.integers(0, 5, 800)
        ]
        tbl = pa.table(
            {"k": pa.array(keys, type=pa.int64()),
             "v": pa.array(vals, type=pa.string())}
        )
        got = grouped_value_topk(
            ray.data.from_arrow(tbl).repartition(5), "k", "v", 2
        )
        from collections import Counter

        for kk in np.unique(keys):
            c = Counter(vals[keys == kk].tolist())
            want = sorted(c.items(), key=lambda t: (-t[1], t[0]))[:2]
            rows = [r for r in got.to_pylist() if r["k"] == kk]
            assert [(r["v"], r["n_occ"]) for r in rows] == want
            assert [r["rank"] for r in rows] == list(
                range(1, len(want) + 1)
            )

    def test_table_path(self):
        from maup_ray.ops.curate import grouped_value_topk

        tbl = pa.table(
            {"k": pa.array([1, 1, 1, 2], type=pa.int64()),
             "v": pa.array(["x", "x", "y", "z"])}
        )
        got = grouped_value_topk(tbl, "k", "v", 1)
        assert got.to_pylist() == [
            {"k": 1, "v": "x", "n_occ": 2, "rank": 1},
            {"k": 2, "v": "z", "n_occ": 1, "rank": 1},
        ]
