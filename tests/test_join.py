"""equi_join: broadcast vs Dataset.join plan parity + edges."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maup_ray.ops.join import broadcast_hash_join, equi_join


def _left_ds(ray, n=100, blocks=3):
    import ray.data

    tbl = pa.table(
        {
            "k": pa.array((np.arange(n) % 17).astype(np.int64)),
            "v": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    return ray.data.from_arrow(tbl).repartition(blocks)


class TestEquiJoin:
    def test_broadcast_matches_shuffle_plan(self, ray_session):
        right = pa.table(
            {
                "rk": pa.array(np.arange(0, 12, dtype=np.int64)),
                "tag": pa.array([f"t{i}" for i in range(12)]),
            }
        )
        ds = _left_ds(ray_session)
        a = (
            equi_join(ds, right, "k", "rk", ["tag"])
            .to_pandas()
            .sort_values(["v"])
            .reset_index(drop=True)
        )
        b = (
            equi_join(ds, right, "k", "rk", ["tag"], broadcast_limit=0)
            .to_pandas()
            .sort_values(["v"])
            .reset_index(drop=True)
        )
        # inner-join semantics: keys 12..16 drop in both plans
        assert (a["k"] < 12).all()
        assert len(a) == len(b)
        assert list(a["tag"]) == list(b["tag"])
        assert list(a["v"]) == list(b["v"])

    def test_empty_dimension_table(self, ray_session):
        right = pa.table(
            {
                "rk": pa.array([], type=pa.int64()),
                "tag": pa.array([], type=pa.string()),
            }
        )
        out = broadcast_hash_join(
            _left_ds(ray_session), right, "k", "rk", ["tag"]
        ).to_pandas()
        assert len(out) == 0

    def test_unmatched_rows_drop(self, ray_session):
        right = pa.table(
            {
                "rk": pa.array([3], type=pa.int64()),
                "tag": pa.array(["only"]),
            }
        )
        out = broadcast_hash_join(
            _left_ds(ray_session), right, "k", "rk", ["tag"]
        ).to_pandas()
        assert set(out["k"]) == {3}
        assert set(out["tag"]) == {"only"}


class TestBroadcastJoinKeyUniqueness:
    def test_duplicate_right_keys_raise(self, ray_session):
        # ADVICE r3: index_in keeps only the FIRST match per key, so a
        # duplicate-key dimension table silently dropped join rows —
        # now checked while the table is driver-local
        import ray.data

        from maup_ray.ops.join import broadcast_hash_join

        left = ray.data.from_arrow(
            pa.table({"k": pa.array([1, 2], type=pa.int64())})
        )
        dup_right = pa.table(
            {
                "k": pa.array([1, 1, 2], type=pa.int64()),
                "v": pa.array([10, 11, 20], type=pa.int64()),
            }
        )
        with pytest.raises(ValueError, match="duplicate"):
            broadcast_hash_join(left, dup_right, "k", "k", ["v"])


class TestSemiAntiJoin:
    def _left(self):
        return pa.table(
            {
                "k": pa.array([1, 2, 3, None, 5], type=pa.int64()),
                "v": pa.array([10, 20, 30, 40, 50], type=pa.int64()),
            }
        )

    def test_semi_plus_anti_partition_left(self, ray_session):
        import ray.data

        from maup_ray.ops.join import anti_join, semi_join

        left = self._left()
        right = pa.table(
            {"k": pa.array([2, 2, 5, 99], type=pa.int64())}
        )
        semi = semi_join(left, right, "k")
        anti = anti_join(left, right, "k")
        assert semi["v"].to_pylist() == [20, 50]
        # a null key matches nothing — it lands on the ANTI side
        assert anti["v"].to_pylist() == [10, 30, 40]
        assert len(semi) + len(anti) == len(left)
        # Dataset path identical
        dsemi = semi_join(
            ray.data.from_arrow(left).repartition(2),
            ray.data.from_arrow(right),
            "k",
        ).to_pandas()
        assert sorted(dsemi["v"]) == [20, 50]

    def test_right_on_and_string_keys(self, ray_session):
        from maup_ray.ops.join import semi_join

        left = pa.table(
            {"name": pa.array(["a", "b", "c"]),
             "x": pa.array([1, 2, 3], type=pa.int64())}
        )
        right = pa.table({"n2": pa.array(["b", "b", "z"])})
        out = semi_join(left, right, "name", right_on="n2")
        assert out["x"].to_pylist() == [2]

    def test_broadcast_limit_guard(self, ray_session):
        import pytest as _pytest

        from maup_ray.ops.join import semi_join

        left = self._left()
        right = pa.table(
            {"k": pa.array([1, 2, 3], type=pa.int64())}
        )
        with _pytest.raises(ValueError, match="broadcast_limit"):
            semi_join(left, right, "k", broadcast_limit=2,
                      plan="broadcast")
        # plan="auto" switches to the shuffle path instead of raising
        got = semi_join(left, right, "k", broadcast_limit=2)
        assert got.num_rows > 0

    def test_dataset_right_pre_distincts(self, ray_session):
        """A Dataset right side with massive duplication still fits a
        tiny broadcast_limit: only DISTINCT keys reach the driver."""
        import ray.data

        from maup_ray.ops.join import semi_join

        left = self._left()
        right = ray.data.from_arrow(
            pa.table(
                {"k": pa.array([2] * 5000 + [5] * 5000,
                               type=pa.int64())}
            )
        ).repartition(4)
        # plan="broadcast" honors the tiny limit thanks to the
        # per-block pre-distinct (only 2 distinct keys move)
        out = semi_join(left, right, "k", broadcast_limit=4,
                        plan="broadcast")
        assert out["v"].to_pylist() == [20, 50]
        # auto goes conservative on the 10k-row metadata bound and
        # shuffles — same row SET (order not preserved)
        auto = semi_join(left, right, "k", broadcast_limit=4)
        assert sorted(auto["v"].to_pylist()) == [20, 50]


class TestLeftBroadcastJoin:
    def test_unmatched_rows_survive_with_fill_and_null(self, ray_session):
        from maup_ray.ops.join import left_broadcast_join

        right = pa.table(
            {
                "rk": pa.array([0, 1, 2], type=pa.int64()),
                "cnt": pa.array([10, 20, 30], type=pa.int64()),
                "tag": pa.array(["a", "b", "c"]),
            }
        )
        ds = _left_ds(ray_session, n=40)  # keys 0..16
        out = (
            left_broadcast_join(
                ds, right, "k", "rk", ["cnt", "tag"], fill={"cnt": 0}
            )
            .to_pandas()
            .sort_values("v")
            .reset_index(drop=True)
        )
        assert len(out) == 40  # every left row survives
        matched = out["k"] < 3
        assert (out.loc[matched, "cnt"] == (out.loc[matched, "k"] + 1) * 10).all()
        assert (out.loc[~matched, "cnt"] == 0).all()  # fill applied
        assert out.loc[~matched, "tag"].isna().all()  # typed null kept

    def test_table_path_and_empty_right(self):
        from maup_ray.ops.join import left_broadcast_join

        left = pa.table({"k": pa.array([5, 6], type=pa.int64())})
        right = pa.table(
            {
                "rk": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            }
        )
        out = left_broadcast_join(
            left, right, "k", "rk", ["cnt"], fill={"cnt": 0}
        )
        assert out["cnt"].to_pylist() == [0, 0]
        out2 = left_broadcast_join(left, right, "k", "rk", ["cnt"])
        assert out2["cnt"].to_pylist() == [None, None]
        assert out2.schema.field("cnt").type == pa.int64()

    def test_duplicate_right_keys_raise(self):
        from maup_ray.ops.join import left_broadcast_join

        left = pa.table({"k": pa.array([1], type=pa.int64())})
        right = pa.table(
            {
                "rk": pa.array([1, 1], type=pa.int64()),
                "cnt": pa.array([1, 2], type=pa.int64()),
            }
        )
        with pytest.raises(ValueError, match="duplicate"):
            left_broadcast_join(left, right, "k", "rk", ["cnt"])


class TestSemiJoinPlans:
    def test_shuffle_plan_equals_broadcast(self, ray_session):
        import ray.data

        from maup_ray.ops.join import anti_join, semi_join

        rng = np.random.default_rng(6)
        left = pa.table(
            {
                "k": pa.array(rng.integers(0, 50, 400), type=pa.int64()),
                "v": pa.array(rng.integers(0, 9, 400), type=pa.int64()),
            }
        )
        right = pa.table(
            {"rk": pa.array(
                rng.integers(0, 50, 60), type=pa.int64())}
        )
        for anti in (False, True):
            fn = anti_join if anti else semi_join
            want = fn(left, right, "k", "rk")
            want = want.to_pandas().sort_values(
                ["k", "v"]).reset_index(drop=True)
            got = fn(
                ray.data.from_arrow(left).repartition(4),
                ray.data.from_arrow(right).repartition(3),
                "k", "rk", plan="shuffle",
            ).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(
                got[["k", "v"]], want[["k", "v"]]
            )

    def test_auto_switches_on_metadata_count(self, ray_session):
        import ray.data

        from maup_ray.ops.join import semi_join

        left = pa.table(
            {"k": pa.array([1, 2, 3, 4], type=pa.int64())}
        )
        # right has MANY duplicate rows of few keys: auto must pick
        # shuffle from the row-count bound without driver collection
        right = ray.data.from_arrow(
            pa.table({"k": pa.array([2, 3] * 50, type=pa.int64())})
        )
        got = semi_join(
            ray.data.from_arrow(left), right, "k",
            broadcast_limit=10, plan="auto",
        )
        assert sorted(
            r["k"] for r in got.to_pandas().to_dict("records")
        ) == [2, 3]

    def test_unknown_plan_raises(self):
        from maup_ray.ops.join import semi_join

        with pytest.raises(ValueError, match="unknown plan"):
            semi_join(pa.table({"k": []}), pa.table({"k": []}), "k",
                      plan="bogus")


class TestBloomSemiJoin:
    """plan="bloom": Bloom-prefiltered shuffle semi/anti — results
    must equal the broadcast plan bit-for-bit (the filter only prunes,
    the exact co-shuffle confirms)."""

    def _inputs(self):
        rng = np.random.default_rng(11)
        left = pa.table(
            {
                # include negative keys (wrap path) and nulls
                "k": pa.array(
                    [None if i % 37 == 0 else int(v)
                     for i, v in enumerate(
                         rng.integers(-100, 100, 500))],
                    type=pa.int64(),
                ),
                "v": pa.array(np.arange(500, dtype=np.int64)),
            }
        )
        right = pa.table(
            {"rk": pa.array(rng.integers(-100, 100, 80),
                            type=pa.int64())}
        )
        return left, right

    @pytest.mark.parametrize("anti", [False, True])
    def test_matches_broadcast_plan(self, ray_session, anti):
        import ray.data

        from maup_ray.ops.join import anti_join, semi_join

        left, right = self._inputs()
        fn = anti_join if anti else semi_join
        want = fn(left, right, "k", "rk").to_pandas().sort_values(
            ["v"]).reset_index(drop=True)
        got = fn(
            ray.data.from_arrow(left).repartition(5),
            ray.data.from_arrow(right).repartition(3),
            "k", "rk", plan="bloom",
        ).to_pandas().sort_values(["v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["k", "v"]], want[["k", "v"]])

    @pytest.mark.parametrize("anti", [False, True])
    def test_table_left_path(self, ray_session, anti):
        from maup_ray.ops.join import anti_join, semi_join

        left, right = self._inputs()
        fn = anti_join if anti else semi_join
        want = fn(left, right, "k", "rk")
        got = fn(left, right, "k", "rk", plan="bloom")
        assert isinstance(got, pa.Table)
        assert sorted(got["v"].to_pylist()) == sorted(
            want["v"].to_pylist())

    def test_non_integer_key_raises(self, ray_session):
        import ray.data

        from maup_ray.ops.join import semi_join

        left = ray.data.from_arrow(
            pa.table({"k": pa.array(["a", "b"])}))
        right = pa.table({"k": pa.array(["a"])})
        with pytest.raises((TypeError, Exception)):
            semi_join(left, right, "k", plan="bloom").materialize()

    def test_empty_sides(self, ray_session):
        from maup_ray.ops.join import anti_join, semi_join

        left, right = self._inputs()
        empty_r = right.slice(0, 0)
        assert len(semi_join(left, empty_r, "k", "rk",
                             plan="bloom")) == 0
        # anti vs empty right keeps every non-null-handling row as the
        # broadcast plan does
        want = anti_join(left, empty_r, "k", "rk")
        got = anti_join(left, empty_r, "k", "rk", plan="bloom")
        assert sorted(got["v"].to_pylist()) == sorted(
            want["v"].to_pylist())


class TestOuterJoin:
    """ops/join.outer_join vs a pandas-merge brute force: duplicate
    keys on both sides (bag cross product), null keys never matching,
    all four hows, multi-key, and partition invariance."""

    def _inputs(self):
        rng = np.random.default_rng(23)
        left = pa.table(
            {
                "k": pa.array(
                    [None if i % 29 == 0 else int(v)
                     for i, v in enumerate(rng.integers(0, 40, 300))],
                    type=pa.int64(),
                ),
                "lv": pa.array(np.arange(300, dtype=np.int64)),
            }
        )
        right = pa.table(
            {
                "k": pa.array(
                    [None if i % 31 == 0 else int(v)
                     for i, v in enumerate(rng.integers(0, 40, 200))],
                    type=pa.int64(),
                ),
                "rv": pa.array(np.arange(1000, 1200, dtype=np.int64)),
            }
        )
        return left, right

    @staticmethod
    def _collect(ds) -> pd.DataFrame:
        df = ds.to_pandas()
        return (
            df.sort_values(list(df.columns))
            .reset_index(drop=True)
            .astype("float64")
        )

    @staticmethod
    def _brute(left, right, how) -> pd.DataFrame:
        # pandas merge treats NaN keys as EQUAL; SQL never matches
        # null keys — join the non-null slices, then append null-key
        # rows as unmatched on the preserved side(s)
        ldf, rdf = left.to_pandas(), right.to_pandas()
        ln, rn = ldf[ldf.k.isna()], rdf[rdf.k.isna()]
        hp = {"inner": "inner", "left_outer": "left",
              "right_outer": "right", "full_outer": "outer"}[how]
        df = pd.merge(ldf[ldf.k.notna()], rdf[rdf.k.notna()], on="k",
                      how=hp)
        parts = [df]
        if how in ("left_outer", "full_outer"):
            parts.append(ln.assign(rv=np.nan))
        if how in ("right_outer", "full_outer"):
            parts.append(rn.assign(lv=np.nan))
        df = pd.concat(parts, ignore_index=True)
        return (
            df[["k", "lv", "rv"]]
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
            .astype("float64")
        )

    @pytest.mark.parametrize(
        "how", ["inner", "left_outer", "right_outer", "full_outer"]
    )
    def test_matches_pandas(self, ray_session, how):
        import ray.data

        from maup_ray.ops.join import outer_join

        left, right = self._inputs()
        got = self._collect(
            outer_join(
                ray.data.from_arrow(left).repartition(5),
                ray.data.from_arrow(right).repartition(3),
                "k", how=how,
            )
        )
        pd.testing.assert_frame_equal(got, self._brute(left, right, how))

    def test_table_inputs_and_multikey(self, ray_session):
        from maup_ray.ops.join import outer_join

        left = pa.table(
            {
                "a": pa.array([1, 1, 2, 3], pa.int64()),
                "b": pa.array([0, 1, 0, 0], pa.int64()),
                "lv": pa.array([10, 11, 12, 13], pa.int64()),
            }
        )
        right = pa.table(
            {
                "a": pa.array([1, 1, 2, 4], pa.int64()),
                "b": pa.array([0, 0, 1, 0], pa.int64()),
                "rv": pa.array([20, 21, 22, 23], pa.int64()),
            }
        )
        got = outer_join(left, right, ["a", "b"],
                         how="full_outer").to_pandas()
        want = pd.merge(left.to_pandas(), right.to_pandas(),
                        on=["a", "b"], how="outer")
        cols = ["a", "b", "lv", "rv"]
        pd.testing.assert_frame_equal(
            got[cols].sort_values(cols).reset_index(drop=True)
            .astype("float64"),
            want[cols].sort_values(cols).reset_index(drop=True)
            .astype("float64"),
        )

    def test_partition_invariant(self, ray_session):
        import ray.data

        from maup_ray.ops.join import outer_join

        left, right = self._inputs()
        base = self._collect(outer_join(left, right, "k"))
        re = self._collect(
            outer_join(
                ray.data.from_arrow(left).repartition(11),
                ray.data.from_arrow(right).repartition(2),
                "k", num_partitions=7,
            )
        )
        pd.testing.assert_frame_equal(re, base)

    def test_clashing_payload_raises(self, ray_session):
        from maup_ray.ops.join import outer_join

        t = pa.table({"k": pa.array([1], pa.int64()),
                      "v": pa.array([1], pa.int64())})
        with pytest.raises(ValueError, match="both sides"):
            outer_join(t, t, "k")

    def test_empty_side(self, ray_session):
        from maup_ray.ops.join import outer_join

        left, right = self._inputs()
        empty = right.slice(0, 0)
        got = self._collect(outer_join(left, empty, "k",
                                       how="full_outer"))
        want = self._brute(left, empty, "full_outer")
        pd.testing.assert_frame_equal(got, want)
