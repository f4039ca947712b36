"""ops.shuffle.hash_group_apply — the raw-task hash-shuffle grouped
apply primitive (used by minhash/simhash LSH buckets and kNN cells)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maup_ray.ops.shuffle import group_starts, hash_group_apply


def _make_sum_part():
    # defined inside a function so cloudpickle ships it BY VALUE — a
    # module-level test function pickles by reference and workers
    # cannot import the tests package
    def _sum_part(tbl, starts):
        schema = pa.schema([("k", pa.int64()), ("s", pa.int64())])
        if tbl is None or len(starts) == 0:
            return schema.empty_table()
        k = tbl["k"].to_numpy()
        v = tbl["v"].to_numpy()
        return pa.table(
            {
                "k": pa.array(k[starts]),
                "s": pa.array(np.add.reduceat(v, starts)),
            }
        )

    return _sum_part


class TestHashGroupApply:
    @pytest.mark.parametrize("num_partitions", [1, 7, 64])
    def test_matches_pandas_groupby(self, ray_session, num_partitions):
        import ray.data

        rng = np.random.RandomState(7)
        n = 20_000
        t = pa.table(
            {
                "k": pa.array(rng.randint(0, 500, n)),
                "v": pa.array(rng.randint(-100, 100, n)),
            }
        )
        want = (
            t.to_pandas().groupby("k")["v"].sum().reset_index(name="s")
        )
        ds = ray.data.from_arrow(t).repartition(9)
        got = (
            hash_group_apply(
                ds, ["k"], _make_sum_part(), num_partitions=num_partitions
            )
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_table_input_and_sort_cols(self, ray_session):
        t = pa.table(
            {
                "k": pa.array([1, 1, 2, 2, 1]),
                "v": pa.array([30, 10, 5, 1, 20]),
            }
        )

        def first_last(tbl, starts):
            schema = pa.schema(
                [("k", pa.int64()), ("lo", pa.int64()), ("hi", pa.int64())]
            )
            if tbl is None or len(starts) == 0:
                return schema.empty_table()
            k = tbl["k"].to_numpy()
            v = tbl["v"].to_numpy()
            ends = np.append(starts[1:], len(k))
            return pa.table(
                {
                    "k": pa.array(k[starts]),
                    "lo": pa.array(v[starts]),  # sorted asc within group
                    "hi": pa.array(v[ends - 1]),
                }
            )

        got = (
            hash_group_apply(t, ["k"], first_last, sort_cols=("v",))
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        assert got["k"].tolist() == [1, 2]
        assert got["lo"].tolist() == [10, 1]
        assert got["hi"].tolist() == [30, 5]

    def test_empty_input(self, ray_session):
        t = pa.table(
            {
                "k": pa.array([], type=pa.int64()),
                "v": pa.array([], type=pa.int64()),
            }
        )
        import ray

        ds = hash_group_apply(t, ["k"], _make_sum_part())
        tabs = [ray.get(r) for r in ds.materialize().to_arrow_refs()]
        # typed empty blocks (Ray's to_pandas drops columns on
        # all-empty datasets — assert at the Arrow level)
        assert all(tt.num_rows == 0 for tt in tabs)
        assert tabs[0].column_names == ["k", "s"]


class TestSchemalessBlocks:
    def test_schemaless_empty_block_is_ignored(self, ray_session):
        # Ray's JoinOperator flakily emits an EMPTY ZERO-COLUMN block
        # alongside the real output ("new schema: ." executor warning);
        # _apply_partition used to hand that table to fn as the "typed
        # empty", crashing fn's key access (full-suite prorate
        # hash-join flake). Inject one deterministically.
        import ray.data

        t = pa.table(
            {
                "k": pa.array([1, 2, 3], type=pa.int64()),
                "v": pa.array([10, 20, 30], type=pa.int64()),
            }
        )

        def typed_from_tbl(tbl, starts):
            # derives output types FROM tbl when not None — the
            # documented typed-empty contract (what prorate final_part
            # does); crashes on a zero-column tbl without the filter
            if tbl is None:
                return pa.schema(
                    [("k", pa.int64()), ("s", pa.int64())]
                ).empty_table()
            g = tbl.group_by(["k"], use_threads=False).aggregate(
                [("v", "sum")]
            )
            return g.rename_columns(["k", "s"])

        # schema-less block FIRST: its per-partition sub-table is then
        # tabs[0], the slot _apply_partition reads the typed empty from
        ds = ray.data.from_arrow([pa.table({}), t])
        got = (
            hash_group_apply(ds, ["k"], typed_from_tbl, num_partitions=16)
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        assert got["k"].tolist() == [1, 2, 3]
        assert got["s"].tolist() == [10, 20, 30]


class TestGroupStarts:
    def test_basic(self):
        t = pa.table({"k": pa.array([3, 3, 5, 7, 7, 7])})
        assert group_starts(t, ["k"]).tolist() == [0, 2, 3]

    def test_empty(self):
        t = pa.table({"k": pa.array([], type=pa.int64())})
        assert group_starts(t, ["k"]).tolist() == []


class TestGroupedSumCountEmpty:
    def test_driver_final_on_all_empty_input(self, ray_session):
        # ADVICE r2 (low): all-empty input must return a typed empty
        # table, not crash in pa.table({}).group_by
        import ray.data

        from maup_ray.ops.agg import grouped_sum_count

        t = pa.table(
            {
                "g": pa.array([], type=pa.int64()),
                "x": pa.array([], type=pa.int64()),
            }
        )
        out = grouped_sum_count(
            ray.data.from_arrow(t), ["g"], sum_cols=["x"],
            count_col="n", final="driver",
        )
        assert out.num_rows == 0
        assert out.column_names == ["g", "x", "n"]


class TestChoosePartitions:
    def test_floor_is_two_x_cpus(self):
        from maup_ray.ops.shuffle import _choose_partitions

        assert _choose_partitions(None, 16) == 32
        assert _choose_partitions(0, 16) == 32
        assert _choose_partitions(10 * 2**20, 16) == 32

    def test_p_grows_with_input_bytes(self):
        # the 100-TB contract: P is keyed to data volume, not cores —
        # stage-2 partitions must stay under a worker heap
        from maup_ray.ops.shuffle import (
            TARGET_PARTITION_BYTES,
            _choose_partitions,
        )

        gib = 2**30
        assert _choose_partitions(64 * gib, 16) == 64 * gib // (
            TARGET_PARTITION_BYTES
        )
        # monotone in bytes
        ps = [
            _choose_partitions(b, 16)
            for b in [0, 8 * gib, 64 * gib, 512 * gib, 100 * 1024 * gib]
        ]
        assert ps == sorted(ps)
        # 100 TB at the default target → ~820k partitions, each
        # ≤ TARGET_PARTITION_BYTES expected size
        assert ps[-1] * TARGET_PARTITION_BYTES >= 100 * 1024 * gib


class TestSaltKeys:
    def test_salt_spreads_hot_key_and_partials_merge(self, ray_session):
        import ray.data

        from maup_ray.ops.shuffle import salt_keys

        # one hot key (90% of rows) + a long tail
        rng = np.random.RandomState(3)
        n = 30_000
        k = np.where(
            rng.rand(n) < 0.9, 7, rng.randint(100, 200, n)
        ).astype(np.int64)
        v = rng.randint(-50, 50, n).astype(np.int64)
        t = pa.table({"k": pa.array(k), "v": pa.array(v)})

        salted = salt_keys(t, ["k"], buckets=16)
        assert salted.num_rows == n
        # deterministic
        again = salt_keys(t, ["k"], buckets=16)
        assert salted["_salt"].equals(again["_salt"])
        # the hot key is spread over many salt buckets
        hot = salted.filter(pa.array(k == 7))
        assert len(np.unique(hot["_salt"].to_numpy())) >= 12

        # combinable-partial contract: sum per (k, _salt) then merge
        # per k == plain groupby sum
        def merge_part(tbl, starts):
            schema = pa.schema([("k", pa.int64()), ("s", pa.int64())])
            if tbl is None or len(starts) == 0:
                return schema.empty_table()
            kk = tbl["k"].to_numpy()
            ss = tbl["s"].to_numpy()
            return pa.table(
                {
                    "k": pa.array(kk[starts]),
                    "s": pa.array(np.add.reduceat(ss, starts)),
                }
            )

        def salted_sum(tbl, starts):
            schema = pa.schema([("k", pa.int64()), ("s", pa.int64())])
            if tbl is None or len(starts) == 0:
                return schema.empty_table()
            kk = tbl["k"].to_numpy()
            vv = tbl["v"].to_numpy()
            return pa.table(
                {
                    "k": pa.array(kk[starts]),
                    "s": pa.array(np.add.reduceat(vv, starts)),
                }
            )

        ds = ray.data.from_arrow(salted).repartition(6)
        partials = hash_group_apply(ds, ["k", "_salt"], salted_sum)
        merged = (
            hash_group_apply(partials, ["k"], merge_part)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = (
            t.to_pandas()
            .groupby("k")["v"]
            .sum()
            .reset_index(name="s")
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(merged, want)
