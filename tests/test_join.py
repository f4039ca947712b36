"""equi_join: broadcast vs Dataset.join plan parity + edges."""

from __future__ import annotations

import numpy as np
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
