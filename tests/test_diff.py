"""table_diff reconciliation — brute-force + edge tests."""

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.ops.diff import table_diff


def _mk(ids, vals):
    return pa.table(
        {
            "id": pa.array(ids, type=pa.int64()),
            "v": pa.array(vals, type=pa.int64()),
        }
    )


class TestTableDiff:
    def test_full_classification(self, ray_session):
        import ray.data

        rng = np.random.default_rng(4)
        n = 500
        ids = np.arange(n)
        vals = rng.integers(0, 100, n)
        left = _mk(ids, vals)
        # right: drop %13, change %7 (not dropped), add 3 new
        keep = (ids % 13) != 0
        rv = vals + ((ids % 7) == 0).astype(np.int64)
        r_ids = np.r_[ids[keep], [9000, 9001, 9002]]
        r_vals = np.r_[rv[keep], [1, 2, 3]]
        right = _mk(r_ids, r_vals)
        got = table_diff(
            ray.data.from_arrow(left).repartition(4),
            ray.data.from_arrow(right).repartition(3),
            "id", ["v"],
        )
        want = {}
        for i in ids[~keep]:
            want[int(i)] = "removed"
        for i in ids[keep & ((ids % 7) == 0)]:
            want[int(i)] = "changed"
        for i in (9000, 9001, 9002):
            want[i] = "added"
        assert {
            r["id"]: r["status"] for r in got.to_pylist()
        } == want
        # summary path
        s = table_diff(left, right, "id", ["v"], summary=True)
        by = {r["status"]: (r["n"], r["id_sum"])
              for r in s.to_pylist()}
        from collections import Counter

        cnt = Counter(want.values())
        for st in ("added", "removed", "changed"):
            ids_st = [i for i, v in want.items() if v == st]
            assert by[st] == (cnt[st], sum(ids_st))

    def test_identical_tables_empty_diff(self):
        t = _mk([1, 2, 3], [7, 8, 9])
        assert table_diff(t, t, "id", ["v"]).num_rows == 0

    def test_null_values_compare(self):
        left = pa.table(
            {"id": pa.array([1, 2], type=pa.int64()),
             "v": pa.array([None, 5], type=pa.int64())}
        )
        right = pa.table(
            {"id": pa.array([1, 2], type=pa.int64()),
             "v": pa.array([None, None], type=pa.int64())}
        )
        got = table_diff(left, right, "id", ["v"])
        # null==null -> same; 5 vs null -> changed
        assert got.to_pylist() == [{"id": 2, "status": "changed"}]

    def test_duplicate_id_raises(self, ray_session):
        left = _mk([1, 1], [2, 3])
        right = _mk([1], [2])
        with pytest.raises(Exception, match="duplicate"):
            table_diff(left, right, "id", ["v"])
