"""ops/setops.bag_setop — EXCEPT/INTERSECT in ALL and DISTINCT
semantics vs a collections.Counter brute force, including multi-key
projections, empty sides, and partition invariance."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest


def _rows(tbl, keys):
    if not isinstance(tbl, pa.Table):
        blocks = list(_blocks(tbl))
        if not blocks:
            return []
        tbl = pa.concat_tables(blocks)
    return sorted(zip(*(tbl[k].to_pylist() for k in keys)))


def _blocks(ds):
    import ray

    for r in ds.materialize().to_arrow_refs():
        t = ray.get(r)
        if t.num_rows:
            yield t


def _brute(left, right, keys, mode):
    cl = Counter(zip(*(left[k].to_pylist() for k in keys)))
    cr = Counter(zip(*(right[k].to_pylist() for k in keys)))
    out = []
    for k in set(cl) | set(cr):
        if mode == "except_all":
            m = max(0, cl[k] - cr[k])
        elif mode == "intersect_all":
            m = min(cl[k], cr[k])
        elif mode == "except":
            m = 1 if cl[k] > 0 and cr[k] == 0 else 0
        else:
            m = 1 if cl[k] > 0 and cr[k] > 0 else 0
        out.extend([k] * m)
    return sorted(out)


@pytest.fixture(scope="module")
def tables():
    rng = np.random.RandomState(7)
    def mk(n):
        return pa.table(
            {
                "a": pa.array(rng.randint(0, 12, n), pa.int64()),
                "b": pa.array(rng.randint(0, 3, n), pa.int64()),
            }
        )

    return mk(400), mk(300)


@pytest.mark.parametrize(
    "mode", ["except_all", "intersect_all", "except", "intersect"]
)
def test_modes_match_bruteforce(ray_session, tables, mode):
    from maup_ray.ops.setops import bag_setop

    left, right = tables
    got = bag_setop(left, right, ["a", "b"], mode=mode)
    assert _rows(got, ["a", "b"]) == _brute(left, right, ["a", "b"], mode)


def test_partition_invariant(ray_session, tables):
    import ray.data

    from maup_ray.ops.setops import bag_setop

    left, right = tables
    base = _rows(bag_setop(left, right, ["a"], mode="except_all"), ["a"])
    l8 = ray.data.from_arrow(left).repartition(8)
    r3 = ray.data.from_arrow(right).repartition(3)
    assert _rows(bag_setop(l8, r3, ["a"], mode="except_all"),
                 ["a"]) == base


def test_empty_right_is_identity_bag(ray_session, tables):
    from maup_ray.ops.setops import bag_setop

    left, _ = tables
    empty = left.slice(0, 0)
    got = _rows(bag_setop(left, empty, ["a"], mode="except_all"), ["a"])
    assert got == sorted((v,) for v in left["a"].to_pylist())
    assert _rows(
        bag_setop(left, empty, ["a"], mode="intersect_all"), ["a"]
    ) == []


def test_key_types_preserved(ray_session):
    from maup_ray.ops.setops import bag_setop

    left = pa.table({"k": pa.array([1, 1, 2], pa.int32())})
    right = pa.table({"k": pa.array([1], pa.int32())})
    out = bag_setop(left, right, ["k"], mode="except_all")
    t = pa.concat_tables(list(_blocks(out)), promote_options="none")
    assert t.schema.field("k").type == pa.int32()
    assert sorted(t["k"].to_pylist()) == [1, 2]
