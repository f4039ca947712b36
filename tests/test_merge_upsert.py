"""ops/diff.merge_upsert — lakehouse CDC MERGE vs a dict brute force:
update/insert/delete semantics, delete-of-missing-id no-op, duplicate
cardinality violations, typed output, partition invariance."""

import numpy as np
import pyarrow as pa
import pytest


def _brute(base, changes, delete_col=None):
    rows = {}
    for r in base.to_pylist():
        rows[r["id"]] = (r["v"], r["w"])
    for r in changes.to_pylist():
        if delete_col and r.get(delete_col):
            rows.pop(r["id"], None)
        else:
            rows[r["id"]] = (r["v"], r["w"])
    return sorted((k, *v) for k, v in rows.items())


def _rows(ds):
    df = ds.to_pandas()
    return sorted(
        (int(a), int(b), float(c))
        for a, b, c in zip(df["id"], df["v"], df["w"])
    )


@pytest.fixture(scope="module")
def snap():
    rng = np.random.default_rng(5)
    base = pa.table(
        {
            "id": pa.array(np.arange(100, dtype=np.int64)),
            "v": pa.array(rng.integers(0, 50, 100), pa.int64()),
            "w": pa.array(rng.normal(size=100)),
        }
    )
    # updates for 0..29, inserts 200..219, deletes 40..49 and a
    # delete-of-missing id 999 (must be a no-op)
    changes = pa.table(
        {
            "id": pa.array(
                list(range(30)) + list(range(200, 220))
                + list(range(40, 50)) + [999],
                pa.int64(),
            ),
            "v": pa.array(
                [1000 + i for i in range(30)]
                + [2000 + i for i in range(20)] + [0] * 11,
                pa.int64(),
            ),
            "w": pa.array([0.5] * 61),
            "del": pa.array([False] * 50 + [True] * 11),
        }
    )
    return base, changes


def test_matches_bruteforce(ray_session, snap):
    from maup_ray.ops.diff import merge_upsert

    base, changes = snap
    got = merge_upsert(base, changes, "id", ["v", "w"],
                       delete_col="del")
    want = [
        (int(a), int(b), float(c))
        for a, b, c in _brute(base, changes, "del")
    ]
    assert _rows(got) == want


def test_no_delete_col(ray_session, snap):
    from maup_ray.ops.diff import merge_upsert

    base, changes = snap
    changes = changes.drop_columns(["del"])
    got = merge_upsert(base, changes, "id", ["v", "w"])
    want = [
        (int(a), int(b), float(c)) for a, b, c in _brute(base, changes)
    ]
    assert _rows(got) == want


def test_partition_invariant(ray_session, snap):
    import ray.data

    from maup_ray.ops.diff import merge_upsert

    base, changes = snap
    a = _rows(merge_upsert(base, changes, "id", ["v", "w"],
                           delete_col="del"))
    b = _rows(
        merge_upsert(
            ray.data.from_arrow(base).repartition(9),
            ray.data.from_arrow(changes).repartition(4),
            "id", ["v", "w"], delete_col="del",
        )
    )
    assert a == b


def test_duplicate_change_id_raises(ray_session, snap):
    import ray

    from maup_ray.ops.diff import merge_upsert

    base, _ = snap
    dup = pa.table(
        {
            "id": pa.array([1, 1], pa.int64()),
            "v": pa.array([7, 8], pa.int64()),
            "w": pa.array([0.0, 0.0]),
        }
    )
    with pytest.raises(
        (ValueError, ray.exceptions.RayTaskError),
        match="cardinality",
    ):
        merge_upsert(base, dup, "id", ["v", "w"]).materialize()


def test_types_preserved(ray_session):
    from maup_ray.ops.diff import merge_upsert

    base = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "v": pa.array([1, 2], pa.int32()),
            "w": pa.array([1.0, 2.0], pa.float32()),
        }
    )
    changes = pa.table(
        {
            "id": pa.array([2, 3], pa.int64()),
            "v": pa.array([20, 30], pa.int32()),
            "w": pa.array([0.5, 0.5], pa.float32()),
        }
    )
    out = merge_upsert(base, changes, "id", ["v", "w"])
    import ray

    tabs = [
        ray.get(r) for r in out.materialize().to_arrow_refs()
    ]
    tabs = [t for t in tabs if t.num_rows]
    t = pa.concat_tables(tabs, promote_options="none")
    assert t.schema.field("v").type == pa.int32()
    assert t.schema.field("w").type == pa.float32()
    assert sorted(t["id"].to_pylist()) == [1, 2, 3]
