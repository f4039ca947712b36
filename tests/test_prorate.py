"""prorate / normalize tests (ref: tests/test_prorate.py,
tests/test_normalize.py) — conservation + exact fractions."""

import numpy as np
import pyarrow as pa
import pytest

from maup_ray import intersections, normalize, prorate


def _pieces(sources, targets):
    return intersections(sources, targets, area_cutoff=0, include_geometry=False)


class TestNormalize:
    def test_exact_fractions(self):
        w = pa.table(
            {
                "source_id": pa.array([0, 0, 1, 1, 2], type=pa.int64()),
                "target_id": ["a", "b", "a", "c", "a"],
                "weight": [1.0, 3.0, 2.0, 2.0, 0.0],
            }
        )
        out = normalize(w).to_pydict()
        got = dict(
            zip(zip(out["source_id"], out["target_id"]), out["weight"])
        )
        assert got == {
            (0, "a"): 0.25,
            (0, "b"): 0.75,
            (1, "a"): 0.5,
            (1, "c"): 0.5,
            (2, "a"): 0.0,  # 0/0 → 0 (ref: normalize.py:11)
        }

    def test_shuffle_strategy_matches_broadcast(self, ray_session):
        # the high-group-cardinality plan (hash-partitioned grouped
        # apply) must agree with the broadcast plan value-for-value
        import numpy as np
        import ray.data

        rng = np.random.RandomState(5)
        n = 5000
        w = pa.table(
            {
                "source_id": pa.array(rng.randint(0, 1200, n)),
                "target_id": pa.array(rng.randint(0, 7, n)),
                "weight": pa.array(rng.uniform(0, 10, n)),
            }
        )
        a = (
            normalize(ray.data.from_arrow(w), strategy="broadcast")
            .to_pandas()
            .sort_values(["source_id", "target_id", "weight"], ignore_index=True)
        )
        b = (
            normalize(ray.data.from_arrow(w), strategy="shuffle")
            .to_pandas()
            .sort_values(["source_id", "target_id", "weight"], ignore_index=True)
        )
        assert np.allclose(a["weight"], b["weight"], rtol=1e-12, atol=0)
        assert a["source_id"].tolist() == b["source_id"].tolist()

    def test_dataset_path(self, ray_session):
        import ray
        import ray.data

        w = pa.table(
            {
                "source_id": pa.array([0, 0, 1], type=pa.int64()),
                "target_id": ["a", "b", "a"],
                "weight": [1.0, 1.0, 5.0],
            }
        )
        out = normalize(ray.data.from_arrow(w))
        tbl = pa.concat_tables([ray.get(r) for r in out.to_arrow_refs()])
        d = tbl.to_pydict()
        got = dict(zip(zip(d["source_id"], d["target_id"]), d["weight"]))
        assert got == {(0, "a"): 0.5, (0, "b"): 0.5, (1, "a"): 1.0}


class TestProrate:
    def test_conservation(self, square_mostly_in_top_left, four_square_grid):
        pieces = _pieces(square_mostly_in_top_left, four_square_grid)
        pieces = pieces.rename_columns(
            ["source_id", "target_id", "weight", "length", "dim"]
        )
        weights = normalize(pieces)
        data = pa.table(
            {
                "source_id": pa.array([4], type=pa.int64()),
                "pop": pa.array([2.25], type=pa.float64()),
            }
        )
        out = prorate(weights, data, ["pop"]).to_pydict()
        got = dict(zip(out["target_id"], out["pop"]))
        # areas a=0.5 b=1.0 c=0.25 d=0.5, total 2.25 → pop share == area
        assert got == {"a": 0.5, "b": 1.0, "c": 0.25, "d": 0.5}
        assert sum(got.values()) == 2.25  # conservation (ref :100-105)

    def test_no_aggregation_mode(self):
        rel = pa.table(
            {
                "source_id": pa.array([0, 1], type=pa.int64()),
                "target_id": ["a", "a"],
                "weight": [1.0, 1.0],
            }
        )
        data = pa.table(
            {
                "source_id": pa.array([0, 1], type=pa.int64()),
                "v": [3.0, 4.0],
            }
        )
        out = prorate(rel, data, ["v"], aggregate_by=None).to_pydict()
        assert out["v"] == [3.0, 4.0]  # ref fine print 4: no groupby

    def test_missing_source_nan(self):
        rel = pa.table(
            {
                "source_id": pa.array([0, 9], type=pa.int64()),
                "target_id": ["a", "b"],
                "weight": [1.0, 1.0],
            }
        )
        data = pa.table(
            {"source_id": pa.array([0], type=pa.int64()), "v": [3.0]}
        )
        out = prorate(rel, data, ["v"], aggregate_by=None).to_pydict()
        assert out["v"][0] == 3.0 and np.isnan(out["v"][1])

    def test_missing_source_same_answer_all_plans(self, ray_session):
        # ADVICE r1 (medium): a source_id absent from data must not
        # null-poison the target group in the Dataset plan — pandas
        # (reference) skips the NaN product; all plans must return 30.0.
        import ray
        import ray.data

        rel = pa.table(
            {
                "source_id": pa.array([0, 9], type=pa.int64()),
                "target_id": ["a", "a"],
                "weight": [1.0, 1.0],
            }
        )
        data = pa.table(
            {"source_id": pa.array([0], type=pa.int64()), "v": [30.0]}
        )
        local = prorate(rel, data, ["v"]).to_pydict()
        assert local["target_id"] == ["a"] and local["v"] == [30.0]
        dist = (
            prorate(ray.data.from_arrow(rel), data, ["v"])
            .to_pandas()
            .sort_values("target_id", ignore_index=True)
        )
        assert dist["target_id"].tolist() == ["a"]
        assert dist["v"].tolist() == [30.0]
        hashj = (
            prorate(
                ray.data.from_arrow(rel), ray.data.from_arrow(data), ["v"],
                broadcast_limit=1,  # force the hash co-shuffle plan
            )
            .to_pandas()
            .sort_values("target_id", ignore_index=True)
        )
        assert hashj["target_id"].tolist() == ["a"]
        assert hashj["v"].tolist() == [30.0]

    def test_all_missing_target_group_sums_to_zero(self, ray_session):
        # ADVICE r2 (low): a target whose sources are ALL missing from
        # data must still appear with sum 0 (pandas skip-NaN sum keeps
        # the group) — in every physical plan.
        import ray
        import ray.data

        rel = pa.table(
            {
                "source_id": pa.array([0, 9], type=pa.int64()),
                "target_id": ["a", "b"],  # target b has ONLY missing 9
                "weight": [1.0, 1.0],
            }
        )
        data = pa.table(
            {"source_id": pa.array([0], type=pa.int64()), "v": [30.0]}
        )
        local = prorate(rel, data, ["v"]).to_pydict()
        assert local["target_id"] == ["a", "b"]
        assert local["v"] == [30.0, 0.0]
        for plan in (
            prorate(ray.data.from_arrow(rel), data, ["v"]),
            prorate(
                ray.data.from_arrow(rel),
                ray.data.from_arrow(data),
                ["v"],
                broadcast_limit=1,  # force the hash co-shuffle plan
            ),
        ):
            df = plan.to_pandas().sort_values(
                "target_id", ignore_index=True
            )
            assert df["target_id"].tolist() == ["a", "b"]
            assert df["v"].tolist() == [30.0, 0.0]

    def test_callable_aggregate_all_plans(self, ray_session):
        # reference accepts any pandas agg (intersections.py:70-72)
        import ray.data

        rel = pa.table(
            {
                "source_id": pa.array([0, 1, 2], type=pa.int64()),
                "target_id": ["a", "a", "b"],
                "weight": [1.0, 1.0, 1.0],
            }
        )
        data = pa.table(
            {
                "source_id": pa.array([0, 1, 2], type=pa.int64()),
                "v": [1.0, 5.0, 7.0],
            }
        )
        local = prorate(rel, data, ["v"], aggregate_by="median").to_pandas()
        want = dict(zip(local["target_id"], local["v"]))
        assert want == {"a": 3.0, "b": 7.0}
        dist = prorate(
            ray.data.from_arrow(rel), data, ["v"], aggregate_by="median"
        ).to_pandas()
        assert dict(zip(dist["target_id"], dist["v"])) == want

    def test_dataset_aggregate(self, ray_session, four_square_grid):
        """E1-shaped: block points → assign → prorate to districts."""
        import ray
        import ray.data

        from maup_ray import assign

        n = 200
        rng = np.random.RandomState(0)
        src = pa.table(
            {
                "source_id": pa.array(np.arange(n), type=pa.int64()),
                "x": pa.array(rng.uniform(0, 2, n)),
                "y": pa.array(rng.uniform(0, 2, n)),
                "pop": pa.array(np.ones(n)),
            }
        )
        ds = ray.data.from_arrow(src)
        assigned = assign(ds, four_square_grid, keep_cols=("pop",), concurrency=2)
        # assignment-as-relationship with weight 1 → grouped sum
        rel = assigned.map_batches(
            lambda b: b.append_column(
                "weight", pa.array(np.ones(b.num_rows))
            ),
            batch_format="pyarrow",
        )
        data = src.select(["source_id", "pop"])
        out = prorate(rel, data, ["pop"])
        tbl = out.to_pandas()
        assert tbl["pop"].sum() == n
