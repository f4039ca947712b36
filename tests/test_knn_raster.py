"""kNN block matching + raster↔vector tests."""

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.ops.knn import knn_points
from maup_ray.ops.raster import rasterize, vectorize


def points(n, seed=0, span=1000.0):
    rng = np.random.RandomState(seed)
    return pa.table(
        {
            "source_id": pa.array(np.arange(n), type=pa.int64()),
            "x": pa.array(rng.uniform(0, span, n)),
            "y": pa.array(rng.uniform(0, span, n)),
        }
    )


class TestKnn:
    def test_matches_bruteforce(self):
        t = points(200)
        tgt = t.rename_columns(["target_id", "x", "y"])
        out = knn_points(t, tgt, k=4, exclude_same_id=True).to_pandas()
        x = t["x"].to_numpy()
        y = t["y"].to_numpy()
        for s in range(0, 200, 37):
            d2 = (x - x[s]) ** 2 + (y - y[s]) ** 2
            d2[s] = np.inf
            want = np.argsort(d2, kind="stable")[:4].tolist()
            got = (
                out[out.source_id == s]
                .sort_values("rank")["neighbor_id"]
                .tolist()
            )
            assert got == want

    def test_cells_mode_matches_broadcast(self):
        t = points(500, seed=3)
        tgt = t.rename_columns(["target_id", "x", "y"])
        a = knn_points(t, tgt, k=3, mode="broadcast").to_pandas()
        b = knn_points(
            t, tgt, k=3, mode="cells", cell_size=100.0
        ).to_pandas()
        a = a.sort_values(["source_id", "rank"], ignore_index=True)
        b = b.sort_values(["source_id", "rank"], ignore_index=True)
        assert a.equals(b)

    def test_cells_exclude_self_distant_neighbor(self):
        # ADVICE r1 (high): with exclude_same_id=True the self point
        # (d2=0) must not count toward n_cand/best_kth, else ring
        # expansion stops before the true neighbor two cells away.
        t = pa.table(
            {
                "source_id": pa.array([0, 1], type=pa.int64()),
                "x": pa.array([5.0, 25.0]),
                "y": pa.array([5.0, 5.0]),
            }
        )
        tgt = t.rename_columns(["target_id", "x", "y"])
        for k in (1, 2):
            got = knn_points(
                t, tgt, k=k, mode="cells", cell_size=10.0,
                exclude_same_id=True,
            ).to_pandas()
            want = knn_points(
                t, tgt, k=k, mode="broadcast", exclude_same_id=True
            ).to_pandas()
            got = got.sort_values(["source_id", "rank"], ignore_index=True)
            want = want.sort_values(["source_id", "rank"], ignore_index=True)
            assert got.equals(want)
            assert len(got) == 2  # each point finds the other

    def test_cells_exclude_self_matches_broadcast_random(self):
        t = points(300, seed=11)
        tgt = t.rename_columns(["target_id", "x", "y"])
        a = knn_points(
            t, tgt, k=3, mode="broadcast", exclude_same_id=True
        ).to_pandas()
        b = knn_points(
            t, tgt, k=3, mode="cells", cell_size=60.0, exclude_same_id=True
        ).to_pandas()
        a = a.sort_values(["source_id", "rank"], ignore_index=True)
        b = b.sort_values(["source_id", "rank"], ignore_index=True)
        assert a.equals(b)

    def test_dataset_path(self, ray_session):
        import ray.data

        t = points(100, seed=5)
        tgt = t.rename_columns(["target_id", "x", "y"])
        out = knn_points(
            ray.data.from_arrow(t), tgt, k=2
        ).to_pandas()
        assert len(out) == 200  # 100 sources × k=2 (self allowed, rank1=self)
        r1 = out[out["rank"] == 1]
        assert (r1["source_id"] == r1["neighbor_id"]).all()


class TestKnnSelfJoin:
    def _brute(self, t, k):
        x = t["x"].to_numpy()
        y = t["y"].to_numpy()
        ids = t["source_id"].to_numpy()
        rows = []
        for i in range(len(ids)):
            d2 = (x - x[i]) ** 2 + (y - y[i]) ** 2
            m = ids != ids[i]
            order = np.argsort(
                np.core.records.fromarrays(
                    [d2[m], ids[m]], names="d,i"
                ),
                order=("d", "i"),
                kind="stable",
            )[:k]
            for r, j in enumerate(ids[m][order], 1):
                rows.append((ids[i], j, r))
        import pandas as pd

        return pd.DataFrame(
            rows, columns=["source_id", "neighbor_id", "rank"]
        ).sort_values(["source_id", "rank"], ignore_index=True)

    def test_dense_uniform(self, ray_session):
        import ray.data

        from maup_ray.ops.knn import knn_self_join

        t = points(400, seed=1, span=1000.0)
        out = (
            knn_self_join(
                ray.data.from_arrow(t), k=3, extent=(0.0, 0.0, 1000.0)
            )
            .to_pandas()
            .sort_values(["source_id", "rank"], ignore_index=True)
        )
        want = self._brute(t, 3)
        assert out.equals(want)

    def test_sparse_needs_ring_escalation(self, ray_session):
        import ray.data

        from maup_ray.ops.knn import knn_self_join

        # 20 points spread over a huge extent with a fine grid: first
        # ring is empty for most, forcing the doubled-ring rounds
        t = points(20, seed=2, span=1000.0)
        out = (
            knn_self_join(
                ray.data.from_arrow(t),
                k=2,
                extent=(0.0, 0.0, 1000.0),
                res=5,  # 32x32 cells for 20 points
            )
            .to_pandas()
            .sort_values(["source_id", "rank"], ignore_index=True)
        )
        want = self._brute(t, 2)
        assert out.equals(want)

    def test_fallback_streamed_pass(self, ray_session):
        import ray.data

        from maup_ray.ops.knn import knn_self_join

        # max_rounds=1 with a fine grid: nearly everything lands in the
        # streamed-fallback pass; result must still be exact
        t = points(60, seed=4, span=1000.0)
        out = (
            knn_self_join(
                ray.data.from_arrow(t),
                k=3,
                extent=(0.0, 0.0, 1000.0),
                res=5,
                max_rounds=1,
            )
            .to_pandas()
            .sort_values(["source_id", "rank"], ignore_index=True)
        )
        want = self._brute(t, 3)
        assert out.equals(want)


class TestRaster:
    def test_rasterize_exact_coverage(self):
        from maup_ray.geom import encode_polygon

        # one rect spanning exactly cells (0,0) and (1,0) halves at res 1
        # over extent 4: cells are 2x2
        t = pa.table(
            {
                "id": ["r"],
                "geometry": pa.array(
                    [
                        encode_polygon(
                            [
                                np.array(
                                    [[1.0, 0], [3, 0], [3, 1], [1, 1]]
                                )
                            ]
                        )
                    ],
                    type=pa.binary(),
                ),
            }
        )
        out = rasterize(t, (0.0, 0.0, 4.0), 1).to_pydict()
        got = {
            (cx, cy): a
            for cx, cy, a in zip(out["cx"], out["cy"], out["coverage_area"])
        }
        assert got == {(0, 0): 1.0, (1, 0): 1.0}

    def test_roundtrip(self):
        from maup_ray.geom import area as parea
        from maup_ray.geom import decode_polygons, encode_polygon

        # axis-aligned shape snapped to the cell grid → vectorize
        # reconstructs it exactly
        t = pa.table(
            {
                "id": ["s"],
                "geometry": pa.array(
                    [
                        encode_polygon(
                            [np.array([[0.0, 0], [6, 0], [6, 4], [0, 4]])]
                        )
                    ],
                    type=pa.binary(),
                ),
            }
        )
        ras = rasterize(t, (0.0, 0.0, 8.0), 2)  # cell = 2
        vec = vectorize(ras, (0.0, 0.0, 8.0), 2)
        g = decode_polygons(vec["geometry"][0].as_py())
        assert parea(g) == 24.0

    def test_dataset_path(self, ray_session):
        import ray
        import ray.data

        from maup_ray.synth.districts import EXTENT, district_table

        ds = ray.data.from_arrow(
            district_table(16).select(["district_id", "geometry"])
        )
        out = rasterize(
            ds, (0.0, 0.0, float(EXTENT)), 3, id_col="district_id"
        ).to_pandas()
        # full tessellation → total coverage = full extent area
        assert out["coverage_area"].sum() == float(EXTENT) ** 2

    def test_vectorize_dataset_path(self, ray_session):
        """Distributed vectorize (id-keyed hash shuffle) matches the
        local Table path geometry-for-geometry."""
        import ray.data

        from maup_ray.geom import area as parea
        from maup_ray.geom import decode_polygons

        rng = np.random.RandomState(5)
        n = 400
        ras = pa.table(
            {
                "id": pa.array(
                    rng.randint(0, 12, n).astype(np.int64)
                ),
                "cx": pa.array(
                    rng.randint(0, 16, n).astype(np.int64)
                ),
                "cy": pa.array(
                    rng.randint(0, 16, n).astype(np.int64)
                ),
                "coverage_area": pa.array(
                    np.full(n, 4.0)
                ),
            }
        )
        # dedup (id, cx, cy) — a raster relation is keyed
        ras = ras.group_by(["id", "cx", "cy"]).aggregate(
            [("coverage_area", "max")]
        ).rename_columns(["id", "cx", "cy", "coverage_area"])
        ext = (0.0, 0.0, 32.0)
        local = vectorize(ras, ext, 4)
        dist = vectorize(
            ray.data.from_arrow(ras).repartition(5), ext, 4
        ).to_pandas().sort_values("id")
        want = {
            i: parea(decode_polygons(b.as_py()))
            for i, b in zip(local["id"].to_pylist(), local["geometry"])
        }
        got = {
            i: parea(decode_polygons(b))
            for i, b in zip(dist["id"], dist["geometry"])
        }
        assert got == want and len(got) == 12
