"""ops/tiling.morton_key / zorder_partition and ops/stats.ks_2samp —
brute-force replicas (bit interleave, scipy-free exact KS)."""

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.ops.stats import ks_2samp
from maup_ray.ops.tiling import morton_key, zorder_partition


class TestMorton:
    def test_interleave_brute(self):
        rng = np.random.RandomState(3)
        cx = rng.randint(0, 1 << 10, 500).astype(np.int64)
        cy = rng.randint(0, 1 << 10, 500).astype(np.int64)
        got = morton_key(cx, cy, 10)

        def brute(x, y):
            out = 0
            for b in range(10):
                out |= ((x >> b) & 1) << (2 * b + 1)
                out |= ((y >> b) & 1) << (2 * b)
            return out

        assert got.tolist() == [
            brute(int(a), int(b)) for a, b in zip(cx, cy)
        ]
        # locality sanity: (0,0) -> 0, (max,max) -> 4^res - 1
        assert morton_key(
            np.array([0, (1 << 10) - 1]), np.array([0, (1 << 10) - 1]),
            10,
        ).tolist() == [0, (1 << 20) - 1]


class TestZorderPartition:
    def test_balanced_and_ordered(self, ray_session):
        import ray.data

        rng = np.random.RandomState(7)
        n, P = 2000, 16
        t = pa.table(
            {
                "id": pa.array(np.arange(n, dtype=np.int64)),
                "x": pa.array(
                    rng.uniform(0, 1 << 20, n).astype(np.float64)
                ),
                "y": pa.array(
                    rng.uniform(0, 1 << 20, n).astype(np.float64)
                ),
            }
        )
        got = zorder_partition(
            ray.data.from_arrow(t).repartition(5), "id",
            res=10, n_parts=P, extent=float(1 << 20),
        )
        assert got["part"].to_pylist() == list(range(P))
        ns = got["n_rows"].to_pylist()
        assert sum(ns) == n
        # exact ntile: every partition gets floor(n/P) or ceil(n/P)
        assert set(ns) <= {n // P, n // P + 1}
        # ranges ordered: partition key ranges are non-decreasing
        mins = got["mkey_min"].to_pylist()
        maxs = got["mkey_max"].to_pylist()
        for i in range(P):
            assert mins[i] <= maxs[i]
        for i in range(P - 1):
            assert maxs[i] <= mins[i + 1]

    def test_requires_extent(self, ray_session):
        import ray.data

        t = pa.table(
            {
                "id": pa.array([1], type=pa.int64()),
                "x": pa.array([1.0]),
                "y": pa.array([1.0]),
            }
        )
        with pytest.raises(ValueError):
            zorder_partition(ray.data.from_arrow(t), "id")


class TestKs2Samp:
    def _brute(self, v1, v0):
        grid = sorted(set(v1) | set(v0))
        n1, n0 = len(v1), len(v0)
        best = 0
        for g in grid:
            f1 = sum(1 for x in v1 if x <= g)
            f0 = sum(1 for x in v0 if x <= g)
            best = max(best, abs(f1 * n0 - f0 * n1))
        return n1, n0, best

    def test_matches_brute_and_scipy_form(self, ray_session):
        import ray.data

        rng = np.random.RandomState(17)
        n = 3000
        side = rng.randint(0, 2, n).astype(np.int64)
        v = np.where(
            side == 1,
            rng.randint(0, 300, n),
            rng.randint(20, 320, n),
        ).astype(np.int64)
        got = ks_2samp(
            ray.data.from_arrow(
                pa.table({"s": pa.array(side), "v": pa.array(v)})
            ).repartition(6),
            "s", "v",
        )
        v1 = v[side == 1].tolist()
        v0 = v[side == 0].tolist()
        n1, n0, d_num = self._brute(v1, v0)
        assert got["n1"].to_pylist() == [n1]
        assert got["n0"].to_pylist() == [n0]
        assert got["d_num"].to_pylist() == [d_num]
        assert got["d"].to_pylist() == [float(d_num) / float(n1 * n0)]

    def test_identical_and_disjoint(self, ray_session):
        t = pa.table(
            {
                "s": pa.array([0, 1, 0, 1], type=pa.int64()),
                "v": pa.array([5, 5, 9, 9], type=pa.int64()),
            }
        )
        got = ks_2samp(t, "s", "v")
        assert got["d"].to_pylist() == [0.0]
        t2 = pa.table(
            {
                "s": pa.array([0, 0, 1, 1], type=pa.int64()),
                "v": pa.array([1, 2, 10, 11], type=pa.int64()),
            }
        )
        got2 = ks_2samp(t2, "s", "v")
        assert got2["d"].to_pylist() == [1.0]
        with pytest.raises(ValueError):
            ks_2samp(
                pa.table(
                    {
                        "s": pa.array([1, 1], type=pa.int64()),
                        "v": pa.array([1, 2], type=pa.int64()),
                    }
                ),
                "s", "v",
            )


class TestMannWhitney:
    def test_matches_scipy_formula(self, ray_session):
        import ray.data

        from maup_ray.ops.stats import mannwhitney_u

        rng = np.random.RandomState(43)
        n = 4000
        side = rng.randint(0, 2, n).astype(np.int64)
        v = np.where(
            side == 1,
            rng.randint(0, 80, n),  # heavy ties
            rng.randint(10, 90, n),
        ).astype(np.int64)
        got = mannwhitney_u(
            ray.data.from_arrow(
                pa.table({"s": pa.array(side), "v": pa.array(v)})
            ).repartition(5),
            "s", "v",
        )
        # brute midrank computation
        import pandas as pd

        ranks = pd.Series(v).rank(method="average")
        r1 = float(ranks[side == 1].sum())
        n1 = int((side == 1).sum())
        n0 = int((side == 0).sum())
        u1 = r1 - n1 * (n1 + 1) / 2.0
        assert got["n1"].to_pylist() == [n1]
        assert got["n0"].to_pylist() == [n0]
        assert got["u"].to_pylist() == [u1]
        assert got["u2"].to_pylist() == [int(2 * u1)]

    def test_no_ties_identity(self, ray_session):
        from maup_ray.ops.stats import mannwhitney_u

        # side 1 all above side 0: U1 = n1*n0 (maximal)
        t = pa.table(
            {
                "s": pa.array([0, 0, 0, 1, 1], type=pa.int64()),
                "v": pa.array([1, 2, 3, 10, 11], type=pa.int64()),
            }
        )
        got = mannwhitney_u(t, "s", "v")
        assert got["u"].to_pylist() == [6.0]
