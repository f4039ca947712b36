"""ops/dwithin.dwithin_self_join — brute-force oracle + partition
invariance + the cell-size cover guard."""

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.ops.dwithin import dwithin_self_join


def _collect(ds):
    import ray

    tabs = [ray.get(r) for r in ds.materialize().to_arrow_refs()]
    tabs = [t for t in tabs if t.num_rows] or tabs[:1]
    return pa.concat_tables(tabs)


def _cloud(n=500, seed=1, extent=1000.0):
    rng = np.random.RandomState(seed)
    x = rng.uniform(0, extent, n)
    y = rng.uniform(0, extent, n)
    return pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "x": pa.array(x),
            "y": pa.array(y),
        }
    )


def _brute(t, r):
    x = t["x"].to_numpy()
    y = t["y"].to_numpy()
    n = len(x)
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    ii, jj = np.where(
        (d2 <= r * r) & (np.arange(n)[:, None] < np.arange(n)[None, :])
    )
    return set(zip(ii.tolist(), jj.tolist()))


class TestDwithin:
    @pytest.mark.parametrize("n_blocks", [1, 7])
    def test_matches_brute_force(self, ray_session, n_blocks):
        import ray.data

        t = _cloud()
        r = 60.0
        want = _brute(t, r)
        got = _collect(
            dwithin_self_join(
                ray.data.from_arrow(t).repartition(n_blocks), r
            )
        )
        gset = set(
            zip(got["id_a"].to_pylist(), got["id_b"].to_pylist())
        )
        assert gset == want
        # d2 values are the exact pairwise distances
        x = t["x"].to_numpy()
        y = t["y"].to_numpy()
        for a, b, d2 in zip(
            got["id_a"].to_pylist(),
            got["id_b"].to_pylist(),
            got["d2"].to_pylist(),
        ):
            assert d2 == (x[a] - x[b]) ** 2 + (y[a] - y[b]) ** 2

    def test_bigger_cells_equivalent(self, ray_session):
        import ray.data

        t = _cloud(n=300, seed=7)
        r = 45.0
        a = _collect(
            dwithin_self_join(ray.data.from_arrow(t), r)
        )
        b = _collect(
            dwithin_self_join(
                ray.data.from_arrow(t), r, cell_size=4 * r
            )
        )
        ka = sorted(zip(a["id_a"].to_pylist(), a["id_b"].to_pylist()))
        kb = sorted(zip(b["id_a"].to_pylist(), b["id_b"].to_pylist()))
        assert ka == kb

    def test_cell_size_guard(self, ray_session):
        t = _cloud(n=10)
        with pytest.raises(ValueError, match="2\\*radius"):
            dwithin_self_join(t, 50.0, cell_size=60.0)

    def test_boundary_inclusive(self, ray_session):
        # pair at EXACTLY distance R is included (<=)
        t = pa.table(
            {
                "id": pa.array([0, 1], type=pa.int64()),
                "x": pa.array([0.0, 64.0]),
                "y": pa.array([0.0, 0.0]),
            }
        )
        got = _collect(dwithin_self_join(t, 64.0))
        assert got.num_rows == 1
        assert got["d2"].to_pylist() == [64.0 * 64.0]
