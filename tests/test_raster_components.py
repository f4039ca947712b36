"""ops/raster.raster_components — brute union-find parity on random
masks, isolated cells, weights, and partition invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _brute(cells, width, weights=None):
    """(component -> (n_cells, weight_sum)) via union-find; component
    = min linear id."""
    ids = {cy * width + cx for cx, cy in cells}
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for cx, cy in cells:
        i = cy * width + cx
        if cx + 1 < width and (i + 1) in ids:
            union(i, i + 1)
        if (i + width) in ids:
            union(i, i + width)
    w = {}
    for j, (cx, cy) in enumerate(cells):
        i = cy * width + cx
        r = find(i)
        n, s = w.get(r, (0, 0))
        w[r] = (n + 1, s + (weights[j] if weights is not None else 1))
    return w


def _mask(rng, width, fill):
    pts = set()
    for _ in range(int(width * width * fill)):
        pts.add((int(rng.randint(0, width)), int(rng.randint(0, width))))
    return sorted(pts)


class TestRasterComponents:
    def test_random_mask_matches_brute(self, ray_session):
        import ray.data

        from maup_ray.ops.raster import raster_components

        rng = np.random.RandomState(31)
        for fill in (0.15, 0.45, 0.8):
            cells = _mask(rng, 24, fill)
            tbl = pa.table(
                {
                    "cx": pa.array([c[0] for c in cells], type=pa.int64()),
                    "cy": pa.array([c[1] for c in cells], type=pa.int64()),
                }
            )
            ds = ray.data.from_arrow(tbl).repartition(5)
            out = raster_components(ds, width=24)
            want = _brute(cells, 24)
            got = {
                int(c): (int(n),)
                for c, n in zip(out["component"].to_pylist(),
                                out["n_cells"].to_pylist())
            }
            assert got == {k: (v[0],) for k, v in want.items()}, fill

    def test_weights_and_isolated(self, ray_session):
        import ray.data

        from maup_ray.ops.raster import raster_components

        # L-shaped blob + two isolated cells
        cells = [(0, 0), (1, 0), (1, 1), (5, 5), (9, 0)]
        w = [10, 20, 30, 7, 1]
        tbl = pa.table(
            {
                "cx": pa.array([c[0] for c in cells], type=pa.int64()),
                "cy": pa.array([c[1] for c in cells], type=pa.int64()),
                "n": pa.array(w, type=pa.int64()),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(3)
        out = raster_components(ds, width=16, weight_col="n").to_pandas()
        got = {
            int(r["component"]): (int(r["n_cells"]), int(r["n"]))
            for _, r in out.iterrows()
        }
        assert got == {0: (3, 60), 5 * 16 + 5: (1, 7), 9: (1, 1)}

    def test_partition_invariance_and_table_input(self, ray_session):
        import ray.data

        from maup_ray.ops.raster import raster_components

        rng = np.random.RandomState(4)
        cells = _mask(rng, 20, 0.5)
        tbl = pa.table(
            {
                "cx": pa.array([c[0] for c in cells], type=pa.int64()),
                "cy": pa.array([c[1] for c in cells], type=pa.int64()),
            }
        )
        base = raster_components(tbl, width=20).to_pandas()
        for p in (1, 9):
            ds = ray.data.from_arrow(tbl).repartition(p)
            got = raster_components(ds, width=20).to_pandas()
            assert got.equals(base)

    def test_hash_final_equals_driver(self, ray_session):
        import ray.data

        from maup_ray.ops.raster import raster_components

        rng = np.random.RandomState(12)
        cells = _mask(rng, 16, 0.4)
        tbl = pa.table(
            {
                "cx": pa.array([c[0] for c in cells], type=pa.int64()),
                "cy": pa.array([c[1] for c in cells], type=pa.int64()),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(4)
        a = raster_components(ds, width=16, final="driver").to_pandas()
        b = (
            raster_components(ds, width=16, final="hash")
            .to_pandas()
            .sort_values("component")
            .reset_index(drop=True)
        )
        assert a[["component", "n_cells"]].equals(
            b[["component", "n_cells"]]
        )
