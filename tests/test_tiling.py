"""Hierarchical-cell compact: kernel properties + distributed parity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.geom.cells import (
    CellGrid,
    cells_covering_rects,
    children,
    compact_cells,
)
from maup_ray.ops.tiling import compact, uncompact_table

GRID = CellGrid(0, 0, 1 << 20)


def _expand(cells: np.ndarray, res: int) -> np.ndarray:
    cur = np.asarray(cells, dtype=np.uint64)
    done = []
    while len(cur):
        r = CellGrid.res_of(cur)
        done.append(cur[r == res])
        todo = cur[r < res]
        cur = (
            children(todo).ravel()
            if len(todo)
            else np.array([], dtype=np.uint64)
        )
    return np.sort(np.concatenate(done)) if done else cur


class TestCompactKernel:
    def test_full_grid_collapses_to_root(self):
        mx, my = np.meshgrid(np.arange(8), np.arange(8))
        cells = GRID.pack(mx.ravel(), my.ravel(), 3)
        out = compact_cells(cells)
        cx, cy, res = CellGrid.unpack(out)
        assert list(res) == [0] and list(cx) == [0] and list(cy) == [0]

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_set_round_trips_and_is_minimal(self, seed):
        rng = np.random.default_rng(seed)
        res = 6
        n = 1 << res
        mx, my = np.meshgrid(np.arange(n), np.arange(n))
        keep = rng.random(n * n) < 0.7
        cells = GRID.pack(mx.ravel()[keep], my.ravel()[keep], res)
        out = compact_cells(cells)
        # exact cover round-trip
        assert np.array_equal(_expand(out, res), np.sort(cells))
        # minimality: no 4 siblings left in the output
        code = out & ((np.uint64(1) << np.uint64(58)) - np.uint64(1))
        r = CellGrid.res_of(out)
        parent_key = (code >> np.uint64(2)) | (
            r.astype(np.uint64) << np.uint64(58)
        )
        _, counts = np.unique(parent_key, return_counts=True)
        assert counts.max() < 4

    def test_duplicates_and_min_res(self):
        mx, my = np.meshgrid(np.arange(4), np.arange(4))
        cells = GRID.pack(mx.ravel(), my.ravel(), 2)
        doubled = np.concatenate([cells, cells])
        out = compact_cells(doubled, min_res=1)
        assert list(CellGrid.res_of(out)) == [1, 1, 1, 1]

    def test_mixed_resolution_raises(self):
        a = GRID.pack(np.array([0]), np.array([0]), 2)
        b = GRID.pack(np.array([0]), np.array([0]), 3)
        with pytest.raises(ValueError, match="single-resolution"):
            compact_cells(np.concatenate([a, b]))


class TestCoveringRects:
    def test_clamped_cover_matches_brute(self):
        rng = np.random.default_rng(7)
        n, res, extent = 50, 5, 1 << 20
        w = extent >> res
        x0 = rng.integers(-2 * w, extent, n)
        y0 = rng.integers(-2 * w, extent, n)
        x1 = x0 + rng.integers(0, 3 * w, n)
        y1 = y0 + rng.integers(0, 3 * w, n)
        row, cells = cells_covering_rects(x0, y0, x1, y1, res, extent)
        cx, cy, _ = CellGrid.unpack(cells)
        side = 1 << res
        for i in range(n):
            m = row == i
            ex = np.arange(
                min(max(x0[i], 0) // w, side - 1),
                min(max(x1[i], 0) // w, side - 1) + 1,
            )
            ey = np.arange(
                min(max(y0[i], 0) // w, side - 1),
                min(max(y1[i], 0) // w, side - 1) + 1,
            )
            got = set(zip(cx[m].tolist(), cy[m].tolist()))
            want = {(a, b) for a in ex.tolist() for b in ey.tolist()}
            assert got == want


class TestDistributedCompact:
    def _cells_ds(self, ray, cells, blocks=6):
        import ray.data

        tbl = pa.table({"cell": pa.array(cells.astype(np.int64))})
        return ray.data.from_arrow(tbl).repartition(blocks)

    def test_dataset_matches_table_path(self, ray_session):
        rng = np.random.default_rng(3)
        res, n = 7, 1 << 7
        mx, my = np.meshgrid(np.arange(n), np.arange(n))
        keep = rng.random(n * n) < 0.6
        cells = GRID.pack(mx.ravel()[keep], my.ravel()[keep], res)
        # duplicate rows across blocks on purpose
        dup = np.concatenate([cells, cells[::3]])
        want = compact(pa.table({"cell": pa.array(cells.astype(np.int64))}))
        got = (
            compact(self._cells_ds(ray_session, dup))
            .to_pandas()
            .sort_values(["res", "cx", "cy"])
            .reset_index(drop=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(got, want.to_pandas())

    def test_anchor_topoff_promotes_across_partitions(self, ray_session):
        # full grid at res 6: every anchor subtree is complete, so the
        # driver top-off must promote all the way to the root cell
        res = 6
        n = 1 << res
        mx, my = np.meshgrid(np.arange(n), np.arange(n))
        cells = GRID.pack(mx.ravel(), my.ravel(), res)
        out = compact(
            self._cells_ds(ray_session, cells, blocks=8), anchor_res=2
        ).to_pandas()
        assert len(out) == 1
        assert list(out.iloc[0]) == [0, 0, 0]

    def test_uncompact_inverts(self, ray_session):
        rng = np.random.default_rng(11)
        res, n = 6, 1 << 6
        mx, my = np.meshgrid(np.arange(n), np.arange(n))
        keep = rng.random(n * n) < 0.5
        cells = GRID.pack(mx.ravel()[keep], my.ravel()[keep], res)
        comp = compact(pa.table({"cell": pa.array(cells.astype(np.int64))}))
        back = uncompact_table(comp, res)
        cx, cy, _ = CellGrid.unpack(np.sort(cells))
        want = pa.table(
            {"cx": pa.array(cx), "cy": pa.array(cy)}
        ).sort_by([("cx", "ascending"), ("cy", "ascending")])
        assert back.equals(want)


class TestTilePyramid:
    def test_matches_brute_force_all_zooms(self, ray_session):
        import ray.data

        from maup_ray.ops.tiles import tile_pyramid

        rng = np.random.default_rng(4)
        extent = 1 << 10
        xi = rng.integers(0, extent, size=3000)
        yi = rng.integers(0, extent, size=3000)
        tbl = pa.table(
            {
                "x": pa.array(xi.astype(np.float64) + 0.5),
                "y": pa.array(yi.astype(np.float64) + 0.5),
            }
        )
        got = tile_pyramid(
            ray.data.from_arrow(tbl).repartition(6), "x", "y",
            extent=extent, max_zoom=3,
        )
        from collections import Counter

        want = Counter()
        for z in range(4):
            for a, b in zip((xi * (1 << z)) // extent,
                            (yi * (1 << z)) // extent):
                want[(z, int(a), int(b))] += 1
        gotmap = {
            (r["zoom"], r["tx"], r["ty"]): r["n"]
            for r in got.to_pylist()
        }
        assert gotmap == dict(want)
        # zoom-0 row is the global count; each level sums to n
        import pandas as pd

        df = got.to_pandas()
        assert (df.groupby("zoom")["n"].sum() == 3000).all()

    def test_table_path_and_nonpow2_extent(self):
        from maup_ray.ops.tiles import tile_pyramid

        xi = np.array([0, 99, 100, 299])
        tbl = pa.table(
            {
                "x": pa.array(xi.astype(np.float64) + 0.5),
                "y": pa.array(np.zeros(4) + 0.5),
            }
        )
        got = tile_pyramid(tbl, "x", "y", extent=300, max_zoom=2)
        # zoom 2: tile width 75 -> tx = 0,1,1,3
        z2 = {
            (r["tx"], r["ty"]): r["n"]
            for r in got.to_pylist()
            if r["zoom"] == 2
        }
        assert z2 == {(0, 0): 1, (1, 0): 2, (3, 0): 1}
