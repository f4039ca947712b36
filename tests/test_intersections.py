"""intersections overlay-join tests (ref: tests/test_intersections.py)."""

import numpy as np
import pyarrow as pa
import pytest

from maup_ray import intersections


def rows(tbl: pa.Table):
    d = tbl.to_pydict()
    return {
        (s, t): (a, l, dim)
        for s, t, a, l, dim in zip(
            d["source_id"], d["target_id"], d["area"], d["length"], d["dim"]
        )
    }


class TestIntersections:
    def test_pieces_with_boundary_touches(
        self, squares_within_four_square_grid, four_square_grid
    ):
        out = intersections(
            squares_within_four_square_grid, four_square_grid, sort=True
        )
        r = rows(out)
        # area pieces (ref: tests/test_intersections.py:24-49)
        assert r[(0, "a")][0] == 0.25
        assert r[(1, "a")][0] == 0.25
        assert r[(2, "b")][0] == 1.0
        assert r[(3, "d")][0] == 0.25
        # boundary touches kept by default (SURVEY §2.3 item 3):
        # source 1 = (0.5,0.5)-(1,1): line on b's bottom edge, line on
        # c's left edge, corner point with d
        assert r[(1, "b")] == (0.0, 0.5, 1)
        assert r[(1, "c")] == (0.0, 0.5, 1)
        assert r[(1, "d")] == (0.0, 0.0, 0)
        # source 2 == b exactly: line with a, point with c, line with d
        assert r[(2, "a")][2] == 1
        assert r[(2, "c")][2] == 0
        assert r[(2, "d")][2] == 1
        assert len(r) == 10

    def test_area_cutoff(self, squares_within_four_square_grid, four_square_grid):
        out = intersections(
            squares_within_four_square_grid, four_square_grid, area_cutoff=0
        )
        r = rows(out)
        assert set(r) == {(0, "a"), (1, "a"), (2, "b"), (3, "d")}

    def test_overlapping_square(self, square_mostly_in_top_left, four_square_grid):
        out = intersections(
            square_mostly_in_top_left, four_square_grid, area_cutoff=0
        )
        r = rows(out)
        assert r[(4, "a")][0] == 0.5
        assert r[(4, "b")][0] == 1.0
        assert r[(4, "c")][0] == 0.25
        assert r[(4, "d")][0] == 0.5

    def test_matches_bruteforce_general_polygons(self):
        """Non-rectangular oracle: O(S·T) double loop vs the actor
        (ref pattern: tests/test_intersections.py:67-80)."""
        from maup_ray.geom import area as parea
        from maup_ray.geom import encode_polygon, intersection

        rng = np.random.RandomState(3)
        # jittered triangles scattered over [0,4]^2
        srcs, tgts = [], []
        for i in range(12):
            c = rng.uniform(0, 4, 2)
            pts = c + rng.uniform(-1, 1, (3, 2))
            srcs.append([pts])
        for j in range(6):
            c = rng.uniform(0, 4, 2)
            pts = c + rng.uniform(-1.5, 1.5, (3, 2))
            tgts.append([pts])
        src_tbl = pa.table(
            {
                "source_id": pa.array(range(12), type=pa.int64()),
                "geometry": [encode_polygon(g) for g in srcs],
            }
        )
        tgt_tbl = pa.table(
            {
                "target_id": pa.array(range(6), type=pa.int64()),
                "geometry": [encode_polygon(g) for g in tgts],
            }
        )
        out = rows(intersections(src_tbl, tgt_tbl, area_cutoff=0))
        from maup_ray.geom.core import normalize_polygon

        want = {}
        for i, s in enumerate(srcs):
            sn = [normalize_polygon(s)]
            for j, t in enumerate(tgts):
                tn = [normalize_polygon(t)]
                a = parea(intersection(sn, tn))
                if a > 0:
                    want[(i, j)] = a
        assert set(out) == set(want)
        # engine uses exact SH convex clip; the arrangement oracle snaps
        # to a 2^-30-relative grid → compare at grid tolerance
        for k, a in want.items():
            assert out[k][0] == pytest.approx(a, rel=1e-6)

    def test_dataset_path(self, ray_session, four_square_grid, squares_within_four_square_grid):
        import ray
        import ray.data

        ds = ray.data.from_arrow(squares_within_four_square_grid)
        out = intersections(ds, four_square_grid, area_cutoff=0, concurrency=2)
        tbl = pa.concat_tables([ray.get(r) for r in out.to_arrow_refs()])
        r = rows(tbl)
        assert set(r) == {(0, "a"), (1, "a"), (2, "b"), (3, "d")}
