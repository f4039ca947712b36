"""assign parity tests on the reference's conftest grids
(ref: tests/test_assign.py — expected values pinned there)."""

import numpy as np
import pyarrow as pa
import pytest

from maup_ray import assign, assign_by_area, assign_by_covering


def to_map(tbl: pa.Table):
    d = tbl.to_pydict()
    return dict(zip(d["source_id"], d["target_id"]))


class TestAssignTable:
    def test_four_squares(self, squares_within_four_square_grid, four_square_grid):
        out = assign(squares_within_four_square_grid, four_square_grid)
        # ref: tests/test_assign.py:33-42
        assert to_map(out) == {0: "a", 1: "a", 2: "b", 3: "d"}

    def test_unassigned_null(
        self, squares_within_four_square_grid, left_half_of_square_grid
    ):
        out = assign(squares_within_four_square_grid, left_half_of_square_grid)
        # ref: tests/test_assign.py:45-54 — square 3 has no target
        m = to_map(out)
        assert m[0] == "a" and m[2] == "b" and m[3] is None
        # square 1 at (0.5,0.5)-(1,1) is inside 'a' still
        assert m[1] == "a"

    def test_overlapping_source_by_area(
        self, square_mostly_in_top_left, four_square_grid
    ):
        # ref: tests/test_assign.py:112-118 — not covered, most area in b
        out = assign(square_mostly_in_top_left, four_square_grid)
        assert to_map(out) == {4: "b"}

    def test_assign_by_covering_dup_covers_null(self, four_square_grid):
        from maup_ray.geom import encode_polygon

        # a source inside both overlapping targets → covering gives null
        targets = pa.table(
            {
                "target_id": ["t1", "t2"],
                "geometry": [
                    encode_polygon(
                        [np.array([[0.0, 0], [2, 0], [2, 2], [0, 2]])]
                    ),
                    encode_polygon(
                        [np.array([[0.0, 0], [3, 0], [3, 3], [0, 3]])]
                    ),
                ],
            }
        )
        src = pa.table(
            {
                "source_id": pa.array([0], type=pa.int64()),
                "geometry": [
                    encode_polygon(
                        [np.array([[0.5, 0.5], [1, 0.5], [1, 1], [0.5, 1]])]
                    )
                ],
            }
        )
        out = assign_by_covering(src, targets)
        assert to_map(out) == {0: None}
        # full assign resolves by area → t1 (tie-less: areas equal? piece
        # is fully inside both → equal areas → first sorted target t1)
        out = assign(src, targets)
        assert to_map(out) == {0: "t1"}

    def test_assign_by_area(self, square_mostly_in_top_left, four_square_grid):
        out = assign_by_area(square_mostly_in_top_left, four_square_grid)
        assert to_map(out) == {4: "b"}

    def test_bbox_hit_but_disjoint(self):
        # F4 diamond case (ref: tests/test_indexed_geometries.py:61-70)
        from maup_ray.geom import encode_polygon

        diamond = pa.table(
            {
                "target_id": ["d"],
                "geometry": [
                    encode_polygon(
                        [np.array([[100.0, 0], [0, 100], [-100, 0], [0, -100]])]
                    )
                ],
            }
        )
        src = pa.table(
            {
                "source_id": pa.array([0], type=pa.int64()),
                "geometry": [
                    encode_polygon(
                        [np.array([[90.0, 90], [91, 90], [91, 91], [90, 91]])]
                    )
                ],
            }
        )
        assert to_map(assign(src, diamond)) == {0: None}


class TestAssignPoints:
    def test_points_in_grid(self, four_square_grid):
        src = pa.table(
            {
                "source_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                "x": pa.array([0.5, 0.5, 1.5, 5.0]),
                "y": pa.array([0.5, 1.5, 1.5, 5.0]),
            }
        )
        out = assign(src, four_square_grid)
        assert to_map(out) == {0: "a", 1: "b", 2: "d", 3: None}

    def test_rect_targets_no_geometry_column(self):
        targets = pa.table(
            {
                "target_id": pa.array([10, 11], type=pa.int64()),
                "minx": [0.0, 1.0],
                "miny": [0.0, 0.0],
                "maxx": [1.0, 2.0],
                "maxy": [1.0, 1.0],
            }
        )
        src = pa.table(
            {
                "source_id": pa.array([0, 1, 2], type=pa.int64()),
                "x": pa.array([0.5, 1.5, 1.0]),  # 1.0 on shared edge → right cell
                "y": pa.array([0.5, 0.5, 0.5]),
            }
        )
        m = to_map(assign(src, targets))
        assert m == {0: 10, 1: 11, 2: 11}


class TestAssignDataset:
    def test_points_dataset(self, ray_session, four_square_grid):
        import ray.data

        src = ray.data.from_arrow(
            pa.table(
                {
                    "source_id": pa.array(np.arange(100), type=pa.int64()),
                    "x": pa.array(np.linspace(0.01, 1.99, 100)),
                    "y": pa.array(np.full(100, 0.5)),
                }
            )
        )
        out = assign(src, four_square_grid, concurrency=2).to_arrow_refs()
        import ray as _r

        tbl = pa.concat_tables([_r.get(r) for r in out])
        m = to_map(tbl)
        xs = np.linspace(0.01, 1.99, 100)
        for i, x in enumerate(xs):
            assert m[i] == ("a" if x < 1 else "c")
