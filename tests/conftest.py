"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest run."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield ray
    ray.shutdown()


def _sq(x0, y0, x1, y1):
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64
    )


@pytest.fixture
def four_square_grid():
    """F1: unit squares a,b,c,d (ref: tests/conftest.py:14-30)."""
    from maup_ray.geom import encode_polygon

    ids = ["a", "b", "c", "d"]
    geoms = [
        _sq(0, 0, 1, 1),
        _sq(0, 1, 1, 2),
        _sq(1, 0, 2, 1),
        _sq(1, 1, 2, 2),
    ]
    return pa.table(
        {
            "target_id": ids,
            "geometry": [encode_polygon([g]) for g in geoms],
        }
    )


@pytest.fixture
def squares_within_four_square_grid():
    """F2: 4 small squares nesting into the grid (ref: tests/conftest.py:53-66)."""
    from maup_ray.geom import encode_polygon

    geoms = [
        _sq(0, 0, 0.5, 0.5),
        _sq(0.5, 0.5, 1, 1),
        _sq(0, 1, 1, 2),
        _sq(1.25, 1.25, 1.75, 1.75),
    ]
    return pa.table(
        {
            "source_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "geometry": [encode_polygon([g]) for g in geoms],
            "data": pa.array([1, 1, 1, 1], type=pa.int64()),
        }
    )


@pytest.fixture
def square_mostly_in_top_left():
    """F3 (ref: tests/conftest.py:86-88)."""
    from maup_ray.geom import encode_polygon

    return pa.table(
        {
            "source_id": pa.array([4], type=pa.int64()),
            "geometry": [encode_polygon([_sq(0, 0.5, 1.5, 2)])],
            "data": pa.array([1], type=pa.int64()),
        }
    )


@pytest.fixture
def left_half_of_square_grid(four_square_grid):
    return four_square_grid.slice(0, 2)  # rows a, b


@pytest.fixture
def big_square():
    from maup_ray.geom import encode_polygon

    return pa.table(
        {
            "target_id": ["big"],
            "geometry": [encode_polygon([_sq(0, 0, 2, 2)])],
        }
    )
