"""Top-level API parity with the reference package's __all__
(ref: maup/__init__.py:28-45) plus the typo'd warning class."""

import warnings

import numpy as np
import pyarrow as pa
import pytest

import maup_ray

REFERENCE_ALL = [
    "adjacencies",
    "AssigmentWarning",
    "assign",
    "IndexedGeometries",
    "intersections",
    "prorate",
    "close_gaps",
    "resolve_overlaps",
    "quick_repair",
    "snap_to_grid",
    "crop_to",
    "expand_to",
    "doctor",
    "smart_repair",
    "normalize",
    "progress",
]


def test_every_reference_export_exists():
    missing = [n for n in REFERENCE_ALL if not hasattr(maup_ray, n)]
    assert not missing, missing


def test_unassigned_sources_warn_on_local_path():
    from maup_ray.geom.wkb import encode_multipolygon

    def rect(x0, y0, x1, y1):
        return encode_multipolygon(
            [[np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])]]
        )

    sources = pa.table(
        {
            "source_id": pa.array([1, 2], type=pa.int64()),
            "geometry": pa.array(
                [rect(0, 0, 1, 1), rect(100, 100, 101, 101)],
                type=pa.binary(),
            ),
        }
    )
    targets = pa.table(
        {
            "target_id": pa.array([0], type=pa.int64()),
            "geometry": pa.array([rect(-1, -1, 2, 2)], type=pa.binary()),
        }
    )
    with pytest.warns(maup_ray.AssigmentWarning):
        out = maup_ray.assign(
            sources, targets, targets_id_col="target_id"
        )
    assert out["target_id"].null_count == 1


def test_apply_func_to_polygon_parts_type_error():
    with pytest.raises(TypeError):
        maup_ray.apply_func_to_polygon_parts([], lambda p: p)


def test_apply_func_scales_parts():
    two = [
        [np.array([[0.0, 0], [1, 0], [1, 1], [0, 1]])],
        [np.array([[5.0, 5], [6, 5], [6, 6], [5, 6]])],
    ]
    out = maup_ray.apply_func_to_polygon_parts(
        two, lambda poly: [[r * 2.0 for r in poly]]
    )
    assert len(out) == 2
    assert out[0][0][2][0] == 2.0
