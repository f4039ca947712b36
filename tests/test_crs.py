"""CRS guard tests (ref: tests/test_crs.py)."""

import pyarrow as pa
import pytest

from maup_ray.crs import get_crs, require_same_crs, set_crs


def test_roundtrip_and_guard():
    t = pa.table({"id": [1]})
    assert get_crs(t) is None
    a = set_crs(t, "EPSG:5070")
    b = set_crs(t, "EPSG:4326")
    assert get_crs(a) == "EPSG:5070"
    require_same_crs(a, set_crs(t, "EPSG:5070"))  # same → ok
    require_same_crs(a, t)  # missing on one side → pass (fixtures)
    with pytest.raises(TypeError):
        require_same_crs(a, b)
