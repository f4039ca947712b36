"""small_rook_to_queen tests (op 21; ref: tests/test_smart_repair.py:88-118
invariant: min rook adjacency length > threshold after conversion)."""

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.geom import area as parea
from maup_ray.geom import decode_polygons, encode_polygon
from maup_ray.ops.adjacencies import adjacencies
from maup_ray.ops.repair import doctor
from maup_ray.ops.rook_to_queen import small_rook_to_queen


def sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float)


def offset_grid():
    """2×2 grid with the top column boundary offset by 0.05 → B and C
    share a short rook edge of length 0.05."""
    return pa.table(
        {
            "id": ["A", "B", "C", "D"],
            "geometry": pa.array(
                [
                    encode_polygon([sq(0, 0, 1, 1)]),
                    encode_polygon([sq(1, 0, 2, 1)]),
                    encode_polygon([sq(0, 1, 1.05, 2)]),
                    encode_polygon([sq(1.05, 1, 2, 2)]),
                ],
                type=pa.binary(),
            ),
        }
    )


def rook_lengths(t):
    adj = adjacencies(t, adjacency_type="rook", include_geometry=False)
    return {
        (i, j): l
        for i, j, l in zip(
            adj["id_i"].to_pylist(),
            adj["id_j"].to_pylist(),
            adj["length"].to_pylist(),
        )
    }


def test_short_edge_becomes_queen():
    t = offset_grid()
    before = rook_lengths(t)
    assert before[("B", "C")] == pytest.approx(0.05)
    out = small_rook_to_queen(t, min_rook_length=0.2)
    after = rook_lengths(out)
    assert ("B", "C") not in after  # rook edge gone (point touch only)
    # the invariant the reference pins: every remaining rook adjacency
    # exceeds the threshold
    assert min(after.values()) > 0.2
    # clean tessellation and exact area conservation
    assert doctor(out)["ok"]
    total = sum(
        parea(decode_polygons(b.as_py())) for b in out["geometry"]
    )
    assert total == pytest.approx(4.0, abs=1e-9)


def test_no_short_edges_noop():
    t = pa.table(
        {
            "id": ["a", "b"],
            "geometry": pa.array(
                [
                    encode_polygon([sq(0, 0, 1, 1)]),
                    encode_polygon([sq(1, 0, 2, 1)]),
                ],
                type=pa.binary(),
            ),
        }
    )
    out = small_rook_to_queen(t, min_rook_length=0.2)
    assert rook_lengths(out) == {("a", "b"): 1.0}
