"""Douglas-Peucker simplify: exact-reference property tests + the
analytic bumped-square fixture that backs the `simplify` oracle query.

The reference implementation below ranks candidates by cross**2 with
exact Fractions (same semantics as the engine's float64 compare, which
is exact for integer coordinates within 2**26), so mask equality is a
bit-level check, not a tolerance check.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.geom.core import ring_signed_area
from maup_ray.geom.wkb import decode_polygons, encode_multipolygon
from maup_ray.ops.simplify import (
    dp_keep_mask,
    simplify_geom,
    simplify_geometries,
    simplify_ring,
)


def ref_dp_mask(pts: np.ndarray, tol) -> np.ndarray:
    """Recursive DP with exact rational arithmetic (Fractions)."""
    n = len(pts)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    t2 = Fraction(tol) ** 2
    P = [(Fraction(int(x)), Fraction(int(y))) for x, y in pts]

    def rec(i: int, j: int) -> None:
        if j <= i + 1:
            return
        ax, ay = P[i]
        dx, dy = P[j][0] - ax, P[j][1] - ay
        l2 = dx * dx + dy * dy
        best, bv = -1, Fraction(-1)
        for k in range(i + 1, j):
            sx, sy = P[k][0] - ax, P[k][1] - ay
            v = (
                (sx * dy - sy * dx) ** 2
                if l2
                else sx * sx + sy * sy
            )
            if v > bv:
                best, bv = k, v
        if (bv if l2 == 0 else bv) <= (t2 * l2 if l2 else t2):
            return
        keep[best] = True
        rec(i, best)
        rec(best, j)

    rec(0, n - 1)
    return keep


@pytest.mark.parametrize("seed", range(12))
def test_dp_mask_matches_exact_reference(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 40))
    pts = rng.integers(-100, 100, size=(n, 2)).astype(np.float64)
    for tol in (0.0, 1.0, 2.5, 7.0, 50.0):
        got = dp_keep_mask(pts, tol)
        want = ref_dp_mask(pts, Fraction(tol))
        assert (got == want).all(), (seed, tol)


def test_dp_duplicate_endpoint_degenerate_chord():
    # closed sub-loop: chord length 0 falls back to point distance
    pts = np.array(
        [[0, 0], [5, 1], [10, 0], [5, -1], [0, 0]], dtype=np.float64
    )
    got = dp_keep_mask(pts, 2.0)
    want = ref_dp_mask(pts, 2)
    assert (got == want).all()
    # the far vertex (10,0) must survive: it is 10 from the endpoints
    assert got[2]


def test_collinear_chain_collapses_to_endpoints():
    pts = np.column_stack(
        [np.arange(10.0), np.zeros(10)]
    )
    keep = dp_keep_mask(pts, 0.0)
    assert keep[0] and keep[-1] and keep.sum() == 2


def test_simplify_ring_drops_degenerate():
    assert simplify_ring(np.zeros((2, 2)), 1.0) is None
    # all vertices coincide
    assert simplify_ring(np.ones((5, 2)), 1.0) is None
    # a flat (zero-area) ring collapses below 3 vertices
    flat = np.array([[0, 0], [5, 0], [10, 0]], dtype=np.float64)
    assert simplify_ring(flat, 1.0) is None


def _bumped_square(S: int, h: tuple[int, int, int, int]) -> np.ndarray:
    h1, h2, h3, h4 = h
    return np.array(
        [
            [0, 0],
            [S // 2, -h1],
            [S, 0],
            [S + h2, S // 2],
            [S, S],
            [S // 2, S + h3],
            [0, S],
            [-h4, S // 2],
        ],
        dtype=np.float64,
    )


@pytest.mark.parametrize(
    "h", [(0, 0, 0, 0), (3, 0, 5, 2), (2, 2, 2, 2), (5, 5, 5, 5),
          (1, 4, 0, 3)]
)
def test_bumped_square_analytic(h):
    """The fixture behind the `simplify` oracle: bump i survives
    tol=2.0 iff h_i >= 3 (distance == tol is dropped: strict >)."""
    S = 120
    out = simplify_ring(_bumped_square(S, h), 2.0)
    kept = [hi for hi in h if hi >= 3]
    assert out is not None and len(out) == 4 + len(kept)
    area = ring_signed_area(out)
    assert area == S * S + sum(S * hi // 2 for hi in kept)


def test_simplify_geom_drops_small_holes():
    S = 100
    shell = _bumped_square(S, (0, 0, 0, 0))
    # CW unit-ish hole that DP collapses at tol=2 (all vertices within
    # tol of any chord) -> dropped entirely
    hole = np.array(
        [[50, 50], [50, 51], [51, 51], [51, 50]], dtype=np.float64
    )[::-1]
    out = simplify_geom([[shell, hole]], 2.0)
    assert len(out) == 1 and len(out[0]) == 1  # hole gone
    out2 = simplify_geom([[shell, hole]], 0.25)
    assert len(out2[0]) == 2  # survives a tighter tolerance


def test_simplify_geometries_table_roundtrip():
    rows = []
    for k, h in enumerate([(3, 0, 5, 2), (0, 0, 0, 0), (5, 5, 5, 5)]):
        rows.append(encode_multipolygon([[_bumped_square(100, h)]]))
    t = pa.table(
        {"id": pa.array([0, 1, 2]), "geometry": pa.array(rows, pa.binary())}
    )
    out = simplify_geometries(t, 2.0)
    assert out["id"].to_pylist() == [0, 1, 2]
    got = [decode_polygons(b.as_py()) for b in out["geometry"]]
    assert [len(g[0][0]) for g in got] == [6, 4, 8]


def test_simplify_geometries_dataset(ray_session):
    import ray

    rows = [
        encode_multipolygon([[_bumped_square(100, (5, 0, 0, 0))]])
        for _ in range(8)
    ]
    t = pa.table(
        {"id": pa.array(range(8)), "geometry": pa.array(rows, pa.binary())}
    )
    ds = ray.data.from_arrow(t).repartition(3)
    out = simplify_geometries(ds, 2.0).to_arrow_refs()
    tabs = pa.concat_tables([ray.get(r) for r in out])
    for b in tabs["geometry"]:
        g = decode_polygons(b.as_py())
        assert len(g[0][0]) == 5
