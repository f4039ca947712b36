"""Property-based geometry tests (hypothesis): algebraic identities
that must hold for ANY input — the strongest guard on the from-scratch
boolean kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from maup_ray.geom import (
    area,
    difference,
    intersection,
    rect,
    symmetric_difference,
    union,
)
from maup_ray.geom.clip import clip_multipolygon_convex, clip_multipolygon_rect

coord = st.integers(min_value=0, max_value=64)


@st.composite
def rects(draw):
    x0 = draw(coord)
    y0 = draw(coord)
    w = draw(st.integers(min_value=1, max_value=32))
    h = draw(st.integers(min_value=1, max_value=32))
    return rect(float(x0), float(y0), float(x0 + w), float(y0 + h))


def _hull(pts: np.ndarray) -> np.ndarray:
    """Monotone-chain convex hull (CCW, no repeated endpoint)."""
    pts = np.unique(pts, axis=0)
    if len(pts) < 3:
        return np.empty((0, 2))
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and np.cross(
                out[-1] - out[-2], p - out[-2]
            ) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


@st.composite
def convex_polys(draw):
    """Random convex polygon: TRUE convex hull of integer points
    (angle-sorting around the centroid only gives star-shaped)."""
    n = draw(st.integers(min_value=3, max_value=8))
    pts = np.array(
        [[draw(coord), draw(coord)] for _ in range(n)], dtype=float
    )
    h = _hull(pts)
    if len(h) < 3:
        return rect(0.0, 0.0, 1.0, 1.0)
    from maup_ray.geom.core import normalize_polygon

    poly = normalize_polygon([h])
    return [poly] if poly else rect(0.0, 0.0, 1.0, 1.0)


@settings(max_examples=60, deadline=None)
@given(rects(), rects())
def test_inclusion_exclusion_rects(a, b):
    ia = area(intersection(a, b))
    ua = area(union(a, b))
    assert abs(area(a) + area(b) - ua - ia) < 1e-6


@settings(max_examples=60, deadline=None)
@given(rects(), rects())
def test_difference_partition(a, b):
    # A = (A−B) ⊔ (A∩B)
    assert abs(
        area(difference(a, b)) + area(intersection(a, b)) - area(a)
    ) < 1e-6


@settings(max_examples=60, deadline=None)
@given(rects(), rects())
def test_symmetric_difference_identity(a, b):
    assert abs(
        area(symmetric_difference(a, b))
        - (area(a) + area(b) - 2 * area(intersection(a, b)))
    ) < 1e-6


@settings(max_examples=40, deadline=None)
@given(convex_polys(), rects())
def test_rect_clip_agrees_with_arrangement(p, r):
    from maup_ray.geom.core import bounds

    minx, miny, maxx, maxy = bounds(r)
    a1 = area(clip_multipolygon_rect(p, minx, miny, maxx, maxy))
    a2 = area(intersection(p, r))
    assert abs(a1 - a2) < 1e-5


@settings(max_examples=40, deadline=None)
@given(convex_polys(), convex_polys())
def test_convex_clip_agrees_with_arrangement(p, q):
    ring = q[0][0]
    a1 = area(clip_multipolygon_convex(p, ring))
    a2 = area(intersection(p, q))
    assert abs(a1 - a2) < 1e-5
