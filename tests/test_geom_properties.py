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


@st.composite
def quads(draw):
    """Random NON-degenerate convex quad around a centre (vertex angles
    well separated). Degenerate slivers with repeated vertices are
    excluded: the scalar path's dedup_ring drops them to <3 vertices
    (area exactly 0) while the batch shoelace can leave a <=1-ulp
    residue — a documented parity caveat, not a correctness issue."""
    cx, cy = draw(coord), draw(coord)
    base = draw(st.floats(0, 2 * np.pi))
    gaps = np.array(
        [draw(st.floats(0.3, 1.2)) for _ in range(4)]
    )
    angs = base + np.cumsum(gaps) / np.sum(gaps) * 2 * np.pi
    r = np.array(
        [draw(st.integers(min_value=1, max_value=20)) for _ in range(4)],
        dtype=float,
    )
    return np.stack(
        [cx + r * np.cos(angs), cy + r * np.sin(angs)], axis=1
    )


@given(st.lists(quads(), min_size=1, max_size=6), rects())
@settings(max_examples=60, deadline=None)
def test_batch_rect_area_matches_scalar(qs, r):
    from maup_ray.geom.clip import clip_area_batch_rect, pad_rings
    from maup_ray.geom.core import area, bounds

    minx, miny, maxx, maxy = bounds([r])
    P, cnt = pad_rings(qs)
    got = clip_area_batch_rect(P, cnt, minx, miny, maxx, maxy)
    for k, q in enumerate(qs):
        want = abs(area(clip_multipolygon_rect([[q]], minx, miny, maxx, maxy)))
        # clip arithmetic is expression-identical; the final shoelace
        # SUM order differs (dot vs pairwise). On near-tangent slivers
        # cancellation amplifies that to ~1e-13 abs — bound by
        # conditioning (coords<=100 here), not ulps. The dyadic oracle
        # regime is exactly equal (see the deterministic test below).
        assert abs(got[k] - want) <= 1e-9


@given(st.lists(quads(), min_size=1, max_size=6), convex_polys())
@settings(max_examples=60, deadline=None)
def test_batch_convex_area_matches_scalar(qs, ring):
    if len(ring) < 3:
        return
    from maup_ray.geom.clip import clip_area_batch_convex, pad_rings
    from maup_ray.geom.core import area

    P, cnt = pad_rings(qs)
    got = clip_area_batch_convex(P, cnt, ring)
    for k, q in enumerate(qs):
        want = abs(area(clip_multipolygon_convex([[q]], ring)))
        assert abs(got[k] - want) <= 1e-9


def test_batch_rect_exact_on_integer_rects():
    """Bit-parity claim where it matters: integer-coordinate rects
    (the oracle fixtures) — batch area == SQL greatest/least formula
    EXACTLY, every time."""
    from maup_ray.geom.clip import clip_area_batch_rect, pad_rings

    rng = np.random.RandomState(0)
    for _ in range(300):
        a0 = rng.randint(0, 40, 2)
        w = rng.randint(1, 10, 2)
        src = np.array(
            [
                [a0[0], a0[1]],
                [a0[0] + w[0], a0[1]],
                [a0[0] + w[0], a0[1] + w[1]],
                [a0[0], a0[1] + w[1]],
            ],
            dtype=float,
        )
        b0 = rng.randint(0, 40, 2)
        v = rng.randint(1, 10, 2)
        P, c = pad_rings([src])
        got = clip_area_batch_rect(
            P, c, float(b0[0]), float(b0[1]),
            float(b0[0] + v[0]), float(b0[1] + v[1]),
        )[0]
        want = max(
            0, min(a0[0] + w[0], b0[0] + v[0]) - max(a0[0], b0[0])
        ) * max(0, min(a0[1] + w[1], b0[1] + v[1]) - max(a0[1], b0[1]))
        assert got == float(want)
