"""Point-in-polygon and covers predicates — vectorized numpy.

Replaces shapely ``prep(geometry).covers`` / STRtree refinement used by
the reference (indexed_geometries.py:38, :58-71).
"""

from __future__ import annotations

import numpy as np

from .core import ensure_multi

__all__ = [
    "points_in_ring",
    "points_on_ring",
    "point_in_polygon",
    "points_in_multipolygon",
    "covers",
]


def _crossing_counts(pts: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray-casting crossing count (ray to +x) for (n,2) pts vs
    one unclosed ring. Vectorized n_points × n_edges."""
    x = pts[:, 0:1]  # (n,1)
    y = pts[:, 1:2]
    x0, y0 = ring[:, 0], ring[:, 1]  # (m,)
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    # edge straddles the horizontal line through y (half-open in y)
    straddle = (y0 > y) != (y1 > y)  # (n,m)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (y - y0) / (y1 - y0)
        xint = x0 + t * (x1 - x0)
    cross = straddle & (x < xint)
    return cross.sum(axis=1)


def points_on_ring(
    pts: np.ndarray, ring: np.ndarray, eps: float = 0.0
) -> np.ndarray:
    """True where a point lies on the ring boundary (within eps)."""
    x = pts[:, 0:1]
    y = pts[:, 1:2]
    x0, y0 = ring[:, 0], ring[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    dx, dy = x1 - x0, y1 - y0
    L2 = dx * dx + dy * dy
    # projection parameter clamped to [0,1]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((x - x0) * dx + (y - y0) * dy) / np.where(L2 == 0, 1.0, L2)
    t = np.clip(t, 0.0, 1.0)
    px = x0 + t * dx
    py = y0 + t * dy
    d2 = (x - px) ** 2 + (y - py) ** 2
    return (d2 <= eps * eps).any(axis=1)


def point_in_polygon(
    pts: np.ndarray, poly, include_boundary: bool = True, eps: float = 0.0
) -> np.ndarray:
    """Membership of points in a single polygon-with-holes.

    Even-odd over all rings (shell + holes share the parity trick).
    ``include_boundary`` adds an explicit on-segment test — needed for
    covers semantics. Without it the result follows the half-open
    ray-casting convention (points on lower/left edges count inside,
    upper/right outside) — which is exactly the each-point-in-exactly-
    one-tile property cell assignment needs; truly off-boundary points
    (image points are offset +0.5 off any integer boundary) are exact.
    """
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    counts = np.zeros(len(pts), dtype=np.int64)
    for ring in poly:
        counts += _crossing_counts(pts, ring)
    inside = (counts % 2) == 1
    if include_boundary:
        on = np.zeros(len(pts), dtype=bool)
        for ring in poly:
            on |= points_on_ring(pts, ring, eps)
        inside |= on
    return inside


def points_in_multipolygon(
    pts: np.ndarray, geom, include_boundary: bool = True, eps: float = 0.0
) -> np.ndarray:
    geom = ensure_multi(geom)
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    out = np.zeros(len(pts), dtype=bool)
    for poly in geom:
        out |= point_in_polygon(pts, poly, include_boundary, eps)
    return out


def _segments(geom) -> tuple[np.ndarray, np.ndarray]:
    """All boundary segments of a MultiPolygon as (p0[n,2], p1[n,2])."""
    p0s, p1s = [], []
    for poly in ensure_multi(geom):
        for ring in poly:
            p0s.append(ring)
            p1s.append(np.roll(ring, -1, axis=0))
    if not p0s:
        z = np.empty((0, 2))
        return z, z
    return np.vstack(p0s), np.vstack(p1s)


def _proper_crossings(a_geom, b_geom) -> bool:
    """True if any boundary segment of A properly crosses one of B
    (transversal interior intersection — not mere touching)."""
    a0, a1 = _segments(a_geom)
    b0, b1 = _segments(b_geom)
    if len(a0) == 0 or len(b0) == 0:
        return False
    # orientation tests, broadcast (na, nb)
    def cross(o, p, q):
        return (p[..., 0] - o[..., 0]) * (q[..., 1] - o[..., 1]) - (
            p[..., 1] - o[..., 1]
        ) * (q[..., 0] - o[..., 0])

    A0 = a0[:, None, :]
    A1 = a1[:, None, :]
    B0 = b0[None, :, :]
    B1 = b1[None, :, :]
    d1 = cross(A0, A1, B0)
    d2 = cross(A0, A1, B1)
    d3 = cross(B0, B1, A0)
    d4 = cross(B0, B1, A1)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (
        (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
    )
    return bool(proper.any())


def covers(target_geom, source_geom, eps: float = 1e-12) -> bool:
    """target covers source (source ⊆ target), both MultiPolygons.

    Sufficient test for well-formed inputs: every source vertex is
    inside-or-on target, no proper boundary crossing, and a source
    representative interior point is inside target (guards against the
    source sitting in a hole of the target). Mirrors the semantics of
    ``prep(target).covers(source)`` at indexed_geometries.py:58-71.
    """
    from .core import representative_point

    source_geom = ensure_multi(source_geom)
    target_geom = ensure_multi(target_geom)
    if not source_geom or not target_geom:
        return False
    verts = np.vstack(
        [ring for poly in source_geom for ring in poly]
    )
    if not points_in_multipolygon(verts, target_geom, True, eps).all():
        return False
    if _proper_crossings(source_geom, target_geom):
        return False
    for poly in source_geom:
        rp = representative_point([poly])
        if not points_in_multipolygon(
            np.array([rp]), target_geom, True, eps
        )[0]:
            return False
    return True
