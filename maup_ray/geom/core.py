"""Core geometry representation and measures — pure numpy, no GEOS.

From-scratch kernels re-expressing the semantics the reference gets from
shapely (see /root/reference/maup/indexed_geometries.py, repair.py). The
canonical in-memory geometry is::

    MultiPolygon = list[Polygon]
    Polygon      = list[Ring]          # ring 0 = shell, rings 1.. = holes
    Ring         = np.ndarray (k, 2)   # float64, NOT closed (no repeated
                                       # first==last vertex internally)

Shells are normalized counter-clockwise (positive signed area), holes
clockwise, so ``area()`` is a plain sum of signed ring areas.

Lines are ``list[np.ndarray (k,2)]`` (MultiLineString), points an
``np.ndarray (k,2)`` (MultiPoint).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "ring_signed_area",
    "ring_length",
    "normalize_polygon",
    "area",
    "length",
    "bounds",
    "bounds_many",
    "perimeter",
    "snap_ring",
    "snap_geom",
    "dedup_ring",
    "dedup_geom",
    "representative_point",
    "num_vertices",
    "ensure_multi",
    "rect",
]

Ring = np.ndarray
Polygon = list  # list[Ring]
MultiPolygon = list  # list[Polygon]


def ring_signed_area(ring: Ring) -> float:
    """Shoelace signed area of an unclosed ring. CCW > 0.

    Exact in float64 when coordinates are integer-valued (or small
    dyadic rationals) within 2^26 — the property the SQL-oracle fixtures
    rely on (SURVEY.md §7.1 robustness note).
    """
    if len(ring) < 3:
        return 0.0
    x = ring[:, 0]
    y = ring[:, 1]
    # Shoelace without np.roll allocations (hot path). MUST stay
    # BLAS-free: `x @ y` routes to OpenBLAS ddot whose partial-sum
    # order depends on the HOST's dispatched kernel (SKYLAKEX vs
    # HASWELL vs generic give last-ulp-different sums on non-dyadic
    # coordinates — observed flipping pinned repair hashes across
    # sandbox hosts). np.sum's pairwise tree is architecture-
    # independent (verified bit-identical across the full
    # NPY_DISABLE_CPU_FEATURES range and all OPENBLAS_CORETYPEs).
    s = float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
    s += float(x[-1]) * float(y[0]) - float(x[0]) * float(y[-1])
    return s * 0.5


def ring_length(ring: Ring, closed: bool = True) -> float:
    if len(ring) < 2:
        return 0.0
    pts = np.vstack([ring, ring[:1]]) if closed else ring
    d = np.diff(pts, axis=0)
    return float(np.sum(np.hypot(d[:, 0], d[:, 1])))


def dedup_ring(ring: Ring) -> Ring:
    """Drop consecutive duplicate vertices (ref: repair.py:397-424).
    Returns the INPUT array untouched when clean (hot-path no-copy)."""
    if len(ring) == 0:
        return ring
    keep = np.any(ring[1:] != ring[:-1], axis=1)
    clean = bool(keep.all()) and not np.array_equal(ring[-1], ring[0])
    if clean:
        return ring
    mask = np.empty(len(ring), dtype=bool)
    mask[0] = True
    mask[1:] = keep
    out = ring[mask]
    # drop trailing vertex equal to the first (unclosed convention)
    while len(out) > 1 and np.all(out[-1] == out[0]):
        out = out[:-1]
    return out


def normalize_polygon(poly: Polygon) -> Polygon:
    """Force shell CCW, holes CW; drop degenerate (<3 vertex) rings."""
    out = []
    for i, ring in enumerate(poly):
        ring = dedup_ring(np.asarray(ring, dtype=np.float64))
        if len(ring) < 3:
            if i == 0:
                return []
            continue
        sa = ring_signed_area(ring)
        if i == 0:
            if sa < 0:
                ring = ring[::-1].copy()
        else:
            if sa > 0:
                ring = ring[::-1].copy()
        out.append(ring)
    return out


def ensure_multi(geom) -> MultiPolygon:
    """Accept Polygon or MultiPolygon, return MultiPolygon."""
    if not geom:
        return []
    if isinstance(geom[0], np.ndarray):
        return [geom]
    return geom


def area(geom: MultiPolygon) -> float:
    geom = ensure_multi(geom)
    total = 0.0
    for poly in geom:
        for ring in poly:
            total += ring_signed_area(ring)
    return total


def length(geom) -> float:
    """Boundary length. Accepts MultiPolygon or MultiLine."""
    if not geom:
        return 0.0
    if isinstance(geom[0], np.ndarray):  # list of rings or lines
        # ambiguous: treat as lines (open)
        return sum(ring_length(g, closed=False) for g in geom)
    return sum(
        ring_length(ring, closed=True) for poly in geom for ring in poly
    )


def perimeter(geom: MultiPolygon) -> float:
    geom = ensure_multi(geom)
    return sum(ring_length(r, closed=True) for p in geom for r in p)


def bounds(geom) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy) over any nesting of (k,2) arrays."""
    arrs = _flatten_arrays(geom)
    if not arrs:
        return (np.inf, np.inf, -np.inf, -np.inf)
    minx = min(float(a[:, 0].min()) for a in arrs)
    miny = min(float(a[:, 1].min()) for a in arrs)
    maxx = max(float(a[:, 0].max()) for a in arrs)
    maxy = max(float(a[:, 1].max()) for a in arrs)
    return (minx, miny, maxx, maxy)


def bounds_many(geoms) -> np.ndarray:
    """(n,4) bbox array for a sequence of geometries."""
    out = np.empty((len(geoms), 4), dtype=np.float64)
    for i, g in enumerate(geoms):
        out[i] = bounds(g)
    return out


def _flatten_arrays(geom) -> list[np.ndarray]:
    if geom is None:
        return []
    if isinstance(geom, np.ndarray):
        return [geom.reshape(-1, 2)] if geom.size else []
    out = []
    for g in geom:
        out.extend(_flatten_arrays(g))
    return out


def snap_ring(ring: Ring, grid: float) -> Ring:
    """Round coordinates to multiples of ``grid`` (ref: repair.py:427-439
    rounds to 10**n; we take the grid size directly)."""
    return np.round(ring / grid) * grid


def snap_geom(geom, grid: float):
    if geom is None or len(geom) == 0:
        return geom
    if isinstance(geom, np.ndarray):
        return snap_ring(geom, grid)
    return [snap_geom(g, grid) for g in geom]


def dedup_geom(geom):
    """remove_repeated_vertices over a MultiPolygon (ref: repair.py:242-249)."""
    geom = ensure_multi(geom)
    out = []
    for poly in geom:
        p = normalize_polygon([dedup_ring(r) for r in poly])
        if p:
            out.append(p)
    return out


def num_vertices(geom) -> int:
    return sum(len(a) for a in _flatten_arrays(geom))


def representative_point(geom: MultiPolygon) -> tuple[float, float]:
    """A point strictly inside the (multi)polygon.

    Scanline at a y midway between distinct shell vertex y-values
    (ref pattern: shapely representative_point; used by
    smart_repair.py:626-629 for piece→region tagging).
    """
    from .pip import point_in_polygon  # local import to avoid cycle

    geom = ensure_multi(geom)
    for poly in geom:
        shell = poly[0]
        ys = np.unique(shell[:, 1])
        if len(ys) == 1:
            continue
        # midpoints between consecutive distinct y values
        for ymid in (ys[:-1] + ys[1:]) * 0.5:
            xs = _ring_x_crossings(poly, ymid)
            if len(xs) >= 2:
                xs.sort()
                # midpoint of first inside interval
                for a, b in zip(xs[::2], xs[1::2]):
                    if b > a:
                        cand = ((a + b) * 0.5, ymid)
                        if point_in_polygon(
                            np.array([cand]), poly
                        )[0]:
                            return cand
    # fallback: centroid of first shell
    shell = geom[0][0]
    return (float(shell[:, 0].mean()), float(shell[:, 1].mean()))


def _ring_x_crossings(poly: Polygon, y: float) -> list[float]:
    xs = []
    for ring in poly:
        x0, y0 = ring[:, 0], ring[:, 1]
        x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
        crosses = (y0 > y) != (y1 > y)
        if crosses.any():
            t = (y - y0[crosses]) / (y1[crosses] - y0[crosses])
            xs.extend((x0[crosses] + t * (x1[crosses] - x0[crosses])).tolist())
    return xs


def rect(minx: float, miny: float, maxx: float, maxy: float) -> MultiPolygon:
    """Axis-aligned rectangle as a MultiPolygon (CCW shell)."""
    return [
        [
            np.array(
                [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy]],
                dtype=np.float64,
            )
        ]
    ]
