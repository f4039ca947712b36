"""Douglas–Peucker geometry simplification — pure numpy, per-row.

Beyond-reference geospatial operator (the reference has no simplify;
shapely users call ``geom.simplify``). Semantics follow the classic
DP recursion: keep a sub-chain's farthest point iff its perpendicular
line distance from the chord exceeds ``tol``, recurse on both sides.
Rings are anchored at vertex 0 and the vertex farthest from it (the
standard ring adaptation), then each half is simplified as an open
chain; rings left with < 3 vertices are dropped (a shell drop removes
the polygon, holes drop individually).

Exactness: every comparison is ``cross² > tol²·|chord|²`` evaluated in
float64 — exact (and therefore host/partition-invariant) whenever
coordinates are integers with |cross| < 2^26, the same discipline as
``geom.core.ring_signed_area``. Distance ranking within one chord
shares the denominator, so ranking by cross² alone is exact ranking by
distance.

Scale shape (100 TB): one stateless task-mode map_batches — rows are
independent, nothing shuffles, payload never leaves the stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.wkb import decode_polygons, encode_multipolygon

__all__ = ["dp_keep_mask", "simplify_ring", "simplify_geom",
           "simplify_geometries"]


def dp_keep_mask(pts: np.ndarray, tol: float) -> np.ndarray:
    """Keep mask for an OPEN polyline (endpoints always kept).

    Farthest-point selection uses perpendicular distance to the chord
    LINE (interior points of a max-distance run resolve to the run's
    first index, which for piecewise-linear inputs is always a
    breakpoint — signed distance is affine along each segment)."""
    n = len(pts)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    t2 = float(tol) * float(tol)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        a = pts[i]
        d = pts[j] - a
        seg = pts[i + 1 : j] - a
        l2 = float(d[0] * d[0] + d[1] * d[1])
        if l2 == 0.0:
            # degenerate chord (closed sub-loop): plain point distance
            d2 = seg[:, 0] * seg[:, 0] + seg[:, 1] * seg[:, 1]
            k = int(np.argmax(d2))
            if float(d2[k]) <= t2:
                continue
        else:
            c = seg[:, 0] * d[1] - seg[:, 1] * d[0]
            c2 = c * c
            k = int(np.argmax(c2))
            if float(c2[k]) <= t2 * l2:
                continue
        k += i + 1
        keep[k] = True
        stack.append((k, j))
        stack.append((i, k))
    return keep


def simplify_ring(ring: np.ndarray, tol: float) -> np.ndarray | None:
    """Simplify an unclosed ring; None if < 3 vertices survive."""
    n = len(ring)
    if n < 3:
        return None
    rel = ring - ring[0]
    f = int(np.argmax(rel[:, 0] * rel[:, 0] + rel[:, 1] * rel[:, 1]))
    if f == 0:  # all vertices coincide
        return None
    closed = np.vstack([ring, ring[:1]])
    keep = np.zeros(n, dtype=bool)
    k1 = dp_keep_mask(closed[: f + 1], tol)
    keep[: f + 1] |= k1
    k2 = dp_keep_mask(closed[f:], tol)
    idx2 = (np.arange(f, n + 1)[k2]) % n
    keep[idx2] = True
    out = ring[keep]
    return out if len(out) >= 3 else None


def simplify_geom(geom, tol: float):
    """MultiPolygon (geom.core convention) → simplified MultiPolygon."""
    out = []
    for poly in geom:
        shell = simplify_ring(np.asarray(poly[0], dtype=np.float64), tol)
        if shell is None:
            continue
        rings = [shell]
        for hole in poly[1:]:
            h = simplify_ring(np.asarray(hole, dtype=np.float64), tol)
            if h is not None:
                rings.append(h)
        out.append(rings)
    return out


def simplify_geometries(obj, tol: float, geometry_col: str = "geometry"):
    """Dataset/Table stage: DP-simplify every row's WKB geometry."""

    def apply(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch[geometry_col]:
            g = decode_polygons(b.as_py())
            out.append(encode_multipolygon(simplify_geom(g, tol)))
        i = batch.column_names.index(geometry_col)
        return batch.set_column(
            i, geometry_col, pa.array(out, type=pa.binary())
        )

    if isinstance(obj, pa.Table):
        return apply(obj)
    return obj.map_batches(
        apply, batch_format="pyarrow", zero_copy_batch=True
    )
