"""Axis-aligned rectangle clipping (Sutherland–Hodgman) and segment
intersection primitives.

The rect-clip path is the scale hot path: cell tiles and the SQL-oracle
district fixtures are axis-aligned, and clipping against them produces
exact coordinates (only min/max, no division) so areas match DuckDB's
interval-overlap formula bit-for-bit (SURVEY.md §7.1).
"""

from __future__ import annotations

import numpy as np

from .core import MultiPolygon, ensure_multi, normalize_polygon, ring_signed_area

__all__ = [
    "clip_ring_rect",
    "clip_polygon_rect",
    "clip_multipolygon_rect",
    "rect_intersection_area",
    "segment_intersections",
    "pad_rings",
    "clip_area_batch_convex",
    "clip_area_batch_rect",
    "shoelace_batch",
]


def _clip_halfplane(ring: np.ndarray, axis: int, bound: float, keep_le: bool):
    """Clip ring against x/y <= or >= bound. Returns new ring (possibly
    empty). Pure Sutherland–Hodgman; output vertices are either input
    vertices or axis-aligned interpolations."""
    if len(ring) == 0:
        return ring
    v = ring[:, axis]
    inside = v <= bound if keep_le else v >= bound
    if inside.all():
        return ring
    if not inside.any():
        return ring[:0]
    nxt = np.roll(np.arange(len(ring)), -1)
    out = []
    other = 1 - axis
    for i in range(len(ring)):
        j = nxt[i]
        if inside[i]:
            out.append(ring[i])
            if not inside[j]:
                out.append(_axis_interp(ring[i], ring[j], axis, other, bound))
        elif inside[j]:
            out.append(_axis_interp(ring[i], ring[j], axis, other, bound))
    return np.array(out, dtype=np.float64)


def _axis_interp(p, q, axis, other, bound):
    t = (bound - p[axis]) / (q[axis] - p[axis])
    r = np.empty(2)
    r[axis] = bound
    r[other] = p[other] + t * (q[other] - p[other])
    return r


def clip_ring_rect(
    ring: np.ndarray, minx: float, miny: float, maxx: float, maxy: float
) -> np.ndarray:
    ring = _clip_halfplane(ring, 0, minx, keep_le=False)
    ring = _clip_halfplane(ring, 0, maxx, keep_le=True)
    ring = _clip_halfplane(ring, 1, miny, keep_le=False)
    ring = _clip_halfplane(ring, 1, maxy, keep_le=True)
    return ring


def clip_polygon_rect(poly, minx, miny, maxx, maxy):
    """Clip a polygon-with-holes to a rect. Note Sutherland–Hodgman can
    emit degenerate zero-width bridges for concave inputs crossing the
    clip window multiple times; callers needing exact piece geometry for
    such shapes use geom.boolean.intersection instead. Areas remain
    correct (degenerate bridges have zero signed area)."""
    rings = [clip_ring_rect(r, minx, miny, maxx, maxy) for r in poly]
    return normalize_polygon([r for r in rings if len(r) >= 3])


def clip_multipolygon_rect(geom: MultiPolygon, minx, miny, maxx, maxy):
    out = []
    for poly in ensure_multi(geom):
        p = clip_polygon_rect(poly, minx, miny, maxx, maxy)
        if p and abs(sum(ring_signed_area(r) for r in p)) > 0:
            out.append(p)
    return out


def is_convex_ring(ring: np.ndarray) -> bool:
    """CCW ring convexity: all cross products non-negative."""
    if len(ring) < 3:
        return False
    d = np.roll(ring, -1, axis=0) - ring
    cr = d[:, 0] * np.roll(d[:, 1], -1) - d[:, 1] * np.roll(d[:, 0], -1)
    return bool((cr >= 0).all() or (cr <= 0).all())


def _clip_halfplane_general(ring, a, b):
    """Keep the side where cross(b-a, p-a) >= 0 (left of a→b)."""
    if len(ring) == 0:
        return ring
    d = b - a
    side = d[0] * (ring[:, 1] - a[1]) - d[1] * (ring[:, 0] - a[0])
    inside = side >= 0
    if inside.all():
        return ring
    if not inside.any():
        return ring[:0]
    out = []
    m = len(ring)
    for i in range(m):
        j = (i + 1) % m
        if inside[i]:
            out.append(ring[i])
            if not inside[j]:
                t = side[i] / (side[i] - side[j])
                out.append(ring[i] + t * (ring[j] - ring[i]))
        elif inside[j]:
            t = side[i] / (side[i] - side[j])
            out.append(ring[i] + t * (ring[j] - ring[i]))
    return np.array(out)


def clip_polygon_convex(poly, clipper_ring: np.ndarray):
    """Sutherland–Hodgman clip of a polygon-with-holes against a CCW
    convex ring — the fast path for convex (district) targets; general
    concave targets fall back to geom.boolean.intersection."""
    rings = []
    for ring in poly:
        r = ring
        m = len(clipper_ring)
        for i in range(m):
            r = _clip_halfplane_general(
                r, clipper_ring[i], clipper_ring[(i + 1) % m]
            )
            if len(r) == 0:
                break
        if len(r) >= 3:
            rings.append(r)
    return normalize_polygon(rings) if rings else []


def clip_multipolygon_convex(geom: MultiPolygon, clipper_ring: np.ndarray):
    out = []
    for poly in ensure_multi(geom):
        p = clip_polygon_convex(poly, clipper_ring)
        if p:
            out.append(p)
    return out


def rect_intersection_area(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized overlap area of two (n,4)/(m,4) bbox arrays →
    (n,m). Matches SQL greatest/least formula exactly."""
    ax1, ay1, ax2, ay2 = (a[:, i : i + 1] for i in range(4))
    bx1, by1, bx2, by2 = (b[None, :, i] for i in range(4))
    w = np.maximum(
        0.0, np.minimum(ax2, bx2) - np.maximum(ax1, bx1)
    )
    h = np.maximum(
        0.0, np.minimum(ay2, by2) - np.maximum(ay1, by1)
    )
    return w * h


def segment_intersections(
    a0: np.ndarray,
    a1: np.ndarray,
    b0: np.ndarray,
    b1: np.ndarray,
    tol: float = 0.0,
):
    """All intersection parameters between segment sets A and B.

    Returns (ia, ib, ta_lo, ta_hi, tb_lo, tb_hi) arrays: for each
    intersecting pair, the parameter interval on A and on B (point
    intersections have lo == hi; collinear overlaps a positive-length
    interval). Broadcast O(na*nb) — callers pre-filter with a grid/tree.
    """
    na, nb = len(a0), len(b0)
    if na == 0 or nb == 0:
        z = np.empty(0)
        return (
            z.astype(np.int64),
            z.astype(np.int64),
            z,
            z,
            z,
            z,
        )
    A0 = a0[:, None, :]
    A1 = a1[:, None, :]
    B0 = b0[None, :, :]
    B1 = b1[None, :, :]
    r = A1 - A0  # direction of A
    s = B1 - B0
    qp = B0 - A0
    rxs = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    qpxr = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
    qpxs = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]

    out_ia, out_ib = [], []
    out_talo, out_tahi, out_tblo, out_tbhi = [], [], [], []

    # --- proper / touching point intersections (non-parallel) ---
    nonpar = np.abs(rxs) > tol
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(nonpar, qpxs / rxs, np.nan)  # param on A
        u = np.where(nonpar, qpxr / rxs, np.nan)  # param on B
    eps = 1e-12
    hit = nonpar & (t >= -eps) & (t <= 1 + eps) & (u >= -eps) & (u <= 1 + eps)
    ia, ib = np.nonzero(hit)
    if len(ia):
        tc = np.clip(t[ia, ib], 0.0, 1.0)
        uc = np.clip(u[ia, ib], 0.0, 1.0)
        out_ia.append(ia)
        out_ib.append(ib)
        out_talo.append(tc)
        out_tahi.append(tc)
        out_tblo.append(uc)
        out_tbhi.append(uc)

    # --- collinear overlaps ---
    rlen2 = (r[..., 0] ** 2 + r[..., 1] ** 2)
    coll = (~nonpar) & (np.abs(qpxr) <= tol + 1e-9 * np.sqrt(rlen2))
    if coll.any():
        ia, ib = np.nonzero(coll)
        rr = r[ia, 0, :] if r.shape[1] == 1 else a1[ia] - a0[ia]
        rl2 = (rr**2).sum(axis=1)
        good = rl2 > 0
        ia, ib, rr, rl2 = ia[good], ib[good], rr[good], rl2[good]
        t0 = ((b0[ib] - a0[ia]) * rr).sum(axis=1) / rl2
        t1 = ((b1[ib] - a0[ia]) * rr).sum(axis=1) / rl2
        lo = np.minimum(t0, t1)
        hi = np.maximum(t0, t1)
        lo_c = np.clip(lo, 0.0, 1.0)
        hi_c = np.clip(hi, 0.0, 1.0)
        overlap = hi_c >= lo_c - 1e-12
        ia, ib, lo_c, hi_c = ia[overlap], ib[overlap], lo_c[overlap], hi_c[overlap]
        lo_raw, hi_raw = lo[overlap], hi[overlap]
        if len(ia):
            # map A-interval back to B parameters
            with np.errstate(divide="ignore", invalid="ignore"):
                denom = hi_raw - lo_raw
                denom = np.where(denom == 0, 1.0, denom)
                u_lo = (lo_c - lo_raw) / denom
                u_hi = (hi_c - lo_raw) / denom
            # orientation of B relative to A
            flip = ((b1[ib] - b0[ib]) * rr).sum(axis=1) < 0
            tb_lo = np.where(flip, 1.0 - u_hi, u_lo)
            tb_hi = np.where(flip, 1.0 - u_lo, u_hi)
            out_ia.append(ia)
            out_ib.append(ib)
            out_talo.append(lo_c)
            out_tahi.append(hi_c)
            out_tblo.append(np.clip(tb_lo, 0, 1))
            out_tbhi.append(np.clip(tb_hi, 0, 1))

    if not out_ia:
        z = np.empty(0)
        return (
            z.astype(np.int64),
            z.astype(np.int64),
            z,
            z,
            z,
            z,
        )
    return (
        np.concatenate(out_ia),
        np.concatenate(out_ib),
        np.concatenate(out_talo),
        np.concatenate(out_tahi),
        np.concatenate(out_tblo),
        np.concatenate(out_tbhi),
    )


# ------------------------------------------------- batched clip kernels
#
# Vectorized Sutherland–Hodgman over MANY single-ring polygons at once
# (the assign/intersections phase-b hot path — VERDICT r1 #9). Each
# per-element operation uses the SAME IEEE expressions as the scalar
# kernels above (_axis_interp / _clip_halfplane_general), so results
# are bit-identical to the per-pair path; only the loop moves from
# Python to numpy.


def pad_rings(rings) -> tuple[np.ndarray, np.ndarray]:
    """list of (k_i, 2) rings → ((n, maxk, 2) padded array, (n,) counts).
    Padding repeats the last vertex (harmless: zero-length edges emit
    nothing under S-H and contribute 0 to shoelace)."""
    n = len(rings)
    cnt = np.array([len(r) for r in rings], dtype=np.int64)
    maxk = int(cnt.max()) if n else 0
    P = np.zeros((n, maxk, 2), dtype=np.float64)
    for i, r in enumerate(rings):
        P[i, : len(r)] = r
        if len(r) < maxk and len(r):
            P[i, len(r):] = r[len(r) - 1]
    return P, cnt


def _halfplane_batch(P, cnt, side, return_cross=False):
    """Shared S-H emission step: given precomputed signed side values
    (n, V) (>=0 inside), build the clipped (n, V', 2) array + counts.
    Intersection points use t = side_i / (side_i - side_j) with
    p + t*(q - p) — identical to the scalar kernels. With
    ``return_cross`` also returns the (n, V') mask of slots that hold
    newly-emitted crossing points."""
    n, V, _ = P.shape
    if n == 0 or V == 0:
        if return_cross:
            return P, cnt, np.zeros((n, V), dtype=bool)
        return P, cnt
    slots = np.broadcast_to(np.arange(V)[None, :], (n, V))
    valid = slots < cnt[:, None]
    inside = (side >= 0) & valid
    nxt = np.where(slots + 1 >= cnt[:, None], 0, slots + 1)
    in_j = np.take_along_axis(inside, nxt, axis=1)
    side_j = np.take_along_axis(side, nxt, axis=1)
    Pj = np.take_along_axis(P, nxt[..., None], axis=1)
    emit_v = inside
    emit_x = (inside != in_j) & valid
    with np.errstate(divide="ignore", invalid="ignore"):
        t = side / (side - side_j)
    emit_counts = emit_v.astype(np.int64) + emit_x.astype(np.int64)
    out_cnt = emit_counts.sum(axis=1)
    maxout = int(out_cnt.max()) if n else 0
    newP = np.zeros((n, max(maxout, 1), 2), dtype=np.float64)
    pos = np.cumsum(emit_counts, axis=1) - emit_counts
    cross = np.zeros(newP.shape[:2], dtype=bool)
    rows, cols = np.nonzero(emit_v)
    if len(rows):
        newP[rows, pos[rows, cols]] = P[rows, cols]
    rows, cols = np.nonzero(emit_x)
    if len(rows):
        tc = t[rows, cols][:, None]
        ip = P[rows, cols] + tc * (Pj[rows, cols] - P[rows, cols])
        newP[rows, pos[rows, cols] + emit_v[rows, cols]] = ip
        cross[rows, pos[rows, cols] + emit_v[rows, cols]] = True
    # pad with last valid vertex so later passes see zero-length edges
    V2 = newP.shape[1]
    slots2 = np.broadcast_to(np.arange(V2)[None, :], (n, V2))
    last = np.maximum(out_cnt - 1, 0)
    lastP = newP[np.arange(n), last]
    padmask = slots2 >= out_cnt[:, None]
    newP[padmask] = np.repeat(
        lastP, padmask.sum(axis=1), axis=0
    )
    if return_cross:
        return newP, out_cnt, cross
    return newP, out_cnt


def _halfplane_batch_general(P, cnt, a, b):
    d0, d1 = b[0] - a[0], b[1] - a[1]
    side = d0 * (P[..., 1] - a[1]) - d1 * (P[..., 0] - a[0])
    return _halfplane_batch(P, cnt, side)


def _halfplane_batch_rows(P, cnt, a, b):
    """``_halfplane_batch_general`` with a PER-ROW clip edge: row k is
    clipped by edge a[k] → b[k] ((n,2) arrays). Zero-length edges
    (a == b) give side == 0 everywhere — an exact no-op — so padded
    per-target edge arrays clip each row by exactly its own ring. The
    per-element side expression is IEEE-identical to the shared-edge
    kernel."""
    d0 = (b[:, 0] - a[:, 0])[:, None]
    d1 = (b[:, 1] - a[:, 1])[:, None]
    side = d0 * (P[..., 1] - a[:, 1][:, None]) - d1 * (
        P[..., 0] - a[:, 0][:, None]
    )
    return _halfplane_batch(P, cnt, side)


def clip_rings_batch_convex_rows(P, cnt, A, B):
    """Clip each padded single-ring polygon by ITS OWN convex CCW ring,
    given as per-row padded edge arrays A/B (n, M, 2) — the cross-target
    generalization of ``clip_rings_batch_convex`` (clip order: edge 0,
    1, …, exactly like the per-target loop)."""
    M = A.shape[1] if len(A) else 0
    for i in range(M):
        if not len(cnt) or cnt.max() == 0:
            break
        P, cnt = _halfplane_batch_rows(P, cnt, A[:, i], B[:, i])
    return P, cnt


def clip_area_batch_convex_rows(P, cnt, A, B) -> np.ndarray:
    """Areas of (padded single-ring polygons ∩ their own convex CCW
    rings)."""
    return shoelace_batch(*clip_rings_batch_convex_rows(P, cnt, A, B))


def _halfplane_batch_axis_rows(P, cnt, axis, bound, keep_le):
    """``_halfplane_batch_axis`` with a PER-ROW bound (n,): crossing
    points are pinned to each row's own exact bound."""
    v = P[..., axis]
    side = (bound[:, None] - v) if keep_le else (v - bound[:, None])
    n, V, _ = P.shape
    if n == 0 or V == 0:
        return P, cnt
    newP, out_cnt, cross = _halfplane_batch(P, cnt, side, return_cross=True)
    av = newP[..., axis]
    rows = np.nonzero(cross)[0]
    av[cross] = bound[rows]
    newP[..., axis] = av
    return newP, out_cnt


def clip_rings_batch_rect_rows(P, cnt, bounds):
    """Clip each padded single-ring polygon by ITS OWN axis rect
    (bounds (n,4) minx,miny,maxx,maxy) — exact-pinned like the shared
    rect kernel, same axis order."""
    for axis, col, keep_le in (
        (0, 0, False),
        (0, 2, True),
        (1, 1, False),
        (1, 3, True),
    ):
        if not len(cnt) or cnt.max() == 0:
            break
        P, cnt = _halfplane_batch_axis_rows(
            P, cnt, axis, bounds[:, col], keep_le
        )
    return P, cnt


def clip_area_batch_rect_rows(P, cnt, bounds) -> np.ndarray:
    """Areas of (padded single-ring polygons ∩ their own axis rects)."""
    return shoelace_batch(*clip_rings_batch_rect_rows(P, cnt, bounds))


def _halfplane_batch_axis(P, cnt, axis, bound, keep_le):
    """Axis clip with exact bound placement: crossing points get
    coordinate == bound on the clip axis (matches _axis_interp; for
    axis-parallel subject edges the other coordinate is exact too)."""
    v = P[..., axis]
    side = (bound - v) if keep_le else (v - bound)
    n, V, _ = P.shape
    if n == 0 or V == 0:
        return P, cnt
    # generic emission, then pin the clip-axis coordinate of the
    # newly-emitted crossing points to the exact bound — same as
    # _axis_interp's r[axis] = bound (float t may wiggle otherwise)
    newP, out_cnt, cross = _halfplane_batch(P, cnt, side, return_cross=True)
    av = newP[..., axis]
    av[cross] = bound
    newP[..., axis] = av
    return newP, out_cnt


def shoelace_batch(P, cnt) -> np.ndarray:
    """Per-polygon |shoelace|/… signed area over padded rings (padding
    repeats the last vertex → zero contribution)."""
    n, V, _ = P.shape
    if n == 0 or V == 0:
        return np.zeros(n, dtype=np.float64)
    slots = np.broadcast_to(np.arange(V)[None, :], (n, V))
    nxt = np.where(slots + 1 >= cnt[:, None], 0, slots + 1)
    X = P[..., 0]
    Y = P[..., 1]
    Xj = np.take_along_axis(X, nxt, axis=1)
    Yj = np.take_along_axis(Y, nxt, axis=1)
    valid = slots < cnt[:, None]
    terms = np.where(valid, X * Yj - Xj * Y, 0.0)
    s = 0.5 * terms.sum(axis=1)
    out = np.abs(s)
    out[cnt < 3] = 0.0
    return out


def clip_rings_batch_convex(P, cnt, clipper_ring: np.ndarray):
    """Clipped rings of (padded single-ring polygons ∩ CCW convex
    ring) → (P', cnt')."""
    m = len(clipper_ring)
    for i in range(m):
        if not len(cnt) or cnt.max() == 0:
            break
        P, cnt = _halfplane_batch_general(
            P, cnt, clipper_ring[i], clipper_ring[(i + 1) % m]
        )
    return P, cnt


def clip_rings_batch_rect(P, cnt, minx, miny, maxx, maxy):
    """Clipped rings of (padded single-ring polygons ∩ axis rect) —
    exact for axis-aligned subjects (crossing coords pinned to the
    bounds) → (P', cnt')."""
    for axis, bound, keep_le in (
        (0, minx, False),
        (0, maxx, True),
        (1, miny, False),
        (1, maxy, True),
    ):
        if not len(cnt) or cnt.max() == 0:
            break
        P, cnt = _halfplane_batch_axis(P, cnt, axis, bound, keep_le)
    return P, cnt


def perimeter_batch(P, cnt) -> np.ndarray:
    """Per-polygon boundary length over padded rings (padding repeats
    the last vertex → zero-length edges contribute nothing)."""
    n, V, _ = P.shape
    if n == 0 or V == 0:
        return np.zeros(n, dtype=np.float64)
    slots = np.broadcast_to(np.arange(V)[None, :], (n, V))
    nxt = np.where(slots + 1 >= cnt[:, None], 0, slots + 1)
    Pj = np.take_along_axis(P, nxt[..., None], axis=1)
    d = Pj - P
    L = np.hypot(d[..., 0], d[..., 1])
    valid = slots < cnt[:, None]
    out = np.where(valid, L, 0.0).sum(axis=1)
    out[cnt < 3] = 0.0
    return out


def clip_area_batch_convex(P, cnt, clipper_ring: np.ndarray) -> np.ndarray:
    """Areas of (padded single-ring polygons ∩ CCW convex ring)."""
    return shoelace_batch(*clip_rings_batch_convex(P, cnt, clipper_ring))


def clip_area_batch_rect(P, cnt, minx, miny, maxx, maxy) -> np.ndarray:
    """Areas of (padded single-ring polygons ∩ axis rect) — exact for
    axis-aligned subjects (crossing coords pinned to the bounds)."""
    return shoelace_batch(
        *clip_rings_batch_rect(P, cnt, minx, miny, maxx, maxy)
    )
