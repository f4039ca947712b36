"""Exact (rational-arithmetic) overlap evidence for hairline slivers.

The boolean engine snaps to a power-of-two grid (``boolean.py``), so
genuine sub-grid-width overlaps in dirty real-world inputs either get
widened to one grid cell or collapse to a shared boundary, and weld
artifacts can appear where boundaries merely touch. No grid
refinement distinguishes the two — a genuinely sub-cell overlap
vanishes on a finer grid exactly like an artifact does (observed on
the Denver 2020 *orig* corpus, whose 27 published hairline overlaps
all die under tol/64 refinement).

The discriminator that works is exact geometry on the UN-snapped
float coordinates — every float is an exact rational, so orientation
signs computed with ``fractions.Fraction`` are exact. Evidence that
``interior(A) ∩ interior(B) ≠ ∅``:

* a PROPER boundary crossing (strict sign change on both supporting
  lines),
* a vertex of one strictly interior to the other,
* an edge MIDPOINT of one strictly interior to the other (covers
  collinear-edge overlaps — e.g. two rectangles overlapping along an
  axis — where every crossing is degenerate and every vertex lies ON
  the other's boundary).

Each evidence point sits on one polygon's boundary with interior on
one side, so an interior-interior point exists arbitrarily close to
it: the evidence is sound. (It is not a complete decision procedure
in adversarial arrangements where the overlap's witnesses are all
vertex-on-vertex degeneracies, but real corpora don't do that — the
Denver counts reproduce exactly.)

Cost discipline: all candidate generation and the first-pass sign
tests are vectorized float64 with a forward error bound; Fraction
arithmetic runs only on candidates the float pass cannot decide
(exactly-collinear contacts, where the float det is 0 ± err). A weld
artifact's shared border produces exact-zero dets, which Fraction
confirms in O(1) per edge pair.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

__all__ = ["overlap_evidence"]

_U = 2.0**-52  # conservative unit-roundoff multiple for the bounds


def _orient_exact(ax, ay, bx, by, cx, cy) -> int:
    """Exact sign of cross(b - a, c - a); inputs float or Fraction."""
    d = (Fraction(bx) - Fraction(ax)) * (Fraction(cy) - Fraction(ay)) - (
        Fraction(by) - Fraction(ay)
    ) * (Fraction(cx) - Fraction(ax))
    return (d > 0) - (d < 0)


def _edges(geom):
    e0, e1 = [], []
    for poly in geom:
        for ring in poly:
            r = np.asarray(ring, dtype=np.float64)
            if len(r) >= 2:
                e0.append(r)
                e1.append(np.roll(r, -1, axis=0))
    if not e0:
        z = np.empty((0, 2), dtype=np.float64)
        return z, z
    return np.vstack(e0), np.vstack(e1)


def _verts(geom):
    vs = [
        np.asarray(ring, dtype=np.float64)
        for poly in geom
        for ring in poly
    ]
    return np.vstack(vs) if vs else np.empty((0, 2), dtype=np.float64)


def _in_box(p0, p1, box):
    lox = np.minimum(p0[:, 0], p1[:, 0])
    hix = np.maximum(p0[:, 0], p1[:, 0])
    loy = np.minimum(p0[:, 1], p1[:, 1])
    hiy = np.maximum(p0[:, 1], p1[:, 1])
    return (
        (hix >= box[0]) & (lox <= box[2]) & (hiy >= box[1]) & (loy <= box[3])
    )


def _orient_batch(a, b, c):
    """(det, err) of cross(b-a, c-a) per row — float64 with a forward
    error bound; |true - det| <= err."""
    ux, uy = b[:, 0] - a[:, 0], b[:, 1] - a[:, 1]
    vx, vy = c[:, 0] - a[:, 0], c[:, 1] - a[:, 1]
    det = ux * vy - uy * vx
    err = 4.0 * _U * (np.abs(ux * vy) + np.abs(uy * vx) + 1e-300)
    return det, err


def _proper_crossing(a0, a1, b0, b1) -> bool:
    """Any PROPER crossing between edge set a and edge set b."""
    if not len(a0) or not len(b0):
        return False
    alox = np.minimum(a0[:, 0], a1[:, 0])[:, None]
    ahix = np.maximum(a0[:, 0], a1[:, 0])[:, None]
    aloy = np.minimum(a0[:, 1], a1[:, 1])[:, None]
    ahiy = np.maximum(a0[:, 1], a1[:, 1])[:, None]
    blox = np.minimum(b0[:, 0], b1[:, 0])[None, :]
    bhix = np.maximum(b0[:, 0], b1[:, 0])[None, :]
    bloy = np.minimum(b0[:, 1], b1[:, 1])[None, :]
    bhiy = np.maximum(b0[:, 1], b1[:, 1])[None, :]
    ii, jj = np.nonzero(
        (ahix >= blox) & (alox <= bhix) & (ahiy >= bloy) & (aloy <= bhiy)
    )
    if not len(ii):
        return False
    p0, p1 = a0[ii], a1[ii]
    q0, q1 = b0[jj], b1[jj]
    d1, e1 = _orient_batch(p0, p1, q0)
    d2, e2 = _orient_batch(p0, p1, q1)
    d3, e3 = _orient_batch(q0, q1, p0)
    d4, e4 = _orient_batch(q0, q1, p1)
    sure = (
        (np.abs(d1) > e1)
        & (np.abs(d2) > e2)
        & (np.abs(d3) > e3)
        & (np.abs(d4) > e4)
    )
    cross_f = (d1 * d2 < 0) & (d3 * d4 < 0)
    if bool((sure & cross_f).any()):
        return True
    # only candidates the float pass could not REFUTE go exact: a
    # decisive same-sign det on either line rules the pair out, and
    # so does an exactly-shared endpoint (a proper crossing needs
    # strict sign changes; a shared endpoint pins one det to zero) —
    # which is precisely the case for every edge pair along an
    # exactly-shared border, the bulk of candidates in tiled corpora
    shared_end = (
        ((p0[:, 0] == q0[:, 0]) & (p0[:, 1] == q0[:, 1]))
        | ((p0[:, 0] == q1[:, 0]) & (p0[:, 1] == q1[:, 1]))
        | ((p1[:, 0] == q0[:, 0]) & (p1[:, 1] == q0[:, 1]))
        | ((p1[:, 0] == q1[:, 0]) & (p1[:, 1] == q1[:, 1]))
    )
    maybe = ~sure & ~shared_end & ~(
        ((d1 * d2 > 0) & (np.abs(d1) > e1) & (np.abs(d2) > e2))
        | ((d3 * d4 > 0) & (np.abs(d3) > e3) & (np.abs(d4) > e4))
    )
    for k in np.flatnonzero(maybe):
        P0, P1, Q0, Q1 = p0[k], p1[k], q0[k], q1[k]
        o1 = _orient_exact(P0[0], P0[1], P1[0], P1[1], Q0[0], Q0[1])
        o2 = _orient_exact(P0[0], P0[1], P1[0], P1[1], Q1[0], Q1[1])
        if o1 * o2 >= 0:
            continue
        o3 = _orient_exact(Q0[0], Q0[1], Q1[0], Q1[1], P0[0], P0[1])
        o4 = _orient_exact(Q0[0], Q0[1], Q1[0], Q1[1], P1[0], P1[1])
        if o3 * o4 < 0:
            return True
    return False


def _cross_exact(ax, ay, bx, by, px, py) -> Fraction:
    """Exact cross(b - a, p - a); a/b floats, p float or Fraction."""
    return (Fraction(float(bx)) - Fraction(float(ax))) * (
        Fraction(py) - Fraction(float(ay))
    ) - (Fraction(float(by)) - Fraction(float(ay))) * (
        Fraction(px) - Fraction(float(ax))
    )


def _strictly_inside(px, py, e0, e1) -> bool:
    """Exact crossing-number point-in-polygon; boundary counts as
    OUTSIDE. ``px``/``py`` may be float or Fraction (edge midpoints
    are passed as exact Fractions).

    A point ON the boundary must be rejected BEFORE parity counting:
    ray parity at a boundary point is ill-defined (a vertex of one
    polygon coinciding exactly with the other's vertex — 87% of
    vertices in real tiled corpora — would otherwise flip a coin)."""
    pxf, pyf = float(px), float(py)
    # exact on-segment rejection; candidates via bbox (a point on a
    # segment lies in its bbox; one-ulp margin absorbs the
    # Fraction→float conversion of exact midpoints) + a float
    # line-distance prefilter (only near-zero cross products go exact)
    m = 4.0 * _U * (abs(pxf) + abs(pyf) + 1.0)
    lox = np.minimum(e0[:, 0], e1[:, 0]) - m
    hix = np.maximum(e0[:, 0], e1[:, 0]) + m
    loy = np.minimum(e0[:, 1], e1[:, 1]) - m
    hiy = np.maximum(e0[:, 1], e1[:, 1]) + m
    on_cand = (pxf >= lox) & (pxf <= hix) & (pyf >= loy) & (pyf <= hiy)
    if on_cand.any():
        idx0 = np.flatnonzero(on_cand)
        a0 = e0[idx0]
        b0 = e1[idx0]
        ux0 = b0[:, 0] - a0[:, 0]
        uy0 = b0[:, 1] - a0[:, 1]
        cf0 = ux0 * (pyf - a0[:, 1]) - uy0 * (pxf - a0[:, 0])
        err0 = 16.0 * _U * (
            np.abs(ux0) * (np.abs(pyf - a0[:, 1]) + np.abs(pyf))
            + np.abs(uy0) * (np.abs(pxf - a0[:, 0]) + np.abs(pxf))
            + 1e-300
        )
        for k in np.flatnonzero(np.abs(cf0) <= err0):
            ax, ay = a0[k]
            bx, by = b0[k]
            if _cross_exact(ax, ay, bx, by, px, py) == 0:
                # on the line; inside the segment's span?
                if (
                    min(ax, bx) <= px <= max(ax, bx)
                    and min(ay, by) <= py <= max(ay, by)
                ):
                    return False  # on boundary
    straddle = (e0[:, 1] > pyf) != (e1[:, 1] > pyf)
    idx = np.flatnonzero(straddle)
    if not len(idx):
        return False
    a = e0[idx]
    b = e1[idx]
    ux = b[:, 0] - a[:, 0]
    uy = b[:, 1] - a[:, 1]
    cf = ux * (pyf - a[:, 1]) - uy * (pxf - a[:, 0])
    err = 16.0 * _U * (
        np.abs(ux) * (np.abs(pyf - a[:, 1]) + np.abs(pyf))
        + np.abs(uy) * (np.abs(pxf - a[:, 0]) + np.abs(pxf))
        + 1e-300
    )
    sure = np.abs(cf) > err
    cnt = int(np.count_nonzero(sure & ((cf > 0) == (uy > 0))))
    for k in np.flatnonzero(~sure):
        ax, ay = a[k]
        bx, by = b[k]
        c = _cross_exact(ax, ay, bx, by, px, py)
        if c != 0 and (c > 0) == (by > ay):
            cnt += 1
    return cnt % 2 == 1


def _point_evidence(pts_xy, e0, e1) -> bool:
    """Any of the (x, y) Fraction/float pairs strictly inside the
    polygon with edges (e0, e1)? Float prefilter: points decisively
    outside the polygon's bbox are skipped."""
    if not len(e0):
        return False
    for px, py in pts_xy:
        if _strictly_inside(px, py, e0, e1):
            return True
    return False


def overlap_evidence(geom_i, geom_j, box) -> bool:
    """True iff there is exact evidence that the UN-snapped
    multipolygons genuinely overlap (positive-area intersection) near
    ``box`` (minx, miny, maxx, maxy)."""
    ei0, ei1 = _edges(geom_i)
    ej0, ej1 = _edges(geom_j)
    mi = _in_box(ei0, ei1, box)
    mj = _in_box(ej0, ej1, box)
    if _proper_crossing(ei0[mi], ei1[mi], ej0[mj], ej1[mj]):
        return True
    for verts, e0loc, e1loc, other, eo0, eo1 in (
        (_verts(geom_i), ei0[mi], ei1[mi], geom_j, ej0, ej1),
        (_verts(geom_j), ej0[mj], ej1[mj], geom_i, ei0, ei1),
    ):
        if not len(eo0):
            continue
        near = (
            (verts[:, 0] >= box[0])
            & (verts[:, 0] <= box[2])
            & (verts[:, 1] >= box[1])
            & (verts[:, 1] <= box[3])
        )
        # cheap exact-match prefilters for cleanly tiled corpora,
        # where ~90% of border vertices/edges are coordinate-identical
        # across neighbours: a vertex equal to one of the other's
        # vertices is ON its boundary, and a shared edge's midpoint
        # is too — no evidence, skip the rational test outright
        overt = {(float(x), float(y)) for x, y in _verts(other)}
        oedge = set()
        for (a0, a1), (b0, b1) in zip(eo0, eo1):
            oedge.add((float(a0), float(a1), float(b0), float(b1)))
            oedge.add((float(b0), float(b1), float(a0), float(a1)))
        pts = [
            (float(x), float(y))
            for x, y in verts[near]
            if (float(x), float(y)) not in overt
        ]
        # exact midpoints of local edges ((a+b)/2 as Fractions —
        # the float midpoint may round ONTO the other boundary)
        pts += [
            (
                (Fraction(float(a0)) + Fraction(float(b0))) / 2,
                (Fraction(float(a1)) + Fraction(float(b1))) / 2,
            )
            for (a0, a1), (b0, b1) in zip(e0loc, e1loc)
            if (float(a0), float(a1), float(b0), float(b1)) not in oedge
        ]
        if _point_evidence(pts, eo0, eo1):
            return True
    return False
