"""General polygon boolean operations via planar arrangement — numpy only.

Algorithm (SURVEY.md §7.1, robustness strategy §7.3): node all boundary
segments at their pairwise intersections (including collinear-overlap
intervals — the degenerate case tessellations are full of), dedup the
resulting sub-segments into the undirected edges of a half-edge (DCEL)
subdivision, extract every atomic face as an orbit of the "cyclic
CCW-predecessor of the twin" permutation, and propagate exact even-odd
membership across the face-adjacency graph: each edge carries the
parity with which each input's boundary covers it, and crossing the
edge toggles exactly those inputs. CCW orbits are face shells, CW
orbits hole/outer cycles assigned to their containing face by a
leftward ray cast.

No membership sampling and no per-class ring stitching happen anywhere:
every half-edge has a twin, so face walks cannot dead-end, and because
each input ring stays a CLOSED node cycle under snapping/noding, the
parity propagation is always consistent. (The sampled-stitching design
this replaces silently dropped whole faces on real corpora — zero-width
ring spikes and sub-offset boundary fingers defeat any finite
side-sampling offset.)

This replaces shapely/GEOS ``intersection`` / ``union`` / ``difference``
/ ``unary_union`` used throughout the reference (intersections.py:31,
repair.py:84, repair.py:163-168, ...). Inputs snapped to a power-of-two
coordinate grid remain exact.
"""

from __future__ import annotations

import math

import numpy as np

from .core import ensure_multi, ring_signed_area
from .pip import point_in_polygon

__all__ = [
    "arrangement_regions",
    "intersection",
    "union",
    "union_all",
    "difference",
    "symmetric_difference",
    "boundary_intersection",
    "intersection_full",
    "holes",
    "holes_of_union",
]


# ---------------------------------------------------------------- noding


def _gather_segments(geoms, with_owner: bool = False):
    """All boundary segments of a list of MultiPolygons (optionally with
    the index of the input geometry each raw segment came from)."""
    p0s, p1s, owners = [], [], []
    for gi, g in enumerate(geoms):
        for poly in ensure_multi(g):
            for ring in poly:
                if len(ring) >= 2:
                    p0s.append(ring)
                    p1s.append(np.roll(ring, -1, axis=0))
                    if with_owner:
                        owners.append(
                            np.full(len(ring), gi, dtype=np.int64)
                        )
    if not p0s:
        z = np.empty((0, 2))
        if with_owner:
            return z, z, np.empty(0, np.int64)
        return z, z
    if with_owner:
        return np.vstack(p0s), np.vstack(p1s), np.concatenate(owners)
    return np.vstack(p0s), np.vstack(p1s)


def _candidate_pairs(b_a: np.ndarray, b_b: np.ndarray | None = None):
    """Grid-binned bbox-overlap candidate pairs between two segment
    bbox sets ((n,4): minx,miny,maxx,maxy). b_b=None → self pairs i<j."""
    self_join = b_b is None
    if self_join:
        b_b = b_a
    na, nb = len(b_a), len(b_b)
    if na == 0 or nb == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if na * nb <= 1_000_000:
        # single reused (na, nb) temp instead of four broadcast allocs
        m = b_a[:, None, 0] <= b_b[None, :, 2]
        np.logical_and(m, b_a[:, None, 2] >= b_b[None, :, 0], out=m)
        np.logical_and(m, b_a[:, None, 1] <= b_b[None, :, 3], out=m)
        np.logical_and(m, b_a[:, None, 3] >= b_b[None, :, 1], out=m)
        ia, ib = np.nonzero(m)
        if self_join:
            keep = ia < ib
            ia, ib = ia[keep], ib[keep]
        return ia, ib
    # Vectorized grid join (the old per-item python cell loop spent
    # minutes on real map data whose long straight border segments
    # span thousands of median-sized cells — 41M dict inserts on the
    # CO_bad_gap fixture):
    # * normal-sized items are binned by fully vectorized repeat
    #   arithmetic and paired with one searchsorted pass,
    # * OVERSIZE items (> 32 cells across) are handled by a brute
    #   vectorized bbox sweep against everything — there are only ever
    #   a handful of them, and binning them is what blew up.
    allb = np.vstack([b_a, b_b])
    minx, miny = allb[:, 0].min(), allb[:, 1].min()
    sizes = np.maximum(allb[:, 2] - allb[:, 0], allb[:, 3] - allb[:, 1])
    cell = max(float(np.median(sizes)) * 2.0, 1e-9)

    def _bbox_hits(box, bx):
        return (
            (box[0] <= bx[:, 2])
            & (box[2] >= bx[:, 0])
            & (box[1] <= bx[:, 3])
            & (box[3] >= bx[:, 1])
        )

    def _ranges(bx):
        cx0 = np.floor((bx[:, 0] - minx) / cell).astype(np.int64)
        cy0 = np.floor((bx[:, 1] - miny) / cell).astype(np.int64)
        cx1 = np.floor((bx[:, 2] - minx) / cell).astype(np.int64)
        cy1 = np.floor((bx[:, 3] - miny) / cell).astype(np.int64)
        return cx0, cy0, cx1, cy1

    def _bin(bx, keep_mask):
        """(cell_key, item_idx) arrays for the kept items."""
        idx = np.flatnonzero(keep_mask)
        if len(idx) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        cx0, cy0, cx1, cy1 = _ranges(bx[idx])
        nx = cx1 - cx0 + 1
        counts = nx * (cy1 - cy0 + 1)
        total = int(counts.sum())
        rows = np.repeat(np.arange(len(idx)), counts)
        cum = np.zeros(len(idx) + 1, dtype=np.int64)
        np.cumsum(counts, out=cum[1:])
        pos = np.arange(total, dtype=np.int64) - cum[:-1][rows]
        cx = cx0[rows] + pos % nx[rows]
        cy = cy0[rows] + pos // nx[rows]
        key = cx * np.int64(1 << 32) + cy
        return key, idx[rows]

    max_cells = 32
    over_a = (
        np.maximum(b_a[:, 2] - b_a[:, 0], b_a[:, 3] - b_a[:, 1])
        > max_cells * cell
    )
    over_b = (
        np.maximum(b_b[:, 2] - b_b[:, 0], b_b[:, 3] - b_b[:, 1])
        > max_cells * cell
    ) if not self_join else over_a
    ka, ia_items = _bin(b_a, ~over_a)
    kb, ib_items = _bin(b_b, ~over_b)
    parts_a, parts_b = [], []
    if len(ka) and len(kb):
        order = np.argsort(kb, kind="stable")
        kb_s, ib_s = kb[order], ib_items[order]
        lo = np.searchsorted(kb_s, ka, side="left")
        hi = np.searchsorted(kb_s, ka, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total:
            rows = np.repeat(np.arange(len(ka)), cnt)
            cum = np.zeros(len(ka) + 1, dtype=np.int64)
            np.cumsum(cnt, out=cum[1:])
            pos = (
                np.arange(total, dtype=np.int64)
                - cum[:-1][rows]
                + lo[rows]
            )
            parts_a.append(ia_items[rows])
            parts_b.append(ib_s[pos])
    # oversize sweeps (few items, each O(n) vectorized)
    for i in np.flatnonzero(over_a):
        hits = np.flatnonzero(_bbox_hits(b_a[i], b_b))
        parts_a.append(np.full(len(hits), i, dtype=np.int64))
        parts_b.append(hits)
        if self_join:
            # emit BOTH orders so the final i<j filter keeps the pair
            # regardless of index order (the hit side never binned it)
            parts_a.append(hits)
            parts_b.append(np.full(len(hits), i, dtype=np.int64))
    if not self_join:
        for j in np.flatnonzero(over_b):
            hits = np.flatnonzero(_bbox_hits(b_b[j], b_a) & ~over_a)
            parts_a.append(hits)
            parts_b.append(np.full(len(hits), j, dtype=np.int64))
    if not parts_a:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    ia = np.concatenate(parts_a)
    ib = np.concatenate(parts_b)
    packed = ia * np.int64(nb) + ib
    packed = np.unique(packed)
    ia, ib = packed // nb, packed % nb
    if self_join:
        keep = ia < ib
        ia, ib = ia[keep], ib[keep]
    # exact bbox check
    keep = (
        (b_a[ia, 0] <= b_b[ib, 2])
        & (b_a[ia, 2] >= b_b[ib, 0])
        & (b_a[ia, 1] <= b_b[ib, 3])
        & (b_a[ia, 3] >= b_b[ib, 1])
    )
    return ia[keep], ib[keep]


def _seg_bboxes(p0, p1):
    return np.column_stack(
        [
            np.minimum(p0[:, 0], p1[:, 0]),
            np.minimum(p0[:, 1], p1[:, 1]),
            np.maximum(p0[:, 0], p1[:, 0]),
            np.maximum(p0[:, 1], p1[:, 1]),
        ]
    )


class _CutAccumulator:
    """Flat (segment_idx, t) cut-parameter accumulator — callees
    append ARRAYS, never per-element Python."""

    __slots__ = ("segs", "ts")

    def __init__(self):
        self.segs: list[np.ndarray] = []
        self.ts: list[np.ndarray] = []

    def add(self, seg_idx: np.ndarray, t: np.ndarray):
        if len(seg_idx):
            self.segs.append(np.asarray(seg_idx, dtype=np.int64))
            self.ts.append(np.asarray(t, dtype=np.float64))

    def arrays(self):
        if not self.segs:
            z = np.empty(0, dtype=np.int64)
            return z, np.empty(0, dtype=np.float64)
        return np.concatenate(self.segs), np.concatenate(self.ts)


def _node_segments(p0, p1, tol, with_src: bool = False):
    """Split segments at every pairwise intersection. Returns
    (q0, q1): sub-segment endpoint arrays, quantized to ``tol``
    (optionally plus the raw-input segment index of each sub-segment)."""
    # snap inputs to the grid first so coordinates that upstream ops
    # produced within one ulp/grid-cell of each other collapse exactly
    p0 = np.round(p0 / tol) * tol
    p1 = np.round(p1 / tol) * tol
    nonzero = (p0 != p1).any(axis=1)
    src_orig = np.flatnonzero(nonzero)
    p0, p1 = p0[nonzero], p1[nonzero]
    n = len(p0)
    cuts = _CutAccumulator()
    ia, ib = _candidate_pairs(_seg_bboxes(p0, p1))
    _node_pairs(p0, p1, ia, ib, cuts, tol)
    _vertex_proximity_cuts(p0, p1, cuts, tol)
    # vectorized sub-segment emission: flatten (segment, t) cut params,
    # sort per segment, take consecutive-point pairs, drop snapped
    # zero-length pieces (exact-duplicate ts collapse there too) —
    # replaces a per-segment Python sort/set/loop that dominated
    # whole-corpus repair profiles
    cut_seg, flat = cuts.arrays()
    seg = np.concatenate([np.repeat(np.arange(n), 2), cut_seg])
    tval = np.concatenate([np.tile([0.0, 1.0], n), flat])
    order = np.lexsort((tval, seg))
    seg = seg[order]
    tval = tval[order]
    pts = p0[seg] + tval[:, None] * (p1[seg] - p0[seg])
    pts = np.round(pts / tol) * tol
    same = seg[1:] == seg[:-1]
    a = pts[:-1][same]
    b = pts[1:][same]
    src = src_orig[seg[:-1][same]]
    keep = (a != b).any(axis=1)
    q0, q1, srcs = a[keep], b[keep], src[keep]
    if with_src:
        return q0, q1, srcs
    return q0, q1


def _weld_endpoints(q0: np.ndarray, q1: np.ndarray, tol: float,
                    cells: int = 4):
    """Merge endpoint nodes within the T-junction proximity (4 grid
    cells) onto one representative; returns (q0, q1, keep_mask) with
    zero-length results dropped. Inputs chained through DIFFERENT
    upstream snap grids (a decimal smart_repair grid feeding a binary
    boolean grid) can carry the "same" vertex a few cells apart.
    Runs only as the retry pass after an inconsistent parity
    propagation, so clean inputs never pay for it; exactly-equal nodes
    (all grid-aligned fixtures) are untouched."""
    eps = tol * cells
    pts = np.vstack([q0, q1])
    keys = np.round(pts / tol).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    m = len(uniq)
    if m >= 2:
        upts = uniq.astype(np.float64) * tol
        boxes = np.column_stack([upts - eps, upts + eps])
        ia, ib = _candidate_pairs(boxes)
        if len(ia):
            d = np.hypot(*(upts[ia] - upts[ib]).T)
            close = d <= eps
            ia, ib = ia[close], ib[close]
        if len(ia):
            parent = np.arange(m)

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for x, y in zip(ia, ib):
                rx, ry = find(int(x)), find(int(y))
                if rx != ry:
                    parent[max(rx, ry)] = min(rx, ry)
            roots = np.array([find(i) for i in range(m)])
            upts = upts[roots]
        pts = upts[inv]
    n = len(q0)
    q0, q1 = pts[:n], pts[n:]
    keep = (q0 != q1).any(axis=1)
    return q0[keep], q1[keep], keep


def _vertex_proximity_cuts(p0, p1, cuts, tol):
    """T-junction snap: a vertex of ANY segment lying within a few grid
    cells of another segment's interior cuts that segment at its
    projection. Without this, upstream-quantized inputs (a chained
    boolean whose vertex ends ~1 grid cell short of an edge it
    logically lies on) leave edges unsplit and the side-sampling
    classifier sees mixed regions (the resolve_overlaps bug)."""
    eps = tol * 4
    pts = np.unique(np.round(np.vstack([p0, p1]) / tol), axis=0) * tol
    if len(pts) == 0:
        return
    ptb = np.column_stack([pts, pts])
    segb = _seg_bboxes(p0, p1)
    segb = segb + np.array([-eps, -eps, eps, eps])
    pi, si = _candidate_pairs(ptb, segb)
    if len(pi) == 0:
        return
    e = pts[pi]
    a = p0[si]
    d = p1[si] - a
    L2 = (d * d).sum(axis=1)
    L2 = np.where(L2 == 0, 1.0, L2)
    t = ((e - a) * d).sum(axis=1) / L2
    proj = a + t[:, None] * d
    dist = np.hypot(*(e - proj).T)
    seglen = np.sqrt(L2)
    margin = eps / seglen
    interior = (t > margin) & (t < 1 - margin) & (dist <= eps)
    cuts.add(si[interior], t[interior])


def _node_pairs(p0, p1, ia, ib, cuts, tol):
    """Elementwise segment-pair intersection: append cut params."""
    if len(ia) == 0:
        return
    a0, a1 = p0[ia], p1[ia]
    b0, b1 = p0[ib], p1[ib]
    r = a1 - a0
    s = b1 - b0
    qp = b0 - a0
    rxs = r[:, 0] * s[:, 1] - r[:, 1] * s[:, 0]
    qpxr = qp[:, 0] * r[:, 1] - qp[:, 1] * r[:, 0]
    qpxs = qp[:, 0] * s[:, 1] - qp[:, 1] * s[:, 0]
    rlen = np.hypot(r[:, 0], r[:, 1])
    slen = np.hypot(s[:, 0], s[:, 1])
    scale = np.maximum(rlen * slen, 1e-300)
    nonpar = np.abs(rxs) > 1e-12 * scale
    eps = 1e-12
    with np.errstate(divide="ignore", invalid="ignore"):
        t = qpxs / rxs
        u = qpxr / rxs
    hit = nonpar & (t >= -eps) & (t <= 1 + eps) & (u >= -eps) & (u <= 1 + eps)
    if hit.any():
        tv = np.clip(t[hit], 0.0, 1.0)
        uv = np.clip(u[hit], 0.0, 1.0)
        m = (tv > 0.0) & (tv < 1.0)
        cuts.add(ia[hit][m], tv[m])
        m = (uv > 0.0) & (uv < 1.0)
        cuts.add(ib[hit][m], uv[m])
    # collinear overlaps: project other segment's endpoints (vectorized
    # over the collinear pair set; the pair-skip semantics of the old
    # per-pair loop — a zero-length i-segment skips BOTH directions,
    # a zero-length j-segment only its own — are preserved via masks)
    coll = (~nonpar) & (np.abs(qpxr) <= 1e-9 * np.maximum(rlen, 1e-300) * np.maximum(rlen, slen))
    if coll.any():
        i_ = ia[coll]
        j_ = ib[coll]
        rr = p1[i_] - p0[i_]
        rl2 = (rr * rr).sum(axis=1)
        ok_r = rl2 > 0
        rl2s = np.where(ok_r, rl2, 1.0)
        for pt in (p0[j_], p1[j_]):
            tvv = ((pt - p0[i_]) * rr).sum(axis=1) / rl2s
            m = ok_r & (tvv > 1e-12) & (tvv < 1 - 1e-12)
            cuts.add(i_[m], tvv[m])
        ss = p1[j_] - p0[j_]
        sl2 = (ss * ss).sum(axis=1)
        ok_s = ok_r & (sl2 > 0)
        sl2s = np.where(sl2 > 0, sl2, 1.0)
        for pt in (p0[i_], p1[i_]):
            uvv = ((pt - p0[j_]) * ss).sum(axis=1) / sl2s
            m = ok_s & (uvv > 1e-12) & (uvv < 1 - 1e-12)
            cuts.add(j_[m], uvv[m])


# ------------------------------------------- exact DCEL face extraction


def _build_dcel(q0, q1, owners, n_geoms, tol):
    """Half-edge structure over noded (possibly duplicated) directed
    sub-segments. Returns None when nothing non-degenerate remains,
    else a dict of arrays:

    - ncoord (N,2): node coordinates (grid-exact: key*tol)
    - ea/eb (E,): undirected edge endpoints as node ids
    - toggle (E,G): even-odd crossing parity of each input's boundary
      over each edge (a boundary covering an edge twice — a zero-width
      ring spike — correctly toggles nothing)
    - org (2E,): half-edge origin node; half-edge 2i runs ea->eb,
      2i+1 runs eb->ea; twin(h) = h ^ 1
    - nxt (2E,): face-walk successor = cyclic CCW-predecessor of the
      twin among the destination node's outgoing half-edges
    - orbit (2E,): orbit id per half-edge; orbit_rings: node-id arrays
      per orbit; orbit_area: signed shoelace area per orbit (positive
      = face shell walked CCW, negative = hole/outer cycle).
    """
    keys = np.round(np.vstack([q0, q1]) / tol).astype(np.int64)
    # manual lexicographic pair-unique: same sorted order and inverse
    # as np.unique(axis=0) without its void-view sort (~3× faster on
    # the small arrays this hot path sees)
    korder = np.lexsort((keys[:, 1], keys[:, 0]))
    ks = keys[korder]
    newk = np.empty(len(ks), dtype=bool)
    newk[0] = True
    np.any(ks[1:] != ks[:-1], axis=1, out=newk[1:])
    uk = ks[newk]
    inv = np.empty(len(keys), np.int64)
    inv[korder] = np.cumsum(newk) - 1
    ncoord = uk.astype(np.float64) * tol
    n = len(q0)
    a, b = inv[:n], inv[n:]
    ok = a != b
    a, b, owners = a[ok], b[ok], owners[ok]
    if len(a) == 0:
        return None
    nn = np.int64(len(uk))
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    uedge, einv = np.unique(lo * nn + hi, return_inverse=True)
    E = len(uedge)
    ea = (uedge // nn).astype(np.int64)
    eb = (uedge % nn).astype(np.int64)
    upk, cnt = np.unique(
        einv * np.int64(n_geoms) + owners, return_counts=True
    )
    odd = (cnt % 2).astype(bool)
    toggle = np.zeros((E, n_geoms), dtype=bool)
    toggle[(upk // n_geoms)[odd], (upk % n_geoms)[odd]] = True
    org = np.empty(2 * E, np.int64)
    dst = np.empty(2 * E, np.int64)
    org[0::2], dst[0::2] = ea, eb
    org[1::2], dst[1::2] = eb, ea
    d = ncoord[dst] - ncoord[org]
    ang = np.arctan2(d[:, 1], d[:, 0])
    order = np.lexsort((ang, org))
    newgrp = np.r_[True, org[order][1:] != org[order][:-1]]
    grp_id = np.cumsum(newgrp) - 1
    grp_start = np.flatnonzero(newgrp)
    grp_cnt = np.diff(np.r_[grp_start, 2 * E])
    pos_of = np.empty(2 * E, np.int64)
    pos_of[order] = np.arange(2 * E)
    p = pos_of[np.arange(2 * E) ^ 1]  # twin's position in sorted order
    g0 = grp_start[grp_id[p]]
    nxt = order[g0 + (p - g0 - 1) % grp_cnt[grp_id[p]]]
    # permutation-cycle walk on python ints (numpy scalar indexing in
    # this loop was a measurable constant of real-corpus assign)
    nxt_l = nxt.tolist()
    orbit_l = [-1] * (2 * E)
    orbit_rings: list[np.ndarray] = []
    for h0 in range(2 * E):
        if orbit_l[h0] >= 0:
            continue
        oid = len(orbit_rings)
        cyc = []
        h = h0
        while orbit_l[h] < 0:
            orbit_l[h] = oid
            cyc.append(h)
            h = nxt_l[h]
        orbit_rings.append(org[np.array(cyc, dtype=np.int64)])
    orbit = np.asarray(orbit_l, dtype=np.int64)
    orbit_area = np.array(
        [ring_signed_area(ncoord[r]) for r in orbit_rings]
    )
    return dict(
        ncoord=ncoord, ea=ea, eb=eb, toggle=toggle, org=org, nxt=nxt,
        orbit=orbit, orbit_rings=orbit_rings, orbit_area=orbit_area,
    )


def _resolve_faces(dc, n_geoms):
    """Group orbits into faces and propagate exact even-odd membership.

    Returns (resolved, mem, clean): ``resolved`` maps each orbit to its
    face id (0 = unbounded; positive orbits get faces 1..F-1; negative
    orbits resolve to the face they are a hole of, via a leftward ray
    cast from their leftmost node); ``mem`` is the (F, G) membership
    matrix; ``clean`` is False when the parity propagation was
    inconsistent (an input ring failed to close at grid resolution —
    a pinhole seam)."""
    ncoord, orbit = dc["ncoord"], dc["orbit"]
    areas, rings = dc["orbit_area"], dc["orbit_rings"]
    ea, eb, toggle = dc["ea"], dc["eb"], dc["toggle"]
    n_orb = len(rings)
    pos = areas > 0
    resolved = np.full(n_orb, -1, np.int64)
    resolved[pos] = np.arange(1, int(pos.sum()) + 1)
    F = int(pos.sum()) + 1
    A, B = ncoord[ea], ncoord[eb]
    container = np.full(n_orb, -1, np.int64)
    for c in np.flatnonzero(~pos):
        pts = ncoord[rings[c]]
        k = np.lexsort((pts[:, 1], pts[:, 0]))[0]
        vx, vy = pts[k]
        cross = ((A[:, 1] <= vy) & (B[:, 1] > vy)) | (
            (B[:, 1] <= vy) & (A[:, 1] > vy)
        )
        ci = np.flatnonzero(cross)
        if len(ci) == 0:
            continue
        x_at = A[ci, 0] + (vy - A[ci, 1]) * (B[ci, 0] - A[ci, 0]) / (
            B[ci, 1] - A[ci, 1]
        )
        # ε-above convention: the ray conceptually runs at y = vy + ε,
        # so a crossing sits at x_at + ε·slope. Edges through a vertex
        # exactly on the ray (x_at ties, or x_at == vx with the edge
        # leaving the ray origin up-left) are ordered by slope, which
        # is orientation-independent: (Bx-Ax)/(By-Ay).
        slope = (B[ci, 0] - A[ci, 0]) / (B[ci, 1] - A[ci, 1])
        left = (x_at < vx) | ((x_at == vx) & (slope < 0))
        if not left.any():
            continue
        li = ci[left]
        j = int(li[np.lexsort((slope[left], x_at[left]))[-1]])
        # the containing face lies LEFT of the hit edge's downward
        # half-edge (its left normal faces the ray origin)
        h = 2 * j if A[j, 1] > B[j, 1] else 2 * j + 1
        container[c] = orbit[h]
    for c in np.flatnonzero(~pos):
        if resolved[c] >= 0:
            continue
        chain = [c]
        o = int(container[c])
        while o >= 0 and resolved[o] < 0 and len(chain) <= n_orb:
            chain.append(o)
            o = int(container[o])
        f = int(resolved[o]) if o >= 0 and resolved[o] >= 0 else 0
        for x in chain:
            resolved[x] = f
    # exact membership propagation across the face-adjacency graph —
    # fully vectorized (the per-edge python BFS with a per-visit
    # (mem[g] == m).all() was ~1/3 of real-corpus assign wall: tiny
    # arrangements × millions of python-level edge visits). Frontier
    # expansion assigns each newly-reached face from ONE incident
    # crossing edge; one whole-array consistency pass at the end flags
    # exactly the inconsistencies the BFS flagged incrementally (parity
    # inconsistency is a property of cycles, invariant under which
    # spanning assignment was chosen), so `clean` is identical and
    # `mem` is identical whenever clean.
    E = len(ea)
    fL = resolved[orbit[0::2]]
    fR = resolved[orbit[1::2]]
    mem = np.zeros((F, n_geoms), dtype=bool)
    clean = True
    diff = fL != fR
    if toggle[~diff].any():
        clean = False  # boundary edge interior to ONE face: pinhole
    l_, r_ = fL[diff], fR[diff]
    tg = toggle[diff]
    u = np.concatenate([l_, r_])
    v = np.concatenate([r_, l_])
    tg2 = np.concatenate([tg, tg], axis=0)
    seen = np.zeros(F, dtype=bool)
    seen[0] = True
    while True:
        act = seen[u] & ~seen[v]
        if not act.any():
            break
        ua, va, ta = u[act], v[act], tg2[act]
        uniq, first = np.unique(va, return_index=True)
        mem[uniq] = mem[ua[first]] ^ ta[first]
        seen[uniq] = True
    both = seen[u] & seen[v]
    if both.any() and not (
        mem[v[both]] == (mem[u[both]] ^ tg2[both])
    ).all():
        clean = False
    if not seen.all():
        clean = False
    return resolved, mem, clean


def _build_arrangement(geoms, tol):
    """Node + weld-retry + DCEL + membership for a list of (already
    ensure_multi'd) inputs. Returns None when the arrangement is empty,
    else (dc, resolved, mem)."""
    p0, p1, own = _gather_segments(geoms, with_owner=True)
    if len(p0) == 0:
        return None
    q0, q1, src = _node_segments(p0, p1, tol, with_src=True)
    if len(q0) == 0:
        return None
    owners = own[src]
    # attempt 0 runs on the raw noded segments; closed rings make the
    # parity propagation consistent by construction, so the weld retry
    # only ever fires on inputs whose rings themselves fail to close at
    # grid resolution (chained through different upstream snap grids)
    best = None
    for weld_cells in (None, 4):
        if weld_cells is not None:
            q0, q1, keep = _weld_endpoints(q0, q1, tol, weld_cells)
            owners = owners[keep]
        dc = _build_dcel(q0, q1, owners, len(geoms), tol)
        if dc is None:
            return None
        resolved, mem, clean = _resolve_faces(dc, len(geoms))
        best = (dc, resolved, mem)
        if clean:
            break
    return best


def _default_tol(geoms) -> float:
    lo, hi = np.inf, -np.inf
    for g in geoms:
        for poly in ensure_multi(g):
            for ring in poly:
                lo = min(lo, float(ring.min()))
                hi = max(hi, float(ring.max()))
    if not np.isfinite(lo):
        return 2.0**-30
    scale = max(abs(hi), abs(lo), 1.0)
    # power-of-two grid: round(c/tol)*tol is EXACT for dyadic-rational
    # coordinates (all integer/half-integer fixtures), so snapping never
    # perturbs already-exact inputs
    return 2.0 ** (math.ceil(math.log2(scale)) - 30)


def arrangement_regions(geoms, predicate, tol: float | None = None):
    """Generic boolean: keep the region where ``predicate(mask)`` is
    True, mask being the per-input strict-containment boolean vector.
    Returns a MultiPolygon."""
    geoms = [ensure_multi(g) for g in geoms]
    if tol is None:
        tol = _default_tol(geoms)
    built = _build_arrangement(geoms, tol)
    if built is None:
        return []
    dc, resolved, mem = built
    passf = np.array([bool(predicate(m)) for m in mem])
    if not passf[1:].any():
        return []
    orbit, nxt, org = dc["orbit"], dc["nxt"], dc["org"]
    ncoord = dc["ncoord"]
    face_of_he = resolved[orbit]
    H = len(face_of_he)
    # boundary half-edges of the dissolved region: passing face on the
    # left, non-passing on the right
    kept = passf[face_of_he] & ~passf[face_of_he[np.arange(H) ^ 1]]
    rings = []
    visited = np.zeros(H, dtype=bool)
    for h0 in np.flatnonzero(kept):
        if visited[h0]:
            continue
        nodes = []
        h = int(h0)
        guard = 0
        while not visited[h] and guard <= H:
            visited[h] = True
            nodes.append(org[h])
            # continue the region boundary: rotate around the
            # destination node through interior (both-sides-passing)
            # edges until the next boundary half-edge
            j = int(nxt[h])
            spin = 0
            while not kept[j] and spin <= H:
                j = int(nxt[j ^ 1])
                spin += 1
            h = j
            guard += 1
        rings.append(ncoord[np.array(nodes, dtype=np.int64)])
    return _assemble(rings)


def _assemble(rings):
    """Signed rings → MultiPolygon (shells CCW get their CW holes)."""
    shells, holes_ = [], []
    for r in rings:
        if len(r) < 3:
            continue
        sa = ring_signed_area(r)
        if sa > 0:
            shells.append((sa, r))
        elif sa < 0:
            holes_.append(r)
    if not shells:
        return []
    shells.sort(key=lambda t: t[0])  # smallest first
    polys = [[r] for _, r in shells]
    from .core import representative_point

    for h in holes_:
        hp = representative_point([[h[::-1].copy()]])
        placed = False
        for k, (_, shell) in enumerate(shells):
            if point_in_polygon(np.array([hp]), [shell], True)[0]:
                polys[k].append(h)
                placed = True
                break
        if not placed:
            pass  # orphan hole: drop (degenerate input)
    return polys


def arrangement_faces(geoms, tol: float | None = None):
    """Full planar arrangement: every atomic face of the subdivision
    induced by the input polygon boundaries, with its membership vector
    (which inputs cover it). The "building blocks"/overlap-tower
    primitive of smart_repair (ref: smart_repair.py:523-748) — pieces
    of degree k are faces whose membership sums to k; degree-0 enclosed
    faces are the gaps.

    Returns list of (piece: MultiPolygon, membership: tuple[bool,...]).
    Only faces covered by ≥1 input are returned directly; gaps are the
    holes of the union of all returned pieces (callers use
    holes_of_union on the originals).
    """
    geoms = [ensure_multi(g) for g in geoms]
    if tol is None:
        tol = _default_tol(geoms)
    built = _build_arrangement(geoms, tol)
    if built is None:
        return []
    dc, resolved, mem = built
    ncoord = dc["ncoord"]
    rings, areas = dc["orbit_rings"], dc["orbit_area"]
    shells = np.flatnonzero(areas > 0)
    holes_by_face: dict[int, list[np.ndarray]] = {}
    for c in np.flatnonzero(areas < 0):
        f = int(resolved[c])
        if f >= 1 and len(rings[c]) >= 3:
            holes_by_face.setdefault(f, []).append(ncoord[rings[c]])
    out = []
    for fi, c in enumerate(shells, start=1):
        if not mem[fi].any():
            continue  # uncovered face (gap / enclosed void)
        if len(rings[c]) < 3:
            continue
        poly = [ncoord[rings[c]]] + holes_by_face.get(fi, [])
        out.append(([poly], tuple(bool(x) for x in mem[fi])))
    return out


# ------------------------------------------------------------ named ops


def intersection(a, b, tol=None):
    return arrangement_regions([a, b], lambda m: m[0] and m[1], tol)


def union(a, b, tol=None):
    return arrangement_regions([a, b], lambda m: m[0] or m[1], tol)


def union_all(geoms, tol=None):
    return arrangement_regions(list(geoms), lambda m: bool(m.any()), tol)


def difference(a, b, tol=None):
    return arrangement_regions([a, b], lambda m: m[0] and not m[1], tol)


def symmetric_difference(a, b, tol=None):
    return arrangement_regions([a, b], lambda m: bool(m[0]) != bool(m[1]), tol)


def holes(geom):
    """Interior rings of a MultiPolygon as polygons (ref: repair.py:90-103)."""
    out = []
    for poly in ensure_multi(geom):
        for ring in poly[1:]:
            out.append([ring[::-1].copy()])  # CW hole → CCW shell
    return out


def holes_of_union(geoms, tol=None):
    """ref: repair.py:74-87 — holes of unary_union(geoms)."""
    return holes(union_all(geoms, tol))


def boundary_intersection(a, b, tol=None):
    """Shared boundary between two MultiPolygons.

    Returns (lines, points, length): collinear shared sub-segments (as
    a list of 2-point arrays), isolated touch points, and total shared
    length. This is what rook/queen adjacency needs
    (ref: adjacencies.py:18-26, :68-69).
    """
    a = ensure_multi(a)
    b = ensure_multi(b)
    if tol is None:
        tol = _default_tol([a, b])
    pa0, pa1 = _gather_segments([a])
    pb0, pb1 = _gather_segments([b])
    if len(pa0) == 0 or len(pb0) == 0:
        return [], np.empty((0, 2)), 0.0
    p0 = np.vstack([pa0, pb0])
    p1 = np.vstack([pa1, pb1])
    # node the combined set; ownership resolved by midpoint re-matching
    q0, q1 = _node_segments(p0, p1, tol)
    if len(q0) == 0:
        return [], np.empty((0, 2)), 0.0
    # ownership: a sub-segment belongs to A if its midpoint lies on A's
    # boundary (within tol), similarly B
    mids = (q0 + q1) * 0.5
    on_a = _on_boundary(mids, a, tol * 4)
    on_b = _on_boundary(mids, b, tol * 4)
    shared = on_a & on_b
    # dedup shared undirected segments (vectorized canonical keys)
    sidx = np.flatnonzero(shared)
    lines = []
    total = 0.0
    if len(sidx):
        k = np.round(
            np.hstack([q0[sidx], q1[sidx]]) / tol
        ).astype(np.int64)
        swap = (k[:, 0] > k[:, 2]) | (
            (k[:, 0] == k[:, 2]) & (k[:, 1] > k[:, 3])
        )
        kc = np.where(swap[:, None], k[:, [2, 3, 0, 1]], k)
        _, first = np.unique(kc, axis=0, return_index=True)
        idx = sidx[np.sort(first)]
        lines = [np.vstack([q0[i], q1[i]]) for i in idx]
        total = float(np.hypot(*(q1[idx] - q0[idx]).T).sum())
    # touch points: nodes on both boundaries not covered by shared lines
    nodes = np.vstack([q0, q1])
    nk = np.round(nodes / tol).astype(np.int64)
    _, ui = np.unique(nk, axis=0, return_index=True)
    nodes = nodes[ui]
    on_a_n = _on_boundary(nodes, a, tol * 4)
    on_b_n = _on_boundary(nodes, b, tol * 4)
    cand = nodes[on_a_n & on_b_n]
    if len(cand) and lines:
        from .pip import points_near_segments

        l0 = np.array([s[0] for s in lines])
        l1 = np.array([s[1] for s in lines])
        covered = points_near_segments(cand, l0, l1, tol * 4)
        cand = cand[~covered]
    return lines, cand if len(cand) else np.empty((0, 2)), total


def _canon_keys(q0, q1, tol):
    key = np.round(np.hstack([q0, q1]) / tol).astype(np.int64)
    out = []
    for r in key:
        a, b = (r[0], r[1]), (r[2], r[3])
        out.append((a, b) if a <= b else (b, a))
    return out


def _on_boundary(pts, geom, eps):
    from .pip import points_on_ring

    out = np.zeros(len(pts), dtype=bool)
    for poly in ensure_multi(geom):
        for ring in poly:
            out |= points_on_ring(pts, ring, eps)
    return out


def _point_on_segment(p, a, b, eps):
    # Scalar arithmetic, not `@`: BLAS ddot kernels are host-dispatch-
    # dependent (FMA pairing differs by core type), and a last-ulp
    # difference here feeds an eps comparison that can flip a topology
    # decision between hosts. Python-float ops are IEEE-deterministic.
    dx = float(b[0]) - float(a[0])
    dy = float(b[1]) - float(a[1])
    L2 = dx * dx + dy * dy
    if L2 == 0:
        return bool(np.hypot(*(p - a)) <= eps)
    t = ((float(p[0]) - float(a[0])) * dx
         + (float(p[1]) - float(a[1])) * dy) / L2
    t = min(max(t, 0.0), 1.0)
    proj = np.array([float(a[0]) + t * dx, float(a[1]) + t * dy])
    return bool(np.hypot(*(p - proj)) <= eps)


def intersection_full(a, b, tol=None):
    """Mixed-dimension intersection mirroring shapely semantics for the
    pieces table (SURVEY.md §2.3 item 3): the area part (MultiPolygon)
    plus, when the area part is empty, the shared-boundary lines/points.

    Returns (polygons, lines, points, area, boundary_length).
    """
    from .core import area as _area

    polys = intersection(a, b, tol)
    ar = _area(polys) if polys else 0.0
    if polys and ar > 0:
        return polys, [], np.empty((0, 2)), ar, 0.0
    lines, pts, ln = boundary_intersection(a, b, tol)
    return [], lines, pts, 0.0, ln
