"""Euclidean shortest path between two boundary vertices of a simple
polygon (ref: smart_repair.py:2348-2595 ``shortest_path_in_polygon``).

The reference implements the triangulation-sleeve funnel walk; the
euclidean shortest path inside a simple polygon between two of its
vertices is unique (generic position), so a visibility-graph Dijkstra
produces the SAME path. Gap polygons here are small (tens of vertices,
processed per-gap inside map_groups), so the O(m^2) visibility
construction with an O(m) per-pair inside test is the simpler correct
choice at this granularity; the asymptotics that motivate the funnel
walk in the reference don't bind.

Visibility test: the open segment (V_i, V_j) is visible iff, after
splitting it at every boundary intersection parameter, the midpoint of
every piece lies inside-or-on the polygon. Splitting at ALL boundary
hits (including grazing passes through reflex vertices) makes the
midpoint test exact for simple polygons.
"""

from __future__ import annotations

import heapq

import numpy as np

from .pip import point_in_polygon

__all__ = [
    "visible_pairs",
    "shortest_path_in_ring",
    "triangulate_ring",
    "RingGeodesics",
    "TriangulationError",
]


def _segment_boundary_params(p, q, ring: np.ndarray) -> np.ndarray:
    """Intersection parameters t in [0,1] of segment p→q with every
    ring edge (point hits and collinear-overlap interval endpoints)."""
    from .clip import segment_intersections

    e0 = ring
    e1 = np.roll(ring, -1, axis=0)
    _, _, ta_lo, ta_hi, _, _ = segment_intersections(
        p[None, :], q[None, :], e0, e1
    )
    return np.unique(np.concatenate([[0.0, 1.0], ta_lo, ta_hi]))


def _segment_inside(p, q, ring: np.ndarray) -> bool:
    ts = _segment_boundary_params(p, q, ring)
    mids_t = (ts[:-1] + ts[1:]) * 0.5
    if len(mids_t) == 0:
        mids_t = np.array([0.5])
    pts = p[None, :] + mids_t[:, None] * (q - p)[None, :]
    eps = 1e-9 * max(1.0, float(np.abs(ring).max()))
    return bool(
        point_in_polygon(pts, [ring], include_boundary=True, eps=eps).all()
    )


def visible_pairs(ring: np.ndarray) -> np.ndarray:
    """(m, m) boolean visibility matrix between ring vertices (ring
    edges always visible).

    Vectorized three-stage test (the per-pair python loop was O(m³)
    with python overhead — minutes on the 568-vertex CO_bad_gap hole):
    1. drop diagonals PROPERLY crossing any edge (chunked cross-sign
       arithmetic over pairs × edges),
    2. survivors keep a single midpoint-inside test (exact when no
       other vertex grazes the open diagonal),
    3. diagonals grazed by another vertex (collinear pass-throughs,
       reflex touches) fall back to the exact split-at-hits test —
       rare, so the python path no longer dominates."""
    m = len(ring)
    vis = np.zeros((m, m), dtype=bool)
    for i in range(m):
        vis[i, (i + 1) % m] = vis[(i + 1) % m, i] = True
    if m < 4:
        return vis
    iu, ju = np.triu_indices(m, k=2)
    keep = ~((iu == 0) & (ju == m - 1))  # ring edge, already set
    iu, ju = iu[keep], ju[keep]
    E0 = ring
    E1 = np.roll(ring, -1, axis=0)
    es = E1 - E0
    # iterate EDGES over the shrinking set of surviving diagonals
    # (longest edges first — they occlude the most): in occluded
    # polygons ~85% of diagonals die within the first few edges, so
    # total work is ~Σ survivors rather than the dense m² × m
    # (the dense chunked version took ~8.5 s on a 568-vertex gap ring;
    # this takes ~0.3 s with identical results)
    P = ring[iu]
    Q = ring[ju]
    R = Q - P
    alive = np.arange(len(iu))
    for e in np.argsort(-np.hypot(es[:, 0], es[:, 1])):
        if not len(alive):
            break
        p = P[alive]
        r = R[alive]
        q = Q[alive]
        e0x, e0y = E0[e]
        e1x, e1y = E1[e]
        esx, esy = es[e]
        d1 = r[:, 0] * (e0y - p[:, 1]) - r[:, 1] * (e0x - p[:, 0])
        d2 = r[:, 0] * (e1y - p[:, 1]) - r[:, 1] * (e1x - p[:, 0])
        d3 = esx * (p[:, 1] - e0y) - esy * (p[:, 0] - e0x)
        d4 = esx * (q[:, 1] - e0y) - esy * (q[:, 0] - e0x)
        # STRICT sign changes only: any zero (shared endpoint,
        # vertex touch, collinearity) is a touch, not a proper
        # crossing — those cases are decided by the midpoint/graze
        # stages below
        proper = (
            ((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))
        ) & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
        if proper.any():
            alive = alive[~proper]
    iu, ju = iu[alive], ju[alive]
    if len(iu) == 0:
        return vis
    eps = 1e-9 * max(1.0, float(np.abs(ring).max()))
    mids = (ring[iu] + ring[ju]) * 0.5
    inside = point_in_polygon(
        mids, [ring], include_boundary=True, eps=eps
    )
    # grazing detection: any OTHER vertex strictly interior to the
    # open diagonal (within eps of the line, between the endpoints)
    graze = np.zeros(len(iu), dtype=bool)
    chunk = max(1, 4_000_000 // max(m, 1))
    for s in range(0, len(iu), chunk):
        p = ring[iu[s : s + chunk]]
        q = ring[ju[s : s + chunk]]
        d = q - p
        L2 = np.maximum((d * d).sum(axis=1), 1e-300)
        t = (
            (ring[None, :, 0] - p[:, None, 0]) * d[:, None, 0]
            + (ring[None, :, 1] - p[:, None, 1]) * d[:, None, 1]
        ) / L2[:, None]
        perp = (
            d[:, None, 0] * (ring[None, :, 1] - p[:, None, 1])
            - d[:, None, 1] * (ring[None, :, 0] - p[:, None, 0])
        )
        tolt = eps / np.sqrt(L2)
        on = (
            (np.abs(perp) <= eps * np.sqrt(L2)[:, None])
            & (t > tolt[:, None])
            & (t < 1 - tolt[:, None])
        )
        graze[s : s + chunk] = on.any(axis=1)
    final = inside & ~graze
    # exact split-at-hits path for the rare grazed-but-plausible pairs
    for k in np.flatnonzero(graze & inside):
        final[k] = _segment_inside(ring[iu[k]], ring[ju[k]], ring)
    vis[iu[final], ju[final]] = True
    vis[ju[final], iu[final]] = True
    return vis


def shortest_path_in_ring(
    ring: np.ndarray, i0: int, i1: int, vis: np.ndarray | None = None
) -> np.ndarray:
    """Vertex-coordinate path of the euclidean shortest path from
    ring[i0] to ring[i1] inside the simple polygon bounded by ring."""
    m = len(ring)
    if i0 == i1:
        return ring[[i0]]
    if vis is None:
        vis = visible_pairs(ring)
    dist = np.full(m, np.inf)
    prev = np.full(m, -1, dtype=np.int64)
    dist[i0] = 0.0
    heap = [(0.0, i0)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist[u]:
            continue
        if u == i1:
            break
        for v in np.nonzero(vis[u])[0]:
            nd = d + float(np.hypot(*(ring[v] - ring[u])))
            if nd < dist[v]:
                dist[v] = nd
                prev[v] = u
                heapq.heappush(heap, (nd, int(v)))
    if not np.isfinite(dist[i1]):
        # disconnected visibility (degenerate ring): fall back to the
        # boundary path itself
        idxs = [i0]
        k = i0
        while k != i1:
            k = (k + 1) % m
            idxs.append(k)
        return ring[idxs]
    path = [i1]
    while path[-1] != i0:
        path.append(int(prev[path[-1]]))
    return ring[path[::-1]]


def path_from_interior(ring, vis, C, target: int):
    """Shortest path from interior point C to ring[target] inside the
    ring via the visibility graph: Dijkstra over ring vertices + C
    (C linked to vertices it sees). Returns coords
    [C, ..., ring[target]] or None."""
    m = len(ring)
    see = np.array(
        [_segment_inside(C, ring[k], ring) for k in range(m)], dtype=bool
    )
    if not see.any():
        return None
    if see[target]:
        return np.vstack([C[None, :], ring[[target]]])
    dist = np.full(m, np.inf)
    prev = np.full(m, -2, dtype=np.int64)  # -1 marks "from C"
    heap = []
    for k in np.nonzero(see)[0]:
        d = float(np.hypot(*(ring[k] - C)))
        dist[k] = d
        prev[k] = -1
        heapq.heappush(heap, (d, int(k)))
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist[u]:
            continue
        if u == target:
            break
        for v in np.nonzero(vis[u])[0]:
            nd = d + float(np.hypot(*(ring[v] - ring[u])))
            if nd < dist[v]:
                dist[v] = nd
                prev[v] = u
                heapq.heappush(heap, (nd, int(v)))
    if not np.isfinite(dist[target]):
        return None
    path = [int(target)]
    while prev[path[-1]] != -1:
        path.append(int(prev[path[-1]]))
    return np.vstack([C[None, :], ring[path[::-1]]])


class TriangulationError(RuntimeError):
    """Ear clipping found no ear (weakly-simple / degenerate ring)."""


def triangulate_ring(ring: np.ndarray) -> np.ndarray:
    """Ear-clipping triangulation of a simple polygon → (m-2, 3)
    vertex-index triangles, each CCW in coordinate space.

    Raises :class:`TriangulationError` on degenerate input (duplicate
    or collinear-spike vertices that defeat the strict ear test) —
    callers fall back to the visibility-graph machinery, which handles
    weak simplicity via the exact split-at-hits test."""
    m = len(ring)
    if m < 3:
        raise TriangulationError("ring with <3 vertices")
    x, y = ring[:, 0], ring[:, 1]
    area2 = float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    if area2 == 0.0:
        raise TriangulationError("zero-area ring")
    V = list(range(m)) if area2 > 0 else list(range(m - 1, -1, -1))
    tris = []
    k = 0
    misses = 0
    while len(V) > 3:
        n = len(V)
        k %= n
        ip, ic, inx = V[k - 1], V[k], V[(k + 1) % n]
        a, b, c = ring[ip], ring[ic], ring[inx]
        cr = (b[0] - a[0]) * (c[1] - b[1]) - (b[1] - a[1]) * (c[0] - b[0])
        ok = cr > 0.0
        if ok:
            others = [v for v in V if v not in (ip, ic, inx)]
            P = ring[others]
            d1 = (b[0] - a[0]) * (P[:, 1] - a[1]) - (b[1] - a[1]) * (
                P[:, 0] - a[0]
            )
            d2 = (c[0] - b[0]) * (P[:, 1] - b[1]) - (c[1] - b[1]) * (
                P[:, 0] - b[0]
            )
            d3 = (a[0] - c[0]) * (P[:, 1] - c[1]) - (a[1] - c[1]) * (
                P[:, 0] - c[0]
            )
            # inside-or-on blocks the ear (conservative: a vertex ON
            # the candidate diagonal would make it graze)
            if ((d1 >= 0) & (d2 >= 0) & (d3 >= 0)).any():
                ok = False
        if ok:
            tris.append((ip, ic, inx))
            del V[k]
            k = k - 1 if k > 0 else 0
            misses = 0
        else:
            k += 1
            misses += 1
            if misses > n:
                raise TriangulationError("no ear found")
    a, b, c = V
    # keep the last triangle CCW too
    A, B, C = ring[a], ring[b], ring[c]
    cr = (B[0] - A[0]) * (C[1] - B[1]) - (B[1] - A[1]) * (C[0] - B[0])
    tris.append((a, b, c) if cr >= 0 else (a, c, b))
    return np.asarray(tris, dtype=np.int64)


def _tri2(a, b, c) -> float:
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def _veq(a, b) -> bool:
    return a[0] == b[0] and a[1] == b[1]


def _string_pull(
    pls: list[np.ndarray], prs: list[np.ndarray], s: np.ndarray, t: np.ndarray
) -> np.ndarray:
    """Funnel walk over portal (left, right) pairs from s to t (the
    triangulation-sleeve algorithm of ref smart_repair.py:2348-2595,
    in the standard stack-free 'string pulling' formulation)."""
    pl = [s] + pls + [t]
    pr = [s] + prs + [t]
    path = [s]
    apex, left, right = s, s, s
    apex_i = left_i = right_i = 0
    i = 1
    n = len(pl)
    while i < n:
        cl, cr = pl[i], pr[i]
        # signs: _tri2(a, b, c) > 0 ⇔ c strictly left of a→b
        if _tri2(apex, right, cr) >= 0:  # cr tightens the right ray
            if _veq(apex, right) or _tri2(apex, left, cr) < 0:
                right, right_i = cr, i
            else:  # right crossed over left: emit left, restart there
                path.append(left)
                apex, apex_i = left, left_i
                left = right = apex
                left_i = right_i = apex_i
                i = apex_i + 1
                continue
        if _tri2(apex, left, cl) <= 0:  # cl tightens the left ray
            if _veq(apex, left) or _tri2(apex, right, cl) > 0:
                left, left_i = cl, i
            else:  # left crossed over right: emit right, restart there
                path.append(right)
                apex, apex_i = right, right_i
                left = right = apex
                left_i = right_i = apex_i
                i = apex_i + 1
                continue
        i += 1
    if not _veq(path[-1], t):
        path.append(t)
    out = [path[0]]
    for p in path[1:]:
        if not _veq(p, out[-1]):
            out.append(p)
    return np.asarray(out, dtype=np.float64)


class RingGeodesics:
    """Shortest paths inside a simple polygon, scale-adaptive.

    Small rings (m ≤ ``small``) keep the exact visibility-graph
    Dijkstra — bit-compatible with the historical path and robust to
    weak simplicity. Larger rings build an ear-clipping triangulation
    ONCE (O(m²) vs the visibility matrix's O(m²·m) graze stage) and
    answer each query with an O(sleeve) funnel walk; every funnel
    result is validated segment-by-segment with the exact
    split-at-hits inside test and falls back to the visibility path on
    any discrepancy, so outputs stay correct on degenerate geometry.
    """

    def __init__(self, ring: np.ndarray, small: int = 48):
        self.ring = np.asarray(ring, dtype=np.float64)
        self.m = len(ring)
        self._vis = None
        self._tris = None
        self._adj = None
        self._vert2tri = None
        if self.m > small:
            try:
                self._build()
            except TriangulationError:
                self._tris = None

    def _build(self):
        from collections import defaultdict

        tris = triangulate_ring(self.ring)
        edge2tri: dict = {}
        for ti, (a, b, c) in enumerate(tris):
            for u, v in ((a, b), (b, c), (c, a)):
                key = (u, v) if u < v else (v, u)
                edge2tri.setdefault(key, []).append(ti)
        adj = defaultdict(list)
        for key, ts in edge2tri.items():
            if len(ts) == 2:
                adj[ts[0]].append((ts[1], key))
                adj[ts[1]].append((ts[0], key))
        vert2tri = defaultdict(list)
        for ti, t in enumerate(tris):
            for v in t:
                vert2tri[int(v)].append(ti)
        self._tris = tris
        self._adj = adj
        self._vert2tri = vert2tri
        self._cent = self.ring[tris].mean(axis=1)

    def _vism(self) -> np.ndarray:
        if self._vis is None:
            self._vis = visible_pairs(self.ring)
        return self._vis

    def _sleeve(self, t0: int, t1: int):
        """Portal (left, right) point lists along the dual-tree path
        t0 → t1 (the dual of a simple-polygon triangulation is a tree,
        so BFS finds the unique sleeve)."""
        from collections import deque

        if t0 == t1:
            return [], []
        prev = {t0: (None, None)}
        dq = deque([t0])
        while dq:
            u = dq.popleft()
            if u == t1:
                break
            for v, key in self._adj[u]:
                if v not in prev:
                    prev[v] = (u, key)
                    dq.append(v)
        if t1 not in prev:
            return None, None
        hops = []
        u = t1
        while prev[u][0] is not None:
            pu, key = prev[u]
            hops.append((pu, u, key))
            u = pu
        hops.reverse()
        pls, prs = [], []
        for pu, nu, (a, b) in hops:
            d = self._cent[nu] - self._cent[pu]
            pa, pb = self.ring[a], self.ring[b]
            if d[0] * (pa[1] - pb[1]) - d[1] * (pa[0] - pb[0]) > 0:
                pls.append(pa)
                prs.append(pb)
            else:
                pls.append(pb)
                prs.append(pa)
        return pls, prs

    def _validate(self, path: np.ndarray) -> bool:
        for k in range(len(path) - 1):
            if not _segment_inside(path[k], path[k + 1], self.ring):
                return False
        return True

    def path(self, i0: int, i1: int) -> np.ndarray:
        """Vertex-to-vertex euclidean shortest path (coords)."""
        if i0 == i1:
            return self.ring[[i0]]
        if self._tris is not None:
            p = self._funnel_vertex(i0, i1)
            if p is not None and self._validate(p):
                return p
        return shortest_path_in_ring(self.ring, i0, i1, self._vism())

    def _funnel_vertex(self, i0: int, i1: int):
        ts0 = self._vert2tri.get(int(i0))
        ts1 = self._vert2tri.get(int(i1))
        if not ts0 or not ts1:
            return None
        pls, prs = self._sleeve(ts0[0], ts1[0])
        if pls is None:
            return None
        return _string_pull(pls, prs, self.ring[i0], self.ring[i1])

    def path_from_point(self, C: np.ndarray, target: int):
        """Shortest path from interior point C to ring[target]; None
        when C is outside / degenerate."""
        C = np.asarray(C, dtype=np.float64)
        if self._tris is not None:
            t0 = self._locate(C)
            if t0 >= 0:
                ts1 = self._vert2tri.get(int(target))
                if ts1:
                    pls, prs = self._sleeve(t0, ts1[0])
                    if pls is not None:
                        p = _string_pull(pls, prs, C, self.ring[target])
                        if self._validate(p):
                            return p
        return path_from_interior(self.ring, self._vism(), C, target)

    def _locate(self, C: np.ndarray) -> int:
        T = self.ring[self._tris]  # (k, 3, 2) CCW triangles
        d = np.empty((len(T), 3))
        for e in range(3):
            a = T[:, e]
            b = T[:, (e + 1) % 3]
            d[:, e] = (b[:, 0] - a[:, 0]) * (C[1] - a[:, 1]) - (
                b[:, 1] - a[:, 1]
            ) * (C[0] - a[:, 0])
        hit = np.flatnonzero((d >= 0).all(axis=1))
        return int(hit[0]) if len(hit) else -1
