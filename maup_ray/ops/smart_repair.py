"""smart_repair — adjacency-aware overlap/gap repair (ops 19-21).

Round-1 subset of the reference's smart_repair
(ref: smart_repair.py:49-496), built on the planar-arrangement
``arrangement_faces`` primitive:

1. make_valid-lite + vertex dedup (ref :109-160)
2. snap to 10^(log10(extent) − snap_precision) grid (ref :162-223)
3. planar arrangement → atomic pieces tagged with their covering set
   (the "overlap tower", ref building_blocks :523-748)
4. rebuild each polygon from its degree-1 pieces; assign degree≥2
   pieces by greatest shared perimeter against the current
   reconstruction, ties to the smallest id, PLUS the first-dibs pass
   for disconnected owners (ref reconstruct_from_overlap_tower
   :751-969; first-dibs below at _first_dibs)
5. gap filling via the reference's smart_close_gaps dispatch
   (:1032-1917): convexify_hole_boundaries first (:2598-2787, funnel
   shortest paths), then per remaining gap — unique-owner attach,
   triangle incenter (3 distinct owners) or largest-shared-perimeter,
   3-boundary shortest-path splits with hull-incenter and
   exterior-boundary handling (:1150-1452), and the ≥4-boundary
   closest-pair "triangle" reduction that requeues the smaller gaps
   (:1454-1700). Ring-with-hole gap regions are left unfilled with a
   warning (ref drop_bad_holes, :972-1029).
6. region-nested variant: assign to regions, then the whole pipeline
   runs per region inside ``groupby(region).map_groups`` — the
   distributed axis (ref :261-328).

``small_rook_to_queen`` (op 21) lives in ``rook_to_queen.py``.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..geom import boolean
from ..geom.boolean import arrangement_faces, boundary_intersection
from ..geom.core import area as poly_area
from ..geom.core import bounds, dedup_geom, snap_geom
from ..geom.wkb import decode_polygons, encode_multipolygon

__all__ = ["smart_repair", "smart_repair_table"]


def _shared_len(a, b) -> float:
    _, _, ln = boundary_intersection(a, b)
    return ln


def _ear_clip(ring: np.ndarray):
    """O(n²) ear clipping of a simple CCW ring → list of index triples
    (ref analogue: triangulate_polygon, smart_repair.py:2312-2345)."""
    n = len(ring)
    idx = list(range(n))
    tris = []
    guard = 0
    while len(idx) > 3 and guard < 4 * n * n:
        guard += 1
        m = len(idx)
        clipped = False
        for pos in range(m):
            a, b, c = idx[(pos - 1) % m], idx[pos], idx[(pos + 1) % m]
            pa_, pb, pc = ring[a], ring[b], ring[c]
            cross = (pb[0] - pa_[0]) * (pc[1] - pa_[1]) - (
                pb[1] - pa_[1]
            ) * (pc[0] - pa_[0])
            if cross <= 0:
                continue  # reflex or degenerate
            # no other active vertex strictly inside the candidate ear
            ok = True
            for other in idx:
                if other in (a, b, c):
                    continue
                p = ring[other]
                d1 = (pb[0] - pa_[0]) * (p[1] - pa_[1]) - (pb[1] - pa_[1]) * (p[0] - pa_[0])
                d2 = (pc[0] - pb[0]) * (p[1] - pb[1]) - (pc[1] - pb[1]) * (p[0] - pb[0])
                d3 = (pa_[0] - pc[0]) * (p[1] - pc[1]) - (pa_[1] - pc[1]) * (p[0] - pc[0])
                if d1 > 0 and d2 > 0 and d3 > 0:
                    ok = False
                    break
            if ok:
                tris.append((a, b, c))
                idx.pop(pos)
                clipped = True
                break
        if not clipped:
            return None  # degenerate ring; caller falls back
    if len(idx) == 3:
        tris.append(tuple(idx))
    return tris


def _triangle_split(gap, out_geoms, neighbors, edge_owner):
    """Non-star gaps: ear-clip triangulation; triangles seeded by the
    owner of the boundary edge they contain, remaining triangles BFS
    from edge-adjacent assigned ones. Returns [(owner, MultiPolygon)]
    or None."""
    ring = gap[0]
    m = len(ring)
    tris = _ear_clip(ring)
    if tris is None:
        return None
    owner_of = {}
    # seed: triangle containing original boundary edge(s) (i, i+1) —
    # when a triangle contains several (different owners), the LONGEST
    # edge's owner wins
    for t_i, (a, b, c) in enumerate(tris):
        best_len = -1.0
        for (u, v) in ((a, b), (b, c), (c, a)):
            if (v - u) % m == 1:  # original ring edge u→u+1
                ln = float(np.hypot(*(ring[v] - ring[u])))
                if ln > best_len:
                    best_len = ln
                    owner_of[t_i] = edge_owner[u]
    # BFS over shared (chord) edges
    import collections

    def edges_of(t):
        a, b, c = t
        return [
            tuple(sorted(e)) for e in ((a, b), (b, c), (c, a))
        ]

    edge_to_tris = collections.defaultdict(list)
    for t_i, t in enumerate(tris):
        for e in edges_of(t):
            edge_to_tris[e].append(t_i)
    queue = collections.deque(owner_of)
    while queue:
        t_i = queue.popleft()
        for e in edges_of(tris[t_i]):
            for t_j in edge_to_tris[e]:
                if t_j not in owner_of:
                    owner_of[t_j] = owner_of[t_i]
                    queue.append(t_j)
    if len(owner_of) != len(tris):
        return None
    groups: dict[int, list] = {}
    for t_i, (a, b, c) in enumerate(tris):
        groups.setdefault(owner_of[t_i], []).append(
            np.array([ring[a], ring[b], ring[c]])
        )
    out = []
    for own, tris_pts in groups.items():
        merged = boolean.union_all([[[t]] for t in tris_pts])
        if merged:
            out.append((own, merged))
    return out


def _edge_owners(ring, out_geoms, neighbors):
    """Owner index per ring edge (midpoint-on-boundary test); -1 where
    no neighbor's boundary contains the edge."""
    from ..geom.pip import points_on_ring

    m = len(ring)
    mids = (ring + np.roll(ring, -1, axis=0)) * 0.5
    owner = np.full(m, -1, dtype=np.int64)
    for i in neighbors:
        on = np.zeros(m, dtype=bool)
        for poly in out_geoms[i]:
            for r in poly:
                on |= points_on_ring(
                    mids, r, 1e-9 * max(1.0, np.abs(ring).max())
                )
        owner[on & (owner == -1)] = i
    return owner


def _owner_runs(owner):
    """Maximal circular runs [(owner, a, b)] (edges a..b inclusive)."""
    m = len(owner)
    if (owner == owner[0]).all():
        return [(int(owner[0]), 0, m - 1)]
    rot = next(k for k in range(1, m + 1) if owner[k % m] != owner[0]) % m
    ow = np.roll(owner, -rot)
    runs = []
    s = 0
    for k in range(1, m):
        if ow[k] != ow[s]:
            runs.append((int(ow[s]), s + rot, k - 1 + rot))
            s = k
    runs.append((int(ow[s]), s + rot, m - 1 + rot))
    return runs


def _convexify_gap(gap, out_geoms, neighbors):
    """Reference convexify_hole_boundaries (smart_repair.py:2598-2787):
    for each maximal boundary arc shared with one neighbor, cut off the
    region between the arc and the euclidean SHORTEST PATH (inside the
    gap) joining the arc's endpoints, and union it into that neighbor.
    Returns (additions {owner: MultiPolygon}, remaining gap MultiPolygon)
    or None when the gap has <2 distinct owners, has holes, or no arc
    cuts a positive-area piece (already convex)."""
    from ..geom.core import normalize_polygon
    from ..geom.funnel import RingGeodesics

    if len(gap) != 1:
        return None
    ring = gap[0]
    m = len(ring)
    owner = _edge_owners(ring, out_geoms, neighbors)
    distinct = sorted(set(int(o) for o in owner if o >= 0))
    if len(distinct) < 2:
        return None
    runs = [r for r in _owner_runs(owner) if r[0] >= 0]
    geo = RingGeodesics(ring)
    garea = poly_area([gap])
    additions: dict[int, list] = {}
    pieces = []
    for own, a, b in runs:
        i0, i1 = a % m, (b + 1) % m
        path = geo.path(i0, i1)
        if len(path) < 2:
            continue
        arc_idx = [k % m for k in range(a, b + 2)]
        arc_pts = ring[arc_idx]
        if len(path) == 2 and len(arc_pts) == 2:
            continue  # single-edge arc, chord == arc: nothing to cut
        piece_ring = np.vstack([arc_pts, path[::-1][1:-1]])
        poly = normalize_polygon([piece_ring])
        if not poly:
            continue
        # clean weakly-simple rings (path may touch the arc at reflex
        # vertices) and clamp to the gap
        piece = boolean.intersection([poly], [gap])
        pa_ = poly_area(piece)
        if pa_ <= 1e-12 * max(garea, 1.0) or not piece:
            continue
        additions.setdefault(own, [])
        additions[own] = boolean.union(additions[own], piece) \
            if additions[own] else piece
        pieces.append(piece)
    if not pieces:
        return None
    cut = boolean.union_all(pieces)
    remaining = boolean.difference([gap], cut)
    return additions, remaining


def _fan_split(gap, out_geoms, neighbors, garea):
    """Partition a (single-shell) gap among its neighbors: fan polygons
    from the gap's representative point to each maximal boundary run
    owned by one neighbor. Returns [(owner_idx, fan MultiPolygon)] or
    None when the split is invalid (gap not star-shaped from C, a run
    is unowned, or the fans don't tile the gap)."""
    from ..geom.core import normalize_polygon, representative_point
    from ..geom.pip import points_on_ring

    if len(gap) != 1:  # gap with holes: bail to absorb
        return None
    ring = gap[0]
    m = len(ring)
    mids = (ring + np.roll(ring, -1, axis=0)) * 0.5
    owner = np.full(m, -1, dtype=np.int64)
    for i in neighbors:
        on = np.zeros(m, dtype=bool)
        for poly in out_geoms[i]:
            for r in poly:
                on |= points_on_ring(mids, r, 1e-9 * max(1.0, np.abs(ring).max()))
        owner[on & (owner == -1)] = i
    if (owner == -1).any():
        return None
    if m == 3 and len({int(o) for o in owner if o >= 0}) == 3:
        # triangle gap with exactly 3 DISTINCT real owners: the
        # reference splits at the INCENTER — "more natural than the
        # centroid, especially for long skinny triangles" (ref
        # smart_repair.py:1095-1101) — into 3 triangles, one per
        # boundary edge. 1-/2-owner triangles fall through to the
        # representative-point fan like any other gap (ADVICE r2).
        A, B, Cv = ring
        a = float(np.hypot(*(B - Cv)))  # side opposite A
        b = float(np.hypot(*(Cv - A)))
        c = float(np.hypot(*(A - B)))
        C = (a * A + b * B + c * Cv) / (a + b + c)
    else:
        C = np.array(representative_point([gap]))
    # maximal circular runs
    runs = []
    start = 0
    if (owner == owner[0]).all():
        runs = [(int(owner[0]), 0, m - 1)]
    else:
        # rotate to a run boundary
        rot = next(k for k in range(1, m + 1) if owner[k % m] != owner[0]) % m
        ow = np.roll(owner, -rot)
        s = 0
        for k in range(1, m):
            if ow[k] != ow[s]:
                runs.append((int(ow[s]), s + rot, k - 1 + rot))
                s = k
        runs.append((int(ow[s]), s + rot, m - 1 + rot))
    fans = []
    total = 0.0
    star_ok = True
    for own, a, b in runs:
        idxs = [(k) % m for k in range(a, b + 2)]  # run verts + next
        pts = np.vstack([C[None, :], ring[idxs]])
        poly = normalize_polygon([pts])
        if not poly:
            continue
        fan = [poly]
        fa = poly_area(fan)
        if fa <= 0:
            star_ok = False  # degenerate/inverted fan: not star-shaped
            break
        total += fa
        fans.append((own, fan))
    # fans must tile the gap exactly (star-shaped test)
    if star_ok and abs(total - garea) <= 1e-9 * max(garea, 1.0):
        return fans
    # non-star gap: triangulate and assign triangles by boundary-edge
    # owner (the reference's triangulation fallback)
    return _triangle_split(gap, out_geoms, neighbors, owner)


# --------------------------------------------------------------------
# Reference-parity remainder splitting (ref smart_close_gaps main loop,
# smart_repair.py:1076-1917): after convexification, a leftover gap is
# dispatched on its boundary-arc structure — unique-owner attach,
# triangle incenter / largest-perimeter, 3-boundary shortest-path
# splits (with hull-incenter and exterior handling), and the
# ≥4-boundary closest-pair "triangle" reduction that requeues smaller
# gaps. Paths are euclidean shortest paths inside the gap (geom/funnel
# stands in for the reference's triangulation-based
# shortest_path_in_polygon, :2348-2595).
# --------------------------------------------------------------------


def _walk_idx(m, s, t):
    """Ring vertex indices s..t walking forward (inclusive)."""
    idx = [s]
    k = s
    while k != t:
        k = (k + 1) % m
        idx.append(k)
    return idx


def _close_piece(gap, walk_pts, back_path):
    """Polygon bounded by ``walk_pts`` (forward boundary walk) closed
    by ``back_path`` (coords from the walk's END back to its START,
    endpoints inclusive) — normalized and clamped to the gap."""
    from ..geom.core import normalize_polygon

    if len(back_path) > 2:
        ring = np.vstack([walk_pts, back_path[1:-1]])
    else:
        ring = np.asarray(walk_pts)
    poly = normalize_polygon([ring])
    if not poly:
        return None
    piece = boolean.intersection([poly], [gap])
    if not piece or poly_area(piece) <= 0:
        return None
    return piece


def _seg_point_dist(p, a, b):
    # Scalar arithmetic, not np.dot: BLAS ddot kernel choice is host-
    # dependent (see geom/core.ring_signed_area) and this distance
    # feeds threshold comparisons that must not flip between hosts.
    abx = float(b[0]) - float(a[0])
    aby = float(b[1]) - float(a[1])
    apx = float(p[0]) - float(a[0])
    apy = float(p[1]) - float(a[1])
    t = (apx * abx + apy * aby) / max(abx * abx + aby * aby, 1e-300)
    t = min(max(t, 0.0), 1.0)
    return float(np.hypot(
        float(a[0]) + t * abx - float(p[0]),
        float(a[1]) + t * aby - float(p[1]),
    ))


def _polyline_dist(A, B) -> float:
    """Min distance between two polylines (vertex-to-segment both ways
    — exact for non-crossing polylines, which arcs of one ring are)."""
    best = np.inf
    for P, Q in ((A, B), (B, A)):
        for p in P:
            for k in range(len(Q) - 1):
                best = min(best, _seg_point_dist(p, Q[k], Q[k + 1]))
    return best


def _hull_incenter(A, B, Cv):
    a = float(np.hypot(*(B - Cv)))
    b = float(np.hypot(*(Cv - A)))
    c = float(np.hypot(*(A - B)))
    s = a + b + c
    return (a * A + b * B + c * Cv) / s if s > 0 else (A + B + Cv) / 3.0


def _split_3runs(gap, ring, runs, geo):
    """3-boundary split (ref :1150-1452). Returns [(owner, piece)] or
    None when degenerate (caller falls back to absorb). ``geo`` is a
    :class:`~maup_ray.geom.funnel.RingGeodesics` for the ring."""
    from ..geom.pip import point_in_polygon

    m = len(ring)
    owners = [r[0] for r in runs]

    def two_way_split(ext_run_pos, interior_only: bool):
        """Shortest path from the main vertex opposite run
        ``ext_run_pos`` to its nearest vertex on that run; the gap
        splits between the other two owners (ref :1183-1269 exterior,
        :1366-1452 pseudo-exterior)."""
        rr = runs[ext_run_pos:] + runs[:ext_run_pos]
        (oe, ae, be), (o1, a1, b1), (o2, a2, b2) = rr
        u = a2 % m
        ext_vs = [k % m for k in range(ae, be + 2)]
        if interior_only:
            cand = ext_vs[1:-1]
            if not cand:
                return None
        else:
            cand = ext_vs
        d = np.hypot(*(ring[cand] - ring[u]).T)
        pos_c = int(np.argmin(d))
        v = cand[pos_c]
        if not interior_only:
            if v == ext_vs[0]:
                return [(o1, [gap])]
            if v == ext_vs[-1]:
                return [(o2, [gap])]
        sp = geo.path(u, v)  # u → v
        piece1 = _close_piece(gap, ring[_walk_idx(m, v, u)], sp[::-1])
        piece2 = _close_piece(gap, ring[_walk_idx(m, u, v)], sp)
        out = []
        if piece1 is not None and o1 >= 0:
            out.append((o1, piece1))
        if piece2 is not None and o2 >= 0:
            out.append((o2, piece2))
        return out or None

    if -1 in owners:
        return two_way_split(owners.index(-1), interior_only=False)

    mains = [r[1] % m for r in runs]
    C = _hull_incenter(ring[mains[0]], ring[mains[1]], ring[mains[2]])
    inside = bool(
        point_in_polygon(C[None, :], gap, include_boundary=False)[0]
    )
    if inside:
        paths = [geo.path_from_point(C, mv) for mv in mains]
        if all(p is not None for p in paths):
            # reject crossing/overlapping paths: interior vertex sets
            # must be pairwise disjoint (ref builds them in disjoint
            # sub-polygons, :1284-1323)
            sets = [
                {tuple(q) for q in p[1:-1]} for p in paths
            ]
            ok = all(
                not (sets[i] & sets[j])
                for i in range(3)
                for j in range(i + 1, 3)
            )
            if ok:
                pieces = []
                total = 0.0
                for i in range(3):
                    j = (i + 1) % 3
                    walk = ring[_walk_idx(m, mains[i], mains[j])]
                    # close: main_j → C (reverse of path_j) → main_i
                    back = np.vstack([paths[j][::-1], paths[i][1:]])
                    piece = _close_piece(gap, walk, back)
                    if piece is None:
                        break
                    pieces.append((runs[i][0], piece))
                    total += poly_area(piece)
                garea = poly_area([gap])
                if len(pieces) == 3 and abs(total - garea) <= 1e-9 * max(
                    garea, 1.0
                ):
                    return pieces
    # incenter outside (or split failed): treat the run nearest to C
    # as if it were exterior, split between the other two (ref :1366+)
    dists = [
        _polyline_dist(
            C[None, :], ring[[k % m for k in range(r[1], r[2] + 2)]]
        )
        for r in runs
    ]
    return two_way_split(int(np.argmin(dists)), interior_only=True)


def _path_crossing(P, Q):
    """Proper crossing point of two polylines, or None."""
    for i in range(len(P) - 1):
        a0, a1 = P[i], P[i + 1]
        for j in range(len(Q) - 1):
            b0, b1 = Q[j], Q[j + 1]
            d1 = np.cross(a1 - a0, b0 - a0)
            d2 = np.cross(a1 - a0, b1 - a0)
            d3 = np.cross(b1 - b0, a0 - b0)
            d4 = np.cross(b1 - b0, a1 - b0)
            if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
                t = d3 / (d3 - d4)
                X = a0 + t * (a1 - a0)
                return X, i, j
    return None


def _split_at(P, seg_idx, X):
    """Split polyline P at point X on segment seg_idx → (prefix incl X,
    suffix from X)."""
    pre = np.vstack([P[: seg_idx + 1], X[None, :]])
    suf = np.vstack([X[None, :], P[seg_idx + 1 :]])
    return pre, suf


def _reduce_multi(gap, ring, runs, geo):
    """≥4-boundary reduction (ref :1454-1700): connect the closest
    non-adjacent boundary pair with shortest-path 'triangles' attached
    to their owners, leaving smaller gaps. Returns
    (additions [(owner, piece)], subgaps [gap, ...]) or None."""
    m = len(ring)
    arcs = []
    for o, a, b in runs:
        idx = [k % m for k in range(a, b + 2)]
        arcs.append((o, idx, ring[idx]))
    cand = []
    nr = len(arcs)
    for i in range(nr):
        for j in range(i + 1, nr):
            d = _polyline_dist(arcs[i][2], arcs[j][2])
            if d > 0:
                cand.append((d, i, j))
    cand.sort()
    for _d, i, j in cand:
        oi, idx_i, pts_i = arcs[i]
        oj, idx_j, pts_j = arcs[j]
        if oi == -1 and oj == -1:
            continue
        ai, ti = idx_i[0], idx_i[-1]
        aj, tj = idx_j[0], idx_j[-1]
        if oi == -1 or oj == -1:
            # attach a 'triangle' to the non-exterior side only
            if oi == -1:
                (oi, idx_i, pts_i), (oj, idx_j, pts_j) = (
                    (oj, idx_j, pts_j),
                    (oi, idx_i, pts_i),
                )
                ai, ti = idx_i[0], idx_i[-1]
                aj, tj = idx_j[0], idx_j[-1]
            # v = ext vertex nearest to the interior arc
            dv = [
                min(
                    _seg_point_dist(ring[v], pts_i[k], pts_i[k + 1])
                    for k in range(len(pts_i) - 1)
                )
                for v in idx_j
            ]
            v = idx_j[int(np.argmin(dv))]
            p1 = geo.path(ai, v)
            p2 = geo.path(ti, v)
            s1 = {tuple(q) for q in p1[1:-1]}
            s2 = {tuple(q) for q in p2[1:-1]}
            if s1 & s2:
                continue
            back = np.vstack([p2, p1[::-1][1:]])  # t_i→v→a_i
            piece = _close_piece(gap, pts_i, back)
            if piece is None:
                continue
            additions = [(oi, piece)]
            rest = boolean.difference([gap], piece)
            return additions, list(rest)
        # both real owners
        tp1 = geo.path(ai, tj)
        tp2 = geo.path(ti, aj)
        if {tuple(q) for q in tp1} & {tuple(q) for q in tp2}:
            continue
        if oi == oj:
            # single connecting polygon between the two arcs
            back2 = tp2  # t_i → a_j
            back1 = tp1[::-1]  # t_j → a_i
            ring_pts = np.vstack(
                [pts_i, back2[1:], pts_j[1:], back1[1:-1]]
            )
            from ..geom.core import normalize_polygon

            poly = normalize_polygon([ring_pts])
            piece = (
                boolean.intersection([poly], [gap]) if poly else None
            )
            if not piece or poly_area(piece) <= 0:
                continue
            additions = [(oi, piece)]
        else:
            p1 = geo.path(ai, aj)  # crosses p2
            p2 = geo.path(ti, tj)
            hit = _path_crossing(p1, p2)
            if hit is None:
                continue
            X, k1, k2 = hit
            pre1, suf1 = _split_at(p1, k1, X)
            pre2, suf2 = _split_at(p2, k2, X)
            # T1: arc_i + (t_i → X) + (X → a_i)
            t1 = _close_piece(
                gap, pts_i, np.vstack([pre2, pre1[::-1][1:]])
            )
            # T2: arc_j + (t_j → X) + (X → a_j)
            t2 = _close_piece(
                gap, pts_j, np.vstack([suf2[::-1], suf1[1:]])
            )
            if t1 is None and t2 is None:
                continue
            additions = [
                (o, p)
                for o, p in ((oi, t1), (oj, t2))
                if p is not None
            ]
        cut = boolean.union_all([p for _o, p in additions])
        rest = boolean.difference([gap], cut)
        return additions, list(rest)
    return None


def _reattach_fragments(
    out_geoms, orig_ncomp, orig_area, disconnection_threshold, ids
):
    """Fragment reattachment (ref smart_repair.py:330-470): a geometry
    that came out MORE disconnected than it went in usually gained a
    negligible sliver component; each excess smallest component under
    ``disconnection_threshold × max(area_in, area_out)`` is re-assigned
    to the touching neighbor with greatest shared perimeter (ties →
    smallest index; isolated fragments stay put). Mutates
    ``out_geoms`` in place; warns for anything still worse than the
    input (ref :473-485)."""
    import warnings

    n = len(out_geoms)
    for gi in range(n):
        cur = out_geoms[gi]
        if len(cur) <= 1 or len(cur) <= orig_ncomp[gi]:
            continue
        excess = len(cur) - orig_ncomp[gi]
        order_ = sorted(
            range(len(cur)), key=lambda ci: poly_area([cur[ci]])
        )
        big_area = max(poly_area(cur), orig_area[gi])
        removed: set[int] = set()
        for ci in order_[:excess]:
            frag = [cur[ci]]
            if poly_area(frag) >= disconnection_threshold * big_area:
                continue
            fb = bounds(frag)
            best, best_len = None, 0.0
            for gj in range(n):
                if gj == gi or not out_geoms[gj]:
                    continue
                ob = bounds(out_geoms[gj])
                if (
                    ob[0] > fb[2] or ob[2] < fb[0]
                    or ob[1] > fb[3] or ob[3] < fb[1]
                ):
                    continue
                ln = _shared_len(frag, out_geoms[gj])
                if ln > best_len:
                    best, best_len = gj, ln
            if best is not None and best_len > 0:
                out_geoms[best] = boolean.union(out_geoms[best], frag)
                removed.add(ci)
        if removed:
            out_geoms[gi] = [
                c for ci, c in enumerate(cur) if ci not in removed
            ]
            if not out_geoms[gi]:
                warnings.warn(
                    "smart_repair: a badly disconnected geometry was "
                    "entirely redistributed to its neighbors "
                    "(reference :465-468 semantics)"
                )
    for gi in range(n):
        if len(out_geoms[gi]) > max(orig_ncomp[gi], 1):
            warnings.warn(
                f"smart_repair: geometry {ids[gi]!r} may have a "
                "disconnected component above disconnection_threshold "
                "(left in place)"
            )


def smart_repair_table(
    table: pa.Table,
    snap_precision: int = 9,
    fill_gaps: bool = True,
    fill_gaps_threshold: float | None = 0.1,
    geometry_col: str = "geometry",
    region_geometry=None,
    snapped: bool = True,
    disconnection_threshold: float | None = 1e-4,
    min_rook_length: float | None = None,
) -> pa.Table:
    id_col = [c for c in table.column_names if c != geometry_col][0]
    ids = table[id_col].to_pylist()
    geoms = [
        dedup_geom(decode_polygons(b.as_py())) for b in table[geometry_col]
    ]
    n = len(geoms)
    if n == 0:
        return table
    if snapped:
        # --- snap (ref :162-223): grid = 10^(ceil(log10(extent)) - prec)
        bbs = [bounds(g) for g in geoms]
        extent = max(
            max(b[2] for b in bbs) - min(b[0] for b in bbs),
            max(b[3] for b in bbs) - min(b[1] for b in bbs),
            1e-300,
        )
        grid = 10.0 ** (math.ceil(math.log10(extent)) - snap_precision)
        geoms = [dedup_geom(snap_geom(g, grid)) for g in geoms]
    # the reference's disconnection check compares against the
    # make_valid'd+snapped INPUT (geometries0_df, ref :162)
    orig_ncomp = [len(g) for g in geoms]
    orig_area = [poly_area(g) if g else 0.0 for g in geoms]

    # --- arrangement → overlap tower
    faces = arrangement_faces(geoms)
    recon = [[] for _ in range(n)]  # collected pieces per polygon
    multi = []  # degree>=2 pieces: (piece, owner_indices)
    for piece, member in faces:
        owners = [i for i, m in enumerate(member) if m]
        if len(owners) == 1:
            recon[owners[0]].append(piece)
        elif len(owners) >= 2:
            multi.append((piece, owners))

    def merged(i):
        parts = [p for piece in recon[i] for p in piece]
        return parts

    # --- assign overlap pieces, ascending degree. Disconnected owners
    # get first dibs when the piece touches ≥2 of their parts (it
    # reconnects them — ref smart_repair.py:751-969); otherwise
    # greatest shared perimeter, ties to the smallest id.
    multi.sort(key=lambda t: len(t[1]))
    comp_cache: dict[int, list] = {}

    def components(i):
        # connected components of the current reconstruction (touching
        # pieces merge under union)
        if i not in comp_cache:
            parts = merged(i)
            comp_cache[i] = (
                boolean.union_all([[p] for p in parts]) if parts else []
            )
        return comp_cache[i]

    for piece, owners in multi:
        chosen = None
        for i in sorted(owners):
            comps = components(i)
            if len(comps) > 1:
                touching = sum(
                    1 for c in comps if _shared_len(piece, [c]) > 0
                )
                if touching >= 2:
                    chosen = i
                    break
        if chosen is None:
            best, best_len = None, -1.0
            for i in sorted(owners):
                cur = merged(i)
                ln = _shared_len(piece, cur) if cur else 0.0
                if ln > best_len:
                    best, best_len = i, ln
            chosen = best
        recon[chosen].append(piece)
        comp_cache.pop(chosen, None)

    out_geoms = []
    for i in range(n):
        parts = merged(i)
        out_geoms.append(boolean.union_all([[p] for p in parts]) if parts else [])

    # --- gap fill: adjacency-preserving fan split among ALL neighbors
    # via the reference main-loop dispatch (fill_queue below):
    # convexify, then unique-owner attach / triangle incenter /
    # 3-boundary shortest-path splits / ≥4-boundary closest-pair
    # reduction with requeue (ref smart_close_gaps :1076-1917).
    if fill_gaps:
        if region_geometry is not None:
            # region-nested mode (ref building_blocks :668-711): gaps
            # are the degree-0 arrangement pieces of the REGION — i.e.
            # region − union(geometries). Polygons expand to TILE the
            # region; edges on the region outline are unowned (owner
            # -1) and flow through the same dispatch as the
            # reference's exterior boundaries (_split_3runs and
            # _reduce_multi handle owner -1 explicitly).
            u = boolean.union_all([g for g in out_geoms if g])
            region_mp = (
                decode_polygons(region_geometry)
                if isinstance(region_geometry, (bytes, bytearray))
                else region_geometry
            )
            gaps = list(boolean.difference(region_mp, u))
        else:
            holes = boolean.holes_of_union([g for g in out_geoms if g])
            gaps = []
            for hole in holes:
                # a hole of the union may CONTAIN island geometries (e.g.
                # a filler polygon inside an annular gap) — the true gap
                # is the hole minus any geometry residing in it
                from ..geom.core import bounds as gbounds

                hb = gbounds([hole])
                residents = [
                    g
                    for g in out_geoms
                    if g
                    and (lambda b: b[0] >= hb[0] and b[1] >= hb[1]
                         and b[2] <= hb[2] and b[3] <= hb[3])(gbounds(g))
                ]
                if residents:
                    region = boolean.difference(
                        [hole], boolean.union_all(residents)
                    )
                    gaps.extend(region)  # explode MultiPolygon parts
                else:
                    gaps.append(hole)
        from collections import deque

        from ..geom.core import normalize_polygon
        from ..geom.funnel import RingGeodesics

        def touching_neighbors(gap):
            """bbox prefilter before the (noding-pass-priced)
            _shared_len — the all-pairs gap×polygon scan was the top
            cost of the whole repair at sf0.1."""
            gb = bounds([gap])
            out = []
            for i, g in enumerate(out_geoms):
                if not g:
                    continue
                b = bounds(g)
                if (
                    b[0] <= gb[2]
                    and b[2] >= gb[0]
                    and b[1] <= gb[3]
                    and b[3] >= gb[1]
                ) and _shared_len([gap], g) > 0:
                    out.append(i)
            return out

        def absorb_whole(gap, cands):
            best, best_len = None, 0.0
            for i in cands:
                ln = _shared_len([gap], out_geoms[i])
                if ln > best_len:
                    best, best_len = i, ln
            if best is not None:
                out_geoms[best] = boolean.union(out_geoms[best], [gap])

        def fill_queue(parts):
            """Reference smart_close_gaps main-loop dispatch over the
            post-convexify remainder (ref :1076-1917): unique-owner
            attach → triangle incenter/perimeter → 3-boundary
            shortest-path split → ≥4-boundary closest-pair reduction
            (smaller gaps requeued)."""
            q = deque(parts)
            budget = 16 * (len(q) + 4)  # loop guard: each reduction
            # strictly shrinks boundary counts; the guard only trips on
            # degenerate geometry, where absorb finishes the job
            while q:
                gap = q.popleft()
                budget -= 1
                garea = poly_area([gap])
                if garea <= 0:
                    continue
                neighbors_g = touching_neighbors(gap)
                if not neighbors_g:
                    continue
                if len(gap) != 1 or budget <= 0:
                    absorb_whole(gap, neighbors_g)
                    continue
                ring = gap[0]
                owner = _edge_owners(ring, out_geoms, neighbors_g)
                runs = _owner_runs(owner)
                real = sorted({o for o, _, _ in runs if o >= 0})
                if not real:
                    continue
                if len(real) == 1:
                    # ref :1085-1092 — unique non-exterior geometry
                    out_geoms[real[0]] = boolean.union(
                        out_geoms[real[0]], [gap]
                    )
                    continue
                if len(ring) == 3:
                    # ref :1094-1133 — simple triangle
                    if len(real) == 3 and len(runs) == 3:
                        C = _hull_incenter(ring[0], ring[1], ring[2])
                        adds = []
                        for e in range(3):
                            tri = normalize_polygon(
                                [
                                    np.vstack(
                                        [
                                            ring[[e, (e + 1) % 3]],
                                            C[None, :],
                                        ]
                                    )
                                ]
                            )
                            if tri:
                                adds.append((int(owner[e]), [tri]))
                        if len(adds) == 3:
                            for o, p in adds:
                                out_geoms[o] = boolean.union(
                                    out_geoms[o], p
                                )
                            continue
                    absorb_whole(gap, real)
                    continue
                geo = RingGeodesics(ring)
                if len(runs) == 3:
                    pieces = _split_3runs(gap, ring, runs, geo)
                    if pieces:
                        for o, p in pieces:
                            out_geoms[o] = boolean.union(out_geoms[o], p)
                        continue
                    absorb_whole(gap, neighbors_g)
                    continue
                red = _reduce_multi(gap, ring, runs, geo)
                if red is None:
                    absorb_whole(gap, neighbors_g)
                    continue
                additions, subgaps = red
                for o, p in additions:
                    out_geoms[o] = boolean.union(out_geoms[o], p)
                q.extend(
                    sg
                    for sg in subgaps
                    if poly_area(sg) > 1e-12 * max(garea, 1.0)
                )

        def fill_one(gap):
            fill_queue([gap])

        for gap in gaps:
            garea = poly_area([gap])
            neighbors = touching_neighbors(gap)
            if not neighbors:
                continue
            if fill_gaps_threshold is not None:
                ref_area = max(poly_area(out_geoms[i]) for i in neighbors)
                if garea > fill_gaps_threshold * ref_area:
                    continue
            if len(gap) > 1:
                # non-simply-connected gap (contains interior rings):
                # the reference REFUSES these — drop_bad_holes
                # (smart_repair.py:972-1029) leaves them unfilled with a
                # warning, after the area-threshold drop
                import warnings

                warnings.warn(
                    "smart_repair: leaving a non-simply-connected gap "
                    "unfilled (reference drop_bad_holes semantics)"
                )
                continue
            # reference order (smart_repair.py:1055): convexify FIRST —
            # per-arc shortest-path cuts go to the arc's owner — then
            # split/absorb whatever remains
            conv = _convexify_gap(gap, out_geoms, neighbors)
            if conv is not None:
                additions, remaining = conv
                for i, piece in additions.items():
                    out_geoms[i] = boolean.union(out_geoms[i], piece)
                for sub in remaining:
                    fill_one(sub)
            else:
                fill_one(gap)

    if disconnection_threshold is not None:
        _reattach_fragments(
            out_geoms, orig_ncomp, orig_area, disconnection_threshold, ids
        )

    # --- final common-arrangement weld: absorptions above union each
    # parcel separately, so a split path shared by two parcels can be
    # re-snapped DIFFERENTLY per side, leaving ~1e-12-area hairline
    # overlaps between outputs (invisible to the snapped doctor, but
    # real — geom/exactpred finds them, and so would GEOS). One
    # arrangement over ALL outputs rebuilds every parcel from shared
    # atomic faces, so neighbouring borders come out coordinate-equal:
    # a multi-covered hairline face goes to its lowest-id owner, and
    # 0-cover faces are exactly the pre-weld gaps (same inputs), so
    # gap structure is preserved.
    filled = [i for i, g in enumerate(out_geoms) if g]
    if len(filled) > 1:
        weld_faces = boolean.arrangement_faces(
            [out_geoms[i] for i in filled]
        )
        rebuilt: dict[int, list] = {i: [] for i in filled}
        for piece, mem in weld_faces:
            owners = np.flatnonzero(mem)
            if len(owners):
                rebuilt[filled[int(owners[0])]].extend(piece)
        wtol = boolean._default_tol([g for g in out_geoms if g])
        for i in filled:
            parts = rebuilt[i]
            out_geoms[i] = (
                boolean.union_all([[p] for p in parts], tol=wtol)
                if parts
                else []
            )

    i = table.column_names.index(geometry_col)
    out = table.set_column(
        i,
        geometry_col,
        pa.array(
            [encode_multipolygon(g) if g else b"" for g in out_geoms],
            type=pa.binary(),
        ),
    )
    if min_rook_length is not None:
        # ref :487-491: convert sub-threshold rook adjacencies to
        # queen as the final step of the repair itself
        from .rook_to_queen import small_rook_to_queen

        out = small_rook_to_queen(out, min_rook_length, geometry_col)
    return out


def smart_repair(
    obj,
    regions: pa.Table | None = None,
    snap_precision: int = 9,
    fill_gaps: bool = True,
    fill_gaps_threshold: float | None = 0.1,
    geometry_col: str = "geometry",
    concurrency: int = 8,
    snapped: bool = True,
    disconnection_threshold: float | None = 1e-4,
    min_rook_length: float | None = None,
):
    """Table → local repair. Dataset + regions → per-region
    ``groupby(region).map_groups`` (the distributed axis: repairs never
    cross region boundaries, ref :272-328).

    Parameter parity with the reference (smart_repair.py:49-60):
    ``snapped`` gates the vertex-snap stage, ``disconnection_threshold``
    bounds the relative area of excess disconnected fragments that are
    reattached to neighbors by shared perimeter (ref :330-470), and
    ``min_rook_length`` chains :func:`small_rook_to_queen` inside the
    repair (ref :487-491)."""
    from ..crs import check_same_crs, require_projected

    # geographic-CRS rejection (ref :116-120): repairing in degrees
    # silently corrupts areas — refuse before any work is scheduled
    require_projected(obj)
    if regions is not None:
        require_projected(regions)
        check_same_crs(obj, regions)
    if isinstance(obj, pa.Table):
        if regions is None:
            return smart_repair_table(
                obj, snap_precision, fill_gaps, fill_gaps_threshold,
                geometry_col,
                snapped=snapped,
                disconnection_threshold=disconnection_threshold,
                min_rook_length=min_rook_length,
            )
        obj_ds = None
    from .assign import assign

    ds = obj
    if regions is None:
        raise ValueError("Dataset smart_repair needs a regions table")
    rid_col = [c for c in regions.column_names if c != geometry_col][0]
    id_col = "id"
    assigned = assign(
        ds if not isinstance(obj, pa.Table) else obj,
        regions,
        source_id_col=id_col,
        target_id_col="__region",
        targets_id_col=rid_col,
        keep_cols=(geometry_col,),
        concurrency=concurrency,
    )

    region_wkb = {
        rid: b.as_py()
        for rid, b in zip(regions[rid_col].to_pylist(), regions[geometry_col])
    }

    def per_region(df):
        rid = df["__region"].iloc[0]
        rb = region_wkb.get(rid)
        region_mp = decode_polygons(rb) if rb is not None else None
        ids, blobs, dropped = [], [], []
        for i, b in zip(df[id_col], df[geometry_col]):
            if region_mp is None:
                ids.append(i)
                blobs.append(b)
                continue
            # CROP to the assigned region (reference semantics: a
            # piece belongs to a polygon only when both sit in the
            # same region, building_blocks ref :640-660 — pieces of a
            # polygon outside its region become the neighboring
            # region's gaps and are filled there)
            g = boolean.intersection(decode_polygons(b), region_mp)
            if g and poly_area(g) > 0:
                ids.append(i)
                blobs.append(encode_multipolygon(g))
            else:
                dropped.append(i)  # fully outside its assigned region
        t = pa.table(
            {
                id_col: pa.array(ids),
                geometry_col: pa.array(blobs, type=pa.binary()),
            }
        )
        fixed = smart_repair_table(
            t, snap_precision, fill_gaps, fill_gaps_threshold, geometry_col,
            region_geometry=rb,
            snapped=snapped,
            disconnection_threshold=disconnection_threshold,
            min_rook_length=min_rook_length,
        )
        out = fixed.to_pandas()
        if dropped:
            import pandas as pd

            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {id_col: dropped, geometry_col: [b""] * len(dropped)}
                    ),
                ],
                ignore_index=True,
            )
        out["__region"] = rid
        return out

    if isinstance(obj, pa.Table):
        # local path with regions: group in pandas
        df = assigned.to_pandas() if not isinstance(assigned, pa.Table) else assigned.to_pandas()
        import pandas as pd

        groups = [
            per_region(g)
            for _, g in df.groupby("__region", dropna=False, sort=True)
            if not g.empty
        ]
        return pa.Table.from_pandas(
            pd.concat(groups, ignore_index=True), preserve_index=False
        )
    return assigned.groupby("__region").map_groups(per_region)
