"""Unit tests for the from-scratch geometry kernels (SURVEY.md §7.1 step 1).

Oracle pattern follows the reference's brute-force double-loop checks
(tests/test_intersections.py:67-80): tiny handcrafted shapes with exact
expected values.
"""

import numpy as np
import pytest

from maup_ray.geom import (
    BBoxTree,
    CellGrid,
    area,
    boundary_intersection,
    bounds,
    covers,
    decode,
    difference,
    encode_lines,
    encode_multipolygon,
    encode_points,
    encode_polygon,
    holes_of_union,
    intersection,
    intersection_full,
    length,
    perimeter,
    point_in_polygon,
    rect,
    representative_point,
    symmetric_difference,
    union,
    union_all,
)
from maup_ray.geom.cells import morton_decode, morton_encode
from maup_ray.geom.clip import clip_multipolygon_rect, rect_intersection_area
from maup_ray.geom.core import dedup_ring, ring_signed_area, snap_geom


def sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float)


class TestCore:
    def test_signed_area(self):
        assert ring_signed_area(sq(0, 0, 2, 3)) == 6.0
        assert ring_signed_area(sq(0, 0, 2, 3)[::-1]) == -6.0

    def test_area_with_hole(self):
        donut = [[sq(0, 0, 4, 4), sq(1, 1, 3, 3)[::-1]]]
        assert area(donut) == 12.0

    def test_perimeter_bounds(self):
        g = rect(1, 2, 4, 6)
        assert perimeter(g) == 14.0
        assert bounds(g) == (1, 2, 4, 6)

    def test_dedup_ring(self):
        r = np.array([[0, 0], [0, 0], [1, 0], [1, 1], [1, 1], [0, 1], [0, 0]], dtype=float)
        out = dedup_ring(r)
        assert len(out) == 4

    def test_snap(self):
        g = [[np.array([[0.12, 0.26], [1.04, 0.0], [0.5, 1.11]])]]
        s = snap_geom(g, 0.5)
        assert np.allclose(s[0][0], [[0, 0.5], [1, 0], [0.5, 1]])

    def test_representative_point_inside(self):
        donut = [[sq(0, 0, 4, 4), sq(1, 1, 3, 3)[::-1]]]
        p = np.array([representative_point(donut)])
        assert point_in_polygon(p, donut[0], include_boundary=False)[0]


class TestWKB:
    def test_polygon_roundtrip(self):
        g = [[sq(0, 0, 2, 2), sq(0.5, 0.5, 1, 1)[::-1]]]
        parts = decode(encode_multipolygon(g))
        assert parts.dim == 2
        assert area(parts.polygons) == area(g)

    def test_multipolygon_roundtrip(self):
        g = [[sq(0, 0, 1, 1)], [sq(2, 2, 3, 3)]]
        parts = decode(encode_multipolygon(g))
        assert len(parts.polygons) == 2
        assert area(parts.polygons) == 2.0

    def test_lines_points(self):
        parts = decode(encode_lines([np.array([[0.0, 0], [3, 4]])]))
        assert parts.dim == 1 and length(parts.lines) == 5.0
        parts = decode(encode_points(np.array([[1.0, 2.0], [3.0, 4.0]])))
        assert parts.dim == 0 and len(parts.points) == 2


class TestPIP:
    def test_basic(self):
        poly = [sq(0, 0, 2, 2)]
        pts = np.array([[1, 1], [3, 1], [2, 1], [0, 0]], dtype=float)
        inside = point_in_polygon(pts, poly, include_boundary=True)
        assert inside.tolist() == [True, False, True, True]
        # half-open convention: (2,1) on right edge → out, (0,0) lower-left → in
        strict = point_in_polygon(pts, poly, include_boundary=False)
        assert strict.tolist() == [True, False, False, True]

    def test_hole(self):
        donut = [sq(0, 0, 4, 4), sq(1, 1, 3, 3)[::-1]]
        pts = np.array([[2, 2], [0.5, 0.5]], dtype=float)
        inside = point_in_polygon(pts, donut, include_boundary=False)
        assert inside.tolist() == [False, True]

    def test_covers(self):
        assert covers(rect(0, 0, 2, 2), rect(0.5, 0.5, 1, 1))
        assert covers(rect(0, 0, 2, 2), rect(0, 0, 2, 2))  # equal
        assert not covers(rect(0, 0, 2, 2), rect(1, 1, 3, 3))
        # bbox-inside but actually outside (diamond case, F4)
        diamond = [[np.array([[100.0, 0], [0, 100], [-100, 0], [0, -100]])]]
        small = rect(90, 90, 91, 91)
        assert not covers(diamond, small)


class TestBoolean:
    def test_overlap(self):
        a, b = rect(0, 0, 2, 2), rect(1, 1, 3, 3)
        assert area(intersection(a, b)) == 1.0
        assert area(union(a, b)) == 7.0
        assert area(difference(a, b)) == 3.0
        assert area(symmetric_difference(a, b)) == 6.0

    def test_adjacent_degenerate(self):
        a, c = rect(0, 0, 2, 2), rect(2, 0, 4, 2)
        assert intersection(a, c) == []
        lines, pts, ln = boundary_intersection(a, c)
        assert ln == 2.0 and len(pts) == 0

    def test_corner_touch(self):
        a, e = rect(0, 0, 2, 2), rect(2, 2, 3, 3)
        lines, pts, ln = boundary_intersection(a, e)
        assert ln == 0.0 and len(pts) == 1

    def test_triangles(self):
        t1 = [[np.array([[0.0, 0], [4, 0], [0, 4]])]]
        t2 = [[np.array([[1.0, 1], [5, 1], [5, 5]])]]
        assert area(intersection(t1, t2)) == pytest.approx(1.0)

    def test_holes_of_union_donut(self):
        polys = [
            rect(x, y, x + 1, y + 1)
            for x in range(3)
            for y in range(3)
            if not (x == 1 and y == 1)
        ]
        h = holes_of_union(polys)
        assert len(h) == 1 and area(h) == 1.0

    def test_holes_of_union_two_donuts(self):
        # 5x3 grid missing two cells → 2 holes (F5)
        polys = [
            rect(x, y, x + 1, y + 1)
            for x in range(5)
            for y in range(3)
            if (x, y) not in [(1, 1), (3, 1)]
        ]
        h = holes_of_union(polys)
        assert len(h) == 2 and area(h) == 2.0

    def test_intersection_full_dims(self):
        a = rect(0, 0, 2, 2)
        polys, lines, pts, ar, ln = intersection_full(a, rect(1, 1, 3, 3))
        assert ar == 1.0 and ln == 0.0
        polys, lines, pts, ar, ln = intersection_full(a, rect(2, 0, 3, 2))
        assert ar == 0.0 and ln == 2.0
        polys, lines, pts, ar, ln = intersection_full(a, rect(2, 2, 3, 3))
        assert ar == 0.0 and ln == 0.0 and len(pts) == 1


class TestClip:
    def test_rect_clip_exact(self):
        g = rect(0, 0, 10, 10)
        c = clip_multipolygon_rect(g, 4, 4, 20, 20)
        assert area(c) == 36.0

    def test_rect_clip_triangle(self):
        # triangle x+y<=4 in the first quadrant, clipped to [0,3]^2:
        # 9 - corner triangle {x+y>4} of area 2 = 7
        t = [[np.array([[0.0, 0], [4, 0], [0, 4]])]]
        c = clip_multipolygon_rect(t, 0, 0, 3, 3)
        assert area(c) == pytest.approx(7.0)

    def test_rect_intersection_area(self):
        a = np.array([[0, 0, 2, 2]], dtype=float)
        b = np.array([[1, 1, 3, 3], [5, 5, 6, 6]], dtype=float)
        out = rect_intersection_area(a, b)
        assert out.tolist() == [[1.0, 0.0]]


class TestCells:
    def test_morton_roundtrip(self):
        x = np.array([0, 1, 5, 1000, (1 << 20) - 1], dtype=np.int64)
        y = np.array([0, 3, 2, 999, 17], dtype=np.int64)
        cx, cy = morton_decode(morton_encode(x, y))
        assert (cx.astype(np.int64) == x).all()
        assert (cy.astype(np.int64) == y).all()

    def test_cell_of_points_and_parent(self):
        g = CellGrid(0, 0, 1024)
        c = g.cell_of_points(np.array([100.0]), np.array([200.0]), 5)
        minx, miny, maxx, maxy = g.cell_bbox(c)
        assert minx[0] <= 100 < maxx[0] and miny[0] <= 200 < maxy[0]
        p = g.parent(c, 2)
        assert CellGrid.res_of(p)[0] == 3
        pb = g.cell_bbox(p)
        assert pb[0][0] <= minx[0] and pb[2][0] >= maxx[0]

    def test_cells_for_bbox(self):
        g = CellGrid(0, 0, 16)
        cells = g.cells_for_bbox(0.5, 0.5, 3.5, 1.5, 3)  # res3 → cell=2
        assert len(cells) == 2 * 1

    def test_pick_resolution(self):
        g = CellGrid(0, 0, 1024)
        assert g.pick_resolution(1.0) == 9


class TestBBoxTree:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(0)
        lo = rng.uniform(0, 100, size=(500, 2))
        b = np.hstack([lo, lo + rng.uniform(0.1, 5, size=(500, 2))])
        q_lo = rng.uniform(0, 100, size=(200, 2))
        q = np.hstack([q_lo, q_lo + rng.uniform(0.1, 5, size=(200, 2))])
        tree = BBoxTree(b)
        qi, ti = tree.query_bbox(q)
        got = set(zip(qi.tolist(), ti.tolist()))
        want = set()
        for i in range(len(q)):
            for j in range(len(b)):
                if (
                    q[i, 0] <= b[j, 2]
                    and q[i, 2] >= b[j, 0]
                    and q[i, 1] <= b[j, 3]
                    and q[i, 3] >= b[j, 1]
                ):
                    want.add((i, j))
        assert got == want

    def test_tree_path_matches_flat(self):
        rng = np.random.RandomState(1)
        lo = rng.uniform(0, 1000, size=(5000, 2))
        b = np.hstack([lo, lo + rng.uniform(0.1, 3, size=(5000, 2))])
        tree = BBoxTree(b)
        q = np.array([[10.0, 10.0, 30.0, 30.0], [500.0, 500.0, 501.0, 501.0]])
        # force hierarchical path
        qi, ti = tree.query_bbox(np.repeat(q, 500, axis=0))
        flat = np.nonzero(
            (q[0, 0] <= b[:, 2])
            & (q[0, 2] >= b[:, 0])
            & (q[0, 1] <= b[:, 3])
            & (q[0, 3] >= b[:, 1])
        )[0]
        got0 = sorted(ti[qi == 0].tolist())
        assert got0 == sorted(flat.tolist())


class TestNodeWelding:
    def test_union_across_misaligned_snap_grids(self):
        # regression (CO_bad_gap corpus): the "same" vertex arriving a
        # few boolean-grid cells apart (chained ops with different
        # upstream snap grids) used to dead-end the ring stitcher and
        # silently DROP the whole union. Nodes within the 4-cell
        # T-junction proximity now weld to one representative.
        import numpy as np

        from maup_ray.geom import boolean
        from maup_ray.geom.core import area as parea

        tol = 2.0 ** -30  # _default_tol for unit-scale coords
        a = [[np.array([[0.0, 0], [1, 0], [1, 1], [0, 1]])]]
        b = [
            [
                np.array(
                    [
                        [1.0, 0],
                        [2, 0],
                        [2, 1],
                        [1, 1 + 3 * tol],  # 3 cells off the shared corner
                    ]
                )
            ]
        ]
        u = boolean.union(a, b)
        assert len(u) == 1
        assert parea(u) == pytest.approx(2.0, abs=1e-6)

    def test_exact_inputs_unaffected_by_welding(self):
        import numpy as np

        from maup_ray.geom import boolean
        from maup_ray.geom.core import area as parea

        a = [[np.array([[0.0, 0], [1, 0], [1, 1], [0, 1]])]]
        b = [[np.array([[1.0, 0], [2, 0], [2, 1], [1, 1]])]]
        u = boolean.union(a, b)
        assert parea(u) == 2.0  # exact: grid-aligned vertices untouched


class TestVisiblePairsVectorized:
    def test_matches_exact_reference_impl(self):
        # the vectorized 3-stage visibility must equal the exact
        # per-pair split-at-hits test on assorted simple polygons
        import numpy as np

        from maup_ray.geom.funnel import _segment_inside, visible_pairs

        def brute(ring):
            m = len(ring)
            vis = np.zeros((m, m), dtype=bool)
            for i in range(m):
                vis[i, (i + 1) % m] = vis[(i + 1) % m, i] = True
            for i in range(m):
                for j in range(i + 2, m):
                    if i == 0 and j == m - 1:
                        continue
                    if _segment_inside(ring[i], ring[j], ring):
                        vis[i, j] = vis[j, i] = True
            return vis

        rng = np.random.RandomState(11)
        rings = []
        # star polygon (reflex-heavy)
        th = np.linspace(0, 2 * np.pi, 13)[:-1]
        rad = np.where(np.arange(12) % 2 == 0, 2.0, 0.7)
        rings.append(np.column_stack([rad * np.cos(th), rad * np.sin(th)]))
        # jittered convex-ish polygon
        th = np.sort(rng.uniform(0, 2 * np.pi, 16))
        r = rng.uniform(1.0, 1.4, 16)
        rings.append(np.column_stack([r * np.cos(th), r * np.sin(th)]))
        # U shape with collinear runs (grazing diagonals)
        rings.append(
            np.array(
                [
                    [0, 0], [5, 0], [5, 3], [4, 3], [4, 1],
                    [1, 1], [1, 3], [0, 3],
                ],
                dtype=float,
            )
        )
        for ring in rings:
            got = visible_pairs(ring)
            want = brute(ring)
            assert (got == want).all(), np.argwhere(got != want)


class TestRingGeodesicsFunnel:
    def test_funnel_matches_dijkstra_lengths(self):
        """Triangulation-sleeve funnel paths (RingGeodesics large-ring
        mode) must have the same euclidean length as the
        visibility-graph Dijkstra (the geodesic is unique in generic
        position; equal-length reroutes would still be correct)."""
        import numpy as np

        from maup_ray.geom.funnel import (
            RingGeodesics,
            shortest_path_in_ring,
            visible_pairs,
        )

        rng = np.random.RandomState(23)
        for _ in range(12):
            m = rng.randint(8, 48)
            th = np.sort(rng.uniform(0, 2 * np.pi, m))
            r = rng.uniform(0.5, 2.0, m)
            ring = np.column_stack([r * np.cos(th), r * np.sin(th)])
            geo = RingGeodesics(ring, small=4)  # force funnel mode
            assert geo._tris is not None
            vis = visible_pairs(ring)
            for _ in range(6):
                i0, i1 = rng.randint(0, m, 2)
                pf = geo.path(i0, i1)
                pd = shortest_path_in_ring(ring, i0, i1, vis)
                lf = np.hypot(*np.diff(pf, axis=0).T).sum()
                ld = np.hypot(*np.diff(pd, axis=0).T).sum()
                assert np.isclose(lf, ld, rtol=1e-9), (i0, i1, lf, ld)

    def test_funnel_point_paths_match(self):
        import numpy as np

        from maup_ray.geom.funnel import (
            RingGeodesics,
            path_from_interior,
            visible_pairs,
        )
        from maup_ray.geom.pip import point_in_polygon

        rng = np.random.RandomState(5)
        checked = 0
        while checked < 10:
            m = rng.randint(8, 40)
            th = np.sort(rng.uniform(0, 2 * np.pi, m))
            r = rng.uniform(0.5, 2.0, m)
            ring = np.column_stack([r * np.cos(th), r * np.sin(th)])
            C = ring.mean(axis=0) * 0.3
            if not point_in_polygon(
                C[None, :], [ring], include_boundary=False
            )[0]:
                continue
            geo = RingGeodesics(ring, small=4)
            if geo._tris is None:
                continue
            vis = visible_pairs(ring)
            tgt = int(rng.randint(0, m))
            pf = geo.path_from_point(C, tgt)
            pd = path_from_interior(ring, vis, C, tgt)
            if pd is None:
                continue
            lf = np.hypot(*np.diff(pf, axis=0).T).sum()
            ld = np.hypot(*np.diff(pd, axis=0).T).sum()
            assert np.isclose(lf, ld, rtol=1e-9)
            checked += 1

    def test_triangulation_covers_ring(self):
        """Ear-clip triangles are CCW, tile the polygon (area sums to
        the ring area) and form a connected dual tree."""
        import numpy as np

        from maup_ray.geom.funnel import triangulate_ring

        # L-shape with collinear-ish edges
        ring = np.array(
            [[0, 0], [4, 0], [4, 1], [1, 1], [1, 3], [0, 3]], dtype=float
        )
        tris = triangulate_ring(ring)
        assert len(tris) == len(ring) - 2
        area = 0.0
        for a, b, c in tris:
            A, B, C = ring[a], ring[b], ring[c]
            cr = (B[0] - A[0]) * (C[1] - A[1]) - (B[1] - A[1]) * (
                C[0] - A[0]
            )
            assert cr >= 0  # CCW
            area += cr / 2
        assert np.isclose(area, 6.0)  # L-shape area (4×1 + 1×2)

    def test_degenerate_ring_falls_back(self):
        """A ring with a duplicate vertex defeats ear clipping; the
        RingGeodesics wrapper must still answer via the visibility
        path."""
        import numpy as np

        from maup_ray.geom.funnel import RingGeodesics

        ring = np.array(
            [[0, 0], [2, 0], [2, 2], [1, 1], [2, 2.0], [0, 2]], dtype=float
        )
        geo = RingGeodesics(ring, small=2)
        p = geo.path(0, 3)
        assert len(p) >= 2
        assert (p[0] == ring[0]).all() and (p[-1] == ring[3]).all()
