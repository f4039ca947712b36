"""smart_repair tests (F6-flavored; ref: tests/test_smart_repair.py)."""

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.geom import area as parea
from maup_ray.geom import covers, decode_polygons, encode_polygon
from maup_ray.ops.repair import doctor, union_all_table
from maup_ray.ops.smart_repair import smart_repair, smart_repair_table


def sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float)


def jittered(k=3, seed=0, amp=0.04):
    rings, ids = [], []
    rng = np.random.RandomState(seed)
    for x in range(k):
        for y in range(k):
            d = rng.uniform(-amp, amp)
            rings.append(sq(x - d, y - d, x + 1 + d, y + 1 + d))
            ids.append(f"c{x}{y}")
    return pa.table(
        {
            "id": ids,
            "geometry": pa.array(
                [encode_polygon([r]) for r in rings], type=pa.binary()
            ),
        }
    )


class TestSmartRepairLocal:
    def test_one_pass_heals_higher_order_defects(self):
        t = jittered()
        pre = doctor(t)
        assert pre["n_overlaps"] > 0
        out = smart_repair_table(t, fill_gaps_threshold=None)
        post = doctor(out)
        assert post["ok"]
        # total area = union of inputs + filled gaps (gaps become owned)
        total = sum(
            parea(decode_polygons(b.as_py())) for b in out["geometry"]
        )
        assert total >= parea(union_all_table(t)) - 1e-9

    def test_threshold_leaves_large_gaps(self):
        # intentional big gap: 3 cells of a 2x2 grid
        rings = [sq(0, 0, 1, 1), sq(1, 0, 2, 1), sq(0, 1, 1, 2)]
        t = pa.table(
            {
                "id": ["a", "b", "c"],
                "geometry": pa.array(
                    [encode_polygon([r]) for r in rings], type=pa.binary()
                ),
            }
        )
        out = smart_repair_table(t, fill_gaps_threshold=0.1)
        # the missing quadrant is a BOUNDARY notch, not an interior hole
        # → union has no holes → nothing to fill; areas unchanged
        for b, w in zip(out["geometry"], [1.0, 1.0, 1.0]):
            assert parea(decode_polygons(b.as_py())) == pytest.approx(w, abs=1e-9)

    def test_interior_gap_threshold(self):
        # donut grid with center missing → interior gap area 1;
        # threshold 0.05 (gap/area=1) leaves it; None fills it
        rings = [
            sq(x, y, x + 1, y + 1)
            for x in range(3)
            for y in range(3)
            if not (x == 1 and y == 1)
        ]
        t = pa.table(
            {
                "id": [f"g{i}" for i in range(8)],
                "geometry": pa.array(
                    [encode_polygon([r]) for r in rings], type=pa.binary()
                ),
            }
        )
        kept = smart_repair_table(t, fill_gaps_threshold=0.05)
        assert sum(
            parea(decode_polygons(b.as_py())) for b in kept["geometry"]
        ) == pytest.approx(8.0, abs=1e-6)
        filled = smart_repair_table(t, fill_gaps_threshold=None)
        assert sum(
            parea(decode_polygons(b.as_py())) for b in filled["geometry"]
        ) == pytest.approx(9.0, abs=1e-6)


class TestSmartRepairRegions:
    def test_region_nested_containment(self, ray_session):
        import ray
        import ray.data

        t = jittered(k=4, seed=2023, amp=1.0 / 24)
        regions = pa.table(
            {
                "region_id": ["r0", "r1", "r2", "r3"],
                "geometry": pa.array(
                    [
                        encode_polygon([sq(0, 0, 2, 2)]),
                        encode_polygon([sq(2, 0, 4, 2)]),
                        encode_polygon([sq(0, 2, 2, 4)]),
                        encode_polygon([sq(2, 2, 4, 4)]),
                    ],
                    type=pa.binary(),
                ),
            }
        )
        ds = ray.data.from_arrow(t)
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("ignore")  # jittered web complement refused
            out = smart_repair(ds, regions=regions, fill_gaps_threshold=None)
        df = out.to_pandas()
        assert len(df) == 16
        # within-region doctor passes per region group
        for rid, g in df.groupby("__region"):
            sub = pa.table(
                {
                    "id": pa.array(g["id"].tolist()),
                    "geometry": pa.array(
                        g["geometry"].tolist(), type=pa.binary()
                    ),
                }
            )
            rep = doctor(sub)
            assert rep["n_overlaps"] == 0

    def test_region_complement_gap_filled(self, ray_session):
        """Region-nested gaps are region − union (reference
        building_blocks degree-0 semantics, :668-711): a missing
        QUADRANT of a region — a boundary notch plain holes-of-union
        can never see — gets filled, and the region ends fully tiled."""
        import ray
        import ray.data

        from maup_ray.geom import boolean

        cells = {}
        for x in range(4):
            for y in range(4):
                if (x, y) == (3, 0):
                    continue  # missing quadrant of region r1
                cells[f"c{x}{y}"] = sq(x, y, x + 1, y + 1)
        t = pa.table(
            {
                "id": list(cells),
                "geometry": pa.array(
                    [encode_polygon([r]) for r in cells.values()],
                    type=pa.binary(),
                ),
            }
        )
        regions = pa.table(
            {
                "region_id": ["r0", "r1", "r2", "r3"],
                "geometry": pa.array(
                    [
                        encode_polygon([sq(0, 0, 2, 2)]),
                        encode_polygon([sq(2, 0, 4, 2)]),
                        encode_polygon([sq(0, 2, 2, 4)]),
                        encode_polygon([sq(2, 2, 4, 4)]),
                    ],
                    type=pa.binary(),
                ),
            }
        )
        out = smart_repair(
            ray.data.from_arrow(t), regions=regions, fill_gaps_threshold=None
        )
        df = out.to_pandas()
        region_rings = {
            "r0": sq(0, 0, 2, 2),
            "r1": sq(2, 0, 4, 2),
            "r2": sq(0, 2, 2, 4),
            "r3": sq(2, 2, 4, 4),
        }
        for rid, g in df.groupby("__region"):
            u = boolean.union_all(
                [decode_polygons(b) for b in g["geometry"]]
            )
            uncovered = boolean.difference([[region_rings[rid]]], u)
            assert parea(uncovered) < 1e-9, rid
        # total area conserved + the whole 4x4 world tiled
        total = sum(
            parea(decode_polygons(b)) for b in df["geometry"]
        )
        assert total == pytest.approx(16.0, abs=1e-9)


class TestFanGapSplit:
    def test_donut_gap_split_among_neighbors(self):
        # square gap with 4 edge-neighbors: each gains a 0.25 fan (the
        # reference's incenter-split behavior, smart_repair.py:1094-1135)
        rings = [
            sq(x, y, x + 1, y + 1)
            for x in range(3)
            for y in range(3)
            if not (x == 1 and y == 1)
        ]
        t = pa.table(
            {
                "id": [f"g{i}" for i in range(8)],
                "geometry": pa.array(
                    [encode_polygon([r]) for r in rings], type=pa.binary()
                ),
            }
        )
        from maup_ray.geom import decode_polygons

        out = smart_repair_table(t, fill_gaps_threshold=None)
        areas = {
            i: parea(decode_polygons(b.as_py()))
            for i, b in zip(out["id"].to_pylist(), out["geometry"])
        }
        assert sum(areas.values()) == pytest.approx(9.0, abs=1e-9)
        gained = [i for i, a in areas.items() if a > 1.0 + 1e-12]
        assert len(gained) == 4  # all edge-neighbors share the gap
        assert doctor(out)["ok"]


class TestNonStarGaps:
    def test_annular_gap_refused(self):
        # hole-of-union contains an island geometry: the true gap is an
        # ANNULUS (non-simply-connected). The reference REFUSES these —
        # drop_bad_holes (ref smart_repair.py:972-1029) leaves them
        # unfilled with a warning; geometries must be unchanged.
        import warnings as _warnings

        cells, ids = [], []
        for x in range(5):
            for y in range(5):
                if 1 <= x <= 3 and 1 <= y <= 3:
                    continue
                cells.append(sq(x, y, x + 1, y + 1))
                ids.append(f"f{x}{y}")
        cells.append(sq(2, 2, 3, 3))
        ids.append("fill")
        t = pa.table(
            {
                "id": ids,
                "geometry": pa.array(
                    [encode_polygon([c]) for c in cells], type=pa.binary()
                ),
            }
        )
        with _warnings.catch_warnings(record=True) as w:
            _warnings.simplefilter("always")
            out = smart_repair_table(t, fill_gaps_threshold=None)
        assert any("non-simply-connected" in str(x.message) for x in w)
        post = doctor(out)
        assert post["n_gaps"] >= 1  # the annulus survives
        assert post["n_overlaps"] == 0
        total = sum(
            parea(decode_polygons(b.as_py())) for b in out["geometry"]
        )
        # 16 frame cells + 1 island cell; the 8-unit annulus unfilled
        assert total == pytest.approx(17.0, abs=1e-9)

    def test_u_shaped_gap_triangulated(self):
        # non-star U gap: triangulation fallback splits it among several
        # neighbors (not one absorber), exact area, doctor clean
        cells = {
            "A": sq(0, 0, 5, 1),
            "B": sq(0, 1, 1, 4),
            "C": sq(4, 1, 5, 4),
            "D": sq(1, 3, 4, 4),
            "E": sq(2, 2, 3, 3),
        }
        t = pa.table(
            {
                "id": list(cells),
                "geometry": pa.array(
                    [encode_polygon([c]) for c in cells.values()],
                    type=pa.binary(),
                ),
            }
        )
        out = smart_repair_table(t, fill_gaps_threshold=None)
        post = doctor(out)
        assert post["ok"]
        areas = {
            i: parea(decode_polygons(b.as_py()))
            for i, b in zip(out["id"].to_pylist(), out["geometry"])
        }
        # the reference-parity reduction introduces path-crossing
        # points that are not arrangement vertices; each boolean op
        # snaps them independently (2^-30 relative grid), so exact
        # conservation relaxes to snap precision — the same caveat the
        # reference documents for its GEOS path (ref :1680-1684)
        assert sum(areas.values()) == pytest.approx(20.0, abs=1e-6)
        originals = {"A": 5.0, "B": 3.0, "C": 3.0, "D": 3.0, "E": 1.0}
        gainers = [i for i in areas if areas[i] > originals[i] + 1e-9]
        assert len(gainers) >= 3  # split among several, not one absorber


class TestConvexifyGapSplit:
    """Reference parity for convexify_hole_boundaries
    (ref: smart_repair.py:2598-2787): a concave 3-neighbor L-gap.
    Per-arc shortest-path cuts are analytically known: arcs A and C cut
    straight-chord triangles; arc B hugs the reflex corner (path == arc,
    zero-area cut)."""

    def _fixture(self):
        # outer [0,4]^2; L-gap (1,1),(3,1),(3,2),(2,2),(2,3),(1,3)
        A = np.array(
            [[0.0, 0], [4, 0], [4, 2], [3, 2], [3, 1], [1, 1], [0, 1]]
        )
        B = sq(2, 2, 4, 4)
        C = np.array(
            [[0.0, 1], [1, 1], [1, 3], [2, 3], [2, 4], [0, 4]]
        )
        return pa.table(
            {
                "id": ["A", "B", "C"],
                "geometry": pa.array(
                    [encode_polygon([r]) for r in (A, B, C)],
                    type=pa.binary(),
                ),
            }
        )

    def test_convexify_pieces_exact(self):
        from maup_ray.geom import boolean
        from maup_ray.ops.smart_repair import _convexify_gap

        t = self._fixture()
        geoms = [decode_polygons(b.as_py()) for b in t["geometry"]]
        gap = [
            np.array(
                [[1.0, 1], [3, 1], [3, 2], [2, 2], [2, 3], [1, 3]]
            )
        ]
        conv = _convexify_gap(gap, geoms, [0, 1, 2])
        assert conv is not None
        additions, remaining = conv
        # A (idx 0) gets triangle (1,1),(3,1),(3,2): area 1
        assert 0 in additions and abs(parea(additions[0]) - 1.0) < 1e-9
        # C (idx 2) gets triangle (1,1),(1,3),(2,3): area 1
        assert 2 in additions and abs(parea(additions[2]) - 1.0) < 1e-9
        # B's reflex arc cuts nothing
        assert 1 not in additions
        # remaining quad (1,1),(3,2),(2,2),(2,3): area 1
        assert abs(parea(remaining) - 1.0) < 1e-9
        # piece geometry exact: A's piece == the analytic triangle
        tri_a = [[np.array([[1.0, 1], [3, 1], [3, 2]])]]
        assert parea(boolean.symmetric_difference(additions[0], tri_a)) < 1e-9
        tri_c = [[np.array([[1.0, 1], [2, 3], [1, 3]])]]
        assert parea(boolean.symmetric_difference(additions[2], tri_c)) < 1e-9

    def test_full_repair_preserves_union_and_adjacency(self):
        from maup_ray.geom import boolean
        from maup_ray.ops.adjacencies import count_overlaps

        t = self._fixture()
        out = smart_repair_table(t, fill_gaps_threshold=None)
        geoms = {
            i: decode_polygons(b.as_py())
            for i, b in zip(out["id"].to_pylist(), out["geometry"])
        }
        total = sum(parea(g) for g in geoms.values())
        assert abs(total - 16.0) < 1e-8  # gap fully filled, no overlap
        assert count_overlaps(out) == 0
        # convexify cuts landed with their owners
        tri_a = [[np.array([[1.0, 1], [3, 1], [3, 2]])]]
        assert parea(boolean.intersection(geoms["A"], tri_a)) > 1.0 - 1e-9
        tri_c = [[np.array([[1.0, 1], [2, 3], [1, 3]])]]
        assert parea(boolean.intersection(geoms["C"], tri_c)) > 1.0 - 1e-9
        # all three remain pairwise adjacent (positive shared length)
        from maup_ray.ops.smart_repair import _shared_len

        for a, b in (("A", "B"), ("B", "C"), ("A", "C")):
            assert _shared_len(geoms[a], geoms[b]) > 0


class TestIncenterTriangleSplit:
    def test_triangle_gap_splits_at_incenter(self):
        """Reference parity (smart_repair.py:1096-1130): a triangle gap
        with 3 owners splits into 3 triangles meeting at the INCENTER.
        Long skinny 3-4-5 triangle: the incenter is analytically
        (r, r) with r = 1 for legs 3 and 4 — assert each neighbor's
        gained area equals the analytic incenter-triangle area."""
        from maup_ray.geom import boolean
        from maup_ray.ops.smart_repair import _fan_split

        # right triangle (0,0),(4,0),(0,3): sides a=5 (hyp), legs 4, 3
        tri = np.array([[0.0, 0], [4, 0], [0, 3]])
        # three neighbors each owning one edge: build thin slabs outside
        A = np.array([[0.0, 0], [4, 0], [4, -1], [0, -1]])  # bottom edge
        # hypotenuse neighbor: rectangle along the hypotenuse, outside
        B = np.array([[4.0, 0], [0, 3], [3, 7], [7, 4]])
        Cg = np.array([[0.0, 3], [0, 0], [-1, 0], [-1, 3]])  # left edge
        geoms = [[[A]], [[B]], [[Cg]]]
        fans = _fan_split([tri], geoms, [0, 1, 2], 6.0)
        assert fans is not None and len(fans) == 3
        from maup_ray.geom.core import area as parea_

        got = {i: parea_(f) for i, f in fans}
        # incenter of 3-4-5 right triangle at legs on axes: (1, 1)
        # areas: bottom edge tri (0,0),(4,0),(1,1): 2.0
        #        left edge tri (0,3),(0,0),(1,1): 1.5
        #        hyp tri (4,0),(0,3),(1,1): 6 - 3.5 = 2.5
        assert abs(got[0] - 2.0) < 1e-9
        assert abs(got[2] - 1.5) < 1e-9
        assert abs(got[1] - 2.5) < 1e-9
        assert abs(sum(got.values()) - 6.0) < 1e-9


class TestReferenceRemainderSplit:
    """Parity tests for the post-convexify dispatch
    (ref smart_close_gaps :1150-1452)."""

    def test_three_run_hull_incenter_split(self):
        # square gap (0,0)-(2,2); bottom edge owned by A, right by B,
        # top+left by the L-shaped C → exactly 3 boundary arcs, no
        # exterior. The hull triangle of the arc initial vertices has
        # its incenter inside the (convex) gap, so the reference splits
        # along straight paths from the incenter to the three main
        # vertices — piece areas are analytic.
        cells = {
            "A": sq(0, -1, 2, 0),
            "B": sq(2, -1, 3, 3),  # edge-touches A and C (no corner-only contact)
            "C": np.array(  # L covering top + left
                [[-1, -1], [0, -1], [0, 2], [2, 2], [2, 3], [-1, 3]],
                dtype=float,
            ),
        }
        t = pa.table(
            {
                "id": list(cells),
                "geometry": pa.array(
                    [encode_polygon([c]) for c in cells.values()],
                    type=pa.binary(),
                ),
            }
        )
        out = smart_repair_table(t, fill_gaps_threshold=None)
        post = doctor(out)
        assert post["ok"]
        areas = {
            i: parea(decode_polygons(b.as_py()))
            for i, b in zip(out["id"].to_pylist(), out["geometry"])
        }
        originals = {"A": 2.0, "B": 4.0, "C": 6.0}
        gains = {i: areas[i] - originals[i] for i in areas}
        # reference order: convexify FIRST (ref :1055) — C's two-edge
        # arc (top+left) is cut along the (0,0)-(2,2) diagonal chord,
        # giving C the upper-left half (area 2). The remainder is the
        # lower-right TRIANGLE with 3 distinct owners, split at its
        # incenter (ref :1095-1118): incenter of (0,0),(2,0),(2,2) has
        # y = 4/(4+2√2), so A and B each gain exactly that triangle
        # area and C gains the rest. Analytic end-to-end.
        t_share = 4.0 / (4.0 + 2.0 * np.sqrt(2.0))
        assert gains["A"] == pytest.approx(t_share, abs=1e-6)
        assert gains["B"] == pytest.approx(t_share, abs=1e-6)
        assert gains["C"] == pytest.approx(4.0 - 2 * t_share, abs=1e-6)
        assert sum(gains.values()) == pytest.approx(4.0, abs=1e-6)

    def test_exterior_boundary_split_between_two(self):
        # region-nested gap with its bottom edge on the region outline
        # (owner -1): the reference splits the gap between the two real
        # neighbors along the shortest path from the opposite main
        # vertex to the nearest exterior vertex (ref :1183-1269).
        from maup_ray.geom.wkb import encode_multipolygon

        cells = {
            "P": np.array(
                [[0, 0], [1, 0], [1, 2], [2, 2], [2, 3], [0, 3]],
                dtype=float,
            ),
            "Q": np.array(
                [[3, 0], [4, 0], [4, 3], [2, 3], [2, 2], [3, 2]],
                dtype=float,
            ),
        }
        region = [[sq(0, 0, 4, 3)]]
        t = pa.table(
            {
                "id": list(cells),
                "geometry": pa.array(
                    [encode_polygon([c]) for c in cells.values()],
                    type=pa.binary(),
                ),
            }
        )
        out = smart_repair_table(
            t,
            fill_gaps_threshold=None,
            region_geometry=encode_multipolygon(region),
        )
        areas = {
            i: parea(decode_polygons(b.as_py()))
            for i, b in zip(out["id"].to_pylist(), out["geometry"])
        }
        # gap = region − P − Q (the 1..3 × 0..2 box, area 4) with its
        # bottom edge on the region outline. Reference behavior:
        # convexify cuts the (1,0)-(2,2) chord triangle to P and the
        # (3,0)-(2,2) chord triangle to Q (1.0 each); the remaining
        # triangle has 2 real owners + the exterior edge → whole-
        # triangle attach by shared perimeter (ref :1118-1133). Both
        # gain, the region tiles exactly.
        assert areas["P"] > 4.0 + 0.5
        assert areas["Q"] > 4.0 + 0.5
        assert sum(areas.values()) == pytest.approx(12.0, abs=1e-9)


class TestSmartRepairParamParity:
    """Parameter parity with ref smart_repair.py:49-60 (VERDICT r3 #4)."""

    def _quad_grid_short_wall(self):
        # 4 clean quads; A and D share a deliberate 0.02-length rook
        # edge at the center junction (ref tests/test_smart_repair.py:
        # 100-118 pattern: min_rook_length inside the repair)
        polys = {
            "a": sq(0, 0, 1, 1),
            "b": np.array([[1, 0], [2, 0], [2, 1], [1, 1]], dtype=float),
            "c": np.array(
                [[0, 1], [0.98, 1], [0.98, 2], [0, 2]], dtype=float
            ),
            "d": np.array(
                [[0.98, 1], [2, 1], [2, 2], [0.98, 2]], dtype=float
            ),
        }
        return pa.table(
            {
                "id": list(polys),
                "geometry": pa.array(
                    [encode_polygon([r]) for r in polys.values()],
                    type=pa.binary(),
                ),
            }
        )

    def test_min_rook_length_chains_rook_to_queen(self):
        from maup_ray.ops.adjacencies import adjacencies

        t = self._quad_grid_short_wall()
        plain = smart_repair(t)
        adj = adjacencies(plain, id_col="id", adjacency_type="rook")
        lens = [v for v in adj["length"].to_pylist() if v > 0]
        assert min(lens) < 0.05  # the short a-d wall survives

        srtq = smart_repair(t, min_rook_length=0.05)
        adj2 = adjacencies(srtq, id_col="id", adjacency_type="rook")
        lens2 = [v for v in adj2["length"].to_pylist() if v > 0]
        assert min(lens2) > 0.05  # converted to queen inside repair
        # area conserved through the conversion
        tot_in = sum(
            parea(decode_polygons(b.as_py())) for b in t["geometry"]
        )
        tot_out = sum(
            parea(decode_polygons(b.as_py())) for b in srtq["geometry"]
        )
        assert abs(tot_in - tot_out) < 1e-6

    def test_snapped_false_skips_grid_snap(self):
        # one clean square with a non-grid vertex: snapped=True at a
        # coarse precision moves it to the 10^-2 grid, snapped=False
        # leaves it (up to the boolean kernels' 2^-30 relative snap)
        ring = np.array(
            [[0, 0], [1, 0], [1, 1], [0.123456, 1]], dtype=float
        )
        t = pa.table(
            {
                "id": ["z"],
                "geometry": pa.array(
                    [encode_polygon([ring])], type=pa.binary()
                ),
            }
        )
        snapped_out = smart_repair_table(t, snap_precision=2)
        xs = np.vstack(
            decode_polygons(snapped_out["geometry"][0].as_py())[0]
        )[:, 0]
        assert np.any(np.isclose(xs, 0.12, atol=1e-9))
        raw_out = smart_repair_table(t, snapped=False)
        xs2 = np.vstack(
            decode_polygons(raw_out["geometry"][0].as_py())[0]
        )[:, 0]
        assert np.any(np.isclose(xs2, 0.123456, atol=1e-6))
        assert not np.any(np.isclose(xs2, 0.12, atol=1e-9))

    def test_reattach_fragment_by_shared_perimeter(self):
        from maup_ray.ops.smart_repair import _reattach_fragments

        # direct contract of the ref :330-470 loop: geometry 0 came
        # out with an excess tiny component touching geometry 1 — it
        # must move to geometry 1 under the threshold, stay otherwise
        def mp(*rects):
            return [[r] for r in rects]

        big = sq(0, 0, 1, 1)
        sliver = sq(1.9, 0, 2.0, 1)  # area 0.1, touches neighbor at x=1.9
        neighbor = sq(1, 0, 1.9, 1)
        out_geoms = [mp(big, sliver), mp(neighbor)]
        _reattach_fragments(
            out_geoms, [1, 1], [3.0, 0.9], 0.05, ["g0", "g1"]
        )
        assert len(out_geoms[0]) == 1  # sliver gone from g0
        assert abs(parea(out_geoms[0]) - 1.0) < 1e-12
        assert abs(parea(out_geoms[1]) - 1.0) < 1e-12  # absorbed

        # below-threshold case: 0.1/3.0 > 0.01 -> left in place (warns)
        out_geoms = [mp(big, sliver), mp(neighbor)]
        with pytest.warns(UserWarning, match="disconnected"):
            _reattach_fragments(
                out_geoms, [1, 1], [3.0, 0.9], 0.01, ["g0", "g1"]
            )
        assert len(out_geoms[0]) == 2

    def test_isolated_fragment_stays(self):
        from maup_ray.ops.smart_repair import _reattach_fragments

        # no touching neighbor -> fragment is left alone (ref :431-433)
        big = sq(0, 0, 1, 1)
        island = sq(5, 5, 5.1, 5.1)
        out_geoms = [[[big], [island]], [[sq(1, 0, 2, 1)]]]
        with pytest.warns(UserWarning, match="disconnected"):
            _reattach_fragments(
                out_geoms, [1, 1], [2.0, 1.0], 0.5, ["g0", "g1"]
            )
        assert len(out_geoms[0]) == 2
