"""geom.exactpred — exact rational overlap evidence: soundness on
touch/containment/crossing fixtures and hairline regression cases."""

import numpy as np

from maup_ray.geom.exactpred import overlap_evidence

BOX = (-100.0, -100.0, 100.0, 100.0)


def sq(x0, y0, s):
    return [
        [
            np.array(
                [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]],
                dtype=np.float64,
            )
        ]
    ]


class TestEvidence:
    def test_proper_crossing(self):
        assert overlap_evidence(sq(0, 0, 2), sq(1, 1, 2), BOX)

    def test_shared_edge_no_evidence(self):
        assert not overlap_evidence(sq(0, 0, 2), sq(2, 0, 2), BOX)

    def test_vertex_touch_no_evidence(self):
        assert not overlap_evidence(sq(0, 0, 2), sq(2, 2, 2), BOX)

    def test_identical_no_false_positive_from_midpoints(self):
        # identical polygons: every midpoint/vertex is ON the other's
        # boundary — evidence must come back clean (the overlap is
        # genuine but witnessed only by degeneracies; callers never
        # reach exactpred for full-area intersections)
        assert not overlap_evidence(sq(0, 0, 2), sq(0, 0, 2), BOX)

    def test_containment(self):
        assert overlap_evidence(sq(0, 0, 2), sq(0.5, 0.5, 0.1), BOX)

    def test_hairline_1e12_overlap(self):
        assert overlap_evidence(sq(0, 0, 2), sq(2 - 1e-12, 0, 2), BOX)

    def test_hairline_separation_no_evidence(self):
        # disjoint by one ulp-scale gap: must NOT be evidence
        assert not overlap_evidence(sq(0, 0, 2), sq(2 + 1e-12, 0, 2), BOX)

    def test_collinear_overlap_caught_by_midpoint(self):
        # same-height rectangles overlapping along x: no proper
        # crossing (all contacts collinear/endpoint), no vertex
        # strictly inside — only an edge midpoint witnesses it
        a = sq(0, 0, 2)
        b = [
            [
                np.array(
                    [[1.0, 0.0], [3.0, 0.0], [3.0, 2.0], [1.0, 2.0]],
                    dtype=np.float64,
                )
            ]
        ]
        assert overlap_evidence(a, b, BOX)

    def test_t_junction_vertex_on_edge_no_evidence(self):
        # b's corner lies exactly ON a's right edge interior
        a = sq(0, 0, 2)
        b = [
            [
                np.array(
                    [[2.0, 0.5], [4.0, 0.5], [4.0, 1.5], [2.0, 1.5]],
                    dtype=np.float64,
                )
            ]
        ]
        assert not overlap_evidence(a, b, BOX)

    def test_shared_vertex_chain_tiling(self):
        # three squares tiling a row with exactly-shared borders:
        # no pair shows evidence
        a, b, c = sq(0, 0, 1), sq(1, 0, 1), sq(2, 0, 1)
        assert not overlap_evidence(a, b, BOX)
        assert not overlap_evidence(b, c, BOX)
        assert not overlap_evidence(a, c, BOX)

    def test_box_restriction_misses_far_overlap(self):
        # evidence search is local to the box by contract
        assert not overlap_evidence(
            sq(50, 50, 2), sq(51, 51, 2), (-10.0, -10.0, 10.0, 10.0)
        )
