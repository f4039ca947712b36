"""dissolve (grouped polygon union) — brute-force + structure tests."""

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.geom.wkb import encode_polygon, encode_rings_bulk
from maup_ray.ops.dissolve import dissolve, dissolve_stats


def _rect(x0, y0, x1, y1):
    return [
        np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64
        )
    ]


def _rect_table(ids, G=4, D=8):
    ids = np.asarray(ids, dtype=np.int64)
    g = ids % G
    rnk = ids // G
    h = (ids * 7 + 3) % 5 + 4
    ext = np.array([-2, 1, 2, 3])[(ids * 11 + 1) % 4]
    n = len(ids)
    P = np.empty((n, 4, 2), dtype=np.float64)
    P[:, 0, 0] = rnk * D
    P[:, 0, 1] = 0
    P[:, 1, 0] = rnk * D + D + ext
    P[:, 1, 1] = 0
    P[:, 2, 0] = rnk * D + D + ext
    P[:, 2, 1] = h
    P[:, 3, 0] = rnk * D
    P[:, 3, 1] = h
    tbl = pa.table(
        {
            "district": pa.array(g, type=pa.int64()),
            "geometry": encode_rings_bulk(
                P, np.full(n, 4, dtype=np.int64)
            ),
            "val": pa.array((ids * 3 + 1).astype(np.float64)),
        }
    )
    return tbl, (g, rnk, h, ext, D)


def _closed_form(ids, struct):
    g, rnk, h, ext, D = struct
    by = {(int(a), int(b)): i for i, (a, b) in enumerate(zip(g, rnk))}
    out = {}
    for i, gi in enumerate(g):
        gi = int(gi)
        a, n, ov, m = out.get(gi, (0, 0, 0, 0))
        out[gi] = (a + (D + int(ext[i])) * int(h[i]), n + 1, ov, m)
    for i, gi in enumerate(g):
        gi = int(gi)
        j = by.get((gi, int(rnk[i]) + 1))
        if j is not None and ext[i] > 0:
            a, n, ov, m = out[gi]
            out[gi] = (a, n, ov + int(ext[i]) * min(int(h[i]), int(h[j])), m + 1)
    return {
        k: (float(a - ov), n - m) for k, (a, n, ov, m) in out.items()
    }


class TestDissolve:
    def test_rect_chains_match_closed_form(self):
        ids = np.r_[np.arange(37), [80, 84, 92]]  # gaps in rnk too
        tbl, struct = _rect_table(ids)
        got = dissolve_stats(tbl, "district", sum_cols=("val",))
        want = _closed_form(ids, struct)
        assert got.num_rows == len(want)
        for r in got.to_pylist():
            wa, wn = want[r["district"]]
            assert r["union_area"] == wa
            assert r["n_polys"] == wn
            assert r["n_holes"] == 0

    def test_sum_cols_exact(self):
        ids = np.arange(20)
        tbl, _ = _rect_table(ids)
        got = dissolve_stats(tbl, "district", sum_cols=("val",))
        v = (ids * 3 + 1).astype(np.float64)
        for r in got.to_pylist():
            assert r["sum_val"] == float(v[ids % 4 == r["district"]].sum())

    def test_hole_forms_and_geometry_roundtrip(self):
        # four rects forming a square ring -> union has exactly 1 hole
        frame = [
            _rect(0, 0, 10, 2),
            _rect(0, 8, 10, 10),
            _rect(0, 0, 2, 10),
            _rect(8, 0, 10, 10),
        ]
        tbl = pa.table(
            {
                "district": pa.array([7, 7, 7, 7], type=pa.int64()),
                "geometry": pa.array(
                    [encode_polygon(p) for p in frame], type=pa.binary()
                ),
            }
        )
        out = dissolve(tbl, "district")
        r = out.to_pylist()[0]
        assert r["n_polys"] == 1
        assert r["n_holes"] == 1
        # frame area: 10*10 outer minus 6*6 hole
        assert r["union_area"] == 64.0
        from maup_ray.geom.core import area as parea
        from maup_ray.geom.wkb import decode_polygons

        assert parea(decode_polygons(r["geometry"])) == 64.0

    def test_dataset_partition_invariant(self, ray_session):
        import ray.data

        ids = np.arange(100)
        tbl, _ = _rect_table(ids, G=8)
        want = dissolve_stats(tbl, "district", sum_cols=("val",))
        for nparts in (1, 9):
            ds = ray.data.from_arrow(tbl).repartition(nparts)
            got = dissolve_stats(ds, "district", sum_cols=("val",))
            assert got.equals(want)

    def test_empty_input(self):
        tbl = pa.table(
            {
                "district": pa.array([], type=pa.int64()),
                "geometry": pa.array([], type=pa.binary()),
            }
        )
        out = dissolve_stats(tbl, "district")
        assert out.num_rows == 0
        assert out.schema.field("n_polys").type == pa.int64()
