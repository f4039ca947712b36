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


class TestErase:
    def test_band_mask_closed_form(self, ray_session):
        import ray.data

        from maup_ray.ops.overlay import erase

        widths_heights = [(6, 4), (9, 5), (10, 6), (11, 8), (7, 7)]
        rows = []
        for i, (w, h) in enumerate(widths_heights):
            rows.append(
                (i, encode_polygon(_rect(i * 20, 0, i * 20 + w, h)))
            )
        tbl = pa.table(
            {
                "id": pa.array([r[0] for r in rows], type=pa.int64()),
                "geometry": pa.array(
                    [r[1] for r in rows], type=pa.binary()
                ),
            }
        )
        mask = pa.table(
            {"geometry": pa.array(
                [encode_polygon(_rect(-5, 3, 200, 5))],
                type=pa.binary())}
        )
        for inp in (tbl, ray.data.from_arrow(tbl).repartition(3)):
            out = erase(inp, mask, id_col="id")
            if not isinstance(out, pa.Table):
                out = pa.concat_tables(
                    [pa.Table.from_pandas(out.to_pandas())]
                )
            got = {r["id"]: (r["area"], r["n_polys"])
                   for r in out.to_pylist()}
            for i, (w, h) in enumerate(widths_heights):
                assert got[i] == (
                    float(w * (3 + max(h - 5, 0))), 1 + (h > 5)
                )

    def test_fully_erased_and_disjoint(self):
        from maup_ray.ops.overlay import erase

        mask = pa.table(
            {"geometry": pa.array(
                [encode_polygon(_rect(-5, 3, 200, 5))],
                type=pa.binary())}
        )
        inside = pa.table(
            {"id": pa.array([9], type=pa.int64()),
             "geometry": pa.array(
                 [encode_polygon(_rect(0, 3, 2, 5))],
                 type=pa.binary())}
        )
        r = erase(inside, mask, id_col="id").to_pylist()[0]
        assert r["area"] == 0.0 and r["n_polys"] == 0
        away = pa.table(
            {"id": pa.array([10], type=pa.int64()),
             "geometry": pa.array(
                 [encode_polygon(_rect(0, 10, 2, 12))],
                 type=pa.binary())}
        )
        r = erase(away, mask, id_col="id").to_pylist()[0]
        assert r["area"] == 4.0 and r["n_polys"] == 1

    def test_multi_rect_mask_unions_first(self):
        from maup_ray.ops.overlay import erase

        # two overlapping mask rects — must behave as their union
        mask = pa.table(
            {"geometry": pa.array(
                [encode_polygon(_rect(0, 0, 6, 10)),
                 encode_polygon(_rect(4, 0, 10, 10))],
                type=pa.binary())}
        )
        parcel = pa.table(
            {"id": pa.array([0], type=pa.int64()),
             "geometry": pa.array(
                 [encode_polygon(_rect(0, 0, 12, 10))],
                 type=pa.binary())}
        )
        r = erase(parcel, mask, id_col="id").to_pylist()[0]
        assert r["area"] == 20.0 and r["n_polys"] == 1

    def test_mask_size_guard(self):
        from maup_ray.ops.overlay import erase

        mask = pa.table(
            {"geometry": pa.array(
                [encode_polygon(_rect(0, 0, 1, 1))] * 5,
                type=pa.binary())}
        )
        with pytest.raises(ValueError, match="broadcast_limit"):
            erase(pa.table({"id": pa.array([0]),
                            "geometry": pa.array([b""])}),
                  mask, id_col="id", broadcast_limit=3)


@pytest.mark.skipif(
    not __import__("os").environ.get("GRAFT_SLOW"),
    reason="dissolve scale soak (set GRAFT_SLOW=1)",
)
class TestDissolveScaleSoak:
    def test_50k_rects_partition_invariant(self, ray_session):
        import ray.data

        ids = np.arange(50_000)
        tbl, struct = _rect_table(ids, G=256)
        want = _closed_form(ids, struct)
        for nparts in (8, 64):
            ds = ray.data.from_arrow(tbl).repartition(nparts)
            got = dissolve_stats(ds, "district")
            assert got.num_rows == 256
            for r in got.to_pylist():
                wa, wn = want[r["district"]]
                assert r["union_area"] == wa
                assert r["n_polys"] == wn
