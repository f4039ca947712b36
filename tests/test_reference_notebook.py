"""Replays of the reference's smart_repair demo notebook
(ref: notebooks/"Maup smart_repair demo.ipynb") — the toy_precincts
fixture is generated with stdlib ``random.seed(2023)`` exactly as the
notebook does, so the notebook's PUBLISHED outputs are hard oracle
values: doctor reports 28 overlaps / 23 holes on the raw fixture, and
smart_repair leaves it doctor-clean."""

import random

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.geom import decode_polygons, encode_polygon
from maup_ray.geom import area as parea
from maup_ray.ops.repair import doctor
from maup_ray.ops.smart_repair import smart_repair, smart_repair_table


def toy_precincts() -> pa.Table:
    """Notebook cell 3, verbatim arithmetic (stdlib random is
    deterministic across Python versions for random())."""
    random.seed(2023)
    rings = []
    for i in range(4):
        for j in range(4):
            pts = (
                [
                    (0.5 * i + 0.1 * k, 0.5 * j + (random.random() - 0.5) / 12)
                    for k in range(6)
                ]
                + [
                    (0.5 * (i + 1) + (random.random() - 0.5) / 12, 0.5 * j + 0.1 * k)
                    for k in range(1, 6)
                ]
                + [
                    (0.5 * (i + 1) - 0.1 * k, 0.5 * (j + 1) + (random.random() - 0.5) / 12)
                    for k in range(1, 6)
                ]
                + [
                    (0.5 * i + (random.random() - 0.5) / 12, 0.5 * (j + 1) - 0.1 * k)
                    for k in range(1, 5)
                ]
            )
            rings.append(np.array(pts, dtype=float))
    return pa.table(
        {
            "id": list(range(16)),
            "geometry": pa.array(
                [encode_polygon([r]) for r in rings], type=pa.binary()
            ),
        }
    )


class TestToyPrecincts:
    def test_doctor_matches_notebook(self):
        # notebook cell 6 output: "There are 28 overlaps. / There are
        # 23 holes." → False
        d = doctor(toy_precincts())
        assert d["n_overlaps"] == 28
        assert d["n_gaps"] == 23
        assert not d["ok"]

    def test_smart_repair_heals(self):
        # notebook cells 8-10: smart_repair(toy_precincts_df) →
        # maup.doctor(...) == True
        t = toy_precincts()
        out = smart_repair_table(t, fill_gaps_threshold=None)
        d = doctor(out)
        assert d["ok"], d
        # area sanity: output tiles at least the input union (gaps get
        # filled, overlaps resolved once)
        from maup_ray.ops.repair import union_all_table

        total = sum(
            parea(decode_polygons(b.as_py())) for b in out["geometry"]
        )
        assert total >= parea(union_all_table(t)) - 1e-9

    def test_county_aware_repair(self, ray_session):
        # notebook cells 13-16: nest_within_regions=toy_counties →
        # region-aware repair; every region ends exactly tiled by its
        # precincts
        import ray.data

        from maup_ray.geom import boolean

        def sq(x0, y0, x1, y1):
            return np.array(
                [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float
            )

        counties = pa.table(
            {
                "region_id": ["c0", "c1", "c2", "c3"],
                "geometry": pa.array(
                    [
                        encode_polygon([sq(0, 0, 1, 1)]),
                        encode_polygon([sq(1, 0, 2, 1)]),
                        encode_polygon([sq(0, 1, 1, 2)]),
                        encode_polygon([sq(1, 1, 2, 2)]),
                    ],
                    type=pa.binary(),
                ),
            }
        )
        rings = {
            "c0": sq(0, 0, 1, 1),
            "c1": sq(1, 0, 2, 1),
            "c2": sq(0, 1, 1, 2),
            "c3": sq(1, 1, 2, 2),
        }
        out = smart_repair(
            ray.data.from_arrow(toy_precincts()),
            regions=counties,
            fill_gaps_threshold=None,
        )
        df = out.to_pandas()
        assert len(df) == 16
        for rid, g in df.groupby("__region"):
            u = boolean.union_all(
                [decode_polygons(b) for b in g["geometry"]]
            )
            uncovered = boolean.difference([[rings[rid]]], u)
            assert parea(uncovered) < 1e-9, rid
        total = sum(parea(decode_polygons(b)) for b in df["geometry"])
        assert total == pytest.approx(4.0, abs=1e-6)
