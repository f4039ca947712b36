"""sources.shapefile — pure-Python shapefile ingestion + the
reference's own example corpus run E2E through the engine
(ref: tests/test_assign.py:144-160 test_example_case)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from maup_ray.sources import read_shapefile_zip

EXAMPLES = "/root/reference/examples"


def _load(name):
    return read_shapefile_zip(f"{EXAMPLES}/{name}.zip")


class TestReader:
    def test_blocks_shape(self):
        t = _load("blocks")
        assert t.num_rows == 3014  # the real Providence block corpus
        assert "geometry" in t.column_names
        assert t["TOTPOP"].type == pa.int64()
        assert t["GEOID10"].type == pa.string()
        assert t["WARD"].type == pa.float64()  # N with decimals
        assert t["geometry"].null_count == 0

    def test_geometry_decodes_positive_area(self):
        from maup_ray.geom.core import area as parea
        from maup_ray.geom.wkb import decode_polygons

        t = _load("districts")
        areas = [
            parea(decode_polygons(b.as_py())) for b in t["geometry"]
        ]
        assert len(areas) == 15
        assert all(a > 0 for a in areas)

    def test_blocks_union_matches_districts_union_area(self):
        # blocks and districts tile the same city footprint: their
        # total areas agree to high precision (same source data)
        from maup_ray.geom.core import area as parea
        from maup_ray.geom.wkb import decode_polygons

        def total(name):
            t = _load(name)
            return sum(
                parea(decode_polygons(b.as_py())) for b in t["geometry"]
            )

        a, b = total("blocks"), total("districts")
        assert abs(a - b) / b < 1e-6

    def test_dataset_path(self, ray_session):
        from maup_ray.sources import shapefile_dataset

        ds = shapefile_dataset(
            [f"{EXAMPLES}/districts.zip", f"{EXAMPLES}/new_precincts.zip"]
        )
        # column union across files → nulls where absent; row count is
        # the concatenation of both corpora
        assert ds.count() == 15 + 55


class TestExampleCase:
    """The reference's test_example_case (tests/test_assign.py:144-160)
    replayed through the engine in the corpus' native CRS."""

    @pytest.fixture(scope="class")
    def assigned(self, ray_session):
        import ray.data

        from maup_ray.ops.assign import assign

        blocks = _load("blocks")
        precincts = _load("new_precincts")
        srcs = pa.table(
            {
                "source_id": blocks["GEOID10"],
                "geometry": blocks["geometry"],
                "TOTPOP": blocks["TOTPOP"],
                "BVAP": blocks["BVAP"],
                "WVAP": blocks["WVAP"],
                "HISP": blocks["HISP"],
            }
        )
        tgts = pa.table(
            {
                "target_id": precincts["index"],
                "geometry": precincts["geometry"],
            }
        )
        out = assign(
            ray.data.from_arrow(srcs),
            tgts,
            keep_cols=("TOTPOP", "BVAP", "WVAP", "HISP"),
        ).to_pandas()
        return out, blocks, precincts

    def test_some_units_unassigned(self, assigned):
        out, _, _ = assigned
        # the reference pytest.warns AssigmentWarning: the corpus does
        # not neatly cover, so SOME blocks stay unassigned — but most
        # are assigned
        n_null = int(out["target_id"].isna().sum())
        assert 0 < n_null < len(out) * 0.5
        assert len(out) == 3014

    def test_population_mostly_conserved(self, assigned):
        # ref: abs(precinct_sum - block_sum)/block_sum < 0.5 per column
        out, blocks, precincts = assigned
        got = out.dropna(subset=["target_id"])
        for col in ("TOTPOP", "BVAP", "WVAP", "HISP"):
            total = float(
                pc.sum(blocks[col]).as_py() or 0
            )
            assigned_sum = float(got[col].sum())
            assert abs(assigned_sum - total) / total < 0.5

    def test_precincts_receive_population(self, assigned):
        # ref: (precincts[columns] > 0).sum().sum() > len(precincts)
        out, _, precincts = assigned
        got = out.dropna(subset=["target_id"])
        sums = got.groupby("target_id")[
            ["TOTPOP", "BVAP", "WVAP", "HISP"]
        ].sum()
        assert int((sums > 0).sum().sum()) > precincts.num_rows
