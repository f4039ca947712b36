"""sources.geojson — RFC 7946 source/sink: parse, roundtrip, the
distributed many-files path, and an operator consuming GeoJSON input."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.sources import (
    geojson_dataset,
    read_geojson,
    table_to_geojson,
    write_geojson,
)


def _fc(features):
    return {"type": "FeatureCollection", "features": features}


def _sq(x0, y0, s, **props):
    return {
        "type": "Feature",
        "properties": props,
        "geometry": {
            "type": "Polygon",
            "coordinates": [
                [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s],
                 [x0, y0 + s], [x0, y0]]
            ],
        },
    }


MIXED = _fc(
    [
        {
            "type": "Feature",
            "id": 7,
            "properties": {"name": "holed", "pop": 10},
            "geometry": {
                "type": "Polygon",
                "coordinates": [
                    [[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]],
                    [[0.5, 0.5], [1, 0.5], [1, 1], [0.5, 1], [0.5, 0.5]],
                ],
            },
        },
        {
            "type": "Feature",
            "properties": {"name": "mp", "pop": 3},
            "geometry": {
                "type": "MultiPolygon",
                "coordinates": [[[[5, 5], [6, 5], [6, 6], [5, 5]]]],
            },
        },
        {
            "type": "Feature",
            "properties": {"name": "ln", "pop": None},
            "geometry": {
                "type": "LineString",
                "coordinates": [[0, 0], [1, 1], [2, 0]],
            },
        },
        {
            "type": "Feature",
            "properties": {"name": "pt", "pop": 1},
            "geometry": {"type": "Point", "coordinates": [3.5, 4.5]},
        },
        {
            "type": "Feature",
            "properties": {"name": "none", "pop": 0},
            "geometry": None,
        },
    ]
)


class TestReader:
    def test_parse_types_and_feature_id(self):
        t = read_geojson(json.dumps(MIXED).encode())
        assert t.num_rows == 5
        assert t["pop"].type == pa.int64()
        assert t["name"].type == pa.string()
        assert t["id"].to_pylist() == [7, None, None, None, None]
        assert t["geometry"].null_count == 1

    def test_polygon_hole_area_and_orientation(self):
        from maup_ray.geom.core import area
        from maup_ray.geom.wkb import decode_polygons

        t = read_geojson(MIXED)
        assert area(decode_polygons(t["geometry"][0].as_py())) == (
            pytest.approx(3.75)
        )

    def test_winding_violations_are_normalized(self):
        # same square, once CCW, once CW: identical engine WKB
        ccw = _sq(0, 0, 1)
        cw = {
            "type": "Feature",
            "properties": {},
            "geometry": {
                "type": "Polygon",
                "coordinates": [
                    list(reversed(ccw["geometry"]["coordinates"][0]))
                ],
            },
        }
        from maup_ray.geom.core import ring_signed_area
        from maup_ray.geom.wkb import decode_polygons

        for doc in (ccw, cw):
            t = read_geojson(_fc([doc]))
            mp = decode_polygons(t["geometry"][0].as_py())
            # shells CCW (positive signed area) either way
            assert ring_signed_area(mp[0][0]) > 0

    def test_bare_feature_and_bare_geometry(self):
        f = _sq(1, 1, 2, tag="x")
        assert read_geojson(f).num_rows == 1
        assert read_geojson(f["geometry"]).num_rows == 1

    def test_geometry_collection_flattens(self):
        from maup_ray.geom.core import area
        from maup_ray.geom.wkb import decode_polygons

        gc = {
            "type": "Feature",
            "properties": {},
            "geometry": {
                "type": "GeometryCollection",
                "geometries": [
                    _sq(0, 0, 1)["geometry"],
                    _sq(10, 10, 2)["geometry"],
                    {"type": "Point", "coordinates": [0, 0]},
                ],
            },
        }
        t = read_geojson(_fc([gc]))
        assert area(decode_polygons(t["geometry"][0].as_py())) == (
            pytest.approx(5.0)
        )


class TestRoundtrip:
    def test_table_roundtrip_geometry_exact(self):
        t = read_geojson(MIXED)
        t2 = read_geojson(json.loads(table_to_geojson(t)))
        assert t["geometry"].to_pylist() == t2["geometry"].to_pylist()
        for c in ("name", "pop"):
            assert t[c].to_pylist() == t2[c].to_pylist()


class TestDistributed:
    def test_many_files_parse_in_parallel(self, ray_session, tmp_path):
        paths = []
        for i in range(6):
            p = tmp_path / f"tile{i}.geojson"
            p.write_text(
                json.dumps(
                    _fc([_sq(i * 10 + j, 0, 1, tile=i, cell=j)
                         for j in range(4)])
                )
            )
            paths.append(str(p))
        ds = geojson_dataset(paths)
        df = ds.to_pandas()
        assert len(df) == 24
        assert set(df["tile"]) == set(range(6))

    def test_assign_runs_on_geojson_input(self, ray_session, tmp_path):
        # 4 unit squares assigned to 2 rectangle districts
        import ray.data

        from maup_ray.ops.assign import assign

        src = tmp_path / "blocks.geojson"
        src.write_text(
            json.dumps(
                _fc([_sq(float(i), 0.0, 1.0, bid=i) for i in range(4)])
            )
        )
        blocks = geojson_dataset([str(src)]).map_batches(
            lambda b: pa.table(
                {"source_id": b["bid"], "geometry": b["geometry"]}
            ),
            batch_format="pyarrow",
        )
        tgt = read_geojson(
            _fc(
                [
                    _sq(0.0, -1.0, 2.0, district_id=0)
                    | {},
                    _sq(2.0, -1.0, 2.0, district_id=1),
                ]
            )
        ).select(["district_id", "geometry"])
        out = assign(
            blocks,
            tgt,
            targets_id_col="district_id",
        ).to_pandas().sort_values("source_id")
        assert list(out["target_id"]) == [0, 0, 1, 1]

    def test_write_geojson_block_files_and_single(
        self, ray_session, tmp_path
    ):
        import ray.data

        t = read_geojson(
            _fc([_sq(i, 0, 1, bid=i) for i in range(8)])
        )
        ds = ray.data.from_arrow(t).repartition(3)
        outdir = str(tmp_path / "out")
        paths = write_geojson(ds, outdir)
        assert all(os.path.exists(p) for p in paths)
        back = pa.concat_tables(
            [read_geojson(p) for p in sorted(paths)],
            promote_options="default",
        )
        assert back.num_rows == 8
        assert set(back["bid"].to_pylist()) == set(range(8))
        single = str(tmp_path / "one.geojson")
        write_geojson(ds, single, single_file=True)
        assert read_geojson(single).num_rows == 8
