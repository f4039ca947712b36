"""sources.geopackage — stdlib-sqlite GeoPackage ingestion, fixture
built in-test with sqlite3 + hand-encoded GeoPackageBinary blobs."""

import sqlite3
import struct

import numpy as np
import pytest

from maup_ray.sources.geopackage import (
    geopackage_dataset,
    geopackage_layers,
    read_geopackage,
)


def _wkb_polygon(rings):
    out = [struct.pack("<BI", 1, 3), struct.pack("<I", len(rings))]
    for r in rings:
        closed = list(r) + [r[0]]
        out.append(struct.pack("<I", len(closed)))
        for x, y in closed:
            out.append(struct.pack("<dd", x, y))
    return b"".join(out)


def _gpb(wkb: bytes, with_envelope=False, empty=False) -> bytes:
    flags = 0b0001  # little-endian
    env = b""
    if with_envelope:
        flags |= 0b0010  # envelope code 1 (minx maxx miny maxy)
        env = struct.pack("<4d", 0.0, 10.0, 0.0, 10.0)
    if empty:
        flags |= 0b10000
    return b"GP" + bytes([0, flags]) + struct.pack("<i", 4326) + env + wkb


SQ = [[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)]]
HOLED = [
    [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)],
    [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0)],
]


def _make_gpkg(path):
    con = sqlite3.connect(path)
    con.executescript(
        """
        CREATE TABLE gpkg_contents (
          table_name TEXT PRIMARY KEY, data_type TEXT, identifier TEXT);
        CREATE TABLE gpkg_geometry_columns (
          table_name TEXT, column_name TEXT, geometry_type_name TEXT,
          srs_id INTEGER);
        CREATE TABLE parcels (
          fid INTEGER PRIMARY KEY, name TEXT, pop INTEGER, geom BLOB);
        CREATE TABLE roads_attr_only (fid INTEGER PRIMARY KEY);
        INSERT INTO gpkg_contents VALUES
          ('parcels', 'features', 'parcels'),
          ('roads_attr_only', 'attributes', 'roads');
        INSERT INTO gpkg_geometry_columns VALUES
          ('parcels', 'geom', 'POLYGON', 4326);
        """
    )
    con.execute(
        "INSERT INTO parcels VALUES (1, 'sq', 10, ?)",
        (_gpb(_wkb_polygon(SQ)),),
    )
    con.execute(
        "INSERT INTO parcels VALUES (2, 'holed', 20, ?)",
        (_gpb(_wkb_polygon(HOLED), with_envelope=True),),
    )
    con.execute(
        "INSERT INTO parcels VALUES (3, 'null', 0, NULL)"
    )
    con.commit()
    con.close()


class TestReader:
    def test_layers_and_parse(self, tmp_path):
        p = str(tmp_path / "a.gpkg")
        _make_gpkg(p)
        assert geopackage_layers(p) == ["parcels"]
        t = read_geopackage(p)
        assert t.num_rows == 3
        assert t.column_names == ["fid", "name", "pop", "geometry"]
        assert t["geometry"].null_count == 1

    def test_geometry_decodes_with_hole(self, tmp_path):
        from maup_ray.geom.core import area
        from maup_ray.geom.wkb import decode_polygons

        p = str(tmp_path / "b.gpkg")
        _make_gpkg(p)
        t = read_geopackage(p)
        assert area(decode_polygons(t["geometry"][0].as_py())) == 4.0
        # envelope skipped correctly; 4x4 minus 1x1 hole
        assert area(decode_polygons(t["geometry"][1].as_py())) == 15.0

    def test_bytes_input_via_deserialize(self, tmp_path):
        p = str(tmp_path / "c.gpkg")
        _make_gpkg(p)
        data = open(p, "rb").read()
        t = read_geopackage(data)
        assert t.num_rows == 3

    def test_unknown_layer_raises(self, tmp_path):
        p = str(tmp_path / "d.gpkg")
        _make_gpkg(p)
        with pytest.raises(ValueError, match="not in"):
            read_geopackage(p, layer="nope")


class TestDistributed:
    def test_many_files(self, ray_session, tmp_path):
        paths = []
        for i in range(4):
            p = str(tmp_path / f"t{i}.gpkg")
            _make_gpkg(p)
            paths.append(p)
        df = geopackage_dataset(paths).to_pandas()
        assert len(df) == 12
        assert set(df["name"]) == {"sq", "holed", "null"}
