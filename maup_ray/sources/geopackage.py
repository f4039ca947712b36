"""GeoPackage (OGC 12-128r1) reader → Arrow (stdlib sqlite3, no GDAL).

Third leg of the reference's ``geopandas.read_file`` format coverage
(shapefile zips and GeoJSON are the other two): a .gpkg is a SQLite
database whose feature tables are registered in ``gpkg_contents`` /
``gpkg_geometry_columns`` and whose geometry column holds
GeoPackageBinary blobs — an 8-byte header (+ optional envelope)
followed by standard ISO WKB. The WKB is decoded with the engine's
own parser and re-encoded, which normalizes ring orientation to the
engine convention on the way in.

Scale shape: one .gpkg reads in one task (``geopackage_dataset`` maps
the parser over ``ray.data.read_binary_files``; the bytes are opened
in-memory via ``sqlite3.Connection.deserialize``). A sharded corpus
of per-tile gpkg files parses in parallel; a single monolithic file
is a driver-side read, bounded by the format's practical size.
"""

from __future__ import annotations

import sqlite3
import struct
import tempfile

import numpy as np
import pyarrow as pa

from ..geom.wkb import (
    decode,
    encode_lines,
    encode_multipolygon,
    encode_points,
)

__all__ = ["read_geopackage", "geopackage_layers", "geopackage_dataset"]


def _gpb_to_wkb(blob: bytes | None) -> bytes | None:
    """GeoPackageBinary blob → engine WKB (orientation-normalized)."""
    if blob is None:
        return None
    if len(blob) < 8 or blob[:2] != b"GP":
        raise ValueError("not a GeoPackageBinary blob")
    flags = blob[3]
    if flags & 0b100000:  # extended GPB (type 1): 4-byte extension code
        raise NotImplementedError("extended GeoPackageBinary")
    env_code = (flags >> 1) & 0b111
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(env_code)
    if env_len is None:
        raise ValueError(f"invalid GPB envelope code {env_code}")
    if flags & 0b10000:  # empty-geometry flag
        return None
    parts = decode(bytes(blob[8 + env_len :]))
    if parts.polygons:
        return encode_multipolygon(parts.polygons)
    if parts.lines:
        return encode_lines(parts.lines)
    if len(parts.points):
        return encode_points(parts.points)
    return None


def _connect(src) -> sqlite3.Connection:
    if isinstance(src, (bytes, bytearray)):
        con = sqlite3.connect(":memory:")
        con.deserialize(bytes(src))
        return con
    return sqlite3.connect(src)


def geopackage_layers(src) -> list[str]:
    """Feature-table names registered in the GeoPackage."""
    con = _connect(src)
    try:
        rows = con.execute(
            "SELECT table_name FROM gpkg_contents"
            " WHERE data_type='features' ORDER BY table_name"
        ).fetchall()
        return [r[0] for r in rows]
    finally:
        con.close()


def read_geopackage(
    src, layer: str | None = None, geometry_col: str = "geometry"
) -> pa.Table:
    """Read one feature layer (default: the only/first one) into an
    Arrow table: attribute columns + engine-WKB ``geometry``."""
    con = _connect(src)
    try:
        layers = [
            r[0]
            for r in con.execute(
                "SELECT table_name FROM gpkg_contents"
                " WHERE data_type='features' ORDER BY table_name"
            )
        ]
        if not layers:
            raise ValueError("GeoPackage has no feature layers")
        if layer is None:
            layer = layers[0]
        elif layer not in layers:
            raise ValueError(
                f"layer {layer!r} not in {layers}"
            )
        (gcol,) = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns"
            " WHERE table_name=?",
            (layer,),
        ).fetchone()
        # quoting: table/column names come from gpkg metadata tables
        q = f'SELECT * FROM "{layer}"'
        cur = con.execute(q)
        names = [d[0] for d in cur.description]
        rows = cur.fetchall()
        cols: dict[str, pa.Array] = {}
        for i, name in enumerate(names):
            vals = [r[i] for r in rows]
            if name == gcol:
                cols[geometry_col] = pa.array(
                    [_gpb_to_wkb(v) for v in vals], type=pa.binary()
                )
            else:
                cols[name] = pa.array(vals)
        return pa.table(cols)
    finally:
        con.close()


def geopackage_dataset(
    paths,
    layer: str | None = None,
    geometry_col: str = "geometry",
    **read_kwargs,
):
    """Distributed ingestion of many .gpkg files, one file per task."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        tabs = [
            read_geopackage(b.as_py(), layer, geometry_col)
            for b in batch["bytes"]
        ]
        return pa.concat_tables(tabs, promote_options="default")

    return ray.data.read_binary_files(paths, **read_kwargs).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )
