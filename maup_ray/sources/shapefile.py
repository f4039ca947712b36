"""Pure-Python ESRI shapefile reader → Arrow (no GDAL/fiona offline).

The reference's only real ingestion path is
``geopandas.read_file("zip://./examples/blocks.zip")``
(ref: tests/test_assign.py:146-148, README.md:51-53). This module
reads the same zips with stdlib ``zipfile``/``struct`` + numpy and
produces an Arrow table whose ``geometry`` column is the engine's WKB,
so every operator (assign, intersections, prorate, repair) runs on the
reference's own example corpus.

Scope: shape types 0 (null), 5 (Polygon) and 15 (PolygonZ — Z/M
dropped), the ones maup's corpora use. Multi-ring records are grouped
into polygons by the shapefile winding convention (outer rings CW,
holes CCW) with a containment fallback for files that violate it;
rings are re-oriented to the engine's shell-CCW/hole-CW convention by
``normalize_polygon``. dBase fields: C→string, N/F→int64 or float64
by the decimals declaration, L→bool, D→string.

Scale shape: one zip parses in one task —
``shapefile_dataset([...paths])`` maps the parser over
``ray.data.read_binary_files``, so a sharded corpus (thousands of
county/tile zips) parses in parallel and streams into the engine;
a single zip is a driver-side parse (they are small by format: 2 GB
max by the 32-bit offsets of the .shp format itself).
"""

from __future__ import annotations

import io
import struct
import zipfile

import numpy as np
import pyarrow as pa

from ..geom.core import normalize_polygon, ring_signed_area
from ..geom.pip import point_in_polygon
from ..geom.wkb import encode_multipolygon

__all__ = ["read_shapefile_zip", "shapefile_dataset"]

_POLY_TYPES = {5, 15, 25}  # Polygon, PolygonZ, PolygonM


def _rings_to_multipolygon(rings: list[np.ndarray]):
    """Group raw shapefile rings into the engine's MultiPolygon.

    Shapefile convention: CW = outer, CCW = hole (Y-up axes ⇒ negative
    shoelace = CW). Holes attach to the smallest enclosing shell;
    orientation violations fall back to treating the ring as a shell.
    """
    shells: list[list[np.ndarray]] = []
    holes: list[np.ndarray] = []
    for r in rings:
        if len(r) < 3:
            continue
        if ring_signed_area(r) <= 0:  # CW → shell
            shells.append([r])
        else:
            holes.append(r)
    if not shells:
        # orientation-violating file: every ring is a shell
        shells = [[r] for r in holes]
        holes = []
    for h in holes:
        pt = h[0]
        best = None
        best_area = np.inf
        for s in shells:
            a = abs(ring_signed_area(s[0]))
            if a < best_area and bool(
                point_in_polygon(pt[None, :], [s[0]])[0]
            ):
                best, best_area = s, a
        (best if best is not None else shells[0]).append(h)
    out = []
    for s in shells:
        poly = normalize_polygon(s)
        if poly:
            out.append(poly)
    return out


def _parse_shp(data: bytes) -> list[bytes | None]:
    """.shp bytes → list of WKB MultiPolygons (None for null shapes)."""
    if len(data) < 100:
        raise ValueError("not a shapefile: too short")
    (code,) = struct.unpack_from(">i", data, 0)
    if code != 9994:
        raise ValueError(f"not a shapefile: file code {code}")
    (ftype,) = struct.unpack_from("<i", data, 32)
    if ftype not in _POLY_TYPES and ftype != 0:
        raise NotImplementedError(
            f"shapefile shape type {ftype} not supported (polygons only)"
        )
    out: list[bytes | None] = []
    off = 100
    n = len(data)
    while off + 8 <= n:
        _recno, clen = struct.unpack_from(">ii", data, off)
        off += 8
        end = off + clen * 2
        (stype,) = struct.unpack_from("<i", data, off)
        if stype == 0:
            out.append(None)
        elif stype in _POLY_TYPES:
            nparts, npoints = struct.unpack_from("<ii", data, off + 36)
            parts = np.frombuffer(
                data, dtype="<i4", count=nparts, offset=off + 44
            ).astype(np.int64)
            pts = np.frombuffer(
                data,
                dtype="<f8",
                count=npoints * 2,
                offset=off + 44 + 4 * nparts,
            ).reshape(npoints, 2)
            bounds_ = np.append(parts, npoints)
            rings = [
                pts[bounds_[i] : bounds_[i + 1]].copy()
                for i in range(nparts)
            ]
            mp = _rings_to_multipolygon(rings)
            out.append(encode_multipolygon(mp) if mp else None)
        else:
            raise NotImplementedError(
                f"record shape type {stype} not supported"
            )
        off = end
    return out


def _parse_dbf(data: bytes) -> pa.Table:
    """.dbf (dBase III) bytes → Arrow table."""
    nrec, hdrlen, reclen = struct.unpack_from("<IHH", data, 4)
    fields = []
    foff = 32
    while foff < hdrlen - 1 and data[foff] != 0x0D:
        fd = data[foff : foff + 32]
        name = fd[:11].split(b"\0")[0].decode("ascii", "replace")
        ftype = chr(fd[11])
        flen = fd[16]
        fdec = fd[17]
        fields.append((name, ftype, flen, fdec))
        foff += 32
    raw = np.frombuffer(
        data, dtype=np.uint8, count=nrec * reclen, offset=hdrlen
    ).reshape(nrec, reclen)
    cols: dict[str, pa.Array] = {}
    pos = 1  # byte 0 of each record is the deletion flag
    for name, ftype, flen, fdec in fields:
        chunk = raw[:, pos : pos + flen]
        pos += flen
        texts = [
            bytes(row).decode("latin-1").strip() for row in chunk
        ]
        if ftype in ("N", "F"):
            if ftype == "F" or fdec > 0:
                vals = [float(t) if t else None for t in texts]
                cols[name] = pa.array(vals, type=pa.float64())
            else:
                vals = [int(t) if t else None for t in texts]
                cols[name] = pa.array(vals, type=pa.int64())
        elif ftype == "L":
            cols[name] = pa.array(
                [
                    True
                    if t in ("Y", "y", "T", "t")
                    else False
                    if t in ("N", "n", "F", "f")
                    else None
                    for t in texts
                ],
                type=pa.bool_(),
            )
        else:  # C, D, and anything else: text
            cols[name] = pa.array(texts, type=pa.string())
    return pa.table(cols)


def read_shapefile_zip(
    src, geometry_col: str = "geometry"
) -> pa.Table:
    """Read a zipped shapefile (path, bytes, or file-like) into an
    Arrow table: all dBase attribute columns + WKB ``geometry``."""
    if isinstance(src, (bytes, bytearray)):
        src = io.BytesIO(src)
    with zipfile.ZipFile(src) as z:
        names = z.namelist()
        shp_name = next(n for n in names if n.lower().endswith(".shp"))
        dbf_name = next(n for n in names if n.lower().endswith(".dbf"))
        geoms = _parse_shp(z.read(shp_name))
        attrs = _parse_dbf(z.read(dbf_name))
    if len(geoms) != attrs.num_rows:
        raise ValueError(
            f".shp has {len(geoms)} records but .dbf has "
            f"{attrs.num_rows}"
        )
    return attrs.append_column(
        geometry_col, pa.array(geoms, type=pa.binary())
    )


def shapefile_dataset(paths, geometry_col: str = "geometry", **read_kwargs):
    """Distributed ingestion of many shapefile zips: each zip parses in
    its own task via ``ray.data.read_binary_files`` → ``map_batches``
    (the sharded-corpus scale path)."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        tabs = [
            read_shapefile_zip(b.as_py(), geometry_col)
            for b in batch["bytes"]
        ]
        return pa.concat_tables(tabs, promote_options="default")

    return ray.data.read_binary_files(paths, **read_kwargs).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )
