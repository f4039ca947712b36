"""GeoJSON (RFC 7946) source + sink → Arrow / Ray Data (stdlib json).

The reference ingests GeoJSON through ``geopandas.read_file`` (fiona
dispatches on extension; same API surface as the shapefile path,
ref: README.md:51-53). This module covers that format without GDAL:
a FeatureCollection parses into an Arrow table whose ``geometry``
column is the engine's WKB and whose properties become typed columns,
so every operator runs on GeoJSON corpora unchanged.

Geometry scope: Point/MultiPoint, LineString/MultiLineString,
Polygon/MultiPolygon, GeometryCollection (flattened), null. Polygons
are re-oriented to the engine's shell-CCW/hole-CW convention by
``normalize_polygon`` (GeoJSON files in the wild violate RFC winding
constantly; orientation is recomputed, never trusted).

Scale shape: mirrors ``shapefile_dataset`` — one file parses in one
task over ``ray.data.read_binary_files``, so a sharded corpus
(thousands of tile/county .geojson files) parses in parallel and
streams. The sink writes one file per input block (resumable
many-small-files layout), never one giant driver-side document;
``write_geojson(..., single_file=True)`` exists for the small-output
interchange case only.
"""

from __future__ import annotations

import io
import json
import os

import numpy as np
import pyarrow as pa

from ..geom.core import normalize_polygon
from ..geom.wkb import (
    decode,
    encode_lines,
    encode_multipolygon,
    encode_points,
)

__all__ = [
    "read_geojson",
    "geojson_dataset",
    "write_geojson",
    "table_to_geojson",
]


def _poly_rings(coords) -> list[np.ndarray]:
    """GeoJSON polygon coordinate arrays → open numpy rings."""
    rings = []
    for ring in coords:
        r = np.asarray(ring, dtype=np.float64)[:, :2]
        if len(r) > 1 and np.array_equal(r[0], r[-1]):
            r = r[:-1]
        if len(r) >= 3:
            rings.append(r)
    return rings


def _geom_to_wkb(g) -> bytes | None:
    if g is None:
        return None
    t = g.get("type")
    c = g.get("coordinates")
    if t == "Point":
        return encode_points(np.asarray([c], dtype=np.float64)[:, :2])
    if t == "MultiPoint":
        return encode_points(np.asarray(c, dtype=np.float64)[:, :2])
    if t == "LineString":
        return encode_lines([np.asarray(c, dtype=np.float64)[:, :2]])
    if t == "MultiLineString":
        return encode_lines(
            [np.asarray(l, dtype=np.float64)[:, :2] for l in c]
        )
    if t == "Polygon":
        poly = normalize_polygon(_poly_rings(c))
        return encode_multipolygon([poly] if poly else [])
    if t == "MultiPolygon":
        polys = []
        for pc in c:
            poly = normalize_polygon(_poly_rings(pc))
            if poly:
                polys.append(poly)
        return encode_multipolygon(polys)
    if t == "GeometryCollection":
        # flatten to the highest-dimension member set (the engine's
        # GeomParts convention); mixed collections are vanishingly
        # rare in tabular corpora
        polys, lines, pts = [], [], []
        for sub in g.get("geometries", []):
            st = sub.get("type")
            if st in ("Polygon", "MultiPolygon"):
                polys.append(sub)
            elif st in ("LineString", "MultiLineString"):
                lines.append(sub)
            else:
                pts.append(sub)
        if polys:
            out = []
            for sub in polys:
                cc = (
                    [sub["coordinates"]]
                    if sub["type"] == "Polygon"
                    else sub["coordinates"]
                )
                for pc in cc:
                    poly = normalize_polygon(_poly_rings(pc))
                    if poly:
                        out.append(poly)
            return encode_multipolygon(out)
        if lines:
            segs = []
            for sub in lines:
                cc = (
                    [sub["coordinates"]]
                    if sub["type"] == "LineString"
                    else sub["coordinates"]
                )
                segs += [np.asarray(l, dtype=np.float64)[:, :2] for l in cc]
            return encode_lines(segs)
        if pts:
            arrs = []
            for sub in pts:
                cc = (
                    [sub["coordinates"]]
                    if sub["type"] == "Point"
                    else sub["coordinates"]
                )
                arrs.append(np.asarray(cc, dtype=np.float64)[:, :2])
            return encode_points(np.vstack(arrs))
        return None
    raise NotImplementedError(f"GeoJSON geometry type {t!r}")


def read_geojson(src, geometry_col: str = "geometry") -> pa.Table:
    """Read GeoJSON (path, bytes, file-like, or parsed dict) into an
    Arrow table: property columns + WKB ``geometry``. Accepts a
    FeatureCollection, a single Feature, or a bare geometry."""
    if isinstance(src, (bytes, bytearray)):
        doc = json.loads(src.decode("utf-8"))
    elif isinstance(src, str):
        with open(src, "rb") as f:
            doc = json.load(f)
    elif isinstance(src, dict):
        doc = src
    else:  # file-like
        doc = json.load(io.TextIOWrapper(src, encoding="utf-8")) if (
            hasattr(src, "read")
        ) else json.loads(str(src))
    t = doc.get("type")
    if t == "FeatureCollection":
        feats = doc.get("features", [])
    elif t == "Feature":
        feats = [doc]
    else:  # bare geometry
        feats = [{"type": "Feature", "properties": {}, "geometry": doc}]

    keys: list[str] = []
    seen = set()
    for f in feats:
        for k in (f.get("properties") or {}):
            if k not in seen:
                seen.add(k)
                keys.append(k)
    cols: dict[str, pa.Array] = {}
    for k in keys:
        cols[k] = pa.array(
            [(f.get("properties") or {}).get(k) for f in feats]
        )
    # "id" is a Feature-level member in RFC 7946; surface it when
    # present and not shadowed by a property
    if "id" not in cols and any("id" in f for f in feats):
        cols["id"] = pa.array([f.get("id") for f in feats])
    cols[geometry_col] = pa.array(
        [_geom_to_wkb(f.get("geometry")) for f in feats],
        type=pa.binary(),
    )
    return pa.table(cols)


def geojson_dataset(paths, geometry_col: str = "geometry", **read_kwargs):
    """Distributed ingestion of many GeoJSON files: each file parses in
    its own task (the sharded-corpus scale path)."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        tabs = [
            read_geojson(b.as_py(), geometry_col)
            for b in batch["bytes"]
        ]
        return pa.concat_tables(tabs, promote_options="default")

    return ray.data.read_binary_files(paths, **read_kwargs).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )


def _wkb_to_geom(buf) -> dict | None:
    if buf is None:
        return None
    parts = decode(bytes(buf))
    if parts.polygons:
        coords = [
            [
                np.vstack([r, r[:1]]).tolist()
                for r in poly
            ]
            for poly in parts.polygons
        ]
        if len(coords) == 1:
            return {"type": "Polygon", "coordinates": coords[0]}
        return {"type": "MultiPolygon", "coordinates": coords}
    if parts.lines:
        coords = [l.tolist() for l in parts.lines]
        if len(coords) == 1:
            return {"type": "LineString", "coordinates": coords[0]}
        return {"type": "MultiLineString", "coordinates": coords}
    if len(parts.points):
        pts = parts.points.tolist()
        if len(pts) == 1:
            return {"type": "Point", "coordinates": pts[0]}
        return {"type": "MultiPoint", "coordinates": pts}
    return None


def table_to_geojson(tbl: pa.Table, geometry_col: str = "geometry") -> str:
    """Arrow table (WKB geometry + attribute columns) → one
    FeatureCollection string."""
    attrs = [c for c in tbl.column_names if c != geometry_col]
    cols = {c: tbl[c].to_pylist() for c in attrs}
    geoms = tbl[geometry_col].to_pylist() if geometry_col in (
        tbl.column_names
    ) else [None] * tbl.num_rows
    feats = []
    for i in range(tbl.num_rows):
        feats.append(
            {
                "type": "Feature",
                "properties": {c: cols[c][i] for c in attrs},
                "geometry": _wkb_to_geom(geoms[i]),
            }
        )
    return json.dumps(
        {"type": "FeatureCollection", "features": feats},
        separators=(",", ":"),
    )


def write_geojson(
    ds,
    path: str,
    geometry_col: str = "geometry",
    single_file: bool = False,
):
    """Sink. ``single_file=True`` (or a pa.Table input): small-output
    interchange mode — one FeatureCollection document at ``path``.
    Otherwise ``path`` is a directory and each block writes its own
    ``part-<contenthash>.geojson`` atomically inside its task —
    output size stays bounded per task and a rerun overwrites the
    same names idempotently (content-addressed, so no cross-run
    task-id coupling)."""
    import ray

    if isinstance(ds, pa.Table):
        with open(path, "w") as f:
            f.write(table_to_geojson(ds, geometry_col))
        return [path]
    if single_file:
        tbl = pa.concat_tables(
            ray.get(ds.materialize().to_arrow_refs()),
            promote_options="default",
        )
        with open(path, "w") as f:
            f.write(table_to_geojson(tbl, geometry_col))
        return [path]

    os.makedirs(path, exist_ok=True)

    def write_block(batch: pa.Table, *, _dir=path, _gc=geometry_col):
        import hashlib

        doc = table_to_geojson(batch, _gc)
        h = hashlib.blake2b(doc.encode(), digest_size=8).hexdigest()
        out = os.path.join(_dir, f"part-{h}.geojson")
        tmp = out + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(doc)
        os.replace(tmp, out)
        return pa.table(
            {"path": pa.array([out]), "rows": pa.array([batch.num_rows])}
        )

    lineage = ds.map_batches(
        write_block, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    return list(lineage["path"])
