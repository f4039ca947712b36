"""CRS metadata guard (ref: crs.py:4-16).

CRS is carried as Arrow schema metadata (key b"crs") on geometry
tables — a dataset-level constant, checked once at pipeline build time
(cheap precondition, not a per-row stage). Mirrors the reference's
``require_same_crs`` TypeError contract.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = [
    "get_crs",
    "set_crs",
    "require_same_crs",
    "is_geographic",
    "require_projected",
]


def get_crs(table: pa.Table) -> str | None:
    md = table.schema.metadata or {}
    v = md.get(b"crs")
    return v.decode() if v is not None else None


def set_crs(table: pa.Table, crs: str) -> pa.Table:
    md = dict(table.schema.metadata or {})
    md[b"crs"] = crs.encode()
    return table.replace_schema_metadata(md)


def require_same_crs(a: pa.Table, b: pa.Table) -> None:
    """Raise TypeError when both tables carry CRS metadata and they
    differ (ref: crs.py:10-15). Tables without CRS metadata pass —
    the synthetic fixtures are CRS-less by design."""
    ca, cb = get_crs(a), get_crs(b)
    if ca is not None and cb is not None and ca != cb:
        raise TypeError(
            f"the given geometries are in different CRS: {ca!r} vs {cb!r}"
        )


def crs_of(obj) -> str | None:
    """CRS of a pa.Table or ray Dataset (schema metadata b'crs');
    None when absent or unobtainable without execution."""
    if isinstance(obj, pa.Table):
        return get_crs(obj)
    try:  # ray.data.Dataset: Arrow schema via the (lazy) Schema wrapper
        schema = obj.schema(fetch_if_missing=False)
        base = getattr(schema, "base_schema", None)
        if isinstance(base, pa.Schema):
            md = base.metadata or {}
            v = md.get(b"crs")
            return v.decode() if v is not None else None
    except Exception:
        pass
    return None


def check_same_crs(a, b) -> None:
    """Op-entry guard mirroring the reference's @require_same_crs on
    assign/intersections/crop_to/expand_to (ref: crs.py:4-16,
    assign.py:13, intersections.py:9, repair.py:261,283,463). Works on
    Tables and Datasets; passes when either side lacks CRS metadata."""
    ca, cb = crs_of(a), crs_of(b)
    if ca is not None and cb is not None and ca != cb:
        raise TypeError(
            f"the given geometries are in different CRS: {ca!r} vs {cb!r}"
        )


# Geographic (lat/long degree) CRS identifiers — repairing in degrees
# silently corrupts areas/lengths, so smart_repair refuses them (ref:
# smart_repair.py:116-120). The set covers the common geographic datum
# codes; WKT/PROJ strings are recognized structurally.
_GEOGRAPHIC_EPSG = {
    "4326", "4269", "4267", "4258", "4283", "4167", "4619",
    "4019", "4030", "4490",
}


def is_geographic(crs: str | None) -> bool:
    """True when the CRS string denotes a geographic (lat/long) CRS:
    EPSG geographic datum codes, PROJ ``+proj=longlat``/``latlong``,
    or WKT ``GEOGCS``/``GEOGCRS`` roots. Unknown/absent CRS → False
    (the synthetic fixtures are CRS-less planar by design)."""
    if not crs:
        return False
    s = str(crs).strip().upper()
    if "+PROJ=LONGLAT" in s or "+PROJ=LATLONG" in s:
        return True
    if s.startswith("GEOGCS") or s.startswith("GEOGCRS"):
        return True
    if s.startswith("EPSG:") and s.split(":", 1)[1] in _GEOGRAPHIC_EPSG:
        return True
    if s in ("WGS84", "WGS 84", "CRS84", "OGC:CRS84"):
        return True
    return False


def require_projected(obj) -> None:
    """Raise TypeError when the table/Dataset carries geographic-CRS
    metadata (ref: smart_repair.py:116-120 — the reference raises with
    a to_crs(estimate_utm_crs()) hint; a degree-unit repair would be
    silently wrong). CRS-less inputs pass."""
    c = obj if isinstance(obj, (str, type(None))) else crs_of(obj)
    if is_geographic(c):
        raise TypeError(
            "Input geometries must be in a projected, non-geographic "
            f"CRS (got {c!r}). Reproject to a planar CRS (e.g. the "
            "appropriate UTM zone) before smart_repair."
        )
