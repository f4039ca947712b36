"""CRS metadata guard (ref: crs.py:4-16).

CRS is carried as Arrow schema metadata (key b"crs") on geometry
tables — a dataset-level constant, checked once at pipeline build time
(cheap precondition, not a per-row stage). Mirrors the reference's
``require_same_crs`` TypeError contract.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["get_crs", "set_crs", "require_same_crs"]


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
