"""Grouped polygon union (dissolve) — the geopandas ``.dissolve``
analog over a distributed geometry table.

Reference parity: maup users dissolve source units into target units
with ``geopandas.GeoDataFrame.dissolve`` around every maup call (the
README's blocks→districts examples); the reference library itself
unions inside repair (``unary_union`` at reference repair.py:74-87).
This op is the standalone distributed form: one hash shuffle co-locates
each key's geometries (the only data movement — inherent to dissolve),
then each group runs the exact-snapped boolean-union kernel
(geom/boolean.union_all) once, entirely inside its reduce partition.

Scale shape
-----------
* ONE ``hash_group_apply`` exchange keyed on the dissolve key; the
  geometry payload moves exactly once. P is bytes-aware (shuffle
  module contract).
* Per-group work is real geometry compute (arrangement + face
  resolution), which is the part that scales with CPUs.
* Skew: a single giant key serializes its union. The kernel is
  associative, so a hot key can be pre-reduced with a salted partial
  union (``ops/shuffle.salt_keys`` → union per salt → re-union); not
  wired by default because partial unions change no results but cost
  an extra exchange. Documented escape hatch, same policy as kNN's
  hot-cell split.

Exactness
---------
Union output coordinates come from the snapped arrangement (2^-30
relative grid — geom/boolean discipline); with integer input
coordinates and axis-parallel or dyadic intersections the union
vertices are exact, so the shoelace area and part/hole counts are
deterministic and the SQL oracle (inclusion–exclusion on a
pairwise-overlap-only synthetic layout) matches bit for bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["dissolve", "dissolve_stats"]


def _empty(stats_only: bool, key_col: str, sum_cols) -> pa.Table:
    cols = {key_col: pa.array([], type=pa.int64())}
    if not stats_only:
        cols["geometry"] = pa.array([], type=pa.binary())
    cols["union_area"] = pa.array([], type=pa.float64())
    cols["n_polys"] = pa.array([], type=pa.int64())
    cols["n_holes"] = pa.array([], type=pa.int64())
    for c in sum_cols:
        cols[f"sum_{c}"] = pa.array([], type=pa.float64())
    return pa.table(cols)


def _dissolve_partition(
    tbl, starts, *, key_col, geom_col, sum_cols, tol, stats_only
):
    from ..geom.boolean import union_all
    from ..geom.core import area as parea
    from ..geom.core import ensure_multi
    from ..geom.wkb import decode_polygons, encode_multipolygon

    if tbl is None or len(starts) == 0:
        return _empty(stats_only, key_col, sum_cols)
    ends = np.append(starts[1:], tbl.num_rows)
    keys = tbl[key_col].to_numpy(zero_copy_only=False)
    geom = tbl[geom_col]
    sums = {
        c: tbl[c].to_numpy(zero_copy_only=False).astype(np.float64)
        for c in sum_cols
    }
    out = {
        key_col: [],
        "union_area": [],
        "n_polys": [],
        "n_holes": [],
    }
    if not stats_only:
        out["geometry"] = []
    for c in sum_cols:
        out[f"sum_{c}"] = []
    for s, e in zip(starts, ends):
        geoms = [decode_polygons(geom[i].as_py()) for i in range(s, e)]
        u = union_all(geoms, tol) if len(geoms) > 1 else geoms[0]
        multi = ensure_multi(u)
        out[key_col].append(int(keys[s]))
        out["union_area"].append(parea(u))
        out["n_polys"].append(len(multi))
        out["n_holes"].append(sum(len(p) - 1 for p in multi))
        if not stats_only:
            out["geometry"].append(encode_multipolygon(multi))
        for c in sum_cols:
            out[f"sum_{c}"].append(float(sums[c][s:e].sum()))
    cols = {key_col: pa.array(out[key_col], type=pa.int64())}
    if not stats_only:
        cols["geometry"] = pa.array(out["geometry"], type=pa.binary())
    cols["union_area"] = pa.array(out["union_area"], type=pa.float64())
    cols["n_polys"] = pa.array(out["n_polys"], type=pa.int64())
    cols["n_holes"] = pa.array(out["n_holes"], type=pa.int64())
    for c in sum_cols:
        cols[f"sum_{c}"] = pa.array(out[f"sum_{c}"], type=pa.float64())
    return pa.table(cols)


def _run(ds, key_col, geom_col, sum_cols, tol, stats_only):
    import functools

    import ray

    from .shuffle import hash_group_apply

    sum_cols = tuple(sum_cols or ())
    fn = functools.partial(
        _dissolve_partition,
        key_col=key_col,
        geom_col=geom_col,
        sum_cols=sum_cols,
        tol=tol,
        stats_only=stats_only,
    )
    refs = hash_group_apply(ds, [key_col], fn, return_refs=True)
    tabs = [t for t in ray.get(refs) if t is not None and t.num_rows]
    if not tabs:
        return _empty(stats_only, key_col, sum_cols)
    return (
        pa.concat_tables(tabs).combine_chunks().sort_by(key_col)
    )


def dissolve(
    ds,
    key_col: str = "district",
    geom_col: str = "geometry",
    sum_cols=(),
    tol: float | None = None,
) -> pa.Table:
    """Union all geometries sharing ``key_col``; returns one row per
    key: (key, geometry WKB, union_area, n_polys, n_holes, sum_<c>…).
    ``sum_cols`` are value columns summed per key (geopandas
    ``dissolve(aggfunc="sum")``)."""
    return _run(ds, key_col, geom_col, sum_cols, tol, stats_only=False)


def dissolve_stats(
    ds,
    key_col: str = "district",
    geom_col: str = "geometry",
    sum_cols=(),
    tol: float | None = None,
) -> pa.Table:
    """``dissolve`` without materializing the union WKB in the output
    (stats columns only) — the oracle-facing projection."""
    return _run(ds, key_col, geom_col, sum_cols, tol, stats_only=True)
