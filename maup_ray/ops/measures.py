"""Polygon shape measures: area, centroid, perimeter, Polsby–Popper.

Beyond-reference geospatial operators (maup users compute these with
geopandas/shapely: ``gdf.area``, ``gdf.centroid``, ``gdf.length`` and
hand-rolled 4πA/P² compactness — the standard redistricting metric,
e.g. Polsby & Popper 1991, public).

Exactness discipline (matches ``geom.core.ring_signed_area``):

- Shoelace sums (2A, Sx, Sy) are exact in float64 whenever coordinates
  are integers with per-term magnitude < 2^53 — then the sums are
  order-independent and the int() round-trip is lossless, so the
  centroid is ONE correctly-rounded int/int division per axis:
  cx = Sx / (3·2A), cy = Sy / (3·2A) (the 1/(6A) moment formula).
- Perimeter is a sum of irrational sqrt terms, so ORDER matters: each
  ring accumulates edge lengths STRICTLY left-to-right in vertex order
  (np.cumsum is sequential by definition), rings accumulate in decode
  order, and each edge length is sqrt(dx·dx + dy·dy) — never np.hypot,
  whose internal scaling can differ from a plain correctly-rounded
  sqrt of the exact integer dx²+dy². A SQL oracle mirrors this with
  left-associative ``sqrt(..) + sqrt(..) + ..`` in the same edge order.
- polsby = 4.0 * math.pi * area / (perim * perim), one fixed IEEE
  expression (left-to-right), mirrored token-for-token by
  ``4 * pi() * area / (perim * perim)`` in DuckDB.

Scale shape (100 TB): one stateless task-mode map_batches — rows are
independent, nothing shuffles, the WKB payload never leaves the stage;
only (id, 5 doubles) rows are emitted.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..geom.wkb import decode_polygons

__all__ = ["geom_measures", "polygon_measures"]


def geom_measures(geom) -> tuple[float, float, float, float, float]:
    """MultiPolygon (geom.core convention: shells CCW, holes CW) →
    (area, cx, cy, perim, polsby). Degenerate (zero-area) input
    returns nan centroids/polsby."""
    a2 = 0.0  # Σ cross  (= 2·area, exact int for lattice coords)
    sx = 0.0  # Σ (x_i + x_j)·cross_ij
    sy = 0.0
    perim = 0.0
    for poly in geom:
        for ring in poly:
            r = np.asarray(ring, dtype=np.float64)
            if len(r) < 3:
                continue
            x, y = r[:, 0], r[:, 1]
            xj, yj = np.roll(x, -1), np.roll(y, -1)
            cross = x * yj - xj * y
            a2 += float(np.sum(cross))
            sx += float(np.sum((x + xj) * cross))
            sy += float(np.sum((y + yj) * cross))
            dx, dy = xj - x, yj - y
            # sequential left-to-right edge sum (see module docstring)
            perim += float(np.cumsum(np.sqrt(dx * dx + dy * dy))[-1])
    if a2 == 0.0:
        return 0.0, float("nan"), float("nan"), perim, float("nan")
    area = a2 * 0.5
    d = 3.0 * a2  # = 6·area, exact when a2 is
    cx = sx / d
    cy = sy / d
    polsby = 4.0 * math.pi * area / (perim * perim)
    return area, cx, cy, perim, polsby


def polygon_measures(obj, geometry_col: str = "geometry",
                     id_col: str = "doc_id"):
    """Dataset/Table stage: per-row shape measures from WKB geometry.

    → (id_col, area, cx, cy, perim, polsby), all float64."""

    def apply(batch: pa.Table) -> pa.Table:
        cols = {k: [] for k in ("area", "cx", "cy", "perim", "polsby")}
        for v in batch[geometry_col]:
            a, cx, cy, p, pp = geom_measures(decode_polygons(v.as_py()))
            cols["area"].append(a)
            cols["cx"].append(cx)
            cols["cy"].append(cy)
            cols["perim"].append(p)
            cols["polsby"].append(pp)
        return pa.table(
            {id_col: batch[id_col]}
            | {k: pa.array(v, type=pa.float64()) for k, v in cols.items()}
        )

    if isinstance(obj, pa.Table):
        return apply(obj)
    return obj.map_batches(
        apply, batch_format="pyarrow", zero_copy_batch=True
    )
