"""Axis-aligned line × region overlay — per-region clipped segment
length, the line-geometry companion to the polygon overlay family
(``intersections``/``erase``) and the raster ``zonal`` reduce: "how
much road/track/pipe lies inside each district".

Exactness (CLAUDE.md discipline): segment endpoints and rectangle
bounds are integer-valued doubles (the synthetic-corpus contract —
EXTENT-bounded), the constant coordinate rides off-lattice at
int + 0.5 so containment never tests a boundary, and every clipped
length ``min(x1, maxx) − max(x0, minx)`` is an exact integral double
cast to int64 — per-region sums are order-independent exact integers,
mirrored by the oracle's least/greatest interval formula.

Scale shape: the region table is dimension-sized and broadcast ONCE
(``ray.put``); each batch reduces to ≤ |regions| partial rows via one
vectorized (batch × regions) interval-clip matrix, so segment bytes
never shuffle. For region tables past broadcast size, grid-bucket the
segments and regions first (the ``rasterize`` cell discipline) and
run this op per bucket — documented assumption, same as the other
broadcast-side spatial ops.

ref parity note: the reference's overlay family is polygon-only
(intersections.py); line-in-region length is part of the
beyond-reference geospatial additions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["segment_zonal_length"]


def segment_zonal_length(
    segments,
    rects: pa.Table,
    id_col: str = "district_id",
    y_col: str = "y",
    x0_col: str = "x0",
    x1_col: str = "x1",
    len_col: str = "road_len",
    n_col: str = "n_segs",
):
    """Per-region total clipped length + intersecting-segment count
    for HORIZONTAL axis-aligned segments (vertical segments: swap the
    column roles — the geometry is symmetric).

    ``segments``: Dataset with float columns (y, x0, x1), integer
    x-endpoints, off-lattice y. ``rects``: driver-local pa.Table
    (id_col, minx, miny, maxx, maxy). Returns a pa.Table
    (id_col, len_col, n_col) sorted by id — regions no segment
    touches are omitted."""
    import ray

    from .agg import grouped_sum_count

    ids = rects[id_col]
    mnx = rects["minx"].to_numpy(zero_copy_only=False)
    mny = rects["miny"].to_numpy(zero_copy_only=False)
    mxx = rects["maxx"].to_numpy(zero_copy_only=False)
    mxy = rects["maxy"].to_numpy(zero_copy_only=False)
    ref = ray.put(
        (ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids,
         mnx, mny, mxx, mxy)
    )

    def part(b: pa.Table) -> pa.Table:
        ids_, a, c, x, y_ = ray.get(ref)
        sy = b[y_col].to_numpy(zero_copy_only=False)
        sx0 = b[x0_col].to_numpy(zero_copy_only=False)
        sx1 = b[x1_col].to_numpy(zero_copy_only=False)
        iny = (sy[:, None] > c[None, :]) & (sy[:, None] < y_[None, :])
        ov = np.minimum(sx1[:, None], x[None, :]) - np.maximum(
            sx0[:, None], a[None, :]
        )
        # integral doubles throughout → the int64 cast is exact
        ov = np.where(iny & (ov > 0), ov, 0.0).astype(np.int64)
        lens = ov.sum(axis=0)
        ns = (ov > 0).sum(axis=0).astype(np.int64)
        keep = np.flatnonzero(ns > 0)
        return pa.table(
            {
                id_col: ids_.take(pa.array(keep)),
                len_col: pa.array(lens[keep]),
                n_col: pa.array(ns[keep]),
            }
        )

    parts = segments.map_batches(
        part, batch_format="pyarrow", zero_copy_batch=True
    )
    out = grouped_sum_count(
        parts, [id_col], sum_cols=[len_col, n_col], final="driver"
    )
    return out.combine_chunks().sort_by([(id_col, "ascending")])
