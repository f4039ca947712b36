"""Raster ↔ vector conversion over the hierarchical cell grid
(BASELINE.json north_rule component).

* ``rasterize`` — polygon table → per-(cell, id) exact coverage areas
  at a given resolution: each polygon flat-maps to the cells its bbox
  covers and is CLIPPED exactly (axis-aligned Sutherland–Hodgman) to
  each cell — integer cell bounds keep areas dyadic-exact, so the SQL
  rect-overlap oracle matches bit-for-bit for rectangular inputs.
* ``vectorize`` — per-(cell, id) raster back to polygon tables: cell
  rectangles grouped by id and unioned (tree union via the boolean
  kernel; at Dataset scale use ops.distributed.union_all_distributed
  keyed by id).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import boolean
from ..geom.cells import CellGrid
from ..geom.clip import clip_multipolygon_rect
from ..geom.core import area as poly_area
from ..geom.core import bounds, rect
from ..geom.wkb import decode_polygons, encode_multipolygon

__all__ = ["rasterize", "vectorize"]


def _rasterize_batch(batch, grid: CellGrid, res: int, id_col, geometry_col):
    out_id, out_cx, out_cy, out_area = [], [], [], []
    for rid, b in zip(batch[id_col].to_pylist(), batch[geometry_col]):
        g = decode_polygons(b.as_py())
        if not g:
            continue
        cells = grid.cells_for_bbox(*bounds(g), res)
        minx, miny, maxx, maxy = grid.cell_bbox(cells)
        for i, c in enumerate(cells):
            clipped = clip_multipolygon_rect(
                g, minx[i], miny[i], maxx[i], maxy[i]
            )
            a = poly_area(clipped)
            if a > 0:
                cx, cy, _ = CellGrid.unpack(np.array([c], dtype=np.uint64))
                out_id.append(rid)
                out_cx.append(int(cx[0]))
                out_cy.append(int(cy[0]))
                out_area.append(a)
    return pa.table(
        {
            id_col: pa.array(out_id),
            "cx": pa.array(out_cx, type=pa.int64()),
            "cy": pa.array(out_cy, type=pa.int64()),
            "coverage_area": pa.array(out_area, type=pa.float64()),
        }
    )


def rasterize(
    obj,
    extent,
    res: int,
    id_col: str = "id",
    geometry_col: str = "geometry",
):
    """Table or Dataset of polygons → (id, cx, cy, coverage_area)."""
    grid = CellGrid(*extent)
    if isinstance(obj, pa.Table):
        return _rasterize_batch(obj, grid, res, id_col, geometry_col)
    return obj.map_batches(
        lambda b: _rasterize_batch(b, grid, res, id_col, geometry_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def vectorize(
    raster: pa.Table,
    extent,
    res: int,
    id_col: str = "id",
    min_coverage: float = 0.5,
):
    """(id, cx, cy, coverage_area) → polygon table: cells whose
    coverage fraction ≥ min_coverage union into the id's geometry."""
    grid = CellGrid(*extent)
    w = grid.size / (1 << res)
    cell_area = w * w
    df = raster.to_pandas()
    df = df[df["coverage_area"] >= min_coverage * cell_area]
    out_ids, out_geoms = [], []
    for rid, g in df.groupby(id_col, sort=True):
        rects = [
            rect(
                grid.x0 + cx * w,
                grid.y0 + cy * w,
                grid.x0 + (cx + 1) * w,
                grid.y0 + (cy + 1) * w,
            )
            for cx, cy in zip(g["cx"], g["cy"])
        ]
        out_ids.append(rid)
        out_geoms.append(encode_multipolygon(boolean.union_all(rects)))
    return pa.table(
        {
            id_col: pa.array(out_ids),
            "geometry": pa.array(out_geoms, type=pa.binary()),
        }
    )
