"""Deterministic synthetic district/precinct polygon tables.

Two families:

* ``bsp_rects`` — integer-coordinate BSP tessellation of the
  [0, EXTENT]² square. Used by the SQL-oracle query family: every
  coordinate is an integer-valued double, so intersection areas computed
  by shoelace-on-clipped-polygons in the engine equal DuckDB's
  greatest/least interval formula bit-for-bit.
* ``jittered_grid`` — F6/F7-style jittered tessellation (non-rectangular
  convex quads, optional gaps/overlaps) for the repair-family tests
  where SQL can't follow; checked by brute-force numpy oracles instead.

EXTENT = 2**20 so all derived point coordinates (k % EXTENT + 0.5)
stay clear of every rectangle boundary (boundaries are integers).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.wkb import encode_polygon

EXTENT = 1 << 20

__all__ = ["EXTENT", "bsp_rects", "district_table", "districts_sql", "jittered_grid"]


def bsp_rects(n_leaves: int, seed: int = 7) -> np.ndarray:
    """(n,4) int64 rects (minx,miny,maxx,maxy) tiling [0,EXTENT]²."""
    rng = np.random.RandomState(seed)
    rects = [(0, 0, EXTENT, EXTENT)]
    while len(rects) < n_leaves:
        # split the largest-area leaf
        areas = [(r[2] - r[0]) * (r[3] - r[1]) for r in rects]
        i = int(np.argmax(areas))
        x0, y0, x1, y1 = rects.pop(i)
        horiz = (x1 - x0) >= (y1 - y0)
        frac = 0.35 + 0.3 * rng.random_sample()
        if horiz:
            xm = int(x0 + frac * (x1 - x0))
            xm = max(x0 + 1, min(x1 - 1, xm))
            rects += [(x0, y0, xm, y1), (xm, y0, x1, y1)]
        else:
            ym = int(y0 + frac * (y1 - y0))
            ym = max(y0 + 1, min(y1 - 1, ym))
            rects += [(x0, y0, x1, ym), (x0, ym, x1, y1)]
    rects.sort()
    return np.array(rects, dtype=np.int64)


def district_table(n_leaves: int = 64, seed: int = 7) -> pa.Table:
    """Arrow district table: ids, rect columns (double) + WKB geometry."""
    r = bsp_rects(n_leaves, seed).astype(np.float64)
    geoms = [
        encode_polygon(
            [
                np.array(
                    [
                        [minx, miny],
                        [maxx, miny],
                        [maxx, maxy],
                        [minx, maxy],
                    ]
                )
            ]
        )
        for minx, miny, maxx, maxy in r
    ]
    return pa.table(
        {
            "district_id": pa.array(np.arange(len(r)), type=pa.int64()),
            "minx": r[:, 0],
            "miny": r[:, 1],
            "maxx": r[:, 2],
            "maxy": r[:, 3],
            "geometry": pa.array(geoms, type=pa.binary()),
        }
    )


def districts_sql(n_leaves: int = 64, seed: int = 7) -> str:
    """The same districts as an inline SQL VALUES relation
    d(district_id, minx, miny, maxx, maxy) — the DuckDB oracle side."""
    r = bsp_rects(n_leaves, seed)
    # CAST the id so the relation carries BIGINT ids (bare VALUES literals
    # infer INT32; the engine emits int64 and the driver hashes physical
    # bytes — keep both sides bit-identical)
    rows = ", ".join(
        f"(CAST({i} AS BIGINT), {a}.0, {b}.0, {c}.0, {d}.0)"
        for i, (a, b, c, d) in enumerate(r)
    )
    return (
        f"(SELECT * FROM (VALUES {rows}) "
        "AS d(district_id, minx, miny, maxx, maxy))"
    )


def jittered_grid(
    k: int = 4,
    seed: int = 2023,
    jitter: float = 1.0 / 24.0,
    scale: float = 1.0,
) -> pa.Table:
    """k×k tessellation with jittered interior vertices (F6 flavor,
    ref: tests/test_smart_repair.py:12-45): shared corners jittered
    consistently → valid tessellation (no gaps/overlaps); use
    ``perturbed`` output columns for repair tests that need defects."""
    rng = np.random.RandomState(seed)
    # grid corner lattice (k+1)², interior vertices jittered
    vx, vy = np.meshgrid(np.arange(k + 1, dtype=float), np.arange(k + 1, dtype=float))
    jx = rng.uniform(-jitter, jitter, size=vx.shape)
    jy = rng.uniform(-jitter, jitter, size=vy.shape)
    interior = np.zeros_like(vx, dtype=bool)
    interior[1:-1, 1:-1] = True
    vx = np.where(interior, vx + jx, vx) * scale
    vy = np.where(interior, vy + jy, vy) * scale
    ids, geoms = [], []
    for i in range(k):
        for j in range(k):
            ring = np.array(
                [
                    [vx[j, i], vy[j, i]],
                    [vx[j, i + 1], vy[j, i + 1]],
                    [vx[j + 1, i + 1], vy[j + 1, i + 1]],
                    [vx[j + 1, i], vy[j + 1, i]],
                ]
            )
            ids.append(f"p{i}{j}")
            geoms.append(encode_polygon([ring]))
    return pa.table(
        {"precinct_id": ids, "geometry": pa.array(geoms, type=pa.binary())}
    )
