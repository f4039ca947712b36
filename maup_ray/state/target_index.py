"""Broadcast small-side spatial index — the per-worker actor state.

Replaces the reference's per-call ``IndexedGeometries`` (STRtree + prep,
indexed_geometries.py:16-79). Built ONCE per map_batches actor from a
``ray.put`` object ref of the target Arrow table (zero re-ship per
batch), queried vectorized per batch.

Targets are sorted by id at build time so grouped-argmax tie-breaking
("first occurrence in (source, target)-sorted order", SURVEY.md §2.3
item 10) is deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.core import bounds
from ..geom.strtree import BBoxTree
from ..geom.wkb import decode_polygons

__all__ = ["TargetIndex"]


def _is_axis_rect(geom) -> bool:
    """Single 4-vertex axis-aligned ring? (enables the exact SH-clip
    fast path in assign/intersections)."""
    if len(geom) != 1 or len(geom[0]) != 1:
        return False
    ring = geom[0][0]
    if len(ring) != 4:
        return False
    xs = np.unique(ring[:, 0])
    ys = np.unique(ring[:, 1])
    return len(xs) == 2 and len(ys) == 2


class TargetIndex:
    def __init__(
        self,
        table: pa.Table,
        id_col: str = "target_id",
        geometry_col: str = "geometry",
    ):
        names = table.column_names
        self.id_col = id_col
        # stable sort by id for deterministic tie-breaks
        order = pa.compute.sort_indices(table[id_col])
        table = table.take(order)
        self.ids = table[id_col]
        self.id_numpy = (
            self.ids.to_numpy(zero_copy_only=False)
            if pa.types.is_integer(self.ids.type) or pa.types.is_floating(self.ids.type)
            else np.asarray(self.ids.to_pylist(), dtype=object)
        )
        self.n = len(table)
        if geometry_col in names:
            from ..geom.clip import is_convex_ring

            self.geoms = [
                decode_polygons(b.as_py()) for b in table[geometry_col]
            ]
            self.bboxes = np.array([bounds(g) for g in self.geoms])
            self.is_rect = all(_is_axis_rect(g) for g in self.geoms)
            # convex single-ring targets take the SH-clip fast path
            self.convex_ring = [
                g[0][0]
                if len(g) == 1 and len(g[0]) == 1 and is_convex_ring(g[0][0])
                else None
                for g in self.geoms
            ]
        elif {"minx", "miny", "maxx", "maxy"} <= set(names):
            self.bboxes = np.column_stack(
                [table[c].to_numpy() for c in ("minx", "miny", "maxx", "maxy")]
            ).astype(np.float64)
            self.geoms = None  # rect-only: bboxes ARE the geometry
            self.is_rect = True
            self.convex_ring = None
        else:
            raise ValueError(
                "targets need a WKB 'geometry' column or minx/miny/maxx/maxy"
            )
        self.tree = BBoxTree(self.bboxes)

    def geom(self, i: int):
        if self.geoms is not None:
            return self.geoms[i]
        minx, miny, maxx, maxy = self.bboxes[i]
        from ..geom.core import rect

        return rect(minx, miny, maxx, maxy)

    def candidates_for_points(self, x: np.ndarray, y: np.ndarray):
        return self.tree.query_points(x, y)

    def candidates_for_bboxes(self, bboxes: np.ndarray):
        return self.tree.query_bbox(bboxes)

    def contains_points(
        self, x: np.ndarray, y: np.ndarray, pi: np.ndarray, ti: np.ndarray
    ) -> np.ndarray:
        """Refine candidate (point, target) pairs to exact containment
        (half-open convention). Vectorized per target group."""
        if self.is_rect:  # axis rects: bbox IS the geometry (half-open)
            b = self.bboxes[ti]
            return (
                (x[pi] >= b[:, 0])
                & (x[pi] < b[:, 2])
                & (y[pi] >= b[:, 1])
                & (y[pi] < b[:, 3])
            )
        from ..geom.pip import points_in_multipolygon

        out = np.zeros(len(pi), dtype=bool)
        order = np.argsort(ti, kind="stable")
        ti_s = ti[order]
        bnds = np.searchsorted(ti_s, np.arange(self.n + 1))
        pts = np.column_stack([x, y])
        for t in np.unique(ti_s):
            sl = order[bnds[t] : bnds[t + 1]]
            out[sl] = points_in_multipolygon(
                pts[pi[sl]], self.geoms[t], include_boundary=False
            )
        return out
