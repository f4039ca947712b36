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
            self._build_edge_arrays(is_convex_ring)
        elif {"minx", "miny", "maxx", "maxy"} <= set(names):
            self.bboxes = np.column_stack(
                [table[c].to_numpy() for c in ("minx", "miny", "maxx", "maxy")]
            ).astype(np.float64)
            self.geoms = None  # rect-only: bboxes ARE the geometry
            self.is_rect = True
            self.convex_ring = None
            self.ring_ok = self.convex_ok = None
            self.edge_a = self.edge_b = None
        else:
            raise ValueError(
                "targets need a WKB 'geometry' column or minx/miny/maxx/maxy"
            )
        self.tree = BBoxTree(self.bboxes)

    def _build_edge_arrays(self, is_convex_ring):
        """Per-target padded edge arrays (T, M, 2) for the cross-target
        vectorized kernels: edge i of target t runs edge_a[t,i] →
        edge_b[t,i]; slots past the ring length hold zero-length edges
        (a == b), which are exact no-ops for parity counting, half-plane
        covering tests and Sutherland–Hodgman clips alike. Only
        single-ring hole-free targets participate (``ring_ok``);
        ``convex_ok`` additionally requires convexity (the clip /
        covering fast paths need it, parity does not)."""
        self.ring_ok = np.array(
            [len(g) == 1 and len(g[0]) == 1 for g in self.geoms],
            dtype=bool,
        )
        self.convex_ok = np.array(
            [r is not None for r in self.convex_ring], dtype=bool
        )
        if not self.ring_ok.any():
            self.edge_a = self.edge_b = None
            return
        M = max(len(g[0][0]) for g, ok in zip(self.geoms, self.ring_ok) if ok)
        T = self.n
        self.edge_a = np.zeros((T, M, 2), dtype=np.float64)
        self.edge_b = np.zeros((T, M, 2), dtype=np.float64)
        for t in range(T):
            if not self.ring_ok[t]:
                continue
            r = self.geoms[t][0][0]
            m = len(r)
            self.edge_a[t, :m] = r
            self.edge_b[t, : m - 1] = r[1:]
            self.edge_b[t, m - 1] = r[0]
            if m < M:
                self.edge_a[t, m:] = r[m - 1]
                self.edge_b[t, m:] = r[m - 1]

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
        from ..geom.pip import parity_rows, points_in_multipolygon

        out = np.zeros(len(pi), dtype=bool)
        # single-ring hole-free targets: one chunked per-pair parity
        # broadcast over the padded edge arrays (bit-compatible with the
        # per-target even-odd path); multi-ring targets keep the loop
        ring_pair = (
            self.ring_ok[ti]
            if self.ring_ok is not None
            else np.zeros(len(ti), dtype=bool)
        )
        vp = np.flatnonzero(ring_pair)
        CH = 1 << 18
        for s0 in range(0, len(vp), CH):
            sl = vp[s0 : s0 + CH]
            out[sl] = parity_rows(
                x[pi[sl]],
                y[pi[sl]],
                self.edge_a[ti[sl]],
                self.edge_b[ti[sl]],
            )
        if ring_pair.all():
            return out
        rest = np.flatnonzero(~ring_pair)
        ti_r = ti[rest]
        order = np.argsort(ti_r, kind="stable")
        ti_s = ti_r[order]
        bnds = np.searchsorted(ti_s, np.arange(self.n + 1))
        pts = np.column_stack([x, y])
        for t in np.unique(ti_s):
            sl = rest[order[bnds[t] : bnds[t + 1]]]
            out[sl] = points_in_multipolygon(
                pts[pi[sl]], self.geoms[t], include_boundary=False
            )
        return out
