"""intersections — overlay join producing the pieces table.

Semantics of maup.intersections (ref: intersections.py:9-52): all
non-empty pairwise source∩target pieces, including zero-area boundary
touches (SURVEY.md §2.3 item 3); optional ``area_cutoff`` keeps
``area > cutoff`` only.

Ray-Data-first: targets broadcast into an actor pool, sources stream;
each batch emits a LONGER table of (source_id, target_id, geometry,
area, length, dim) rows — map_batches natively supports the flat-map
shape. Axis-aligned targets take the exact Sutherland–Hodgman clip fast
path; general pairs use the planar-arrangement boolean kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.boolean import boundary_intersection, intersection_full
from ..geom.clip import clip_multipolygon_rect
from ..geom.core import area as poly_area
from ..geom.core import bounds
from ..geom.wkb import (
    decode_polygons,
    encode_lines,
    encode_multipolygon,
    encode_points,
)
from ..state.target_index import TargetIndex
from .assign import _resolve_table

__all__ = ["intersections", "IntersectionsActor"]


class IntersectionsActor:
    def __init__(
        self,
        targets,
        source_id_col: str = "source_id",
        target_id_col: str = "target_id",
        geometry_col: str = "geometry",
        area_cutoff: float | None = None,
        include_geometry: bool = True,
        targets_id_col: str = "target_id",
        targets_geometry_col: str = "geometry",
    ):
        self.index = TargetIndex(
            _resolve_table(targets), targets_id_col, targets_geometry_col
        )
        self.source_id_col = source_id_col
        self.target_id_col = target_id_col
        self.geometry_col = geometry_col
        self.area_cutoff = area_cutoff
        self.include_geometry = include_geometry

    def __call__(self, batch: pa.Table) -> pa.Table:
        geoms = [decode_polygons(b.as_py()) for b in batch[self.geometry_col]]
        src_ids = batch[self.source_id_col]
        bboxes = np.array(
            [bounds(g) for g in geoms], dtype=np.float64
        ).reshape(-1, 4)
        si, ti = self.index.candidates_for_bboxes(bboxes)
        order = np.lexsort((ti, si))
        si, ti = si[order], ti[order]
        out_s, out_t, out_g, out_a, out_l, out_d = [], [], [], [], [], []
        for s, t in zip(si, ti):
            src = geoms[s]
            if not src:
                continue
            polys, lines, pts, ar, ln = self._pair(src, t)
            dim = 2 if polys else 1 if lines else 0 if len(pts) else -1
            if dim < 0:
                continue
            if self.area_cutoff is not None and not ar > self.area_cutoff:
                continue
            out_s.append(s)
            out_t.append(t)
            out_a.append(ar)
            out_l.append(ln)
            out_d.append(dim)
            if self.include_geometry:
                if polys:
                    out_g.append(encode_multipolygon(polys))
                elif lines:
                    out_g.append(encode_lines(lines))
                else:
                    out_g.append(encode_points(pts))
        cols = {
            self.source_id_col: src_ids.take(pa.array(out_s, type=pa.int64())),
            self.target_id_col: pa.array(
                [self.index.id_numpy[t] for t in out_t], type=self.index.ids.type
            ),
        }
        if self.include_geometry:
            cols[self.geometry_col] = pa.array(out_g, type=pa.binary())
        cols["area"] = pa.array(out_a, type=pa.float64())
        cols["length"] = pa.array(out_l, type=pa.float64())
        cols["dim"] = pa.array(out_d, type=pa.int8())
        return pa.table(cols)

    def _pair(self, src, t: int):
        polys = None
        if self.index.is_rect:
            minx, miny, maxx, maxy = self.index.bboxes[t]
            polys = clip_multipolygon_rect(src, minx, miny, maxx, maxy)
        else:
            ring = (
                self.index.convex_ring[t]
                if self.index.convex_ring is not None
                else None
            )
            if ring is not None:
                from ..geom.clip import clip_multipolygon_convex

                polys = clip_multipolygon_convex(src, ring)
        if polys is not None:
            ar = poly_area(polys)
            if polys and ar > 0:
                from ..geom.core import perimeter

                # length of a polygonal piece = its perimeter (shapely
                # .length parity — absorb_by_shared_perimeter relies on
                # it, ref repair.py:478)
                return polys, [], np.empty((0, 2)), ar, perimeter(polys)
            # degenerate: boundary touch (shared edge / corner)
            lines, pts, ln = boundary_intersection(src, self.index.geom(t))
            return [], lines, pts, 0.0, ln
        polys, lines, pts, ar, ln = intersection_full(src, self.index.geom(t))
        if polys and ar > 0:
            from ..geom.core import perimeter

            ln = perimeter(polys)
        return polys, lines, pts, ar, ln


def intersections(
    sources,
    targets,
    *,
    area_cutoff: float | None = None,
    include_geometry: bool = True,
    sort: bool = False,
    concurrency: int = 4,
    batch_size=None,
    **kw,
):
    """Pieces table (source_id, target_id, [geometry], area, length,
    dim). ``sort=True`` orders by (source_id, target_id) for the
    parity-pinned output ordering (ref: intersections.py:43-46) — a
    global sort, only request it at materialization points."""
    import ray

    from ..crs import check_same_crs

    check_same_crs(sources, targets)  # ref: intersections.py:9
    fn_kwargs = dict(
        targets=targets,
        area_cutoff=area_cutoff,
        include_geometry=include_geometry,
        **kw,
    )
    if isinstance(sources, pa.Table):
        out = IntersectionsActor(**fn_kwargs)(sources)
        if sort:
            out = out.sort_by(
                [(fn_kwargs.get("source_id_col", "source_id"), "ascending"),
                 (fn_kwargs.get("target_id_col", "target_id"), "ascending")]
            )
        return out
    if isinstance(targets, pa.Table):
        fn_kwargs["targets"] = ray.put(targets)
    from .assign import _cached_instance

    ref = fn_kwargs["targets"]
    key = (
        "intersections",
        ref.hex() if isinstance(ref, ray.ObjectRef) else id(ref),
        area_cutoff,
        include_geometry,
        tuple(sorted(kw.items())),
    )

    def fn(batch: pa.Table) -> pa.Table:
        return _cached_instance(IntersectionsActor, key, fn_kwargs)(batch)

    ds = sources.map_batches(
        fn,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    if sort:
        ds = ds.sort(
            [fn_kwargs.get("source_id_col", "source_id"),
             fn_kwargs.get("target_id_col", "target_id")]
        )
    return ds
