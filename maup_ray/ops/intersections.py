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
        from ..geom.wkb import decode_quads_bulk

        quads = decode_quads_bulk(batch[self.geometry_col])
        if quads is not None:
            geoms = None
            bboxes = np.concatenate(
                [quads.min(axis=1), quads.max(axis=1)], axis=1
            )
        else:
            geoms = [
                decode_polygons(b.as_py()) for b in batch[self.geometry_col]
            ]
            bboxes = np.array(
                [bounds(g) for g in geoms], dtype=np.float64
            ).reshape(-1, 4)
        src_ids = batch[self.source_id_col]
        si, ti = self.index.candidates_for_bboxes(bboxes)
        order = np.lexsort((ti, si))
        si, ti = si[order], ti[order]
        if not self.include_geometry and self.area_cutoff is not None:
            fast = self._metrics_only(si, ti, quads, geoms, src_ids)
            if fast is not None:
                return fast
        # batched clip pass for eligible (single-ring source, rect or
        # convex target) pairs — one vectorized Sutherland–Hodgman per
        # target over all its candidates (VERDICT r1 #8 hot spot);
        # remaining pairs fall through to the scalar path below
        pair_rings = self._batch_clip(si, ti, quads, geoms)

        def src_of(s):
            if geoms is not None:
                return geoms[s]
            return [[quads[s]]]

        out_s, out_t, out_g, out_a, out_l, out_d = [], [], [], [], [], []
        pending_rings = []  # (output slot, normalized ring) → bulk encode
        from ..geom.core import normalize_polygon, perimeter

        for k, (s, t) in enumerate(zip(si, ti)):
            ring = pair_rings[k] if pair_rings is not None else None
            if ring is not None:
                poly = normalize_polygon([ring])
                ar = poly_area([poly]) if poly else 0.0
                if poly and ar > 0:
                    if (
                        self.include_geometry
                        and self.area_cutoff is not None
                        and ar > self.area_cutoff
                    ):
                        # defer encoding: one bulk pass after the loop
                        out_s.append(s)
                        out_t.append(t)
                        out_a.append(ar)
                        out_l.append(perimeter([poly]))
                        out_d.append(2)
                        pending_rings.append((len(out_g), poly[0]))
                        out_g.append(None)
                        continue
                    polys, lines, pts, ln = [poly], [], np.empty((0, 2)), \
                        perimeter([poly])
                else:
                    src = src_of(s)
                    if not src:
                        continue
                    lines, pts, ln = boundary_intersection(
                        src, self.index.geom(t)
                    )
                    polys, ar = [], 0.0
            else:
                src = src_of(s)
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
        if pending_rings:
            from ..geom.clip import pad_rings
            from ..geom.wkb import encode_rings_bulk

            Pp, cp = pad_rings([r for _, r in pending_rings])
            enc = encode_rings_bulk(Pp, cp)
            for (slot, _), blob in zip(pending_rings, enc.to_pylist()):
                out_g[slot] = blob
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

    def _metrics_only(self, si, ti, quads, geoms, src_ids):
        """Fully-vectorized finish for the include_geometry=False +
        area_cutoff path (the q_pieces shape): per-target batched clip
        → batched shoelace areas + batched perimeters, no per-piece
        Python. Degenerate boundary touches have area 0 and are dropped
        by the cutoff, so no boundary_intersection pass is needed.
        Returns the output table, or None when any candidate pair needs
        the scalar path (multi-ring source / concave target)."""
        idx = self.index
        if not idx.is_rect and idx.convex_ring is None:
            return None
        from ..geom.clip import (
            clip_rings_batch_convex,
            clip_rings_batch_rect,
            pad_rings,
            perimeter_batch,
            shoelace_batch,
        )

        if quads is not None:
            P_all = quads
            cnt_all = np.full(len(quads), 4, dtype=np.int64)
        else:
            if not all(len(g) == 1 and len(g[0]) == 1 for g in geoms):
                return None
            P_all, cnt_all = pad_rings([g[0][0] for g in geoms])
        if not idx.is_rect and any(
            idx.convex_ring[t] is None for t in np.unique(ti)
        ):
            return None
        areas = np.zeros(len(si), dtype=np.float64)
        lengths = np.zeros(len(si), dtype=np.float64)
        ordt = np.argsort(ti, kind="stable")
        ti_sorted = ti[ordt]
        t_starts = np.searchsorted(ti_sorted, np.arange(idx.n + 1))
        for t in np.unique(ti_sorted):
            rows = ordt[t_starts[t] : t_starts[t + 1]]
            s_sel = si[rows]
            if idx.is_rect:
                minx, miny, maxx, maxy = idx.bboxes[t]
                Pc, cc = clip_rings_batch_rect(
                    P_all[s_sel], cnt_all[s_sel], minx, miny, maxx, maxy
                )
            else:
                Pc, cc = clip_rings_batch_convex(
                    P_all[s_sel], cnt_all[s_sel], idx.convex_ring[t]
                )
            areas[rows] = shoelace_batch(Pc, cc)
            lengths[rows] = perimeter_batch(Pc, cc)
        keep = areas > self.area_cutoff
        si_k, ti_k = si[keep], ti[keep]
        return pa.table(
            {
                self.source_id_col: src_ids.take(
                    pa.array(si_k, type=pa.int64())
                ),
                self.target_id_col: pa.array(
                    [self.index.id_numpy[t] for t in ti_k],
                    type=self.index.ids.type,
                ),
                "area": pa.array(areas[keep]),
                "length": pa.array(lengths[keep]),
                "dim": pa.array(
                    np.full(int(keep.sum()), 2, dtype=np.int8),
                    type=pa.int8(),
                ),
            }
        )

    def _batch_clip(self, si, ti, quads, geoms):
        """Per-target batched S-H clips for eligible pairs. Returns a
        list aligned with (si, ti): clipped ring (np array, maybe
        degenerate) where the batch path applied, None where the caller
        must use the scalar path."""
        if len(si) == 0:
            return None
        idx = self.index
        if not idx.is_rect and idx.convex_ring is None:
            return None
        from ..geom.clip import (
            clip_rings_batch_convex,
            clip_rings_batch_rect,
            pad_rings,
        )

        if quads is not None:
            P_all = quads
            cnt_all = np.full(len(quads), 4, dtype=np.int64)
            eligible = np.ones(len(quads), dtype=bool)
        else:
            eligible = np.array(
                [len(g) == 1 and len(g[0]) == 1 for g in geoms]
            )
            if not eligible.any():
                return None
            rings = [
                g[0][0] if e else np.zeros((0, 2))
                for g, e in zip(geoms, eligible)
            ]
            P_all, cnt_all = pad_rings(rings)
        out = [None] * len(si)
        pe = eligible[si]
        ordt = np.argsort(ti, kind="stable")
        ti_sorted = ti[ordt]
        t_starts = np.searchsorted(ti_sorted, np.arange(idx.n + 1))
        for t in np.unique(ti_sorted):
            if not idx.is_rect:
                ring = idx.convex_ring[t]
                if ring is None:
                    continue
            rows = ordt[t_starts[t] : t_starts[t + 1]]
            rows = rows[pe[rows]]
            if not len(rows):
                continue
            s_sel = si[rows]
            if idx.is_rect:
                minx, miny, maxx, maxy = idx.bboxes[t]
                Pc, cc = clip_rings_batch_rect(
                    P_all[s_sel], cnt_all[s_sel], minx, miny, maxx, maxy
                )
            else:
                Pc, cc = clip_rings_batch_convex(
                    P_all[s_sel], cnt_all[s_sel], ring
                )
            for j, row_k in enumerate(rows):
                out[row_k] = Pc[j, : int(cc[j])]
        return out

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
