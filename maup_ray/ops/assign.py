"""assign — two-phase covering + max-intersection-area spatial join.

Semantics of maup.assign (ref: assign.py:13-54, indexed_geometries.py:
46-73), re-expressed Ray-Data-first: targets are the broadcast small
side (ray.put once, index built once per actor in ``__init__``),
sources stream through ``map_batches`` — phase (a) covering and phase
(b) area-argmax both resolve LOCALLY per source row because every
candidate target is present in the actor, so the whole op is one
shuffle-free streaming pass (vs. the reference's O(targets) Python
loop and vs. a naive groupby-argmax shuffle).

Fine print implemented (SURVEY.md §2.3): sources covered by 2+
overlapping targets fall through to phase (b); area ties break to the
first target in id-sorted order (pandas idxmax parity); unassigned
sources get null target_id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.boolean import intersection as poly_intersection
from ..geom.clip import clip_multipolygon_rect
from ..geom.core import area as poly_area
from ..geom.core import bounds
from ..geom.pip import covers
from ..geom.wkb import decode_polygons
from ..state.target_index import TargetIndex


class AssigmentWarning(UserWarning):
    """Some source geometries were not assigned to any target
    (ref: assign.py:9-10 — the reference's spelling, kept verbatim
    so downstream ``warnings.filterwarnings`` rules port unchanged)."""

__all__ = ["assign", "assign_by_covering", "assign_by_area", "AssignActor"]

# pairs per chunk in the cross-target broadcast kernels. Sized so one
# (chunk × edges × 4-vertex) float64 ufunc temp stays ~L2-resident
# (~2 MB) instead of streaming to DRAM: the kernels are
# bandwidth-bound, and on a 16-core box DRAM-sized temps are what
# caps multi-worker scaling (measured: see BASELINE.md round-3 notes).
import os as _os

_PAIR_CHUNK = int(_os.environ.get("MAUP_PAIR_CHUNK", str(1 << 13)))


def _resolve_table(t):
    import ray

    if isinstance(t, ray.ObjectRef):
        return ray.get(t)
    return t


def _autoscale(concurrency):
    """int N → (1, N): let the actor pool start at 1 so several pools
    plus read/shuffle tasks never deadlock on a small CPU budget."""
    if isinstance(concurrency, int) and concurrency > 1:
        return (1, concurrency)
    return concurrency


class AssignActor:
    """Callable class for ``map_batches`` — one TargetIndex per actor."""

    def __init__(
        self,
        targets,
        phase: str = "full",
        source_id_col: str = "source_id",
        target_id_col: str = "target_id",
        geometry_col: str = "geometry",
        x_col: str = "x",
        y_col: str = "y",
        keep_cols: tuple = (),
        targets_id_col: str = "target_id",
        targets_geometry_col: str = "geometry",
    ):
        self.index = TargetIndex(
            _resolve_table(targets), targets_id_col, targets_geometry_col
        )
        self.phase = phase
        self.source_id_col = source_id_col
        self.target_id_col = target_id_col
        self.geometry_col = geometry_col
        self.x_col = x_col
        self.y_col = y_col
        self.keep_cols = tuple(keep_cols)

    # ------------------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.geometry_col in batch.column_names:
            tpos = self._assign_polygons(batch)
        else:
            tpos = self._assign_points(batch)
        idx = self.index
        valid = tpos >= 0
        if len(idx.ids) == 0 or not valid.any():
            tgt = pa.nulls(len(tpos), type=idx.ids.type)
        else:
            # pure-Arrow id mapping: take against the target-id column
            # with a null mask (a per-row python loop here ran on
            # every batch of the headline path)
            import pyarrow.compute as pc

            taken = idx.ids.take(
                pa.array(np.where(valid, tpos, 0))
            ).combine_chunks()
            tgt = pc.if_else(
                pa.array(valid), taken, pa.scalar(None, type=idx.ids.type)
            )
        cols = {self.source_id_col: batch[self.source_id_col]}
        for c in self.keep_cols:
            cols[c] = batch[c]
        cols[self.target_id_col] = tgt
        return pa.table(cols)

    # ------------------------------------------------------------------
    def _assign_points(self, batch: pa.Table) -> np.ndarray:
        x = batch[self.x_col].to_numpy()
        y = batch[self.y_col].to_numpy()
        n = len(x)
        pi, ti = self.index.candidates_for_points(x, y)
        out = np.full(n, -1, dtype=np.int64)
        if len(pi) == 0:
            return out
        hit = self.index.contains_points(x, y, pi, ti)
        pi, ti = pi[hit], ti[hit]
        # first containing target in id-sorted order (ties: SURVEY §2.3.10)
        order = np.lexsort((ti, pi))
        pi, ti = pi[order], ti[order]
        first = np.ones(len(pi), dtype=bool)
        first[1:] = pi[1:] != pi[:-1]
        out[pi[first]] = ti[first]
        if self.phase == "covering":
            # 2+ containing targets → null (ref: indexed_geometries.py:58-71)
            dup_pts = pi[~first]
            out[dup_pts] = -1
        return out

    def _assign_polygons(self, batch: pa.Table) -> np.ndarray:
        from ..geom.pip import covers_batch
        from ..geom.wkb import decode_quads_bulk

        quads = decode_quads_bulk(batch[self.geometry_col])
        if quads is not None:
            # uniform-quad fast path: vertex/bbox arrays in one pass;
            # the nested-list view is built lazily ONLY for the scalar
            # concave-target fallback (never on the convex hot path)
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
        si, ti = self.index.candidates_for_bboxes(bboxes)
        n = len(quads) if quads is not None else len(geoms)

        def _geom_of(s):
            return [[quads[s]]] if quads is not None else geoms[s]

        out = np.full(n, -1, dtype=np.int64)
        if len(si) == 0:
            return out
        order = np.lexsort((si, ti))  # group by target
        si_t, ti_t = si[order], ti[order]
        CH = _PAIR_CHUNK  # pairs per chunk in the cross-target broadcasts
        if self.phase in ("full", "covering"):
            from ..geom.pip import (
                covers_quads_batch,
                covers_quads_convex_rows,
            )

            # covering: (quad, convex-target) pairs go through ONE
            # chunked (pairs × edges × 4-vertex) half-plane broadcast —
            # no per-target Python loop (the per-call fixed cost of 256
            # small numpy dispatches per target dominated small batches);
            # non-convex targets / non-quad sources keep the per-target
            # batched covers. "First cover" = smallest target index
            # (targets are id-sorted), so a running minimum replaces the
            # ascending-iteration bookkeeping — identical result.
            cover_count = np.zeros(n, dtype=np.int64)
            cover_first = np.full(n, self.index.n, dtype=np.int64)
            conv_pair = (
                self.index.convex_ok[ti_t]
                if quads is not None and self.index.convex_ok is not None
                else np.zeros(len(ti_t), dtype=bool)
            )
            vp = np.flatnonzero(conv_pair)
            for s0 in range(0, len(vp), CH):
                sl = vp[s0 : s0 + CH]
                res = covers_quads_convex_rows(
                    self.index.edge_a[ti_t[sl]],
                    self.index.edge_b[ti_t[sl]],
                    quads[si_t[sl]],
                )
                hs, ht = si_t[sl][res], ti_t[sl][res]
                cover_count += np.bincount(hs, minlength=n)
                np.minimum.at(cover_first, hs, ht)
            if not conv_pair.all():
                si_r, ti_r = si_t[~conv_pair], ti_t[~conv_pair]
                t_bounds = np.searchsorted(
                    ti_r, np.arange(self.index.n + 1)
                )
                for t in np.unique(ti_r):
                    sl = si_r[t_bounds[t] : t_bounds[t + 1]]
                    if quads is not None:
                        res = covers_quads_batch(
                            self.index.geom(t), quads[sl]
                        )
                    else:
                        res = covers_batch(
                            self.index.geom(t), [geoms[s] for s in sl]
                        )
                    hit = sl[res]
                    cover_count[hit] += 1
                    np.minimum.at(cover_first, hit, t)
            once = cover_count == 1
            out[once] = cover_first[once]
            if self.phase == "covering":
                return out  # 0 or 2+ covers → null (ref fine print 2)
        # phase (b) for the remainder: max intersection area per source,
        # tie → first target in id-sorted order (pandas idxmax parity).
        # Cross-target vectorized: every (single-ring source, rect-or-
        # convex target) pair is clipped against ITS OWN target in one
        # chunked per-row Sutherland–Hodgman pass (geom.clip *_rows
        # kernels — per-element arithmetic identical to the per-target
        # path, so results match bit-for-bit); only holes/multi-ring
        # sources or concave targets fall back to per-pair scalar clips.
        from ..geom.clip import (
            clip_area_batch_convex_rows,
            clip_area_batch_rect_rows,
            pad_rings,
        )

        if self.phase == "full":
            todo_mask = out == -1
        else:
            todo_mask = np.ones(n, dtype=bool)
        pair_m = todo_mask[si]
        psi, pti = si[pair_m], ti[pair_m]
        if len(psi) == 0:
            return out
        if quads is not None:
            P_all = quads
            cnt_all = np.full(len(quads), 4, dtype=np.int64)
            eligible = np.ones(n, dtype=bool)
        else:
            eligible = np.array(
                [len(g) == 1 and len(g[0]) == 1 for g in geoms]
            )
            rings = [
                g[0][0] if e else np.zeros((0, 2))
                for g, e in zip(geoms, eligible)
            ]
            P_all, cnt_all = pad_rings(rings)
        areas = np.zeros(len(psi), dtype=np.float64)
        pair_elig = eligible[psi]
        if self.index.is_rect:
            vec_pair = pair_elig
        elif self.index.convex_ok is not None:
            vec_pair = pair_elig & self.index.convex_ok[pti]
        else:
            vec_pair = np.zeros(len(psi), dtype=bool)
        vp = np.flatnonzero(vec_pair)
        for s0 in range(0, len(vp), CH):
            sl = vp[s0 : s0 + CH]
            s_sel = psi[sl]
            if self.index.is_rect:
                a = clip_area_batch_rect_rows(
                    P_all[s_sel], cnt_all[s_sel], self.index.bboxes[pti[sl]]
                )
            else:
                a = clip_area_batch_convex_rows(
                    P_all[s_sel],
                    cnt_all[s_sel],
                    self.index.edge_a[pti[sl]],
                    self.index.edge_b[pti[sl]],
                )
            areas[sl] = a
        for r in np.flatnonzero(~vec_pair):
            g = _geom_of(psi[r])
            if g:
                areas[r] = self._inter_area(g, pti[r])
        # argmax per source: area desc, tie → smallest target id; zero
        # area never assigns (scalar-parity: best starts at 0.0)
        sel = np.lexsort((pti, -areas, psi))
        psi_s, pti_s, a_s = psi[sel], pti[sel], areas[sel]
        first = np.ones(len(sel), dtype=bool)
        first[1:] = psi_s[1:] != psi_s[:-1]
        win = first & (a_s > 0.0)
        out[psi_s[win]] = pti_s[win]
        return out

    def _inter_area(self, src, t: int) -> float:
        if self.index.is_rect:
            minx, miny, maxx, maxy = self.index.bboxes[t]
            return poly_area(
                clip_multipolygon_rect(src, minx, miny, maxx, maxy)
            )
        ring = (
            self.index.convex_ring[t]
            if self.index.convex_ring is not None
            else None
        )
        if ring is not None:
            from ..geom.clip import clip_multipolygon_convex

            return poly_area(clip_multipolygon_convex(src, ring))
        return poly_area(poly_intersection(src, self.index.geom(t)))


# per-worker-process instance cache for task-mode broadcast joins:
# tasks reuse warm worker processes, so the index builds once per
# worker instead of once per actor-pool spawn (actor pools respawn on
# every Dataset execution; tasks amortize across jobs)
_WORKER_CACHE: dict = {}


def _cached_instance(cls, key, kwargs):
    inst = _WORKER_CACHE.get(key)
    if inst is None:
        inst = cls(**kwargs)
        _WORKER_CACHE[key] = inst
    return inst


def _run(sources, targets, phase, concurrency, batch_size, use_actors=False, **kw):
    import ray

    from ..crs import check_same_crs

    check_same_crs(sources, targets)  # ref: assign.py:13 @require_same_crs
    if isinstance(targets, pa.Table) and not isinstance(
        sources, pa.Table
    ):
        targets = ray.put(targets)
    fn_kwargs = dict(targets=targets, phase=phase, **kw)
    if isinstance(sources, pa.Table):
        actor = AssignActor(**fn_kwargs)
        out = actor(sources)
        # local path sees the nulls; mirror the reference's warning
        # (ref assign.py:29-35). The streaming Dataset path is lazy —
        # counting nulls there would force an extra pass, so warning
        # is the consumer's observation (null target_id rows).
        if phase == "full" and out["target_id"].null_count:
            import warnings

            warnings.warn(
                "Warning: Some units in the source geometry were "
                "unassigned.",
                AssigmentWarning,
            )
        return out
    if use_actors:
        return sources.map_batches(
            AssignActor,
            fn_constructor_kwargs=fn_kwargs,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=_autoscale(concurrency),
            batch_size=batch_size,
        )
    key = (
        "assign",
        targets.hex() if isinstance(targets, ray.ObjectRef) else id(targets),
        phase,
        tuple(sorted(kw.items())),
    )

    def fn(batch: pa.Table) -> pa.Table:
        return _cached_instance(AssignActor, key, fn_kwargs)(batch)

    return sources.map_batches(
        fn,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


def assign(
    sources,
    targets,
    *,
    concurrency=4,
    batch_size=None,
    **kw,
):
    """Full two-phase assign. ``sources`` is a Dataset (or a pa.Table
    for local/oracle runs); ``targets`` a small pa.Table (auto
    ``ray.put``) or an ObjectRef. Returns (source_id, *keep_cols,
    target_id) with null target_id for unassigned (ref: assign.py:19)."""
    return _run(sources, targets, "full", concurrency, batch_size, **kw)


def assign_by_covering(sources, targets, *, concurrency=4, batch_size=None, **kw):
    """Phase (a) only (ref: assign.py:40-42)."""
    return _run(sources, targets, "covering", concurrency, batch_size, **kw)


def assign_by_area(sources, targets, *, concurrency=4, batch_size=None, **kw):
    """Phase (b) only (ref: assign.py:45-46)."""
    return _run(sources, targets, "area", concurrency, batch_size, **kw)


def assign_to_max(
    weights,
    source_col: str = "source",
    target_col: str = "target",
    weight_col: str = "weight",
):
    """Per-source argmax over a (source, target, weight) relation —
    the public parity surface for reference ``assign.py:49-54``
    (``weights.groupby(level="source").idxmax()`` + index-drop).

    Tie parity: pandas ``idxmax`` keeps the FIRST occurrence in index
    order; the reference always feeds it a (source, target)-sorted
    MultiIndex (``intersections.py:44-47`` sorts before returning),
    so first-occurrence == smallest target id — which is exactly the
    ``(weight desc, target asc)`` rule used here. Rows with
    non-positive or null weight never win (scalar-assign parity:
    a zero-area piece cannot capture a source).

    ``weights`` may be a ``pa.Table`` (local argmax, one lexsort) or
    a Dataset (distributed: pruned 24 B/row projection hash-shuffled
    by source, per-partition lexsort argmax — ids must be integers,
    the repo-wide explicit-id convention). → (source_col, target_id)
    with one row per source that has any positive-weight candidate.
    """

    def _argmax_local(tbl: pa.Table) -> pa.Table:
        s = tbl[source_col].to_numpy(zero_copy_only=False)
        t = tbl[target_col].to_numpy(zero_copy_only=False)
        w = tbl[weight_col].to_numpy(zero_copy_only=False)
        w = np.nan_to_num(
            w.astype(np.float64, copy=False), nan=0.0
        )
        sel = np.lexsort((t, -w, s))
        s_s, t_s, w_s = s[sel], t[sel], w[sel]
        first = np.ones(len(sel), dtype=bool)
        first[1:] = s_s[1:] != s_s[:-1]
        win = first & (w_s > 0.0)
        return pa.table(
            {
                source_col: pa.array(s_s[win]),
                "target_id": pa.array(t_s[win]),
            }
        )

    if isinstance(weights, pa.Table):
        return _argmax_local(weights)

    from .shuffle import hash_group_apply

    proj = weights.map_batches(
        lambda b: b.select([source_col, target_col, weight_col]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def part(tbl, starts):
        if tbl is None or tbl.num_rows == 0:
            return pa.table(
                {
                    source_col: pa.array([], type=pa.int64()),
                    "target_id": pa.array([], type=pa.int64()),
                }
            )
        return _argmax_local(tbl)

    return hash_group_apply(proj, [source_col], part)
