"""Spatial kNN block matching (BASELINE.json north_star component).

``knn_points`` — for each source point, the k nearest target points by
euclidean distance (ties broken by target id ascending — deterministic
and SQL-matchable: derived integer coordinates make d² an exact
integer).

Physical plans:
* broadcast (default): the target table is ``ray.put`` once; each batch
  computes exact chunked squared distances against the full target
  matrix (vectorized; right for target sets that fit a worker).
* cells: grid-bucketed candidate generation with ring expansion —
  targets bucketed by cell once per worker; each source looks at its
  cell ring-by-ring until k candidates are found AND the next ring
  cannot beat the current kth distance (exact, scale path; SURVEY §7.3
  kNN note).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["knn_points", "KnnActor", "knn_self_join"]


class KnnActor:
    def __init__(
        self,
        targets,
        k: int = 5,
        mode: str = "broadcast",
        cell_size: float | None = None,
        source_id_col: str = "source_id",
        target_id_col: str = "target_id",
        x_col: str = "x",
        y_col: str = "y",
        exclude_same_id: bool = False,
    ):
        from .assign import _resolve_table

        t = _resolve_table(targets)
        self.tids = t[target_id_col].to_numpy(zero_copy_only=False)
        self.tx = t[x_col].to_numpy().astype(np.float64)
        self.ty = t[y_col].to_numpy().astype(np.float64)
        order = np.lexsort((self.tids,))
        self.tids, self.tx, self.ty = (
            self.tids[order], self.tx[order], self.ty[order]
        )
        self.k = k
        self.mode = mode
        self.source_id_col = source_id_col
        self.target_id_col = target_id_col
        self.x_col = x_col
        self.y_col = y_col
        self.exclude_same_id = exclude_same_id
        if mode == "cells":
            if cell_size is None:
                span = max(
                    self.tx.max() - self.tx.min(),
                    self.ty.max() - self.ty.min(),
                    1e-9,
                )
                # ~2k targets per cell on average
                n_cells = max(1, len(self.tids) // 2000)
                cell_size = span / max(1, int(np.sqrt(n_cells)))
            self.cell_size = float(cell_size)
            cx = np.floor(self.tx / self.cell_size).astype(np.int64)
            cy = np.floor(self.ty / self.cell_size).astype(np.int64)
            self.buckets: dict[tuple[int, int], np.ndarray] = {}
            order2 = np.lexsort((cy, cx))
            keys = np.column_stack([cx, cy])[order2]
            bounds_ = np.nonzero(
                np.any(keys[1:] != keys[:-1], axis=1)
            )[0] + 1
            starts = np.concatenate([[0], bounds_, [len(keys)]])
            for s, e in zip(starts[:-1], starts[1:]):
                self.buckets[tuple(keys[s])] = order2[s:e]

    def __call__(self, batch: pa.Table) -> pa.Table:
        sx = batch[self.x_col].to_numpy().astype(np.float64)
        sy = batch[self.y_col].to_numpy().astype(np.float64)
        sids = batch[self.source_id_col].to_numpy(zero_copy_only=False)
        if self.mode == "cells":
            out_s, out_t, out_r = self._cells_batch(sids, sx, sy)
        else:
            out_s, out_t, out_r = self._broadcast(sids, sx, sy)
        return pa.table(
            {
                self.source_id_col: pa.array(out_s),
                "neighbor_id": pa.array(out_t),
                "rank": pa.array(out_r, type=pa.int64()),
            }
        )

    def _broadcast(self, sids, sx, sy):
        """Chunked exact kNN against the full target matrix — all rows
        of a chunk resolved in one stable argsort (targets are
        id-sorted in ``__init__``, so the stable sort keeps
        id-ascending order within distance ties = (d2, id) order)."""
        nt = len(self.tx)
        z = np.empty(0, dtype=np.int64)
        if nt == 0 or len(sx) == 0:
            return sids[:0], z, z
        out_s, out_t, out_r = [], [], []
        chunk = max(1, 4_000_000 // nt)
        width = min(self.k, nt)
        ranks = np.arange(width, dtype=np.int64)[None, :] + 1
        for s in range(0, len(sx), chunk):
            dx = sx[s : s + chunk, None] - self.tx[None, :]
            dy = sy[s : s + chunk, None] - self.ty[None, :]
            d2 = dx * dx + dy * dy
            csids = sids[s : s + chunk]
            if self.exclude_same_id:
                mask = self.tids[None, :] == csids[:, None]
                d2 = np.where(mask, np.inf, d2)
                counts = nt - mask.sum(axis=1)
            else:
                counts = np.full(len(csids), nt, dtype=np.int64)
            kk = np.minimum(counts, self.k).astype(np.int64)
            sel = np.argsort(d2, axis=1, kind="stable")[:, :width]
            keep = np.arange(width)[None, :] < kk[:, None]
            rows = np.nonzero(keep)[0]
            out_s.append(csids[rows])
            out_t.append(self.tids[sel[keep]])
            out_r.append(np.broadcast_to(ranks, keep.shape)[keep])
        return (
            np.concatenate(out_s),
            np.concatenate(out_t),
            np.concatenate(out_r),
        )

    def _cells_batch(self, sids, sx, sy):
        """Batch-vectorized cells mode: sources grouped by their cell
        (they share candidate rings exactly), ring expansion runs once
        PER OCCUPIED CELL with all of that cell's sources evaluated in
        one distance matrix (the r3 per-row ``_one_cells`` loop is
        gone). Ring certification is per cell group — expansion stops
        when EVERY source in the group has ≥k candidates and a kth
        distance strictly inside the guaranteed-covered radius, so
        each source sees a superset of its minimal candidate set and
        the top-k is unchanged (superset-invariance)."""
        cs = self.cell_size
        cx = np.floor(sx / cs).astype(np.int64)
        cy = np.floor(sy / cs).astype(np.int64)
        order = np.lexsort((cy, cx))
        keys = np.column_stack([cx, cy])[order]
        if len(keys) > 1:
            bounds_ = (
                np.nonzero(np.any(keys[1:] != keys[:-1], axis=1))[0] + 1
            )
        else:
            bounds_ = np.empty(0, dtype=np.int64)
        starts = np.concatenate([[0], bounds_, [len(keys)]]).astype(
            np.int64
        )
        out_s, out_t, out_r = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            gs = order[s:e]
            a, b, c = self._cell_group(
                sids[gs], sx[gs], sy[gs], int(keys[s][0]), int(keys[s][1])
            )
            out_s.append(a)
            out_t.append(b)
            out_r.append(c)
        if not out_s:
            z = np.empty(0, dtype=np.int64)
            return z, z, z
        return (
            np.concatenate(out_s),
            np.concatenate(out_t),
            np.concatenate(out_r),
        )

    def _cell_group(self, sids, sx, sy, ccx, ccy):
        """Ring expansion + exact top-k for all sources of ONE cell."""
        cs = self.cell_size
        k = self.k
        n_src = len(sx)
        cand: list[np.ndarray] = []
        ring = 0
        while True:
            for dx in range(-ring, ring + 1):
                for dy in range(-ring, ring + 1):
                    if max(abs(dx), abs(dy)) != ring:
                        continue
                    b = self.buckets.get((ccx + dx, ccy + dy))
                    if b is not None and len(b):
                        cand.append(b)
            idx = (
                np.concatenate(cand) if cand else np.empty(0, np.int64)
            )
            if len(idx):
                d2, counts = self._group_d2(sids, sx, sy, idx)
                if (counts >= k).all():
                    kth = np.partition(d2, k - 1, axis=1)[:, k - 1]
                    # strict: points beyond the ring are ≥ ring*cs away
                    ring_dist = ring * cs
                    if (ring_dist * ring_dist > kth).all():
                        break
            ring += 1
            if ring > 64:  # sparse fallback: brute force for the group
                idx = np.arange(len(self.tx))
                break
        # exact (d2, target_id) top-k, all sources at once: candidates
        # sorted by id once, then a stable row-wise argsort on d2 keeps
        # id-ascending order within distance ties
        if len(idx) == 0:
            z = np.empty(0, dtype=np.int64)
            return sids[:0], z, z
        o = np.argsort(self.tids[idx], kind="stable")
        idx = idx[o]
        d2, counts = self._group_d2(sids, sx, sy, idx)
        kk = np.minimum(counts, k).astype(np.int64)
        width = min(k, d2.shape[1])
        sel = np.argsort(d2, axis=1, kind="stable")[:, :width]
        keep = np.arange(width)[None, :] < kk[:, None]
        rows = np.nonzero(keep)[0]
        picked = sel[keep]
        ranks = np.arange(width, dtype=np.int64)[None, :] + 1
        return (
            sids[rows],
            self.tids[idx][picked],
            np.broadcast_to(ranks, keep.shape)[keep],
        )

    def _group_d2(self, sids, sx, sy, idx):
        """Distance matrix sources × candidates with self matches
        masked to inf (they must not count toward n_cand / kth — the
        ADVICE r1 high finding), plus per-source candidate counts."""
        d2 = (sx[:, None] - self.tx[idx][None, :]) ** 2 + (
            sy[:, None] - self.ty[idx][None, :]
        ) ** 2
        if self.exclude_same_id:
            mask = self.tids[idx][None, :] == sids[:, None]
            d2 = np.where(mask, np.inf, d2)
            counts = len(idx) - mask.sum(axis=1)
        else:
            counts = np.full(len(sx), len(idx), dtype=np.int64)
        return d2, counts


def knn_self_join(
    points,
    k: int = 5,
    extent=None,
    res: int | None = None,
    id_col: str = "source_id",
    x_col: str = "x",
    y_col: str = "y",
    max_rounds: int = 4,
    rows_per_cell: int = 256,
):
    """Exact distributed kNN self-join over a point Dataset — the
    100-TB-safe plan (no driver materialization, no broadcast of the
    point table; VERDICT r1 "what's wrong" #2).

    Physical shape per round: candidates are replicated to their cell's
    Chebyshev-``r`` ring, sources keyed to their own cell, ONE keyed
    shuffle + ``map_groups`` computes per-cell exact kNN. A source is
    CERTIFIED when its kth distance is strictly below ``r*cell_size``
    (the guaranteed covered radius), else it re-enters the next round
    with doubled ring radius and the candidate emission is filtered to
    the (small, collected) active-cell set. Stragglers after
    ``max_rounds`` fall back to a streamed partial-top-k pass (corpus
    streams; only the tiny residual query set is broadcast).

    Output: (id_col, neighbor_id, rank) — ties broken by (d², id)
    ascending, identical to :class:`KnnActor`. Self matches excluded.

    PARTITIONING ASSUMPTIONS: per-cell group size is bounded by cell
    occupancy × (2r+1)²; ``res`` is sized from the global count for
    ~``rows_per_cell`` per cell, which bounds groups for roughly
    uniform data. A pathological point mass (one cell holding a large
    fraction of all points) makes one group large — pre-key such data
    with ``ops.distributed.with_hot_cell_split`` and run per split, or
    raise ``res``. The certified-ring invariant is unaffected by the
    choice of ``res``; only group-size balance is. The UNCERTIFIED
    residual after round 1 is assumed small (a few cells' worth):
    with ``rows_per_cell`` targeting ~256, an r=1 ring carries ~9×256
    candidates for k ≪ 256, so certification fails only at extreme
    local sparsity; the residual is gathered to the driver between
    rounds (same assumption the stream fallback always made).

    Physical plan (round 3): ONE map pass emits source+candidate rows
    keyed by cell, ``ops.shuffle.hash_group_apply`` runs the per-cell
    kNN once per hash partition (no sort-based groupby operator, no
    per-group pandas dispatch), and the residual is pulled with P tiny
    tasks instead of extra Dataset jobs — the r2 version's per-round
    materialize/count/unique job chain was the entire 4.2 s wall.
    """
    import ray
    import ray.data  # noqa: F401

    from ..geom.cells import CellGrid

    if extent is None:
        raise ValueError("extent=(x0, y0, size) is required")
    grid = CellGrid(*extent)
    if res is None:
        n = points.count()  # parquet metadata count — cheap
        n_cells = max(1, n // rows_per_cell)
        res = max(1, int(np.log2(max(1.0, np.sqrt(n_cells)))) + 1)
    cell_size = float(extent[2]) / (1 << res)

    from .shuffle import hash_group_apply

    n_side = 1 << res

    def _emit(batch: pa.Table, r: int, active, with_sources: bool
              ) -> pa.Table:
        """Emit source rows (role=0, own cell — when with_sources) +
        candidate rows (role=1, every cell in the Chebyshev-r ring,
        active-filtered) in ONE pass over the input."""
        x = batch[x_col].to_numpy().astype(np.float64)
        y = batch[y_col].to_numpy().astype(np.float64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        cx = np.clip((
            (x - grid.x0) / grid.size * n_side).astype(np.int64), 0, n_side - 1)
        cy = np.clip((
            (y - grid.y0) / grid.size * n_side).astype(np.int64), 0, n_side - 1)
        cells_out, ids_out, x_out, y_out, role_out = [], [], [], [], []
        if with_sources:
            own = grid.pack(cx, cy, res)
            cells_out.append(own)
            ids_out.append(ids)
            x_out.append(x)
            y_out.append(y)
            role_out.append(np.zeros(len(ids), dtype=np.int8))
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                ncx, ncy = cx + dx, cy + dy
                ok = (
                    (ncx >= 0) & (ncx < n_side) & (ncy >= 0) & (ncy < n_side)
                )
                c = grid.pack(ncx[ok], ncy[ok], res)
                if active is not None:
                    m = np.isin(c.astype(np.int64), active)
                    c, sel = c[m], np.flatnonzero(ok)[m]
                else:
                    sel = np.flatnonzero(ok)
                if len(c) == 0:
                    continue
                cells_out.append(c)
                ids_out.append(ids[sel])
                x_out.append(x[sel])
                y_out.append(y[sel])
                role_out.append(np.ones(len(c), dtype=np.int8))
        if not cells_out:
            cells_out = [np.empty(0, dtype=np.uint64)]
            ids_out = [np.empty(0, dtype=np.int64)]
            x_out = [np.empty(0, dtype=np.float64)]
            y_out = [np.empty(0, dtype=np.float64)]
            role_out = [np.empty(0, dtype=np.int8)]
        return pa.table(
            {
                "cell": pa.array(
                    np.concatenate(cells_out), type=pa.uint64()
                ),
                id_col: pa.array(
                    np.concatenate(ids_out).astype(np.int64)
                ),
                x_col: pa.array(np.concatenate(x_out)),
                y_col: pa.array(np.concatenate(y_out)),
                "role": pa.array(np.concatenate(role_out)),
            }
        )

    def _sources_table(res_tbl: pa.Table) -> pa.Table:
        x = res_tbl[x_col].to_numpy().astype(np.float64)
        y = res_tbl[y_col].to_numpy().astype(np.float64)
        return pa.table(
            {
                "cell": pa.array(
                    grid.cell_of_points(x, y, res), type=pa.uint64()
                ),
                id_col: pa.array(
                    res_tbl[id_col].to_numpy().astype(np.int64)
                ),
                x_col: pa.array(x),
                y_col: pa.array(y),
                "role": pa.array(np.zeros(len(x), dtype=np.int8)),
            }
        )

    def _empty_out() -> pa.Table:
        return pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
                x_col: pa.array([], type=pa.float64()),
                y_col: pa.array([], type=pa.float64()),
            }
        )

    def _part_knn(tbl, starts, r_dist: float) -> pa.Table:
        """ops.shuffle partition fn: rows sorted by (cell, role, id),
        one slice pair per cell group — no per-group dispatch."""
        if tbl is None or len(starts) == 0:
            return _empty_out()
        role = tbl["role"].to_numpy(zero_copy_only=False)
        ids = tbl[id_col].to_numpy().astype(np.int64)
        xs = tbl[x_col].to_numpy().astype(np.float64)
        ys = tbl[y_col].to_numpy().astype(np.float64)
        ends = np.append(starts[1:], len(ids))
        r2 = r_dist * r_dist
        out_s, out_n, out_r = [], [], []
        raw_s, raw_x, raw_y = [], [], []
        ranks = np.arange(1, k + 1, dtype=np.int64)
        for s, e in zip(starts, ends):
            se = s + int(np.searchsorted(role[s:e], 1))
            if se == s:
                continue  # no sources in this cell
            cid = ids[se:e]
            cxs = xs[se:e]
            cys = ys[se:e]
            for i in range(s, se):
                sid = ids[i]
                m = cid != sid
                d2 = (cxs[m] - xs[i]) ** 2 + (cys[m] - ys[i]) ** 2
                ids_m = cid[m]
                if len(d2) >= k:
                    sel = np.argsort(
                        np.core.records.fromarrays(
                            [d2, ids_m], names="d,i"
                        ),
                        order=("d", "i"),
                        kind="stable",
                    )[:k]
                    if d2[sel[k - 1]] < r2:  # strict: ring-edge ties unsafe
                        out_s.append(np.full(k, sid, dtype=np.int64))
                        out_n.append(ids_m[sel])
                        out_r.append(ranks)
                        continue
                raw_s.append(sid)
                raw_x.append(xs[i])
                raw_y.append(ys[i])
        nd = len(out_s) * k
        nr = len(raw_s)
        return pa.table(
            {
                id_col: pa.array(
                    np.concatenate(
                        out_s + [np.asarray(raw_s, dtype=np.int64)]
                    )
                    if (out_s or raw_s)
                    else np.empty(0, dtype=np.int64)
                ),
                "neighbor_id": pa.array(
                    np.concatenate(
                        out_n + [np.full(nr, -1, dtype=np.int64)]
                    )
                    if (out_n or nr)
                    else np.empty(0, dtype=np.int64)
                ),
                "rank": pa.array(
                    np.concatenate(
                        out_r + [np.full(nr, -1, dtype=np.int64)]
                    )
                    if (out_r or nr)
                    else np.empty(0, dtype=np.int64)
                ),
                x_col: pa.array(
                    np.concatenate(
                        [
                            np.full(nd, np.nan),
                            np.asarray(raw_x, dtype=np.float64),
                        ]
                    )
                ),
                y_col: pa.array(
                    np.concatenate(
                        [
                            np.full(nd, np.nan),
                            np.asarray(raw_y, dtype=np.float64),
                        ]
                    )
                ),
            }
        )

    def _extract_done(t: pa.Table) -> pa.Table:
        f = t.filter(pa.compute.greater_equal(t["rank"], 0))
        return f.select([id_col, "neighbor_id", "rank"])

    def _extract_rem(t: pa.Table) -> pa.Table:
        f = t.filter(pa.compute.less(t["rank"], 0))
        return f.select([id_col, x_col, y_col])

    take_done = ray.remote(_extract_done)
    take_rem = ray.remote(_extract_rem)

    done_refs: list = []
    residual_tbl = None
    r = 1
    active = None
    for _round in range(max_rounds):
        r_dist = r * cell_size
        if residual_tbl is None:
            keyed = points.map_batches(
                lambda b, r=r: _emit(b, r, None, True),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        else:
            keyed = points.map_batches(
                lambda b, r=r, a=active: _emit(b, r, a, False),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).union(ray.data.from_arrow(_sources_table(residual_tbl)))
        part_refs = hash_group_apply(
            keyed,
            ["cell"],
            lambda t, s, rd=r_dist: _part_knn(t, s, rd),
            sort_cols=("role", id_col),
            return_refs=True,
        )
        done_refs += [take_done.remote(p) for p in part_refs]
        rem_tabs = [
            t
            for t in ray.get([take_rem.remote(p) for p in part_refs])
            if t.num_rows
        ]
        if not rem_tabs:
            residual_tbl = None
            break
        residual_tbl = pa.concat_tables(rem_tabs)
        # next round: doubled ring, candidate emission filtered to the
        # (small) set of cells that still hold uncertified sources
        active = np.unique(
            grid.cell_of_points(
                residual_tbl[x_col].to_numpy().astype(np.float64),
                residual_tbl[y_col].to_numpy().astype(np.float64),
                res,
            ).astype(np.int64)
        )
        r *= 2
    ds = ray.data.from_arrow_refs(done_refs)
    if residual_tbl is not None and residual_tbl.num_rows:
        ds = ds.union(
            _knn_stream_fallback(
                points, residual_tbl, k, id_col, x_col, y_col
            )
        )
    return ds


def _knn_stream_fallback(points, residual: pa.Table, k, id_col, x_col, y_col):
    """Exact kNN for a small residual query set: the corpus STREAMS
    through map_batches emitting per-batch partial top-k per query, then
    one tiny keyed merge — the same partial-top-k shape as
    vector.ann.brute_topk (corpus never gathered)."""
    import ray

    res_ref = ray.put(residual)

    def partial(batch: pa.Table) -> pa.Table:
        q = ray.get(res_ref)
        qx = q[x_col].to_numpy().astype(np.float64)
        qy = q[y_col].to_numpy().astype(np.float64)
        qid = q[id_col].to_numpy()
        bx = batch[x_col].to_numpy().astype(np.float64)
        by = batch[y_col].to_numpy().astype(np.float64)
        bid = batch[id_col].to_numpy(zero_copy_only=False)
        out_q, out_n, out_d = [], [], []
        for i in range(len(qid)):
            d2 = (bx - qx[i]) ** 2 + (by - qy[i]) ** 2
            m = bid != qid[i]
            d2m, idm = d2[m], bid[m]
            kk = min(k, len(d2m))
            if kk == 0:
                continue
            sel = np.argsort(
                np.core.records.fromarrays([d2m, idm], names="d,i"),
                order=("d", "i"),
                kind="stable",
            )[:kk]
            out_q += [qid[i]] * kk
            out_n += idm[sel].tolist()
            out_d += d2m[sel].tolist()
        return pa.table(
            {
                id_col: pa.array(out_q),
                "neighbor_id": pa.array(out_n),
                "d2": pa.array(out_d, type=pa.float64()),
            }
        )

    def merge(df):
        import pandas as pd

        df = df.sort_values(["d2", "neighbor_id"], kind="stable").head(k)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "neighbor_id": df["neighbor_id"].to_numpy(),
                "rank": np.arange(1, len(df) + 1, dtype=np.int64),
            }
        )

    return (
        points.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(id_col)
        .map_groups(merge)
    )


def knn_points(
    sources,
    targets: pa.Table,
    k: int = 5,
    mode: str = "broadcast",
    **kw,
):
    import ray

    fn_kwargs = dict(targets=targets, k=k, mode=mode, **kw)
    if isinstance(sources, pa.Table):
        return KnnActor(**fn_kwargs)(sources)
    if isinstance(targets, pa.Table):
        fn_kwargs["targets"] = ray.put(targets)
    from .assign import _cached_instance

    ref = fn_kwargs["targets"]
    key = ("knn", ref.hex() if isinstance(ref, ray.ObjectRef) else id(ref),
           k, mode, tuple(sorted(kw.items())))

    def fn(batch: pa.Table) -> pa.Table:
        return _cached_instance(KnnActor, key, fn_kwargs)(batch)

    return sources.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )
