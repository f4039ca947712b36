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

__all__ = ["knn_points", "KnnActor"]


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
            rows = [
                self._one_cells(sids[i], sx[i], sy[i]) for i in range(len(sx))
            ]
            out_s = [r0 for r in rows for r0 in r[0]]
            out_t = [r1 for r in rows for r1 in r[1]]
            out_r = [r2 for r in rows for r2 in r[2]]
        else:
            out_s, out_t, out_r = self._broadcast(sids, sx, sy)
        return pa.table(
            {
                self.source_id_col: pa.array(out_s),
                "neighbor_id": pa.array(out_t),
                "rank": pa.array(out_r, type=pa.int64()),
            }
        )

    def _topk(self, sid, d2, cand_idx):
        ids = self.tids[cand_idx]
        if self.exclude_same_id:
            keep = ids != sid
            d2, cand_idx, ids = d2[keep], cand_idx[keep], ids[keep]
        kk = min(self.k, len(ids))
        if kk == 0:
            return [], [], []
        # exact order: (d2, target_id)
        sel = np.argsort(
            np.core.records.fromarrays([d2, ids], names="d,i"),
            order=("d", "i"),
            kind="stable",
        )[:kk]
        return [sid] * kk, ids[sel].tolist(), list(range(1, kk + 1))

    def _broadcast(self, sids, sx, sy):
        out_s, out_t, out_r = [], [], []
        chunk = max(1, 4_000_000 // max(len(self.tx), 1))
        for s in range(0, len(sx), chunk):
            dx = sx[s : s + chunk, None] - self.tx[None, :]
            dy = sy[s : s + chunk, None] - self.ty[None, :]
            d2 = dx * dx + dy * dy
            for i in range(d2.shape[0]):
                a, b, c = self._topk(sids[s + i], d2[i], np.arange(len(self.tx)))
                out_s += a
                out_t += b
                out_r += c
        return out_s, out_t, out_r

    def _one_cells(self, sid, x, y):
        cs = self.cell_size
        cx, cy = int(np.floor(x / cs)), int(np.floor(y / cs))
        cand: list[np.ndarray] = []
        n_cand = 0
        ring = 0
        best_kth = np.inf
        while True:
            added = 0
            for dx in range(-ring, ring + 1):
                for dy in range(-ring, ring + 1):
                    if max(abs(dx), abs(dy)) != ring:
                        continue
                    b = self.buckets.get((cx + dx, cy + dy))
                    if b is not None:
                        # exclude the source's own point BEFORE it can
                        # contribute to n_cand / best_kth, else d2=0
                        # stops ring expansion one ring early and true
                        # neighbors are never gathered (ADVICE r1 high)
                        if self.exclude_same_id:
                            b = b[self.tids[b] != sid]
                        if len(b):
                            cand.append(b)
                            added += len(b)
            n_cand += added
            # can any point beyond this ring beat the kth distance?
            ring_dist = ring * cs  # min distance to cells outside ring
            if n_cand >= self.k and ring_dist * ring_dist > best_kth:
                break
            if n_cand >= self.k or added or ring < 2:
                idx = np.concatenate(cand) if cand else np.empty(0, np.int64)
                # best_kth is only meaningful once >= k candidates exist;
                # with fewer, the (len<k)-th best is an UNDER-estimate of
                # the true kth distance and stops expansion a ring early
                if len(idx) >= self.k:
                    d2 = (self.tx[idx] - x) ** 2 + (self.ty[idx] - y) ** 2
                    best_kth = np.partition(d2, self.k - 1)[self.k - 1]
            ring += 1
            if ring > 64:  # sparse fallback: brute force
                idx = np.arange(len(self.tx))
                d2 = (self.tx - x) ** 2 + (self.ty - y) ** 2
                return self._topk(sid, d2, idx)
        idx = np.concatenate(cand)
        d2 = (self.tx[idx] - x) ** 2 + (self.ty[idx] - y) ** 2
        return self._topk(sid, d2, idx)


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
