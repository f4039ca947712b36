"""Distributed k-means over an embedding column — the embedding
curation primitive (cluster-then-prune / SemDeDup-style selection,
coarse quantizer training at corpus scale).

Physical shape per Lloyd iteration: centroids broadcast (``ray.put``
once per iteration), each batch computes one matmul assignment and
emits a (k × d sums, k counts) PARTIAL — so the shuffle payload per
block is O(k·d), never O(rows). The driver merges k×d partials and
renormalizes. Fixed seeded init from a deterministic hash sample +
fixed iteration count → deterministic for a fixed block structure
(partial-sum merge order follows block order; float centroids agree
with a local numpy replica to allclose, and assignments exactly on
separated data — pytest pins both).

Cosine metric throughout (vectors L2-normalized, centroids
renormalized after every mean) — matches ``vector.ann``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import _normalize, embedding_matrix

__all__ = ["kmeans_fit", "kmeans_assign", "kmeans"]


def _init_centroids(ds, k, col, id_col, sample_size, seed):
    """Deterministic hash-sampled init (the ivf_topk discipline: never
    the head of the dataset)."""
    import ray

    from ..ops.shuffle import _hash_keys

    ds = ds.materialize()
    n_total = ds.count()
    if n_total > sample_size:
        mod = np.uint64(1 << 20)
        frac = np.uint64(
            min(int(mod), int(int(mod) * sample_size * 1.3 / n_total) + 1)
        )

        def samp(batch: pa.Table) -> pa.Table:
            h = _hash_keys(batch.select([id_col]), [id_col])
            return batch.filter(pa.array(h % mod < frac))

        src = ds.map_batches(
            samp, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        src = ds
    tabs = [
        t
        for t in (
            ray.get(r) for r in src.materialize().to_arrow_refs()
        )
        if t.num_columns
    ]
    sample = pa.concat_tables(tabs).combine_chunks()
    if len(sample) > sample_size:
        h = _hash_keys(sample.select([id_col]), [id_col])
        order = np.argsort(h, kind="stable")[:sample_size]
        sample = sample.take(pa.array(order))
    X = _normalize(embedding_matrix(sample, col))
    rng = np.random.RandomState(seed)
    init = rng.choice(len(X), size=min(k, len(X)), replace=False)
    return ds, X[init].copy()


def kmeans_fit(
    ds,
    k: int = 16,
    iters: int = 5,
    col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 2048,
    seed: int = 99,
) -> np.ndarray:
    """Lloyd iterations over the FULL corpus with O(k·d) partials per
    block. Returns the (k, d) centroid matrix."""
    import ray

    ds, C = _init_centroids(ds, k, col, id_col, sample_size, seed)
    kk = len(C)
    for _ in range(iters):
        ref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            C_ = ray.get(ref)
            cm = _normalize(embedding_matrix(batch, col))
            a = np.argmax(cm @ C_.T, axis=1)
            d = cm.shape[1]
            sums = np.zeros((kk, d), dtype=np.float64)
            np.add.at(sums, a, cm)
            counts = np.bincount(a, minlength=kk).astype(np.int64)
            return pa.table(
                {
                    "c": pa.array(np.arange(kk, dtype=np.int64)),
                    "n": pa.array(counts),
                    "s": pa.array(list(sums), type=pa.list_(pa.float64())),
                }
            )

        parts = [
            ray.get(r)
            for r in ds.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            )
            .materialize()
            .to_arrow_refs()
        ]
        parts = [t for t in parts if t.num_columns and t.num_rows]
        sums = np.zeros_like(C)
        counts = np.zeros(kk, dtype=np.int64)
        for t in parts:
            counts += t["n"].to_numpy(zero_copy_only=False)
            flat = t["s"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False
            )
            sums += flat.reshape(kk, -1)
        nz = counts > 0
        means = sums[nz] / counts[nz, None]
        norms = np.linalg.norm(means, axis=1, keepdims=True)
        C[nz] = means / np.where(norms == 0, 1.0, norms)
    return C


def kmeans_assign(
    ds,
    centroids: np.ndarray,
    col: str = "embedding",
    id_col: str = "vec_id",
):
    """(id, cluster, sim) Dataset — one matmul per batch against the
    broadcast centroid matrix."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        C = ray.get(ref)
        cm = _normalize(embedding_matrix(batch, col))
        sims = cm @ C.T
        a = np.argmax(sims, axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(a.astype(np.int64)),
                "sim": pa.array(sims[np.arange(len(a)), a]),
            }
        )

    if isinstance(ds, pa.Table):
        return assign(ds)
    return ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


def kmeans(ds, k: int = 16, iters: int = 5, **kw):
    """fit + assign in one call (ds must be reusable — a Dataset is
    materialized inside fit)."""
    C = kmeans_fit(ds, k=k, iters=iters, **kw)
    return kmeans_assign(ds, C, col=kw.get("col", "embedding"),
                         id_col=kw.get("id_col", "vec_id"))
