"""Distributed k-means over an embedding column — the embedding
curation primitive (cluster-then-prune / SemDeDup-style selection,
coarse quantizer training at corpus scale).

Physical shape per Lloyd iteration: centroids broadcast (``ray.put``
once per iteration), each batch computes one matmul assignment and
emits a (k × d sums, k counts) PARTIAL — so the shuffle payload per
block is O(k·d), never O(rows). The driver merges k×d partials and
renormalizes.

PARTITION-INVARIANT accumulation: per-row contributions are quantized
to a fixed 2^-40 grid (normalized coords are in [-1, 1], so each fits
int64 with ~12 exact decimal digits) and summed as INTEGERS — exact in
int64 inside a block (safe to 2^22 rows/block, far above any Arrow
block) and in arbitrary-precision Python ints across blocks. Every
row's quantized contribution is a pure function of (row, centroids),
integer addition is exact in any order, and the final mean divides two
exact integers (one correctly-rounded float64 division) — so centroids
are BIT-IDENTICAL regardless of block structure, merge order, or
num_cpus, not merely deterministic for a fixed layout. The 2^-40
quantization shifts each mean by ≤ ~1e-12·d relative — invisible at
the 1e-6 tolerance the numpy-replica test pins, and irrelevant to
Lloyd convergence. Assignments are exact on separated data (pytest).

Cosine metric throughout (vectors L2-normalized, centroids
renormalized after every mean) — matches ``vector.ann``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import _normalize, embedding_matrix

__all__ = ["kmeans_fit", "kmeans_assign", "kmeans", "det_sims"]


def det_sims(cm: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Deterministic (batch-shape-independent) similarity matrix.

    BLAS dgemm's rounding depends on the matrix shapes (blocking /
    kernel choice), so ``cm @ C.T`` gives last-ulp-different dot
    products when the same rows arrive in different-sized batches —
    observed as num_cpus-dependent ``sim`` hashes on bit-identical
    centroids. numpy's ufunc reduce along a contiguous last axis is a
    pure per-row function of (d, values), so one multiply + row-sum
    per centroid yields bit-identical similarities whatever the block
    structure. O(n·k·d) flops like the matmul, one O(n·d) temp."""
    n, d = cm.shape
    k = len(C)
    out = np.empty((n, k), dtype=np.float64)
    tmp = np.empty_like(cm)
    for j in range(k):
        np.multiply(cm, C[j], out=tmp)
        np.sum(tmp, axis=1, out=out[:, j])
    return out


def _init_centroids(ds, k, col, id_col, sample_size, seed):
    """Deterministic hash-sampled init (the ivf_topk discipline: never
    the head of the dataset).

    Materializes ``ds`` once so the ``iters`` Lloyd passes reuse
    object-store blocks instead of re-reading storage per iteration —
    the right trade for a pruned (id, embedding) projection, which is
    what callers pass (q_embed_cluster reads exactly two columns). The
    object store spills past memory; with very large corpora and few
    iterations, passing a non-materialized Dataset re-reads instead —
    both paths produce bit-identical centroids (partition invariance
    above)."""
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
    # canonical row order (by id) so the seeded rng.choice below picks
    # the same rows whatever block order the sample arrived in — init
    # must be partition-invariant for fit() to be
    sort_idx = np.argsort(
        sample[id_col].to_numpy(zero_copy_only=False), kind="stable"
    )
    sample = sample.take(pa.array(sort_idx))
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
            a = np.argmax(det_sims(cm, C_), axis=1)
            d = cm.shape[1]
            # fixed-point 2^-40 quantized contributions: exact int64
            # sums inside the block (|q| <= 2^40, rows/block << 2^22)
            q = np.rint(cm * float(1 << 40)).astype(np.int64)
            sums = np.zeros((kk, d), dtype=np.int64)
            np.add.at(sums, a, q)
            counts = np.bincount(a, minlength=kk).astype(np.int64)
            return pa.table(
                {
                    "c": pa.array(np.arange(kk, dtype=np.int64)),
                    "n": pa.array(counts),
                    "s": pa.array(list(sums), type=pa.list_(pa.int64())),
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
        # arbitrary-precision merge: int64 partials would overflow past
        # ~2^23 rows per cluster corpus-wide; Python ints never do, and
        # exact addition makes the merge order irrelevant
        d = C.shape[1]
        sums = np.zeros((kk, d), dtype=object)
        counts = np.zeros(kk, dtype=object)
        for t in parts:
            counts = counts + t["n"].to_numpy(zero_copy_only=False)
            flat = t["s"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False
            )
            sums = sums + flat.reshape(kk, -1)
        nz = np.array([int(c) > 0 for c in counts], dtype=bool)
        # int/int true division is correctly rounded — ONE rounding per
        # coordinate from the exact rational, hence bit-stable
        means = np.array(
            [
                [int(v) / (int(c) << 40) for v in row]
                for row, c in zip(sums[nz], counts[nz])
            ],
            dtype=np.float64,
        ).reshape(int(nz.sum()), d)
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
        sims = det_sims(cm, C)
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
