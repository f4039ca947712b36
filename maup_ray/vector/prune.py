"""SemDeDup-style semantic pruning: k-means cluster the embedding
corpus, then greedily drop near-duplicate members inside each cluster
(Abbas et al. 2023, "SemDeDup" — public arXiv:2303.09540 pattern).

Scale shape: one partition-invariant k-means fit (O(k·d) partials per
block — vector/kmeans.py), one assignment pass, then ONE hash shuffle
keyed by cluster id. Moving the embedding vectors through that shuffle
is inherent to the algorithm (within-cluster pairwise similarity needs
the vectors co-located); the shuffle is keyed by the k-means cluster,
so partition sizes track cluster sizes — k is the skew knob (SemDeDup
uses k large enough that clusters fit memory; hot clusters can also be
pre-split with ops/shuffle.salt_keys at the cost of cross-salt recall,
same documented trade as LSH max_bucket).

Inside a cluster, members are visited in ascending id order and a
member is DROPPED if its cosine similarity to an already-kept member
reaches ``threshold`` (the kept member with max similarity is recorded
as ``dup_of``). The visit order is deterministic and the centroids are
bit-identical across block structures (kmeans.py), so the output is
partition-invariant end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import _normalize, embedding_matrix
from .kmeans import det_sims, kmeans_fit

__all__ = ["semantic_prune"]


def _prune_group(V: np.ndarray, order: np.ndarray, threshold: float):
    """Greedy keep-scan over one cluster's normalized vectors, visited
    in ``order``. Returns (keep bool, dup_pos int) aligned to V's row
    order; dup_pos = row index of the kept near-duplicate, -1 if kept."""
    m = len(order)
    keep = np.zeros(m, dtype=bool)
    dup_pos = np.full(m, -1, dtype=np.int64)
    kept_rows: list[int] = []
    for pos in order:
        if not kept_rows:
            keep[pos] = True
            kept_rows.append(pos)
            continue
        # det_sims (not BLAS matvec): keep/drop must not depend on how
        # many rows are in the kept set when a sim sits at threshold
        sims = det_sims(V[kept_rows], V[pos : pos + 1])[:, 0]
        j = int(np.argmax(sims))
        if sims[j] >= threshold:
            dup_pos[pos] = kept_rows[j]
        else:
            keep[pos] = True
            kept_rows.append(pos)
    return keep, dup_pos


def semantic_prune(
    ds,
    k: int = 16,
    iters: int = 4,
    threshold: float = 0.99,
    col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 2048,
    seed: int = 99,
    salt: int = 1,
):
    """→ Dataset (id_col, cluster, keep, dup_of): every input row with
    its cluster, whether it survives pruning, and (for dropped rows)
    the kept member it duplicates. ``ds`` must be reusable (fit
    materializes it; a pa.Table is used directly).

    ``salt > 1`` sub-splits every cluster into ``salt`` deterministic
    shards by a pure hash of the row id (NOT ops/shuffle.salt_keys,
    whose row-counter mix is partition-dependent) — the hot-cluster
    skew escape hatch when k alone can't bound the largest cluster.
    The documented trade (same as LSH max_bucket): near-duplicates
    that land in different shards of the same cluster are NOT
    compared, so recall drops roughly by the cross-shard pair
    fraction; exact-duplicate groups still keep exactly their
    per-shard min ids. Output stays partition-invariant because the
    shard is a pure function of the id."""
    import ray
    import ray.data

    from ..ops.shuffle import _hash_keys, hash_group_apply

    C = kmeans_fit(
        ds,
        k=k,
        iters=iters,
        col=col,
        id_col=id_col,
        sample_size=sample_size,
        seed=seed,
    )
    ref = ray.put(C)

    def assign_with_vec(batch: pa.Table) -> pa.Table:
        C_ = ray.get(ref)
        cm = _normalize(embedding_matrix(batch, col))
        a = np.argmax(det_sims(cm, C_), axis=1)
        cols = {
            id_col: batch[id_col],
            "cluster": pa.array(a.astype(np.int64)),
            col: batch[col],
        }
        if salt > 1:
            shard = _hash_keys(batch, [id_col]) % np.uint64(salt)
            cols["_salt"] = pa.array(shard.astype(np.int64))
        return pa.table(cols)

    if isinstance(ds, pa.Table):
        assigned = assign_with_vec(ds)
    else:
        assigned = ds.map_batches(
            assign_with_vec, batch_format="pyarrow", zero_copy_batch=True
        )

    if isinstance(ds, pa.Table):
        id_type = ds.schema.field(id_col).type
    else:
        sch = ds.schema()  # ray.data.Schema wrapper
        id_type = dict(zip(sch.names, sch.types))[id_col]
    out_schema = pa.schema(
        [
            (id_col, id_type),
            ("cluster", pa.int64()),
            ("keep", pa.bool_()),
            ("dup_of", id_type),
        ]
    )

    def prune_fn(tbl, starts: np.ndarray) -> pa.Table:
        if tbl is None or tbl.num_rows == 0:
            return out_schema.empty_table()
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        V = _normalize(embedding_matrix(tbl, col))
        n = tbl.num_rows
        keep = np.zeros(n, dtype=bool)
        dup_idx = np.full(n, -1, dtype=np.int64)
        bounds = list(starts) + [n]
        for g in range(len(starts)):
            lo, hi = bounds[g], bounds[g + 1]
            order = lo + np.argsort(ids[lo:hi], kind="stable")
            kp, dp = _prune_group(V[lo:hi], order - lo, threshold)
            keep[lo:hi] = kp
            dup_idx[lo:hi] = np.where(dp >= 0, dp + lo, -1)
        dup_of = pa.array(
            np.where(dup_idx >= 0, ids[dup_idx], ids[0]),
        ).cast(out_schema.field("dup_of").type)
        dup_of = pa.compute.if_else(
            pa.array(dup_idx >= 0), dup_of, pa.nulls(n, id_type)
        )
        return pa.table(
            {
                id_col: tbl[id_col].cast(id_type),
                "cluster": tbl["cluster"],
                "keep": pa.array(keep),
                "dup_of": dup_of,
            }
        )

    keys = ["cluster"] if salt <= 1 else ["cluster", "_salt"]
    return hash_group_apply(assigned, keys, prune_fn)
