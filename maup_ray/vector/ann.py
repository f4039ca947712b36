"""Similarity search over an embedding column (list<float>).

* ``brute_topk`` — exact cosine top-k: the query matrix is broadcast
  (ray.put once), every batch does ONE numpy matmul against it and
  emits per-batch partial top-k rows; a small keyed groupby merges
  partials into the global top-k. Shuffle payload is O(queries × k ×
  batches), never the corpus.
* ``lsh_topk`` — the scale path: random-hyperplane signatures bucket
  the corpus (signature prefix groupby); exact rerank only within the
  query's bucket and its hamming-1 neighbors. Recall<1 by design;
  parameters trade recall for fan-out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["embedding_matrix", "brute_topk", "lsh_topk", "ivf_topk",
           "cosine_near_dup", "hamming_topk"]


def embedding_matrix(batch: pa.Table, col="embedding") -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(arr), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1.0, n)


def brute_topk(
    ds,
    queries: pa.Table,
    k: int = 5,
    id_col: str = "vec_id",
    col: str = "embedding",
    query_id_col: str = "query_id",
):
    """Exact cosine top-k of every corpus row against each query row.

    ``queries``: table (query_id, embedding). Returns
    (query_id, vec_id, rank) with rank 1..k by similarity desc,
    vec_id asc on ties.
    """
    import ray

    qm = _normalize(embedding_matrix(queries, col))
    qids = queries[query_id_col].to_numpy(zero_copy_only=False)
    q_ref = ray.put((qids, qm))

    def partial(batch: pa.Table) -> pa.Table:
        qids_, qm_ = ray.get(q_ref)
        cm = _normalize(embedding_matrix(batch, col))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sims = cm @ qm_.T  # (batch, nq)
        kk = min(k, len(ids))
        # per-query partial top-k within this batch
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids_)):
            rows = part[:, qi]
            out_q.extend([qids_[qi]] * len(rows))
            out_v.extend(ids[rows].tolist())
            out_s.extend(sims[rows, qi].tolist())
        return pa.table(
            {
                query_id_col: pa.array(out_q),
                id_col: pa.array(out_v),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    def final(df):
        import pandas as pd

        df = df.sort_values(
            ["sim", id_col], ascending=[False, True], kind="stable"
        ).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[[query_id_col, id_col, "rank"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(query_id_col)
        .map_groups(final)
    )


def ivf_topk(
    ds,
    queries: pa.Table,
    k: int = 5,
    n_centroids: int = 32,
    n_probe: int = 4,
    kmeans_iters: int = 5,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 99,
):
    """IVF (inverted-file) approximate top-k — the other scale path.

    Coarse quantizer: k-means (fixed seeded init, fixed iterations —
    deterministic) trained on a bounded sample pulled once; centroids
    broadcast. Each corpus batch assigns rows to their nearest centroid
    and computes similarities only for queries probing that centroid
    (each query probes its ``n_probe`` nearest centroids). Partial
    top-k per batch, grouped merge — same shuffle shape as brute_topk
    but touching ~n_probe/n_centroids of the corpus per query.
    """
    import ray

    qm = _normalize(embedding_matrix(queries, col))
    qids = queries[query_id_col].to_numpy(zero_copy_only=False)
    # --- train coarse quantizer on a bounded deterministic sample.
    # A deterministic HASH sample of the whole corpus, not ds.limit():
    # the head of an id- or time-sorted corpus is a skewed quantizer
    # with silently bad recall. Rows whose id-hash falls under a
    # fraction sized from the corpus count pass the filter; the
    # driver then ranks by the same hash and caps at sample_size, so
    # the sample is independent of block order and layout.
    from ..ops.shuffle import _hash_keys

    ds = ds.materialize()  # consumed twice (count+sample, then scan)
    n_total = ds.count()
    if n_total > sample_size:
        mod = np.uint64(1 << 20)
        frac = np.uint64(
            min(int(mod), int(int(mod) * sample_size * 1.3 / n_total) + 1)
        )

        def samp(batch: pa.Table) -> pa.Table:
            h = _hash_keys(batch.select([id_col]), [id_col])
            return batch.filter(pa.array(h % mod < frac))

        sample_src = ds.map_batches(
            samp, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        sample_src = ds
    tabs = [
        ray.get(r)
        for r in sample_src.materialize().to_arrow_refs()
    ]
    sample_tbl = pa.concat_tables(
        [t for t in tabs if t.num_columns]
    ).combine_chunks()
    if len(sample_tbl) > sample_size:
        h = _hash_keys(sample_tbl.select([id_col]), [id_col])
        order = np.argsort(h, kind="stable")[:sample_size]
        sample_tbl = sample_tbl.take(pa.array(order))
    X = _normalize(embedding_matrix(sample_tbl, col))
    rng = np.random.RandomState(seed)
    init = rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)
    C = X[init].copy()
    for _ in range(kmeans_iters):
        a = np.argmax(X @ C.T, axis=1)  # cosine assignment
        for j in range(len(C)):
            pts = X[a == j]
            if len(pts):
                m = pts.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    C[j] = m / n
    probe_sets = np.argsort(-(qm @ C.T), axis=1)[:, :n_probe]
    cent_to_q: dict[int, list[int]] = {}
    for qi, cents in enumerate(probe_sets):
        for c in cents:
            cent_to_q.setdefault(int(c), []).append(qi)
    state_ref = ray.put((qids, qm, C, cent_to_q))

    def partial(batch: pa.Table) -> pa.Table:
        qids_, qm_, C_, cent_to_q_ = ray.get(state_ref)
        cm = _normalize(embedding_matrix(batch, col))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        assign_c = np.argmax(cm @ C_.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for c in np.unique(assign_c):
            quers = cent_to_q_.get(int(c))
            if not quers:
                continue
            rows = np.nonzero(assign_c == c)[0]
            sims = cm[rows] @ qm_[quers].T
            kk = min(k, len(rows))
            for jj, qi in enumerate(quers):
                top = np.argpartition(-sims[:, jj], kk - 1)[:kk]
                out_q.extend([qids_[qi]] * len(top))
                out_v.extend(ids[rows[top]].tolist())
                out_s.extend(sims[top, jj].tolist())
        return pa.table(
            {
                query_id_col: pa.array(out_q, type=pa.int64()),
                id_col: pa.array(out_v),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    def final(df):
        df = df.sort_values(
            ["sim", id_col], ascending=[False, True], kind="stable"
        ).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[[query_id_col, id_col, "rank"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(query_id_col)
        .map_groups(final)
    )


def lsh_topk(
    ds,
    queries: pa.Table,
    k: int = 5,
    n_planes: int = 12,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 77,
):
    """Approximate top-k: random-hyperplane LSH buckets + rerank.

    Corpus rows land in one bucket (their signature); each query
    searches its signature's bucket plus all buckets within
    ``probe_hamming`` bit flips (multi-probe). Dim inferred from data.
    """
    import ray

    qm = _normalize(embedding_matrix(queries, col))
    dim = qm.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(dim, n_planes))
    q_sig = (qm @ planes > 0).astype(np.uint32)
    q_codes = (q_sig << np.arange(n_planes, dtype=np.uint32)[None, :]).sum(
        axis=1
    )
    qids = queries[query_id_col].to_numpy(zero_copy_only=False)
    # probe set per query: code ± hamming-1 flips
    probe = {}
    for qi, code in enumerate(q_codes):
        codes = {int(code)}
        if probe_hamming >= 1:
            codes |= {int(code) ^ (1 << b) for b in range(n_planes)}
        for c in codes:
            probe.setdefault(c, []).append(qi)
    probe_ref = ray.put((qids, qm, probe))
    planes_ref = ray.put(planes)

    def partial(batch: pa.Table) -> pa.Table:
        qids_, qm_, probe_ = ray.get(probe_ref)
        planes_ = ray.get(planes_ref)
        cm = _normalize(embedding_matrix(batch, col))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sig = (cm @ planes_ > 0).astype(np.uint32)
        codes = (sig << np.arange(planes_.shape[1], dtype=np.uint32)[None, :]).sum(axis=1)
        out_q, out_v, out_s = [], [], []
        for code in np.unique(codes):
            quers = probe_.get(int(code))
            if not quers:
                continue
            rows = np.nonzero(codes == code)[0]
            sims = cm[rows] @ qm_[quers].T
            for jj, qi in enumerate(quers):
                kk = min(k, len(rows))
                top = np.argpartition(-sims[:, jj], kk - 1)[:kk]
                out_q.extend([qids_[qi]] * len(top))
                out_v.extend(ids[rows[top]].tolist())
                out_s.extend(sims[top, jj].tolist())
        return pa.table(
            {
                query_id_col: pa.array(out_q, type=pa.int64()),
                id_col: pa.array(out_v),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    def final(df):
        df = df.sort_values(
            ["sim", id_col], ascending=[False, True], kind="stable"
        ).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[[query_id_col, id_col, "rank"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(query_id_col)
        .map_groups(final)
    )


def cosine_near_dup(
    ds,
    threshold: float,
    mode: str = "exact",
    id_col: str = "vec_id",
    col: str = "embedding",
    n_planes: int = 10,
    n_bands: int = 4,
    seed: int = 99,
    broadcast_limit: int = 2_000_000,
):
    """Embedding-cosine near-duplicate PAIRS: (id_i, id_j), id_i < id_j,
    with cosine(emb_i, emb_j) >= threshold.

    * ``mode="exact"`` — the normalized corpus matrix is broadcast
      (ray.put once, guarded by ``broadcast_limit`` rows) and every
      batch does one matmul against it, emitting only pairs where the
      batch row's id is the SMALLER one (each pair found exactly once,
      no dedup shuffle). Right when the corpus fits a worker; exact.
    * ``mode="lsh"`` — the scale path: banded random-hyperplane
      signatures bucket the corpus ((band, band_hash) groupby, same
      shape as MinHash-LSH); candidate pairs are verified with exact
      cosine inside the bucket group. Recall < 1 by design; no
      all-pairs anywhere.
    """
    import ray

    if mode == "exact":
        n = ds.count()
        if n > broadcast_limit:
            raise ValueError(
                f"exact cosine pairs over {n} rows would broadcast past "
                f"broadcast_limit={broadcast_limit}; use mode='lsh'"
            )
        tabs = [
            t
            for t in (
                ray.get(r)
                for r in ds.select_columns([id_col, col]).materialize().to_arrow_refs()
            )
            if t.num_rows
        ]
        corpus = pa.concat_tables(tabs)
        cm = _normalize(embedding_matrix(corpus, col))
        cids = corpus[id_col].to_numpy(zero_copy_only=False)
        ref = ray.put((cids, cm))

        def partial(batch: pa.Table) -> pa.Table:
            cids_, cm_ = ray.get(ref)
            bm = _normalize(embedding_matrix(batch, col))
            bids = batch[id_col].to_numpy(zero_copy_only=False)
            sims = bm @ cm_.T
            ii, jj = np.nonzero(
                (sims >= threshold) & (bids[:, None] < cids_[None, :])
            )
            return pa.table(
                {
                    "id_i": pa.array(bids[ii], type=pa.int64()),
                    "id_j": pa.array(cids_[jj], type=pa.int64()),
                }
            )

        return ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )

    # ---- banded-LSH scale path
    rng = np.random.RandomState(seed)
    planes = None
    planes_ref = None

    def sig_batch(batch: pa.Table) -> pa.Table:
        nonlocal planes
        m = _normalize(embedding_matrix(batch, col))
        if planes is None:
            r = np.random.RandomState(seed)
            planes = r.normal(size=(m.shape[1], n_planes * n_bands))
        bits = (m @ planes > 0).astype(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_id, out_band, out_hash, out_emb = [], [], [], []
        emb = batch[col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        for b in range(n_bands):
            chunk = bits[:, b * n_planes : (b + 1) * n_planes]
            code = (
                chunk << np.arange(n_planes, dtype=np.uint64)[None, :]
            ).sum(axis=1)
            out_id.append(ids)
            out_band.append(np.full(len(ids), b, dtype=np.int64))
            out_hash.append(code.astype(np.int64))
            out_emb.append(emb)
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id)),
                "band": pa.array(np.concatenate(out_band)),
                "band_hash": pa.array(np.concatenate(out_hash)),
                col: pa.concat_arrays([e for e in out_emb]),
            }
        )

    def verify_group(df):
        import pandas as pd

        ids = df[id_col].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_i": [], "id_j": []}).astype(np.int64)
        m = _normalize(
            np.array(df[col].tolist(), dtype=np.float64)
        )
        sims = m @ m.T
        ii, jj = np.nonzero(
            (sims >= threshold) & (ids[:, None] < ids[None, :])
        )
        return pd.DataFrame(
            {"id_i": ids[ii].astype(np.int64), "id_j": ids[jj].astype(np.int64)}
        )

    pairs = (
        ds.map_batches(sig_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "band_hash"])
        .map_groups(verify_group)
    )
    # a pair can match in several bands: distinct-ify (small pair table)
    from ray.data.aggregate import Count

    return (
        pairs.groupby(["id_i", "id_j"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["id_i", "id_j"])
    )


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (byte-LUT; numpy 1.x has
    no bitwise_count)."""
    out = np.zeros(x.shape, dtype=np.int64)
    for shift in range(0, 64, 8):
        out += _POP8[
            ((x >> np.uint64(shift)) & np.uint64(0xFF)).astype(np.int64)
        ]
    return out


def hamming_topk(
    ds,
    query_sigs,
    k: int = 10,
    sig_col: str = "phash",
    id_col: str = "image_id",
    query_col: str = "q",
    dist_col: str = "dist",
    rank_col: str = "rnk",
) -> pa.Table:
    """Exact hamming top-k retrieval over an int64 signature column —
    perceptual-hash image search. The Q query signatures ride into
    every batch as a tiny closure array (Q × 8 B); each block
    XOR-popcounts its rows against all queries in one vectorized pass
    and emits ONLY its local top-k per query, so the reduction payload
    is Q·k rows per block and the corpus never shuffles. The driver
    finish re-runs the same selection on the concatenated partials —
    an algebraic partial reduction (the global top-k is a subset of
    the union of per-block top-k sets). Ties break by ascending id
    (rows pre-sorted by id once per block, then a STABLE argsort on
    distance), the same (dist ASC, id ASC) total order as the SQL
    ``row_number() OVER (PARTITION BY q ORDER BY dist, id)`` oracle.

    → pa.Table (query_col, id_col, dist_col, rank_col), rank 1..k."""
    q = np.asarray(query_sigs, dtype=np.int64).view(np.uint64)
    nq = len(q)
    id_type = pa.string()

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sigs = (
            batch[sig_col].to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .view(np.uint64)
        )
        order0 = np.argsort(ids, kind="stable")
        ids, sigs = ids[order0], sigs[order0]
        ham = _popcount64(sigs[:, None] ^ q[None, :])  # (n, Q)
        qs_o, id_o, d_o = [], [], []
        for j in range(nq):
            sel = np.argsort(ham[:, j], kind="stable")[:k]
            qs_o.append(np.full(len(sel), j, dtype=np.int64))
            id_o.append(ids[sel])
            d_o.append(ham[sel, j])
        return pa.table(
            {
                query_col: pa.array(np.concatenate(qs_o)),
                id_col: pa.array(
                    np.concatenate(id_o), type=id_type
                ),
                dist_col: pa.array(np.concatenate(d_o)),
            }
        )

    if isinstance(ds, pa.Table):
        merged = partial(ds.combine_chunks())
    else:
        import ray

        parts = (
            ds.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            )
            .materialize()
            .to_arrow_refs()
        )
        raw = [ray.get(r) for r in parts]
        raw = [t for t in raw if t.num_rows] or raw[:1]
        merged = pa.concat_tables(raw, promote_options="default")
    merged = merged.combine_chunks().sort_by(
        [
            (query_col, "ascending"),
            (dist_col, "ascending"),
            (id_col, "ascending"),
        ]
    )
    qs = merged[query_col].to_numpy(zero_copy_only=False)
    n = len(qs)
    starts = np.flatnonzero(
        np.concatenate([[True], qs[1:] != qs[:-1]])
    )
    sizes = np.diff(np.append(starts, n))
    rank0 = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
    keep = rank0 < k
    out = merged.filter(pa.array(keep))
    return out.append_column(
        rank_col, pa.array(rank0[keep] + 1)
    )
