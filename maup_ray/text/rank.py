"""BM25 document ranking over a text corpus — the retrieval /
data-selection primitive (query-focused corpus filtering, hard-negative
mining, relevance-weighted sampling).

Two streaming passes, both reductions — nothing corpus-sized ever
moves or lands on the driver:

  pass 1 (stats): each batch emits ONE row of exact-integer partials —
    (n_docs, total_tokens, df per query term). Document frequencies
    are computed only for the QUERY's terms (a handful), never the
    corpus vocabulary, so the partial is O(len(terms)) regardless of
    corpus size. Driver-merges exact ints.
  pass 2 (score + top-k): per batch, term frequencies come from one
    flatten + equality mask + bincount per term (no Python loop over
    rows), scores are a fixed IEEE expression of exact-integer inputs,
    and only each batch's top-k rows leave the stage (k rows per
    block, the ops/curate.top_k_per_group combiner discipline). The
    driver merges block winners and keeps the global top-k.

Exactness discipline (why the DuckDB oracle matches bit-for-bit, the
near_dup c/(na+nb-c) precedent): tf, df, dl, N, Σdl are exact int64;
k1=1.25, b=0.75, k1+1=2.25 are dyadic; the score is evaluated in ONE
fixed parenthesization of correctly-rounded IEEE +,-,*,/ (no
transcendentals — the idf is the algebraic (N-df+0.5)/(df+0.5) form,
not the log form) mirrored token-for-token in the SQL, and the
per-term sum is a fixed left-to-right chain. Rank order is totalized
by (score DESC, id ASC) on both sides.

Tokenization is the corpus-wide single-space split (DuckDB
``string_split(text, ' ')`` — the near_dup/ngrams shingle discipline).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["bm25_topk", "bm25_score_batch"]

K1 = 1.25  # dyadic — exactly representable
B = 0.75


def _term_tfs(batch: pa.Table, terms, text_col: str):
    """(dl, [tf_t per term]) for one batch — vectorized: one token
    flatten, one equality mask + bincount per term."""
    toks = pc.split_pattern(batch[text_col], " ")
    lens = (
        pc.list_value_length(toks)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = pc.list_flatten(toks).combine_chunks()
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    tfs = []
    for t in terms:
        mask = pc.equal(flat, t).to_numpy(zero_copy_only=False)
        mask = np.asarray(mask, dtype=bool)
        tfs.append(
            np.bincount(doc_idx[mask], minlength=len(batch)).astype(
                np.int64
            )
        )
    return lens, tfs


def bm25_score_batch(
    batch: pa.Table,
    terms,
    n_docs: int,
    total_len: int,
    dfs,
    text_col: str = "text",
) -> np.ndarray:
    """Per-row BM25 scores (float64) — the fixed IEEE expression the
    SQL oracle mirrors. Pure function of exact integers, hence
    partition-invariant."""
    dl, tfs = _term_tfs(batch, terms, text_col)
    avgdl = float(total_len) / float(n_docs)
    dl_f = dl.astype(np.float64)
    x = dl_f / avgdl
    denom_len = K1 * ((1.0 - B) + B * x)
    score = None
    for tf, df in zip(tfs, dfs):
        tf_f = tf.astype(np.float64)
        idf = (float(n_docs) - float(df) + 0.5) / (float(df) + 0.5)
        s = (tf_f * (K1 + 1.0)) / (tf_f + denom_len) * idf
        score = s if score is None else score + s
    return score


def bm25_topk(
    ds,
    terms,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Top-k documents by BM25 — (id_col, score) sorted by
    (score DESC, id ASC). ``ds`` is consumed twice (stats, score); a
    Dataset re-executes its plan, a pa.Table is used directly."""
    terms = list(terms)

    def stats(batch: pa.Table) -> pa.Table:
        dl, tfs = _term_tfs(batch, terms, text_col)
        cols = {
            "n_docs": pa.array([len(batch)], type=pa.int64()),
            "total_len": pa.array([int(dl.sum())], type=pa.int64()),
        }
        for i, tf in enumerate(tfs):
            cols[f"df_{i}"] = pa.array(
                [int((tf > 0).sum())], type=pa.int64()
            )
        return pa.table(cols)

    if isinstance(ds, pa.Table):
        rows = stats(ds).to_pylist()
    else:
        # one tiny dict per block — the reduction collapsed upstream
        rows = ds.map_batches(
            stats, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
    n_docs = sum(r["n_docs"] for r in rows)
    total_len = sum(r["total_len"] for r in rows)
    dfs = [sum(r[f"df_{i}"] for r in rows) for i in range(len(terms))]
    if n_docs == 0:
        return pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )

    def score_topk(batch: pa.Table) -> pa.Table:
        s = bm25_score_batch(batch, terms, n_docs, total_len, dfs, text_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:k]
        return pa.table(
            {
                id_col: batch[id_col].take(pa.array(order)),
                "score": pa.array(s[order], type=pa.float64()),
            }
        )

    if isinstance(ds, pa.Table):
        winners = score_topk(ds)
    else:
        # ≤ k rows per block reach the driver
        wrows = ds.map_batches(
            score_topk, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        winners = pa.table(
            {
                id_col: pa.array([r[id_col] for r in wrows]),
                "score": pa.array(
                    [r["score"] for r in wrows], type=pa.float64()
                ),
            }
        )
    order = np.lexsort(
        (
            winners[id_col].to_numpy(zero_copy_only=False),
            -winners["score"].to_numpy(zero_copy_only=False),
        )
    )[:k]
    return winners.take(pa.array(order))
