"""Unigram language-model document scoring — the CCNet-style
model-based quality signal: score each document by its corpus-LM
log-likelihood (low = gibberish/outlier, high = boilerplate-typical).

Exactness recipe (why this is SQL-oracled despite the logarithm):
per-WORD log-probabilities quantize to a 2^-30 fixed-point grid —
``qc(w) = round(ln(c_w) · 2^30)`` — so every per-document sum is
exact int64 arithmetic and therefore order-independent; the document
score is the single mirrored IEEE division
``(Σqc − len·qN) / (len·2^30)``. ``math.log`` (libm) was validated
BIT-EXACT against DuckDB ``ln`` over 1..200 000 plus large values,
with zero half-way rounding ties at this scale (numpy's SIMD log is
NOT used — it may differ from libm in the last ulp).

Scale shape: pass A is the n=1 ``frequent_ngrams`` reduction (word,
count) — the LM itself. It broadcasts ONCE via ``ray.put``
(``broadcast_limit``-guarded: a 100 M-type vocabulary needs a
token-keyed shuffle join instead, same composition as dedup); the
quantized log table is computed on the driver with ``math.log`` over
the DISTINCT COUNT VALUES only (≪ vocab size). Pass B is a stateless
vectorized pass: ``index_in`` against the vocab, take the quantized
scores, one ``reduceat`` per-document sum. The token stream never
shuffles.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["unigram_logscore", "LM_SCALE_BITS"]

LM_SCALE_BITS = 30


def _quantize_logs(counts: np.ndarray) -> np.ndarray:
    """round(ln(c)·2^30) per element via libm math.log over the
    distinct count values (exactness contract in module docstring)."""
    scale = float(1 << LM_SCALE_BITS)
    uniq, inv = np.unique(counts, return_inverse=True)
    q = np.array(
        [int(round(math.log(float(c)) * scale)) for c in uniq],
        dtype=np.int64,
    )
    return q[inv]


def unigram_logscore(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_limit: int = 50_000_000,
):
    """Score each document under the corpus unigram LM. Returns a
    Dataset of (id_col, n_tokens, logprob_q, score) where
    ``logprob_q = Σ_w round(ln(c_w)·2^30) − n·round(ln(N)·2^30)``
    (exact int64) and ``score = logprob_q / (n_tokens·2^30)`` — the
    mean token log-probability, ≤ 0, higher = more typical."""
    import ray

    from .analysis import frequent_ngrams

    vocab_tbl = frequent_ngrams(ds, n=1, min_count=1)
    if vocab_tbl.num_rows > broadcast_limit:
        raise ValueError(
            f"unigram_logscore: vocabulary of {vocab_tbl.num_rows} "
            f"exceeds broadcast_limit={broadcast_limit}; score via a "
            "token-keyed shuffle join against the count table instead"
        )
    counts = vocab_tbl["n_occ"].to_numpy(zero_copy_only=False)
    total = int(counts.sum())
    qn = int(round(math.log(float(total)) * float(1 << LM_SCALE_BITS)))
    qc = _quantize_logs(counts)
    vocab_ref = ray.put(
        (vocab_tbl["gram"].combine_chunks(), qc)
    )

    def score(batch: pa.Table) -> pa.Table:
        vocab, qcs = ray.get(vocab_ref)
        toks = pc.split_pattern(batch[text_col], " ")
        flat = pc.list_flatten(toks).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        offs = np.r_[0, np.cumsum(lens)]
        idx = pc.index_in(flat, value_set=vocab).to_numpy(
            zero_copy_only=False
        )
        # every token is in the LM (trained on this corpus); a miss
        # would mean the two passes tokenized differently — fail loud
        if np.isnan(idx.astype(np.float64)).any():
            raise ValueError("unigram_logscore: token missing from LM")
        per_tok = qcs[idx.astype(np.int64)]
        sums = (
            np.add.reduceat(per_tok, offs[:-1])
            if len(per_tok)
            else np.zeros(len(lens), dtype=np.int64)
        )
        sums = np.where(lens == 0, 0, sums)
        logprob_q = sums - lens * qn
        den = (lens << LM_SCALE_BITS).astype(np.float64)
        sc = np.where(
            lens > 0, logprob_q.astype(np.float64) / den, 0.0
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(lens),
                "logprob_q": pa.array(logprob_q),
                "score": pa.array(sc),
            }
        )

    return ds.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )
