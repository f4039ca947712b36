"""Benchmark decontamination: flag corpus documents that share any
word k-shingle with a benchmark/eval set (the standard LLM
training-data hygiene step — e.g. GPT-3 appendix C / PaLM-style
n-gram overlap screens, public methodology).

Scale shape — broadcast semi-join, NO shuffle: the benchmark side is
small by construction (eval sets are thousands of documents; the
corpus is billions), so its shingle set ships to every task once via
``ray.put`` and the corpus STREAMS through one ``map_batches`` pass.
Per batch: one vectorized shingle-hash pass (the text/cluster.py
kernel), one ``searchsorted`` membership probe against the sorted
benchmark hash array, one per-doc any-reduction.

Exactness discipline: the hash probe is only a PREFILTER. Documents
with a hash hit (≈ truly contaminated docs + ~0 collisions at 64 bit)
are re-checked by EXACT shingle-string membership against the
benchmark's string set, so the output equals the SQL string semi-join
bit-for-bit even under hash collisions: string equality ⇒ hash
equality (no false negatives), and the confirm kills any collision
(no false positives). The confirm loop is Python over candidate DOCS
only — bounded by the contamination rate, the minhash
candidate-only-recompute pattern, never the corpus.

The benchmark must fit the driver (``broadcast_limit`` guard). A
web-scale benchmark side is a different problem — shingle-keyed
hash_group_apply co-shuffle — and out of scope by design; the guard's
error says so explicitly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .cluster import _P, _word_hashes

__all__ = ["decontaminate", "benchmark_shingles"]

_SEP = "\x01"


def _doc_shingle_hashes(texts: pa.Array, k: int):
    """texts → (flat shingle-hash u64, per-doc shingle counts) — the
    shingle_doc_rows chain without the distinct step (membership needs
    every position anyway)."""
    if len(texts) == 0:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    wh, nw, starts = _word_hashes(texts)
    nsh = np.maximum(nw - k + 1, 0)
    tot = int(nsh.sum())
    if tot == 0:
        return np.zeros(0, dtype=np.uint64), nsh.astype(np.int64)
    within = np.arange(tot) - np.repeat(
        np.concatenate([[0], np.cumsum(nsh)[:-1]]), nsh
    )
    idx0 = np.repeat(starts, nsh) + within
    sh = np.zeros(tot, dtype=np.uint64)
    for j in range(k):
        sh = sh * _P + wh[idx0 + j]
    return sh, nsh


def _shingle_strings(text: str, k: int) -> set:
    toks = text.split(" ")
    return {
        _SEP.join(toks[i : i + k]) for i in range(len(toks) - k + 1)
    }


def benchmark_shingles(
    benchmark,
    k: int = 3,
    text_col: str = "text",
    broadcast_limit: int = 2_000_000,
):
    """Benchmark table/Dataset → (sorted unique shingle-hash u64 array,
    exact shingle-string set) for broadcast."""
    if not isinstance(benchmark, pa.Table):
        n = benchmark.count()
        if n > broadcast_limit:
            raise ValueError(
                f"benchmark has {n} rows > broadcast_limit="
                f"{broadcast_limit}: decontaminate's broadcast "
                "semi-join needs a driver-resident benchmark side. A "
                "corpus-sized 'benchmark' needs a shingle-keyed "
                "co-shuffle (ops/shuffle.hash_group_apply) instead."
            )
        import ray

        tabs = [
            t
            for t in (
                ray.get(r)
                for r in benchmark.materialize().to_arrow_refs()
            )
            if t.num_rows
        ]
        benchmark = (
            pa.concat_tables(tabs, promote_options="default")
            if tabs
            else pa.table({text_col: pa.array([], type=pa.string())})
        )
    texts = benchmark[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    hashes, _ = _doc_shingle_hashes(texts, k)
    strings: set = set()
    for t in texts.to_pylist():
        if t is not None:
            strings |= _shingle_strings(t, k)
    return np.unique(hashes), strings


def decontaminate(
    corpus,
    benchmark,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_limit: int = 2_000_000,
):
    """→ Dataset/Table (id_col, contaminated: bool): one row per corpus
    document, True iff it shares ≥1 word k-shingle with any benchmark
    document (exact string semantics — see module docstring)."""
    import ray

    bh, bstr = benchmark_shingles(
        benchmark, k=k, text_col=text_col,
        broadcast_limit=broadcast_limit,
    )
    ref = ray.put((bh, bstr))

    def flag(batch: pa.Table) -> pa.Table:
        bh_, bstr_ = ray.get(ref)
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(batch)
        if n == 0 or len(bh_) == 0:
            return pa.table(
                {
                    id_col: batch[id_col],
                    "contaminated": pa.array(
                        np.zeros(n, dtype=bool)
                    ),
                }
            )
        sh, nsh = _doc_shingle_hashes(texts, k)
        pos = np.searchsorted(bh_, sh)
        pos[pos == len(bh_)] = 0
        hit = bh_[pos] == sh
        doc_idx = np.repeat(np.arange(n), nsh)
        cand = np.zeros(n, dtype=bool)
        cand[doc_idx[hit]] = True
        out = np.zeros(n, dtype=bool)
        # exact confirm, candidate docs only (collision kill switch)
        for i in np.flatnonzero(cand):
            t = texts[int(i)].as_py()
            if t is not None and not _shingle_strings(t, k).isdisjoint(
                bstr_
            ):
                out[i] = True
        return pa.table(
            {id_col: batch[id_col], "contaminated": pa.array(out)}
        )

    if isinstance(corpus, pa.Table):
        return flag(corpus)
    return corpus.map_batches(
        flag, batch_format="pyarrow", zero_copy_batch=True
    )
