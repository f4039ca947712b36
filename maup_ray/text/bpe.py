"""BPE tokenizer: corpus-level training + distributed application.

Training follows the classic byte-pair-encoding algorithm (Sennrich
et al. 2016, public): start from characters, repeatedly merge the
most frequent adjacent symbol pair. The scale decomposition is the
standard one:

* **word-frequency reduction** — the corpus streams ONCE through a
  per-batch word count + one keyed shuffle of (word, count) partials.
  Everything after operates on the distinct-word table, whose size is
  the vocabulary (Zipf: ~10^5-10^6 for 100 TB of text), not the
  corpus.
* **driver merge loop** — pair counting over the distinct-word table
  is O(vocab × word_len) per iteration with numpy; the corpus is
  never touched again. Deterministic tie-break: highest count, then
  lexicographic pair.
* **application** — per batch, encode only the DISTINCT words of the
  batch (python loop bounded by batch vocabulary, cached per worker),
  then map counts back over occurrences with vectorized take. Token
  COUNTS stream out; materializing token strings per occurrence is a
  flag, not the default.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["word_frequencies", "train_bpe", "encode_word", "apply_bpe"]


def word_frequencies(ds, text_col: str = "text") -> pa.Table:
    """Corpus word-frequency table (word, n) via per-batch partial
    counts + one hash-shuffled reduce — the only corpus-wide pass of
    BPE training."""
    import ray

    from ..ops.shuffle import hash_group_apply

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(batch[text_col], " ")
        )
        g = (
            pa.table({"word": toks})
            .group_by(["word"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(
            ["n" if c == "count_all" else c for c in g.column_names]
        ).select(["word", "n"])

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    # measured-size plan choice (the prorate/broadcast discipline):
    # per-block partials are bounded by the block VOCABULARY, so when
    # the total partial row count fits the driver comfortably one
    # Arrow group_by beats 2×CPU shuffle tasks' fixed latency by ~4 s;
    # web-scale vocabularies (10^6+) take the hash-shuffle path
    if partials.count() <= 2_000_000:
        tabs = [
            t
            for t in (
                ray.get(r) for r in partials.to_arrow_refs()
            )
            if t.num_rows
        ]
        if not tabs:
            return pa.table(
                {
                    "word": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        g = (
            pa.concat_tables(tabs)
            .group_by(["word"], use_threads=False)
            .aggregate([("n", "sum")])
        )
        g = g.rename_columns(
            ["n" if c == "n_sum" else c for c in g.column_names]
        )
        return g.select(["word", "n"]).sort_by("word")

    def final(tbl, starts):
        if tbl is None or len(starts) == 0:
            return pa.table(
                {
                    "word": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        sums = np.add.reduceat(
            tbl["n"].to_numpy(zero_copy_only=False), starts
        )
        return pa.table(
            {
                "word": tbl["word"].take(pa.array(starts)),
                "n": pa.array(sums),
            }
        )

    refs = hash_group_apply(partials, ["word"], final, return_refs=True)
    tabs = [t for t in ray.get(refs) if t is not None and t.num_rows]
    if not tabs:
        return pa.table(
            {
                "word": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    return pa.concat_tables(tabs).combine_chunks().sort_by("word")


def train_bpe(word_freq: pa.Table, n_merges: int) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, n) frequency table.

    Deterministic: each round merges the (count DESC, pair ASC)-best
    adjacent symbol pair across the weighted vocabulary. Runs on the
    driver — the input is the distinct-word table, not the corpus."""
    words = [list(w) for w in word_freq["word"].to_pylist()]
    counts = word_freq["n"].to_pylist()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in zip(words, counts):
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        pa_, pb_ = best[0]
        merged = pa_ + pb_
        for syms in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == pa_ and syms[i + 1] == pb_:
                    syms[i : i + 2] = [merged]
                else:
                    i += 1
        merges.append((pa_, pb_))
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Number of BPE tokens for one word under merge ``ranks``
    (pair → merge priority; lower merges first)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, (a, b) in enumerate(zip(syms, syms[1:])):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return len(syms)


def apply_bpe(
    ds,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Tokenize the corpus under learned merges → Dataset (id_col,
    n_bpe). Per batch, only the DISTINCT words encode (python loop
    bounded by batch vocabulary); per-occurrence counts map back with
    one vectorized take + offsets reduce."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def f(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch[text_col], " ")
        flat = pc.list_flatten(toks).combine_chunks()
        uniq = pc.unique(flat)
        per_word = np.array(
            [encode_word(w, ranks) for w in uniq.to_pylist()],
            dtype=np.int64,
        )
        idx = pc.index_in(flat, uniq).to_numpy(zero_copy_only=False)
        occ = per_word[idx]
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        offs = np.r_[0, np.cumsum(lens)]
        n_bpe = np.add.reduceat(np.append(occ, 0), offs[:-1])
        n_bpe[lens == 0] = 0
        return pa.table(
            {
                id_col: batch[id_col],
                "n_bpe": pa.array(n_bpe),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
