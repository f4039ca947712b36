"""BPE training + application: classic-algorithm invariants on tiny
corpora and a distributed E2E."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.text.bpe import (
    apply_bpe,
    encode_word,
    train_bpe,
    word_frequencies,
)


def _wf(pairs):
    return pa.table(
        {
            "word": pa.array([w for w, _ in pairs]),
            "n": pa.array([int(n) for _, n in pairs], type=pa.int64()),
        }
    )


class TestTrainBpe:
    def test_most_frequent_pair_merges_first(self):
        # 'ab' dominates: appears in every word, weighted 10+5
        wf = _wf([("abab", 10), ("abc", 5)])
        merges = train_bpe(wf, 1)
        assert merges == [("a", "b")]

    def test_deterministic_tie_break_lexicographic(self):
        # "xy" and "yz" both appear 3 times (in 'xyz' ×3): tie → the
        # lexicographically smaller pair merges
        wf = _wf([("xyz", 3)])
        merges = train_bpe(wf, 1)
        assert merges == [("x", "y")]

    def test_merges_compose(self):
        # classic: repeated word collapses to a single symbol
        wf = _wf([("aaaa", 8)])
        merges = train_bpe(wf, 2)
        assert merges == [("a", "a"), ("aa", "aa")]

    def test_stops_when_no_pair_repeats(self):
        wf = _wf([("ab", 1)])
        assert train_bpe(wf, 5) == []


class TestEncodeWord:
    def test_reproduces_training_segmentation(self):
        # encoding a training word under the learned ranks yields the
        # same number of symbols the training loop left it with
        words = [("banana", 6), ("bandana", 3), ("ananas", 2)]
        wf = _wf(words)
        merges = train_bpe(wf, 4)
        ranks = {m: i for i, m in enumerate(merges)}
        # replay training to get the reference segmentation
        segs = {w: list(w) for w, _ in words}
        for a, b in merges:
            for w, syms in segs.items():
                i = 0
                while i < len(syms) - 1:
                    if syms[i] == a and syms[i + 1] == b:
                        syms[i : i + 2] = [a + b]
                    else:
                        i += 1
        for w, syms in segs.items():
            assert encode_word(w, ranks) == len(syms), w

    def test_unknown_chars_stay_atomic(self):
        ranks = {("a", "b"): 0}
        assert encode_word("zq", ranks) == 2
        assert encode_word("ab", ranks) == 1


class TestDistributed:
    def test_word_frequencies_and_apply(self, ray_session):
        import ray.data

        texts = ["a b a", "b c", "a b c d", ""]
        tbl = pa.table(
            {
                "doc_id": pa.array(np.arange(4, dtype=np.int64)),
                "text": pa.array(texts),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(2)
        wf = word_frequencies(ds)
        freq = dict(zip(wf["word"].to_pylist(), wf["n"].to_pylist()))
        assert freq["a"] == 3 and freq["b"] == 3 and freq["c"] == 2
        merges = train_bpe(wf, 2)
        out = (
            apply_bpe(ds, merges)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # single-char words stay 1 token each; an empty doc has 0
        # BPE tokens (the empty word has no symbols)
        assert list(out["n_bpe"]) == [3, 2, 4, 0]

    def test_multichar_corpus_compresses(self, ray_session):
        import ray.data

        texts = ["hello hello world"] * 5
        tbl = pa.table(
            {
                "doc_id": pa.array(np.arange(5, dtype=np.int64)),
                "text": pa.array(texts),
            }
        )
        ds = ray.data.from_arrow(tbl)
        wf = word_frequencies(ds)
        merges = train_bpe(wf, 8)
        out = apply_bpe(ds, merges).to_pandas()
        # with 8 merges over a 2-word vocab, tokens/word must drop
        # well below character count (15 chars) per doc
        assert (out["n_bpe"] <= 9).all()
        assert (out["n_bpe"] >= 3).all()
