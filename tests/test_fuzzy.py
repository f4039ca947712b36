"""text/fuzzy.edit1_pairs — brute-force Levenshtein parity on random
vocabularies, the repeated-character and empty-string edges, and
partition invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute_pairs(vocab):
    toks = sorted(set(vocab))
    out = set()
    for i, a in enumerate(toks):
        for b in toks[i + 1 :]:
            if _lev(a, b) == 1:
                out.add((a, b))
    return out


def _got_pairs(ds_or_tbl):
    from maup_ray.text.fuzzy import edit1_pairs

    out = edit1_pairs(ds_or_tbl, "tok")
    df = out.to_pandas()
    return set(zip(df["tok_a"], df["tok_b"]))


class TestEdit1Pairs:
    def test_random_vocab_matches_brute(self, ray_session):
        import ray.data

        rng = np.random.RandomState(17)
        letters = "abc"
        vocab = [
            "".join(rng.choice(list(letters), rng.randint(0, 6)))
            for _ in range(300)
        ]
        tbl = pa.table({"tok": pa.array(vocab, type=pa.string())})
        ds = ray.data.from_arrow(tbl).repartition(4)
        assert _got_pairs(ds) == _brute_pairs(vocab)

    def test_repeated_char_and_empty(self, ray_session):
        """'aab'→'ab' generates the same deletion variant twice (both
        deletions of a leading 'a' give 'ab') — the (variant, token)
        dedup must not double-emit; ''↔single-char are deletion
        pairs through the identity variant."""
        import ray.data

        vocab = ["aab", "ab", "", "a", "b", "ba", "aa"]
        tbl = pa.table({"tok": pa.array(vocab, type=pa.string())})
        ds = ray.data.from_arrow(tbl).repartition(3)
        got = _got_pairs(ds)
        assert got == _brute_pairs(vocab)
        assert ("", "a") in got and ("aab", "ab") in got
        # 'ab' vs 'ba' share BOTH deletion variants yet lev = 2 —
        # the equal-length verifier must reject it
        assert ("ab", "ba") not in got

    def test_duplicate_corpus_rows_and_partitions(self, ray_session):
        """Pairs are over DISTINCT strings; heavy duplication and
        different block structures give the identical pair set."""
        import ray.data

        rng = np.random.RandomState(23)
        base = ["cat", "cut", "cart", "ca", "dog", "dig", "dogs"]
        vocab = list(rng.choice(base, 500))
        tbl = pa.table({"tok": pa.array(vocab, type=pa.string())})
        want = _brute_pairs(base)
        for p in (1, 8):
            ds = ray.data.from_arrow(tbl).repartition(p)
            assert _got_pairs(ds) == want

    def test_table_input(self, ray_session):
        tbl = pa.table(
            {"tok": pa.array(["abc", "abd", "xbc"], type=pa.string())}
        )
        assert _got_pairs(tbl) == {("abc", "abd"), ("abc", "xbc")}
