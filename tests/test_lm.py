"""text/lm.unigram_logscore — exact-integer brute force, ordering
sanity (repeated-token docs score higher), partition invariance, and
the vocabulary broadcast guard."""

import math

import numpy as np
import pyarrow as pa
import pytest

Q = 1 << 30


def _brute(texts):
    from collections import Counter

    toks = [t.split(" ") for t in texts]
    cnt = Counter(w for tk in toks for w in tk)
    n = sum(cnt.values())
    qn = int(round(math.log(float(n)) * Q))
    qc = {w: int(round(math.log(float(c)) * Q)) for w, c in cnt.items()}
    out = []
    for tk in toks:
        s = sum(qc[w] for w in tk) - len(tk) * qn
        out.append((len(tk), s, float(s) / float(len(tk) * Q)))
    return out


def _run(texts, parts=1):
    import ray.data

    from maup_ray.text.lm import unigram_logscore

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    df = unigram_logscore(ds).to_pandas().sort_values("doc_id")
    return [
        (int(a), int(b), float(c))
        for a, b, c in zip(df["n_tokens"], df["logprob_q"], df["score"])
    ]


def test_matches_bruteforce(ray_session):
    rng = np.random.default_rng(17)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(1, 40)))
        for _ in range(60)
    ]
    assert _run(texts, parts=5) == _brute(texts)


def test_common_tokens_score_higher(ray_session):
    texts = ["the the the the"] * 5 + ["rare unique oddity word"]
    got = _run(texts)
    # docs of the dominant token have higher mean log-prob
    assert got[0][2] > got[-1][2]
    # scores are log-probabilities: never positive
    assert all(s <= 0 for _, _, s in got)


def test_single_token_corpus_scores_zero(ray_session):
    """A one-word corpus: p(w) = c/N = 1 → quantized score exactly 0
    only when c == N; here ln(c)−ln(N) with c == N gives 0."""
    got = _run(["x x x", "x x"])
    for n, lq, s in got:
        assert lq == 0 and s == 0.0


def test_broadcast_limit_guard(ray_session):
    import ray.data

    from maup_ray.text.lm import unigram_logscore

    t = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["a b c"]),
        }
    )
    with pytest.raises(ValueError, match="broadcast_limit"):
        unigram_logscore(ray.data.from_arrow(t), broadcast_limit=1)
