"""text/spans.remove_frequent_spans — brute-force oracle on tiny
corpora: coverage unions, overlapping banned grams, fully-covered
docs, short docs, threshold boundary, partition invariance, and the
broadcast_limit guard."""

import numpy as np
import pyarrow as pa
import pytest


def _brute(texts, n, max_occ):
    from collections import Counter

    toks = [t.split(" ") for t in texts]
    cnt = Counter(
        " ".join(tk[i:i + n])
        for tk in toks
        for i in range(len(tk) - n + 1)
    )
    banned = {g for g, c in cnt.items() if c > max_occ}
    out = []
    for tk in toks:
        cov = np.zeros(len(tk), dtype=bool)
        for i in range(len(tk) - n + 1):
            if " ".join(tk[i:i + n]) in banned:
                cov[i:i + n] = True
        kept = [w for w, c in zip(tk, cov) if not c]
        out.append((" ".join(kept), int(cov.sum())))
    return out


def _run(texts, n, max_occ, parts=1):
    import ray.data

    from maup_ray.text.spans import remove_frequent_spans

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    df = remove_frequent_spans(
        ds, n=n, max_occ=max_occ
    ).to_pandas().sort_values("doc_id")
    return list(zip(df["text_clean"], df["n_removed"].astype(int)))


def test_matches_bruteforce(ray_session):
    rng = np.random.default_rng(9)
    vocab = list("abcdefg")
    texts = [
        " ".join(rng.choice(vocab, rng.integers(1, 30)))
        for _ in range(40)
    ]
    # plant a repeated span in several docs so something gets banned
    span = "x y z w v"
    for i in (3, 11, 19, 27):
        texts[i] = texts[i] + " " + span + " tail" + str(i)
    got = _run(texts, n=3, max_occ=2, parts=4)
    assert got == _brute(texts, 3, 2)


def test_threshold_boundary(ray_session):
    """Exactly max_occ occurrences survive; max_occ+1 get scrubbed."""
    texts = ["p q r s end1", "p q r s end2", "a b c d one",
             "a b c d two", "a b c d three"]
    got = _run(texts, n=4, max_occ=2)
    want = _brute(texts, 4, 2)
    assert got == want
    assert got[0][1] == 0  # p q r s appears twice → kept
    assert got[2][1] == 4  # a b c d appears 3x → removed


def test_fully_covered_doc_empty_string(ray_session):
    texts = ["u v w", "u v w", "u v w", "other words here"]
    got = _run(texts, n=3, max_occ=2)
    assert got[0] == ("", 3)
    assert got[3] == ("other words here", 0)


def test_short_docs_untouched(ray_session):
    texts = ["a b", "a b", "a b", "a b"]  # shorter than n
    got = _run(texts, n=3, max_occ=1)
    assert all(g == (t, 0) for g, t in zip(got, texts))


def test_overlapping_coverage(ray_session):
    """Two banned grams overlapping in one doc cover the union."""
    texts = ["a b c d e"] * 3  # bans 'a b c' 'b c d' 'c d e'
    got = _run(texts, n=3, max_occ=2)
    assert got == [("", 5)] * 3


def test_broadcast_limit_guard(ray_session):
    from maup_ray.text.spans import remove_frequent_spans

    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["m n o"] * 3),
        }
    )
    with pytest.raises(ValueError, match="broadcast_limit"):
        remove_frequent_spans(
            ray.data.from_arrow(t), n=3, max_occ=1, broadcast_limit=0
        )
