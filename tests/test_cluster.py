"""Near-dup clustering (text/cluster.py): shingle pairing, exact
Jaccard, and distributed connected components — checked against
brute-force Python on hand-built corpora."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pyarrow as pa
import pytest


def _brute_pairs(texts, k=3, threshold=0.5):
    sets = {
        i: {tuple(t.split(" ")[j : j + k])
            for j in range(len(t.split(" ")) - k + 1)}
        for i, t in texts.items()
    }
    out = {}
    for a, b in combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        c = len(sa & sb)
        if c == 0:
            continue
        j = float(c) / (float(len(sa)) + float(len(sb)) - float(c))
        if j >= threshold:
            out[(a, b)] = j
    return out


def _brute_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


CORPUS = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "the quick brown fox jumps over the lazy cat",  # near-dup of 1
    3: "the quick brown fox jumps over the lazy dog",  # exact dup of 1
    4: "completely different text with no overlap here at all",
    5: "completely different text with no overlap here at most",  # ~4
    6: "a b",  # < k words: no shingles
    7: "one more unrelated sentence that stands alone entirely ok",
}


class TestNearDupPairs:
    def test_pairs_match_bruteforce(self, ray_session):
        import ray.data

        from maup_ray.text.cluster import near_dup_pairs

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(CORPUS), type=pa.int64()),
                    "text": pa.array(list(CORPUS.values())),
                }
            )
        )
        got = near_dup_pairs(ds).to_pandas()
        want = _brute_pairs(CORPUS)
        got_pairs = {
            (int(a), int(b)): float(j)
            for a, b, j in zip(got["a"], got["b"], got["jaccard"])
        }
        assert set(got_pairs) == set(want)
        for k in want:
            assert got_pairs[k] == pytest.approx(want[k], abs=0.0)

    def test_df_cap_drops_stop_shingle_groups(self, ray_session):
        import ray.data

        from maup_ray.text.cluster import near_dup_pairs

        # every doc shares one stop-phrase shingle; pairing them all
        # is O(n²) noise a df_cap must drop
        texts = {i: f"common stop phrase unique{i} tail{i}" for i in range(20)}
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(texts), type=pa.int64()),
                    "text": pa.array(list(texts.values())),
                }
            )
        )
        capped = near_dup_pairs(ds, threshold=0.0, df_cap=5).to_pandas()
        assert len(capped) == 0
        uncapped = near_dup_pairs(ds, threshold=0.0).to_pandas()
        assert len(uncapped) == 20 * 19 // 2


class TestConnectedComponents:
    def _run(self, ray_session, edges):
        import ray.data

        from maup_ray.text.cluster import connected_components

        a = pa.array([e[0] for e in edges], type=pa.int64())
        b = pa.array([e[1] for e in edges], type=pa.int64())
        ds = ray.data.from_arrow(pa.table({"a": a, "b": b}))
        # local_threshold=0 forces the distributed BSP rounds (the
        # adaptive gate would route these tiny graphs to the driver
        # union-find and silently drop BSP coverage)
        out = connected_components(ds, local_threshold=0).to_pandas()
        return {
            int(n): int(c) for n, c in zip(out["node"], out["component"])
        }

    def test_chain_and_separate_clusters(self, ray_session):
        edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)]
        got = self._run(ray_session, edges)
        assert got == _brute_components(edges)

    def test_long_chain_needs_many_rounds(self, ray_session):
        # a 40-node path: min-label takes ~diameter rounds to converge
        edges = [(i, i + 1) for i in range(100, 140)]
        got = self._run(ray_session, edges)
        assert set(got.values()) == {100}
        assert len(got) == 41

    def test_star_and_reversed_edges(self, ray_session):
        edges = [(50, i) for i in range(51, 60)] + [(60, 50)]
        got = self._run(ray_session, edges)
        want = _brute_components(edges)
        assert got == want
        assert set(got.values()) == {50}


class TestLocalComponents:
    def test_matches_distributed_and_brute(self, ray_session):
        import numpy as np

        from maup_ray.text.cluster import local_components

        rng = np.random.RandomState(3)
        edges = [
            (int(a), int(b))
            for a, b in zip(rng.randint(0, 60, 120), rng.randint(0, 60, 120))
            if a != b
        ] + [(i, i + 1) for i in range(100, 140)]  # long chain too
        out = local_components(
            np.array([e[0] for e in edges]),
            np.array([e[1] for e in edges]),
        ).to_pandas()
        got = {
            int(n): int(c) for n, c in zip(out["node"], out["component"])
        }
        assert got == _brute_components(edges)
        dist = TestConnectedComponents()._run(ray_session, edges)
        assert got == dist


class TestNearDupComponents:
    def test_components_match_bruteforce(self, ray_session):
        import ray.data

        from maup_ray.text.cluster import near_dup_components

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(CORPUS), type=pa.int64()),
                    "text": pa.array(list(CORPUS.values())),
                }
            )
        )
        out = near_dup_components(ds).to_pandas()
        got = {
            int(d): int(c)
            for d, c in zip(out["doc_id"], out["component_id"])
        }
        want = _brute_components(_brute_pairs(CORPUS).keys())
        assert got == want
        # docs 1,2,3 cluster under keeper 1; 4,5 under 4; 6,7 absent
        assert got[1] == got[2] == got[3] == 1
        assert got[4] == got[5] == 4
        assert 6 not in got and 7 not in got
