"""ops.graph.link_prediction — brute-force set-arithmetic oracle over
random graphs with planted structure (self-loops, parallel/reversed
duplicate edges, isolated pairs)."""

import numpy as np
import pyarrow as pa


def _brute(edges, min_common):
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if b in adj[a]:
                continue
            common = len(adj[a] & adj[b])
            if common >= min_common:
                da, db = len(adj[a]), len(adj[b])
                out[(a, b)] = (
                    common, da, db,
                    float(common) / float(da + db - common),
                )
    return out


class TestLinkPrediction:
    def test_matches_brute(self, ray_session):
        import ray.data

        from maup_ray.ops.graph import link_prediction

        rng = np.random.RandomState(17)
        n_nodes, n_edges = 60, 220
        u = rng.randint(0, n_nodes, n_edges).astype(np.int64)
        v = rng.randint(0, n_nodes, n_edges).astype(np.int64)
        # planted: self-loops (dropped), exact duplicates and reversed
        # duplicates (deduped), guaranteed by construction at this size
        u[:5] = v[:5]
        u[5], v[5] = u[6], v[6]
        u[7], v[7] = v[8], u[8]
        edges = pa.table({"u": pa.array(u), "v": pa.array(v)})
        for mc in (1, 2, 3):
            want = _brute(list(zip(u.tolist(), v.tolist())), mc)
            got = link_prediction(
                ray.data.from_arrow(edges).repartition(4),
                min_common=mc,
            )
            rows = {
                (r["a"], r["b"]): (
                    r["common"], r["da"], r["db"], r["jaccard"]
                )
                for r in got.to_pylist()
            }
            assert rows == want
        # determinism: (a, b) sorted
        got = link_prediction(ray.data.from_arrow(edges), min_common=2)
        ab = list(zip(got["a"].to_pylist(), got["b"].to_pylist()))
        assert ab == sorted(ab)

    def test_empty_candidates(self, ray_session):
        import ray.data

        from maup_ray.ops.graph import link_prediction

        # a single triangle: every pair is adjacent → no candidates
        edges = pa.table(
            {
                "u": pa.array([0, 1, 2], type=pa.int64()),
                "v": pa.array([1, 2, 0], type=pa.int64()),
            }
        )
        got = link_prediction(ray.data.from_arrow(edges), min_common=1)
        assert got.num_rows == 0
        assert got.schema.field("jaccard").type == pa.float64()
