"""ops/graph.bfs_hops — brute-force BFS oracle across partitionings."""

from __future__ import annotations

from collections import deque

import numpy as np
import pyarrow as pa


def _brute(n, edges, sources, max_hops):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in sources}
    q = deque(sources)
    while q:
        v = q.popleft()
        if dist[v] >= max_hops:
            continue
        for w in adj.get(v, ()):
            if w not in dist:
                dist[w] = dist[v] + 1
                q.append(w)
    return dist


class TestBfsHops:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from maup_ray.ops.graph import bfs_hops

        rng = np.random.RandomState(31)
        n = 400
        m = 1200
        src = rng.randint(0, n, m).astype(np.int64)
        dst = rng.randint(0, n, m).astype(np.int64)
        sources = [0, 17, 391]
        want = _brute(n, zip(src.tolist(), dst.tolist()), sources, 3)
        edges = pa.table({"src": src, "dst": dst})
        nodes = pa.table(
            {"node": pa.array(np.arange(n, dtype=np.int64))}
        )
        for parts in (1, 5):
            e = ray.data.from_arrow(edges).repartition(parts)
            nd = ray.data.from_arrow(nodes).repartition(parts)
            out = bfs_hops(e, nd, sources, max_hops=3).to_pandas()
            got = dict(zip(out["node"], out["hops"]))
            assert got == want

    def test_unreached_nodes_dropped(self, ray_session):
        import ray.data

        from maup_ray.ops.graph import bfs_hops

        # chain 0->1->2->3, source 0, max_hops 2: node 3 unreached
        edges = pa.table(
            {
                "src": pa.array([0, 1, 2], pa.int64()),
                "dst": pa.array([1, 2, 3], pa.int64()),
            }
        )
        nodes = pa.table(
            {"node": pa.array([0, 1, 2, 3], pa.int64())}
        )
        out = bfs_hops(
            ray.data.from_arrow(edges),
            ray.data.from_arrow(nodes),
            [0],
            max_hops=2,
        ).to_pandas()
        assert dict(zip(out["node"], out["hops"])) == {0: 0, 1: 1, 2: 2}
