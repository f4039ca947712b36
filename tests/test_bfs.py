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


class TestSssp:
    """Weighted Bellman-Ford BSP vs a driver Dijkstra brute force."""

    def _graph(self):
        rng = np.random.default_rng(47)
        n, m = 200, 600
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        w = rng.integers(1, 30, m)
        edges = pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "w": pa.array(w, pa.int64()),
            }
        )
        nodes = pa.table(
            {"node": pa.array(np.arange(n, dtype=np.int64))}
        )
        return edges, nodes, [0, 7, 99]

    @staticmethod
    def _dijkstra(edges, n, sources):
        import heapq
        from collections import defaultdict

        adj = defaultdict(list)
        for r in edges.to_pylist():
            adj[r["src"]].append((r["dst"], r["w"]))
        dist = {s: 0 for s in sources}
        h = [(0, s) for s in sources]
        heapq.heapify(h)
        while h:
            d, u = heapq.heappop(h)
            if d > dist.get(u, 1 << 62):
                continue
            for v, w in adj[u]:
                nd = d + w
                if nd < dist.get(v, 1 << 62):
                    dist[v] = nd
                    heapq.heappush(h, (nd, v))
        return dist

    def test_matches_dijkstra_with_enough_rounds(self, ray_session):
        from maup_ray.ops.graph import sssp

        edges, nodes, srcs = self._graph()
        # n-1 rounds = unconditional Bellman-Ford exactness, cycles
        # included; 200-node graph converges far earlier but rounds
        # beyond convergence must be harmless (monotone min-merge)
        got = {
            int(r["node"]): int(r["dist"])
            for r in sssp(edges, nodes, srcs, rounds=24).to_pandas()
                .to_dict("records")
        }
        want = self._dijkstra(edges, 200, srcs)
        assert got == want

    def test_partition_invariant(self, ray_session):
        import ray.data

        from maup_ray.ops.graph import sssp

        edges, nodes, srcs = self._graph()
        a = sssp(edges, nodes, srcs, rounds=24).to_pandas()
        b = sssp(
            ray.data.from_arrow(edges).repartition(7),
            ray.data.from_arrow(nodes).repartition(3),
            srcs, rounds=24, num_partitions=5,
        ).to_pandas()
        key = lambda df: sorted(zip(df["node"], df["dist"]))
        assert key(a) == key(b)
