"""ops/graph.msf_boruvka — brute Kruskal (union-find) oracle on random
weighted graphs with parallel edges, self-loops, duplicate weights and
disconnected components; exact forest equality under the (w, u, v)
total order."""

import numpy as np
import pyarrow as pa


def _collect(ds) -> pa.Table:
    import ray

    tabs = [ray.get(r) for r in ds.materialize().to_arrow_refs()]
    tabs = [t for t in tabs if t.num_rows] or tabs[:1]
    return pa.concat_tables(tabs)


def _kruskal(edges):
    """edges: iterable of (u, v, w). Returns the unique MSF under the
    (w, min(u,v), max(u,v)) total order as a set of (a, b, w)."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    canon = set()
    for u, v, w in edges:
        if u == v:
            continue
        canon.add((w, min(u, v), max(u, v)))
    out = set()
    for w, a, b in sorted(canon):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out


import pytest


class TestMsfBoruvka:
    # driver_limit routes: 200_000 (default) → whole-graph driver
    # Kruskal; 0 → pure BSP rounds with connected_components
    # contraction; 50 → BSP rounds where later (small) rounds switch
    # to driver-side union-find contraction. All three must produce
    # the identical unique forest.
    @pytest.mark.parametrize("driver_limit", [200_000, 0, 50])
    def test_matches_kruskal(self, ray_session, driver_limit):
        import ray.data

        from maup_ray.ops.graph import msf_boruvka

        rng = np.random.RandomState(83)
        n_nodes, n_edges = 120, 400
        u = rng.randint(0, n_nodes, n_edges).astype(np.int64)
        v = rng.randint(0, n_nodes, n_edges).astype(np.int64)
        w = rng.randint(1, 40, n_edges).astype(np.int64)  # many ties
        u[:5] = v[:5]  # planted self-loops
        # planted exact duplicates and reversed duplicates
        u[5], v[5], w[5] = u[6], v[6], w[6]
        u[7], v[7], w[7] = v[8], u[8], w[8]
        got = _collect(
            msf_boruvka(
                ray.data.from_arrow(
                    pa.table({"u": pa.array(u), "v": pa.array(v),
                              "w": pa.array(w)})
                ).repartition(5),
                driver_limit=driver_limit,
            )
        )
        got_set = {
            (a, b, ww)
            for a, b, ww in zip(got["u"].to_pylist(),
                                got["v"].to_pylist(),
                                got["w"].to_pylist())
        }
        want = _kruskal(zip(u.tolist(), v.tolist(), w.tolist()))
        assert got_set == want
        assert len(got_set) == got.num_rows  # no duplicate rows

    def test_disconnected_and_unique_weights(self, ray_session):
        import ray.data

        from maup_ray.ops.graph import msf_boruvka

        # two separate triangles with unique weights -> 2+2 edges
        t = pa.table(
            {
                "u": pa.array([0, 1, 2, 10, 11, 12], type=pa.int64()),
                "v": pa.array([1, 2, 0, 11, 12, 10], type=pa.int64()),
                "w": pa.array([1, 2, 3, 5, 4, 6], type=pa.int64()),
            }
        )
        got = _collect(
            msf_boruvka(ray.data.from_arrow(t))
        )
        want = _kruskal(
            [(0, 1, 1), (1, 2, 2), (2, 0, 3),
             (10, 11, 5), (11, 12, 4), (12, 10, 6)]
        )
        got_set = set(
            zip(got["u"].to_pylist(), got["v"].to_pylist(),
                got["w"].to_pylist())
        )
        assert got_set == want
        assert got.num_rows == 4


class TestMstQueryE2E:
    def test_sf0001_matches_kruskal(self, ray_session):
        from maup_ray.pipelines import _weighted_edge_ds, q_mst

        sf = "/root/testdata/sf0.001"
        got = _collect(q_mst(sf))
        edges = _collect(_weighted_edge_ds(sf))
        want = _kruskal(
            zip(edges["u"].to_pylist(), edges["v"].to_pylist(),
                edges["w"].to_pylist())
        )
        got_set = set(
            zip(got["u"].to_pylist(), got["v"].to_pylist(),
                got["w"].to_pylist())
        )
        assert got_set == want
        # tri_edge graph is connected: exactly n-1 forest edges
        assert got.num_rows == 500 - 1
