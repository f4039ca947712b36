"""Per-node clustering coefficient (ops/graph.clustering_coefficients):
adjacency-matrix brute force, hand-checkable fixtures, multi-edge /
self-loop hygiene."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _collect(ds) -> dict:
    import ray

    tabs = [ray.get(r) for r in ds.materialize().to_arrow_refs()]
    tabs = [t for t in tabs if t.num_rows]
    out = {}
    for t in tabs:
        for r in t.to_pylist():
            out[r["node"]] = (r["degree"], r["n_tri"], r["lcc"])
    return out


def _brute(u, v, n):
    a = np.zeros((n, n), dtype=np.int64)
    m = u != v
    a[u[m], v[m]] = 1
    a[v[m], u[m]] = 1
    deg = a.sum(axis=1)
    tri = np.diag(a @ a @ a) // 2  # per-node closed-wedge count
    out = {}
    for i in range(n):
        if deg[i] == 0:
            continue  # isolated: absent from the op's output
        den = int(deg[i]) * int(deg[i] - 1)
        lcc = (2.0 * int(tri[i])) / float(den) if den > 0 else None
        out[i] = (int(deg[i]), int(tri[i]), lcc)
    return out


@pytest.mark.parametrize("n_blocks", [1, 8])
@pytest.mark.parametrize("seed", [0, 4])
def test_matches_brute(ray_session, n_blocks, seed):
    import ray.data

    from maup_ray.ops.graph import clustering_coefficients

    rng = np.random.RandomState(seed)
    n, m = 60, 400
    u = rng.randint(0, n, m).astype(np.int64)
    v = rng.randint(0, n, m).astype(np.int64)
    want = _brute(u, v, n)
    assert any(t for _, t, _ in want.values())  # real triangles exist
    ds = ray.data.from_arrow(
        pa.table({"u": pa.array(u), "v": pa.array(v)})
    ).repartition(n_blocks)
    got = _collect(clustering_coefficients(ds))
    assert got == want  # bit-exact: one mirrored division per node


def test_complete_graph_is_one(ray_session):
    import ray.data

    from maup_ray.ops.graph import clustering_coefficients

    n = 7
    uu, vv = np.triu_indices(n, k=1)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array(uu.astype(np.int64)),
                "v": pa.array(vv.astype(np.int64)),
            }
        )
    )
    got = _collect(clustering_coefficients(ds))
    for node, (deg, tri, lcc) in got.items():
        assert deg == n - 1
        assert tri == (n - 2) * (n - 1) // 2
        assert lcc == 1.0


def test_degree_one_null_lcc_and_loops_ignored(ray_session):
    import ray.data

    from maup_ray.ops.graph import clustering_coefficients

    # triangle 0-1-2 with a pendant 3 and noise (dup edges, loop)
    t = pa.table(
        {
            "u": pa.array([0, 1, 2, 2, 1, 0, 3], type=pa.int64()),
            "v": pa.array([1, 2, 0, 3, 0, 0, 3], type=pa.int64()),
        }
    )
    got = _collect(clustering_coefficients(ray.data.from_arrow(t)))
    assert got[0] == (2, 1, 1.0)
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (3, 1, pytest.approx(1 / 3))
    assert got[3] == (1, 0, None)
