"""k-core BSP peeling (ops/graph.kcore): serial-peel brute force on
random graphs, cascade fixtures, the rounds parameter, and multi-edge
/ self-loop hygiene."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _collect(ds) -> dict:
    import ray

    tabs = [ray.get(r) for r in ds.materialize().to_arrow_refs()]
    out = {}
    for t in tabs:
        for r in t.to_pylist():
            out[r["node"]] = r["degree"]
    return out


def _brute_peel(u, v, k, rounds=None):
    """Serial reference: repeatedly delete nodes with degree < k."""
    adj: dict[int, set[int]] = {}
    for a, b in zip(u.tolist(), v.tolist()):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    done = 0
    while rounds is None or done < rounds:
        dying = [n for n, s in adj.items() if len(s) < k]
        done += 1
        if not dying:
            break
        for n in dying:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    return {n: len(s) for n, s in adj.items()}


@pytest.mark.parametrize("k", [2, 3])
@pytest.mark.parametrize("seed", [0, 7])
@pytest.mark.parametrize("n_blocks", [1, 6])
def test_matches_brute_fixpoint(ray_session, k, seed, n_blocks):
    import ray.data

    from maup_ray.ops.graph import kcore

    rng = np.random.RandomState(seed)
    n, m = 80, 160  # sparse → long peel cascades
    u = rng.randint(0, n, m).astype(np.int64)
    v = rng.randint(0, n, m).astype(np.int64)
    want = _brute_peel(u, v, k)
    ds = ray.data.from_arrow(
        pa.table({"u": pa.array(u), "v": pa.array(v)})
    ).repartition(n_blocks)
    got = _collect(kcore(ds, k=k))
    assert got == want


def test_chain_cascade_and_rounds_param(ray_session):
    import ray.data

    from maup_ray.ops.graph import kcore

    # triangle 0-1-2 with a pendant path 2-3-4-5: k=2 peels the path
    # tail-first over 3 rounds, triangle survives at degree 2
    t = pa.table(
        {
            "u": pa.array([0, 1, 2, 2, 3, 4], type=pa.int64()),
            "v": pa.array([1, 2, 0, 3, 4, 5], type=pa.int64()),
        }
    )
    full = _collect(kcore(ray.data.from_arrow(t), k=2))
    assert full == {0: 2, 1: 2, 2: 2}
    # bounded rounds = the standard R-step peel iterate
    for r, want in [
        (1, {0: 2, 1: 2, 2: 3, 3: 2, 4: 1}),  # 5 gone, 4 not yet
        (2, {0: 2, 1: 2, 2: 3, 3: 1}),
        (3, {0: 2, 1: 2, 2: 2}),
    ]:
        got = _collect(kcore(ray.data.from_arrow(t), k=2, rounds=r))
        assert got == want, r


def test_complete_graph_survives_whole(ray_session):
    import ray.data

    from maup_ray.ops.graph import kcore

    n = 8
    uu, vv = np.triu_indices(n, k=1)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array(uu.astype(np.int64)),
                "v": pa.array(vv.astype(np.int64)),
            }
        )
    )
    got = _collect(kcore(ds, k=n - 1))
    assert got == {i: n - 1 for i in range(n)}
    assert _collect(kcore(ds, k=n)) == {}


def test_multi_edges_and_loops_ignored(ray_session):
    import ray.data

    from maup_ray.ops.graph import kcore

    # duplicate edges must not inflate degree past k
    t = pa.table(
        {
            "u": pa.array([0, 1, 0, 0, 1, 2], type=pa.int64()),
            "v": pa.array([1, 0, 1, 0, 1, 2], type=pa.int64()),
        }
    )
    assert _collect(kcore(ray.data.from_arrow(t), k=2)) == {}
    assert _collect(kcore(ray.data.from_arrow(t), k=1)) == {0: 1, 1: 1}
