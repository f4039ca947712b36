"""GRAFT_SLOW scale soaks for the BSP graph family: 3M-edge k-core
peel with an analytically known fixpoint, and a 1M-node clustering-
coefficient sweep with closed-form ring expectations."""

import os

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("GRAFT_SLOW"),
    reason="graph scale soaks (set GRAFT_SLOW=1)",
)

N = 1_000_000  # ring nodes; every 10th grows a 3-node pendant chain


def _ring_chain_edges():
    import ray.data

    def edges(b: pa.Table) -> pa.Table:
        i = b["id"].to_numpy()
        ch = i[i % 10 == 0]
        u = np.concatenate([i, i, ch, N + ch, 2 * N + ch])
        v = np.concatenate(
            [(i + 1) % N, (i + 2) % N, N + ch, 2 * N + ch, 3 * N + ch]
        )
        return pa.table(
            {
                "u": pa.array(u.astype(np.int64)),
                "v": pa.array(v.astype(np.int64)),
            }
        )

    return ray.data.range(N).map_batches(
        edges, batch_format="pyarrow", zero_copy_batch=True
    )


def test_kcore_scale():
    """2-core of the 1M-ring + 100k pendant chains (3.3M directed edge
    rows): all 300k chain nodes peel in exactly 3 rounds, the ring
    survives at degree 4 — checked by exact aggregate, no driver
    materialization of the node set."""
    from maup_ray.ops.graph import kcore
    from maup_ray.ops.agg import grouped_sum_count

    out = kcore(_ring_chain_edges(), k=2)

    def summarize(b: pa.Table) -> pa.Table:
        d = b["degree"].to_numpy(zero_copy_only=False)
        n = b["node"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array(np.zeros(len(b), dtype=np.int64)),
                "n": pa.array(np.ones(len(b), dtype=np.int64)),
                "dsum": pa.array(d),
                "nmax": pa.array(n),
            }
        )

    t = grouped_sum_count(
        out.map_batches(summarize, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["k"],
        sum_cols=["n", "dsum", "nmax"],
        final="driver",
    )
    r = t.to_pylist()[0]
    assert r["n"] == N  # every chain node gone, every ring node kept
    assert r["dsum"] == 4 * N  # ring degree exactly 4 after the peel


def test_clustering_scale():
    """Clustering coefficients on the pure 1M ring+chord graph: every
    node has degree 4 and exactly 2 triangles ({i-1,i,i+1} as middle,
    {i,i+1,i+2} as end — each node is in 3 consecutive-triple
    triangles), so the aggregate pins closed-form."""
    import ray.data

    from maup_ray.ops.agg import grouped_sum_count
    from maup_ray.ops.graph import clustering_coefficients

    def edges(b: pa.Table) -> pa.Table:
        i = b["id"].to_numpy()
        u = np.concatenate([i, i])
        v = np.concatenate([(i + 1) % N, (i + 2) % N])
        return pa.table(
            {
                "u": pa.array(u.astype(np.int64)),
                "v": pa.array(v.astype(np.int64)),
            }
        )

    ds = ray.data.range(N).map_batches(
        edges, batch_format="pyarrow", zero_copy_batch=True
    )
    out = clustering_coefficients(ds)

    def summarize(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pa.array(np.zeros(len(b), dtype=np.int64)),
                "n": pa.array(np.ones(len(b), dtype=np.int64)),
                "deg": b["degree"],
                "tri": b["n_tri"],
            }
        )

    t = grouped_sum_count(
        out.map_batches(summarize, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["k"],
        sum_cols=["n", "deg", "tri"],
        final="driver",
    )
    r = t.to_pylist()[0]
    assert r["n"] == N
    assert r["deg"] == 4 * N  # i±1, i±2
    # N consecutive-triple triangles, each crediting 3 nodes
    assert r["tri"] == 3 * N


class TestLinkPredSoak:
    def test_ring_closed_form(self, ray_session):
        """Ring i→i+1, i→i+2 over R nodes: the only non-adjacent
        pairs with ≥2 common neighbors are (i, i+3) — common =
        {i+1, i+2}, degrees 4/4, jaccard 2/6 — so the output is
        exactly R rows with identical stats (closed form)."""
        import ray.data

        from maup_ray.ops.graph import link_prediction

        R = 300_000

        def edges(b: pa.Table) -> pa.Table:
            i = b["id"].to_numpy()
            u = np.concatenate([i, i])
            v = np.concatenate([(i + 1) % R, (i + 2) % R])
            return pa.table(
                {
                    "u": pa.array(u.astype(np.int64)),
                    "v": pa.array(v.astype(np.int64)),
                }
            )

        ds = ray.data.range(R).map_batches(
            edges, batch_format="pyarrow", zero_copy_batch=True
        )
        got = link_prediction(ds, min_common=2)
        assert got.num_rows == R
        import pyarrow.compute as pc

        assert pc.min(got["common"]).as_py() == 2
        assert pc.max(got["common"]).as_py() == 2
        assert pc.min(got["da"]).as_py() == 4
        assert pc.max(got["db"]).as_py() == 4
        ja = got["jaccard"].to_numpy()
        assert (ja == 2.0 / 6.0).all()


class TestMorphologySoak:
    def test_full_grid_closed_form(self, ray_session):
        """A full G×G mask (G = 1024, ~1M cells): erosion keeps the
        (G−2)² interior, dilation is the identity (already full,
        clipped at bounds), opening = dilate(interior) = all but the
        four corner cells."""
        import ray.data

        from maup_ray.ops.raster import morphology

        G = 1024

        def cells(b: pa.Table) -> pa.Table:
            i = b["id"].to_numpy()
            return pa.table(
                {
                    "id": pa.array(np.zeros(len(i), dtype=np.int64)),
                    "cx": pa.array((i // G).astype(np.int64)),
                    "cy": pa.array((i % G).astype(np.int64)),
                }
            )

        ds = ray.data.range(G * G).map_batches(
            cells, batch_format="pyarrow", zero_copy_batch=True
        )
        er = morphology(ds, 10, op="erode")
        n_er = sum(
            t.num_rows
            for t in __import__("ray").get(
                er.materialize().to_arrow_refs()
            )
        )
        assert n_er == (G - 2) ** 2
        op = morphology(ds, 10, op="open")
        n_op = sum(
            t.num_rows
            for t in __import__("ray").get(
                op.materialize().to_arrow_refs()
            )
        )
        assert n_op == G * G - 4


class TestMsfSoak:
    def test_ring_closed_form(self, ray_session):
        """A single R-cycle with distinct weights: the unique MSF is
        every edge except the heaviest — R−1 edges, total weight =
        Σw − max w (closed form, no Kruskal needed)."""
        import ray.data

        from maup_ray.ops.graph import msf_boruvka

        R = 200_000

        def edges(b: pa.Table) -> pa.Table:
            i = b["id"].to_numpy()
            # distinct weights: a permutation-ish affine of i
            w = (i * 48271 + 11) % 1_000_003 + 1
            return pa.table(
                {
                    "u": pa.array(i.astype(np.int64)),
                    "v": pa.array(((i + 1) % R).astype(np.int64)),
                    "w": pa.array(w.astype(np.int64)),
                }
            )

        ds = ray.data.range(R).map_batches(
            edges, batch_format="pyarrow", zero_copy_batch=True
        )
        # driver_limit=0 forces the pure-BSP path — the soak exists to
        # prove the distributed rounds, not the driver Kruskal switch
        got = msf_boruvka(ds, driver_limit=0)
        import ray

        tabs = [
            t for t in ray.get(got.materialize().to_arrow_refs())
            if t.num_rows
        ]
        n = sum(t.num_rows for t in tabs)
        tot = sum(
            int(pa.compute.sum(t["w"]).as_py()) for t in tabs
        )
        i = np.arange(R, dtype=np.int64)
        w = (i * 48271 + 11) % 1_000_003 + 1
        # weights on a cycle are distinct iff the affine map mod P is
        # injective on 0..R-1 (P prime > R) — guaranteed here
        assert len(np.unique(w)) == R
        assert n == R - 1
        assert tot == int(w.sum()) - int(w.max())
