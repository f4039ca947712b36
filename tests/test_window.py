"""ops/window (grouped dense_rank, ordered grouped concat) and
ops/graph (fixed-point PageRank) — pandas/numpy replicas + partition
invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maup_ray.ops.graph import pagerank
from maup_ray.ops.window import (
    grouped_concat,
    grouped_dense_rank,
    grouped_latest,
    grouped_ntile,
)


def _collect(ds) -> pd.DataFrame:
    import ray

    tabs = [ray.get(r) for r in ds.materialize().to_arrow_refs()]
    tabs = [t for t in tabs if t.num_rows] or tabs[:1]
    return pa.concat_tables(tabs).to_pandas()


def _rank_frame(n=5000, n_keys=60, seed=3):
    rng = np.random.RandomState(seed)
    return pa.table(
        {
            "k": pa.array(rng.randint(0, n_keys, n).astype(np.int64)),
            # coarse grid → plenty of in-group ties
            "v": pa.array(rng.randint(-20, 20, n).astype(np.float64)),
            "id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )


class TestDenseRank:
    @pytest.mark.parametrize("n_blocks", [1, 9])
    def test_matches_pandas(self, ray_session, n_blocks):
        import ray.data

        t = _rank_frame()
        df = t.to_pandas()
        df["rnk"] = (
            df.groupby("k")["v"]
            .rank(method="dense", ascending=False)
            .astype(np.int64)
        )
        want = df.sort_values(["k", "id"], ignore_index=True)[
            ["k", "v", "id", "rnk"]
        ]
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        got = (
            _collect(
                grouped_dense_rank(
                    ds, ["k"], "v", rank_name="rnk", keep_cols=["id"]
                )
            )
            .sort_values(["k", "id"], ignore_index=True)[
                ["k", "v", "id", "rnk"]
            ]
        )
        pd.testing.assert_frame_equal(got, want)

    def test_ascending(self, ray_session):
        import ray.data

        t = _rank_frame(n=800, n_keys=7, seed=11)
        df = t.to_pandas()
        df["rnk"] = (
            df.groupby("k")["v"]
            .rank(method="dense", ascending=True)
            .astype(np.int64)
        )
        want = df.sort_values(["k", "id"], ignore_index=True)[
            ["k", "v", "id", "rnk"]
        ]
        got = _collect(
            grouped_dense_rank(
                ray.data.from_arrow(t),
                ["k"],
                "v",
                rank_name="rnk",
                descending=False,
                keep_cols=["id"],
            )
        ).sort_values(["k", "id"], ignore_index=True)[
            ["k", "v", "id", "rnk"]
        ]
        pd.testing.assert_frame_equal(got, want)

    def test_table_input(self, ray_session):
        t = _rank_frame(n=300, n_keys=4, seed=5)
        got = _collect(
            grouped_dense_rank(t, ["k"], "v", keep_cols=["id"])
        )
        assert len(got) == 300
        # every group's rank set is 1..n_distinct
        for _, g in got.groupby("k"):
            n_distinct = g["v"].nunique()
            assert sorted(g["rnk"].unique()) == list(
                range(1, n_distinct + 1)
            )


class TestGroupedConcat:
    @pytest.mark.parametrize("n_blocks", [1, 9])
    def test_matches_pandas(self, ray_session, n_blocks):
        import ray.data

        rng = np.random.RandomState(4)
        n = 4000
        t = pa.table(
            {
                "k": pa.array(rng.randint(0, 97, n).astype(np.int64)),
                "o": pa.array(
                    rng.permutation(n).astype(np.int64)
                ),  # unique order key
                "s": pa.array(
                    np.char.add("w", rng.randint(0, 9, n).astype(str))
                ),
            }
        )
        df = t.to_pandas()
        want = (
            df.sort_values("o")
            .groupby("k")
            .agg(cat=("s", ",".join), n=("s", "size"))
            .reset_index()
            .sort_values("k", ignore_index=True)
        )
        want["n"] = want["n"].astype(np.int64)
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        got = (
            _collect(
                grouped_concat(
                    ds,
                    ["k"],
                    "s",
                    order_col="o",
                    out_name="cat",
                    count_name="n",
                )
            )
            .sort_values("k", ignore_index=True)[["k", "cat", "n"]]
        )
        pd.testing.assert_frame_equal(got, want)


class TestNtile:
    @pytest.mark.parametrize("b", [1, 3, 4, 7])
    def test_matches_duckdb(self, ray_session, b):
        import duckdb
        import ray.data

        rng = np.random.RandomState(8)
        n = 3000
        t = pa.table(
            {
                "k": pa.array(rng.randint(0, 40, n).astype(np.int64)),
                "o": pa.array(rng.permutation(n).astype(np.int64)),
            }
        )
        want = duckdb.sql(
            f"""SELECT k, o, CAST(ntile({b}) OVER (PARTITION BY k
                ORDER BY o) AS BIGINT) AS tile FROM t
                ORDER BY k, o"""
        ).df()
        got = (
            _collect(
                grouped_ntile(
                    ray.data.from_arrow(t).repartition(7),
                    ["k"],
                    ["o"],
                    b,
                )
            )
            .sort_values(["k", "o"], ignore_index=True)[["k", "o", "tile"]]
        )
        pd.testing.assert_frame_equal(got, want)

    def test_small_groups(self, ray_session):
        # groups smaller than the bucket count: tile == position+1
        t = pa.table(
            {
                "k": pa.array([0, 0, 1], type=pa.int64()),
                "o": pa.array([5, 2, 9], type=pa.int64()),
            }
        )
        got = (
            _collect(grouped_ntile(t, ["k"], ["o"], 10))
            .sort_values(["k", "o"], ignore_index=True)
        )
        assert got["tile"].tolist() == [1, 2, 1]


class TestGroupedLatest:
    def _frame(self, n=4000, n_keys=80, seed=6):
        rng = np.random.RandomState(seed)
        return pa.table(
            {
                "k": pa.array(rng.randint(0, n_keys, n).astype(np.int64)),
                # coarse order values → in-group ties broken by id
                "o": pa.array(rng.randint(0, 50, n).astype(np.int64)),
                "id": pa.array(np.arange(n, dtype=np.int64)),
                "s": pa.array(
                    np.char.add("v", rng.randint(0, 9, n).astype(str))
                ),
                "v": pa.array(rng.randn(n)),
            }
        )

    def _want(self, t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        return (
            df.sort_values(["k", "o", "id"])
            .groupby("k", as_index=False)
            .last()
            .sort_values("k", ignore_index=True)[
                ["k", "o", "id", "s", "v"]
            ]
        )

    @pytest.mark.parametrize("n_blocks", [1, 9])
    def test_matches_pandas(self, ray_session, n_blocks):
        import ray.data

        t = self._frame()
        want = self._want(t)
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        got = (
            _collect(
                grouped_latest(
                    ds, ["k"], ["o", "id"], value_cols=["s", "v"]
                )
            )
            .sort_values("k", ignore_index=True)[
                ["k", "o", "id", "s", "v"]
            ]
        )
        pd.testing.assert_frame_equal(got, want)

    def test_table_input(self, ray_session):
        t = self._frame(n=500, n_keys=11, seed=2)
        got = (
            grouped_latest(t, ["k"], ["o", "id"], value_cols=["s", "v"])
            .to_pandas()
            .sort_values("k", ignore_index=True)[["k", "o", "id", "s", "v"]]
        )
        pd.testing.assert_frame_equal(got, self._want(t))

    @pytest.mark.parametrize("n_blocks", [1, 9])
    def test_take_first_matches_pandas(self, ray_session, n_blocks):
        import ray.data

        t = self._frame(seed=13)
        df = t.to_pandas()
        want = (
            df.sort_values(["k", "o", "id"])
            .groupby("k", as_index=False)
            .first()
            .sort_values("k", ignore_index=True)[["k", "o", "id", "s", "v"]]
        )
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        got = (
            _collect(
                grouped_latest(
                    ds, ["k"], ["o", "id"], value_cols=["s", "v"],
                    take="first",
                )
            )
            .sort_values("k", ignore_index=True)[["k", "o", "id", "s", "v"]]
        )
        pd.testing.assert_frame_equal(got, want)

    def test_bad_take_raises(self, ray_session):
        with pytest.raises(ValueError):
            grouped_latest(self._frame(n=10), ["k"], ["o"], take="mid")

    def test_precombine_bounds_shuffle_rows(self, ray_session):
        """The per-batch combiner collapses a table input to ≤ 1 row
        per key BEFORE any exchange — the scale contract (the shuffle
        never carries the corpus)."""
        t = self._frame(n=3000, n_keys=5, seed=9)
        out = grouped_latest(t, ["k"], ["o", "id"], value_cols=["s", "v"])
        assert isinstance(out, pa.Table)  # table in → combined table out
        assert len(out) <= 5


def _pagerank_numpy(src, dst, outdeg, n, iters=3, scale=10**12):
    base = (15 * scale) // (100 * n)
    r = np.full(n, scale // n, dtype=np.int64)
    for _ in range(iters):
        contrib = (85 * r[src]) // (100 * outdeg)
        nxt = np.full(n, base, dtype=np.int64)
        np.add.at(nxt, dst, contrib)
        r = nxt
    return r


class TestPagerank:
    def _graph(self, n=700, seed=9):
        rng = np.random.RandomState(seed)
        deg = rng.randint(1, 5, n)
        src = np.repeat(np.arange(n, dtype=np.int64), deg)
        dst = rng.randint(0, n, len(src)).astype(np.int64)
        outdeg = np.repeat(deg, deg).astype(np.int64)
        return src, dst, outdeg, n

    @pytest.mark.parametrize("n_blocks", [1, 8])
    def test_matches_numpy(self, ray_session, n_blocks):
        import ray.data

        src, dst, outdeg, n = self._graph()
        want = _pagerank_numpy(src, dst, outdeg, n)
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array(src),
                    "dst": pa.array(dst),
                    "outdeg": pa.array(outdeg),
                }
            )
        ).repartition(n_blocks)
        nodes = ray.data.from_arrow(
            pa.table({"node": pa.array(np.arange(n, dtype=np.int64))})
        ).repartition(max(1, n_blocks // 2))
        got = (
            _collect(pagerank(edges, nodes, n))
            .sort_values("node", ignore_index=True)
        )
        assert got["node"].tolist() == list(range(n))
        np.testing.assert_array_equal(got["r"].to_numpy(), want)

    def test_phantom_sources_contribute_zero(self, ray_session):
        """Edges from srcs OUTSIDE the node universe are defined as
        zero contribution — and must not corrupt the int64 path."""
        import ray.data

        n = 50
        src = np.array([0, 1, 999, 998], dtype=np.int64)  # 2 phantoms
        dst = np.array([1, 2, 3, 4], dtype=np.int64)
        outdeg = np.ones(4, dtype=np.int64)
        want = _pagerank_numpy(
            src[:2], dst[:2], outdeg[:2], n
        )  # phantoms drop
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array(src),
                    "dst": pa.array(dst),
                    "outdeg": pa.array(outdeg),
                }
            )
        )
        nodes = ray.data.from_arrow(
            pa.table({"node": pa.array(np.arange(n, dtype=np.int64))})
        )
        got = (
            _collect(pagerank(edges, nodes, n))
            .sort_values("node", ignore_index=True)
        )
        np.testing.assert_array_equal(got["r"].to_numpy(), want)

    def test_large_scale_stays_int64_exact(self, ray_session):
        """scale=2^56: ranks exceed 2^53 (a float round-trip in the
        engine would diverge from the numpy int replica) while
        d_num·r = 85·2^56 still fits int64 — the documented caller
        bound."""
        import ray.data

        src, dst, outdeg, n = self._graph(n=64, seed=5)
        scale = 1 << 56
        want = _pagerank_numpy(src, dst, outdeg, n, scale=scale)
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array(src),
                    "dst": pa.array(dst),
                    "outdeg": pa.array(outdeg),
                }
            )
        ).repartition(4)
        nodes = ray.data.from_arrow(
            pa.table({"node": pa.array(np.arange(n, dtype=np.int64))})
        )
        got = (
            _collect(pagerank(edges, nodes, n, scale=scale))
            .sort_values("node", ignore_index=True)
        )
        np.testing.assert_array_equal(got["r"].to_numpy(), want)

    def test_mass_bounded(self, ray_session):
        import ray.data

        src, dst, outdeg, n = self._graph(n=200, seed=2)
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array(src),
                    "dst": pa.array(dst),
                    "outdeg": pa.array(outdeg),
                }
            )
        )
        nodes = ray.data.from_arrow(
            pa.table({"node": pa.array(np.arange(n, dtype=np.int64))})
        )
        got = _collect(pagerank(edges, nodes, n))
        total = int(got["r"].sum())
        # floored divisions only ever LEAK mass, never create it
        assert 0 < total <= 10**12
        assert (got["r"] > 0).all()


class TestTriangleCount:
    def _brute(self, u, v, n):
        a = np.zeros((n, n), dtype=np.int64)
        m = u != v
        a[u[m], v[m]] = 1
        a[v[m], u[m]] = 1
        return int(np.trace(a @ a @ a)) // 6

    @pytest.mark.parametrize("n_blocks", [1, 8])
    @pytest.mark.parametrize("seed", [0, 4])
    def test_matches_brute(self, ray_session, n_blocks, seed):
        import ray.data

        from maup_ray.ops.graph import triangle_count

        rng = np.random.RandomState(seed)
        n, m = 60, 400
        u = rng.randint(0, n, m).astype(np.int64)
        v = rng.randint(0, n, m).astype(np.int64)
        want = self._brute(u, v, n)
        assert want > 0  # dense enough to be a real test
        ds = ray.data.from_arrow(
            pa.table({"u": pa.array(u), "v": pa.array(v)})
        ).repartition(n_blocks)
        got = triangle_count(ds)
        assert got["n_triangles"][0].as_py() == want

    def test_multi_edges_and_loops_ignored(self, ray_session):
        import ray.data

        from maup_ray.ops.graph import triangle_count

        # one triangle, duplicated edges (both orientations), loops
        t = pa.table(
            {
                "u": pa.array(
                    [0, 1, 2, 1, 0, 3, 2], type=pa.int64()
                ),
                "v": pa.array(
                    [1, 2, 0, 0, 0, 3, 1], type=pa.int64()
                ),
            }
        )
        got = triangle_count(ray.data.from_arrow(t))
        assert got["n_triangles"][0].as_py() == 1

    def test_triangle_free(self, ray_session):
        import ray.data

        from maup_ray.ops.graph import triangle_count

        # a path graph has no triangles
        n = 30
        t = pa.table(
            {
                "u": pa.array(np.arange(n - 1, dtype=np.int64)),
                "v": pa.array(np.arange(1, n, dtype=np.int64)),
            }
        )
        got = triangle_count(ray.data.from_arrow(t))
        assert got["n_triangles"][0].as_py() == 0


class TestGlobalRowNumber:
    @pytest.mark.parametrize("n_blocks", [1, 9])
    def test_matches_duckdb(self, ray_session, n_blocks):
        import duckdb
        import ray.data

        from maup_ray.ops.window import global_row_number

        rng = np.random.RandomState(2)
        n = 5000
        t = pa.table(
            {
                # coarse values → cross-block ties broken by id
                "v": pa.array(
                    rng.randint(0, 40, n).astype(np.float64)
                ),
                "id": pa.array(rng.permutation(n).astype(np.int64)),
            }
        )
        want = duckdb.sql(
            """SELECT v, id,
                      CAST(row_number() OVER (ORDER BY v DESC, id)
                           AS BIGINT) AS rank
               FROM t ORDER BY rank"""
        ).df()
        got = (
            _collect(
                global_row_number(
                    ray.data.from_arrow(t).repartition(n_blocks),
                    ["v", "id"],
                    descending=[True, False],
                )
            )
            .sort_values("rank", ignore_index=True)[["v", "id", "rank"]]
        )
        pd.testing.assert_frame_equal(got, want)

    def test_ranks_are_a_permutation(self, ray_session):
        import ray.data

        from maup_ray.ops.window import global_row_number

        n = 777
        t = pa.table({"id": pa.array(np.arange(n, dtype=np.int64))})
        got = _collect(
            global_row_number(
                ray.data.from_arrow(t).repartition(5), ["id"]
            )
        )
        assert sorted(got["rank"].tolist()) == list(range(1, n + 1))
        # ascending id ⇒ rank == id + 1
        assert (got["rank"] == got["id"] + 1).all()


class TestGroupedOhlc:
    def _mk(self, n=500, seed=3):
        rng = np.random.default_rng(seed)
        return pa.table(
            {
                "k": pa.array(rng.integers(0, 7, n)),
                "ts": pa.array(rng.integers(0, 40, n)),
                "id": pa.array(np.arange(n, dtype=np.int64)),
                "v": pa.array(rng.normal(size=n)),
            }
        )

    def _brute(self, t):
        df = t.to_pandas().sort_values(["k", "ts", "id"])
        g = df.groupby("k")
        out = pd.DataFrame(
            {
                "open": g["v"].first(),
                "high": g["v"].max(),
                "low": g["v"].min(),
                "close": g["v"].last(),
                "n": g["v"].size().astype("int64"),
            }
        ).reset_index()
        return out.sort_values("k").reset_index(drop=True)

    def test_matches_brute(self, ray_session):
        import ray.data

        from maup_ray.ops.window import grouped_ohlc

        t = self._mk()
        got = (
            grouped_ohlc(
                ray.data.from_arrow(t).repartition(5),
                ["k"],
                ["ts", "id"],
                "v",
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
            .rename(columns={"k": "k"})
        )
        want = self._brute(t)
        pd.testing.assert_frame_equal(
            got[["k", "open", "high", "low", "close", "n"]], want
        )

    def test_partition_invariant(self, ray_session):
        import ray.data

        from maup_ray.ops.window import grouped_ohlc

        t = self._mk(seed=11)
        outs = []
        for parts in (1, 3, 9):
            out = (
                grouped_ohlc(
                    ray.data.from_arrow(t).repartition(parts),
                    ["k"],
                    ["ts", "id"],
                    "v",
                )
                .to_pandas()
                .sort_values("k")
                .reset_index(drop=True)
            )
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        pd.testing.assert_frame_equal(outs[0], outs[2])

    def test_table_input(self):
        from maup_ray.ops.window import grouped_ohlc

        t = self._mk(n=40, seed=5)
        got = (
            grouped_ohlc(t, ["k"], ["ts", "id"], "v")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["k", "open", "high", "low", "close", "n"]],
            self._brute(t),
        )


class TestSkewKurt:
    def test_matches_scipy_formula(self, ray_session):
        from maup_ray.pipelines import q_skewkurt

        got = q_skewkurt("/root/testdata/sf0.001").to_pandas()
        import duckdb

        df = duckdb.connect().execute(
            "SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT) x "
            "FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
        ).df()
        for _, row in got.iterrows():
            x = df[df.l_returnflag == row.l_returnflag].x.to_numpy(
                dtype=np.float64
            )
            m = x.mean()
            m2 = ((x - m) ** 2).mean()
            m3 = ((x - m) ** 3).mean()
            m4 = ((x - m) ** 4).mean()
            assert row.n == len(x)
            assert row.skew_pop == pytest.approx(m3 / m2**1.5, rel=1e-9)
            assert row.kurt_pop == pytest.approx(m4 / m2**2, rel=1e-9)


class TestRollingZFlags:
    def _brute(self, df, window=4, z2=9):
        out = []
        for uid, g in df.groupby("k"):
            g = g.sort_values(["o", "i"]).reset_index(drop=True)
            for r in range(len(g)):
                if r < window:
                    continue
                w = g["v"].iloc[r - window : r].astype(object)
                s, q = int(w.sum()), int((w * w).sum())
                v = int(g["v"].iloc[r])
                dev2 = (v * window - s) ** 2
                bound = z2 * (window * q - s * s)
                if dev2 > bound:
                    out.append((uid, int(g["i"].iloc[r]), dev2, bound))
        return sorted(out)

    def test_matches_brute_force(self, ray_session):
        import ray.data

        from maup_ray.ops.window import rolling_z_flags

        rng = np.random.RandomState(17)
        n = 2000
        df = pd.DataFrame(
            {
                "k": rng.randint(0, 9, n).astype(np.int64),
                "o": rng.randint(0, 500, n).astype(np.int64),
                "i": np.arange(n, dtype=np.int64),  # unique tie-break
                "v": rng.randint(-50, 2000, n).astype(np.int64),
            }
        )
        ds = ray.data.from_pandas(df).repartition(6)
        got = _collect(
            rolling_z_flags(ds, "k", ("o", "i"), "v", window=4, z2=9)
        )
        gt = sorted(
            zip(got["k"].astype(int), got["i"].astype(int),
                got["dev2"].astype(int), got["bound"].astype(int))
        )
        assert gt == self._brute(df)

    def test_full_windows_only_and_table_path(self, ray_session):
        from maup_ray.ops.window import rolling_z_flags

        # one key, a huge spike at the end; first `window` rows can
        # never flag (partial windows excluded)
        t = pa.table(
            {
                "k": pa.array([1] * 6, type=pa.int64()),
                "o": pa.array(range(6), type=pa.int64()),
                "i": pa.array(range(6), type=pa.int64()),
                "v": pa.array([10, 10, 10, 10, 10, 9000], type=pa.int64()),
            }
        )
        got = _collect(rolling_z_flags(t, "k", ("o", "i"), "v",
                                       window=5, z2=9))
        assert got["i"].tolist() == [5]
        # constant window has zero variance -> any deviation flags
        assert got["bound"].tolist() == [0]


class TestUnpivot:
    def test_roundtrip_and_type_guard(self, ray_session):
        import ray.data

        from maup_ray.ops.reshape import unpivot

        tbl = pa.table(
            {
                "id": pa.array([1, 2], type=pa.int64()),
                "a": pa.array([1.5, 2.5]),
                "b": pa.array([3.0, 4.0]),
            }
        )
        out = unpivot(tbl, ["id"], ["a", "b"])
        assert out.num_rows == 4
        assert out.column_names == ["id", "metric", "value"]
        assert out["metric"].to_pylist() == ["a", "a", "b", "b"]
        assert out["value"].to_pylist() == [1.5, 2.5, 3.0, 4.0]
        # dataset path matches table path (order within block preserved)
        ds_out = unpivot(ray.data.from_arrow(tbl), ["id"], ["a", "b"])
        got = pa.concat_tables(
            [pa.Table.from_pandas(df) for df in
             [ds_out.to_pandas()]]
        )
        assert sorted(got.to_pylist(), key=str) == sorted(
            out.to_pylist(), key=str
        )
        # mixed types refuse
        bad = pa.table(
            {"id": pa.array([1]), "a": pa.array([1.0]),
             "n": pa.array([2], type=pa.int64())}
        )
        import pytest as _pytest

        with _pytest.raises(ValueError, match="share one Arrow type"):
            unpivot(bad, ["id"], ["a", "n"])


class TestGroupedStreaks:
    def test_matches_brute_force(self, ray_session):
        import ray.data

        from maup_ray.ops.window import grouped_streaks

        rng = np.random.default_rng(3)
        n = 500
        k = rng.integers(0, 6, size=n)
        day = rng.integers(0, 40, size=n)  # many repeat days
        us = day * 86_400_000_000 + rng.integers(
            0, 86_400_000_000, size=n
        )
        tbl = pa.table(
            {
                "k": pa.array(k, type=pa.int64()),
                "ts": pa.array(us, type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
            }
        )
        got = grouped_streaks(
            ray.data.from_arrow(tbl).repartition(9), "k", "ts"
        ).take_all()

        def brute(days):
            ds_ = sorted(set(days.tolist()))
            best = run = 1
            for a, b in zip(ds_, ds_[1:]):
                run = run + 1 if b == a + 1 else 1
                best = max(best, run)
            return len(ds_), best

        assert {r["k"] for r in got} == set(np.unique(k).tolist())
        for r in got:
            nd, ms = brute(day[k == r["k"]])
            assert r["n_days"] == nd
            assert r["max_streak"] == ms

    def test_gaps_and_single_day(self, ray_session):
        import ray.data

        from maup_ray.ops.window import grouped_streaks

        us = [d * 86_400_000_000 for d in (0, 1, 2, 4, 5, 30)]
        tbl = pa.table(
            {
                "k": pa.array([7] * 6 + [8], type=pa.int64()),
                "ts": pa.array(
                    us + [86_400_000_000 * 100], type=pa.int64()
                ).cast(pa.timestamp("us")),
            }
        )
        got = {r["k"]: r
               for r in grouped_streaks(
                   ray.data.from_arrow(tbl), "k", "ts"
               ).take_all()}
        assert got[7]["n_days"] == 6 and got[7]["max_streak"] == 3
        assert got[8]["n_days"] == 1 and got[8]["max_streak"] == 1
