"""text/rank.tfidf_topk — brute-force oracle, ties, vocab guard."""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pytest

from maup_ray.text.rank import tfidf_topk

DOCS = [
    (0, "apple banana apple cherry"),
    (1, "banana banana date"),
    (2, "apple cherry cherry cherry date"),
    (3, "elderberry"),
]


def _brute(k=3, scale=10**6):
    n = len(DOCS)
    df = Counter()
    tfs = {}
    for d, text in DOCS:
        tf = Counter(text.split(" "))
        tfs[d] = tf
        for t in tf:
            df[t] += 1
    out = []
    for d, tf in tfs.items():
        scored = sorted(
            (((tf[t] * scale * n) // df[t], t) for t in tf),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        for s, t in scored:
            out.append((d, t, tf[t], df[t], s))
    return sorted(out)


class TestTfidfTopk:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        t = pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                "text": pa.array([s for _, s in DOCS]),
            }
        )
        for parts in (1, 3):
            ds = ray.data.from_arrow(t).repartition(parts)
            out = tfidf_topk(ds, k=3).to_pandas()
            got = sorted(
                (r.doc_id, r.term, r.tf, r.df, r.score_u)
                for r in out.itertuples()
            )
            assert got == _brute()

    def test_tie_breaks_by_term(self, ray_session):
        import ray.data

        # two terms with identical tf and df in one doc: term ASC wins
        t = pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array(["zed alpha"]),
            }
        )
        out = tfidf_topk(
            ray.data.from_arrow(t), k=1
        ).to_pandas()
        assert out["term"].tolist() == ["alpha"]

    def test_vocab_limit_raises(self, ray_session):
        import ray.data

        t = pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array(["a b c d e"]),
            }
        )
        with pytest.raises(ValueError, match="vocab"):
            tfidf_topk(
                ray.data.from_arrow(t), k=1, vocab_limit=2
            )


class TestPercentRank:
    def test_matches_bruteforce(self, ray_session):
        import numpy as np
        import ray.data

        from maup_ray.ops.window import grouped_percent_rank

        rng = np.random.RandomState(13)
        n = 2000
        g = rng.randint(0, 20, n).astype(np.int64)
        v = rng.randint(0, 40, n).astype(np.int64)  # many ties
        ids = np.arange(n, dtype=np.int64)
        t = pa.table({"g": g, "v": v, "id": ids})

        # brute: per group, pr = (#strictly-smaller)/(n-1)
        want = {}
        for grp in np.unique(g):
            vals = v[g == grp]
            iids = ids[g == grp]
            m = len(vals)
            for val, i in zip(vals, iids):
                pr = (
                    0.0
                    if m == 1
                    else float(int((vals < val).sum())) / float(m - 1)
                )
                want[int(i)] = pr

        for parts in (1, 6):
            ds = ray.data.from_arrow(t).repartition(parts)
            out = grouped_percent_rank(
                ds, ["g"], "v", keep_cols=["id"]
            ).to_pandas()
            got = dict(zip(out["id"], out["pr"]))
            assert got == want

    def test_single_row_partition_zero(self, ray_session):
        import ray.data

        from maup_ray.ops.window import grouped_percent_rank

        t = pa.table(
            {
                "g": pa.array([1, 2, 2], pa.int64()),
                "v": pa.array([9, 1, 2], pa.int64()),
            }
        )
        out = grouped_percent_rank(
            ray.data.from_arrow(t), ["g"], "v"
        ).to_pandas().sort_values(["g", "v"])
        assert out["pr"].tolist() == [0.0, 0.0, 1.0]


class TestGroupedCube:
    def test_matches_pandas_cube(self, ray_session):
        import numpy as np
        import ray.data

        from maup_ray.ops.agg import grouped_cube

        rng = np.random.RandomState(17)
        n = 300
        a = rng.choice(["x", "y", "z"], n)
        b = rng.randint(0, 4, n).astype(np.int64)
        v = rng.randint(0, 100, n).astype(np.int64)
        t = pa.table({"a": a, "b": b, "v": v})
        out = grouped_cube(
            ray.data.from_arrow(t).repartition(4),
            ["a", "b"],
            sum_cols=["v"],
            count_col="n",
        ).to_pandas()

        import pandas as pd

        df = pd.DataFrame({"a": a, "b": b, "v": v})
        # four grouping sets
        assert len(out) == (
            df.groupby(["a", "b"]).ngroups
            + df["a"].nunique()
            + df["b"].nunique()
            + 1
        )
        both = out.dropna(subset=["a", "b"])
        fine = df.groupby(["a", "b"])["v"].sum()
        for r in both.itertuples():
            assert r.v == fine[(r.a, r.b)]
        total = out[out["a"].isna() & out["b"].isna()]
        assert total["v"].tolist() == [int(v.sum())]
        assert total["n"].tolist() == [n]
        only_a = out[out["a"].notna() & out["b"].isna()]
        wa = df.groupby("a")["v"].sum()
        assert {r.a: r.v for r in only_a.itertuples()} == wa.to_dict()


class TestQuantilesCont:
    def test_matches_duckdb_random(self, ray_session):
        """Randomized bitwise parity with DuckDB quantile_cont across
        group sizes 1..40 and both final modes."""
        import duckdb
        import numpy as np
        import ray.data

        from maup_ray.ops.curate import grouped_quantiles_cont

        rng = np.random.RandomState(23)
        n = 1500
        g = rng.randint(0, 60, n).astype(np.int64)  # some tiny groups
        v = rng.randint(-10**12, 10**12, n).astype(np.int64)
        t = pa.table({"g": g, "v": v})
        # Isolated connection: duckdb.query_df on the module-level
        # default connection registers a PERSISTENT view named "t"
        # that shadows other tests' replacement scans of their own
        # local `t` (broke test_window.py in full-suite runs).
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(
            """SELECT g, CAST(count(*) AS BIGINT) AS n,
                      quantile_cont(v, 0.25) AS p25,
                      quantile_cont(v, 0.50) AS p50,
                      quantile_cont(v, 0.90) AS p90
               FROM t GROUP BY g ORDER BY g""",
        ).df()
        con.close()
        for final in ("driver", "shuffle"):
            out = grouped_quantiles_cont(
                ray.data.from_arrow(t).repartition(5),
                "g", "v", final=final,
            )
            df = out.to_pandas()  # pa.Table (driver) or Dataset
            df = df.sort_values("g").reset_index(drop=True)
            for col in ("n", "p25", "p50", "p90"):
                a = df[col].to_numpy()
                b = want[col].to_numpy()
                assert (
                    a.tobytes() == b.tobytes()
                ), f"{final}:{col} not bit-identical"
