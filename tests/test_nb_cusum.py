"""text/nb.naive_bayes_train, ops/temporal.cusum_changepoint and
ops/graph.degree_histogram — brute-force replicas + partition
invariance + quantized-log exactness."""

import math

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.ops.graph import degree_histogram
from maup_ray.ops.temporal import cusum_changepoint
from maup_ray.text.nb import naive_bayes_train


def _collect(ds) -> pa.Table:
    import ray

    if isinstance(ds, pa.Table):
        return ds
    tabs = [ray.get(r) for r in ds.materialize().to_arrow_refs()]
    tabs = [t for t in tabs if t.num_rows] or tabs[:1]
    return pa.concat_tables(tabs)


class TestNaiveBayes:
    def _brute(self, docs, alpha):
        from collections import Counter

        counts: Counter = Counter()
        nclass: Counter = Counter()
        vocab = set()
        for lang, text in docs:
            for tok in text.split(" "):
                counts[(lang, tok)] += 1
                nclass[lang] += 1
                vocab.add(tok)
        V = len(vocab)
        S = float(1 << 30)
        out = {}
        for (lang, tok), c in counts.items():
            q = (
                math.floor(math.log(float(c + alpha)) * S)
                - math.floor(math.log(float(nclass[lang] + alpha * V)) * S)
            )
            out[(lang, tok)] = (c, q)
        return out

    def test_matches_brute(self, ray_session):
        import ray.data

        rng = np.random.RandomState(5)
        words = ["alpha", "beta", "gamma", "delta", "eps", "zeta",
                 "eta", "theta", ""]
        docs = []
        for i in range(300):
            lang = ["en", "fr", "de"][rng.randint(0, 3)]
            n = rng.randint(1, 12)
            docs.append(
                (lang, " ".join(words[j] for j in
                                rng.randint(0, len(words), n)))
            )
        t = pa.table(
            {
                "lang": pa.array([d[0] for d in docs]),
                "text": pa.array([d[1] for d in docs]),
            }
        )
        got = _collect(
            naive_bayes_train(
                ray.data.from_arrow(t).repartition(5), "lang", "text"
            )
        )
        want = self._brute(docs, 1)
        rows = {
            (r["lang"], r["token"]): (r["c"], r["qlogp"])
            for r in got.to_pylist()
        }
        assert rows == want
        assert got.schema.field("qlogp").type == pa.int64()
        with pytest.raises(ValueError):
            naive_bayes_train(ray.data.from_arrow(t), "lang", "text",
                              alpha=0)

    def test_alpha_two_and_partition_invariance(self, ray_session):
        import ray.data

        t = pa.table(
            {
                "lang": pa.array(["a", "a", "b"]),
                "text": pa.array(["x y x", "y", "x z"]),
            }
        )
        outs = []
        for parts in (1, 3):
            got = _collect(
                naive_bayes_train(
                    ray.data.from_arrow(t).repartition(parts),
                    "lang", "text", alpha=2,
                )
            ).sort_by([("lang", "ascending"), ("token", "ascending")])
            outs.append(got)
        assert outs[0].equals(outs[1])
        want = self._brute(
            [("a", "x y x"), ("a", "y"), ("b", "x z")], 2
        )
        rows = {
            (r["lang"], r["token"]): (r["c"], r["qlogp"])
            for r in outs[0].to_pylist()
        }
        assert rows == want


class TestCusum:
    def _brute(self, series):
        # series: key -> list[(order, v)]
        out = {}
        for k, rows in series.items():
            rows = sorted(rows)
            vals = [v for _, v in rows]
            n, S = len(vals), sum(vals)
            best, bi, P = -1, 0, 0
            for i, v in enumerate(vals):
                P += v
                d = abs(n * P - (i + 1) * S)
                if d > best:
                    best, bi = d, i
            out[k] = (n, rows[bi][0], best)
        return out

    def test_matches_brute(self, ray_session):
        import ray.data

        rng = np.random.RandomState(9)
        n = 2500
        k = rng.randint(0, 7, n).astype(np.int64)
        o = rng.randint(0, 60, n).astype(np.int64)
        v = rng.randint(-1000, 1000, n).astype(np.int64)
        ds = ray.data.from_arrow(
            pa.table({"k": pa.array(k), "o": pa.array(o),
                      "v": pa.array(v)})
        ).repartition(6)
        got = cusum_changepoint(ds, "k", "o", "v")
        series: dict = {}
        # brute aggregates per (k, o) first — same contract
        agg: dict = {}
        for kk, oo, vv in zip(k.tolist(), o.tolist(), v.tolist()):
            agg[(kk, oo)] = agg.get((kk, oo), 0) + vv
        for (kk, oo), vv in agg.items():
            series.setdefault(kk, []).append((oo, vv))
        want = self._brute(series)
        rows = {
            r["k"]: (r["n_periods"], r["cp"], r["max_dev"])
            for r in got.to_pylist()
        }
        assert rows == want

    def test_table_path_and_earliest_tie(self, ray_session):
        # symmetric series: dev ties at both ends -> earliest wins
        t = pa.table(
            {
                "k": pa.array([1] * 4, type=pa.int64()),
                "o": pa.array([1, 2, 3, 4], type=pa.int64()),
                "v": pa.array([10, 0, 0, 10], type=pa.int64()),
            }
        )
        got = cusum_changepoint(t, "k", "o", "v")
        assert got["cp"].to_pylist() == [1]
        # n*P - k*S at k=1: 4*10 - 1*20 = 20; k=3: 4*10-3*20 = -20
        assert got["max_dev"].to_pylist() == [20]


class TestDegreeHistogram:
    def test_matches_brute(self, ray_session):
        import ray.data

        rng = np.random.RandomState(23)
        n_nodes, n_edges = 80, 300
        u = rng.randint(0, n_nodes, n_edges).astype(np.int64)
        v = rng.randint(0, n_nodes, n_edges).astype(np.int64)
        u[:4] = v[:4]  # planted self-loops
        got = degree_histogram(
            ray.data.from_arrow(
                pa.table({"u": pa.array(u), "v": pa.array(v)})
            ).repartition(4)
        )
        adj: dict = {}
        for a, b in zip(u.tolist(), v.tolist()):
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        from collections import Counter

        want = Counter(len(s) for s in adj.values())
        rows = dict(zip(got["deg"].to_pylist(),
                        got["n_nodes"].to_pylist()))
        assert rows == dict(want)
        assert got["deg"].to_pylist() == sorted(rows)
