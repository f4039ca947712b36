"""ops/raster.morphology, ops/curate.grouped_iqr_outliers and
text/nb.naive_bayes_classify — brute-force set/statistics replicas."""

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.ops.curate import grouped_iqr_outliers
from maup_ray.ops.raster import morphology


def _collect(ds) -> pa.Table:
    import ray

    if isinstance(ds, pa.Table):
        return ds
    tabs = [ray.get(r) for r in ds.materialize().to_arrow_refs()]
    tabs = [t for t in tabs if t.num_rows] or tabs[:1]
    return pa.concat_tables(tabs)


class TestMorphology:
    OFFS = [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)]

    def _brute(self, cells, res, op):
        G = 1 << res
        s = set(cells)
        if op in ("erode", "open"):
            s = {
                (x, y)
                for x, y in s
                if all((x + dx, y + dy) in s for dx, dy in self.OFFS)
            }
        if op in ("dilate", "open"):
            s = {
                (x + dx, y + dy)
                for x, y in s
                for dx, dy in self.OFFS
                if 0 <= x + dx < G and 0 <= y + dy < G
            }
        return s

    def test_matches_brute_all_ops(self, ray_session):
        import ray.data

        rng = np.random.RandomState(3)
        res = 5
        rows = []
        for rid in range(6):
            n = rng.randint(10, 120)
            xs = rng.randint(0, 1 << res, n)
            ys = rng.randint(0, 1 << res, n)
            rows += [(rid, int(x), int(y)) for x, y in zip(xs, ys)]
        t = pa.table(
            {
                "id": pa.array([r[0] for r in rows], type=pa.int64()),
                "cx": pa.array([r[1] for r in rows], type=pa.int64()),
                "cy": pa.array([r[2] for r in rows], type=pa.int64()),
                "coverage_area": pa.array(
                    [1.0] * len(rows), type=pa.float64()
                ),
            }
        )
        for op in ("erode", "dilate", "open"):
            got = _collect(
                morphology(
                    ray.data.from_arrow(t).repartition(4), res, op=op
                )
            )
            gset = {}
            for r in got.to_pylist():
                gset.setdefault(r["id"], set()).add((r["cx"], r["cy"]))
            for rid in range(6):
                cells = {(x, y) for i, x, y in rows if i == rid}
                want = self._brute(cells, res, op)
                assert gset.get(rid, set()) == want, (op, rid)
        with pytest.raises(ValueError):
            morphology(t, res, op="close")

    def test_table_path_border_and_duplicates(self, ray_session):
        # a 3×3 block at the grid corner: the corner cell has no
        # out-of-grid neighbors -> erodes away (background outside)
        cells = [(x, y) for x in range(3) for y in range(3)] * 2
        t = pa.table(
            {
                "id": pa.array(["a"] * len(cells)),
                "cx": pa.array([c[0] for c in cells], type=pa.int64()),
                "cy": pa.array([c[1] for c in cells], type=pa.int64()),
            }
        )
        er = morphology(t, 4, op="erode")
        assert set(zip(er["cx"].to_pylist(), er["cy"].to_pylist())) == {
            (1, 1)
        }
        op = morphology(t, 4, op="open")
        assert set(zip(op["cx"].to_pylist(), op["cy"].to_pylist())) == {
            (1, 1), (0, 1), (2, 1), (1, 0), (1, 2)
        }


class TestIqrOutliers:
    def test_matches_brute(self, ray_session):
        import math

        import ray.data

        rng = np.random.RandomState(31)
        n = 5000
        k = rng.randint(0, 4, n).astype(np.int64)
        v = rng.randint(-10_000, 10_000, n).astype(np.int64)
        got = grouped_iqr_outliers(
            ray.data.from_arrow(
                pa.table({"k": pa.array(k), "v": pa.array(v)})
            ).repartition(5),
            "k", "v",
        )
        rows = {r["k"]: r for r in got.to_pylist()}
        for kk in range(4):
            vals = sorted(v[k == kk].tolist())
            nn = len(vals)
            q1 = vals[math.ceil(0.25 * nn) - 1]
            q3 = vals[math.ceil(0.75 * nn) - 1]
            lo = sum(1 for x in vals if 2 * x < 5 * q1 - 3 * q3)
            hi = sum(1 for x in vals if 2 * x > 5 * q3 - 3 * q1)
            r = rows[kk]
            assert (r["q1"], r["q3"], r["n_low"], r["n_high"]) == (
                q1, q3, lo, hi
            ), kk


class TestNbClassify:
    def test_matches_brute(self, ray_session):
        import math

        import ray.data

        from maup_ray.text.nb import (naive_bayes_classify,
                                      naive_bayes_train)

        rng = np.random.RandomState(13)
        words = ["a", "b", "c", "d", "e", "zz"]
        docs = []
        for i in range(200):
            lang = ["en", "fr"][rng.randint(0, 2)]
            n = rng.randint(1, 8)
            docs.append(
                (i, lang,
                 " ".join(words[j] for j in
                          rng.randint(0, len(words), n)))
            )
        t = pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs],
                                   type=pa.int64()),
                "lang": pa.array([d[1] for d in docs]),
                "text": pa.array([d[2] for d in docs]),
            }
        )
        ds = ray.data.from_arrow(t).repartition(4)
        model, meta = naive_bayes_train(ds, "lang", "text",
                                        with_meta=True)
        got = _collect(
            naive_bayes_classify(ds, model, meta["qden"],
                                 id_col="doc_id", text_col="text",
                                 class_col="lang")
        )
        # brute quantized scoring
        from collections import Counter

        counts: Counter = Counter()
        ncls: Counter = Counter()
        vocab = set()
        for _, lang, text in docs:
            for tok in text.split(" "):
                counts[(lang, tok)] += 1
                ncls[lang] += 1
                vocab.add(tok)
        V = len(vocab)
        S = float(1 << 30)
        qden = {
            c: math.floor(math.log(float(ncls[c] + V)) * S)
            for c in ncls
        }
        rows = {r["doc_id"]: (r["pred"], r["score"])
                for r in got.to_pylist()}
        for did, _, text in docs:
            scores = {}
            for c in sorted(ncls):
                sc = 0
                for tok in text.split(" "):
                    cnt = counts.get((c, tok))
                    qnum = (
                        math.floor(math.log(float(cnt + 1)) * S)
                        if cnt
                        else 0
                    )
                    sc += qnum - qden[c]
                scores[c] = sc
            best = max(scores.values())
            pred = min(c for c in scores if scores[c] == best)
            assert rows[did] == (pred, best), did
