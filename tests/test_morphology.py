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

    def test_full_grid_no_probe_alias(self, ray_session):
        # regression: with probe stride G the out-of-grid probe
        # (cx, −1) aliases the real cell (cx−1, G−1), so a FULL grid
        # kept its cy-edge rows under erosion (G·(G−2) instead of
        # (G−2)²)
        G = 8
        xs, ys = np.meshgrid(np.arange(G), np.arange(G))
        t = pa.table(
            {
                "id": pa.array(np.zeros(G * G, dtype=np.int64)),
                "cx": pa.array(xs.ravel().astype(np.int64)),
                "cy": pa.array(ys.ravel().astype(np.int64)),
            }
        )
        er = morphology(t, 3, op="erode")
        got = set(zip(er["cx"].to_pylist(), er["cy"].to_pylist()))
        assert got == {
            (x, y) for x in range(1, G - 1) for y in range(1, G - 1)
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


class TestFocalSum:
    def test_matches_brute(self, ray_session):
        import ray.data

        from maup_ray.ops.raster import focal_sum

        rng = np.random.RandomState(19)
        rows = []
        for rid in range(4):
            n = rng.randint(20, 90)
            seen = set()
            for _ in range(n):
                c = (int(rng.randint(0, 20)), int(rng.randint(0, 20)))
                if c not in seen:
                    seen.add(c)
                    rows.append((rid, c[0], c[1],
                                 int(rng.randint(-50, 50))))
        t = pa.table(
            {
                "id": pa.array([r[0] for r in rows], type=pa.int64()),
                "cx": pa.array([r[1] for r in rows], type=pa.int64()),
                "cy": pa.array([r[2] for r in rows], type=pa.int64()),
                "v": pa.array([r[3] for r in rows], type=pa.int64()),
            }
        )
        got = _collect(
            focal_sum(ray.data.from_arrow(t).repartition(3))
        )
        cells = {(r[0], r[1], r[2]): r[3] for r in rows}
        grows = {
            (r["id"], r["cx"], r["cy"]): (r["fsum"], r["n_nb"])
            for r in got.to_pylist()
        }
        assert len(grows) == len(cells)
        for (rid, x, y), _v in cells.items():
            fs = nb = 0
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    w = cells.get((rid, x + dx, y + dy))
                    if w is not None:
                        fs += w
                        nb += 1
            assert grows[(rid, x, y)] == (fs, nb), (rid, x, y)

    def test_table_path_isolated_cell(self, ray_session):
        from maup_ray.ops.raster import focal_sum

        t = pa.table(
            {
                "id": pa.array(["z"]),
                "cx": pa.array([5], type=pa.int64()),
                "cy": pa.array([5], type=pa.int64()),
                "v": pa.array([7], type=pa.int64()),
            }
        )
        got = focal_sum(t)
        assert got["fsum"].to_pylist() == [7]
        assert got["n_nb"].to_pylist() == [1]


class TestMaxDrawdown:
    def test_matches_brute(self, ray_session):
        import ray.data

        from maup_ray.ops.window import grouped_max_drawdown

        rng = np.random.RandomState(29)
        n = 3000
        t = pa.table(
            {
                "k": pa.array(rng.randint(0, 11, n).astype(np.int64)),
                "ts": pa.array(rng.randint(0, 500, n).astype(np.int64)),
                "i": pa.array(np.arange(n, dtype=np.int64)),
                "v": pa.array(
                    rng.randint(-2000, 2000, n).astype(np.int64)
                ),
            }
        )
        got = _collect(
            grouped_max_drawdown(
                ray.data.from_arrow(t).repartition(6),
                "k", "ts", "i", "v",
            )
        )
        rows = {r["k"]: (r["n"], r["max_dd"], r["trough_ts"])
                for r in got.to_pylist()}
        import pandas as pd

        df = t.to_pandas()
        for k, g in df.groupby("k"):
            g = g.sort_values(["ts", "i"]).reset_index(drop=True)
            peak = g["v"].cummax()
            dd = peak - g["v"]
            mx = int(dd.max())
            trough = int(g["ts"].iloc[int(dd.idxmax())])
            assert rows[int(k)] == (len(g), mx, trough), k

    def test_monotone_series_zero_dd(self, ray_session):
        from maup_ray.ops.window import grouped_max_drawdown

        t = pa.table(
            {
                "k": pa.array([1, 1, 1], type=pa.int64()),
                "ts": pa.array([1, 2, 3], type=pa.int64()),
                "i": pa.array([1, 2, 3], type=pa.int64()),
                "v": pa.array([1, 5, 9], type=pa.int64()),
            }
        )
        got = grouped_max_drawdown(t, "k", "ts", "i", "v")
        # rising series: max_dd 0, earliest trough = first row
        assert got["max_dd"].to_pylist() == [0]
        assert got["trough_ts"].to_pylist() == [1]
