"""Distributed logistic regression (vector/logreg.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.vector.logreg import logreg_fit, logreg_score

F = ["x0", "x1"]


def _sep_table(n=400, seed=11):
    """Linearly separable planted fixture."""
    rng = np.random.RandomState(seed)
    X = rng.uniform(-2, 2, size=(n, 2))
    y = (X[:, 0] + 2 * X[:, 1] > 0.3).astype(np.int64)
    return pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "x0": pa.array(X[:, 0]),
            "x1": pa.array(X[:, 1]),
            "y": pa.array(y),
        }
    )


def _numpy_replica(t, iters, lr, l2):
    """Literal float64 re-implementation WITHOUT the fixed-point
    quantization — the engine must match to ~2^-40."""
    X = np.column_stack(
        [t[c].to_numpy(zero_copy_only=False) for c in F]
    ).astype(np.float64)
    y = t["y"].to_numpy(zero_copy_only=False).astype(np.float64)
    mins, maxs = X.min(axis=0), X.max(axis=0)
    Xs = (X - mins) / (maxs - mins)
    w = np.zeros(2)
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
        g = p - y
        w = w - lr * ((Xs * g[:, None]).mean(axis=0) + l2 * w)
        b = b - lr * g.mean()
    return w, b


class TestLogReg:
    def test_separable_fixture_converges(self):
        t = _sep_table()
        m = logreg_fit(t, F, "y", iters=300, lr=4.0, l2=0.0)
        probs = logreg_score(t, m, F, "id")["prob"].to_numpy()
        y = t["y"].to_numpy()
        acc = ((probs > 0.5).astype(np.int64) == y).mean()
        assert acc >= 0.98

    def test_matches_numpy_replica(self):
        t = _sep_table(seed=23)
        m = logreg_fit(t, F, "y", iters=50, lr=1.5, l2=1e-3)
        w_ref, b_ref = _numpy_replica(t, 50, 1.5, 1e-3)
        # 2^-40 per-step quantization accumulates but stays tiny
        assert np.allclose(m["w"], w_ref, atol=1e-8)
        assert abs(m["b"] - b_ref) < 1e-8

    def test_partition_invariant_fit_and_score(self, ray_session):
        import pandas as pd
        import ray.data

        t = _sep_table(seed=31)
        models, scores = [], []
        for p in (1, 3, 8):
            ds = ray.data.from_arrow(t).repartition(p).materialize()
            # driver_limit=0 forces the DISTRIBUTED per-iteration
            # path; equality with mloc below proves the small-input
            # driver fast path is bit-identical to it
            m = logreg_fit(
                ds, F, "y", iters=40, lr=2.0, l2=1e-3, driver_limit=0
            )
            models.append(m)
            scores.append(
                logreg_score(ds, m, F, "id")
                .to_pandas()
                .sort_values("id")
                .reset_index(drop=True)
            )
        for m in models[1:]:
            # BIT-identical — integer gradient accumulation + fixed-
            # order row dot (no BLAS shape drift)
            assert np.array_equal(m["w"], models[0]["w"])
            assert m["b"] == models[0]["b"]
        for s in scores[1:]:
            pd.testing.assert_frame_equal(s, scores[0])
        # distributed == driver-local Table path, also bit-exact
        mloc = logreg_fit(t, F, "y", iters=40, lr=2.0, l2=1e-3)
        assert np.array_equal(mloc["w"], models[0]["w"])

    def test_constant_feature_is_inert(self):
        t = _sep_table(seed=7)
        t = t.append_column(
            "x2", pa.array(np.full(len(t), 3.25))
        )
        m = logreg_fit(t, ["x0", "x1", "x2"], "y", iters=30, lr=2.0)
        # zero scale ⇒ the constant column contributes exactly nothing
        assert m["scales"][2] == 0.0

    def test_query_pinned(self, ray_session):
        import hashlib

        from maup_ray.pipelines import q_quality_model

        df = (
            q_quality_model("/root/testdata/sf0.001")
            .to_pandas()
        )
        assert len(df) == 500
        cols = sorted(df.columns)
        df = df[cols].sort_values(cols).reset_index(drop=True)
        h = hashlib.sha256(
            df.to_csv(index=False, float_format="%.17g").encode()
        ).hexdigest()[:16]
        assert h == "a6a003c3aa906bd8"
