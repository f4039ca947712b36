"""Distributed logistic regression — the model-based quality-filter
shape (train a small classifier on cheap features, score the corpus,
keep high-probability rows; the public fastText/CCNet-style pipeline
step) as batch-gradient descent over Ray Data.

Physical shape per iteration (mirrors vector/kmeans.py): the weight
vector broadcasts, each block emits ONE O(d) partial — the
fixed-point-quantized gradient sums — and the driver merges exactly.
Nothing row-shaped ever moves; iters × (one streaming pass).

PARTITION-INVARIANT accumulation, the kmeans discipline: features are
min-max scaled to [0,1] with exact (order-independent) per-column
min/max, each row's gradient contribution x_i·(p_i − y_i) ∈ [−1, 1]
is quantized to the 2^-40 grid and summed as INTEGERS — int64 inside
a block (|q| ≤ 2^40, rows/block ≪ 2^22 ⇒ no overflow), Python ints
across blocks — and the driver performs ONE correctly-rounded int/int
division per coordinate before the (driver-local, deterministic)
weight update. Per-row probabilities use a fixed-order ufunc dot
(vector/kmeans.det_sims rationale: BLAS dgemv rounding varies with
batch shape), so fit AND score are bit-identical across block
structures, row orders and num_cpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["logreg_fit", "logreg_score"]

_Q = float(1 << 40)


def _feature_matrix(batch: pa.Table, feature_cols) -> np.ndarray:
    return np.column_stack(
        [
            batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in feature_cols
        ]
    )


def _scale(X: np.ndarray, mins: np.ndarray, scales: np.ndarray):
    return (X - mins) * scales


def _row_dot(X: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Fixed-order per-row dot product (shape-independent — not BLAS)."""
    tmp = X * w
    return np.sum(tmp, axis=1)


def logreg_fit(
    ds,
    feature_cols,
    label_col: str,
    iters: int = 30,
    lr: float = 1.0,
    l2: float = 1e-3,
    driver_limit: int = 262_144,
) -> dict:
    """→ model dict (w, b, mins, scales, n): L2-regularized logistic
    regression by full-batch gradient descent. ``ds`` is materialized
    once so the 1 + iters streaming passes reuse object-store blocks.

    Small-input fast path: a feature table at or under ``driver_limit``
    rows collapses to ONE driver-local table and iterates without
    per-step Ray jobs — BIT-identical to the distributed path because
    the integer accumulation is partition-invariant (local = one
    block; pinned by tests/test_logreg.py). iters × job overhead only
    buys anything when the feature table can't fit one worker."""
    import ray

    feature_cols = list(feature_cols)
    d = len(feature_cols)
    if not isinstance(ds, pa.Table):
        ds = ds.select_columns(
            [*feature_cols, label_col]
        ).materialize()
        if ds.count() <= driver_limit:
            tabs = [
                t
                for t in (
                    ray.get(r) for r in ds.to_arrow_refs()
                )
                if t.num_rows
            ]
            ds = (
                pa.concat_tables(tabs, promote_options="default")
                if tabs
                else pa.table(
                    {
                        c: pa.array([], type=pa.float64())
                        for c in [*feature_cols, label_col]
                    }
                )
            )

    # exact (order-independent) min/max pass for [0,1] scaling
    def minmax(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # typed empty — never pollutes the min
            return pa.table(
                {
                    "mins": pa.array([], type=pa.list_(pa.float64())),
                    "maxs": pa.array([], type=pa.list_(pa.float64())),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        X = _feature_matrix(batch, feature_cols)
        return pa.table(
            {
                "mins": pa.array([X.min(axis=0).tolist()]),
                "maxs": pa.array([X.max(axis=0).tolist()]),
                "n": pa.array([len(batch)], type=pa.int64()),
            }
        )

    if isinstance(ds, pa.Table):
        rows = minmax(ds).to_pylist()
    else:
        rows = ds.map_batches(
            minmax, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
    rows = [r for r in rows if r["n"]]
    mins = np.min([r["mins"] for r in rows], axis=0)
    maxs = np.max([r["maxs"] for r in rows], axis=0)
    n_total = sum(r["n"] for r in rows)
    rng = maxs - mins
    scales = np.where(rng > 0, 1.0 / np.where(rng > 0, rng, 1.0), 0.0)

    w = np.zeros(d, dtype=np.float64)
    b = 0.0
    for _ in range(iters):
        ref = ray.put((w.copy(), b, mins.copy(), scales.copy()))

        def partial(batch: pa.Table) -> pa.Table:
            w_, b_, mins_, scales_ = ray.get(ref)
            X = _scale(
                _feature_matrix(batch, feature_cols), mins_, scales_
            )
            y = (
                batch[label_col]
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
            p = 1.0 / (1.0 + np.exp(-(_row_dot(X, w_) + b_)))
            g = p - y  # ∈ [-1, 1]
            qw = np.rint(X * g[:, None] * _Q).astype(np.int64)
            return pa.table(
                {
                    "gw": pa.array(
                        [np.add.reduce(qw, axis=0).tolist()],
                        type=pa.list_(pa.int64()),
                    ),
                    "gb": pa.array(
                        [int(np.rint(g * _Q).astype(np.int64).sum())],
                        type=pa.int64(),
                    ),
                }
            )

        if isinstance(ds, pa.Table):
            parts = partial(ds).to_pylist()
        else:
            parts = ds.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ).take_all()
        gw_int = [0] * d
        gb_int = 0
        for r in parts:
            for j, v in enumerate(r["gw"]):
                gw_int[j] += int(v)
            gb_int += int(r["gb"])
        # one correctly-rounded division per coordinate (exact int / n·2^40)
        denom = n_total * (1 << 40)
        gw = np.array([v / denom for v in gw_int], dtype=np.float64)
        gb = gb_int / denom
        w = w - lr * (gw + l2 * w)
        b = b - lr * gb
    return {
        "w": w,
        "b": float(b),
        "mins": mins,
        "scales": scales,
        "n": int(n_total),
    }


def logreg_score(ds, model: dict, feature_cols, id_col: str):
    """→ (id, prob) — one streaming pass, broadcast model, per-row
    fixed-order dot (bit-stable across block shapes)."""
    import ray

    feature_cols = list(feature_cols)
    ref = ray.put(
        (
            model["w"].copy(),
            model["b"],
            model["mins"].copy(),
            model["scales"].copy(),
        )
    )

    def score(batch: pa.Table) -> pa.Table:
        w_, b_, mins_, scales_ = ray.get(ref)
        X = _scale(_feature_matrix(batch, feature_cols), mins_, scales_)
        p = 1.0 / (1.0 + np.exp(-(_row_dot(X, w_) + b_)))
        return pa.table(
            {
                id_col: batch[id_col],
                "prob": pa.array(p, type=pa.float64()),
            }
        )

    if isinstance(ds, pa.Table):
        return score(ds)
    return ds.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )
