"""Distributed PCA over an embedding column — the dimensionality-
reduction stage of a training-data pipeline (decorrelate features,
whiten before clustering, 2-D corpus maps).

Scale shape: ONE streaming pass accumulates the first and second
moments as O(d + d²) per-block partials (d = embedding dim, 64 here —
a 64×64 int64 Gram partial is 32 KiB/block regardless of corpus
size); the driver merges partials with arbitrary-precision Python
ints and eigensolves the tiny d×d covariance once. The projection
pass is a stateless vectorized map_batches. Nothing corpus-sized ever
leaves the blocks and there is no shuffle at all.

PARTITION-INVARIANT accumulation (the vector/kmeans.py discipline):
per-row values quantize to a 2^-20 fixed-point grid, so per-block
moment sums are exact int64 (qx·qy ≤ 2^40, rows/block ≪ 2^22) and
the cross-block merge is exact integer addition — the covariance
matrix is BIT-IDENTICAL for every block structure, row order, and
num_cpus, hence so are the eigenvectors and every projected score.
The quantization perturbs each input by ≤ 2^-21 absolute (inputs are
unit-scale floats), far below any spectral quantity of interest; it
is the price of exactness, mirrors kmeans_fit, and is documented
behavior, not an approximation knob.

Eigenvector sign is canonicalized (the coordinate with the largest
absolute value is made positive, ties → lowest index) so components
are reproducible across LAPACK builds up to that convention.

Reference surface: sklearn.decomposition.PCA (fit = moments +
eigh(cov), transform = (X − mean) @ components.T) re-expressed as
Ray Data passes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import embedding_matrix

__all__ = ["pca_fit", "pca_transform", "pca"]

_Q = 20  # fixed-point fraction bits (see module docstring)


def _moment_partial(batch: pa.Table, col: str, d: int) -> pa.Table:
    m = embedding_matrix(batch, col)
    q = np.rint(m * float(1 << _Q)).astype(np.int64)
    s1 = q.sum(axis=0)
    s2 = q.T @ q  # |q_i·q_j| ≤ 2^40 · rows/block — exact int64
    return pa.table(
        {
            "i": pa.array(np.arange(d, dtype=np.int64)),
            "s1": pa.array(s1),
            "s2": pa.array(list(s2), type=pa.list_(pa.int64())),
            "n": pa.array(np.full(d, len(m), dtype=np.int64)),
        }
    )


def pca_fit(
    ds,
    n_components: int = 2,
    col: str = "embedding",
):
    """One streaming moment pass → (components (k, d), mean (d,),
    explained_variance (k,)). ``ds`` is a Dataset or a pa.Table."""
    import ray
    import ray.data

    if isinstance(ds, pa.Table):
        ds = ray.data.from_arrow(ds)
    # probe the dimension from the schema (fixed-size per corpus)
    d = None
    parts = []
    mapped = ds.map_batches(
        lambda b: _moment_partial(b, col, len(b[col][0])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    for r in mapped.to_arrow_refs():
        t = ray.get(r)
        if t.num_columns and t.num_rows:
            parts.append(t)
    if not parts:
        raise ValueError("pca_fit: empty input")
    d = parts[0].num_rows
    n = 0
    s1 = np.zeros(d, dtype=object)
    s2 = np.zeros((d, d), dtype=object)
    for t in parts:
        n += int(t["n"][0].as_py())
        s1 = s1 + t["s1"].to_numpy(zero_copy_only=False)
        flat = t["s2"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
        s2 = s2 + flat.reshape(d, d)
    if n < 2:
        raise ValueError("pca_fit: need at least 2 rows")
    # covariance numerator n·Σxxᵀ − (Σx)(Σx)ᵀ over the common exact
    # denominator n²·2^2Q: every entry is ONE correctly-rounded
    # int/int division from the exact rational
    den = n * n << (2 * _Q)
    num = n * s2 - np.multiply.outer(s1, s1)
    cov = np.array(
        [[int(v) / den for v in row] for row in num], dtype=np.float64
    )
    mean = np.array([int(v) / (n << _Q) for v in s1], dtype=np.float64)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:n_components]
    comps = v[:, order].T.copy()
    evar = w[order].copy()
    # sign canonicalization: largest-|coord| positive, ties → lowest i
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return comps, mean, evar


def pca_transform(
    ds,
    components: np.ndarray,
    mean: np.ndarray,
    col: str = "embedding",
    id_col: str = "vec_id",
    out_prefix: str = "pc",
):
    """Project every row onto the fitted components — stateless
    vectorized pass; returns (id_col, pc1..pck)."""
    import ray.data

    comps = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)
    names = [f"{out_prefix}{i + 1}" for i in range(len(comps))]

    def proj(batch: pa.Table) -> pa.Table:
        m = embedding_matrix(batch, col)
        cols = {id_col: batch[id_col]}
        # fixed left-to-right coordinate accumulation, NOT a BLAS
        # gemm: dgemm's summation order varies with the block's row
        # count, which would make scores depend on batching — this
        # keeps every score bit-identical across partitionings
        for j, nm in enumerate(names):
            c = comps[j]
            acc = np.zeros(len(m), dtype=np.float64)
            for t in range(m.shape[1]):
                acc += (m[:, t] - mu[t]) * c[t]
            cols[nm] = pa.array(acc)
        return pa.table(cols)

    if isinstance(ds, pa.Table):
        ds = ray.data.from_arrow(ds)
    return ds.map_batches(proj, batch_format="pyarrow",
                          zero_copy_batch=True)


def pca(ds, n_components: int = 2, col: str = "embedding",
        id_col: str = "vec_id"):
    """fit + transform in two passes over ``ds``."""
    comps, mean, _ = pca_fit(ds, n_components, col)
    return pca_transform(ds, comps, mean, col, id_col)
