"""vector/pca — distributed PCA: exact quantized-moment replica vs
numpy, bit-level partition invariance, planted-direction recovery,
and sign canonicalization."""

import numpy as np
import pyarrow as pa
import pytest

Q = 20


def _table(m: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
            "embedding": pa.array(
                list(m.astype(np.float32)),
                type=pa.list_(pa.float32()),
            ),
        }
    )


def _numpy_replica(m: np.ndarray, k: int):
    """The exact spec from the module docstring, re-derived."""
    q = (
        np.rint(m.astype(np.float64) * float(1 << Q))
        .astype(np.int64)
        .astype(object)
    )
    n, d = q.shape
    s1 = q.sum(axis=0)
    s2 = q.T @ q
    den = n * n << (2 * Q)
    num = n * s2 - np.multiply.outer(s1, s1)
    cov = np.array([[int(v) / den for v in row] for row in num])
    mean = np.array([int(v) / (n << Q) for v in s1])
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T.copy()
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return comps, mean, w[order]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(3)
    # anisotropic cloud: dominant direction along a fixed unit vector
    d = 16
    v = rng.normal(size=d)
    v /= np.linalg.norm(v)
    t = rng.normal(size=(400, 1))
    m = 5.0 * t * v + 0.3 * rng.normal(size=(400, d)) + 0.7
    return m.astype(np.float32), v


def test_fit_matches_numpy_replica(ray_session, corpus):
    from maup_ray.vector.pca import pca_fit

    m, _ = corpus
    comps, mean, evar = pca_fit(_table(m), n_components=3)
    wc, wm, wv = _numpy_replica(np.asarray(m, dtype=np.float64), 3)
    np.testing.assert_array_equal(mean, wm)
    np.testing.assert_array_equal(comps, wc)
    np.testing.assert_array_equal(evar, wv)


def test_partition_invariant_scores(ray_session, corpus):
    import ray.data

    from maup_ray.vector.pca import pca

    m, _ = corpus
    base = pca(_table(m), n_components=2).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    re = pca(
        ray.data.from_arrow(_table(m)).repartition(7), n_components=2
    ).to_pandas().sort_values("vec_id").reset_index(drop=True)
    # bit-identical: the covariance is exact-integer derived
    assert (base["pc1"] == re["pc1"]).all()
    assert (base["pc2"] == re["pc2"]).all()


def test_planted_direction_recovered(ray_session, corpus):
    from maup_ray.vector.pca import pca_fit

    m, v = corpus
    comps, _, evar = pca_fit(_table(m), n_components=2)
    assert abs(float(comps[0] @ v)) > 0.99
    assert evar[0] > 10 * evar[1] > 0


def test_sign_canonical(ray_session, corpus):
    from maup_ray.vector.pca import pca_fit

    m, _ = corpus
    comps, _, _ = pca_fit(_table(m), n_components=2)
    for row in comps:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_transform_centers(ray_session, corpus):
    """Projected scores have (near-)zero mean — the transform really
    subtracts the fitted mean."""
    from maup_ray.vector.pca import pca

    m, _ = corpus
    df = pca(_table(m), n_components=2).to_pandas()
    # the fitted mean is of the 2^-20-QUANTIZED copies, so projected
    # means sit at quantization level, not at float epsilon
    assert abs(df["pc1"].mean()) < 1e-5
    assert abs(df["pc2"].mean()) < 1e-5
