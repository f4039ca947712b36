"""Count-min sketch (ops/sketch.count_min): one-sided error, exact
small-stream recovery, partition invariance, epsilon bound."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.ops.sketch import CMS_HASHES, cms_estimate, count_min


def _ds(keys, n_blocks=1):
    import ray.data

    d = ray.data.from_arrow(
        pa.table({"k": pa.array(np.asarray(keys, dtype=np.int64))})
    )
    return d.repartition(n_blocks) if n_blocks > 1 else d


@pytest.mark.parametrize("seed", [0, 5])
def test_one_sided_and_bounded(ray_session, seed):
    rng = np.random.RandomState(seed)
    # zipf-ish skewed stream over 300 distinct keys, w=64 → collisions
    keys = (rng.zipf(1.5, 5000) % 300).astype(np.int64)
    truth = collections.Counter(keys.tolist())
    w = 64
    mat = count_min(_ds(keys, 7), "k", w=w)
    qs = np.array(sorted(truth), dtype=np.int64)
    est = cms_estimate(mat, qs)
    n = len(keys)
    for k, e in zip(qs.tolist(), est.tolist()):
        assert e >= truth[k]  # CMS never undercounts
        # e/w overcount bound holds in expectation; with d=4 rows the
        # min is far inside 3·(e/w)·n on any seed worth shipping
        assert e - truth[k] <= 3 * 2.72 * n / w


def test_exact_when_no_collisions(ray_session):
    # 10 distinct keys in w=256 with 4 rows: some row is collision-free
    # for every key pair here (verified by the assert itself)
    keys = np.repeat(np.arange(10, dtype=np.int64), [1, 2, 3, 4, 5, 6, 7, 8, 9, 10])
    mat = count_min(_ds(keys), "k", w=256)
    est = cms_estimate(mat, np.arange(10))
    assert est.tolist() == list(range(1, 11))


def test_partition_invariant(ray_session):
    rng = np.random.RandomState(3)
    keys = rng.randint(0, 100, 4000).astype(np.int64)
    a = count_min(_ds(keys, 1), "k", w=64)
    b = count_min(_ds(keys, 9), "k", w=64)
    assert (a == b).all()


def test_total_mass_per_row():
    # every row of the matrix carries the full stream count
    import ray.data  # noqa: F401  (ray via fixture in other tests)

    keys = np.arange(500, dtype=np.int64) % 37
    mat = count_min(_ds(keys), "k", w=64)
    assert (mat.sum(axis=1) == len(keys)).all()
    assert mat.shape == (len(CMS_HASHES), 64)
