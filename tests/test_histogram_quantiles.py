"""ops/sketch.histogram_quantiles — error bound vs exact quantiles,
partition invariance, constant-group degenerate, nulls, multi-group."""

import numpy as np
import pyarrow as pa
import pytest


def _exact_q(x, num, den):
    """quantile_disc: value at rank ceil(q·n) (1-based)."""
    xs = np.sort(x)
    t = (num * len(xs) + den - 1) // den
    return xs[max(t - 1, 0)]


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(21)
    k = rng.integers(0, 3, 5000)
    x = np.where(k == 0, rng.normal(100, 20, 5000),
                 np.where(k == 1, rng.exponential(50, 5000),
                          rng.uniform(-5, 5, 5000)))
    return pa.table(
        {"k": pa.array(k, pa.int64()), "x": pa.array(x)}
    )


def test_error_bound_vs_exact(ray_session, data):
    from maup_ray.ops.sketch import histogram_quantiles

    t = histogram_quantiles(data, "k", "x", bins=4096)
    kk = data["k"].to_numpy()
    xx = data["x"].to_numpy()
    qs = [((1, 4), "p25"), ((1, 2), "p50"), ((9, 10), "p90"),
          ((99, 100), "p99")]
    for row in t.to_pylist():
        g = xx[kk == row["k"]]
        width = (g.max() - g.min()) / 4096
        for (num, den), nm in qs:
            exact = _exact_q(g, num, den)
            # sketch returns the bin LOWER edge containing the exact
            # quantile: within one bin width below it
            assert exact - width <= row[nm] <= exact + 1e-12, nm


def test_partition_invariant(ray_session, data):
    import ray.data

    from maup_ray.ops.sketch import histogram_quantiles

    a = histogram_quantiles(data, "k", "x")
    b = histogram_quantiles(
        ray.data.from_arrow(data).repartition(13), "k", "x"
    )
    assert a.equals(b)


def test_constant_group(ray_session):
    from maup_ray.ops.sketch import histogram_quantiles

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "x": pa.array([7.5, 7.5, 7.5, 1.0, 2.0]),
        }
    )
    out = histogram_quantiles(t, "k", "x")
    r = {row["k"]: row for row in out.to_pylist()}
    assert r[1]["p25"] == r[1]["p99"] == 7.5
    assert r[1]["n"] == 3


def test_nulls_skipped(ray_session):
    from maup_ray.ops.sketch import histogram_quantiles

    t = pa.table(
        {
            "k": pa.array([1] * 4, pa.int64()),
            "x": pa.array([1.0, None, 3.0, None]),
        }
    )
    out = histogram_quantiles(t, "k", "x")
    assert out.to_pylist()[0]["n"] == 2


def test_qs_mismatch_raises(ray_session):
    from maup_ray.ops.sketch import histogram_quantiles

    with pytest.raises(ValueError, match="mismatch"):
        histogram_quantiles(
            pa.table({"k": pa.array([1]), "x": pa.array([1.0])}),
            "k", "x", qs=((1, 2),), q_names=("a", "b"),
        )
