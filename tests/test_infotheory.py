"""Information-theory statistics (ops/infotheory.py): brute-force
oracles for entropy / mutual information / chi-square, final-mode
equivalence, and the exact-int overflow fallback."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.ops.infotheory import (
    IT_SCALE_BITS,
    grouped_chi2,
    grouped_entropy,
    grouped_mutual_info,
    qlog_floor,
    _entropy_walk,
    _int64_entropy_safe,
)

SCALE = 1 << IT_SCALE_BITS


def _brute_entropy(cats) -> float:
    from collections import Counter

    c = Counter(cats)
    n = sum(c.values())
    return -sum(v / n * math.log(v / n) for v in c.values())


def _brute_mi(xs, ys) -> float:
    from collections import Counter

    n = len(xs)
    cxy = Counter(zip(xs, ys))
    cx = Counter(xs)
    cy = Counter(ys)
    return sum(
        c / n * math.log(n * c / (cx[x] * cy[y]))
        for (x, y), c in cxy.items()
    )


def _brute_chi2(xs, ys) -> float:
    from collections import Counter

    n = len(xs)
    cxy = Counter(zip(xs, ys))
    cx = Counter(xs)
    cy = Counter(ys)
    return sum(
        (c - cx[x] * cy[y] / n) ** 2 / (cx[x] * cy[y] / n)
        for (x, y), c in cxy.items()
    )


def _events(seed=7, n=4000, n_keys=11, n_types=5):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n_keys, n).astype(np.int64)
    # skewed category mix that VARIES by key (entropy differs per key)
    cats = np.array(
        [f"t{(k * 3 + v) % n_types}" for k, v in
         zip(keys, rng.integers(0, n_types, n) ** 2 % n_types)]
    )
    ys = np.array([f"s{v}" for v in rng.integers(0, 3, n)])
    return keys, cats, ys


def _collect(ds) -> pa.Table:
    import ray

    tabs = [ray.get(r) for r in ds.materialize().to_arrow_refs()]
    tabs = [t for t in tabs if t.num_rows] or tabs[:1]
    return pa.concat_tables(tabs).combine_chunks()


# ------------------------------------------------------------ entropy


def test_entropy_matches_brute(ray_session):
    import ray.data

    keys, cats, _ = _events()
    ds = ray.data.from_arrow(
        pa.table({"k": keys, "cat": cats})
    ).repartition(5)
    out = grouped_entropy(ds, "k", "cat", final="driver")
    got = {r["k"]: r["entropy"] for r in out.to_pylist()}
    ns = {r["k"]: r["n"] for r in out.to_pylist()}
    for k in sorted(set(keys.tolist())):
        mask = keys == k
        assert ns[k] == int(mask.sum())
        assert got[k] == pytest.approx(
            _brute_entropy(cats[mask].tolist()), abs=1e-6
        )


def test_entropy_extremes(ray_session):
    import ray.data

    tbl = pa.table(
        {
            "k": pa.array([0] * 8 + [1] * 8, type=pa.int64()),
            # key 0: uniform over 4 → ln 4; key 1: constant → 0
            "cat": ["a", "b", "c", "d"] * 2 + ["z"] * 8,
        }
    )
    out = grouped_entropy(
        ray.data.from_arrow(tbl), "k", "cat", final="driver"
    )
    got = {r["k"]: r["entropy"] for r in out.to_pylist()}
    assert got[0] == pytest.approx(math.log(4), abs=1e-8)
    assert got[1] == 0.0


def test_entropy_final_modes_agree(ray_session):
    import ray.data

    keys, cats, _ = _events(seed=13)
    ds = ray.data.from_arrow(
        pa.table({"k": keys, "cat": cats})
    ).repartition(7)
    drv = grouped_entropy(ds, "k", "cat", final="driver")
    shf = _collect(grouped_entropy(ds, "k", "cat", final="shuffle"))
    d = {r["k"]: (r["n"], r["entropy"]) for r in drv.to_pylist()}
    s = {r["k"]: (r["n"], r["entropy"]) for r in shf.to_pylist()}
    assert d == s  # bit-identical: exact-int numerators


def test_entropy_int64_fallback_exact():
    # counts big enough that c·q(c) would wrap int64: the walk must
    # route through Python ints and still be exact
    c = np.array([1 << 40, 1 << 40], dtype=np.int64)
    n = int(c.sum())
    assert not _int64_entropy_safe(n)
    tbl = pa.table(
        {
            "k": pa.array([0, 0], type=pa.int64()),
            "cat": ["a", "b"],
            "_c": pa.array(c),
        }
    )
    out = _entropy_walk(
        tbl, np.array([0], dtype=np.int64), "k", "cat", "n", "entropy"
    )
    q = lambda v: math.floor(math.log(float(v)) * SCALE)  # noqa: E731
    want = float(n * q(n) - 2 * ((1 << 40) * q(1 << 40))) / float(
        n * SCALE
    )
    assert out["entropy"][0].as_py() == want
    assert out["entropy"][0].as_py() == pytest.approx(
        math.log(2), abs=1e-8
    )


def test_qlog_floor_is_floor_not_round():
    # 211245 is the first half-way tie where round() diverges between
    # Python (half-even) and DuckDB (half-away); floor is tie-free
    v = np.array([211245], dtype=np.int64)
    assert qlog_floor(v)[0] == math.floor(
        math.log(211245.0) * SCALE
    )


# ------------------------------------------------------- mutual info


def test_mi_matches_brute(ray_session):
    import ray.data

    keys, xs, ys = _events(seed=3)
    ds = ray.data.from_arrow(
        pa.table({"k": keys, "x": xs, "y": ys})
    ).repartition(5)
    out = grouped_mutual_info(ds, "k", "x", "y", final="driver")
    got = {r["k"]: r["mi"] for r in out.to_pylist()}
    for k in sorted(set(keys.tolist())):
        mask = keys == k
        assert got[k] == pytest.approx(
            _brute_mi(xs[mask].tolist(), ys[mask].tolist()), abs=1e-6
        )


def test_mi_extremes(ray_session):
    import ray.data

    rng = np.random.default_rng(5)
    x = np.array([f"x{v}" for v in rng.integers(0, 4, 4096)])
    tbl = pa.table(
        {
            "k": pa.array(np.zeros(4096, dtype=np.int64)),
            "x": x,
            "y": x,  # perfect dependence: MI == H(x)
        }
    )
    ds = pytest.importorskip("ray.data").from_arrow(tbl)
    mi = grouped_mutual_info(ds, "k", "x", "y", final="driver")
    ent = grouped_entropy(
        ds.map_batches(lambda b: b.select(["k", "x"]).rename_columns(
            ["k", "cat"]), batch_format="pyarrow"),
        "k", "cat", final="driver",
    )
    assert mi["mi"][0].as_py() == pytest.approx(
        ent["entropy"][0].as_py(), abs=1e-7
    )
    # independence: product design x ⟂ y → MI ≈ 0
    xi = np.repeat(np.arange(4), 1024)
    yi = np.tile(np.arange(4), 1024)
    tbl2 = pa.table(
        {
            "k": pa.array(np.zeros(4096, dtype=np.int64)),
            "x": pa.array([f"x{v}" for v in xi]),
            "y": pa.array([f"y{v}" for v in yi]),
        }
    )
    mi2 = grouped_mutual_info(
        pytest.importorskip("ray.data").from_arrow(tbl2),
        "k", "x", "y", final="driver",
    )
    assert abs(mi2["mi"][0].as_py()) < 1e-6


def test_mi_final_modes_agree(ray_session):
    import ray.data

    keys, xs, ys = _events(seed=21)
    ds = ray.data.from_arrow(
        pa.table({"k": keys, "x": xs, "y": ys})
    ).repartition(6)
    drv = grouped_mutual_info(ds, "k", "x", "y", final="driver")
    shf = _collect(grouped_mutual_info(ds, "k", "x", "y", final="shuffle"))
    d = {r["k"]: (r["n"], r["mi"]) for r in drv.to_pylist()}
    s = {r["k"]: (r["n"], r["mi"]) for r in shf.to_pylist()}
    assert d == s


# --------------------------------------------------------- chi-square


def test_chi2_matches_brute(ray_session):
    import ray.data

    keys, xs, ys = _events(seed=9)
    ds = ray.data.from_arrow(
        pa.table({"k": keys, "x": xs, "y": ys})
    ).repartition(5)
    out = grouped_chi2(ds, "k", "x", "y", final="driver")
    for r in out.to_pylist():
        mask = keys == r["k"]
        want = _brute_chi2(xs[mask].tolist(), ys[mask].tolist())
        # floor-quantized: deterministic within cells·2^-30 of exact
        assert r["chi2"] == pytest.approx(want, abs=1e-6)
        m = min(r["r"] - 1, r["s"] - 1)
        if m >= 1:
            assert r["cramers_v"] == pytest.approx(
                math.sqrt(r["chi2"] / (r["n"] * m)), abs=0
            )


def test_chi2_single_category_null_v(ray_session):
    import ray.data

    tbl = pa.table(
        {
            "k": pa.array([0] * 6, type=pa.int64()),
            "x": ["a"] * 6,  # r = 1 → V undefined
            "y": ["p", "q", "p", "q", "p", "q"],
        }
    )
    out = grouped_chi2(
        ray.data.from_arrow(tbl), "k", "x", "y", final="driver"
    )
    r = out.to_pylist()[0]
    assert r["r"] == 1 and r["cramers_v"] is None
    assert r["chi2"] == pytest.approx(0.0, abs=1e-6)


def test_chi2_final_modes_agree(ray_session):
    import ray.data

    keys, xs, ys = _events(seed=17)
    ds = ray.data.from_arrow(
        pa.table({"k": keys, "x": xs, "y": ys})
    ).repartition(4)
    drv = grouped_chi2(ds, "k", "x", "y", final="driver")
    shf = _collect(grouped_chi2(ds, "k", "x", "y", final="shuffle"))
    d = {r["k"]: (r["n"], r["r"], r["s"], r["chi2"], r["cramers_v"])
         for r in drv.to_pylist()}
    s = {r["k"]: (r["n"], r["r"], r["s"], r["chi2"], r["cramers_v"])
         for r in shf.to_pylist()}
    assert d == s
