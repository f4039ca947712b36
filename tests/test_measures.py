"""Shape measures (ops/measures): analytic fixtures + exact-rational
reference parity + the perimeter summation-order discipline the
`compactness` oracle relies on."""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.geom.wkb import encode_multipolygon
from maup_ray.ops.measures import geom_measures, polygon_measures


def sq(x0, y0, s):
    return np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]],
        dtype=np.float64,
    )


def test_unit_square():
    a, cx, cy, p, pp = geom_measures([[sq(0, 0, 10)]])
    assert a == 100.0 and cx == 5.0 and cy == 5.0 and p == 40.0
    assert pp == 4.0 * math.pi * 100.0 / (40.0 * 40.0)  # = π/4


def test_square_with_hole_centroid_shifts():
    # 10-square with a 2-hole off-centre: centroid moves away from it
    shell = sq(0, 0, 10)
    hole = sq(1, 1, 2)[::-1]  # CW
    a, cx, cy, p, pp = geom_measures([[shell, hole]])
    assert a == 96.0
    # exact moment arithmetic: (100*5 - 4*2) / 96
    assert cx == (100 * 5 - 4 * 2) / 96
    assert cy == cx
    assert p == 40.0 + 8.0


def test_multipolygon_accumulates():
    a, cx, cy, p, _ = geom_measures([[sq(0, 0, 2)], [sq(10, 0, 2)]])
    assert a == 8.0 and p == 16.0
    assert cx == (4 * 1 + 4 * 11) / 8 and cy == 1.0


def test_degenerate_is_nan():
    a, cx, cy, p, pp = geom_measures([[np.zeros((2, 2))]])
    assert a == 0.0 and math.isnan(cx) and math.isnan(pp)


def _bumped(S, h):
    h1, h2, h3, h4 = h
    return np.array(
        [
            [0, 0],
            [S // 2, -h1],
            [S, 0],
            [S + h2, S // 2],
            [S, S],
            [S // 2, S + h3],
            [0, S],
            [-h4, S // 2],
        ],
        dtype=np.float64,
    )


def exact_reference(ring: np.ndarray):
    """Fraction shoelace moments + left-to-right float perimeter — the
    bit-level semantics the oracle mirrors."""
    P = [(Fraction(int(x)), Fraction(int(y))) for x, y in ring]
    n = len(P)
    a2 = sx = sy = Fraction(0)
    perim = 0.0
    for i in range(n):
        (xi, yi), (xj, yj) = P[i], P[(i + 1) % n]
        c = xi * yj - xj * yi
        a2 += c
        sx += (xi + xj) * c
        sy += (yi + yj) * c
        perim = perim + math.sqrt(int((xj - xi) ** 2 + (yj - yi) ** 2))
    area = float(int(a2)) / 2.0
    cx = float(int(sx)) / float(int(3 * a2))
    cy = float(int(sy)) / float(int(3 * a2))
    pp = 4.0 * math.pi * area / (perim * perim)
    return area, cx, cy, perim, pp


@pytest.mark.parametrize("h", [(0, 0, 0, 0), (1, 2, 3, 4), (5, 5, 5, 5),
                               (3, 0, 5, 2), (2, 4, 1, 0)])
def test_bumped_square_matches_exact_reference(h):
    ring = _bumped(120, h)
    got = geom_measures([[ring]])
    want = exact_reference(ring)
    assert got == want  # bit-level, incl. the sqrt-sum order


@pytest.mark.parametrize("seed", range(6))
def test_random_lattice_polygon_matches_reference(seed):
    rng = np.random.default_rng(seed)
    # star-shaped lattice polygon around the origin: sorted angles
    n = int(rng.integers(4, 12))
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.integers(5, 60, n)
    ring = np.column_stack(
        [np.round(rad * np.cos(ang)), np.round(rad * np.sin(ang))]
    ).astype(np.float64)
    # drop consecutive duplicates the rounding may create
    keep = np.ones(n, dtype=bool)
    keep[1:] = np.any(ring[1:] != ring[:-1], axis=1)
    ring = ring[keep]
    if len(ring) < 3 or exact_reference(ring)[0] == 0:
        pytest.skip("degenerate draw")
    assert geom_measures([[ring]]) == exact_reference(ring)


def test_polygon_measures_table():
    t = pa.table(
        {
            "doc_id": pa.array([7, 8]),
            "geometry": pa.array(
                [
                    encode_multipolygon([[sq(0, 0, 10)]]),
                    encode_multipolygon([[_bumped(120, (5, 5, 5, 5))]]),
                ],
                pa.binary(),
            ),
        }
    )
    out = polygon_measures(t)
    assert out.column_names == ["doc_id", "area", "cx", "cy", "perim",
                                "polsby"]
    assert out["area"].to_pylist() == [
        100.0,
        exact_reference(_bumped(120, (5, 5, 5, 5)))[0],
    ]


def test_polygon_measures_dataset(ray_session):
    import ray

    rows = [encode_multipolygon([[sq(0, 0, k + 1)]]) for k in range(6)]
    t = pa.table(
        {"doc_id": pa.array(range(6)),
         "geometry": pa.array(rows, pa.binary())}
    )
    out = polygon_measures(ray.data.from_arrow(t).repartition(2))
    df = out.to_pandas().sort_values("doc_id")
    assert df["area"].tolist() == [(k + 1) ** 2 for k in range(6)]
    assert df["perim"].tolist() == [4.0 * (k + 1) for k in range(6)]
