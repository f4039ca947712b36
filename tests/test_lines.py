"""segment_zonal_length (ops/lines.py): numpy brute force on random
rect sets, boundary / degenerate behavior."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _rects_table(rects):
    r = np.asarray(rects, dtype=np.float64)
    return pa.table(
        {
            "district_id": pa.array(
                np.arange(len(r), dtype=np.int64)
            ),
            "minx": pa.array(r[:, 0]),
            "miny": pa.array(r[:, 1]),
            "maxx": pa.array(r[:, 2]),
            "maxy": pa.array(r[:, 3]),
        }
    )


def _brute(segs, rects):
    out = {}
    for i, (mnx, mny, mxx, mxy) in enumerate(rects):
        tot, n = 0, 0
        for y, x0, x1 in segs:
            if mny < y < mxy:
                ov = min(x1, mxx) - max(x0, mnx)
                if ov > 0:
                    tot += int(ov)
                    n += 1
        if n:
            out[i] = (tot, n)
    return out


@pytest.mark.parametrize("seed", [0, 3])
def test_matches_brute(ray_session, seed):
    import ray.data

    from maup_ray.ops.lines import segment_zonal_length

    rng = np.random.RandomState(seed)
    rects = []
    for _ in range(12):
        x0, y0 = rng.randint(0, 900, 2)
        rects.append((x0, y0, x0 + rng.randint(50, 200),
                      y0 + rng.randint(50, 200)))
    segs = []
    for _ in range(300):
        y = int(rng.randint(0, 1100)) + 0.5
        x0 = int(rng.randint(0, 1000))
        segs.append((y, x0, x0 + int(rng.randint(1, 400))))
    s = np.asarray(segs, dtype=np.float64)
    ds = ray.data.from_arrow(
        pa.table(
            {"y": pa.array(s[:, 0]), "x0": pa.array(s[:, 1]),
             "x1": pa.array(s[:, 2])}
        )
    ).repartition(5)
    got = segment_zonal_length(ds, _rects_table(rects))
    gd = {
        r["district_id"]: (r["road_len"], r["n_segs"])
        for r in got.to_pylist()
    }
    assert gd == _brute(segs, rects)


def test_boundary_segments_excluded(ray_session):
    import ray.data

    from maup_ray.ops.lines import segment_zonal_length

    # y exactly on the shared edge of two stacked rects: the overlay
    # contract is off-lattice y, but the op's strict compare must not
    # double-count a boundary line
    rects = _rects_table([(0, 0, 100, 50), (0, 50, 100, 100)])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "y": pa.array([50.0, 49.5, 50.5]),
                "x0": pa.array([0.0, 0.0, 0.0]),
                "x1": pa.array([100.0, 10.0, 20.0]),
            }
        )
    )
    got = {
        r["district_id"]: (r["road_len"], r["n_segs"])
        for r in segment_zonal_length(ds, rects).to_pylist()
    }
    assert got == {0: (10, 1), 1: (20, 1)}


def test_x_disjoint_not_counted(ray_session):
    import ray.data

    from maup_ray.ops.lines import segment_zonal_length

    rects = _rects_table([(100, 0, 200, 100)])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "y": pa.array([10.5, 10.5]),
                "x0": pa.array([0.0, 190.0]),
                "x1": pa.array([100.0, 300.0]),  # [0,100] only touches
            }
        )
    )
    got = segment_zonal_length(ds, rects).to_pylist()
    assert got == [
        {"district_id": 0, "road_len": 10, "n_segs": 1}
    ]
