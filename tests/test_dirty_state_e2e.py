"""Synthetic dirty-state repair E2E — the MI.zip-analog gate.

The reference's big-corpus repair test (ref tests/test_repair.py:10-51)
runs doctor + repair on a large dirty state shapefile that is absent
from this snapshot (.MISSING_LARGE_BLOBS). This is the equivalent
synthetic corpus: a 16×16 jittered tessellation (overlaps + gaps on
every internal boundary) with planted self-intersecting bowtie rings,
repaired on the DISTRIBUTED smart_repair path (Dataset + regions →
per-region map over an actor-free task pool) and health-checked with
the local doctor. Gated behind GRAFT_SLOW=1 like the Denver E2E.
"""

import os

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("GRAFT_SLOW"),
    reason="slow synthetic dirty-state E2E (set GRAFT_SLOW=1)",
)

K = 16  # 256 parcels
N_REGIONS = 4  # 4×4 region grid → 16 independent repair groups


def _dirty_state(k=K, seed=7, amp=0.03):
    from maup_ray.geom.wkb import encode_polygon

    rng = np.random.RandomState(seed)
    ids, geoms = [], []
    for x in range(k):
        for y in range(k):
            d = rng.uniform(-amp, amp)
            ring = np.array(
                [
                    [x - d, y - d],
                    [x + 1 + d, y - d],
                    [x + 1 + d, y + 1 + d],
                    [x - d, y + 1 + d],
                ]
            )
            if (x * k + y) % 53 == 13:  # planted bowties
                ring = np.array(
                    [[x, y], [x + 1 + d, y + 1 + d], [x + 1 + d, y],
                     [x, y + 1 + d]]
                )
            ids.append(f"p{x:02d}{y:02d}")
            geoms.append(encode_polygon([ring]))
    return pa.table(
        {"id": ids, "geometry": pa.array(geoms, type=pa.binary())}
    )


def _regions(k=K, r=N_REGIONS):
    from maup_ray.geom.wkb import encode_polygon

    step = k / r
    ids, geoms = [], []
    for i in range(r):
        for j in range(r):
            ring = np.array(
                [
                    [i * step, j * step],
                    [(i + 1) * step, j * step],
                    [(i + 1) * step, (j + 1) * step],
                    [i * step, (j + 1) * step],
                ]
            )
            ids.append(f"r{i}{j}")
            geoms.append(encode_polygon([ring]))
    return pa.table(
        {"region_id": ids, "geometry": pa.array(geoms, type=pa.binary())}
    )


class TestDirtyStateE2E:
    def test_distributed_smart_repair_heals_state_corpus(
        self, ray_session
    ):
        import ray
        import ray.data

        from maup_ray.geom.core import area as parea
        from maup_ray.geom.wkb import decode_polygons
        from maup_ray.ops.repair import doctor, union_all_table
        from maup_ray.ops.smart_repair import smart_repair

        t = _dirty_state()
        pre = doctor(t)
        assert not pre["ok"]
        assert pre["n_overlaps"] > 400  # every jittered boundary
        assert pre["n_gaps"] > 40
        union_in = parea(union_all_table(t))

        ds = ray.data.from_arrow(t).repartition(8)
        fixed_ds = smart_repair(ds, regions=_regions())
        fixed = pa.concat_tables(
            [
                b
                for b in (
                    ray.get(r)
                    for r in fixed_ds.materialize().to_arrow_refs()
                )
                if b.num_rows
            ]
        )
        # every parcel comes back, exactly once
        assert sorted(fixed["id"].to_pylist()) == sorted(
            t["id"].to_pylist()
        )
        post = doctor(fixed, accept_holes=True)
        assert post["n_overlaps"] == 0
        assert post["ok"]
        # gaps can only shrink (non-simply-connected ones are refused
        # by reference drop_bad_holes semantics, never grown)
        assert post["n_gaps"] < pre["n_gaps"]
        # output covers (almost) the input union: nothing invented,
        # only refused gaps missing
        total_out = sum(
            parea(decode_polygons(b.as_py()))
            for b in fixed["geometry"]
            if len(b.as_py())
        )
        assert total_out <= union_in + 1e-6
        assert total_out >= union_in - 3.0  # refused-gap budget
