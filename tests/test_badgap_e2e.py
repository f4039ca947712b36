"""CO_bad_gap_region E2E (ref notebook cells 29-38): the real Colorado
2020 fixture whose gnarly 34M-unit gap adjoins 15 precincts. Heavy
(~2-6 min of pure-Python geometry) — gated behind GRAFT_SLOW=1; the
fast weld regression that this corpus exposed lives in test_geom.py."""

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("GRAFT_SLOW"),
    reason="slow real-corpus E2E (set GRAFT_SLOW=1)",
)


def test_bad_gap_smart_repair():
    from maup_ray.geom.core import area as parea
    from maup_ray.geom.wkb import decode_polygons
    from maup_ray.ops.repair import doctor
    from maup_ray.ops.smart_repair import smart_repair_table
    from maup_ray.sources import read_shapefile_zip

    t = read_shapefile_zip(
        "/root/reference/examples/Shapefiles/CO_bad_gap_region.zip"
    )
    t = t.select(["PRECID", "geometry"]).rename_columns(["id", "geometry"])
    pre = {
        i: parea(decode_polygons(b.as_py()))
        for i, b in zip(t["id"].to_pylist(), t["geometry"])
    }
    out = smart_repair_table(t, fill_gaps_threshold=None)
    post = {}
    for i, b in zip(out["id"].to_pylist(), out["geometry"]):
        blob = b.as_py()
        assert blob, f"precinct {i} lost its geometry"
        post[i] = parea(decode_polygons(blob))
    # the notebook's selling point: the gap splits among its adjoining
    # precincts (quick_repair gives it all to ONE) — here all 15 gain
    gainers = [i for i in post if post[i] > pre[i] + 1e-3]
    assert len(gainers) >= 10
    d = doctor(out)
    assert d["ok"], d
