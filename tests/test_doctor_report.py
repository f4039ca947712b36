"""Doctor printed-report parity (ref repair.py:331-363, silent=False)
and smart_repair geographic-CRS rejection (ref smart_repair.py:116-120)
— the two r4 verdict parity gaps."""

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.geom import encode_polygon


def sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]],
                    dtype=float)


def tbl(ids, rings):
    return pa.table(
        {
            "id": ids,
            "geometry": pa.array(
                [encode_polygon([r]) for r in rings], type=pa.binary()
            ),
        }
    )


class TestDoctorReport:
    def test_report_lines(self, capsys):
        from maup_ray.ops.repair import doctor

        # two overlapping squares → 1 overlap; square ring of four
        # tiles around an uncovered centre → 1 hole
        t = tbl(
            [0, 1, 2, 3],
            [
                sq(0, 0, 20, 20),
                sq(10, 0, 30, 20),   # overlaps 0
                sq(0, 20, 30, 40),
                sq(30, 0, 60, 40),
            ],
        )
        checks = doctor(t, silent=False)
        out = capsys.readouterr().out
        assert f"There are {checks['n_overlaps']} overlaps." in out
        assert checks["n_overlaps"] >= 1
        assert not checks["ok"]

    def test_silent_default_prints_nothing(self, capsys):
        from maup_ray.ops.repair import doctor

        t = tbl([0, 1], [sq(0, 0, 10, 10), sq(10, 0, 20, 10)])
        checks = doctor(t)
        assert capsys.readouterr().out == ""
        assert checks["ok"]

    def test_union_mismatch_line(self, capsys):
        from maup_ray.ops.repair import doctor

        s = tbl([0], [sq(0, 0, 10, 10)])
        g = tbl([0], [sq(0, 0, 12, 10)])
        checks = doctor(s, target=g, silent=False)
        out = capsys.readouterr().out
        assert "The unions of target and source differ!" in out
        assert not checks["ok"]


class TestSmartRepairCrsGuard:
    def test_geographic_crs_raises(self):
        from maup_ray.crs import set_crs
        from maup_ray.ops.smart_repair import smart_repair

        t = set_crs(
            tbl([0, 1], [sq(0, 0, 10, 10), sq(10, 0, 20, 10)]),
            "EPSG:4326",
        )
        with pytest.raises(TypeError, match="projected"):
            smart_repair(t)

    def test_projected_crs_passes(self):
        from maup_ray.crs import set_crs
        from maup_ray.ops.smart_repair import smart_repair

        t = set_crs(
            tbl([0, 1], [sq(0, 0, 10, 10), sq(10, 0, 20, 10)]),
            "EPSG:3857",
        )
        out = smart_repair(t)
        assert out.num_rows == 2

    def test_crsless_passes(self):
        from maup_ray.ops.smart_repair import smart_repair

        t = tbl([0, 1], [sq(0, 0, 10, 10), sq(10, 0, 20, 10)])
        assert smart_repair(t).num_rows == 2
