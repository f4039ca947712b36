"""image_doctor: the multimodal corpus-consistency report."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from maup_ray.media.doctor import image_doctor
from maup_ray.synth.images import image_table


def _report(t):
    out = image_doctor(t)
    return dict(
        zip(out["check"].to_pylist(), out["value"].to_pylist())
    )


def test_clean_corpus_reports_zero_defects():
    rep = _report(image_table(96, png_every=8, jpeg_every=12))
    assert rep["n_rows"] == 96
    assert rep["fmt_raw"] + rep["fmt_png"] + rep["fmt_jpeg"] == 96
    assert rep["fmt_png"] == 12  # every 8th
    for k in (
        "fmt_other",
        "decode_fail",
        "dims_mismatch",
        "raw_len_mismatch",
        "phash_null",
        "caption_null",
        "caption_empty",
    ):
        assert rep[k] == 0, k
    assert rep["w_min"] == rep["w_max"] == 16
    assert rep["h_min"] == rep["h_max"] == 16


def test_planted_corruption_is_counted_not_raised():
    t = image_table(8)
    bad = pa.table(
        {
            "image_id": t["image_id"],
            "bytes": pa.array(
                # row 0: truncated raw; row 1: garbage png bytes;
                # rest untouched
                [b"\x00" * 10, b"not a png"]
                + t["bytes"].to_pylist()[2:],
                type=pa.binary(),
            ),
            "w": t["w"],
            "h": t["h"],
            "fmt": pa.array(
                ["raw", "png"] + t["fmt"].to_pylist()[2:]
            ),
            "caption": pa.array(
                [None, ""] + t["caption"].to_pylist()[2:]
            ),
            "phash": pa.array(
                [None] + t["phash"].to_pylist()[1:],
                type=pa.int64(),
            ),
        }
    )
    rep = _report(bad)
    assert rep["n_rows"] == 8
    assert rep["raw_len_mismatch"] == 1
    assert rep["decode_fail"] == 2  # bad reshape + bad png both throw
    assert rep["phash_null"] == 1
    assert rep["caption_null"] == 1
    assert rep["caption_empty"] == 1
    assert rep["fmt_other"] == 0


def test_unknown_format_counted():
    t = image_table(4)
    weird = t.set_column(
        t.column_names.index("fmt"),
        "fmt",
        pa.array(["webp", "raw", "raw", "raw"]),
    )
    rep = _report(weird)
    assert rep["fmt_other"] == 1
    assert rep["decode_fail"] == 0


def test_partition_invariant(ray_session):
    import ray.data

    t = image_table(64, png_every=8, jpeg_every=12)
    local = _report(t)
    for p in (2, 7):
        dist = image_doctor(
            ray.data.from_arrow(t).repartition(p)
        )
        got = dict(
            zip(
                dist["check"].to_pylist(),
                dist["value"].to_pylist(),
            )
        )
        assert got == local


def test_query_pinned(ray_session):
    from maup_ray.pipelines import q_image_doctor

    rep = dict(
        zip(
            *[
                q_image_doctor("/root/testdata/sf0.001")[c].to_pylist()
                for c in ("check", "value")
            ]
        )
    )
    assert rep == {
        "n_rows": 2000,
        "fmt_raw": 1667,
        "fmt_png": 250,
        "fmt_jpeg": 83,
        "fmt_other": 0,
        "decode_fail": 0,
        "dims_mismatch": 0,
        "raw_len_mismatch": 0,
        "phash_null": 0,
        "caption_null": 0,
        "caption_empty": 0,
        "w_min": 16,
        "w_max": 16,
        "h_min": 16,
        "h_max": 16,
    }
