"""Video frame-sampling: from-scratch AVI container (MJPEG + DIB
codecs) + FrameSampleStage over a Ray Dataset.

Fidelity discipline (FIXTURES.md F8): DIB rows are lossless so
sampled frames must be byte-equal to the regenerated source frame;
MJPG rows are lossy under the PSNR≥40dB invariant."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.media.avi import (
    AviInfo,
    decode_avi_frame,
    encode_avi,
    parse_avi,
)
from maup_ray.media.image import FrameSampleStage
from maup_ray.synth.videos import (
    gen_video_batch,
    gen_video_frame,
    video_dataset,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def test_dib_round_trip_byte_exact():
    frames = [gen_video_frame(7, t, 16, 16) for t in range(5)]
    buf = encode_avi(frames, fps=24, codec="DIB ")
    info = parse_avi(buf)
    assert (info.w, info.h, info.codec, info.n_frames) == (16, 16, "DIB", 5)
    assert info.fps == pytest.approx(24.0, rel=0.05)
    for t in range(5):
        assert (decode_avi_frame(buf, info, t) == frames[t]).all()


def test_dib_odd_width_row_padding():
    # stride 15*3=45 pads to 48: the un-pad path must discard pad bytes
    frames = [gen_video_frame(2, t, 15, 9) for t in range(3)]
    buf = encode_avi(frames, codec="DIB ")
    info = parse_avi(buf)
    for t in range(3):
        assert (decode_avi_frame(buf, info, t) == frames[t]).all()


def test_mjpg_round_trip_psnr():
    frames = [gen_video_frame(3, t, 16, 16) for t in range(6)]
    buf = encode_avi(frames, fps=30, codec="MJPG")
    info = parse_avi(buf)
    assert info.codec == "MJPG" and info.n_frames == 6
    for t in range(6):
        assert _psnr(decode_avi_frame(buf, info, t), frames[t]) >= 40.0


def test_parse_rejects_non_avi_and_unknown_codec():
    with pytest.raises(ValueError):
        parse_avi(b"not a riff file at all....")
    # hand-build a minimal AVI-shaped header claiming H264
    frames = [gen_video_frame(0, 0, 8, 8)]
    buf = bytearray(encode_avi(frames, codec="MJPG"))
    i = bytes(buf).find(b"MJPG")  # strh handler fourcc (first hit)
    buf[i : i + 4] = b"H264"
    with pytest.raises(NotImplementedError):
        parse_avi(bytes(buf))


def test_frame_sample_every_n():
    tbl = gen_video_batch(np.arange(4), n_frames=10, mjpg_every=0)
    out = FrameSampleStage(every_n=3)(tbl)
    # frames 0,3,6,9 per video
    assert out.num_rows == 4 * 4
    per = out.to_pandas().groupby("video_id")["frame_idx"].apply(list)
    for idxs in per:
        assert idxs == [0, 3, 6, 9]
    assert set(out["fmt"].to_pylist()) == {"raw"}
    # byte-exact fidelity vs regenerated frames (DIB rows)
    df = out.to_pandas()
    for _, r in df.iterrows():
        vid = int(r["video_id"][3:])
        exp = gen_video_frame(vid, int(r["frame_idx"]), 16, 16)
        got = np.frombuffer(r["bytes"], dtype=np.uint8).reshape(16, 16, 3)
        assert (got == exp).all()


def test_frame_sample_uniform_k():
    tbl = gen_video_batch(np.arange(2), n_frames=9, mjpg_every=0)
    out = FrameSampleStage(uniform_k=3)(tbl)
    per = out.to_pandas().groupby("video_id")["frame_idx"].apply(list)
    for idxs in per:
        assert len(idxs) == 3 and idxs[0] == 0 and idxs[-1] < 9


def test_frame_sample_mixed_codecs_psnr():
    # default synth mixes DIB and MJPG rows in one batch
    tbl = gen_video_batch(np.arange(4), n_frames=6, mjpg_every=2)
    assert set(tbl["codec"].to_pylist()) == {"DIB", "MJPG"}
    out = FrameSampleStage(every_n=2)(tbl).to_pandas()
    for _, r in out.iterrows():
        vid = int(r["video_id"][3:])
        exp = gen_video_frame(vid, int(r["frame_idx"]), 16, 16)
        got = np.frombuffer(r["bytes"], dtype=np.uint8).reshape(16, 16, 3)
        assert _psnr(got, exp) >= 40.0


def test_frame_sample_dataset_pipeline(ray_session):
    """E2E through Ray Data: synth videos → actor-style stage →
    (video_id, frame_idx, ...) rows with a stable schema."""
    ds = video_dataset(6, n_frames=8, override_num_blocks=2)
    out = ds.map_batches(
        FrameSampleStage(every_n=4),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    tbl = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    )
    assert tbl.num_rows == 6 * 2  # frames 0 and 4
    assert tbl.schema.names == [
        "video_id",
        "frame_idx",
        "bytes",
        "w",
        "h",
        "fmt",
    ]
    assert tbl.schema.field("frame_idx").type == pa.int32()


class TestVideoNearDup:
    def test_signature_deterministic_and_codec_robust(self):
        from maup_ray.media.image import VideoSignatureStage
        from maup_ray.media.avi import encode_avi
        from maup_ray.synth.videos import gen_video_frame

        frames = [gen_video_frame(5, t, 16, 16) for t in range(6)]
        stage = VideoSignatureStage(every_n=2)
        rows = []
        for codec in ("DIB ", "MJPG"):
            buf = encode_avi(frames, codec=codec)
            tbl = pa.table(
                {
                    "video_id": pa.array([codec.strip()]),
                    "bytes": pa.array([buf], type=pa.binary()),
                    "fmt": pa.array(["avi"]),
                }
            )
            rows.append(stage(tbl))
        dib, mjpg = rows
        # same content through lossless and lossy codecs → hamming
        # distance of the majority signature stays tiny
        a = np.uint64(np.int64(dib["vsig"][0].as_py()))
        b = np.uint64(np.int64(mjpg["vsig"][0].as_py()))
        ham = bin(int(a ^ b)).count("1")
        assert ham <= 3

    def test_clusters_group_phash_equal_videos(self, ray_session):
        from maup_ray.media.image import video_near_dup
        from maup_ray.synth.videos import video_dataset

        out = (
            video_near_dup(video_dataset(24, n_frames=6), every_n=2)
            .to_pandas()
            .sort_values("video_id")
        )
        # the synthetic family differs only by per-id luminance
        # offsets → signature-equal classes exist; every cluster_id is
        # the smallest member of its cluster
        assert len(out) > 0
        for cl, grp in out.groupby("cluster_id"):
            assert cl == grp["video_id"].min()
            assert len(grp) >= 2


class TestSceneCuts:
    def test_planted_cut_found(self):
        from maup_ray.media.avi import encode_avi
        from maup_ray.media.cuts import scene_cut_stats
        from maup_ray.synth.videos import gen_video_frame

        # segment A (scroll of vid 1) then a HARD cut to segment B
        # (vid 999 content) — exactly one above-threshold pair
        a = [gen_video_frame(1, t) for t in range(4)]
        b = [gen_video_frame(999, t) for t in range(3)]
        buf = encode_avi(a + b, fps=30, codec="DIB ")
        tbl = pa.table(
            {
                "video_id": pa.array(["x"], type=pa.string()),
                "bytes": pa.array([buf], type=pa.binary()),
            }
        )
        # scroll pairs have small constant diff; the cut pair is huge
        # scroll pairs sit at a constant 78/px (base cancels in the
        # difference); the cross-content cut measures ~124/px
        out = scene_cut_stats(tbl, threshold_per_px=100).to_pylist()[0]
        assert out["n_cuts"] == 1
        assert out["max_diff_sum"] > out["min_diff_sum"]

    def test_scroll_corpus_constant_diffs(self, ray_session):
        from maup_ray.media.cuts import scene_cut_stats
        from maup_ray.synth.videos import video_dataset

        out = scene_cut_stats(video_dataset(12, n_frames=6))
        rows = out.to_pandas().to_dict("records")
        assert len(rows) == 12
        for r in rows:
            if r["video_id"].endswith(("1", "3", "5", "7", "9")) and \
               int(r["video_id"][3:]) % 2 == 1:
                continue  # MJPG rows carry lossy noise
            # lossless DIB scroll: cyclic shift => constant pair diff
            assert r["max_diff_sum"] == r["min_diff_sum"]
            assert r["n_cuts"] == 0
