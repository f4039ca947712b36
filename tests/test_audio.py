"""Audio modality: from-scratch RIFF/WAV PCM16 codec + feature /
resample stages over a Ray Dataset of opaque binary payloads.

Same fidelity discipline as the image/video families: PCM16 is
lossless, so every decode must be byte/sample-exact; features are
exact int64 so they are pinned against brute-force numpy replicas."""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.media.audio import (
    audio_frame_features,
    decimated_checksum,
    resample_audio,
)
from maup_ray.media.wav import decode_wav, encode_wav
from maup_ray.synth.audio import (
    audio_dataset,
    audio_samples,
    gen_audio_batch,
    n_samples_for,
)


# ---------------------------------------------------------------- codec


def test_wav_round_trip_mono_exact():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, size=1001, dtype=np.int16)
    out, rate = decode_wav(encode_wav(s, 16000))
    assert rate == 16000
    assert out.shape == (1001, 1)
    assert (out[:, 0] == s).all()


def test_wav_round_trip_stereo_exact():
    rng = np.random.default_rng(8)
    s = rng.integers(-32768, 32768, size=(640, 2), dtype=np.int16)
    out, rate = decode_wav(encode_wav(s, 44100))
    assert rate == 44100
    assert (out == s).all()


def test_wav_encode_deterministic():
    s = audio_samples(3)
    assert encode_wav(s, 16000) == encode_wav(s.copy(), 16000)


def test_wav_odd_data_chunk_padded():
    # mono with odd sample count -> even data bytes; force odd via a
    # hand-built file with an odd-sized unknown chunk before data.
    s = np.arange(-5, 6, dtype=np.int16)
    base = encode_wav(s, 8000)
    # splice an odd-sized junk chunk right after the WAVE tag
    junk = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    body = base[12:]
    buf = b"RIFF" + struct.pack("<I", 4 + len(junk) + len(body)) + b"WAVE" + junk + body
    out, rate = decode_wav(buf)
    assert rate == 8000
    assert (out[:, 0] == s).all()


def test_wav_foreign_chunks_skipped():
    s = np.array([1, -2, 3, -4], dtype=np.int16)
    base = encode_wav(s, 8000)
    # LIST/fact chunks commonly appear before data in tool-written WAVs
    fact = b"fact" + struct.pack("<I", 4) + struct.pack("<I", 4)
    body = base[12:]
    buf = b"RIFF" + struct.pack("<I", 4 + len(fact) + len(body)) + b"WAVE" + fact + body
    out, _ = decode_wav(buf)
    assert (out[:, 0] == s).all()


def test_wav_rejects_non_pcm_and_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_wav(b"hello world!")
    s = np.zeros(4, dtype=np.int16)
    buf = bytearray(encode_wav(s, 8000))
    buf[20] = 3  # format tag -> IEEE float
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(buf))
    with pytest.raises(ValueError):
        encode_wav(np.zeros(4, dtype=np.float32), 8000)


# ------------------------------------------------------------- synth


def test_synth_batch_schema_and_lengths():
    t = gen_audio_batch(np.array([0, 1, 9], dtype=np.int64))
    assert t.column_names == ["audio_id", "bytes", "n_samples", "rate"]
    ns = n_samples_for(np.array([0, 1, 9]))
    assert t["n_samples"].to_pylist() == ns.astype(int).tolist()
    for row, n in zip(t["bytes"], ns):
        s, rate = decode_wav(row.as_py())
        assert rate == 16000 and len(s) == n


# ------------------------------------------------------------- stages


def _brute_features(ids, frame):
    rows = []
    for k in ids:
        m = audio_samples(k).astype(np.int64)
        nf = len(m) // frame
        flips = np.concatenate([[False], (m[:-1] * m[1:]) < 0])
        for f in range(nf):
            seg = m[f * frame : (f + 1) * frame]
            rows.append(
                (
                    k,
                    f,
                    int((seg * seg).sum()),
                    int(flips[f * frame : (f + 1) * frame].sum()),
                )
            )
    return rows


def test_frame_features_match_brute(ray_session):
    ids = list(range(12))
    ds = audio_dataset(len(ids), override_num_blocks=3)
    got = audio_frame_features(ds, frame=256).to_pandas()
    got = got.sort_values(["audio_id", "frame"]).reset_index(drop=True)
    want = _brute_features(ids, 256)
    assert list(map(tuple, got.itertuples(index=False))) == want


def test_resample_then_checksum_matches_direct(ray_session):
    ids = list(range(10))
    ds = audio_dataset(len(ids), override_num_blocks=2)
    got = decimated_checksum(resample_audio(ds, 4)).to_pandas()
    got = got.sort_values("audio_id").reset_index(drop=True)
    for _, row in got.iterrows():
        m = audio_samples(int(row.audio_id)).astype(np.int64)[::4]
        assert row.n_out == len(m)
        assert row.psum == int(
            (m * np.arange(1, len(m) + 1, dtype=np.int64)).sum()
        )


def test_resample_output_composes_with_features(ray_session):
    # resample_audio's output schema feeds audio_frame_features directly
    ds = resample_audio(audio_dataset(4, override_num_blocks=2), 2)
    out = audio_frame_features(ds, frame=128).to_pandas()
    m0 = audio_samples(0).astype(np.int64)[::2]
    seg = m0[:128]
    row = out[(out.audio_id == 0) & (out.frame == 0)].iloc[0]
    assert row.energy == int((seg * seg).sum())


def test_features_skip_short_tail(ray_session):
    # a recording shorter than one frame emits no rows
    t = gen_audio_batch(np.array([5], dtype=np.int64))
    ds_small = audio_frame_features(
        _as_dataset(t), frame=1 << 20
    ).to_pandas()
    assert len(ds_small) == 0


def _as_dataset(t: pa.Table):
    import ray.data

    return ray.data.from_arrow(t)


# --------------------------------------------------------- near-dup


def test_dup_samples_perturbed_not_identical():
    from maup_ray.synth.audio import dup_samples

    base = dup_samples(8, 4)
    mem = dup_samples(9, 4)
    n = min(len(base), len(mem))
    assert (base[:n] != mem[:n]).any()  # not byte-identical
    # perturbation is ±1 on a sparse stride
    d = np.abs(base[:n].astype(np.int32) - mem[:n].astype(np.int32))
    assert d.max() == 1 and (d > 0).sum() <= n // 997 + 1


def test_fingerprint_stable_within_class(ray_session):
    from maup_ray.media.audio import audio_fingerprint
    from maup_ray.synth.audio import audio_dataset

    sigs = (
        audio_fingerprint(audio_dataset(16, dup_group=4))
        .to_pandas()
        .sort_values("audio_id")
    )
    by_class = sigs.groupby(sigs.audio_id // 4).sig.nunique()
    assert (by_class == 1).all()  # members share the signature
    # distinct classes land on distinct signatures
    assert sigs.groupby(sigs.audio_id // 4).sig.first().nunique() == 4


def test_audio_near_dup_clusters(ray_session):
    from maup_ray.media.audio import audio_near_dup
    from maup_ray.synth.audio import audio_dataset

    out = (
        audio_near_dup(audio_dataset(24, dup_group=4))
        .to_pandas()
        .sort_values("audio_id")
        .reset_index(drop=True)
    )
    # every row belongs to the cluster anchored at its class base
    assert (out.cluster_id == (out.audio_id // 4) * 4).all()
    assert len(out) == 24  # all rows are members of some dup class
