"""Audio feature / transform stages over opaque WAV binary columns.

Same discipline as the image stages (media/image.py): the payload is
decoded INSIDE the map_batches stage and never leaves it — only tiny
typed feature rows ship. The per-row Python loop is confined to the
container decode (inherent for per-row binary payloads); all
per-sample work is vectorized numpy over the decoded int16 buffer.

Exactness: samples are int16, energies are Σv² ≤ 2^30·frame and
crossing counts ≤ frame — everything stays exact int64, so the
SQL-oracled queries match bit for bit.

Scale notes (100 TB): stages are stateless task-mode map_batches
(no model state → no actor pool needed); batch sizes should be set
by payload bytes, not row count, for long recordings. Decode of one
row is independent of all others — shard-parallel with no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .wav import decode_wav, encode_wav

__all__ = [
    "audio_frame_features",
    "resample_audio",
    "decimated_checksum",
    "audio_fingerprint",
    "audio_near_dup",
]

FP_SEGMENTS = 64  # fingerprint segments (one bit per segment)
FP_WINDOW = 2048  # samples covered by the fingerprint (min row length)

_FEAT_SCHEMA = pa.schema(
    [
        ("audio_id", pa.int64()),
        ("frame", pa.int64()),
        ("energy", pa.int64()),
        ("crossings", pa.int64()),
    ]
)


def _mono(buf) -> np.ndarray:
    s, _rate = decode_wav(
        buf.as_py() if hasattr(buf, "as_py") else bytes(buf)
    )
    return s[:, 0]


def audio_frame_features(ds, frame: int = 256, bytes_col: str = "bytes",
                         id_col: str = "audio_id"):
    """Per-frame energy + zero-crossing rows: ``(audio_id, frame,
    energy, crossings)`` over full frames only (tail samples past the
    last full frame are dropped).

    ``energy[f] = Σ v[i]²`` over frame f's samples; ``crossings[f]``
    counts sign flips ``v[i−1]·v[i] < 0`` attributed to the frame of
    ``i`` (so a flip across a frame boundary belongs to the LATER
    frame — mirrored by the oracle's ``i // frame`` grouping)."""
    F = int(frame)

    def stage(batch: pa.Table) -> pa.Table:
        ids_out, fr_out, en_out, cr_out = [], [], [], []
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        for k, buf in zip(ids, batch[bytes_col]):
            m = _mono(buf).astype(np.int64)
            nf = len(m) // F
            if nf == 0:
                continue
            v = m[: nf * F].reshape(nf, F)
            en = (v * v).sum(axis=1)
            flips = np.concatenate(
                [[False], (m[:-1] * m[1:]) < 0]
            )[: nf * F]
            cr = flips.reshape(nf, F).sum(axis=1)
            ids_out.append(np.full(nf, k, dtype=np.int64))
            fr_out.append(np.arange(nf, dtype=np.int64))
            en_out.append(en)
            cr_out.append(cr.astype(np.int64))
        if not ids_out:
            return _FEAT_SCHEMA.empty_table()
        return pa.table(
            {
                "audio_id": pa.array(np.concatenate(ids_out)),
                "frame": pa.array(np.concatenate(fr_out)),
                "energy": pa.array(np.concatenate(en_out)),
                "crossings": pa.array(np.concatenate(cr_out)),
            },
            schema=_FEAT_SCHEMA,
        )

    return ds.map_batches(
        stage, batch_format="pyarrow", zero_copy_batch=True
    )


def resample_audio(ds, factor: int, bytes_col: str = "bytes",
                   id_col: str = "audio_id"):
    """Stride-decimate each recording by ``factor`` (keep samples
    0, k, 2k, …) and re-encode as WAV at rate/factor — the output rows
    carry the same schema shape as the input (id, bytes, n_samples,
    rate), so stages compose."""
    k = int(factor)
    if k < 1:
        raise ValueError("factor must be >= 1")

    def stage(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_bytes, out_n, out_rate = [], [], []
        for buf in batch[bytes_col]:
            s, rate = decode_wav(
                buf.as_py() if hasattr(buf, "as_py") else bytes(buf)
            )
            d = np.ascontiguousarray(s[::k])
            out_bytes.append(encode_wav(d, rate // k))
            out_n.append(len(d))
            out_rate.append(rate // k)
        return pa.table(
            {
                "audio_id": pa.array(ids, type=pa.int64()),
                "bytes": pa.array(out_bytes, type=pa.binary()),
                "n_samples": pa.array(
                    np.asarray(out_n, dtype=np.int32), type=pa.int32()
                ),
                "rate": pa.array(
                    np.asarray(out_rate, dtype=np.int32),
                    type=pa.int32(),
                ),
            }
        )

    return ds.map_batches(
        stage, batch_format="pyarrow", zero_copy_batch=True
    )


def decimated_checksum(ds, bytes_col: str = "bytes",
                       id_col: str = "audio_id"):
    """Order-independent exact checksum rows per recording:
    ``(audio_id, n_out, psum)`` with ``psum = Σ (j+1)·v[j]`` over the
    decoded samples — position-weighted so sample ORDER is pinned by
    the value, yet the aggregate itself is one exact int64 sum."""

    def stage(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n_out = np.empty(len(ids), dtype=np.int64)
        psum = np.empty(len(ids), dtype=np.int64)
        for r, buf in enumerate(batch[bytes_col]):
            m = _mono(buf).astype(np.int64)
            n_out[r] = len(m)
            psum[r] = int(
                (m * np.arange(1, len(m) + 1, dtype=np.int64)).sum()
            )
        return pa.table(
            {
                "audio_id": pa.array(ids, type=pa.int64()),
                "n_out": pa.array(n_out),
                "psum": pa.array(psum),
            }
        )

    return ds.map_batches(
        stage, batch_format="pyarrow", zero_copy_batch=True
    )


def audio_fingerprint(ds, bytes_col: str = "bytes",
                      id_col: str = "audio_id"):
    """64-bit energy-contour fingerprint rows ``(audio_id, sig)`` —
    the audio sibling of the image phash: the first ``FP_WINDOW``
    samples split into ``FP_SEGMENTS`` equal segments, exact int64
    energy per segment, bit k = ``e[k] > e[(k+1) % 64]``. Robust to
    small amplitude perturbations (a ±1 sample change moves a segment
    energy by ~2·|v| ≪ typical inter-segment gaps) while unrelated
    recordings land on independent 64-bit patterns.

    Recordings shorter than ``FP_WINDOW`` are zero-padded (trailing
    empty segments hash deterministically). The signature is int64
    (the uint64 bit pattern viewed signed) to match the engine's
    signature_near_dup / hamming_candidates conventions."""
    seg = FP_WINDOW // FP_SEGMENTS
    shifts = np.arange(FP_SEGMENTS, dtype=np.uint64)

    def stage(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sigs = np.empty(len(ids), dtype=np.int64)
        for r, buf in enumerate(batch[bytes_col]):
            m = _mono(buf).astype(np.int64)
            if len(m) < FP_WINDOW:
                m = np.pad(m, (0, FP_WINDOW - len(m)))
            e = (
                (m[:FP_WINDOW] * m[:FP_WINDOW])
                .reshape(FP_SEGMENTS, seg)
                .sum(axis=1)
            )
            bits = (e > np.roll(e, -1)).astype(np.uint64)
            sigs[r] = (bits << shifts).sum(dtype=np.uint64).astype(
                np.uint64
            ).view(np.int64)
        return pa.table(
            {
                "audio_id": pa.array(ids, type=pa.int64()),
                "sig": pa.array(sigs),
            }
        )

    return ds.map_batches(
        stage, batch_format="pyarrow", zero_copy_batch=True
    )


def audio_near_dup(ds, max_hamming: int = 2, **kwargs):
    """Near-duplicate audio CLUSTERS ``(audio_id, cluster_id)`` —
    fingerprint inside the stage (payload never leaves it), then the
    generic distributed signature clustering shared with the image /
    video families (media/image.signature_near_dup: exact-class rep
    reduction → quarter-pigeonhole hamming → BSP components →
    measured-size tag-back)."""
    from .image import signature_near_dup

    sigs = audio_fingerprint(ds).materialize()
    return signature_near_dup(
        sigs,
        id_col="audio_id",
        sig_col="sig",
        max_hamming=max_hamming,
        **kwargs,
    )
