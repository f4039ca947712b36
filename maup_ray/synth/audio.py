"""Deterministic synthetic audio table — the audio sibling of
synth/images.py (BASELINE.json input_hint pattern: opaque binary
payload + typed metadata columns).

Row schema: ``audio_id:int64, bytes:binary (RIFF/WAV PCM16 mono),
n_samples:int32, rate:int32``. Sample values are a pure affine-mod
function of (audio_id, sample index):

    v[id, i] = ((id·AXA + i·CA + BA) mod 65536) − 32768     (int16)

so every downstream feature (frame energy, zero crossings, decimated
checksums) is exactly derivable in SQL from the id alone — the WAV
payload round-trips through the real codec while the oracle never
touches bytes. Lengths vary per row (AUD_BASE + (id mod AUD_MOD) ×
AUD_STEP samples) to exercise ragged-batch paths; all lengths are
multiples of the frame size used by the oracled query.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..media.wav import encode_wav

__all__ = [
    "AUD_BASE",
    "AUD_MOD",
    "AUD_STEP",
    "AUD_RATE",
    "AXA",
    "BA",
    "CA",
    "gen_audio_batch",
    "audio_samples",
    "dup_samples",
    "audio_dataset",
]

AUD_BASE = 2048
AUD_MOD = 8
AUD_STEP = 256
AUD_RATE = 16000
AXA = 48271
CA = 69621
BA = 12345


def n_samples_for(ids: np.ndarray) -> np.ndarray:
    return (AUD_BASE + (ids % AUD_MOD) * AUD_STEP).astype(np.int64)


def audio_samples(audio_id: int, n: int | None = None) -> np.ndarray:
    """The reference waveform for one id (int16, length n or the
    row's natural length)."""
    if n is None:
        n = int(n_samples_for(np.asarray([audio_id]))[0])
    i = np.arange(n, dtype=np.int64)
    v = (audio_id * AXA + i * CA + BA) % 65536 - 32768
    return v.astype(np.int16)


def dup_samples(audio_id: int, dup_group: int) -> np.ndarray:
    """Near-duplicate waveform: members of one ``dup_group``-sized id
    range share the BASE id's content; non-base members additionally
    flip the low bit of every 997th sample (offset by their rank in
    the class) — a ±1-amplitude perturbation, so members are NOT
    byte-identical yet fingerprint-identical (segment-energy
    comparisons are robust to ±1 sample changes)."""
    g = int(dup_group)
    base = (audio_id // g) * g
    n = int(n_samples_for(np.asarray([audio_id]))[0])
    v = audio_samples(base, n)
    off = audio_id - base
    if off:
        v = v.copy()
        v[off::997] ^= 1
    return v


def gen_audio_batch(ids: np.ndarray, dup_group: int = 1) -> pa.Table:
    ids = np.asarray(ids, dtype=np.int64)
    ns = n_samples_for(ids)
    if dup_group > 1:
        bufs = [
            encode_wav(dup_samples(int(k), dup_group), AUD_RATE)
            for k in ids
        ]
    else:
        bufs = [
            encode_wav(audio_samples(int(k), int(n)), AUD_RATE)
            for k, n in zip(ids, ns)
        ]
    return pa.table(
        {
            "audio_id": pa.array(ids, type=pa.int64()),
            "bytes": pa.array(bufs, type=pa.binary()),
            "n_samples": pa.array(ns.astype(np.int32), type=pa.int32()),
            "rate": pa.array(
                np.full(len(ids), AUD_RATE, dtype=np.int32),
                type=pa.int32(),
            ),
        }
    )


def audio_dataset(n: int, dup_group: int = 1, **read_kwargs):
    """Streaming Ray Dataset of n synthetic audio rows — generated
    inside map_batches so no driver-side materialization.
    ``dup_group > 1`` plants near-duplicate classes (see
    :func:`dup_samples`)."""
    import ray.data

    g = int(dup_group)

    def gen(batch: pa.Table) -> pa.Table:
        return gen_audio_batch(batch.column("id").to_numpy(), dup_group=g)

    return ray.data.range(n, **read_kwargs).map_batches(
        gen, batch_format="pyarrow", zero_copy_batch=True
    )
