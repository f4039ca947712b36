"""Deterministic synthetic video table: (video_id:string, bytes:binary,
fmt:string='avi', n_frames:int32, w:int32, h:int32, codec:string).

Frame ``t`` of video ``i`` is the :func:`maup_ray.synth.images`
raster for row index ``i`` shifted by ``t`` scanline phases — a
deterministic "moving pattern" so frame extraction is verifiable by
regenerating the expected frame (FIXTURES.md F8 discipline: fidelity
checks need no media library). MJPG rows are lossy (PSNR≥40dB per
frame at quality 98); DIB rows are byte-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["gen_video_frame", "gen_video_batch", "video_dataset"]


def gen_video_frame(
    vid: int, t: int, w: int = 16, h: int = 16, seed: int = 42
) -> np.ndarray:
    """(h, w, 3) uint8 frame t of video vid — pure function."""
    npx = w * h * 3
    base = (vid * 2654435761 + seed) & 0xFF
    j = (np.arange(npx, dtype=np.uint64) * np.uint64(97)) & np.uint64(0xFF)
    px = (np.uint8(base) + j.astype(np.uint8)).reshape(h, w, 3)
    return np.roll(px, shift=t, axis=0)  # scanline scroll per frame


def gen_video_batch(
    ids: np.ndarray,
    n_frames: int = 8,
    w: int = 16,
    h: int = 16,
    seed: int = 42,
    mjpg_every: int = 2,
    fps: int = 30,
) -> pa.Table:
    """Deterministic batch of AVI video rows for row indices ``ids``.
    Every ``mjpg_every``-th row is MJPG-compressed (quality 98), the
    rest are lossless DIB."""
    from ..media.avi import encode_avi

    ids = np.asarray(ids, dtype=np.int64)
    blobs, codecs = [], []
    for i in ids:
        frames = [
            gen_video_frame(int(i), t, w, h, seed) for t in range(n_frames)
        ]
        use_mjpg = mjpg_every and (int(i) % mjpg_every) == (mjpg_every - 1)
        codec = "MJPG" if use_mjpg else "DIB "
        blobs.append(encode_avi(frames, fps=fps, codec=codec))
        codecs.append(codec.strip())
    n = len(ids)
    import pyarrow.compute as pc

    padded = pc.utf8_lpad(pc.cast(pa.array(ids), pa.string()), 12, "0")
    video_id = pc.binary_join_element_wise(
        pa.array(["vid"] * n), padded, ""
    )
    return pa.table(
        {
            "video_id": video_id,
            "bytes": pa.array(blobs, type=pa.binary()),
            "fmt": pa.array(["avi"] * n, type=pa.string()),
            "n_frames": pa.array(np.full(n, n_frames, dtype=np.int32)),
            "w": pa.array(np.full(n, w, dtype=np.int32)),
            "h": pa.array(np.full(n, h, dtype=np.int32)),
            "codec": pa.array(codecs, type=pa.string()),
        }
    )


def video_dataset(
    n: int,
    n_frames: int = 8,
    w: int = 16,
    h: int = 16,
    seed: int = 42,
    mjpg_every: int = 2,
    **read_kwargs,
):
    """Streaming Ray Dataset of n synthetic AVI rows — generated inside
    map_batches so no driver-side materialization."""
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        return gen_video_batch(ids, n_frames, w, h, seed, mjpg_every)

    return ray.data.range(n, **read_kwargs).map_batches(
        gen, batch_format="pyarrow", zero_copy_batch=True
    )
