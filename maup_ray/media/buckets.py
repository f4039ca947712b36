"""Aspect-ratio bucketing over the image table — the resolution-bucket
assignment step every large-scale image-training pipeline runs before
batching (SDXL-style multi-aspect training: group images by nearest
canonical (w, h) bucket so each batch shares one shape and crop waste
is minimized).

Exactness discipline (CLAUDE.md): the assignment criterion is pure
int64 arithmetic so the DuckDB oracle matches bit-for-bit. Each bucket
``(bw, bh)`` carries a precomputed integer aspect code

    a = round_half_up(SCALE * bw / bh) = (2*SCALE*bw + bh) // (2*bh)

and an image of dims ``(w, h)`` is assigned to the bucket minimizing

    metric = |SCALE*w - a*h|            (ties -> smallest bucket index)

which equals ``SCALE*h * |w/h - a/SCALE|`` — ``h`` and ``SCALE`` are
common across buckets, so the argmin is the true nearest-aspect bucket
under the quantized bucket aspects, computed entirely in integers
(no float ratio, no log). ``SCALE*w <= 4096*2^31`` and ``a*h <=
2*4096*2^31`` both fit int64 with 20 bits to spare.

Scale shape: stateless vectorized ``map_batches`` — an (n x k) int64
metric matrix per batch against the k≈17-row constant bucket table
(module constant, never shipped per batch); no shuffle, no state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "ASPECT_SCALE",
    "DEFAULT_BUCKETS",
    "aspect_code",
    "bucket_sql_values",
    "aspect_assign",
]

ASPECT_SCALE = 4096

# SDXL's canonical multi-aspect training resolutions (~1 Mpx each,
# multiples of 64), portrait through landscape.
DEFAULT_BUCKETS: tuple[tuple[int, int], ...] = (
    (512, 2048),
    (576, 1792),
    (640, 1536),
    (704, 1344),
    (768, 1280),
    (832, 1216),
    (896, 1152),
    (960, 1088),
    (1024, 1024),
    (1088, 960),
    (1152, 896),
    (1216, 832),
    (1280, 768),
    (1344, 704),
    (1536, 640),
    (1792, 576),
    (2048, 512),
)


def aspect_code(bw: int, bh: int, scale: int = ASPECT_SCALE) -> int:
    """round-half-up(scale*bw/bh) in pure integer arithmetic."""
    return (2 * scale * bw + bh) // (2 * bh)


def bucket_sql_values(
    buckets=DEFAULT_BUCKETS, scale: int = ASPECT_SCALE
) -> str:
    """The bucket table as a SQL VALUES list ``(bucket_id, bw, bh, a)``
    generated from the SAME Python constants the engine uses — the
    oracle can never drift from the op."""
    rows = ", ".join(
        f"({i}, {bw}, {bh}, {aspect_code(bw, bh, scale)})"
        for i, (bw, bh) in enumerate(buckets)
    )
    return rows


def aspect_assign(
    ds,
    w_col: str = "w",
    h_col: str = "h",
    buckets=DEFAULT_BUCKETS,
    scale: int = ASPECT_SCALE,
):
    """Tag each row with its nearest aspect bucket.

    Adds ``bucket_id`` (int64 index into ``buckets``), ``bucket_w``,
    ``bucket_h`` (int32 canonical dims) and ``bucket_err`` (the int64
    metric ``|scale*w - a*h|`` — callers filter on it for curation:
    ``bucket_err <= tol_num * h * scale / tol_den`` bounds the relative
    aspect error at tol_num/tol_den, still in exact integers).

    Table in -> Table out; Dataset in -> Dataset out (stateless
    vectorized map_batches).
    """
    a = np.array(
        [aspect_code(bw, bh, scale) for bw, bh in buckets],
        dtype=np.int64,
    )
    bws = np.array([b[0] for b in buckets], dtype=np.int32)
    bhs = np.array([b[1] for b in buckets], dtype=np.int32)
    s = np.int64(scale)

    def tag(batch: pa.Table) -> pa.Table:
        w = batch[w_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch[h_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # (n x k) metric; argmin takes the FIRST minimum -> ties go to
        # the smallest bucket index, mirroring the oracle's
        # ORDER BY metric, bucket_id
        m = np.abs(s * w[:, None] - a[None, :] * h[:, None])
        j = np.argmin(m, axis=1)
        batch = batch.append_column(
            "bucket_id", pa.array(j.astype(np.int64))
        )
        batch = batch.append_column("bucket_w", pa.array(bws[j]))
        batch = batch.append_column("bucket_h", pa.array(bhs[j]))
        return batch.append_column(
            "bucket_err", pa.array(m[np.arange(len(j)), j])
        )

    if isinstance(ds, pa.Table):
        return tag(ds)
    return ds.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True
    )
