"""Deterministic synthetic image+caption table (BASELINE.json input_hint:
image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64).

``fmt="raw"`` = uncompressed RGB rows (w*h*3 bytes), so the PSNR≥40dB
payload-fidelity invariant degenerates to byte equality — checkable
without PIL (FIXTURES.md F8). Pixel bytes and captions are pure
functions of the row index, fully vectorized.

``phash_xy`` decodes the 64-bit phash into (x, y) in [0, EXTENT)² by
Morton de-interleave of the low 40 bits, + 0.5 so points never sit on
integer cell/district boundaries (SURVEY.md §1.2 "phash-derived
coordinates stand in for embedded geotags").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.cells import morton_decode
from .districts import EXTENT

__all__ = ["gen_image_batch", "image_table", "image_dataset", "phash_xy"]

_PHASH_MULT = np.uint64(0x9E3779B97F4A7C15)
_VOCAB = (
    "aerial photo satellite view of district block street park river "
    "bridge plaza市 school census tract boundary map tile urban rural"
).split()


def phash_xy(phash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """int64 phash → float64 (x, y) in [0, EXTENT)², off-lattice."""
    u = phash.astype(np.int64).view(np.uint64)
    cx, cy = morton_decode(u & np.uint64((1 << 40) - 1))
    x = (cx.astype(np.float64) % EXTENT) + 0.5
    y = (cy.astype(np.float64) % EXTENT) + 0.5
    return x, y


def gen_image_batch(
    ids: np.ndarray,
    w: int = 16,
    h: int = 16,
    seed: int = 42,
    png_every: int = 0,
    jpeg_every: int = 0,
) -> pa.Table:
    """Deterministic batch of image rows for row indices ``ids``.

    ``png_every=k`` PNG-encodes every k-th row (fmt='png') through the
    from-scratch codec so compressed-decode paths are exercised with
    the SAME pixel content (lossless → fidelity stays byte equality).
    ``jpeg_every=m`` JPEG-encodes every m-th row (fmt='jpeg', baseline
    quality 98 — the lossy format under the PSNR≥40dB invariant); a
    row matching both selectors stays PNG.
    """
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    npx = w * h * 3
    # pixel[i, j] = (i*2654435761 + j*97 + seed) mod 256 — uint8 wrapping
    # addition IS mod-256, so the whole raster is one tiny outer add
    base8 = (
        (ids.astype(np.uint64) * np.uint64(2654435761) + np.uint64(seed))
        & np.uint64(0xFF)
    ).astype(np.uint8)
    j8 = ((np.arange(npx, dtype=np.uint64) * np.uint64(97)) & np.uint64(0xFF)).astype(
        np.uint8
    )
    px = base8[:, None] + j8[None, :]
    fmt_list = None
    if png_every or jpeg_every:
        from ..media.jpeg import encode_jpeg
        from ..media.png import encode_png

        sel = (
            (ids % png_every) == (png_every - 1)
            if png_every
            else np.zeros(n, dtype=bool)
        )
        sel_j = (
            ((ids % jpeg_every) == (jpeg_every - 1)) & ~sel
            if jpeg_every
            else np.zeros(n, dtype=bool)
        )
        blobs = [
            encode_png(px[i].reshape(h, w, 3))
            if sel[i]
            else (
                encode_jpeg(px[i].reshape(h, w, 3), quality=98)
                if sel_j[i]
                else px[i].tobytes()
            )
            for i in range(n)
        ]
        bytes_col = pa.array(blobs, type=pa.binary())
        fmt_list = np.where(
            sel, "png", np.where(sel_j, "jpeg", "raw")
        ).tolist()
    else:
        blob = px.tobytes()
        bytes_col = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(npx), n, [None, pa.py_buffer(blob)]
        ).cast(pa.binary())
    phash = (
        (ids.astype(np.uint64) * _PHASH_MULT) & np.uint64(0x7FFFFFFFFFFFFFFF)
    ).astype(np.int64)
    nv = len(_VOCAB)
    # fully vectorized caption build: dictionary take + element-wise join
    import pyarrow.compute as pc

    vocab_arr = pa.array(_VOCAB, type=pa.string())
    padded = pc.utf8_lpad(pc.cast(pa.array(ids), pa.string()), 12, "0")
    words = [
        pc.take(vocab_arr, pa.array((ids * 7 + k * 13) % nv))
        for k in range(6)
    ]
    prefix = pc.binary_join_element_wise(
        pa.array(["img"] * n), padded, " "
    )
    captions = pc.binary_join_element_wise(prefix, *words, " ")
    image_id = pc.binary_join_element_wise(
        pa.array(["img"] * n), padded, ""
    )
    return pa.table(
        {
            "image_id": image_id,
            "bytes": bytes_col,
            "w": pa.array(np.full(n, w, dtype=np.int32)),
            "h": pa.array(np.full(n, h, dtype=np.int32)),
            "fmt": pa.array(fmt_list or ["raw"] * n, type=pa.string()),
            "caption": captions,
            "phash": pa.array(phash),
        }
    )


def image_table(
    n: int,
    w: int = 16,
    h: int = 16,
    seed: int = 42,
    png_every: int = 0,
    jpeg_every: int = 0,
) -> pa.Table:
    return gen_image_batch(np.arange(n), w, h, seed, png_every, jpeg_every)


def image_dataset(
    n: int,
    w: int = 16,
    h: int = 16,
    seed: int = 42,
    png_every: int = 0,
    jpeg_every: int = 0,
    **read_kwargs,
):
    """Streaming Ray Dataset of n synthetic image rows — generated
    inside map_batches so no driver-side materialization."""
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        return gen_image_batch(ids, w, h, seed, png_every, jpeg_every)

    return ray.data.range(n, **read_kwargs).map_batches(
        gen, batch_format="pyarrow", zero_copy_batch=True
    )
