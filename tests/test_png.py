"""media.png — from-scratch PNG codec (stdlib zlib + numpy)."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.media.png import decode_png, encode_png


def _rand_img(h, w, ch, seed=0):
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, ch), dtype=np.uint8
    )


def _encode_with_filter(img: np.ndarray, ftype: int) -> bytes:
    """Test-local encoder applying one PNG filter to every row —
    exercises the decoder's defilter paths our encoder never emits."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int64)
    rows = []
    prior = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            enc = cur - left
        elif ftype == 2:
            enc = cur - prior
        elif ftype == 3:
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            enc = cur - ((left + prior) >> 1)
        elif ftype == 4:
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            ul = np.concatenate([np.zeros(ch, np.int64), prior[:-ch]])
            p = left + prior - ul
            pa_, pb_, pc_ = (
                np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            )
            pred = np.where(
                (pa_ <= pb_) & (pa_ <= pc_),
                left,
                np.where(pb_ <= pc_, prior, ul),
            )
            enc = cur - pred
        rows.append(bytes([ftype]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prior = cur

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    color = {1: 0, 3: 2, 4: 6}[ch]
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )


class TestRoundTrip:
    @pytest.mark.parametrize("shape", [(16, 16), (7, 13), (1, 1), (33, 2)])
    def test_rgb_byte_exact(self, shape):
        img = _rand_img(*shape, 3)
        assert np.array_equal(decode_png(encode_png(img)), img)

    def test_gray_expands_to_rgb(self):
        img = _rand_img(9, 11, 1, seed=3)
        out = decode_png(encode_png(img[:, :, 0]))
        assert out.shape == (9, 11, 3)
        assert np.array_equal(out[:, :, 0], img[:, :, 0])
        assert np.array_equal(out[:, :, 1], img[:, :, 0])

    def test_rgba_drops_alpha(self):
        img = _rand_img(8, 8, 4, seed=5)
        out = decode_png(encode_png(img))
        assert np.array_equal(out, img[:, :, :3])


class TestDefilter:
    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    def test_all_filter_types(self, ftype):
        img = _rand_img(12, 10, 3, seed=ftype)
        assert np.array_equal(
            decode_png(_encode_with_filter(img, ftype)), img
        )


class TestErrors:
    def test_bad_signature(self):
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"not a png at all")

    def test_crc_mismatch(self):
        buf = bytearray(encode_png(_rand_img(4, 4, 3)))
        buf[-6] ^= 0xFF  # corrupt inside IEND's crc
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(buf))


class TestPipelineIntegration:
    def test_phash_equal_raw_vs_png(self):
        # VERDICT r2 #9 done-criterion: phash of the png-encoded row
        # equals the raw-path hash of the same pixels
        from maup_ray.media.image import PhashStage
        from maup_ray.synth.images import image_table

        raw = image_table(32)
        mixed = image_table(32, png_every=8)
        assert set(mixed["fmt"].to_pylist()) == {"raw", "png"}
        stage = PhashStage()
        h_raw = stage(raw)["phash_computed"].to_pylist()
        h_mix = stage(mixed)["phash_computed"].to_pylist()
        assert h_raw == h_mix

    def test_png_payload_fidelity(self):
        from maup_ray.media.image import decode_raw_batch
        from maup_ray.synth.images import image_table

        raw = image_table(16)
        mixed = image_table(16, png_every=4)
        a = decode_raw_batch(raw)
        b = decode_raw_batch(mixed)
        for x, y in zip(a, b):
            assert np.array_equal(x, y)  # lossless: byte equality
