"""media.jpeg — from-scratch baseline JPEG codec (numpy + stdlib).

The lossy-format fidelity contract from SURVEY.md §1.2 / FIXTURES.md:
decoded pixels must measure PSNR ≥ 40 dB against the source. The synth
pixel pattern (value jumps of 97 per byte — essentially full-range
high-frequency noise) is the adversarial case; quality 98 is what the
fixtures use and must clear the bar on it.
"""

import struct

import numpy as np
import pytest

from maup_ray.media.jpeg import decode_jpeg, encode_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _synth_pixels(h=16, w=16, base=37):
    j8 = (
        (np.arange(h * w * 3, dtype=np.uint64) * np.uint64(97))
        & np.uint64(0xFF)
    ).astype(np.uint8)
    return (np.uint8(base) + j8).reshape(h, w, 3)


def _smooth(h=16, w=16):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([yy * 8, xx * 8, (yy + xx) * 4], axis=2).astype(
        np.uint8
    )


class TestRoundTrip:
    def test_smooth_psnr(self):
        img = _smooth()
        assert _psnr(img, decode_jpeg(encode_jpeg(img, 95))) > 45.0

    def test_synth_pattern_q98_meets_40db(self):
        # the exact fixture content + quality used by gen_image_batch
        img = _synth_pixels()
        assert _psnr(img, decode_jpeg(encode_jpeg(img, 98))) >= 40.0

    @pytest.mark.parametrize("shape", [(8, 8), (16, 16), (21, 37), (1, 1)])
    def test_odd_sizes_roundtrip_shape(self, shape):
        img = np.random.RandomState(7).randint(
            0, 256, size=(*shape, 3), dtype=np.uint8
        )
        out = decode_jpeg(encode_jpeg(img, 95))
        assert out.shape == img.shape

    def test_grayscale_expands_to_rgb(self):
        g = (np.mgrid[0:16, 0:16][0] * 16).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(g, 95))
        assert out.shape == (16, 16, 3)
        assert np.array_equal(out[:, :, 0], out[:, :, 1])
        assert _psnr(np.repeat(g[:, :, None], 3, 2), out) > 45.0

    def test_constant_image_near_exact(self):
        img = np.full((16, 16, 3), 200, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, 90))
        assert np.abs(out.astype(int) - 200).max() <= 1


class TestSubsampling:
    def test_420_decodes_and_aligns(self):
        # gray-valued noise has constant chroma: 4:2:0 must match the
        # 4:4:4 fidelity exactly if chroma planes are aligned right
        g = np.random.RandomState(3).randint(
            0, 256, size=(21, 37), dtype=np.uint8
        )
        img = np.repeat(g[:, :, None], 3, axis=2)
        p444 = _psnr(img, decode_jpeg(encode_jpeg(img, 95, "444")))
        p420 = _psnr(img, decode_jpeg(encode_jpeg(img, 95, "420")))
        assert abs(p444 - p420) < 0.5
        assert p420 > 40.0

    def test_420_color_content(self):
        img = _smooth(24, 40)
        out = decode_jpeg(encode_jpeg(img, 95, "420"))
        assert out.shape == img.shape
        assert _psnr(img, out) > 35.0  # chroma box-filter loss only


class TestFormat:
    def test_stream_structure(self):
        buf = encode_jpeg(_smooth(), 95)
        assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
        assert buf[2:4] == b"\xff\xe0" and buf[6:11] == b"JFIF\x00"
        # SOF0 present with 3 components, 8-bit
        i = buf.find(b"\xff\xc0")
        assert i > 0
        prec, fh, fw, nc = struct.unpack_from(">BHHB", buf, i + 4)
        assert (prec, fh, fw, nc) == (8, 16, 16, 3)

    def test_rejects_progressive(self):
        buf = bytearray(encode_jpeg(_smooth(), 95))
        i = buf.find(b"\xff\xc0")
        buf[i + 1] = 0xC2  # flip SOF0 → SOF2
        with pytest.raises(ValueError, match="progressive"):
            decode_jpeg(bytes(buf))

    def test_rejects_non_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"definitely not a jpeg")

    def test_byte_stuffing_roundtrip(self):
        # content chosen to produce 0xFF bytes in the entropy stream
        # with high probability across many blocks
        img = np.random.RandomState(11).randint(
            0, 256, size=(40, 40, 3), dtype=np.uint8
        )
        buf = encode_jpeg(img, 90)
        assert b"\xff\x00" in buf  # stuffed byte actually occurred
        out = decode_jpeg(buf)
        assert out.shape == img.shape


class TestPipelineIntegration:
    def test_mixed_batch_phash_and_fidelity(self):
        from maup_ray.media.image import PhashStage, decode_raw_batch
        from maup_ray.synth.images import image_table

        raw = image_table(48)
        mixed = image_table(48, png_every=8, jpeg_every=12)
        fmts = mixed["fmt"].to_pylist()
        assert set(fmts) == {"raw", "png", "jpeg"}
        a = decode_raw_batch(raw)
        b = decode_raw_batch(mixed)
        for x, y, f in zip(a, b, fmts):
            if f == "jpeg":
                assert _psnr(x, y) >= 40.0  # lossy invariant
            else:
                assert np.array_equal(x, y)  # lossless: byte equality
        # the stage runs over the mixed batch without error and the
        # lossless rows hash identically to the raw path
        stage = PhashStage()
        h_raw = stage(raw)["phash_computed"].to_pylist()
        h_mix = stage(mixed)["phash_computed"].to_pylist()
        same = [
            i for i, f in enumerate(fmts) if f != "jpeg"
        ]
        assert [h_raw[i] for i in same] == [h_mix[i] for i in same]
