"""media/image.pixel_histogram + gradient_energy — pixel-exact
analysis kernels vs brute-force references, including the mixed
raw/PNG decode fallback and the ROI crop."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from maup_ray.media.image import gradient_energy, pixel_histogram


def _img_table(imgs, fmts=None):
    from maup_ray.media.png import encode_png

    rows = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": []}
    for i, img in enumerate(imgs):
        f = (fmts or ["raw"] * len(imgs))[i]
        rows["image_id"].append(f"t{i}")
        rows["bytes"].append(
            encode_png(img) if f == "png" else img.tobytes()
        )
        rows["w"].append(img.shape[1])
        rows["h"].append(img.shape[0])
        rows["fmt"].append(f)
    return pa.table(
        {
            "image_id": pa.array(rows["image_id"]),
            "bytes": pa.array(rows["bytes"], pa.binary()),
            "w": pa.array(rows["w"], pa.int32()),
            "h": pa.array(rows["h"], pa.int32()),
            "fmt": pa.array(rows["fmt"]),
        }
    )


def _brute_hist(imgs, crop=None):
    counts = np.zeros((3, 256), dtype=np.int64)
    for img in imgs:
        v = img if crop is None else img[:crop, :crop]
        for c in range(3):
            counts[c] += np.bincount(
                v[:, :, c].ravel(), minlength=256
            )
    return counts


def _brute_sharp(img):
    g = img.astype(np.int64).sum(axis=2)
    return int(np.abs(np.diff(g, axis=1)).sum()) + int(
        np.abs(np.diff(g, axis=0)).sum()
    )


def _hist_to_counts(df):
    counts = np.zeros((3, 256), dtype=np.int64)
    for r in df.itertuples():
        counts[r.ch, r.v] += r.n
    return counts


class TestPixelHistogram:
    def test_matches_brute_mixed_shapes(self, ray_session):
        import ray.data

        rng = np.random.RandomState(3)
        imgs = [
            rng.randint(0, 256, (10, 14, 3), dtype=np.uint8),
            rng.randint(0, 256, (16, 16, 3), dtype=np.uint8),
            rng.randint(0, 256, (4, 4, 3), dtype=np.uint8),
        ]
        ds = ray.data.from_arrow(_img_table(imgs))
        out = pixel_histogram(ds).to_pandas()
        got = (
            out.groupby(["ch", "v"])["n"].sum().reset_index()
        )
        assert (_hist_to_counts(got) == _brute_hist(imgs)).all()
        # exact total: every byte counted exactly once
        assert got["n"].sum() == sum(i.size for i in imgs)

    def test_crop_and_png_path(self, ray_session):
        import ray.data

        rng = np.random.RandomState(7)
        imgs = [
            rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
            for _ in range(3)
        ]
        fmts = ["raw", "png", "raw"]
        ds = ray.data.from_arrow(_img_table(imgs, fmts))
        out = pixel_histogram(ds, crop=8).to_pandas()
        got = out.groupby(["ch", "v"])["n"].sum().reset_index()
        assert (
            _hist_to_counts(got) == _brute_hist(imgs, crop=8)
        ).all()

    def test_same_shape_fast_path_equals_decode(self, ray_session):
        import ray.data

        rng = np.random.RandomState(11)
        imgs = [
            rng.randint(0, 256, (12, 12, 3), dtype=np.uint8)
            for _ in range(4)
        ]
        raw = pixel_histogram(
            ray.data.from_arrow(_img_table(imgs))
        ).to_pandas()
        png = pixel_histogram(
            ray.data.from_arrow(_img_table(imgs, ["png"] * 4))
        ).to_pandas()
        k = ["ch", "v"]
        a = raw.groupby(k)["n"].sum()
        b = png.groupby(k)["n"].sum()
        assert a.equals(b)


class TestGradientEnergy:
    def test_matches_brute(self, ray_session):
        import ray.data

        rng = np.random.RandomState(5)
        imgs = [
            rng.randint(0, 256, (9, 13, 3), dtype=np.uint8),
            rng.randint(0, 256, (16, 16, 3), dtype=np.uint8),
        ]
        ds = ray.data.from_arrow(_img_table(imgs))
        out = gradient_energy(ds).to_pandas()
        got = dict(zip(out.image_id, out.sharpness))
        for i, img in enumerate(imgs):
            assert got[f"t{i}"] == _brute_sharp(img)

    def test_flat_image_zero_and_png_parity(self, ray_session):
        import ray.data

        flat = np.full((8, 8, 3), 77, dtype=np.uint8)
        rng = np.random.RandomState(6)
        busy = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
        raw = gradient_energy(
            ray.data.from_arrow(_img_table([flat, busy]))
        ).to_pandas()
        png = gradient_energy(
            ray.data.from_arrow(
                _img_table([flat, busy], ["png", "png"])
            )
        ).to_pandas()
        r = dict(zip(raw.image_id, raw.sharpness))
        p = dict(zip(png.image_id, png.sharpness))
        assert r == p
        assert r["t0"] == 0
        assert r["t1"] > 0


class TestImageMoments:
    @staticmethod
    def _brute(img):
        g = img.astype(np.int64).sum(axis=2)
        h, w = g.shape
        r, c = np.mgrid[0:h, 0:w]
        m00 = int(g.sum())
        m10, m01 = int((c * g).sum()), int((r * g).sum())
        return {
            "m00": m00,
            "m10": m10,
            "m01": m01,
            "m11": int((r * c * g).sum()),
            "m20": int((c * c * g).sum()),
            "m02": int((r * r * g).sum()),
            "cx": m10 / m00,
            "cy": m01 / m00,
        }

    def test_matches_brute_mixed_shapes(self, ray_session):
        import ray.data

        from maup_ray.media.image import image_moments

        rng = np.random.RandomState(11)
        imgs = [
            rng.randint(0, 256, (9, 13, 3), dtype=np.uint8),
            rng.randint(0, 256, (16, 16, 3), dtype=np.uint8),
            rng.randint(0, 256, (4, 4, 3), dtype=np.uint8),
        ]
        out = image_moments(
            ray.data.from_arrow(_img_table(imgs))
        ).to_pandas().set_index("image_id")
        for i, img in enumerate(imgs):
            want = self._brute(img)
            row = out.loc[f"t{i}"]
            for k, v in want.items():
                assert row[k] == v, (i, k)

    def test_fast_path_equals_decode_and_png(self, ray_session):
        import ray.data

        from maup_ray.media.image import image_moments

        rng = np.random.RandomState(12)
        imgs = [
            rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
            for _ in range(4)
        ]
        raw = image_moments(
            ray.data.from_arrow(_img_table(imgs))
        ).to_pandas().sort_values("image_id").reset_index(drop=True)
        png = image_moments(
            ray.data.from_arrow(_img_table(imgs, ["png"] * 4))
        ).to_pandas().sort_values("image_id").reset_index(drop=True)
        assert raw.equals(png)

    def test_centroid_tracks_bright_corner(self, ray_session):
        import ray.data

        from maup_ray.media.image import image_moments

        img = np.zeros((8, 8, 3), dtype=np.uint8)
        img[0, 7] = 255  # bright top-right pixel only
        img[0, 0] = 1  # plus a dim origin pixel so m00 > 0 everywhere
        out = image_moments(
            ray.data.from_arrow(_img_table([img]))
        ).to_pandas()
        assert out.cx[0] > 6.9 and out.cy[0] == 0.0


class TestDominantColor:
    def _brute(self, img):
        b = (
            (img[..., 0].astype(np.int64) >> 5) * 64
            + (img[..., 1].astype(np.int64) >> 5) * 8
            + (img[..., 2].astype(np.int64) >> 5)
        ).ravel()
        c = np.bincount(b, minlength=512)
        return int(np.argmax(c)), int(c.max())

    def test_matches_brute_mixed_shapes_and_png(self, ray_session):
        import ray.data

        from maup_ray.media.image import dominant_color

        rng = np.random.RandomState(67)
        imgs = [
            rng.randint(0, 256, (rng.randint(4, 12),
                                 rng.randint(4, 12), 3),
                        dtype=np.uint8)
            for _ in range(8)
        ]
        fmts = ["raw", "png"] * 4
        got = dominant_color(
            ray.data.from_arrow(_img_table(imgs, fmts)).repartition(3)
        )
        import ray

        tabs = [
            ray.get(r) for r in got.materialize().to_arrow_refs()
        ]
        rows = {
            r["image_id"]: (r["bucket"], r["n_px"])
            for t in tabs
            for r in t.to_pylist()
        }
        for i, img in enumerate(imgs):
            assert rows[f"t{i}"] == self._brute(img), i

    def test_same_shape_fast_path_and_tiebreak(self, ray_session):
        import ray.data

        from maup_ray.media.image import dominant_color

        # two equal-count buckets: 0 (black) and 511 (white) — the
        # smaller bucket id must win
        img = np.zeros((2, 2, 3), dtype=np.uint8)
        img[0, :, :] = 255
        got = dominant_color(
            ray.data.from_arrow(_img_table([img, img]))
        )
        import ray

        t = pa.concat_tables(
            [ray.get(r) for r in got.materialize().to_arrow_refs()]
        )
        assert t["bucket"].to_pylist() == [0, 0]
        assert t["n_px"].to_pylist() == [2, 2]
