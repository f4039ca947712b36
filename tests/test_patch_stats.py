"""media/image.patch_stats — pixel-exact tile sums from decoded
payloads, including the lossless-PNG decode path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from maup_ray.media.image import patch_stats


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


def _brute(img, patch):
    h, w = img.shape[:2]
    out = {}
    for py in range(h // patch):
        for px in range(w // patch):
            blk = img[
                py * patch:(py + 1) * patch,
                px * patch:(px + 1) * patch,
            ]
            out[(px, py)] = int(blk.astype(np.int64).sum())
    return out


class TestPatchStats:
    def test_known_pixels_and_crop(self, ray_session):
        import ray.data

        rng = np.random.RandomState(5)
        # 10x14 image: crops to 8x12 with patch=4 (bottom/right trim)
        imgs = [
            rng.randint(0, 256, (10, 14, 3), dtype=np.uint8),
            rng.randint(0, 256, (8, 8, 3), dtype=np.uint8),
        ]
        ds = ray.data.from_arrow(_img_table(imgs))
        out = patch_stats(ds, patch=4).to_pandas()
        for i, img in enumerate(imgs):
            want = _brute(img, 4)
            got = {
                (r.px, r.py): r.psum
                for r in out[out.image_id == f"t{i}"].itertuples()
            }
            assert got == want

    def test_png_path_matches_raw(self, ray_session):
        import ray.data

        rng = np.random.RandomState(9)
        img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
        raw = patch_stats(
            ray.data.from_arrow(_img_table([img], ["raw"])), patch=4
        ).to_pandas()
        png = patch_stats(
            ray.data.from_arrow(_img_table([img], ["png"])), patch=4
        ).to_pandas()
        key = ["px", "py"]
        assert (
            raw.sort_values(key)["psum"].tolist()
            == png.sort_values(key)["psum"].tolist()
        )

    def test_tiny_image_skipped(self, ray_session):
        import ray.data

        img = np.zeros((2, 2, 3), dtype=np.uint8)  # < patch: no tiles
        out = patch_stats(
            ray.data.from_arrow(_img_table([img])), patch=4
        ).to_pandas()
        assert len(out) == 0
