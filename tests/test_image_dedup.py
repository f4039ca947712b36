"""media.image_near_dup — perceptual near-duplicate clustering:
planted-duplicate recall, exact-class rep reduction, keeper ids."""

import numpy as np
import pyarrow as pa
import pytest


def _table(ids, payloads, w=16, h=16):
    n = len(ids)
    return pa.table(
        {
            "image_id": pa.array(ids, type=pa.string()),
            "bytes": pa.array(payloads, type=pa.binary()),
            "w": pa.array([w] * n, type=pa.int32()),
            "h": pa.array([h] * n, type=pa.int32()),
            "fmt": pa.array(["raw"] * n),
        }
    )


def _img(seed, w=16, h=16):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=w * h * 3, dtype=np.uint8)


class TestImageNearDup:
    def test_planted_duplicates_cluster_with_sources(self, ray_session):
        import ray.data

        from maup_ray.media.image import image_near_dup

        ids, payloads = [], []
        for i in range(30):
            ids.append(f"img{i:04d}")
            payloads.append(_img(i).tobytes())
        # exact copy of img0007 and a one-pixel perturbation of img0003
        ids += ["zz_copy7", "zz_near3"]
        payloads.append(_img(7).tobytes())
        b = bytearray(_img(3).tobytes())
        b[0] ^= 1
        payloads.append(bytes(b))
        ds = ray.data.from_arrow(_table(ids, payloads))
        out = image_near_dup(ds).to_pandas()
        m = dict(zip(out["image_id"], out["cluster_id"]))
        assert m["zz_copy7"] == m["img0007"] == "img0007"
        assert m["zz_near3"] == m["img0003"] == "img0003"
        # cluster_id is always the smallest member
        assert (
            out.groupby("cluster_id")["image_id"].min()
            == out.groupby("cluster_id")["image_id"].min().index
        ).all()

    def test_distinct_images_produce_no_clusters(self, ray_session):
        import ray.data

        from maup_ray.media.image import image_near_dup

        ids = [f"img{i:04d}" for i in range(20)]
        payloads = [_img(1000 + i).tobytes() for i in range(20)]
        ds = ray.data.from_arrow(_table(ids, payloads))
        out = image_near_dup(ds).to_pandas()
        # random rasters: overwhelmingly no hamming<=3 neighbours
        assert len(out) <= 2

    def test_large_exact_class_no_quadratic_edges(self, ray_session):
        # 300 copies of ONE image: the exact-class rep reduction must
        # produce a single 300-member cluster without emitting
        # 300^2/2 pair edges (the hamming stage sees ONE rep row)
        import ray.data

        from maup_ray.media.image import image_near_dup
        from maup_ray.text.dedup import hamming_candidates

        payload = _img(42).tobytes()
        ids = [f"c{i:05d}" for i in range(300)]
        ds = ray.data.from_arrow(_table(ids, [payload] * 300))
        out = image_near_dup(ds).to_pandas()
        assert len(out) == 300
        assert set(out["cluster_id"]) == {"c00000"}


class TestAugmentStage:
    def _mk(self, n=6, w=8, h=6):
        ids = [f"a{i}" for i in range(n)]
        payloads = [
            np.arange(w * h * 3, dtype=np.uint8).tobytes() for _ in range(n)
        ]
        return _table(ids, payloads, w=w, h=h)

    def test_hflip_roundtrip_identity(self, ray_session):
        import ray.data

        from maup_ray.media.image import AugmentStage

        t = self._mk()
        once = AugmentStage(hflip=True)(t)
        twice = AugmentStage(hflip=True)(once)
        assert twice["bytes"].to_pylist() == t["bytes"].to_pylist()

    def test_rot90_shape_swap_and_period(self, ray_session):
        from maup_ray.media.image import AugmentStage

        t = self._mk(w=8, h=6)
        r1 = AugmentStage(rot90=1)(t)
        assert r1["w"].to_pylist()[0] == 6 and r1["h"].to_pylist()[0] == 8
        r4 = t
        for _ in range(4):
            r4 = AugmentStage(rot90=1)(r4)
        assert r4["bytes"].to_pylist() == t["bytes"].to_pylist()

    def test_crop_window_values(self, ray_session):
        from maup_ray.media.image import AugmentStage

        w, h = 8, 6
        t = self._mk(n=2, w=w, h=h)
        out = AugmentStage(crop=(2, 1, 4, 3))(t)
        assert out["w"].to_pylist() == [4, 4]
        assert out["h"].to_pylist() == [3, 3]
        src = np.frombuffer(
            t["bytes"][0].as_py(), dtype=np.uint8
        ).reshape(h, w, 3)
        got = np.frombuffer(
            out["bytes"][0].as_py(), dtype=np.uint8
        ).reshape(3, 4, 3)
        assert (got == src[1:4, 2:6]).all()

    def test_runs_as_dataset_stage(self, ray_session):
        import ray.data

        from maup_ray.media.image import AugmentStage

        ds = ray.data.from_arrow(self._mk(n=12))
        out = ds.map_batches(
            AugmentStage,
            fn_constructor_kwargs={"hflip": True, "crop": (0, 0, 4, 4)},
            batch_format="pyarrow",
            concurrency=2,
        ).to_pandas()
        assert len(out) == 12
        assert set(out["w"]) == {4} and set(out["h"]) == {4}


def _mix64(i):
    # splitmix64 (python ints, explicit mod 2^64) — spreads ints over
    # the 64-bit space so random hamming<=3 collisions are
    # (overwhelmingly) absent
    m = (1 << 64) - 1
    x = (i + 0x9E3779B97F4A7C15) & m
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & m
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & m
    return x ^ (x >> 31)


def _sig_dataset(n_distinct=5000, n_dup_classes=5, dup_members=3):
    """Synthetic signature corpus: n_distinct unique singletons, a few
    exact-duplicate classes, and one hamming-1 near pair."""
    ids, sigs = [], []
    for i in range(n_distinct):
        ids.append(f"s{i:06d}")
        sigs.append(_mix64(i))
    for k in range(n_dup_classes):
        s = _mix64(1_000_000 + k)
        for j in range(dup_members):
            ids.append(f"d{k}_{j}")
            sigs.append(s)
    base = _mix64(2_000_000)
    ids += ["near_a", "near_b"]
    sigs += [base, base ^ 1]
    return pa.table(
        {
            "image_id": pa.array(ids, type=pa.string()),
            "phash_computed": pa.array(
                np.array(sigs, dtype=np.uint64).view(np.int64)
            ),
        }
    )


class TestSignatureNearDupScale:
    def _expected(self, out):
        m = dict(zip(out["image_id"], out["cluster_id"]))
        for k in range(5):
            assert m[f"d{k}_0"] == m[f"d{k}_1"] == m[f"d{k}_2"] == f"d{k}_0"
        assert m["near_a"] == m["near_b"] == "near_a"
        # no singleton leaks into the output
        assert len(out) == 5 * 3 + 2

    def test_driver_map_is_o_duplicated_not_o_distinct(self, ray_session):
        # the r3 weak spot: with 5000 distinct singleton signatures
        # the driver-resident sig->cluster map must stay at the size
        # of the DUPLICATED structure (5 classes + 2 near reps), never
        # the distinct-signature count
        import ray.data

        from maup_ray.media import image as img_mod
        from maup_ray.media.image import signature_near_dup

        ds = ray.data.from_arrow(_sig_dataset()).repartition(8).materialize()
        out = signature_near_dup(ds).to_pandas()
        self._expected(out)
        stats = img_mod.LAST_NEAR_DUP_STATS
        assert stats["path"] == "broadcast"
        # 5 dup classes + 2 edge-bearing reps (+ slack for freak
        # hamming collisions among random sigs) — far below 5000
        assert stats["map_rows"] <= 32

    @pytest.mark.skipif(
        not __import__("os").environ.get("GRAFT_SLOW"),
        reason="shuffle tag-back soak (set GRAFT_SLOW=1)",
    )
    def test_shuffle_tagback_soak(self, ray_session):
        """ROUND_NOTES r4 gap #2: the hash co-shuffle tag-back path at
        real block counts — 300k distinct singletons + 500 dup classes
        over 64 blocks, broadcast_limit=0, verified against the
        broadcast path AND the planted structure."""
        import ray.data

        from maup_ray.media import image as img_mod
        from maup_ray.media.image import signature_near_dup

        n_dup, members = 500, 4
        ds = (
            ray.data.from_arrow(
                _sig_dataset(
                    n_distinct=300_000,
                    n_dup_classes=n_dup,
                    dup_members=members,
                )
            )
            .repartition(64)
            .materialize()
        )
        shuf = (
            signature_near_dup(ds, broadcast_limit=0)
            .to_pandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        assert img_mod.LAST_NEAR_DUP_STATS["path"] == "shuffle"
        m = dict(zip(shuf["image_id"], shuf["cluster_id"]))
        for k in range(n_dup):
            assert all(
                m[f"d{k}_{j}"] == f"d{k}_0" for j in range(members)
            )
        assert m["near_a"] == m["near_b"] == "near_a"
        # no singleton leaked (deterministic sigs: exact count is
        # stable; freak hamming<=3 collisions would show here first)
        assert len(shuf) == n_dup * members + 2
        base = (
            signature_near_dup(ds)
            .to_pandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        assert img_mod.LAST_NEAR_DUP_STATS["path"] == "broadcast"
        import pandas as pd

        pd.testing.assert_frame_equal(base, shuf)

    def test_shuffle_path_equivalence(self, ray_session):
        # broadcast_limit=0 forces the hash co-shuffle tag join — the
        # 100-TB fallback must produce identical clusters
        import ray.data

        from maup_ray.media import image as img_mod
        from maup_ray.media.image import signature_near_dup

        ds = (
            ray.data.from_arrow(_sig_dataset(n_distinct=500))
            .repartition(8)
            .materialize()
        )
        base = (
            signature_near_dup(ds)
            .to_pandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        assert img_mod.LAST_NEAR_DUP_STATS["path"] == "broadcast"
        shuf = (
            signature_near_dup(ds, broadcast_limit=0)
            .to_pandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        assert img_mod.LAST_NEAR_DUP_STATS["path"] == "shuffle"
        import pandas as pd

        pd.testing.assert_frame_equal(base, shuf)
