"""Aspect-ratio bucketing (media/buckets) + shard manifest
(ops/manifest) unit tests — brute-force oracles in plain Python."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.media.buckets import (
    ASPECT_SCALE,
    DEFAULT_BUCKETS,
    aspect_assign,
    aspect_code,
    bucket_sql_values,
)
from maup_ray.ops.manifest import shard_manifest


class TestAspectCode:
    def test_round_half_up(self):
        # 4096*1/1 = 4096 exactly
        assert aspect_code(1024, 1024) == 4096
        # 4096*3/2 = 6144 exactly
        assert aspect_code(1536, 1024) == 6144
        # half case: scale*bw/bh = x.5 rounds UP: 4096*1/8192 = 0.5
        assert aspect_code(1, 8192) == 1

    def test_values_string_matches_constants(self):
        s = bucket_sql_values()
        assert s.count("(") == len(DEFAULT_BUCKETS)
        first_bw, first_bh = DEFAULT_BUCKETS[0]
        assert f"(0, {first_bw}, {first_bh}," in s


class TestAspectAssign:
    def _brute(self, w, h):
        best, bm = None, None
        for j, (bw, bh) in enumerate(DEFAULT_BUCKETS):
            a = aspect_code(bw, bh)
            m = abs(ASPECT_SCALE * w - a * h)
            if bm is None or m < bm:
                best, bm = j, m
        return best, bm

    def test_matches_bruteforce(self):
        rng = np.random.RandomState(7)
        w = rng.randint(64, 4096, size=300).astype(np.int32)
        h = rng.randint(64, 4096, size=300).astype(np.int32)
        t = aspect_assign(pa.table({"w": w, "h": h}))
        jj = t["bucket_id"].to_numpy()
        err = t["bucket_err"].to_numpy()
        for i in range(len(w)):
            bj, bm = self._brute(int(w[i]), int(h[i]))
            assert jj[i] == bj
            assert err[i] == bm

    def test_square_goes_to_square_bucket(self):
        t = aspect_assign(
            pa.table(
                {
                    "w": pa.array([1000], pa.int32()),
                    "h": pa.array([1000], pa.int32()),
                }
            )
        )
        assert t["bucket_w"].to_pylist() == [1024]
        assert t["bucket_h"].to_pylist() == [1024]
        assert t["bucket_err"].to_pylist() == [0]

    def test_tie_breaks_to_smaller_index(self):
        # two synthetic buckets equidistant: craft dims whose aspect is
        # the exact midpoint of buckets 7 (a=3614) and 8 (a=4096):
        # metric_7 == metric_8  <=>  4096*w - 3614*h == 4096*h - 4096*w
        # pick h = 8192, w = (3614+4096)*8192 / (2*4096) = 7710
        t = aspect_assign(
            pa.table(
                {
                    "w": pa.array([7710], pa.int32()),
                    "h": pa.array([8192], pa.int32()),
                }
            )
        )
        a7 = aspect_code(*DEFAULT_BUCKETS[7])
        a8 = aspect_code(*DEFAULT_BUCKETS[8])
        m7 = abs(ASPECT_SCALE * 7710 - a7 * 8192)
        m8 = abs(ASPECT_SCALE * 7710 - a8 * 8192)
        assert m7 == m8  # genuine tie
        assert t["bucket_id"].to_pylist() == [7]

    def test_dataset_path(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "w": pa.array([512, 2048], pa.int32()),
                    "h": pa.array([2048, 512], pa.int32()),
                }
            )
        )
        out = aspect_assign(ds).to_pandas()
        assert sorted(out["bucket_id"].tolist()) == [
            0,
            len(DEFAULT_BUCKETS) - 1,
        ]


class TestShardManifest:
    def _brute(self, ids, lens, cap):
        order = np.argsort(ids)
        shards = {}
        cum = 0
        for i in order:
            sid = cum // cap
            n, b, fi, li = shards.get(sid, (0, 0, None, None))
            shards[sid] = (
                n + 1,
                b + lens[i],
                ids[i] if fi is None else min(fi, ids[i]),
                ids[i] if li is None else max(li, ids[i]),
            )
            cum += lens[i]
        return shards

    def test_matches_bruteforce_across_partitionings(self, ray_session):
        import ray.data

        rng = np.random.RandomState(11)
        n = 500
        ids = [f"id{i:06d}" for i in range(n)]
        lens = rng.randint(10, 900, size=n).astype(np.int64)
        want = self._brute(ids, lens, cap=4000)
        t = pa.table({"id": ids, "blen": lens})
        for parts in (1, 7):
            ds = ray.data.from_arrow(t).repartition(parts)
            out = shard_manifest(ds, "id", "blen", cap=4000)
            got = {
                r["shard_id"]: (
                    r["n_rows"],
                    r["shard_bytes"],
                    r["first_id"],
                    r["last_id"],
                )
                for r in out.to_pylist()
            }
            assert got == want

    def test_shard_spans_blocks_and_row_order_ignored(self, ray_session):
        import ray.data

        # rows arrive REVERSED; manifest must still be id-order
        ids = [f"k{i:03d}" for i in range(100)][::-1]
        lens = np.full(100, 100, dtype=np.int64)
        ds = ray.data.from_arrow(
            pa.table({"id": ids, "blen": lens})
        ).repartition(5)
        out = shard_manifest(ds, "id", "blen", cap=2500)
        assert out["shard_id"].to_pylist() == [0, 1, 2, 3]
        assert out["n_rows"].to_pylist() == [25, 25, 25, 25]
        assert out["shard_bytes"].to_pylist() == [2500] * 4
        assert out["first_id"].to_pylist()[0] == "k000"
        assert out["last_id"].to_pylist()[-1] == "k099"

    def test_empty_input(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "id": pa.array([], pa.string()),
                    "blen": pa.array([], pa.int64()),
                }
            )
        )
        out = shard_manifest(ds, "id", "blen", cap=100)
        assert out.num_rows == 0
        assert out.column_names == [
            "shard_id",
            "n_rows",
            "shard_bytes",
            "first_id",
            "last_id",
        ]

    def test_single_giant_row_gets_own_shard(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "id": ["a", "b", "c"],
                    "blen": pa.array([10, 5000, 10], pa.int64()),
                }
            )
        )
        out = shard_manifest(ds, "id", "blen", cap=100)
        # a: cum_before 0 -> shard 0; b: cum_before 10 -> shard 0
        # (over-cap rows overflow their starting shard — the streaming
        # tar-writer rule); c: cum_before 5010 -> shard 50
        got = {
            r["shard_id"]: r["n_rows"] for r in out.to_pylist()
        }
        assert got == {0: 2, 50: 1}


class TestHotCells:
    def _brute(self, occ):
        # occ: dict (cx,cy) -> w
        out = {}
        for (cx, cy), w in occ.items():
            nbs = [
                occ[(cx + dx, cy + dy)]
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                if (dx, dy) != (0, 0) and (cx + dx, cy + dy) in occ
            ]
            mx = max(nbs) if nbs else 0
            out[(cx, cy)] = (w, len(nbs), mx, w > mx)
        return out

    def test_matches_bruteforce_sparse_grid(self, ray_session):
        import ray.data

        from maup_ray.ops.raster import hot_cells

        rng = np.random.RandomState(3)
        W = 32
        # ~40% occupancy with random weights, includes border cells
        pts = {
            (int(x), int(y)): int(w)
            for x, y, w in zip(
                rng.randint(0, W, 400),
                rng.randint(0, W, 400),
                rng.randint(1, 50, 400),
            )
        }
        occ = dict(pts)
        want = self._brute(occ)
        t = pa.table(
            {
                "cx": pa.array([k[0] for k in occ], pa.int64()),
                "cy": pa.array([k[1] for k in occ], pa.int64()),
                "w": pa.array(list(occ.values()), pa.int64()),
            }
        )
        for parts in (1, 5):
            ds = ray.data.from_arrow(t).repartition(parts)
            out = hot_cells(ds, weight_col="w", width=W).to_pandas()
            got = {
                (r.cx, r.cy): (
                    r.w,
                    r.n_neighbors,
                    r.max_neighbor_w,
                    r.is_hot,
                )
                for r in out.itertuples()
            }
            assert got == want

    def test_isolated_cell_is_hot(self, ray_session):
        import ray.data

        from maup_ray.ops.raster import hot_cells

        t = pa.table(
            {
                "cx": pa.array([0, 5], pa.int64()),
                "cy": pa.array([0, 5], pa.int64()),
            }
        )
        out = hot_cells(
            ray.data.from_arrow(t), width=16
        ).to_pandas().sort_values("cx")
        assert out["is_hot"].tolist() == [True, True]
        assert out["n_neighbors"].tolist() == [0, 0]
        assert out["_w"].tolist() == [1, 1]
