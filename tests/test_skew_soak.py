"""GRAFT_SLOW skew soaks for the keyed-shuffle family (VERDICT r4 #6):
a planted-zipf key owning ~30% of 4M rows, driven through (a) the
salted two-stage grouped-sum plan vs the unsalted single-stage plan
(result equality + wall-time delta printed for BASELINE.md) and (b)
sessionize, whose hot user must neither stall nor wrong-count.

All per-partition fns are built INSIDE the tests so cloudpickle ships
them by value — pytest test modules are not importable from Ray worker
processes (the classic ModuleNotFoundError retry-hang)."""

import os
import time

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("GRAFT_SLOW"),
    reason="skew scale soaks (set GRAFT_SLOW=1)",
)

N = 32_000_000
N_KEYS = 50_000


class TestSaltedShuffleSkew:
    def test_salted_plan_matches_unsalted(self, ray_session):
        import ray
        import ray.data

        from maup_ray.ops.shuffle import hash_group_apply, salt_keys

        def gen(b: pa.Table) -> pa.Table:
            i = b["id"].to_numpy()
            # hot iff i % 10 < 3 (multiplier ≡ 1 mod 10) → exactly
            # 30% of rows land on key 7 (plus any cold rows whose
            # affine key happens to be 7)
            hot = (i * 2654435761 % 10) < 3
            k = np.where(hot, 7, (i * 48271 + 11) % N_KEYS)
            return pa.table(
                {
                    "k": pa.array(k.astype(np.int64)),
                    "v": pa.array((i % 1000).astype(np.int64)),
                }
            )

        ds = ray.data.range(N).map_batches(
            gen, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

        def sum_part(tbl, starts):
            if tbl is None or tbl.num_rows == 0:
                return pa.table(
                    {
                        "k": pa.array([], type=pa.int64()),
                        "s": pa.array([], type=pa.int64()),
                        "n": pa.array([], type=pa.int64()),
                    }
                )
            starts = np.asarray(starts, dtype=np.int64)
            k = tbl["k"].to_numpy(zero_copy_only=False)
            v = tbl["v"].to_numpy(zero_copy_only=False)
            sizes = np.diff(np.append(starts, tbl.num_rows))
            return pa.table(
                {
                    "k": pa.array(k[starts]),
                    "s": pa.array(
                        np.add.reduceat(v, starts).astype(np.int64)
                    ),
                    "n": pa.array(sizes.astype(np.int64)),
                }
            )

        def merge_part(tbl, starts):
            if tbl is None or tbl.num_rows == 0:
                return pa.table(
                    {
                        "k": pa.array([], type=pa.int64()),
                        "s": pa.array([], type=pa.int64()),
                        "n": pa.array([], type=pa.int64()),
                    }
                )
            starts = np.asarray(starts, dtype=np.int64)
            k = tbl["k"].to_numpy(zero_copy_only=False)
            s = tbl["s"].to_numpy(zero_copy_only=False)
            n = tbl["n"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "k": pa.array(k[starts]),
                    "s": pa.array(
                        np.add.reduceat(s, starts).astype(np.int64)
                    ),
                    "n": pa.array(
                        np.add.reduceat(n, starts).astype(np.int64)
                    ),
                }
            )

        t0 = time.time()
        unsalted = (
            hash_group_apply(ds, ["k"], sum_part)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        t_unsalted = time.time() - t0

        def sum_part_kv(tbl, starts):
            return sum_part(
                tbl.select(["k", "v"]) if tbl is not None else None,
                starts,
            )

        t0 = time.time()
        salted_stage1 = hash_group_apply(
            salt_keys(ds, ["k"], buckets=32), ["k", "_salt"],
            sum_part_kv,
        )
        salted = (
            hash_group_apply(salted_stage1, ["k"], merge_part)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        t_salted = time.time() - t0

        assert salted.equals(unsalted)
        hot = unsalted[unsalted["k"] == 7]
        assert int(hot["n"].iloc[0]) >= int(N * 0.29)
        assert int(unsalted["n"].sum()) == N
        print(
            f"\n[skew-soak] unsalted={t_unsalted:.2f}s "
            f"salted={t_salted:.2f}s "
            f"hot_rows={int(hot['n'].iloc[0])}/{N}"
        )


class TestSessionizeSkew:
    def test_hot_user_sessions_exact(self, ray_session):
        """sessionize with one user owning ~30% of rows: the hot
        user's whole timeline lands in one partition (inherent to
        per-user semantics) — the soak proves the partition survives
        and counts are exact. Hot iff i % 10 < 3, so hot events sit
        at i minutes with gaps ≤ 8 min < the 30-min threshold → the
        hot user forms exactly ONE session."""
        import ray
        import ray.data

        from maup_ray.ops.sessions import sessionize

        n = 2_000_000
        step_us = 60 * 1_000_000  # 1 min between hot events

        def gen(b: pa.Table) -> pa.Table:
            i = b["id"].to_numpy()
            hot = (i * 2654435761 % 10) < 3
            u = np.where(hot, 7, 1000 + (i * 48271 + 11) % 1000)
            t = np.where(
                hot,
                i.astype(np.int64) * step_us,
                (i % 97).astype(np.int64) * 3600 * 1_000_000,
            )
            return pa.table(
                {
                    "user_id": pa.array(u.astype(np.int64)),
                    "ts": pa.array(t).cast(pa.timestamp("us")),
                }
            )

        ds = ray.data.range(n).map_batches(
            gen, batch_format="pyarrow", zero_copy_batch=True
        )
        t0 = time.time()
        out = sessionize(ds, gap_minutes=30.0).to_pandas()
        wall = time.time() - t0
        hot = out[out["user_id"] == 7]
        n_hot_rows = int(hot["n_events"].sum())
        assert n_hot_rows >= int(n * 0.29)
        assert len(hot) == 1
        print(f"\n[skew-soak] sessionize wall={wall:.2f}s "
              f"hot_rows={n_hot_rows}")
