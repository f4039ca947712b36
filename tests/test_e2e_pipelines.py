"""End-to-end reference pipelines E1/E2 on F7-shaped synthetic tables
(ref: README.md:96-107, tests/test_prorate.py:76-105).

E1: assign blocks → precincts, aggregate populations, conservation.
E2: old→new precinct proration through block-weighted pieces —
including the closure property (the pieces table feeds back in as a
target geometry table, SURVEY §3 E2 note).
"""

import numpy as np
import pyarrow as pa
import pytest

import maup_ray
from maup_ray.geom import encode_polygon
from maup_ray.synth.districts import jittered_grid


def _blocks(k=16, seed=11, scale=8.0):
    """k×k tiny blocks tiling [0,scale)² with integer populations."""
    rng = np.random.RandomState(seed)
    ids, geoms, pops = [], [], []
    step = scale / k
    for i in range(k):
        for j in range(k):
            x0, y0 = i * step, j * step
            ids.append(f"b{i:02d}{j:02d}")
            geoms.append(
                encode_polygon(
                    [
                        np.array(
                            [
                                [x0, y0],
                                [x0 + step, y0],
                                [x0 + step, y0 + step],
                                [x0, y0 + step],
                            ]
                        )
                    ]
                )
            )
            pops.append(int(rng.randint(0, 100)))
    return pa.table(
        {
            "block_id": ids,
            "geometry": pa.array(geoms, type=pa.binary()),
            "TOTPOP": pa.array(pops, type=pa.int64()),
        }
    )


@pytest.fixture(scope="module")
def f7():
    blocks = _blocks()
    old_precincts = jittered_grid(k=4, seed=3, jitter=0.05, scale=2.0)
    new_precincts = jittered_grid(k=4, seed=9, jitter=0.05, scale=2.0)
    return blocks, old_precincts, new_precincts


class TestE1:
    def test_assign_and_aggregate_conserves(self, ray_session, f7):
        import ray.data

        blocks, old_p, _ = f7
        ds = ray.data.from_arrow(blocks)
        assigned = maup_ray.assign(
            ds,
            old_p,
            source_id_col="block_id",
            target_id_col="precinct_id",
            targets_id_col="precinct_id",
            keep_cols=("TOTPOP",),
        )
        from ray.data.aggregate import Sum

        agg = (
            assigned.groupby("precinct_id")
            .aggregate(Sum(on="TOTPOP", alias_name="TOTPOP"))
            .to_pandas()
        )
        # every block lands somewhere (precinct grid covers the blocks)
        assert agg["TOTPOP"].sum() == blocks["TOTPOP"].to_pandas().sum()
        assert agg["precinct_id"].notna().all()


class TestE2:
    def test_prorate_old_to_new_via_block_weights(self, ray_session, f7):
        import ray.data

        blocks, old_p, new_p = f7
        # pieces = intersections(old, new)
        pieces = maup_ray.intersections(
            old_p.rename_columns(["source_id", "geometry"]),
            new_p.rename_columns(["target_id", "geometry"]),
            area_cutoff=0.0,
        )
        # closure: pieces become a TARGET table for block assignment
        piece_ids = [
            f"{s}|{t}"
            for s, t in zip(
                pieces["source_id"].to_pylist(),
                pieces["target_id"].to_pylist(),
            )
        ]
        pieces_tbl = pa.table(
            {
                "piece_id": piece_ids,
                "geometry": pieces["geometry"],
            }
        )
        ds = ray.data.from_arrow(blocks)
        b2p = maup_ray.assign(
            ds,
            pieces_tbl,
            source_id_col="block_id",
            target_id_col="piece_id",
            targets_id_col="piece_id",
            keep_cols=("TOTPOP",),
        )
        from ray.data.aggregate import Sum

        bweights = (
            b2p.groupby("piece_id")
            .aggregate(Sum(on="TOTPOP", alias_name="weight"))
            .to_pandas()
        )
        bweights = bweights[bweights["piece_id"].notna()]
        sp = bweights["piece_id"].str.split("|", expand=True)
        rel = pa.table(
            {
                "source_id": sp[0].tolist(),
                "target_id": sp[1].tolist(),
                "weight": bweights["weight"].astype(float).tolist(),
            }
        )
        weights = maup_ray.normalize(rel, level="source_id")
        # old precinct data: population = grouped block pops by E1 assign
        old_assigned = maup_ray.assign(
            ray.data.from_arrow(blocks),
            old_p,
            source_id_col="block_id",
            target_id_col="precinct_id",
            targets_id_col="precinct_id",
            keep_cols=("TOTPOP",),
        )
        old_pop = (
            old_assigned.groupby("precinct_id")
            .aggregate(Sum(on="TOTPOP", alias_name="SEN18D"))
            .to_pandas()
        )
        data = pa.table(
            {
                "source_id": old_pop["precinct_id"].tolist(),
                "SEN18D": old_pop["SEN18D"].astype(float).tolist(),
            }
        )
        out = maup_ray.prorate(weights, data, ["SEN18D"])
        # conservation within rounding (ref: tests/test_prorate.py:100-105)
        assert out["SEN18D"].to_pandas().sum() == pytest.approx(
            float(blocks["TOTPOP"].to_pandas().sum()), rel=1e-9
        )


class TestSessions:
    def test_gap_sessionization(self, ray_session):
        import pandas as pd

        from maup_ray.ops.sessions import sessionize

        ts = pd.to_datetime(
            [
                "2024-01-01 00:00", "2024-01-01 00:10",  # session 1
                "2024-01-01 01:00",                        # session 2 (50min gap)
                "2024-01-01 01:20", "2024-01-01 01:49",  # session 2 cont.
            ]
        )
        t = pa.table(
            {
                "user_id": pa.array([7] * 5, type=pa.int64()),
                "ts": pa.array(ts),
            }
        )
        out = sessionize(t, gap_minutes=30).to_pydict()
        assert out["session_id"] == [1, 2]
        assert out["n_events"] == [2, 3]


class TestRepairQueryPinnedHashes:
    """VERDICT r3 #9: the rows-only repair queries return rich tables
    (area / n_parts / perimeter / rook-neighbor sets; doctor adds
    full-precision total and union areas) whose content hashes are
    pinned here — a regression in any repair kernel flips the hash
    even though the driver has no SQL oracle for these queries."""

    @staticmethod
    def _h(t):
        import hashlib

        df = t.to_pandas()
        cols = sorted(df.columns)
        df = df[cols].sort_values(cols).reset_index(drop=True)
        return hashlib.sha256(
            df.to_csv(index=False, float_format="%.17g").encode()
        ).hexdigest()[:16]

    def test_quick_repair_pinned(self):
        from maup_ray.pipelines import q_quick_repair

        t = q_quick_repair("/root/testdata/sf0.001")
        assert t.num_rows == 25
        assert set(t.column_names) == {
            "id", "area", "n_parts", "perimeter", "neighbors"
        }
        assert self._h(t) == "c2f47f5a58386559"

    def test_smart_repair_pinned(self):
        from maup_ray.pipelines import q_smart_repair

        t = q_smart_repair("/root/testdata/sf0.001")
        assert t.num_rows == 25
        assert self._h(t) == "d29d7996cf8a5546"

    def test_doctor_pinned(self):
        from maup_ray.pipelines import q_doctor

        t = q_doctor("/root/testdata/sf0.001")
        df = t.to_pandas().set_index("stage")
        # quick_repair's hairline weld removes engine-specific seam
        # overlaps; the one survivor (10 -> 1) is reference-faithful:
        # pairwise overlap pieces re-absorbed independently can
        # double-assign a 3+-fold corner region (the reference's
        # resolve_overlaps has the identical property — that's why
        # smart_repair exists)
        assert df.loc["pre", "n_overlaps"] > df.loc["post", "n_overlaps"]
        assert df.loc["post", "n_overlaps"] <= 1
        assert df.loc["post", "total_area"] == pytest.approx(
            df.loc["post", "union_area"], abs=1e-2
        )
        # Pin history: d69f12/dacc7b flip-flopped across sessions
        # because ring_signed_area used BLAS ddot (`x @ y`) whose
        # partial-sum order depends on the host's dispatched OpenBLAS
        # kernel (OPENBLAS_CORETYPE=SKYLAKEX reproduced dacc7b on a
        # d69f12 host, bit-for-bit). The shoelace is now np.sum-based
        # (architecture-independent pairwise tree); this pin is
        # verified IDENTICAL under OPENBLAS_CORETYPE ∈ {default,
        # HASWELL, SKYLAKEX, NEHALEM, PRESCOTT} and PYTHONHASHSEED
        # ∈ {0,1,12345}. If it ever breaks again, suspect a new
        # BLAS-routed reduction on non-dyadic floats.
        assert self._h(t) == "b7dfcbde4ca580a1"

    def test_embed_prune_pinned(self, ray_session):
        """ROUND_NOTES r5 candidate #4: embed_prune is rows-only at the
        driver, so pin its full value content here (k-means centroids +
        cluster assignment + keep/dup_of through the hash shuffle are
        all deterministic by construction)."""
        from maup_ray.pipelines import q_embed_prune

        t = q_embed_prune("/root/testdata/sf0.001")
        df = t.to_pandas()
        assert len(df) == 500
        assert self._h(t) == "4d2af23bebb7041d"

    def test_embed_pca_pinned(self, ray_session):
        """embed_pca is rows-only at the driver; its scores are
        bit-deterministic by construction (exact-integer covariance +
        fixed-order projection accumulation — no BLAS gemm), so the
        full value content pins here."""
        from maup_ray.pipelines import q_embed_pca

        t = q_embed_pca("/root/testdata/sf0.001")
        df = t.to_pandas()
        assert len(df) == 500
        assert set(df.columns) == {"vec_id", "pc1", "pc2"}
        assert self._h(t) == "06c298abc547f3da"

    def test_embed_cluster_pinned(self, ray_session):
        from maup_ray.pipelines import q_embed_cluster

        # hash verified identical in fresh num_cpus=4 AND num_cpus=8
        # sessions: the sim column uses det_sims (ufunc row-reduce),
        # not BLAS dgemm whose rounding varies with batch shape
        t = q_embed_cluster("/root/testdata/sf0.001")
        df = t.to_pandas()
        assert len(df) == 500
        assert self._h(t) == "abe342c6d8e578d1"


class TestTopUnshippedPlans:
    def test_coshuffle_matches_broadcast(self, ray_session):
        """broadcast_limit=0 forces the corpus-sized co-shuffle plan
        (Dataset hash joins); it must equal the broadcast plan row for
        row — same integer revenue, same top-N order."""
        from maup_ray.pipelines import q_top_unshipped

        a = q_top_unshipped("/root/testdata/sf0.001").to_pandas()
        b = q_top_unshipped(
            "/root/testdata/sf0.001", broadcast_limit=0
        ).to_pandas()
        import pandas as pd

        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )


class TestLocalVolumePlans:
    def test_coshuffle_matches_broadcast(self, ray_session):
        """Q5's one corpus-sized join (lineitem ⋈ orders) on the
        Dataset co-shuffle plan (broadcast_limit=0) must match the
        driver-table broadcast plan exactly — integer revenue sums are
        order-independent, so the plans can't legitimately differ."""
        from maup_ray.pipelines import q_local_volume

        a = q_local_volume("/root/testdata/sf0.001").to_pandas()
        b = q_local_volume(
            "/root/testdata/sf0.001", broadcast_limit=0
        ).to_pandas()
        import pandas as pd

        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )


class TestHoppingWindow:
    def test_brute_force_and_exactness(self, ray_session):
        """Each event lands in exactly HOP_K windows; sums are exact
        integer cents (brute force over the sf0.001 events table)."""
        import pyarrow.parquet as pq

        from maup_ray.pipelines import HOP_K, HOP_US, q_hopping

        t = q_hopping("/root/testdata/sf0.001")
        df = t.to_pandas().set_index("win_start_us").sort_index()
        ev = pq.read_table(
            "/root/testdata/sf0.001/events.parquet",
            columns=["ts", "value"],
        ).to_pandas()
        ep = ev["ts"].astype("int64")
        cents = (ev["value"] * 100.0).round().astype("int64")
        from collections import defaultdict

        sums = defaultdict(int)
        cnts = defaultdict(int)
        for e, c in zip(ep, cents):
            wi = e // HOP_US
            for j in range(HOP_K):
                sums[(wi - j) * HOP_US] += int(c)
                cnts[(wi - j) * HOP_US] += 1
        assert df["n_events"].sum() == len(ev) * HOP_K
        for w, row in df.iterrows():
            assert row["value_cents"] == sums[w], w
            assert row["n_events"] == cnts[w], w


class TestCentroidSim:
    def test_matches_numpy_brute(self, ray_session):
        """Independent brute force: quantize embeddings exactly like
        the pipeline, centroid-sum per label in Python ints, and
        reproduce the fixed IEEE chain bit-for-bit."""
        import math

        import pyarrow.parquet as pq

        from maup_ray.pipelines import EMB_QSCALE, q_centroid_sim

        got = q_centroid_sim("/root/testdata/sf0.001").to_pylist()
        raw = pq.read_table(
            "/root/testdata/sf0.001/embeddings.parquet",
            columns=["label", "embedding"],
        )
        lab = raw["label"].to_numpy(zero_copy_only=False)
        emb = np.asarray(raw["embedding"].to_pylist(), dtype=np.float64)
        q = np.floor(emb * EMB_QSCALE).astype(np.int64)
        sums = {}
        for lb in np.unique(lab):
            sums[int(lb)] = [int(x) for x in q[lab == lb].sum(axis=0)]
        want = {}
        keys = sorted(sums)
        for i, a in enumerate(keys):
            na = sum(x * x for x in sums[a])
            for b in keys[i + 1:]:
                nb = sum(x * x for x in sums[b])
                d = sum(x * y for x, y in zip(sums[a], sums[b]))
                want[(a, b)] = (
                    float(d),
                    float(d) / (math.sqrt(float(na)) * math.sqrt(float(nb))),
                )
        assert len(got) == len(want)
        for r in got:
            wd, wc = want[(r["label_a"], r["label_b"])]
            assert r["dot"] == wd and r["cos"] == wc


class TestImpute:
    def test_fill_semantics(self, ray_session):
        """Missing rows carry their type's exact lower median of the
        present values; present rows pass through untouched."""
        import pyarrow.parquet as pq

        from maup_ray.pipelines import IMPUTE_MOD, q_impute

        got = q_impute("/root/testdata/sf0.001").to_pandas()
        raw = pq.read_table(
            "/root/testdata/sf0.001/events.parquet",
            columns=["event_id", "event_type", "value"],
        ).to_pandas()
        raw["v"] = (raw.value * 100).round().astype(np.int64)
        raw["miss"] = (raw.event_id % IMPUTE_MOD == 0).astype(int)
        med = {}
        for t, g in raw[raw.miss == 0].groupby("event_type"):
            v = np.sort(g.v.to_numpy())
            med[t] = int(v[int(np.ceil(len(v) / 2)) - 1])  # ceil(n/2)
        merged = got.merge(raw, on="event_id", suffixes=("", "_raw"))
        assert (merged.was_missing == merged.miss).all()
        present = merged[merged.miss == 0]
        assert (present.v_filled == present.v).all()
        missing = merged[merged.miss == 1]
        assert len(missing) > 0
        want = missing.event_type.map(med)
        assert (missing.v_filled == want).all()
