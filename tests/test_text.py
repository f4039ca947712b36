"""Text analysis + dedup tests (brute-force oracles on tiny corpora)."""

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.text.analysis import (
    fingerprint_batch,
    langid_batch,
    quality_batch,
    token_count_batch,
)
from maup_ray.text.dedup import (
    char_shingle_hashes,
    minhash_signatures_batch,
    ngram_jaccard,
    simhash_batch,
    text_hash_batch,
)


def docs(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": texts,
        }
    )


class TestAnalysis:
    def test_token_count(self):
        t = docs(["a b  c", "  x ", "one"])
        out = token_count_batch(t).to_pydict()
        assert out["n_tokens"] == [3, 1, 1]

    def test_quality(self):
        t = docs(["the cat and the dog"])
        out = quality_batch(t).to_pydict()
        assert out["n_tokens"] == [5]
        assert out["n_chars"] == [19]
        assert out["mean_token_len"][0] == 15 / 5
        assert out["stopword_ratio"][0] == pytest.approx(3 / 5)

    def test_langid(self):
        t = docs(
            [
                "the cat is in the house and it was good",
                "el perro y la casa de un amigo con los gatos",
                "zzz qqq www",
            ]
        )
        out = langid_batch(t).to_pydict()
        assert out["lang_pred"] == ["en", "es", "und"]

    def test_fingerprint_deterministic_distinct(self):
        t = docs(["hello world", "hello world", "hello worle"])
        out = fingerprint_batch(t).to_pydict()["fingerprint"]
        assert out[0] == out[1] and out[0] != out[2]


class TestDedup:
    def test_text_hash_collision_free_here(self):
        t = docs(["a", "b", "a"])
        out = text_hash_batch(t).to_pydict()["text_hash"]
        assert out[0] == out[2] != out[1]

    def test_shingles_and_jaccard(self):
        a = "the quick brown fox jumps over the lazy dog"
        assert ngram_jaccard(a, a) == 1.0
        near = a.replace("lazy", "hazy")
        far = "completely different text with other content"
        assert ngram_jaccard(a, near) > 0.6 > ngram_jaccard(a, far)

    def test_minhash_estimates_jaccard(self):
        a = "the quick brown fox jumps over the lazy dog " * 3
        near = a.replace("dog", "cat")
        far = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 3
        t = docs([a, near, far])
        sig = minhash_signatures_batch(t, num_perm=128)
        s = [np.array(x, dtype=np.int64) for x in sig["sig"].to_pylist()]
        est_near = (s[0] == s[1]).mean()
        est_far = (s[0] == s[2]).mean()
        true_near = ngram_jaccard(a, near)
        assert abs(est_near - true_near) < 0.15
        assert est_far < 0.1 < est_near

    def test_simhash_near_vs_far(self):
        a = "the quick brown fox jumps over the lazy dog " * 2
        near = a.replace("dog", "cat")
        far = "argument semantic lattice quantum entropy vector basis"
        out = simhash_batch(docs([a, near, far])).to_pydict()["simhash"]

        def ham(x, y):
            return bin(int(np.uint64(x) ^ np.uint64(y))).count("1")

        assert ham(out[0], out[1]) < ham(out[0], out[2])

    def test_exact_dedup_dataset(self, ray_session):
        import ray
        import ray.data

        from maup_ray.text.dedup import exact_dedup

        t = docs(["x", "y", "x", "z", "y", "x"])
        out = exact_dedup(ray.data.from_arrow(t)).to_pandas()
        assert sorted(out["doc_id"]) == [0, 1, 3]

    def test_exact_dedup_keep_text(self, ray_session):
        import ray.data

        from maup_ray.text.dedup import exact_dedup

        t = docs(["x", "y", "x", "z"])
        out = exact_dedup(
            ray.data.from_arrow(t), keep_text=True
        ).to_pandas()
        got = dict(zip(out["doc_id"], out["text"]))
        assert got == {0: "x", 1: "y", 3: "z"}

    def test_minhash_candidates_dataset(self, ray_session):
        import ray.data

        from maup_ray.text.dedup import minhash_candidates

        a = "the quick brown fox jumps over the lazy dog " * 3
        texts = [a, a.replace("dog", "cat"), "totally other stuff here now"]
        out = minhash_candidates(
            ray.data.from_arrow(docs(texts)), min_est_jaccard=0.5
        ).to_pandas()
        got = set(zip(out["doc_i"], out["doc_j"]))
        assert (0, 1) in got
        assert (0, 2) not in got and (1, 2) not in got


class TestANN:
    def test_brute_topk_matches_numpy(self, ray_session):
        import ray.data

        from maup_ray.vector.ann import brute_topk

        rng = np.random.RandomState(5)
        emb = rng.normal(size=(100, 16)).astype(np.float32)
        corpus = pa.table(
            {
                "vec_id": pa.array(range(10, 100), type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, e)) for e in emb[10:]],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        queries = pa.table(
            {
                "query_id": pa.array(range(3), type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, e)) for e in emb[:3]],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        out = brute_topk(
            ray.data.from_arrow(corpus), queries, k=4
        ).to_pandas()
        # numpy oracle
        E = emb.astype(np.float64)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        sims = En[:3] @ En[10:].T
        for q in range(3):
            want = (np.argsort(-sims[q], kind="stable")[:4] + 10).tolist()
            got = (
                out[out.query_id == q]
                .sort_values("rank")["vec_id"]
                .tolist()
            )
            assert got == want

    def test_lsh_finds_planted_near_duplicates(self, ray_session):
        # the near-dup retrieval use case: corpus contains a noisy copy
        # of each query; LSH must surface it as the top hit
        import ray.data

        from maup_ray.vector.ann import lsh_topk

        rng = np.random.RandomState(6)
        base = rng.normal(size=(5, 16))
        noise = rng.normal(size=(190, 16))
        corpus_vecs = np.vstack(
            [base + rng.normal(scale=0.05, size=base.shape), noise]
        )
        corpus = pa.table(
            {
                "vec_id": pa.array(range(100, 100 + 195), type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, e)) for e in corpus_vecs],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        queries = pa.table(
            {
                "query_id": pa.array(range(5), type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, e)) for e in base],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        approx = lsh_topk(
            ray.data.from_arrow(corpus), queries, k=3, n_planes=8
        ).to_pandas()
        found = 0
        for q in range(5):
            tops = approx[approx.query_id == q].sort_values("rank")
            if len(tops) and tops["vec_id"].iloc[0] == 100 + q:
                found += 1
        assert found >= 4  # planted copy retrieved as top-1 for most


class TestMedia:
    def test_phash_and_payload_fidelity(self):
        from maup_ray.media.image import PhashStage, decode_raw_batch
        from maup_ray.synth.images import image_table

        t = image_table(16)
        imgs = decode_raw_batch(t)
        # raw payload round-trips byte-exactly (PSNR invariant degenerate)
        assert imgs[0].tobytes() == t["bytes"][0].as_py()
        out = PhashStage()(t)
        assert out.num_rows == 16
        assert out["phash_computed"].null_count == 0

    def test_resize(self):
        from maup_ray.media.image import ResizeStage, decode_raw_batch
        from maup_ray.synth.images import image_table

        t = image_table(4)
        out = ResizeStage(8, 8)(t)
        imgs = decode_raw_batch(out)
        assert imgs[0].shape == (8, 8, 3)
        assert out["caption"].to_pylist() == t["caption"].to_pylist()

    def test_unsupported_fmt_stub(self):
        # png and jpeg now decode through the from-scratch codecs;
        # formats needing a real codec lib (video containers, webp)
        # still raise the documented stub error
        import pyarrow as pa

        from maup_ray.media.image import decode_raw_batch
        from maup_ray.synth.images import image_table

        t = image_table(2)
        t = t.set_column(
            t.column_names.index("fmt"), "fmt", pa.array(["webp", "raw"])
        )
        with pytest.raises(NotImplementedError):
            decode_raw_batch(t)


class TestIVF:
    def test_ivf_finds_planted_near_duplicates(self, ray_session):
        import ray.data

        from maup_ray.vector.ann import ivf_topk

        rng = np.random.RandomState(8)
        base = rng.normal(size=(5, 16))
        noise = rng.normal(size=(300, 16))
        corpus_vecs = np.vstack(
            [base + rng.normal(scale=0.05, size=base.shape), noise]
        )
        corpus = pa.table(
            {
                "vec_id": pa.array(
                    range(100, 100 + len(corpus_vecs)), type=pa.int64()
                ),
                "embedding": pa.array(
                    [list(map(float, e)) for e in corpus_vecs],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        queries = pa.table(
            {
                "query_id": pa.array(range(5), type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, e)) for e in base],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        out = ivf_topk(
            ray.data.from_arrow(corpus), queries, k=3,
            n_centroids=16, n_probe=4,
        ).to_pandas()
        found = 0
        for q in range(5):
            tops = out[out.query_id == q].sort_values("rank")
            if len(tops) and tops["vec_id"].iloc[0] == 100 + q:
                found += 1
        assert found >= 4


class TestCosineNearDup:
    def test_exact_pairs_match_numpy(self, ray_session):
        import ray.data

        from maup_ray.vector.ann import cosine_near_dup, embedding_matrix

        rng = np.random.RandomState(5)
        n, d = 300, 32
        base = rng.normal(size=(n, d))
        # plant 10 near-dup pairs
        for i in range(10):
            base[n - 1 - i] = base[i] + rng.normal(scale=0.05, size=d)
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(n), type=pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in base],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        m = embedding_matrix(t)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = mn @ mn.T
        ii, jj = np.nonzero(
            (sims >= 0.9) & (np.arange(n)[:, None] < np.arange(n)[None, :])
        )
        want = set(zip(ii.tolist(), jj.tolist()))
        out = cosine_near_dup(
            ray.data.from_arrow(t).repartition(4), threshold=0.9
        ).to_pandas()
        got = set(zip(out["id_i"], out["id_j"]))
        assert got == want and len(want) >= 10

    def test_lsh_mode_recall(self, ray_session):
        import ray.data

        from maup_ray.vector.ann import cosine_near_dup, embedding_matrix

        rng = np.random.RandomState(6)
        n, d = 300, 32
        base = rng.normal(size=(n, d))
        for i in range(15):
            base[n - 1 - i] = base[i] + rng.normal(scale=0.03, size=d)
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(n), type=pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in base],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        ds = ray.data.from_arrow(t).repartition(4)
        exact = cosine_near_dup(ds, threshold=0.95).to_pandas()
        want = set(zip(exact["id_i"], exact["id_j"]))
        lsh = cosine_near_dup(
            ds, threshold=0.95, mode="lsh", n_planes=6, n_bands=8
        ).to_pandas()
        got = set(zip(lsh["id_i"], lsh["id_j"]))
        assert got <= want  # no false positives (exact verify in-bucket)
        assert len(got) >= 0.8 * len(want)  # recall
        assert len(want) >= 15


class TestImagePipelineE2E:
    def test_caption_and_pixel_fidelity_through_pipeline(self, ray_session):
        """North-star invariant at pipeline level: captions ride the
        whole distributed pipeline exactly; raw pixel payloads stay
        byte-identical through map stages (PSNR invariant degenerate
        for fmt=raw); phash-derived coords drive district assignment."""
        import ray.data

        from maup_ray.media.image import PhashStage
        from maup_ray.ops.assign import assign
        from maup_ray.synth.districts import district_table
        from maup_ray.synth.images import (
            gen_image_batch,
            image_dataset,
            image_table,
            phash_xy,
        )

        n = 512
        ds = image_dataset(n)

        def derive(batch: pa.Table) -> pa.Table:
            x, y = phash_xy(batch["phash"].to_numpy())
            return pa.table(
                {
                    "source_id": pc_index(batch["image_id"]),
                    "image_id": batch["image_id"],
                    "caption": batch["caption"],
                    "bytes": batch["bytes"],
                    "x": pa.array(x),
                    "y": pa.array(y),
                }
            )

        import pyarrow.compute as pc

        def pc_index(ids):
            # image_id strings are "img%012d" — numeric suffix
            return pa.array(
                [int(s[3:]) for s in ids.to_pylist()],
                type=pa.int64(),
            )

        pts = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        out = assign(
            pts,
            district_table(64),
            keep_cols=("caption", "bytes"),
            source_id_col="source_id",
            targets_id_col="district_id",
        ).to_pandas()
        assert len(out) == n
        assert out["target_id"].notna().all()
        # caption equality + pixel byte equality vs the deterministic
        # reference generator, row by row
        ref = image_table(n)
        ref_cap = dict(
            zip(
                (int(s[3:]) for s in ref["image_id"].to_pylist()),
                ref["caption"].to_pylist(),
            )
        )
        ref_bytes = dict(
            zip(
                (int(s[3:]) for s in ref["image_id"].to_pylist()),
                (b.as_py() for b in ref["bytes"]),
            )
        )
        for sid, cap, blob in zip(
            out["source_id"], out["caption"], out["bytes"]
        ):
            assert cap == ref_cap[int(sid)]
            assert bytes(blob) == ref_bytes[int(sid)]


class TestImageStats:
    def test_matches_per_row_decode(self, ray_session):
        import ray.data

        from maup_ray.media.image import ImageStatsStage, decode_raw_batch
        from maup_ray.synth.images import image_dataset, image_table

        t = image_table(32)
        out = ImageStatsStage()(t).to_pandas()
        imgs = decode_raw_batch(t)
        for k in range(32):
            px = imgs[k].reshape(-1, 3).astype(np.float64)
            assert out["mean_r"][k] == px[:, 0].mean()
            assert out["std_b"][k] == px[:, 2].std()
        # dataset path streams
        ds = image_dataset(256).map_batches(
            ImageStatsStage, batch_format="pyarrow", zero_copy_batch=True,
            concurrency=2,
        )
        assert ds.count() == 256


class TestIVFSampleBias:
    def test_id_sorted_corpus_quantizer_not_head_biased(self, ray_session):
        # adversarial layout: the first `sample_size` rows are ONE
        # tight cluster. A head-of-dataset sample (ds.limit) trains
        # every centroid on that cluster and silently loses recall on
        # the rest of the corpus; the hash sample sees a cross-section
        import ray.data

        from maup_ray.vector.ann import ivf_topk

        rng = np.random.RandomState(21)
        head_dir = rng.normal(size=16)
        head = head_dir + rng.normal(scale=0.01, size=(500, 16))
        base = rng.normal(size=(5, 16))
        tail = np.vstack(
            [rng.normal(size=(495, 16)),
             base + rng.normal(scale=0.05, size=base.shape)]
        )
        corpus_vecs = np.vstack([head, tail])  # planted dups at the END
        corpus = pa.table(
            {
                "vec_id": pa.array(
                    range(len(corpus_vecs)), type=pa.int64()
                ),
                "embedding": pa.array(
                    [list(map(float, e)) for e in corpus_vecs],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        queries = pa.table(
            {
                "query_id": pa.array(range(5), type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, e)) for e in base],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        out = ivf_topk(
            ray.data.from_arrow(corpus).repartition(8),
            queries,
            k=3,
            n_centroids=8,
            n_probe=3,
            sample_size=64,
        ).to_pandas()
        found = 0
        planted0 = len(corpus_vecs) - 5
        for q in range(5):
            tops = out[out.query_id == q].sort_values("rank")
            if len(tops) and tops["vec_id"].iloc[0] == planted0 + q:
                found += 1
        assert found >= 4


class TestRedactPII:
    def test_edge_cases_match_duckdb(self, ray_session):
        import duckdb

        from maup_ray.text.analysis import PII_PATTERNS, redact_pii

        texts = [
            "mail me at john.doe+spam@sub.example.co.uk or 10.0.42.7 ok",
            "call +12345678901 or 555-123-4567; ip 999.1.2.3 borderline",
            "no pii here, just 3.14 and version 1.2.3.4 hmm",
            "a@b.io x@y.z 192.168.0.1",
            "",
        ]
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
        got = redact_pii(t).to_pandas()
        (email, e_tok), (ip, i_tok), (phone, p_tok) = PII_PATTERNS
        want = duckdb.connect().execute(
            f"""
            SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(text,
                '{email}', '{e_tok}', 'g'),
                '{ip}', '{i_tok}', 'g'),
                '{phone}', '{p_tok}', 'g') AS clean_text,
              CAST(len(regexp_extract_all(text, '{email}'))
                 + len(regexp_extract_all(text, '{ip}'))
                 + len(regexp_extract_all(text, '{phone}')) AS BIGINT)
                AS n_redacted
            FROM t ORDER BY doc_id
            """
        ).df()
        assert got["clean_text"].tolist() == want["clean_text"].tolist()
        assert got["n_redacted"].tolist() == want["n_redacted"].tolist()
        # the interesting edges, pinned directly
        m = dict(zip(got["doc_id"], got["clean_text"]))
        assert m[0] == "mail me at <EMAIL> or <IP> ok"
        assert m[3] == "<EMAIL> x@y.z <IP>"  # 1-char TLD not an email

    def test_dataset_path(self, ray_session):
        import ray.data

        from maup_ray.text.analysis import redact_pii

        t = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array(["a@b.io", "clean"]),
            }
        )
        out = (
            redact_pii(ray.data.from_arrow(t))
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["clean_text"].tolist() == ["<EMAIL>", "clean"]
        assert out["n_redacted"].tolist() == [1, 0]


class TestChunkText:
    def test_matches_brute_force(self, ray_session):
        from maup_ray.text.analysis import chunk_text

        texts = [
            "abcdefghijklmnopqrstuvwxyz",
            "short",
            "",
            "exactly10!",
            "0123456789abcdefghij",
        ]
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
        got = (
            chunk_text(t, chunk_size=10, overlap=3)
            .to_pandas()
            .sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True)
        )
        # brute-force oracle
        want = []
        for i, s in enumerate(texts):
            n = 1 if len(s) <= 10 else (len(s) - 10 + 6) // 7 + 1
            for k in range(n):
                want.append((i, k, s[k * 7 : k * 7 + 10]))
        assert list(
            got.itertuples(index=False, name=None)
        ) == want

    def test_dataset_flat_map_shape(self, ray_session):
        import ray.data

        from maup_ray.text.analysis import chunk_text

        t = pa.table(
            {
                "doc_id": pa.array([7], type=pa.int64()),
                "text": pa.array(["x" * 100]),
            }
        )
        out = (
            chunk_text(
                ray.data.from_arrow(t), chunk_size=40, overlap=10
            )
            .to_pandas()
            .sort_values("chunk_idx")
        )
        assert len(out) == 3  # (100-40+29)//30+1
        # overlap: consecutive chunks share `overlap` chars
        assert out["chunk"].iloc[0][-10:] == out["chunk"].iloc[1][:10]

    def test_overlap_ge_chunk_raises(self):
        from maup_ray.text.analysis import chunk_text

        t = pa.table(
            {
                "doc_id": pa.array([1], type=pa.int64()),
                "text": pa.array(["abc"]),
            }
        )
        with pytest.raises(ValueError):
            chunk_text(t, chunk_size=5, overlap=5)


class TestPackDocuments:
    def test_greedy_rule_brute_force(self, ray_session):
        from maup_ray.text.analysis import pack_documents

        rng = np.random.RandomState(17)
        n = 200
        texts = [
            " ".join(["w"] * int(k)) for k in rng.randint(1, 60, n)
        ]
        t = pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
        got = (
            pack_documents(t, budget=100, range_size=50)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # brute: greedy first-fit in id order per partition
        toks = [len(s.split()) for s in texts]
        want = []
        for part in range(0, n, 50):
            fill, b = None, -1
            for i in range(part, min(part + 50, n)):
                if fill is None or fill + toks[i] > 100:
                    b += 1
                    fill = toks[i]
                else:
                    fill += toks[i]
                want.append((part // 50) * (1 << 32) + b)
        assert got["bin_id"].tolist() == want
        # budget respected except single-oversize-doc bins
        merged = got.copy()
        merged["tok"] = toks
        per_bin = merged.groupby("bin_id").agg(
            tot=("tok", "sum"), cnt=("tok", "size")
        )
        assert (
            (per_bin["tot"] <= 100) | (per_bin["cnt"] == 1)
        ).all()

    def test_oversize_doc_gets_own_bin(self, ray_session):
        from maup_ray.text.analysis import pack_documents

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array(["a b", " ".join(["x"] * 999), "c d"]),
            }
        )
        out = (
            pack_documents(t, budget=10, range_size=100)
            .to_pandas()
            .sort_values("doc_id")
        )
        bins = out["bin_id"].tolist()
        assert bins[0] != bins[1] and bins[1] != bins[2]


class TestKmeans:
    def _corpus(self, n_per=60, k=4, d=8, seed=3):
        rng = np.random.RandomState(seed)
        centers = rng.normal(size=(k, d)) * 3
        vecs = np.vstack(
            [c + rng.normal(scale=0.1, size=(n_per, d)) for c in centers]
        )
        t = pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        return t, vecs, n_per, k

    def test_recovers_planted_clusters_and_matches_replica(
        self, ray_session
    ):
        import ray.data

        from maup_ray.vector.ann import _normalize
        from maup_ray.vector.kmeans import kmeans_assign, kmeans_fit

        t, vecs, n_per, k = self._corpus()
        ds = ray.data.from_arrow(t).repartition(6)
        C = kmeans_fit(ds, k=k, iters=5)
        out = (
            kmeans_assign(ds, C)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        # each planted group lands in exactly one cluster; clusters
        # distinct across groups
        labels = [
            set(out["cluster"][i * n_per : (i + 1) * n_per])
            for i in range(k)
        ]
        assert all(len(s) == 1 for s in labels)
        assert len(set.union(*labels)) == k
        # local numpy replica of the same algorithm (same init: the
        # corpus is under sample_size so init uses all rows) agrees on
        # centroids to float tolerance
        X = _normalize(vecs.astype(np.float64))
        rng = np.random.RandomState(99)
        init = rng.choice(len(X), size=k, replace=False)
        C2 = X[init].copy()
        for _ in range(5):
            a = np.argmax(X @ C2.T, axis=1)
            for j in range(k):
                pts = X[a == j]
                if len(pts):
                    m = pts.mean(axis=0)
                    nn = np.linalg.norm(m)
                    if nn > 0:
                        C2[j] = m / nn
        # order-insensitive centroid match
        d2 = np.abs(C[:, None, :] - C2[None, :, :]).sum(axis=2)
        assert (d2.min(axis=1) < 1e-6).all()

    def test_fixed_blocks_deterministic(self, ray_session):
        import ray.data

        from maup_ray.vector.kmeans import kmeans_fit

        t, _, _, k = self._corpus(seed=11)
        ds = ray.data.from_arrow(t).repartition(4).materialize()
        C1 = kmeans_fit(ds, k=k, iters=3)
        C2 = kmeans_fit(ds, k=k, iters=3)
        assert np.array_equal(C1, C2)

    def test_partition_invariant(self, ray_session):
        """Centroids are BIT-identical across block structures AND row
        orders (fixed-point integer accumulation + id-sorted init)."""
        import ray.data

        from maup_ray.vector.kmeans import kmeans_fit

        t, _, _, k = self._corpus(seed=7)
        perm = np.random.RandomState(0).permutation(len(t))
        variants = [
            ray.data.from_arrow(t).repartition(2).materialize(),
            ray.data.from_arrow(t).repartition(9).materialize(),
            ray.data.from_arrow(t.take(pa.array(perm)))
            .repartition(5)
            .materialize(),
        ]
        cs = [kmeans_fit(ds, k=k, iters=3) for ds in variants]
        assert np.array_equal(cs[0], cs[1])
        assert np.array_equal(cs[0], cs[2])


class TestBM25:
    def _docs(self):
        texts = [
            "hash join fast table scan",
            "vector vector vector",
            "the quick brown fox",
            "join join hash",
            "scan filter merge sort",
            "hash",
            "",
        ]
        return pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
            }
        )

    def test_matches_local_replica_and_ranks(self, ray_session):
        import ray.data

        from maup_ray.text.rank import bm25_topk

        t = self._docs()
        local = bm25_topk(t, ["hash", "vector", "join"], k=5)
        dist = bm25_topk(
            ray.data.from_arrow(t).repartition(3),
            ["hash", "vector", "join"],
            k=5,
        )
        assert local.equals(dist)
        ids = local["doc_id"].to_pylist()
        scores = local["score"].to_pylist()
        # doc 3 ("join join hash") and doc 1 (pure "vector") carry the
        # highest term mass; zero-match docs score 0 and rank by id
        assert scores == sorted(scores, reverse=True) or all(
            a > b or (a == b) for a, b in zip(scores, scores[1:])
        )
        assert set(ids[:2]) <= {0, 1, 3}
        assert all(s >= 0 for s in scores)

    def test_partition_invariant_scores(self, ray_session):
        import ray.data

        from maup_ray.text.rank import bm25_topk

        t = self._docs()
        outs = [
            bm25_topk(
                ray.data.from_arrow(t).repartition(p),
                ["hash", "join"],
                k=7,
            )
            for p in (1, 2, 5)
        ]
        assert outs[0].equals(outs[1]) and outs[0].equals(outs[2])

    def test_null_text_is_empty_document(self, ray_session):
        """Null text rows = empty docs (dl 0, tf 0, score 0) and do not
        poison anyone else's statistics (r5 candidate #1)."""
        from maup_ray.text.rank import bm25_topk

        t = self._docs()
        texts = t["text"].to_pylist()
        with_null = pa.table(
            {
                "doc_id": pa.array(
                    range(len(texts) + 1), type=pa.int64()
                ),
                "text": pa.array(texts + [None]),
            }
        )
        out = bm25_topk(with_null, ["hash", "join"], k=len(texts) + 1)
        base = bm25_topk(t, ["hash", "join"], k=len(texts))
        # corpus stats (N grows by one empty doc) shift every score, so
        # compare ORDER, not values: the null doc scores 0 and ranks
        # with the other zero-score docs by id
        got = dict(
            zip(out["doc_id"].to_pylist(), out["score"].to_pylist())
        )
        assert got[len(texts)] == 0.0
        nonzero_base = [
            i
            for i, s in zip(
                base["doc_id"].to_pylist(), base["score"].to_pylist()
            )
            if s > 0
        ]
        nonzero_out = [
            i for i in out["doc_id"].to_pylist() if got[i] > 0
        ]
        assert nonzero_out == nonzero_base
        # an all-null corpus has total_len 0: scores must be 0.0, not
        # NaN from a 0/0 avgdl
        allnull = pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": pa.array([None, None], type=pa.string()),
            }
        )
        res = bm25_topk(allnull, ["hash"], k=2)
        assert res["score"].to_pylist() == [0.0, 0.0]
        assert res["doc_id"].to_pylist() == [0, 1]

    def test_multi_matches_single_query(self, ray_session):
        """bm25_topk_multi restricted to one query == bm25_topk bit for
        bit (same fixed IEEE expression, same term-sum order)."""
        import ray.data

        from maup_ray.text.rank import bm25_topk, bm25_topk_multi

        t = self._docs()
        queries = {
            "a": ["hash", "join"],
            "b": ["vector"],
            "c": ["scan", "merge", "hash"],
        }
        multi = bm25_topk_multi(t, queries, k=5)
        for q, terms in queries.items():
            single = bm25_topk(t, terms, k=5)
            part = multi.filter(
                pa.compute.equal(multi["query"], q)
            ).drop_columns(["query"])
            assert part.equals(single), q
        # distributed == local, partition-invariant
        for p in (2, 5):
            dist = bm25_topk_multi(
                ray.data.from_arrow(t).repartition(p), queries, k=5
            )
            assert dist.equals(multi)


class TestDecontaminate:
    def _tables(self):
        bench = pa.table(
            {
                "doc_id": pa.array([100, 101], type=pa.int64()),
                "text": pa.array(
                    [
                        "the quick brown fox jumps",
                        "hash join over sorted runs",
                    ]
                ),
            }
        )
        corpus = pa.table(
            {
                "doc_id": pa.array(range(6), type=pa.int64()),
                "text": pa.array(
                    [
                        "we saw the quick brown fox today",  # hit
                        "quick brown dog",  # shares words, no 3-gram
                        "hash join over everything",  # "hash join over"
                        "totally unrelated text here now",
                        "fox jumps",  # too short for a 3-gram hit? 2 toks of bench tail
                        "",
                    ]
                ),
            }
        )
        return corpus, bench

    def test_exact_shingle_semantics(self, ray_session):
        from maup_ray.text.decontaminate import decontaminate

        corpus, bench = self._tables()
        out = decontaminate(corpus, bench, k=3)
        got = dict(
            zip(
                out["doc_id"].to_pylist(),
                out["contaminated"].to_pylist(),
            )
        )
        assert got == {
            0: True,
            1: False,
            2: True,
            3: False,
            4: False,  # "fox jumps" has no 3-shingle at all
            5: False,
        }

    def test_dataset_matches_table_and_partition_invariant(
        self, ray_session
    ):
        import ray.data

        from maup_ray.text.decontaminate import decontaminate

        corpus, bench = self._tables()
        local = decontaminate(corpus, bench, k=3)
        for p in (1, 3):
            dist = (
                decontaminate(
                    ray.data.from_arrow(corpus).repartition(p),
                    ray.data.from_arrow(bench),
                    k=3,
                )
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            assert dist.equals(
                local.to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )

    def test_broadcast_limit_guard(self, ray_session):
        import pytest
        import ray.data

        from maup_ray.text.decontaminate import decontaminate

        corpus, bench = self._tables()
        with pytest.raises(ValueError, match="broadcast_limit"):
            decontaminate(
                corpus,
                ray.data.from_arrow(bench),
                broadcast_limit=1,
            )

    def test_empty_benchmark_flags_nothing(self, ray_session):
        from maup_ray.text.decontaminate import decontaminate

        corpus, bench = self._tables()
        out = decontaminate(corpus, bench.slice(0, 0), k=3)
        assert not any(out["contaminated"].to_pylist())


class TestDetSims:
    def test_shape_independent_and_close_to_blas(self):
        """det_sims row j is a pure function of (row, centroid) — the
        same rows in a 5-row slice and the full matrix produce
        BIT-identical sims (BLAS dgemm does not guarantee this; the
        num_cpus-dependent sim hash it caused is pinned in
        test_e2e_pipelines.test_embed_cluster_pinned)."""
        from maup_ray.vector.kmeans import det_sims

        rng = np.random.RandomState(7)
        X = rng.normal(size=(64, 33))
        C = rng.normal(size=(9, 33))
        full = det_sims(X, C)
        for lo, hi in [(0, 5), (3, 64), (10, 11)]:
            assert np.array_equal(det_sims(X[lo:hi], C), full[lo:hi])
        # and it IS the dot product (BLAS agrees to float tolerance)
        assert np.allclose(full, X @ C.T, rtol=1e-12, atol=1e-12)


class TestSemanticPrune:
    JITTER = False

    def _corpus(self, n_groups=6, dups_per=3, d=8, seed=13):
        rng = np.random.RandomState(seed)
        base = rng.normal(size=(n_groups, d)) * 4
        rows, gids = [], []
        vid = 0
        for g in range(n_groups):
            jitter = rng.normal(scale=1e-4, size=(dups_per, d))
            for j in range(dups_per):
                # members of a group are bit-identical (exact semantic
                # duplicates) so they provably share a k-means cluster
                # whatever the centroid draw; the partition-invariance
                # test below uses the jittered variant
                rows.append(
                    base[g] + (jitter[j] if self.JITTER else 0.0)
                )
                gids.append((vid, g, j))
                vid += 1
        vecs = np.vstack(rows)
        t = pa.table(
            {
                "vec_id": pa.array(
                    [i for i, _, _ in gids], type=pa.int64()
                ),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        return t, gids

    def test_planted_duplicates_pruned(self, ray_session):
        import ray.data

        from maup_ray.vector.prune import semantic_prune

        t, gids = self._corpus()
        out = (
            semantic_prune(
                ray.data.from_arrow(t).repartition(4).materialize(),
                k=6,
                iters=4,
                threshold=0.99,
            )
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert len(out) == len(t)
        # exactly one keeper per planted group (the min id), duplicates
        # point their dup_of at a kept member of the same group
        by_group = {}
        for (vid, g, _), keep, dup in zip(
            gids, out["keep"], out["dup_of"]
        ):
            by_group.setdefault(g, []).append((vid, keep, dup))
        for g, members in by_group.items():
            keepers = [v for v, k, _ in members if k]
            assert keepers == [min(v for v, _, _ in members)]
            kept_set = set(keepers)
            for v, k, dup in members:
                if not k:
                    assert dup in kept_set

    def test_partition_invariant(self, ray_session):
        import ray.data

        from maup_ray.vector.prune import semantic_prune

        self.JITTER = True
        try:
            t, _ = self._corpus(seed=29)
        finally:
            self.JITTER = False
        outs = [
            semantic_prune(
                ray.data.from_arrow(t).repartition(p).materialize(),
                k=6,
                iters=3,
                threshold=0.99,
            )
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
            for p in (2, 7)
        ]
        import pandas as pd

        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_hot_cluster_salting(self, ray_session):
        """salt > 1 (r5 candidate #2): per-shard greedy prune is still
        partition-invariant, keeps a superset of the unsalted keepers
        on exact-dup groups (cross-shard dups are the documented recall
        trade), and every drop's dup_of stays in its own shard."""
        import pandas as pd
        import ray.data

        from maup_ray.ops.shuffle import _hash_keys
        from maup_ray.vector.prune import semantic_prune

        t, gids = self._corpus(n_groups=4, dups_per=6)

        def run(salt, parts):
            return (
                semantic_prune(
                    ray.data.from_arrow(t)
                    .repartition(parts)
                    .materialize(),
                    k=4,
                    iters=4,
                    threshold=0.99,
                    salt=salt,
                )
                .to_pandas()
                .sort_values("vec_id")
                .reset_index(drop=True)
            )

        salted = run(4, 3)
        pd.testing.assert_frame_equal(salted, run(4, 8))
        base = run(1, 3)
        kept_base = set(base.loc[base["keep"], "vec_id"])
        kept_salt = set(salted.loc[salted["keep"], "vec_id"])
        assert kept_base <= kept_salt
        assert len(kept_salt) <= len(t)
        # shard = pure hash of id: recompute and check dup_of locality
        shard = (
            _hash_keys(t, ["vec_id"]) % np.uint64(4)
        ).astype(np.int64)
        shard_of = dict(zip(t["vec_id"].to_pylist(), shard))
        group_of = {vid: g for vid, g, _ in gids}
        for _, row in salted[~salted["keep"]].iterrows():
            v, d = int(row["vec_id"]), int(row["dup_of"])
            assert shard_of[v] == shard_of[d]
            assert group_of[v] == group_of[d]
            # per-shard min id is the keeper
            assert d == min(
                u
                for u in group_of
                if group_of[u] == group_of[v]
                and shard_of[u] == shard_of[v]
            )


class TestNormalizeText:
    def test_roundtrip_and_edges(self, ray_session):
        import ray.data

        from maup_ray.text.analysis import normalize_text

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                "text": pa.array(
                    [
                        "  Hello \t WORLD  ",
                        "already clean",
                        "",
                        None,
                    ]
                ),
            }
        )
        out = normalize_text(t)
        assert out["norm_text"].to_pylist() == [
            "hello world",
            "already clean",
            "",
            None,  # null propagates (SQL semantics)
        ]
        # clean text is a fixed point; Dataset path matches local
        dist = (
            normalize_text(ray.data.from_arrow(t).repartition(2))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert dist["norm_text"].tolist()[:3] == [
            "hello world",
            "already clean",
            "",
        ]


class TestHammingTopk:
    def _brute(self, sigs, ids, q, k):
        d = [bin((int(s) ^ int(q)) & ((1 << 64) - 1)).count("1")
             for s in sigs]
        order = sorted(range(len(ids)), key=lambda i: (d[i], ids[i]))
        return [(ids[i], d[i]) for i in order[:k]]

    def test_matches_brute_force(self, ray_session):
        import pyarrow.compute as pc
        import ray.data

        from maup_ray.vector.ann import hamming_topk

        rng = np.random.RandomState(5)
        n = 500
        sigs = rng.randint(0, 1 << 62, n).astype(np.int64)
        ids = [f"im{j:04d}" for j in range(n)]
        t = pa.table(
            {"image_id": pa.array(ids, type=pa.string()),
             "phash": pa.array(sigs)}
        )
        queries = sigs[[3, 77]].tolist() + [12345]
        out = hamming_topk(
            ray.data.from_arrow(t).repartition(7), queries, k=6
        )
        for j, qsig in enumerate(queries):
            rows = out.filter(pc.equal(out["q"], j))
            got = list(
                zip(rows["image_id"].to_pylist(), rows["dist"].to_pylist())
            )
            assert got == self._brute(sigs, ids, qsig, 6), j
            assert rows["rnk"].to_pylist() == list(range(1, 7))
        # self-queries must find themselves at distance 0, rank 1
        assert out.filter(pc.equal(out["q"], 0))["dist"][0].as_py() == 0

    def test_partition_invariant_and_table_path(self, ray_session):
        import ray.data

        from maup_ray.vector.ann import hamming_topk

        rng = np.random.RandomState(9)
        sigs = rng.randint(0, 1 << 62, 200).astype(np.int64)
        t = pa.table(
            {"image_id": pa.array([f"x{j:03d}" for j in range(200)]),
             "phash": pa.array(sigs)}
        )
        q = [1, 2, 3]
        base = hamming_topk(t, q, k=5).to_pydict()
        for p in (2, 9):
            ds = ray.data.from_arrow(t).repartition(p)
            assert hamming_topk(ds, q, k=5).to_pydict() == base


class TestCollocations:
    """bigram_lift_topk vs a brute-force Python lift oracle."""

    @staticmethod
    def _brute(texts, k, min_count):
        from collections import Counter

        uni, bi = Counter(), Counter()
        nd = len(texts)
        for t in texts:
            toks = t.split(" ")
            uni.update(toks)
            bi.update(
                f"{a} {b}" for a, b in zip(toks, toks[1:])
            )
        nu = sum(uni.values())
        nb = nu - nd
        rows = []
        for g, c in bi.items():
            if c < min_count:
                continue
            w1, w2 = g.split(" ")
            rows.append(
                (g, c, float(c * nu * nu) / float(nb * uni[w1] * uni[w2]))
            )
        rows.sort(key=lambda r: (-r[2], r[0]))
        return rows[:k]

    def test_table_matches_brute_force(self):
        from maup_ray.text.analysis import bigram_lift_topk

        rng = np.random.default_rng(7)
        words = ["aa", "bb", "cc", "dd"]
        texts = [
            " ".join(rng.choice(words, size=int(n)))
            for n in rng.integers(2, 9, size=60)
        ] + ["zz yy", "zz yy", "zz yy"]  # planted high-lift pair
        out = bigram_lift_topk(docs(texts), k=10, min_count=2)
        got = list(
            zip(
                out["gram"].to_pylist(),
                out["n_occ"].to_pylist(),
                out["lift"].to_pylist(),
            )
        )
        assert got == self._brute(texts, 10, 2)
        assert got[0][0] == "zz yy"  # the planted collocation ranks first

    def test_dataset_partition_invariant(self, ray_session):
        import ray.data

        from maup_ray.text.analysis import bigram_lift_topk

        rng = np.random.default_rng(11)
        words = ["aa", "bb", "cc", "dd", "ee"]
        texts = [
            " ".join(rng.choice(words, size=int(n)))
            for n in rng.integers(2, 12, size=200)
        ]
        tbl = docs(texts)
        want = bigram_lift_topk(tbl, k=15, min_count=3)
        for nparts in (1, 7):
            ds = ray.data.from_arrow(tbl).repartition(nparts)
            got = bigram_lift_topk(ds, k=15, min_count=3)
            assert got.equals(want)


class TestInvertedIndex:
    def test_matches_brute_force(self, ray_session):
        import ray.data

        from maup_ray.text.rank import inverted_index

        rng = np.random.default_rng(13)
        vocab = [f"w{i}" for i in range(30)]
        docs, ids = [], []
        for d in range(60):
            k = rng.integers(3, 15)
            docs.append(
                " ".join(rng.choice(vocab, size=k).tolist())
            )
            ids.append(d)
        tbl = pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array(docs),
            }
        )
        got = {
            r["token"]: r
            for r in inverted_index(
                ray.data.from_arrow(tbl).repartition(6), min_df=3
            ).take_all()
        }
        # brute force
        from collections import Counter, defaultdict

        post = defaultdict(Counter)
        for d, txt in zip(ids, docs):
            for w in txt.split(" "):
                post[w][d] += 1
        expected = {
            w: c for w, c in post.items() if len(c) >= 3
        }
        assert set(got) == set(expected)
        for w, c in expected.items():
            assert got[w]["df"] == len(c)
            assert got[w]["cf"] == sum(c.values())
            assert got[w]["postings"] == ",".join(
                str(d) for d in sorted(c)
            )

    def test_table_path_and_min_df(self, ray_session):
        from maup_ray.text.rank import inverted_index

        t = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array(["a a b", "a c"]),
            }
        )
        out = inverted_index(t, min_df=1)
        rows = {r["token"]: r for r in out.to_pylist()}
        assert rows["a"]["df"] == 2 and rows["a"]["cf"] == 3
        assert rows["a"]["postings"] == "1,2"
        out2 = inverted_index(t, min_df=2)
        assert out2.num_rows == 1


class TestVocabStats:
    def test_matches_brute(self, ray_session):
        import collections

        import ray.data

        from maup_ray.text.analysis import vocab_stats

        rng = np.random.RandomState(8)
        words = [f"w{i}" for i in range(40)]
        langs = ["en", "fr", "de"]
        rows_lang, rows_text = [], []
        for _ in range(200):
            lg = langs[rng.randint(0, 3)]
            k = rng.randint(1, 12)
            ws = [words[rng.randint(0, 40)] for _ in range(k)]
            rows_lang.append(lg)
            rows_text.append(" ".join(ws))
        ds = ray.data.from_arrow(
            pa.table({"lang": rows_lang, "text": rows_text})
        ).repartition(4)
        got = {
            r["lang"]: (
                r["n_tokens"], r["n_types"], r["n_hapax"], r["ttr"]
            )
            for r in vocab_stats(ds).to_pylist()
        }
        per = collections.defaultdict(collections.Counter)
        for lg, tx in zip(rows_lang, rows_text):
            per[lg].update(tx.split(" "))
        want = {}
        for lg, c in per.items():
            n_tok = sum(c.values())
            want[lg] = (
                n_tok,
                len(c),
                sum(1 for v in c.values() if v == 1),
                float(len(c)) / float(n_tok),
            )
        assert got == want
