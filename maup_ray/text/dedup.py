"""Deduplication stages: exact (hash-partition), MinHash+LSH, SimHash,
n-gram Jaccard — the 100 TB training-data dedup toolkit.

Scale shapes:
* exact: hash the text per batch (cheap map), shuffle ONLY the 8-byte
  hash + id (never the text) for the keyed groupby, re-verify inside
  the group. At petabyte scale the shuffle payload is O(rows × 16 B).
* MinHash: per-batch signature computation (vectorized over shingle
  hashes), flat-map to (band, band_hash) keys, groupby buckets →
  candidate pairs, exact-Jaccard verify on the pair list.
* SimHash: 64-bit signature per doc; near-dup pairs via 4-way table
  split (pigeonhole: hamming ≤3 ⇒ one of 4 16-bit quarters equal).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "text_hash_batch",
    "exact_dedup",
    "minhash_signatures_batch",
    "minhash_candidates",
    "simhash_batch",
    "simhash_signatures",
    "simhash_candidates",
    "ngram_jaccard",
    "char_shingle_hashes",
]

_P61 = np.uint64((1 << 61) - 1)


def _hash64_strings(arr: pa.Array) -> np.ndarray:
    """Stable 64-bit blake2b hash per string (python loop over digest —
    16 bytes each; fine at batch granularity)."""
    out = np.empty(len(arr), dtype=np.uint64)
    for i, v in enumerate(arr):
        out[i] = int.from_bytes(
            hashlib.blake2b(
                v.as_py().encode("utf-8"), digest_size=8
            ).digest(),
            "little",
        )
    return out


def text_hash_batch(batch: pa.Table, text_col="text", id_col="doc_id") -> pa.Table:
    arr = batch[text_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    h = _hash64_strings(arr)
    return pa.table(
        {
            id_col: batch[id_col],
            "text_hash": pa.array(h.view(np.int64)),
            text_col: batch[text_col],
        }
    )


def exact_dedup(ds, text_col="text", id_col="doc_id", keep_text=False):
    """Keeper per distinct text = min id (hash-partition + per-group
    first; ref-free: SQL oracle is GROUP BY text). Returns the keeper
    rows (id [, text])."""

    def per_group(df):
        import pandas as pd

        # verify within hash bucket (collision safety): min id per text
        keep = df.sort_values(id_col).drop_duplicates(subset=[text_col])
        cols = [id_col] + ([text_col] if keep_text else [])
        return keep[cols]

    hashed = ds.map_batches(
        lambda b: text_hash_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return hashed.groupby("text_hash").map_groups(per_group)


# ------------------------------------------------------------- MinHash


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Rolling polynomial hashes of all k-char shingles (vectorized)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    base = np.uint64(257)
    powk = np.uint64(1)
    for _ in range(k):
        powk = (powk * base) & np.uint64(0xFFFFFFFFFFFFFFFF)
    h = np.zeros(len(b), dtype=np.uint64)
    acc = np.uint64(0)
    # prefix hashes then windowed subtraction (wrapping arithmetic)
    pref = np.zeros(len(b) + 1, dtype=np.uint64)
    powers = np.ones(len(b) + 1, dtype=np.uint64)
    for i in range(len(b)):
        pref[i + 1] = pref[i] * base + b[i]
        powers[i + 1] = powers[i] * base
    win = pref[k:] - pref[:-k] * powers[k]
    return np.unique(win)


_MINHASH_A = None
_MINHASH_B = None


def _perm_params(num_perm: int):
    global _MINHASH_A, _MINHASH_B
    if _MINHASH_A is None or len(_MINHASH_A) < num_perm:
        rng = np.random.RandomState(1234)
        _MINHASH_A = (
            rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        )
        _MINHASH_B = (
            rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        )
    return _MINHASH_A[:num_perm], _MINHASH_B[:num_perm]


def minhash_signatures_batch(
    batch: pa.Table,
    num_perm: int = 64,
    shingle_k: int = 5,
    text_col="text",
    id_col="doc_id",
) -> pa.Table:
    """(id, sig: list<uint64 as int64>[num_perm])."""
    a, b_ = _perm_params(num_perm)
    sigs = np.empty((len(batch), num_perm), dtype=np.uint64)
    for i, v in enumerate(batch[text_col]):
        sh = char_shingle_hashes(v.as_py(), shingle_k) & _P61
        if len(sh) == 0:
            sigs[i] = 0
            continue
        # (a*x + b) mod p for each perm — (num_perm, n_shingles)
        vals = (a[:, None] * sh[None, :] + b_[:, None]) % _P61
        sigs[i] = vals.min(axis=1)
    return pa.table(
        {
            id_col: batch[id_col],
            "sig": pa.array(
                [row.view(np.int64) for row in sigs],
                type=pa.list_(pa.int64()),
            ),
        }
    )


def minhash_candidates(
    ds,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    min_est_jaccard: float = 0.5,
    text_col="text",
    id_col="doc_id",
):
    """LSH banding: flat-map each doc to ``bands`` (band, band_hash)
    keys, groupby bucket, emit i<j pairs with their estimated jaccard
    (signature agreement)."""
    rows_per_band = num_perm // bands

    def to_bands(batch: pa.Table) -> pa.Table:
        out_band, out_hash, out_id, out_sig = [], [], [], []
        for rid, sig in zip(batch[id_col].to_pylist(), batch["sig"]):
            s = np.asarray(sig.as_py(), dtype=np.int64).view(np.uint64)
            for bnd in range(bands):
                chunk = s[bnd * rows_per_band : (bnd + 1) * rows_per_band]
                bh = int.from_bytes(
                    hashlib.blake2b(
                        chunk.tobytes(), digest_size=8
                    ).digest(),
                    "little",
                )
                out_band.append(bnd)
                out_hash.append(bh - (1 << 63))
                out_id.append(rid)
                out_sig.append(s.view(np.int64))
        return pa.table(
            {
                "band": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_hash, type=pa.int64()),
                id_col: pa.array(out_id),
                "sig": pa.array(
                    [x for x in out_sig], type=pa.list_(pa.int64())
                ),
            }
        )

    def bucket_pairs(df):
        import pandas as pd

        ids = df[id_col].tolist()
        if len(ids) < 2:
            return pd.DataFrame({"doc_i": [], "doc_j": [], "est_jaccard": []})
        sigs = np.array([np.asarray(s, dtype=np.int64) for s in df["sig"]])
        out_i, out_j, out_e = [], [], []
        order = np.argsort(ids, kind="stable")
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                i, j = order[x], order[y]
                est = float((sigs[i] == sigs[j]).mean())
                out_i.append(ids[i])
                out_j.append(ids[j])
                out_e.append(est)
        return pd.DataFrame(
            {"doc_i": out_i, "doc_j": out_j, "est_jaccard": out_e}
        )

    sigs = ds.map_batches(
        lambda b: minhash_signatures_batch(
            b, num_perm, shingle_k, text_col, id_col
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = sigs.map_batches(
        to_bands, batch_format="pyarrow"
    ).groupby(["band", "band_hash"]).map_groups(bucket_pairs)
    # same pair can surface from several bands → dedup, keep max est
    from ray.data.aggregate import Max

    out = pairs.groupby(["doc_i", "doc_j"]).aggregate(
        Max(on="est_jaccard", alias_name="est_jaccard")
    )
    if min_est_jaccard > 0:
        out = out.filter(
            lambda r: r["est_jaccard"] >= min_est_jaccard
        )
    return out


# ------------------------------------------------------------- SimHash


def simhash_batch(
    batch: pa.Table, text_col="text", id_col="doc_id"
) -> pa.Table:
    """64-bit SimHash over whitespace tokens (hash votes per bit)."""
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(batch[text_col]), r"\s+"
    )
    out = np.zeros(len(batch), dtype=np.uint64)
    for i, lst in enumerate(toks):
        words = lst.as_py()
        if not words:
            continue
        hs = np.array(
            [
                int.from_bytes(
                    hashlib.blake2b(
                        w.encode("utf-8"), digest_size=8
                    ).digest(),
                    "little",
                )
                for w in words
            ],
            dtype=np.uint64,
        )
        bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        sig = np.uint64(0)
        for b_ in np.nonzero(votes > 0)[0]:
            sig |= np.uint64(1) << np.uint64(b_)
        out[i] = sig
    return pa.table(
        {id_col: batch[id_col], "simhash": pa.array(out.view(np.int64))}
    )


def simhash_signatures(ds, **kw):
    return ds.map_batches(
        lambda b: simhash_batch(b, **kw),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def simhash_candidates(ds, max_hamming: int = 3, id_col="doc_id", **kw):
    """Near-dup pairs by pigeonhole: split the 64-bit signature into 4
    16-bit quarters; hamming ≤3 ⇒ at least one quarter identical →
    groupby (quarter_idx, quarter_value) buckets, verify hamming in
    group."""
    sigs = simhash_signatures(ds, id_col=id_col, **kw)

    def to_quarters(batch: pa.Table) -> pa.Table:
        ids, qi, qv, sg = [], [], [], []
        for rid, s in zip(
            batch[id_col].to_pylist(), batch["simhash"].to_pylist()
        ):
            u = np.uint64(s)
            for q in range(4):
                ids.append(rid)
                qi.append(q)
                qv.append(
                    int((u >> np.uint64(16 * q)) & np.uint64(0xFFFF))
                )
                sg.append(s)
        return pa.table(
            {
                id_col: pa.array(ids),
                "q": pa.array(qi, type=pa.int32()),
                "qv": pa.array(qv, type=pa.int32()),
                "simhash": pa.array(sg, type=pa.int64()),
            }
        )

    def verify(df):
        import pandas as pd

        ids = df[id_col].tolist()
        sigs_ = df["simhash"].to_numpy()
        out_i, out_j, out_h = [], [], []
        order = np.argsort(ids, kind="stable")
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                i, j = order[x], order[y]
                ham = bin(
                    int(np.uint64(sigs_[i]) ^ np.uint64(sigs_[j]))
                ).count("1")
                if ham <= max_hamming and ids[i] != ids[j]:
                    out_i.append(ids[i])
                    out_j.append(ids[j])
                    out_h.append(ham)
        return pd.DataFrame({"doc_i": out_i, "doc_j": out_j, "hamming": out_h})

    from ray.data.aggregate import Min

    pairs = sigs.map_batches(
        to_quarters, batch_format="pyarrow"
    ).groupby(["q", "qv"]).map_groups(verify)
    return pairs.groupby(["doc_i", "doc_j"]).aggregate(
        Min(on="hamming", alias_name="hamming")
    )


# ------------------------------------------------------- n-gram Jaccard


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact char-k-gram Jaccard (the verify stage for LSH candidates)."""
    a = char_shingle_hashes(text_a, k)
    b = char_shingle_hashes(text_b, k)
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)
