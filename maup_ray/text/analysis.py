"""Text-analysis stages for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All are stateless vectorized batch functions suitable for
``ds.map_batches(fn, batch_format="pyarrow")`` — pyarrow.compute string
kernels where they exist, numpy where they don't. Each has a Dataset
wrapper that streams (no driver materialization).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "token_count_batch",
    "token_counts",
    "bpe_token_count_batch",
    "bpe_token_counts",
    "BPE_SPLIT_PATTERN",
    "quality_batch",
    "quality_scores",
    "langid_batch",
    "lang_id",
    "fingerprint_batch",
    "fingerprints",
    "vocab_stats",
]

_WS = r"\s+"

# small per-language stopword inventories for the n-gram/stopword
# language heuristic (public common-word lists)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "por", "con", "los"},
    "fr": {"le", "la", "de", "et", "un", "est", "pour", "que", "dans", "les"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "nicht"},
    "it": {"il", "di", "che", "la", "per", "con", "del", "una", "sono"},
}


def _tokens(texts: pa.ChunkedArray | pa.Array):
    return pc.split_pattern_regex(pc.utf8_trim_whitespace(texts), _WS)


def token_count_batch(batch: pa.Table, text_col="text", id_col="doc_id") -> pa.Table:
    """Whitespace token count (matches DuckDB
    len(regexp_split_to_array(trim(text), '\\s+')))."""
    n = pc.list_value_length(_tokens(batch[text_col]))
    return pa.table(
        {id_col: batch[id_col], "n_tokens": pc.cast(n, pa.int64())}
    )


def token_counts(ds, **kw):
    return ds.map_batches(
        lambda b: token_count_batch(b, **kw),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# GPT-2-flavoured pretokenizer pattern, RE2-safe (no lookahead — both
# Arrow and DuckDB run RE2, so engine and oracle agree byte-for-byte)
BPE_SPLIT_PATTERN = (
    r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_token_count_batch(
    batch: pa.Table, text_col="text", id_col="doc_id"
) -> pa.Table:
    """BPE-ish pretoken count: non-overlapping matches of
    BPE_SPLIT_PATTERN (one vectorized RE2 pass, compiled once by
    Arrow)."""
    n = pc.count_substring_regex(batch[text_col], BPE_SPLIT_PATTERN)
    return pa.table(
        {id_col: batch[id_col], "n_bpe_tokens": pc.cast(n, pa.int64())}
    )


def bpe_token_counts(ds, **kw):
    return ds.map_batches(
        lambda b: bpe_token_count_batch(b, **kw),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def quality_batch(batch: pa.Table, text_col="text", id_col="doc_id") -> pa.Table:
    """Cheap quality signals: char length, token count, mean token
    length, alpha ratio, stopword(en) ratio. All deterministic single
    arithmetic ops (SQL-matchable where oracled)."""
    text = batch[text_col]
    toks = _tokens(text)
    n_tok = pc.cast(pc.list_value_length(toks), pa.int64())
    n_char = pc.cast(pc.utf8_length(text), pa.int64())
    # mean token length = (chars - spaces) / tokens, single division
    n_nospace = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(text, _WS, "")), pa.int64()
    )
    mean_tok_len = pc.divide(
        pc.cast(n_nospace, pa.float64()), pc.cast(n_tok, pa.float64())
    )
    flat = pc.list_flatten(toks)
    sw = pa.array(sorted(_STOPWORDS["en"]), type=pa.string())
    is_sw = pc.is_in(flat, value_set=sw)
    # per-doc stopword counts via offsets reduce
    offs = np.zeros(len(batch) + 1, dtype=np.int64)
    np.cumsum(pc.list_value_length(toks).to_numpy(zero_copy_only=False), out=offs[1:])
    swn = np.add.reduceat(
        np.append(is_sw.to_numpy(zero_copy_only=False).astype(np.int64), 0),
        offs[:-1],
    )
    swn[offs[:-1] == offs[1:]] = 0
    stop_ratio = swn / np.maximum(
        pc.cast(n_tok, pa.int64()).to_numpy(zero_copy_only=False), 1
    )
    return pa.table(
        {
            id_col: batch[id_col],
            "n_chars": n_char,
            "n_tokens": n_tok,
            "mean_token_len": mean_tok_len,
            "stopword_ratio": pa.array(stop_ratio),
        }
    )


def quality_scores(ds, **kw):
    return ds.map_batches(
        lambda b: quality_batch(b, **kw),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def langid_batch(batch: pa.Table, text_col="text", id_col="doc_id") -> pa.Table:
    """Stopword-vote language heuristic; 'und' when no list scores."""
    toks = _tokens(batch[text_col])
    flat = pc.list_flatten(pc.split_pattern_regex(
        pc.utf8_lower(pc.utf8_trim_whitespace(batch[text_col])), _WS
    ))
    flat_np = flat.to_numpy(zero_copy_only=False)
    offs = np.zeros(len(batch) + 1, dtype=np.int64)
    np.cumsum(pc.list_value_length(toks).to_numpy(zero_copy_only=False), out=offs[1:])
    langs = list(_STOPWORDS)
    scores = np.zeros((len(batch), len(langs)), dtype=np.int64)
    for li, lang in enumerate(langs):
        hit = np.isin(flat_np, list(_STOPWORDS[lang])).astype(np.int64)
        s = np.add.reduceat(np.append(hit, 0), offs[:-1])
        s[offs[:-1] == offs[1:]] = 0
        scores[:, li] = s
    best = scores.argmax(axis=1)
    none = scores.max(axis=1) == 0
    out = np.array(langs, dtype=object)[best]
    out[none] = "und"
    return pa.table(
        {id_col: batch[id_col], "lang_pred": pa.array(out.tolist())}
    )


def lang_id(ds, **kw):
    return ds.map_batches(
        lambda b: langid_batch(b, **kw),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


_FP_BASE = np.uint64(1099511628211)
_FP_SEED = np.uint64(14695981039346656037)


def fingerprint_batch(batch: pa.Table, text_col="text", id_col="doc_id") -> pa.Table:
    """FNV-1a-style rolling hash over UTF-8 bytes, vectorized across the
    batch by processing byte position i of every doc simultaneously."""
    arr = batch[text_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)
    n = len(arr)
    lens = offs[1:] - offs[:-1]
    h = np.full(n, _FP_SEED, dtype=np.uint64)
    maxlen = int(lens.max()) if n else 0
    idx = offs[:-1].astype(np.int64)
    for i in range(maxlen):
        active = lens > i
        b = buf[idx[active] + i].astype(np.uint64)
        h[active] = (h[active] ^ b) * _FP_BASE
    return pa.table(
        {
            id_col: batch[id_col],
            "fingerprint": pa.array(h.view(np.int64)),
        }
    )


def fingerprints(ds, **kw):
    return ds.map_batches(
        lambda b: fingerprint_batch(b, **kw),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def ngram_count_batch(
    batch: pa.Table, text_col="text", n: int = 3
) -> pa.Table:
    """Per-batch word n-gram counts → (gram, n_occ) partials.

    Single-space tokenization (matches DuckDB ``string_split(text,
    ' ')`` — the near_dup shingle discipline); gram construction is
    fully vectorized: flatten all tokens, compute valid window starts
    per doc with repeat arithmetic, join the n shifted takes with one
    ``binary_join_element_wise``. Partial counting happens HERE so
    only (gram, count) distinct rows leave the batch — the corpus
    token stream never shuffles."""
    toks = pc.split_pattern(batch[text_col], " ")
    flat = pc.list_flatten(toks).combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    offs = np.r_[0, np.cumsum(lens)]
    valid = np.maximum(lens - (n - 1), 0)
    cum = np.r_[0, np.cumsum(valid)]
    pos = np.arange(cum[-1], dtype=np.int64) - np.repeat(cum[:-1], valid)
    j = np.repeat(offs[:-1], valid) + pos
    if len(j) == 0:
        return pa.table(
            {
                "gram": pa.array([], type=pa.string()),
                "n_occ": pa.array([], type=pa.int64()),
            }
        )
    parts = [pc.take(flat, pa.array(j + k)) for k in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    g = (
        pa.table({"gram": grams})
        .group_by(["gram"], use_threads=False)
        .aggregate([([], "count_all")])
    )
    g = g.rename_columns(
        ["n_occ" if c == "count_all" else c for c in g.column_names]
    )
    return g.select(["gram", "n_occ"])


def frequent_ngrams(ds, n: int = 3, min_count: int = 2):
    """Corpus-wide frequent word n-grams → Dataset (gram, n_occ) with
    n_occ ≥ min_count — the contamination/boilerplate statistic of a
    curation pipeline. Per-batch partial counts (above) then one keyed
    sum over distinct grams; the result is sorted by gram for
    deterministic output."""
    from ..ops.shuffle import hash_group_apply

    partials = ds.map_batches(
        lambda b: ngram_count_batch(b, n=n),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def final(tbl, starts):
        if tbl is None or len(starts) == 0:
            return pa.table(
                {
                    "gram": pa.array([], type=pa.string()),
                    "n_occ": pa.array([], type=pa.int64()),
                }
            )
        counts = np.diff(np.append(starts, tbl.num_rows))
        occ = tbl["n_occ"].to_numpy(zero_copy_only=False)
        sums = np.add.reduceat(occ, starts)
        keep = sums >= min_count
        return pa.table(
            {
                "gram": tbl["gram"].take(pa.array(starts[keep])),
                "n_occ": pa.array(sums[keep]),
            }
        )

    # hash_group_apply instead of the Ray keyed aggregate: the keyed
    # Aggregate operator costs ~3 s of fixed latency per job at bench
    # scale (the grouped_sum_count driver-final lesson), while the
    # raw-task hash shuffle moves the same (gram, count) partials for
    # a fraction of it; min_count filtering happens inside the reduce,
    # so only the ABOVE-THRESHOLD grams (the useful, small output of a
    # boilerplate statistic) ever reach the driver, where one Arrow
    # sort beats a whole Dataset.sort job
    import ray

    refs = hash_group_apply(partials, ["gram"], final, return_refs=True)
    tabs = [t for t in ray.get(refs) if t is not None and t.num_rows]
    if not tabs:
        return pa.table(
            {
                "gram": pa.array([], type=pa.string()),
                "n_occ": pa.array([], type=pa.int64()),
            }
        )
    return pa.concat_tables(tabs).combine_chunks().sort_by("gram")


# ------------------------------------------------------------ PII redaction

# RE2-compatible patterns (pyarrow and DuckDB both run RE2, so the
# engine and the SQL oracle are byte-exact on the same expressions —
# verified including the '1.2.3.4 is an IP' and 'x@y.z has no 2-char
# TLD' edge cases). No lookarounds: RE2 has none.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\-\s()]{6,}\d", "<PHONE>"),
)


def redact_pii_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """(id, clean_text, n_redacted) for one batch: sequential global
    regex replacement (email → ip → phone — order matters and the SQL
    oracle nests in the same order) plus the pre-redaction match
    count, all in Arrow's RE2 kernels."""
    arr = batch[text_col]
    out = arr
    cnt = None
    for pat, tok in PII_PATTERNS:
        c = pc.count_substring_regex(arr, pattern=pat)
        cnt = c if cnt is None else pc.add(cnt, c)
        out = pc.replace_substring_regex(out, pattern=pat, replacement=tok)
    return pa.table(
        {
            id_col: batch[id_col],
            "clean_text": out,
            "n_redacted": pc.cast(cnt, pa.int64()),
        }
    )


def redact_pii(ds, text_col: str = "text", id_col: str = "doc_id"):
    """PII scrubbing over a document Dataset — the standard
    training-data curation stage (emails / IPv4s / phone-like digit
    runs → fixed tokens). Stateless vectorized map; text never
    shuffles."""
    if isinstance(ds, pa.Table):
        return redact_pii_batch(ds, text_col, id_col)
    return ds.map_batches(
        lambda b: redact_pii_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ------------------------------------------------------------ chunking


def chunk_text_batch(
    batch: pa.Table,
    chunk_size: int = 200,
    overlap: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Fixed-window character chunks with overlap for one batch →
    (id, chunk_idx, chunk). Vectorized per CHUNK INDEX, not per row:
    for each k the still-chunking rows are sliced with one Arrow
    utf8_slice_codeunits call (codepoint semantics — identical to SQL
    substr), so the loop count is the max chunks of any one document,
    never the row count. Documents shorter than chunk_size emit one
    chunk (possibly empty for empty text)."""
    stride = chunk_size - overlap
    if stride <= 0:
        raise ValueError("chunk_text: overlap must be < chunk_size")
    arr = batch[text_col]
    ids = batch[id_col]
    lens = pc.utf8_length(arr).to_numpy(zero_copy_only=False)
    n_chunks = np.where(
        lens <= chunk_size, 1, (lens - chunk_size + stride - 1) // stride + 1
    ).astype(np.int64)
    out_ids, out_k, out_chunks = [], [], []
    for k in range(int(n_chunks.max()) if len(n_chunks) else 0):
        mask = pa.array(n_chunks > k)
        out_ids.append(pc.filter(ids, mask))
        sub = pc.utf8_slice_codeunits(
            pc.filter(arr, mask),
            start=k * stride,
            stop=k * stride + chunk_size,
        )
        out_chunks.append(sub)
        out_k.append(
            pa.array(
                np.full(len(sub), k, dtype=np.int64), type=pa.int64()
            )
        )
    if not out_ids:
        return pa.table(
            {
                id_col: pa.array([], type=ids.type),
                "chunk_idx": pa.array([], type=pa.int64()),
                "chunk": pa.array([], type=pa.string()),
            }
        )
    return pa.table(
        {
            id_col: pa.concat_arrays(
                [c.combine_chunks() for c in out_ids]
            ),
            "chunk_idx": pa.concat_arrays(out_k),
            "chunk": pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                 else c for c in out_chunks]
            ),
        }
    )


def chunk_text(
    ds,
    chunk_size: int = 200,
    overlap: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Context-window chunking over a document Dataset — the training
    sequence prep stage (flat_map shape: output longer than input).
    Stateless vectorized map; each chunk carries (doc_id, chunk_idx)
    so downstream packing/shuffling never needs the parent row."""
    if isinstance(ds, pa.Table):
        return chunk_text_batch(ds, chunk_size, overlap, text_col, id_col)
    return ds.map_batches(
        lambda b: chunk_text_batch(
            b, chunk_size, overlap, text_col, id_col
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ------------------------------------------------------------ packing


def pack_documents(
    ds,
    budget: int = 512,
    range_size: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Greedy sequence packing — the training-batch prep stage: docs
    in id order are packed first-fit into bins of ≤ ``budget``
    whitespace tokens (an oversize doc gets its own bin).

    Global sequential packing is inherently serial, so the
    DISTRIBUTED contract packs each id-RANGE partition
    (``doc_id // range_size``) independently: deterministic,
    embarrassingly parallel (one keyed shuffle of (id, part, n_tok) —
    12 B/row, text never moves), and exactly replicated by the SQL
    oracle's per-partition recursive scan. Within a partition the bin
    walk is vectorized over BINS (one searchsorted on the token
    cumsum per bin), never over rows.

    → (id_col, bin_id) with ``bin_id = part * 2^32 + k``."""
    import pyarrow.compute as pc  # noqa: F401  (kept local for clarity)

    from ..ops.shuffle import hash_group_apply

    def derive(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = pc.cast(
            pc.list_value_length(_tokens(batch[text_col])), pa.int64()
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "part": pa.array(ids // range_size),
                "n_tok": n,
            }
        )

    def pack_part(tbl, starts):
        schema = pa.schema([(id_col, pa.int64()), ("bin_id", pa.int64())])
        if tbl is None or len(starts) == 0:
            return schema.empty_table()
        n = tbl.num_rows
        toks = tbl["n_tok"].to_numpy(zero_copy_only=False)
        parts = tbl["part"].to_numpy(zero_copy_only=False)
        ends = np.append(starts[1:], n)
        out_bin = np.empty(n, dtype=np.int64)
        for s, e in zip(starts, ends):
            csum = np.cumsum(toks[s:e])
            base = 0
            start, k = 0, 0
            m = e - s
            while start < m:
                stop = int(
                    np.searchsorted(csum, base + budget, side="right")
                )
                stop = max(stop, start + 1)  # oversize doc: own bin
                out_bin[s + start : s + stop] = (
                    int(parts[s]) * (1 << 32) + k
                )
                base = int(csum[stop - 1])
                start, k = stop, k + 1
        return pa.table(
            {id_col: tbl[id_col], "bin_id": pa.array(out_bin)}
        )

    pruned = (
        derive(ds)
        if isinstance(ds, pa.Table)
        else ds.map_batches(
            derive, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    return hash_group_apply(pruned, ["part"], pack_part, sort_cols=(id_col,))


def normalize_text_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """(id, norm_text): lowercase → collapse whitespace runs to one
    space → trim. All three are Arrow RE2/utf8 kernels mirrored
    byte-for-byte by the DuckDB oracle (lower + regexp_replace 'g' +
    trim) — the redact_pii parity discipline."""
    t = pc.utf8_lower(batch[text_col])
    t = pc.replace_substring_regex(t, r"\s+", " ")
    t = pc.utf8_trim_whitespace(t)
    return pa.table({id_col: batch[id_col], "norm_text": t})


def normalize_text(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Text normalization over a document Dataset — the first stage of
    every dedup/tokenize pipeline. Stateless vectorized map; one pass,
    payloads stream."""
    if isinstance(ds, pa.Table):
        return normalize_text_batch(ds, text_col, id_col)
    return ds.map_batches(
        lambda b: normalize_text_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def bigram_lift_topk(ds, k: int = 20, min_count: int = 5,
                     text_col: str = "text") -> pa.Table:
    """Top-k statistical collocations: word bigrams ranked by LIFT
    (observed/expected co-occurrence, the log-free PMI ranking)

        lift(xy) = (c_xy . Nu^2) / (Nb . c_x . c_y)

    with Nu = total tokens, Nb = total bigram slots (= Nu - n_docs for
    single-space tokenization: every doc contributes len-1 slots), all
    counts exact integers -- so the one float per row is ONE division
    of two exactly-computed integer products, each correctly rounded
    to float64 (int64 fast path when Nu^3 < 2^62 bounds BOTH products;
    arbitrary-precision Python ints past that), mirrored by the
    oracle's HUGEINT -> DOUBLE casts.

    Scale shape: both count passes reuse frequent_ngrams (per-batch
    vectorized partial counts, ONE keyed exchange of distinct
    (gram, count) rows -- the token stream never shuffles; min_count
    prunes the bigram table inside the reduce). The unigram table is
    vocabulary-bounded and lives on the driver (same documented
    vocab << corpus assumption as frequent_ngrams itself); the lift
    join is one vectorized index_in against it. Output is
    total-ordered by (lift DESC, gram ASC) so top-k is deterministic
    under float ties."""
    if isinstance(ds, pa.Table):
        def _counts(n, mc):
            t = ngram_count_batch(ds, text_col=text_col, n=n)
            if t.num_rows == 0:
                return t
            g = t.group_by("gram").aggregate([("n_occ", "sum")])
            g = g.rename_columns(["gram", "n_occ"])
            return g.filter(pc.greater_equal(g["n_occ"], mc)).sort_by(
                "gram"
            )
        n_docs = ds.num_rows
    else:
        sel = ds.select_columns([text_col])

        def _counts(n, mc):
            return frequent_ngrams(sel, n=n, min_count=mc)
        n_docs = int(ds.count())

    uni = _counts(1, 1)                                   # driver table
    nu = int(pc.sum(uni["n_occ"]).as_py() or 0)
    nb = nu - n_docs
    bi = _counts(2, min_count)                            # driver table

    empty = pa.table(
        {
            "gram": pa.array([], type=pa.string()),
            "n_occ": pa.array([], type=pa.int64()),
            "lift": pa.array([], type=pa.float64()),
        }
    )
    if bi.num_rows == 0 or nb <= 0:
        return empty

    parts = pc.split_pattern(bi["gram"], " ")
    w1 = pc.list_element(parts, 0)
    w2 = pc.list_element(parts, 1)
    uni_words = uni["gram"].combine_chunks()
    uni_counts = uni["n_occ"].to_numpy(zero_copy_only=False)
    c1 = uni_counts[pc.index_in(w1, uni_words).to_numpy(zero_copy_only=False)]
    c2 = uni_counts[pc.index_in(w2, uni_words).to_numpy(zero_copy_only=False)]
    cxy = bi["n_occ"].to_numpy(zero_copy_only=False)

    # c_xy <= Nu and c_x*c_y <= Nu^2, so Nu^3 < 2^62 bounds both the
    # numerator c_xy*Nu^2 and the denominator Nb*c_x*c_y (Nb < Nu) --
    # every int64 intermediate stays exact on the fast path.
    if nu ** 3 < (1 << 62):
        lift = (cxy * nu * nu).astype(np.float64) / (
            nb * c1 * c2
        ).astype(np.float64)
    else:  # web-scale counts: exact Python ints, one rounded division
        lift = np.array(
            [
                float(int(a) * nu * nu) / float(nb * int(b) * int(c))
                for a, b, c in zip(cxy, c1, c2)
            ],
            dtype=np.float64,
        )
    t = pa.table(
        {
            "gram": bi["gram"],
            "n_occ": bi["n_occ"],
            "lift": pa.array(lift, type=pa.float64()),
        }
    )
    t = t.combine_chunks().sort_by(
        [("lift", "descending"), ("gram", "ascending")]
    )
    return t.slice(0, k)


def vocab_stats(ds, group_col: str = "lang", text_col: str = "text"):
    """Per-group vocabulary statistics — token count, type (distinct
    word) count, hapax-legomenon count and type-token ratio — the
    Zipf-health / OCR-garbage monitor of a text-curation pipeline
    (a source whose hapax share explodes is usually mis-decoded).

    Scale shape: pass A reduces each batch to distinct
    (group, word, c) partial rows (one Arrow group_by per block — the
    frequent_ngrams discipline, the token stream itself never
    shuffles), one keyed exchange sums them into the global per-group
    word histogram; pass B reduces that histogram to ≤|groups| partial
    rows per partition (n_tokens = Σc, n_types = rows, n_hapax =
    Σ[c=1]) and driver-merges — groups are dimension-sized by
    assumption. All counts exact int64; ttr = n_types/n_tokens is the
    ONE mirrored division. Tokenization: split on single spaces
    (string_split parity, not the \\s+ regex family)."""
    from ..ops.agg import grouped_sum_count

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        idx = np.repeat(np.arange(len(b), dtype=np.int64), lens)
        t = pa.table(
            {
                group_col: b[group_col].take(pa.array(idx)),
                "w": pc.list_flatten(toks),
            }
        )
        g = t.group_by([group_col, "w"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns([group_col, "w", "c"])

    counts = grouped_sum_count(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        [group_col, "w"],
        sum_cols=["c"],
        final="shuffle",
    )

    def reduce_part(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                group_col: b[group_col],
                "n_tokens": pa.array(c),
                "n_types": pa.array(np.ones(len(b), dtype=np.int64)),
                "n_hapax": pa.array((c == 1).astype(np.int64)),
            }
        )
        g = t.group_by([group_col], use_threads=False).aggregate(
            [("n_tokens", "sum"), ("n_types", "sum"), ("n_hapax", "sum")]
        )
        return g.rename_columns(
            [group_col, "n_tokens", "n_types", "n_hapax"]
        )

    out = grouped_sum_count(
        counts.map_batches(reduce_part, batch_format="pyarrow",
                           zero_copy_batch=True),
        [group_col],
        sum_cols=["n_tokens", "n_types", "n_hapax"],
        final="driver",
    )
    out = out.combine_chunks().sort_by([(group_col, "ascending")])
    ttr = out["n_types"].to_numpy().astype(np.float64) / out[
        "n_tokens"
    ].to_numpy().astype(np.float64)
    return out.append_column("ttr", pa.array(ttr))
