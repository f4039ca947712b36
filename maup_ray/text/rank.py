"""BM25 document ranking over a text corpus — the retrieval /
data-selection primitive (query-focused corpus filtering, hard-negative
mining, relevance-weighted sampling).

Two streaming passes, both reductions — nothing corpus-sized ever
moves or lands on the driver:

  pass 1 (stats): each batch emits ONE row of exact-integer partials —
    (n_docs, total_tokens, df per query term). Document frequencies
    are computed only for the QUERY's terms (a handful), never the
    corpus vocabulary, so the partial is O(len(terms)) regardless of
    corpus size. Driver-merges exact ints.
  pass 2 (score + top-k): per batch, term frequencies come from one
    flatten + equality mask + bincount per term (no Python loop over
    rows), scores are a fixed IEEE expression of exact-integer inputs,
    and only each batch's top-k rows leave the stage (k rows per
    block, the ops/curate.top_k_per_group combiner discipline). The
    driver merges block winners and keeps the global top-k.

Exactness discipline (why the DuckDB oracle matches bit-for-bit, the
near_dup c/(na+nb-c) precedent): tf, df, dl, N, Σdl are exact int64;
k1=1.25, b=0.75, k1+1=2.25 are dyadic; the score is evaluated in ONE
fixed parenthesization of correctly-rounded IEEE +,-,*,/ (no
transcendentals — the idf is the algebraic (N-df+0.5)/(df+0.5) form,
not the log form) mirrored token-for-token in the SQL, and the
per-term sum is a fixed left-to-right chain. Rank order is totalized
by (score DESC, id ASC) on both sides.

Tokenization is the corpus-wide single-space split (DuckDB
``string_split(text, ' ')`` — the near_dup/ngrams shingle discipline).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["bm25_topk", "bm25_topk_multi", "bm25_score_batch",
           "inverted_index"]

K1 = 1.25  # dyadic — exactly representable
B = 0.75


def _term_tfs(batch: pa.Table, terms, text_col: str):
    """(dl, [tf_t per term]) for one batch — vectorized: one token
    flatten, one equality mask + bincount per term.

    Null text is treated as the EMPTY document (dl=0, every tf=0 ⇒
    score 0.0). Note the SQL side differs there — DuckDB propagates
    NULL through the whole expression — but the oracle corpus
    (documents.text) is non-null, so the guard only changes behavior
    on inputs the oracle can't express anyway.
    """
    col = batch[text_col]
    nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
    nulls = np.asarray(nulls, dtype=bool)
    has_null = bool(nulls.any())
    if has_null:
        col = pc.fill_null(col, "")
    toks = pc.split_pattern(col, " ")
    lens = (
        pc.list_value_length(toks)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = pc.list_flatten(toks).combine_chunks()
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    if has_null:
        lens = np.where(nulls, 0, lens)
    # ONE pass over the token stream for the whole vocabulary:
    # index_in maps each token to its term slot (-1 = not a term),
    # then a single bincount over doc×term cells — O(tokens + n·T)
    # instead of one equality scan per term. Dedup first so a repeated
    # query term still gets its own (identical) tf column.
    uniq = list(dict.fromkeys(terms))
    T = len(uniq)
    slot = pc.fill_null(
        pc.index_in(flat, pa.array(uniq, type=pa.string())), -1
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    valid = slot >= 0
    if has_null:
        valid &= ~nulls[doc_idx]  # drop the filler "" token rows
    cells = doc_idx[valid] * T + slot[valid]
    tf = (
        np.bincount(cells, minlength=len(batch) * T)
        .reshape(len(batch), T)
        .astype(np.int64)
    )
    upos = {t: i for i, t in enumerate(uniq)}
    tfs = [tf[:, upos[t]] for t in terms]
    return lens, tfs


def bm25_score_batch(
    batch: pa.Table,
    terms,
    n_docs: int,
    total_len: int,
    dfs,
    text_col: str = "text",
) -> np.ndarray:
    """Per-row BM25 scores (float64) — the fixed IEEE expression the
    SQL oracle mirrors. Pure function of exact integers, hence
    partition-invariant."""
    dl, tfs = _term_tfs(batch, terms, text_col)
    avgdl = float(total_len) / float(n_docs)
    dl_f = dl.astype(np.float64)
    x = dl_f / avgdl
    denom_len = K1 * ((1.0 - B) + B * x)
    score = None
    for tf, df in zip(tfs, dfs):
        tf_f = tf.astype(np.float64)
        idf = (float(n_docs) - float(df) + 0.5) / (float(df) + 0.5)
        s = (tf_f * (K1 + 1.0)) / (tf_f + denom_len) * idf
        score = s if score is None else score + s
    return score


def bm25_topk(
    ds,
    terms,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Top-k documents by BM25 — (id_col, score) sorted by
    (score DESC, id ASC). ``ds`` is consumed twice (stats, score); a
    Dataset re-executes its plan, a pa.Table is used directly."""
    terms = list(terms)

    def stats(batch: pa.Table) -> pa.Table:
        dl, tfs = _term_tfs(batch, terms, text_col)
        cols = {
            "n_docs": pa.array([len(batch)], type=pa.int64()),
            "total_len": pa.array([int(dl.sum())], type=pa.int64()),
        }
        for i, tf in enumerate(tfs):
            cols[f"df_{i}"] = pa.array(
                [int((tf > 0).sum())], type=pa.int64()
            )
        return pa.table(cols)

    if isinstance(ds, pa.Table):
        rows = stats(ds).to_pylist()
    else:
        # one tiny dict per block — the reduction collapsed upstream
        rows = ds.map_batches(
            stats, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
    n_docs = sum(r["n_docs"] for r in rows)
    total_len = sum(r["total_len"] for r in rows)
    dfs = [sum(r[f"df_{i}"] for r in rows) for i in range(len(terms))]
    if n_docs == 0:
        return pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )

    # every document empty/null ⇒ avgdl would be 0/… ⇒ define all
    # scores as 0 rather than dividing into NaN
    total_len_safe = total_len if total_len > 0 else 1

    def score_topk(batch: pa.Table) -> pa.Table:
        s = bm25_score_batch(
            batch, terms, n_docs, total_len_safe, dfs, text_col
        )
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:k]
        return pa.table(
            {
                id_col: batch[id_col].take(pa.array(order)),
                "score": pa.array(s[order], type=pa.float64()),
            }
        )

    if isinstance(ds, pa.Table):
        winners = score_topk(ds)
    else:
        # ≤ k rows per block reach the driver
        wrows = ds.map_batches(
            score_topk, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        winners = pa.table(
            {
                id_col: pa.array([r[id_col] for r in wrows]),
                "score": pa.array(
                    [r["score"] for r in wrows], type=pa.float64()
                ),
            }
        )
    order = np.lexsort(
        (
            winners[id_col].to_numpy(zero_copy_only=False),
            -winners["score"].to_numpy(zero_copy_only=False),
        )
    )[:k]
    return winners.take(pa.array(order))


def bm25_topk_multi(
    ds,
    queries: dict,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Top-k per query for a BATCH of queries in the same two corpus
    passes as ``bm25_topk`` — the retrieval-style shape (many queries,
    one corpus scan), vs one scan per query.

    ``queries`` maps query name → term sequence. The stats pass emits
    one O(|vocab|) partial row per block for the UNION vocabulary; the
    score pass computes each vocab term's tf once per batch and reuses
    it across queries, emitting ≤ k rows per (query × block).

    Exactness: per-query scores use the identical fixed IEEE
    expression as ``bm25_topk`` with the per-term sum in the QUERY's
    given term order (the SQL oracle mirrors that order token for
    token), so a single-query call of this function equals
    ``bm25_topk`` bit for bit. Output (query, id, score) is sorted by
    (query ASC, score DESC, id ASC), k rows per query.
    """
    qnames = sorted(queries)
    vocab = sorted({t for q in qnames for t in queries[q]})
    vpos = {t: i for i, t in enumerate(vocab)}

    def stats(batch: pa.Table) -> pa.Table:
        dl, tfs = _term_tfs(batch, vocab, text_col)
        cols = {
            "n_docs": pa.array([len(batch)], type=pa.int64()),
            "total_len": pa.array([int(dl.sum())], type=pa.int64()),
        }
        for i, tf in enumerate(tfs):
            cols[f"df_{i}"] = pa.array(
                [int((tf > 0).sum())], type=pa.int64()
            )
        return pa.table(cols)

    if isinstance(ds, pa.Table):
        rows = stats(ds).to_pylist()
    else:
        rows = ds.map_batches(
            stats, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
    n_docs = sum(r["n_docs"] for r in rows)
    total_len = sum(r["total_len"] for r in rows)
    dfs = [sum(r[f"df_{i}"] for r in rows) for i in range(len(vocab))]

    def empty() -> pa.Table:
        return pa.table(
            {
                "query": pa.array([], type=pa.string()),
                id_col: pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )

    if n_docs == 0:
        return empty()
    # all-empty corpus guard: avgdl 0 would produce NaN; tf is 0
    # everywhere so any positive avgdl yields the same 0.0 scores
    avgdl = float(total_len if total_len > 0 else 1) / float(n_docs)

    def score_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty()
        dl, tfs = _term_tfs(batch, vocab, text_col)
        x = dl.astype(np.float64) / avgdl
        denom_len = K1 * ((1.0 - B) + B * x)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        parts = []
        for q in qnames:
            score = None
            for t in queries[q]:
                i = vpos[t]
                tf_f = tfs[i].astype(np.float64)
                idf = (float(n_docs) - float(dfs[i]) + 0.5) / (
                    float(dfs[i]) + 0.5
                )
                s = (tf_f * (K1 + 1.0)) / (tf_f + denom_len) * idf
                score = s if score is None else score + s
            order = np.lexsort((ids, -score))[:k]
            parts.append(
                pa.table(
                    {
                        "query": pa.array(
                            [q] * len(order), type=pa.string()
                        ),
                        id_col: batch[id_col].take(pa.array(order)),
                        "score": pa.array(
                            score[order], type=pa.float64()
                        ),
                    }
                )
            )
        return pa.concat_tables(parts)

    if isinstance(ds, pa.Table):
        winners = score_topk(ds)
    else:
        wrows = ds.map_batches(
            score_topk, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        winners = pa.table(
            {
                "query": pa.array(
                    [r["query"] for r in wrows], type=pa.string()
                ),
                id_col: pa.array([r[id_col] for r in wrows]),
                "score": pa.array(
                    [r["score"] for r in wrows], type=pa.float64()
                ),
            }
        )
    if winners.num_rows == 0:
        return empty()
    # per-query global top-k, then (query, score DESC, id) total order
    qarr = winners["query"].to_numpy(zero_copy_only=False)
    ids = winners[id_col].to_numpy(zero_copy_only=False)
    sc = winners["score"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -sc, qarr))
    qsort = qarr[order]
    starts = np.r_[0, 1 + np.flatnonzero(qsort[1:] != qsort[:-1])]
    ends = np.r_[starts[1:], len(qsort)]
    keep = np.concatenate(
        [order[s : min(s + k, e)] for s, e in zip(starts, ends)]
    )
    return winners.take(pa.array(keep))


def tfidf_topk(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    scale: int = 10**6,
    vocab_limit: int = 2_000_000,
):
    """Per-document top-k terms by tf-idf — the keyword-extraction /
    data-selection primitive (topic tagging, per-doc summaries,
    lexical-diversity filters).

    Exactness: the rank key is the INTEGER-quantized score
    ``score_u = (tf · scale · N) // df`` (floor division of exact
    ints — no float idf, no log), totalized by (score_u DESC, term) —
    the SQL mirror is the same HUGEINT expression. Caller bound:
    ``tf·scale·N < 2^63`` (at web scale drop ``scale``; the engine
    computes in HUGEINT-equivalent object ints only on the SQL side,
    so the int64 bound is asserted here).

    Scale shape: two streaming passes, no corpus-sized shuffle.
    Pass 1 reduces per-batch per-term document frequencies (each doc
    lives in exactly one batch, so partials are disjoint and sum
    exactly) to the VOCABULARY-sized df table, driver-merged under
    ``vocab_limit`` rows and broadcast back; beyond the limit the op
    raises and points at a term-keyed co-shuffle variant rather than
    silently materializing an unbounded vocabulary (the embed_dedup
    discipline). Pass 2 re-tokenizes each batch, scores against the
    broadcast df map and emits only each doc's top-k rows — per-doc
    top-k is batch-local because a document is one row.
    """
    import ray

    from ..ops.agg import grouped_sum_count

    def _doc_terms(batch: pa.Table):
        """(doc_ids_rep, flat_terms, doc_lens) for one batch."""
        toks = pc.split_pattern(
            pc.fill_null(batch[text_col], ""), " "
        )
        lens = (
            pc.list_value_length(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = pc.list_flatten(toks).combine_chunks()
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        return doc_idx, flat, lens

    def df_partial(batch: pa.Table) -> pa.Table:
        doc_idx, flat, _ = _doc_terms(batch)
        # distinct (doc, term) presence -> per-term counts
        t = pa.table(
            {"d": pa.array(doc_idx), "term": flat}
        ).group_by(["d", "term"], use_threads=False).aggregate([])
        g = t.group_by(["term"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        g = g.rename_columns(
            ["df" if c == "count_all" else c for c in g.column_names]
        )
        return g.append_column(
            "n_docs_p",
            pa.array(
                np.full(len(g), 0, dtype=np.int64)
            ) if len(g) == 0 else pa.array(
                np.concatenate(
                    ([np.int64(len(batch))], np.zeros(len(g) - 1,
                                                      dtype=np.int64))
                )
            ),
        )

    dfs = grouped_sum_count(
        ds.map_batches(
            df_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["term"],
        sum_cols=["df", "n_docs_p"],
        final="driver",
    )
    if len(dfs) > vocab_limit:
        raise ValueError(
            f"tfidf_topk: vocabulary has {len(dfs)} distinct terms — "
            f"past vocab_limit={vocab_limit} the df table must not "
            "be driver-resident; use a term-keyed co-shuffle join "
            "(ops/shuffle.hash_group_apply) for this corpus"
        )
    n_docs = int(pc.sum(dfs["n_docs_p"]).as_py() or 0)
    vocab = dfs["term"].combine_chunks()
    dfv = dfs["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    max_tf_bound = (2**63 - 1) // max(scale * max(n_docs, 1), 1)
    ref = ray.put((vocab, dfv))

    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            ("term", pa.string()),
            ("tf", pa.int64()),
            ("df", pa.int64()),
            ("score_u", pa.int64()),
        ]
    )

    def score(batch: pa.Table) -> pa.Table:
        voc, dfn = ray.get(ref)
        doc_idx, flat, _ = _doc_terms(batch)
        t = pa.table(
            {"d": pa.array(doc_idx), "term": flat}
        ).group_by(["d", "term"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        if len(t) == 0:
            return out_schema.empty_table()
        tf = t["count_all"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if tf.max(initial=0) > max_tf_bound:
            raise OverflowError(
                "tfidf_topk: tf*scale*N exceeds int64 — lower `scale`"
            )
        slot = pc.index_in(t["term"], voc).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        df_row = dfn[slot]
        score_u = (tf * scale * np.int64(n_docs)) // df_row
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-doc top-k: stable lexsort — primary doc, then score
        # DESC, then term ASC (exact ORDER BY mirror)
        term_np = t["term"].to_numpy(zero_copy_only=False)
        order = np.lexsort((term_np, -score_u, d))
        ds_ = d[order]
        first = np.flatnonzero(
            np.diff(ds_, prepend=ds_[0] - 1)
        )
        rank = np.arange(len(ds_)) - np.repeat(
            first, np.diff(np.append(first, len(ds_)))
        )
        keep = order[rank < k]
        ids = batch[id_col].take(pa.array(d[keep]))
        return pa.table(
            {
                id_col: ids,
                "term": t["term"].take(pa.array(keep)),
                "tf": pa.array(tf[keep]),
                "df": pa.array(df_row[keep]),
                "score_u": pa.array(score_u[keep]),
            }
        )

    return ds.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def inverted_index(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 5,
):
    """Distributed inverted-index build: per token, the document
    frequency ``df``, collection frequency ``cf``, and the posting
    list as a comma-joined ascending doc-id string — the retrieval-
    infrastructure counterpart of bm25 (which scores ad hoc; this
    materializes the index). Tokenization is the corpus single-space
    split (``string_split(text, ' ')`` parity, the word_stats/ngrams
    discipline).

    Scale shape: each batch pre-combines the token stream to its
    distinct ``(token, doc, count)`` partials (one Arrow group_by per
    block), so the ONE token-hash exchange moves vocabulary-bounded
    rows, never the corpus. Each reduce partition owns its tokens
    wholly (hash routing): one sort, one adjacent-duplicate merge for
    cross-block repeats, reduceat for df/cf, and the posting strings
    come from Arrow ``binary_join`` over a list array built directly
    on the sorted values — no per-token Python. min_df filters inside
    the reducer. Posting lists of web-scale stopwords are the one
    skew risk: a token's postings must fit a partition row — cap or
    drop ultra-high-df tokens upstream for corpora where that bites
    (df >> partition heap / 8 B).
    """

    def pairs(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        lens = (
            pc.list_value_length(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = pc.list_flatten(toks).combine_chunks()
        docs = np.repeat(
            b[id_col].to_numpy(zero_copy_only=False), lens
        )
        t = (
            pa.table({"token": flat, "doc_id": pa.array(docs)})
            .group_by(["token", "doc_id"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return t.rename_columns(["token", "doc_id", "c"])

    pruned = (
        pairs(ds)
        if isinstance(ds, pa.Table)
        else ds.map_batches(
            pairs, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                "token": pa.array([], type=pa.string()),
                "df": pa.array([], type=pa.int64()),
                "cf": pa.array([], type=pa.int64()),
                "postings": pa.array([], type=pa.string()),
            }
        )
        if tbl is None or tbl.num_rows == 0:
            return empty
        n = tbl.num_rows
        d = tbl["doc_id"].to_numpy(zero_copy_only=False)
        c = tbl["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        first = np.zeros(n, dtype=bool)
        first[starts] = True
        # cross-block repeats of one (token, doc) are adjacent after
        # the contract sort — merge them by summing counts
        keep = first.copy()
        keep[1:] |= d[1:] != d[:-1]
        seg = np.cumsum(keep) - 1
        c = np.bincount(seg, weights=c).astype(np.int64)
        d, first = d[keep], first[keep]
        m = len(d)
        tok = tbl["token"].combine_chunks()
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.chunk(0) if tok.num_chunks else pa.array(
                [], type=pa.string()
            )
        tok = tok.take(pa.array(np.flatnonzero(keep)))
        g = np.flatnonzero(first)
        df = np.diff(np.append(g, m)).astype(np.int64)
        cf = np.add.reduceat(c, g)
        # posting strings: list array over the sorted doc ids, joined
        doc_str = pc.cast(pa.array(d), pa.string())
        offsets = pa.array(
            np.append(g, m).astype(np.int32), type=pa.int32()
        )
        lists = pa.ListArray.from_arrays(offsets, doc_str)
        postings = pc.binary_join(lists, ",")
        out = pa.table(
            {
                "token": tok.take(pa.array(g)),
                "df": pa.array(df),
                "cf": pa.array(cf),
                "postings": postings,
            }
        )
        if min_df > 1:
            out = out.filter(pc.greater_equal(out["df"], min_df))
        return out

    from ..ops.shuffle import group_starts, hash_group_apply

    if isinstance(pruned, pa.Table):
        t = pruned.combine_chunks().sort_by(
            [("token", "ascending"), ("doc_id", "ascending")]
        )
        return part(t, group_starts(t, ["token"]))
    return hash_group_apply(
        pruned, ["token"], part, sort_cols=("doc_id",)
    )
