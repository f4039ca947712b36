"""Multinomial Naive Bayes training — the classic text classifier a
curation pipeline trains on weak labels (language, source, quality
tier) to score the rest of the corpus.

For every (class, token) pair the model stores the Laplace-smoothed
log-likelihood; to keep the engine and the DuckDB oracle bit-identical
the log is the repo's floor-quantized form (ops/infotheory.qlog_floor,
exact libm↔DuckDB at any magnitude):

    qlogp = floor(ln(c + alpha)·2^30) − floor(ln(N_class + alpha·V)·2^30)

— both floors are exact int64, their difference is exact, and the
true smoothed log-prob is recovered as qlogp/2^30 within 2·2^-30.

Scale shape (the corpus tokenizes ONCE, text never shuffles):

1. per-batch Arrow ``group_by`` count partials → a materialized
   (class, token, c) partial Dataset (vocab×blocks rows, no payload);
2. per-class totals ``N_class = Σc`` from those partials
   (ops/agg.grouped_sums_exact — langs×blocks driver rows, exact
   Python-int merge);
3. ONE token-keyed hash exchange of the partials: each token's rows
   land in exactly one partition, so per-(token, class) totals are
   final there AND per-partition distinct-token counts are disjoint
   partials of the vocabulary size V — both ride out of the same
   exchange as kind-flagged rows (the link_prediction mixed-row
   pattern);
4. the model table stays DISTRIBUTED — the driver holds only the
   per-partition V partials and the per-class denominators; qlogp is
   stamped by a stateless vectorized map over the model blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["naive_bayes_train", "naive_bayes_classify"]


def naive_bayes_train(ds, class_col: str, text_col: str,
                      alpha: int = 1, with_meta: bool = False):
    """Train a multinomial NB model over whitespace tokens of
    ``text_col`` labelled by ``class_col`` (string). Returns a Dataset
    with columns (class_col, token, c, qlogp):

      c      exact int64 count of token in class
      qlogp  quantized smoothed log-likelihood (see module docstring)

    ``alpha`` is the integer Laplace pseudo-count (≥ 1 so ln stays in
    domain even for c = 0 rows — which never appear here since only
    observed pairs are emitted)."""
    import ray
    import pyarrow.compute as pc

    from ..ops.agg import grouped_sums_exact
    from ..ops.infotheory import qlog_floor, _qlog1
    from ..ops.shuffle import hash_group_apply

    if alpha < 1:
        raise ValueError("naive_bayes_train: alpha must be >= 1")

    def tok_counts(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        lens = (
            pc.list_value_length(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = pc.list_flatten(toks).combine_chunks()
        cls = b[class_col].take(
            pa.array(np.repeat(np.arange(len(b), dtype=np.int64), lens))
        )
        g = pa.table({class_col: cls, "token": flat}).group_by(
            [class_col, "token"], use_threads=False
        ).aggregate([([], "count_all")])
        return g.rename_columns([class_col, "token", "c"])

    partials = ds.map_batches(
        tok_counts, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    totals = grouped_sums_exact(partials, [class_col], sum_cols=["c"])
    n_class = {r[class_col]: int(r["c"]) for r in totals}

    _EMPTY = pa.schema(
        [
            (class_col, pa.string()),
            ("token", pa.string()),
            ("c", pa.int64()),
            ("kind", pa.int8()),
        ]
    )

    def part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        # groups = tokens (exchange key); rows sorted by class within
        # each token group → (token, class) runs are contiguous
        if tbl is None or tbl.num_rows == 0:
            return _EMPTY.empty_table()
        n = tbl.num_rows
        starts = np.asarray(starts, dtype=np.int64)
        cls = tbl[class_col]
        # run starts of (token-group, class): a new group OR a class
        # change inside the group
        cls_change = np.zeros(n, dtype=bool)
        cls_change[0] = True
        eq = pc.equal(cls.slice(1), cls.slice(0, n - 1))
        cls_change[1:] = ~eq.to_numpy(zero_copy_only=False)
        cls_change[starts] = True
        runs = np.flatnonzero(cls_change)
        c = tbl["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.add.reduceat(c, runs)
        out = pa.table(
            {
                class_col: cls.take(pa.array(runs)),
                "token": tbl["token"].take(pa.array(runs)),
                "c": pa.array(sums),
                "kind": pa.array(np.zeros(len(runs), dtype=np.int8)),
            }
        )
        meta = pa.table(
            {
                class_col: pa.array([""], type=pa.string()),
                "token": pa.array([""], type=pa.string()),
                "c": pa.array([len(starts)], type=pa.int64()),
                "kind": pa.array([np.int8(1)]),
            }
        )
        return pa.concat_tables([out, meta.cast(out.schema)])

    mixed = hash_group_apply(
        partials, ["token"], part, sort_cols=[class_col]
    ).materialize()

    # V partials: one tiny row per partition, disjoint by construction
    V = 0
    for ref in mixed.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            k = t["kind"].to_numpy(zero_copy_only=False)
            V += int(t["c"].to_numpy(zero_copy_only=False)[k == 1].sum())

    qden = {
        cls: _qlog1(int(tot) + alpha * V) for cls, tot in n_class.items()
    }

    def stamp(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        b = b.filter(pc2.equal(b["kind"], 0))
        if b.num_rows == 0:
            return pa.table(
                {
                    class_col: pa.array([], type=pa.string()),
                    "token": pa.array([], type=pa.string()),
                    "c": pa.array([], type=pa.int64()),
                    "qlogp": pa.array([], type=pa.int64()),
                }
            )
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        qnum = qlog_floor(c + alpha)
        classes = list(qden)
        idx = pc2.index_in(
            b[class_col], value_set=pa.array(classes, type=pa.string())
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        dens = np.array([qden[k] for k in classes], dtype=np.int64)[idx]
        return pa.table(
            {
                class_col: b[class_col],
                "token": b["token"],
                "c": b["c"],
                "qlogp": pa.array(qnum - dens),
            }
        )

    model = mixed.map_batches(
        stamp, batch_format="pyarrow", zero_copy_batch=True
    )
    if with_meta:
        return model, {"V": V, "n_class": n_class, "qden": qden,
                       "alpha": alpha}
    return model


def naive_bayes_classify(ds, model, qden: dict, alpha: int = 1,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         class_col: str = "lang"):
    """Score every document against a trained NB model
    (``naive_bayes_train(..., with_meta=True)``) and emit the argmax
    class → (id_col, pred, score):

        score_c(d) = Σ_tok  qlog(c_tok,c + α) − qden_c
                     (absent tokens contribute qlog(α) − qden_c)

    — exact int64 sums of quantized logs; ties between classes break
    to the LEXICOGRAPHICALLY SMALLEST class (classes scanned in
    sorted order, argmax keeps the first max — mirrored by the SQL
    ``min(lang)``-over-max-score oracle). The prior is uniform (token
    likelihood only); fold a quantized prior into qden upstream if
    classes are imbalanced.

    Scale shape: the model is vocab-sized — it is ray.put ONCE and
    every task does per-class ``pc.index_in`` lookups (Arrow C++, no
    Python per token); past a broadcast-size comfort point the scale
    path is a token-keyed co-shuffle of (doc, token) against the
    model (the distributed-join plan), not implemented here."""
    import ray
    import pyarrow.compute as pc

    from ..ops.infotheory import _qlog1

    if isinstance(model, pa.Table):
        mt = model
    else:
        mt = pa.concat_tables(
            [t for t in ray.get(model.materialize().to_arrow_refs())
             if t.num_rows]
        )
    classes = sorted(qden)
    per_class = {}
    for cls in classes:
        sub = mt.filter(pc.equal(mt[class_col], cls))
        per_class[cls] = (
            sub["token"].combine_chunks(),
            sub["qlogp"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
    q_absent = {
        cls: (0 if alpha == 1 else _qlog1(alpha)) - int(qden[cls])
        for cls in classes
    }
    model_ref = ray.put((classes, per_class, q_absent))

    def score(b: pa.Table) -> pa.Table:
        cls_list, pcls, qabs = ray.get(model_ref)
        toks = pc.split_pattern(b[text_col], " ")
        lens = (
            pc.list_value_length(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = pc.list_flatten(toks).combine_chunks()
        nd = len(b)
        doc_starts = np.concatenate(
            ([0], np.cumsum(lens)[:-1])
        ).astype(np.int64)
        S = np.empty((nd, len(cls_list)), dtype=np.int64)
        for j, cls in enumerate(cls_list):
            vocab, ql = pcls[cls]
            idx = pc.index_in(flat, value_set=vocab)
            miss = pc.is_null(idx).to_numpy(zero_copy_only=False)
            safe = pc.fill_null(idx, 0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            if len(ql) == 0:
                contrib = np.full(len(flat), qabs[cls], dtype=np.int64)
            else:
                # present tokens: qlogp = qlog(c+α) − qden; absent:
                # qlog(α) − qden
                contrib = np.where(miss, np.int64(qabs[cls]), ql[safe])
            S[:, j] = (
                np.add.reduceat(contrib, doc_starts)
                if len(flat)
                else 0
            )
            S[lens == 0, j] = 0
        best = np.argmax(S, axis=1)
        return pa.table(
            {
                id_col: b[id_col],
                "pred": pa.array(
                    [cls_list[j] for j in best], type=pa.string()
                ),
                "score": pa.array(S[np.arange(nd), best]),
            }
        )

    return ds.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )
