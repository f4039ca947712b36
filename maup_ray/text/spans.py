"""Frequent-span removal — the exact-substring dedup of training-data
curation (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better") at word-n-gram granularity: every token
covered by a word n-gram that occurs more than ``max_occ`` times
corpus-wide is removed from every document, killing boilerplate and
cross-document repeated spans that document-level dedup can't see.

Scale shape: pass A is the existing ``frequent_ngrams`` reduction —
per-block (gram, count) partials, one gram-hash exchange, only the
ABOVE-THRESHOLD grams reach the driver (bounded by
total_gram_instances / max_occ, the counting argument; a curation run
uses a high threshold precisely so this set is small). The banned set
broadcasts ONCE via ``ray.put`` and pass B re-derives each block's
per-position grams (the corpus token stream never shuffles), marks
covered token positions with one difference-array cumsum, and
rebuilds each document with a vectorized list join. ``broadcast_limit``
guards the driver/worker footprint — past it, raise and point the
caller at a gram-keyed semi-join composition instead of silently
collecting a corpus-sized set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["remove_frequent_spans"]


def remove_frequent_spans(
    ds,
    n: int = 5,
    max_occ: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_limit: int = 5_000_000,
):
    """Remove every token covered by a word ``n``-gram occurring more
    than ``max_occ`` times corpus-wide. Returns a Dataset of
    (id_col, text_clean, n_removed) — documents whose every token is
    covered come back with an empty string, never dropped."""
    import ray

    from .analysis import frequent_ngrams

    banned_tbl = frequent_ngrams(ds, n=n, min_count=max_occ + 1)
    if banned_tbl.num_rows > broadcast_limit:
        raise ValueError(
            f"remove_frequent_spans: {banned_tbl.num_rows} banned "
            f"grams exceeds broadcast_limit={broadcast_limit}; raise "
            "max_occ (a curation threshold this low bans most of the "
            "corpus) or replace the broadcast with a gram-keyed "
            "semi-join composition"
        )
    banned_ref = ray.put(banned_tbl["gram"].combine_chunks())

    def scrub(batch: pa.Table) -> pa.Table:
        banned = ray.get(banned_ref)
        toks = pc.split_pattern(batch[text_col], " ")
        flat = pc.list_flatten(toks).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        offs = np.r_[0, np.cumsum(lens)]
        total = int(offs[-1])
        valid = np.maximum(lens - (n - 1), 0)
        cum = np.r_[0, np.cumsum(valid)]
        pos = (
            np.arange(cum[-1], dtype=np.int64)
            - np.repeat(cum[:-1], valid)
        )
        j = np.repeat(offs[:-1], valid) + pos
        keep = np.ones(total, dtype=bool)
        if len(j) and len(banned):
            parts = [pc.take(flat, pa.array(j + k)) for k in range(n)]
            grams = pc.binary_join_element_wise(*parts, " ")
            hit = pc.is_in(grams, value_set=banned).to_numpy(
                zero_copy_only=False
            )
            starts_flat = j[np.asarray(hit, dtype=bool)]
            if len(starts_flat):
                # difference-array coverage: +1 at gram start, −1 one
                # past its end; windows never cross doc boundaries by
                # construction of the valid starts
                delta = np.zeros(total + 1, dtype=np.int64)
                np.add.at(delta, starts_flat, 1)
                np.add.at(delta, starts_flat + n, -1)
                keep = np.cumsum(delta[:-1]) == 0
        kept_flat = flat.filter(pa.array(keep))
        new_lens = (
            np.add.reduceat(keep.astype(np.int64), offs[:-1])
            if total
            else np.zeros(len(lens), dtype=np.int64)
        )
        new_lens = np.where(lens == 0, 0, new_lens)
        new_offs = np.r_[0, np.cumsum(new_lens)]
        la = pa.ListArray.from_arrays(
            pa.array(new_offs, type=pa.int32()), kept_flat
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "text_clean": pc.binary_join(la, " "),
                "n_removed": pa.array(lens - new_lens),
            }
        )

    return ds.map_batches(
        scrub, batch_format="pyarrow", zero_copy_batch=True
    )
