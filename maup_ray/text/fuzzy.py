"""Edit-distance-1 fuzzy string self-join via deletion-variant
blocking (the SymSpell / FastSS family, public domain algorithm) —
the typo/variant-spelling near-dup primitive for short strings
(caption tokens, codes, entity names).

Why this is the scale-right shape: a naive fuzzy join is O(|vocab|²)
distance computations. Deletion blocking is exact for distance ≤ 1:
two distinct strings a, b satisfy lev(a,b) = 1  ⟺  they share a key
in {s} ∪ del1(s) (identity + every single-character deletion) —
deletion pairs share the shorter string itself, substitution pairs
share the deletion at the differing position. So the join becomes a
hash exchange of (variant, token) rows, |variant| ≈ (avg_len+1)·|vocab|
short strings — VOCABULARY-sized, never corpus-sized, and the corpus
itself never shuffles at all (tokens are per-batch-uniqued before the
variant flat-map; the variant exchange finishes the global dedup).

Candidate verification: a length-difference-1 candidate is ALWAYS a
true deletion pair (the shared key must be the shorter string — a
shared key that is a deletion of both would force equal lengths), so
only equal-length candidates need the check, and for them lev = 1 ⟺
exactly one mismatching codepoint — one vectorized fixed-width
compare per length class, no DP, no per-row Python.

Caveats (documented contract):
* distance threshold is exactly 1 (the SymSpell generalization to
  k > 1 generates O(len^k) variants; not wired).
* comparisons are per CODEPOINT (numpy U-dtype), matching DuckDB
  ``levenshtein`` and byte order for ASCII; pair canonicalization
  ``tok_a < tok_b`` is codepoint order = UTF-8 byte order for ASCII.
* skew: a variant shared by v tokens emits v(v−1)/2 candidates; in
  natural vocabularies v is bounded by alphabet·length, but a
  degenerate vocabulary (all strings one deletion from a hub) can
  concentrate a bucket — the minhash ``max_bucket`` discipline
  applies if that ever bites.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _hash64_strings

__all__ = ["edit1_pairs"]

_BIG = 1 << 30  # "to end of string" slice stop


def _variant_batch(b: pa.Table, str_col: str) -> pa.Table:
    """Per-batch: unique tokens → (key, variant, tok) rows for the
    identity variant and every single-codepoint deletion. The deletion
    loop is over POSITIONS (≤ max token length), each pass fully
    vectorized Arrow slicing over the whole unique-token column."""
    toks = pc.unique(b[str_col].combine_chunks())
    toks = toks.filter(pc.is_valid(toks))
    lens = pc.utf8_length(toks).to_numpy(zero_copy_only=False)
    max_len = int(lens.max()) if len(lens) else 0
    var_parts = [toks]  # identity
    tok_parts = [toks]
    for p in range(max_len):
        sel = np.flatnonzero(lens > p)
        if not len(sel):
            break
        sub = toks.take(pa.array(sel))
        head = pc.utf8_slice_codeunits(sub, 0, p)
        tail = pc.utf8_slice_codeunits(sub, p + 1, _BIG)
        var_parts.append(pc.binary_join_element_wise(head, tail, ""))
        tok_parts.append(sub)
    var = pa.concat_arrays(
        [v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
         for v in var_parts]
    )
    tok = pa.concat_arrays(
        [t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t
         for t in tok_parts]
    )
    key = _hash64_strings(var).view(np.int64)
    return pa.table({"_k": pa.array(key), "_v": var, "_t": tok})


def _verify_equal_len(a: pa.Array, b: pa.Array) -> np.ndarray:
    """lev == 1 mask for same-length candidate pairs: exactly one
    mismatching codepoint. One fixed-width vectorized compare per
    distinct length class (lengths are token-sized, the loop is
    short)."""
    la = pc.utf8_length(a).to_numpy(zero_copy_only=False)
    out = np.zeros(len(la), dtype=bool)
    av = a.to_numpy(zero_copy_only=False)
    bv = b.to_numpy(zero_copy_only=False)
    for L in np.unique(la):
        if L == 0:
            continue
        sel = np.flatnonzero(la == L)
        A = np.asarray(av[sel], dtype=f"U{L}").view(np.uint32)
        B = np.asarray(bv[sel], dtype=f"U{L}").view(np.uint32)
        mism = (
            (A.reshape(len(sel), L) != B.reshape(len(sel), L))
            .sum(axis=1)
        )
        out[sel[mism == 1]] = True
    return out


def edit1_pairs(ds, str_col: str, out_a: str = "tok_a", out_b: str = "tok_b"):
    """All unordered pairs of DISTINCT values of ``str_col`` at
    Levenshtein distance exactly 1, as a Dataset
    ``(out_a, out_b)`` with ``out_a < out_b``.

    Two vocabulary-sized hash exchanges: (1) variant-keyed — dedup
    (variant, token) globally, expand per-variant candidate pairs
    (the cooccurrence segment-arange kernel), verify equal-length
    candidates vectorized; (2) pair-keyed — a true pair can surface
    under several shared variants, one exchange routed by the pair
    hash dedups on the actual values (the hash only routes — no
    correctness exposure to collisions).
    """
    from ..ops.shuffle import hash_group_apply

    variants = (
        _variant_batch(ds, str_col)
        if isinstance(ds, pa.Table)
        else ds.map_batches(
            lambda b: _variant_batch(b, str_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    pair_schema = pa.schema(
        [
            pa.field("_pk", pa.int64()),
            pa.field(out_a, pa.string()),
            pa.field(out_b, pa.string()),
        ]
    )

    def candidates(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        if tbl is None or not len(tbl):
            return pair_schema.empty_table()
        v = np.asarray(tbl["_v"].to_numpy(zero_copy_only=False))
        t = tbl["_t"].combine_chunks()
        tv = np.asarray(t.to_numpy(zero_copy_only=False))
        n = len(v)
        # global (variant, token) dedup — rows arrive sorted
        keep = np.empty(n, dtype=bool)
        keep[0] = True
        keep[1:] = (v[1:] != v[:-1]) | (tv[1:] != tv[:-1])
        sel = np.flatnonzero(keep)
        v, tv, t = v[sel], tv[sel], t.take(pa.array(sel))
        n = len(v)
        # segment-arange pair expansion per variant group; tokens are
        # sorted within each group so left index < right index gives
        # tok_a < tok_b canonically
        gs = np.flatnonzero(np.concatenate(([True], v[1:] != v[:-1])))
        ends = np.append(gs[1:], n)
        rights = np.repeat(ends, ends - gs) - np.arange(n) - 1
        total = int(rights.sum())
        if not total:
            return pair_schema.empty_table()
        left = np.repeat(np.arange(n), rights)
        offs = np.cumsum(rights) - rights
        right = (
            np.arange(total)
            - np.repeat(offs, rights)
            + np.repeat(np.arange(n) + 1, rights)
        )
        a = t.take(pa.array(left))
        b = t.take(pa.array(right))
        la = pc.utf8_length(a).to_numpy(zero_copy_only=False)
        lb = pc.utf8_length(b).to_numpy(zero_copy_only=False)
        ok = la != lb  # length-diff candidates are always true pairs
        eq = np.flatnonzero(~ok)
        if len(eq):
            sub = _verify_equal_len(
                a.take(pa.array(eq)), b.take(pa.array(eq))
            )
            ok[eq[sub]] = True
        hit = pa.array(np.flatnonzero(ok))
        a, b = a.take(hit), b.take(hit)
        joined = pc.binary_join_element_wise(a, b, "\x00")
        pk = _hash64_strings(joined).view(np.int64)
        return pa.table({"_pk": pa.array(pk), out_a: a, out_b: b})

    cand = hash_group_apply(
        variants, ["_k"], candidates, sort_cols=("_v", "_t")
    )

    def dedup_pairs(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        if tbl is None or not len(tbl):
            return pair_schema.empty_table().drop_columns(["_pk"])
        a = np.asarray(tbl[out_a].to_numpy(zero_copy_only=False))
        b = np.asarray(tbl[out_b].to_numpy(zero_copy_only=False))
        keep = np.empty(len(a), dtype=bool)
        keep[0] = True
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return tbl.select([out_a, out_b]).take(
            pa.array(np.flatnonzero(keep))
        )

    return hash_group_apply(
        cand, ["_pk"], dedup_pairs, sort_cols=(out_a, out_b)
    )
