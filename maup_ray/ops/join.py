"""Generic equi-join with the measured-size plan choice.

The same discipline as ``prorate`` (ops/prorate.py:90-110): a side
that provably fits a worker heap is broadcast ONCE via ``ray.put``
and every batch joins against it with vectorized ``pc.index_in`` —
no shuffle, no join-operator fixed cost (Ray Data's hash join spins
up aggregator actors worth several seconds per job at bench scale).
Anything bigger falls through to Ray Data's hash-partitioned
``Dataset.join`` — the true 100-TB path when BOTH sides are large.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "broadcast_hash_join",
    "equi_join",
    "left_broadcast_join",
    "semi_join",
    "anti_join",
    "outer_join",
]


def broadcast_hash_join(ds, right: pa.Table, left_on: str, right_on: str,
                        take_cols):
    """Inner equi-join of a Dataset against a SMALL right table.

    ``right`` is broadcast once (object store); each batch computes
    ``index_in`` against the key column and appends ``take_cols`` by
    ``take`` — one vectorized pass, zero-copy reads on every worker.
    Right keys must be unique (dimension-table shape): ``index_in``
    keeps only the FIRST match per key, so a duplicate-key right side
    would silently drop join rows — checked here while the table is
    still driver-local (ADVICE r3)."""
    import ray

    right = right.combine_chunks()
    n_distinct = pc.count_distinct(right[right_on], mode="all").as_py()
    if n_distinct != len(right):
        raise ValueError(
            f"broadcast_hash_join: right side has duplicate "
            f"'{right_on}' keys ({len(right)} rows, {n_distinct} "
            "distinct) — inner-join row duplication is not supported "
            "on the broadcast plan; dedup the dimension table or use "
            "a co-shuffle join"
        )
    ref = ray.put(right)

    def f(batch: pa.Table) -> pa.Table:
        r = ray.get(ref)
        vs = r[right_on]
        vs = (
            vs.chunk(0)
            if vs.num_chunks
            else pa.array([], type=vs.type)  # empty dimension table
        )
        idx = pc.index_in(batch[left_on], vs)
        mask = pc.is_valid(idx)
        out = batch.filter(mask)
        idx = pc.filter(idx, mask)
        for c in take_cols:
            out = out.append_column(c, pc.take(r[c], idx))
        return out

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def equi_join(
    ds,
    right,
    left_on: str,
    right_on: str,
    take_cols,
    broadcast_limit: int = 2_000_000,
):
    """Inner equi-join picking broadcast vs hash-shuffle by measured
    size: a ``pa.Table`` right side under ``broadcast_limit`` rows
    broadcasts; otherwise both sides co-shuffle through Ray Data's
    join operator."""
    import ray

    if isinstance(right, pa.Table) and len(right) <= broadcast_limit:
        return broadcast_hash_join(ds, right, left_on, right_on, take_cols)
    if isinstance(right, pa.Table):
        import ray.data

        right = ray.data.from_arrow(right)
    return ds.join(
        right.select_columns([right_on, *take_cols]),
        join_type="inner",
        num_partitions=max(8, int(ray.cluster_resources().get("CPU", 8))),
        on=(left_on,),
        right_on=(right_on,),
    )


def left_broadcast_join(
    ds, right: pa.Table, left_on: str, right_on: str, take_cols,
    fill: dict | None = None,
):
    """LEFT OUTER equi-join against a SMALL right table: every left
    row survives; unmatched rows carry typed nulls — or ``fill[col]``
    where given — in the taken columns.

    Same broadcast shape as ``broadcast_hash_join`` (right side ships
    once via ``ray.put``, one vectorized ``index_in`` + ``take`` per
    batch, the left stream never shuffles) with an ``if_else`` null
    mask instead of the inner-join filter. Right keys must be unique
    (checked driver-local) — outer row duplication is not a broadcast
    shape."""
    import ray

    right = right.combine_chunks()
    n_distinct = pc.count_distinct(right[right_on], mode="all").as_py()
    if n_distinct != len(right):
        raise ValueError(
            f"left_broadcast_join: right side has duplicate "
            f"'{right_on}' keys ({len(right)} rows, {n_distinct} "
            "distinct); dedup the dimension table first"
        )
    fill = dict(fill or {})
    ref = ray.put(right)

    def f(batch: pa.Table) -> pa.Table:
        r = ray.get(ref)
        out = batch
        if len(r) == 0:
            # empty dimension: every left row is unmatched
            for c in take_cols:
                t = r.schema.field(c).type
                col = (
                    pa.array([fill[c]] * len(batch), type=t)
                    if c in fill
                    else pa.nulls(len(batch), type=t)
                )
                out = out.append_column(c, col)
            return out
        vs = r[right_on].chunk(0)
        idx = pc.index_in(batch[left_on], vs)
        mask = pc.is_valid(idx)
        safe = pc.if_else(mask, idx, pa.scalar(0, idx.type))
        for c in take_cols:
            col = pc.take(r[c], safe)
            col = pc.if_else(mask, col, pa.scalar(None, col.type))
            if c in fill:
                col = pc.fill_null(col, fill[c])
            out = out.append_column(c, col)
        return out

    if isinstance(ds, pa.Table):
        return f(ds)
    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _distinct_keys(right, on: str, broadcast_limit: int) -> pa.Array:
    """right (Table/Dataset) → driver-local DISTINCT key array.

    A Dataset right side pre-distincts per batch so only unique keys
    per block reach the driver (key columns, never payloads), then
    guards the merged size — semi/anti joins only ever need the key
    SET, so the broadcast bound is on distinct keys, not rows."""
    if isinstance(right, pa.Table):
        keys = pc.unique(right[on].combine_chunks())
    else:
        import ray

        parts = right.select_columns([on]).map_batches(
            lambda b: pa.table({on: pc.unique(b[on].combine_chunks())}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        tabs = [
            t for t in (ray.get(r) for r in
                        parts.materialize().to_arrow_refs())
            if t.num_rows
        ]
        if not tabs:
            return pa.array([], type=pa.string())
        merged = pa.concat_tables(tabs)
        keys = pc.unique(merged[on].combine_chunks())
    if len(keys) > broadcast_limit:
        raise ValueError(
            f"semi/anti join: {len(keys)} distinct '{on}' keys exceed "
            f"broadcast_limit={broadcast_limit}; pass plan=\'shuffle\' "
            "(or plan=\'auto\' with a Dataset right side) to run the "
            "key-hash co-shuffle instead of a broadcast"
        )
    return keys


def _block_distinct(right, ron):
    """Per-block distinct-key projection of the right side — the
    shared first stage of BOTH plans (broadcast collects it, shuffle
    joins against it)."""
    import ray.data

    if isinstance(right, pa.Table):
        right = ray.data.from_arrow(right)
    return right.select_columns([ron]).map_batches(
        lambda b: pa.table({ron: pc.unique(b[ron].combine_chunks())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


_BLOOM_SEED1 = 0xA076_1D64_78BD_642F
_BLOOM_SEED2 = 0xE703_7ED1_A0B4_28DB
_BLOOM_K = 4
_BLOOM_BITS_PER_KEY = 16  # k=4 @ 16 b/key → ~0.24% false positives
_BLOOM_MAX_BITS = 1 << 31  # 256 MiB word array — must fit every worker


def _mix64(x: "np.ndarray", seed: int) -> "np.ndarray":
    """splitmix64 finalizer over a uint64 array (wrapping arithmetic
    is the point) — the shared build/probe hash, so false negatives
    are structurally impossible."""
    import numpy as np

    z = (x ^ np.uint64(seed)) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bloom_positions(keys_u64, nbits: int):
    """k double-hashed bit positions per key, shape (k, n)."""
    import numpy as np

    h1 = _mix64(keys_u64, _BLOOM_SEED1)
    h2 = _mix64(keys_u64, _BLOOM_SEED2) | np.uint64(1)
    mask = np.uint64(nbits - 1)
    return [
        (h1 + np.uint64(i) * h2) & mask for i in range(_BLOOM_K)
    ]


def _bloom_keys_u64(col) -> "np.ndarray":
    """Integer key column → uint64 hash input (nulls pre-filtered by
    the caller; negative ints wrap deterministically — identical in
    build and probe, which is all a Bloom filter needs)."""
    import numpy as np

    v = col.to_numpy(zero_copy_only=False)
    if not np.issubdtype(v.dtype, np.integer):
        raise TypeError(
            "semi/anti join plan='bloom' needs an integer key column "
            f"(got {v.dtype}); hash the key to int64 upstream"
        )
    return v.astype(np.int64, copy=False).astype(np.uint64)


def _bloom_semi(ds, right, on, right_on, anti):
    """Bloom-prefiltered shuffle semi/anti join — the corpus×corpus
    plan that avoids shuffling MOST of the left side.

    The broadcast/shuffle dichotomy leaves a gap at 100 TB: past
    ``broadcast_limit`` distinct keys the shuffle plan moves EVERY
    left row through the exchange even when almost none match (semi)
    or almost all are kept (anti). Here the right key set is
    summarized as an m-bit Bloom filter (16 bits/key, k=4 → ~0.24%
    false positives), built from per-block bitmap partials OR-merged
    by a binary task tree and broadcast ONCE via ``ray.put``; the left
    side probes it per batch with two splitmix64 mixes. Bloom filters
    have NO false negatives, so bloom-negative rows are exactly
    droppable (semi) or exactly keepable with zero shuffle (anti);
    only the bloom-POSITIVE slice — true matches + the ~0.24% false
    positives — enters the exact hash co-shuffle against the
    pre-distincted right key projection. Null keys match nothing,
    mirroring the other plans.

    Falls back to the plain shuffle plan when the filter would exceed
    ``_BLOOM_MAX_BITS`` (the per-worker broadcast budget)."""
    import numpy as np
    import ray
    import ray.data

    ron = right_on or on
    rkeys = _block_distinct(right, ron).materialize()
    n_rkeys = rkeys.count()
    if n_rkeys == 0:
        # degenerate right side: semi → nothing, anti → left unchanged
        if anti:
            return ds
        if isinstance(ds, pa.Table):
            return ds.slice(0, 0)
        return ds.limit(0)
    # upper bound on distinct keys: per-block-deduped row count
    n_keys = n_rkeys
    nbits = 1 << int(n_keys * _BLOOM_BITS_PER_KEY - 1).bit_length()
    nbits = max(nbits, 1 << 13)
    if nbits > _BLOOM_MAX_BITS:
        return _shuffle_semi(ds, right, on, right_on, anti, rkeys=rkeys)

    @ray.remote
    def block_bitmap(tbl: pa.Table) -> np.ndarray:
        words = np.zeros(nbits // 64, dtype=np.uint64)
        # an empty right side can surface as a schema-less empty block
        if tbl.num_rows == 0 or ron not in tbl.column_names:
            return words
        col = tbl[ron]
        valid = pc.is_valid(col)
        if not pc.all(valid).as_py():
            col = col.filter(valid)
        if len(col) == 0:
            return words
        u = _bloom_keys_u64(col.combine_chunks())
        for idx in _bloom_positions(u, nbits):
            np.bitwise_or.at(
                words, (idx >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (idx & np.uint64(63)),
            )
        return words

    @ray.remote
    def or_merge(*parts):
        out = parts[0].copy()
        for p in parts[1:]:
            np.bitwise_or(out, p, out=out)
        return out

    refs = [block_bitmap.remote(r) for r in rkeys.to_arrow_refs()]
    FAN = 8
    while len(refs) > 1:
        refs = [
            or_merge.remote(*refs[i:i + FAN])
            for i in range(0, len(refs), FAN)
        ]
    words_ref = refs[0]

    left_was_table = isinstance(ds, pa.Table)
    if left_was_table:
        ds = ray.data.from_arrow(ds)

    def probe(batch: pa.Table, want_positive: bool):
        words = ray.get(words_ref)
        col = batch[on]
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        filled = pc.fill_null(col, 0).combine_chunks()
        u = _bloom_keys_u64(filled)
        pos = np.ones(len(batch), dtype=bool)
        for idx in _bloom_positions(u, nbits):
            w = words[(idx >> np.uint64(6)).astype(np.int64)]
            pos &= ((w >> (idx & np.uint64(63)))
                    & np.uint64(1)).astype(bool)
        pos &= np.asarray(valid, dtype=bool)
        return batch.filter(pa.array(pos if want_positive else ~pos))

    candidates = ds.map_batches(
        lambda b: probe(b, True), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    confirmed = _shuffle_semi(candidates, right, on, right_on, anti,
                              rkeys=rkeys)
    if anti:
        definite = ds.map_batches(
            lambda b: probe(b, False), batch_format="pyarrow",
            zero_copy_batch=True,
        )
        out = definite.union(confirmed)
    else:
        out = confirmed
    if left_was_table:
        tabs = [
            t for t in (ray.get(r) for r in
                        out.materialize().to_arrow_refs())
            if t.num_rows
        ]
        if not tabs:
            sch = ds.schema()
            return pa.table(
                {n: pa.array([], type=t)
                 for n, t in zip(sch.names, sch.types)}
            )
        return pa.concat_tables(tabs).combine_chunks()
    return out


def _shuffle_semi(ds, right, on, right_on, anti, rkeys=None):
    """Corpus-sized-key-set path: Ray Data's native hash co-shuffle
    semi/anti join against the PRE-DISTINCTED-per-block right key
    projection (semi/anti semantics are set membership, so per-block
    dedup only shrinks the exchange — global dedup is unnecessary).
    Left payloads move once through the shuffle (inherent); right
    contributes keys only."""
    import ray
    import ray.data

    ron = right_on or on
    if rkeys is None:
        rkeys = _block_distinct(right, ron)
    left_was_table = isinstance(ds, pa.Table)
    if left_was_table:
        ds = ray.data.from_arrow(ds)
    out = ds.join(
        rkeys,
        join_type="left_anti" if anti else "left_semi",
        num_partitions=max(8, int(ray.cluster_resources().get("CPU", 8))),
        on=(on,),
        right_on=(ron,),
    )
    if left_was_table:  # driver-local in → driver-local out (row
        # order is NOT preserved through the shuffle, unlike the
        # broadcast plan — semi/anti results are sets)
        tabs = [
            t for t in (ray.get(r) for r in
                        out.materialize().to_arrow_refs())
            if t.num_rows
        ]
        if not tabs:
            sch = ds.schema()
            return pa.table(
                {n: pa.array([], type=t)
                 for n, t in zip(sch.names, sch.types)}
            )
        return pa.concat_tables(tabs).combine_chunks()
    return out


def semi_join(
    ds,
    right,
    on: str,
    right_on: str | None = None,
    anti: bool = False,
    broadcast_limit: int = 2_000_000,
    plan: str = "auto",
):
    """Streaming semi-join (``anti=True`` → anti-join): keep the left
    rows whose ``on`` key is (not) present in ``right``'s key set.

    Scale shape: the distinct key set broadcasts ONCE via ``ray.put``
    and the left side streams through one vectorized ``is_in`` filter
    per batch — no shuffle, left payloads never move. The right side
    only ever contributes its distinct keys (pre-distincted per block
    before they reach the driver).

    Plans: ``"broadcast"`` (raise past ``broadcast_limit`` distinct
    keys), ``"shuffle"`` (Ray Data's native left_semi/left_anti hash
    co-shuffle — the corpus-sized-key-set path; left payloads move
    once), ``"bloom"`` (corpus×corpus: broadcast an m-bit Bloom
    filter of the right key set and shuffle ONLY the bloom-positive
    left slice — see ``_bloom_semi``; integer keys required), or
    ``"auto"``: broadcast when the right side is provably small (a
    Table under the limit, or a Dataset whose METADATA row count — an
    upper bound on distinct keys — is under it), else shuffle without
    ever dragging the key set to the driver."""
    import ray

    if plan not in ("auto", "broadcast", "shuffle", "bloom"):
        raise ValueError(f"semi_join: unknown plan {plan!r}")
    if plan == "shuffle":
        return _shuffle_semi(ds, right, on, right_on, anti)
    if plan == "bloom":
        return _bloom_semi(ds, right, on, right_on, anti)
    ron = right_on or on
    if plan == "auto" and isinstance(right, pa.Table):
        if len(right) > broadcast_limit:
            return _shuffle_semi(ds, right, on, right_on, anti)
        keys = _distinct_keys(right, ron, broadcast_limit)
    elif plan == "auto":
        # ONE pass computes the per-block distinct projection; merge
        # it incrementally on the driver and bail to the shuffle plan
        # (reusing the same materialized projection — no re-read of
        # the right side) the moment the running distinct count
        # crosses the limit. Driver memory is bounded by
        # limit + one block either way.
        rkeys_ds = _block_distinct(right, ron).materialize()
        keys = None
        acc = None
        for r in rkeys_ds.to_arrow_refs():
            t = ray.get(r)
            if not t.num_rows:
                continue
            col = t[ron].combine_chunks()
            acc = col if acc is None else pc.unique(
                pa.concat_arrays(
                    [acc.combine_chunks() if isinstance(
                        acc, pa.ChunkedArray) else acc, col]
                )
            )
            if len(acc) > broadcast_limit:
                return _shuffle_semi(ds, right, on, right_on, anti,
                                     rkeys=rkeys_ds)
        keys = acc if acc is not None else pa.array([], type=pa.string())
    else:
        keys = _distinct_keys(right, ron, broadcast_limit)
    ref = ray.put(keys)

    def f(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        m = pc.is_in(batch[on], value_set=ks)
        # is_in returns null for null inputs under some value-set
        # types; a null key matches nothing either way
        m = pc.fill_null(m, False)
        if anti:
            m = pc.invert(m)
        return batch.filter(m)

    if isinstance(ds, pa.Table):
        return f(ds)
    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def anti_join(ds, right, on, right_on=None, broadcast_limit=2_000_000,
              plan: str = "auto"):
    return semi_join(
        ds, right, on, right_on=right_on, anti=True,
        broadcast_limit=broadcast_limit, plan=plan,
    )


_OUTER_HOWS = ("inner", "left_outer", "right_outer", "full_outer")


def outer_join(left, right, on, *, how: str = "full_outer",
               num_partitions: int | None = None):
    """Corpus×corpus equi-join with outer semantics — the shuffle
    join surface ``equi_join``'s broadcast plan cannot provide.

    SQL ``LEFT/RIGHT/FULL OUTER JOIN`` (and ``INNER``) on the ``on``
    key columns, duplicate keys on BOTH sides allowed (per-key cross
    product, exactly SQL's bag semantics). Non-key column names must
    be disjoint between the sides (alias upstream, as SQL would).

    Scale shape: each side is tagged with typed nulls for the other
    side's payload columns and a ``_side`` bit, then ONE key-hash
    exchange (``ops/shuffle.hash_group_apply`` sorted by
    ``keys + _side``) co-locates every key's rows with left rows
    contiguous before right rows; the per-partition reduce emits the
    matched cross product with two ``np.repeat``/arange index vectors
    plus the unmatched rows verbatim (their other-side columns are
    already typed nulls) — one vectorized pass, no per-group dispatch.
    Null keys never match (SQL semantics): they survive only as
    unmatched rows on the preserved side(s). Keys must be
    integer-valued (the hash-shuffle module contract).

    ``left``/``right`` are Datasets or driver Tables; returns a
    Dataset (key columns first, then left payload, then right
    payload)."""
    import numpy as np
    import ray.data

    from .shuffle import hash_group_apply

    if how not in _OUTER_HOWS:
        raise ValueError(f"outer_join: unknown how {how!r}")
    on = list(on) if not isinstance(on, str) else [on]

    def side_schema(x) -> pa.Schema:
        return x.schema if isinstance(x, pa.Table) else x.schema(
            fetch_if_missing=True
        ).base_schema

    lsch, rsch = side_schema(left), side_schema(right)
    for k in on:
        if lsch.field(k).type != rsch.field(k).type:
            raise TypeError(
                f"outer_join: key {k!r} differs in type between sides "
                f"({lsch.field(k).type} vs {rsch.field(k).type})"
            )
    lpay = [f for f in lsch if f.name not in on]
    rpay = [f for f in rsch if f.name not in on]
    clash = {f.name for f in lpay} & {f.name for f in rpay}
    if clash:
        raise ValueError(
            f"outer_join: non-key columns {sorted(clash)} appear on "
            "both sides — rename upstream (SQL alias discipline)"
        )
    out_schema = pa.schema(
        [lsch.field(k) for k in on] + lpay + rpay
    )

    def tag(is_left: bool):
        other = rpay if is_left else lpay

        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {k: batch[k] for k in on}
            for fld in (lpay if is_left else rpay):
                cols[fld.name] = batch[fld.name]
            for fld in other:
                cols[fld.name] = pa.nulls(n, fld.type)
            cols["_side"] = pa.array(
                np.full(n, 0 if is_left else 1, np.int64))
            return pa.table(
                {name: cols[name]
                 for name in out_schema.names + ["_side"]}
            )

        return f

    def tagged(x, is_left: bool):
        if isinstance(x, pa.Table):
            return ray.data.from_arrow(tag(is_left)(x))
        return x.map_batches(tag(is_left), batch_format="pyarrow",
                             zero_copy_batch=True)

    both = tagged(left, True).union(tagged(right, False))
    keep_l = how in ("left_outer", "full_outer")
    keep_r = how in ("right_outer", "full_outer")
    payload_names = [f.name for f in lpay] + [f.name for f in rpay]

    def reduce_part(tbl: pa.Table | None, starts) -> pa.Table:
        if tbl is None or tbl.num_rows == 0:
            return out_schema.empty_table()
        starts = np.asarray(starts, dtype=np.int64)
        n = tbl.num_rows
        s = tbl["_side"].to_numpy(zero_copy_only=False)
        sizes = np.diff(np.append(starts, n))
        g = np.repeat(np.arange(len(starts)), sizes)
        nl = np.add.reduceat(1 - s, starts)
        nr = np.add.reduceat(s, starts)
        # sorted by keys then _side → per group: left block, right block
        rstart = starts + nl
        L = np.flatnonzero(s == 0)
        gl = g[L]
        cnt = nr[gl]
        left_out = np.repeat(L, cnt)
        tot = int(cnt.sum())
        base = np.cumsum(cnt) - cnt
        offs = np.arange(tot, dtype=np.int64) - np.repeat(base, cnt)
        right_out = np.repeat(rstart[gl], cnt) + offs
        body = tbl.select(out_schema.names)
        lrows = body.take(pa.array(left_out))
        rrows = body.take(pa.array(right_out))
        matched = pa.table(
            {name: (rrows[name] if any(f.name == name for f in rpay)
                    else lrows[name])
             for name in out_schema.names}
        )
        pieces = [matched]
        if keep_l:
            L0 = L[cnt == 0]
            if len(L0):
                pieces.append(body.take(pa.array(L0)))
        if keep_r:
            R = np.flatnonzero(s == 1)
            R0 = R[nl[g[R]] == 0]
            if len(R0):
                pieces.append(body.take(pa.array(R0)))
        out = pa.concat_tables(pieces) if len(pieces) > 1 else pieces[0]
        return out.combine_chunks()

    return hash_group_apply(
        both, on, reduce_part, sort_cols=["_side"],
        num_partitions=num_partitions,
    )
