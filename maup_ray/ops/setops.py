"""Distributed SQL set operations — EXCEPT / INTERSECT in both
DISTINCT and ALL (bag/multiset) semantics over projected key columns.

Reference surface: ANSI SQL set operators (Spark's
``exceptAll``/``intersectAll``, DuckDB ``EXCEPT ALL``). Semantics per
key row k with multiplicity cl in the left input and cr in the right:

* ``except_all``     → max(0, cl − cr) output copies
* ``intersect_all``  → min(cl, cr) output copies
* ``except``         → 1 copy iff cl > 0 and cr == 0
* ``intersect``      → 1 copy iff cl > 0 and cr > 0

Scale shape: each side PRE-COMBINES per batch to (keys, cnt) partials
(one Arrow group_by per block — a block contributes each key once per
side), the two partial streams union and make ONE key-hash exchange
(ops/shuffle.hash_group_apply), and each partition reduces its keys
with two reduceat sums + one np.repeat — the inputs' full rows never
move, only the deduped key projection + an 8 B count. Output
multiplicities are emitted by repeating the partition's distinct key
rows, so result bytes are bounded by the answer, not the inputs.

Key columns must be integer-valued (the hash-shuffle module contract;
hash non-integer projections to i64 upstream).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MODES = ("except_all", "intersect_all", "except", "intersect")


def bag_setop(left, right, keys, mode: str = "except_all"):
    """left ⟨mode⟩ right over the projected ``keys`` columns.

    ``left``/``right`` are Datasets or driver Tables; returns a
    Dataset whose rows are the key projection with the set-operation
    multiplicities (see module docstring)."""
    import ray.data

    from .shuffle import hash_group_apply

    if mode not in _MODES:
        raise ValueError(f"bag_setop: unknown mode {mode!r}")
    keys = list(keys)

    def combine(side: int):
        def f(batch: pa.Table) -> pa.Table:
            g = batch.select(keys).group_by(
                keys, use_threads=False
            ).aggregate([([], "count_all")])
            g = g.rename_columns(
                ["cnt" if c == "count_all" else c for c in g.column_names]
            )
            return g.append_column(
                "side", pa.array(np.full(g.num_rows, side, np.int64))
            )

        return f

    def tagged(ds, side: int):
        if isinstance(ds, pa.Table):
            return ray.data.from_arrow(combine(side)(ds))
        return ds.map_batches(combine(side), batch_format="pyarrow",
                              zero_copy_batch=True)

    both = tagged(left, 0).union(tagged(right, 1))

    def reduce_part(tbl: pa.Table | None, starts) -> pa.Table:
        if tbl is None or tbl.num_rows == 0:
            # preserve the real key types when an (empty) input table
            # is available so partition block schemas stay homogeneous
            schema = pa.schema(
                [pa.field(k, pa.int64() if tbl is None
                          else tbl.schema.field(k).type)
                 for k in keys]
            )
            return schema.empty_table()
        starts = np.asarray(starts)
        cnt = tbl["cnt"].to_numpy(zero_copy_only=False)
        side = tbl["side"].to_numpy(zero_copy_only=False)
        cl = np.add.reduceat(cnt * (1 - side), starts)
        cr = np.add.reduceat(cnt * side, starts)
        if mode == "except_all":
            mult = np.maximum(cl - cr, 0)
        elif mode == "intersect_all":
            mult = np.minimum(cl, cr)
        elif mode == "except":
            mult = ((cl > 0) & (cr == 0)).astype(np.int64)
        else:  # intersect
            mult = ((cl > 0) & (cr > 0)).astype(np.int64)
        idx = np.repeat(starts, mult)
        return tbl.select(keys).take(pa.array(idx))

    return hash_group_apply(both, keys, reduce_part)
