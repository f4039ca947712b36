"""Distributed 2-D Pareto frontier (skyline) — maximize both
dimensions.

Dominance is an ALGEBRAIC partial reduction: a point dominated inside
one block is dominated by a survivor of that block (dominance is
transitive), so ``front(A ∪ B) = front(front(A) ∪ front(B))``. Each
block emits only its local frontier — O(log n) expected rows for
independent dimensions — and the driver finishes on the concatenated
partials with the same vectorized routine. The corpus never shuffles.

Dominance rule (strict): q dominates p iff q.d1 ≥ p.d1, q.d2 ≥ p.d2
and at least one is strict. Exact-duplicate points do NOT dominate
each other, so every copy of a frontier point is kept — output rows
are fully determined (no tie arbitration), which is what lets the SQL
window oracle match exactly.

Vectorized pass (no per-row Python): sort by (d1 DESC, d2 DESC); a row
survives iff its d2 equals the max d2 of its d1-tie group AND strictly
exceeds the running max d2 over all strictly-greater d1 groups —
mirrored token-for-token by the oracle's ``max() OVER (PARTITION BY
d1)`` + ``max() OVER (ORDER BY d1 DESC RANGE … 1 PRECEDING)`` pair.

Scale notes (100 TB): driver holds Σ per-block frontier sizes. An
adversarial input that IS one huge frontier (perfectly anticorrelated
dimensions) makes every reduction a no-op — inherent to the operator;
insert a tree-reduce level (re-run the partial stage over partials)
before the driver finish for such regimes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["pareto_front"]


def _front_mask(d1: np.ndarray, d2: np.ndarray) -> np.ndarray:
    """Boolean survivor mask over rows sorted by (d1 DESC, d2 DESC)."""
    n = len(d1)
    if n == 0:
        return np.zeros(0, dtype=bool)
    gs = np.flatnonzero(np.concatenate([[True], d1[1:] != d1[:-1]]))
    gmax = d2[gs]  # first of each d1-group is its max d2
    seg = np.cumsum(np.concatenate([[0], (d1[1:] != d1[:-1])]))
    run = np.concatenate(
        [[np.iinfo(np.int64).min], np.maximum.accumulate(gmax)[:-1]]
    )  # strict-prefix max over greater-d1 groups
    return (d2 == gmax[seg]) & (d2 > run[seg])


def _front_rows(ids, d1, d2):
    order = np.lexsort((-d2, -d1))
    ids, d1, d2 = ids[order], d1[order], d2[order]
    m = _front_mask(d1, d2)
    return ids[m], d1[m], d2[m]


def pareto_front(
    ds, id_col: str = "id", d1_col: str = "d1", d2_col: str = "d2"
) -> pa.Table:
    """Exact 2-D skyline (maximize d1 and d2) → (id_col, d1, d2),
    every non-dominated row included (duplicates too), sorted by
    (d1 DESC, d2 DESC, id)."""
    schema = pa.schema(
        [(id_col, pa.int64()), ("d1", pa.int64()), ("d2", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d1 = batch[d1_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d2 = batch[d2_col].to_numpy(zero_copy_only=False).astype(np.int64)
        i, a, b = _front_rows(ids, d1, d2)
        return pa.table(
            {id_col: pa.array(i), "d1": pa.array(a), "d2": pa.array(b)},
            schema=schema,
        )

    if isinstance(ds, pa.Table):
        tabs = [partial(ds.combine_chunks())]
    else:
        import ray

        parts = ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return schema.empty_table()
    t = pa.concat_tables(tabs).combine_chunks()
    ids = t[id_col].to_numpy(zero_copy_only=False)
    i, a, b = _front_rows(
        ids,
        t["d1"].to_numpy(zero_copy_only=False),
        t["d2"].to_numpy(zero_copy_only=False),
    )
    out = pa.table(
        {id_col: pa.array(i), "d1": pa.array(a), "d2": pa.array(b)},
        schema=schema,
    )
    return out.sort_by(
        [("d1", "descending"), ("d2", "descending"), (id_col, "ascending")]
    )
