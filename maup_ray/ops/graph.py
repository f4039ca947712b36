"""Iterative graph propagation — fixed-point PageRank as a BSP loop of
keyed shuffles (the numeric companion to the label-propagation
connected components in ``text/cluster.py``).

Why fixed-point integers: float PageRank sums are order-dependent, so
a distributed run would diverge from any serial oracle bit-by-bit.
Here every rank is an int64 "mass" on a ``scale`` grid and one
iteration is

    r'(v) = base + Σ_{u→v} (d_num · r(u)) // (d_den · outdeg(u)),

all exact integer arithmetic (floor division, positive operands), so
the result is partition-invariant and mirrors an unrolled SQL oracle
token-for-token. The floored remainders leak a little mass per
iteration — that is part of the operator's DEFINITION, identical on
both sides, not an approximation error.

Scale shape (100 TB / 10^12-node graphs): nothing node- or edge-sized
ever lands on the driver. Each iteration is two keyed exchanges:
  1. propagate: ranks ∪ edges co-shuffle on the SOURCE node
     (``hash_group_apply``; the islands side-tag pattern) — each
     partition broadcasts its group's rank across that group's edge
     rows vectorized and emits (dst, contrib) pairs, 16 B/row;
  2. combine: contributions ∪ per-node base rows reduce with
     ``grouped_sum_count(final="hash")`` — per-batch partials, then
     one bytes-aware hash exchange.
Hot destination nodes pre-combine inside the partial pass; hot SOURCE
nodes (a node with billions of out-edges) are the documented
hash_group_apply skew caveat — split them upstream by salting the
edge list and replicating the rank row per salt.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .agg import grouped_sum_count
from .shuffle import hash_group_apply

__all__ = ["pagerank"]


def pagerank(
    edges,
    nodes,
    n_nodes: int,
    iterations: int = 3,
    scale: int = 10**12,
    damping: tuple[int, int] = (85, 100),
):
    """``iterations`` rounds of fixed-point PageRank.

    ``edges``: Dataset/Table (src:int64, dst:int64, outdeg:int64) —
    ``outdeg`` is the out-degree of ``src`` (replicated per edge row so
    no degree join is needed; derive it upstream with one grouped
    count if the edge list doesn't carry it).
    ``nodes``: Dataset/Table (node:int64) — the full node universe
    (nodes without in-edges still receive the base term).

    Returns a Dataset (node:int64, r:int64) with the iteration-
    ``iterations`` mass on the ``scale`` grid.
    """
    import ray.data

    d_num, d_den = damping
    base = (scale * (d_den - d_num)) // (d_den * n_nodes)
    r0 = scale // n_nodes

    def to_ds(x):
        return ray.data.from_arrow(x) if isinstance(x, pa.Table) else x

    edges = to_ds(edges)
    nodes = to_ds(nodes)

    # side-tagged union payload for the source-keyed propagate pass:
    # rank rows carry (key=node, r, is_rank=1), edge rows
    # (key=src, dst, outdeg, is_rank=0). Pruned: 33 B/row.
    def tag_edges(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "key": batch["src"],
                "dst": batch["dst"],
                "outdeg": batch["outdeg"],
                "r": pa.array(np.zeros(n, dtype=np.int64)),
                "is_rank": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    tagged_edges = edges.map_batches(
        tag_edges, batch_format="pyarrow", zero_copy_batch=True
    )

    def base_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "dst": batch["node"],
                "contrib": pa.array(np.full(n, base, dtype=np.int64)),
            }
        )

    base_ds = nodes.map_batches(
        base_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def propagate(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        empty = pa.schema(
            [pa.field("dst", pa.int64()), pa.field("contrib", pa.int64())]
        ).empty_table()
        if tbl is None or len(tbl) == 0:
            return empty
        n = len(tbl)
        sizes = np.diff(np.append(starts, n))
        is_rank = tbl["is_rank"].to_numpy(zero_copy_only=False)
        r = tbl["r"].to_numpy(zero_copy_only=False)
        # sorted ascending by is_rank within the group → the rank row
        # (if present) is the group's LAST row
        last = starts + sizes - 1
        r_group = np.where(is_rank[last] == 1, r[last], 0)
        r_row = np.repeat(r_group, sizes)
        edge_mask = is_rank == 0
        if not edge_mask.any():
            return empty
        outdeg = tbl["outdeg"].to_numpy(zero_copy_only=False)[edge_mask]
        contrib = (d_num * r_row[edge_mask]) // (d_den * outdeg)
        return pa.table(
            {
                "dst": tbl["dst"].filter(pa.array(edge_mask)),
                "contrib": pa.array(contrib.astype(np.int64)),
            }
        )

    def rank_to_tagged(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "key": batch["node"],
                "dst": pa.array(np.zeros(n, dtype=np.int64)),
                "outdeg": pa.array(np.ones(n, dtype=np.int64)),
                "r": batch["r"],
                "is_rank": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    def uniform_rank(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "key": batch["node"],
                "dst": pa.array(np.zeros(n, dtype=np.int64)),
                "outdeg": pa.array(np.ones(n, dtype=np.int64)),
                "r": pa.array(np.full(n, r0, dtype=np.int64)),
                "is_rank": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    tagged_ranks = nodes.map_batches(
        uniform_rank, batch_format="pyarrow", zero_copy_batch=True
    )
    ranks = None
    for _ in range(iterations):
        if ranks is not None:
            tagged_ranks = ranks.map_batches(
                rank_to_tagged, batch_format="pyarrow", zero_copy_batch=True
            )
        contribs = hash_group_apply(
            tagged_edges.union(tagged_ranks),
            ["key"],
            propagate,
            sort_cols=["is_rank"],
        )
        summed = grouped_sum_count(
            contribs.union(base_ds),
            ["dst"],
            sum_cols=["contrib"],
            final="hash",
        )
        ranks = summed.map_batches(
            lambda b: b.rename_columns(["node", "r"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return ranks
