"""Iterative graph propagation — fixed-point PageRank as a BSP loop
over an ITERATION-INVARIANT partitioning (the numeric companion to the
label-propagation connected components in ``text/cluster.py``).

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

Scale shape (100 TB / 10^12-node graphs): ONE partitioning key (the
node id hash) is chosen up front and reused by every stage of every
iteration — the "pick one partitioning key and reuse it" discipline:

  * edges hash-partition by src ONCE (the only time edge bytes move);
    the node universe hash-partitions by node id with the SAME hash,
    so partition p holds exactly the rank rows its edge rows need.
  * each iteration is two raw-task rounds over that fixed layout:
    propagate (per partition: one index_in rank lookup + the contrib
    arithmetic + a per-dst pre-combine, emitting 16 B/row partials
    hash-split by dst — again the same hash) and combine (per
    partition: reduceat-merge the incoming partials onto the node
    part). The new rank vector lands already partitioned for the next
    iteration — zero re-shuffles, zero driver round-trips of node- or
    edge-sized data.

Raw tasks (not per-iteration Dataset jobs) are the documented
last-resort case: the Dataset API cannot express "keep this exact
partitioning across N dependent rounds", and re-deriving it per round
costs one all-to-all per iteration plus the per-job fixed overhead.
Hot SOURCE nodes (a node with billions of out-edges) are the usual
hash-partition skew caveat — salt the edge list upstream and replicate
the rank row per salt; hot DESTINATIONS pre-combine inside propagate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .shuffle import _choose_partitions, _hash_keys, _split_block

__all__ = ["pagerank", "triangle_count", "clustering_coefficients",
           "bfs_hops", "sssp", "kcore", "link_prediction",
           "degree_histogram", "msf_boruvka"]


def _propagate_part(
    edge_part: pa.Table,
    rank_part: pa.Table,
    P: int,
    d_num: int,
    d_den: int,
):
    """One propagate task: contribs of this partition's edges, summed
    per dst (pre-combine), hash-split by dst into P sub-tables."""
    empty = pa.table(
        {
            "dst": pa.array([], type=pa.int64()),
            "contrib": pa.array([], type=pa.int64()),
        }
    )
    if edge_part.num_rows == 0:
        return [empty] * P if P > 1 else empty
    import pyarrow.compute as pc

    nodes = rank_part["node"].combine_chunks()
    if isinstance(nodes, pa.ChunkedArray):
        nodes = (
            nodes.chunk(0)
            if nodes.num_chunks
            else pa.array([], type=pa.int64())
        )
    idx = pc.index_in(edge_part["src"], nodes)
    # a src outside the node universe contributes nothing (defined 0);
    # stay int64 end-to-end — a null→NaN float round-trip would corrupt
    # ranks above 2^53 for large `scale`
    if rank_part.num_rows == 0:
        r = np.zeros(edge_part.num_rows, dtype=np.int64)
    else:
        found = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        safe = pc.fill_null(idx, 0)
        r = pc.take(rank_part["r"], safe).to_numpy(zero_copy_only=False)
        r = np.where(found, r, 0)
    outdeg = edge_part["outdeg"].to_numpy(zero_copy_only=False)
    contrib = (d_num * r) // (d_den * outdeg)
    dst = edge_part["dst"].to_numpy(zero_copy_only=False)
    # pre-combine per dst: order-independent (exact ints)
    order = np.argsort(dst, kind="stable")
    ds_ = dst[order]
    starts = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
    t = pa.table(
        {
            "dst": pa.array(ds_[starts]),
            "contrib": pa.array(np.add.reduceat(contrib[order], starts)),
        }
    )
    return _split_block(t, ["dst"], P)


def _combine_part(node_part: pa.Table, base: int, *subs: pa.Table):
    """One combine task: new rank rows for this partition's nodes —
    base + merged contrib partials."""
    node = node_part["node"].to_numpy(zero_copy_only=False)
    r = np.full(len(node), base, dtype=np.int64)
    live = [s for s in subs if s.num_rows]
    if live:
        m = live[0] if len(live) == 1 else pa.concat_tables(live)
        dst = m["dst"].to_numpy(zero_copy_only=False)
        c = m["contrib"].to_numpy(zero_copy_only=False)
        order = np.argsort(node, kind="stable")
        pos = np.searchsorted(node[order], dst)
        # every dst is in the node universe by construction (same hash
        # routed it here); guard anyway so a stray dst can't corrupt
        ok = (pos < len(node)) & (node[order][np.minimum(pos, len(node) - 1)] == dst)
        np.add.at(r, order[pos[ok]], c[ok])
    return pa.table({"node": node_part["node"], "r": pa.array(r)})


def pagerank(
    edges,
    nodes,
    n_nodes: int,
    iterations: int = 3,
    scale: int = 10**12,
    damping: tuple[int, int] = (85, 100),
    num_partitions: int | None = None,
):
    """``iterations`` rounds of fixed-point PageRank.

    ``edges``: Dataset/Table (src:int64, dst:int64, outdeg:int64) —
    ``outdeg`` is the out-degree of ``src`` (replicated per edge row so
    no degree join is needed; derive it upstream with one grouped
    count if the edge list doesn't carry it).
    ``nodes``: Dataset/Table (node:int64) — the full node universe
    (nodes without in-edges still receive the base term).

    Returns a Dataset (node:int64, r:int64) with the iteration-
    ``iterations`` mass on the ``scale`` grid. Caller bound:
    ``damping[0] * scale`` must fit int64 (a single node can
    accumulate nearly the whole mass), so scale ≤ ~2^56 at the
    default damping.
    """
    import ray
    import ray.data

    d_num, d_den = damping
    base = (scale * (d_den - d_num)) // (d_den * n_nodes)
    r0 = scale // n_nodes

    def block_refs(x):
        if isinstance(x, pa.Table):
            return [ray.put(x)], x.nbytes
        mat = x.materialize()
        return mat.to_arrow_refs(), mat.size_bytes()

    edge_blocks, edge_bytes = block_refs(edges)
    node_blocks, node_bytes = block_refs(nodes)
    if num_partitions is None:
        num_partitions = _choose_partitions(
            edge_bytes + node_bytes, ray.cluster_resources().get("CPU", 8)
        )
    P = int(num_partitions)

    # ---- one-time layout: hash-partition edges by src, nodes by id
    # (same hash function → co-located), then concat each partition
    split = (
        ray.remote(num_returns=P)(_split_block)
        if P > 1
        else ray.remote(_split_block)
    )

    concat = ray.remote(_concat_parts)

    def partition(blocks, keys):
        parts = [split.remote(b, keys, P) for b in blocks]
        if P == 1:
            parts = [[p] for p in parts]
        return [
            concat.remote(*[p[i] for p in parts]) for i in range(P)
        ]

    edge_parts = partition(edge_blocks, ["src"])
    node_parts = partition(node_blocks, ["node"])

    init = ray.remote(_init_ranks)
    rank_parts = [init.remote(np_, r0) for np_ in node_parts]

    prop = ray.remote(num_returns=P)(_propagate_part) if P > 1 else (
        ray.remote(_propagate_part)
    )
    comb = ray.remote(_combine_part)
    for _ in range(iterations):
        outs = [
            prop.remote(edge_parts[p], rank_parts[p], P, d_num, d_den)
            for p in range(P)
        ]
        if P == 1:
            outs = [[o] for o in outs]
        rank_parts = [
            comb.remote(node_parts[q], base, *[o[q] for o in outs])
            for q in range(P)
        ]
    return ray.data.from_arrow_refs(rank_parts)


def _init_ranks(node_part: pa.Table, r0: int) -> pa.Table:
    return pa.table(
        {
            "node": node_part["node"],
            "r": pa.array(np.full(node_part.num_rows, r0, dtype=np.int64)),
        }
    )


def _concat_parts(*tabs: pa.Table) -> pa.Table:
    live = [t for t in tabs if t.num_rows] or list(tabs[:1])
    t = live[0] if len(live) == 1 else pa.concat_tables(live)
    return t.combine_chunks()


def triangle_count(edges_ds, src: str = "u", dst: str = "v"):
    """Exact triangle count of an undirected graph — the standard
    two-round wedge-closure algorithm, fully distributed.

    Round 1 (keyed by the lower endpoint): edges arrive oriented
    u < v (self-loops dropped, both done per batch upstream of the
    exchange); each partition holds ALL of a node's greater neighbors,
    so it can (a) dedup the edge multiset and (b) emit every wedge
    (v, w), v < w, as one vectorized segment-arange pass — no Python
    per-node loop. Deduped edges ride along flagged ``is_edge=1`` so
    round 2 needs no second pipeline over the input.

    Round 2 (keyed by the wedge pair): a wedge (v, w) closes iff the
    deduped edge (v, w) lands in the same hash partition — one
    reduceat per partition counts wedges in groups that contain an
    edge row. Partials are single int64 rows; the driver sums ≤ P of
    them.

    Scale shape: edge bytes move exactly twice (once per round), both
    times as 17 B/row (u, v, flag) projections. Skew caveat: a node of
    degree d emits d(d−1)/2 wedges — the documented hash-partition
    hot-key assumption (bound the max degree upstream, or split hot
    nodes by salting their neighbor lists and correcting the
    within-salt undercount, before handing edges to this op).

    Returns a 1-row pa.Table {n_triangles: int64}.
    """
    import ray

    from .shuffle import hash_group_apply

    def orient(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = b[src]
        v = b[dst]
        lo = pc.min_element_wise(u, v)
        hi = pc.max_element_wise(u, v)
        t = pa.table({"u": lo, "v": hi})
        return t.filter(pc.less(lo, hi))

    oriented = edges_ds.map_batches(
        orient, batch_format="pyarrow", zero_copy_batch=True
    )

    def wedges_part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
                "is_edge": pa.array([], type=pa.int64()),
            }
        )
        if tbl is None or len(tbl) == 0:
            return empty
        u = tbl["u"].to_numpy(zero_copy_only=False)
        v = tbl["v"].to_numpy(zero_copy_only=False)
        # dedup: (u, v) sorted by hash_group_apply(sort_cols=["v"])
        keepm = np.empty(len(u), dtype=bool)
        keepm[0] = True
        keepm[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        u, v = u[keepm], v[keepm]
        n = len(u)
        # group starts after dedup
        gs = np.flatnonzero(
            np.concatenate(([True], u[1:] != u[:-1]))
        )
        ends = np.append(gs[1:], n)
        # rights count per element: (group_end - pos - 1)
        rights = np.repeat(ends, ends - gs) - np.arange(n) - 1
        total = int(rights.sum())
        if total:
            left = np.repeat(np.arange(n), rights)
            offs = np.cumsum(rights) - rights
            right = (
                np.arange(total)
                - np.repeat(offs, rights)
                + np.repeat(np.arange(n) + 1, rights)
            )
            wa, wb = v[left], v[right]
        else:
            wa = wb = np.empty(0, dtype=v.dtype)
        return pa.table(
            {
                "a": pa.array(np.concatenate([wa, u]).astype(np.int64)),
                "b": pa.array(np.concatenate([wb, v]).astype(np.int64)),
                "is_edge": pa.array(
                    np.concatenate(
                        [
                            np.zeros(total, dtype=np.int64),
                            np.ones(n, dtype=np.int64),
                        ]
                    )
                ),
            }
        )

    mixed = hash_group_apply(oriented, ["u"], wedges_part, sort_cols=["v"])

    def close_part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        if tbl is None or len(tbl) == 0:
            return pa.table({"n": pa.array([0], type=pa.int64())})
        flags = tbl["is_edge"].to_numpy(zero_copy_only=False)
        n = len(flags)
        has_edge = np.add.reduceat(flags, starts) > 0
        sizes = np.diff(np.append(starts, n))
        wedge_counts = sizes - np.add.reduceat(flags, starts)
        return pa.table(
            {
                "n": pa.array(
                    [int(wedge_counts[has_edge].sum())], type=pa.int64()
                )
            }
        )

    partials = hash_group_apply(mixed, ["a", "b"], close_part)
    total = sum(
        int(t["n"][0].as_py())
        for t in (
            ray.get(r) for r in partials.materialize().to_arrow_refs()
        )
        if t.num_rows
    )
    return pa.table({"n_triangles": pa.array([total], type=pa.int64())})


def clustering_coefficients(edges_ds, src: str = "u", dst: str = "v"):
    """Per-node exact triangle count, degree and local clustering
    coefficient ``lcc = 2·tri / (deg·(deg−1))`` of an undirected graph
    — the :func:`triangle_count` wedge-closure rounds extended to
    credit every closed triangle to ALL THREE of its nodes.

    Round 1 (keyed by lower endpoint): per-partition edge dedup, then
    each wedge (v, w) rides with its APEX u (24 B/row instead of the
    count-only 17 B); deduped edges follow flagged ``is_edge=1``.
    Round 2 (keyed by the wedge pair): a wedge closes iff its group
    contains an edge row; per partition the closed wedges scatter-add
    +1 triangle to apex/a/b and every edge row scatter-adds +1 degree
    to a/b, so only pre-combined (node, tri, deg) partials leave —
    ≤ 3·nodes rows per partition regardless of wedge count. One keyed
    sum per node (``final="hash"``, integer partials are
    order-independent) and a stateless lcc map finish.

    Same hot-key caveat as triangle_count: degree-d nodes emit
    d(d−1)/2 wedges; bound the max degree upstream. Isolated nodes
    (no incident edge) do not appear in the output.

    Returns a Dataset of (node, degree, n_tri, lcc) with lcc NULL for
    degree < 2."""
    from .agg import grouped_sum_count
    from .shuffle import hash_group_apply

    def orient(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = b[src]
        v = b[dst]
        lo = pc.min_element_wise(u, v)
        hi = pc.max_element_wise(u, v)
        t = pa.table({"u": lo, "v": hi})
        return t.filter(pc.less(lo, hi))

    oriented = edges_ds.map_batches(
        orient, batch_format="pyarrow", zero_copy_batch=True
    )

    def wedges_part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
                "apex": pa.array([], type=pa.int64()),
                "is_edge": pa.array([], type=pa.int64()),
            }
        )
        if tbl is None or len(tbl) == 0:
            return empty
        u = tbl["u"].to_numpy(zero_copy_only=False)
        v = tbl["v"].to_numpy(zero_copy_only=False)
        keepm = np.empty(len(u), dtype=bool)
        keepm[0] = True
        keepm[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        u, v = u[keepm], v[keepm]
        n = len(u)
        gs = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        ends = np.append(gs[1:], n)
        rights = np.repeat(ends, ends - gs) - np.arange(n) - 1
        total = int(rights.sum())
        if total:
            left = np.repeat(np.arange(n), rights)
            offs = np.cumsum(rights) - rights
            right = (
                np.arange(total)
                - np.repeat(offs, rights)
                + np.repeat(np.arange(n) + 1, rights)
            )
            wa, wb, wapex = v[left], v[right], u[left]
        else:
            wa = wb = wapex = np.empty(0, dtype=v.dtype)
        return pa.table(
            {
                "a": pa.array(np.concatenate([wa, u]).astype(np.int64)),
                "b": pa.array(np.concatenate([wb, v]).astype(np.int64)),
                "apex": pa.array(
                    np.concatenate(
                        [wapex, np.full(n, -1, dtype=np.int64)]
                    ).astype(np.int64)
                ),
                "is_edge": pa.array(
                    np.concatenate(
                        [
                            np.zeros(total, dtype=np.int64),
                            np.ones(n, dtype=np.int64),
                        ]
                    )
                ),
            }
        )

    mixed = hash_group_apply(oriented, ["u"], wedges_part, sort_cols=["v"])

    def credit_part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                "node": pa.array([], type=pa.int64()),
                "tri": pa.array([], type=pa.int64()),
                "deg": pa.array([], type=pa.int64()),
            }
        )
        if tbl is None or len(tbl) == 0:
            return empty
        flags = tbl["is_edge"].to_numpy(zero_copy_only=False)
        a = tbl["a"].to_numpy(zero_copy_only=False)
        b = tbl["b"].to_numpy(zero_copy_only=False)
        apex = tbl["apex"].to_numpy(zero_copy_only=False)
        n = len(flags)
        sizes = np.diff(np.append(starts, n))
        has_edge = np.add.reduceat(flags, starts) > 0
        closed = (flags == 0) & np.repeat(has_edge, sizes)
        edge_rows = flags == 1
        tri_nodes = np.concatenate([apex[closed], a[closed], b[closed]])
        deg_nodes = np.concatenate([a[edge_rows], b[edge_rows]])
        nodes = np.concatenate([tri_nodes, deg_nodes])
        if not len(nodes):
            return empty
        uniq, inv = np.unique(nodes, return_inverse=True)
        tri = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(tri, inv[: len(tri_nodes)], 1)
        deg = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(deg, inv[len(tri_nodes):], 1)
        return pa.table(
            {
                "node": pa.array(uniq.astype(np.int64)),
                "tri": pa.array(tri),
                "deg": pa.array(deg),
            }
        )

    credits = hash_group_apply(mixed, ["a", "b"], credit_part)
    sums = grouped_sum_count(
        credits, ["node"], sum_cols=["tri", "deg"], final="hash"
    )

    def lcc(batch: pa.Table) -> pa.Table:
        t = batch["tri"].to_numpy(zero_copy_only=False)
        d = batch["deg"].to_numpy(zero_copy_only=False)
        den = d * (d - 1)
        # num cast exact (tri ≤ deg² ≪ 2^52); the division is the ONE
        # rounded op, mirrored by CAST(... AS DOUBLE)/CAST(... AS DOUBLE)
        with np.errstate(divide="ignore", invalid="ignore"):
            vals = (2 * t).astype(np.float64) / den.astype(np.float64)
        arr = pa.array(vals, type=pa.float64(), mask=den <= 0)
        return pa.table(
            {
                "node": batch["node"],
                "degree": batch["deg"],
                "n_tri": batch["tri"],
                "lcc": arr,
            }
        )

    return sums.map_batches(
        lcc, batch_format="pyarrow", zero_copy_batch=True
    )


_UNREACHED = np.int64(1) << np.int64(62)  # +inf sentinel for min-merge


def _bfs_propagate(edge_part: pa.Table, dist_part: pa.Table, P: int):
    """One BFS propagate task: for this partition's edges whose src is
    reached, emit (dst, d_src + 1), pre-combined per dst with MIN,
    hash-split by dst."""
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "dst": pa.array([], type=pa.int64()),
            "d": pa.array([], type=pa.int64()),
        }
    )
    if edge_part.num_rows == 0 or dist_part.num_rows == 0:
        return [empty] * P if P > 1 else empty
    nodes = dist_part["node"].combine_chunks()
    if isinstance(nodes, pa.ChunkedArray):
        nodes = (
            nodes.chunk(0)
            if nodes.num_chunks
            else pa.array([], type=pa.int64())
        )
    idx = pc.index_in(edge_part["src"], nodes)
    found = pc.is_valid(idx).to_numpy(zero_copy_only=False)
    safe = pc.fill_null(idx, 0)
    d = pc.take(dist_part["d"], safe).to_numpy(zero_copy_only=False)
    ok = found & (d < _UNREACHED)
    if not ok.any():
        return [empty] * P if P > 1 else empty
    dst = edge_part["dst"].to_numpy(zero_copy_only=False)[ok]
    nd = d[ok] + 1
    order = np.argsort(dst, kind="stable")
    ds_ = dst[order]
    starts = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
    t = pa.table(
        {
            "dst": pa.array(ds_[starts]),
            "d": pa.array(np.minimum.reduceat(nd[order], starts)),
        }
    )
    return _split_block(t, ["dst"], P)


def _bfs_combine(dist_part: pa.Table, *subs: pa.Table) -> pa.Table:
    """min-merge incoming distance candidates onto this partition's
    dist rows."""
    node = dist_part["node"].to_numpy(zero_copy_only=False)
    d = dist_part["d"].to_numpy(zero_copy_only=False).copy()
    live = [s for s in subs if s.num_rows]
    if live:
        m = live[0] if len(live) == 1 else pa.concat_tables(live)
        dst = m["dst"].to_numpy(zero_copy_only=False)
        nd = m["d"].to_numpy(zero_copy_only=False)
        order = np.argsort(node, kind="stable")
        pos = np.searchsorted(node[order], dst)
        ok = (pos < len(node)) & (
            node[order][np.minimum(pos, len(node) - 1)] == dst
        )
        np.minimum.at(d, order[pos[ok]], nd[ok])
    return pa.table({"node": dist_part["node"], "d": pa.array(d)})


def _init_dists(node_part: pa.Table, sources: pa.Array) -> pa.Table:
    import pyarrow.compute as pc

    node = node_part["node"]
    is_src = pc.is_in(node, value_set=sources)
    d = np.where(
        is_src.to_numpy(zero_copy_only=False),
        np.int64(0),
        _UNREACHED,
    )
    return pa.table({"node": node, "d": pa.array(d)})


def bfs_hops(
    edges,
    nodes,
    sources,
    max_hops: int,
    num_partitions: int | None = None,
):
    """Multi-source BFS hop distances, bounded at ``max_hops`` rounds —
    the reachability / influence-radius primitive, on the SAME
    iteration-invariant layout as ``pagerank``: edges hash-partition
    by src ONCE, dist rows co-partition by the same node hash, each
    round is one propagate + one combine raw-task pass (zero
    per-round Dataset jobs, zero edge re-shuffles).

    After L rounds every node within L hops of the source set carries
    its exact BFS distance (monotone min-merge induction); nodes
    farther away stay at the unreached sentinel and are dropped from
    the output. ``sources`` is a small driver-local id collection
    (broadcast once inside the init tasks).

    Returns a Dataset (node:int64, hops:int64) for reached nodes.
    """
    import ray
    import ray.data

    src_arr = (
        sources
        if isinstance(sources, pa.Array)
        else pa.array(list(sources), type=pa.int64())
    )

    def block_refs(x):
        if isinstance(x, pa.Table):
            return [ray.put(x)], x.nbytes
        mat = x.materialize()
        return mat.to_arrow_refs(), mat.size_bytes()

    edge_blocks, edge_bytes = block_refs(edges)
    node_blocks, node_bytes = block_refs(nodes)
    if num_partitions is None:
        num_partitions = _choose_partitions(
            edge_bytes + node_bytes, ray.cluster_resources().get("CPU", 8)
        )
    P = int(num_partitions)

    split = (
        ray.remote(num_returns=P)(_split_block)
        if P > 1
        else ray.remote(_split_block)
    )
    concat = ray.remote(_concat_parts)

    def partition(blocks, keys):
        parts = [split.remote(b, keys, P) for b in blocks]
        if P == 1:
            parts = [[p] for p in parts]
        return [concat.remote(*[p[i] for p in parts]) for i in range(P)]

    edge_parts = partition(edge_blocks, ["src"])
    node_parts = partition(node_blocks, ["node"])

    init = ray.remote(_init_dists)
    dist_parts = [init.remote(np_, src_arr) for np_ in node_parts]

    prop = ray.remote(num_returns=P)(_bfs_propagate) if P > 1 else (
        ray.remote(_bfs_propagate)
    )
    comb = ray.remote(_bfs_combine)
    for _ in range(int(max_hops)):
        outs = [
            prop.remote(edge_parts[p], dist_parts[p], P)
            for p in range(P)
        ]
        if P == 1:
            outs = [[o] for o in outs]
        dist_parts = [
            comb.remote(dist_parts[q], *[o[q] for o in outs])
            for q in range(P)
        ]

    def reached(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = b.filter(
            pc.less(b["d"], pa.scalar(int(_UNREACHED), pa.int64()))
        )
        return pa.table({"node": t["node"], "hops": t["d"]})

    return ray.data.from_arrow_refs(dist_parts).map_batches(
        reached, batch_format="pyarrow", zero_copy_batch=True
    )


# ------------------------------------------------------- weighted SSSP


def _sssp_propagate(edge_part: pa.Table, dist_part: pa.Table, P: int):
    """One SSSP propagate task: for reached srcs, emit
    (dst, d_src + w), pre-combined per dst with MIN, split by dst."""
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "dst": pa.array([], type=pa.int64()),
            "d": pa.array([], type=pa.int64()),
        }
    )
    if edge_part.num_rows == 0 or dist_part.num_rows == 0:
        return [empty] * P if P > 1 else empty
    nodes = dist_part["node"].combine_chunks()
    if isinstance(nodes, pa.ChunkedArray):
        nodes = (
            nodes.chunk(0)
            if nodes.num_chunks
            else pa.array([], type=pa.int64())
        )
    idx = pc.index_in(edge_part["src"], nodes)
    found = pc.is_valid(idx).to_numpy(zero_copy_only=False)
    safe = pc.fill_null(idx, 0)
    d = pc.take(dist_part["d"], safe).to_numpy(zero_copy_only=False)
    ok = found & (d < _UNREACHED)
    if not ok.any():
        return [empty] * P if P > 1 else empty
    dst = edge_part["dst"].to_numpy(zero_copy_only=False)[ok]
    w = edge_part["w"].to_numpy(zero_copy_only=False)[ok]
    nd = d[ok] + w
    order = np.argsort(dst, kind="stable")
    ds_ = dst[order]
    starts = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
    t = pa.table(
        {
            "dst": pa.array(ds_[starts]),
            "d": pa.array(np.minimum.reduceat(nd[order], starts)),
        }
    )
    return _split_block(t, ["dst"], P)


def sssp(
    edges,
    nodes,
    sources,
    rounds: int,
    num_partitions: int | None = None,
):
    """Multi-source single-source-shortest-paths with positive int64
    edge weights (column ``w``), Bellman-Ford style: after L rounds
    every node whose shortest path uses at most L edges carries its
    exact distance (the standard relaxation induction — weights must
    be positive ints so the min-merge is exact and monotone). For a
    level-structured DAG, ``rounds = depth`` is exact SSSP; for a
    general graph pick ``rounds`` = the hop bound of interest.

    Same iteration-invariant BSP layout as ``bfs_hops``/``pagerank``:
    edges hash-partition by src ONCE, dist rows co-partition by the
    same node hash, each round is one propagate + one min-combine
    raw-task pass — zero per-round Dataset jobs or edge re-shuffles.
    Returns a Dataset (node:int64, dist:int64) for reached nodes."""
    import ray
    import ray.data

    src_arr = (
        sources
        if isinstance(sources, pa.Array)
        else pa.array(list(sources), type=pa.int64())
    )

    def block_refs(x):
        if isinstance(x, pa.Table):
            return [ray.put(x)], x.nbytes
        mat = x.materialize()
        return mat.to_arrow_refs(), mat.size_bytes()

    edge_blocks, edge_bytes = block_refs(edges)
    node_blocks, node_bytes = block_refs(nodes)
    if num_partitions is None:
        num_partitions = _choose_partitions(
            edge_bytes + node_bytes, ray.cluster_resources().get("CPU", 8)
        )
    P = int(num_partitions)

    split = (
        ray.remote(num_returns=P)(_split_block)
        if P > 1
        else ray.remote(_split_block)
    )
    concat = ray.remote(_concat_parts)

    def partition(blocks, keys):
        parts = [split.remote(b, keys, P) for b in blocks]
        if P == 1:
            parts = [[p] for p in parts]
        return [concat.remote(*[p[i] for p in parts]) for i in range(P)]

    edge_parts = partition(edge_blocks, ["src"])
    node_parts = partition(node_blocks, ["node"])

    init = ray.remote(_init_dists)
    dist_parts = [init.remote(np_, src_arr) for np_ in node_parts]

    prop = ray.remote(num_returns=P)(_sssp_propagate) if P > 1 else (
        ray.remote(_sssp_propagate)
    )
    comb = ray.remote(_bfs_combine)
    for _ in range(int(rounds)):
        outs = [
            prop.remote(edge_parts[p], dist_parts[p], P)
            for p in range(P)
        ]
        if P == 1:
            outs = [[o] for o in outs]
        dist_parts = [
            comb.remote(dist_parts[q], *[o[q] for o in outs])
            for q in range(P)
        ]

    def reached(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = b.filter(
            pc.less(b["d"], pa.scalar(int(_UNREACHED), pa.int64()))
        )
        return pa.table({"node": t["node"], "dist": t["d"]})

    return ray.data.from_arrow_refs(dist_parts).map_batches(
        reached, batch_format="pyarrow", zero_copy_batch=True
    )


# ------------------------------------------------------ k-core peeling


def _kcore_symmetrize(edges, src: str, dst: str):
    """Clean an undirected multi-edge list into a globally deduped
    SYMMETRIC (src, dst) Dataset: orient u<v, dedup per lower-endpoint
    partition (all of u's edges land together), emit both directions."""
    from .shuffle import hash_group_apply

    def orient(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u, v = b[src], b[dst]
        lo = pc.min_element_wise(u, v)
        hi = pc.max_element_wise(u, v)
        t = pa.table({"u": lo, "v": hi})
        return t.filter(pc.less(lo, hi))

    oriented = edges.map_batches(
        orient, batch_format="pyarrow", zero_copy_batch=True
    )

    def dedup_sym(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], type=pa.int64()),
                "dst": pa.array([], type=pa.int64()),
            }
        )
        if tbl is None or len(tbl) == 0:
            return empty
        u = tbl["u"].to_numpy(zero_copy_only=False)
        v = tbl["v"].to_numpy(zero_copy_only=False)
        keep = np.empty(len(u), dtype=bool)
        keep[0] = True
        keep[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        u, v = u[keep], v[keep]
        return pa.table(
            {
                "src": pa.array(
                    np.concatenate([u, v]).astype(np.int64)
                ),
                "dst": pa.array(
                    np.concatenate([v, u]).astype(np.int64)
                ),
            }
        )

    return hash_group_apply(oriented, ["u"], dedup_sym, sort_cols=["v"])


def _kcore_init(edge_part: pa.Table) -> pa.Table:
    """Partition node state (node, deg, alive) from its symmetric edge
    rows — the partition holds ALL of each src's edges, so the local
    count IS the full degree."""
    if edge_part.num_rows == 0:
        return pa.table(
            {
                "node": pa.array([], type=pa.int64()),
                "deg": pa.array([], type=pa.int64()),
                "alive": pa.array([], type=pa.bool_()),
            }
        )
    src = edge_part["src"].to_numpy(zero_copy_only=False)
    uniq, cnt = np.unique(src, return_counts=True)
    return pa.table(
        {
            "node": pa.array(uniq.astype(np.int64)),
            "deg": pa.array(cnt.astype(np.int64)),
            "alive": pa.array(np.ones(len(uniq), dtype=bool)),
        }
    )


def _kcore_peel(edge_part: pa.Table, node_part: pa.Table, k: int, P: int):
    """One peel round for one partition: kill alive nodes with
    deg < k, emit (dst, cnt) decrement messages along the dying
    nodes' out-edges (pre-combined per dst, hash-split by dst).
    Returns (node_part_after_kill, n_dying, *P decrement splits)."""
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "dst": pa.array([], type=pa.int64()),
            "c": pa.array([], type=pa.int64()),
        }
    )
    node = node_part["node"]
    deg = node_part["deg"].to_numpy(zero_copy_only=False)
    alive = node_part["alive"].to_numpy(zero_copy_only=False)
    dying = alive & (deg < k)
    n_dying = int(dying.sum())
    splits = [empty] * P
    if n_dying:
        new_alive = alive & ~dying
        node_part = pa.table(
            {
                "node": node,
                "deg": node_part["deg"],
                "alive": pa.array(new_alive),
            }
        )
        if edge_part.num_rows:
            nodes_arr = node.combine_chunks()
            if isinstance(nodes_arr, pa.ChunkedArray):
                nodes_arr = (
                    nodes_arr.chunk(0)
                    if nodes_arr.num_chunks
                    else pa.array([], type=pa.int64())
                )
            idx = pc.index_in(edge_part["src"], nodes_arr)
            # every edge src is a local node by construction
            pos = idx.to_numpy(zero_copy_only=False).astype(np.int64)
            m = dying[pos]
            if m.any():
                dst = edge_part["dst"].to_numpy(
                    zero_copy_only=False
                )[m]
                order = np.argsort(dst, kind="stable")
                d_ = dst[order]
                st = np.flatnonzero(np.r_[True, d_[1:] != d_[:-1]])
                cnt = np.diff(np.append(st, len(d_)))
                t = pa.table(
                    {
                        "dst": pa.array(d_[st]),
                        "c": pa.array(cnt.astype(np.int64)),
                    }
                )
                from .shuffle import _split_block as _sb

                out = _sb(t, ["dst"], P)
                splits = out if P > 1 else [out]
    return tuple([node_part, n_dying] + splits)


def _kcore_apply(node_part: pa.Table, *subs: pa.Table) -> pa.Table:
    """Subtract incoming decrement messages from this partition's
    degree vector (dead targets are decremented too — harmless)."""
    live = [s for s in subs if s.num_rows]
    if not live:
        return node_part
    m = live[0] if len(live) == 1 else pa.concat_tables(live)
    node = node_part["node"].to_numpy(zero_copy_only=False)
    deg = node_part["deg"].to_numpy(zero_copy_only=False).copy()
    dst = m["dst"].to_numpy(zero_copy_only=False)
    c = m["c"].to_numpy(zero_copy_only=False)
    order = np.argsort(node, kind="stable")
    pos = np.searchsorted(node[order], dst)
    ok = (pos < len(node)) & (
        node[order][np.minimum(pos, len(node) - 1)] == dst
    )
    np.subtract.at(deg, order[pos[ok]], c[ok])
    return pa.table(
        {
            "node": node_part["node"],
            "deg": pa.array(deg),
            "alive": node_part["alive"],
        }
    )


def kcore(
    edges,
    k: int,
    rounds: int | None = None,
    src: str = "u",
    dst: str = "v",
    num_partitions: int | None = None,
):
    """k-core of an undirected graph — the maximal induced subgraph
    where every node has degree ≥ k — by distributed BSP peeling on
    the same iteration-invariant layout as ``pagerank``/``sssp``:
    symmetrized deduped edges hash-partition by src ONCE; each round
    kills alive nodes with deg < k and ships only (dst, cnt)
    decrement messages along the dying nodes' edges (pre-combined per
    dst). Total message volume over the whole run is ≤ 2·E — each
    edge direction carries at most one decrement, when its src dies.

    ``rounds=None`` peels to the true fixpoint (one tiny driver
    reduce of P ints per round decides termination);
    ``rounds=R`` runs exactly min(R, fixpoint) rounds — after R
    rounds the alive set is the standard R-step peel iterate, an
    upper bound on the k-core that equals it when R ≥ peel depth
    (what a bounded-unroll SQL oracle can mirror).

    Returns a Dataset (node:int64, degree:int64) of surviving nodes,
    ``degree`` counted within the surviving subgraph. Isolated nodes
    never enter (no edges), matching degree-0 < k semantics for any
    k ≥ 1."""
    import ray
    import ray.data

    sym = _kcore_symmetrize(edges, src, dst)

    def block_refs(x):
        if isinstance(x, pa.Table):
            return [ray.put(x)], x.nbytes
        mat = x.materialize()
        return mat.to_arrow_refs(), mat.size_bytes()

    edge_blocks, edge_bytes = block_refs(sym)
    if num_partitions is None:
        num_partitions = _choose_partitions(
            edge_bytes, ray.cluster_resources().get("CPU", 8)
        )
    P = int(num_partitions)

    split = (
        ray.remote(num_returns=P)(_split_block)
        if P > 1
        else ray.remote(_split_block)
    )
    concat = ray.remote(_concat_parts)
    parts = [split.remote(b, ["src"], P) for b in edge_blocks]
    if P == 1:
        parts = [[p] for p in parts]
    edge_parts = [
        concat.remote(*[p[i] for p in parts]) for i in range(P)
    ]

    init = ray.remote(_kcore_init)
    node_parts = [init.remote(ep) for ep in edge_parts]

    peel = ray.remote(num_returns=P + 2)(_kcore_peel)
    apply_dec = ray.remote(_kcore_apply)
    max_rounds = 1 << 40 if rounds is None else int(rounds)
    done = 0
    while done < max_rounds:
        outs = [
            peel.remote(edge_parts[p], node_parts[p], k, P)
            for p in range(P)
        ]
        killed = [o[0] for o in outs]
        n_dying = sum(ray.get([o[1] for o in outs]))
        done += 1
        if n_dying == 0:
            node_parts = killed
            break
        node_parts = [
            apply_dec.remote(
                killed[q], *[outs[p][2 + q] for p in range(P)]
            )
            for q in range(P)
        ]

    def survivors(b: pa.Table) -> pa.Table:
        t = b.filter(b["alive"])
        return pa.table({"node": t["node"], "degree": t["deg"]})

    return ray.data.from_arrow_refs(node_parts).map_batches(
        survivors, batch_format="pyarrow", zero_copy_batch=True
    )


def link_prediction(edges_ds, src: str = "u", dst: str = "v",
                    min_common: int = 2):
    """Common-neighbor / neighborhood-Jaccard link prediction over an
    undirected graph: for every NON-adjacent node pair (a < b) with
    ``common = |N(a) ∩ N(b)| >= min_common``, emit

        (a, b, common, da, db, jaccard)
        jaccard = common / (da + db − common)

    — the classic friend-of-friend candidate scorer. All counts are
    exact integers; jaccard is ONE mirrored CAST/CAST division.

    Scale shape (three keyed exchanges, all pre-combined):
      1. center-keyed: symmetrized (w, x) rows dedup globally per
         center (w-keyed ⇒ a node's whole neighborhood is local), so
         each group's size IS the final degree; every neighbor pair
         (x_i < x_j) leaves as a wedge row, adjacency rows (w < x)
         are flagged along, and (node, deg) rows ride the same table.
      2. pair-keyed: wedges count into ``common`` per (a, b); pairs
         with an adjacency flag or common < min_common die HERE — only
         candidate links (a tiny set by construction) survive.
      3. degree tag-back: the degree Dataset is corpus-sized, so it is
         never collected — it semi-joins against the candidate node
         set (bounded by 2·|candidates|) and only THAT slice reaches
         the driver to broadcast into the final map.

    Hot-node caveat (triangle_count discipline): a degree-d center
    emits d(d−1)/2 wedges — bound the max degree upstream (or salt
    celebrity nodes) before calling.
    """
    import ray

    from .shuffle import hash_group_apply

    def sym(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table(
            {
                "w": pa.array(np.concatenate([u, v])),
                "x": pa.array(np.concatenate([v, u])),
            }
        )

    symd = edges_ds.map_batches(
        sym, batch_format="pyarrow", zero_copy_batch=True
    )

    _EMPTY1 = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("kind", pa.int8())]
    )

    def center_part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        # kind 0 = wedge pair (a<b), 1 = adjacency pair (a<b),
        # 2 = degree row (a=node, b=deg)
        if tbl is None or tbl.num_rows == 0:
            return _EMPTY1.empty_table()
        w = tbl["w"].to_numpy(zero_copy_only=False)
        x = tbl["x"].to_numpy(zero_copy_only=False)
        keep = np.empty(len(w), dtype=bool)
        keep[0] = True
        keep[1:] = (w[1:] != w[:-1]) | (x[1:] != x[:-1])
        w, x = w[keep], x[keep]
        n = len(w)
        gs = np.flatnonzero(np.concatenate(([True], w[1:] != w[:-1])))
        ends = np.append(gs[1:], n)
        deg = ends - gs
        # neighbor pairs of each center: x is sorted within the group,
        # so (x[left], x[right]) with left < right is already (a < b)
        rights = np.repeat(ends, deg) - np.arange(n) - 1
        total = int(rights.sum())
        if total:
            left = np.repeat(np.arange(n), rights)
            offs = np.cumsum(rights) - rights
            right = (
                np.arange(total)
                - np.repeat(offs, rights)
                + np.repeat(np.arange(n) + 1, rights)
            )
            wa, wb = x[left], x[right]
        else:
            wa = wb = np.empty(0, dtype=np.int64)
        adj = w < x  # each undirected edge flagged once (lower side)
        a = np.concatenate([wa, w[adj], w[gs]]).astype(np.int64)
        b = np.concatenate([wb, x[adj], deg]).astype(np.int64)
        kind = np.concatenate(
            [
                np.zeros(total, dtype=np.int8),
                np.ones(int(adj.sum()), dtype=np.int8),
                np.full(len(gs), 2, dtype=np.int8),
            ]
        )
        return pa.table(
            {"a": pa.array(a), "b": pa.array(b), "kind": pa.array(kind)}
        )

    mixed = hash_group_apply(symd, ["w"], center_part, sort_cols=["x"])

    def split_deg(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = batch.filter(pc.equal(batch["kind"], 2))
        return pa.table(
            {"node": d["a"], "deg": d["b"]}
        )

    def split_pairs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.not_equal(batch["kind"], 2))

    mixed = mixed.materialize()
    degrees = mixed.map_batches(
        split_deg, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = mixed.map_batches(
        split_pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    _EMPTY2 = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("common", pa.int64())]
    )

    def pair_part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        if tbl is None or tbl.num_rows == 0:
            return _EMPTY2.empty_table()
        starts = np.asarray(starts, dtype=np.int64)
        kind = tbl["kind"].to_numpy(zero_copy_only=False)
        n = tbl.num_rows
        sizes = np.diff(np.append(starts, n))
        is_adj = np.add.reduceat(
            (kind == 1).astype(np.int64), starts
        ) > 0
        common = np.add.reduceat((kind == 0).astype(np.int64), starts)
        keep = (~is_adj) & (common >= min_common)
        return pa.table(
            {
                "a": tbl["a"].take(pa.array(starts[keep])),
                "b": tbl["b"].take(pa.array(starts[keep])),
                "common": pa.array(common[keep]),
            }
        )

    refs = hash_group_apply(pairs, ["a", "b"], pair_part,
                            return_refs=True)
    tabs = [t for t in ray.get(refs) if t is not None and t.num_rows]
    if not tabs:
        cand = _EMPTY2.empty_table()
    else:
        cand = pa.concat_tables(tabs).combine_chunks().sort_by(
            [("a", "ascending"), ("b", "ascending")]
        )
    # degree tag-back: only candidate nodes' degrees leave the Dataset
    need = pa.compute.unique(
        pa.concat_arrays(
            [cand["a"].combine_chunks(), cand["b"].combine_chunks()]
        )
    )
    from .join import semi_join

    deg_small_ds = semi_join(
        degrees, pa.table({"node": need}), on="node"
    )
    dtabs = [
        t
        for t in ray.get(deg_small_ds.materialize().to_arrow_refs())
        if t.num_rows
    ]
    dmap = {}
    for t in dtabs:
        for node, dg in zip(
            t["node"].to_numpy(zero_copy_only=False),
            t["deg"].to_numpy(zero_copy_only=False),
        ):
            dmap[int(node)] = int(dg)
    av = cand["a"].to_numpy(zero_copy_only=False)
    bv = cand["b"].to_numpy(zero_copy_only=False)
    cv = cand["common"].to_numpy(zero_copy_only=False)
    da = np.array([dmap[int(z)] for z in av], dtype=np.int64)
    db = np.array([dmap[int(z)] for z in bv], dtype=np.int64)
    union = da + db - cv
    jac = cv.astype(np.float64) / union.astype(np.float64)
    return pa.table(
        {
            "a": cand["a"],
            "b": cand["b"],
            "common": cand["common"],
            "da": pa.array(da),
            "db": pa.array(db),
            "jaccard": pa.array(jac, type=pa.float64()),
        }
    )


def degree_histogram(edges_ds, src: str = "u", dst: str = "v"):
    """Degree distribution of an undirected simple graph (self-loops
    dropped, duplicate/reversed edges deduped): → (deg, n_nodes),
    sorted by deg — the first plot of any graph-quality audit.

    Scale shape: symmetrize, then ONE center-keyed hash exchange
    (hash_group_apply, the link_prediction phase-1 discipline) — a
    node's whole neighborhood lands in one partition, so its distinct
    -neighbor count IS its final degree, and the partition reduces
    its degrees to (deg, count) partials before anything leaves.
    Only n_partitions × n_distinct_degrees tiny rows reach the
    driver; the edge list never gathers."""
    import ray

    from .shuffle import hash_group_apply

    def sym(b: pa.Table) -> pa.Table:
        u = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table(
            {
                "w": pa.array(np.concatenate([u, v])),
                "x": pa.array(np.concatenate([v, u])),
            }
        )

    symd = edges_ds.map_batches(
        sym, batch_format="pyarrow", zero_copy_batch=True
    )

    _EMPTY = pa.schema([("deg", pa.int64()), ("n_nodes", pa.int64())])

    def part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        if tbl is None or tbl.num_rows == 0:
            return _EMPTY.empty_table()
        w = tbl["w"].to_numpy(zero_copy_only=False)
        x = tbl["x"].to_numpy(zero_copy_only=False)
        keep = np.empty(len(w), dtype=bool)
        keep[0] = True
        keep[1:] = (w[1:] != w[:-1]) | (x[1:] != x[:-1])
        w = w[keep]
        gs = np.flatnonzero(np.concatenate(([True], w[1:] != w[:-1])))
        deg = np.diff(np.append(gs, len(w)))
        ud, cnt = np.unique(deg, return_counts=True)
        return pa.table(
            {
                "deg": pa.array(ud.astype(np.int64)),
                "n_nodes": pa.array(cnt.astype(np.int64)),
            }
        )

    parts = hash_group_apply(symd, ["w"], part, sort_cols=["x"])
    tabs = [
        t
        for t in ray.get(parts.materialize().to_arrow_refs())
        if t.num_rows
    ]
    if not tabs:
        return _EMPTY.empty_table()
    merged = pa.concat_tables(tabs)
    out = merged.group_by(["deg"], use_threads=False).aggregate(
        [("n_nodes", "sum")]
    )
    return out.rename_columns(["deg", "n_nodes"]).sort_by("deg")


def _lookup_exchange(payload_ds, map_ds, key_col, payload_cols,
                     out_col, default_self=False):
    """Distributed hash-join primitive for the Borůvka rounds: tag
    every payload row with the map's value for its key, in ONE keyed
    exchange of the UNION of both sides (kind-flagged rows — the
    link_prediction mixed-row pattern; no broadcast, no driver
    gather). All columns must be int64. A payload key missing from
    the map keeps its own key as the value when ``default_self``
    (the label-update semantics), else raises."""
    import ray.data

    def pad_payload(b: pa.Table) -> pa.Table:
        cols = {"_key": pc_cast_i64(b[key_col]),
                "_kind": pa.array(np.ones(len(b), dtype=np.int8))}
        for c in payload_cols:
            cols[c] = pc_cast_i64(b[c])
        cols["_val"] = pa.nulls(len(b), type=pa.int64())
        return pa.table(cols)

    def pad_map(b: pa.Table) -> pa.Table:
        cols = {"_key": pc_cast_i64(b["_mk"]),
                "_kind": pa.array(np.zeros(len(b), dtype=np.int8))}
        for c in payload_cols:
            cols[c] = pa.nulls(len(b), type=pa.int64())
        cols["_val"] = pc_cast_i64(b["_mv"])
        return pa.table(cols)

    def pc_cast_i64(col):
        import pyarrow.compute as pc

        return pc.cast(col, pa.int64())

    pay = payload_ds.map_batches(
        pad_payload, batch_format="pyarrow", zero_copy_batch=True
    )
    mp = map_ds.map_batches(
        pad_map, batch_format="pyarrow", zero_copy_batch=True
    )
    mixed = pay.union(mp)

    schema_cols = [(c, pa.int64()) for c in payload_cols]
    out_schema = pa.schema(schema_cols + [(out_col, pa.int64())])

    def part(tbl: pa.Table | None, starts: np.ndarray) -> pa.Table:
        if tbl is None or tbl.num_rows == 0:
            return out_schema.empty_table()
        kind = tbl["_kind"].to_numpy(zero_copy_only=False)
        key = tbl["_key"].to_numpy(zero_copy_only=False)
        # rows sorted by (_key) groups, kind 0 first within group
        starts = np.asarray(starts, dtype=np.int64)
        sizes = np.diff(np.append(starts, tbl.num_rows))
        gidx = np.repeat(np.arange(len(starts)), sizes)
        has_map = kind[starts] == 0
        val = tbl["_val"].to_numpy(zero_copy_only=False)
        gval = np.where(
            has_map,
            np.nan_to_num(val[starts], nan=0).astype(np.int64)
            if val.dtype.kind == "f"
            else val[starts],
            key[starts] if default_self else np.int64(-1),
        )
        if not default_self and not has_map.all():
            # every payload key must resolve (edge endpoints always
            # have labels)
            miss = np.flatnonzero(~has_map)
            if len(miss):
                raise KeyError(
                    f"_lookup_exchange: {len(miss)} keys unmapped"
                )
        sel = kind == 1
        cols = {
            c: tbl[c].filter(pa.array(sel)) for c in payload_cols
        }
        cols[out_col] = pa.array(gval[gidx[sel]])
        return pa.table(cols)

    from .shuffle import hash_group_apply

    return hash_group_apply(mixed, ["_key"], part,
                            sort_cols=("_kind",))


def _kruskal_local(tbl: pa.Table) -> pa.Table:
    """Exact Kruskal over a driver-resident canonical edge table
    (u < v, deduped) under the (w, u, v) total order — the
    measured-size fast path of :func:`msf_boruvka`. Array-backed
    union-find with path halving; the loop runs once per edge, which
    is why the caller gates it behind a row limit."""
    u = tbl["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = tbl["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    w = tbl["w"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((v, u, w))
    nodes, inv = np.unique(np.concatenate([u, v]),
                           return_inverse=True)
    ui = inv[: len(u)]
    vi = inv[len(u):]
    par = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        while par[x] != x:
            par[x] = par[par[x]]
            x = par[x]
        return x

    keep = np.zeros(len(u), dtype=bool)
    for i in order:
        a = find(ui[i])
        b = find(vi[i])
        if a != b:
            par[a] = b
            keep[i] = True
    return pa.table(
        {"u": pa.array(u[keep]), "v": pa.array(v[keep]),
         "w": pa.array(w[keep])}
    )


def _unionfind_minlabel(a: np.ndarray, b: np.ndarray):
    """Union-find over a small pair graph (component ids), resolving
    every touched id to the MINIMUM id in its connected group — the
    same canonical labelling the BSP ``connected_components`` path
    produces, so the two contraction strategies relabel identically.
    → (sorted keys, min-label values) arrays for searchsorted lookup."""
    nodes, inv = np.unique(np.concatenate([a, b]),
                           return_inverse=True)
    ai = inv[: len(a)]
    bi = inv[len(a):]
    par = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        while par[x] != x:
            par[x] = par[par[x]]
            x = par[x]
        return x

    for i in range(len(ai)):
        ra = find(ai[i])
        rb = find(bi[i])
        if ra != rb:
            par[ra] = rb
    roots = np.array([find(i) for i in range(len(nodes))],
                     dtype=np.int64)
    # min original label per root
    order = np.argsort(roots, kind="stable")
    rs = roots[order]
    ns = nodes[order]
    starts = np.ones(len(rs), dtype=bool)
    starts[1:] = rs[1:] != rs[:-1]
    seg = np.cumsum(starts) - 1
    minlab = np.minimum.reduceat(ns, np.flatnonzero(starts))
    vals = np.empty(len(nodes), dtype=np.int64)
    vals[order] = minlab[seg]
    return nodes, vals


def msf_boruvka(edges_ds, src: str = "u", dst: str = "v",
                w_col: str = "w", max_rounds: int = 64,
                driver_limit: int = 200_000):
    """Minimum spanning forest via distributed Borůvka — the
    single-linkage-clustering backbone (cut the forest at distance θ
    and components fall out) and the classic log-round BSP graph
    contraction. Edge order is totalized by (w, u, v) so the forest
    is UNIQUE even with duplicate weights.

    Measured-size switches (the ``equi_join`` broadcast-vs-coshuffle
    pattern): a canonical edge set under ``driver_limit`` rows is
    solved by one driver-side Kruskal pass (no per-round Dataset
    jobs at all — the fixed per-job cost would dominate a small
    graph by 100×); larger graphs run the BSP rounds, and within a
    round the component-pair contraction graph (``n_chosen`` rows,
    shrinks ≥ 2× per round so it is tiny after round 1) contracts
    driver-side with a broadcast min-label map once it fits,
    replacing a full ``connected_components`` BSP job plus a keyed
    relabel exchange with one broadcast ``map_batches``.

    Per BSP round (Dataset-native, no driver gather of graph-sized
    data):
      1. tag both endpoints with their component labels
         (``_lookup_exchange`` — keyed mixed-row exchanges);
      2. every component elects its minimum outgoing edge (keyed
         lexicographic-min reduce over ≤ 2·E candidate rows);
      3. elected edges dedup by (u, v) (an edge can win both sides)
         and join the forest — their block refs accumulate, the
         driver never holds rows;
      4. the component-pair graph of elected edges contracts
         (driver union-find when ≤ ``driver_limit`` rows, else
         ``text/cluster.connected_components``) and labels re-map
         (broadcast searchsorted map, or a ``default_self`` lookup
         exchange) — untouched components keep their labels.

    Rounds are ≤ log2(n) (Borůvka invariant); ``max_rounds`` is a
    runaway guard. → Dataset of forest edges (u, v, w)."""
    import ray
    import ray.data

    from ..text.cluster import connected_components
    from .shuffle import hash_group_apply

    def sym_nodes(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = pc.cast(b[src], pa.int64())
        v = pc.cast(b[dst], pa.int64())
        return pa.table({"node": pa.concat_arrays(
            [u.combine_chunks(), v.combine_chunks()]
        )})

    def first_per_group(tbl, starts):
        if tbl is None or tbl.num_rows == 0:
            return pa.table(
                {"_mk": pa.array([], type=pa.int64()),
                 "_mv": pa.array([], type=pa.int64())}
            )
        starts = np.asarray(starts, dtype=np.int64)
        nodes = tbl["node"].take(pa.array(starts))
        return pa.table({"_mk": nodes, "_mv": nodes})

    def dedup_edges(b: pa.Table) -> pa.Table:
        # canonical orientation u < v (both orientations of one edge
        # must be ONE row or each side could elect its own copy and
        # the forest would cycle); self-loops dropped
        u = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        w = b[w_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v, w = u[keep], v[keep], w[keep]
        a = np.minimum(u, v)
        bb = np.maximum(u, v)
        t = pa.table(
            {"u": pa.array(a), "v": pa.array(bb), "w": pa.array(w)}
        )
        return t.group_by(["u", "v", "w"], use_threads=False).aggregate(
            []
        )

    edges = edges_ds.map_batches(
        dedup_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    if edges.count() <= driver_limit:
        # measured-size fast path: the whole canonical edge set fits
        # on the driver — one Kruskal pass beats ~10 Dataset jobs per
        # BSP round on a graph this small by orders of magnitude
        local = pa.concat_tables(
            ray.get(edges.to_arrow_refs())
        ).combine_chunks()
        return ray.data.from_arrow(_kruskal_local(local))

    labels = hash_group_apply(
        edges_ds.map_batches(sym_nodes, batch_format="pyarrow",
                             zero_copy_batch=True),
        ["node"], first_per_group,
    ).materialize()

    forest_refs: list = []
    _EMPTY_MIN = pa.schema(
        [("u", pa.int64()), ("v", pa.int64()), ("w", pa.int64()),
         ("cu", pa.int64()), ("cv", pa.int64())]
    )

    for _round in range(max_rounds):
        e1 = _lookup_exchange(
            edges, labels, "u", ["u", "v", "w"], "cu"
        )
        e2 = _lookup_exchange(
            e1, labels, "v", ["u", "v", "w", "cu"], "cv"
        )

        def cand(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.not_equal(b["cu"], b["cv"])
            b = b.filter(keep)
            return pa.concat_tables(
                [
                    pa.table(
                        {
                            "comp": b["cu"], "w": b["w"],
                            "u": b["u"], "v": b["v"],
                            "cu": b["cu"], "cv": b["cv"],
                        }
                    ),
                    pa.table(
                        {
                            "comp": b["cv"], "w": b["w"],
                            "u": b["u"], "v": b["v"],
                            "cu": b["cu"], "cv": b["cv"],
                        }
                    ),
                ]
            )

        cands = e2.map_batches(
            cand, batch_format="pyarrow", zero_copy_batch=True
        )

        def min_part(tbl, starts):
            if tbl is None or tbl.num_rows == 0:
                return _EMPTY_MIN.empty_table()
            starts = np.asarray(starts, dtype=np.int64)
            # rows sorted by (w, u, v) within comp groups → firsts
            firsts = pa.array(starts)
            return pa.table(
                {
                    "u": tbl["u"].take(firsts),
                    "v": tbl["v"].take(firsts),
                    "w": tbl["w"].take(firsts),
                    "cu": tbl["cu"].take(firsts),
                    "cv": tbl["cv"].take(firsts),
                }
            )

        mins = hash_group_apply(
            cands, ["comp"], min_part, sort_cols=("w", "u", "v")
        )

        def dedup_part(tbl, starts):
            if tbl is None or tbl.num_rows == 0:
                return _EMPTY_MIN.empty_table()
            firsts = pa.array(np.asarray(starts, dtype=np.int64))
            return pa.table(
                {
                    "u": tbl["u"].take(firsts),
                    "v": tbl["v"].take(firsts),
                    "w": tbl["w"].take(firsts),
                    "cu": tbl["cu"].take(firsts),
                    "cv": tbl["cv"].take(firsts),
                }
            )

        chosen = hash_group_apply(
            mins, ["u", "v"], dedup_part
        ).materialize()
        n_chosen = chosen.count()
        if n_chosen == 0:
            break
        forest_refs.extend(chosen.to_arrow_refs())

        if n_chosen <= driver_limit:
            # the component-pair graph fits on the driver (it shrinks
            # ≥ 2× per round, so this is every round after the first
            # in practice): contract with local union-find and
            # relabel via ONE broadcast map_batches — replaces a full
            # connected_components BSP job + a keyed relabel exchange
            pairs = pa.concat_tables(
                ray.get(chosen.to_arrow_refs())
            )
            keys, vals = _unionfind_minlabel(
                pairs["cu"].to_numpy(zero_copy_only=False)
                .astype(np.int64),
                pairs["cv"].to_numpy(zero_copy_only=False)
                .astype(np.int64),
            )
            map_ref = ray.put((keys, vals))

            def relabel_bcast(b: pa.Table, _ref=map_ref) -> pa.Table:
                k, v2 = ray.get(_ref)
                mv = b["_mv"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(k, mv)
                pos_c = np.clip(pos, 0, max(len(k) - 1, 0))
                hit = (k[pos_c] == mv) if len(k) else np.zeros(
                    len(mv), dtype=bool
                )
                out = np.where(hit, v2[pos_c], mv)
                return pa.table(
                    {"_mk": b["_mk"], "_mv": pa.array(out)}
                )

            labels = labels.map_batches(
                relabel_bcast, batch_format="pyarrow",
                zero_copy_batch=True,
            ).materialize()
            continue

        pair_edges = chosen.map_batches(
            lambda b: pa.table({"a": b["cu"], "b": b["cv"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        ccmap = connected_components(pair_edges)
        if isinstance(ccmap, pa.Table):
            ccmap = ray.data.from_arrow(ccmap)
        ccmap = ccmap.map_batches(
            lambda b: pa.table(
                {"_mk": b["node"], "_mv": b["component"]}
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        lab_payload = labels.map_batches(
            lambda b: pa.table({"node": b["_mk"], "comp": b["_mv"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        # label update: comp → CC label when the comp appears in the
        # pair graph, else keep (default_self)
        relabeled = _lookup_exchange(
            lab_payload, ccmap, "comp", ["node"], "comp2",
            default_self=True,
        )
        labels = relabeled.map_batches(
            lambda b: pa.table({"_mk": b["node"], "_mv": b["comp2"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()
    else:
        raise RuntimeError("msf_boruvka: max_rounds exceeded")

    if not forest_refs:
        return ray.data.from_arrow(
            pa.schema(
                [("u", pa.int64()), ("v", pa.int64()),
                 ("w", pa.int64())]
            ).empty_table()
        )
    return ray.data.from_arrow_refs(forest_refs).map_batches(
        lambda b: b.select(["u", "v", "w"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
