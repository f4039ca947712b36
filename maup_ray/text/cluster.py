"""Near-duplicate CLUSTERING — the step a training-data dedup pipeline
runs after candidate generation: exact word-shingle Jaccard pairing,
connected components over the qualifying pairs, and a canonical
representative per component (min id — the "keep first" rule).

Everything is expressed in scale shape:

* shingling is one vectorized pass per batch (polars xxhash of the
  word stream + a wrapping polynomial combine of k consecutive word
  hashes — no shingle strings are ever materialized engine-side),
* pair generation is a hash-partitioned grouped apply keyed on the
  shingle (ops.shuffle.hash_group_apply — every shared-shingle group
  lands in one partition, one vectorized all-pairs emission per
  partition), optionally df-capped: at real scale a shingle shared by
  thousands of documents is a stop-phrase, emits O(df²) pairs, and
  carries no dedup signal — ``df_cap`` drops those groups, exactly
  the rare-feature-join discipline of large dedup systems,
* intersection counts are a second keyed shuffle on the (a, b) pair —
  24 B/row, text never moves,
* components run as iterative min-label propagation (one keyed
  shuffle per round, converging in component-diameter rounds — small
  for dup clusters) rather than any driver-side union-find.

Jaccard is computed from exact distinct-shingle counts as
float64 ``c / (na + nb - c)`` — the same IEEE arithmetic DuckDB uses,
so the SQL oracle (word-shingle strings + recursive-CTE closure)
matches value-for-value. The reference has no near-dup machinery
(SURVEY.md §2.2 "Set ops / dedup … No near-dup"); this family is the
beyond-reference LLM-data layer (driver instruction).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..ops.shuffle import hash_group_apply

__all__ = [
    "shingle_doc_rows",
    "near_dup_pairs",
    "connected_components",
    "near_dup_components",
]

_P = np.uint64(0x100000001B3)  # FNV-ish odd multiplier (wrapping)


def _word_hashes(texts: pa.Array):
    """texts → (flat word-hash u64 array, per-doc word counts)."""
    import polars as pl
    import pyarrow.compute as pc

    words = pc.split_pattern(texts, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    off = np.asarray(words.offsets)
    wh = (
        pl.from_arrow(flat).hash(seed=0).to_numpy().astype(np.uint64)
    )
    return wh, np.diff(off), off[:-1]


def shingle_doc_rows(
    batch: pa.Table,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """One vectorized pass: batch → DISTINCT (doc, shingle-hash) rows
    with the doc's distinct-shingle count ``ns`` replicated per row
    (so the pair stage needs no extra join — +8 B/row, cheap at any
    scale next to the pair shuffle itself).

    Valid because the synth/driver tables never split one document
    across rows: per-batch distinct IS global distinct per doc.
    """
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    wh, nw, starts = _word_hashes(texts)
    nsh = np.maximum(nw - k + 1, 0)
    tot = int(nsh.sum())
    n = len(batch)
    doc_idx = np.repeat(np.arange(n), nsh)
    within = np.arange(tot) - np.repeat(
        np.concatenate([[0], np.cumsum(nsh)[:-1]]), nsh
    )
    idx0 = np.repeat(starts, nsh) + within
    sh = np.zeros(tot, dtype=np.uint64)
    for j in range(k):
        sh = sh * _P + wh[idx0 + j]
    # distinct (doc, shingle)
    order = np.lexsort((sh, doc_idx))
    d_s, s_s = doc_idx[order], sh[order]
    keep = np.ones(tot, dtype=bool)
    keep[1:] = (d_s[1:] != d_s[:-1]) | (s_s[1:] != s_s[:-1])
    d_u, s_u = d_s[keep], s_s[keep]
    ns = np.bincount(d_u, minlength=n)
    ids = batch[id_col].to_numpy()
    return pa.table(
        {
            "shingle": pa.array(s_u.view(np.int64)),
            "doc": pa.array(ids[d_u]),
            "ns": pa.array(ns[d_u]),
        }
    )


def _emit_pairs(tbl: pa.Table, starts: np.ndarray, df_cap) -> pa.Table:
    """Per shingle-partition: all (a < b) doc pairs of each shingle
    group, vectorized across the whole partition."""
    empty = pa.table(
        {
            "a": pa.array([], type=pa.int64()),
            "b": pa.array([], type=pa.int64()),
            "na": pa.array([], type=pa.int64()),
            "nb": pa.array([], type=pa.int64()),
        }
    )
    if tbl.num_rows == 0:
        return empty
    d = tbl["doc"].to_numpy()
    ns = tbl["ns"].to_numpy()
    sizes = np.diff(np.concatenate([starts, [tbl.num_rows]]))
    if df_cap is not None:
        ok = sizes <= df_cap
    else:
        ok = np.ones(len(sizes), dtype=bool)
    npairs = (sizes * (sizes - 1)) // 2 * ok
    tot = int(npairs.sum())
    if tot == 0:
        return empty
    # rows of one group are sorted by doc (sort_cols): for group g and
    # local pair index p with i = row of the larger element, classic
    # triangular unranking — vectorized via cumulative offsets
    g_of = np.repeat(np.arange(len(sizes)), npairs)
    p_in = np.arange(tot) - np.repeat(
        np.concatenate([[0], np.cumsum(npairs)[:-1]]), npairs
    )
    # i = index of second element: find smallest i with i(i-1)/2 > p
    i_loc = ((1.0 + np.sqrt(1.0 + 8.0 * p_in)) / 2.0).astype(np.int64)
    # float guard: adjust off-by-one from sqrt rounding
    tri = i_loc * (i_loc - 1) // 2
    too_big = tri > p_in
    i_loc -= too_big
    tri = i_loc * (i_loc - 1) // 2
    j_loc = p_in - tri
    base = np.repeat(starts, npairs)
    ia = base + j_loc
    ib = base + i_loc
    return pa.table(
        {
            "a": pa.array(d[ia]),
            "b": pa.array(d[ib]),
            "na": pa.array(ns[ia]),
            "nb": pa.array(ns[ib]),
        }
    )


def _pair_filter(threshold: float):
    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
                "jaccard": pa.array([], type=pa.float64()),
            }
        )
        if tbl.num_rows == 0:
            return empty
        c = np.diff(
            np.concatenate([starts, [tbl.num_rows]])
        ).astype(np.float64)
        a = tbl["a"].to_numpy()[starts]
        b = tbl["b"].to_numpy()[starts]
        na = tbl["na"].to_numpy()[starts].astype(np.float64)
        nb = tbl["nb"].to_numpy()[starts].astype(np.float64)
        j = c / (na + nb - c)  # same IEEE double expr as the oracle
        keep = j >= threshold
        return pa.table(
            {
                "a": pa.array(a[keep]),
                "b": pa.array(b[keep]),
                "jaccard": pa.array(j[keep]),
            }
        )

    return fn


def near_dup_pairs(
    ds,
    k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_cap: int | None = None,
    num_partitions: int | None = None,
):
    """(a, b, jaccard) for all document pairs whose exact word-k-shingle
    Jaccard ≥ threshold, candidates = pairs sharing ≥1 shingle (with
    df ≤ df_cap when given). Returns a Dataset."""
    rows = ds.map_batches(
        lambda b: shingle_doc_rows(b, k, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = hash_group_apply(
        rows,
        ["shingle"],
        lambda t, s: _emit_pairs(t, s, df_cap),
        sort_cols=("doc",),
        num_partitions=num_partitions,
    )
    return hash_group_apply(
        pairs,
        ["a", "b"],
        _pair_filter(threshold),
        num_partitions=num_partitions,
    )


# ------------------------------------------------------------------
# connected components — BSP min-label propagation over raw Ray tasks
#
# The Dataset API can't express "static table, iterated exchange":
# a Dataset loop re-shuffles the edge list every round. Here edges
# are hash-partitioned by node ONCE into object-store-resident
# partitions; each round moves ONLY label messages (16 B each), and
# only from nodes whose label improved last round (delta
# propagation), so total traffic is O(E · diameter-of-changed-front),
# not O(E · rounds). Convergence is decided from P tiny ints per
# round — no driver materialization of nodes or labels at any point.


def _cc_init(tbl: pa.Table) -> pa.Table:
    """Partition-local init: distinct nodes, label = self, all
    flagged changed so round 1 sends every edge's message."""
    node = np.unique(tbl["node"].to_numpy()) if tbl.num_rows else (
        np.empty(0, dtype=np.int64)
    )
    return pa.table(
        {
            "node": pa.array(node, type=pa.int64()),
            "label": pa.array(node, type=pa.int64()),
            "ch": pa.array(np.ones(len(node), dtype=np.int8)),
        }
    )


def _cc_messages(edges: pa.Table, labels: pa.Table, P: int):
    """One map task: for edges whose SOURCE node changed last round,
    emit (dest=nbr, label) messages, hash-split by dest into P parts.
    Sources of a partition's edges are exactly its label nodes (both
    edge directions are stored), so the lookup is partition-local."""
    from ..ops.shuffle import _split_block

    empty = pa.table(
        {
            "node": pa.array([], type=pa.int64()),
            "label": pa.array([], type=pa.int64()),
        }
    )
    if edges.num_rows == 0 or labels.num_rows == 0:
        return [empty] * P if P > 1 else empty
    lnode = labels["node"].to_numpy()  # sorted (np.unique at init,
    lbl = labels["label"].to_numpy()   # order preserved by _cc_reduce)
    ch = labels["ch"].to_numpy()
    src = edges["node"].to_numpy()
    pos = np.searchsorted(lnode, src)
    send = ch[pos] == 1
    if not send.any():
        return [empty] * P if P > 1 else empty
    msgs = pa.table(
        {
            "node": pa.array(edges["nbr"].to_numpy()[send]),
            "label": pa.array(lbl[pos[send]]),
        }
    )
    return _split_block(msgs, ["node"], P)


def _cc_reduce(labels: pa.Table, *msg_tabs):
    """One reduce task: fold this partition's incoming messages into
    its label table; returns (new labels, #nodes whose label fell)."""
    nonempty = [t for t in msg_tabs if t is not None and t.num_rows]
    if labels.num_rows == 0 or not nonempty:
        n = labels.num_rows
        return (
            pa.table(
                {
                    "node": labels["node"],
                    "label": labels["label"],
                    "ch": pa.array(np.zeros(n, dtype=np.int8)),
                }
            ),
            0,
        )
    msgs = (
        nonempty[0] if len(nonempty) == 1 else pa.concat_tables(nonempty)
    )
    lnode = labels["node"].to_numpy()
    lbl = labels["label"].to_numpy().copy()
    pos = np.searchsorted(lnode, msgs["node"].to_numpy())
    np.minimum.at(lbl, pos, msgs["label"].to_numpy())
    ch = lbl < labels["label"].to_numpy()
    return (
        pa.table(
            {
                "node": pa.array(lnode),
                "label": pa.array(lbl),
                "ch": pa.array(ch.astype(np.int8)),
            }
        ),
        int(ch.sum()),
    )


def local_components(a, b) -> pa.Table:
    """Driver-side union-find over a SMALL edge list (int node codes)
    -> (node, component) with component = min reachable node, the same
    contract as connected_components. The scale-adaptive twin: callers
    whose edge table is already local and tiny (e.g. image near-dup
    reps after exact-class reduction) should not pay the BSP rounds'
    fixed per-job latency just to label a few hundred edges."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(nodes, a)
    cb = np.searchsorted(nodes, b)
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for u, v in zip(ca.tolist(), cb.tolist()):
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by smaller root keeps roots = small indices, and
            # nodes are processed in sorted order below anyway
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    roots = np.array([find(i) for i in range(len(nodes))])
    # component label = min node id in the component; nodes sorted
    # ascending → the root's own node id is NOT necessarily the min,
    # so reduce explicitly
    lab = np.full(len(nodes), np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(lab, roots, nodes)
    return pa.table(
        {
            "node": pa.array(nodes),
            "component": pa.array(lab[roots]),
        }
    )


def connected_components(
    edges,
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 50,
    num_partitions: int | None = None,
    local_threshold: int = 400_000,
):
    """(node, component) for every node of the undirected edge list;
    component = min node id reachable (so the component id IS the
    canonical "keep-first" representative). Round count = max
    component diameter (dup clusters are shallow)."""
    import pyarrow.compute as pc
    import ray
    import ray.data

    from ..ops.shuffle import _split_block

    def to_msgs(b: pa.Table) -> pa.Table:
        a = b[a_col]
        bb = b[b_col]
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [pc.cast(a, pa.int64()).combine_chunks(),
                     pc.cast(bb, pa.int64()).combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [pc.cast(bb, pa.int64()).combine_chunks(),
                     pc.cast(a, pa.int64()).combine_chunks()]
                ),
            }
        )

    directed = edges.map_batches(
        to_msgs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    blocks = directed.to_arrow_refs()
    _empty_lbl = pa.table(
        {
            "node": pa.array([], type=pa.int64()),
            "label": pa.array([], type=pa.int64()),
        }
    )
    if not blocks:
        return ray.data.from_arrow(_empty_lbl).rename_columns(
            ["node", "component"]
        )
    # scale-adaptive: dup graphs are usually SPARSE relative to the
    # corpus — when the (already materialized) message table is tiny,
    # a driver union-find beats paying the BSP rounds' fixed per-job
    # latency x diameter (the directed table is 2 rows/edge, so this
    # gate is <= local_threshold/2 edges / a few MB on the driver;
    # pass local_threshold=0 to force the BSP rounds)
    if directed.count() <= local_threshold:
        msgs = pa.concat_tables(
            [t for t in ray.get(blocks) if t.num_columns]
        )
        return ray.data.from_arrow(
            local_components(
                msgs["node"].to_numpy(zero_copy_only=False),
                msgs["nbr"].to_numpy(zero_copy_only=False),
            )
        )
    if num_partitions is None:
        num_partitions = max(
            2, int(ray.cluster_resources().get("CPU", 8)) * 2
        )
    P = int(num_partitions)

    # partition the (static) directed edges ONCE
    split = ray.remote(num_returns=P)(_split_block) if P > 1 else (
        ray.remote(_split_block)
    )
    parts = [split.remote(b, ["node"], P) for b in blocks]
    if P == 1:
        parts = [[p] for p in parts]

    def _concat(*tabs):
        ts = [t for t in tabs if t.num_rows]
        if not ts:
            return tabs[0]
        return pa.concat_tables(ts).combine_chunks()

    concat = ray.remote(_concat)
    edges_p = [concat.remote(*[p[i] for p in parts]) for i in range(P)]
    init = ray.remote(_cc_init)
    labels_p = [init.remote(e) for e in edges_p]

    step_map = ray.remote(num_returns=P)(_cc_messages) if P > 1 else (
        ray.remote(_cc_messages)
    )
    step_reduce = ray.remote(num_returns=2)(_cc_reduce)
    for _ in range(max_iters):
        msgs = [
            step_map.remote(edges_p[i], labels_p[i], P) for i in range(P)
        ]
        if P == 1:
            msgs = [[m] for m in msgs]
        stepped = [
            step_reduce.remote(labels_p[q], *[msgs[p][q] for p in range(P)])
            for q in range(P)
        ]
        labels_p = [s[0] for s in stepped]
        if sum(ray.get([s[1] for s in stepped])) == 0:
            break

    strip = ray.remote(
        lambda t: t.drop_columns(["ch"]) if t.num_rows else _empty_lbl
    )
    return ray.data.from_arrow_refs(
        [strip.remote(l) for l in labels_p]
    ).rename_columns(["node", "component"])


def near_dup_components(
    ds,
    k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_cap: int | None = None,
):
    """Full pipeline: shingle → pair → Jaccard filter → components.
    Output (doc_id, component_id), one row per document that has at
    least one qualifying near-duplicate, component_id = min doc_id of
    the cluster (the canonical keeper)."""
    edges = near_dup_pairs(
        ds, k, threshold, id_col, text_col, df_cap
    )
    comp = connected_components(edges)
    return comp.rename_columns(["doc_id", "component_id"])
