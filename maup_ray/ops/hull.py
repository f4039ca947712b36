"""Distributed exact convex hull + diameter per group.

The hull is an ALGEBRAIC partial reduction — hull(A ∪ B) =
hull(hull(A) ∪ hull(B)) — so each block emits only its per-group hull
vertices (tiny: O(log m) expected for m uniform points in a convex
region) and the driver finishes on the concatenated partials. The
corpus never shuffles; only hull vertices move.

Per-block stage (all integer arithmetic, fully deterministic):
1. lexsort by (group, x, y, id); per exact coordinate keep the two
   smallest ids (``witness``/``witness2`` — needed so degenerate
   duplicate-coordinate groups report the same d2=0 pair the SQL
   oracle's lexicographic-min rule picks).
2. per (group, x) keep only the min-y and max-y rows — a hull vertex
   is always y-extreme among points sharing its exact x, and interior
   same-x points can never achieve the diameter (|p−q| is strictly
   convex along the vertical segment, so it is maximized only at the
   segment's endpoints).
3. Akl–Toussaint octagon prefilter per group: the eight extreme
   POINTS (arg-extremes of x, y, x+y, x−y — found with one lexsort
   per direction) are input points, so their convex polygon is
   contained in the hull; points strictly inside it (eight vectorized
   half-plane tests) are strictly inside the hull — drop them.
   NOTE: testing strict insidedness of the four coordinate SLABS
   (extreme VALUES) is WRONG — the slab intersection is a superset of
   the hull and the test drops genuine hull vertices (caught by
   tests/test_hull_pareto.py::test_hull_vertices_cover_brute_hull).
   For uniform data this leaves O(√m) survivors; adversarial inputs
   (all points on a circle) keep everything, which is inherent to the
   operator (every point IS a hull vertex).
4. Andrew monotone chain with STRICT turns (collinear mid-edge points
   dropped — they cannot be diameter endpoints by the same strict-
   convexity argument) over the survivors of each group.

Driver finish: re-dedup witnesses across blocks (global two smallest
ids per coordinate are computable from per-block (min, second-min)
pairs because row ids are globally unique), final monotone chain per
group, then an O(h²) exact-integer all-pairs max over hull vertices.
Diameter endpoints are always hull vertices, so the max and EVERY
achieving coordinate pair are visible; the reported (id_a, id_b) is
the lexicographic minimum over achieving id pairs, reconstructed from
witnesses — matching ``row_number() OVER (ORDER BY ia, ib)`` in SQL.

Exactness: coordinates are int64 (< 2^21 in the fixtures), so cross
products (< 2^43) and squared distances (< 2^42) are exact int64 —
the result matches the O(n²) SQL self-join oracle bit for bit.

Scale notes (100 TB): the driver holds Σ per-(block × group) hull
sizes. For near-worst-case inputs (huge fraction of points on one
convex curve) insert a tree-reduce level by re-running the partial
stage on the concatenated partials before the driver finish; the
fixture and any natural point cloud are far below that regime.

ref: reference has no hull operator; this extends the geospatial
family (assign/intersections/knn) with the classic reduce-side
geometric aggregate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["grouped_convex_hull", "grouped_hull_diameter"]


def _runs(*keys):
    """Start indices of runs of equal key tuples in presorted arrays."""
    n = len(keys[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in keys:
        change[1:] |= k[1:] != k[:-1]
    return np.flatnonzero(change)


def _monotone_chain(x, y):
    """Hull vertex indices (CCW, strict turns) of points presorted by
    (x, y) with distinct coordinates. Pure-int cross products."""
    n = len(x)
    if n <= 2:
        return list(range(n))
    # Python ints: cross products stay exact for ANY int64 coordinates
    # (the chain runs on tiny post-prefilter survivor sets).
    x = [int(v) for v in x]
    y = [int(v) for v in y]

    def build(order):
        st: list[int] = []
        for i in order:
            while len(st) >= 2:
                a, b = st[-2], st[-1]
                cross = (x[b] - x[a]) * (y[i] - y[a]) - (
                    y[b] - y[a]
                ) * (x[i] - x[a])
                if cross <= 0:  # strict turns: drop collinear
                    st.pop()
                else:
                    break
            st.append(i)
        return st

    lower = build(range(n))
    upper = build(range(n - 1, -1, -1))
    return lower[:-1] + upper[:-1]


def _inside_extreme_octagon(g, x, y):
    """Strict-insidedness of each point w.r.t. the convex polygon of
    its group's eight extreme points (arg-min/max of x, y, x+y, x−y).
    Arrays must be presorted by (g, x, y). The vectorized int64 cross
    products are exact only while coordinate magnitudes stay below
    2^30 (delta < 2^31, product < 2^62, sum < 2^63); larger inputs
    skip the filter entirely — correct, just slower downstream (the
    exact Python-int monotone chain still runs on everything)."""
    n = len(g)
    inside = np.zeros(n, dtype=bool)
    if n == 0:
        return inside
    mag = max(int(np.max(np.abs(x))), int(np.max(np.abs(y))))
    if mag >= (1 << 30):
        return inside

    gs = _runs(g)
    ends = np.append(gs[1:], n)
    seg = np.zeros(n, dtype=np.int64)
    seg[gs] = 1
    seg = np.cumsum(seg) - 1  # group ordinal per row
    n_groups = len(gs)

    def seg_extremes(key):
        order = np.lexsort((y, x, key, g))
        gg = g[order]
        st = _runs(gg)
        en = np.append(st[1:], n) - 1
        return order[st], order[en]

    i_minx, i_maxx = gs, ends - 1  # rows already sorted by (g, x, y)
    i_miny, i_maxy = seg_extremes(y)
    i_mins, i_maxs = seg_extremes(x + y)
    i_mind, i_maxd = seg_extremes(x - y)

    # per-group mini-hull (≤ 8 candidate points) → 8 cyclic edge slots
    cand = np.stack(
        [i_minx, i_mins, i_miny, i_maxd, i_maxx, i_maxs, i_maxy, i_mind],
        axis=1,
    )
    ax = np.empty((n_groups, 8), dtype=np.int64)
    ay = np.empty((n_groups, 8), dtype=np.int64)
    bx = np.empty((n_groups, 8), dtype=np.int64)
    by = np.empty((n_groups, 8), dtype=np.int64)
    degenerate = np.zeros(n_groups, dtype=bool)
    for gi in range(n_groups):
        cs = np.unique(cand[gi])
        cxs, cys = x[cs], y[cs]
        o = np.lexsort((cys, cxs))
        hull_idx = _monotone_chain(cxs[o], cys[o])
        k = len(hull_idx)
        if k < 3:
            degenerate[gi] = True
            continue
        hx = cxs[o][hull_idx]
        hy = cys[o][hull_idx]
        for t in range(8):
            ax[gi, t] = hx[t % k]
            ay[gi, t] = hy[t % k]
            bx[gi, t] = hx[(t + 1) % k]
            by[gi, t] = hy[(t + 1) % k]

    inside = ~degenerate[seg]
    for t in range(8):
        m = inside
        if not m.any():
            break
        cross = (bx[seg, t] - ax[seg, t]) * (y - ay[seg, t]) - (
            by[seg, t] - ay[seg, t]
        ) * (x - ax[seg, t])
        inside = m & (cross > 0)
    return inside


def _dedup_witness(g, x, y, ids):
    """Per exact (g, x, y): keep one row carrying the two smallest ids
    (witness, witness2; witness2 = -1 when the coordinate is unique).
    Arrays must be presorted by (g, x, y, id)."""
    starts = _runs(g, x, y)
    w2 = np.full(len(starts), -1, dtype=np.int64)
    n = len(g)
    ends = np.append(starts[1:], n)
    has2 = ends - starts >= 2
    w2[has2] = ids[starts[has2] + 1]
    return starts, ids[starts], w2


def _partial_hull(g, x, y, ids, w2=None):
    """One reduction round: (g, x, y, id[, witness2]) rows →
    per-group hull-vertex rows with merged witnesses."""
    order = np.lexsort((ids, y, x, g))
    g, x, y, ids = g[order], x[order], y[order], ids[order]
    w2in = w2[order] if w2 is not None else None

    starts, w1, w2out = _dedup_witness(g, x, y, ids)
    if w2in is not None:
        # merge incoming second witnesses across duplicate partials
        ends = np.append(starts[1:], len(g))
        for j, (s, e) in enumerate(zip(starts, ends)):
            if e - s >= 2 or (w2in[s:e] >= 0).any():
                cand = np.concatenate([ids[s:e], w2in[s:e]])
                cand = np.sort(cand[cand >= 0])
                w1[j] = cand[0]
                w2out[j] = cand[1] if len(cand) >= 2 else -1
    g, x, y = g[starts], x[starts], y[starts]

    # per (g, x): min-y and max-y rows only
    col = _runs(g, x)
    col_end = np.append(col[1:], len(g)) - 1
    keep = np.zeros(len(g), dtype=bool)
    keep[col] = True
    keep[col_end] = True
    g, x, y, w1, w2out = g[keep], x[keep], y[keep], w1[keep], w2out[keep]

    # Akl–Toussaint octagon prefilter per group: drop points strictly
    # inside the convex polygon of the eight extreme POINTS (which are
    # input points, hence the polygon ⊆ hull).
    keep = ~_inside_extreme_octagon(g, x, y)
    g, x, y, w1, w2out = g[keep], x[keep], y[keep], w1[keep], w2out[keep]

    # monotone chain per group (survivors stay (x, y)-sorted per group)
    gs = _runs(g)
    ends = np.append(gs[1:], len(g))
    out_idx: list[int] = []
    for a, b in zip(gs, ends):
        xs = x[a:b]
        ys = y[a:b]
        out_idx.extend(a + i for i in _monotone_chain(xs, ys))
    idx = np.asarray(out_idx, dtype=np.int64)
    return g[idx], x[idx], y[idx], w1[idx], w2out[idx]


_PARTIAL_SCHEMA = pa.schema(
    [
        ("grp", pa.int64()),
        ("x", pa.int64()),
        ("y", pa.int64()),
        ("witness", pa.int64()),
        ("witness2", pa.int64()),
    ]
)


def _hull_partials(ds, group_col, id_col, x_col, y_col):
    def stage(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(g) == 0:
            return _PARTIAL_SCHEMA.empty_table()
        go, xo, yo, w1, w2 = _partial_hull(g, x, y, ids)
        return pa.table(
            {"grp": go, "x": xo, "y": yo, "witness": w1, "witness2": w2},
            schema=_PARTIAL_SCHEMA,
        )

    import ray

    parts = ds.map_batches(
        stage, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return _PARTIAL_SCHEMA.empty_table()
    return pa.concat_tables(tabs).combine_chunks()


def _final_hull(t: pa.Table):
    """Driver finish over concatenated partials → per-group arrays."""
    g = t["grp"].to_numpy(zero_copy_only=False)
    x = t["x"].to_numpy(zero_copy_only=False)
    y = t["y"].to_numpy(zero_copy_only=False)
    w1 = t["witness"].to_numpy(zero_copy_only=False)
    w2 = t["witness2"].to_numpy(zero_copy_only=False)
    return _partial_hull(g, x, y, w1, w2)


def grouped_convex_hull(
    ds, group_col="grp", id_col="id", x_col="x", y_col="y"
) -> pa.Table:
    """Per-group convex hull vertices (CCW per group not guaranteed —
    vertices are reported in (x, y) sort order) with min-id witnesses."""
    g, x, y, w1, _ = _final_hull(
        _hull_partials(ds, group_col, id_col, x_col, y_col)
    )
    return pa.table(
        {
            "grp": pa.array(g, type=pa.int64()),
            "x": pa.array(x, type=pa.int64()),
            "y": pa.array(y, type=pa.int64()),
            "id": pa.array(w1, type=pa.int64()),
        }
    )


def grouped_hull_diameter(
    ds, group_col="grp", id_col="id", x_col="x", y_col="y"
) -> pa.Table:
    """Exact per-group diameter: (grp, diam2, id_a, id_b) where diam2
    is the max squared distance over all point pairs of the group and
    (id_a, id_b) is the lexicographically smallest achieving id pair
    (id_a < id_b). Groups with fewer than two rows are omitted."""
    g, x, y, w1, w2 = _final_hull(
        _hull_partials(ds, group_col, id_col, x_col, y_col)
    )
    out = {"grp": [], "diam2": [], "id_a": [], "id_b": []}
    gs = _runs(g)
    ends = np.append(gs[1:], len(g))
    for a, b in zip(gs, ends):
        xs = x[a:b].astype(object)  # object ints: no silent overflow
        ys = y[a:b].astype(object)
        if b - a == 1:
            # single distinct coordinate: pairs exist iff duplicated
            if w2[a] >= 0:
                out["grp"].append(int(g[a]))
                out["diam2"].append(0)
                out["id_a"].append(int(w1[a]))
                out["id_b"].append(int(w2[a]))
            continue
        dx = xs[:, None] - xs[None, :]
        dy = ys[:, None] - ys[None, :]
        d2 = dx * dx + dy * dy
        md = d2.max()
        ii, jj = np.nonzero(d2 == md)
        best = None
        for i, j in zip(ii, jj):
            if i >= j:
                continue
            pair = (
                min(w1[a + i], w1[a + j]),
                max(w1[a + i], w1[a + j]),
            )
            if best is None or pair < best:
                best = pair
        out["grp"].append(int(g[a]))
        out["diam2"].append(int(md))
        out["id_a"].append(int(best[0]))
        out["id_b"].append(int(best[1]))
    return pa.table(
        {
            "grp": pa.array(out["grp"], type=pa.int64()),
            "diam2": pa.array(out["diam2"], type=pa.int64()),
            "id_a": pa.array(out["id_a"], type=pa.int64()),
            "id_b": pa.array(out["id_b"], type=pa.int64()),
        }
    )
