"""ops/hull + ops/pareto + ops/temporal.interval_overlap_join —
brute-force oracles, degenerate inputs, partition invariance."""

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.ops.hull import grouped_convex_hull, grouped_hull_diameter
from maup_ray.ops.pareto import pareto_front
from maup_ray.ops.temporal import interval_overlap_join


def _collect(ds):
    import ray

    if isinstance(ds, pa.Table):
        return ds
    tabs = [ray.get(r) for r in ds.materialize().to_arrow_refs()]
    tabs = [t for t in tabs if t.num_rows] or tabs[:1]
    return pa.concat_tables(tabs)


# ----------------------------------------------------------- hull


def _brute_diameter(g, x, y, ids):
    """O(n²) python-int oracle: per group max d2 + lexicographic-min
    achieving id pair."""
    out = {}
    for grp in sorted(set(g.tolist())):
        m = g == grp
        gx, gy, gi = x[m], y[m], ids[m]
        n = len(gx)
        if n < 2:
            continue
        best = None
        for i in range(n):
            for j in range(i + 1, n):
                d2 = int(gx[i] - gx[j]) ** 2 + int(gy[i] - gy[j]) ** 2
                pair = (min(gi[i], gi[j]), max(gi[i], gi[j]))
                key = (-d2, pair)
                if best is None or key < best:
                    best = key
        out[grp] = (-best[0], best[1][0], best[1][1])
    return out


def _diam_rows(t):
    return {
        int(r["grp"]): (int(r["diam2"]), int(r["id_a"]), int(r["id_b"]))
        for r in t.to_pylist()
    }


def _pts_table(g, x, y, ids):
    return pa.table(
        {
            "grp": pa.array(np.asarray(g, dtype=np.int64)),
            "id": pa.array(np.asarray(ids, dtype=np.int64)),
            "x": pa.array(np.asarray(x, dtype=np.int64)),
            "y": pa.array(np.asarray(y, dtype=np.int64)),
        }
    )


class TestHullDiameter:
    @pytest.mark.parametrize("n_blocks", [1, 7])
    def test_matches_brute_force(self, ray_session, n_blocks):
        import ray.data

        rng = np.random.RandomState(7)
        n = 400
        g = rng.randint(0, 5, n)
        x = rng.randint(0, 1 << 20, n)
        y = rng.randint(0, 1 << 20, n)
        ids = np.arange(n, dtype=np.int64)
        want = _brute_diameter(g, x, y, ids)
        ds = ray.data.from_arrow(_pts_table(g, x, y, ids)).repartition(
            n_blocks
        )
        got = _diam_rows(grouped_hull_diameter(ds))
        assert got == want

    def test_duplicates_and_collinear(self, ray_session):
        import ray.data

        # group 0: all points identical (diam2 = 0, two smallest ids)
        # group 1: collinear points (diameter = segment endpoints)
        # group 2: duplicated diameter endpoints → lexicographic-min
        #          pair must use the duplicate witnesses
        g = [0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2]
        x = [5, 5, 5, 0, 3, 7, 9, 0, 0, 10, 10]
        y = [5, 5, 5, 0, 3, 7, 9, 0, 0, 0, 0]
        ids = [30, 10, 20, 1, 2, 3, 4, 12, 11, 14, 13]
        t = _pts_table(g, x, y, ids)
        want = _brute_diameter(
            np.asarray(g), np.asarray(x), np.asarray(y),
            np.asarray(ids),
        )
        got = _diam_rows(grouped_hull_diameter(t_to_ds(t, 3)))
        assert got == want
        assert got[0] == (0, 10, 20)
        assert got[2] == (100, 11, 13)

    def test_single_row_group_omitted(self, ray_session):
        t = _pts_table([0, 1, 1], [1, 0, 5], [1, 0, 5], [9, 1, 2])
        got = _diam_rows(grouped_hull_diameter(t_to_ds(t, 1)))
        assert got == {1: (50, 1, 2)}

    def test_hull_vertices_cover_brute_hull(self, ray_session):
        rng = np.random.RandomState(3)
        n = 300
        g = np.zeros(n, dtype=np.int64)
        x = rng.randint(0, 1000, n)
        y = rng.randint(0, 1000, n)
        ids = np.arange(n, dtype=np.int64)
        hull = grouped_convex_hull(t_to_ds(_pts_table(g, x, y, ids), 4))
        hx = hull["x"].to_numpy()
        hy = hull["y"].to_numpy()
        # every input point must lie inside the reported hull: check
        # via cross products against the CCW boundary of the hull set
        verts = _ccw_hull(hx, hy)
        for px, py in zip(x, y):
            assert _inside(verts, int(px), int(py))


    def test_huge_coordinates_skip_prefilter(self, ray_session):
        # magnitudes ≥ 2^30 disable the vectorized octagon filter;
        # the exact Python-int chain must still give the right answer
        rng = np.random.RandomState(9)
        n = 80
        base = 1 << 40
        g = np.zeros(n, dtype=np.int64)
        x = base + rng.randint(0, 500, n)
        y = base + rng.randint(0, 500, n)
        ids = np.arange(n, dtype=np.int64)
        want = _brute_diameter(g, x, y, ids)
        got = _diam_rows(
            grouped_hull_diameter(t_to_ds(_pts_table(g, x, y, ids), 3))
        )
        assert got == want


def t_to_ds(t: pa.Table, n_blocks: int):
    import ray.data

    return ray.data.from_arrow(t).repartition(n_blocks)


def _ccw_hull(x, y):
    pts = sorted(set(zip(x.tolist(), y.tolist())))
    if len(pts) <= 2:
        return pts

    def half(seq):
        st = []
        for p in seq:
            while len(st) >= 2 and (
                (st[-1][0] - st[-2][0]) * (p[1] - st[-2][1])
                - (st[-1][1] - st[-2][1]) * (p[0] - st[-2][0])
            ) <= 0:
                st.pop()
            st.append(p)
        return st

    lo = half(pts)
    hi = half(pts[::-1])
    return lo[:-1] + hi[:-1]


def _inside(verts, px, py):
    n = len(verts)
    if n == 1:
        return (px, py) == verts[0]
    if n == 2:
        (x0, y0), (x1, y1) = verts
        cr = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
        if cr != 0:
            return False
        return min(x0, x1) <= px <= max(x0, x1) and min(
            y0, y1
        ) <= py <= max(y0, y1)
    for i in range(n):
        x0, y0 = verts[i]
        x1, y1 = verts[(i + 1) % n]
        if (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0) < 0:
            return False
    return True


# ----------------------------------------------------------- pareto


def _brute_front(ids, d1, d2):
    keep = []
    for i in range(len(ids)):
        dominated = False
        for j in range(len(ids)):
            if (
                d1[j] >= d1[i]
                and d2[j] >= d2[i]
                and (d1[j] > d1[i] or d2[j] > d2[i])
            ):
                dominated = True
                break
        if not dominated:
            keep.append(i)
    rows = sorted(
        ((int(d1[i]), int(d2[i]), int(ids[i])) for i in keep),
        key=lambda r: (-r[0], -r[1], r[2]),
    )
    return rows


class TestPareto:
    @pytest.mark.parametrize("n_blocks", [1, 9])
    def test_matches_brute_force(self, ray_session, n_blocks):
        rng = np.random.RandomState(11)
        n = 600
        ids = np.arange(n, dtype=np.int64)
        d1 = rng.randint(0, 50, n)  # many d1 ties
        d2 = rng.randint(0, 10**6, n)
        t = pa.table(
            {
                "id": pa.array(ids),
                "d1": pa.array(d1.astype(np.int64)),
                "d2": pa.array(d2.astype(np.int64)),
            }
        )
        want = _brute_front(ids, d1, d2)
        got = pareto_front(t_to_ds(t, n_blocks))
        rows = [
            (int(r["d1"]), int(r["d2"]), int(r["id"]))
            for r in got.to_pylist()
        ]
        assert rows == want

    def test_exact_duplicates_all_kept(self, ray_session):
        t = pa.table(
            {
                "id": pa.array([3, 1, 2, 4], type=pa.int64()),
                "d1": pa.array([5, 5, 5, 1], type=pa.int64()),
                "d2": pa.array([9, 9, 9, 0], type=pa.int64()),
            }
        )
        got = pareto_front(t)
        assert got["id"].to_pylist() == [1, 2, 3]

    def test_table_input_equals_dataset(self, ray_session):
        rng = np.random.RandomState(2)
        t = pa.table(
            {
                "id": pa.array(np.arange(100, dtype=np.int64)),
                "d1": pa.array(
                    rng.randint(0, 20, 100).astype(np.int64)
                ),
                "d2": pa.array(
                    rng.randint(0, 20, 100).astype(np.int64)
                ),
            }
        )
        a = pareto_front(t)
        b = pareto_front(t_to_ds(t, 5))
        assert a.equals(b)


# ------------------------------------------- interval overlap join


def _brute_pairs(ids, s, e):
    out = {}
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if s[i] < e[j] and s[j] < e[i] and e[i] > s[i] and e[j] > s[j]:
                a, b = sorted((int(ids[i]), int(ids[j])))
                out[(a, b)] = int(
                    min(e[i], e[j]) - max(s[i], s[j])
                )
    return out


def _pair_rows(ds):
    t = _collect(ds)
    return {
        (int(r["id_a"]), int(r["id_b"])): int(r["overlap_us"])
        for r in t.to_pylist()
    }


class TestIntervalOverlapJoin:
    @pytest.mark.parametrize("n_blocks", [1, 6])
    def test_matches_brute_force(self, ray_session, n_blocks):
        rng = np.random.RandomState(5)
        n = 300
        ids = np.arange(n, dtype=np.int64)
        s = rng.randint(0, 20_000, n).astype(np.int64)
        ln = rng.randint(0, 1000, n).astype(np.int64)  # incl. zero-len
        e = s + ln
        want = _brute_pairs(ids, s, e)
        t = pa.table(
            {"id": pa.array(ids), "s": pa.array(s), "e": pa.array(e)}
        )
        got = _pair_rows(
            interval_overlap_join(t_to_ds(t, n_blocks), bucket_us=1024)
        )
        assert got == want

    def test_exact_once_per_pair_across_buckets(self, ray_session):
        # two intervals overlapping ACROSS a bucket boundary must be
        # emitted exactly once (canonical-bucket dedup, no distinct)
        t = pa.table(
            {
                "id": pa.array([1, 2], type=pa.int64()),
                "s": pa.array([90, 100], type=pa.int64()),
                "e": pa.array([150, 190], type=pa.int64()),
            }
        )
        got = _pair_rows(interval_overlap_join(t, bucket_us=128))
        assert got == {(1, 2): 50}

    def test_tied_starts(self, ray_session):
        t = pa.table(
            {
                "id": pa.array([7, 3, 5], type=pa.int64()),
                "s": pa.array([10, 10, 10], type=pa.int64()),
                "e": pa.array([20, 15, 10], type=pa.int64()),
            }
        )
        # id 5 is zero-length → never pairs
        got = _pair_rows(interval_overlap_join(t, bucket_us=64))
        assert got == {(3, 7): 5}

    def test_length_guard(self, ray_session):
        t = pa.table(
            {
                "id": pa.array([1], type=pa.int64()),
                "s": pa.array([0], type=pa.int64()),
                "e": pa.array([100], type=pa.int64()),
            }
        )
        with pytest.raises(ValueError, match="bucket_us"):
            interval_overlap_join(t, bucket_us=64)
