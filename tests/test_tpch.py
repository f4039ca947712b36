"""TPC-H shape-completion queries (maup_ray/pipelines_tpch.py) vs
independent pandas brute forces at sf0.001 — the DuckDB value-exact
gate is scripts/check_oracles.py; these tests pin the SEMANTICS the
SQL mirrors (argmin tie-break, unique-argmax waiting rule, the
integer-threshold equivalence) so an oracle edit can't silently drift
both sides together.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _t(name, cols=None):
    return pq.read_table(f"{SF}/{name}.parquet", columns=cols).to_pandas()


def _cents(s, scale=100.0):
    return np.round(s.to_numpy() * scale).astype(np.int64)


@pytest.fixture(scope="module")
def lineitem():
    return _t("lineitem")


class TestWaitingSuppliers:
    def test_matches_bruteforce(self, ray_session, lineitem):
        from maup_ray.pipelines_tpch import q_waiting_suppliers

        got = q_waiting_suppliers(SF).to_pandas()

        orders = _t("orders", ["o_orderkey", "o_orderstatus"])
        f_keys = set(
            orders.loc[orders.o_orderstatus == "F", "o_orderkey"]
        )
        li = lineitem[lineitem.l_orderkey.isin(f_keys)]
        pair_max = li.groupby(["l_orderkey", "l_suppkey"], as_index=False)[
            "l_shipdate"
        ].max()
        counts: dict[int, int] = {}
        for ok, grp in pair_max.groupby("l_orderkey"):
            if len(grp) <= 1:
                continue
            mx = grp.l_shipdate.max()
            at = grp[grp.l_shipdate == mx]
            if len(at) == 1:
                sk = int(at.l_suppkey.iloc[0])
                counts[sk] = counts.get(sk, 0) + 1
        supp = _t("supplier", ["s_suppkey", "s_name"])
        names = dict(zip(supp.s_suppkey, supp.s_name))
        want = sorted((names[k], n) for k, n in counts.items())
        assert list(map(tuple, got[["s_name", "numwait"]].to_numpy())) \
            == want


class TestMinCostSupplier:
    def test_argmin_tiebreak(self, ray_session, lineitem):
        from maup_ray.pipelines_tpch import Q2_SIZE, q_min_cost_supplier

        got = (
            q_min_cost_supplier(SF)
            .to_pandas()
            .sort_values("p_partkey", ignore_index=True)
        )

        part = _t("part", ["p_partkey", "p_size"])
        keys = set(part.loc[part.p_size == Q2_SIZE, "p_partkey"])
        li = lineitem[lineitem.l_partkey.isin(keys)].copy()
        li["pc"] = _cents(li.l_extendedprice)
        li = li.sort_values(["l_partkey", "pc", "l_suppkey"])
        first = li.groupby("l_partkey", as_index=False).first()
        assert got.p_partkey.tolist() == first.l_partkey.tolist()
        assert got.price_cents.tolist() == first.pc.tolist()
        # tie-break: the winning row is the MIN suppkey among min-price
        for _, r in got.iterrows():
            cand = li[(li.l_partkey == r.p_partkey)
                      & (li.pc == r.price_cents)]
            assert r.s_suppkey == cand.l_suppkey.min()


class TestImportantParts:
    def test_integer_threshold_equivalence(self, ray_session, lineitem):
        """Engine applies v > (MULT·total) // cnt; the HAVING is
        v·cnt > MULT·total — equivalent over positive integers (module
        docstring proof). Pin it against the direct product form."""
        from maup_ray.pipelines_tpch import (
            Q11_MULT,
            Q11_NATION,
            q_important_parts,
        )

        got = q_important_parts(SF).to_pandas()
        got = got.sort_values("l_partkey", ignore_index=True)

        supp = _t("supplier", ["s_suppkey", "s_nationkey"])
        s3 = set(supp.loc[supp.s_nationkey == Q11_NATION, "s_suppkey"])
        li = lineitem[lineitem.l_suppkey.isin(s3)].copy()
        v = _cents(li.l_extendedprice) * _cents(li.l_quantity, 1.0)
        per = pd.Series(v).groupby(li.l_partkey.to_numpy()).sum()
        total = int(per.sum())
        want = per[[int(x) * len(per) > Q11_MULT * total for x in per]]
        assert got.l_partkey.tolist() == sorted(want.index.tolist())
        assert got.value_u.tolist() == [
            float(int(x)) for _, x in want.sort_index().items()
        ]


class TestLateOrders:
    def test_exists_semantics(self, ray_session, lineitem):
        from maup_ray.pipelines_tpch import (
            Q4_HI,
            Q4_LATE_DAYS,
            Q4_LO,
            q_late_orders,
        )

        got = q_late_orders(SF).to_pandas()

        orders = _t("orders")
        w = orders[(orders.o_orderdate >= Q4_LO)
                   & (orders.o_orderdate < Q4_HI)]
        li = lineitem.merge(
            w[["o_orderkey", "o_orderdate", "o_orderpriority"]],
            left_on="l_orderkey", right_on="o_orderkey",
        )
        late = li[li.l_shipdate
                  > li.o_orderdate + pd.Timedelta(days=Q4_LATE_DAYS)]
        want = (
            late.groupby(late.o_orderpriority.str[0].astype(int))[
                "l_orderkey"
            ]
            .nunique()
            .sort_index()
        )
        got = got.sort_values("o_prio", ignore_index=True)
        assert got.o_prio.tolist() == want.index.tolist()
        assert got.n_late.tolist() == want.tolist()


class TestShipDelay:
    def test_bucket_clamps(self, ray_session, lineitem):
        from maup_ray.pipelines_tpch import (
            Q12_BUCKET_DAYS,
            Q12_MAX_BUCKET,
            q_ship_delay,
        )

        got = q_ship_delay(SF).to_pandas()
        assert got.bucket.min() >= 0
        assert got.bucket.max() <= Q12_MAX_BUCKET

        orders = _t("orders", ["o_orderkey", "o_orderdate",
                               "o_orderpriority"])
        li = lineitem.merge(orders, left_on="l_orderkey",
                            right_on="o_orderkey")
        delay = (li.l_shipdate - li.o_orderdate).dt.total_seconds()
        delay = np.maximum(delay.to_numpy().astype(np.int64), 0)
        bucket = np.minimum(delay // (Q12_BUCKET_DAYS * 86400),
                            Q12_MAX_BUCKET)
        pr = li.o_orderpriority.str[0].astype(int).to_numpy()
        want = (
            pd.DataFrame({"bucket": bucket, "high": (pr <= 2)})
            .groupby("bucket")
            .agg(high_n=("high", "sum"), n=("high", "size"))
        )
        got = got.set_index("bucket")
        assert got.high_n.to_dict() == {
            int(k): int(v) for k, v in want.high_n.items()
        }
        assert (got.high_n + got.low_n).to_dict() == {
            int(k): int(v) for k, v in want.n.items()
        }


class TestScalarQueries:
    def test_disjunct_revenue_bruteforce(self, ray_session, lineitem):
        from maup_ray.pipelines_tpch import Q19_TERMS, q_disjunct_revenue

        got = q_disjunct_revenue(SF).to_pandas()
        part = _t("part", ["p_partkey", "p_brand", "p_size"])
        li = lineitem.merge(part, left_on="l_partkey",
                            right_on="p_partkey")
        m = np.zeros(len(li), dtype=bool)
        qty = _cents(li.l_quantity, 1.0)
        for br, ms, lo, hi in Q19_TERMS:
            m |= ((li.p_brand == br).to_numpy()
                  & (li.p_size.to_numpy() <= ms)
                  & (qty >= lo) & (qty <= hi))
        rev = (_cents(li.l_extendedprice)
               * (100 - _cents(li.l_discount)))[m]
        assert got.n.iloc[0] == int(m.sum())
        assert got.revenue_u.iloc[0] == float(int(rev.sum()))

    def test_top_supplier_is_global_max(self, ray_session, lineitem):
        from maup_ray.pipelines_tpch import Q15_HI, Q15_LO, q_top_supplier

        got = q_top_supplier(SF)
        li = lineitem[(lineitem.l_shipdate >= Q15_LO)
                      & (lineitem.l_shipdate < Q15_HI)]
        rev = (_cents(li.l_extendedprice)
               * (100 - _cents(li.l_discount)))
        per = pd.Series(rev).groupby(li.l_suppkey.to_numpy()).sum()
        mx = per.max()
        assert got["s_suppkey"].to_pylist() == sorted(
            per[per == mx].index.tolist()
        )
        assert set(got["total_revenue_u"].to_pylist()) == {float(int(mx))}
