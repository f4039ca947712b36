"""TPC-H-shaped relational pipelines — the query shapes earlier rounds
left out, completing 22/22 TPC-H shape coverage over the synthetic
star schema (already in pipelines.py: Q1 pricing_summary, Q3
top_unshipped, Q5 local_volume, Q7 trade_volume, Q13 custdist, Q14
promo_revenue, Q17 small_qty, Q18 big_orders, Q22 idle_customers).

The testdata schema has no ``partsupp`` table and no commit/receipt
dates, so Q2/Q4/Q11/Q12/Q16/Q20/Q21 are SHAPED variants: ``lineitem``
plays the part–supplier link and ``l_shipdate`` vs ``o_orderdate``
plays the lateness pair. The operator STRUCTURE each query exists to
exercise — correlated EXISTS (Q4), grouped argmin + attribute join
(Q2), global-threshold HAVING (Q11), distinct-count with anti-join
exclusion (Q16), nested grouped-HAVING semi chain (Q20), unique-argmax
EXISTS/NOT-EXISTS self-join (Q21) — is preserved exactly.

Exactness discipline (CLAUDE.md): money moves as integer cent units —
``rev_u = cents × (100 − disc)`` in 10⁻⁴ $ — so every sum is
order-independent; each float output is ONE IEEE expression mirrored
token-for-token by the oracle (``CAST(HUGEINT AS DOUBLE)`` etc.).

Scale shapes: dimension sides go through ``_dim_table`` (parquet
METADATA row-count gate: driver-local broadcast under 2M rows, a
streaming Dataset above — equi_join/semi_join then pick their
co-shuffle plans); corpus-keyed aggregates use per-batch Arrow
partials + one bytes-aware keyed exchange (``grouped_sum_count
final="hash"`` / ``hash_group_apply``); only dimension-bounded or
top-N-bounded results ever reach the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DIM_BROADCAST_LIMIT = 2_000_000

# shaped-variant constants (shared with the oracle SQL below)
Q2_SIZE = 7
Q4_LO, Q4_HI = "1996-01-01", "1997-01-01"
Q4_LATE_DAYS = 60
Q8_LO, Q8_HI = "1996-01-01", "1998-01-01"
Q8_REGION = 0
Q8_NATION = 3
Q9_NAME_SUBSTR = "widget"
Q10_LO, Q10_HI = "1996-10-01", "1997-01-01"
Q10_TOPN = 20
Q11_NATION = 3
Q11_MULT = 2  # keep parts whose value exceeds MULT × the mean value
Q12_BUCKET_DAYS = 30
Q12_MAX_BUCKET = 6
Q15_LO, Q15_HI = "1996-01-01", "1996-04-01"
Q16_SIZES = (1, 4, 7, 10)
Q16_EXCL_BRAND = "Brand#13"
Q16_COMPLAINT_MOD = 7  # s_suppkey % 7 == 0 plays the complaints list
Q19_TERMS = (  # (brand, max_size, qty_lo, qty_hi)
    ("Brand#12", 5, 1, 11),
    ("Brand#23", 10, 10, 20),
    ("Brand#3", 12, 20, 30),
)
Q20_NAME_PREFIX = "red "
Q20_QTY = 60
Q20_NATION = 3

_US_PER_DAY = 86_400_000_000


def _read(sf_dir: str, table: str, columns=None, filter=None):
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=columns, filter=filter
    )


def _dim_table(sf_dir: str, table: str, columns, pq_filters=None,
               pads_filter=None, limit: int = DIM_BROADCAST_LIMIT):
    """Measured-size side read: plan from parquet METADATA before
    touching data (the order_totals discipline). A provably-small side
    is pulled driver-local (``pa.Table``) so joins broadcast it ONCE
    via ``ray.put``; past ``limit`` rows it stays a streaming Dataset
    and the join/semi-join auto plans co-shuffle instead."""
    import pyarrow.parquet as pq

    path = f"{sf_dir}/{table}.parquet"
    if pq.read_metadata(path).num_rows <= limit:
        return pq.read_table(path, columns=columns, filters=pq_filters)
    return _read(sf_dir, table, columns, filter=pads_filter)


def _filter_side(side, f):
    """Apply batch-transform ``f`` to a Table (driver-local dimension)
    or per-batch on a Dataset — keeps each query's derivation written
    once while the side's physical plan stays measured-size."""
    if isinstance(side, pa.Table):
        return f(side)
    return side.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _cents(col, scale: float = 100.0):
    return pc.cast(pc.round(pc.multiply(col, scale)), pa.int64())


def _rev_u(b: pa.Table):
    """extendedprice·(1−discount) as exact integer 10⁻⁴-dollar units."""
    return pc.multiply(
        _cents(b["l_extendedprice"]),
        pc.subtract(pa.scalar(100, pa.int64()), _cents(b["l_discount"])),
    )


def _ts(lit: str):
    from datetime import datetime

    return pa.scalar(datetime.fromisoformat(lit))


def _prio_num(col):
    """'1-URGENT' → 1 (the leading digit is the priority rank)."""
    return pc.cast(pc.utf8_slice_codeunits(col, 0, 1), pa.int64())


def _exact_int_rows(rows, keys, sums, counts=(), key_types=None):
    """grouped_sums_exact rows → a typed driver Table with exact-int
    sums exposed as CAST-to-DOUBLE (the oracle's HUGEINT→DOUBLE).
    ``key_types`` maps key name → Arrow type (default int64) so the
    physical schema matches the oracle's, never inferred from values."""
    key_types = dict(key_types or {})
    rows = sorted(rows, key=lambda r: tuple(r[k] for k in keys))
    cols: dict[str, pa.Array] = {}
    for k in keys:
        cols[k] = pa.array(
            [r[k] for r in rows], type=key_types.get(k, pa.int64())
        )
    for s in sums:
        cols[s] = pa.array([float(int(r[s])) for r in rows], pa.float64())
    for c in counts:
        cols[c] = pa.array([int(r[c]) for r in rows], pa.int64())
    return pa.table(cols)


# --------------------------------------------------------------- Q4


def q_late_orders(sf_dir: str):
    """Q4 shape — order-priority checking: per priority, how many
    orders in the window have at least one lineitem shipped more than
    60 days after the order date (the correlated-EXISTS shape; the
    reference pair l_commitdate < l_receiptdate doesn't exist in this
    schema, so lateness is l_shipdate vs o_orderdate).

    Scale: the windowed orders side is measured-size (broadcast under
    2M rows, co-shuffle above); the EXISTS collapses to an exact
    per-priority COUNT(DISTINCT orderkey) over late join rows —
    ops/curate.grouped_distinct_count's pair-dedup partials + one
    16 B/row pair shuffle; lineitem payloads never move."""
    import pyarrow.dataset as pads

    from .ops.curate import grouped_distinct_count
    from .ops.join import equi_join

    orders = _dim_table(
        sf_dir, "orders",
        ["o_orderkey", "o_orderdate", "o_orderpriority"],
        pq_filters=[("o_orderdate", ">=", _ts(Q4_LO).as_py()),
                    ("o_orderdate", "<", _ts(Q4_HI).as_py())],
        pads_filter=(
            (pads.field("o_orderdate") >= _ts(Q4_LO))
            & (pads.field("o_orderdate") < _ts(Q4_HI))
        ),
    )
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    j = equi_join(li, orders, "l_orderkey", "o_orderkey",
                  ["o_orderdate", "o_orderpriority"])

    def late(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].to_numpy().view("int64")
        odate = b["o_orderdate"].to_numpy().view("int64")
        m = ship > odate + Q4_LATE_DAYS * _US_PER_DAY
        return pa.table(
            {
                "o_prio": _prio_num(b["o_orderpriority"]),
                "l_orderkey": b["l_orderkey"],
            }
        ).filter(pa.array(m))

    late_ds = j.map_batches(late, batch_format="pyarrow",
                            zero_copy_batch=True)
    out = grouped_distinct_count(late_ds, "o_prio", "l_orderkey",
                                 count_col="n_late")
    return out


# --------------------------------------------------------------- Q2


def q_min_cost_supplier(sf_dir: str):
    """Q2 shape — min-cost supplier per part: for every size-7 part,
    the lineitem row with the minimum extendedprice (tie → min
    suppkey), joined back to supplier attributes. lineitem plays the
    partsupp link; grouped argmin = ONE key-hash exchange of the
    pruned (partkey, suppkey, price) projection with
    ``sort_cols=(price, suppkey)`` so each group's first row IS the
    argmin — no per-group Python.

    Exactness: prices compare as integer cents; tie-break total order
    (price, suppkey) mirrors the oracle's row_number() ORDER BY."""
    from .ops.join import equi_join, semi_join
    from .ops.shuffle import hash_group_apply

    parts = _dim_table(
        sf_dir, "part", ["p_partkey"],
        pq_filters=[("p_size", "==", Q2_SIZE)],
    )
    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_suppkey", "l_extendedprice"],
    )
    li = semi_join(li, parts, on="l_partkey", right_on="p_partkey")

    def proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": b["l_partkey"],
                "l_suppkey": b["l_suppkey"],
                "pc": _cents(b["l_extendedprice"]),
            }
        )

    li = li.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)

    def argmin(tbl, starts):
        if tbl is None or len(starts) == 0:
            return pa.table(
                {
                    "p_partkey": pa.array([], pa.int64()),
                    "price_cents": pa.array([], pa.int64()),
                    "s_suppkey": pa.array([], pa.int64()),
                }
            )
        first = tbl.take(pa.array(starts))
        return pa.table(
            {
                "p_partkey": first["l_partkey"],
                "price_cents": first["pc"],
                "s_suppkey": first["l_suppkey"],
            }
        )

    mins = hash_group_apply(li, ["l_partkey"], argmin,
                            sort_cols=("pc", "l_suppkey"))
    supp = _dim_table(sf_dir, "supplier",
                      ["s_suppkey", "s_name", "s_acctbal"])
    return equi_join(mins, supp, "s_suppkey", "s_suppkey",
                     ["s_name", "s_acctbal"])


# --------------------------------------------------------------- Q8


def q_market_share(sf_dir: str):
    """Q8 shape — national market share: per order-year, the fraction
    of region-0 customers' lineitem revenue supplied by nation-3
    suppliers. Four measured-size joins over one streaming lineitem
    pass; the per-year numerator/denominator are exact integer sums
    (grouped_sums_exact Python-int driver merge — years are few) and
    the share is ONE division of two correctly-rounded doubles,
    mirrored by the oracle's CAST(HUGEINT AS DOUBLE) pair."""
    import pyarrow.parquet as pq

    from .ops.agg import grouped_sums_exact
    from .ops.join import equi_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    r0 = nation.filter(
        pc.equal(nation["n_regionkey"], Q8_REGION)
    )["n_nationkey"].combine_chunks()

    orders = _dim_table(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
        pq_filters=[("o_orderdate", ">=", _ts(Q8_LO).as_py()),
                    ("o_orderdate", "<", _ts(Q8_HI).as_py())],
    )
    cust = _dim_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    supp = _dim_table(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"])

    def rev(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "rev_u": _rev_u(b),
            }
        )

    li = li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    li = equi_join(li, orders, "l_orderkey", "o_orderkey",
                   ["o_custkey", "o_orderdate"])
    li = equi_join(li, cust, "o_custkey", "c_custkey", ["c_nationkey"])

    def region_filter(b: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.is_in(b["c_nationkey"], value_set=r0), False)
        return b.filter(m)

    li = li.map_batches(region_filter, batch_format="pyarrow",
                        zero_copy_batch=True)
    li = equi_join(li, supp, "l_suppkey", "s_suppkey", ["s_nationkey"])

    def flag(b: pa.Table) -> pa.Table:
        f = pc.cast(
            pc.equal(b["s_nationkey"], Q8_NATION), pa.int64()
        )
        return pa.table(
            {
                "o_year": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
                "rev_u": b["rev_u"],
                "rev3_u": pc.multiply(b["rev_u"], f),
            }
        )

    li = li.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)
    rows = grouped_sums_exact(li, ["o_year"],
                              sum_cols=["rev_u", "rev3_u"], count_col="n")
    rows.sort(key=lambda r: r["o_year"])
    return pa.table(
        {
            "o_year": pa.array([r["o_year"] for r in rows], pa.int64()),
            "mkt_share": pa.array(
                [float(int(r["rev3_u"])) / float(int(r["rev_u"]))
                 for r in rows],
                pa.float64(),
            ),
            "total_u": pa.array(
                [float(int(r["rev_u"])) for r in rows], pa.float64()
            ),
            "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
        }
    )


# --------------------------------------------------------------- Q9


def q_nation_profit(sf_dir: str):
    """Q9 shape — product-type profit by supplier nation and year:
    profit_u = price_cents·(100−disc) − retail_cents·qty·100 (both in
    10⁻⁴ $; p_retailprice plays ps_supplycost, which this schema
    lacks), over parts whose name contains 'widget'. Three
    measured-size joins; per-(nation, year) exact integer sums."""
    from .ops.agg import grouped_sums_exact
    from .ops.join import equi_join

    part = _dim_table(sf_dir, "part",
                      ["p_partkey", "p_name", "p_retailprice"])

    def widget(t: pa.Table) -> pa.Table:
        m = pc.match_substring(t["p_name"], Q9_NAME_SUBSTR)
        t = t.filter(m)
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "rpc": _cents(t["p_retailprice"]),
            }
        )

    part = _filter_side(part, widget)
    supp = _dim_table(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    orders = _dim_table(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount"])
    li = equi_join(li, part, "l_partkey", "p_partkey", ["rpc"])
    li = equi_join(li, supp, "l_suppkey", "s_suppkey", ["s_nationkey"])
    li = equi_join(li, orders, "l_orderkey", "o_orderkey",
                   ["o_orderdate"])

    def profit(b: pa.Table) -> pa.Table:
        qty = _cents(b["l_quantity"], 1.0)
        cost = pc.multiply(
            pc.multiply(b["rpc"], qty), pa.scalar(100, pa.int64())
        )
        return pa.table(
            {
                "s_nationkey": b["s_nationkey"],
                "o_year": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
                "profit_u": pc.subtract(_rev_u(b), cost),
            }
        )

    li = li.map_batches(profit, batch_format="pyarrow",
                        zero_copy_batch=True)
    rows = grouped_sums_exact(li, ["s_nationkey", "o_year"],
                              sum_cols=["profit_u"], count_col="n")
    return _exact_int_rows(rows, ["s_nationkey", "o_year"],
                           ["profit_u"], ["n"],
                           key_types={"s_nationkey": pa.int32()})


# -------------------------------------------------------------- Q10


def q_returned_revenue(sf_dir: str):
    """Q10 shape — returned-item reporting: top-20 customers by
    revenue of R-returnflag lineitems against orders in 1996-Q4,
    joined to customer attributes. Per-custkey sums are corpus-keyed →
    grouped_sum_count(final="hash") (per-batch Arrow partials + one
    bytes-aware keyed exchange of integer partials); the global top-20
    is per-block top-20 partials (≤ 20 rows per block reach the
    driver) + one driver finish; customer attributes are fetched with
    a 20-key pushdown read — the corpus never gathers anywhere.

    Total order (revenue DESC, custkey) mirrors the oracle LIMIT."""
    import pyarrow.parquet as pq
    import ray

    from .ops.agg import grouped_sum_count
    from .ops.join import equi_join

    orders = _dim_table(
        sf_dir, "orders", ["o_orderkey", "o_custkey"],
        pq_filters=[("o_orderdate", ">=", _ts(Q10_LO).as_py()),
                    ("o_orderdate", "<", _ts(Q10_HI).as_py())],
    )
    import pyarrow.dataset as pads

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
        filter=(pads.field("l_returnflag") == "R"),
    )

    def rev(b: pa.Table) -> pa.Table:
        return pa.table(
            {"l_orderkey": b["l_orderkey"], "rev_u": _rev_u(b)}
        )

    li = li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    li = equi_join(li, orders, "l_orderkey", "o_orderkey", ["o_custkey"])
    g = grouped_sum_count(li, ["o_custkey"], sum_cols=["rev_u"],
                          count_col="n_items", final="hash")

    def block_top(b: pa.Table) -> pa.Table:
        if b.num_rows <= Q10_TOPN:
            return b
        order = np.lexsort(
            (b["o_custkey"].to_numpy(),
             -b["rev_u"].to_numpy(zero_copy_only=False))
        )[:Q10_TOPN]
        return b.take(pa.array(order))

    tops = pa.concat_tables(
        [t for t in (ray.get(r) for r in g.map_batches(
            block_top, batch_format="pyarrow", zero_copy_batch=True
        ).materialize().to_arrow_refs()) if t.num_rows]
    ).combine_chunks()
    order = np.lexsort(
        (tops["o_custkey"].to_numpy(),
         -tops["rev_u"].to_numpy(zero_copy_only=False))
    )[:Q10_TOPN]
    top = tops.take(pa.array(order))

    keys = top["o_custkey"].to_pylist()
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filters=[("c_custkey", "in", keys)],
    )
    idx = pc.index_in(top["o_custkey"], cust["c_custkey"].combine_chunks())
    return pa.table(
        {
            "c_custkey": top["o_custkey"],
            "c_name": pc.take(cust["c_name"], idx),
            "c_acctbal": pc.take(cust["c_acctbal"], idx),
            "c_nationkey": pc.take(cust["c_nationkey"], idx),
            "revenue_u": pc.cast(top["rev_u"], pa.float64()),
            "n_items": top["n_items"],
        }
    )


# -------------------------------------------------------------- Q11


def q_important_parts(sf_dir: str):
    """Q11 shape — important stock: per-part value (Σ price_cents·qty)
    over nation-3 suppliers' lineitems, keeping parts whose value
    exceeds 2× the MEAN part value (lineitem plays partsupp; the mean
    multiple replaces TPC-H's 0.0001/SF fraction so the predicate
    stays scale-invariant — a fixed fraction of the total empties out
    as the part count grows).

    The global-threshold HAVING is the shape this query exists for:
    per-part values stay a DISTRIBUTED keyed aggregate; the global
    (total, count) pair is an exact driver scalar merged from
    per-block (hi, lo) 2⁶²-limb partials (a certified-int64 np.sum
    fast path, Python-int fallback — grouped_sums_exact discipline);
    the filter broadcasts one integer threshold.
    ``v·cnt > MULT·total`` is applied as ``v > (MULT·total) // cnt`` —
    exactly equivalent over positive integers (both reduce to
    v ≥ ⌊MULT·total/cnt⌋ + 1, whether or not cnt divides evenly)."""
    import ray

    from .ops.agg import grouped_sum_count
    from .ops.join import semi_join

    supp = _dim_table(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    s3 = _filter_side(
        supp,
        lambda t: t.filter(pc.equal(t["s_nationkey"], Q11_NATION))
        .select(["s_suppkey"]),
    )
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice"])
    li = semi_join(li, s3, on="l_suppkey", right_on="s_suppkey")

    def val(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": b["l_partkey"],
                "v": pc.multiply(
                    _cents(b["l_extendedprice"]),
                    _cents(b["l_quantity"], 1.0),
                ),
            }
        )

    li = li.map_batches(val, batch_format="pyarrow", zero_copy_batch=True)
    g = grouped_sum_count(li, ["l_partkey"], sum_cols=["v"],
                          final="hash").materialize()

    LIMB = 1 << 62

    def limbs(b: pa.Table) -> pa.Table:
        v = b["v"].to_numpy(zero_copy_only=False)
        n = len(v)
        # certified no-wrap bound → vectorized; else exact Python ints
        if n and int(np.abs(v).max()) * n < LIMB:
            s = int(v.sum())
        else:
            s = sum(int(x) for x in v)
        return pa.table(
            {
                "hi": pa.array([s >> 62], pa.int64()),
                "lo": pa.array([s & (LIMB - 1)], pa.int64()),
                "cnt": pa.array([n], pa.int64()),
            }
        )

    total = 0
    cnt = 0
    for r in g.map_batches(
        limbs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize().to_arrow_refs():
        t = ray.get(r)
        # empty input blocks pass through with the INPUT schema (Ray
        # Data skips the UDF on them) — they contribute nothing
        if t.num_rows == 0 or "hi" not in t.column_names:
            continue
        for hi, lo, c in zip(t["hi"].to_pylist(), t["lo"].to_pylist(),
                             t["cnt"].to_pylist()):
            total += (int(hi) << 62) | int(lo)
            cnt += int(c)
    if cnt == 0:
        return pa.table({"l_partkey": pa.array([], pa.int64()),
                         "value_u": pa.array([], pa.float64())})
    thr = (Q11_MULT * total) // cnt
    if thr >= (1 << 63):  # nothing can pass an above-int64 threshold
        return pa.table({"l_partkey": pa.array([], pa.int64()),
                         "value_u": pa.array([], pa.float64())})
    thr_s = pa.scalar(int(thr), pa.int64())

    def keep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b["v"], thr_s))
        return pa.table(
            {
                "l_partkey": b["l_partkey"],
                "value_u": pc.cast(b["v"], pa.float64()),
            }
        )

    return g.map_batches(keep, batch_format="pyarrow",
                         zero_copy_batch=True)


# -------------------------------------------------------------- Q12


def q_ship_delay(sf_dir: str):
    """Q12 shape — shipping-delay priority profile: per 30-day
    ship-delay bucket (clamped to [0, 6]; l_shipdate−o_orderdate plays
    the receipt/commit pair this schema lacks), count high-priority
    (1-URGENT / 2-HIGH) vs lower-priority lineitems. One measured-size
    join + a 7-group driver-final integer rollup. Delay clamps at 0
    BEFORE the integer division so floor == trunc on both engines."""
    from .ops.agg import grouped_sum_count
    from .ops.join import equi_join

    orders = _dim_table(sf_dir, "orders",
                        ["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    j = equi_join(li, orders, "l_orderkey", "o_orderkey",
                  ["o_orderdate", "o_orderpriority"])

    def buckets(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].to_numpy().view("int64")
        odate = b["o_orderdate"].to_numpy().view("int64")
        delay = np.maximum(ship - odate, 0)
        bucket = np.minimum(
            delay // (Q12_BUCKET_DAYS * _US_PER_DAY), Q12_MAX_BUCKET
        )
        pr = _prio_num(b["o_orderpriority"]).to_numpy(zero_copy_only=False)
        high = (pr <= 2).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "high_n": pa.array(high),
                "low_n": pa.array(1 - high),
            }
        )

    ds = j.map_batches(buckets, batch_format="pyarrow",
                       zero_copy_batch=True)
    out = grouped_sum_count(ds, ["bucket"], sum_cols=["high_n", "low_n"],
                            final="driver")
    return out.sort_by("bucket")


# -------------------------------------------------------------- Q15


def q_top_supplier(sf_dir: str):
    """Q15 shape — top supplier(s): per-supplier revenue over one
    quarter, returning every supplier achieving the global max (the
    view + WHERE rev = (SELECT max) shape). Supplier keys are
    dimension-sized, so the exact integer revenue table merges on the
    driver (grouped_sums_exact); the argmax and name join are
    driver-local over that dimension-bounded table."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from .ops.agg import grouped_sums_exact

    li = _read(
        sf_dir, "lineitem",
        ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=((pads.field("l_shipdate") >= _ts(Q15_LO))
                & (pads.field("l_shipdate") < _ts(Q15_HI))),
    )

    def rev(b: pa.Table) -> pa.Table:
        return pa.table({"l_suppkey": b["l_suppkey"], "rev_u": _rev_u(b)})

    li = li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    rows = grouped_sums_exact(li, ["l_suppkey"], sum_cols=["rev_u"])
    if not rows:
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "total_revenue_u": pa.array([], pa.float64())})
    mx = max(int(r["rev_u"]) for r in rows)
    win = sorted(
        (r for r in rows if int(r["rev_u"]) == mx),
        key=lambda r: r["l_suppkey"],
    )
    keys = [int(r["l_suppkey"]) for r in win]
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", keys)],
    )
    idx = pc.index_in(pa.array(keys, pa.int64()),
                      supp["s_suppkey"].combine_chunks())
    return pa.table(
        {
            "s_suppkey": pa.array(keys, pa.int64()),
            "s_name": pc.take(supp["s_name"], idx),
            "total_revenue_u": pa.array(
                [float(int(r["rev_u"])) for r in win], pa.float64()
            ),
        }
    )


# -------------------------------------------------------------- Q16


def q_supplier_cnt(sf_dir: str):
    """Q16 shape — supplier count per part attribute: for non-PROMO
    parts of selected sizes (excluding one brand), the number of
    DISTINCT suppliers that ever shipped the part (lineitem plays
    partsupp), excluding 'complaint' suppliers (s_suppkey % 7 == 0 —
    the deterministic stand-in for the LIKE '%Complaints%' list).

    Shape: broadcast part-attr join → broadcast anti-join → exact
    grouped COUNT DISTINCT on a composite integer key
    (brand_num·1000 + size keeps hash_group_apply's integer-key
    contract; decomposed after the dimension-bounded driver merge)."""
    from .ops.curate import grouped_distinct_count
    from .ops.join import anti_join, equi_join

    part = _dim_table(sf_dir, "part",
                      ["p_partkey", "p_brand", "p_type", "p_size"])

    def attrs(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.not_equal(t["p_type"], "PROMO"),
                pc.not_equal(t["p_brand"], Q16_EXCL_BRAND),
            ),
            pc.is_in(t["p_size"],
                     value_set=pa.array(Q16_SIZES, pa.int32())),
        )
        t = t.filter(m)
        brand_num = pc.cast(
            pc.utf8_slice_codeunits(t["p_brand"], 6, 32), pa.int64()
        )
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "ck": pc.add(
                    pc.multiply(brand_num, pa.scalar(1000, pa.int64())),
                    pc.cast(t["p_size"], pa.int64()),
                ),
            }
        )

    part = _filter_side(part, attrs)
    supp = _dim_table(sf_dir, "supplier", ["s_suppkey"])

    def complaints_filter(t: pa.Table) -> pa.Table:
        k = t["s_suppkey"].to_numpy()
        return t.filter(
            pa.array(k % Q16_COMPLAINT_MOD == 0)
        ).select(["s_suppkey"])

    complaints = _filter_side(supp, complaints_filter)

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    li = equi_join(li, part, "l_partkey", "p_partkey", ["ck"])
    li = anti_join(li, complaints, on="l_suppkey", right_on="s_suppkey")
    out = grouped_distinct_count(li, "ck", "l_suppkey",
                                 count_col="supplier_cnt")
    ck = out["ck"]
    return pa.table(
        {
            "brand_num": pc.divide(ck, pa.scalar(1000, pa.int64())),
            "p_size": pc.subtract(
                ck,
                pc.multiply(
                    pc.divide(ck, pa.scalar(1000, pa.int64())),
                    pa.scalar(1000, pa.int64()),
                ),
            ),
            "supplier_cnt": out["supplier_cnt"],
        }
    )


# -------------------------------------------------------------- Q19


def q_disjunct_revenue(sf_dir: str):
    """Q19 shape — disjunctive-predicate revenue: Σ revenue over three
    OR'd (brand, size-range, quantity-range) conjunctions. One
    broadcast part-attr join + a vectorized three-term mask per batch;
    the scalar answer merges per-block exact integer partials (one row
    per block reaches the driver)."""
    import ray

    from .ops.join import equi_join

    part = _dim_table(sf_dir, "part",
                      ["p_partkey", "p_brand", "p_size"])
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice",
                "l_discount"])
    li = equi_join(li, part, "l_partkey", "p_partkey",
                   ["p_brand", "p_size"])

    def partial(b: pa.Table) -> pa.Table:
        qty = _cents(b["l_quantity"], 1.0).to_numpy(zero_copy_only=False)
        size = b["p_size"].to_numpy(zero_copy_only=False)
        brand = b["p_brand"].to_numpy(zero_copy_only=False)
        m = np.zeros(len(b), dtype=bool)
        for br, max_size, lo, hi in Q19_TERMS:
            m |= ((brand == br) & (size >= 1) & (size <= max_size)
                  & (qty >= lo) & (qty <= hi))
        rev = _rev_u(b).to_numpy(zero_copy_only=False)[m]
        return pa.table(
            {
                "rev": pa.array([int(rev.sum()) if len(rev) else 0],
                                pa.int64()),
                "n": pa.array([int(m.sum())], pa.int64()),
            }
        )

    total = 0
    n = 0
    for r in li.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize().to_arrow_refs():
        t = ray.get(r)
        # empty blocks pass through un-mapped with the input schema
        if t.num_rows == 0 or "rev" not in t.column_names:
            continue
        total += sum(int(x) for x in t["rev"].to_pylist())
        n += sum(int(x) for x in t["n"].to_pylist())
    return pa.table(
        {
            "revenue_u": pa.array([float(total)], pa.float64()),
            "n": pa.array([n], pa.int64()),
        }
    )


# -------------------------------------------------------------- Q20


def q_excess_suppliers(sf_dir: str):
    """Q20 shape — suppliers with excess stock: nation-1 suppliers who
    shipped more than 60 units of some red-prefixed part (lineitem
    plays partsupp; the qty threshold plays 0.5·Σps_availqty). The
    nested grouped-HAVING semi chain: red-part semi filter →
    per-(part, supplier) integer qty sums (corpus-keyed, hash final) →
    threshold filter → per-block distinct suppkeys (dimension-bounded)
    → driver-local supplier nation filter + name join."""
    import ray

    from .ops.agg import grouped_sum_count
    from .ops.join import semi_join

    part = _dim_table(sf_dir, "part", ["p_partkey", "p_name"])
    red = _filter_side(
        part,
        lambda t: t.filter(
            pc.starts_with(t["p_name"], Q20_NAME_PREFIX)
        ).select(["p_partkey"]),
    )
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity"])
    li = semi_join(li, red, on="l_partkey", right_on="p_partkey")

    def qty(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": b["l_partkey"],
                "l_suppkey": b["l_suppkey"],
                "qty": _cents(b["l_quantity"], 1.0),
            }
        )

    li = li.map_batches(qty, batch_format="pyarrow", zero_copy_batch=True)
    g = grouped_sum_count(li, ["l_partkey", "l_suppkey"],
                          sum_cols=["qty"], final="hash")

    def over(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b["qty"], pa.scalar(Q20_QTY, pa.int64())))
        return b.select(["l_suppkey"]).group_by(
            ["l_suppkey"], use_threads=False
        ).aggregate([])

    sk = pa.concat_tables(
        [t for t in (ray.get(r) for r in g.map_batches(
            over, batch_format="pyarrow", zero_copy_batch=True
        ).materialize().to_arrow_refs()) if t.num_rows]
        or [pa.table({"l_suppkey": pa.array([], pa.int64())})]
    )
    keys = pc.unique(sk["l_suppkey"].combine_chunks())

    import pyarrow.parquet as pq

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey"],
        filters=[("s_nationkey", "==", Q20_NATION)],
    )
    m = pc.is_in(supp["s_suppkey"], value_set=keys)
    out = supp.filter(m).select(["s_suppkey", "s_name"])
    return out.sort_by("s_suppkey")


# -------------------------------------------------------------- Q21


def q_waiting_suppliers(sf_dir: str):
    """Q21 shape — suppliers who kept orders waiting: over 'F'-status
    multi-supplier orders, count per supplier the orders where that
    supplier's latest shipment is STRICTLY later than every other
    supplier's (the EXISTS another / NOT-EXISTS equally-late
    self-join; l_shipdate plays the receipt/commit lateness pair).

    ONE order-keyed exchange does both levels: per-batch Arrow
    pre-combine to (orderkey, suppkey, max_ship) partials (≤ 1 row per
    pair per block) → hash_group_apply by orderkey with
    sort_cols=(suppkey, m) — inside each partition a vectorized pass
    dedups pair runs (last row of a run is its max), then reduceat
    computes per-order max / #suppliers-at-max / #suppliers and emits
    the unique-latest suppkey for qualifying orders. Waiting counts
    per supplier are dimension-bounded → driver final + name join."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from .ops.agg import grouped_sum_count
    from .ops.join import semi_join
    from .ops.shuffle import hash_group_apply

    f_orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderstatus"],
        filter=(pads.field("o_orderstatus") == "F"),
    )
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"])
    li = semi_join(li, f_orders, on="l_orderkey", right_on="o_orderkey")

    def pair_max(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "m": pc.cast(b["l_shipdate"], pa.int64()),
            }
        )
        g = t.group_by(["l_orderkey", "l_suppkey"],
                       use_threads=False).aggregate([("m", "max")])
        return g.rename_columns(["l_orderkey", "l_suppkey", "m"])

    pairs = li.map_batches(pair_max, batch_format="pyarrow",
                           zero_copy_batch=True)

    def latest(tbl, starts):
        if tbl is None or tbl.num_rows == 0:
            return pa.table({"l_suppkey": pa.array([], pa.int64())})
        ok = tbl["l_orderkey"].to_numpy(zero_copy_only=False)
        sk = tbl["l_suppkey"].to_numpy(zero_copy_only=False)
        m = tbl["m"].to_numpy(zero_copy_only=False)
        n = len(ok)
        # rows sorted by (orderkey, suppkey, m): last row of each
        # (orderkey, suppkey) run is the pair max
        last = np.ones(n, dtype=bool)
        last[:-1] = (ok[:-1] != ok[1:]) | (sk[:-1] != sk[1:])
        ok2, sk2, m2 = ok[last], sk[last], m[last]
        s2 = np.flatnonzero(
            np.concatenate(([True], ok2[:-1] != ok2[1:]))
        )
        cnt = np.diff(np.append(s2, len(ok2)))
        mx = np.maximum.reduceat(m2, s2)
        at = m2 == np.repeat(mx, cnt)
        c_at = np.add.reduceat(at.astype(np.int64), s2)
        sel = (cnt > 1) & (c_at == 1)
        rows = at & np.repeat(sel, cnt)
        return pa.table({"l_suppkey": pa.array(sk2[rows], pa.int64())})

    waiting = hash_group_apply(pairs, ["l_orderkey"], latest,
                               sort_cols=("l_suppkey", "m"))
    counts = grouped_sum_count(waiting, ["l_suppkey"],
                               count_col="numwait", final="driver")
    counts = counts.sort_by("l_suppkey")
    keys = counts["l_suppkey"].to_pylist()
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", keys)] if keys else None,
    )
    idx = pc.index_in(counts["l_suppkey"],
                      supp["s_suppkey"].combine_chunks())
    return pa.table(
        {
            "s_name": pc.take(supp["s_name"], idx),
            "numwait": counts["numwait"],
        }
    )


TPCH_QUERIES = {
    "late_orders": q_late_orders,
    "min_cost_supplier": q_min_cost_supplier,
    "market_share": q_market_share,
    "nation_profit": q_nation_profit,
    "returned_revenue": q_returned_revenue,
    "important_parts": q_important_parts,
    "ship_delay": q_ship_delay,
    "top_supplier": q_top_supplier,
    "supplier_cnt": q_supplier_cnt,
    "disjunct_revenue": q_disjunct_revenue,
    "excess_suppliers": q_excess_suppliers,
    "waiting_suppliers": q_waiting_suppliers,
}

_REV = ("CAST(round(l_extendedprice*100, 0) AS BIGINT)"
        " * (100 - CAST(round(l_discount*100, 0) AS BIGINT))")

TPCH_ORACLES = {
    "late_orders": f"""
        SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS o_prio,
               count(*) AS n_late
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '{Q4_LO}'
          AND o_orderdate <  TIMESTAMP '{Q4_HI}'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate
                                         + INTERVAL {Q4_LATE_DAYS} DAY)
        GROUP BY 1 ORDER BY 1
    """,
    "min_cost_supplier": f"""
        WITH pp AS (SELECT p_partkey FROM part WHERE p_size = {Q2_SIZE}),
        l AS (SELECT l_partkey, l_suppkey,
                     CAST(round(l_extendedprice*100, 0) AS BIGINT) AS pc
              FROM lineitem JOIN pp ON l_partkey = p_partkey),
        r AS (SELECT l_partkey, l_suppkey, pc,
                     row_number() OVER (PARTITION BY l_partkey
                                        ORDER BY pc, l_suppkey) AS rn
              FROM l)
        SELECT l_partkey AS p_partkey, pc AS price_cents,
               l_suppkey AS s_suppkey, s_name, s_acctbal
        FROM r JOIN supplier ON l_suppkey = s_suppkey
        WHERE rn = 1 ORDER BY 1
    """,
    "market_share": f"""
        WITH r0 AS (SELECT n_nationkey FROM nation
                    WHERE n_regionkey = {Q8_REGION}),
        l AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                     {_REV} AS rev,
                     CASE WHEN s_nationkey = {Q8_NATION}
                          THEN 1 ELSE 0 END AS f
              FROM lineitem
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN r0       ON c_nationkey = n_nationkey
              JOIN supplier ON l_suppkey = s_suppkey
              WHERE o_orderdate >= TIMESTAMP '{Q8_LO}'
                AND o_orderdate <  TIMESTAMP '{Q8_HI}')
        SELECT o_year,
               CAST(SUM(CAST(rev*f AS HUGEINT)) AS DOUBLE)
                 / CAST(SUM(CAST(rev AS HUGEINT)) AS DOUBLE)
                 AS mkt_share,
               CAST(SUM(CAST(rev AS HUGEINT)) AS DOUBLE) AS total_u,
               COUNT(*) AS n
        FROM l GROUP BY 1 ORDER BY 1
    """,
    "nation_profit": f"""
        WITH w AS (SELECT p_partkey,
                          CAST(round(p_retailprice*100, 0) AS BIGINT)
                            AS rpc
                   FROM part WHERE p_name LIKE '%{Q9_NAME_SUBSTR}%'),
        l AS (SELECT s_nationkey,
                     CAST(year(o_orderdate) AS BIGINT) AS o_year,
                     {_REV}
                     - rpc * CAST(round(l_quantity, 0) AS BIGINT) * 100
                       AS profit_u
              FROM lineitem
              JOIN w        ON l_partkey = p_partkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN orders   ON l_orderkey = o_orderkey)
        SELECT s_nationkey, o_year,
               CAST(SUM(CAST(profit_u AS HUGEINT)) AS DOUBLE)
                 AS profit_u,
               COUNT(*) AS n
        FROM l GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "returned_revenue": f"""
        WITH r AS (SELECT o_custkey,
                          SUM(CAST({_REV} AS HUGEINT)) AS rev,
                          COUNT(*) AS n
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                   WHERE l_returnflag = 'R'
                     AND o_orderdate >= TIMESTAMP '{Q10_LO}'
                     AND o_orderdate <  TIMESTAMP '{Q10_HI}'
                   GROUP BY 1
                   ORDER BY rev DESC, o_custkey LIMIT {Q10_TOPN})
        SELECT c_custkey, c_name, c_acctbal, c_nationkey,
               CAST(rev AS DOUBLE) AS revenue_u,
               CAST(n AS BIGINT) AS n_items
        FROM r JOIN customer ON c_custkey = o_custkey ORDER BY 1
    """,
    "important_parts": f"""
        WITH s3 AS (SELECT s_suppkey FROM supplier
                    WHERE s_nationkey = {Q11_NATION}),
        l AS (SELECT l_partkey,
                     CAST(round(l_extendedprice*100, 0) AS BIGINT)
                       * CAST(round(l_quantity, 0) AS BIGINT) AS v
              FROM lineitem JOIN s3 ON l_suppkey = s_suppkey),
        g AS (SELECT l_partkey, SUM(CAST(v AS HUGEINT)) AS value_u
              FROM l GROUP BY 1),
        t AS (SELECT SUM(value_u) AS total, COUNT(*) AS cnt FROM g)
        SELECT l_partkey, CAST(value_u AS DOUBLE) AS value_u
        FROM g, t
        WHERE value_u * cnt > {Q11_MULT} * total ORDER BY 1
    """,
    "ship_delay": f"""
        WITH j AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
                     AS pr,
                   least(greatest(epoch_us(l_shipdate)
                                  - epoch_us(o_orderdate), 0)
                         // {Q12_BUCKET_DAYS * _US_PER_DAY},
                         {Q12_MAX_BUCKET}) AS bucket
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(SUM(CASE WHEN pr <= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS high_n,
               CAST(SUM(CASE WHEN pr >  2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS low_n
        FROM j GROUP BY 1 ORDER BY 1
    """,
    "top_supplier": f"""
        WITH r AS (SELECT l_suppkey,
                          SUM(CAST({_REV} AS HUGEINT)) AS rev
                   FROM lineitem
                   WHERE l_shipdate >= TIMESTAMP '{Q15_LO}'
                     AND l_shipdate <  TIMESTAMP '{Q15_HI}'
                   GROUP BY 1)
        SELECT s_suppkey, s_name, CAST(rev AS DOUBLE)
                 AS total_revenue_u
        FROM r JOIN supplier ON s_suppkey = l_suppkey
        WHERE rev = (SELECT max(rev) FROM r) ORDER BY 1
    """,
    "supplier_cnt": f"""
        WITH pp AS (SELECT p_partkey,
                           CAST(substr(p_brand, 7) AS BIGINT)
                             AS brand_num,
                           CAST(p_size AS BIGINT) AS p_size
                    FROM part
                    WHERE p_type <> 'PROMO'
                      AND p_brand <> '{Q16_EXCL_BRAND}'
                      AND p_size IN {Q16_SIZES}),
        l AS (SELECT DISTINCT brand_num, p_size, l_suppkey
              FROM lineitem JOIN pp ON l_partkey = p_partkey
              WHERE l_suppkey NOT IN
                    (SELECT s_suppkey FROM supplier
                     WHERE s_suppkey % {Q16_COMPLAINT_MOD} = 0))
        SELECT brand_num, p_size, COUNT(*) AS supplier_cnt
        FROM l GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "disjunct_revenue": f"""
        SELECT CAST(COALESCE(SUM(CAST({_REV} AS HUGEINT)), 0)
                    AS DOUBLE) AS revenue_u,
               COUNT(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE ({" OR ".join(
            f"(p_brand = '{br}' AND p_size BETWEEN 1 AND {ms}"
            f" AND l_quantity >= {lo} AND l_quantity <= {hi})"
            for br, ms, lo, hi in Q19_TERMS)})
    """,
    "excess_suppliers": f"""
        WITH rp AS (SELECT p_partkey FROM part
                    WHERE p_name LIKE '{Q20_NAME_PREFIX}%'),
        g AS (SELECT l_partkey, l_suppkey,
                     SUM(CAST(round(l_quantity, 0) AS BIGINT)) AS sq
              FROM lineitem JOIN rp ON l_partkey = p_partkey
              GROUP BY 1, 2),
        s AS (SELECT DISTINCT l_suppkey FROM g WHERE sq > {Q20_QTY})
        SELECT s_suppkey, s_name
        FROM supplier JOIN s ON s_suppkey = l_suppkey
        WHERE s_nationkey = {Q20_NATION} ORDER BY 1
    """,
    "waiting_suppliers": f"""
        WITH f AS (SELECT l_orderkey, l_suppkey,
                          max(l_shipdate) AS m
                   FROM lineitem JOIN orders
                     ON l_orderkey = o_orderkey
                   WHERE o_orderstatus = 'F'
                   GROUP BY 1, 2),
        a AS (SELECT l_orderkey, l_suppkey, m,
                     max(m) OVER (PARTITION BY l_orderkey) AS mx,
                     count(*) OVER (PARTITION BY l_orderkey)
                       AS n_supp
              FROM f),
        b AS (SELECT *,
                     SUM(CASE WHEN m = mx THEN 1 ELSE 0 END)
                       OVER (PARTITION BY l_orderkey) AS c_at_max
              FROM a)
        SELECT s_name, count(*) AS numwait
        FROM b JOIN supplier ON l_suppkey = s_suppkey
        WHERE n_supp > 1 AND c_at_max = 1 AND m = mx
        GROUP BY 1 ORDER BY 1
    """,
}
