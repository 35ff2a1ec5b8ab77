"""TPC-H-shaped relational coverage beyond Q1/Q3/Q5 (SURVEY.md §2.4-2.6
join/aggregate families), adapted to the driver's schema (no
partsupp/shipmode/commitdate columns — each query notes its adaptation).

Planning idiom (same as relational.py):
  - dimension sides (part, customer-as-dim, nation) broadcast ONCE as
    key->attrs dicts via ray.put + per-worker cache — only the columns
    the query touches ship;
  - fact-fact meets (lineitem x orders) pre-aggregate per join key
    inside map_batches wherever the aggregate is key-functional, so the
    hash-partitioned shuffle moves one row per key, not one per line;
  - keyless (global) aggregates run as per-batch one-row partials
    merged by the shuffle-free combiner;
  - top-k cuts order by the ROUNDED measure plus full key tiebreaks on
    BOTH sides so the cut cannot flip on a last-ulp float difference.
"""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from document_ai_ray.pipelines.ops import (
    get_broadcast,
    large_join,
    merge_partials,
    partial_group_agg,
    round_cols,
    topk,
)
from document_ai_ray.pipelines.registry import register
from document_ai_ray.sources.tables import read_table


def _global_agg(ds, sum_cols: dict[str, str], count_alias: str | None = None):
    """Keyless global aggregate via the combiner: per-batch one-row
    partials (constant key) -> shuffle-free merge -> key dropped."""
    agg = partial_group_agg(
        ds.map_batches(
            lambda t: t.append_column("__g", pa.array(np.zeros(len(t), np.int8))),
            batch_format="pyarrow",
        ),
        ["__g"],
        sum_cols,
        count_alias=count_alias,
    )
    return agg.map_batches(lambda t: t.drop_columns(["__g"]), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Q4 — order priority checking.  Adaptation: the schema has no
# commit/receipt dates, so "late line" = a lineitem shipped more than 60
# days after the order date (EXISTS collapses to MAX(l_shipdate) per
# order, computed as a combiner aggregate before the join).
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY 1
    """,
)
def q4_order_priority(sf_dir: str):
    """TPC-H Q4 shape: EXISTS-style semi join with a cross-table date
    predicate.  The EXISTS is key-functional (any line 60+ days late ⟺
    the per-order MAX shipdate is 60+ days late), so lineitem collapses
    to one (orderkey, max_ship) row per order via the combiner BEFORE
    the shuffle join — the join moves order-cardinality rows."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_orderkey"]).aggregate([("l_shipdate", "max")])
        return g.rename_columns(["l_orderkey", "max_ship"])

    li_max = merge_partials(
        read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["l_orderkey"],
        {"max_ship": "max"},
    )
    orders = read_table(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(
            (pc.field("o_orderdate") >= datetime.datetime(1997, 1, 1))
            & (pc.field("o_orderdate") < datetime.datetime(1997, 4, 1))
        ),
    )
    joined = large_join(li_max, orders, on="l_orderkey", right_on="o_orderkey")

    def late(t: pa.Table) -> pa.Table:
        ms = t.column("max_ship").to_numpy(zero_copy_only=False)
        od = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ms > od + np.timedelta64(60, "D")))

    return partial_group_agg(
        joined.map_batches(late, batch_format="pyarrow"),
        ["o_orderpriority"],
        count_alias="n_orders",
    )


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change: pure filter + global aggregate (the
# predicate pushes into the parquet read; no shuffle at all).
# ---------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6: the canonical scan-dominated query — every predicate
    pushes into the read (row-group pruning), the revenue product is
    one vectorized kernel, and the only "wide" step is a one-row
    combiner merge."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= datetime.datetime(1997, 1, 1))
            & (pc.field("l_shipdate") < datetime.datetime(1998, 1, 1))
            & (pc.field("l_discount") >= 0.05)
            & (pc.field("l_discount") <= 0.07)
            & (pc.field("l_quantity") < 24)
        ),
    )

    def derive(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"), t.column("l_discount"))
        return pa.table({"rev": rev})

    out = _global_agg(
        ds.map_batches(derive, batch_format="pyarrow"), {"rev": "revenue"}, "n_lines"
    )
    return out.map_batches(lambda t: round_cols(t, {"revenue": 2}), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by ship year.
# ---------------------------------------------------------------------------


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(sf_dir: str):
    """TPC-H Q7 (volume shipping): the two-nation-pair revenue by ship
    year.  Nation / supplier-nation / customer-nation fold into
    broadcast lookups (dimension keys only); lineitem x orders is the
    one shuffle; the pair predicate and the year extraction run
    vectorized before the combiner aggregate."""
    import ray

    nat = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"], nat["n_name"]))
    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    s_nat = dict(zip(supp["s_suppkey"], supp["s_nationkey"]))
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    c_nat = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    pair = {"NATION_1", "NATION_2"}
    dims_ref = (ray.put((name_of, s_nat, c_nat, pair)),)

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= datetime.datetime(1996, 1, 1))
            & (pc.field("l_shipdate") < datetime.datetime(1998, 1, 1))
        ),
    )
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    joined = large_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def score(t: pa.Table, _ref=dims_ref) -> pa.Table:
        import pandas as pd

        name_of, s_nat, c_nat, pair = get_broadcast(_ref, tag="q7_dims")
        sn = pd.Series(t.column("l_suppkey").to_pylist()).map(s_nat).map(name_of)
        cn = pd.Series(t.column("o_custkey").to_pylist()).map(c_nat).map(name_of)
        keep = (
            sn.isin(pair) & cn.isin(pair) & (sn != cn)
        ).to_numpy()
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        ship = t.column("l_shipdate").to_numpy(zero_copy_only=False)[keep]
        years = ship.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table(
            {
                "supp_nation": pa.array(sn[keep].to_numpy(), pa.string()),
                "cust_nation": pa.array(cn[keep].to_numpy(), pa.string()),
                "l_year": pa.array(years, pa.int64()),
                "volume": pa.array(price * (1 - disc), pa.float64()),
            }
        )

    agg = partial_group_agg(
        joined.map_batches(score, batch_format="pyarrow"),
        ["supp_nation", "cust_nation", "l_year"],
        {"volume": "revenue"},
    )
    out = agg.map_batches(lambda t: round_cols(t, {"revenue": 2}), batch_format="pyarrow")
    # tiny corpora can filter the join to ZERO rows before any task
    # emits a block — union a schema-carrying empty block so the result
    # keeps its columns instead of degrading to a schemaless empty
    empty = pa.schema(
        [
            ("supp_nation", pa.string()),
            ("cust_nation", pa.string()),
            ("l_year", pa.int64()),
            ("revenue", pa.float64()),
        ]
    ).empty_table()
    return out.union(rd.from_arrow(empty))


# ---------------------------------------------------------------------------
# Q10 — returned item reporting: top-20 customers by returned-revenue.
# ---------------------------------------------------------------------------


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           ROUND(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(sf_dir: str):
    """TPC-H Q10 (returned items): lineitem('R') x orders(quarter) meet
    in the shuffle join, revenue pre-aggregates per CUSTOMER inside the
    combiner (custkey-functional), and customer/nation attributes
    attach to the already-aggregated (small) result via broadcast
    lookup — customer attrs never ride the fact shuffle.  Top-20 cut on
    the ROUNDED revenue with the custkey tiebreak, mirrored in the
    oracle's ORDER BY."""
    import ray

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
        filter=(pc.field("l_returnflag") == "R"),
    )
    orders = read_table(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(
            (pc.field("o_orderdate") >= datetime.datetime(1997, 1, 1))
            & (pc.field("o_orderdate") < datetime.datetime(1997, 4, 1))
        ),
    ).select_columns(["o_orderkey", "o_custkey"])

    def rev(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        return pa.table(
            {"l_orderkey": t.column("l_orderkey"), "rev": pa.array(price * (1 - disc))}
        )

    joined = large_join(
        li.map_batches(rev, batch_format="pyarrow"), orders, on="l_orderkey", right_on="o_orderkey"
    )
    per_cust = partial_group_agg(joined, ["o_custkey"], {"rev": "revenue"})

    cust = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    ).to_pandas()
    nat = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"], nat["n_name"]))
    cmap = {
        k: (n, b, name_of[nk])
        for k, n, b, nk in zip(
            cust["c_custkey"], cust["c_name"], cust["c_acctbal"], cust["c_nationkey"]
        )
    }
    cref = (ray.put(cmap),)

    def attach(t: pa.Table, _ref=cref) -> pa.Table:
        cmap = get_broadcast(_ref, tag="q10_cust")
        ck = t.column("o_custkey").to_pylist()
        attrs = [cmap[k] for k in ck]
        return pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "c_name": pa.array([a[0] for a in attrs], pa.string()),
                "revenue": t.column("revenue"),
                "c_acctbal": pa.array([a[1] for a in attrs], pa.float64()),
                "n_name": pa.array([a[2] for a in attrs], pa.string()),
            }
        )

    out = per_cust.map_batches(attach, batch_format="pyarrow").map_batches(
        lambda t: round_cols(t, {"revenue": 2, "c_acctbal": 2}), batch_format="pyarrow"
    )
    return topk(out, keys=[("revenue", True), ("c_custkey", False)], k=20)


# ---------------------------------------------------------------------------
# Q12 — line priority split.  Adaptation: no l_shipmode column, so the
# split dimension is l_returnflag; high = urgent/high order priority.
# ---------------------------------------------------------------------------


@register(
    "q12_priority_lines",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def q12_priority_lines(sf_dir: str):
    """TPC-H Q12 shape: conditional counts over a fact-fact join.
    Lineitem pre-aggregates to (orderkey, returnflag, n_lines) before
    the shuffle — the join moves one row per (order, flag) pair, and
    the CASE split becomes two weighted sums over the joined counts."""
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= datetime.datetime(1997, 1, 1))
            & (pc.field("l_shipdate") < datetime.datetime(1998, 1, 1))
        ),
    ).select_columns(["l_orderkey", "l_returnflag"])
    li_agg = partial_group_agg(li, ["l_orderkey", "l_returnflag"], count_alias="n_lines")
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = large_join(li_agg, orders, on="l_orderkey", right_on="o_orderkey")

    def split(t: pa.Table) -> pa.Table:
        import pandas as pd

        high = pd.Series(t.column("o_orderpriority").to_pylist()).isin(
            ["1-URGENT", "2-HIGH"]
        ).to_numpy()
        n = t.column("n_lines").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "high": pa.array(np.where(high, n, 0).astype(np.int64)),
                "low": pa.array(np.where(high, 0, n).astype(np.int64)),
            }
        )

    return partial_group_agg(
        joined.map_batches(split, batch_format="pyarrow"),
        ["l_returnflag"],
        {"high": "high_line_count", "low": "low_line_count"},
    )


# ---------------------------------------------------------------------------
# Q14 — promo revenue share: dimension broadcast + global ratio.
# ---------------------------------------------------------------------------


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 (promo revenue): part folds to a partkey->is_promo
    bitmap broadcast once (at 100 TB the bitmap is bytes-per-part, not
    the part table); one vectorized pass over the month of lineitem
    emits (promo_rev, total_rev) partials; the ratio is computed on the
    two merged scalars."""
    import ray

    part = read_table(sf_dir, "part", columns=["p_partkey", "p_type"]).to_pandas()
    promo = set(part[part["p_type"] == "PROMO"]["p_partkey"])
    pref = (ray.put(promo),)

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= datetime.datetime(1997, 9, 1))
            & (pc.field("l_shipdate") < datetime.datetime(1997, 10, 1))
        ),
    )

    def score(t: pa.Table, _ref=pref) -> pa.Table:
        import pandas as pd

        promo = get_broadcast(_ref, tag="q14_promo")
        is_promo = pd.Series(t.column("l_partkey").to_pylist()).isin(promo).to_numpy()
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = price * (1 - disc)
        return pa.table(
            {"promo_rev": pa.array(np.where(is_promo, rev, 0.0)), "rev": pa.array(rev)}
        )

    agg = _global_agg(
        li.map_batches(score, batch_format="pyarrow"),
        {"promo_rev": "_promo", "rev": "_total"},
        "n_lines",
    )

    def finalize(t: pa.Table) -> pa.Table:
        ratio = pc.multiply(pa.scalar(100.0), pc.divide(t.column("_promo"), t.column("_total")))
        out = pa.table({"promo_revenue": ratio, "n_lines": t.column("n_lines")})
        return round_cols(out, {"promo_revenue": 4})

    return agg.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING over a fact aggregate).
# ---------------------------------------------------------------------------


@register(
    "q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS qty
      FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 250
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           ROUND(o_totalprice, 2) AS o_totalprice, ROUND(qty, 2) AS sum_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(sf_dir: str):
    """TPC-H Q18 (large-volume customers): the HAVING filter runs on
    the combiner output (per-order quantity sums), so only qualifying
    orders reach the join; customer names attach via broadcast lookup;
    the top-20 cut orders by ROUNDED totalprice + orderkey tiebreak on
    both sides."""
    import ray

    per_order = partial_group_agg(
        read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]),
        ["l_orderkey"],
        {"l_quantity": "sum_qty"},
    ).map_batches(
        lambda t: t.filter(pc.greater(t.column("sum_qty"), pa.scalar(250.0))),
        batch_format="pyarrow",
    )
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    joined = large_join(per_order, orders, on="l_orderkey", right_on="o_orderkey")

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"]).to_pandas()
    cmap = dict(zip(cust["c_custkey"], cust["c_name"]))
    cref = (ray.put(cmap),)

    def attach(t: pa.Table, _ref=cref) -> pa.Table:
        cmap = get_broadcast(_ref, tag="q18_cust")
        ck = t.column("o_custkey").to_pylist()
        out = pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "c_name": pa.array([cmap[k] for k in ck], pa.string()),
                # Ray's join coalesces the key pair under the LEFT name
                "o_orderkey": t.column("l_orderkey"),
                "o_orderdate": t.column("o_orderdate"),
                "o_totalprice": t.column("o_totalprice"),
                "sum_qty": t.column("sum_qty"),
            }
        )
        return round_cols(out, {"o_totalprice": 2, "sum_qty": 2})

    return topk(
        joined.map_batches(attach, batch_format="pyarrow"),
        keys=[("o_totalprice", True), ("o_orderkey", False)],
        k=20,
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive brand/size/quantity predicates.  Adaptation: no
# p_container / l_shipmode, so the three clauses pair brand+size bands
# with quantity bands.
# ---------------------------------------------------------------------------


@register(
    "q19_brand_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_brand_revenue(sf_dir: str):
    """TPC-H Q19 (discounted revenue under a disjunction of conjunctive
    clauses): part folds to partkey->(brand, size) arrays broadcast
    once; the three-clause disjunction evaluates as one vectorized
    boolean expression per batch — no join shuffle at all."""
    import ray

    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
    pmap = {
        k: (b, s)
        for k, b, s in zip(part["p_partkey"], part["p_brand"], part["p_size"])
    }
    pref = (ray.put(pmap),)

    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    )

    def score(t: pa.Table, _ref=pref) -> pa.Table:
        pmap = get_broadcast(_ref, tag="q19_part")
        pk = t.column("l_partkey").to_pylist()
        attrs = [pmap[k] for k in pk]
        brand = np.array([a[0] for a in attrs])
        size = np.array([a[1] for a in attrs], np.int64)
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
        keep = (
            ((brand == "Brand#3") & (size >= 1) & (size <= 15) & (qty >= 1) & (qty <= 11))
            | ((brand == "Brand#12") & (size >= 1) & (size <= 25) & (qty >= 10) & (qty <= 20))
            | ((brand == "Brand#21") & (size >= 1) & (size <= 35) & (qty >= 20) & (qty <= 30))
        )
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        return pa.table({"rev": pa.array(price * (1 - disc), pa.float64())})

    out = _global_agg(li.map_batches(score, batch_format="pyarrow"), {"rev": "revenue"}, "n_lines")
    return out.map_batches(lambda t: round_cols(t, {"revenue": 2}), batch_format="pyarrow")
