"""TPC-H coverage, second batch: Q2/Q8/Q9/Q11/Q13/Q15/Q16/Q17/Q20/Q21/Q22
adapted to the driver's schema (no partsupp / shipmode / commitdate /
phone / comment columns — each query documents its adaptation inline).

Same planning idiom as tpch_queries.py:
  - dimension tables fold to broadcast key->attr maps (ray.put once,
    per-worker cache) — only the touched columns ship;
  - fact-fact meets (lineitem x orders) go through ONE hash-partitioned
    shuffle join, pre-aggregated per join key where key-functional;
  - correlated scalar subqueries (per-part MIN/AVG, global MAX/AVG
    thresholds) become combiner aggregates whose result is either a
    driver scalar (global) or a dimension-bounded broadcast map
    (per-part / per-supplier);
  - float thresholds that differ by summation order between engines are
    compared ROUNDED on both sides (the repo's frozen round idiom);
    integer-valued columns (l_quantity) make AVG thresholds exact, so
    those compare unrounded.
"""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from document_ai_ray.pipelines.ops import (
    get_broadcast,
    large_join,
    merge_partials,
    partial_group_agg,
    round_cols,
    semi_anti_join_auto,
    topk,
)
from document_ai_ray.pipelines.registry import register
from document_ai_ray.sources.tables import read_table


def _one_row_scalars(ds: rd.Dataset) -> dict:
    """Collect a one-row aggregate dataset into a plain dict (bounded:
    exactly one row by construction)."""
    t = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    assert t.num_rows == 1, f"expected 1 row, got {t.num_rows}"
    return {n: t.column(n)[0].as_py() for n in t.column_names}


def _global_sums(ds: rd.Dataset, sum_cols: dict[str, str], count_alias: str | None = None):
    """Keyless global aggregate via the combiner (constant group key,
    dropped after the shuffle-free merge)."""
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


def _euro_suppkeys(sf_dir: str) -> set:
    """Suppkeys whose nation is in region EUROPE (dimension-sized)."""
    nat = read_table(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"]).to_pandas()
    reg = read_table(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    euro_rk = set(reg[reg["r_name"] == "EUROPE"]["r_regionkey"])
    euro_nk = set(nat[nat["n_regionkey"].isin(euro_rk)]["n_nationkey"])
    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    return set(supp[supp["s_nationkey"].isin(euro_nk)]["s_suppkey"])


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier.  Adaptation: no partsupp, so the supply
# relation is lineitem and "supply cost" is the minimum observed unit
# price (l_extendedprice / l_quantity) per (part, supplier); the size
# predicate is dropped (p_type alone keeps the result non-trivial).
# The correlated per-part MIN is exact on both engines (MIN over the
# identical set of IEEE division results is order-insensitive).
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             MIN(l_extendedprice / l_quantity) AS ucost
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY 1, 2
    )
    SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name,
           pk AS p_partkey, ROUND(ucost, 4) AS ucost
    FROM supply
    JOIN part ON p_partkey = pk
    JOIN supplier ON s_suppkey = sk
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_type = 'SMALL'
      AND ucost = (SELECT MIN(s2.ucost) FROM supply s2 WHERE s2.pk = supply.pk)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 10
    """,
)
def q2_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 shape: correlated per-part minimum over a restricted
    supply relation.  EUROPE suppliers and SMALL parts fold to broadcast
    key sets; lineitem collapses to (part, supplier, min unit price) via
    the combiner; the per-part minimum is a second combiner pass whose
    output is bounded by the filtered part dimension, so it broadcasts
    back as a map for the final equality filter."""
    euro = _euro_suppkeys(sf_dir)
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_type"]).to_pandas()
    small = set(part[part["p_type"] == "SMALL"]["p_partkey"])
    supp = read_table(
        sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_acctbal", "s_nationkey"]
    ).to_pandas()
    nat = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"], nat["n_name"]))
    smap = {
        k: (n, b, name_of[nk])
        for k, n, b, nk in zip(
            supp["s_suppkey"], supp["s_name"], supp["s_acctbal"], supp["s_nationkey"]
        )
    }
    sets_ref = (ray.put((euro, small)),)

    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"]
    )

    def ucost(t: pa.Table, _ref=sets_ref) -> pa.Table:
        import pandas as pd

        euro, small = get_broadcast(_ref, tag="q2_sets")
        keep = (
            pd.Series(t.column("l_suppkey").to_pylist()).isin(euro)
            & pd.Series(t.column("l_partkey").to_pylist()).isin(small)
        ).to_numpy()
        t = t.filter(pa.array(keep))
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "p_partkey": t.column("l_partkey"),
                "sk": t.column("l_suppkey"),
                "ucost": pa.array(price / qty, pa.float64()),
            }
        )

    # (part, supplier) -> min unit cost; output bounded by |SMALL parts| x
    # |EUROPE suppliers that sold them| — dimension-product-sized, tiny
    # relative to lineitem.
    ps_min = merge_partials(
        li.map_batches(ucost, batch_format="pyarrow"),
        ["p_partkey", "sk"],
        {"ucost": "min"},
    ).materialize()
    # per-part min — bounded by the filtered part dimension -> broadcast map
    pmin_t = pa.concat_tables(
        ray.get(merge_partials(ps_min, ["p_partkey"], {"ucost": "min"}).to_arrow_refs())
    )
    pmin = dict(zip(pmin_t.column("p_partkey").to_pylist(), pmin_t.column("ucost").to_pylist()))
    refs = (ray.put((pmin, smap)),)

    def pick(t: pa.Table, _ref=refs) -> pa.Table:
        pmin, smap = get_broadcast(_ref, tag="q2_final")
        pk = t.column("p_partkey").to_pylist()
        uc = t.column("ucost").to_pylist()
        keep = np.array([u == pmin[k] for k, u in zip(pk, uc)], bool)
        t = t.filter(pa.array(keep))
        sk = t.column("sk").to_pylist()
        out = pa.table(
            {
                "s_acctbal": pa.array([smap[s][1] for s in sk], pa.float64()),
                "s_name": pa.array([smap[s][0] for s in sk], pa.string()),
                "n_name": pa.array([smap[s][2] for s in sk], pa.string()),
                "p_partkey": t.column("p_partkey"),
                "ucost": t.column("ucost"),
            }
        )
        return round_cols(out, {"s_acctbal": 2, "ucost": 4})

    out = ps_min.map_batches(pick, batch_format="pyarrow")
    return topk(
        out,
        keys=[("s_acctbal", True), ("n_name", False), ("s_name", False), ("p_partkey", False)],
        k=10,
    )


# ---------------------------------------------------------------------------
# Q8 — national market share of NATION_1 suppliers in the ASIA market
# for STANDARD parts, by order year.
# ---------------------------------------------------------------------------


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN part ON p_partkey = l_partkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    ) GROUP BY 1
    """,
)
def q8_market_share(sf_dir: str):
    """TPC-H Q8 (national market share): of the seven joins, six are
    dimension folds (part-type set, supplier->nation name, customer->
    in-ASIA bitmap) broadcast once; the only shuffle is lineitem x
    orders.  The share is two per-year sums merged by the combiner."""
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_type"]).to_pandas()
    std = set(part[part["p_type"] == "STANDARD"]["p_partkey"])
    nat = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = read_table(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    asia_rk = set(reg[reg["r_name"] == "ASIA"]["r_regionkey"])
    asia_nk = set(nat[nat["n_regionkey"].isin(asia_rk)]["n_nationkey"])
    name_of = dict(zip(nat["n_nationkey"], nat["n_name"]))
    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    s_name = {k: name_of[nk] for k, nk in zip(supp["s_suppkey"], supp["s_nationkey"])}
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    c_asia = set(cust[cust["c_nationkey"].isin(asia_nk)]["c_custkey"])
    dref = (ray.put((std, s_name, c_asia)),)

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )
    orders = read_table(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(
            (pc.field("o_orderdate") >= datetime.datetime(1996, 1, 1))
            & (pc.field("o_orderdate") < datetime.datetime(1998, 1, 1))
        ),
    )

    def pre(t: pa.Table, _ref=dref) -> pa.Table:
        import pandas as pd

        std, _, _ = get_broadcast(_ref, tag="q8_dims")
        keep = pd.Series(t.column("l_partkey").to_pylist()).isin(std).to_numpy()
        return t.filter(pa.array(keep)).drop_columns(["l_partkey"])

    joined = large_join(
        li.map_batches(pre, batch_format="pyarrow"), orders, on="l_orderkey", right_on="o_orderkey"
    )

    def score(t: pa.Table, _ref=dref) -> pa.Table:
        import pandas as pd

        _, s_name, c_asia = get_broadcast(_ref, tag="q8_dims")
        keep = pd.Series(t.column("o_custkey").to_pylist()).isin(c_asia).to_numpy()
        t = t.filter(pa.array(keep))
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        vol = price * (1 - disc)
        sn = np.array([s_name[k] for k in t.column("l_suppkey").to_pylist()])
        od = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        years = od.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table(
            {
                "o_year": pa.array(years, pa.int64()),
                "nat_vol": pa.array(np.where(sn == "NATION_1", vol, 0.0)),
                "vol": pa.array(vol),
            }
        )

    agg = partial_group_agg(
        joined.map_batches(score, batch_format="pyarrow"),
        ["o_year"],
        {"nat_vol": "_nat", "vol": "_tot"},
    )

    def finalize(t: pa.Table) -> pa.Table:
        share = pc.divide(t.column("_nat"), t.column("_tot"))
        out = pa.table({"o_year": t.column("o_year"), "mkt_share": share})
        return round_cols(out, {"mkt_share": 4})

    return agg.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year.  Adaptation: no
# ps_supplycost, so unit cost is 0.6 * p_retailprice (part dimension).
# ---------------------------------------------------------------------------


@register(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.6 * p_retailprice * l_quantity AS amount
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON o_orderkey = l_orderkey
      WHERE p_name LIKE '%bolt%'
    ) GROUP BY 1, 2
    """,
)
def q9_product_profit(sf_dir: str):
    """TPC-H Q9 (product profit): the part-name filter and retail-cost
    lookup fold to one broadcast partkey->retailprice map (only parts
    matching the LIKE ship); supplier->nation folds the same way; the
    one shuffle is lineitem x orders for the order year."""
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"]).to_pandas()
    sel = part[part["p_name"].str.contains("bolt")]
    retail = dict(zip(sel["p_partkey"], sel["p_retailprice"]))
    nat = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"], nat["n_name"]))
    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    s_nat = {k: name_of[nk] for k, nk in zip(supp["s_suppkey"], supp["s_nationkey"])}
    dref = (ray.put((retail, s_nat)),)

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def pre(t: pa.Table, _ref=dref) -> pa.Table:
        retail, s_nat = get_broadcast(_ref, tag="q9_dims")
        pk = t.column("l_partkey").to_pylist()
        keep = np.array([k in retail for k in pk], bool)
        t = t.filter(pa.array(keep))
        pk = t.column("l_partkey").to_pylist()
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
        rp = np.array([retail[k] for k in pk], np.float64)
        amount = price * (1 - disc) - 0.6 * rp * qty
        sn = [s_nat[k] for k in t.column("l_suppkey").to_pylist()]
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "nation": pa.array(sn, pa.string()),
                "amount": pa.array(amount),
            }
        )

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    joined = large_join(
        li.map_batches(pre, batch_format="pyarrow"), orders, on="l_orderkey", right_on="o_orderkey"
    )

    def year(t: pa.Table) -> pa.Table:
        od = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        years = od.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table(
            {
                "nation": t.column("nation"),
                "o_year": pa.array(years, pa.int64()),
                "amount": t.column("amount"),
            }
        )

    agg = partial_group_agg(
        joined.map_batches(year, batch_format="pyarrow"),
        ["nation", "o_year"],
        {"amount": "sum_profit"},
    )
    return agg.map_batches(lambda t: round_cols(t, {"sum_profit": 2}), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Q11 — important parts.  Adaptation: no partsupp, so "stock value" of a
# part is the lineitem revenue supplied by EUROPE suppliers; the HAVING
# threshold is 0.1% of the total, compared ROUNDED on both sides (the
# per-part values and the total differ from DuckDB's by summation-order
# ulps).
# ---------------------------------------------------------------------------


@register(
    "q11_important_parts",
    oracle="""
    WITH val AS (
      SELECT l_partkey, SUM(l_extendedprice) AS v
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY 1
    )
    SELECT l_partkey, ROUND(v, 2) AS value
    FROM val
    WHERE ROUND(v, 2) > ROUND((SELECT SUM(v) * 0.001 FROM val), 2)
    """,
)
def q11_important_parts(sf_dir: str):
    """TPC-H Q11 (important stock): per-part value via the combiner
    over region-filtered lineitem; the global 0.1% threshold is a
    second (one-row) combiner pass over the per-part table — matching
    the oracle's SUM over the CTE — collected as a driver scalar."""
    euro = _euro_suppkeys(sf_dir)
    eref = (ray.put(euro),)

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice"])

    def pre(t: pa.Table, _ref=eref) -> pa.Table:
        import pandas as pd

        euro = get_broadcast(_ref, tag="q11_euro")
        keep = pd.Series(t.column("l_suppkey").to_pylist()).isin(euro).to_numpy()
        t = t.filter(pa.array(keep))
        return pa.table({"l_partkey": t.column("l_partkey"), "v": t.column("l_extendedprice")})

    val = merge_partials(
        li.map_batches(pre, batch_format="pyarrow"), ["l_partkey"], {"v": "sum"}
    ).materialize()
    total = _one_row_scalars(_global_sums(val, {"v": "_tot"}))["_tot"]
    thresh = float(np.round(total * 0.001, 2))

    def cut(t: pa.Table) -> pa.Table:
        out = round_cols(t.rename_columns(["l_partkey", "value"]), {"value": 2})
        return out.filter(pc.greater(out.column("value"), pa.scalar(thresh)))

    return val.map_batches(cut, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (LEFT OUTER census).
# Adaptation: the o_comment NOT LIKE filter becomes an order-priority
# exclusion.
# ---------------------------------------------------------------------------


@register(
    "q13_cust_order_dist",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY 1
    ) GROUP BY 1
    """,
)
def q13_cust_order_dist(sf_dir: str):
    """TPC-H Q13 (customer distribution): the LEFT OUTER join never
    materializes — per-customer counts come from the combiner over
    orders alone, and the zero bucket is arithmetic: (total customers)
    - (customers holding a qualifying order), both one-row aggregates.
    The histogram is a second combiner pass over the per-customer
    counts."""
    orders = read_table(
        sf_dir,
        "orders",
        columns=["o_custkey", "o_orderpriority"],
        filter=(pc.field("o_orderpriority") != "1-URGENT"),
    ).select_columns(["o_custkey"])
    per_cust = partial_group_agg(orders, ["o_custkey"], count_alias="c_count").materialize()

    n_cust = _one_row_scalars(
        _global_sums(
            read_table(sf_dir, "customer", columns=["c_custkey"]), {}, count_alias="n"
        )
    )["n"]
    n_with = _one_row_scalars(_global_sums(per_cust, {}, count_alias="n"))["n"]
    n_zero = int(n_cust - n_with)

    hist = partial_group_agg(per_cust, ["c_count"], count_alias="custdist")
    if n_zero > 0:
        zero_row = rd.from_arrow(
            pa.table(
                {"c_count": pa.array([0], pa.int64()), "custdist": pa.array([n_zero], pa.int64())}
            )
        )
        hist = hist.union(zero_row)
    return hist


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by quarterly revenue (global-max subquery).
# ---------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, ROUND(r, 2) AS total_rev
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE ROUND(r, 2) = (SELECT MAX(ROUND(r, 2)) FROM rev)
    """,
)
def q15_top_supplier(sf_dir: str):
    """TPC-H Q15 (top supplier): per-supplier revenue via the combiner;
    the "create view + max" pattern becomes a one-row global MAX over
    the rounded revenues (rounded on BOTH sides so a summation-order
    ulp cannot flip the arg-max equality)."""
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= datetime.datetime(1997, 1, 1))
            & (pc.field("l_shipdate") < datetime.datetime(1997, 4, 1))
        ),
    )

    def rev(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        return pa.table({"l_suppkey": t.column("l_suppkey"), "r": pa.array(price * (1 - disc))})

    per_supp = (
        merge_partials(li.map_batches(rev, batch_format="pyarrow"), ["l_suppkey"], {"r": "sum"})
        .map_batches(
            lambda t: round_cols(t.rename_columns(["l_suppkey", "total_rev"]), {"total_rev": 2}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    best = _one_row_scalars(
        merge_partials(
            per_supp.map_batches(
                lambda t: t.append_column("__g", pa.array(np.zeros(len(t), np.int8))),
                batch_format="pyarrow",
            ),
            ["__g"],
            {"total_rev": "max"},
        ).map_batches(lambda t: t.drop_columns(["__g"]), batch_format="pyarrow")
    )["total_rev"]

    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).to_pandas()
    smap = dict(zip(supp["s_suppkey"], supp["s_name"]))
    sref = (ray.put(smap),)

    def pick(t: pa.Table, _ref=sref) -> pa.Table:
        smap = get_broadcast(_ref, tag="q15_supp")
        t = t.filter(pc.equal(t.column("total_rev"), pa.scalar(best)))
        sk = t.column("l_suppkey").to_pylist()
        return pa.table(
            {
                "s_suppkey": t.column("l_suppkey"),
                "s_name": pa.array([smap[k] for k in sk], pa.string()),
                "total_rev": t.column("total_rev"),
            }
        )

    return per_supp.map_batches(pick, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Q16 — supplier count by part attributes.  Adaptation: the supply
# relation is lineitem; the "complaints" supplier exclusion becomes an
# account-balance predicate (s_acctbal < 1000).
# ---------------------------------------------------------------------------


@register(
    "q16_supplier_part_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_part_cnt(sf_dir: str):
    """TPC-H Q16 (parts/supplier relationship): COUNT(DISTINCT supplier)
    per part attribute triple.  Part attrs and the excluded-supplier set
    broadcast; the distinct pass is the two-level combiner dedup over
    (brand, type, size, suppkey) — group keys only, never doc-sized
    rows — followed by a per-triple count."""
    sizes = {1, 4, 9, 14, 19, 23, 36, 45}
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand", "p_type", "p_size"]).to_pandas()
    sel = part[
        (part["p_brand"] != "Brand#1") & (part["p_type"] != "PROMO") & part["p_size"].isin(sizes)
    ]
    pmap = {
        k: (b, ty, int(sz))
        for k, b, ty, sz in zip(sel["p_partkey"], sel["p_brand"], sel["p_type"], sel["p_size"])
    }
    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"]).to_pandas()
    bad = set(supp[supp["s_acctbal"] < 1000]["s_suppkey"])
    dref = (ray.put((pmap, bad)),)

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def attrs(t: pa.Table, _ref=dref) -> pa.Table:
        pmap, bad = get_broadcast(_ref, tag="q16_dims")
        pk = t.column("l_partkey").to_pylist()
        sk = t.column("l_suppkey").to_pylist()
        keep = np.array([p in pmap and s not in bad for p, s in zip(pk, sk)], bool)
        t = t.filter(pa.array(keep))
        pk = t.column("l_partkey").to_pylist()
        a = [pmap[p] for p in pk]
        return pa.table(
            {
                "p_brand": pa.array([x[0] for x in a], pa.string()),
                "p_type": pa.array([x[1] for x in a], pa.string()),
                "p_size": pa.array([x[2] for x in a], pa.int32()),
                "l_suppkey": t.column("l_suppkey"),
            }
        )

    quad = li.map_batches(attrs, batch_format="pyarrow")
    distinct = merge_partials(
        quad.map_batches(
            lambda t: t.group_by(["p_brand", "p_type", "p_size", "l_suppkey"]).aggregate([]),
            batch_format="pyarrow",
        ),
        ["p_brand", "p_type", "p_size", "l_suppkey"],
        {},
    )
    return partial_group_agg(
        distinct, ["p_brand", "p_type", "p_size"], count_alias="supplier_cnt"
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue for one brand (correlated per-part
# AVG).  l_quantity is integer-valued, so the per-part 20%-of-average
# threshold is EXACT on both engines (integer sums in float64).
# ---------------------------------------------------------------------------


@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#5'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 (small-quantity revenue): the correlated per-part AVG
    is a combiner aggregate over the brand-filtered lineitem whose
    output is bounded by the brand's part dimension -> broadcast map;
    a second pass applies the threshold and feeds the one-row global
    sum."""
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"]).to_pandas()
    brand = set(part[part["p_brand"] == "Brand#5"]["p_partkey"])
    bref = (ray.put(brand),)

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def pre(t: pa.Table, _ref=bref) -> pa.Table:
        import pandas as pd

        brand = get_broadcast(_ref, tag="q17_brand")
        keep = pd.Series(t.column("l_partkey").to_pylist()).isin(brand).to_numpy()
        return t.filter(pa.array(keep))

    filtered = li.map_batches(pre, batch_format="pyarrow").materialize()
    stats = pa.concat_tables(
        ray.get(
            merge_partials(
                filtered.map_batches(
                    lambda t: pa.table(
                        {"l_partkey": t.column("l_partkey"), "q": t.column("l_quantity")}
                    ),
                    batch_format="pyarrow",
                ).map_batches(
                    lambda t: t.group_by(["l_partkey"]).aggregate(
                        [("q", "sum"), ("q", "count")]
                    ).rename_columns(["l_partkey", "qs", "qn"]),
                    batch_format="pyarrow",
                ),
                ["l_partkey"],
                {"qs": "sum", "qn": "sum"},
            ).to_arrow_refs()
        )
    )
    # integer quantity sums -> the 0.2*AVG threshold is exact float math,
    # identical to DuckDB's regardless of summation order
    thresh = {
        k: 0.2 * (s / n)
        for k, s, n in zip(
            stats.column("l_partkey").to_pylist(),
            stats.column("qs").to_pylist(),
            stats.column("qn").to_pylist(),
        )
    }
    tref = (ray.put(thresh),)

    def small(t: pa.Table, _ref=tref) -> pa.Table:
        thresh = get_broadcast(_ref, tag="q17_thresh")
        pk = t.column("l_partkey").to_pylist()
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
        keep = np.array([q < thresh[k] for k, q in zip(pk, qty)], bool)
        return pa.table(
            {"p": t.filter(pa.array(keep)).column("l_extendedprice")}
        )

    agg = _global_sums(
        filtered.map_batches(small, batch_format="pyarrow"), {"p": "_sum"}, "n_lines"
    )

    def finalize(t: pa.Table) -> pa.Table:
        avg = pc.divide(t.column("_sum"), pa.scalar(7.0))
        out = pa.table({"avg_yearly": avg, "n_lines": t.column("n_lines")})
        return round_cols(out, {"avg_yearly": 2})

    return agg.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Q20 — suppliers with excess shipments of promoted parts.  Adaptation:
# no partsupp/availqty, so the "half of availqty" test becomes a fixed
# quantity threshold over 1997 shipments of 'red%' parts; the nation
# filter widens to reporting each qualifying supplier's nation.
# ---------------------------------------------------------------------------


@register(
    "q20_promo_suppliers",
    oracle="""
    WITH qty AS (
      SELECT l_suppkey, l_partkey, SUM(l_quantity) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      GROUP BY 1, 2
    )
    SELECT DISTINCT s_suppkey, s_name, n_name
    FROM qty
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE sq > 60
    """,
)
def q20_promo_suppliers(sf_dir: str):
    """TPC-H Q20 (potential part promotion): semi-join chain — part-name
    filter broadcasts as a key set, per-(supplier, part) quantity sums
    come from the combiner (integer sums, exact), the threshold cut and
    the DISTINCT both run on supplier-bounded data."""
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_name"]).to_pandas()
    red = set(part[part["p_name"].str.startswith("red")]["p_partkey"])
    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"]).to_pandas()
    nat = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"], nat["n_name"]))
    smap = {k: (n, name_of[nk]) for k, n, nk in zip(supp["s_suppkey"], supp["s_name"], supp["s_nationkey"])}
    dref = (ray.put((red, smap)),)

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_suppkey", "l_partkey", "l_quantity", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= datetime.datetime(1997, 1, 1))
            & (pc.field("l_shipdate") < datetime.datetime(1998, 1, 1))
        ),
    )

    def pre(t: pa.Table, _ref=dref) -> pa.Table:
        import pandas as pd

        red, _ = get_broadcast(_ref, tag="q20_dims")
        keep = pd.Series(t.column("l_partkey").to_pylist()).isin(red).to_numpy()
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "l_suppkey": t.column("l_suppkey"),
                "l_partkey": t.column("l_partkey"),
                "sq": t.column("l_quantity"),
            }
        )

    qty = merge_partials(
        li.map_batches(pre, batch_format="pyarrow"), ["l_suppkey", "l_partkey"], {"sq": "sum"}
    )

    def cut(t: pa.Table, _ref=dref) -> pa.Table:
        _, smap = get_broadcast(_ref, tag="q20_dims")
        t = t.filter(pc.greater(t.column("sq"), pa.scalar(60.0)))
        sk = t.column("l_suppkey").to_pylist()
        return pa.table(
            {
                "s_suppkey": t.column("l_suppkey"),
                "s_name": pa.array([smap[k][0] for k in sk], pa.string()),
                "n_name": pa.array([smap[k][1] for k in sk], pa.string()),
            }
        )

    return merge_partials(
        qty.map_batches(cut, batch_format="pyarrow"),
        ["s_suppkey", "s_name", "n_name"],
        {},
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept multi-supplier orders waiting.  Adaptation:
# no commit/receipt dates, so "late" = shipped more than 60 days after
# the order date; the exactly-one-late-supplier census is two stacked
# combiner aggregates (the MAX-picks-the-only-late-key trick keeps it
# key-functional).
# ---------------------------------------------------------------------------


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH ol AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY 1, 2
    ),
    po AS (
      SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late,
             MAX(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
      FROM ol GROUP BY 1
    )
    SELECT s_name, n_name, COUNT(*) AS numwait
    FROM po
    JOIN supplier ON s_suppkey = late_supp
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_supp >= 2 AND n_late = 1
    GROUP BY 1, 2
    """,
)
def q21_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 (suppliers who kept orders waiting): the EXISTS /
    NOT EXISTS pair collapses to a per-order census — (#suppliers,
    #late suppliers, the late supplier's key via MAX-over-late) — all
    key-functional, so both levels run on the shuffle-free combiner;
    supplier/nation attach by broadcast at the end."""
    orders = read_table(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
        filter=(pc.field("o_orderstatus") == "F"),
    ).select_columns(["o_orderkey", "o_orderdate"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    joined = large_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def late_flag(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").to_numpy(zero_copy_only=False)
        od = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        late = (ship > od + np.timedelta64(60, "D")).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "late": pa.array(late),
            }
        )

    ol = merge_partials(
        joined.map_batches(late_flag, batch_format="pyarrow"),
        ["l_orderkey", "l_suppkey"],
        {"late": "max"},
    )

    def census_in(t: pa.Table) -> pa.Table:
        late = t.column("late").to_numpy(zero_copy_only=False)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "one": pa.array(np.ones(len(t), np.int64)),
                "late": t.column("late"),
                "lk": pa.array(np.where(late == 1, sk, -1)),
            }
        )

    po = merge_partials(
        ol.map_batches(census_in, batch_format="pyarrow"),
        ["l_orderkey"],
        {"one": "sum", "late": "sum", "lk": "max"},
    )

    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"]).to_pandas()
    nat = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"], nat["n_name"]))
    smap = {k: (n, name_of[nk]) for k, n, nk in zip(supp["s_suppkey"], supp["s_name"], supp["s_nationkey"])}
    sref = (ray.put(smap),)

    def waiting(t: pa.Table, _ref=sref) -> pa.Table:
        smap = get_broadcast(_ref, tag="q21_supp")
        ns = t.column("one").to_numpy(zero_copy_only=False)
        nl = t.column("late").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((ns >= 2) & (nl == 1)))
        lk = t.column("lk").to_pylist()
        return pa.table(
            {
                "s_name": pa.array([smap[k][0] for k in lk], pa.string()),
                "n_name": pa.array([smap[k][1] for k in lk], pa.string()),
            }
        )

    return partial_group_agg(
        po.map_batches(waiting, batch_format="pyarrow"), ["s_name", "n_name"], count_alias="numwait"
    )


# ---------------------------------------------------------------------------
# Q22 — dormant wealthy customers.  Adaptation: no c_phone, so the
# country-code grouping becomes the customer's nation, and (this corpus
# gives every customer at least one order) "never ordered" becomes "no
# order since 2000-01-01".
# ---------------------------------------------------------------------------


@register(
    "q22_dormant_customers",
    oracle="""
    SELECT n_name, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1
    """,
)
def q22_dormant_customers(sf_dir: str):
    """TPC-H Q22 (global sales opportunity): the global positive-balance
    AVG is a one-row combiner scalar; NOT EXISTS runs on the engine's
    Bloom/broadcast anti-join against the distinct recent-order custkeys
    (`semi_anti_join_auto` — exact by construction); the final census is
    a per-nation combiner aggregate with the nation name broadcast."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_acctbal", "c_nationkey"])
    pos = cust.map_batches(
        lambda t: pa.table(
            {"b": t.filter(pc.greater(t.column("c_acctbal"), pa.scalar(0.0))).column("c_acctbal")}
        ),
        batch_format="pyarrow",
    )
    s = _one_row_scalars(_global_sums(pos, {"b": "_s"}, "_n"))
    avg_bal = s["_s"] / s["_n"]

    recent = read_table(
        sf_dir,
        "orders",
        columns=["o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= datetime.datetime(2000, 1, 1)),
    ).select_columns(["o_custkey"])
    dormant = semi_anti_join_auto(cust, recent, "c_custkey", "o_custkey", anti=True)

    rich = dormant.map_batches(
        lambda t: t.filter(pc.greater(t.column("c_acctbal"), pa.scalar(avg_bal))),
        batch_format="pyarrow",
    )
    agg = partial_group_agg(
        rich.map_batches(
            lambda t: pa.table(
                {"c_nationkey": t.column("c_nationkey"), "bal": t.column("c_acctbal")}
            ),
            batch_format="pyarrow",
        ),
        ["c_nationkey"],
        {"bal": "totacctbal"},
        count_alias="numcust",
    )

    nat = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"], nat["n_name"]))
    nref = (ray.put(name_of),)

    def attach(t: pa.Table, _ref=nref) -> pa.Table:
        name_of = get_broadcast(_ref, tag="q22_nat")
        nk = t.column("c_nationkey").to_pylist()
        out = pa.table(
            {
                "n_name": pa.array([name_of[k] for k in nk], pa.string()),
                "numcust": t.column("numcust"),
                "totacctbal": t.column("totacctbal"),
            }
        )
        return round_cols(out, {"totacctbal": 2})

    return agg.map_batches(attach, batch_format="pyarrow")
