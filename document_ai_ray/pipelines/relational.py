"""Relational operator suite over the driver's TPC-H-ish tables, each
entry oracle-checked against DuckDB (SURVEY.md §2.4-2.8 coverage).

Patterns (scale-first):
  - aggregates: partial (combiner) inside map_batches, tiny global
    groupby over partials (≙ reference metric aggregation,
    /root/reference/performances.py:53-79, done distributed);
  - small-side joins: broadcast via ray.put + per-worker cached
    lookup (≙ /root/reference/performances.py:131 pd.merge, distributed);
  - large-large joins: Ray hash-partitioned Dataset.join;
  - top-k: per-batch local top-k then tiny final pass — never a
    global sort (≙ best-template top-1,
    /root/reference/detection/template_matching.py:43-46);
  - windows: sessionize / rolling aggregates hash-BUCKET users and
    run one vectorized pandas pass per bucket (never one shuffle
    group per user).

Float columns are ROUNDed identically here and in the oracle SQL so
the driver's value-hash comparison is stable.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from document_ai_ray.pipelines.ops import (
    broadcast_join,
    distinct_values,
    large_join,
    partial_group_agg,
    round_cols,
    semi_anti_join_auto,
    skew_join,
    topk,
)
from document_ai_ray.pipelines.registry import register
from document_ai_ray.sources.tables import read_table

# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                      AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                 AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_quantity), 4)                      AS avg_qty,
           ROUND(AVG(l_discount), 4)                      AS avg_disc,
           COUNT(*)                                       AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filtered pricing summary with partial aggregation."""
    import datetime

    cutoff = datetime.datetime(2000, 9, 2)
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") <= cutoff),  # row-group pushdown at the read
    )

    def derive(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return t.append_column("disc_price", disc_price)

    ds = ds.map_batches(derive, batch_format="pyarrow")
    agg = partial_group_agg(
        ds,
        keys=["l_returnflag", "l_linestatus"],
        sum_cols={
            "l_quantity": "sum_qty",
            "l_extendedprice": "sum_base_price",
            "disc_price": "sum_disc_price",
            "l_discount": "_sum_disc",
        },
        count_alias="count_order",
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("count_order").cast(pa.float64())
        t = t.append_column("avg_qty", pc.divide(t.column("sum_qty"), n))
        t = t.append_column("avg_disc", pc.divide(t.column("_sum_disc"), n))
        t = t.drop_columns(["_sum_disc"])
        return round_cols(t, {"sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 2, "avg_qty": 4, "avg_disc": 4})

    return agg.map_batches(finalize, batch_format="pyarrow")


@register(
    "events_type_stats",
    oracle="""
    SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value,
           ROUND(AVG(value), 4) AS avg_value
    FROM events GROUP BY event_type
    """,
)
def events_type_stats(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])
    agg = partial_group_agg(ds, ["event_type"], {"value": "sum_value"}, count_alias="n")

    def finalize(t: pa.Table) -> pa.Table:
        t = t.append_column("avg_value", pc.divide(t.column("sum_value"), t.column("n").cast(pa.float64())))
        return round_cols(t, {"sum_value": 2, "avg_value": 4})

    return agg.map_batches(finalize, batch_format="pyarrow")


@register(
    "corpus_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(n_chars), 2) AS avg_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents GROUP BY lang
    """,
)
def corpus_stats(sf_dir: str):
    """Per-lang corpus statistics (the north_rule groupby-lang aggregate)."""
    from document_ai_ray.pipelines.ops import merge_partials

    ds = read_table(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("lang").aggregate(
            [([], "count_all"), ("n_chars", "sum"), ("n_chars", "min"), ("n_chars", "max")]
        )
        return pa.Table.from_arrays(
            [g.column("lang"), g.column("count_all"), g.column("n_chars_sum"),
             g.column("n_chars_min"), g.column("n_chars_max")],
            names=["lang", "n_docs", "_sum", "min_chars", "max_chars"],
        )

    out = merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["lang"],
        agg_funcs={"n_docs": "sum", "_sum": "sum", "min_chars": "min", "max_chars": "max"},
    )

    def finalize(t: pa.Table) -> pa.Table:
        t = t.append_column("avg_chars", pc.divide(t.column("_sum").cast(pa.float64()), t.column("n_docs").cast(pa.float64())))
        t = t.drop_columns(["_sum"])
        return round_cols(t, {"avg_chars": 2})

    return out.map_batches(finalize, batch_format="pyarrow")


@register(
    "month_orders",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS month, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders GROUP BY 1
    """,
)
def month_orders(sf_dir: str):
    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def derive(t: pa.Table) -> pa.Table:
        month = pc.floor_temporal(t.column("o_orderdate"), unit="month")
        return t.append_column("month", month).drop_columns(["o_orderdate"])

    ds = ds.map_batches(derive, batch_format="pyarrow")
    agg = partial_group_agg(ds, ["month"], {"o_totalprice": "sum_price"}, count_alias="n_orders")
    return agg.map_batches(lambda t: round_cols(t, {"sum_price": 2}), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Filters / projections / scalar functions
# ---------------------------------------------------------------------------


@register(
    "filter_project_revenue",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 2) AS revenue
    FROM lineitem WHERE l_quantity >= 48
    """,
)
def filter_project_revenue(sf_dir: str):
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_quantity") >= 48),
    )

    def project(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        out = pa.Table.from_arrays(
            [t.column("l_orderkey"), t.column("l_linenumber"), rev],
            names=["l_orderkey", "l_linenumber", "revenue"],
        )
        return round_cols(out, {"revenue": 2})

    return ds.map_batches(project, batch_format="pyarrow")


@register(
    "string_ops_parts",
    oracle="""
    SELECT p_partkey, UPPER(p_type) AS type_upper, LOWER(p_name) AS name_lower,
           LENGTH(p_name) AS name_len
    FROM part
    """,
)
def string_ops_parts(sf_dir: str):
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_name", "p_type"])

    def project(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                t.column("p_partkey"),
                pc.utf8_upper(t.column("p_type")),
                pc.utf8_lower(t.column("p_name")),
                pc.utf8_length(t.column("p_name")).cast(pa.int64()),
            ],
            names=["p_partkey", "type_upper", "name_lower", "name_len"],
        )

    return ds.map_batches(project, batch_format="pyarrow")


@register(
    "events_json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def events_json_extract(sf_dir: str):
    """JSON scalar extraction (≙ reference result-JSON handling,
    /root/reference/utils.py:16-19) done vectorized with a regex kernel."""
    ds = read_table(sf_dir, "events", columns=["event_id", "props"])

    def project(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column("props"), pattern=r'"k":\s*(?P<k>-?\d+)')
        k = pc.struct_field(m, "k").cast(pa.int64())
        return pa.Table.from_arrays([t.column("event_id"), k], names=["event_id", "k"])

    return ds.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Sorts / top-k / distinct
# ---------------------------------------------------------------------------


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_orders(sf_dir: str):
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = topk(ds, [("o_totalprice", True), ("o_orderkey", False)], k=10)
    return out.map_batches(lambda t: round_cols(t, {"o_totalprice": 2}), batch_format="pyarrow")


@register("distinct_segments", oracle="SELECT DISTINCT c_mktsegment FROM customer")
def distinct_segments(sf_dir: str):
    ds = read_table(sf_dir, "customer", columns=["c_mktsegment"])
    return distinct_values(ds, "c_mktsegment")


@register(
    "top_sources",
    oracle="""
    SELECT source, COUNT(*) AS n_docs FROM documents
    GROUP BY source ORDER BY n_docs DESC, source LIMIT 5
    """,
)
def top_sources(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["source"])
    agg = partial_group_agg(ds, ["source"], count_alias="n_docs")
    return topk(agg, [("n_docs", True), ("source", False)], k=5)


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "join_broadcast_segment",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_broadcast_segment(sf_dir: str):
    """Fact⋈dimension: broadcast the small side once, map-side join."""
    import pyarrow.parquet as pq
    import os

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"])
    joined = broadcast_join(ds, cust, key="o_custkey", right_key="c_custkey")
    agg = partial_group_agg(joined, ["c_mktsegment"], {"o_totalprice": "sum_price"}, count_alias="n_orders")
    return agg.map_batches(lambda t: round_cols(t, {"sum_price": 2}), batch_format="pyarrow")


@register(
    "join_region_customers",
    oracle="""
    SELECT r_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_region_customers(sf_dir: str):
    """Snowflake dimension chain: pre-join the tiny dims driver-side,
    broadcast the denormalized lookup once."""
    import os
    import pyarrow.parquet as pq

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    region = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")[["n_nationkey", "r_name"]]
    ds = read_table(sf_dir, "customer", columns=["c_nationkey"])
    joined = broadcast_join(ds, pa.Table.from_pandas(dim), key="c_nationkey", right_key="n_nationkey")
    return partial_group_agg(joined, ["r_name"], count_alias="n_customers")


@register(
    "join_large_priority",
    oracle="""
    SELECT o_orderpriority, ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_large_priority(sf_dir: str):
    """Fact⋈fact: hash-partitioned shuffle join on the shared key."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = large_join(li, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=8)
    agg = partial_group_agg(joined, ["o_orderpriority"], {"l_quantity": "sum_qty"}, count_alias="n_items")
    return agg.map_batches(lambda t: round_cols(t, {"sum_qty": 2}), batch_format="pyarrow")


@register(
    "join_events_skew",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment, e.value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def join_events_skew(sf_dir: str):
    """Skew-safe fact⋈dimension join (ops.skew_join): events.user_id is
    zipf-skewed, so the measured-hot keys join map-side against a
    broadcast of their (few) right rows while the long tail takes the
    hash-partitioned shuffle — no shuffle partition ever concentrates a
    hot key's rows.  Salting's goal with zero replication."""
    events = read_table(sf_dir, "events", columns=["event_id", "user_id", "value"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    return skew_join(
        events, cust, on="user_id", right_on="c_custkey", num_partitions=8, hot_frac=0.005
    )


@register(
    "anti_join_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def anti_join_customers(sf_dir: str):
    """Anti join, plan picked by distinct-key count: broadcast key set
    below the threshold, distributed Bloom pre-filter + exact verify
    join above it (ops.semi_anti_join_auto) — customers with no urgent
    order."""
    orders = read_table(
        sf_dir, "orders", columns=["o_custkey"], filter=(pc.field("o_orderpriority") == "1-URGENT")
    )
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return semi_anti_join_auto(cust, orders, "c_custkey", "o_custkey", anti=True)


@register(
    "semi_join_parts",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey IN (SELECT DISTINCT l_partkey FROM lineitem)
    """,
)
def semi_join_parts(sf_dir: str):
    li = read_table(sf_dir, "lineitem", columns=["l_partkey"])
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_name"])
    return semi_anti_join_auto(part, li, "p_partkey", "l_partkey", anti=False)


@register(
    "union_high_value",
    oracle="""
    SELECT COUNT(*) AS n FROM (
      SELECT o_orderkey FROM orders WHERE o_totalprice > 100000
      UNION ALL
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    """,
)
def union_high_value(sf_dir: str):
    a = read_table(sf_dir, "orders", columns=["o_orderkey"], filter=(pc.field("o_totalprice") > 100000))
    b = read_table(sf_dir, "orders", columns=["o_orderkey"], filter=(pc.field("o_orderpriority") == "1-URGENT"))
    n = a.union(b).count()
    return pa.Table.from_arrays([pa.array([n], pa.int64())], names=["n"])


# ---------------------------------------------------------------------------
# Windows / sessions (streaming-shaped; SURVEY.md §2.9)
# ---------------------------------------------------------------------------


@register(
    "events_hourly",
    oracle="""
    SELECT user_id, date_trunc('hour', ts) AS window_start,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly(sf_dir: str):
    """Tumbling window = truncate-to-window + groupby (combiner first)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t.column("ts"), unit="hour")
        return t.append_column("window_start", w).drop_columns(["ts"])

    ds = ds.map_batches(derive, batch_format="pyarrow")
    agg = partial_group_agg(ds, ["user_id", "window_start"], {"value": "sum_value"}, count_alias="n_events")
    return agg.map_batches(lambda t: round_cols(t, {"sum_value": 2}), batch_format="pyarrow")


@register(
    "events_sessionize",
    oracle="""
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id, CAST(sid AS BIGINT) AS session_id, MIN(ts) AS session_start,
           MAX(ts) AS session_end, COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def events_sessionize(sf_dir: str):
    """Gap-based sessionization: hash-BUCKET by user (P buckets, not
    one shuffle group per user — the per-distinct-group overhead of a
    native groupby(user) never appears), then ONE vectorized pandas
    pass per bucket sorts by (user, ts) and cuts sessions at >30 min
    gaps.  Partitioning assumption: per-user locality only."""
    import numpy as np
    import pandas as pd

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])
    P = 32

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.subtract(
                t.column("user_id"),
                pc.multiply(pc.divide(t.column("user_id"), pa.scalar(P)), pa.scalar(P)),
            ),
            pa.int32(),
        )
        return t.append_column("bucket", b)

    def sessionize_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        new_user = g["user_id"].ne(g["user_id"].shift())
        gaps = g["ts"].diff()
        new_s = (new_user | gaps.isna() | (gaps > pd.Timedelta(minutes=30))).astype(np.int64)
        sid_global = new_s.cumsum()
        # session_id restarts at 1 per user (same numbering as the
        # per-user window-function oracle)
        first_sid = sid_global.where(new_user).ffill()
        g = g.assign(session_id=(sid_global - first_sid + 1).astype(np.int64))
        out = g.groupby(["user_id", "session_id"], as_index=False).agg(
            session_start=("ts", "min"), session_end=("ts", "max"), n_events=("ts", "count")
        )
        return out[["user_id", "session_id", "session_start", "session_end", "n_events"]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: sessionize_bucket(g.drop(columns=["bucket"])), batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Dedup (exact)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_docs",
    oracle="SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text",
)
def dedup_exact_docs(sf_dir: str):
    """Exact dedup: 128-bit content hash per row, LOCAL min-per-hash
    combiner inside the batch, then a hash-BUCKET shuffle (groups = P
    buckets, not N docs) with a vectorized per-bucket dedup — grouping
    moves 32-byte hashes, never the documents, and the per-distinct-
    group overhead of a native groupby('h') never appears (SURVEY.md
    §2.7).  Correct at any scale: equal hashes land in equal buckets."""
    from document_ai_ray.functions.hashing import stable_hex

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    P = 64

    def add_hash_local_dedup(t: pa.Table) -> pa.Table:
        h = pa.array([stable_hex(x) for x in t.column("text").to_pylist()], pa.string())
        t = pa.Table.from_arrays([t.column("doc_id"), h], names=["doc_id", "h"])
        g = t.group_by("h").aggregate([("doc_id", "min")])  # combiner
        bucket = pa.array(
            [int(x[:8], 16) % P for x in g.column("h").to_pylist()], pa.int32()
        )
        return pa.Table.from_arrays(
            [g.column("doc_id_min"), g.column("h"), bucket], names=["doc_id", "h", "bucket"]
        )

    def per_bucket(df) -> "pd.DataFrame":
        return df.groupby("h", as_index=False).agg(doc_id=("doc_id", "min"))[["doc_id"]]

    hashed = ds.map_batches(add_hash_local_dedup, batch_format="pyarrow")
    return hashed.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# Sliding-window aggregate + sampling
# ---------------------------------------------------------------------------


@register(
    "events_rolling_1h",
    oracle="""
    WITH per_ts AS (
      SELECT user_id, ts, COUNT(*) AS n, SUM(value) AS v
      FROM events GROUP BY user_id, ts
    )
    SELECT user_id, ts,
           CAST(SUM(n) OVER w AS BIGINT) AS window_n,
           ROUND(SUM(v) OVER w, 2) AS window_sum
    FROM per_ts
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def events_rolling_1h(sf_dir: str):
    """SLIDING window aggregate (the custom-operator class Ray Data has
    no primitive for): per (user, ts), events/value-sum over the
    trailing 1 hour.  Hash-partition by user (groupby), per-group
    VECTORIZED pandas time rolling after a (user, ts) pre-aggregation —
    pre-aggregating first makes tie handling identical to SQL's RANGE
    frame (whole peer groups), and the partitioning assumption is
    per-user locality only, same as sessionize."""
    import numpy as np
    import pandas as pd

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])
    P = 32

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.subtract(
                t.column("user_id"),
                pc.multiply(pc.divide(t.column("user_id"), pa.scalar(P)), pa.scalar(P)),
            ),
            pa.int32(),
        )
        return t.append_column("bucket", b)

    def roll_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized: one (user, ts) pre-aggregation + ONE
        # group-keyed time rolling over the whole bucket — no per-user
        # Python loop
        per_ts = (
            g.groupby(["user_id", "ts"], as_index=False)
            .agg(n=("value", "size"), v=("value", "sum"))
            .sort_values(["user_id", "ts"], kind="mergesort")
        )
        # closed='both' => window [t-1h, t], matching RANGE ... PRECEDING
        r = (
            per_ts.set_index("ts")
            .groupby("user_id")[["n", "v"]]
            .rolling("1h", closed="both")
            .sum()
            .reset_index(drop=True)
        )
        v = r["v"].to_numpy()
        ws = np.copysign(np.floor(np.abs(v) * 100 + 0.5), v) / 100
        return pd.DataFrame(
            {
                "user_id": per_ts["user_id"].to_numpy(),
                "ts": per_ts["ts"].to_numpy(),
                "window_n": r["n"].to_numpy().astype(np.int64),
                "window_sum": ws,
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: roll_bucket(g.drop(columns=["bucket"])), batch_format="pandas")
    )


@register(
    "orders_sample_systematic",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 20 = 3
    """,
)
def orders_sample_systematic(sf_dir: str):
    """Deterministic systematic sample (key mod N) — reproducible across
    runs/engines, unlike RNG sampling; pairs with `orders_sample_random`
    for the seeded-RNG variant."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def pick(t: pa.Table) -> pa.Table:
        mod = pc.subtract(
            t.column("o_orderkey"),
            pc.multiply(pc.divide(t.column("o_orderkey"), pa.scalar(20)), pa.scalar(20)),
        )
        return t.filter(pc.equal(mod, pa.scalar(3)))

    return ds.map_batches(pick, batch_format="pyarrow")


# Bernoulli(p) by hash threshold (the md5-threshold technique proven
# by sample_docs_weighted): u = first 8 md5 hex chars of key||seed,
# keep iff u < p * 2^32.  8-char hex strings compare lexicographically
# exactly as their integers, so both sides do the same comparison.
_RSAMPLE_SEED = "rsample-r4"
_RSAMPLE_THRESH = int(0.1 * (1 << 32))  # p = 0.1


@register(
    "orders_sample_random",
    oracle=f"""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR) || '-{_RSAMPLE_SEED}'), 1, 8)
          < lpad(lower(to_hex({_RSAMPLE_THRESH})), 8, '0')
    """,
)
def orders_sample_random(sf_dir: str):
    """Seeded Bernoulli(0.1) random sample, oracle-promoted (r3 verdict
    #9): per-key md5 hash compared against the probability threshold —
    uniform, reproducible across engines/runs (no RNG state), and a
    pure per-batch filter (no shuffle), unlike Dataset.random_sample
    whose block-level RNG is engine-specific."""
    import hashlib

    import numpy as np

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def keep(t: pa.Table) -> pa.Table:
        u = np.array(
            [
                int(hashlib.md5(f"{k}-{_RSAMPLE_SEED}".encode()).hexdigest()[:8], 16)
                for k in t.column("o_orderkey").to_pylist()
            ],
            dtype=np.int64,
        )
        return t.filter(pa.array(u < _RSAMPLE_THRESH))

    return ds.map_batches(keep, batch_format="pyarrow")


@register(
    "top_orders_per_priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey) <= 3
    """,
)
def top_orders_per_priority(sf_dir: str):
    """Grouped top-k (top-3 orders by price per priority) via the
    combiner pattern: per-batch local top-k per key, then one coalesced
    final top-k — k x groups x blocks rows move, never the table."""
    from document_ai_ray.pipelines.ops import grouped_topk

    ds = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_orderkey", "o_totalprice"])
    return grouped_topk(
        ds,
        keys=["o_orderpriority"],
        sort_cols=[("o_totalprice", False), ("o_orderkey", True)],
        k=3,
    )


@register(
    "orders_asof_prev",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT a.o_orderkey, b.o_orderkey AS prev_orderkey,
           date_diff('day', b.o_orderdate, a.o_orderdate) AS gap_days
    FROM o a ASOF LEFT JOIN o b
      ON a.o_custkey = b.o_custkey AND a.o_orderdate > b.o_orderdate
    """,
)
def orders_asof_prev(sf_dir: str):
    """AS-OF JOIN (the custom-operator class Ray Data has no primitive
    for): each order joined to the customer's most recent STRICTLY
    earlier order.  Expressed as hash-bucket by customer + one
    vectorized per-bucket pass (dedupe ties per (custkey, date) to the
    max orderkey, sort, per-customer shift) — the sorted-merge as-of
    semantics with per-key locality as the only partitioning
    assumption.  Oracle: DuckDB's native ASOF LEFT JOIN."""
    import numpy as np
    import pandas as pd

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_orderkey"])
    P = 32

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.subtract(
                t.column("o_custkey"),
                pc.multiply(pc.divide(t.column("o_custkey"), pa.scalar(P)), pa.scalar(P)),
            ),
            pa.int32(),
        )
        return t.append_column("bucket", b)

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["o_custkey", "o_orderdate"], as_index=False).agg(
            o_orderkey=("o_orderkey", "max")
        )
        g = g.sort_values(["o_custkey", "o_orderdate"], kind="mergesort")
        g["prev_orderkey"] = g.groupby("o_custkey")["o_orderkey"].shift(1)
        prev_date = g.groupby("o_custkey")["o_orderdate"].shift(1)
        g["gap_days"] = (g["o_orderdate"] - prev_date).dt.days
        return g[["o_orderkey", "prev_orderkey", "gap_days"]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: asof_bucket(g.drop(columns=["bucket"])), batch_format="pandas")
    )


_PRICE_EDGES = [0, 1000, 2500, 5000, 10000, 20000, 40000, 80000, 1000000000]


@register(
    "range_join_price_bands",
    oracle=f"""
    WITH bands AS (
      SELECT i AS band_id, edges[i+1] AS lo, edges[i+2] AS hi
      FROM (SELECT {_PRICE_EDGES} AS edges), range({len(_PRICE_EDGES) - 1}) t(i)
    )
    SELECT l_orderkey, l_linenumber, b.band_id
    FROM lineitem l JOIN bands b
      ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
    """,
)
def range_join_price_bands(sf_dir: str):
    """RANGE JOIN (interval-containment, non-uniform band edges): each
    lineitem row joined to the price band containing its extended
    price.  Ray side: the (sorted, tiny) interval table is broadcast as
    plain band edges and the join is one vectorized np.searchsorted per
    batch — the classic sorted-interval range-join kernel, no shuffle.
    Oracle: an explicit BETWEEN-style range join in DuckDB."""
    import numpy as np

    edges = np.asarray(_PRICE_EDGES, dtype=np.float64)
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_extendedprice"])

    def band(t: pa.Table) -> pa.Table:
        p = t.column("l_extendedprice").to_numpy()
        band_id = np.searchsorted(edges, p, side="right") - 1
        return pa.Table.from_arrays(
            [t.column("l_orderkey"), t.column("l_linenumber"), pa.array(band_id, pa.int64())],
            names=["l_orderkey", "l_linenumber", "band_id"],
        )

    return ds.map_batches(band, batch_format="pyarrow")


@register(
    "full_outer_join_sides",
    oracle="""
    WITH l AS (SELECT o_custkey AS k, COUNT(*) AS n_ord
               FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
    r AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING')
    SELECT CASE WHEN l.k IS NULL THEN 'right_only'
                WHEN r.k IS NULL THEN 'left_only'
                ELSE 'both' END AS side,
           COUNT(*) AS n, CAST(COALESCE(SUM(l.n_ord), 0) AS BIGINT) AS n_orders
    FROM l FULL OUTER JOIN r ON l.k = r.k
    GROUP BY 1
    """,
)
def full_outer_join_sides(sf_dir: str):
    """FULL OUTER join semantics (both-sides-large) WITHOUT Ray's native
    hash-shuffle join: urgent orders' customer keys ⟗ BUILDING-segment
    customers, reported as a per-side key/order census.

    The r3 verdict flagged the previous `Dataset.join(join_type=
    "full_outer")` plan as non-deterministic under the driver (the same
    hash-shuffle machinery that hangs with groupby in this Ray build),
    so the query now rides the engine's proven shape: tag each side,
    union, hash-bucket on the key (disjoint key groups per bucket), and
    classify per key inside the bucket with one vectorized pandas pass
    — exactly the `set_op_keys` pattern (ops.py) extended with the
    left's order counts.  Left rows are pre-collapsed by the combiner
    (one row per customer) before the exchange; each bucket emits at
    most 3 census rows, so the final merge sees n_buckets×3 rows."""
    import numpy as np

    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, merge_partials

    orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderpriority"],
        filter=(pc.field("o_orderpriority") == "1-URGENT"),
    )
    left = partial_group_agg(orders, ["o_custkey"], count_alias="n_ord")
    cust = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment"],
        filter=(pc.field("c_mktsegment") == "BUILDING"),
    ).select_columns(["c_custkey"])
    n_buckets = auto_buckets(cust.count())

    def tag(side: int, key: str):
        def fn(t: pa.Table) -> pa.Table:
            k = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
            n_ord = (
                t.column("n_ord").to_numpy(zero_copy_only=False).astype(np.int64)
                if side == 0
                else np.zeros(len(t), np.int64)
            )
            bk = (k.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(n_buckets)
            return pa.table(
                {
                    "k": pa.array(k, pa.int64()),
                    "n_ord": pa.array(n_ord, pa.int64()),
                    "side": pa.array(np.full(len(t), side, np.int8)),
                    "bk": pa.array(bk.astype(np.int64)),
                }
            )

        return fn

    union = left.map_batches(tag(0, "o_custkey"), batch_format="pyarrow").union(
        cust.map_batches(tag(1, "c_custkey"), batch_format="pyarrow")
    )

    def census(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "side": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
        df = t.to_pandas()
        per_key = df.groupby("k").agg(
            has_l=("side", "min"), has_r=("side", "max"), n_ord=("n_ord", "sum")
        )
        label = np.where(
            per_key["has_l"] == 1,
            "right_only",
            np.where(per_key["has_r"] == 0, "left_only", "both"),
        )
        out = (
            per_key.assign(side=label)
            .groupby("side")
            .agg(n=("n_ord", "size"), n_orders=("n_ord", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "side": pa.array(out["side"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                "n_orders": pa.array(out["n_orders"], pa.int64()),
            }
        )

    partials = bucket_map_groups(union, "bk", census, n_buckets)
    return merge_partials(partials, ["side"], {"n": "sum", "n_orders": "sum"}).select_columns(
        ["side", "n", "n_orders"]
    )


# ---------------------------------------------------------------------------
# CIDR longest-prefix-match join (GeoIP-style weblog enrichment)
# ---------------------------------------------------------------------------

# (prefix, plen, label): overlapping blocks — /12 inside /8 inside /4 —
# so the LONGEST match genuinely decides.  Prefix = the top `plen` bits.
_CIDR_RULES = [
    (0b0000, 4, "net_a"),              # 0.0.0.0/4
    (0b0100, 4, "net_b"),              # 64.0.0.0/4
    (0b1000, 4, "net_c"),              # 128.0.0.0/4
    (0b00000001, 8, "net_a_dc1"),      # 1.0.0.0/8   (inside net_a)
    (0b01000010, 8, "net_b_dc2"),      # 66.0.0.0/8  (inside net_b)
    (0b100000011000, 12, "net_c_pop"), # 129.128.0.0/12 (inside net_c)
]

_IP_SQL = "(CAST(user_id AS BIGINT) * 2654435761) % 4294967296"


@register(
    "cidr_lookup_events",
    # the oracle replays longest-prefix-match over the same rule table:
    # match = top plen bits equal, pick max plen, default 'unknown'
    oracle=f"""
    WITH e AS (SELECT event_id, {_IP_SQL} AS ip FROM events),
    rules(prefix, plen, label) AS (VALUES
      (0, 4, 'net_a'), (4, 4, 'net_b'), (8, 4, 'net_c'),
      (1, 8, 'net_a_dc1'), (66, 8, 'net_b_dc2'), (2072, 12, 'net_c_pop')),
    m AS (SELECT e.event_id, r.label,
                 ROW_NUMBER() OVER (PARTITION BY e.event_id
                                    ORDER BY r.plen DESC) AS rn
          FROM e JOIN rules r ON (e.ip >> (32 - r.plen)) = r.prefix)
    SELECT COALESCE(m.label, 'unknown') AS label, COUNT(*) AS n
    FROM e LEFT JOIN m ON m.event_id = e.event_id AND m.rn = 1
    GROUP BY 1
    """,
)
def cidr_lookup_events(sf_dir: str):
    """Longest-prefix-match (CIDR) join — the GeoIP/ASN enrichment
    shape: every event's synthetic IPv4 (a Knuth multiplicative hash of
    user_id, replayed bit-for-bit by the oracle) is matched against an
    overlapping prefix table and the LONGEST prefix wins.  Distributed
    shape: the prefix table is broadcast-scale by nature (real GeoIP is
    ~10^6 rows — a worker-cache dict, never a shuffle); matching is one
    streaming pass, vectorized per prefix LENGTH (mask the IP to each
    length present, probe a dict, keep the longest hit — at most ~32
    probes per batch, not per row).  Output is the per-label census."""
    import numpy as np

    from document_ai_ray.pipelines.ops import partial_group_agg

    by_len: dict[int, dict[int, str]] = {}
    for prefix, plen, label in _CIDR_RULES:
        by_len.setdefault(plen, {})[prefix] = label
    lens_desc = sorted(by_len, reverse=True)

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id"])

    def match(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ip = (uid * 2654435761) % 4294967296
        label = np.full(len(ip), "unknown", dtype=object)
        undecided = np.ones(len(ip), bool)
        for plen in lens_desc:  # longest first: first hit is final
            keys = ip >> (32 - plen)
            table = by_len[plen]
            hit = np.array([int(k) in table for k in keys], bool) & undecided
            if hit.any():
                label[hit] = [table[int(k)] for k in keys[hit]]
                undecided &= ~hit
        return pa.table({"label": pa.array(label.tolist(), pa.string())})

    return partial_group_agg(
        ds.map_batches(match, batch_format="pyarrow"), ["label"], count_alias="n"
    ).select_columns(["label", "n"])


# ---------------------------------------------------------------------------
# Blocked fuzzy join (edit-distance record linkage)
# ---------------------------------------------------------------------------

_FUZZY_ORACLE = """
WITH p AS (SELECT p_partkey, p_name, len(p_name) AS l FROM part),
c AS (SELECT p_partkey,
             CASE WHEN l >= 8
                  THEN substr(p_name, 1, p_partkey % l) || substr(p_name, p_partkey % l + 2)
                  ELSE p_name END AS cname
      FROM p),
names AS (SELECT DISTINCT p_name FROM part),
j AS (SELECT DISTINCT c.p_partkey, n.p_name, levenshtein(c.cname, n.p_name) AS dist
      FROM c JOIN names n
        ON (substr(c.cname, 1, 4) = substr(n.p_name, 1, 4)
            OR substr(c.cname, len(c.cname) - 3) = substr(n.p_name, len(n.p_name) - 3)))
SELECT p_partkey, p_name AS matched_name, dist FROM j WHERE dist <= 1
"""


@register("fuzzy_join_names", oracle=_FUZZY_ORACLE)
def fuzzy_join_names(sf_dir: str):
    """BLOCKED FUZZY JOIN (edit-distance record linkage): every part
    name is deterministically corrupted by one character deletion
    (position p_partkey % len, names shorter than 8 left intact — the
    oracle replays the corruption with substr surgery), then linked
    back to the clean name dictionary under Levenshtein <= 1 with
    prefix-4 / suffix-4 BLOCKING.  Pigeonhole guarantee: a single
    deletion in a name of length >= 8 preserves the first four or the
    last four characters, so blocked recall of the planted matches is
    exactly 1 — and both engines evaluate the identical blocked spec.
    Distributed shape: two block keys per record on each side, hash-
    bucketed co-grouping, banded-early-exit Levenshtein verify inside
    the bucket (the same candidates-then-verify discipline as the LSH
    dedup pipelines; a real 10^9-row linkage would swap prefix blocks
    for q-gram or soundex keys, same shape)."""
    import numpy as np
    import pandas as pd

    from document_ai_ray.functions.hashing import crc_bucket
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.functions.strings import levenshtein
    from document_ai_ray.pipelines.ops import bucket_map_groups

    parts = read_table(sf_dir, "part", columns=["p_partkey", "p_name"])
    P = auto_buckets(parts.count() * 2)

    def corrupt_and_key(t: pa.Table) -> pa.Table:
        keys, names, kinds, bkinds, blocks, buckets = [], [], [], [], [], []
        for pk, name in zip(t.column("p_partkey").to_pylist(), t.column("p_name").to_pylist()):
            cname = name
            if len(name) >= 8:
                pos = pk % len(name)
                cname = name[:pos] + name[pos + 1 :]
            # block KIND travels with the value: prefix blocks only pair
            # with prefix blocks, suffix with suffix — the declared
            # blocked spec (and exactly the oracle's prefix=prefix OR
            # suffix=suffix join), not any-block-value co-residence
            for bk_kind, block in ((0, cname[:4]), (1, cname[-4:])):
                keys.append(pk)
                names.append(cname)
                kinds.append(0)  # corrupted side
                bkinds.append(bk_kind)
                blocks.append(block)
                buckets.append(crc_bucket(block, P))
        return pa.table(
            {
                "pk": pa.array(keys, pa.int64()),
                "name": pa.array(names, pa.string()),
                "kind": pa.array(kinds, pa.int8()),
                "bk_kind": pa.array(bkinds, pa.int8()),
                "block": pa.array(blocks, pa.string()),
                "bucket": pa.array(buckets, pa.int32()),
            }
        )

    def dict_and_key(t: pa.Table) -> pa.Table:
        seen = set(t.column("p_name").to_pylist())
        keys, names, kinds, bkinds, blocks, buckets = [], [], [], [], [], []
        for name in seen:  # per-batch distinct; global dedupe in-bucket
            for bk_kind, block in ((0, name[:4]), (1, name[-4:])):
                keys.append(-1)
                names.append(name)
                kinds.append(1)  # dictionary side
                bkinds.append(bk_kind)
                blocks.append(block)
                buckets.append(crc_bucket(block, P))
        return pa.table(
            {
                "pk": pa.array(keys, pa.int64()),
                "name": pa.array(names, pa.string()),
                "kind": pa.array(kinds, pa.int8()),
                "bk_kind": pa.array(bkinds, pa.int8()),
                "block": pa.array(blocks, pa.string()),
                "bucket": pa.array(buckets, pa.int32()),
            }
        )

    left = parts.map_batches(corrupt_and_key, batch_format="pyarrow")
    right = parts.map_batches(dict_and_key, batch_format="pyarrow")

    def link(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        # match on the BLOCK VALUE AND KIND (not mere bucket
        # co-residence: a CRC collision of two different blocks must not
        # create candidates the oracle's blocked join would exclude, and
        # a corrupted-name prefix block must not pair with a dictionary
        # SUFFIX block for names shorter than the two-block overlap)
        for _, bgrp in df.groupby(["block", "bk_kind"]):
            cand = bgrp[bgrp["kind"] == 0].drop_duplicates(["pk", "name"])
            dic = bgrp[bgrp["kind"] == 1].drop_duplicates(["name"])
            if cand.empty or dic.empty:
                continue
            for cname, grp in cand.groupby("name"):
                pks = grp["pk"].to_numpy()
                for dname in dic["name"]:
                    d = levenshtein(cname, dname, limit=1)
                    if d <= 1:
                        for pk in pks:
                            rows.append((int(pk), dname, int(d)))
        if not rows:
            return pd.DataFrame(
                {"p_partkey": pd.Series([], dtype="int64"),
                 "matched_name": pd.Series([], dtype="object"),
                 "dist": pd.Series([], dtype="int64")}
            )
        out = pd.DataFrame(rows, columns=["p_partkey", "matched_name", "dist"])
        return out

    linked = bucket_map_groups(left.union(right), "bucket", link, P, batch_format="pandas")

    # a pair can surface from both of its blocks: global dedupe
    P2 = auto_buckets(parts.count())

    def pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = (df["p_partkey"] % P2).astype("int32")
        return df

    def dedupe(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["p_partkey", "matched_name"])

    return bucket_map_groups(
        linked.map_batches(pair_bucket, batch_format="pandas"), "bucket", dedupe, P2,
        batch_format="pandas",
    )


@register(
    "partition_pruned_scan",
    oracle="""
    SELECT doc_id, source, n_chars FROM documents WHERE lang = 'en'
    """,
)
def partition_pruned_scan(sf_dir: str):
    """Hive-partitioned write + PARTITION-PRUNED read (the lakehouse
    data-layout discipline): documents are written once as
    lang=<v>/... parquet directories (Ray's partition_cols), then the
    lang='en' read opens ONLY that directory — the pruning happens at
    the PATH level, before any byte of the other partitions is read.
    The pruned-read CONTENT is oracle-checked against the plain SQL
    filter; the pruning itself (files under lang=en/ vs total) is
    asserted in tests/test_relational_extras.py.  Scratch output under
    /tmp, re-written per run (same discipline as the WARC roundtrip)."""
    import os

    import ray.data as rd

    from document_ai_ray.functions.scratch import scratch_dir

    out_dir = scratch_dir("partition_demo")
    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang", "source", "n_chars"])
    docs.write_parquet(out_dir, partition_cols=["lang"])

    pruned = rd.read_parquet(os.path.join(out_dir, "lang=en"))
    return pruned.select_columns(["doc_id", "source", "n_chars"])


# ---------------------------------------------------------------------------
# Lakehouse maintenance: MERGE/upsert + incremental aggregate
# ---------------------------------------------------------------------------

_UPSERT_ORACLE = """
WITH base AS (SELECT c_custkey, c_mktsegment, c_acctbal, 0 AS ver FROM customer),
upd AS (SELECT c_custkey, 'UPDATED' AS c_mktsegment,
               ROUND(c_acctbal + 100.0, 2) AS c_acctbal, 1 AS ver
        FROM customer WHERE c_custkey % 10 = 3),
ins AS (SELECT 1000000 + c_custkey AS c_custkey, 'FRESH' AS c_mktsegment,
               ROUND(c_acctbal, 2) AS c_acctbal, 1 AS ver
        FROM customer WHERE c_custkey % 10 = 7),
all_rows AS (SELECT * FROM base UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM ins),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY ver DESC) AS rn
      FROM all_rows)
SELECT c_custkey, c_mktsegment, ROUND(c_acctbal, 2) AS c_acctbal
FROM r WHERE rn = 1
"""


@register("merge_upsert_customers", oracle=_UPSERT_ORACLE)
def merge_upsert_customers(sf_dir: str):
    """MERGE INTO / upsert (the lakehouse table-maintenance primitive):
    a derived delta batch UPDATEs every custkey%10==3 row and INSERTs
    fresh keys, applied over the base snapshot with last-writer-wins.
    Distributed shape: tag rows with a version, hash-bucket by key, one
    vectorized keep-max-version pass per bucket — the same
    first-per-key discipline as `dedup_exact_docs`, never a sort of
    the full table.  Oracle replays the merge with a window."""
    import numpy as np
    import pandas as pd

    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups

    base = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment", "c_acctbal"])
    P = auto_buckets(base.count())

    def _round2(x):
        # DuckDB ROUND is half-away-from-zero; np.round is half-to-even
        # — use the repo's copysign/floor idiom so 2.005-style halves
        # agree with the oracle regardless of input decimals
        return np.copysign(np.floor(np.abs(x) * 100.0 + 0.5), x) / 100.0

    def tag_base(t: pa.Table) -> pa.Table:
        bal = t.column("c_acctbal").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_mktsegment": t.column("c_mktsegment"),
                "c_acctbal": pa.array(_round2(bal), pa.float64()),
                "ver": pa.array(np.zeros(len(t), np.int8)),
            }
        )

    def make_delta(t: pa.Table) -> pa.Table:
        keys = t.column("c_custkey").to_numpy(zero_copy_only=False)
        bal = t.column("c_acctbal").to_numpy(zero_copy_only=False)
        upd = keys % 10 == 3
        ins = keys % 10 == 7
        out_keys = np.concatenate([keys[upd], 1000000 + keys[ins]])
        out_seg = ["UPDATED"] * int(upd.sum()) + ["FRESH"] * int(ins.sum())
        out_bal = np.concatenate([_round2(bal[upd] + 100.0), _round2(bal[ins])])
        return pa.table(
            {
                "c_custkey": pa.array(out_keys, pa.int64()),
                "c_mktsegment": pa.array(out_seg, pa.string()),
                "c_acctbal": pa.array(out_bal, pa.float64()),
                "ver": pa.array(np.ones(len(out_keys), np.int8)),
            }
        )

    tagged = base.map_batches(tag_base, batch_format="pyarrow").union(
        read_table(sf_dir, "customer", columns=["c_custkey", "c_acctbal"]).map_batches(
            make_delta, batch_format="pyarrow"
        )
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((k % P).astype(np.int32)))

    def keep_latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["c_custkey", "ver"], ascending=[True, False], kind="mergesort")
        out = df.drop_duplicates("c_custkey", keep="first")
        return out[["c_custkey", "c_mktsegment", "c_acctbal"]]

    return bucket_map_groups(
        tagged.map_batches(add_bucket, batch_format="pyarrow"), "bucket", keep_latest, P,
        batch_format="pandas",
    )


_INC_ORACLE = """
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY 1
"""


@register("incremental_agg_maintenance", oracle=_INC_ORACLE)
def incremental_agg_maintenance(sf_dir: str):
    """INCREMENTAL aggregate maintenance: the base aggregate (events in
    the first half of the time range) is computed once, then the delta
    batch (second half) is aggregated ALONE and merged into the base —
    no rescan of base facts.  This is the materialized-view update
    shape every streaming warehouse uses; correctness = the merged
    result equals the full recompute (the oracle IS the full
    recompute).  Both sides are tiny combiner outputs; the merge is
    one pandas concat-groupby on group-cardinality rows."""
    import numpy as np
    import pandas as pd

    from document_ai_ray.pipelines.ops import partial_group_agg

    # split on event_id parity — any disjoint partition demonstrates
    # the merge; vectorized batch filters, never per-row lambdas
    def parity(keep_even: bool):
        def f(t: pa.Table) -> pa.Table:
            k = t.column("event_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array((k % 2 == 0) == keep_even))

        return f

    ev = lambda: read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])
    base = ev().map_batches(parity(True), batch_format="pyarrow")
    delta = ev().map_batches(parity(False), batch_format="pyarrow")
    base_agg = partial_group_agg(base, ["event_type"], {"value": "sum_value"}, count_alias="n")
    delta_agg = partial_group_agg(delta, ["event_type"], {"value": "sum_value"}, count_alias="n")

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum")
        )
        sv = out["sum_value"].to_numpy()
        out["sum_value"] = np.copysign(np.floor(np.abs(sv) * 100 + 0.5), sv) / 100
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out[["event_type", "n", "sum_value"]], preserve_index=False)

    return (
        base_agg.union(delta_agg)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=1 << 30)
    )


@register(
    "ship_delay_by_priority",
    oracle="""
    SELECT o_orderpriority,
           ROUND(AVG(CAST(date_diff('day', o_orderdate, l_shipdate) AS DOUBLE)), 2)
             AS avg_ship_days,
           COUNT(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def ship_delay_by_priority(sf_dir: str):
    """Timestamp arithmetic across a fact⋈fact join: per-priority mean
    order→ship latency in whole days.  Shape: hash-partitioned shuffle
    join on the order key (neither side broadcastable at scale), the
    day-difference computed vectorized on the epoch-microsecond
    integers, then the combiner aggregate.  date_diff('day') truncates
    toward zero on whole-day timestamps — both sides operate on the
    identical integer-division form."""
    import numpy as np

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    joined = large_join(li, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=8)

    def delay(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        ordd = t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = (ship - ordd) // 86_400_000_000  # whole days, µs timestamps
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "days": pa.array(days.astype(np.float64), pa.float64()),
            }
        )

    agg = partial_group_agg(
        joined.map_batches(delay, batch_format="pyarrow"),
        ["o_orderpriority"],
        {"days": "sum_days"},
        count_alias="n",
    )

    def finish(t: pa.Table) -> pa.Table:
        import numpy as np

        s = t.column("sum_days").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        avg = s / n
        avg = np.copysign(np.floor(np.abs(avg) * 100 + 0.5), avg) / 100
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "avg_ship_days": pa.array(avg, pa.float64()),
                "n": t.column("n"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


@register(
    "data_quality_checks",
    oracle="""
    SELECT 'doc_id_unique' AS rule,
           CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT) AS n_violations
    FROM documents
    UNION ALL
    SELECT 'text_nonempty', CAST(SUM(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'lang_in_domain', CAST(SUM(CASE WHEN lang NOT IN ('de','en','es','fr','it','zh') THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'n_chars_matches_text', CAST(SUM(CASE WHEN n_chars != len(text) THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'n_chars_in_range', CAST(SUM(CASE WHEN n_chars < 1 OR n_chars > 100000 THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents
    """,
)
def data_quality_checks(sf_dir: str):
    """Deequ-style data-quality constraint suite over the corpus table:
    key uniqueness, non-emptiness, domain membership, derived-column
    consistency (n_chars == len(text)) and range bounds — each rule a
    per-batch vectorized violation COUNTER (combiner partials summed in
    one tiny merge), uniqueness as count(*) − approx-free exact
    distinct via the bucketed key-dedup census.  One scan for the four
    row-local rules; one key-shuffle (hash-bucketed, count-only) for
    uniqueness — nothing row-sized leaves a task."""
    import numpy as np
    import pandas as pd

    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "n_chars"])
    P = auto_buckets(docs.count())
    domain = {"de", "en", "es", "fr", "it", "zh"}

    def rowlocal(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        langs = t.column("lang").to_pylist()
        nch = t.column("n_chars").to_numpy(zero_copy_only=False)
        empty = sum(1 for x in texts if x is None or x == "")
        bad_lang = sum(1 for x in langs if x not in domain)
        tlen = np.fromiter((len(x or "") for x in texts), np.int64, len(texts))
        mismatch = int((nch != tlen).sum())
        out_of_range = int(((nch < 1) | (nch > 100000)).sum())
        return pa.table(
            {
                "rule": pa.array(
                    ["text_nonempty", "lang_in_domain", "n_chars_matches_text", "n_chars_in_range"],
                    pa.string(),
                ),
                "n_violations": pa.array(
                    [empty, bad_lang, mismatch, out_of_range], pa.int64()
                ),
            }
        )

    local = partial_group_agg(
        docs.map_batches(rowlocal, batch_format="pyarrow"),
        ["rule"],
        {"n_violations": "n_violations"},
    )

    # uniqueness: per-bucket (count - distinct) over the key column only
    def key_bucket(t: pa.Table) -> pa.Table:
        k = t.column("doc_id").to_numpy(zero_copy_only=False)
        import numpy as np

        return pa.table(
            {"doc_id": t.column("doc_id"), "bucket": pa.array((k % P).astype(np.int32))}
        )

    def dup_count(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "rule": pd.Series(["doc_id_unique"], dtype="object"),
                "n_violations": pd.Series(
                    [int(len(df) - df["doc_id"].nunique())], dtype="int64"
                ),
            }
        )

    uniq = partial_group_agg(
        bucket_map_groups(
            docs.select_columns(["doc_id"]).map_batches(key_bucket, batch_format="pyarrow"),
            "bucket",
            dup_count,
            P,
            batch_format="pandas",
        ),
        ["rule"],
        {"n_violations": "n_violations"},
    )

    return local.union(uniq).select_columns(["rule", "n_violations"])


@register(
    "q5_local_supplier_revenue",
    # TPC-H Q5 shape adapted to this schema: revenue per customer
    # nation where the supplying nation matches, one region, bounded
    # order dates
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def q5_local_supplier_revenue(sf_dir: str):
    """TPC-H Q5 (local supplier volume), the canonical multiway-join
    benchmark query, in the engine's join-planning idiom: the THREE
    dimension tables (region -> nation -> supplier/customer maps) fold
    into broadcast lookups built once on the driver — only dimension
    keys ship — while the two FACT tables meet in one hash-partitioned
    shuffle join; the local-supplier predicate (s_nationkey =
    c_nationkey) and the region/date filters apply vectorized before
    the combiner aggregate, so filtered rows never reach the shuffle
    output."""
    import numpy as np
    import ray

    from document_ai_ray.pipelines.ops import get_broadcast

    # dimension maps (driver-side: region+nation are tens of rows;
    # supplier/customer nation maps are key->int dicts — broadcast)
    nat = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = read_table(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    asia = set(reg[reg["r_name"] == "ASIA"]["r_regionkey"])
    nat_in_asia = nat[nat["n_regionkey"].isin(asia)]
    nation_name = dict(zip(nat_in_asia["n_nationkey"], nat_in_asia["n_name"]))

    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    s_nation = dict(zip(supp["s_suppkey"], supp["s_nationkey"]))
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    c_nation = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    dims_ref = ray.put((nation_name, s_nation, c_nation))

    import datetime

    # date predicate pushed into the parquet read (row-group pruning)
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
        filter=(pc.field("o_orderdate") >= datetime.datetime(1997, 1, 1)),
    )

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )
    joined = large_join(
        li,
        orders,
        on="l_orderkey",
        right_on="o_orderkey",
        num_partitions=8,
    )

    def score(t: pa.Table, _ref=(dims_ref,)) -> pa.Table:
        import pandas as pd

        nn, sn, cn = get_broadcast(_ref, tag="q5_dims")
        sk = t.column("l_suppkey").to_pylist()
        ck = t.column("o_custkey").to_pylist()
        s_nat = pd.Series(sk).map(sn).to_numpy()
        c_nat = pd.Series(ck).map(cn).to_numpy()
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        keep = s_nat == c_nat
        names = pd.Series(c_nat[keep]).map(nn)
        in_region = names.notna().to_numpy()
        rev = (price[keep] * (1 - disc[keep]))[in_region]
        return pa.table(
            {
                "n_name": pa.array(names[in_region].to_numpy(), pa.string()),
                "rev": pa.array(rev, pa.float64()),
            }
        )

    agg = partial_group_agg(
        joined.map_batches(score, batch_format="pyarrow"), ["n_name"], {"rev": "revenue"},
        count_alias="n_items",
    )
    return agg.map_batches(lambda t: round_cols(t, {"revenue": 2}), batch_format="pyarrow").select_columns(
        ["n_name", "revenue", "n_items"]
    )


@register(
    "q3_shipping_priority",
    # ordering uses the ROUNDED revenue on BOTH sides (plus full
    # tiebreaks) so the top-10 cut cannot flip on a last-ulp difference
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01'
      AND l_shipdate  > TIMESTAMP '1997-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(sf_dir: str):
    """TPC-H Q3 (shipping priority), the classic
    filter -> semi-join -> fact-fact join -> grouped-agg -> top-k
    pipeline in the engine's planning idiom: the segment predicate
    reduces customer to a key set (semi join picks broadcast vs Bloom
    by cardinality), both date predicates push into the parquet reads
    (row-group pruning), the two fact tables meet in one
    hash-partitioned join, revenue pre-aggregates per order inside
    map_batches, and the top 10 comes from the streaming top-k — no
    global sort anywhere."""
    import datetime

    orders = semi_anti_join_auto(
        read_table(
            sf_dir, "orders",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
            filter=(pc.field("o_orderdate") < datetime.datetime(1997, 6, 1)),
        ),
        read_table(
            sf_dir, "customer", columns=["c_custkey", "c_mktsegment"],
            filter=(pc.field("c_mktsegment") == "BUILDING"),
        ).select_columns(["c_custkey"]),
        "o_custkey",
        "c_custkey",
        anti=False,
    ).select_columns(["o_orderkey", "o_orderdate", "o_orderpriority"])
    def rev(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [t.column("l_orderkey"), pa.array(price * (1 - disc), pa.float64())],
            names=["l_orderkey", "rev"],
        )

    # revenue pre-aggregates PER ORDER before the shuffle (o_orderdate /
    # o_orderpriority are functionally dependent on the order key, so
    # the group-by collapses to the join): the join moves one row per
    # order instead of one per line item
    li_rev = partial_group_agg(
        read_table(
            sf_dir, "lineitem",
            columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
            filter=(pc.field("l_shipdate") > datetime.datetime(1997, 6, 1)),
        ).map_batches(rev, batch_format="pyarrow"),
        ["l_orderkey"],
        {"rev": "revenue"},
    )
    joined = large_join(li_rev, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=8)
    agg = joined.map_batches(lambda t: round_cols(t, {"revenue": 2}), batch_format="pyarrow")
    return topk(
        agg,
        keys=[("revenue", True), ("o_orderdate", False), ("l_orderkey", False)],
        k=10,
    ).select_columns(["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"])


# ---------------------------------------------------------------------------
# SCD2 (slowly-changing-dimension type 2) history build: collapse an
# observation stream into validity intervals per key — the classic
# islands-and-gaps problem.  Each customer's order stream is the change
# feed; consecutive same-priority observations collapse into one
# version row [valid_from, valid_to), the current version's valid_to is
# NULL.
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH s AS (SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
                  LAG(o_orderpriority) OVER
                      (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS prev
           FROM orders),
g AS (SELECT *, SUM(CASE WHEN prev IS NULL OR prev <> o_orderpriority
                         THEN 1 ELSE 0 END)
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS island
      FROM s),
i AS (SELECT o_custkey AS custkey, island, o_orderpriority AS priority,
             MIN(o_orderdate) AS valid_from, COUNT(*) AS n_obs
      FROM g GROUP BY 1, 2, 3)
SELECT custkey, CAST(island AS BIGINT) AS version, priority,
       valid_from,
       LEAD(valid_from) OVER (PARTITION BY custkey ORDER BY island) AS valid_to,
       n_obs
FROM i
"""


@register("scd2_priority_history", oracle=_SCD2_ORACLE)
def scd2_priority_history(sf_dir: str):
    """SCD2 dimension-history build from the orders change feed: per
    customer, runs of equal o_orderpriority (ordered by date, orderkey)
    collapse into version rows with [valid_from, valid_to) intervals —
    valid_to = next version's valid_from, NULL while current.  One
    hash(custkey)-bucketed exchange; each bucket resolves its disjoint
    customers in a single vectorized pandas pass (shift/cumsum islands,
    groupby-first interval bounds)."""
    import numpy as np

    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups

    orders = read_table(
        sf_dir, "orders",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    P = auto_buckets(orders.count())

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.uint64)
        bk = (k * np.uint64(2654435761)) % np.uint64(P)
        return t.append_column("bk", pa.array(bk.astype(np.int64)))

    def scd2(df):
        import pandas as pd

        if len(df) == 0:
            return pd.DataFrame(
                {
                    "custkey": pd.Series(dtype="int64"),
                    "version": pd.Series(dtype="int64"),
                    "priority": pd.Series(dtype="object"),
                    "valid_from": pd.Series(dtype="datetime64[us]"),
                    "valid_to": pd.Series(dtype="datetime64[us]"),
                    "n_obs": pd.Series(dtype="int64"),
                }
            )
        df = df.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort"
        )
        start = (df["o_custkey"] != df["o_custkey"].shift()) | (
            df["o_orderpriority"] != df["o_orderpriority"].shift()
        )
        island = start.cumsum()
        g = df.groupby(island, sort=False)
        out = pd.DataFrame(
            {
                "custkey": g["o_custkey"].first().astype("int64"),
                "priority": g["o_orderpriority"].first(),
                "valid_from": g["o_orderdate"].first(),
                "n_obs": g.size().astype("int64"),
            }
        ).reset_index(drop=True)
        out["version"] = (out.groupby("custkey").cumcount() + 1).astype("int64")
        out["valid_to"] = out.groupby("custkey")["valid_from"].shift(-1)
        return out[["custkey", "version", "priority", "valid_from", "valid_to", "n_obs"]]

    return bucket_map_groups(
        orders.map_batches(add_bucket, batch_format="pyarrow"),
        "bk",
        scd2,
        P,
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# Row-group-pruned range scan: the READ-side pruning lever partition
# pruning can't give you — sort on the predicate column at write time,
# bound row-group size, and let parquet min/max statistics skip every
# row group outside the range.
# ---------------------------------------------------------------------------

_RG_PRUNE_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
"""


@register("rowgroup_pruned_scan", oracle=_RG_PRUNE_ORACLE)
def rowgroup_pruned_scan(sf_dir: str):
    """Write `orders` SORTED by o_orderdate with bounded row groups
    (2 048 rows), then read ONE year back through a pyarrow dataset
    filter pushed into the fragment scan (`arrow_parquet_args`) — the
    parquet min/max statistics prune the out-of-range row groups at the
    read, so a 1-of-7-years query touches ~1/7 of the file (asserted
    with footer statistics in tests/test_relational_extras.py).  The
    write stays a distributed range-partitioned sort + streamed
    per-block files; nothing driver-sized."""
    import datetime

    from document_ai_ray.functions.scratch import scratch_dir

    out_dir = scratch_dir("rg-pruned-orders")
    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_totalprice"]
    )
    ds.sort("o_orderdate").write_parquet(out_dir, row_group_size=2048)
    lo = datetime.datetime(1995, 1, 1)
    hi = datetime.datetime(1996, 1, 1)
    flt = (pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi)
    back = rd.read_parquet(
        out_dir,
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
        filter=flt,
    )

    def exact(t: pa.Table) -> pa.Table:
        # the pushed filter prunes row groups; re-apply row-exact at the
        # range edges, then project
        d = t.column("o_orderdate")
        m = pc.and_(
            pc.greater_equal(d, pa.scalar(lo)), pc.less(d, pa.scalar(hi))
        )
        return t.filter(m).select(["o_orderkey", "o_totalprice"])

    return back.map_batches(exact, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Temporal-table read over the SCD2 history: the dimension state AS OF
# a point in time (the query every SCD2 build exists to serve).
# ---------------------------------------------------------------------------

_ASOF_T = "1998-06-01"

_SCD2_ASOF_ORACLE = f"""
WITH s AS (SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
                  LAG(o_orderpriority) OVER
                      (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS prev
           FROM orders),
g AS (SELECT *, SUM(CASE WHEN prev IS NULL OR prev <> o_orderpriority
                         THEN 1 ELSE 0 END)
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS island
      FROM s),
i AS (SELECT o_custkey AS custkey, island, o_orderpriority AS priority,
             MIN(o_orderdate) AS valid_from
      FROM g GROUP BY 1, 2, 3),
h AS (SELECT custkey, CAST(island AS BIGINT) AS version, priority, valid_from,
             LEAD(valid_from) OVER (PARTITION BY custkey ORDER BY island) AS valid_to
      FROM i)
SELECT custkey, version, priority, valid_from
FROM h
WHERE valid_from <= TIMESTAMP '{_ASOF_T}'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_ASOF_T}')
"""


@register("scd2_as_of_state", oracle=_SCD2_ASOF_ORACLE)
def scd2_as_of_state(sf_dir: str):
    """Dimension state AS OF {0}: filter the SCD2 validity intervals to
    the one version per customer covering the probe instant (customers
    whose first observation is later have no row yet).  Rides the
    proven scd2_priority_history build; the as-of filter is one
    stateless vectorized pass.""".format(_ASOF_T)
    import numpy as np
    import pandas as pd

    hist = scd2_priority_history(sf_dir)
    t_us = int(pd.Timestamp(_ASOF_T).value // 1000)

    def asof(t: pa.Table) -> pa.Table:
        vf = t.column("valid_from").cast(pa.int64()).to_numpy(zero_copy_only=False)
        vt = t.column("valid_to").cast(pa.int64()).to_numpy(zero_copy_only=False)
        open_end = t.column("valid_to").is_null().to_numpy(zero_copy_only=False)
        keep = (vf <= t_us) & (open_end | (np.where(open_end, t_us + 1, vt) > t_us))
        t = t.filter(pa.array(keep))
        return t.select(["custkey", "version", "priority", "valid_from"])

    return hist.map_batches(asof, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Chi-square test of independence (lang x source), emitted per cell —
# observed vs expected counts and the chi2 contribution (the PMI/KL
# convention: per-cell terms, never an engine-boundary float sum).
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH c AS (SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2),
ml AS (SELECT lang, SUM(n) AS nl FROM c GROUP BY 1),
ms AS (SELECT source, SUM(n) AS ns FROM c GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM c)
SELECT c.lang, c.source, c.n,
       ROUND(CAST(ml.nl AS DOUBLE) * CAST(ms.ns AS DOUBLE) / total, 6) AS expected,
       ROUND(POWER(CAST(c.n AS DOUBLE) - CAST(ml.nl AS DOUBLE) * CAST(ms.ns AS DOUBLE) / total, 2)
             / (CAST(ml.nl AS DOUBLE) * CAST(ms.ns AS DOUBLE) / total), 6) AS chi2_term
FROM c JOIN ml USING (lang) JOIN ms USING (source) CROSS JOIN t
"""


@register("lang_source_chi2", oracle=_CHI2_ORACLE)
def lang_source_chi2(sf_dir: str):
    """Independence screen for the (lang, source) contingency table:
    per observed cell, expected count under independence and its chi2
    contribution.  One combiner pass builds the cells; the marginals
    and terms derive in the contingency-sized final."""
    import numpy as np

    from document_ai_ray.pipelines.ops import partial_group_agg

    docs = read_table(sf_dir, "documents", columns=["lang", "source"])
    cells = partial_group_agg(docs, ["lang", "source"], count_alias="n")

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        nl = df.groupby("lang")["n"].transform("sum").to_numpy(dtype=np.float64)
        ns = df.groupby("source")["n"].transform("sum").to_numpy(dtype=np.float64)
        total = float(df["n"].sum())
        exp = nl * ns / total
        chi2 = (df["n"].to_numpy(dtype=np.float64) - exp) ** 2 / exp

        def rnd(a):
            return np.copysign(np.floor(np.abs(a) * 1e6 + 0.5), a) / 1e6

        return pa.table(
            {"lang": pa.array(df["lang"], pa.string()),
             "source": pa.array(df["source"], pa.string()),
             "n": pa.array(df["n"].to_numpy().astype(np.int64)),
             "expected": pa.array(rnd(exp), pa.float64()),
             "chi2_term": pa.array(rnd(chi2), pa.float64())}
        )

    return cells.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Cramér's V over the same (lang, source) contingency table — the
# normalized effect size the chi² screen feeds.  The chi² TOTAL is a
# cross-engine float sum, so each cell term is quantized to integer
# micro-units (floor(term·1e6 + 0.5), the nb_langid micro-nat trick)
# and summed as exact int64 on both engines; V then derives from
# identical integers.
# ---------------------------------------------------------------------------

_CRAMERS_ORACLE = """
WITH c AS (SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2),
ml AS (SELECT lang, SUM(n) AS nl FROM c GROUP BY 1),
ms AS (SELECT source, SUM(n) AS ns FROM c GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM c),
terms AS (SELECT CAST(FLOOR(
            POWER(CAST(c.n AS DOUBLE) - CAST(ml.nl AS DOUBLE) * CAST(ms.ns AS DOUBLE) / total, 2)
            / (CAST(ml.nl AS DOUBLE) * CAST(ms.ns AS DOUBLE) / total) * 1e6 + 0.5) AS BIGINT) AS mt
          FROM c JOIN ml USING (lang) JOIN ms USING (source) CROSS JOIN t),
s AS (SELECT CAST(SUM(mt) AS BIGINT) AS chi2_micro FROM terms),
dims AS (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_lang,
                CAST(COUNT(DISTINCT source) AS BIGINT) AS n_source,
                CAST(SUM(n) AS BIGINT) AS n_docs FROM c)
SELECT n_docs, n_lang, n_source,
       ROUND(CAST(chi2_micro AS DOUBLE) / 1e6, 6) AS chi2,
       ROUND(SQRT((CAST(chi2_micro AS DOUBLE) / 1e6)
             / (CAST(n_docs AS DOUBLE)
                * GREATEST(LEAST(n_lang, n_source) - 1, 1))), 6) AS cramers_v
FROM dims CROSS JOIN s
"""


@register("cramers_v_lang_source", oracle=_CRAMERS_ORACLE)
def cramers_v_lang_source(sf_dir: str):
    """Cramér's V effect size for lang×source association: the same
    combiner-built contingency cells as `lang_source_chi2`, with the
    chi² total formed from integer micro-terms (per-cell quantization,
    exact int64 sum — no cross-engine float-sum order anywhere) and
    V = sqrt(chi²/(N·(min(r,c)−1))) derived in the one-row final."""
    import numpy as np

    docs = read_table(sf_dir, "documents", columns=["lang", "source"])
    cells = partial_group_agg(docs, ["lang", "source"], count_alias="n")

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        nl = df.groupby("lang")["n"].transform("sum").to_numpy(dtype=np.float64)
        ns = df.groupby("source")["n"].transform("sum").to_numpy(dtype=np.float64)
        total = float(df["n"].sum())
        exp = nl * ns / total
        mt = np.floor((df["n"].to_numpy(np.float64) - exp) ** 2 / exp * 1e6 + 0.5)
        chi2_micro = int(mt.astype(np.int64).sum())
        n_docs = int(df["n"].sum())
        n_lang = int(df["lang"].nunique())
        n_source = int(df["source"].nunique())
        chi2 = chi2_micro / 1e6
        v = np.sqrt(chi2 / (float(n_docs) * max(min(n_lang, n_source) - 1, 1)))

        def rnd(x):
            return float(np.floor(abs(x) * 1e6 + 0.5) * np.copysign(1.0, x)) / 1e6

        return pa.table(
            {"n_docs": pa.array([n_docs], pa.int64()),
             "n_lang": pa.array([n_lang], pa.int64()),
             "n_source": pa.array([n_source], pa.int64()),
             "chi2": pa.array([rnd(chi2)], pa.float64()),
             "cramers_v": pa.array([rnd(v)], pa.float64())}
        )

    # tiny-partials merge: the contingency table is n_lang x n_source rows
    return cells.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Wilson score intervals for per-source English-share — the
# closed-form binomial CI every rate report should carry (unlike the
# normal approximation it never leaves [0,1] and behaves at small n).
# Pure per-group arithmetic from two exact integers (k, n), written as
# the IDENTICAL IEEE expression on both engines, so no quantization
# tricks are needed beyond the terminal ROUND.
# ---------------------------------------------------------------------------

_WILSON_ORACLE = """
WITH s AS (SELECT source, COUNT(*) AS n,
                  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS k
           FROM documents GROUP BY 1)
SELECT source, n AS n_docs, k AS n_en,
       ROUND(CAST(k AS DOUBLE) / n, 6) AS p_en,
       ROUND((CAST(k AS DOUBLE) / n + 1.96 * 1.96 / (2.0 * n)
              - 1.96 * SQRT((CAST(k AS DOUBLE) / n) * (1.0 - CAST(k AS DOUBLE) / n) / n
                            + 1.96 * 1.96 / (4.0 * n * n)))
             / (1.0 + 1.96 * 1.96 / n), 6) AS wilson_lo,
       ROUND((CAST(k AS DOUBLE) / n + 1.96 * 1.96 / (2.0 * n)
              + 1.96 * SQRT((CAST(k AS DOUBLE) / n) * (1.0 - CAST(k AS DOUBLE) / n) / n
                            + 1.96 * 1.96 / (4.0 * n * n)))
             / (1.0 + 1.96 * 1.96 / n), 6) AS wilson_hi
FROM s
"""


@register("source_en_rate_wilson", oracle=_WILSON_ORACLE)
def source_en_rate_wilson(sf_dir: str):
    """Per-source English share with 95% Wilson score bounds: one
    combiner pass builds the exact (k, n) integers per source; the
    source-count-sized final evaluates the interval with the same
    expression shape as the oracle (z = 1.96 literal on both sides)."""
    import numpy as np

    docs = read_table(sf_dir, "documents", columns=["lang", "source"])

    def prep(t: pa.Table) -> pa.Table:
        en = pc.cast(pc.equal(t.column("lang"), "en"), pa.int64())
        return pa.table({"source": t.column("source"), "en": en})

    agg = partial_group_agg(
        docs.map_batches(prep, batch_format="pyarrow"),
        ["source"], {"en": "k"}, count_alias="n",
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        k = t.column("k").to_numpy(zero_copy_only=False).astype(np.float64)
        p = k / n
        half = 1.96 * np.sqrt(p * (1.0 - p) / n + 1.96 * 1.96 / (4.0 * n * n))
        center = p + 1.96 * 1.96 / (2.0 * n)
        denom = 1.0 + 1.96 * 1.96 / n
        lo = (center - half) / denom
        hi = (center + half) / denom

        def rnd(a):
            return np.copysign(np.floor(np.abs(a) * 1e6 + 0.5), a) / 1e6

        return pa.table(
            {"source": t.column("source"),
             "n_docs": t.column("n"), "n_en": t.column("k"),
             "p_en": pa.array(rnd(p), pa.float64()),
             "wilson_lo": pa.array(rnd(lo), pa.float64()),
             "wilson_hi": pa.array(rnd(hi), pa.float64())}
        )

    # tiny-partials merge: one row per source
    return agg.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking (Hernández-Stolfo): the OTHER classic
# entity-resolution blocking strategy next to key-equality blocks —
# sort all records by name, compare each record only to its W sorted
# successors.  Engine shape: one global rank (with_group_ranks on a
# constant group), then rank-range buckets with a W-row HALO replicated
# into the predecessor bucket (the rolling_distinct halo pattern), so
# every rank-adjacent pair is co-resident in exactly one bucket and no
# task ever sees more than one bucket of rows.
# ---------------------------------------------------------------------------

_SNM_W = 3
_SNM_THRESHOLD = 0.9

_SNM_ORACLE = f"""
WITH r AS (SELECT p_partkey, p_name,
                  ROW_NUMBER() OVER (ORDER BY p_name, p_partkey) - 1 AS rk
           FROM part)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
FROM r a JOIN r b ON b.rk >= a.rk + 1 AND b.rk <= a.rk + {_SNM_W}
WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= {_SNM_THRESHOLD}
"""


@register("sorted_neighborhood_pairs", oracle=_SNM_ORACLE)
def sorted_neighborhood_pairs(sf_dir: str):
    """Sorted-neighborhood candidate pairs over part names with a
    Jaro-Winkler accept gate (window {0}, threshold {1}): the oracle
    compares UNROUNDED jw against the threshold, so this relies on
    `functions.strings.jaro_winkler` being exact-float-equal to
    DuckDB's (differentially pinned in tests/test_jw_bfs.py).""".format(
        _SNM_W, _SNM_THRESHOLD
    )
    import numpy as np
    import pandas as pd

    from document_ai_ray.functions.strings import jaro_winkler
    from document_ai_ray.pipelines.ops import bucket_map_groups, with_group_ranks

    parts = read_table(sf_dir, "part", columns=["p_partkey", "p_name"])
    B = 4096
    n = parts.count()
    P = max(1, -(-n // B))
    W = _SNM_W

    def prep(t: pa.Table) -> pa.Table:
        return t.append_column("__g", pa.array(np.zeros(len(t), np.int64)))

    ranked = with_group_ranks(
        parts.map_batches(prep, batch_format="pyarrow"), "__g", ["p_name", "p_partkey"]
    )

    def route(t: pa.Table) -> pa.Table:
        rk = t.column("__rank").to_numpy(zero_copy_only=False)
        keys = t.column("p_partkey").to_numpy(zero_copy_only=False)
        names = t.column("p_name").to_pylist()
        out_rk, out_k, out_nm, out_bk, out_anchor = [], [], [], [], []
        for r, k, nm in zip(rk, keys, names):
            b = int(r // B)
            out_rk.append(int(r)); out_k.append(int(k)); out_nm.append(nm)
            out_bk.append(b); out_anchor.append(1)
            if b > 0 and r % B < W:  # halo: tail-anchor targets of bucket b-1
                out_rk.append(int(r)); out_k.append(int(k)); out_nm.append(nm)
                out_bk.append(b - 1); out_anchor.append(0)
        return pa.table(
            {"rk": pa.array(out_rk, pa.int64()), "key": pa.array(out_k, pa.int64()),
             "name": pa.array(out_nm, pa.string()), "bk": pa.array(out_bk, pa.int64()),
             "anchor": pa.array(out_anchor, pa.int64())}
        )

    def pairs(df):
        cols = {"key_a": "int64", "key_b": "int64", "jw": "float64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = df.sort_values("rk", kind="mergesort").reset_index(drop=True)
        rk = df["rk"].to_numpy(np.int64)
        keys = df["key"].to_numpy(np.int64)
        names = df["name"].to_list()
        anchor = df["anchor"].to_numpy(np.int64)
        ka, kb, sims = [], [], []
        m = len(df)
        for i in range(m):
            if not anchor[i]:
                continue
            for d in range(1, W + 1):
                j = i + d
                if j >= m or rk[j] != rk[i] + d:
                    break
                s = jaro_winkler(names[i], names[j])
                if s >= _SNM_THRESHOLD:
                    ka.append(int(keys[i])); kb.append(int(keys[j]))
                    sims.append(np.floor(s * 1e6 + 0.5) / 1e6)
        return pd.DataFrame(
            {"key_a": pd.array(ka, dtype="int64"), "key_b": pd.array(kb, dtype="int64"),
             "jw": pd.array(sims, dtype="float64")}
        )

    return bucket_map_groups(
        ranked.map_batches(route, batch_format="pyarrow"), "bk", pairs, P,
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# Per-priority OLS trend of ship delay over calendar months — is
# fulfilment getting slower?  x (month index) and y (delay days) are
# both integers, so every shuffled regression moment is exact int64;
# the slope/intercept divisions happen once per group in the final.
# ---------------------------------------------------------------------------

_TREND_ORACLE = """
WITH j AS (SELECT o_orderpriority AS priority,
                  CAST(date_part('year', o_orderdate) * 12
                       + date_part('month', o_orderdate) AS BIGINT) AS x,
                  CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS y
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
m AS (SELECT priority, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM j GROUP BY 1),
s AS (SELECT priority, n,
             CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_raw,
             sx, sy
      FROM m)
SELECT priority, n, ROUND(slope_raw, 6) AS slope_days_per_month,
       ROUND((CAST(sy AS DOUBLE) - slope_raw * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
       AS intercept_days
FROM s
"""


@register("ship_delay_trend", oracle=_TREND_ORACLE)
def ship_delay_trend(sf_dir: str):
    """OLS regression of ship delay (days) on order month, per
    priority: the fulfilment drift monitor.  Same shuffle join as
    ship_delay_by_priority; the regression moments ride the combiner as
    exact int64 (both variables integer), the per-group closed form
    runs on one tiny final."""
    import numpy as np
    import pandas as pd

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    joined = large_join(li, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=8)

    def moments(t: pa.Table) -> pa.Table:
        od = pd.to_datetime(t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False), unit="us")
        x = (od.year * 12 + od.month).to_numpy().astype(np.int64)
        ship = t.column("l_shipdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        ordd = t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        y = (ship - ordd) // 86_400_000_000
        return pa.table(
            {
                "priority": t.column("o_orderpriority"),
                "x": pa.array(x), "y": pa.array(y),
                "xx": pa.array(x * x), "xy": pa.array(x * y),
            }
        )

    agg = partial_group_agg(
        joined.map_batches(moments, batch_format="pyarrow"),
        ["priority"],
        {"x": "sx", "y": "sy", "xx": "sxx", "xy": "sxy"},
        count_alias="n",
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(object)
        sx = t.column("sx").to_numpy(zero_copy_only=False).astype(object)
        sy = t.column("sy").to_numpy(zero_copy_only=False).astype(object)
        sxx = t.column("sxx").to_numpy(zero_copy_only=False).astype(object)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False).astype(object)
        slope = np.array(
            [float(ni * xyi - xi * yi) / float(ni * xxi - xi * xi)
             for ni, xi, yi, xxi, xyi in zip(n, sx, sy, sxx, sxy)]
        )
        icpt = np.array(
            [(float(yi) - s * float(xi)) / float(ni)
             for s, ni, xi, yi in zip(slope, n, sx, sy)]
        )

        def rnd(a):
            return np.copysign(np.floor(np.abs(a) * 1e6 + 0.5), a) / 1e6

        return pa.table(
            {
                "priority": t.column("priority"),
                "n": t.column("n"),
                "slope_days_per_month": pa.array(rnd(slope), pa.float64()),
                "intercept_days": pa.array(rnd(icpt), pa.float64()),
            }
        )

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Month-over-month revenue growth (integer cents -> exact LAG ratio).
# ---------------------------------------------------------------------------

_MOM_ORACLE = """
WITH c AS (SELECT CAST(date_part('year', o_orderdate) * 12
                       + date_part('month', o_orderdate) AS BIGINT) AS month_idx,
                  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
           FROM orders GROUP BY 1),
l AS (SELECT month_idx, cents,
             LAG(cents) OVER (ORDER BY month_idx) AS prev_cents
      FROM c)
SELECT month_idx, cents, prev_cents,
       ROUND((CAST(cents AS DOUBLE) - CAST(prev_cents AS DOUBLE))
             / CAST(prev_cents AS DOUBLE), 6) AS mom_growth
FROM l WHERE prev_cents IS NOT NULL
"""


@register("revenue_mom_growth", oracle=_MOM_ORACLE)
def revenue_mom_growth(sf_dir: str):
    """Month-over-month revenue growth: per-month integer cents ride
    the combiner; the LAG + ratio runs on the month-cardinality final
    (first month dropped — no predecessor)."""
    import numpy as np
    import pandas as pd

    from document_ai_ray.pipelines.ops import merge_partials

    orders = read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        od = pd.to_datetime(t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False), unit="us")
        m = (od.year * 12 + od.month).to_numpy().astype(np.int64)
        x = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        c = np.floor(x * 100 + 0.5).astype(np.int64)
        return pa.table({"month_idx": pa.array(m), "cents": pa.array(c)})

    agg = merge_partials(
        orders.map_batches(cents, batch_format="pyarrow").map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t.group_by(["month_idx"]).aggregate([("cents", "sum")]).column("month_idx"),
                    t.group_by(["month_idx"]).aggregate([("cents", "sum")]).column("cents_sum"),
                ],
                names=["month_idx", "cents"],
            ),
            batch_format="pyarrow",
        ),
        ["month_idx"],
        {"cents": "sum"},
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("month_idx").reset_index(drop=True)
        prev = df["cents"].shift(1)
        keep = prev.notna()
        g = (df["cents"][keep].astype("float64") - prev[keep].astype("float64")) / prev[
            keep
        ].astype("float64")
        gv = np.copysign(np.floor(np.abs(g.to_numpy()) * 1e6 + 0.5), g.to_numpy()) / 1e6
        return pa.table(
            {
                "month_idx": pa.array(df["month_idx"][keep].to_numpy().astype(np.int64)),
                "cents": pa.array(df["cents"][keep].to_numpy().astype(np.int64)),
                "prev_cents": pa.array(prev[keep].to_numpy().astype(np.int64)),
                "mom_growth": pa.array(gv, pa.float64()),
            }
        )

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Open-order backlog over time: sweep-line interval counting — an
# order is open from its order month through its last ship month
# (inclusive); only ±1 deltas shuffle, the prefix sum runs over the
# month axis in the final.
# ---------------------------------------------------------------------------

_BACKLOG_ORACLE = """
WITH ls AS (SELECT l_orderkey, MAX(l_shipdate) AS maxship FROM lineitem GROUP BY 1),
o AS (SELECT sm, em FROM (
        SELECT CAST(date_part('year', o_orderdate) * 12
                    + date_part('month', o_orderdate) AS BIGINT) AS sm,
               CAST(date_part('year', maxship) * 12
                    + date_part('month', maxship) AS BIGINT) AS em
        FROM orders JOIN ls ON l_orderkey = o_orderkey)
      WHERE sm <= em),
b AS (SELECT UNNEST(generate_series((SELECT MIN(sm) FROM o),
                                    (SELECT MAX(em) FROM o))) AS m)
SELECT m AS month_idx,
       (SELECT COUNT(*) FROM o WHERE o.sm <= m AND m <= o.em) AS n_open
FROM b
"""


@register("orders_open_backlog", oracle=_BACKLOG_ORACLE)
def orders_open_backlog(sf_dir: str):
    """Orders in flight per calendar month (placed, not yet fully
    shipped).  Per-order last-ship months come from a combiner MAX over
    the shuffle join; each order then contributes two integer deltas
    (+1 at its start month, -1 after its end month) into a month-keyed
    combiner; the final materializes the dense month axis and prefix-
    sums the deltas — the sweep-line shape, nothing order-sized past
    the join."""
    import numpy as np
    import pandas as pd

    from document_ai_ray.pipelines.ops import merge_partials

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    joined = large_join(li, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=8)

    def per_order_partial(t: pa.Table) -> pa.Table:
        flat = pa.table(
            {
                "ok": t.column("l_orderkey"),  # join coalesces key cols
                "ship": t.column("l_shipdate").cast(pa.int64()),
                "start": t.column("o_orderdate").cast(pa.int64()),
            }
        )
        g = flat.group_by(["ok"]).aggregate([("ship", "max"), ("start", "max")])
        return pa.Table.from_arrays(
            [g.column("ok"), g.column("ship_max"), g.column("start_max")],
            names=["ok", "ship", "start"],
        )

    per_order = merge_partials(
        joined.map_batches(per_order_partial, batch_format="pyarrow"),
        ["ok"],
        {"ship": "max", "start": "max"},
    )

    def deltas(t: pa.Table) -> pa.Table:
        sd = pd.to_datetime(t.column("start").to_numpy(zero_copy_only=False), unit="us")
        ed = pd.to_datetime(t.column("ship").to_numpy(zero_copy_only=False), unit="us")
        sm = (sd.year * 12 + sd.month).to_numpy().astype(np.int64)
        em = (ed.year * 12 + ed.month).to_numpy().astype(np.int64)
        # the synthetic feed has orders whose last ship PRECEDES the
        # order month (em < sm): an empty interval — contributes
        # nothing, and its raw deltas would corrupt the prefix sum
        ok = em >= sm
        sm, em = sm[ok], em[ok]
        m = np.concatenate([sm, em + 1])
        d = np.concatenate([np.ones(len(sm), np.int64), -np.ones(len(em), np.int64)])
        g = pa.table({"month_idx": pa.array(m), "delta": pa.array(d)}).group_by(
            ["month_idx"]
        ).aggregate([("delta", "sum")])
        return pa.Table.from_arrays(
            [g.column("month_idx"), g.column("delta_sum")], names=["month_idx", "delta"]
        )

    agg = merge_partials(
        per_order.map_batches(deltas, batch_format="pyarrow"), ["month_idx"], {"delta": "sum"}
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("month_idx").reset_index(drop=True)
        lo, hi = int(df["month_idx"].min()), int(df["month_idx"].max()) - 1
        axis = np.arange(lo, hi + 1, dtype=np.int64)
        d = np.zeros(len(axis), np.int64)
        idx = df["month_idx"].to_numpy() - lo
        inb = idx < len(axis)
        np.add.at(d, idx[inb].astype(np.int64), df["delta"].to_numpy()[inb])
        return pa.table(
            {"month_idx": pa.array(axis), "n_open": pa.array(np.cumsum(d))}
        )

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Entity resolution end-to-end: duplicate records (each part name +
# its deterministically corrupted variant) -> blocked fuzzy matching
# -> connected components -> per-record entity id.  The classic
# record-linkage pipeline, composed from the proven fuzzy join and
# the distributed min-label components.
# ---------------------------------------------------------------------------

_ER_ORACLE = """
WITH RECURSIVE
anchor AS (SELECT p_name, MIN(p_partkey) AS aid FROM part GROUP BY 1),
p AS (SELECT p_partkey, p_name, len(p_name) AS l FROM part),
c AS (SELECT p_partkey,
             CASE WHEN l >= 8
                  THEN substr(p_name, 1, p_partkey % l) || substr(p_name, p_partkey % l + 2)
                  ELSE p_name END AS cname
      FROM p),
names AS (SELECT DISTINCT p_name FROM part),
j AS (SELECT DISTINCT c.p_partkey, n.p_name, levenshtein(c.cname, n.p_name) AS dist
      FROM c JOIN names n
        ON (substr(c.cname, 1, 4) = substr(n.p_name, 1, 4)
            OR substr(c.cname, len(c.cname) - 3) = substr(n.p_name, len(n.p_name) - 3))),
m AS (SELECT p_partkey, p_name AS matched_name FROM j WHERE dist <= 1),
e0 AS (SELECT 2 * p.p_partkey AS u, 2 * a.aid AS v
       FROM part p JOIN anchor a USING (p_name)
       UNION ALL
       SELECT 2 * m.p_partkey + 1 AS u, 2 * a.aid AS v
       FROM m JOIN anchor a ON a.p_name = m.matched_name),
edges AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
univ AS (SELECT 2 * p_partkey AS rid FROM part
         UNION ALL SELECT 2 * p_partkey + 1 FROM part),
reach AS (
  SELECT rid AS u, rid AS label FROM univ
  UNION
  SELECT e.v AS u, r.label FROM edges e JOIN reach r ON r.u = e.u
)
SELECT u AS record_id, MIN(label) AS entity_id FROM reach GROUP BY u
"""


@register("entity_resolution_parts", oracle=_ER_ORACLE)
def entity_resolution_parts(sf_dir: str):
    """Record linkage flagship: the record universe is every part name
    occurrence (record 2k) plus its one-char-deletion corruption
    (record 2k+1); blocked Levenshtein<=1 matching (the proven
    fuzzy_join_names spec) yields the match graph; distributed
    min-label components assign each record its entity id.  SCALE
    NOTE: records attach to their NAME-ANCHOR node (2 x min partkey of
    the name) instead of pairwise to every same-name record — the name
    dictionary here is 64 entries for 20k parts, so pairwise edges
    would be quadratic (measured 6.5M at sf0.1) while anchor edges
    stay linear.  The anchor map is dictionary-sized and broadcasts;
    a corpus with an unbounded key dictionary would swap it for the
    bucketed name join, same downstream shape."""
    import numpy as np

    from document_ai_ray.pipelines.ops import merge_partials
    from document_ai_ray.stages.cluster import connected_components

    matches = fuzzy_join_names(sf_dir)  # (p_partkey, matched_name, dist<=1)
    parts = read_table(sf_dir, "part", columns=["p_partkey", "p_name"])

    def name_min(t: pa.Table) -> pa.Table:
        g = t.group_by(["p_name"]).aggregate([("p_partkey", "min")])
        return pa.Table.from_arrays(
            [g.column("p_name"), g.column("p_partkey_min")], names=["p_name", "aid"]
        )

    anchor = {
        r["p_name"]: int(r["aid"])
        for r in merge_partials(
            parts.map_batches(name_min, batch_format="pyarrow"), ["p_name"], {"aid": "min"}
        ).take_all()
    }

    def orig_edges(t: pa.Table) -> pa.Table:
        pk = t.column("p_partkey").to_numpy(zero_copy_only=False)
        aid = np.array([anchor[n] for n in t.column("p_name").to_pylist()], np.int64)
        rid = np.concatenate([2 * pk, 2 * pk + 1]).astype(np.int64)
        return pa.table(
            {
                "id_a": pa.array(np.concatenate([2 * pk, rid])),
                "id_b": pa.array(np.concatenate([2 * aid, rid])),  # + self-edges
            }
        )

    def match_edges(t: pa.Table) -> pa.Table:
        pk = t.column("p_partkey").to_numpy(zero_copy_only=False)
        aid = np.array([anchor[n] for n in t.column("matched_name").to_pylist()], np.int64)
        return pa.table(
            {
                "id_a": pa.array((2 * pk + 1).astype(np.int64)),
                "id_b": pa.array((2 * aid).astype(np.int64)),
            }
        )

    edges = parts.map_batches(orig_edges, batch_format="pyarrow").union(
        matches.map_batches(match_edges, batch_format="pyarrow")
    )
    comp = connected_components(edges, "id_a", "id_b")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {"record_id": t.column("node"), "entity_id": t.column("cluster_id")}
        )

    return comp.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Z-order clustered scan: interleave the bits of TWO predicate columns
# (custkey, order day) into a space-filling-curve key, sort the file
# on it, and prune row groups for point/range predicates on EITHER
# column — the multi-dimensional layout lever a single-column sort
# cannot give (Delta/Iceberg OPTIMIZE ZORDER semantics).
# ---------------------------------------------------------------------------

_ZORDER_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey % 1000 < 100
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
"""


def _interleave_bits(a: "np.ndarray", b: "np.ndarray", bits: int = 21) -> "np.ndarray":
    """Morton code: interleave the low `bits` of two non-negative int
    arrays (a gets even positions)."""
    import numpy as np

    z = np.zeros(len(a), np.uint64)
    a = a.astype(np.uint64)
    b = b.astype(np.uint64)
    for i in range(bits):
        z |= ((a >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i)
        z |= ((b >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i + 1)
    return z.astype(np.int64)


@register("zorder_pruned_scan", oracle=_ZORDER_ORACLE)
def zorder_pruned_scan(sf_dir: str):
    """Write `orders` sorted on the MORTON KEY of (o_custkey bucket,
    order day), bounded row groups, then answer a predicate touching
    BOTH dimensions (a custkey band AND one year) through the pushed
    fragment filter — min/max statistics on the two natural columns
    prune most row groups because z-ordering keeps both locally
    clustered (pruning effectiveness asserted from footer statistics
    in tests).  Same distributed write shape as rowgroup_pruned_scan."""
    import datetime

    import numpy as np

    from document_ai_ray.functions.scratch import scratch_dir

    out_dir = scratch_dir("zorder-orders")
    ds = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def add_z(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        day = t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False) // (
            86400 * 10**6
        )
        # epoch-days fit 21 bits directly (until year 7715); a per-batch
        # offset would make z-keys batch-dependent and break the layout
        z = _interleave_bits(ck % 1000, day)
        return t.append_column("__z", pa.array(z))

    ds.map_batches(add_z, batch_format="pyarrow").sort("__z").write_parquet(
        out_dir, row_group_size=2048
    )
    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1997, 1, 1)
    flt = (
        (pc.field("o_orderdate") >= lo)
        & (pc.field("o_orderdate") < hi)
    )
    back = rd.read_parquet(
        out_dir,
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        filter=flt,
    )

    def exact(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        m = (
            pc.and_(pc.greater_equal(d, pa.scalar(lo)), pc.less(d, pa.scalar(hi)))
            .to_numpy(zero_copy_only=False)
            & (ck % 1000 < 100)
        )
        return t.filter(pa.array(m)).select(["o_orderkey", "o_custkey", "o_totalprice"])

    return back.map_batches(exact, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Order-independent table checksum: the 100-TB migration-equality tool
# (verify a copy/restore/engine-swap without sorting anything).  Each
# row contributes the top 60 bits of the md5 of its canonical string;
# the commutative integer sum makes the digest independent of block
# order, task order and partitioning.
# ---------------------------------------------------------------------------

_CHECKSUM_ORACLE = """
WITH r AS (SELECT CAST('0x' || substr(md5(  -- 15 hex chars = 60 bits, fits BIGINT
                CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
                || '|' || CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR)
                || '|' || o_orderstatus || '|' || o_orderpriority
                || '|' || CAST(CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS VARCHAR)
           ), 1, 15) AS BIGINT) AS v
           FROM orders)
SELECT COUNT(*) AS n_rows, CAST(SUM(v) % 9223372036854775808 AS BIGINT) AS checksum
FROM r
"""


@register("table_checksum_orders", oracle=_CHECKSUM_ORACLE)
def table_checksum_orders(sf_dir: str):
    """Content checksum of the orders table: md5 of each row's
    canonical pipe-joined string (ints and integer cents only — no
    float formatting ambiguity), top 15 hex chars summed mod 2^63.
    Pure combiner shape — per-batch partial sums, one tiny final; the
    digest is invariant to every layout choice, which is the point."""
    import hashlib

    import numpy as np

    from document_ai_ray.pipelines.ops import merge_partials

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
                 "o_orderpriority", "o_orderdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        p = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(p * 100 + 0.5).astype(np.int64)
        day = t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False) // (
            86400 * 10**6
        )
        s = 0
        for ok, ck, ce, st, pr, d in zip(
            t.column("o_orderkey").to_pylist(), t.column("o_custkey").to_pylist(),
            cents, t.column("o_orderstatus").to_pylist(),
            t.column("o_orderpriority").to_pylist(), day,
        ):
            h = hashlib.md5(f"{ok}|{ck}|{ce}|{st}|{pr}|{d}".encode()).hexdigest()
            s += int(h[:15], 16)
        return pa.table(
            {"one": pa.array([1], pa.int64()),
             "n_rows": pa.array([t.num_rows], pa.int64()),
             "s_lo": pa.array([s % (1 << 62)], pa.int64()),
             "s_hi": pa.array([s >> 62], pa.int64())}
        )

    merged = merge_partials(
        orders.map_batches(partial, batch_format="pyarrow"), ["one"],
        {"n_rows": "sum", "s_lo": "sum", "s_hi": "sum"},
    )

    def finish(t: pa.Table) -> pa.Table:
        total = (int(t.column("s_hi")[0].as_py()) << 62) + int(t.column("s_lo")[0].as_py())
        return pa.table(
            {"n_rows": t.column("n_rows"),
             "checksum": pa.array([total % (1 << 63)], pa.int64())}
        )

    return merged.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Exchange-skew report: the load census of the engine's OWN hash
# exchange (Knuth multiplicative, mod-2^64 wrap, mod P) — the oracle
# replays the exact hash in HUGEINT arithmetic, so the driver hash
# pins the partitioner itself.
# ---------------------------------------------------------------------------

_SKEW_ORACLE = """
WITH b AS (SELECT (CAST(user_id AS HUGEINT) * 2654435761)
                  % 18446744073709551616 % 32 AS bucket,
                  user_id
           FROM events)
SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM b GROUP BY 1
"""


@register("exchange_skew_report", oracle=_SKEW_ORACLE)
def exchange_skew_report(sf_dir: str):
    """Per-bucket load census of the hash(user) exchange every
    events-keyed operator in this engine rides (bucket = u * 2654435761
    mod 2^64 mod 32): rows and distinct keys per bucket — the
    observability view a 100 TB operator checks before blaming a slow
    stage on skew.  Row counts ride the combiner; distinct keys ride
    the (bucket, user) dedup exchange."""
    import numpy as np

    from document_ai_ray.pipelines.ops import distinct_rows, merge_partials, partial_group_agg

    ev = read_table(sf_dir, "events", columns=["user_id"])

    def tag(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        bk = ((u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(32)).astype(np.int64)
        return pa.table({"bucket": pa.array(bk), "user_id": t.column("user_id")})

    tagged = ev.map_batches(tag, batch_format="pyarrow").materialize()
    n_ev = partial_group_agg(tagged, ["bucket"], count_alias="n_events")
    n_us = partial_group_agg(
        distinct_rows(tagged, ["bucket", "user_id"]), ["bucket"], count_alias="n_users"
    ).to_pandas()
    us_map = dict(zip(n_us["bucket"], n_us["n_users"]))

    def finish(t: pa.Table) -> pa.Table:
        bk = t.column("bucket").to_numpy(zero_copy_only=False)
        return pa.table(
            {"bucket": t.column("bucket"), "n_events": t.column("n_events"),
             "n_users": pa.array([int(us_map[b]) for b in bk], pa.int64())}
        )

    return n_ev.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Deterministic pseudonymization: the GDPR-safe keyed rename that keeps
# joins working (same user -> same pseudonym, across tables and runs).
# ---------------------------------------------------------------------------

_PSEUDO_ORACLE = """
SELECT event_id, substr(md5('pepper-v1|' || CAST(user_id AS VARCHAR)), 1, 16)
         AS pseudo_user
FROM events
"""


@register("pseudonymize_users", oracle=_PSEUDO_ORACLE)
def pseudonymize_users(sf_dir: str):
    """Keyed-hash pseudonymization of user ids (md5 with a versioned
    pepper, 16 hex chars): referential integrity survives (equal ids
    map equally everywhere) while raw identifiers never leave the
    task.  Stateless vectorized batch map — the privacy sibling of
    `gdpr_delete_events` and `k_anonymity_report`."""
    import hashlib

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id"])

    def scrub(t: pa.Table) -> pa.Table:
        ps = [
            hashlib.md5(f"pepper-v1|{u}".encode()).hexdigest()[:16]
            for u in t.column("user_id").to_pylist()
        ]
        return pa.table(
            {"event_id": t.column("event_id"), "pseudo_user": pa.array(ps, pa.string())}
        )

    return ev.map_batches(scrub, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Business-day ship-delay histogram: weekday-only day counting via the
# closed-form prefix f(x) = 5*((x+4)//7) + LEAST((x+4)%7, 5) (epoch
# day 0 = Thursday; the +4 shift starts weeks on Sunday).  All-integer
# arithmetic on both engines.
# ---------------------------------------------------------------------------

_BDAY_ORACLE = """
WITH j AS (SELECT CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS a,
                  CAST(FLOOR(epoch(l_shipdate)) AS BIGINT) // 86400 AS b
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
f AS (SELECT (5 * ((b + 4) // 7) + LEAST((b + 4) % 7, 5))
             - (5 * ((a + 4) // 7) + LEAST((a + 4) % 7, 5)) AS bd
      FROM j WHERE b >= a)
SELECT bd AS business_days, COUNT(*) AS n FROM f GROUP BY 1
"""


@register("ship_delay_business_days", oracle=_BDAY_ORACLE)
def ship_delay_business_days(sf_dir: str):
    """Order->ship delay measured in BUSINESS days (weekends excluded)
    via the closed-form weekday-prefix function — no calendar table
    shipped anywhere.  Same shuffle join as ship_delay_by_priority;
    the (synthetic) lines shipping before their order date are dropped
    on both engines; delay histogram rides the combiner."""
    import numpy as np

    from document_ai_ray.pipelines.ops import large_join, merge_partials

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    joined = large_join(li, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=8)

    def hist(t: pa.Table) -> pa.Table:
        a = t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False) // (
            86400 * 10**6
        )
        b = t.column("l_shipdate").cast(pa.int64()).to_numpy(zero_copy_only=False) // (
            86400 * 10**6
        )
        keep = b >= a
        a, b = a[keep], b[keep]

        def f(x):
            return 5 * ((x + 4) // 7) + np.minimum((x + 4) % 7, 5)

        bd = f(b) - f(a)
        g = pa.table({"business_days": pa.array(bd)}).group_by(["business_days"]).aggregate(
            [([], "count_all")]
        )
        return pa.Table.from_arrays(
            [g.column("business_days"), g.column("count_all")], names=["business_days", "n"]
        )

    return merge_partials(
        joined.map_batches(hist, batch_format="pyarrow"), ["business_days"], {"n": "sum"}
    )


# ---------------------------------------------------------------------------
# l-diversity audit: the sensitive-attribute sibling of
# k_anonymity_report — quasi-identifier groups whose user set is too
# small are re-identification risks even when k-anonymous.
# ---------------------------------------------------------------------------

_LDIV_L = 3

_LDIV_ORACLE = f"""
WITH g AS (SELECT event_type,
                  CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
                  COUNT(*) AS n_rows,
                  COUNT(DISTINCT user_id) AS l_distinct
           FROM events GROUP BY 1, 2)
SELECT event_type, day, n_rows, l_distinct, l_distinct < {_LDIV_L} AS at_risk
FROM g
"""


@register("l_diversity_report", oracle=_LDIV_ORACLE)
def l_diversity_report(sf_dir: str):
    """l-diversity over the (event_type, day) quasi-identifier with
    user_id as the sensitive attribute: groups carrying fewer than
    l=3 distinct users are flagged.  Distinct users ride the
    (key, user) dedup exchange; row counts ride the combiner; the
    group census is quasi-identifier-cardinality (bounded)."""
    import numpy as np

    from document_ai_ray.pipelines.ops import distinct_rows, merge_partials, partial_group_agg

    ev = read_table(sf_dir, "events", columns=["event_type", "ts", "user_id"])

    def keyed(t: pa.Table) -> pa.Table:
        day = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False) // (86400 * 10**6)
        return pa.table(
            {"event_type": t.column("event_type"), "day": pa.array(day),
             "user_id": t.column("user_id")}
        )

    kd = ev.map_batches(keyed, batch_format="pyarrow").materialize()
    rows = partial_group_agg(kd, ["event_type", "day"], count_alias="n_rows")
    dist = partial_group_agg(
        distinct_rows(kd, ["event_type", "day", "user_id"]),
        ["event_type", "day"], count_alias="l_distinct",
    ).to_pandas()
    dmap = dict(zip(zip(dist["event_type"], dist["day"]), dist["l_distinct"]))

    def finish(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_pylist()
        day = t.column("day").to_numpy(zero_copy_only=False)
        ld = np.array([dmap[(e, d)] for e, d in zip(et, day)], np.int64)
        return pa.table(
            {"event_type": t.column("event_type"), "day": t.column("day"),
             "n_rows": t.column("n_rows"), "l_distinct": pa.array(ld),
             "at_risk": pa.array(ld < _LDIV_L)}
        )

    return rows.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Index of dispersion (variance-to-mean) of hourly event counts — the
# Poisson-ness check: D = (n*Sxx - Sx^2) / ((n-1)*Sx), exact integers
# until the one division.
# ---------------------------------------------------------------------------

_DISPERSION_ORACLE = """
WITH h AS (SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hour, COUNT(*) AS x
           FROM events GROUP BY 1),
spine AS (SELECT UNNEST(generate_series((SELECT MIN(hour) FROM h),
                                        (SELECT MAX(hour) FROM h))) AS hour),
d AS (SELECT COALESCE(h.x, 0) AS x FROM spine s LEFT JOIN h ON h.hour = s.hour),
m AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM d)
SELECT CAST(n AS BIGINT) AS n_hours, sx AS n_events,
       ROUND(CAST(n * sxx - sx * sx AS DOUBLE) / (CAST((n - 1) AS BIGINT) * sx), 6)
         AS dispersion_index
FROM m
"""


@register("events_dispersion_index", oracle=_DISPERSION_ORACLE)
def events_dispersion_index(sf_dir: str):
    """Variance-to-mean ratio of hourly event counts over the dense
    hour spine (1.0 = Poisson, >1 = bursty): integer count moments
    ride the combiner, the spine fill and the single division run on
    the calendar-bounded final."""
    import numpy as np

    from document_ai_ray.pipelines.ops import merge_partials

    ev = read_table(sf_dir, "events", columns=["ts"])

    def hours(t: pa.Table) -> pa.Table:
        hr = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False) // (3600 * 10**6)
        g = pa.table({"hour": pa.array(hr)}).group_by(["hour"]).aggregate([([], "count_all")])
        return pa.Table.from_arrays([g.column("hour"), g.column("count_all")],
                                    names=["hour", "x"])

    merged = merge_partials(ev.map_batches(hours, batch_format="pyarrow"), ["hour"], {"x": "sum"})

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("hour")
        lo, hi = int(df["hour"].min()), int(df["hour"].max())
        x = np.zeros(hi - lo + 1, np.int64)
        x[df["hour"].to_numpy() - lo] = df["x"].to_numpy()
        n = len(x)
        sx = int(x.sum())
        sxx = int((x.astype(object) * x.astype(object)).sum())
        disp = float(n * sxx - sx * sx) / float((n - 1) * sx)
        disp = float(np.floor(disp * 1e6 + 0.5) / 1e6)
        return pa.table(
            {"n_hours": pa.array([n], pa.int64()),
             "n_events": pa.array([sx], pa.int64()),
             "dispersion_index": pa.array([disp], pa.float64())}
        )

    return merged.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Bag-of-words dedup: word-order-insensitive exact dedup (catches
# shuffled-word paraphrases content hashing misses).  Same hash-bucket
# shape as dedup_exact_docs; the key is md5 of the sorted token
# multiset.
# ---------------------------------------------------------------------------

_BOW_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
         array_to_string(list_reverse(
             list_filter(string_split(text, ' '), x -> x != '')), ' ')
  FROM documents WHERE doc_id % 10 = 0),
k AS (SELECT doc_id,
             md5(array_to_string(list_sort(
                 list_filter(string_split(text, ' '), x -> x != '')), ' ')) AS bow
      FROM corpus)
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS group_size FROM k GROUP BY bow
"""


@register("dedup_bag_of_words", oracle=_BOW_ORACLE)
def dedup_bag_of_words(sf_dir: str):
    """Order-insensitive exact dedup: the key is md5 over the SORTED
    token multiset, so `a b c` and `c a b` collapse — the cheap
    paraphrase tier between content-hash dedup and MinHash.  The
    corpus carries in-query word-REVERSED variants for every 10th doc
    (the oracle replays the derivation), so the collapse is actually
    exercised: every variant folds into its base's group.  Local
    min/count combiner per batch, hash(key) bucket finish; only
    (digest, min_id, count) triples ever shuffle."""
    import hashlib

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    P = 64

    def key_local(t: pa.Table) -> pa.Table:
        ids, ks = [], []
        for i, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            words = [w for w in (x or "").split(" ") if w]
            key = hashlib.md5(" ".join(sorted(words)).encode("utf-8")).hexdigest()
            ids.append(i)
            ks.append(key)
            if i % 10 == 0:  # word-reversed variant, same multiset
                ids.append(i + 1000000)
                ks.append(key)
        tt = pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "bow": pa.array(ks, pa.string())}
        )
        g = tt.group_by("bow").aggregate([("doc_id", "min"), ([], "count_all")])
        bucket = pa.array([int(x[:8], 16) % P for x in g.column("bow").to_pylist()], pa.int32())
        return pa.Table.from_arrays(
            [g.column("doc_id_min"), g.column("count_all"), g.column("bow"), bucket],
            names=["doc_id", "n", "bow", "bucket"],
        )

    def per_bucket(df) -> "pd.DataFrame":
        out = df.groupby("bow", as_index=False).agg(
            doc_id=("doc_id", "min"), group_size=("n", "sum")
        )
        return out[["doc_id", "group_size"]]

    return (
        ds.map_batches(key_local, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
