"""Advanced analytics operators: cumulative windows, LAG, exact group
quantiles, correlation, pivot, ordered string aggregation — each
oracle-checked against DuckDB (SURVEY.md §2.5/§2.9 widening).

Scale shapes:
  - cumulative / LAG: hash-BUCKET the partition key, ONE vectorized
    pandas pass per bucket (same partitioning assumption as
    sessionize/rolling: per-key locality only);
  - quantiles / correlation: per-group exact computation after a
    keyed shuffle — groups are few, so giant groups stream through
    the sort; the approximate 100 TB path for high-cardinality keys
    is a mergeable sketch (KMV precedent in functions/sketch.py);
  - pivot: combiner aggregation on (key, category), pivoted in the
    tiny final merge — categories never shuffle wide rows;
  - string_agg: ordered join inside the per-key group task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from document_ai_ray.pipelines.ops import (
    broadcast_join,
    partial_group_agg,
    round_cols,
)
from document_ai_ray.pipelines.registry import register
from document_ai_ray.sources.tables import read_table

P_BUCKETS = 32


def _user_bucket(t: pa.Table, col: str = "user_id") -> pa.Table:
    b = pc.cast(
        pc.subtract(
            t.column(col),
            pc.multiply(pc.divide(t.column(col), pa.scalar(P_BUCKETS)), pa.scalar(P_BUCKETS)),
        ),
        pa.int32(),
    )
    return t.append_column("bucket", b)


@register(
    "events_cumulative",
    oracle="""
    WITH per_ts AS (
      SELECT user_id, ts, COUNT(*) AS n, SUM(value) AS v
      FROM events GROUP BY user_id, ts
    )
    SELECT user_id, ts,
           CAST(SUM(n) OVER w AS BIGINT) AS cum_n,
           ROUND(SUM(v) OVER w, 2) AS cum_sum
    FROM per_ts
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    """,
)
def events_cumulative(sf_dir: str):
    """Running totals per user (RANGE-frame cumulative window): hash-
    bucket users, per-bucket vectorized (user, ts) pre-aggregation +
    group-keyed cumsum — no per-user Python loop, no per-user group."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def cum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        per_ts = (
            g.groupby(["user_id", "ts"], as_index=False)
            .agg(n=("value", "size"), v=("value", "sum"))
            .sort_values(["user_id", "ts"], kind="mergesort")
        )
        gb = per_ts.groupby("user_id")
        cum_n = gb["n"].cumsum().to_numpy(dtype=np.int64)
        cs = gb["v"].cumsum().to_numpy()
        cum_sum = np.copysign(np.floor(np.abs(cs) * 100 + 0.5), cs) / 100
        return pd.DataFrame(
            {
                "user_id": per_ts["user_id"].to_numpy(),
                "ts": per_ts["ts"].to_numpy(),
                "cum_n": cum_n,
                "cum_sum": cum_sum,
            }
        )

    return (
        ds.map_batches(_user_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: cum_bucket(g.drop(columns=["bucket"])), batch_format="pandas")
    )


@register(
    "lag_orders",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey), 2) AS prev_price
    FROM orders
    """,
)
def lag_orders(sf_dir: str):
    """LAG window: each order with its customer's previous order price.
    Bucket customers, per-bucket sort + group-keyed shift (NULL for a
    customer's first order, same as SQL LAG)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def lag_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        prev = g.groupby("o_custkey")["o_totalprice"].shift(1).to_numpy()
        with np.errstate(invalid="ignore"):
            prev = np.where(np.isnan(prev), np.nan, np.copysign(np.floor(np.abs(prev) * 100 + 0.5), prev) / 100)
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "o_custkey": g["o_custkey"].to_numpy(),
                "prev_price": prev,
            }
        )

    return (
        ds.map_batches(lambda t: _user_bucket(t, "o_custkey"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: lag_bucket(g.drop(columns=["bucket"])), batch_format="pandas")
    )


@register(
    "price_quantiles_by_priority",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.25), 2) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 2) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 2) AS p75
    FROM orders GROUP BY o_orderpriority
    """,
)
def price_quantiles_by_priority(sf_dir: str):
    """EXACT per-group quantiles (linear interpolation — the
    PERCENTILE_CONT definition), scale-safe: a range-partitioned
    distributed sort with offset-merged ranks (`with_group_ranks`)
    instead of one task per group.  Each block keeps only the rows
    whose global in-group rank is a quantile boundary (floor/ceil of
    h = (n-1)q), so the final interpolation sees <= 6 rows per group —
    output-sized, never a corpus partition.  The mergeable-sketch route
    (`approx_price_quantiles`) remains the approximate path."""
    from document_ai_ray.pipelines.ops import with_group_ranks

    ds = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
    ranked = with_group_ranks(ds, "o_orderpriority", ["o_totalprice"])
    qs = (0.25, 0.50, 0.75)

    def pick_boundaries(t: pa.Table) -> pa.Table:
        r = t.column("__rank").to_numpy(zero_copy_only=False)
        n = t.column("__gn").to_numpy(zero_copy_only=False)
        keep = np.zeros(len(t), dtype=bool)
        for q in qs:
            h = (n - 1) * q
            keep |= (r == np.floor(h)) | (r == np.ceil(h))
        return t.filter(pa.array(keep))

    # <= 6 boundary rows per group — output-sized, safe to collect
    rows = ranked.map_batches(pick_boundaries, batch_format="pyarrow").take_all()
    by_g: dict[str, dict[int, tuple[float, int]]] = {}
    for r0 in rows:
        by_g.setdefault(r0["o_orderpriority"], {})[r0["__rank"]] = (
            r0["o_totalprice"],
            r0["__gn"],
        )
    out = []
    for g in sorted(by_g):
        rankmap = by_g[g]
        n = next(iter(rankmap.values()))[1]
        rec = {"o_orderpriority": g}
        for q, name in zip(qs, ("p25", "p50", "p75")):
            h = (n - 1) * q
            lo = rankmap[int(np.floor(h))][0]
            hi = rankmap[int(np.ceil(h))][0]
            v = lo + (h - np.floor(h)) * (hi - lo)
            rec[name] = float(np.copysign(np.floor(abs(v) * 100 + 0.5), v) / 100)
        out.append(rec)
    return pd.DataFrame(out)


@register(
    "corr_price_qty",
    oracle="""
    SELECT l_returnflag, ROUND(CORR(l_extendedprice, l_quantity), 6) AS corr_pq
    FROM lineitem GROUP BY l_returnflag
    """,
)
def corr_price_qty(sf_dir: str):
    """Pearson correlation per group.  Two-pass (means then residual
    co-moments) inside the group task for numerical stability — naive
    sum-of-products combiners lose ~10 digits on 1e5-scale values and
    flip ROUND(...,6)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice", "l_quantity"])

    def corr_group(g: pd.DataFrame) -> pd.DataFrame:
        x = g["l_extendedprice"].to_numpy(dtype=np.float64)
        y = g["l_quantity"].to_numpy(dtype=np.float64)
        xc, yc = x - x.mean(), y - y.mean()
        r = (xc * yc).sum() / np.sqrt((xc * xc).sum() * (yc * yc).sum())
        r = np.copysign(np.floor(abs(r) * 1e6 + 0.5), r) / 1e6
        return pd.DataFrame({"l_returnflag": [g["l_returnflag"].iloc[0]], "corr_pq": [r]})

    return ds.groupby("l_returnflag").map_groups(corr_group, batch_format="pandas")


@register(
    "priority_pivot",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
           COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH')   AS n_high,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH')) AS n_other
    FROM orders GROUP BY 1
    """,
)
def priority_pivot(sf_dir: str):
    """Pivot (crosstab): combiner aggregation on (month, priority),
    pivoted to fixed category columns in the tiny final merge — the
    wide rows never shuffle."""
    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_orderpriority"])

    def derive(t: pa.Table) -> pa.Table:
        month = pc.strftime(t.column("o_orderdate"), format="%Y-%m")
        return pa.Table.from_arrays(
            [month, t.column("o_orderpriority")], names=["month", "prio"]
        )

    agg = partial_group_agg(
        ds.map_batches(derive, batch_format="pyarrow"), ["month", "prio"], count_alias="n"
    )

    def pivot(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["cat"] = np.where(
            df["prio"] == "1-URGENT", "n_urgent",
            np.where(df["prio"] == "2-HIGH", "n_high", "n_other"),
        )
        out = (
            df.groupby(["month", "cat"], as_index=False)["n"].sum()
            .pivot(index="month", columns="cat", values="n")
            .reindex(columns=["n_urgent", "n_high", "n_other"])
            .fillna(0).astype(np.int64).reset_index()
        )
        out.columns.name = None
        return pa.Table.from_pandas(out, preserve_index=False)

    # the merged (month, prio) table is tiny: pivot in one final task
    return agg.repartition(1).map_batches(pivot, batch_format="pyarrow", batch_size=1 << 30)


@register(
    "region_nations_agg",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def region_nations_agg(sf_dir: str):
    """Ordered string aggregation per key (LISTAGG shape): broadcast
    dim join, then the ordered join happens inside the per-key group
    task."""
    nation = read_table(sf_dir, "nation", columns=["n_name", "n_regionkey"])
    region = read_table(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    joined = broadcast_join(
        nation, pa.Table.from_pandas(region), key="n_regionkey", right_key="r_regionkey"
    )

    def agg_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"r_name": [g["r_name"].iloc[0]],
             "nations": [",".join(sorted(g["n_name"]))]}
        )

    return joined.groupby("r_name").map_groups(agg_group, batch_format="pandas")


@register("approx_price_quantiles")
def approx_price_quantiles(sf_dir: str):
    """MERGEABLE quantile-sketch per group (rows-only: approximate by
    nature; accuracy vs the exact quantiles is asserted in
    tests/test_analytics.py).  This is the 100 TB companion of
    `price_quantiles_by_priority`: per-batch centroid digests, two
    coalescing merge levels, one final task — values never shuffle,
    only <= K centroids per (batch, key)."""
    from document_ai_ray.functions.sketch import (
        qsketch_compress,
        qsketch_from_bytes,
        qsketch_merge,
        qsketch_quantile,
        qsketch_to_bytes,
    )

    K = 256
    ds = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        rows = []
        for key, g in df.groupby("o_orderpriority"):
            x = g["o_totalprice"].to_numpy(dtype=np.float64)
            sk = qsketch_compress(x, np.ones(len(x)), K)
            rows.append({"o_orderpriority": key, "sketch": qsketch_to_bytes(sk)})
        return pa.Table.from_pylist(
            rows, schema=pa.schema([("o_orderpriority", pa.string()), ("sketch", pa.binary())])
        )

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        rows = []
        for key, g in df.groupby("o_orderpriority"):
            sk = qsketch_merge([qsketch_from_bytes(b) for b in g["sketch"]], K)
            rows.append({"o_orderpriority": key, "sketch": qsketch_to_bytes(sk)})
        return pa.Table.from_pylist(
            rows, schema=pa.schema([("o_orderpriority", pa.string()), ("sketch", pa.binary())])
        )

    def finalize(t: pa.Table) -> pa.Table:
        rows = []
        for key, b in zip(t.column("o_orderpriority").to_pylist(), t.column("sketch").to_pylist()):
            sk = qsketch_from_bytes(b)
            rows.append(
                {"o_orderpriority": key,
                 "p25": qsketch_quantile(sk, 0.25),
                 "p50": qsketch_quantile(sk, 0.50),
                 "p75": qsketch_quantile(sk, 0.75)}
            )
        return pa.Table.from_pylist(rows)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    merged = partials.map_batches(merge, batch_format="pyarrow", batch_size=1 << 10)
    merged = merged.repartition(1).map_batches(merge, batch_format="pyarrow", batch_size=1 << 30)
    return merged.map_batches(finalize, batch_format="pyarrow")


@register(
    "ntile_orders",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice, o_orderkey) AS tile
    FROM orders
    """,
)
def ntile_orders(sf_dir: str):
    """NTILE window: equal-depth quartile assignment per priority,
    scale-safe: global per-group ranks come from a range-partitioned
    distributed sort with offset-merged per-block counts
    (`with_group_ranks`), then the tile is a pure vectorized function
    of (rank, group size) per block — no task ever holds a whole
    priority partition (SQL's first-(n mod k)-tiles-are-larger rule
    reproduced exactly)."""
    from document_ai_ray.pipelines.ops import with_group_ranks

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    # o_orderkey tiebreaker makes the rank (and thus the tile) unique
    ranked = with_group_ranks(ds, "o_orderpriority", ["o_totalprice", "o_orderkey"])
    k = 4

    def tile_batch(t: pa.Table) -> pa.Table:
        r = t.column("__rank").to_numpy(zero_copy_only=False)
        n = t.column("__gn").to_numpy(zero_copy_only=False)
        size, rem = n // k, n % k
        big = rem * (size + 1)
        tile = np.where(r < big, r // (size + 1), rem + (r - big) // np.maximum(size, 1))
        return pa.Table.from_arrays(
            [t.column("o_orderkey"), pa.array((tile + 1).astype(np.int64))],
            names=["o_orderkey", "tile"],
        )

    return ranked.map_batches(tile_batch, batch_format="pyarrow")


def _set_op(sf_dir: str, op: str):
    from document_ai_ray.pipelines.ops import set_op_keys

    a = read_table(sf_dir, "orders", columns=["o_orderkey"], filter=(pc.field("o_totalprice") > 100000))
    b = read_table(sf_dir, "orders", columns=["o_orderkey"], filter=(pc.field("o_orderpriority") == "1-URGENT"))
    return set_op_keys(a, b, "o_orderkey", op)


@register(
    "intersect_high_urgent",
    oracle="""
    SELECT o_orderkey FROM orders WHERE o_totalprice > 100000
    INTERSECT
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def intersect_high_urgent(sf_dir: str):
    """Distributed INTERSECT (distinct keys present on BOTH sides) via
    one bucketed groupby over side-tagged keys."""
    return _set_op(sf_dir, "intersect")


@register(
    "except_high_urgent",
    oracle="""
    SELECT o_orderkey FROM orders WHERE o_totalprice > 100000
    EXCEPT
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def except_high_urgent(sf_dir: str):
    """Distributed EXCEPT (distinct keys on A and not on B), same
    machinery."""
    return _set_op(sf_dir, "except")


@register(
    "stratified_sample_docs",
    oracle="""
    SELECT doc_id, lang FROM documents
    QUALIFY (ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) - 1) % 10 = 0
    """,
)
def stratified_sample_docs(sf_dir: str):
    """Deterministic stratified systematic sample: every 10th document
    per language in doc_id order — the reproducible per-stratum
    downsample a corpus-mixing pipeline uses (random-seeded variants
    share the shape; this one is oracle-checkable).  Keyed shuffle on
    the stratum, vectorized rank + modulo per group."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        return g.iloc[::10][["doc_id", "lang"]]

    return ds.groupby("lang").map_groups(pick, batch_format="pandas")


@register(
    "rollup_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_pricing(sf_dir: str):
    """ROLLUP aggregate: leaf combiner aggregation once, super-group
    levels re-aggregated FROM THE LEAVES in the tiny final task — the
    fact rows are scanned exactly once for all three levels."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])
    leaf = partial_group_agg(
        ds, ["l_returnflag", "l_linestatus"], {"l_quantity": "sum_qty"}, count_alias="n"
    )

    def rollup(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        lvl1 = df.groupby("l_returnflag", as_index=False).agg(sum_qty=("sum_qty", "sum"), n=("n", "sum"))
        lvl1["l_linestatus"] = None
        total = pd.DataFrame(
            {"l_returnflag": [None], "l_linestatus": [None],
             "sum_qty": [df["sum_qty"].sum()], "n": [df["n"].sum()]}
        )
        out = pd.concat([df, lvl1, total], ignore_index=True)[
            ["l_returnflag", "l_linestatus", "sum_qty", "n"]
        ]
        sq = out["sum_qty"].to_numpy()
        out["sum_qty"] = np.copysign(np.floor(np.abs(sq) * 100 + 0.5), sq) / 100
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return leaf.repartition(1).map_batches(rollup, batch_format="pyarrow", batch_size=1 << 30)


@register(
    "funnel_signup_purchase",
    oracle="""
    SELECT COUNT(DISTINCT s.user_id) AS n_users
    FROM events s JOIN events p
      ON p.user_id = s.user_id
     AND s.event_type = 'signup' AND p.event_type = 'purchase'
     AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
    """,
)
def funnel_signup_purchase(sf_dir: str):
    """Funnel step analysis: users with a signup followed by a purchase
    within 1 hour.  Pruned read of only the two funnel event types,
    hash-bucketed by user, ONE vectorized merge_asof per bucket (the
    sequential-pattern shape sessionize cannot express), then a
    single-task count merge."""
    ds = read_table(
        sf_dir, "events", columns=["user_id", "ts", "event_type"],
        filter=(pc.field("event_type").isin(["signup", "purchase"])),
    )

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g[g["event_type"] == "signup"][["user_id", "ts"]].sort_values("ts", kind="mergesort")
        p = g[g["event_type"] == "purchase"][["user_id", "ts"]].sort_values("ts", kind="mergesort")
        if s.empty or p.empty:
            return pd.DataFrame({"n_users": pd.Series([0], dtype="int64")})
        m = pd.merge_asof(
            s, p.rename(columns={"ts": "p_ts"}), left_on="ts", right_on="p_ts",
            by="user_id", direction="forward", tolerance=pd.Timedelta("1h"),
        )
        n = m.loc[m["p_ts"].notna(), "user_id"].nunique()
        return pd.DataFrame({"n_users": pd.Series([n], dtype="int64")})

    per_bucket = (
        ds.map_batches(_user_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: count_bucket(g.drop(columns=["bucket"])), batch_format="pandas")
    )

    def total(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pa.array([pc.sum(t.column("n_users")).as_py() or 0], pa.int64())], names=["n_users"]
        )

    return per_bucket.repartition(1).map_batches(total, batch_format="pyarrow", batch_size=1 << 30)


@register(
    "cube_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_pricing(sf_dir: str):
    """CUBE aggregate (all four grouping sets of two dims): the same
    scan-once discipline as `rollup_pricing` — leaf combiner
    aggregation over the facts, then every super-level re-aggregated
    FROM THE LEAVES in the tiny final task.  The extra level vs ROLLUP
    is (NULL, l_linestatus)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])
    leaf = partial_group_agg(
        ds, ["l_returnflag", "l_linestatus"], {"l_quantity": "sum_qty"}, count_alias="n"
    )

    def cube(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        by_flag = df.groupby("l_returnflag", as_index=False).agg(
            sum_qty=("sum_qty", "sum"), n=("n", "sum")
        )
        by_flag["l_linestatus"] = None
        by_status = df.groupby("l_linestatus", as_index=False).agg(
            sum_qty=("sum_qty", "sum"), n=("n", "sum")
        )
        by_status["l_returnflag"] = None
        total = pd.DataFrame(
            {"l_returnflag": [None], "l_linestatus": [None],
             "sum_qty": [df["sum_qty"].sum()], "n": [df["n"].sum()]}
        )
        out = pd.concat([df, by_flag, by_status, total], ignore_index=True)[
            ["l_returnflag", "l_linestatus", "sum_qty", "n"]
        ]
        sq = out["sum_qty"].to_numpy()
        out["sum_qty"] = np.copysign(np.floor(np.abs(sq) * 100 + 0.5), sq) / 100
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return leaf.repartition(1).map_batches(cube, batch_format="pyarrow", batch_size=1 << 30)


@register(
    "mode_qty_by_flag",
    # explicit windowed-count form instead of mode(): DuckDB's mode()
    # breaks frequency ties arbitrarily; this pins min-value tie-break
    # on both sides
    oracle="""
    WITH c AS (SELECT l_returnflag, l_quantity AS v, COUNT(*) AS n
               FROM lineitem GROUP BY 1, 2),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                       ORDER BY n DESC, v) AS rn FROM c)
    SELECT l_returnflag, v AS mode_qty, n FROM r WHERE rn = 1
    """,
)
def mode_qty_by_flag(sf_dir: str):
    """Per-group MODE (most frequent value, min-value tie-break): the
    (group, value) domain is tiny (3 flags x 50 quantities), so the
    combiner pattern reduces the corpus to <=150 count rows before the
    single-task argmax — the fact rows are scanned exactly once and
    never shuffled."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    counts = partial_group_agg(ds, ["l_returnflag", "l_quantity"], count_alias="n")

    def pick(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["l_returnflag", "n", "l_quantity"], ascending=[True, False, True],
            kind="mergesort",
        )
        out = df.groupby("l_returnflag", as_index=False).first()
        out = out.rename(columns={"l_quantity": "mode_qty"})
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out[["l_returnflag", "mode_qty", "n"]], preserve_index=False)

    return counts.repartition(1).map_batches(pick, batch_format="pyarrow", batch_size=1 << 30)


@register(
    "percent_rank_orders",
    # o_orderkey in the ORDER BY makes the ordering unique, so
    # RANK == ROW_NUMBER and both sides agree exactly on ties
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank,
           ROUND(CUME_DIST() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice, o_orderkey), 6) AS cume
    FROM orders
    """,
)
def percent_rank_orders(sf_dir: str):
    """PERCENT_RANK + CUME_DIST per order within its priority class —
    rank-global window semantics on the scale-safe exact-rank substrate
    (`ops.with_group_ranks`: distributed range-partitioned sort +
    offset-merged per-block ranks; no task holds a whole priority
    partition).  Unique (o_totalprice, o_orderkey) ordering pins tie
    behavior identically on both sides."""
    from document_ai_ray.pipelines.ops import with_group_ranks

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    ranked = with_group_ranks(ds, "o_orderpriority", ["o_totalprice", "o_orderkey"])

    def finish(t: pa.Table) -> pa.Table:
        rank = t.column("__rank").to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.column("__gn").to_numpy(zero_copy_only=False).astype(np.float64)
        pr = np.where(n > 1, rank / np.maximum(n - 1, 1), 0.0)
        cume = (rank + 1) / n
        pr = np.copysign(np.floor(np.abs(pr) * 1e6 + 0.5), pr) / 1e6
        cume = np.copysign(np.floor(np.abs(cume) * 1e6 + 0.5), cume) / 1e6
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_orderpriority": t.column("o_orderpriority"),
                "pct_rank": pa.array(pr, pa.float64()),
                "cume": pa.array(cume, pa.float64()),
            }
        )

    return ranked.map_batches(finish, batch_format="pyarrow")


@register(
    "moving_avg_events",
    oracle="""
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS ma4
    FROM events
    """,
)
def moving_avg_events(sf_dir: str):
    """ROWS-frame moving average (4-row window per user) — the
    row-count-frame sibling of the time-RANGE `events_rolling_1h`:
    hash-bucket users, one vectorized per-bucket sort + group-keyed
    pandas rolling(4).  Unique (ts, event_id) ordering pins frame
    contents identically on both sides."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def ma_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ma = (
            g.groupby("user_id")["value"]
            .rolling(4, min_periods=1)
            .mean()
            .reset_index(level=0, drop=True)
            .to_numpy()
        )
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "ma4": np.copysign(np.floor(np.abs(ma) * 1e6 + 0.5), ma) / 1e6,
            }
        )

    return (
        ds.map_batches(_user_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: ma_bucket(g.drop(columns=["bucket"])), batch_format="pandas")
    )


@register(
    "event_value_outliers",
    # membership uses the ROUNDED z on BOTH sides so a boundary row
    # cannot flip between engines on a last-ulp difference (the
    # uniform TPC-H price columns have NO |z|>2.5 tail; events.value
    # is the heavy-tailed one — measured max |z| 8.7)
    oracle="""
    WITH s AS (SELECT event_type, AVG(value) AS mu,
                      STDDEV_POP(value) AS sd
               FROM events GROUP BY 1)
    SELECT event_id, event_type,
           ROUND((value - mu) / sd, 6) AS z
    FROM events JOIN s USING (event_type)
    WHERE sd > 0 AND ABS(ROUND((value - mu) / sd, 6)) > 2.5
    """,
)
def event_value_outliers(sf_dir: str):
    """Per-group z-score outlier detection (|z| > 2.5 within the event
    type): ONE combiner pass reduces the facts to per-group
    (n, sum, sumsq) sufficient statistics, the tiny stats table is
    broadcast back, and a second streaming pass scores + filters —
    the canonical two-pass shape that never shuffles fact rows."""
    import ray

    from document_ai_ray.pipelines.ops import get_broadcast

    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def suff(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("event_type")["value"].agg(["size", "sum"])
        g["sumsq"] = df.assign(q=df["value"] ** 2).groupby("event_type")["q"].sum()
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    stats: dict[str, tuple[float, float]] = {}
    acc: dict[str, list[float]] = {}
    for b in ds.map_batches(suff, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for k, n, s, q in zip(
            b.column("event_type").to_pylist(),
            b.column("size").to_pylist(),
            b.column("sum").to_pylist(),
            b.column("sumsq").to_pylist(),
        ):
            a = acc.setdefault(k, [0.0, 0.0, 0.0])
            a[0] += n
            a[1] += s
            a[2] += q
    for k, (n, s, q) in acc.items():
        mu = s / n
        stats[k] = (mu, np.sqrt(max(q / n - mu * mu, 0.0)))
    ref = ray.put(stats)

    def score(t: pa.Table, _ref=ref) -> pa.Table:
        st: dict = get_broadcast((_ref,), tag="zscore_stats")
        et = t.column("event_type").to_pylist()
        val = t.column("value").to_numpy(zero_copy_only=False)
        mu = np.array([st[p][0] for p in et])
        sd = np.array([st[p][1] for p in et])
        # a constant-valued group has sd == 0: define z = 0 (no outlier)
        # instead of inf/NaN, matching the oracle's WHERE sd > 0 gate
        z = np.where(sd > 0, (val - mu) / np.where(sd > 0, sd, 1.0), 0.0)
        z = np.copysign(np.floor(np.abs(z) * 1e6 + 0.5), z) / 1e6
        keep = np.abs(z) > 2.5
        return pa.table(
            {
                "event_id": t.column("event_id").filter(pa.array(keep)),
                "event_type": t.column("event_type").filter(pa.array(keep)),
                "z": pa.array(z[keep], pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def _users_hll_oracle() -> str:
    from document_ai_ray.functions.sketch import HLL60_ALPHA_NANO

    return f"""
WITH pairs AS (SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS v FROM events),
hh AS (SELECT event_type, CAST(('0x' || substr(md5(v), 1, 15)) AS BIGINT) AS h FROM pairs),
rr AS (SELECT event_type, h >> 48 AS idx,
              MAX(CASE WHEN (h & 281474976710655) = 0 THEN 49
                       ELSE 49 - length(bin(h & 281474976710655)) END) AS rho
       FROM hh GROUP BY 1, 2),
ss AS (SELECT event_type, CAST(SUM(CAST(1 AS BIGINT) << (49 - rho)) AS BIGINT) AS sp,
              COUNT(*) AS np FROM rr GROUP BY 1),
ag AS (SELECT event_type, sp + (4096 - np) * (CAST(1 AS BIGINT) << 49) AS s,
              4096 - np AS zeros FROM ss),
ml AS (SELECT event_type,
              CAST(CAST({HLL60_ALPHA_NANO} AS HUGEINT) * 4096 * 4096
                   * (CAST(1 AS HUGEINT) << 49) * 1000
                   // (CAST(1000000000 AS HUGEINT) * s) AS BIGINT) AS raw,
              zeros FROM ag),
es AS (SELECT event_type,
              CASE WHEN raw <= 2500 * 4096 AND zeros > 0
                   THEN CAST(FLOOR(1000.0 * 4096 * LN(4096.0 / zeros)) AS BIGINT)
                   ELSE raw END AS est_milli FROM ml),
ex AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY 1)
SELECT es.event_type,
       est_milli AS est_distinct_users_milli,
       ex.n AS exact_distinct_users,
       CAST(ABS(est_milli - 1000 * ex.n) * 10000 // (1000 * ex.n) AS BIGINT)
         AS rel_err_bp
FROM es JOIN ex USING (event_type)
"""


@register("approx_distinct_users_by_type", oracle=_users_hll_oracle())
def approx_distinct_users_by_type(sf_dir: str):
    """GROUPED approximate count-distinct (distinct users per event
    type) via mergeable per-group HyperLogLog registers — the grouped
    sibling of `approx_distinct_words_hll`, and the shape that replaces
    a COUNT(DISTINCT) shuffle at 100 TB: per-batch (group, registers)
    partials (constant size per group per batch), one tiny max-merge
    per group, estimates on the driver.  ORACLE-CHECKED (round 5): the
    md5-60-bit register spec + exact-integer estimate substrate
    (`functions/sketch.py:hll60_*`) replays bit-for-bit per group in
    DuckDB; the exact count and integer basis-point error ride along."""
    import pickle

    from document_ai_ray.functions.sketch import (
        hll60_est_milli,
        hll60_registers,
        hll_merge,
    )

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        types, blobs = [], []
        for et, g in df.groupby("event_type"):
            types.append(et)
            blobs.append(
                pickle.dumps(hll60_registers(str(u) for u in g["user_id"].unique()))
            )
        return pa.table(
            {"event_type": pa.array(types, pa.string()), "regs": pa.array(blobs, pa.binary())}
        )

    merged: dict[str, list] = {}
    exact: dict[str, set] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for et, blob in zip(b.column("event_type").to_pylist(), b.column("regs").to_pylist()):
            merged.setdefault(et, []).append(pickle.loads(blob))
    # exact side for the self-check (distinct (type, user) pairs are
    # small here; at scale you would drop this column, not the sketch)
    for b in (
        read_table(sf_dir, "events", columns=["event_type", "user_id"])
        .map_batches(
            lambda t: t.group_by(["event_type", "user_id"]).aggregate([]),
            batch_format="pyarrow",
        )
        .iter_batches(batch_format="pyarrow")
    ):
        for et, u in zip(b.column("event_type").to_pylist(), b.column("user_id").to_pylist()):
            exact.setdefault(et, set()).add(u)

    types = sorted(merged)
    est = [hll60_est_milli(hll_merge(merged[t]))[0] for t in types]
    ex = [len(exact[t]) for t in types]
    bp = [abs(e - 1000 * x) * 10000 // (1000 * x) if x else 0 for e, x in zip(est, ex)]
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "est_distinct_users_milli": pa.array(est, pa.int64()),
            "exact_distinct_users": pa.array(ex, pa.int64()),
            "rel_err_bp": pa.array(bp, pa.int64()),
        }
    )


@register(
    "rank_dense_rank_orders",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(RANK() OVER (PARTITION BY o_orderpriority
                             ORDER BY l_bucket) AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER (PARTITION BY o_orderpriority
                                   ORDER BY l_bucket) AS BIGINT) AS drnk
    FROM (SELECT o_orderkey, o_orderpriority,
                 CAST(FLOOR(o_totalprice / 10000) AS BIGINT) AS l_bucket
          FROM orders)
    """,
)
def rank_dense_rank_orders(sf_dir: str):
    """Tie-aware RANK and DENSE_RANK (completing the window family
    next to ROW_NUMBER / NTILE / PERCENT_RANK): prices are bucketed to
    10k bands so ties genuinely exist, then
      RANK  = 1 + min ROW_NUMBER among equal values,
      DENSE = 1 + the value's position among the group's DISTINCT
              values,
    both computed on the scale-safe exact-rank substrate: one
    `with_group_ranks` pass over the rows gives ROW_NUMBERs, a
    (group, value) REDUCTION (combiner min) gives per-value first
    ranks, a second `with_group_ranks` over that distinct-value table
    gives dense positions, and one bucketed join ships the two
    value-keyed columns back to the rows — no task ever holds a whole
    partition."""
    import numpy as np
    import pandas as pd

    from document_ai_ray.functions.hashing import crc_bucket
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import (
        bucket_map_groups,
        partial_group_agg,
        with_group_ranks,
    )

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

    def bucketize(t: pa.Table) -> pa.Table:
        p = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_orderpriority": t.column("o_orderpriority"),
                "v": pa.array((p / 10000).astype(np.int64)),
            }
        )

    rows = with_group_ranks(
        ds.map_batches(bucketize, batch_format="pyarrow"),
        "o_orderpriority",
        ["v", "o_orderkey"],
    )

    # per (group, value): min row_number  (combiner-friendly)
    def min_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["o_orderpriority", "v"], as_index=False)["__rank"].min()
        return pa.Table.from_pandas(g.rename(columns={"__rank": "minr"}), preserve_index=False)

    P = auto_buckets(ds.count())

    def gv_bucket_pd(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = [
            crc_bucket(f"{s}\x1f{v}", P) for s, v in zip(df["o_orderpriority"], df["v"])
        ]
        return df

    firsts = bucket_map_groups(
        rows.map_batches(min_partial, batch_format="pyarrow").map_batches(
            gv_bucket_pd, batch_format="pandas"
        ),
        "bucket",
        lambda df: df.groupby(["o_orderpriority", "v"], as_index=False)["minr"].min(),
        P,
        batch_format="pandas",
    ).materialize()  # distinct-value table: one per (group, band)

    # dense position = rank of the value within the group's distinct set
    dense = with_group_ranks(firsts, "o_orderpriority", ["v"])

    def dense_cols(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "v": t.column("v"),
                "minr": t.column("minr"),
                "dpos": t.column("__rank"),
            }
        )

    lookup = dense.map_batches(dense_cols, batch_format="pyarrow")

    # bucketed join: value-keyed (minr, dpos) back onto the rows
    def tag_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "v": t.column("v"),
                "o_orderkey": t.column("o_orderkey"),
                "minr": pa.array(np.full(len(t), -1, np.int64)),
                "dpos": pa.array(np.full(len(t), -1, np.int64)),
            }
        )

    def tag_lookup(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "v": t.column("v"),
                "o_orderkey": pa.array(np.full(len(t), -1, np.int64)),
                "minr": t.column("minr"),
                "dpos": t.column("dpos"),
            }
        )

    unioned = rows.map_batches(tag_rows, batch_format="pyarrow").union(
        lookup.map_batches(tag_lookup, batch_format="pyarrow")
    )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        lk = df[df["o_orderkey"] == -1][["o_orderpriority", "v", "minr", "dpos"]]
        rw = df[df["o_orderkey"] != -1][["o_orderpriority", "v", "o_orderkey"]]
        m = rw.merge(lk, on=["o_orderpriority", "v"])
        return pd.DataFrame(
            {
                "o_orderkey": m["o_orderkey"].to_numpy(np.int64),
                "o_orderpriority": m["o_orderpriority"].to_numpy(),
                "rnk": (m["minr"].to_numpy(np.int64) + 1),
                "drnk": (m["dpos"].to_numpy(np.int64) + 1),
            }
        )

    return bucket_map_groups(
        unioned.map_batches(gv_bucket_pd, batch_format="pandas"), "bucket", join_bucket, P,
        batch_format="pandas",
    )


@register(
    "first_last_value_orders",
    oracle="""
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND UNBOUNDED FOLLOWING) AS last_order,
           ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS first_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def first_last_value_orders(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE per customer (each customer's first and
    latest order under a pinned unique ordering) — one vectorized
    per-bucket sort + group first/last, the LAG shape with endpoint
    aggregation instead of a shift.  DISTINCT on both sides collapses
    the per-row window to one row per customer."""
    import numpy as np

    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )

    def fl_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        gb = g.groupby("o_custkey", as_index=False)
        first = gb.first()
        last = gb.last()
        fp = first["o_totalprice"].to_numpy()
        return pd.DataFrame(
            {
                "o_custkey": first["o_custkey"].to_numpy(),
                "first_order": first["o_orderkey"].to_numpy(np.int64),
                "last_order": last["o_orderkey"].to_numpy(np.int64),
                "first_price": np.copysign(np.floor(np.abs(fp) * 100 + 0.5), fp) / 100,
            }
        )

    def cust_bucket(t: pa.Table) -> pa.Table:
        import numpy as np

        k = t.column("o_custkey").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((k % P_BUCKETS).astype(np.int32)))

    return (
        ds.map_batches(cust_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: fl_bucket(g.drop(columns=["bucket"])), batch_format="pandas")
    )


@register(
    "event_transitions_markov",
    oracle="""
    WITH s AS (SELECT user_id, event_type,
                      LEAD(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS next_type
               FROM events)
    SELECT event_type, next_type, COUNT(*) AS n
    FROM s WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def event_transitions_markov(sf_dir: str):
    """First-order Markov transition counts over per-user event
    sequences (the clickstream transition-matrix op): hash-bucket
    users, ONE vectorized per-bucket sort + shift to pair each event
    with its successor, then the combiner aggregate over the tiny
    (type, next_type) domain.  Unique (ts, event_id) ordering pins
    successor choice identically on both sides."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def trans_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        nxt = g["event_type"].shift(-1)
        same_user = g["user_id"].shift(-1) == g["user_id"]
        keep = same_user.to_numpy()
        out = pd.DataFrame(
            {"event_type": g["event_type"].to_numpy()[keep], "next_type": nxt.to_numpy()[keep]}
        )
        return out.groupby(["event_type", "next_type"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    bucketed = (
        ds.map_batches(_user_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: trans_bucket(g.drop(columns=["bucket"])), batch_format="pandas")
    )
    return partial_group_agg(
        bucketed, ["event_type", "next_type"], {"n": "n"}
    ).select_columns(["event_type", "next_type", "n"])


@register(
    "retention_cohorts",
    oracle="""
    WITH f AS (SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY 1),
    j AS (SELECT e.user_id,
                 date_trunc('day', f.first_ts) AS cohort_day,
                 date_diff('day', date_trunc('day', f.first_ts),
                           date_trunc('day', e.ts)) AS days_since
          FROM events e JOIN f USING (user_id))
    SELECT CAST(strftime(cohort_day, '%Y-%m-%d') AS VARCHAR) AS cohort,
           CAST(days_since AS BIGINT) AS days_since,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
    FROM j GROUP BY 1, 2
    """,
)
def retention_cohorts(sf_dir: str):
    """Retention cohort matrix (the product-analytics staple): users
    cohorted by first-event DAY (the synthetic corpus spans one
    month), counted distinct on every later day.  Distributed shape:
    per-user first-event via a bucketed MIN combiner; events re-join
    their user's cohort in the SAME user bucket (one shuffle serves
    both); day arithmetic vectorized on epoch days; the distinct-user
    count per (cohort, days_since) dedupes INSIDE the user bucket (a
    user lives in exactly one bucket, so local distinct is global)
    and sums tiny partials."""
    import numpy as np

    from document_ai_ray.pipelines.ops import partial_group_agg

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def cohort_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy("datetime64[us]")
        days = ts.astype("datetime64[D]").astype(np.int64)  # epoch days
        users = g["user_id"].to_numpy(np.int64)
        first = pd.DataFrame({"u": users, "d": days}).groupby("u")["d"].min()
        cohort = first.loc[users].to_numpy(np.int64)
        since = days - cohort
        trip = pd.DataFrame({"c": cohort, "s": since, "u": users}).drop_duplicates()
        out = trip.groupby(["c", "s"], as_index=False).size()
        cd = out["c"].to_numpy(np.int64).astype("datetime64[D]")
        return pd.DataFrame(
            {
                "cohort": np.datetime_as_string(cd, unit="D"),
                "days_since": out["s"].to_numpy(np.int64),
                "n_active": out["size"].to_numpy(np.int64),
            }
        )

    bucketed = (
        ds.map_batches(_user_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: cohort_bucket(g.drop(columns=["bucket"])), batch_format="pandas")
    )
    return partial_group_agg(
        bucketed, ["cohort", "days_since"], {"n_active": "n_active"}
    ).select_columns(["cohort", "days_since", "n_active"])


@register(
    "grouping_sets_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def grouping_sets_pricing(sf_dir: str):
    """GROUPING SETS aggregate (arbitrary level list — the general form
    of ROLLUP/CUBE): one leaf combiner scan of the facts, every
    requested grouping set re-aggregated FROM THE LEAVES in the tiny
    final task.  Same scan-once discipline as `rollup_pricing` /
    `cube_pricing`; the level list here is the two single-dim sets,
    which neither ROLLUP nor CUBE emits alone."""
    import numpy as np
    import pandas as pd

    from document_ai_ray.pipelines.ops import partial_group_agg
    from document_ai_ray.sources.tables import read_table

    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])
    leaf = partial_group_agg(
        ds, ["l_returnflag", "l_linestatus"], {"l_quantity": "sum_qty"}, count_alias="n"
    )

    def expand(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        by_flag = df.groupby("l_returnflag", as_index=False).agg(
            sum_qty=("sum_qty", "sum"), n=("n", "sum")
        )
        by_flag["l_linestatus"] = None
        by_status = df.groupby("l_linestatus", as_index=False).agg(
            sum_qty=("sum_qty", "sum"), n=("n", "sum")
        )
        by_status["l_returnflag"] = None
        out = pd.concat([by_flag, by_status], ignore_index=True)[
            ["l_returnflag", "l_linestatus", "sum_qty", "n"]
        ]
        sq = out["sum_qty"].to_numpy()
        out["sum_qty"] = np.copysign(np.floor(np.abs(sq) * 100 + 0.5), sq) / 100
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return leaf.repartition(1).map_batches(expand, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# EWMA time-decayed per-user aggregate: the recency-weighted mean that
# feature stores compute per entity (half-life smoothing of a metric
# stream).  Weight = exp(-lambda * hours-before-the-user's-last-event).
# ---------------------------------------------------------------------------

_EWMA_LAMBDA = 0.1  # per hour
_US_PER_HOUR = 3600000000.0

_EWMA_ORACLE = f"""
WITH m AS (SELECT user_id, MAX(ts) AS tmax FROM events GROUP BY 1),
s AS (SELECT e.user_id,
             SUM(e.value * exp(-{_EWMA_LAMBDA} *
                 (epoch_us(m.tmax) - epoch_us(e.ts)) / {_US_PER_HOUR})) AS num,
             SUM(exp(-{_EWMA_LAMBDA} *
                 (epoch_us(m.tmax) - epoch_us(e.ts)) / {_US_PER_HOUR})) AS den,
             COUNT(*) AS n_events
      FROM events e JOIN m USING (user_id) GROUP BY 1)
SELECT user_id, ROUND(num / den, 6) AS ewma_value, n_events FROM s
"""


@register("events_ewma_user", oracle=_EWMA_ORACLE)
def events_ewma_user(sf_dir: str):
    """Exponentially-decayed per-user value average, anchored at each
    user's LAST event (lambda = 0.1/hour).  One hash(user)-bucketed
    exchange; each bucket computes its disjoint users' anchors and
    decayed sums in a single vectorized pass — the weight expression
    keeps identical associativity with the oracle so exp() sees
    bit-identical doubles (the ~n-term sum's order difference is
    absorbed by ROUND 6)."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])
    P = auto_buckets(ev.count())

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        bk = (u * np.uint64(2654435761)) % np.uint64(P)
        return t.append_column("bk", pa.array(bk.astype(np.int64)))

    def ewma(df):
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "ewma_value": pd.Series(dtype="float64"),
                    "n_events": pd.Series(dtype="int64"),
                }
            )
        ts_us = df["ts"].astype("int64").to_numpy()  # epoch microseconds
        tmax = df.groupby("user_id")["ts"].transform("max").astype("int64").to_numpy()
        wt = np.exp(-_EWMA_LAMBDA * (tmax - ts_us).astype(np.float64) / _US_PER_HOUR)
        tmp = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "num": df["value"].to_numpy() * wt,
                "den": wt,
            }
        )
        g = tmp.groupby("user_id", as_index=False).agg(
            num=("num", "sum"), den=("den", "sum"), n_events=("den", "size")
        )
        v = (g["num"] / g["den"]).to_numpy()
        return pd.DataFrame(
            {
                "user_id": g["user_id"].astype("int64"),
                "ewma_value": np.copysign(np.floor(np.abs(v) * 1e6 + 0.5), v) / 1e6,
                "n_events": g["n_events"].astype("int64"),
            }
        )

    return bucket_map_groups(
        ev.map_batches(add_bucket, batch_format="pyarrow"), "bk", ewma, P,
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# RFM user scoring: recency / frequency / monetary quintiles — the
# classic customer-analytics segmentation, here as three NTILE(5)
# passes on the exact-rank substrate merged in one user-hash exchange.
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
WITH agg AS (SELECT user_id, COUNT(*) AS freq, SUM(value) AS mon, MAX(ts) AS tmax
             FROM events GROUP BY 1),
g AS (SELECT MAX(ts) AS gmax FROM events),
base AS (SELECT user_id, freq, mon,
                epoch_us(g.gmax) - epoch_us(tmax) AS rec
         FROM agg, g)
SELECT user_id,
       NTILE(5) OVER (ORDER BY rec DESC, user_id) AS r_score,
       NTILE(5) OVER (ORDER BY freq, user_id) AS f_score,
       NTILE(5) OVER (ORDER BY mon, user_id) AS m_score
FROM base
"""


@register("rfm_user_scores", oracle=_RFM_ORACLE)
def rfm_user_scores(sf_dir: str):
    """RFM segmentation: per-user recency (µs before the corpus's last
    event), frequency and monetary totals, each cut into NTILE(5)
    quintile scores (5 = best).  Per-user aggregates ride the combiner;
    each metric's quintile comes from one `with_group_ranks`
    distributed sort (constant group, user_id tiebreaker — SQL's
    first-tiles-are-larger NTILE rule reproduced exactly); the three
    score streams merge in a single hash(user) exchange.  Monetary
    ordering compares engine-summed doubles with DuckDB-summed doubles
    — safe because adjacent user totals differ by O(1) while cross-
    engine sum error is O(1e-12)."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import (
        bucket_map_groups,
        merge_partials,
        with_group_ranks,
    )
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id"]).aggregate(
            [("ts", "max"), ("value", "sum"), ([], "count_all")]
        )
        return pa.Table.from_arrays(
            [
                g.column("user_id"),
                g.column("ts_max").cast(pa.int64()),
                g.column("value_sum"),
                g.column("count_all"),
            ],
            names=["user_id", "tmax", "mon", "freq"],
        )

    per_user = merge_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["user_id"],
        {"tmax": "max", "mon": "sum", "freq": "sum"},
    ).materialize()  # three rank passes re-read it; never recompute lineage

    gmax = per_user.max("tmax")

    def with_metrics(t: pa.Table) -> pa.Table:
        rec = pc.subtract(pa.scalar(int(gmax), pa.int64()), t.column("tmax"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "neg_rec": pc.negate(rec),  # ascending == recency DESC
                "freq": t.column("freq"),
                "mon": t.column("mon"),
                "__g": pa.array(np.zeros(len(t), np.int8)),
            }
        )

    base = per_user.map_batches(with_metrics, batch_format="pyarrow").materialize()
    n_users = base.count()
    P = auto_buckets(n_users)

    def ntile5(ranked, kind: int):
        def tile(t: pa.Table) -> pa.Table:
            r = t.column("__rank").to_numpy(zero_copy_only=False)
            n = t.column("__gn").to_numpy(zero_copy_only=False)
            size, rem = n // 5, n % 5
            big = rem * (size + 1)
            sc = np.where(r < big, r // (size + 1), rem + (r - big) // np.maximum(size, 1))
            u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
            bk = (u * np.uint64(2654435761)) % np.uint64(P)
            return pa.table(
                {
                    "user_id": t.column("user_id"),
                    "kind": pa.array(np.full(len(t), kind, np.int8)),
                    "score": pa.array((sc + 1).astype(np.int64)),
                    "bk": pa.array(bk.astype(np.int64)),
                }
            )

        return ranked.map_batches(tile, batch_format="pyarrow")

    scores = (
        ntile5(with_group_ranks(base, "__g", ["neg_rec", "user_id"]), 0)
        .union(ntile5(with_group_ranks(base, "__g", ["freq", "user_id"]), 1))
        .union(ntile5(with_group_ranks(base, "__g", ["mon", "user_id"]), 2))
    )

    def pivot(df):
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "r_score": pd.Series(dtype="int64"),
                    "f_score": pd.Series(dtype="int64"),
                    "m_score": pd.Series(dtype="int64"),
                }
            )
        p = df.pivot_table(index="user_id", columns="kind", values="score", aggfunc="first")
        return pd.DataFrame(
            {
                "user_id": p.index.astype("int64"),
                "r_score": p[0].astype("int64").to_numpy(),
                "f_score": p[1].astype("int64").to_numpy(),
                "m_score": p[2].astype("int64").to_numpy(),
            }
        ).reset_index(drop=True)

    return bucket_map_groups(scores, "bk", pivot, P, batch_format="pandas")



# ---------------------------------------------------------------------------
# Hopping (sliding) windows: 1-hour windows advancing every 15 minutes —
# the overlapping-window aggregate tumbling windows can't express.  Each
# event explodes into exactly width/hop = 4 window rows (vectorized),
# then the combiner aggregate; the oracle replays the same explode with
# generate_series.
# ---------------------------------------------------------------------------

_HOP_ORACLE = """
SELECT event_type,
       time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE AS window_start,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
FROM events, UNNEST(generate_series(0, 3)) AS t(k)
GROUP BY 1, 2
"""


@register("events_hopping_counts", oracle=_HOP_ORACLE)
def events_hopping_counts(sf_dir: str):
    """Hopping-window counts/sums per event_type (width 60 min, hop
    15 min): every event lands in the 4 windows whose start lies in
    (ts − 60 min, ts].  The explode is one vectorized repeat per batch
    (no per-row loop, output exactly 4× input rows), and the aggregate
    rides the combiner partial — at 100 TB the 4× fan-out happens
    inside the map, never materializing an exploded corpus."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def explode(t: pa.Table) -> pa.Table:
        base = pc.floor_temporal(t.column("ts"), multiple=15, unit="minute").to_numpy(
            zero_copy_only=False
        )
        n = len(t)
        idx = np.repeat(np.arange(n), 4)
        k = np.tile(np.arange(4), n)
        ws = base[idx] - k * np.timedelta64(15, "m")
        return pa.table(
            {
                "event_type": t.column("event_type").take(pa.array(idx)),
                "window_start": pa.array(ws.astype("datetime64[us]")),
                "value": t.column("value").take(pa.array(idx)),
            }
        )

    agg = partial_group_agg(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["event_type", "window_start"],
        {"value": "sum_value"},
        count_alias="n_events",
    )
    return agg.map_batches(lambda t: round_cols(t, {"sum_value": 2}), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov test between event-type value
# distributions — the drift-monitoring statistic a production pipeline
# computes between yesterday's and today's feature distribution.
# ---------------------------------------------------------------------------

_KS_A, _KS_B = "click", "purchase"

_KS_ORACLE = f"""
WITH ab AS (SELECT value,
                   SUM(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END) AS ca,
                   SUM(CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END) AS cb
            FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
            GROUP BY value),
t AS (SELECT value,
             SUM(ca) OVER (ORDER BY value) AS cuma,
             SUM(cb) OVER (ORDER BY value) AS cumb
      FROM ab),
n AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM ab)
SELECT ROUND(MAX(ABS(cuma / CAST(na AS DOUBLE) - cumb / CAST(nb AS DOUBLE))), 6) AS ks_stat,
       CAST(ANY_VALUE(na) AS BIGINT) AS n_a, CAST(ANY_VALUE(nb) AS BIGINT) AS n_b
FROM t, n
"""


@register("events_ks_test", oracle=_KS_ORACLE)
def events_ks_test(sf_dir: str):
    """Exact two-sample KS statistic between the 'click' and 'purchase'
    value distributions: sup over the pooled support of |F_a − F_b|, with
    the tie-correct CDF (per DISTINCT value, counts merged first).
    Shape: per-batch partial counts → one bucketed merge on the value's
    bit pattern (distinct values are corpus-cardinality) → the
    multi-value-column exact-rank substrate gives BOTH inclusive CDF
    numerators in one distributed sort → a combiner max.  Nothing
    corpus-sized on the driver."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import (
        bucketed_group_agg,
        merge_partials,
        with_group_ranks,
    )
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["event_type", "value"])
    ev = ev.filter(
        expr=f"event_type == '{_KS_A}' or event_type == '{_KS_B}'"
    )

    def partial(t: pa.Table) -> pa.Table:
        is_a = pc.equal(t.column("event_type"), pa.scalar(_KS_A))
        t2 = pa.table(
            {
                "value": t.column("value"),
                "ca": pc.cast(is_a, pa.int64()),
                "cb": pc.cast(pc.invert(is_a), pa.int64()),
            }
        )
        g = t2.group_by(["value"]).aggregate([("ca", "sum"), ("cb", "sum")])
        v = g.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vbits": pa.array(v.view(np.uint64).astype(np.int64)),
                "value": g.column("value"),
                "ca": g.column("ca_sum"),
                "cb": g.column("cb_sum"),
            }
        )

    parts = ev.map_batches(partial, batch_format="pyarrow")
    P = auto_buckets(ev.count())

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("vbits", as_index=False).agg(
            value=("value", "first"), ca=("ca", "sum"), cb=("cb", "sum")
        )

    merged = bucketed_group_agg(parts, keys=["vbits"], agg_fn=merge_bucket, n_buckets=P)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "value": t.column("value"),
                "ca": t.column("ca").cast(pa.int64()),
                "cb": t.column("cb").cast(pa.int64()),
                "__g": pa.array(np.zeros(len(t), np.int8)),
            }
        )

    base = merged.map_batches(prep, batch_format="pyarrow").materialize()
    na = base.sum("ca")
    nb = base.sum("cb")

    ranked = with_group_ranks(
        base, "__g", ["value"], value_col=["ca", "cb"], cum_col=["xca", "xcb"]
    )

    def diff_max(t: pa.Table) -> pa.Table:
        fa = (
            t.column("xca").to_numpy(zero_copy_only=False)
            + t.column("ca").to_numpy(zero_copy_only=False)
        ) / float(na)
        fb = (
            t.column("xcb").to_numpy(zero_copy_only=False)
            + t.column("cb").to_numpy(zero_copy_only=False)
        ) / float(nb)
        d = float(np.abs(fa - fb).max()) if len(t) else 0.0
        return pa.table({"k": pa.array([0], pa.int8()), "d": pa.array([d], pa.float64())})

    top = merge_partials(
        ranked.map_batches(diff_max, batch_format="pyarrow"),
        keys=["k"],
        agg_funcs={"d": "max"},
    )

    def finish(t: pa.Table) -> pa.Table:
        d = t.column("d").to_numpy(zero_copy_only=False)
        ks = np.copysign(np.floor(np.abs(d) * 1e6 + 0.5), d) / 1e6
        return pa.table(
            {
                "ks_stat": pa.array(ks, pa.float64()),
                "n_a": pa.array([na] * len(t), pa.int64()),
                "n_b": pa.array([nb] * len(t), pa.int64()),
            }
        )

    return top.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Event-time watermark / late-arrival accounting: the streaming-system
# semantics (Flink/Beam watermarks) over an at-rest event log — an
# event is LATE if it arrives (event_id order) after the watermark
# (running max event time over all PRIOR arrivals) has passed its own
# timestamp by more than the allowed lateness.
# ---------------------------------------------------------------------------

_LATE_ALLOW_MIN = 10

_WATERMARK_ORACLE = f"""
WITH j AS (SELECT event_id, ts,
                  epoch_us(ts) + ((event_id * 2654435761) % 1800 - 900) * 1000000 AS arr
           FROM events),
o AS (SELECT event_id, ts,
             MAX(ts) OVER (ORDER BY arr, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
      FROM j)
SELECT date_trunc('hour', ts) AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN ts < wm - INTERVAL {_LATE_ALLOW_MIN} MINUTE
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM o GROUP BY 1
"""


@register("events_watermark_late", oracle=_WATERMARK_ORACLE)
def events_watermark_late(sf_dir: str):
    """Late-arrival accounting per hourly event-time window under a
    10-minute allowed lateness: watermark = EXCLUSIVE running max of
    event time in ARRIVAL order, via the `ops.with_prefix_max`
    substrate (distributed sort + per-block max offset merge — the same
    shape as the exact-rank substrate, so no task holds the log).
    Arrival order = event time plus a deterministic ±15-minute
    out-of-order jitter (integer arithmetic on event_id, replayed
    exactly in SQL) — the disorder a real ingest stream exhibits; the
    event_id order of THIS corpus never regresses, which would make the
    operator vacuous.  The per-window rollup rides the combiner."""
    from document_ai_ray.pipelines.ops import with_prefix_max
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["event_id", "ts"])

    def to_us(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        arr = ts_us + ((eid * 2654435761) % 1800 - 900) * 1_000_000
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "ts": t.column("ts"),
                "ts_us": t.column("ts").cast(pa.int64()),
                "arr": pa.array(arr, pa.int64()),
            }
        )

    marked = with_prefix_max(
        ev.map_batches(to_us, batch_format="pyarrow"), ["arr", "event_id"], "ts_us", out_col="wm"
    )
    allow_us = _LATE_ALLOW_MIN * 60_000_000
    lo = np.iinfo(np.int64).min

    def flag(t: pa.Table) -> pa.Table:
        ts_us = t.column("ts_us").to_numpy(zero_copy_only=False)
        wm = t.column("wm").to_numpy(zero_copy_only=False)
        late = (wm != lo) & (ts_us < wm - allow_us)
        w = pc.floor_temporal(t.column("ts"), unit="hour")
        return pa.table(
            {
                "window_start": w,
                "late": pa.array(late.astype(np.int64)),
            }
        )

    return partial_group_agg(
        marked.map_batches(flag, batch_format="pyarrow"),
        ["window_start"],
        {"late": "n_late"},
        count_alias="n_events",
    )


# ---------------------------------------------------------------------------
# Session-level corpus stats: bounce rate + mean session length — the
# rollup every product-analytics pipeline derives from sessionization.
# ---------------------------------------------------------------------------

_SESSION_STATS_ORACLE = """
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
), sess AS (
  SELECT user_id, sid, COUNT(*) AS n_events,
         epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
  FROM s GROUP BY user_id, sid
)
SELECT COUNT(*) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
       ROUND(SUM(n_events) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_events,
       ROUND(SUM(dur_us) / CAST(COUNT(*) AS DOUBLE) / 1000000.0, 6) AS avg_dur_s
FROM sess
"""


@register("session_stats", oracle=_SESSION_STATS_ORACLE)
def session_stats(sf_dir: str):
    """Corpus-level session rollup (bounce rate, mean events, mean
    duration) composed on top of the sessionize operator's output —
    per-session rows reduce through one combiner pass; the averages'
    divisions keep the oracle's exact association (sum/count, then
    /1e6)."""
    from document_ai_ray.pipelines.relational import events_sessionize

    sessions = events_sessionize(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        ne = t.column("n_events").to_numpy(zero_copy_only=False).astype(np.int64)
        dur = (
            t.column("session_end").cast(pa.int64()).to_numpy(zero_copy_only=False)
            - t.column("session_start").cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pa.array([0], pa.int8()),
                "n_sessions": pa.array([len(t)], pa.int64()),
                "n_bounce": pa.array([int((ne == 1).sum())], pa.int64()),
                "sum_events": pa.array([int(ne.sum())], pa.int64()),
                "sum_dur_us": pa.array([int(dur.sum())], pa.int64()),
            }
        )

    from document_ai_ray.pipelines.ops import merge_partials

    merged = merge_partials(
        sessions.map_batches(partial, batch_format="pyarrow"),
        keys=["k"],
        agg_funcs={
            "n_sessions": "sum",
            "n_bounce": "sum",
            "sum_events": "sum",
            "sum_dur_us": "sum",
        },
    )

    def finish(t: pa.Table) -> pa.Table:
        ns = t.column("n_sessions").to_numpy(zero_copy_only=False).astype(np.float64)
        ae = t.column("sum_events").to_numpy(zero_copy_only=False) / ns
        ad = t.column("sum_dur_us").to_numpy(zero_copy_only=False) / ns / 1_000_000.0
        out = pa.table(
            {
                "n_sessions": t.column("n_sessions"),
                "n_bounce": t.column("n_bounce"),
                "avg_events": pa.array(ae, pa.float64()),
                "avg_dur_s": pa.array(ad, pa.float64()),
            }
        )
        return round_cols(out, {"avg_events": 6, "avg_dur_s": 6})

    return merged.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Per-group winsorization: clamp each event's value into its type's
# [p01, p99] — the outlier-capping transform feature pipelines apply
# before scaling; thresholds are EXACT PERCENTILE_CONT quantiles from
# the distributed rank substrate.
# ---------------------------------------------------------------------------

_WINS_ORACLE = """
WITH b AS (SELECT event_type,
                  quantile_cont(value, 0.01) AS lo,
                  quantile_cont(value, 0.99) AS hi
           FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type,
       ROUND(LEAST(GREATEST(e.value, b.lo), b.hi), 6) AS value_wins
FROM events e JOIN b USING (event_type)
"""


@register("events_value_winsorized", oracle=_WINS_ORACLE)
def events_value_winsorized(sf_dir: str):
    """Winsorize event values at their type's exact [p01, p99]
    (PERCENTILE_CONT interpolation, same boundary-row technique as
    `price_quantiles_by_priority`: each block keeps only global-rank
    quantile boundaries, so the collect is <= 4 rows per type).  The
    type->threshold map (group-cardinality) broadcasts into a stateless
    clip pass — two streaming scans, no corpus-sized state anywhere."""
    from document_ai_ray.pipelines.ops import with_group_ranks
    from document_ai_ray.sources.tables import read_table

    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])
    ranked = with_group_ranks(ds, "event_type", ["value"])
    qs = (0.01, 0.99)

    def pick(t: pa.Table) -> pa.Table:
        r = t.column("__rank").to_numpy(zero_copy_only=False)
        n = t.column("__gn").to_numpy(zero_copy_only=False)
        keep = np.zeros(len(t), dtype=bool)
        for q in qs:
            h = (n - 1) * q
            keep |= (r == np.floor(h)) | (r == np.ceil(h))
        return t.filter(pa.array(keep))

    rows = ranked.map_batches(pick, batch_format="pyarrow").take_all()  # <=4/type
    by_g: dict[str, dict[int, tuple[float, int]]] = {}
    for r0 in rows:
        by_g.setdefault(r0["event_type"], {})[r0["__rank"]] = (r0["value"], r0["__gn"])
    bounds: dict[str, tuple[float, float]] = {}
    for g, rankmap in by_g.items():
        n = next(iter(rankmap.values()))[1]
        th = []
        for q in qs:
            h = (n - 1) * q
            lo_v = rankmap[int(np.floor(h))][0]
            hi_v = rankmap[int(np.ceil(h))][0]
            th.append(lo_v + (h - np.floor(h)) * (hi_v - lo_v))
        bounds[g] = (th[0], th[1])

    def clip(t: pa.Table) -> pa.Table:
        types = t.column("event_type").to_pylist()
        v = t.column("value").to_numpy(zero_copy_only=False)
        lo = np.array([bounds[x][0] for x in types])
        hi = np.array([bounds[x][1] for x in types])
        w = np.minimum(np.maximum(v, lo), hi)
        out = pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "value_wins": pa.array(w, pa.float64()),
            }
        )
        return round_cols(out, {"value_wins": 6})

    return ds.map_batches(clip, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PSI (population stability index): decile-binned drift between the
# 'click' (reference) and 'purchase' (current) value distributions —
# the other standard drift monitor next to KS.
# ---------------------------------------------------------------------------

_PSI_EPS = 1e-6

_PSI_EDGES_SQL = " UNION ALL ".join(
    f"SELECT quantile_cont(value, {q / 10.0}) AS edge FROM a" for q in range(1, 10)
)

_PSI_ORACLE = f"""
WITH a AS (SELECT value FROM events WHERE event_type = '{_KS_A}'),
b AS (SELECT value FROM events WHERE event_type = '{_KS_B}'),
edges AS ({_PSI_EDGES_SQL}),
bina AS (SELECT (SELECT COUNT(*) FROM edges WHERE a.value > edge) AS bin FROM a),
binb AS (SELECT (SELECT COUNT(*) FROM edges WHERE b.value > edge) AS bin FROM b),
ca AS (SELECT bin, COUNT(*) AS n FROM bina GROUP BY bin),
cb AS (SELECT bin, COUNT(*) AS n FROM binb GROUP BY bin),
g AS (SELECT unnest(generate_series(0, 9)) AS bin),
n AS (SELECT (SELECT COUNT(*) FROM a) AS na, (SELECT COUNT(*) FROM b) AS nb),
p AS (SELECT g.bin,
             GREATEST(COALESCE(ca.n, 0) / CAST(n.na AS DOUBLE), {_PSI_EPS}) AS pa,
             GREATEST(COALESCE(cb.n, 0) / CAST(n.nb AS DOUBLE), {_PSI_EPS}) AS pb
      FROM g LEFT JOIN ca USING (bin) LEFT JOIN cb USING (bin), n)
SELECT ROUND(SUM((pa - pb) * ln(pa / pb)), 6) AS psi,
       CAST(ANY_VALUE(n.na) AS BIGINT) AS n_a, CAST(ANY_VALUE(n.nb) AS BIGINT) AS n_b
FROM p, n
"""


@register("events_psi_drift", oracle=_PSI_ORACLE)
def events_psi_drift(sf_dir: str):
    """Population stability index over the reference distribution's
    exact deciles (PERCENTILE_CONT edges from the rank substrate's
    boundary rows), eps-clamped at 1e-6 on both sides.  Edges broadcast
    into one vectorized searchsorted binning pass; bin counts ride the
    combiner.  Values exactly equal to an edge fall to the LOWER bin
    (strict > on both sides)."""
    from document_ai_ray.pipelines.ops import merge_partials, with_group_ranks
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["event_type", "value"]).filter(
        expr=f"event_type == '{_KS_A}' or event_type == '{_KS_B}'"
    ).materialize()

    ref = ev.filter(expr=f"event_type == '{_KS_A}'")

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"value": t.column("value"), "__g": pa.array(np.zeros(len(t), np.int8))}
        )

    ranked = with_group_ranks(ref.map_batches(prep, batch_format="pyarrow"), "__g", ["value"])
    qs = tuple(q / 10.0 for q in range(1, 10))

    def pick(t: pa.Table) -> pa.Table:
        r = t.column("__rank").to_numpy(zero_copy_only=False)
        n = t.column("__gn").to_numpy(zero_copy_only=False)
        keep = np.zeros(len(t), dtype=bool)
        for q in qs:
            h = (n - 1) * q
            keep |= (r == np.floor(h)) | (r == np.ceil(h))
        return t.filter(pa.array(keep))

    rows = ranked.map_batches(pick, batch_format="pyarrow").take_all()  # <=18 rows
    rankmap = {r["__rank"]: (r["value"], r["__gn"]) for r in rows}
    n_ref = next(iter(rankmap.values()))[1]
    edges = np.array(
        [
            (lambda h: rankmap[int(np.floor(h))][0]
             + (h - np.floor(h)) * (rankmap[int(np.ceil(h))][0] - rankmap[int(np.floor(h))][0]))((n_ref - 1) * q)
            for q in qs
        ]
    )

    def bins(t: pa.Table) -> pa.Table:
        is_a = pc.equal(t.column("event_type"), pa.scalar(_KS_A)).to_numpy(
            zero_copy_only=False
        )
        v = t.column("value").to_numpy(zero_copy_only=False)
        # strict >: side="left" puts v == edge into the lower bin
        b = np.searchsorted(edges, v, side="left")
        ca = np.bincount(b[is_a], minlength=10).astype(np.int64)
        cb = np.bincount(b[~is_a], minlength=10).astype(np.int64)
        return pa.table(
            {
                "bin": pa.array(np.arange(10, dtype=np.int64)),
                "ca": pa.array(ca),
                "cb": pa.array(cb),
            }
        )

    merged = merge_partials(
        ev.map_batches(bins, batch_format="pyarrow"),
        keys=["bin"],
        agg_funcs={"ca": "sum", "cb": "sum"},
    )

    def finish(t: pa.Table) -> pa.Table:
        ca = t.column("ca").to_numpy(zero_copy_only=False).astype(np.float64)
        cb = t.column("cb").to_numpy(zero_copy_only=False).astype(np.float64)
        na, nb = ca.sum(), cb.sum()
        pa_ = np.maximum(ca / na, _PSI_EPS)
        pb_ = np.maximum(cb / nb, _PSI_EPS)
        psi = ((pa_ - pb_) * np.log(pa_ / pb_)).sum()
        out = pa.table(
            {
                "psi": pa.array([psi], pa.float64()),
                "n_a": pa.array([int(na)], pa.int64()),
                "n_b": pa.array([int(nb)], pa.int64()),
            }
        )
        return round_cols(out, {"psi": 6})

    return merged.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Mann–Whitney U (Wilcoxon rank-sum) between the same two event-type
# value distributions — the rank-based location test; tie-corrected
# average ranks, computed exactly on the distinct-value substrate.
# Every term is an integer multiple of 0.5, so both engines' sums are
# EXACT (no float drift at all).
# ---------------------------------------------------------------------------

_MWU_ORACLE = f"""
WITH ab AS (SELECT value,
                   SUM(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END) AS ca,
                   SUM(CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END) AS cb
            FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
            GROUP BY value),
t AS (SELECT value, ca, cb,
             COALESCE(SUM(ca + cb) OVER (ORDER BY value
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      FROM ab),
n AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM ab)
SELECT ROUND(SUM(ca * (cum + (ca + cb + 1) / 2.0)), 6) AS rank_sum_a,
       ROUND(SUM(ca * (cum + (ca + cb + 1) / 2.0)) - ANY_VALUE(n.na) * (ANY_VALUE(n.na) + 1) / 2.0, 6) AS u_a,
       CAST(ANY_VALUE(n.na) AS BIGINT) AS n_a, CAST(ANY_VALUE(n.nb) AS BIGINT) AS n_b
FROM t, n
"""


@register("events_mannwhitney", oracle=_MWU_ORACLE)
def events_mannwhitney(sf_dir: str):
    """Exact Mann–Whitney U between the 'click' and 'purchase' value
    distributions with tie-averaged ranks: per-distinct-value counts
    (bucketed merge on the value's bit pattern) → one distributed sort
    attaching the pooled exclusive prefix count → rank-sum terms summed
    through the combiner."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import (
        bucketed_group_agg,
        merge_partials,
        with_group_ranks,
    )
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["event_type", "value"]).filter(
        expr=f"event_type == '{_KS_A}' or event_type == '{_KS_B}'"
    )

    def partial(t: pa.Table) -> pa.Table:
        is_a = pc.equal(t.column("event_type"), pa.scalar(_KS_A))
        t2 = pa.table(
            {
                "value": t.column("value"),
                "ca": pc.cast(is_a, pa.int64()),
                "cb": pc.cast(pc.invert(is_a), pa.int64()),
            }
        )
        g = t2.group_by(["value"]).aggregate([("ca", "sum"), ("cb", "sum")])
        v = g.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vbits": pa.array(v.view(np.uint64).astype(np.int64)),
                "value": g.column("value"),
                "ca": g.column("ca_sum"),
                "cb": g.column("cb_sum"),
            }
        )

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("vbits", as_index=False).agg(
            value=("value", "first"), ca=("ca", "sum"), cb=("cb", "sum")
        )

    merged = bucketed_group_agg(
        ev.map_batches(partial, batch_format="pyarrow"),
        keys=["vbits"],
        agg_fn=merge_bucket,
        n_buckets=auto_buckets(ev.count()),
    )

    def prep(t: pa.Table) -> pa.Table:
        g = pc.add(t.column("ca").cast(pa.int64()), t.column("cb").cast(pa.int64()))
        return pa.table(
            {
                "value": t.column("value"),
                "ca": t.column("ca").cast(pa.int64()),
                "cb": t.column("cb").cast(pa.int64()),
                "g": g,
                "__g": pa.array(np.zeros(len(t), np.int8)),
            }
        )

    base = merged.map_batches(prep, batch_format="pyarrow").materialize()
    na = base.sum("ca")
    nb = base.sum("cb")
    ranked = with_group_ranks(base, "__g", ["value"], value_col="g", cum_col="cum")

    def terms(t: pa.Table) -> pa.Table:
        ca = t.column("ca").to_numpy(zero_copy_only=False).astype(np.float64)
        g = t.column("g").to_numpy(zero_copy_only=False).astype(np.float64)
        cum = t.column("cum").to_numpy(zero_copy_only=False).astype(np.float64)
        s = float((ca * (cum + (g + 1) / 2.0)).sum())
        return pa.table({"k": pa.array([0], pa.int8()), "s": pa.array([s], pa.float64())})

    top = merge_partials(
        ranked.map_batches(terms, batch_format="pyarrow"), keys=["k"], agg_funcs={"s": "sum"}
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        out = pa.table(
            {
                "rank_sum_a": pa.array(s, pa.float64()),
                "u_a": pa.array(s - na * (na + 1) / 2.0, pa.float64()),
                "n_a": pa.array([na] * len(t), pa.int64()),
                "n_b": pa.array([nb] * len(t), pa.int64()),
            }
        )
        return round_cols(out, {"rank_sum_a": 6, "u_a": 6})

    return top.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Exact grouped COUNT(DISTINCT): the precise twin of the HLL sketch
# query (approx_distinct_users_by_type) — distinct (type, user) pairs
# through the shuffle-free two-level dedup, then a combiner count.
# ---------------------------------------------------------------------------

_DISTINCT_USERS_ORACLE = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


@register("distinct_users_by_type", oracle=_DISTINCT_USERS_ORACLE)
def distinct_users_by_type(sf_dir: str):
    """Exact per-type distinct-user counts.  (type, user) dedup rides
    `ops.distinct_rows` (per-chunk dedup → one output-sized final),
    then the combiner count — the exact path next to the mergeable-HLL
    approximate one, the same exact/approx pairing as the quantile
    family."""
    from document_ai_ray.pipelines.ops import distinct_rows
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    pairs = distinct_rows(ev, ["event_type", "user_id"])
    return partial_group_agg(pairs, ["event_type"], count_alias="n_users")


# ---------------------------------------------------------------------------
# Time-weighted average per user (trapezoidal integration over the
# event timeline) — the "average sensor reading" semantics where a
# value holds until the next observation.
# ---------------------------------------------------------------------------

_TWA_ORACLE = """
WITH o AS (SELECT user_id, ts, value,
                  LAG(ts) OVER w AS pts, LAG(value) OVER w AS pv
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id,
       ROUND(SUM((value + pv) / 2.0 * (epoch_us(ts) - epoch_us(pts)))
             / SUM(epoch_us(ts) - epoch_us(pts)), 6) AS twa_value,
       COUNT(*) AS n_segments
FROM o WHERE pts IS NOT NULL GROUP BY user_id
"""


@register("events_time_weighted_avg", oracle=_TWA_ORACLE)
def events_time_weighted_avg(sf_dir: str):
    """Trapezoidal time-weighted mean value per user: each consecutive
    event pair contributes its mean value weighted by its time gap.
    One user-hash bucketed exchange, per-bucket vectorized shift (the
    LAG shape); single-event users vanish on both sides."""
    from document_ai_ray.sources.tables import read_table

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def twa_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same = g["user_id"].eq(g["user_id"].shift(1))
        ts_us = g["ts"].astype("int64")
        dt = (ts_us - ts_us.shift(1)).where(same)
        mid = (g["value"] + g["value"].shift(1)) / 2.0
        seg = pd.DataFrame(
            {"user_id": g["user_id"], "num": mid * dt, "den": dt}
        ).dropna()
        if seg.empty:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "twa_value": pd.Series(dtype="float64"),
                    "n_segments": pd.Series(dtype="int64"),
                }
            )
        a = seg.groupby("user_id", as_index=False).agg(
            num=("num", "sum"), den=("den", "sum"), n_segments=("den", "size")
        )
        v = (a["num"] / a["den"]).to_numpy()
        return pd.DataFrame(
            {
                "user_id": a["user_id"].astype("int64"),
                "twa_value": np.copysign(np.floor(np.abs(v) * 1e6 + 0.5), v) / 1e6,
                "n_segments": a["n_segments"].astype("int64"),
            }
        )

    return (
        ds.map_batches(_user_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: twa_bucket(g.drop(columns=["bucket"])), batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Median absolute deviation per event type — the robust scale estimate
# (z-scores break on heavy tails; MAD doesn't).  Two exact-quantile
# passes on the rank substrate: per-type median, then the median of
# absolute deviations from it.
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
           FROM events GROUP BY event_type),
d AS (SELECT e.event_type, ABS(e.value - m.med) AS dev
      FROM events e JOIN m USING (event_type))
SELECT m.event_type, ROUND(m.med, 6) AS median_value,
       ROUND((SELECT quantile_cont(dev, 0.5) FROM d WHERE d.event_type = m.event_type), 6) AS mad
FROM m
"""


def _group_median(ds, group_col: str, value_col: str) -> dict:
    """{group: exact PERCENTILE_CONT(0.5)} via the boundary-row pick
    (<= 2 rows per group reach the driver)."""
    from document_ai_ray.pipelines.ops import with_group_ranks

    ranked = with_group_ranks(ds, group_col, [value_col])

    def pick(t: pa.Table) -> pa.Table:
        r = t.column("__rank").to_numpy(zero_copy_only=False)
        n = t.column("__gn").to_numpy(zero_copy_only=False)
        h = (n - 1) * 0.5
        keep = (r == np.floor(h)) | (r == np.ceil(h))
        return t.filter(pa.array(keep))

    rows = ranked.map_batches(pick, batch_format="pyarrow").take_all()
    by_g: dict = {}
    for r0 in rows:
        by_g.setdefault(r0[group_col], {})[r0["__rank"]] = (r0[value_col], r0["__gn"])
    out = {}
    for g, rm in by_g.items():
        n = next(iter(rm.values()))[1]
        h = (n - 1) * 0.5
        lo, hi = rm[int(np.floor(h))][0], rm[int(np.ceil(h))][0]
        out[g] = lo + (h - np.floor(h)) * (hi - lo)
    return out


@register("events_mad_by_type", oracle=_MAD_ORACLE)
def events_mad_by_type(sf_dir: str):
    """Per-type median + MAD, both EXACT (PERCENTILE_CONT semantics).
    The medians (group-cardinality) broadcast into a vectorized
    |x − med| derivation; the second quantile pass runs on the derived
    column through the same substrate."""
    from document_ai_ray.sources.tables import read_table

    ds = read_table(sf_dir, "events", columns=["event_type", "value"]).materialize()
    med = _group_median(ds, "event_type", "value")

    def dev(t: pa.Table) -> pa.Table:
        types = t.column("event_type").to_pylist()
        v = t.column("value").to_numpy(zero_copy_only=False)
        m = np.array([med[x] for x in types])
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "dev": pa.array(np.abs(v - m), pa.float64()),
            }
        )

    mad = _group_median(ds.map_batches(dev, batch_format="pyarrow"), "event_type", "dev")

    def rnd(x: float) -> float:
        return float(np.copysign(np.floor(abs(x) * 1e6 + 0.5), x) / 1e6)

    types = sorted(med)
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "median_value": pa.array([rnd(med[g]) for g in types], pa.float64()),
            "mad": pa.array([rnd(mad[g]) for g in types], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# Benford first-digit law: fraud/anomaly screening over a monetary
# column — observed first-significant-digit distribution vs the
# Benford expectation log10(1 + 1/d), with per-digit chi-square terms.
# ---------------------------------------------------------------------------

_BENFORD_ORACLE = """
WITH d AS (SELECT substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS dig
           FROM orders),
g AS (SELECT CAST(dig AS BIGINT) AS digit, COUNT(*) AS n FROM d GROUP BY 1),
t AS (SELECT SUM(n) AS total FROM g)
SELECT digit, n,
       ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS obs_freq,
       ROUND(LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_freq,
       ROUND(POWER(CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 2)
             / (CAST(total AS DOUBLE) * LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE))), 6) AS chi2_term
FROM g CROSS JOIN t
"""


@register("benford_first_digit", oracle=_BENFORD_ORACLE)
def benford_first_digit(sf_dir: str):
    """First-significant-digit census of o_totalprice vs Benford's law.
    Digit extraction goes through FLOOR -> integer -> leading decimal
    digit (exact on doubles; no log10/power ulp risk on either side);
    the per-batch digit counts ride the combiner, so only <= 9 rows per
    batch shuffle and the 9-row final computes freq + chi2 terms."""
    from document_ai_ray.pipelines.ops import partial_group_agg
    from document_ai_ray.sources.tables import read_table

    ds = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def dig(t: pa.Table) -> pa.Table:
        x = np.floor(t.column("o_totalprice").to_numpy(zero_copy_only=False)).astype(np.int64)
        first = np.array([int(str(v)[0]) for v in x], np.int64)
        return pa.table({"digit": pa.array(first)})

    counts = partial_group_agg(
        ds.map_batches(dig, batch_format="pyarrow"), ["digit"], count_alias="n"
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        d = t.column("digit").to_numpy(zero_copy_only=False).astype(np.float64)
        total = float(n.sum())
        exp = np.log10(1.0 + 1.0 / d)
        obs = n / total
        chi2 = (n - total * exp) ** 2 / (total * exp)

        def rnd(a):
            return np.copysign(np.floor(np.abs(a) * 1e6 + 0.5), a) / 1e6

        return pa.table(
            {
                "digit": t.column("digit"),
                "n": t.column("n"),
                "obs_freq": pa.array(rnd(obs), pa.float64()),
                "benford_freq": pa.array(rnd(exp), pa.float64()),
                "chi2_term": pa.array(rnd(chi2), pa.float64()),
            }
        )

    return counts.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)

# ---------------------------------------------------------------------------
# Spearman rank correlation, tie-aware (average-rank / "rho_b" form —
# the textbook definition).  Key insight for the distributed shape: a
# row's average rank is a function of its VALUE alone, so no row
# identity is needed — build a (value -> 2*avg_rank) map per column
# with a combiner count + one exclusive-prefix-sum pass, join it back
# by value, and reduce integer moments.  Doubled average ranks are
# integers, so every shuffled partial is exact int64 (order-free; no
# float-summation drift vs the oracle).  Exactness bound: moments stay
# < 2^63 up to ~1e6 rows per the 4n^3 growth; beyond that the final
# would need the float path (documented, not hit at test scales).
# ---------------------------------------------------------------------------

_SPEARMAN_ORACLE = """
WITH s AS (SELECT 2 * RANK() OVER (ORDER BY l_quantity)
                  + COUNT(*) OVER (PARTITION BY l_quantity) - 1 AS sx,
                  2 * RANK() OVER (ORDER BY l_extendedprice)
                  + COUNT(*) OVER (PARTITION BY l_extendedprice) - 1 AS sy
           FROM lineitem),
m AS (SELECT COUNT(*) AS n, SUM(sx) AS ssx, SUM(sy) AS ssy,
             SUM(sx * sx) AS sxx, SUM(sy * sy) AS syy, SUM(sx * sy) AS sxy
      FROM s)
SELECT n,
       ROUND(CAST(n * sxy - ssx * ssy AS DOUBLE)
             / (SQRT(CAST(n * sxx - ssx * ssx AS DOUBLE))
                * SQRT(CAST(n * syy - ssy * ssy AS DOUBLE))), 6) AS spearman_rho
FROM m
"""


@register("spearman_qty_price", oracle=_SPEARMAN_ORACLE)
def spearman_qty_price(sf_dir: str):
    """Tie-aware Spearman rho between l_quantity (heavy ties) and
    l_extendedprice (light ties).  Per column: combiner value-counts ->
    exclusive prefix sum over the sorted distinct values gives
    s(v) = 2*avg_rank(v) = 2*cnt_less + cnt + 1 (integer); two hash
    exchanges join s_x then s_y onto the rows by VALUE; per-bucket
    int64 moment partials (n, sum s, sum s^2, sum s_x s_y) merge into
    a one-row final evaluated with exact python ints before the single
    float division."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import (
        bucket_map_groups,
        partial_group_agg,
        with_group_ranks,
    )
    from document_ai_ray.sources.tables import read_table

    ds = read_table(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"x": t.column("l_quantity"), "y": t.column("l_extendedprice")})

    base = ds.map_batches(prep, batch_format="pyarrow").materialize()
    P = auto_buckets(base.count())

    def rank_map(col: str):
        """(value, s=2*avg_rank) dataset for one column."""
        vc = partial_group_agg(
            base.select_columns([col]), [col], count_alias="cnt"
        ).map_batches(
            lambda t: t.append_column("__g", pa.array(np.zeros(len(t), np.int8))),
            batch_format="pyarrow",
        )
        ranked = with_group_ranks(vc, "__g", [col], value_col="cnt")

        def emit(t: pa.Table) -> pa.Table:
            cum = t.column("__cum").to_numpy(zero_copy_only=False)
            cnt = t.column("cnt").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "v": t.column(col).cast(pa.float64()),
                    "s": pa.array(2 * cum + cnt + 1, pa.int64()),
                }
            )

        return ranked.map_batches(emit, batch_format="pyarrow")

    def bucketed(key: np.ndarray) -> pa.Array:
        h = np.abs(key.view(np.int64) * np.int64(2654435761)) % P
        return pa.array(h.astype(np.int64))

    # -- exchange 1: attach s_x by value of x --------------------------------
    def tag_rows1(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "v": pa.array(x),
                "y": t.column("y").cast(pa.float64()),
                "s": pa.array(np.zeros(len(t), np.int64)),
                "kind": pa.array(np.zeros(len(t), np.int8)),
                "bk": bucketed(x),
            }
        )

    def tag_map1(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "v": t.column("v"),
                "y": pa.array(np.zeros(len(t), np.float64)),
                "s": t.column("s"),
                "kind": pa.array(np.ones(len(t), np.int8)),
                "bk": bucketed(v),
            }
        )

    def join1(df):
        if len(df) == 0:
            return pd.DataFrame({"y": pd.Series([], dtype="float64"),
                                 "sx": pd.Series([], dtype="int64")})
        m = df[df["kind"] == 1]
        r = df[df["kind"] == 0]
        out = r.merge(m[["v", "s"]], on="v", how="left", suffixes=("", "_m"))
        return pd.DataFrame({"y": out["y"].to_numpy(), "sx": out["s_m"].to_numpy().astype("int64")})

    u1 = base.map_batches(tag_rows1, batch_format="pyarrow").union(
        rank_map("x").map_batches(tag_map1, batch_format="pyarrow")
    )
    rows_sx = bucket_map_groups(u1, "bk", join1, n_buckets=P, batch_format="pandas")

    # -- exchange 2: attach s_y by value of y, reduce moment partials --------
    def tag_rows2(t: pa.Table) -> pa.Table:
        y = t.column("y").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "v": t.column("y"),
                "sx": t.column("sx"),
                "s": pa.array(np.zeros(len(t), np.int64)),
                "kind": pa.array(np.zeros(len(t), np.int8)),
                "bk": bucketed(y),
            }
        )

    def tag_map2(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "v": t.column("v"),
                "sx": pa.array(np.zeros(len(t), np.int64)),
                "s": t.column("s"),
                "kind": pa.array(np.ones(len(t), np.int8)),
                "bk": bucketed(v),
            }
        )

    _M_COLS = ["n", "ssx", "ssy", "sxx", "syy", "sxy"]

    def join2(df):
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in _M_COLS})
        m = df[df["kind"] == 1]
        r = df[df["kind"] == 0]
        out = r.merge(m[["v", "s"]], on="v", how="left", suffixes=("", "_m"))
        sx = out["sx"].to_numpy().astype(np.int64)
        sy = out["s_m"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "n": [len(out)],
                "ssx": [int(sx.sum())],
                "ssy": [int(sy.sum())],
                "sxx": [int(np.dot(sx, sx))],
                "syy": [int(np.dot(sy, sy))],
                "sxy": [int(np.dot(sx, sy))],
            }
        )

    u2 = rows_sx.map_batches(tag_rows2, batch_format="pyarrow").union(
        rank_map("y").map_batches(tag_map2, batch_format="pyarrow")
    )
    parts = bucket_map_groups(u2, "bk", join2, n_buckets=P, batch_format="pandas")

    def finish(t: pa.Table) -> pa.Table:
        n, ssx, ssy, sxx, syy, sxy = (
            int(t.column(c).to_numpy(zero_copy_only=False).sum()) for c in _M_COLS
        )
        num = float(n * sxy - ssx * ssy)  # exact python-int, then one cast
        den = float(np.sqrt(float(n * sxx - ssx * ssx))) * float(
            np.sqrt(float(n * syy - ssy * ssy))
        )
        rho = num / den
        rho = float(np.copysign(np.floor(abs(rho) * 1e6 + 0.5), rho) / 1e6)
        return pa.table({"n": pa.array([n], pa.int64()), "spearman_rho": pa.array([rho], pa.float64())})

    return parts.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Gaps-and-islands: per-user runs of consecutive ACTIVE DAYS, reported
# as an island-length histogram (streaks analysis).
# ---------------------------------------------------------------------------

_ISLANDS_ORACLE = """
WITH d AS (SELECT DISTINCT user_id,
                  CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day
           FROM events),
r AS (SELECT user_id, day,
             day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS isl
      FROM d),
i AS (SELECT user_id, isl, COUNT(*) AS island_len FROM r GROUP BY 1, 2)
SELECT island_len, COUNT(*) AS n_islands FROM i GROUP BY 1
"""


@register("events_gaps_islands", oracle=_ISLANDS_ORACLE)
def events_gaps_islands(sf_dir: str):
    """Consecutive-active-day streaks per user (the gaps-and-islands
    pattern), reduced to an island-length histogram.  Per-batch local
    (user, day) dedup cuts the exchange volume, then one hash(user)
    exchange finishes the dedup and runs the day - row_number island
    derivation per user; only per-bucket histogram partials shuffle to
    the final merge."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, merge_partials
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def days(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        day = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False) // (86400 * 10**6)
        key = np.stack([u, day], axis=1)
        uniq = np.unique(key, axis=0)
        bk = (uniq[:, 0].astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {
                "user_id": pa.array(uniq[:, 0]),
                "day": pa.array(uniq[:, 1]),
                "bk": pa.array(bk.astype(np.int64)),
            }
        )

    P = auto_buckets(ev.count())

    def islands(df):
        if len(df) == 0:
            return pd.DataFrame({"island_len": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        df = df.drop_duplicates(["user_id", "day"]).sort_values(["user_id", "day"])
        isl = df["day"].to_numpy() - df.groupby("user_id").cumcount().to_numpy()
        sizes = pd.DataFrame({"u": df["user_id"].to_numpy(), "i": isl}).groupby(["u", "i"]).size()
        hist = sizes.value_counts()
        return pd.DataFrame({"island_len": hist.index.astype("int64"), "n": hist.to_numpy()})

    parts = bucket_map_groups(
        ev.map_batches(days, batch_format="pyarrow"), "bk", islands,
        n_buckets=P, batch_format="pandas",
    )
    merged = merge_partials(parts, ["island_len"], {"n": "sum"})

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"island_len": t.column("island_len"), "n_islands": t.column("n")})

    return merged.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Market-basket analysis: frequent part PAIRS (A-priori level 2) with
# lift, over orders-as-baskets.  Pair expansion is bounded by
# lines-per-order (~7 -> <= 21 pairs/order), never by the part vocab.
# ---------------------------------------------------------------------------

_BASKET_MINSUP = 3

_BASKET_ORACLE = f"""
WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
pairs AS (SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*) AS support
          FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
item AS (SELECT pk, COUNT(*) AS cnt FROM lp GROUP BY 1),
n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM lp)
SELECT part_a, part_b, support,
       ROUND(CAST(support AS DOUBLE) * CAST(n_orders AS DOUBLE)
             / (CAST(ia.cnt AS DOUBLE) * CAST(ib.cnt AS DOUBLE)), 6) AS lift
FROM pairs JOIN item ia ON ia.pk = part_a JOIN item ib ON ib.pk = part_b CROSS JOIN n
WHERE support >= {_BASKET_MINSUP}
"""


@register("frequent_part_pairs", oracle=_BASKET_ORACLE)
def frequent_part_pairs(sf_dir: str):
    """Frequent co-purchased part pairs with lift.  Shape: per-batch
    (order, part) dedup partials -> hash(order) exchange finishes the
    dedup (batch-local dedup alone is NOT global: an order spanning two
    batches would double-count) and generates each basket's sorted
    pairs bucket-locally, emitting item-support marker rows from the
    same pass -> hash(pair) combiner merge + support filter.  The lift
    join touches only surviving pairs; item supports are part-catalog
    sized (bounded by the part vocabulary, not the fact table)."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, merge_partials
    from document_ai_ray.sources.tables import read_table

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    n_rows = li.count()
    P = auto_buckets(n_rows)

    def local_dedup(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        uniq = np.unique(np.stack([ok, pk], axis=1), axis=0)
        bk = (uniq[:, 0].astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {
                "ok": pa.array(uniq[:, 0]),
                "pk": pa.array(uniq[:, 1]),
                "bk": pa.array(bk.astype(np.int64)),
            }
        )

    # consumed twice (pair exchange + n_orders) — materialize once
    deduped = li.map_batches(local_dedup, batch_format="pyarrow").materialize()

    _P_COLS = {"part_a": "int64", "part_b": "int64", "n": "int64", "bk2": "int64"}

    def basket_pairs(df):
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in _P_COLS.items()})
        df = df.drop_duplicates(["ok", "pk"])  # global: all of an order is here
        m = df.merge(df, on="ok")
        m = m[m["pk_x"] < m["pk_y"]]
        g = m.groupby(["pk_x", "pk_y"], as_index=False).size()
        pa_, pb = g["pk_x"].to_numpy(), g["pk_y"].to_numpy()
        bk2 = ((pa_.astype(np.uint64) * np.uint64(1000003) + pb.astype(np.uint64))
               * np.uint64(2654435761)) % np.uint64(P)
        pairs = pd.DataFrame(
            {"part_a": pa_, "part_b": pb, "n": g["size"].astype("int64"),
             "bk2": bk2.astype("int64")}
        )
        # item-support markers (part_b = -1): distinct orders per part,
        # exact because the (ok, pk) dedup above is global per order
        gi = df.groupby("pk", as_index=False).size()
        ipk = gi["pk"].to_numpy()
        ibk = (ipk.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        items = pd.DataFrame(
            {"part_a": ipk, "part_b": np.full(len(gi), -1, np.int64),
             "n": gi["size"].astype("int64"), "bk2": ibk.astype("int64")}
        )
        return pd.concat([pairs, items], ignore_index=True)

    pair_parts = bucket_map_groups(deduped, "bk", basket_pairs, P, batch_format="pandas")

    def merge_pairs(df):
        cols = {"part_a": "int64", "part_b": "int64", "support": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = df.groupby(["part_a", "part_b"], as_index=False)["n"].sum()
        keep = (g["part_b"] == -1) | (g["n"] >= _BASKET_MINSUP)
        g = g[keep]
        return pd.DataFrame(
            {"part_a": g["part_a"], "part_b": g["part_b"], "support": g["n"].astype("int64")}
        )

    merged = bucket_map_groups(pair_parts, "bk2", merge_pairs, P, batch_format="pandas")
    out = merged.to_pandas()  # surviving pairs + part-catalog-sized item rows
    surv = out[out["part_b"] != -1]
    item_cnt = dict(
        zip(out.loc[out["part_b"] == -1, "part_a"], out.loc[out["part_b"] == -1, "support"])
    )
    n_orders = merge_partials(
        deduped.map_batches(
            lambda t: pa.table(
                {"ok": t.column("ok"), "one": pa.array(np.ones(len(t), np.int64))}
            ),
            batch_format="pyarrow",
        ),
        ["ok"],
        {"one": "sum"},
    ).count()

    if len(surv) == 0:
        return pa.table(
            {"part_a": pa.array([], pa.int64()), "part_b": pa.array([], pa.int64()),
             "support": pa.array([], pa.int64()), "lift": pa.array([], pa.float64())}
        )
    ca = surv["part_a"].map(item_cnt).to_numpy(dtype=np.float64)
    cb = surv["part_b"].map(item_cnt).to_numpy(dtype=np.float64)
    lift = surv["support"].to_numpy(dtype=np.float64) * float(n_orders) / (ca * cb)
    lift = np.copysign(np.floor(np.abs(lift) * 1e6 + 0.5), lift) / 1e6
    return pa.table(
        {
            "part_a": pa.array(surv["part_a"].to_numpy().astype(np.int64)),
            "part_b": pa.array(surv["part_b"].to_numpy().astype(np.int64)),
            "support": pa.array(surv["support"].to_numpy().astype(np.int64)),
            "lift": pa.array(lift, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# A-priori level 3: frequent BRAND triples over orders-as-baskets
# (partkey baskets are support-1 sparse at every sf — the 25-brand
# vocabulary gives real co-occurrence).  The engine runs the actual
# Apriori shape: level-2 pass -> broadcast frequent-pair set ->
# candidate triples generated ONLY where all three sub-pairs are
# frequent (lossless prune: any frequent triple has frequent
# sub-pairs, so the SQL oracle needs no prune).  Relative min-support
# ceil(n_orders/100) in exact integer arithmetic on both engines.
# ---------------------------------------------------------------------------

_TRI_ORACLE = """
WITH lb AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS b
            FROM lineitem JOIN part ON l_partkey = p_partkey),
n AS (SELECT COUNT(DISTINCT ok) AS n_orders, (COUNT(DISTINCT ok) * 4 + 999) // 1000 AS minsup
      FROM lb),
tri AS (SELECT a.b AS brand_a, b.b AS brand_b, c.b AS brand_c,
               COUNT(*) AS support
        FROM lb a JOIN lb b ON a.ok = b.ok AND a.b < b.b
                  JOIN lb c ON b.ok = c.ok AND b.b < c.b
        GROUP BY 1, 2, 3),
item AS (SELECT b, COUNT(*) AS cnt FROM lb GROUP BY 1)
SELECT brand_a, brand_b, brand_c, support,
       ROUND(CAST(support AS DOUBLE) * CAST(n_orders AS DOUBLE) * CAST(n_orders AS DOUBLE)
             / (CAST(ia.cnt AS DOUBLE) * CAST(ib.cnt AS DOUBLE) * CAST(ic.cnt AS DOUBLE)), 6)
       AS lift3
FROM tri JOIN item ia ON ia.b = brand_a JOIN item ib ON ib.b = brand_b
         JOIN item ic ON ic.b = brand_c CROSS JOIN n
WHERE support >= minsup
"""


@register("frequent_brand_triples", oracle=_TRI_ORACLE)
def frequent_brand_triples(sf_dir: str):
    """Frequent co-purchased brand triples with 3-way lift.  Shape:
    broadcast part->brand map resolves items in-scan; per-batch
    (order, brand) dedup partials -> hash(order) exchange finishes the
    dedup globally (an order spanning batches must not double-count);
    level-2 pair counts merge through a tiny combiner (<=C(25,2) keys)
    and the surviving frequent-pair set broadcasts back for the
    Apriori candidate prune; the pruned triple counts merge the same
    way (<=C(25,3) keys) into a one-task lift final."""
    import ray

    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import (
        bucket_map_groups,
        get_broadcast,
        merge_partials,
    )
    from document_ai_ray.sources.tables import read_table

    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"]).to_pandas()
    brand_ref = (ray.put(dict(zip(part["p_partkey"], part["p_brand"]))),)

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    P = auto_buckets(li.count())

    def local_dedup(t: pa.Table) -> pa.Table:
        bmap = get_broadcast(brand_ref)
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        b = np.array([bmap[int(p)] for p in pk])
        df = pd.DataFrame({"ok": ok, "b": b}).drop_duplicates()
        bk = (df["ok"].to_numpy(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"ok": pa.array(df["ok"].to_numpy(np.int64)),
             "b": pa.array(df["b"].to_numpy(), pa.string()),
             "bk": pa.array(bk.astype(np.int64))}
        )

    # consumed three times (pairs, triples, n_orders) — materialize once
    deduped = li.map_batches(local_dedup, batch_format="pyarrow").materialize()

    n_orders = merge_partials(
        deduped.map_batches(
            lambda t: pa.table(
                {"ok": t.column("ok"), "one": pa.array(np.ones(len(t), np.int64))}
            ),
            batch_format="pyarrow",
        ),
        ["ok"], {"one": "sum"},
    ).count()
    minsup = (n_orders * 4 + 999) // 1000

    def basket_pairs(df):
        cols = {"x": "object", "y": "object", "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = df.drop_duplicates(["ok", "b"])  # global: all of an order is here
        m = df.merge(df, on="ok")
        m = m[m["b_x"] < m["b_y"]]
        g = m.groupby(["b_x", "b_y"], as_index=False).size()
        pairs = pd.DataFrame(
            {"x": g["b_x"], "y": g["b_y"], "n": g["size"].astype("int64")}
        )
        # item-support markers (y = ""): distinct orders per brand —
        # MUST be counted here, inside the hash(order) exchange, where
        # the (ok, b) dedup is global; counting them off the
        # batch-local `deduped` double-counts orders that span batches
        # (the market-basket lift lesson) and deflates every lift3.
        gi = df.groupby("b", as_index=False).size()
        items = pd.DataFrame(
            {"x": gi["b"], "y": np.full(len(gi), "", object),
             "n": gi["size"].astype("int64")}
        )
        return pd.concat([pairs, items], ignore_index=True)

    pairs_all = merge_partials(
        bucket_map_groups(deduped, "bk", basket_pairs, P, batch_format="pandas"),
        ["x", "y"], {"n": "sum"},
    ).to_pandas()  # <= C(25,2) pair rows + 25 item rows
    item_rows = pairs_all[pairs_all["y"] == ""]
    item_cnt = dict(zip(item_rows["x"], item_rows["n"]))
    pairs = pairs_all[pairs_all["y"] != ""]
    freq_pairs = set(
        zip(pairs.loc[pairs["n"] >= minsup, "x"], pairs.loc[pairs["n"] >= minsup, "y"])
    )
    fp_ref = (ray.put(freq_pairs),)

    def basket_triples(df):
        cols = {"brand_a": "object", "brand_b": "object", "brand_c": "object",
                "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        fp = get_broadcast(fp_ref)
        df = df.drop_duplicates(["ok", "b"])
        out: dict = {}
        for _, grp in df.groupby("ok", sort=False):
            bs = sorted(grp["b"])
            k = len(bs)
            for i in range(k - 2):
                for j in range(i + 1, k - 1):
                    if (bs[i], bs[j]) not in fp:
                        continue  # Apriori prune
                    for l in range(j + 1, k):
                        if (bs[i], bs[l]) in fp and (bs[j], bs[l]) in fp:
                            key = (bs[i], bs[j], bs[l])
                            out[key] = out.get(key, 0) + 1
        if not out:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        ks = list(out)
        return pd.DataFrame(
            {"brand_a": [k[0] for k in ks], "brand_b": [k[1] for k in ks],
             "brand_c": [k[2] for k in ks],
             "n": pd.array([out[k] for k in ks], dtype="int64")}
        )

    tri = merge_partials(
        bucket_map_groups(deduped, "bk", basket_triples, P, batch_format="pandas"),
        ["brand_a", "brand_b", "brand_c"], {"n": "sum"},
    ).to_pandas()  # <= C(25,3) rows
    tri = tri[tri["n"] >= minsup]
    if len(tri) == 0:
        return pa.table(
            {"brand_a": pa.array([], pa.string()), "brand_b": pa.array([], pa.string()),
             "brand_c": pa.array([], pa.string()), "support": pa.array([], pa.int64()),
             "lift3": pa.array([], pa.float64())}
        )
    ca = tri["brand_a"].map(item_cnt).to_numpy(np.float64)
    cb = tri["brand_b"].map(item_cnt).to_numpy(np.float64)
    cc = tri["brand_c"].map(item_cnt).to_numpy(np.float64)
    s = tri["n"].to_numpy(np.float64)
    lift3 = s * float(n_orders) * float(n_orders) / (ca * cb * cc)
    lift3 = np.copysign(np.floor(np.abs(lift3) * 1e6 + 0.5), lift3) / 1e6
    return pa.table(
        {"brand_a": pa.array(tri["brand_a"], pa.string()),
         "brand_b": pa.array(tri["brand_b"], pa.string()),
         "brand_c": pa.array(tri["brand_c"], pa.string()),
         "support": pa.array(tri["n"].to_numpy(np.int64)),
         "lift3": pa.array(lift3, pa.float64())}
    )


# ---------------------------------------------------------------------------
# Skyline / Pareto frontier: customers not dominated on
# (avg order value, n_orders), both maximized — the two axes genuinely
# trade off (few large orders vs many small ones), so the frontier is
# a real curve, not a single point.  Distributed shape: local
# per-block skylines (a dominated point is dominated globally, so
# block-local pruning is lossless), then one small final skyline over
# the surviving candidates.
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
WITH c AS (SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
                  SUM(o_totalprice) / COUNT(*) AS avg_spend
           FROM orders GROUP BY 1)
SELECT custkey, n_orders, ROUND(avg_spend, 2) AS avg_spend
FROM c a
WHERE NOT EXISTS (SELECT 1 FROM c b
                  WHERE b.n_orders >= a.n_orders AND b.avg_spend >= a.avg_spend
                    AND (b.n_orders > a.n_orders OR b.avg_spend > a.avg_spend))
"""


def _skyline2_mask(spend: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Boolean mask of the 2-D max-max skyline via one sort-scan.
    A point survives iff its n exceeds every n at STRICTLY greater
    spend, and equals the max n within its own equal-spend group
    (full duplicates all survive — neither strictly dominates)."""
    order = np.lexsort((-n, -spend))
    s_s, n_s = spend[order], n[order]
    grp = np.concatenate(([0], np.cumsum(s_s[1:] != s_s[:-1])))
    starts = np.concatenate(([0], np.nonzero(s_s[1:] != s_s[:-1])[0] + 1))
    gmax = n_s[starts]  # secondary sort is n desc -> first of group is max
    run_excl = np.concatenate(([-np.inf], np.maximum.accumulate(gmax)[:-1]))
    keep_sorted = (n_s == gmax[grp]) & (n_s > run_excl[grp])
    keep = np.zeros(len(spend), dtype=bool)
    keep[order] = keep_sorted
    return keep


@register("skyline_customers", oracle=_SKYLINE_ORACLE)
def skyline_customers(sf_dir: str):
    """Pareto-optimal customers on (avg_spend, n_orders).  The
    per-customer rollup rides the combiner; each block then prunes to
    its local skyline with the O(k log k) sort-scan (lossless: local
    dominance implies global dominance), and the one-task final runs
    the same scan over the few surviving candidates."""
    from document_ai_ray.pipelines.ops import merge_partials
    from document_ai_ray.sources.tables import read_table

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_custkey"]).aggregate([("o_totalprice", "sum"), ([], "count_all")])
        return pa.Table.from_arrays(
            [g.column("o_custkey"), g.column("o_totalprice_sum"), g.column("count_all")],
            names=["custkey", "spend", "n"],
        )

    per_cust = merge_partials(
        orders.map_batches(partial, batch_format="pyarrow"), ["custkey"], {"spend": "sum", "n": "sum"}
    )

    def _avg(t: pa.Table) -> np.ndarray:
        return t.column("spend").to_numpy(zero_copy_only=False) / t.column("n").to_numpy(
            zero_copy_only=False
        ).astype(np.float64)

    def local_skyline(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        keep = _skyline2_mask(
            _avg(t), t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        )
        return t.filter(pa.array(keep))

    def finish(t: pa.Table) -> pa.Table:
        av = _avg(t)
        keep = _skyline2_mask(
            av, t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        )
        t, av = t.filter(pa.array(keep)), av[keep]
        av = np.copysign(np.floor(np.abs(av) * 100 + 0.5), av) / 100
        return pa.table(
            {
                "custkey": t.column("custkey"),
                "n_orders": t.column("n"),
                "avg_spend": pa.array(av, pa.float64()),
            }
        )

    return (
        per_cust.map_batches(local_skyline, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)
    )


# ---------------------------------------------------------------------------
# A/B analysis: Welch's unequal-variance t-test between the two halves
# of a deterministic user split (user_id parity) over event values —
# the experiment-readout primitive.
# ---------------------------------------------------------------------------

_WELCH_ORACLE = """
WITH g AS (SELECT user_id % 2 AS grp, COUNT(*) AS n, SUM(value) AS s,
                  SUM(value * value) AS ss
           FROM events GROUP BY 1),
a AS (SELECT CAST(n AS DOUBLE) AS n, s, ss FROM g WHERE grp = 0),
b AS (SELECT CAST(n AS DOUBLE) AS n, s, ss FROM g WHERE grp = 1),
v AS (SELECT a.n AS na, b.n AS nb, a.s / a.n AS ma, b.s / b.n AS mb,
             (a.ss - a.s * a.s / a.n) / (a.n - 1.0) AS va,
             (b.ss - b.s * b.s / b.n) / (b.n - 1.0) AS vb
      FROM a CROSS JOIN b)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
       ROUND((ma - mb) / SQRT(va / na + vb / nb), 6) AS t_stat,
       ROUND(POWER(va / na + vb / nb, 2)
             / (POWER(va / na, 2) / (na - 1.0) + POWER(vb / nb, 2) / (nb - 1.0)), 6)
       AS welch_df
FROM v
"""


@register("events_ab_welch", oracle=_WELCH_ORACLE)
def events_ab_welch(sf_dir: str):
    """Welch's t between the user_id%2 split of event values: one
    combiner pass of (n, sum, sum of squares) per arm, all statistics
    derived in the two-row final with the oracle's exact float
    associativity (the cross-engine partial-sum drift class already
    accepted for corr_price_qty applies)."""
    from document_ai_ray.pipelines.ops import merge_partials
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        grp = t.column("user_id").to_numpy(zero_copy_only=False) % 2
        v = t.column("value").to_numpy(zero_copy_only=False)
        rows = {"grp": [], "n": [], "s": [], "ss": []}
        for g in (0, 1):
            m = grp == g
            rows["grp"].append(g)
            rows["n"].append(int(m.sum()))
            rows["s"].append(float(v[m].sum()))
            rows["ss"].append(float(np.dot(v[m], v[m])))
        return pa.table(
            {
                "grp": pa.array(rows["grp"], pa.int64()),
                "n": pa.array(rows["n"], pa.int64()),
                "s": pa.array(rows["s"], pa.float64()),
                "ss": pa.array(rows["ss"], pa.float64()),
            }
        )

    agg = merge_partials(
        ev.map_batches(partial, batch_format="pyarrow"), ["grp"], {"n": "sum", "s": "sum", "ss": "sum"}
    )

    def finish(t: pa.Table) -> pa.Table:
        d = {int(g): i for i, g in enumerate(t.column("grp").to_pylist())}
        n = t.column("n").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        ss = t.column("ss").to_numpy(zero_copy_only=False)
        na, nb = float(n[d[0]]), float(n[d[1]])
        sa, sb = s[d[0]], s[d[1]]
        ssa, ssb = ss[d[0]], ss[d[1]]
        ma, mb = sa / na, sb / nb
        va = (ssa - sa * sa / na) / (na - 1.0)
        vb = (ssb - sb * sb / nb) / (nb - 1.0)
        se2 = va / na + vb / nb
        t_stat = (ma - mb) / np.sqrt(se2)
        wdf = se2**2 / ((va / na) ** 2 / (na - 1.0) + (vb / nb) ** 2 / (nb - 1.0))

        def rnd(x):
            return float(np.copysign(np.floor(abs(x) * 1e6 + 0.5), x) / 1e6)

        return pa.table(
            {
                "n_a": pa.array([int(na)], pa.int64()),
                "n_b": pa.array([int(nb)], pa.int64()),
                "mean_a": pa.array([rnd(ma)], pa.float64()),
                "mean_b": pa.array([rnd(mb)], pa.float64()),
                "t_stat": pa.array([rnd(t_stat)], pa.float64()),
                "welch_df": pa.array([rnd(wdf)], pa.float64()),
            }
        )

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Interval self-join (stream-stream join): per user, event pairs where
# the second lands within 5 minutes of the first — the co-occurrence
# primitive behind "what happens right after X" analyses.
# ---------------------------------------------------------------------------

_IVJOIN_ORACLE = """
SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id != b.event_id
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
GROUP BY 1, 2
"""


@register("events_interval_selfjoin", oracle=_IVJOIN_ORACLE)
def events_interval_selfjoin(sf_dir: str):
    """Windowed self-join: directed (a -> b) event pairs of the same
    user with b.ts in [a.ts, a.ts + 5 min], counted per type pair.
    Shape: hash(user) exchange; each bucket sorts its users' events
    once and finds every window with two searchsorted passes (the
    two-pointer interval join, fully vectorized — the pair expansion
    is built with repeat/cumsum index arithmetic, no Python loop);
    only type-pair partial counts leave the buckets."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, merge_partials
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    P = auto_buckets(ev.count())

    def tag(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        bk = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts": t.column("ts").cast(pa.int64()),
                "event_type": t.column("event_type"),
                "eid": t.column("event_id"),
                "bk": pa.array(bk.astype(np.int64)),
            }
        )

    W_US = 300 * 10**6

    def window_pairs(df):
        cols = {"type_a": "object", "type_b": "object", "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = df.sort_values(["user_id", "ts", "eid"], kind="mergesort").reset_index(drop=True)
        out = []
        for _, g in df.groupby("user_id", sort=False):
            ts = g["ts"].to_numpy()
            ty = g["event_type"].to_numpy()
            lo = np.searchsorted(ts, ts, side="left")
            hi = np.searchsorted(ts, ts + W_US, side="right")
            cnt = hi - lo
            if cnt.sum() == 0:
                continue
            # flat b-indices per a: [lo[a], hi[a]) for every a, via
            # repeat + cumsum arithmetic (self-pairs removed after)
            a_idx = np.repeat(np.arange(len(ts)), cnt)
            starts = np.repeat(lo, cnt)
            offs = np.arange(len(a_idx)) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            b_idx = starts + offs
            keep = a_idx != b_idx
            pairs = pd.DataFrame({"type_a": ty[a_idx[keep]], "type_b": ty[b_idx[keep]]})
            out.append(pairs.groupby(["type_a", "type_b"], as_index=False).size())
        if not out:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        allp = pd.concat(out, ignore_index=True)
        g = allp.groupby(["type_a", "type_b"], as_index=False)["size"].sum()
        return pd.DataFrame(
            {"type_a": g["type_a"], "type_b": g["type_b"], "n": g["size"].astype("int64")}
        )

    parts = bucket_map_groups(
        ev.map_batches(tag, batch_format="pyarrow"), "bk", window_pairs, P, batch_format="pandas"
    )
    merged = merge_partials(parts, ["type_a", "type_b"], {"n": "sum"})

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "type_a": t.column("type_a"),
                "type_b": t.column("type_b"),
                "n_pairs": t.column("n"),
            }
        )

    return merged.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Audience overlap: pairwise user-set intersection + Jaccard between
# event types (the exact version of the theta-sketch set-op readout).
# ---------------------------------------------------------------------------

_OVERLAP_ORACLE = """
WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
c AS (SELECT event_type, COUNT(*) AS n FROM d GROUP BY 1),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_common
      FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
SELECT type_a, type_b, ca.n AS n_a, cb.n AS n_b, n_common,
       ROUND(CAST(n_common AS DOUBLE)
             / CAST(ca.n + cb.n - n_common AS DOUBLE), 6) AS jaccard
FROM p JOIN c ca ON ca.event_type = type_a JOIN c cb ON cb.event_type = type_b
"""


@register("user_overlap_by_type", oracle=_OVERLAP_ORACLE)
def user_overlap_by_type(sf_dir: str):
    """Exact audience-overlap matrix: per event-type pair, |A∩B| and
    Jaccard over DISTINCT user sets.  Per-batch (type, user) dedup ->
    one hash(user) exchange; each bucket emits the type pairs present
    in each user's type set (bounded by the type vocabulary) plus
    per-type marker counts, all merged in a combiner; Jaccard is an
    exact integer ratio, bit-identical across engines."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, merge_partials
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    P = auto_buckets(ev.count())

    def local(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"ty": t.column("event_type").to_pylist(),
             "u": t.column("user_id").to_numpy(zero_copy_only=False)}
        ).drop_duplicates()
        bk = (df["u"].to_numpy().astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"ty": pa.array(df["ty"], pa.string()),
             "u": pa.array(df["u"].to_numpy(), pa.int64()),
             "bk": pa.array(bk.astype(np.int64))}
        )

    def pairs(df):
        cols = {"type_a": "object", "type_b": "object", "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = df.drop_duplicates(["ty", "u"])
        m = df.merge(df, on="u")
        m = m[m["ty_x"] < m["ty_y"]]
        g = m.groupby(["ty_x", "ty_y"], as_index=False).size()
        out = pd.DataFrame({"type_a": g["ty_x"], "type_b": g["ty_y"],
                            "n": g["size"].astype("int64")})
        gi = df.groupby("ty", as_index=False).size()  # per-type markers
        out = pd.concat(
            [out, pd.DataFrame({"type_a": gi["ty"], "type_b": "",
                                "n": gi["size"].astype("int64")})],
            ignore_index=True,
        )
        return out

    merged = merge_partials(
        bucket_map_groups(ev.map_batches(local, batch_format="pyarrow"), "bk", pairs, P,
                          batch_format="pandas"),
        ["type_a", "type_b"],
        {"n": "sum"},
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        cnt = dict(zip(df.loc[df["type_b"] == "", "type_a"],
                       df.loc[df["type_b"] == "", "n"]))
        p = df[df["type_b"] != ""].reset_index(drop=True)
        na = p["type_a"].map(cnt).to_numpy(dtype=np.int64)
        nb = p["type_b"].map(cnt).to_numpy(dtype=np.int64)
        nc = p["n"].to_numpy(dtype=np.int64)
        jac = nc.astype(np.float64) / (na + nb - nc).astype(np.float64)
        jac = np.copysign(np.floor(np.abs(jac) * 1e6 + 0.5), jac) / 1e6
        return pa.table(
            {"type_a": pa.array(p["type_a"], pa.string()),
             "type_b": pa.array(p["type_b"], pa.string()),
             "n_a": pa.array(na), "n_b": pa.array(nb),
             "n_common": pa.array(nc),
             "jaccard": pa.array(jac, pa.float64())}
        )

    return merged.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# First-touch attribution: each purchase credits the user's EARLIEST
# event in the 7 days before it ('direct' when the window is empty).
# ---------------------------------------------------------------------------

_ATTRIB_ORACLE = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
c AS (SELECT p.event_id,
             e.event_type,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY e.ts, e.event_id) AS r
      FROM p JOIN events e ON e.user_id = p.user_id
         AND e.ts >= p.ts - INTERVAL 7 DAY AND e.ts < p.ts)
SELECT COALESCE(c.event_type, 'direct') AS attributed_type,
       COUNT(*) AS n_purchases
FROM p LEFT JOIN c ON c.event_id = p.event_id AND c.r = 1
GROUP BY 1
"""


@register("attribution_first_touch", oracle=_ATTRIB_ORACLE)
def attribution_first_touch(sf_dir: str):
    """Marketing first-touch attribution: per purchase, the earliest
    same-user event type within the preceding 7 days (ties broken by
    event_id; purchases with an empty window go to 'direct').  One
    hash(user) exchange; each bucket sorts its users once and resolves
    every purchase with one searchsorted window probe; only attributed-
    type partial counts leave the buckets."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, merge_partials
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    P = auto_buckets(ev.count())
    W_US = 7 * 86400 * 10**6

    def tag(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        bk = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"user_id": t.column("user_id"),
             "ts": t.column("ts").cast(pa.int64()),
             "event_type": t.column("event_type"),
             "eid": t.column("event_id"),
             "bk": pa.array(bk.astype(np.int64))}
        )

    def attribute(df):
        if len(df) == 0:
            return pd.DataFrame({"attributed_type": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        out = []
        for _, g in df.groupby("user_id", sort=False):
            g = g.sort_values(["ts", "eid"], kind="mergesort")
            ts = g["ts"].to_numpy()
            ty = g["event_type"].to_numpy()
            is_p = ty == "purchase"
            if not is_p.any():
                continue
            pts = ts[is_p]
            lo = np.searchsorted(ts, pts - W_US, side="left")
            hi = np.searchsorted(ts, pts, side="left")  # strictly before
            att = np.where(hi > lo, ty[np.minimum(lo, len(ts) - 1)], "direct")
            out.append(pd.Series(att).value_counts())
        if not out:
            return pd.DataFrame({"attributed_type": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        vc = pd.concat(out).groupby(level=0).sum()
        return pd.DataFrame({"attributed_type": vc.index.astype("object"),
                             "n": vc.to_numpy().astype("int64")})

    parts = bucket_map_groups(
        ev.map_batches(tag, batch_format="pyarrow"), "bk", attribute, P, batch_format="pandas"
    )
    merged = merge_partials(parts, ["attributed_type"], {"n": "sum"})

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"attributed_type": t.column("attributed_type"),
                         "n_purchases": t.column("n")})

    return merged.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Weighted median: the smallest price whose inclusive quantity-weighted
# cumulative reaches half the total weight — all-integer weights, so
# the threshold scan is exact on both engines.
# ---------------------------------------------------------------------------

_WMEDIAN_ORACLE = """
WITH s AS (SELECT l_extendedprice AS v, CAST(l_quantity AS BIGINT) AS w FROM lineitem),
t AS (SELECT SUM(w) AS tot FROM s),
c AS (SELECT v, SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cw FROM s)
SELECT MIN(v) AS weighted_median, CAST((SELECT SUM(w) FROM s) AS BIGINT) AS total_weight
FROM c CROSS JOIN t WHERE 2 * cw >= tot
"""


@register("weighted_median_price", oracle=_WMEDIAN_ORACLE)
def weighted_median_price(sf_dir: str):
    """Quantity-weighted median of l_extendedprice (lower-median
    convention: min v with 2 * inclusive-cum-weight >= total).  Within
    an equal-price tie group the intra-group scan order is arbitrary in
    SQL, but MIN(v) over passing rows is order-invariant: the group's
    LAST row always carries the deterministic group-total cumulative.
    Shape: one rank-substrate pass with the integer weight as the
    prefix-sum column, a filter, and a one-row min."""
    from document_ai_ray.pipelines.ops import with_group_ranks
    from document_ai_ray.sources.tables import read_table

    li = read_table(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": t.column("l_extendedprice"),
                "w": t.column("l_quantity").cast(pa.int64()),
                "__g": pa.array(np.zeros(len(t), np.int8)),
            }
        )

    base = li.map_batches(prep, batch_format="pyarrow").materialize()
    tot = int(base.sum("w"))
    ranked = with_group_ranks(base, "__g", ["v"], value_col="w")

    def passing(t: pa.Table) -> pa.Table:
        cum = t.column("__cum").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        keep = 2 * (cum + w) >= tot  # inclusive cumulative
        return pa.table({"v": t.column("v").filter(pa.array(keep))})

    cand = ranked.map_batches(passing, batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "weighted_median": pa.array([float(v.min())], pa.float64()),
                "total_weight": pa.array([tot], pa.int64()),
            }
        )

    return cand.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Maximum drawdown per user over the cumulative event-value series —
# the canonical running-max/running-sum window composition.  The cumsum
# order is pinned by (ts, event_id), so both engines accumulate the
# SAME floats in the SAME order: bitwise-identical results, no drift.
# ---------------------------------------------------------------------------

@register("events_max_drawdown", oracle="""
WITH o AS (SELECT user_id, value,
                  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
c AS (SELECT user_id, rn,
             SUM(value) OVER (PARTITION BY user_id ORDER BY rn
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM o),
m AS (SELECT user_id,
             cum - MAX(cum) OVER (PARTITION BY user_id ORDER BY rn
                                  ROWS UNBOUNDED PRECEDING) AS dd
      FROM c)
SELECT user_id, ROUND(MIN(dd), 6) AS max_drawdown FROM m GROUP BY 1
""")
def events_max_drawdown(sf_dir: str):
    """Per-user maximum drawdown of the cumulative value series
    (ordered by ts, event_id): min over time of cum - running-max(cum).
    One hash(user) exchange; each bucket runs the cumsum/cummax in one
    vectorized pandas pass per user-partition."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    P = auto_buckets(ev.count())

    def tag(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        bk = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"user_id": t.column("user_id"),
             "ts": t.column("ts").cast(pa.int64()),
             "eid": t.column("event_id"),
             "value": t.column("value"),
             "bk": pa.array(bk.astype(np.int64))}
        )

    def drawdown(df):
        if len(df) == 0:
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "max_drawdown": pd.Series([], dtype="float64")})
        df = df.sort_values(["user_id", "ts", "eid"], kind="mergesort")
        cum = df.groupby("user_id", sort=False)["value"].cumsum()
        runmax = cum.groupby(df["user_id"], sort=False).cummax()
        dd = (cum - runmax).groupby(df["user_id"], sort=False).min()
        out = np.copysign(np.floor(np.abs(dd.to_numpy()) * 1e6 + 0.5), dd.to_numpy()) / 1e6
        return pd.DataFrame({"user_id": dd.index.astype("int64"), "max_drawdown": out})

    return bucket_map_groups(
        ev.map_batches(tag, batch_format="pyarrow"), "bk", drawdown, P, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Pareto 80/20 cut: how many top customers carry 80% of revenue.
# Revenue is converted to integer CENTS per order up front, so every
# cumulative and threshold comparison is exact on both engines.
# ---------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH c AS (SELECT o_custkey,
                  SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
           FROM orders GROUP BY 1),
t AS (SELECT SUM(cents) AS tot, COUNT(*) AS n FROM c),
r AS (SELECT cents,
             SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS cum,
             ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rk
      FROM c)
SELECT r.rk AS n_top_customers, t.n AS n_customers,
       ROUND(CAST(r.cum AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS revenue_share
FROM r CROSS JOIN t
WHERE 5 * r.cum >= 4 * t.tot
ORDER BY r.rk LIMIT 1
"""


@register("pareto_revenue_cut", oracle=_PARETO_ORACLE)
def pareto_revenue_cut(sf_dir: str):
    """The 80/20 readout: smallest prefix of customers (by revenue
    desc, custkey tiebreak) whose cumulative revenue reaches 80% of the
    total.  Per-customer cents ride the combiner; the rank substrate
    attaches exact integer prefix sums under the descending order; the
    passing rows collapse to a one-row min."""
    from document_ai_ray.pipelines.ops import merge_partials, with_group_ranks
    from document_ai_ray.sources.tables import read_table

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        x = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        c = np.floor(x * 100 + 0.5).astype(np.int64)  # ROUND half-away, positive
        return pa.table({"custkey": t.column("o_custkey"), "cents": pa.array(c)})

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["custkey"]).aggregate([("cents", "sum")])
        return pa.Table.from_arrays(
            [g.column("custkey"), g.column("cents_sum")], names=["custkey", "cents"]
        )

    per_cust = merge_partials(
        orders.map_batches(cents, batch_format="pyarrow").map_batches(
            partial, batch_format="pyarrow"
        ),
        ["custkey"],
        {"cents": "sum"},
    ).materialize()
    tot = int(per_cust.sum("cents"))
    n_cust = per_cust.count()

    def prep(t: pa.Table) -> pa.Table:
        c = t.column("cents").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "custkey": t.column("custkey"),
                "cents": t.column("cents"),
                "neg": pa.array(-c),
                "__g": pa.array(np.zeros(len(t), np.int8)),
            }
        )

    ranked = with_group_ranks(
        per_cust.map_batches(prep, batch_format="pyarrow"), "__g", ["neg", "custkey"],
        value_col="cents",
    )

    def passing(t: pa.Table) -> pa.Table:
        cum = t.column("__cum").to_numpy(zero_copy_only=False)
        c = t.column("cents").to_numpy(zero_copy_only=False)
        r = t.column("__rank").to_numpy(zero_copy_only=False)
        inc = cum + c
        keep = 5 * inc >= 4 * tot
        return pa.table(
            {"rk": pa.array((r + 1)[keep]), "cum": pa.array(inc[keep])}
        )

    cand = ranked.map_batches(passing, batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        rk = t.column("rk").to_numpy(zero_copy_only=False)
        cum = t.column("cum").to_numpy(zero_copy_only=False)
        i = int(np.argmin(rk))
        share = float(cum[i]) / float(tot)
        share = float(np.copysign(np.floor(abs(share) * 1e6 + 0.5), share) / 1e6)
        return pa.table(
            {
                "n_top_customers": pa.array([int(rk[i])], pa.int64()),
                "n_customers": pa.array([n_cust], pa.int64()),
                "revenue_share": pa.array([share], pa.float64()),
            }
        )

    return cand.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Conversion rate by session ENTRY event type: sessionize (30-min
# gaps), take each session's first event as the entry, flag sessions
# containing a purchase — which landing behavior converts?
# ---------------------------------------------------------------------------

_ENTRY_CONV_ORACLE = """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
), r AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id, sid) AS conv
  FROM s
)
SELECT event_type AS entry_type, COUNT(*) AS n_sessions,
       CAST(SUM(conv) AS BIGINT) AS n_converted,
       ROUND(SUM(conv) / CAST(COUNT(*) AS DOUBLE), 6) AS conversion_rate
FROM r WHERE rn = 1 GROUP BY 1
"""


@register("session_conversion_by_entry", oracle=_ENTRY_CONV_ORACLE)
def session_conversion_by_entry(sf_dir: str):
    """Per-entry-type session conversion (30-minute-gap sessionization,
    (ts, event_id)-deterministic entry row, converted = session touches
    a purchase).  One hash(user) exchange resolves each user's sessions
    in a vectorized pass; only entry-type (sessions, conversions)
    partials leave the buckets."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, merge_partials
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    P = auto_buckets(ev.count())
    GAP_US = 30 * 60 * 10**6

    def tag(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        bk = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"user_id": t.column("user_id"),
             "ts": t.column("ts").cast(pa.int64()),
             "eid": t.column("event_id"),
             "event_type": t.column("event_type"),
             "bk": pa.array(bk.astype(np.int64))}
        )

    def sessions(df):
        cols = {"entry_type": "object", "n_sessions": "int64", "n_converted": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = df.sort_values(["user_id", "ts", "eid"], kind="mergesort").reset_index(drop=True)
        prev_ts = df.groupby("user_id", sort=False)["ts"].shift(1)
        new_s = (prev_ts.isna() | (df["ts"] - prev_ts > GAP_US)).astype("int64")
        sid = new_s.groupby(df["user_id"], sort=False).cumsum()
        key = pd.DataFrame({"u": df["user_id"], "sid": sid})
        grp = [key["u"], key["sid"]]
        entry = df.groupby(grp, sort=False)["event_type"].first()
        conv = (
            (df["event_type"] == "purchase").groupby(grp, sort=False).max().astype("int64")
        )
        agg = pd.DataFrame({"entry_type": entry.to_numpy(), "conv": conv.to_numpy()})
        g = agg.groupby("entry_type", as_index=False).agg(
            n_sessions=("conv", "size"), n_converted=("conv", "sum")
        )
        return g.astype({"n_sessions": "int64", "n_converted": "int64"})

    parts = bucket_map_groups(
        ev.map_batches(tag, batch_format="pyarrow"), "bk", sessions, P, batch_format="pandas"
    )
    merged = merge_partials(parts, ["entry_type"], {"n_sessions": "sum", "n_converted": "sum"})

    def finish(t: pa.Table) -> pa.Table:
        ns = t.column("n_sessions").to_numpy(zero_copy_only=False)
        nc = t.column("n_converted").to_numpy(zero_copy_only=False)
        rate = nc.astype(np.float64) / ns.astype(np.float64)
        rate = np.copysign(np.floor(np.abs(rate) * 1e6 + 0.5), rate) / 1e6
        return pa.table(
            {"entry_type": t.column("entry_type"),
             "n_sessions": t.column("n_sessions"),
             "n_converted": t.column("n_converted"),
             "conversion_rate": pa.array(rate, pa.float64())}
        )

    return merged.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# New-user acquisition curve: first-seen month per user -> new users
# per month and the cumulative distinct-user count over time.
# ---------------------------------------------------------------------------

_NEWUSERS_ORACLE = """
WITH f AS (SELECT user_id,
                  MIN(CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400) AS first_day
           FROM events GROUP BY 1),
m AS (SELECT first_day AS day_idx, COUNT(*) AS n_new FROM f GROUP BY 1)
SELECT day_idx, n_new,
       CAST(SUM(n_new) OVER (ORDER BY day_idx ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_users
FROM m
"""


@register("new_users_curve", oracle=_NEWUSERS_ORACLE)
def new_users_curve(sf_dir: str):
    """Distinct-user growth (daily — the events corpus spans one
    month): per-user first-seen day rides a combiner MIN, the per-day
    census another combiner, and the cumulative sum runs over the
    day-cardinality final — nothing user-sized leaves the
    aggregates."""
    from document_ai_ray.pipelines.ops import merge_partials
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def first_partial(t: pa.Table) -> pa.Table:
        day = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False) // (86400 * 10**6)
        g = pa.table(
            {"user_id": t.column("user_id"), "m": pa.array(day.astype(np.int64))}
        ).group_by(["user_id"]).aggregate([("m", "min")])
        return pa.Table.from_arrays(
            [g.column("user_id"), g.column("m_min")], names=["user_id", "m"]
        )

    per_user = merge_partials(
        ev.map_batches(first_partial, batch_format="pyarrow"), ["user_id"], {"m": "min"}
    )

    def month_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["m"]).aggregate([([], "count_all")])
        return pa.Table.from_arrays(
            [g.column("m"), g.column("count_all")], names=["day_idx", "n_new"]
        )

    months = merge_partials(
        per_user.map_batches(month_partial, batch_format="pyarrow"), ["day_idx"], {"n_new": "sum"}
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("day_idx").reset_index(drop=True)
        return pa.table(
            {
                "day_idx": pa.array(df["day_idx"].to_numpy().astype(np.int64)),
                "n_new": pa.array(df["n_new"].to_numpy().astype(np.int64)),
                "cum_users": pa.array(df["n_new"].cumsum().to_numpy().astype(np.int64)),
            }
        )

    return months.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# CEP sequence matching: count ordered view -> click -> purchase
# triples per user where the whole pattern fits in 24 hours — the
# MATCH_RECOGNIZE-style complex-event primitive (count-all-matches
# semantics, which SQL can replay exactly).
# ---------------------------------------------------------------------------

_CEP_ORACLE = """
SELECT v.user_id, COUNT(*) AS n_matches
FROM events v
JOIN events c ON c.user_id = v.user_id AND c.event_type = 'click'
             AND c.ts > v.ts
JOIN events p ON p.user_id = v.user_id AND p.event_type = 'purchase'
             AND p.ts > c.ts AND p.ts <= v.ts + INTERVAL 24 HOUR
WHERE v.event_type = 'view'
GROUP BY 1
"""


@register("cep_sequence_matches", oracle=_CEP_ORACLE)
def cep_sequence_matches(sf_dir: str):
    """Windowed ordered-sequence counting (view < click < purchase,
    purchase within 24 h of the view), all matches counted.  One
    hash(user) exchange; inside a bucket each user's sorted stream is
    swept once per (view, purchase) candidate window with searchsorted
    click prefix-counts — vectorized over the user's events, never
    materializing triples.  Only (user, count) rows leave."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    P = auto_buckets(ev.count())
    W_US = 24 * 3600 * 10**6

    def tag(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        bk = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"user_id": t.column("user_id"),
             "ts": t.column("ts").cast(pa.int64()),
             "event_type": t.column("event_type"),
             "bk": pa.array(bk.astype(np.int64))}
        )

    def count_matches(df):
        cols = {"user_id": "int64", "n_matches": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        out_u, out_n = [], []
        for uid, g in df.groupby("user_id", sort=False):
            g = g.sort_values("ts", kind="mergesort")
            ts = g["ts"].to_numpy()
            ty = g["event_type"].to_numpy()
            vt = ts[ty == "view"]
            ct = ts[ty == "click"]
            pt = ts[ty == "purchase"]
            if len(vt) == 0 or len(ct) == 0 or len(pt) == 0:
                continue
            # clicks strictly inside (v, p): prefix-count differences.
            # matches = sum over (v, p<=v+W, p>v) of  C(p-) - C(v+)
            ccum = np.arange(1, len(ct) + 1)  # clicks <= x via searchsorted
            total = 0
            for v in vt:
                lo = np.searchsorted(pt, v, side="right")
                hi = np.searchsorted(pt, v + W_US, side="right")
                if hi <= lo:
                    continue
                p_in = pt[lo:hi]
                c_before_p = np.searchsorted(ct, p_in, side="left")
                c_after_v = np.searchsorted(ct, v, side="right")
                total += int(np.maximum(c_before_p - c_after_v, 0).sum())
            if total:
                out_u.append(uid)
                out_n.append(total)
        return pd.DataFrame({"user_id": pd.Series(out_u, dtype="int64"),
                             "n_matches": pd.Series(out_n, dtype="int64")})

    return bucket_map_groups(
        ev.map_batches(tag, batch_format="pyarrow"), "bk", count_matches, P,
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# Inter-arrival time histogram: minute-bucketed gaps between a user's
# consecutive events — the traffic-shape fingerprint.
# ---------------------------------------------------------------------------

_INTERARRIVAL_ORACLE = """
WITH g AS (SELECT (CAST(FLOOR(epoch(ts)) AS BIGINT)
                   - CAST(FLOOR(epoch(LAG(ts) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id))) AS BIGINT))
                  // 60 AS gap_min
           FROM events)
SELECT gap_min, COUNT(*) AS n_gaps
FROM g WHERE gap_min IS NOT NULL GROUP BY 1
"""


@register("events_interarrival_hist", oracle=_INTERARRIVAL_ORACLE)
def events_interarrival_hist(sf_dir: str):
    """Minute-granular histogram of per-user consecutive-event gaps
    ((ts, event_id) order).  One hash(user) exchange computes the LAG
    differences; only (gap_min, count) partials leave the buckets."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, merge_partials
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    P = auto_buckets(ev.count())

    def tag(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        bk = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"user_id": t.column("user_id"),
             "ts": t.column("ts").cast(pa.int64()),
             "eid": t.column("event_id"),
             "bk": pa.array(bk.astype(np.int64))}
        )

    def gaps(df):
        cols = {"gap_min": "int64", "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = df.sort_values(["user_id", "ts", "eid"], kind="mergesort")
        prev = df.groupby("user_id", sort=False)["ts"].shift(1)
        ok = prev.notna()
        gap = (df["ts"][ok] // 10**6 - prev[ok].astype("int64") // 10**6) // 60
        vc = gap.value_counts()
        return pd.DataFrame({"gap_min": vc.index.astype("int64"), "n": vc.to_numpy()})

    parts = bucket_map_groups(
        ev.map_batches(tag, batch_format="pyarrow"), "bk", gaps, P, batch_format="pandas"
    )
    merged = merge_partials(parts, ["gap_min"], {"n": "sum"})

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"gap_min": t.column("gap_min"), "n_gaps": t.column("n")})

    return merged.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Sequence-path mining: the most common 3-step event-type paths over
# each user's (ts, event_id)-ordered stream — "what do journeys look
# like", the product-analytics staple.
# ---------------------------------------------------------------------------

_TRIGRAM_PATH_K = 10

_TRIGRAM_PATH_ORACLE = f"""
WITH o AS (SELECT user_id, event_type,
                  LEAD(event_type, 1) OVER w AS t2,
                  LEAD(event_type, 2) OVER w AS t3
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
p AS (SELECT event_type || '>' || t2 || '>' || t3 AS path, COUNT(*) AS n
      FROM o WHERE t3 IS NOT NULL GROUP BY 1)
SELECT path, n,
       CAST(ROW_NUMBER() OVER (ORDER BY n DESC, path) AS BIGINT) AS rank
FROM p ORDER BY n DESC, path LIMIT {_TRIGRAM_PATH_K}
"""


@register("event_trigram_paths", oracle=_TRIGRAM_PATH_ORACLE)
def event_trigram_paths(sf_dir: str):
    """Top-{0} 3-event-type paths: one hash(user) exchange emits each
    bucket's path counts (sliding window over the sorted per-user
    stream), a combiner merges them, and the path-vocabulary final
    (at most |types|^3 = 125 rows) ranks the head.""".format(_TRIGRAM_PATH_K)
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, merge_partials
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    P = auto_buckets(ev.count())

    def tag(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        bk = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"user_id": t.column("user_id"),
             "ts": t.column("ts").cast(pa.int64()),
             "eid": t.column("event_id"),
             "event_type": t.column("event_type"),
             "bk": pa.array(bk.astype(np.int64))}
        )

    def paths(df):
        cols = {"path": "object", "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        from collections import Counter

        df = df.sort_values(["user_id", "ts", "eid"], kind="mergesort")
        c: Counter = Counter()
        for _, g in df.groupby("user_id", sort=False):
            ty = g["event_type"].tolist()
            c.update(f"{a}>{b}>{d}" for a, b, d in zip(ty, ty[1:], ty[2:]))
        return pd.DataFrame({"path": list(c.keys()), "n": pd.Series(list(c.values()), dtype="int64")})

    merged = merge_partials(
        bucket_map_groups(ev.map_batches(tag, batch_format="pyarrow"), "bk", paths, P,
                          batch_format="pandas"),
        ["path"],
        {"n": "sum"},
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["n", "path"], ascending=[False, True]).head(
            _TRIGRAM_PATH_K
        ).reset_index(drop=True)
        return pa.table(
            {
                "path": pa.array(df["path"], pa.string()),
                "n": pa.array(df["n"].to_numpy().astype(np.int64)),
                "rank": pa.array(np.arange(1, len(df) + 1, dtype=np.int64)),
            }
        )

    return merged.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Abandoned-cart detection: clicks with NO purchase by the same user
# in the following 24 h — the negative-pattern complement to the CEP
# sequence matcher.
# ---------------------------------------------------------------------------

_ABANDON_ORACLE = """
SELECT c.user_id,
       COUNT(*) AS n_clicks,
       CAST(SUM(CASE WHEN NOT EXISTS (
              SELECT 1 FROM events p
              WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
                AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 24 HOUR)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_abandoned
FROM events c WHERE c.event_type = 'click'
GROUP BY 1
"""


@register("abandoned_clicks", oracle=_ABANDON_ORACLE)
def abandoned_clicks(sf_dir: str):
    """Per-user abandoned clicks (no purchase within 24 h after).  One
    hash(user) exchange; each bucket answers every click with one
    searchsorted probe into the user's sorted purchase times."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    P = auto_buckets(ev.count())
    W_US = 24 * 3600 * 10**6

    def tag(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        bk = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"user_id": t.column("user_id"),
             "ts": t.column("ts").cast(pa.int64()),
             "event_type": t.column("event_type"),
             "bk": pa.array(bk.astype(np.int64))}
        )

    def detect(df):
        cols = {"user_id": "int64", "n_clicks": "int64", "n_abandoned": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        out_u, out_c, out_a = [], [], []
        for uid, g in df.groupby("user_id", sort=False):
            ct = np.sort(g.loc[g["event_type"] == "click", "ts"].to_numpy())
            if len(ct) == 0:
                continue
            pt = np.sort(g.loc[g["event_type"] == "purchase", "ts"].to_numpy())
            lo = np.searchsorted(pt, ct, side="right")
            hi = np.searchsorted(pt, ct + W_US, side="right")
            out_u.append(uid)
            out_c.append(len(ct))
            out_a.append(int((hi == lo).sum()))
        return pd.DataFrame({"user_id": pd.Series(out_u, dtype="int64"),
                             "n_clicks": pd.Series(out_c, dtype="int64"),
                             "n_abandoned": pd.Series(out_a, dtype="int64")})

    return bucket_map_groups(
        ev.map_batches(tag, batch_format="pyarrow"), "bk", detect, P, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# GDPR delete propagation: scrub a deletion cohort (user_id % 100 == 7
# stands in for the erasure request list) and emit the re-derived
# per-type aggregates — the right-to-be-forgotten path: downstream
# stats must reflect the deletion, not just the raw table.
# ---------------------------------------------------------------------------

_GDPR_ORACLE = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       ROUND(SUM(value), 2) AS sum_value
FROM events WHERE user_id % 100 != 7
GROUP BY 1
"""


@register("gdpr_delete_events", oracle=_GDPR_ORACLE)
def gdpr_delete_events(sf_dir: str):
    """Erasure-list scrub + aggregate re-derivation.  The deletion set
    is a predicate here (at scale: a broadcast tombstone set / Bloom
    filter — the anti-join machinery this repo already ships); counts
    and sums ride the combiner, the distinct-user census a per-batch
    dedup into the same exchange."""
    import pandas as pd

    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, merge_partials
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type", "value"])
    P = auto_buckets(ev.count())

    def scrub_tag(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        keep = u % 100 != 7
        t = t.filter(pa.array(keep))
        u = u[keep]
        bk = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return t.append_column("bk", pa.array(bk.astype(np.int64)))

    def per_bucket(df):
        cols = {"event_type": "object", "n_events": "int64", "n_users": "int64",
                "sum_value": "float64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = df.groupby("event_type", as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum"),
            n_users=("user_id", "nunique"),  # users are bucket-disjoint
        )
        return g[["event_type", "n_events", "n_users", "sum_value"]]

    parts = bucket_map_groups(
        ev.map_batches(scrub_tag, batch_format="pyarrow"), "bk", per_bucket, P,
        batch_format="pandas",
    )
    merged = merge_partials(
        parts, ["event_type"], {"n_events": "sum", "n_users": "sum", "sum_value": "sum"}
    )

    def finish(t: pa.Table) -> pa.Table:
        sv = t.column("sum_value").to_numpy(zero_copy_only=False)
        sv = np.copysign(np.floor(np.abs(sv) * 100 + 0.5), sv) / 100
        return pa.table(
            {"event_type": t.column("event_type"),
             "n_events": t.column("n_events"),
             "n_users": t.column("n_users"),
             "sum_value": pa.array(sv, pa.float64())}
        )

    return merged.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# CUSUM change-point: the day where the cumulative deviation of daily
# event counts from their mean peaks — the classic level-shift
# detector over a counting series.
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH d AS (SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day, COUNT(*) AS n
           FROM events GROUP BY 1),
m AS (SELECT CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mean_n FROM d),
c AS (SELECT day, n,
             SUM(CAST(n AS DOUBLE) - (SELECT mean_n FROM m))
                 OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS s
      FROM d)
SELECT day AS change_day, n AS day_count, ROUND(s, 6) AS cusum
FROM c ORDER BY ABS(s) DESC, day LIMIT 1
"""


@register("events_cusum_changepoint", oracle=_CUSUM_ORACLE)
def events_cusum_changepoint(sf_dir: str):
    """Max-|CUSUM| day of the daily event-count series.  Daily counts
    ride the combiner; the cumulative scan and argmax run on the
    day-cardinality final in the same (day-sorted) float order as the
    oracle's window — bitwise-identical accumulation."""
    from document_ai_ray.pipelines.ops import merge_partials
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["ts"])

    def days(t: pa.Table) -> pa.Table:
        day = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False) // (86400 * 10**6)
        g = pa.table({"day": pa.array(day.astype(np.int64))}).group_by(["day"]).aggregate(
            [([], "count_all")]
        )
        return pa.Table.from_arrays([g.column("day"), g.column("count_all")],
                                    names=["day", "n"])

    merged = merge_partials(
        ev.map_batches(days, batch_format="pyarrow"), ["day"], {"n": "sum"}
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("day").reset_index(drop=True)
        mean = float(df["n"].sum()) / len(df)
        s = (df["n"].astype("float64") - mean).cumsum().to_numpy()
        i = int(np.lexsort((df["day"].to_numpy(), -np.abs(s)))[0])
        cs = float(np.copysign(np.floor(abs(s[i]) * 1e6 + 0.5), s[i]) / 1e6)
        return pa.table(
            {"change_day": pa.array([int(df['day'][i])], pa.int64()),
             "day_count": pa.array([int(df['n'][i])], pa.int64()),
             "cusum": pa.array([cs], pa.float64())}
        )

    return merged.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# ML lag-feature frame: per event, the user's previous two values and
# the trailing 3-event mean — the feature-engineering staple before
# any per-user model.
# ---------------------------------------------------------------------------

_LAGFEAT_ORACLE = """
SELECT event_id,
       ROUND(LAG(value, 1) OVER w, 6) AS prev1,
       ROUND(LAG(value, 2) OVER w, 6) AS prev2,
       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS ma3
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("events_lag_features", oracle=_LAGFEAT_ORACLE)
def events_lag_features(sf_dir: str):
    """LAG-1 / LAG-2 / trailing-3 mean per event under the
    (ts, event_id) order: one hash(user) exchange, vectorized shifts
    and rolling means per bucket.  The rolling mean divides the same
    2-3 floats in the same order on both engines."""
    import pandas as pd

    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    P = auto_buckets(ev.count())

    def tag(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        bk = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"event_id": t.column("event_id"),
             "user_id": t.column("user_id"),
             "ts": t.column("ts").cast(pa.int64()),
             "value": t.column("value"),
             "bk": pa.array(bk.astype(np.int64))}
        )

    def feats(df):
        cols = {"event_id": "int64", "prev1": "float64", "prev2": "float64",
                "ma3": "float64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)["value"]
        prev1 = g.shift(1)
        prev2 = g.shift(2)
        # trailing-3 mean with the oracle's exact association:
        # AVG over the frame = sum of present values / count
        ma3 = (df["value"] + prev1.fillna(0.0) + prev2.fillna(0.0)) / (
            1.0 + prev1.notna() + prev2.notna()
        )

        def rnd(x):
            v = x.to_numpy(dtype="float64")
            return np.where(np.isnan(v), np.nan,
                            np.copysign(np.floor(np.abs(v) * 1e6 + 0.5), v) / 1e6)

        return pd.DataFrame(
            {"event_id": df["event_id"].to_numpy(),
             "prev1": rnd(prev1), "prev2": rnd(prev2), "ma3": rnd(ma3)}
        )

    return bucket_map_groups(
        ev.map_batches(tag, batch_format="pyarrow"), "bk", feats, P, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Hour-of-day seasonality index: 24*n_h/N — an exact rational per
# bucket (the uniform-baseline traffic-shape readout).
# ---------------------------------------------------------------------------

_HOUR_SEASON_ORACLE = """
WITH h AS (SELECT CAST(date_part('hour', ts) AS BIGINT) AS hour, COUNT(*) AS n
           FROM events GROUP BY 1),
t AS (SELECT SUM(n) AS total FROM h)
SELECT hour, n,
       ROUND(24.0 * CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS seasonal_index
FROM h CROSS JOIN t
"""


@register("events_hour_seasonality", oracle=_HOUR_SEASON_ORACLE)
def events_hour_seasonality(sf_dir: str):
    """Per-hour-of-day event share vs the uniform baseline (index 1.0
    = flat): hour counts ride the combiner, the 24-row final derives
    the exact-rational index."""
    import pandas as pd

    from document_ai_ray.pipelines.ops import merge_partials
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["ts"])

    def hours(t: pa.Table) -> pa.Table:
        ts = pd.to_datetime(t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False),
                            unit="us")
        g = pa.table({"hour": pa.array(ts.hour.to_numpy().astype(np.int64))}).group_by(
            ["hour"]
        ).aggregate([([], "count_all")])
        return pa.Table.from_arrays([g.column("hour"), g.column("count_all")],
                                    names=["hour", "n"])

    merged = merge_partials(ev.map_batches(hours, batch_format="pyarrow"), ["hour"], {"n": "sum"})

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        total = float(n.sum())
        idx = 24.0 * n / total
        idx = np.copysign(np.floor(np.abs(idx) * 1e6 + 0.5), idx) / 1e6
        return pa.table(
            {"hour": t.column("hour"), "n": t.column("n"),
             "seasonal_index": pa.array(idx, pa.float64())}
        )

    return merged.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Dense-calendar gap fill + autocorrelation of the daily revenue
# series.  Both ride the same day-cardinality combiner aggregate; the
# spine (calendar-bounded, ~2.4k days even at 100 TB) is built in the
# one-row-group final.  ACF moments are EXACT integers (micro-cents
# scaled by n), so the single double division per lag is bitwise
# identical on both engines.
# ---------------------------------------------------------------------------

_DAILY_CENTS_CTE = """
WITH d0 AS (SELECT CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
                   CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders),
daily AS (SELECT day, CAST(SUM(cents) AS BIGINT) AS c FROM d0 GROUP BY 1),
spine AS (SELECT UNNEST(generate_series((SELECT MIN(day) FROM daily),
                                        (SELECT MAX(day) FROM daily))) AS day),
x AS (SELECT s.day AS day, COALESCE(daily.c, 0) AS c
      FROM spine s LEFT JOIN daily ON daily.day = s.day)
"""

_GAPFILL_ORACLE = (
    _DAILY_CENTS_CTE
    + """
SELECT day, c AS revenue_cents, (c = 0) AS is_gap FROM x ORDER BY day
"""
)


def _daily_cents(sf_dir: str):
    """(day, cents) partial sums over orders — shared by the gap-fill
    and ACF queries below."""
    from document_ai_ray.pipelines.ops import merge_partials

    orders = read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def days(t: pa.Table) -> pa.Table:
        day = t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False) // (
            86400 * 10**6
        )
        p = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(p * 100 + 0.5).astype(np.int64)
        g = (
            pa.table({"day": pa.array(day.astype(np.int64)), "c": pa.array(cents)})
            .group_by(["day"])
            .aggregate([("c", "sum")])
        )
        return pa.Table.from_arrays([g.column("day"), g.column("c_sum")], names=["day", "c"])

    return merge_partials(orders.map_batches(days, batch_format="pyarrow"), ["day"], {"c": "sum"})


@register("daily_revenue_gapfill", oracle=_GAPFILL_ORACLE)
def daily_revenue_gapfill(sf_dir: str):
    """Dense date-spine gap fill: every calendar day between the first
    and last order date, with zero-revenue days materialized and
    flagged — the series-preparation staple before any time-series
    model.  Daily sums ride the combiner; the spine join happens in
    the day-cardinality final (calendar-bounded forever)."""

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("day")
        lo, hi = int(df["day"].min()), int(df["day"].max())
        spine = np.arange(lo, hi + 1, dtype=np.int64)
        c = np.zeros(len(spine), np.int64)
        c[df["day"].to_numpy() - lo] = df["c"].to_numpy()
        return pa.table(
            {
                "day": pa.array(spine),
                "revenue_cents": pa.array(c),
                "is_gap": pa.array(c == 0),
            }
        )

    return (
        _daily_cents(sf_dir)
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)
    )


_ACF_ORACLE = (
    _DAILY_CENTS_CTE
    + """,
m AS (SELECT COUNT(*) AS n, SUM(c) AS s FROM x),
z AS (SELECT day, CAST((SELECT n FROM m) AS HUGEINT) * CAST(c AS HUGEINT)
                  - CAST((SELECT s FROM m) AS HUGEINT) AS zc
      FROM x),
den AS (SELECT SUM(zc * zc) AS d FROM z),
lags AS (SELECT UNNEST(generate_series(1, 7)) AS lag),
num AS (SELECT l.lag AS lag, COALESCE(SUM(a.zc * b.zc), 0) AS nu
        FROM lags l LEFT JOIN z a ON TRUE LEFT JOIN z b ON b.day = a.day + l.lag
        GROUP BY 1)
SELECT lag, ROUND(CAST(nu AS DOUBLE) / CAST((SELECT d FROM den) AS DOUBLE), 6) AS acf
FROM num ORDER BY lag
"""
)


@register("acf_daily_revenue", oracle=_ACF_ORACLE)
def acf_daily_revenue(sf_dir: str):
    """Autocorrelation (lags 1-7) of the gap-filled daily revenue
    series — the weekly-seasonality fingerprint.  Mean-centering is
    done in EXACT integer arithmetic (zc = n*cents - sum, Python ints
    in the final / HUGEINT in the oracle), so each lag's acf is one
    double division of two identical exact integers on both engines."""

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("day")
        lo, hi = int(df["day"].min()), int(df["day"].max())
        c = np.zeros(hi - lo + 1, np.int64)
        c[df["day"].to_numpy() - lo] = df["c"].to_numpy()
        n = len(c)
        s = int(c.sum())
        zc = [n * int(v) - s for v in c]  # exact python ints
        den = sum(v * v for v in zc)
        out_lag, out_acf = [], []
        for k in range(1, 8):
            nu = sum(zc[i] * zc[i + k] for i in range(n - k)) if k < n else 0
            acf = float(nu) / float(den) if den else 0.0
            out_lag.append(k)
            out_acf.append(np.copysign(np.floor(abs(acf) * 1e6 + 0.5), acf) / 1e6)
        return pa.table(
            {"lag": pa.array(out_lag, pa.int64()), "acf": pa.array(out_acf, pa.float64())}
        )

    return (
        _daily_cents(sf_dir)
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)
    )


# ---------------------------------------------------------------------------
# Position-based (U-shaped) multi-touch attribution: each purchase
# distributes 1,000,000 micro-credits over the user's touches in the
# preceding 7 days — 40% first, 40% last, 20% split over the middles
# (largest-remainder to the earliest).  ALL-INTEGER credits, so the
# per-channel sums are order-free.
# ---------------------------------------------------------------------------

_UATTRIB_ORACLE = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
t AS (SELECT p.event_id AS pid, e.event_type AS ty,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY e.ts, e.event_id) AS r,
             COUNT(*) OVER (PARTITION BY p.event_id) AS m
      FROM p JOIN events e ON e.user_id = p.user_id
         AND e.ts >= p.ts - INTERVAL 7 DAY AND e.ts < p.ts),
credit AS (
  SELECT ty, CASE
      WHEN m = 1 THEN 1000000
      WHEN m = 2 THEN 500000
      WHEN r = 1 OR r = m THEN 400000
      ELSE 200000 // (m - 2)
           + CASE WHEN r - 1 <= 200000 % (m - 2) THEN 1 ELSE 0 END
    END AS cr
  FROM t
  UNION ALL
  SELECT 'direct' AS ty, 1000000 AS cr FROM p
  WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = p.user_id
                    AND e.ts >= p.ts - INTERVAL 7 DAY AND e.ts < p.ts))
SELECT ty AS attributed_type, CAST(SUM(cr) AS BIGINT) AS micro_credit,
       COUNT(*) AS n_touches
FROM credit GROUP BY 1
"""


@register("attribution_position_based", oracle=_UATTRIB_ORACLE)
def attribution_position_based(sf_dir: str):
    """U-shaped multi-touch attribution over the same 7-day purchase
    windows as `attribution_first_touch`: 400k/400k micro-credits to
    the first and last touch, 200k split across middles with the
    largest-remainder rule (earliest middles get the +1 seats), single
    touches take the full million, empty windows go to 'direct'.
    Integer credits make the channel totals associativity-free.  One
    hash(user) exchange; per-bucket searchsorted window probes; only
    (type, credit, touches) partials leave the buckets."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, merge_partials

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    P = auto_buckets(ev.count())
    W_US = 7 * 86400 * 10**6

    def tag(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        bk = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts": t.column("ts").cast(pa.int64()),
                "event_type": t.column("event_type"),
                "eid": t.column("event_id"),
                "bk": pa.array(bk.astype(np.int64)),
            }
        )

    def attribute(df):
        acc: dict[str, list[int]] = {}

        def add(ty: str, cr: int):
            e = acc.setdefault(ty, [0, 0])
            e[0] += cr
            e[1] += 1

        for _, g in df.groupby("user_id", sort=False):
            g = g.sort_values(["ts", "eid"], kind="mergesort")
            ts = g["ts"].to_numpy()
            ty = g["event_type"].to_numpy()
            is_p = ty == "purchase"
            if not is_p.any():
                continue
            pts = ts[is_p]
            lo = np.searchsorted(ts, pts - W_US, side="left")
            hi = np.searchsorted(ts, pts, side="left")
            for a, b in zip(lo, hi):
                m = int(b - a)
                if m == 0:
                    add("direct", 1000000)
                elif m == 1:
                    add(ty[a], 1000000)
                elif m == 2:
                    add(ty[a], 500000)
                    add(ty[a + 1], 500000)
                else:
                    add(ty[a], 400000)
                    add(ty[b - 1], 400000)
                    q, rem = divmod(200000, m - 2)
                    for i in range(m - 2):
                        add(ty[a + 1 + i], q + (1 if i + 1 <= rem else 0))
        return pd.DataFrame(
            {
                "attributed_type": list(acc),
                "micro_credit": pd.Series([v[0] for v in acc.values()], dtype="int64"),
                "n_touches": pd.Series([v[1] for v in acc.values()], dtype="int64"),
            }
        )

    parts = bucket_map_groups(
        ev.map_batches(tag, batch_format="pyarrow"), "bk", attribute, P, batch_format="pandas"
    )
    return merge_partials(parts, ["attributed_type"], {"micro_credit": "sum", "n_touches": "sum"})


# ---------------------------------------------------------------------------
# Item-item collaborative filtering: per part, the top-3 most similar
# parts by co-purchase cosine — the classic "customers who bought X
# also bought Y" recommender neighborhood.
# ---------------------------------------------------------------------------

_ITEMKNN_MINSUP = 2
_ITEMKNN_K = 3

_ITEMKNN_ORACLE = f"""
WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
item AS (SELECT pk, COUNT(*) AS cnt FROM lp GROUP BY 1),
p0 AS (SELECT a.pk AS pa_, b.pk AS pb, COUNT(*) AS co
       FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk
       GROUP BY 1, 2 HAVING COUNT(*) >= {_ITEMKNN_MINSUP}),
sym AS (SELECT pa_ AS i, pb AS j, co FROM p0
        UNION ALL SELECT pb AS i, pa_ AS j, co FROM p0),
sc AS (SELECT i, j, co,
              ROUND(CAST(co AS DOUBLE)
                    / SQRT(CAST(ia.cnt AS DOUBLE) * CAST(ja.cnt AS DOUBLE)), 6) AS cosine
       FROM sym JOIN item ia ON ia.pk = i JOIN item ja ON ja.pk = j),
r AS (SELECT i, j, co, cosine,
             ROW_NUMBER() OVER (PARTITION BY i ORDER BY cosine DESC, j) AS rn
      FROM sc)
SELECT i AS part_i, j AS part_j, co AS support, cosine
FROM r WHERE rn <= {_ITEMKNN_K}
"""


@register("item_item_cosine_topk", oracle=_ITEMKNN_ORACLE)
def item_item_cosine_topk(sf_dir: str):
    """Item-item cosine kNN over orders-as-baskets: cosine(i, j) =
    co(i,j) / sqrt(n_i * n_j) on binary purchase vectors, top-3
    partners per part, min co-support 2.  Same exchange as the basket
    lift query: global (order, part) dedup + pair expansion inside one
    hash(order) exchange (pairs bounded by lines-per-order, never the
    part vocab), co-counts ride the combiner.  Item supports are
    part-catalog sized -> broadcast into the scoring map; ranking uses
    the ROUNDED cosine (one sqrt + one division of exact ints on both
    engines, ties by partner id) so the top-k cut is engine-robust;
    the per-part cut runs on the bucketed grouped-topk final."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import (
        bucket_map_groups,
        get_broadcast,
        grouped_topk,
        merge_partials,
    )

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    P = auto_buckets(li.count())

    def local_dedup(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        uniq = np.unique(np.stack([ok, pk], axis=1), axis=0)
        bk = (uniq[:, 0].astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"ok": pa.array(uniq[:, 0]), "pk": pa.array(uniq[:, 1]),
             "bk": pa.array(bk.astype(np.int64))}
        )

    deduped = li.map_batches(local_dedup, batch_format="pyarrow").materialize()

    _COLS = {"part_a": "int64", "part_b": "int64", "n": "int64"}

    def basket_pairs(df):
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in _COLS.items()})
        df = df.drop_duplicates(["ok", "pk"])  # global: all of an order is here
        m = df.merge(df, on="ok")
        m = m[m["pk_x"] < m["pk_y"]]
        g = m.groupby(["pk_x", "pk_y"], as_index=False).size()
        pairs = pd.DataFrame(
            {"part_a": g["pk_x"], "part_b": g["pk_y"], "n": g["size"].astype("int64")}
        )
        gi = df.groupby("pk", as_index=False).size()
        items = pd.DataFrame(
            {"part_a": gi["pk"], "part_b": np.full(len(gi), -1, np.int64),
             "n": gi["size"].astype("int64")}
        )
        return pd.concat([pairs, items], ignore_index=True)

    pair_parts = bucket_map_groups(deduped, "bk", basket_pairs, P, batch_format="pandas")
    merged = merge_partials(pair_parts, ["part_a", "part_b"], {"n": "sum"})

    # part-catalog-sized support map (bounded by the part vocabulary)
    items_tbl = (
        merged.filter(expr="part_b == -1")
        .select_columns(["part_a", "n"])
        .to_pandas()
    )
    import ray

    cnt_ref = (ray.put(dict(zip(items_tbl["part_a"], items_tbl["n"]))),)

    def score(t: pa.Table) -> pa.Table:
        cnt = get_broadcast(cnt_ref)
        pa_ = t.column("part_a").to_numpy(zero_copy_only=False)
        pb = t.column("part_b").to_numpy(zero_copy_only=False)
        co = t.column("n").to_numpy(zero_copy_only=False)
        keep = (pb != -1) & (co >= _ITEMKNN_MINSUP)
        pa_, pb, co = pa_[keep], pb[keep], co[keep]
        na = np.fromiter((cnt[v] for v in pa_), np.float64, len(pa_))
        nb = np.fromiter((cnt[v] for v in pb), np.float64, len(pb))
        cos = co.astype(np.float64) / np.sqrt(na * nb)
        cos = np.floor(cos * 1e6 + 0.5) / 1e6  # DuckDB ROUND, positive domain
        i = np.concatenate([pa_, pb])
        j = np.concatenate([pb, pa_])
        return pa.table(
            {"part_i": pa.array(i, pa.int64()), "part_j": pa.array(j, pa.int64()),
             "support": pa.array(np.concatenate([co, co]), pa.int64()),
             "cosine": pa.array(np.concatenate([cos, cos]), pa.float64())}
        )

    scored = merged.map_batches(score, batch_format="pyarrow")
    return grouped_topk(
        scored, ["part_i"], [("cosine", False), ("part_j", True)], _ITEMKNN_K,
        n_buckets=P,
    )


# ---------------------------------------------------------------------------
# Decision stump: the single best threshold on order price predicting
# o_orderstatus = 'F', by weighted Gini impurity over prefix sums of
# the sorted (cents -> class counts) grid.  All moments are exact
# integers; each candidate's score is two identical double divisions
# plus one add on both engines, so the argmax is deterministic.
# ---------------------------------------------------------------------------

_STUMP_ORACLE = """
WITH o AS (SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y FROM orders),
t AS (SELECT cents, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS p FROM o GROUP BY 1),
w AS (SELECT cents,
             CAST(SUM(n) OVER (ORDER BY cents) AS BIGINT) AS l,
             CAST(SUM(p) OVER (ORDER BY cents) AS BIGINT) AS lp,
             CAST((SELECT SUM(n) FROM t) AS BIGINT) AS nn,
             CAST((SELECT SUM(p) FROM t) AS BIGINT) AS pp
      FROM t),
c AS (SELECT cents, l, lp, nn - l AS r, pp - lp AS rp, nn FROM w WHERE nn - l > 0),
g AS (SELECT cents, l, r, nn,
             CAST(lp * lp + (l - lp) * (l - lp) AS DOUBLE) / CAST(l AS DOUBLE) AS u,
             CAST(rp * rp + (r - rp) * (r - rp) AS DOUBLE) / CAST(r AS DOUBLE) AS v
      FROM c)
SELECT cents AS threshold_cents, l AS n_left, r AS n_right,
       ROUND(((CAST(l AS DOUBLE) - u) + (CAST(r AS DOUBLE) - v)) / CAST(nn AS DOUBLE), 6)
         AS weighted_gini
FROM g ORDER BY u + v DESC, cents LIMIT 1
"""


@register("stump_split_orders", oracle=_STUMP_ORACLE)
def stump_split_orders(sf_dir: str):
    """Optimal decision stump (CART's split-finding inner loop) on
    o_totalprice for the o_orderstatus='F' label: per-threshold class
    counts ride the combiner keyed on exact integer cents; the finish
    sorts the grid once and scans prefix sums.  The candidate grid is
    bounded by the price domain (a 100 TB run would pre-quantize the
    grid, same shape); the score (lp^2+ln^2)/L + (rp^2+rn^2)/R is
    exact-int divisions, so argmax + the tie-break (lowest threshold)
    are engine-identical."""
    from document_ai_ray.pipelines.ops import merge_partials

    orders = read_table(sf_dir, "orders", columns=["o_totalprice", "o_orderstatus"])

    def grid(t: pa.Table) -> pa.Table:
        p = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(p * 100 + 0.5).astype(np.int64)
        y = (pc.equal(t.column("o_orderstatus"), "F")).to_numpy(zero_copy_only=False)
        g = (
            pa.table({"cents": pa.array(cents), "y": pa.array(y.astype(np.int64))})
            .group_by(["cents"])
            .aggregate([("y", "sum"), ([], "count_all")])
        )
        return pa.Table.from_arrays(
            [g.column("cents"), g.column("count_all"), g.column("y_sum")],
            names=["cents", "n", "p"],
        )

    merged = merge_partials(
        orders.map_batches(grid, batch_format="pyarrow"), ["cents"], {"n": "sum", "p": "sum"}
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("cents").reset_index(drop=True)
        n = df["n"].to_numpy(np.int64)
        p = df["p"].to_numpy(np.int64)
        L = np.cumsum(n)
        lp = np.cumsum(p)
        NN, PP = int(L[-1]), int(lp[-1])
        keep = (NN - L) > 0
        cents = df["cents"].to_numpy(np.int64)[keep]
        L, lp = L[keep], lp[keep]
        R, rp = NN - L, PP - lp
        u = (lp * lp + (L - lp) * (L - lp)).astype(np.float64) / L.astype(np.float64)
        v = (rp * rp + (R - rp) * (R - rp)).astype(np.float64) / R.astype(np.float64)
        i = int(np.lexsort((cents, -(u + v)))[0])
        wg = ((float(L[i]) - u[i]) + (float(R[i]) - v[i])) / float(NN)
        wg = float(np.floor(wg * 1e6 + 0.5) / 1e6)
        return pa.table(
            {
                "threshold_cents": pa.array([int(cents[i])], pa.int64()),
                "n_left": pa.array([int(L[i])], pa.int64()),
                "n_right": pa.array([int(R[i])], pa.int64()),
                "weighted_gini": pa.array([wg], pa.float64()),
            }
        )

    return merged.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# HBOS-style histogram outliers: equi-width histogram over event value,
# events falling in bins rarer than N // 1000 flagged.  Bin indexing is
# the identical float expression on both engines; everything else is
# integer counts.
# ---------------------------------------------------------------------------

_HBOS_BINS = 20

_HBOS_ORACLE = f"""
WITH m AS (SELECT MIN(value) AS vmin, MAX(value) AS vmax, COUNT(*) AS n FROM events),
b AS (SELECT event_id, value,
             LEAST(CAST(FLOOR((value - vmin) * {_HBOS_BINS}.0 / (vmax - vmin)) AS BIGINT),
                   {_HBOS_BINS - 1}) AS bin
      FROM events, m),
h AS (SELECT bin, COUNT(*) AS bin_count FROM b GROUP BY 1)
SELECT b.event_id, b.value, b.bin, h.bin_count
FROM b JOIN h ON h.bin = b.bin, m
WHERE h.bin_count <= n // 1000
"""


@register("hbos_event_outliers", oracle=_HBOS_ORACLE)
def hbos_event_outliers(sf_dir: str):
    """Histogram-based outlier detection (HBOS, Goldstein/Dengel 2012,
    reduced to the rare-bin flag): 20 equi-width bins over the
    heavy-tailed event value, events in bins holding <= N/1000 of the
    mass flagged.  Three streaming passes: min/max/count combiner,
    bin-count combiner (20-row final), then a broadcast of the 20
    counts into the flagging map — nothing corpus-sized ever leaves
    the tasks.  Requires vmax > vmin (guaranteed by the corpus)."""
    from document_ai_ray.pipelines.ops import merge_partials

    ev = read_table(sf_dir, "events", columns=["event_id", "value"])

    def mm(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vmin": pa.array([float(v.min())]),
                "vmax": pa.array([float(v.max())]),
                "n": pa.array([len(v)], pa.int64()),
                "one": pa.array([1], pa.int64()),
            }
        )

    stats = (
        merge_partials(
            ev.map_batches(mm, batch_format="pyarrow"),
            ["one"],
            {"vmin": "min", "vmax": "max", "n": "sum"},
        )
        .to_pandas()
        .iloc[0]
    )
    vmin, vmax, n_total = float(stats["vmin"]), float(stats["vmax"]), int(stats["n"])

    def bins(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        b = np.minimum(
            np.floor((v - vmin) * float(_HBOS_BINS) / (vmax - vmin)).astype(np.int64),
            _HBOS_BINS - 1,
        )
        g = pa.table({"bin": pa.array(b)}).group_by(["bin"]).aggregate([([], "count_all")])
        return pa.Table.from_arrays([g.column("bin"), g.column("count_all")], names=["bin", "c"])

    hist = (
        merge_partials(ev.map_batches(bins, batch_format="pyarrow"), ["bin"], {"c": "sum"})
        .to_pandas()
    )
    counts = np.zeros(_HBOS_BINS, np.int64)
    counts[hist["bin"].to_numpy()] = hist["c"].to_numpy()
    thr = n_total // 1000
    rare = counts <= thr  # bin -> is-outlier lookup, 20 entries

    def flag(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        b = np.minimum(
            np.floor((v - vmin) * float(_HBOS_BINS) / (vmax - vmin)).astype(np.int64),
            _HBOS_BINS - 1,
        )
        keep = rare[b]
        return pa.table(
            {
                "event_id": t.column("event_id").filter(pa.array(keep)),
                "value": t.column("value").filter(pa.array(keep)),
                "bin": pa.array(b[keep]),
                "bin_count": pa.array(counts[b[keep]]),
            }
        )

    return ev.map_batches(flag, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# DAU/MAU stickiness: per calendar day, distinct active users over
# distinct monthly actives — the product-analytics engagement ratio.
# Distinct sets ride the global-dedup exchange; only day- and
# month-cardinality counts reach the final; one double division per
# day, both operands exact ints.
# ---------------------------------------------------------------------------

_STICKY_ORACLE = """
WITH d AS (SELECT DISTINCT CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
                  (EXTRACT(year FROM ts) - 1970) * 12 + EXTRACT(month FROM ts) - 1
                    AS month_idx,
                  user_id
           FROM events),
dau AS (SELECT day, month_idx, COUNT(*) AS dau FROM d GROUP BY 1, 2),
mau AS (SELECT month_idx, COUNT(DISTINCT user_id) AS mau FROM d GROUP BY 1)
SELECT dau.day, dau.dau, mau.mau,
       ROUND(CAST(dau.dau AS DOUBLE) / CAST(mau.mau AS DOUBLE), 6) AS stickiness
FROM dau JOIN mau ON mau.month_idx = dau.month_idx
"""


@register("dau_mau_stickiness", oracle=_STICKY_ORACLE)
def dau_mau_stickiness(sf_dir: str):
    """Daily-active / monthly-active stickiness per day.  Per-batch
    (day, month, user) dedup partials -> global distinct exchange
    (consumed twice: day counts + per-month distinct users, so it is
    materialized once) -> day-cardinality final joins the tiny month
    map and performs the one rounded division per day."""
    from document_ai_ray.pipelines.ops import distinct_rows, partial_group_agg

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def triple(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        day = ts // (86400 * 10**6)
        month = ts.astype("datetime64[us]").astype("datetime64[M]").astype(np.int64)
        key = np.stack([day, month, u], axis=1)
        uniq = np.unique(key, axis=0)
        return pa.table(
            {"day": pa.array(uniq[:, 0]), "month_idx": pa.array(uniq[:, 1]),
             "user_id": pa.array(uniq[:, 2])}
        )

    dd = distinct_rows(
        ev.map_batches(triple, batch_format="pyarrow"), ["day", "month_idx", "user_id"]
    ).materialize()

    dau = partial_group_agg(dd, ["day", "month_idx"], count_alias="dau")
    mau_pairs = distinct_rows(
        dd.select_columns(["month_idx", "user_id"]), ["month_idx", "user_id"]
    )
    mau = partial_group_agg(mau_pairs, ["month_idx"], count_alias="mau").to_pandas()
    mau_map = dict(zip(mau["month_idx"], mau["mau"]))

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        m = df["month_idx"].map(mau_map).to_numpy(np.int64)
        d = df["dau"].to_numpy(np.int64)
        s = d.astype(np.float64) / m.astype(np.float64)
        s = np.floor(s * 1e6 + 0.5) / 1e6
        return pa.table(
            {"day": pa.array(df["day"], pa.int64()),
             "dau": pa.array(d), "mau": pa.array(m),
             "stickiness": pa.array(s, pa.float64())}
        )

    return dau.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Funnel time-to-convert: exact (lower) median + mean of the
# first-signup -> first-subsequent-purchase delay across converting
# users, on the distributed exact-rank substrate.
# ---------------------------------------------------------------------------

_TTC_ORACLE = """
WITH su AS (SELECT user_id, MIN(ts) AS s_ts FROM events
            WHERE event_type = 'signup' GROUP BY 1),
pu AS (SELECT e.user_id, MIN(e.ts) AS p_ts
       FROM events e JOIN su ON su.user_id = e.user_id
       WHERE e.event_type = 'purchase' AND e.ts > su.s_ts GROUP BY 1),
d AS (SELECT su.user_id, epoch_us(pu.p_ts) - epoch_us(su.s_ts) AS delta_us
      FROM su JOIN pu ON pu.user_id = su.user_id),
r AS (SELECT user_id, delta_us,
             ROW_NUMBER() OVER (ORDER BY delta_us, user_id) AS rn,
             COUNT(*) OVER () AS n,
             CAST(SUM(delta_us) OVER () AS BIGINT) AS s
      FROM d)
SELECT CAST(n AS BIGINT) AS n_converted,
       delta_us AS median_delta_us,
       ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6) AS mean_seconds
FROM r WHERE rn = (n + 1) // 2
"""


@register("funnel_time_to_convert", oracle=_TTC_ORACLE)
def funnel_time_to_convert(sf_dir: str):
    """Signup->purchase conversion delay: first signup per user, first
    strictly-later purchase, exact lower-median of the delays via
    `with_group_ranks` (distributed sort + offset-merged ranks — no
    task holds the converting-user set), mean as one double division
    of exact integer sum/count.  One hash(user) exchange produces the
    per-user delays; the median row self-selects by rank == (n-1)//2
    using the substrate's attached group totals."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import (
        bucket_map_groups,
        partial_group_agg,
        with_group_ranks,
    )

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    P = auto_buckets(ev.count())

    def tag(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("event_type"), value_set=pa.array(["signup", "purchase"]))
        t = t.filter(keep)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        bk = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"user_id": t.column("user_id"),
             "ts": t.column("ts").cast(pa.int64()),
             "event_type": t.column("event_type"),
             "bk": pa.array(bk.astype(np.int64))}
        )

    def deltas(df):
        cols = {"user_id": "int64", "delta_us": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        s = df[df["event_type"] == "signup"].groupby("user_id")["ts"].min()
        p = df[df["event_type"] == "purchase"]
        p = p.merge(s.rename("s_ts"), left_on="user_id", right_index=True)
        p = p[p["ts"] > p["s_ts"]]
        if len(p) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        first = p.groupby("user_id", as_index=False).agg(
            p_ts=("ts", "min"), s_ts=("s_ts", "min")
        )
        return pd.DataFrame(
            {"user_id": first["user_id"].astype("int64"),
             "delta_us": (first["p_ts"] - first["s_ts"]).astype("int64")}
        )

    dl = bucket_map_groups(
        ev.map_batches(tag, batch_format="pyarrow"), "bk", deltas, P, batch_format="pandas"
    ).materialize()

    stats = (
        partial_group_agg(
            dl.map_batches(
                lambda t: t.append_column("one", pa.array([1] * len(t), pa.int64())),
                batch_format="pyarrow",
            ),
            ["one"],
            {"delta_us": "sum_us"},
            count_alias="n",
        )
        .to_pandas()
        .iloc[0]
    )
    n, sum_us = int(stats["n"]), int(stats["sum_us"])

    ranked = with_group_ranks(
        dl.map_batches(
            lambda t: t.append_column("one", pa.array([1] * len(t), pa.int64())),
            batch_format="pyarrow",
        ),
        "one",
        ["delta_us", "user_id"],
    )
    med = ranked.filter(expr=f"__rank == {(n - 1) // 2}").to_pandas()
    mean_s = float(sum_us) / float(n) / 1000000.0
    mean_s = float(np.floor(mean_s * 1e6 + 0.5) / 1e6)
    return pd.DataFrame(
        [{"n_converted": n,
          "median_delta_us": int(med["delta_us"].iloc[0]),
          "mean_seconds": mean_s}]
    )


# ---------------------------------------------------------------------------
# Ratio-to-report: revenue share per region through the TPC-H
# customer -> nation -> region dimension chain.
# ---------------------------------------------------------------------------

_REGSHARE_ORACLE = """
WITH oc AS (SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents, o_custkey
            FROM orders),
j AS (SELECT r.r_name, oc.cents FROM oc
      JOIN customer c ON c.c_custkey = oc.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey),
g AS (SELECT r_name, CAST(SUM(cents) AS BIGINT) AS revenue_cents FROM j GROUP BY 1),
t AS (SELECT CAST(SUM(revenue_cents) AS BIGINT) AS tot FROM g)
SELECT r_name AS region, revenue_cents,
       ROUND(CAST(revenue_cents AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS revenue_share
FROM g, t
"""


@register("revenue_share_by_region", oracle=_REGSHARE_ORACLE)
def revenue_share_by_region(sf_dir: str):
    """Percent-of-total (ratio-to-report) revenue per region: orders
    resolve customer -> nation -> region through dim-sized broadcast
    maps (the repo's broadcast-join convention for TPC-H dims; a
    fact-sized dim would move to the shuffle/skew join), region cent
    sums ride the combiner, and the 5-row final computes each share as
    one double division of exact ints.  Orders with orphan custkeys
    drop on both engines (inner-join semantics)."""
    import ray

    from document_ai_ray.pipelines.ops import get_broadcast, partial_group_agg

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    nat = read_table(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"]).to_pandas()
    reg = read_table(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    n2r = dict(zip(nat["n_nationkey"], nat["n_regionkey"]))
    c2r = {c: n2r[n] for c, n in zip(cust["c_custkey"], cust["c_nationkey"]) if n in n2r}
    rname = dict(zip(reg["r_regionkey"], reg["r_name"]))
    c2r_ref = (ray.put(c2r),)

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def to_region(t: pa.Table) -> pa.Table:
        m = get_broadcast(c2r_ref)
        ck = t.column("o_custkey").to_pylist()
        p = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(p * 100 + 0.5).astype(np.int64)
        rk = np.fromiter((m.get(c, -1) for c in ck), np.int64, len(ck))
        keep = rk >= 0
        return pa.table(
            {"rk": pa.array(rk[keep]), "cents": pa.array(cents[keep])}
        )

    g = partial_group_agg(
        orders.map_batches(to_region, batch_format="pyarrow"), ["rk"], {"cents": "revenue_cents"}
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        tot = int(df["revenue_cents"].sum())
        share = df["revenue_cents"].to_numpy(np.int64).astype(np.float64) / float(tot)
        share = np.floor(share * 1e6 + 0.5) / 1e6
        return pa.table(
            {"region": pa.array([rname[k] for k in df["rk"]], pa.string()),
             "revenue_cents": pa.array(df["revenue_cents"], pa.int64()),
             "revenue_share": pa.array(share, pa.float64())}
        )

    return g.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Cohort LTV curve: cumulative purchase revenue per signup-cohort
# month x age-month, normalized per cohort user — the classic cohort
# triangle.  Revenue rides as integer cents; the dense age spine and
# the single division per cell live in the cohort-cardinality final.
# ---------------------------------------------------------------------------

_LTV_ORACLE = """
WITH me AS (SELECT user_id, event_type, value,
                   CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 // 7 AS m
            FROM events),
co AS (SELECT user_id, MIN(m) AS cohort FROM me GROUP BY 1),
nc AS (SELECT cohort, COUNT(*) AS n_users FROM co GROUP BY 1),
rev AS (SELECT co.cohort, me.m - co.cohort AS age,
               CAST(SUM(CAST(FLOOR(me.value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM me JOIN co ON co.user_id = me.user_id
        WHERE me.event_type = 'purchase'
        GROUP BY 1, 2),
mx AS (SELECT MAX(m) AS mmax FROM me),
spine AS (SELECT nc.cohort AS cohort, unnest(generate_series(0, mmax - nc.cohort)) AS age
          FROM nc, mx),
cum AS (SELECT s.cohort, s.age,
               CAST(SUM(COALESCE(rev.cents, 0))
                    OVER (PARTITION BY s.cohort ORDER BY s.age) AS BIGINT) AS cum_cents
        FROM spine s LEFT JOIN rev ON rev.cohort = s.cohort AND rev.age = s.age)
SELECT c.cohort, c.age, c.cum_cents, n.n_users,
       ROUND(CAST(c.cum_cents AS DOUBLE) / CAST(n.n_users AS DOUBLE) / 100.0, 6)
         AS ltv_per_user
FROM cum c JOIN nc n ON n.cohort = c.cohort
"""


@register("cohort_ltv_curve", oracle=_LTV_ORACLE)
def cohort_ltv_curve(sf_dir: str):
    """Cohort lifetime-value triangle: cohort = epoch-WEEK of the
    user's first event, age = weeks since (the corpus spans ~5 weeks), cell = cumulative purchase cents
    per cohort user.  ONE hash(user) exchange derives each user's
    cohort (all their events co-reside) and emits two partial streams
    from the same pass — per-cohort user counts (age = -1 markers) and
    per-(cohort, age) cent sums; the dense spine, cumsum and division
    run on the week-squared-bounded final."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, merge_partials

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type", "value"])
    P = auto_buckets(ev.count())

    def tag(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        m = ts // (86400 * 10**6) // 7
        bk = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"user_id": t.column("user_id"), "m": pa.array(m),
             "event_type": t.column("event_type"), "value": t.column("value"),
             "bk": pa.array(bk.astype(np.int64))}
        )

    _COLS = {"cohort": "int64", "age": "int64", "cents": "int64", "n": "int64"}

    def partials(df):
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in _COLS.items()})
        co = df.groupby("user_id")["m"].min().rename("cohort")
        nc = co.value_counts()
        users = pd.DataFrame(
            {"cohort": nc.index.astype("int64"), "age": np.full(len(nc), -1, np.int64),
             "cents": np.zeros(len(nc), np.int64), "n": nc.to_numpy().astype("int64")}
        )
        p = df[df["event_type"] == "purchase"].merge(
            co, left_on="user_id", right_index=True
        )
        if len(p):
            p["age"] = (p["m"] - p["cohort"]).astype("int64")
            p["cents"] = np.floor(p["value"].to_numpy() * 100 + 0.5).astype(np.int64)
            g = p.groupby(["cohort", "age"], as_index=False)["cents"].sum()
            g["n"] = np.zeros(len(g), np.int64)
            users = pd.concat([users, g[["cohort", "age", "cents", "n"]]], ignore_index=True)
        return users

    parts = bucket_map_groups(
        ev.map_batches(tag, batch_format="pyarrow"), "bk", partials, P, batch_format="pandas"
    )
    merged = merge_partials(parts, ["cohort", "age"], {"cents": "sum", "n": "sum"})

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        nc = dict(zip(df.loc[df["age"] == -1, "cohort"], df.loc[df["age"] == -1, "n"]))
        rev = df[df["age"] >= 0]
        mmax = int((rev["cohort"] + rev["age"]).max()) if len(rev) else max(nc)
        out = {"cohort": [], "age": [], "cum_cents": [], "n_users": [], "ltv_per_user": []}
        for cohort in sorted(nc):
            n_users = int(nc[cohort])
            cells = dict(
                zip(rev.loc[rev["cohort"] == cohort, "age"],
                    rev.loc[rev["cohort"] == cohort, "cents"])
            )
            cum = 0
            for age in range(0, mmax - cohort + 1):
                cum += int(cells.get(age, 0))
                ltv = float(cum) / float(n_users) / 100.0
                out["cohort"].append(cohort)
                out["age"].append(age)
                out["cum_cents"].append(cum)
                out["n_users"].append(n_users)
                out["ltv_per_user"].append(float(np.floor(abs(ltv) * 1e6 + 0.5) / 1e6))
        return pa.table(
            {"cohort": pa.array(out["cohort"], pa.int64()),
             "age": pa.array(out["age"], pa.int64()),
             "cum_cents": pa.array(out["cum_cents"], pa.int64()),
             "n_users": pa.array(out["n_users"], pa.int64()),
             "ltv_per_user": pa.array(out["ltv_per_user"], pa.float64())}
        )

    return merged.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Theil-Sen robust trend of daily revenue: the median of all pairwise
# slopes over the gap-filled day series — outlier-days cannot move it.
# ---------------------------------------------------------------------------

_THEILSEN_ORACLE = (
    _DAILY_CENTS_CTE
    + """,
p AS (SELECT CAST(b.c - a.c AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
      FROM x a JOIN x b ON b.day > a.day),
r AS (SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn, COUNT(*) OVER () AS np
      FROM p)
SELECT CAST(np AS BIGINT) AS n_pairs, ROUND(slope, 6) AS median_slope_cents_per_day
FROM r WHERE rn = (np + 1) // 2
"""
)


@register("theil_sen_trend", oracle=_THEILSEN_ORACLE)
def theil_sen_trend(sf_dir: str):
    """Theil-Sen estimator over the dense daily revenue series: lower
    median of all C(n,2) pairwise slopes.  Daily cents ride the
    combiner; the pair expansion is calendar-bounded (n days ~ 2.4k ->
    ~3M slopes, a few MB) and runs in the one final task — each slope
    is one double division of exact ints, and the median selection by
    value is engine-identical.  A multi-decade series would sample
    pairs (the standard randomized Theil-Sen), same shape."""

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("day")
        lo, hi = int(df["day"].min()), int(df["day"].max())
        c = np.zeros(hi - lo + 1, np.int64)
        c[df["day"].to_numpy() - lo] = df["c"].to_numpy()
        n = len(c)
        ii, jj = np.triu_indices(n, k=1)
        slopes = (c[jj] - c[ii]).astype(np.float64) / (jj - ii).astype(np.float64)
        k = (len(slopes) - 1) // 2
        med = float(np.partition(slopes, k)[k])
        med = float(np.copysign(np.floor(abs(med) * 1e6 + 0.5), med) / 1e6)
        return pa.table(
            {"n_pairs": pa.array([len(slopes)], pa.int64()),
             "median_slope_cents_per_day": pa.array([med], pa.float64())}
        )

    return (
        _daily_cents(sf_dir)
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)
    )


# ---------------------------------------------------------------------------
# Per-user debounce (stream throttling): keep the first click, then
# the next click >= 300 s after the LAST KEPT one — a data-dependent
# chain no window function expresses; the oracle replays it with a
# recursive CTE stepping one kept event per user per iteration.
# ---------------------------------------------------------------------------

_DEBOUNCE_US = 300_000_000

_DEBOUNCE_ORACLE = f"""
WITH RECURSIVE base AS MATERIALIZED (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
  WHERE event_type = 'click'),
kept AS (
  SELECT user_id,
         MIN([ts_us, event_id])[1] AS ts_us,
         MIN([ts_us, event_id])[2] AS event_id
  FROM base GROUP BY user_id
  UNION ALL
  SELECT b.user_id,
         MIN([b.ts_us, b.event_id])[1] AS ts_us,
         MIN([b.ts_us, b.event_id])[2] AS event_id
  FROM kept k JOIN base b
    ON b.user_id = k.user_id AND b.ts_us >= k.ts_us + {_DEBOUNCE_US}
  GROUP BY b.user_id
)
SELECT user_id, event_id, ts_us FROM kept
"""


@register("events_debounce", oracle=_DEBOUNCE_ORACLE)
def events_debounce(sf_dir: str):
    """5-minute per-user click debounce (the rate-limiting / dedup
    throttle every event collector runs): under (ts, event_id) order,
    keep an event iff it is >= 300 s after the previously KEPT one —
    state that depends on its own output, so it is a per-key
    sequential scan, not a window.  One hash(user) exchange; each
    bucket scans its users' sorted clicks once; integer microsecond
    comparisons only."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    P = auto_buckets(ev.count())

    def tag(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "click"))
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        bk = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"user_id": t.column("user_id"),
             "ts_us": t.column("ts").cast(pa.int64()),
             "event_id": t.column("event_id"),
             "bk": pa.array(bk.astype(np.int64))}
        )

    def debounce(df):
        cols = {"user_id": "int64", "event_id": "int64", "ts_us": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy()
        ts = df["ts_us"].to_numpy()
        eid = df["event_id"].to_numpy()
        keep = np.zeros(len(df), bool)
        last_u = None
        last_kept = 0
        for i in range(len(df)):
            if u[i] != last_u:
                last_u, last_kept, keep[i] = u[i], ts[i], True
            elif ts[i] >= last_kept + _DEBOUNCE_US:
                last_kept, keep[i] = ts[i], True
        return pd.DataFrame(
            {"user_id": u[keep], "event_id": eid[keep], "ts_us": ts[keep]}
        )

    return bucket_map_groups(
        ev.map_batches(tag, batch_format="pyarrow"), "bk", debounce, P, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Rolling sliding-window DISTINCT: per event, distinct users in the
# trailing hour — a windowed aggregate no per-key partitioning serves
# (the window crosses every key).  Scale shape: HALO REPLICATION —
# each event ships to its own hour bucket AND the next one, so every
# bucket holds exactly the (hour-1, hour] span its anchors need and
# the per-bucket two-pointer scan is exact with no global state.
# ---------------------------------------------------------------------------

_ROLLDIST_ORACLE = """
SELECT a.event_id, COUNT(DISTINCT b.user_id) AS n_users_1h
FROM events a JOIN events b
  ON b.ts <= a.ts AND b.ts > a.ts - INTERVAL 1 HOUR
GROUP BY 1
"""


@register("rolling_distinct_users_1h", oracle=_ROLLDIST_ORACLE)
def rolling_distinct_users_1h(sf_dir: str):
    """Trailing-1h distinct active users at every event: the sliding
    window crosses user keys, so the exchange partitions TIME instead —
    events replicate to their hour bucket plus the following one (2x
    halo, bounded by window/bucket ratio), each bucket sorts once and
    answers its own anchors with a two-pointer distinct scan.  Counts
    are exact integers; window = (ts - 1h, ts]."""
    from document_ai_ray.pipelines.ops import bucket_map_groups

    HOUR_US = 3_600_000_000
    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    # hour span -> bucket count (bounded: one bucket per hour of data)
    span = ev.map_batches(
        lambda t: pa.table(
            {"lo": pa.array([int(pc.min(t.column("ts")).cast(pa.int64()).as_py())]),
             "hi": pa.array([int(pc.max(t.column("ts")).cast(pa.int64()).as_py())]),
             "one": pa.array([1], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    from document_ai_ray.pipelines.ops import merge_partials

    mm = merge_partials(span, ["one"], {"lo": "min", "hi": "max"}).to_pandas().iloc[0]
    h0 = int(mm["lo"]) // HOUR_US
    n_hours = int(mm["hi"]) // HOUR_US - h0 + 1
    # bucket count tracks DATA VOLUME (per-task memory flat at 100 TB)
    # but never exceeds one bucket per hour: the halo guarantee needs
    # bucket span >= the 1 h window.  Halo cost stays one WINDOW, so
    # the replication factor only shrinks as buckets widen.
    from document_ai_ray.functions.scale import auto_buckets

    P0 = min(n_hours, auto_buckets(ev.count()))
    g = max(1, -(-n_hours // P0))
    P = (n_hours - 1) // g + 1

    def halo(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        hr = ts // HOUR_US - h0
        hb = hr // g
        # native copy: anchor in its own bucket; halo copy: member-only
        # in the next bucket, only for events within 1 h of its edge
        nxt = (hr + 1) // g
        keep2 = (nxt != hb) & (nxt < P)
        return pa.table(
            {"event_id": pa.array(np.concatenate([eid, eid[keep2]])),
             "user_id": pa.array(np.concatenate([u, u[keep2]])),
             "ts_us": pa.array(np.concatenate([ts, ts[keep2]])),
             "anchor": pa.array(
                 np.concatenate([np.ones(len(ts), bool), np.zeros(int(keep2.sum()), bool)])
             ),
             "bk": pa.array(np.concatenate([hb, nxt[keep2]]))}
        )

    def window_scan(df):
        cols = {"event_id": "int64", "n_users_1h": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = df.sort_values(["ts_us", "event_id"], kind="mergesort")
        ts = df["ts_us"].to_numpy()
        users = df["user_id"].to_numpy()
        anchors = df[df["anchor"]]
        a_ts = anchors["ts_us"].to_numpy()
        lo = np.searchsorted(ts, a_ts - HOUR_US, side="right")
        hi = np.searchsorted(ts, a_ts, side="right")
        n = [len(set(users[a:b])) for a, b in zip(lo, hi)]
        return pd.DataFrame(
            {"event_id": anchors["event_id"].to_numpy(),
             "n_users_1h": pd.Series(n, dtype="int64")}
        )

    return bucket_map_groups(
        ev.map_batches(halo, batch_format="pyarrow"), "bk", window_scan, P,
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# Forecast-accuracy + randomness diagnostics on the gap-filled daily
# revenue series.  Absolute-error masses are exact integer cents, so
# MASE is one double division; the runs-test z uses only identical
# single expressions over exact integer run/sign counts.
# ---------------------------------------------------------------------------

_MASE_ORACLE = (
    _DAILY_CENTS_CTE
    + """,
l AS (SELECT day, c,
             LAG(c, 1) OVER (ORDER BY day) AS c1,
             LAG(c, 7) OVER (ORDER BY day) AS c7
      FROM x),
e AS (SELECT CAST(SUM(ABS(c - c7)) AS BIGINT) AS sae7, COUNT(*) AS n7
      FROM l WHERE c7 IS NOT NULL),
d AS (SELECT CAST(SUM(ABS(c - c1)) AS BIGINT) AS sae1, COUNT(*) AS n1
      FROM l WHERE c1 IS NOT NULL)
SELECT e.sae7 AS seasonal_abs_err_cents, d.sae1 AS naive_abs_err_cents,
       CAST(e.n7 AS BIGINT) AS n_seasonal, CAST(d.n1 AS BIGINT) AS n_naive,
       ROUND((CAST(e.sae7 AS DOUBLE) / e.n7) / (CAST(d.sae1 AS DOUBLE) / d.n1), 6)
         AS mase
FROM e, d
"""
)


@register("seasonal_naive_mase", oracle=_MASE_ORACLE)
def seasonal_naive_mase(sf_dir: str):
    """MASE of the weekly seasonal-naive forecast (y_hat_t = y_{t-7})
    against the one-step naive baseline (y_{t-1}) over the dense daily
    revenue series: the standard scale-free forecast benchmark.  Both
    absolute-error masses are exact integer cents accumulated on the
    calendar-bounded final; the ratio is computed with the identical
    (sum/n)/(sum/n) association on both engines."""

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("day")
        lo, hi = int(df["day"].min()), int(df["day"].max())
        c = np.zeros(hi - lo + 1, np.int64)
        c[df["day"].to_numpy() - lo] = df["c"].to_numpy()
        sae7 = int(np.abs(c[7:] - c[:-7]).sum())
        sae1 = int(np.abs(c[1:] - c[:-1]).sum())
        n7, n1 = len(c) - 7, len(c) - 1
        mase = (float(sae7) / n7) / (float(sae1) / n1)
        mase = float(np.floor(mase * 1e6 + 0.5) / 1e6)
        return pa.table(
            {"seasonal_abs_err_cents": pa.array([sae7], pa.int64()),
             "naive_abs_err_cents": pa.array([sae1], pa.int64()),
             "n_seasonal": pa.array([n7], pa.int64()),
             "n_naive": pa.array([n1], pa.int64()),
             "mase": pa.array([mase], pa.float64())}
        )

    return (
        _daily_cents(sf_dir)
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)
    )


_RUNS_ORACLE = (
    _DAILY_CENTS_CTE
    + """,
l AS (SELECT day, c - LAG(c) OVER (ORDER BY day) AS d FROM x),
s AS (SELECT day, CASE WHEN d > 0 THEN 1 ELSE 0 END AS up FROM l
      WHERE d IS NOT NULL AND d <> 0),
r AS (SELECT up, CASE WHEN LAG(up) OVER (ORDER BY day) IS NULL
                        OR LAG(up) OVER (ORDER BY day) <> up THEN 1 ELSE 0 END AS new_run
      FROM s),
m AS (SELECT CAST(SUM(new_run) AS BIGINT) AS n_runs,
             CAST(SUM(up) AS BIGINT) AS n_up,
             CAST(COUNT(*) - SUM(up) AS BIGINT) AS n_down
      FROM r)
SELECT n_runs, n_up, n_down,
       ROUND((CAST(n_runs AS DOUBLE)
              - (2.0 * n_up * n_down / (n_up + n_down) + 1.0))
             / SQRT(2.0 * n_up * n_down * (2.0 * n_up * n_down - n_up - n_down)
                    / ((n_up + n_down) * (n_up + n_down) * (n_up + n_down - 1.0))), 6)
         AS z_score
FROM m
"""
)


@register("runs_test_daily_revenue", oracle=_RUNS_ORACLE)
def runs_test_daily_revenue(sf_dir: str):
    """Wald-Wolfowitz runs test on the up/down moves of daily revenue
    (zero moves dropped): are consecutive days independent?  Run and
    sign counts are exact integers off the same calendar-bounded
    final; the z-score is one identical closed-form expression on both
    engines."""

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("day")
        lo, hi = int(df["day"].min()), int(df["day"].max())
        c = np.zeros(hi - lo + 1, np.int64)
        c[df["day"].to_numpy() - lo] = df["c"].to_numpy()
        d = np.diff(c)
        up = (d[d != 0] > 0).astype(np.int64)
        n_runs = int(1 + (up[1:] != up[:-1]).sum()) if len(up) else 0
        n1, n2 = int(up.sum()), int(len(up) - up.sum())
        mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
        var = (
            2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
            / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
        )
        z = (float(n_runs) - mu) / np.sqrt(var)
        z = float(np.copysign(np.floor(abs(z) * 1e6 + 0.5), z) / 1e6)
        return pa.table(
            {"n_runs": pa.array([n_runs], pa.int64()),
             "n_up": pa.array([n1], pa.int64()),
             "n_down": pa.array([n2], pa.int64()),
             "z_score": pa.array([z], pa.float64())}
        )

    return (
        _daily_cents(sf_dir)
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier retention: survival analysis over user lifetimes with
# right-censoring.  Every at-risk/death count is an exact integer; the
# survival product multiplies the identical (1 - d/n) factors in the
# identical ascending-time order on both engines (DuckDB window
# product() vs np.cumprod).
# ---------------------------------------------------------------------------

_KM_HORIZON_DAYS = 180

_KM_ORACLE = f"""
WITH e AS (SELECT o_custkey AS user_id,
                  CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS day FROM orders),
u AS (SELECT user_id, MIN(day) AS f, MAX(day) AS l FROM e GROUP BY 1),
mx AS (SELECT MAX(day) AS dmax FROM e),
t AS (SELECT l - f AS t,
             CASE WHEN l <= dmax - {_KM_HORIZON_DAYS} THEN 1 ELSE 0 END AS death
      FROM u, mx),
g AS (SELECT t, CAST(SUM(death) AS BIGINT) AS d,
             CAST(COUNT(*) - SUM(death) AS BIGINT) AS c
      FROM t GROUP BY 1),
n AS (SELECT t, d,
             CAST((SELECT COUNT(*) FROM u)
                  - COALESCE(SUM(d + c) OVER (ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
      FROM g),
s AS (SELECT t, d, n_risk,
             product(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
               OVER (ORDER BY t) AS surv
      FROM n WHERE d > 0)
SELECT t AS t_days, n_risk AS n_at_risk, d AS n_deaths, ROUND(surv, 6) AS survival
FROM s
"""


@register("kaplan_meier_retention", oracle=_KM_ORACLE)
def kaplan_meier_retention(sf_dir: str):
    """Kaplan-Meier survival curve over CUSTOMER ordering lifetimes
    (t = last-order day - first-order day over the 6.5-year orders
    span): a customer with no order in the final {h} observation days
    churned (death at t), anyone ordering near the boundary is
    right-censored.  Per-customer (first, last) rides one
    hash(custkey) exchange; only (t, deaths, censored)
    partials leave the buckets; the at-risk reverse-cumsum and the
    ordered survival product run on the lifetime-cardinality final
    (bounded by the observation window in days).""".format(h=_KM_HORIZON_DAYS)
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, merge_partials

    ev = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    P = auto_buckets(ev.count())

    # global observation end (one streaming min/max pass)
    mm = merge_partials(
        ev.map_batches(
            lambda t: pa.table(
                {"one": pa.array([1], pa.int64()),
                 "hi": pa.array(
                     [int(pc.max(t.column("o_orderdate")).cast(pa.int64()).as_py())],
                     pa.int64(),
                 )}
            ),
            batch_format="pyarrow",
        ),
        ["one"], {"hi": "max"},
    ).to_pandas()
    dmax = int(mm["hi"].iloc[0]) // (86400 * 10**6)

    def tag(t: pa.Table) -> pa.Table:
        u = t.column("o_custkey").to_numpy(zero_copy_only=False)
        day = t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False) // (
            86400 * 10**6
        )
        bk = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"user_id": pa.array(u), "day": pa.array(day),
             "bk": pa.array(bk.astype(np.int64))}
        )

    def lifetimes(df):
        cols = {"t": "int64", "d": "int64", "c": "int64"}
        if len(df) == 0:
            return pd.DataFrame({col: pd.Series([], dtype=dt) for col, dt in cols.items()})
        g = df.groupby("user_id")["day"].agg(["min", "max"])
        t = (g["max"] - g["min"]).to_numpy(np.int64)
        death = (g["max"].to_numpy(np.int64) <= dmax - _KM_HORIZON_DAYS).astype(np.int64)
        out = pd.DataFrame({"t": t, "death": death}).groupby("t", as_index=False).agg(
            d=("death", "sum"), c=("death", lambda x: int(len(x) - x.sum()))
        )
        return pd.DataFrame(
            {"t": out["t"].astype("int64"), "d": out["d"].astype("int64"),
             "c": out["c"].astype("int64")}
        )

    parts = bucket_map_groups(
        ev.map_batches(tag, batch_format="pyarrow"), "bk", lifetimes, P, batch_format="pandas"
    )
    merged = merge_partials(parts, ["t"], {"d": "sum", "c": "sum"})

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("t").reset_index(drop=True)
        total = int((df["d"] + df["c"]).sum())
        ahead = (df["d"] + df["c"]).cumsum().shift(1, fill_value=0).to_numpy(np.int64)
        n_risk = total - ahead
        death_rows = df["d"].to_numpy(np.int64) > 0
        d = df["d"].to_numpy(np.int64)[death_rows]
        nr = n_risk[death_rows]
        surv = np.cumprod(1.0 - d.astype(np.float64) / nr.astype(np.float64))
        surv = np.floor(surv * 1e6 + 0.5) / 1e6
        return pa.table(
            {"t_days": pa.array(df["t"].to_numpy(np.int64)[death_rows]),
             "n_at_risk": pa.array(nr), "n_deaths": pa.array(d),
             "survival": pa.array(surv, pa.float64())}
        )

    return merged.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Rolling per-user median (ROWS 4 PRECEDING), discrete lower-median on
# both engines — pure value selection, no float arithmetic at all.
# ---------------------------------------------------------------------------

_ROLLMED_ORACLE = """
SELECT event_id,
       QUANTILE_DISC(value, 0.5) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         AS rolling_median
FROM events
"""


@register("events_rolling_median", oracle=_ROLLMED_ORACLE)
def events_rolling_median(sf_dir: str):
    """Trailing-5-event median of value per user (the robust sibling
    of the ROWS-frame moving average): one hash(user) exchange, a
    vectorized pandas rolling lower-quantile per bucket.  Discrete
    selection only — the result is always one of the input doubles, so
    no rounding is even needed."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    P = auto_buckets(ev.count())

    def tag(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        bk = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"event_id": t.column("event_id"), "user_id": t.column("user_id"),
             "ts": t.column("ts").cast(pa.int64()), "value": t.column("value"),
             "bk": pa.array(bk.astype(np.int64))}
        )

    def roll(df):
        cols = {"event_id": "int64", "rolling_median": "float64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        med = (
            df.groupby("user_id", sort=False)["value"]
            .rolling(5, min_periods=1)
            .quantile(0.5, interpolation="lower")
            .reset_index(drop=True)
        )
        return pd.DataFrame(
            {"event_id": df["event_id"].to_numpy(),
             "rolling_median": med.to_numpy()}
        )

    return bucket_map_groups(
        ev.map_batches(tag, batch_format="pyarrow"), "bk", roll, P, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Hampel filter: rolling-window robust outlier flags — |x − med| >
# k·1.4826·MAD over the trailing 5-event window, the robust sibling of
# the z-score outlier screen.  Restricted to FULL (5-row, odd) windows
# so both engines' medians are exact element selections (DuckDB's
# windowed MEDIAN/MAD interpolate on even counts); the flag compares
# identical IEEE expressions on both sides.
# ---------------------------------------------------------------------------

_HAMPEL_K = 3.0

_HAMPEL_ORACLE = f"""
WITH w AS (SELECT event_id, value,
                  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                  MEDIAN(value) OVER win AS med,
                  MAD(value) OVER win AS mad
           FROM events
           WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
SELECT event_id, ROUND(med, 6) AS med, ROUND(mad, 6) AS mad,
       CASE WHEN ABS(value - med) > {_HAMPEL_K} * 1.4826 * mad
            THEN 1 ELSE 0 END AS is_outlier
FROM w WHERE rn >= 5
"""


@register("events_hampel_outliers", oracle=_HAMPEL_ORACLE)
def events_hampel_outliers(sf_dir: str):
    """Per-user trailing-5 Hampel outlier flags: one hash(user)
    exchange, then a fully vectorized sliding-window median/MAD per
    bucket (numpy sliding_window_view — no per-window Python).  A
    window is valid iff its 5 rows share one user, which after the
    (user, ts, event_id) sort is exactly u[i-4] == u[i]."""
    from numpy.lib.stride_tricks import sliding_window_view

    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    P = auto_buckets(ev.count())

    def tag(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        bk = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"event_id": t.column("event_id"), "user_id": t.column("user_id"),
             "ts": t.column("ts").cast(pa.int64()), "value": t.column("value"),
             "bk": pa.array(bk.astype(np.int64))}
        )

    def hampel(df):
        cols = {"event_id": "int64", "med": "float64", "mad": "float64",
                "is_outlier": "int64"}
        if len(df) < 5:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        v = df["value"].to_numpy(np.float64)
        u = df["user_id"].to_numpy(np.int64)
        W = sliding_window_view(v, 5)                      # (n-4, 5)
        med = np.median(W, axis=1)
        mad = np.median(np.abs(W - med[:, None]), axis=1)
        valid = u[4:] == u[:-4]                            # whole window one user
        x = v[4:]
        flag = (np.abs(x - med) > _HAMPEL_K * 1.4826 * mad).astype(np.int64)

        def rnd(a):
            return np.copysign(np.floor(np.abs(a) * 1e6 + 0.5), a) / 1e6

        return pd.DataFrame(
            {"event_id": df["event_id"].to_numpy()[4:][valid],
             "med": rnd(med[valid]), "mad": rnd(mad[valid]),
             "is_outlier": flag[valid]}
        )

    return bucket_map_groups(
        ev.map_batches(tag, batch_format="pyarrow"), "bk", hampel, P,
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# Weighted sampling WITHOUT replacement (Efraimidis-Spirakis, 2006):
# key = ln(u)/w with u a fixed md5-derived uniform — deterministic,
# so the oracle draws the identical sample.
# ---------------------------------------------------------------------------

_ES_K = 50

_ES_ORACLE = f"""
WITH w AS (SELECT doc_id,
                  CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
                       AS BIGINT) AS wgt,
                  (CAST('0x' || substr(md5('es-v1|' || CAST(doc_id AS VARCHAR)), 1, 13)
                        AS BIGINT) + 1.0) / 4503599627370497.0 AS u
           FROM documents),
k AS (SELECT doc_id, wgt, LN(u) / wgt AS key FROM w WHERE wgt > 0),
r AS (SELECT doc_id, wgt, key,
             ROW_NUMBER() OVER (ORDER BY key DESC, doc_id) AS rn
      FROM k)
SELECT doc_id, wgt AS weight, ROUND(key, 6) AS es_key
FROM r WHERE rn <= {_ES_K}
"""


@register("sample_weighted_without_replacement", oracle=_ES_ORACLE)
def sample_weighted_without_replacement(sf_dir: str):
    """Efraimidis-Spirakis weighted sampling without replacement:
    take the top-k docs by ln(u)/weight where u is a deterministic
    md5-uniform in (0, 1] (13 hex chars / 2^52) — the one-pass
    distributed reservoir scheme (each task keeps a local top-k, the
    tiny final merges them).  Weight = token count; the oracle draws
    the identical sample because the randomness is the hash."""
    import hashlib

    from document_ai_ray.pipelines.ops import topk

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        wgt = np.array(
            [len([w for w in (x or "").split(" ") if w]) for x in t.column("text").to_pylist()],
            np.int64,
        )
        u = np.array(
            [int(hashlib.md5(f"es-v1|{i}".encode()).hexdigest()[:13], 16) for i in ids],
            np.float64,
        )
        u = (u + 1.0) / 4503599627370497.0
        keep = wgt > 0
        key = np.log(u[keep]) / wgt[keep]
        k6 = np.copysign(np.floor(np.abs(key) * 1e6 + 0.5), key) / 1e6
        return pa.table(
            {"doc_id": pa.array(np.asarray(ids, np.int64)[keep]),
             "weight": pa.array(wgt[keep]),
             "es_key": pa.array(key, pa.float64()),
             "es_key6": pa.array(k6, pa.float64())}
        )

    top = topk(
        docs.map_batches(keyed, batch_format="pyarrow"),
        [("es_key", True), ("doc_id", False)],
        _ES_K,
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t.column("doc_id"), "weight": t.column("weight"),
             "es_key": t.column("es_key6")}
        )

    return top.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Rendezvous (highest-random-weight) sharding: each doc goes to the
# shard maximizing md5(shard|doc) — the consistent-assignment scheme
# whose reshuffle cost under shard add/remove is 1/N, not 1.
# ---------------------------------------------------------------------------

_HRW_SHARDS = 8

_HRW_ORACLE = f"""
WITH s AS (SELECT UNNEST(generate_series(0, {_HRW_SHARDS - 1})) AS shard),
h AS (SELECT d.doc_id, s.shard,
             md5('hrw-v1|' || CAST(s.shard AS VARCHAR) || '|' || CAST(d.doc_id AS VARCHAR))
               AS hx
      FROM documents d, s),
r AS (SELECT doc_id, shard, ROW_NUMBER() OVER (PARTITION BY doc_id
                                               ORDER BY hx DESC, shard) AS rn
      FROM h)
SELECT doc_id, shard FROM r WHERE rn = 1
"""


@register("rendezvous_shard_assignment", oracle=_HRW_ORACLE)
def rendezvous_shard_assignment(sf_dir: str):
    """Rendezvous / highest-random-weight hashing over {n} shards:
    per doc, argmax of md5('hrw-v1|shard|doc') — hex strings compare
    lexicographically = numerically (fixed width), so the oracle's
    ORDER BY replays the argmax exactly.  Stateless vectorized pass;
    this is how a 100 TB pipeline pins cache/actor affinity without a
    central directory.""".format(n=_HRW_SHARDS)
    import hashlib

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def assign(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        out = []
        for i in ids:
            best = max(
                range(_HRW_SHARDS),
                key=lambda s: (hashlib.md5(f"hrw-v1|{s}|{i}".encode()).hexdigest(), -s),
            )
            out.append(best)
        return pa.table(
            {"doc_id": t.column("doc_id"), "shard": pa.array(out, pa.int64())}
        )

    return docs.map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Linear-interpolation gap fill of the hourly mean-value series — the
# time-series-preparation sibling of the zero-fill date spine.  Hourly
# (cents, n) are exact ints; anchor means and the lerp are identical
# double expressions on both engines.
# ---------------------------------------------------------------------------

_LERP_ORACLE = """
WITH h AS (SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hour,
                  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
                  COUNT(*) AS n
           FROM events GROUP BY 1),
spine AS (SELECT UNNEST(generate_series((SELECT MIN(hour) FROM h),
                                        (SELECT MAX(hour) FROM h))) AS hour),
j AS (SELECT s.hour AS hour, h.cents, h.n,
             CASE WHEN h.n IS NOT NULL
                  THEN CAST(h.cents AS DOUBLE) / h.n / 100.0 END AS mv
      FROM spine s LEFT JOIN h ON h.hour = s.hour),
a AS (SELECT hour, mv,
             LAST_VALUE(CASE WHEN mv IS NOT NULL THEN hour END IGNORE NULLS)
               OVER (ORDER BY hour) AS h0,
             LAST_VALUE(mv IGNORE NULLS) OVER (ORDER BY hour) AS v0,
             FIRST_VALUE(CASE WHEN mv IS NOT NULL THEN hour END IGNORE NULLS)
               OVER (ORDER BY hour ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS h1,
             FIRST_VALUE(mv IGNORE NULLS)
               OVER (ORDER BY hour ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1
      FROM j)
SELECT hour, (mv IS NULL) AS interpolated,
       ROUND(CASE WHEN mv IS NOT NULL THEN mv
                  ELSE v0 + (v1 - v0) * (CAST(hour - h0 AS DOUBLE) / (h1 - h0)) END, 6)
         AS mean_value
FROM a
"""


@register("interpolate_hourly_values", oracle=_LERP_ORACLE)
def interpolate_hourly_values(sf_dir: str):
    """Dense hourly mean-event-value series with LINEAR interpolation
    across empty hours (anchored on the nearest observed hours either
    side; the corpus always has data at both spine ends).  Hour sums
    ride the combiner as integer cents; the lerp v0 + (v1-v0) *
    ((h-h0)/(h1-h0)) is the identical expression on both engines,
    evaluated on the calendar-bounded final."""
    from document_ai_ray.pipelines.ops import merge_partials

    ev = read_table(sf_dir, "events", columns=["ts", "value"])

    def hours(t: pa.Table) -> pa.Table:
        hr = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False) // (3600 * 10**6)
        cents = np.floor(t.column("value").to_numpy(zero_copy_only=False) * 100 + 0.5).astype(
            np.int64
        )
        g = (
            pa.table({"hour": pa.array(hr), "cents": pa.array(cents)})
            .group_by(["hour"])
            .aggregate([("cents", "sum"), ([], "count_all")])
        )
        return pa.Table.from_arrays(
            [g.column("hour"), g.column("cents_sum"), g.column("count_all")],
            names=["hour", "cents", "n"],
        )

    merged = merge_partials(
        ev.map_batches(hours, batch_format="pyarrow"), ["hour"], {"cents": "sum", "n": "sum"}
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("hour").reset_index(drop=True)
        lo, hi = int(df["hour"].min()), int(df["hour"].max())
        spine = np.arange(lo, hi + 1, dtype=np.int64)
        have = np.zeros(len(spine), bool)
        mv = np.full(len(spine), np.nan)
        idx = df["hour"].to_numpy() - lo
        have[idx] = True
        mv[idx] = (
            df["cents"].to_numpy(np.int64).astype(np.float64)
            / df["n"].to_numpy(np.int64)
            / 100.0
        )
        out = mv.copy()
        obs = np.flatnonzero(have)
        miss = np.flatnonzero(~have)
        if len(miss):
            left = obs[np.searchsorted(obs, miss, side="right") - 1]
            right = obs[np.searchsorted(obs, miss, side="left")]
            v0, v1 = mv[left], mv[right]
            out[miss] = v0 + (v1 - v0) * (
                (miss - left).astype(np.float64) / (right - left)
            )
        out6 = np.copysign(np.floor(np.abs(out) * 1e6 + 0.5), out) / 1e6
        return pa.table(
            {"hour": pa.array(spine), "interpolated": pa.array(~have),
             "mean_value": pa.array(out6, pa.float64())}
        )

    return merged.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Freedman-Diaconis histogram: bin width 2*IQR/n^(1/3) with EXACT
# discrete quantiles off the distributed rank substrate — the
# statistically-sized histogram (robust to the heavy tail, unlike
# fixed-k equi-width).
# ---------------------------------------------------------------------------

_FDHIST_ORACLE = """
WITH m AS (SELECT COUNT(*) AS n, MIN(value) AS vmin,
                  quantile_disc(value, 0.25) AS q25,
                  quantile_disc(value, 0.75) AS q75
           FROM events),
h AS (SELECT n, vmin, 2.0 * (q75 - q25) / POWER(CAST(n AS DOUBLE), 1.0 / 3.0) AS bw
      FROM m)
SELECT CAST(FLOOR((value - vmin) / bw) AS BIGINT) AS bin, COUNT(*) AS n_rows
FROM events, h GROUP BY 1
"""


@register("fd_histogram_values", oracle=_FDHIST_ORACLE)
def fd_histogram_values(sf_dir: str):
    """Freedman-Diaconis-binned histogram of event values: the IQR
    comes from EXACT discrete quantiles (DuckDB's quantile_disc index
    ceil(q*n)-1, selected by global rank on the distributed sort
    substrate — pure value selection, tie-order-free), the bin width
    2*IQR/cbrt(n) and the bin indexing are identical double
    expressions, and the counts ride the combiner."""
    from document_ai_ray.pipelines.ops import merge_partials, with_group_ranks

    ev = read_table(sf_dir, "events", columns=["event_id", "value"])
    n = ev.count()
    i25 = -(-25 * n // 100) - 1  # ceil(0.25*n) - 1, exact ints
    i75 = -(-75 * n // 100) - 1

    ranked = with_group_ranks(
        ev.map_batches(
            lambda t: pa.table(
                {"one": pa.array([1] * len(t), pa.int64()), "value": t.column("value")}
            ),
            batch_format="pyarrow",
        ),
        "one", ["value"],
    )
    qs = ranked.filter(expr=f"__rank == {i25} or __rank == {i75}").to_pandas()
    q25, q75 = float(qs["value"].min()), float(qs["value"].max())

    mm = merge_partials(
        ev.map_batches(
            lambda t: pa.table(
                {"one": pa.array([1], pa.int64()),
                 "vmin": pa.array([float(pc.min(t.column("value")).as_py())])}
            ),
            batch_format="pyarrow",
        ),
        ["one"], {"vmin": "min"},
    ).to_pandas()
    vmin = float(mm["vmin"].iloc[0])
    bw = 2.0 * (q75 - q25) / float(n) ** (1.0 / 3.0)

    def bins(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        b = np.floor((v - vmin) / bw).astype(np.int64)
        g = pa.table({"bin": pa.array(b)}).group_by(["bin"]).aggregate([([], "count_all")])
        return pa.Table.from_arrays([g.column("bin"), g.column("count_all")],
                                    names=["bin", "n_rows"])

    return merge_partials(
        ev.map_batches(bins, batch_format="pyarrow"), ["bin"], {"n_rows": "sum"}
    )


# ---------------------------------------------------------------------------
# Supplier return-rate league table — the fulfilment-quality census.
# ---------------------------------------------------------------------------

_SUPRET_ORACLE = """
SELECT l_suppkey AS suppkey, COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
       ROUND(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS return_rate
FROM lineitem GROUP BY 1
"""


@register("supplier_return_rate", oracle=_SUPRET_ORACLE)
def supplier_return_rate(sf_dir: str):
    """Per-supplier return rate over lineitem: integer (lines,
    returned) partials ride the combiner keyed on the supplier
    catalog (bounded), one division per supplier in the final."""
    from document_ai_ray.pipelines.ops import partial_group_agg

    li = read_table(sf_dir, "lineitem", columns=["l_suppkey", "l_returnflag"])

    def flags(t: pa.Table) -> pa.Table:
        r = pc.cast(pc.equal(t.column("l_returnflag"), "R"), pa.int64())
        return pa.table({"suppkey": t.column("l_suppkey"), "ret": r})

    agg = partial_group_agg(
        li.map_batches(flags, batch_format="pyarrow"), ["suppkey"],
        {"ret": "n_returned"}, count_alias="n_lines",
    )

    def finish(t: pa.Table) -> pa.Table:
        nr = t.column("n_returned").to_numpy(zero_copy_only=False).astype(np.float64)
        nl = t.column("n_lines").to_numpy(zero_copy_only=False).astype(np.float64)
        rate = np.floor(nr / nl * 1e6 + 0.5) / 1e6
        return pa.table(
            {"suppkey": t.column("suppkey"), "n_lines": t.column("n_lines"),
             "n_returned": t.column("n_returned"),
             "return_rate": pa.array(rate, pa.float64())}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Rolling 24 h Pearson correlation between the click and view hourly
# count series — the co-movement monitor.  Window moments are EXACT
# integer prefix sums; each window's r is the identical closed form on
# both engines (zero-variance windows excluded on both sides).
# ---------------------------------------------------------------------------

_ROLLCORR_ORACLE = """
WITH h AS (SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hour,
                  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
                  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS y
           FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
spine AS (SELECT UNNEST(generate_series((SELECT MIN(hour) FROM h),
                                        (SELECT MAX(hour) FROM h))) AS hour),
d AS (SELECT s.hour AS hour, COALESCE(h.x, 0) AS x, COALESCE(h.y, 0) AS y
      FROM spine s LEFT JOIN h ON h.hour = s.hour),
w AS (SELECT hour,
             CAST(COUNT(*) OVER win AS BIGINT) AS n,
             CAST(SUM(x) OVER win AS BIGINT) AS sx,
             CAST(SUM(y) OVER win AS BIGINT) AS sy,
             CAST(SUM(x * x) OVER win AS BIGINT) AS sxx,
             CAST(SUM(y * y) OVER win AS BIGINT) AS syy,
             CAST(SUM(x * y) OVER win AS BIGINT) AS sxy
      FROM d WINDOW win AS (ORDER BY hour ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
f AS (SELECT hour, n,
             n * sxx - sx * sx AS vx, n * syy - sy * sy AS vy,
             n * sxy - sx * sy AS cxy
      FROM w WHERE n = 24)
SELECT hour,
       ROUND(CAST(cxy AS DOUBLE) / (SQRT(CAST(vx AS DOUBLE)) * SQRT(CAST(vy AS DOUBLE))), 6)
         AS rolling_r
FROM f WHERE vx > 0 AND vy > 0
"""


@register("rolling_corr_click_view", oracle=_ROLLCORR_ORACLE)
def rolling_corr_click_view(sf_dir: str):
    """Trailing-24 h Pearson r between hourly click and view counts:
    hourly pair counts ride the combiner; the dense spine, integer
    prefix-sum window moments and the per-window closed form run on
    the calendar-bounded final.  Only full 24 h windows with variance
    on both sides are reported."""
    from document_ai_ray.pipelines.ops import merge_partials

    ev = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def hours(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        keep = pc.is_in(et, value_set=pa.array(["click", "view"]))
        t = t.filter(keep)
        hr = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False) // (3600 * 10**6)
        x = pc.cast(pc.equal(t.column("event_type"), "click"), pa.int64())
        y = pc.cast(pc.equal(t.column("event_type"), "view"), pa.int64())
        g = (
            pa.table({"hour": pa.array(hr), "x": x, "y": y})
            .group_by(["hour"])
            .aggregate([("x", "sum"), ("y", "sum")])
        )
        return pa.Table.from_arrays(
            [g.column("hour"), g.column("x_sum"), g.column("y_sum")],
            names=["hour", "x", "y"],
        )

    merged = merge_partials(
        ev.map_batches(hours, batch_format="pyarrow"), ["hour"], {"x": "sum", "y": "sum"}
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("hour")
        lo, hi = int(df["hour"].min()), int(df["hour"].max())
        n_h = hi - lo + 1
        x = np.zeros(n_h, np.int64)
        y = np.zeros(n_h, np.int64)
        idx = df["hour"].to_numpy() - lo
        x[idx] = df["x"].to_numpy()
        y[idx] = df["y"].to_numpy()

        def win_sum(a):
            c = np.concatenate([[0], np.cumsum(a)])
            return c[24:] - c[:-24]  # trailing-24 sums for hours lo+23..hi

        sx, sy = win_sum(x), win_sum(y)
        sxx, syy, sxy = win_sum(x * x), win_sum(y * y), win_sum(x * y)
        n = 24
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        cxy = n * sxy - sx * sy
        hours_out = np.arange(lo + 23, hi + 1, dtype=np.int64)
        keep = (vx > 0) & (vy > 0)
        r = cxy[keep].astype(np.float64) / (
            np.sqrt(vx[keep].astype(np.float64)) * np.sqrt(vy[keep].astype(np.float64))
        )
        r = np.copysign(np.floor(np.abs(r) * 1e6 + 0.5), r) / 1e6
        return pa.table(
            {"hour": pa.array(hours_out[keep]), "rolling_r": pa.array(r, pa.float64())}
        )

    return merged.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Daily composition drift: total-variation distance between each day's
# event-type mix and the global mix — all-integer cross-multiplied
# numerators, one division per day.
# ---------------------------------------------------------------------------

_TVD_ORACLE = """
WITH e AS (SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day, event_type AS t
           FROM events),
dt AS (SELECT day, t, COUNT(*) AS n FROM e GROUP BY 1, 2),
tt AS (SELECT t, CAST(SUM(n) AS BIGINT) AS nt FROM dt GROUP BY 1),
dd AS (SELECT day, CAST(SUM(n) AS BIGINT) AS nd FROM dt GROUP BY 1),
nn AS (SELECT CAST(SUM(nt) AS BIGINT) AS n FROM tt),
x AS (SELECT dd.day, tt.t, COALESCE(dt.n, 0) AS ndt, tt.nt, dd.nd, nn.n
      FROM dd CROSS JOIN tt CROSS JOIN nn
      LEFT JOIN dt ON dt.day = dd.day AND dt.t = tt.t)
SELECT day, ANY_VALUE(nd) AS n_events,
       ROUND(CAST(SUM(ABS(ndt * n - nt * nd)) AS DOUBLE)
             / (2.0 * ANY_VALUE(nd) * ANY_VALUE(n)), 6) AS tvd
FROM x GROUP BY day
"""


@register("events_type_share_shift", oracle=_TVD_ORACLE)
def events_type_share_shift(sf_dir: str):
    """Per-day total-variation distance between the day's event-type
    mix and the corpus mix (the composition-drift monitor next to the
    PSI value-drift one): (day, type) counts ride the combiner; the
    TVD numerator is an exact integer (|n_dt*N - n_t*N_d| summed over
    the dense type set) so only one double division per day remains."""
    from document_ai_ray.pipelines.ops import merge_partials

    ev = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def counts(t: pa.Table) -> pa.Table:
        day = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False) // (86400 * 10**6)
        g = (
            pa.table({"day": pa.array(day), "t": t.column("event_type")})
            .group_by(["day", "t"])
            .aggregate([([], "count_all")])
        )
        return pa.Table.from_arrays(
            [g.column("day"), g.column("t"), g.column("count_all")], names=["day", "t", "n"]
        )

    merged = merge_partials(ev.map_batches(counts, batch_format="pyarrow"), ["day", "t"], {"n": "sum"})

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        types = sorted(df["t"].unique())
        nt = df.groupby("t")["n"].sum()
        nd = df.groupby("day")["n"].sum()
        N = int(df["n"].sum())
        piv = df.pivot_table(index="day", columns="t", values="n", fill_value=0)
        piv = piv.reindex(columns=types, fill_value=0).sort_index()
        ndt = piv.to_numpy(np.int64)
        ntv = nt.reindex(types).to_numpy(np.int64)
        ndv = nd.reindex(piv.index).to_numpy(np.int64)
        num = np.abs(ndt * N - ntv[None, :] * ndv[:, None]).sum(axis=1)
        tvd = num.astype(np.float64) / (2.0 * ndv * N)
        tvd = np.floor(tvd * 1e6 + 0.5) / 1e6
        return pa.table(
            {"day": pa.array(piv.index.to_numpy(np.int64)),
             "n_events": pa.array(ndv),
             "tvd": pa.array(tvd, pa.float64())}
        )

    return merged.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Per-customer median inter-order gap: the purchase-cadence metric —
# lower-median (discrete selection) over day gaps, so no float
# arithmetic at all.
# ---------------------------------------------------------------------------

_ORDGAP_ORACLE = """
WITH o AS (SELECT o_custkey AS ck,
                  CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS day FROM orders),
g AS (SELECT ck, day - LAG(day) OVER (PARTITION BY ck ORDER BY day) AS gap FROM o),
f AS (SELECT ck, gap FROM g WHERE gap IS NOT NULL)
SELECT ck AS custkey, COUNT(*) AS n_gaps,
       QUANTILE_DISC(gap, 0.5) AS median_gap_days
FROM f GROUP BY 1
"""


@register("orders_median_gap_days", oracle=_ORDGAP_ORACLE)
def orders_median_gap_days(sf_dir: str):
    """Median days between consecutive orders per customer (ties in
    order date collapse to zero-day gaps — kept, like the oracle's
    LAG over the same day sort): one hash(custkey) exchange, per-bucket
    vectorized diffs and DISCRETE lower-median selection (DuckDB's
    quantile_disc index ceil(q*n)-1)."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    P = auto_buckets(orders.count())

    def tag(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        day = t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False) // (
            86400 * 10**6
        )
        bk = (ck.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        return pa.table(
            {"ck": pa.array(ck), "day": pa.array(day), "bk": pa.array(bk.astype(np.int64))}
        )

    def med(df):
        cols = {"custkey": "int64", "n_gaps": "int64", "median_gap_days": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = df.sort_values(["ck", "day"], kind="mergesort")
        gaps = df.groupby("ck")["day"].diff().dropna()
        if len(gaps) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        out = {"custkey": [], "n_gaps": [], "median_gap_days": []}
        for ck, g in gaps.astype("int64").groupby(df.loc[gaps.index, "ck"]):
            v = np.sort(g.to_numpy())
            n = len(v)
            out["custkey"].append(int(ck))
            out["n_gaps"].append(n)
            out["median_gap_days"].append(int(v[-(-n // 2) - 1]))  # ceil(n/2)-1
        return pd.DataFrame(out)

    return bucket_map_groups(
        orders.map_batches(tag, batch_format="pyarrow"), "bk", med, P, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Grouped argmax: each event type's peak hour-of-day (ties to the
# earliest hour) — all-integer counts, deterministic selection.
# ---------------------------------------------------------------------------

_PEAK_ORACLE = """
WITH h AS (SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 % 24 AS hour,
                  COUNT(*) AS n
           FROM events GROUP BY 1, 2),
r AS (SELECT event_type, hour, n,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, hour) AS rn
      FROM h)
SELECT event_type, hour AS peak_hour, n AS peak_count FROM r WHERE rn = 1
"""


@register("events_peak_hour_by_type", oracle=_PEAK_ORACLE)
def events_peak_hour_by_type(sf_dir: str):
    """Per-type peak hour of day (grouped integer argmax, earliest
    hour on ties): (type, hour) counts ride the combiner; the argmax
    runs on the 5x24 final."""
    from document_ai_ray.pipelines.ops import merge_partials

    ev = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def counts(t: pa.Table) -> pa.Table:
        hr = (
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False) // (3600 * 10**6)
        ) % 24
        g = (
            pa.table({"event_type": t.column("event_type"), "hour": pa.array(hr)})
            .group_by(["event_type", "hour"])
            .aggregate([([], "count_all")])
        )
        return pa.Table.from_arrays(
            [g.column("event_type"), g.column("hour"), g.column("count_all")],
            names=["event_type", "hour", "n"],
        )

    merged = merge_partials(
        ev.map_batches(counts, batch_format="pyarrow"), ["event_type", "hour"], {"n": "sum"}
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["n", "hour"], ascending=[False, True], kind="mergesort")
        top = df.groupby("event_type", as_index=False).head(1)
        return pa.table(
            {"event_type": pa.array(top["event_type"], pa.string()),
             "peak_hour": pa.array(top["hour"].to_numpy(np.int64)),
             "peak_count": pa.array(top["n"].to_numpy(np.int64))}
        )

    return merged.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Pearson correlation between token count and character count across
# documents — EXACT integer moments (both variables integers), unlike
# the float-moment corr_price_qty.
# ---------------------------------------------------------------------------

_WCCORR_ORACLE = """
WITH d AS (SELECT CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
                       AS BIGINT) AS w,
                  CAST(len(text) AS BIGINT) AS c
           FROM documents),
m AS (SELECT COUNT(*) AS n, CAST(SUM(w) AS BIGINT) AS sw, CAST(SUM(c) AS BIGINT) AS sc,
             CAST(SUM(w * w) AS BIGINT) AS sww, CAST(SUM(c * c) AS BIGINT) AS scc,
             CAST(SUM(w * c) AS BIGINT) AS swc
      FROM d)
SELECT CAST(n AS BIGINT) AS n_docs,
       ROUND(CAST(n * swc - sw * sc AS DOUBLE)
             / (SQRT(CAST(n * sww - sw * sw AS DOUBLE))
                * SQRT(CAST(n * scc - sc * sc AS DOUBLE))), 6) AS words_chars_r
FROM m
"""


@register("words_chars_corr", oracle=_WCCORR_ORACLE)
def words_chars_corr(sf_dir: str):
    """Pearson r between per-doc token and character counts: both
    variables are integers, so every shuffled moment partial is exact
    and the one closed-form expression runs identically on both
    engines (the length-sanity check of a text-stats suite)."""
    from document_ai_ray.pipelines.ops import merge_partials

    docs = read_table(sf_dir, "documents", columns=["text"])

    def moments(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(t.column("text"), " ")
        flat = pc.list_flatten(lists)
        nonempty = pc.not_equal(flat, "")
        # per-row non-empty token counts, vectorized
        n_per = pc.list_value_length(lists).fill_null(0).to_numpy(zero_copy_only=False)
        row_idx = np.repeat(np.arange(len(t), dtype=np.int64), n_per)
        ne = nonempty.to_numpy(zero_copy_only=False)
        w = np.bincount(row_idx[ne], minlength=len(t)).astype(np.int64)
        c = pc.utf8_length(t.column("text")).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"one": pa.array([1], pa.int64()),
             "n": pa.array([len(t)], pa.int64()),
             "sw": pa.array([int(w.sum())], pa.int64()),
             "sc": pa.array([int(c.sum())], pa.int64()),
             "sww": pa.array([int((w * w).sum())], pa.int64()),
             "scc": pa.array([int((c * c).sum())], pa.int64()),
             "swc": pa.array([int((w * c).sum())], pa.int64())}
        )

    merged = merge_partials(
        docs.map_batches(moments, batch_format="pyarrow"), ["one"],
        {"n": "sum", "sw": "sum", "sc": "sum", "sww": "sum", "scc": "sum", "swc": "sum"},
    )

    def finish(t: pa.Table) -> pa.Table:
        n = int(t.column("n")[0].as_py())
        sw, sc = int(t.column("sw")[0].as_py()), int(t.column("sc")[0].as_py())
        sww, scc = int(t.column("sww")[0].as_py()), int(t.column("scc")[0].as_py())
        swc = int(t.column("swc")[0].as_py())
        r = float(n * swc - sw * sc) / (
            np.sqrt(float(n * sww - sw * sw)) * np.sqrt(float(n * scc - sc * sc))
        )
        r = float(np.copysign(np.floor(abs(r) * 1e6 + 0.5), r) / 1e6)
        return pa.table(
            {"n_docs": pa.array([n], pa.int64()),
             "words_chars_r": pa.array([r], pa.float64())}
        )

    return merged.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Realized-vs-retail price ratio per brand: how much of list price the
# brand actually captures after negotiated discounts — two exact
# integer cent masses per brand, one division.
# ---------------------------------------------------------------------------

_BRANDPRICE_ORACLE = """
WITH j AS (SELECT p.p_brand AS brand,
                  CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS ext_cents,
                  CAST(FLOOR(p.p_retailprice * 100 + 0.5) AS BIGINT)
                    * CAST(l.l_quantity AS BIGINT) AS retail_cents
           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey)
SELECT brand, COUNT(*) AS n_lines,
       CAST(SUM(ext_cents) AS BIGINT) AS realized_cents,
       CAST(SUM(retail_cents) AS BIGINT) AS retail_cents,
       ROUND(CAST(SUM(ext_cents) AS DOUBLE) / CAST(SUM(retail_cents) AS DOUBLE), 6)
         AS realized_ratio
FROM j GROUP BY 1
"""


@register("brand_realized_price_ratio", oracle=_BRANDPRICE_ORACLE)
def brand_realized_price_ratio(sf_dir: str):
    """Per-brand realized/list price capture: lineitem resolves its
    part through the catalog-sized broadcast map (brand + retail
    cents), both cent masses ride the combiner as exact ints, one
    division per brand in the final."""
    import ray

    from document_ai_ray.pipelines.ops import get_broadcast, partial_group_agg

    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand", "p_retailprice"]).to_pandas()
    pmap = {
        int(k): (b, int(np.floor(rp * 100 + 0.5)))
        for k, b, rp in zip(part["p_partkey"], part["p_brand"], part["p_retailprice"])
    }
    pref = (ray.put(pmap),)

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def to_brand(t: pa.Table) -> pa.Table:
        m = get_broadcast(pref, tag="brand_retail")
        pk = t.column("l_partkey").to_pylist()
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.int64)
        ext = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        brands = []
        retail = np.empty(len(pk), np.int64)
        for i, k in enumerate(pk):
            b, rc = m[k]
            brands.append(b)
            retail[i] = rc
        return pa.table(
            {"brand": pa.array(brands, pa.string()),
             "ext_cents": pa.array(ext),
             "retail_cents": pa.array(retail * qty)}
        )

    agg = partial_group_agg(
        li.map_batches(to_brand, batch_format="pyarrow"), ["brand"],
        {"ext_cents": "realized_cents", "retail_cents": "retail_cents"},
        count_alias="n_lines",
    )

    def finish(t: pa.Table) -> pa.Table:
        rc = t.column("realized_cents").to_numpy(zero_copy_only=False).astype(np.float64)
        tc = t.column("retail_cents").to_numpy(zero_copy_only=False).astype(np.float64)
        ratio = np.floor(rc / tc * 1e6 + 0.5) / 1e6
        return pa.table(
            {"brand": t.column("brand"), "n_lines": t.column("n_lines"),
             "realized_cents": t.column("realized_cents"),
             "retail_cents": t.column("retail_cents"),
             "realized_ratio": pa.array(ratio, pa.float64())}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Two reporting staples on exact integer masses: order-priority mix
# per year, and the discount -> quantity effect curve.
# ---------------------------------------------------------------------------

_PRIOSHARE_ORACLE = """
WITH y AS (SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS year,
                  o_orderpriority AS priority
           FROM orders),
c AS (SELECT year, priority, COUNT(*) AS n FROM y GROUP BY 1, 2),
t AS (SELECT year, CAST(SUM(n) AS BIGINT) AS ny FROM c GROUP BY 1)
SELECT c.year, c.priority, c.n,
       ROUND(CAST(c.n AS DOUBLE) / CAST(t.ny AS DOUBLE), 6) AS share
FROM c JOIN t ON t.year = c.year
"""


@register("priority_share_by_year", oracle=_PRIOSHARE_ORACLE)
def priority_share_by_year(sf_dir: str):
    """Order-priority mix per calendar year (the composition-over-time
    report): (year, priority) counts ride the combiner; shares are one
    division per cell in the (years x 5) final."""
    from document_ai_ray.pipelines.ops import merge_partials

    orders = read_table(sf_dir, "orders", columns=["o_orderdate", "o_orderpriority"])

    def counts(t: pa.Table) -> pa.Table:
        ts = t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        year = 1970 + ts.astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64)
        g = (
            pa.table({"year": pa.array(year), "priority": t.column("o_orderpriority")})
            .group_by(["year", "priority"])
            .aggregate([([], "count_all")])
        )
        return pa.Table.from_arrays(
            [g.column("year"), g.column("priority"), g.column("count_all")],
            names=["year", "priority", "n"],
        )

    merged = merge_partials(
        orders.map_batches(counts, batch_format="pyarrow"), ["year", "priority"], {"n": "sum"}
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ny = df.groupby("year")["n"].transform("sum").to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        share = np.floor(n.astype(np.float64) / ny.astype(np.float64) * 1e6 + 0.5) / 1e6
        return pa.table(
            {"year": pa.array(df["year"].to_numpy(np.int64)),
             "priority": pa.array(df["priority"], pa.string()),
             "n": pa.array(n), "share": pa.array(share, pa.float64())}
        )

    return merged.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


_DISCEFFECT_ORACLE = """
WITH d AS (SELECT CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS discount_cents,
                  CAST(l_quantity AS BIGINT) AS qty
           FROM lineitem)
SELECT discount_cents, COUNT(*) AS n_lines,
       CAST(SUM(qty) AS BIGINT) AS total_qty,
       ROUND(CAST(SUM(qty) AS DOUBLE) / COUNT(*), 6) AS avg_qty
FROM d GROUP BY 1
"""


@register("discount_quantity_effect", oracle=_DISCEFFECT_ORACLE)
def discount_quantity_effect(sf_dir: str):
    """Average line quantity per discount level (the promo-effect
    curve): discounts quantize to exact integer cents (11 buckets),
    quantity sums are exact ints, one division per bucket."""
    from document_ai_ray.pipelines.ops import merge_partials

    li = read_table(sf_dir, "lineitem", columns=["l_discount", "l_quantity"])

    def buckets(t: pa.Table) -> pa.Table:
        dc = np.floor(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pa.table({"discount_cents": pa.array(dc), "qty": pa.array(qty)})
            .group_by(["discount_cents"])
            .aggregate([("qty", "sum"), ([], "count_all")])
        )
        return pa.Table.from_arrays(
            [g.column("discount_cents"), g.column("qty_sum"), g.column("count_all")],
            names=["discount_cents", "total_qty", "n_lines"],
        )

    merged = merge_partials(
        li.map_batches(buckets, batch_format="pyarrow"), ["discount_cents"],
        {"total_qty": "sum", "n_lines": "sum"},
    )

    def finish(t: pa.Table) -> pa.Table:
        tq = t.column("total_qty").to_numpy(zero_copy_only=False).astype(np.float64)
        nl = t.column("n_lines").to_numpy(zero_copy_only=False).astype(np.float64)
        avg = np.floor(tq / nl * 1e6 + 0.5) / 1e6
        return pa.table(
            {"discount_cents": t.column("discount_cents"),
             "n_lines": t.column("n_lines"), "total_qty": t.column("total_qty"),
             "avg_qty": pa.array(avg, pa.float64())}
        )

    return merged.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Cross-correlation of the hourly click/view count series at lags -3..+3
# (the lead-lag diagnostic behind "do clicks anticipate views?").  All
# Pearson moments are integer sums over the gap-filled hour spine, so
# the only floats are one division and one sqrt — bit-identical on both
# engines.
# ---------------------------------------------------------------------------

_XCORR_ORACLE = """
WITH ev AS (SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h, event_type
            FROM events WHERE event_type IN ('click', 'view')),
spine AS (SELECT UNNEST(generate_series((SELECT MIN(h) FROM ev),
                                        (SELECT MAX(h) FROM ev))) AS h),
cx AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n FROM ev WHERE event_type = 'click' GROUP BY 1),
cy AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n FROM ev WHERE event_type = 'view' GROUP BY 1),
s AS (SELECT spine.h, COALESCE(cx.n, 0) AS x, COALESCE(cy.n, 0) AS y
      FROM spine LEFT JOIN cx ON spine.h = cx.h LEFT JOIN cy ON spine.h = cy.h),
lags AS (SELECT UNNEST(generate_series(-3, 3)) AS lag),
p AS (SELECT l.lag, a.x, b2.y
      FROM lags l JOIN s a ON TRUE JOIN s b2 ON b2.h = a.h + l.lag),
m AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM p GROUP BY 1)
SELECT lag, n AS n_pairs, sx AS sum_x, sy AS sum_y, sxy AS sum_xy,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                       / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE)), 6)
            ELSE 0.0 END AS r
FROM m
"""


@register("events_crosscorr_lags", oracle=_XCORR_ORACLE)
def events_crosscorr_lags(sf_dir: str):
    """Hourly click-vs-view cross-correlation at lags -3..+3 h.  The
    per-(hour, type) census rides the combiner exchange (the spine is
    hours-sized, never events-sized); the seven lag correlations are
    driver-side integer-moment arithmetic over that tiny series."""
    import math

    import numpy as np
    import pyarrow.compute as pc_

    ev = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def hour_col(t: pa.Table) -> pa.Table:
        keep = pc_.is_in(t.column("event_type"), value_set=pa.array(["click", "view"]))
        t = t.filter(keep)
        micros = pc_.cast(t.column("ts"), pa.int64())
        h = pc_.floor(pc_.divide(micros, 3600000000))
        return pa.table({"h": pc_.cast(h, pa.int64()), "event_type": t.column("event_type")})

    counts = partial_group_agg(
        ev.map_batches(hour_col, batch_format="pyarrow"), ["h", "event_type"], count_alias="n"
    ).take_all()  # hours-sized: <= 2 * corpus-span-in-hours rows
    if not counts:
        return pa.table({"lag": pa.array([], pa.int64()), "n_pairs": pa.array([], pa.int64()),
                         "sum_x": pa.array([], pa.int64()), "sum_y": pa.array([], pa.int64()),
                         "sum_xy": pa.array([], pa.int64()), "r": pa.array([], pa.float64())})
    h0 = min(r["h"] for r in counts)
    h1 = max(r["h"] for r in counts)
    n = int(h1 - h0 + 1)
    x = np.zeros(n, np.int64)
    y = np.zeros(n, np.int64)
    for r in counts:
        if r["event_type"] == "click":
            x[r["h"] - h0] = r["n"]
        else:
            y[r["h"] - h0] = r["n"]
    out = {"lag": [], "n_pairs": [], "sum_x": [], "sum_y": [], "sum_xy": [], "r": []}
    for lag in range(-3, 4):
        if lag >= 0:
            xs, ys = x[: n - lag], y[lag:]
        else:
            xs, ys = x[-lag:], y[: n + lag]
        np_ = len(xs)
        sx, sy = int(xs.sum()), int(ys.sum())
        sxy = int((xs * ys).sum())
        sxx = int((xs * xs).sum())
        syy = int((ys * ys).sum())
        vx, vy = np_ * sxx - sx * sx, np_ * syy - sy * sy
        if vx > 0 and vy > 0:
            r_ = float(np_ * sxy - sx * sy) / math.sqrt(float(vx) * float(vy))
            r_ = float(np.floor(abs(r_) * 1e6 + 0.5) * (1 if r_ >= 0 else -1) / 1e6)
        else:
            r_ = 0.0
        out["lag"].append(lag)
        out["n_pairs"].append(np_)
        out["sum_x"].append(sx)
        out["sum_y"].append(sy)
        out["sum_xy"].append(sxy)
        out["r"].append(r_)
    return pa.table(
        {"lag": pa.array(out["lag"], pa.int64()),
         "n_pairs": pa.array(out["n_pairs"], pa.int64()),
         "sum_x": pa.array(out["sum_x"], pa.int64()),
         "sum_y": pa.array(out["sum_y"], pa.int64()),
         "sum_xy": pa.array(out["sum_xy"], pa.int64()),
         "r": pa.array(out["r"], pa.float64())}
    )


# ---------------------------------------------------------------------------
# Per-state conditional entropy of the first-order clickstream Markov
# chain (micro-nat integer arithmetic: H_s = sum_t n_st*(L(n_s)-L(n_st))
# with L(x) = floor(1e6*ln(x)) — exact integers on both engines).
# ---------------------------------------------------------------------------

_MARKOV_ENTROPY_ORACLE = """
WITH s AS (SELECT user_id, event_type,
                  LEAD(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS next_type
           FROM events),
c AS (SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_out FROM c GROUP BY 1),
lterm AS (SELECT c.event_type, c.n, t.n_out,
                 CAST(FLOOR(1000000 * LN(CAST(t.n_out AS DOUBLE))) AS BIGINT)
               - CAST(FLOOR(1000000 * LN(CAST(c.n AS DOUBLE))) AS BIGINT) AS dl
          FROM c JOIN tot t USING (event_type))
SELECT event_type, MAX(n_out) AS n_out,
       CAST(SUM(n * dl) AS BIGINT) AS h_micro_num,
       ROUND(CAST(SUM(n * dl) AS DOUBLE) / (MAX(n_out) * 1000000.0), 6) AS h_cond_nats
FROM lterm GROUP BY 1
"""


@register("markov_entropy_per_state", oracle=_MARKOV_ENTROPY_ORACLE)
def markov_entropy_per_state(sf_dir: str):
    """Conditional next-event entropy per state over the Markov
    transition counts (how predictable is the next event after a
    click?).  Rides the `event_transitions_markov` distributed
    substrate; the entropy algebra runs on its 25-row output in
    integer micro-nats (floor-of-ln terms, exact on both engines)."""
    import math

    import numpy as np

    rows = event_transitions_markov(sf_dir).take_all()  # |types|^2 rows
    n_out: dict[str, int] = {}
    for r in rows:
        n_out[r["event_type"]] = n_out.get(r["event_type"], 0) + int(r["n"])
    L = lambda v: math.floor(1e6 * math.log(v))  # noqa: E731
    h_num: dict[str, int] = {s: 0 for s in n_out}
    for r in rows:
        s = r["event_type"]
        h_num[s] += int(r["n"]) * (L(n_out[s]) - L(int(r["n"])))
    states = sorted(n_out)
    return pa.table(
        {"event_type": pa.array(states, pa.string()),
         "n_out": pa.array([n_out[s] for s in states], pa.int64()),
         "h_micro_num": pa.array([h_num[s] for s in states], pa.int64()),
         "h_cond_nats": pa.array(
             [float(np.floor(h_num[s] / (n_out[s] * 1e6) * 1e6 + 0.5) / 1e6) for s in states],
             pa.float64())}
    )


# ---------------------------------------------------------------------------
# Neyman (optimal) stratified-sample allocation: a 1000-doc labeling
# budget split across language strata proportional to N_h * sigma_h of
# document length.  The stratum weight is the INTEGER
# floor(sqrt(n*sum(x^2) - sum(x)^2)) (= N_h*sigma_h up to the exact
# integer moments), and seats go by the same all-integer
# largest-remainder method as crawl_budget_alloc — no float-order risk
# anywhere (sqrt is IEEE-correctly-rounded on both engines).
# ---------------------------------------------------------------------------

_NEYMAN_B = 1000

_NEYMAN_ORACLE = """
WITH s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(LENGTH(text)) AS BIGINT) AS sx,
                  CAST(SUM(CAST(LENGTH(text) AS BIGINT) * LENGTH(text)) AS BIGINT) AS sxx
           FROM documents GROUP BY 1),
w AS (SELECT lang, n,
             CAST(FLOOR(SQRT(CAST(n * sxx - sx * sx AS DOUBLE))) AS BIGINT) AS m
      FROM s),
tot AS (SELECT CAST(SUM(m) AS BIGINT) AS sm FROM w),
fl AS (SELECT lang, n, m, (1000 * m) // tot.sm AS fl, (1000 * m) % tot.sm AS rem
       FROM w, tot),
lo AS (SELECT CAST(1000 - SUM(fl) AS BIGINT) AS k FROM fl),
rk AS (SELECT lang, n, m, fl, ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS r FROM fl)
SELECT lang, n AS n_docs, m AS weight,
       CAST(fl + CASE WHEN r <= lo.k THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM rk, lo
"""


@register("neyman_allocation_sample", oracle=_NEYMAN_ORACLE)
def neyman_allocation_sample(sf_dir: str):
    """Neyman-optimal stratified sampling quotas per language (budget
    1000, weight = N_h*sigma_h of char length).  The char-length
    moments ride the combiner exchange as exact int64 sums; the
    5-stratum largest-remainder apportionment is driver-side integer
    arithmetic."""
    import math

    import numpy as np
    import pyarrow.compute as pc_

    docs = read_table(sf_dir, "documents", columns=["lang", "text"])

    def moments(t: pa.Table) -> pa.Table:
        x = pc_.utf8_length(t.column("text")).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"lang": t.column("lang"), "x": pa.array(x), "xx": pa.array(x * x)})

    agg = partial_group_agg(
        docs.map_batches(moments, batch_format="pyarrow"),
        ["lang"], {"x": "sx", "xx": "sxx"}, count_alias="n",
    ).take_all()  # strata-sized
    langs = sorted(r["lang"] for r in agg)
    by = {r["lang"]: r for r in agg}
    m = {}
    for lg in langs:
        r = by[lg]
        m[lg] = math.floor(math.sqrt(float(r["n"] * r["sxx"] - r["sx"] * r["sx"])))
    sm = sum(m.values())
    fl = {lg: (_NEYMAN_B * m[lg]) // sm for lg in langs}
    rem = {lg: (_NEYMAN_B * m[lg]) % sm for lg in langs}
    leftover = _NEYMAN_B - sum(fl.values())
    order = sorted(langs, key=lambda lg: (-rem[lg], lg))
    quota = dict(fl)
    for lg in order[:leftover]:
        quota[lg] += 1
    return pa.table(
        {"lang": pa.array(langs, pa.string()),
         "n_docs": pa.array([by[lg]["n"] for lg in langs], pa.int64()),
         "weight": pa.array([m[lg] for lg in langs], pa.int64()),
         "quota": pa.array([quota[lg] for lg in langs], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Time-decay multi-touch attribution: every same-user event in the 7
# days before a purchase earns credit = purchase_cents * 2^-floor(days)
# — computed in EXACT integer 1/64-cent units (the 7-day window keeps
# the day gap in 0..6, so the decay is a right-shift, never a float).
# ---------------------------------------------------------------------------

_TDECAY_ORACLE = """
WITH p AS (SELECT event_id, user_id, ts,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT e.event_type,
             p.cents * (64 >> CAST((epoch_us(p.ts) - epoch_us(e.ts)) // 86400000000 AS INTEGER))
               AS units
      FROM p JOIN events e ON e.user_id = p.user_id
         AND e.ts > p.ts - INTERVAL 7 DAY AND e.ts < p.ts)
SELECT event_type AS touch_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(units) AS BIGINT) AS credit_units,
       ROUND(CAST(SUM(units) AS DOUBLE) / 64.0, 2) AS credit_cents
FROM c GROUP BY 1
"""


@register("attribution_time_decay", oracle=_TDECAY_ORACLE)
def attribution_time_decay(sf_dir: str):
    """Time-decay multi-touch attribution over the same 7-day windows
    as `attribution_first_touch`: each prior same-user touch earns the
    purchase's cent value decayed by 2^-days — integer 1/64-cent units
    end to end (the window bounds the shift to 0..6), merged with the
    combiner exchange.  STRICT window open end: a touch exactly 7 days
    old would need a fractional unit and is excluded by construction
    on both sides."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, merge_partials
    from document_ai_ray.sources.tables import read_table

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type", "value"])
    P = auto_buckets(ev.count())
    W_US = 7 * 86400 * 10**6
    DAY_US = 86400 * 10**6

    def tag(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        bk = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
        v = t.column("value").to_numpy(zero_copy_only=False)
        cents = np.copysign(np.floor(np.abs(v) * 100 + 0.5), v).astype(np.int64)
        return pa.table(
            {"user_id": t.column("user_id"),
             "ts": t.column("ts").cast(pa.int64()),
             "event_type": t.column("event_type"),
             "eid": t.column("event_id"),
             "cents": pa.array(cents),
             "bk": pa.array(bk.astype(np.int64))}
        )

    def credit(df):
        empty = pd.DataFrame({"touch_type": pd.Series([], dtype="object"),
                              "n": pd.Series([], dtype="int64"),
                              "units": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        acc_n: dict[str, int] = {}
        acc_u: dict[str, int] = {}
        for _, g in df.groupby("user_id", sort=False):
            g = g.sort_values(["ts", "eid"], kind="mergesort")
            ts = g["ts"].to_numpy()
            ty = g["event_type"].to_numpy()
            cents = g["cents"].to_numpy()
            for j in np.flatnonzero(ty == "purchase"):
                pts = ts[j]
                lo = np.searchsorted(ts, pts - W_US, side="right")  # strict >
                hi = np.searchsorted(ts, pts, side="left")          # strict <
                if hi <= lo:
                    continue
                d = (pts - ts[lo:hi]) // DAY_US
                units = int(cents[j]) * (64 >> d.astype(np.int64))
                for tt, uu in zip(ty[lo:hi], units):
                    acc_n[tt] = acc_n.get(tt, 0) + 1
                    acc_u[tt] = acc_u.get(tt, 0) + int(uu)
        if not acc_n:
            return empty
        keys = sorted(acc_n)
        return pd.DataFrame({"touch_type": pd.Series(keys, dtype="object"),
                             "n": pd.Series([acc_n[k] for k in keys], dtype="int64"),
                             "units": pd.Series([acc_u[k] for k in keys], dtype="int64")})

    parts = bucket_map_groups(
        ev.map_batches(tag, batch_format="pyarrow"), "bk", credit, P, batch_format="pandas"
    )
    merged = merge_partials(parts, ["touch_type"], {"n": "sum", "units": "sum"})

    def finish(t: pa.Table) -> pa.Table:
        units = t.column("units").to_numpy(zero_copy_only=False).astype(np.int64)
        cc = np.floor(units / 64.0 * 100 + 0.5) / 100
        return pa.table({"touch_type": t.column("touch_type"),
                         "n_touches": t.column("n"),
                         "credit_units": t.column("units"),
                         "credit_cents": pa.array(cc, pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Weekday seasonal index over gap-filled daily revenue (rides the
# shared _daily_cents substrate; dow = (epoch_day + 4) % 7 == DuckDB
# dayofweek, 0=Sunday).  Integer sums; two ROUND-ed divisions.
# ---------------------------------------------------------------------------

_WEEKDAY_IDX_ORACLE = (
    _DAILY_CENTS_CTE
    + """,
wd AS (SELECT (day + 4) % 7 AS dow, c FROM x),
a AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days, CAST(SUM(c) AS BIGINT) AS cents
      FROM wd GROUP BY 1),
t AS (SELECT CAST(SUM(cents) AS BIGINT) AS st, CAST(SUM(n_days) AS BIGINT) AS h FROM a)
SELECT dow, n_days, cents,
       ROUND(CAST(cents AS DOUBLE) / n_days, 2) AS mean_cents,
       ROUND((CAST(cents AS DOUBLE) / n_days) / (CAST(t.st AS DOUBLE) / t.h), 6)
         AS seasonal_idx
FROM a, t
"""
)


@register("weekday_seasonal_index", oracle=_WEEKDAY_IDX_ORACLE)
def weekday_seasonal_index(sf_dir: str):
    """Per-weekday revenue seasonality (mean daily cents / overall mean
    over the zero-filled date spine) — the additive-decomposition
    seasonal profile.  Daily cents ride the combiner; the 7-row index
    is driver-side integer arithmetic."""

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("day")
        lo, hi = int(df["day"].min()), int(df["day"].max())
        spine = np.arange(lo, hi + 1, dtype=np.int64)
        c = np.zeros(len(spine), np.int64)
        c[df["day"].to_numpy() - lo] = df["c"].to_numpy()
        dow = (spine + 4) % 7
        rows = {"dow": [], "n_days": [], "cents": [], "mean_cents": [], "seasonal_idx": []}
        st, h = int(c.sum()), len(spine)
        for d in sorted(set(dow.tolist())):
            m = dow == d
            n_days, cents = int(m.sum()), int(c[m].sum())
            mean = cents / n_days
            rows["dow"].append(d)
            rows["n_days"].append(n_days)
            rows["cents"].append(cents)
            rows["mean_cents"].append(float(np.floor(mean * 100 + 0.5) / 100))
            idx = (cents / n_days) / (st / h)
            rows["seasonal_idx"].append(float(np.floor(idx * 1e6 + 0.5) / 1e6))
        return pa.table(
            {"dow": pa.array(rows["dow"], pa.int64()),
             "n_days": pa.array(rows["n_days"], pa.int64()),
             "cents": pa.array(rows["cents"], pa.int64()),
             "mean_cents": pa.array(rows["mean_cents"], pa.float64()),
             "seasonal_idx": pa.array(rows["seasonal_idx"], pa.float64())}
        )

    return (
        _daily_cents(sf_dir)
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)
    )


# ---------------------------------------------------------------------------
# Herfindahl–Hirschman concentration of sources within each language
# (the market-concentration complement to the entropy-based
# effective_sources diversity): hhi = sum(share^2), plus the
# k-normalized variant.  All integer count moments.
# ---------------------------------------------------------------------------

_HHI_ORACLE = """
WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1, 2),
t AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(n * n) AS BIGINT) AS s2,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM c GROUP BY 1)
SELECT lang, nt AS n_docs, k AS n_sources,
       ROUND(CAST(s2 AS DOUBLE) / (CAST(nt AS DOUBLE) * nt), 6) AS hhi,
       CASE WHEN k > 1
            THEN ROUND((CAST(s2 AS DOUBLE) / (CAST(nt AS DOUBLE) * nt) - 1.0 / k)
                       / (1.0 - 1.0 / k), 6)
            ELSE 0.0 END AS hhi_norm
FROM t
"""


@register("source_concentration_hhi", oracle=_HHI_ORACLE)
def source_concentration_hhi(sf_dir: str):
    """Source-concentration HHI per language.  (lang, source) counts
    ride the combiner; the per-lang share-squared sums are exact
    integers, so the only floats are the two final divisions."""
    from document_ai_ray.sources.tables import read_table as _rt

    docs = _rt(sf_dir, "documents", columns=["lang", "source"])
    counts = partial_group_agg(docs, ["lang", "source"], count_alias="n")

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = {"lang": [], "n_docs": [], "n_sources": [], "hhi": [], "hhi_norm": []}
        for lang, g in df.groupby("lang"):
            n = g["n"].to_numpy(np.int64)
            nt = int(n.sum())
            s2 = int((n * n).sum())
            k = len(n)
            hhi = s2 / (float(nt) * nt)
            out["lang"].append(lang)
            out["n_docs"].append(nt)
            out["n_sources"].append(k)
            out["hhi"].append(float(np.floor(hhi * 1e6 + 0.5) / 1e6))
            hn = (s2 / (float(nt) * nt) - 1.0 / k) / (1.0 - 1.0 / k) if k > 1 else 0.0
            out["hhi_norm"].append(float(np.floor(abs(hn) * 1e6 + 0.5) * (1 if hn >= 0 else -1) / 1e6))
        return pa.table(
            {"lang": pa.array(out["lang"], pa.string()),
             "n_docs": pa.array(out["n_docs"], pa.int64()),
             "n_sources": pa.array(out["n_sources"], pa.int64()),
             "hhi": pa.array(out["hhi"], pa.float64()),
             "hhi_norm": pa.array(out["hhi_norm"], pa.float64())}
        )

    return counts.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# ---------------------------------------------------------------------------
# Poisson-surprise anomalous hours: score each occupied hour by the
# Poisson deviance c*ln(c/lambda) - (c - lambda) against the uniform
# hourly rate, micro-quantized with ONE floor at the end — top-10 most
# surprising hours.
# ---------------------------------------------------------------------------

_POISSON_HOURS_ORACLE = """
WITH ev AS (SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h FROM events),
c AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY 1),
b AS (SELECT MIN(h) AS h0, MAX(h) AS h1, CAST(SUM(n) AS BIGINT) AS nt FROM c),
s AS (SELECT c.h, c.n,
             CAST(FLOOR(1000000 * (c.n * LN((c.n * (b.h1 - b.h0 + 1)) / CAST(b.nt AS DOUBLE))
                                   - c.n
                                   + CAST(b.nt AS DOUBLE) / (b.h1 - b.h0 + 1)))
                  AS BIGINT) AS surprise_micro
      FROM c, b)
SELECT h AS hour, n AS n_events, surprise_micro
FROM s ORDER BY surprise_micro DESC, hour LIMIT 10
"""


@register("poisson_surprise_hours", oracle=_POISSON_HOURS_ORACLE)
def poisson_surprise_hours(sf_dir: str):
    """Top-10 anomalous traffic hours by Poisson deviance against the
    uniform rate — the burst-detection screen.  The hour census rides
    the combiner; scoring + top-k run over the hours-sized table."""
    import math

    import pyarrow.compute as pc_

    ev = read_table(sf_dir, "events", columns=["ts"])

    def hour_col(t: pa.Table) -> pa.Table:
        micros = pc_.cast(t.column("ts"), pa.int64())
        return pa.table({"h": pc_.cast(pc_.divide(micros, 3600000000), pa.int64())})

    counts = partial_group_agg(
        ev.map_batches(hour_col, batch_format="pyarrow"), ["h"], count_alias="n"
    ).take_all()  # hours-sized
    h0 = min(r["h"] for r in counts)
    h1 = max(r["h"] for r in counts)
    H = int(h1 - h0 + 1)
    nt = sum(int(r["n"]) for r in counts)
    scored = []
    for r in counts:
        n = int(r["n"])
        s = math.floor(1e6 * (n * math.log((n * H) / nt) - n + nt / H))
        scored.append((int(r["h"]), n, s))
    scored.sort(key=lambda x: (-x[2], x[0]))
    top = scored[:10]
    return pa.table(
        {"hour": pa.array([x[0] for x in top], pa.int64()),
         "n_events": pa.array([x[1] for x in top], pa.int64()),
         "surprise_micro": pa.array([x[2] for x in top], pa.int64())}
    )
