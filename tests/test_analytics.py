"""Advanced analytics operators vs pandas recomputations (the DuckDB
oracles are the primary gate; these pin semantics in pytest too)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from document_ai_ray.pipelines.analytics import (
    corr_price_qty,
    events_cumulative,
    lag_orders,
    price_quantiles_by_priority,
    priority_pivot,
    region_nations_agg,
)


def test_events_cumulative_matches_pandas(sf_tiny):
    got = events_cumulative(sf_tiny).to_pandas().sort_values(["user_id", "ts"]).reset_index(drop=True)
    ev = pq.read_table(f"{sf_tiny}/events.parquet", columns=["user_id", "ts", "value"]).to_pandas()
    per_ts = ev.groupby(["user_id", "ts"], as_index=False).agg(n=("value", "size"), v=("value", "sum"))
    per_ts = per_ts.sort_values(["user_id", "ts"]).reset_index(drop=True)
    want_n = per_ts.groupby("user_id")["n"].cumsum().to_numpy()
    assert np.array_equal(got["cum_n"].to_numpy(), want_n)
    want_s = per_ts.groupby("user_id")["v"].cumsum().to_numpy()
    assert np.allclose(got["cum_sum"].to_numpy(), np.round(want_s, 2), atol=1e-9)


def test_lag_orders_first_order_is_null(sf_tiny):
    got = lag_orders(sf_tiny).to_pandas()
    orders = pq.read_table(f"{sf_tiny}/orders.parquet").to_pandas()
    first = (
        orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        .groupby("o_custkey").head(1)["o_orderkey"]
    )
    by_key = got.set_index("o_orderkey")["prev_price"]
    assert by_key.loc[first].isna().all()          # every first order has no LAG
    assert len(got) == len(orders)


def test_quantiles_and_corr_shapes(sf_tiny):
    q = price_quantiles_by_priority(sf_tiny)  # returns a pandas DataFrame
    assert (q["p25"] <= q["p50"]).all() and (q["p50"] <= q["p75"]).all()
    c = corr_price_qty(sf_tiny).to_pandas()
    assert ((c["corr_pq"] >= -1) & (c["corr_pq"] <= 1)).all()
    assert len(c) == 3


def test_priority_pivot_row_conservation(sf_tiny):
    got = priority_pivot(sf_tiny).to_pandas()
    n_orders = pq.read_metadata(f"{sf_tiny}/orders.parquet").num_rows
    assert int(got[["n_urgent", "n_high", "n_other"]].to_numpy().sum()) == n_orders
    assert got["month"].is_unique


def test_region_nations_agg_sorted(sf_tiny):
    got = region_nations_agg(sf_tiny).to_pandas()
    assert len(got) == 5
    for s in got["nations"]:
        parts = s.split(",")
        assert parts == sorted(parts) and len(parts) >= 1


def test_approx_quantiles_close_to_exact(sf_tiny):
    from document_ai_ray.pipelines.analytics import approx_price_quantiles

    exact = price_quantiles_by_priority(sf_tiny).set_index("o_orderpriority")
    approx = approx_price_quantiles(sf_tiny).to_pandas().set_index("o_orderpriority")
    assert set(exact.index) == set(approx.index)
    for key in exact.index:
        iqr = exact.loc[key, "p75"] - exact.loc[key, "p25"] or 1.0
        for c in ("p25", "p50", "p75"):
            err = abs(approx.loc[key, c] - exact.loc[key, c]) / iqr
            assert err < 0.05, (key, c, err)


def test_qsketch_merge_associativity_and_bounds():
    from document_ai_ray.functions.sketch import (
        qsketch_compress,
        qsketch_merge,
        qsketch_quantile,
    )

    rng = np.random.RandomState(3)
    x = rng.lognormal(4, 1, size=20000)
    parts = [qsketch_compress(c, np.ones(len(c)), 256) for c in np.array_split(x, 37)]
    merged = qsketch_merge(parts, 256)
    assert len(merged[0]) <= 256
    assert abs(merged[1].sum() - len(x)) < 1e-6          # weight conservation
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        est = qsketch_quantile(merged, q)
        true = np.quantile(x, q)
        assert abs(est - true) / true < 0.05, (q, est, true)


def test_ntile_sizes_differ_by_at_most_one(sf_tiny):
    from document_ai_ray.pipelines.analytics import ntile_orders

    got = ntile_orders(sf_tiny).to_pandas()
    orders = pq.read_table(f"{sf_tiny}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]).to_pandas()
    m = orders.merge(got, on="o_orderkey")
    for _, g in m.groupby("o_orderpriority"):
        sizes = g.groupby("tile").size()
        assert set(sizes.index) <= {1, 2, 3, 4}
        assert sizes.max() - sizes.min() <= 1


def test_set_op_keys_matches_python_sets(sf_tiny):
    import ray.data as rd

    from document_ai_ray.pipelines.ops import set_op_keys

    orders = pq.read_table(f"{sf_tiny}/orders.parquet").to_pandas()
    A = set(orders.loc[orders.o_totalprice > 100000, "o_orderkey"])
    B = set(orders.loc[orders.o_orderpriority == "1-URGENT", "o_orderkey"])

    def mk(keys):
        import pyarrow as pa
        return rd.from_arrow(pa.table({"o_orderkey": sorted(keys)}))

    inter = {r["o_orderkey"] for r in set_op_keys(mk(A), mk(B), "o_orderkey", "intersect").take_all()}
    exc = {r["o_orderkey"] for r in set_op_keys(mk(A), mk(B), "o_orderkey", "except").take_all()}
    assert inter == A & B and exc == A - B and len(inter) > 0


def test_set_op_keys_string_keys(sf_tiny):
    """set_op_keys must work on non-integer key columns (ADVICE r2)."""
    import pyarrow as pa
    import ray.data as rd

    from document_ai_ray.pipelines.ops import set_op_keys

    A = {"alpha", "beta", "gamma", "delta"}
    B = {"beta", "delta", "epsilon"}

    def mk(keys):
        return rd.from_arrow(pa.table({"k": sorted(keys)}))

    inter = {r["k"] for r in set_op_keys(mk(A), mk(B), "k", "intersect").take_all()}
    exc = {r["k"] for r in set_op_keys(mk(A), mk(B), "k", "except").take_all()}
    assert inter == A & B
    assert exc == A - B


def test_cube_pricing_levels(sf_tiny):
    from document_ai_ray.pipelines.analytics import cube_pricing

    df = cube_pricing(sf_tiny).to_pandas()
    leaves = df[df["l_returnflag"].notna() & df["l_linestatus"].notna()]
    total = df[df["l_returnflag"].isna() & df["l_linestatus"].isna()]
    by_flag = df[df["l_returnflag"].notna() & df["l_linestatus"].isna()]
    by_status = df[df["l_returnflag"].isna() & df["l_linestatus"].notna()]
    assert len(total) == 1
    # every level's n adds up to the grand total
    n_tot = int(total["n"].iloc[0])
    assert int(leaves["n"].sum()) == n_tot
    assert int(by_flag["n"].sum()) == n_tot
    assert int(by_status["n"].sum()) == n_tot


def test_mode_qty_by_flag_matches_pandas(sf_tiny):
    import duckdb

    from document_ai_ray.pipelines.analytics import mode_qty_by_flag

    got = mode_qty_by_flag(sf_tiny).to_pandas().sort_values("l_returnflag")
    ref = duckdb.sql(
        f"""WITH c AS (SELECT l_returnflag, l_quantity v, COUNT(*) n
            FROM read_parquet('{sf_tiny}/lineitem.parquet') GROUP BY 1,2),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY n DESC, v) rn FROM c)
        SELECT l_returnflag, v mode_qty, n FROM r WHERE rn = 1 ORDER BY 1"""
    ).fetchdf()
    assert got["mode_qty"].tolist() == ref["mode_qty"].tolist()
    assert got["n"].tolist() == ref["n"].tolist()


def test_percent_rank_orders_bounds(sf_tiny):
    from document_ai_ray.pipelines.analytics import percent_rank_orders

    df = percent_rank_orders(sf_tiny).to_pandas()
    assert ((df["pct_rank"] >= 0) & (df["pct_rank"] <= 1)).all()
    assert ((df["cume"] > 0) & (df["cume"] <= 1)).all()
    # each priority group has exactly one max (pct_rank == 1) given
    # unique ordering, and its cume is exactly 1
    for _, g in df.groupby("o_orderpriority"):
        assert (g["cume"] == 1.0).sum() == 1
        assert g.loc[g["cume"] == 1.0, "pct_rank"].iloc[0] == 1.0


def test_approx_distinct_users_by_type_error_bound(sf_tiny):
    from document_ai_ray.functions.sketch import HLL60_P
    from document_ai_ray.pipelines.analytics import approx_distinct_users_by_type

    t = approx_distinct_users_by_type(sf_tiny).to_pandas()
    assert len(t) >= 3
    bound_bp = int(3.0 / (2**HLL60_P) ** 0.5 * 10000)  # 468 bp
    assert (t["rel_err_bp"] <= bound_bp).all()


def test_twa_single_user_closed_form(sf_tiny):
    import numpy as np

    from document_ai_ray.pipelines import registry
    from document_ai_ray.sources.tables import read_table

    out = registry.queries()["events_time_weighted_avg"](sf_tiny).to_pandas()
    ev = read_table(sf_tiny, "events", columns=["event_id", "user_id", "ts", "value"]).to_pandas()
    uid = int(out["user_id"].iloc[0])
    g = ev[ev["user_id"] == uid].sort_values(["ts", "event_id"])
    ts = g["ts"].astype("int64").to_numpy()
    v = g["value"].to_numpy()
    dt = np.diff(ts)
    want = ((v[1:] + v[:-1]) / 2 * dt).sum() / dt.sum()
    got = float(out.loc[out["user_id"] == uid, "twa_value"].iloc[0])
    assert abs(got - want) < 1e-5
    assert int(out.loc[out["user_id"] == uid, "n_segments"].iloc[0]) == len(g) - 1


def test_distinct_users_exact_matches_pandas(sf_tiny):
    from document_ai_ray.pipelines import registry
    from document_ai_ray.sources.tables import read_table

    got = (
        registry.queries()["distinct_users_by_type"](sf_tiny)
        .to_pandas()
        .set_index("event_type")["n_users"]
        .to_dict()
    )
    ev = read_table(sf_tiny, "events", columns=["event_type", "user_id"]).to_pandas()
    want = ev.groupby("event_type")["user_id"].nunique().to_dict()
    assert got == want


def test_mad_matches_numpy(sf_tiny):
    import numpy as np

    from document_ai_ray.pipelines import registry
    from document_ai_ray.sources.tables import read_table

    out = registry.queries()["events_mad_by_type"](sf_tiny)
    got = {r["event_type"]: (r["median_value"], r["mad"]) for r in out.to_pylist()}
    ev = read_table(sf_tiny, "events", columns=["event_type", "value"]).to_pandas()
    for g, sub in ev.groupby("event_type"):
        v = sub["value"].to_numpy()
        med = np.percentile(v, 50, method="linear")
        mad = np.percentile(np.abs(v - med), 50, method="linear")
        assert abs(got[g][0] - med) < 1e-5, g
        assert abs(got[g][1] - mad) < 1e-5, g
