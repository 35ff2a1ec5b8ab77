"""Relational operator suite vs DuckDB oracles at sf0.001 (the same
comparison the driver runs at sf0.01)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def con(sf_tiny):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_tiny}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(res):
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


# a representative subset per operator family (full suite runs in
# tools/driver_sim.py; keeping the pytest tier fast)
SUBSET = [
    "q1_pricing_summary",      # partial agg + finalize
    "filter_project_revenue",  # filter + project + round
    "topk_orders",             # streaming top-k
    "join_broadcast_segment",  # broadcast join
    "join_large_priority",     # hash-partitioned join
    "anti_join_customers",     # anti join
    "events_hourly",           # tumbling window
    "events_sessionize",       # session window
    "dedup_exact_docs",        # exact dedup
    "full_outer_join_sides",   # bucketed per-side census (r4 rewrite)
    "orders_sample_random",    # md5-threshold Bernoulli sample (r4 oracle)
    "extract_flagship_full",   # flagship validator replay (r4 oracle)
    "q3_shipping_priority",    # TPC-H Q3: semi join + fact join + topk (r4)
    "grouping_sets_pricing",   # GROUPING SETS scan-once (r4)
]


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, con, sf_tiny):
    from document_ai_ray.pipelines import registry

    qs, oracles = registry.queries(), registry.oracle_sql()
    mine = _canon(_to_pandas(qs[name](sf_tiny)))
    want = _canon(con.execute(oracles[name]).df())
    assert list(mine.columns) == list(want.columns)
    assert len(mine) == len(want)
    pd.testing.assert_frame_equal(mine, want, check_dtype=False, check_exact=True)
