"""Round-5 verdict items: the HUGEINT-oracle guard.

DuckDB's SUM(BIGINT) returns HUGEINT, which pandas renders as float64
(560.0) while the engine side emits int64 (560); the grading driver's
value-hash distinguishes the two, so any oracle emitting a HUGEINT
column is a latent driver hash-fail (r4 verdict "What's wrong" #1 —
seven sites, one of them the r3+r4 red cell full_outer_join_sides).
This test DuckDB-plans every registered oracle (DESCRIBE — no data is
scanned) and asserts no output column has type HUGEINT/UHUGEINT, so the
class stays dead.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def planner():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _oracles():
    from document_ai_ray.pipelines import registry

    return registry.oracle_sql()


def test_no_hugeint_oracle_columns(planner):
    bad: dict[str, list[str]] = {}
    for name, sql in _oracles().items():
        plan = planner.execute(f"DESCRIBE {sql}").fetchall()
        huge = [col for col, typ, *_ in plan if "HUGEINT" in typ.upper()]
        if huge:
            bad[name] = huge
    assert not bad, (
        "oracles emitting HUGEINT columns (driver hash-fail: pandas renders "
        f"HUGEINT as float64, engine emits int64) — CAST(... AS BIGINT): {bad}"
    )


def test_jaccard_dense_skips_schema_less_empty_block(ray_session):
    """Ray's map_batches SKIPS empty input blocks, so an upstream 0-row
    block with an EMPTY schema flows through the incidence map
    untouched and reaches the driver-side collect loop (hit by
    cross_corpus_decontaminate at sf0.001 under num_cpus=16 — the r5
    exchange-discovery sweep's one real failure).  Reproduce the shape
    directly: a grams dataset whose block list contains a schema-less
    empty block must still score."""
    import pyarrow as pa
    import ray.data as rd

    from document_ai_ray.stages.dedup import _jaccard_dense

    full = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "grams": pa.array([[10, 11, 12], [10, 11, 12]], pa.list_(pa.int64())),
        }
    )
    empty_schemaless = pa.table({})
    ds = rd.from_arrow([full, empty_schemaless])
    pairs = _jaccard_dense(ds, 0.5, vocab=[10, 11, 12]).to_pandas()
    assert len(pairs) == 1
    assert float(pairs["jaccard"].iloc[0]) == 1.0
