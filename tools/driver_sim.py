"""Simulate the grading driver: init Ray, import __ray_entry__, smoke
entry(), then run every queries()[name](sf_dir) against oracle_sql()
via DuckDB with row-count + schema + order-insensitive value-hash.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
        if len(df) == 0 and len(df.columns) == 0:
            # Ray's to_pandas drops columns for an all-empty Dataset even
            # when the Dataset HAS a schema — recover it so zero-row
            # results still schema-compare (hit by tiny-sf sweeps)
            base = res.schema().base_schema
            df = pa.schema(base).empty_table().to_pandas()
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    # dtype-strict: the real driver's hash distinguishes int64 from
    # float64 (560 vs 560.0) — "%.6g" alone collapses them, which masked
    # the HUGEINT-oracle defect for two rounds.  Hash dtype.kind per
    # column (int-vs-float matters; int32-vs-int64 doesn't).
    kinds = ",".join(f"{c}:{df[c].dtype.kind}" for c in df.columns)
    body = kinds + "\n" + df.to_csv(index=False, float_format="%.6g")
    return hashlib.sha256(body.encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    t0 = time.time()
    res = e.entry()
    df = to_pandas(res)
    print(f"entry(): {len(df)} rows, cols={list(df.columns)[:6]}..., {time.time()-t0:.1f}s")
    assert len(df) >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS {name}: {len(mine)} rows ({dt:.1f}s) [no oracle]")
            n_rowsonly += 1
            continue
        try:
            want = canon(con.execute(oracles[name]).df())
        except Exception as exc:
            print(f"FAIL {name}: oracle raised {exc}")
            n_fail += 1
            continue
        ok_rows = len(mine) == len(want)
        ok_cols = list(mine.columns) == list(want.columns)
        ok_hash = ok_rows and ok_cols and value_hash(mine) == value_hash(want)
        if ok_hash:
            print(f"PASS {name}: {len(mine)} rows ({dt:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {len(mine)} vs {len(want)}; cols {list(mine.columns)} vs {list(want.columns)}")
            if ok_rows and ok_cols:
                diff = mine.compare(want) if mine.shape == want.shape else None
                print(diff.head(10) if diff is not None else "(shape mismatch)")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
