"""Reusable distributed operator helpers (scale-first building blocks).

These encode the shuffle-minimizing patterns the engine uses everywhere
(SURVEY.md §4): partial (combiner) aggregation before any groupby,
broadcast hash joins for small sides, Ray's hash-partitioned join only
when both sides are genuinely large, and streaming top-k instead of a
global sort.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def partial_group_agg(
    ds: rd.Dataset,
    keys: list[str],
    sum_cols: dict[str, str] | None = None,
    count_alias: str | None = None,
) -> rd.Dataset:
    """Pre-aggregate inside map_batches (one row per key per batch),
    then a small global groupby over the partials — the combiner
    pattern that keeps `groupby` shuffles tiny at 100 TB.

    sum_cols: {source_col: output_alias}; count_alias counts rows.
    The output columns are exactly the aliases (+ keys).
    """
    sum_cols = sum_cols or {}

    def partial(t: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sum_cols]
        if count_alias:
            aggs.append(([], "count_all"))
        g = t.group_by(keys).aggregate(aggs)
        names = list(keys)
        cols = [g.column(k) for k in keys]
        for c, alias in sum_cols.items():
            names.append(alias)
            cols.append(g.column(f"{c}_sum"))
        if count_alias:
            names.append(count_alias)
            cols.append(g.column("count_all"))
        return pa.Table.from_arrays(cols, names=names)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    aliases = list(sum_cols.values()) + ([count_alias] if count_alias else [])
    return merge_partials(partials, keys, {a: "sum" for a in aliases})


def merge_partials(
    partials: rd.Dataset,
    keys: list[str],
    agg_funcs: dict[str, str],
    chunk_rows: int = 1 << 20,
) -> rd.Dataset:
    """Merge per-batch partial aggregates WITHOUT an all-to-all shuffle:
    a parallel consolidation level (coalescing up to ``chunk_rows``
    partial rows per task via ``batch_size``) followed by ONE final
    merge task.  Ray's native `groupby().aggregate()` pays ~10 s of
    all-to-all machinery even for kilobyte inputs; combiner output for
    low-cardinality keys is tiny, so two map_batches levels do the same
    work for free.  Only valid when the distinct-key partials fit one
    task (they do by construction for combiner aggregates); use
    `bucketed_group_agg` for high-cardinality keys.

    agg_funcs: {column: fn} with fn an Arrow group_by aggregate whose
    merge is itself (sum/min/max — NOT count or mean).
    """
    assert all(f in ("sum", "min", "max") for f in agg_funcs.values())

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([(c, f) for c, f in agg_funcs.items()])
        names = list(keys) + list(agg_funcs)
        cols = [g.column(k) for k in keys] + [
            g.column(f"{c}_{f}") for c, f in agg_funcs.items()
        ]
        return pa.Table.from_arrays(cols, names=names)

    consolidated = partials.map_batches(merge, batch_format="pyarrow", batch_size=chunk_rows)
    return consolidated.map_batches(merge, batch_format="pyarrow", batch_size=1 << 30)


def distinct_rows(ds: rd.Dataset, keys: list[str], chunk_rows: int = 1 << 20) -> rd.Dataset:
    """Distinct key tuples via the same shuffle-free two-level merge
    (per-chunk dedup -> one final dedup).  For candidate-pair dedup
    where the distinct set is far smaller than the input stream."""

    def merge(t: pa.Table) -> pa.Table:
        return t.group_by(keys).aggregate([])

    consolidated = ds.map_batches(merge, batch_format="pyarrow", batch_size=chunk_rows)
    return consolidated.map_batches(merge, batch_format="pyarrow", batch_size=1 << 30)


def bucketed_group_agg(
    ds: rd.Dataset,
    keys: list[str],
    agg_fn,
    n_buckets: int = 64,
) -> rd.Dataset:
    """High-cardinality grouped aggregation: hash the key columns to a
    small bucket id, shuffle on the bucket, and run a VECTORIZED pandas
    aggregation per bucket.

    Ray's `groupby(keys).aggregate(...)` pays per-distinct-group
    overhead (~ms/group — prohibitive at 10^5+ groups); this pays one
    pandas groupby per bucket instead.  Keys must be integer-typed
    (hash-combine is numpy-vectorized).  ``agg_fn(df)`` receives all
    rows of one bucket and must return the aggregated frame.
    """
    mults = [np.uint64(m) for m in (2654435761, 40503, 2246822519, 3266489917)]

    def add_bucket(t: pa.Table) -> pa.Table:
        acc = np.zeros(len(t), dtype=np.uint64)
        for i, k in enumerate(keys):
            col = t.column(k).to_numpy(zero_copy_only=False).astype(np.uint64)
            acc ^= col * mults[i % len(mults)] + np.uint64(0x9E3779B9) * np.uint64(i + 1)
        return t.append_column("__bucket", pa.array((acc % np.uint64(n_buckets)).astype(np.int32)))

    def per_bucket(df) -> "pd.DataFrame":
        return agg_fn(df.drop(columns=["__bucket"]))

    import pandas as pd  # noqa: F401  (type comment above)

    return ds.map_batches(add_bucket, batch_format="pyarrow").groupby("__bucket").map_groups(
        per_bucket, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Per-worker broadcast cache.  The small side is `ray.put` ONCE on the
# driver; each worker PROCESS materializes (and optionally transforms)
# it on first touch and reuses it for every subsequent task — the same
# amortization as an actor's __init__ without paying actor-pool startup
# (~2 s of process spawns per stage, measured).  ≙ the reference's
# in-memory ground-truth lookup (/root/reference/performances.py:109-115)
# distributed.  Refs are wrapped in a 1-tuple so Ray does not eagerly
# de-ref them per task submission.
# ---------------------------------------------------------------------------

_BCAST_CACHE: dict[tuple, Any] = {}


def get_broadcast(ref_tuple: tuple, build=None, tag: str = ""):
    """Materialize a broadcast ObjectRef once per worker process.
    `build(value)` (optional) derives the cached working structure —
    e.g. a pandas index or a dict — also once per worker."""
    key = (ref_tuple[0].hex(), tag)
    if key not in _BCAST_CACHE:
        val = ray.get(ref_tuple[0])
        _BCAST_CACHE[key] = build(val) if build is not None else val
    return _BCAST_CACHE[key]


def _bjoin_batch(batch: pa.Table, small_ref: tuple, key: str, right_key: str, how: str) -> pa.Table:
    small_df = get_broadcast(
        small_ref, lambda t: t.to_pandas().set_index(right_key, drop=True), tag=f"bjoin:{right_key}"
    )
    df = batch.to_pandas()
    joined = df.join(small_df, on=key, how=how)
    return pa.Table.from_pandas(joined, preserve_index=False)


def broadcast_join(
    ds: rd.Dataset,
    small: pa.Table,
    key: str,
    right_key: str | None = None,
    how: str = "inner",
    concurrency: int = 8,  # kept for API compat; task stages self-scale
) -> rd.Dataset:
    """Map-side broadcast hash join (task stage + per-worker cache)."""
    right_key = right_key or key
    ref = ray.put(small)
    return ds.map_batches(
        _bjoin_batch,
        fn_kwargs={"small_ref": (ref,), "key": key, "right_key": right_key, "how": how},
        batch_format="pyarrow",
    )


def large_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    right_on: str | None = None,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Both-sides-large join: Ray Data's hash-partitioned `Dataset.join`
    (both sides shuffled on the key).  Only reach for this when neither
    side fits a broadcast — at 100 TB a broadcast of a 100 GB side is
    impossible, but so is careless use of this (full all-to-all)."""
    return left.join(
        right,
        join_type="inner",
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,) if right_on else None,
    )


def topk(ds: rd.Dataset, keys: list[tuple[str, bool]], k: int, columns: list[str] | None = None) -> rd.Dataset:
    """Streaming top-k: per-batch local top-k, then one tiny final
    top-k — no global sort (`sort(desc).limit(k)` shuffles everything;
    this moves k rows per block)."""
    sort_keys = [(c, "descending" if desc else "ascending") for c, desc in keys]

    def local(t: pa.Table) -> pa.Table:
        if columns:
            t = t.select(columns)
        return t.sort_by(sort_keys).slice(0, k)

    # final merge coalesces all k-row partials into ONE batch via
    # batch_size (no repartition all-to-all needed for k*blocks rows)
    return ds.map_batches(local, batch_format="pyarrow").map_batches(
        local, batch_format="pyarrow", batch_size=1 << 30
    )


def distinct_values(ds: rd.Dataset, col: str) -> pa.Table:
    """Distinct values of one column as a small Arrow table (per-batch
    local dedup -> global unique)."""

    def local(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays([pc.unique(t.column(col))], names=[col])

    vals = ds.map_batches(local, batch_format="pyarrow").unique(col)
    vals = sorted(v for v in vals if v is not None)
    return pa.Table.from_arrays([pa.array(vals)], names=[col])


def _keyset_batch(batch: pa.Table, keys_ref: tuple, key: str, anti: bool) -> pa.Table:
    """Semi/anti join via broadcast key set (at 10^12 rows the set
    becomes a Bloom filter; the plumbing is identical)."""
    value_set = get_broadcast(keys_ref, lambda ks: pa.array(sorted(set(ks))), tag="keyset")
    mask = pc.is_in(batch.column(key), value_set=value_set)
    if anti:
        mask = pc.invert(mask)
    return batch.filter(mask)


def semi_anti_join(
    ds: rd.Dataset, key_values: list[Any], key: str, anti: bool = False, concurrency: int = 8
) -> rd.Dataset:
    ref = ray.put(list(key_values))
    return ds.map_batches(
        _keyset_batch,
        fn_kwargs={"keys_ref": (ref,), "key": key, "anti": anti},
        batch_format="pyarrow",
    )


def round_cols(t_or_batch: pa.Table, cols: dict[str, int]) -> pa.Table:
    """Round float columns (both the Ray pipeline and the oracle SQL
    round identically so value-hash comparison is stable).

    Matches DuckDB's ROUND bit-for-bit: `floor(|x|*10^nd + 0.5)/10^nd`
    with the sign restored (half away from zero, then a plain double
    division).  pyarrow's pc.round produces a result one ulp off from
    this on some values, so numpy is used deliberately."""
    out = t_or_batch
    for c, nd in cols.items():
        x = out.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
        s = 10.0 ** nd
        r = np.copysign(np.floor(np.abs(x) * s + 0.5), x) / s
        i = out.schema.get_field_index(c)
        out = out.set_column(i, c, pa.array(r, pa.float64()))
    return out


def grouped_topk(
    ds: rd.Dataset,
    keys: list[str],
    sort_cols: list[tuple[str, bool]],
    k: int,
) -> rd.Dataset:
    """Top-k rows PER KEY GROUP (ROW_NUMBER() <= k shape): per-batch
    local top-k per key, then one coalesced final pass — the grouped
    analogue of `topk` (moves k x groups x blocks rows, no shuffle).
    sort_cols: [(col, ascending)]; ties must be broken by the caller's
    sort columns for deterministic output."""
    cols = [c for c, _ in sort_cols]
    asc = [a for _, a in sort_cols]

    def local(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(cols, ascending=asc, kind="mergesort")
        df = df.groupby(keys, as_index=False, sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    return ds.map_batches(local, batch_format="pyarrow").map_batches(
        local, batch_format="pyarrow", batch_size=1 << 30
    )
