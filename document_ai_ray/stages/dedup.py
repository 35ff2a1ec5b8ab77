"""Deduplication operators: exact, n-gram Jaccard (exact all-pairs via
inverted index), MinHash+LSH, SimHash banding.

The reference has no distributed dedup (SURVEY.md §2.7); these are the
training-data-pipeline operators a 100 TB corpus needs.  Shuffle
discipline:

  - exact: group 16-byte content hashes, never documents;
  - jaccard: explode (gram, doc_id), group by gram (inverted index),
    count shared grams per pair, one final tiny filter — the all-pairs
    comparison never materializes;
  - MinHash LSH: signatures per doc (vectorized numpy, actor-held
    permutation table), band -> bucket groupby, verify candidates only;
  - SimHash: 64-bit fingerprint, pigeonhole block banding.

At 10^12 docs the verify step joins candidate pairs back to shingle
sets via two hash joins on doc id; at driver-test scale the shingle
sets are broadcast (`ray.put` once, read per actor) — flagged inline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from document_ai_ray.functions.hashing import MinHasher, hamming64, simhash64, stable64


def word_ngrams(text: str, n: int = 2) -> set[str]:
    w = text.split()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 arrays (numpy<2 has no
    bitwise_count)."""
    return np.unpackbits(x.astype(np.uint64).view(np.uint8)).reshape(len(x), 8 * 8).sum(axis=1)


N_PAIR_BUCKETS = 64


def _pairs_by_selfmerge(match_cols: list[str], carry_cols: list[str]):
    """Build a map_groups fn: within one hash bucket, generate all
    co-occurring (id_a < id_b) pairs by a VECTORIZED pandas self-merge
    on the match columns and pre-aggregate the intersection counts —
    one merge per bucket instead of one Python call per group (the
    per-gram map_groups version was ~20x slower)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on=match_cols, suffixes=("_a", "_b"))
        m = m[m["id_a"] < m["id_b"]]
        if m.empty:
            cols = {"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64"), "i": pd.Series([], dtype="int64")}
            for c in carry_cols:
                cols[f"{c}_a"] = pd.Series([], dtype="int64")
                cols[f"{c}_b"] = pd.Series([], dtype="int64")
            return pd.DataFrame(cols)
        aggs = {"i": ("id_a", "size")}
        for c in carry_cols:
            aggs[f"{c}_a"] = (f"{c}_a", "first")
            aggs[f"{c}_b"] = (f"{c}_b", "first")
        return m.groupby(["id_a", "id_b"], as_index=False).agg(**aggs)

    return fn


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard all-pairs (inverted-index pattern)
# ---------------------------------------------------------------------------


def exact_jaccard_pairs(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.5,
) -> rd.Dataset:
    """All pairs with n-gram Jaccard >= threshold.

    (gram-hash, id, n_grams) exploded rows (grams are 64-bit stable
    hashes: 8 bytes shuffled per shingle instead of the string, and a
    natural bucketing key; collision odds among n grams ~ n^2/2^65)
    -> groupby(bucket) with a vectorized self-merge per bucket emitting
    pre-aggregated pair intersection counts -> one small global
    groupby(pair) -> jaccard filter.  The n^2 all-pairs comparison
    never materializes.  Carrying n_grams on every exploded row costs
    8 bytes/row and saves a second shuffle for the sizes.
    """

    def explode(t: pa.Table) -> pa.Table:
        ids_out, gh_out, sizes_out, bucket_out = [], [], [], []
        for i, txt in zip(t.column(id_col).to_pylist(), t.column(text_col).to_pylist()):
            gs = word_ngrams(txt or "", n)
            for g in gs:
                h = stable64(g)
                ids_out.append(i)
                gh_out.append(h)
                sizes_out.append(len(gs))
                bucket_out.append(h % N_PAIR_BUCKETS)
        return pa.Table.from_arrays(
            [
                pa.array(ids_out, pa.int64()),
                pa.array(gh_out, pa.uint64()),
                pa.array(sizes_out, pa.int64()),
                pa.array(bucket_out, pa.int32()),
            ],
            names=["id", "gh", "n_grams", "bucket"],
        )

    grams = docs.map_batches(explode, batch_format="pyarrow")
    pair_fn = _pairs_by_selfmerge(["gh"], carry_cols=["n_grams"])
    pair_hits = grams.groupby("bucket").map_groups(
        lambda g: pair_fn(g.drop(columns=["bucket"])), batch_format="pandas"
    )

    # high-cardinality pair aggregation -> bucketed vectorized groupby
    # (ray's native multi-key aggregate pays ~ms per distinct group)
    from document_ai_ray.pipelines.ops import bucketed_group_agg

    def pair_agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["id_a", "id_b"], as_index=False).agg(
            i=("i", "sum"), na=("n_grams_a", "first"), nb=("n_grams_b", "first")
        )

    inter = bucketed_group_agg(pair_hits, ["id_a", "id_b"], pair_agg)

    def finalize(t: pa.Table) -> pa.Table:
        i = t.column("i").to_numpy().astype(np.float64)
        na = t.column("na").to_numpy().astype(np.float64)
        nb = t.column("nb").to_numpy().astype(np.float64)
        j = i / (na + nb - i)
        keep = j >= threshold
        jr = np.floor(j * 1e6 + 0.5) / 1e6  # DuckDB-ROUND(…, 6) semantics
        out = pa.Table.from_arrays(
            [t.column("id_a"), t.column("id_b"), pa.array(jr, pa.float64())],
            names=["id_a", "id_b", "jaccard"],
        )
        return out.filter(pa.array(keep))

    return inter.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHashBander:
    """Actor stage: doc -> minhash signature -> (band, band_key, id)
    exploded rows.  The permutation table lives in actor state."""

    def __init__(self, id_col: str, text_col: str, n: int, num_perm: int, bands: int):
        assert num_perm % bands == 0
        self.id_col, self.text_col, self.n = id_col, text_col, n
        self.rows_per_band = num_perm // bands
        self.bands = bands
        self.mh = MinHasher(num_perm=num_perm)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids_out, bands_out, keys_out, bucket_out = [], [], [], []
        for i, txt in zip(t.column(self.id_col).to_pylist(), t.column(self.text_col).to_pylist()):
            gs = word_ngrams(txt or "", self.n)
            hs = np.fromiter((stable64(g) for g in gs), dtype=np.uint64, count=len(gs))
            sig = self.mh.signature(hs)
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                k = stable64(chunk.tobytes())
                ids_out.append(i)
                bands_out.append(b)
                keys_out.append(k)
                bucket_out.append(k % N_PAIR_BUCKETS)
        return pa.Table.from_arrays(
            [
                pa.array(ids_out, pa.int64()),
                pa.array(bands_out, pa.int32()),
                pa.array(keys_out, pa.uint64()),
                pa.array(bucket_out, pa.int32()),
            ],
            names=["id", "band", "key", "bucket"],
        )


class JaccardVerifier:
    """Actor stage verifying candidate pairs with TRUE Jaccard.

    Test-scale: the id->shingle-set map is broadcast (ray.put once,
    ray.get in __init__).  At 10^12 docs this becomes two hash joins of
    the candidate pairs against the docs table instead.
    """

    def __init__(self, grams_ref: tuple, threshold: float):
        self.grams: dict[int, set[str]] = ray.get(grams_ref[0])
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        id_a = t.column("id_a").to_pylist()
        id_b = t.column("id_b").to_pylist()
        out_a, out_b, out_j = [], [], []
        for a, b in zip(id_a, id_b):
            ga, gb = self.grams.get(a), self.grams.get(b)
            if not ga or not gb:
                continue
            inter = len(ga & gb)
            j = inter / (len(ga) + len(gb) - inter)
            if j >= self.threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(np.floor(j * 1e6 + 0.5) / 1e6)
        return pa.Table.from_arrays(
            [pa.array(out_a, pa.int64()), pa.array(out_b, pa.int64()), pa.array(out_j, pa.float64())],
            names=["id_a", "id_b", "jaccard"],
        )


def minhash_lsh_pairs(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_perm: int = 128,
    bands: int = 16,
    threshold: float = 0.5,
    concurrency: int = 8,
) -> rd.Dataset:
    """CANDIDATE near-dup pairs via MinHash banding (verify with
    ``verify_pairs`` for final output).

    bands=16 x rows=8: detection prob ~1-(1-s^8)^16 — ≈0.9999 at
    s=0.9 (the planted-dup regime), so recall vs the exact operator is
    ~1 for well-separated corpora; pairs near the threshold can be
    missed (inherent to LSH).
    """
    bander = docs.map_batches(
        MinHashBander,
        fn_constructor_kwargs={
            "id_col": id_col,
            "text_col": text_col,
            "n": n,
            "num_perm": num_perm,
            "bands": bands,
        },
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        num_cpus=1,
    )

    pair_fn = _pairs_by_selfmerge(["band", "key"], carry_cols=[])
    cands = bander.groupby("bucket").map_groups(
        lambda g: pair_fn(g.drop(columns=["bucket"]))[["id_a", "id_b"]], batch_format="pandas"
    )
    return cands.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="_n")).drop_columns(["_n"])


def verify_pairs(cands: rd.Dataset, grams_map: dict[int, set[str]], threshold: float, concurrency: int = 4) -> rd.Dataset:
    ref = ray.put(grams_map)
    return cands.map_batches(
        JaccardVerifier,
        fn_constructor_kwargs={"grams_ref": (ref,), "threshold": threshold},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# SimHash banding
# ---------------------------------------------------------------------------


def simhash_pairs(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    n_blocks: int = 8,
    max_hamming: int = 10,
) -> rd.Dataset:
    """Near-dup pairs via 64-bit SimHash + pigeonhole block banding.

    With 8 blocks of 8 bits, any pair within hamming <= 7 is guaranteed
    to share a block; 8..max_hamming pairs are caught with high
    probability.  Candidates are verified by exact hamming distance.
    """
    block_bits = 64 // n_blocks
    mask = (1 << block_bits) - 1

    def fingerprint(t: pa.Table) -> pa.Table:
        ids_out, blocks_out, keys_out, sh_out, bucket_out = [], [], [], [], []
        for i, txt in zip(t.column(id_col).to_pylist(), t.column(text_col).to_pylist()):
            toks = (txt or "").split()
            th = np.fromiter(
                (stable64(" ".join(toks[k : k + n])) for k in range(max(0, len(toks) - n + 1))),
                dtype=np.uint64,
            )
            sh = simhash64(th)
            for b in range(n_blocks):
                k = (sh >> (b * block_bits)) & mask
                ids_out.append(i)
                blocks_out.append(b)
                keys_out.append(k)
                sh_out.append(sh)
                bucket_out.append((k * 2654435761 + b * 40503) % N_PAIR_BUCKETS)
        return pa.Table.from_arrays(
            [
                pa.array(ids_out, pa.int64()),
                pa.array(blocks_out, pa.int32()),
                pa.array(keys_out, pa.uint64()),
                pa.array(sh_out, pa.uint64()),
                pa.array(bucket_out, pa.int32()),
            ],
            names=["id", "block", "key", "simhash", "bucket"],
        )

    fp = docs.map_batches(fingerprint, batch_format="pyarrow")
    pair_fn = _pairs_by_selfmerge(["block", "key"], carry_cols=["simhash"])

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = pair_fn(g.drop(columns=["bucket"]))
        if m.empty:
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64"),
                    "hamming": pd.Series([], dtype="int64"),
                }
            )
        x = m["simhash_a"].to_numpy(dtype=np.uint64) ^ m["simhash_b"].to_numpy(dtype=np.uint64)
        m = m.assign(hamming=popcount64(x))
        m = m[m["hamming"] <= max_hamming]
        return m[["id_a", "id_b", "hamming"]]

    cands = fp.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pandas")
    return cands.groupby(["id_a", "id_b"]).aggregate(Min("hamming", alias_name="hamming"))
