"""BM25 lexical search over a space-tokenized text column.

The missing half of the similarity-search suite (`stages/similarity.py`
covers dense/embedding retrieval): classic sparse keyword retrieval as
two streaming passes over the corpus —

  pass 1  per-batch partial corpus stats (n_docs, total token length,
          per-query-term document frequency), merged on the driver
          (|query| + 2 numbers, never corpus-sized);
  pass 2  per-batch vectorized scoring against the broadcast stats,
          then a streaming top-k (`ops.topk`) — k rows per block move,
          no global sort.

Tokenization is split-on-single-space with empties dropped, byte-parity
with DuckDB ``list_filter(string_split(text, ' '), x -> x != '')`` so
the oracle can reproduce scores exactly.

At 100 TB: pass 1 is a combiner-style partial aggregate (one tiny row
per batch), pass 2 streams with O(batch) memory — nothing corpus-sized
ever sits on the driver or in a single task.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

K1 = 1.2
B = 0.75


def _tokens_with_rows(texts) -> tuple[pa.Array, np.ndarray]:
    """Flatten space-split tokens + owning row index, empties dropped —
    all pyarrow kernels (same vectorized explode as the unigram LM)."""
    lists = pc.split_pattern(texts, " ")
    n_per_row = pc.list_value_length(lists).fill_null(0).to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(len(n_per_row), dtype=np.int64), n_per_row)
    flat = pc.list_flatten(lists)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return flat.filter(pa.array(keep)), row_idx[keep]


def _term_tf(flat: pa.Array, row_idx: np.ndarray, term: str, n_rows: int) -> np.ndarray:
    mask = pc.equal(flat, term).to_numpy(zero_copy_only=False)
    return np.bincount(row_idx[mask], minlength=n_rows).astype(np.float64)


def stats_partial(t: pa.Table, terms: list[str], text_col: str = "text") -> pa.Table:
    """One partial-stats row per batch: (n_docs, sum_dl, df per term)."""
    flat, row_idx = _tokens_with_rows(t.column(text_col))
    n = len(t)
    dl = np.bincount(row_idx, minlength=n)
    cols: dict[str, pa.Array] = {
        "n_docs": pa.array([n], pa.int64()),
        "sum_dl": pa.array([int(dl.sum())], pa.int64()),
    }
    for j, term in enumerate(terms):
        tf = _term_tf(flat, row_idx, term, n)
        cols[f"df_{j}"] = pa.array([int((tf > 0).sum())], pa.int64())
    return pa.table(cols)


def corpus_stats(ds, terms: list[str], text_col: str = "text") -> tuple[int, float, list[int]]:
    """Merge the partial rows into (n_docs, avgdl, df list).  The
    partials are one tiny row per batch — driver-side merge is sound."""
    parts = ds.map_batches(
        lambda t: stats_partial(t, terms, text_col), batch_format="pyarrow"
    )
    n_docs, sum_dl = 0, 0
    df = [0] * len(terms)
    for b in parts.iter_batches(batch_format="pyarrow"):
        n_docs += int(pc.sum(b.column("n_docs")).as_py() or 0)
        sum_dl += int(pc.sum(b.column("sum_dl")).as_py() or 0)
        for j in range(len(terms)):
            df[j] += int(pc.sum(b.column(f"df_{j}")).as_py() or 0)
    avgdl = float(sum_dl) / float(n_docs) if n_docs else 0.0
    return n_docs, avgdl, df


def score_batch(
    t: pa.Table,
    terms: list[str],
    n_docs: int,
    avgdl: float,
    df: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 6,
) -> pa.Table:
    """Vectorized BM25 scoring; emits only rows with score > 0, score
    ROUNDed to `decimals` (copysign-floor, == DuckDB ROUND)."""
    flat, row_idx = _tokens_with_rows(t.column(text_col))
    n = len(t)
    dl = np.bincount(row_idx, minlength=n).astype(np.float64)
    norm = K1 * (1.0 - B + B * dl / avgdl)
    score = np.zeros(n, dtype=np.float64)
    for j, term in enumerate(terms):
        idf = np.log((n_docs - df[j] + 0.5) / (df[j] + 0.5) + 1.0)
        tf = _term_tf(flat, row_idx, term, n)
        score += idf * tf * (K1 + 1.0) / (tf + norm)
    keep = score > 0.0
    ids = t.column(id_col).to_numpy(zero_copy_only=False)[keep]
    s = score[keep]
    p = 10.0**decimals
    s = np.copysign(np.floor(np.abs(s) * p + 0.5), s) / p
    return pa.table(
        {id_col: pa.array(ids, pa.int64()), "score": pa.array(s, pa.float64())}
    )


def bm25_topk(make_ds, terms: list[str], k: int, id_col: str = "doc_id", text_col: str = "text"):
    """Full BM25 retrieval: stats pass -> scoring pass -> streaming
    top-k ordered by (rounded score desc, id asc).  `make_ds` is a
    zero-arg factory returning a fresh Dataset (two passes over the
    corpus; each streams)."""
    from document_ai_ray.pipelines.ops import topk

    n_docs, avgdl, df = corpus_stats(make_ds(), terms, text_col)
    scored = make_ds().map_batches(
        score_batch,
        fn_kwargs={
            "terms": terms,
            "n_docs": n_docs,
            "avgdl": avgdl,
            "df": df,
            "id_col": id_col,
            "text_col": text_col,
        },
        batch_format="pyarrow",
    )
    return topk(scored, [("score", True), (id_col, False)], k)
