"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Hashed-bigram bag-of-words importance weights: estimate a target
bucket distribution p_t from an in-corpus target subset (here a column
predicate, e.g. lang='en') and a raw distribution p_r from the whole
corpus, both over `N_BUCKETS` hashed word-bigram buckets with add-one
smoothing, then score every document with

    logweight(doc) = Σ_occurrences ln( p_t[bucket] / p_r[bucket] )

High-weight documents "look like" the target distribution — the
standard importance-resampling signal for pretraining data selection.

Hash contract (shared verbatim with the DuckDB oracle in
`pipelines/text_queries.py`): bigram rendered as tok[i] + ' ' +
tok[i+1] over text.split(' '); bucket = int(md5(bigram)[:8 hex], 16)
% N_BUCKETS — md5 because DuckDB exposes it, making the whole operator
oracle-checkable.

Scale shape: the two histograms are fixed-size vectors (N_BUCKETS
ints), so they partial-aggregate inside map_batches (one pair of
vectors per block — no groupby, no shuffle), merge through a single
repartition(1) task, and the resulting log-ratio vector broadcasts via
ray.put to the scoring pass.  Both passes stream; nothing corpus-sized
ever concentrates.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from document_ai_ray.pipelines.ops import get_broadcast, round_cols

N_BUCKETS = 1024

# per-worker gram->bucket cache (vocabulary is small relative to token
# stream; same convention as stages/dedup.py's word-hash cache)
_GRAM_B: dict[str, int] = {}
_GRAM_B_MAX = 1 << 20


def _doc_buckets(text: str | None) -> np.ndarray:
    """Hashed-bigram bucket ids for every bigram OCCURRENCE in order."""
    toks = (text or "").split(" ")
    if len(toks) < 2:
        return np.empty(0, np.int64)
    out = np.empty(len(toks) - 1, np.int64)
    for i in range(len(toks) - 1):
        g = toks[i] + " " + toks[i + 1]
        b = _GRAM_B.get(g)
        if b is None:
            b = int(hashlib.md5(g.encode("utf-8", "surrogatepass")).hexdigest()[:8], 16) % N_BUCKETS
            if len(_GRAM_B) < _GRAM_B_MAX:
                _GRAM_B[g] = b
        out[i] = b
    return out


def _log_ratio_vector(
    docs: rd.Dataset, text_col: str, target_col: str, target_value
) -> np.ndarray:
    """ln(p_t/p_r) over buckets, add-one smoothed, via streaming
    per-block histogram partials + one tiny final merge."""

    def partial(t: pa.Table) -> pa.Table:
        raw = np.zeros(N_BUCKETS, np.int64)
        tgt = np.zeros(N_BUCKETS, np.int64)
        is_t = np.asarray(
            pa.compute.equal(t.column(target_col), target_value).to_numpy(
                zero_copy_only=False
            )
        )
        for txt, it in zip(t.column(text_col).to_pylist(), is_t):
            b = _doc_buckets(txt)
            if len(b):
                h = np.bincount(b, minlength=N_BUCKETS)
                raw += h
                if it:
                    tgt += h
        return pa.table({"raw": [raw.tolist()], "tgt": [tgt.tolist()]})

    def merge(t: pa.Table) -> pa.Table:
        raw = np.asarray(t.column("raw").to_pylist(), np.int64).sum(axis=0)
        tgt = np.asarray(t.column("tgt").to_pylist(), np.int64).sum(axis=0)
        return pa.table({"raw": [raw.tolist()], "tgt": [tgt.tolist()]})

    merged = (
        docs.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
        .take_all()
    )[0]
    raw = np.asarray(merged["raw"], np.float64)
    tgt = np.asarray(merged["tgt"], np.float64)
    return np.log((tgt + 1.0) / (tgt.sum() + N_BUCKETS)) - np.log(
        (raw + 1.0) / (raw.sum() + N_BUCKETS)
    )


def dsir_logweights(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_value="en",
) -> rd.Dataset:
    """(doc_id, n_bigrams, logweight) for every document; logweight
    rounded to 6 places with the DuckDB ROUND convention."""
    lr_ref = (ray.put(_log_ratio_vector(docs, text_col, target_col, target_value)),)

    def score(t: pa.Table) -> pa.Table:
        lr = get_broadcast(lr_ref, tag="dsir_lr")
        ids = t.column(id_col).to_pylist()
        n_out = np.empty(len(ids), np.int64)
        w_out = np.empty(len(ids), np.float64)
        for i, txt in enumerate(t.column(text_col).to_pylist()):
            b = _doc_buckets(txt)
            n_out[i] = len(b)
            w_out[i] = lr[b].sum() if len(b) else 0.0
        out = pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_bigrams": pa.array(n_out),
                "logweight": pa.array(w_out),
            }
        )
        return round_cols(out, {"logweight": 6})

    return docs.map_batches(score, batch_format="pyarrow")
