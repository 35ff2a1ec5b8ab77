"""BM25 lexical search: exact parity with a straight-line reference
implementation, plus structural properties of the streaming stats."""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from document_ai_ray.stages.bm25 import (
    B,
    K1,
    bm25_topk,
    corpus_stats,
    score_batch,
    stats_partial,
)

DOCS = [
    "spark spark hash merge",
    "window sort table",
    "hash hash hash",
    "no query terms here at all",
    "",
    "  spark  ",  # double spaces -> empty tokens dropped
]
TERMS = ["spark", "hash", "window"]


def _ref_scores():
    """Dependence-free BM25 over DOCS (tokenize = split, drop '')."""
    toks = [[w for w in d.split(" ") if w] for d in DOCS]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    df = [sum(1 for t in toks if q in t) for q in TERMS]
    out = {}
    for i, t in enumerate(toks):
        s = 0.0
        for j, q in enumerate(TERMS):
            tf = t.count(q)
            idf = math.log((n - df[j] + 0.5) / (df[j] + 0.5) + 1.0)
            s += idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * len(t) / avgdl))
        if s > 0:
            out[i] = round(s, 6)
    return out


def _table():
    return pa.table(
        {"doc_id": pa.array(range(len(DOCS)), pa.int64()), "text": pa.array(DOCS)}
    )


def test_stats_partial_counts():
    p = stats_partial(_table(), TERMS)
    assert p.column("n_docs")[0].as_py() == 6
    # 4 + 3 + 3 + 6 + 0 + 1 tokens
    assert p.column("sum_dl")[0].as_py() == 17
    assert [p.column(f"df_{j}")[0].as_py() for j in range(3)] == [2, 2, 1]


def test_corpus_stats_merge_over_blocks(ray_session):
    # 3 blocks -> 3 partial rows, merged on the driver
    ds = rd.from_arrow(_table()).repartition(3)
    n, avgdl, df = corpus_stats(ds, TERMS)
    assert n == 6 and df == [2, 2, 1]
    assert abs(avgdl - 17 / 6) < 1e-12


def test_score_batch_matches_reference():
    ref = _ref_scores()
    got = score_batch(_table(), TERMS, n_docs=6, avgdl=17 / 6, df=[2, 2, 1])
    got_map = dict(
        zip(got.column("doc_id").to_pylist(), got.column("score").to_pylist())
    )
    assert set(got_map) == set(ref)  # only docs containing a term
    for i, s in ref.items():
        assert got_map[i] == np.float64(s) or abs(got_map[i] - s) < 1e-9


def test_bm25_topk_order_and_cut(ray_session):
    ref = _ref_scores()
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    out = bm25_topk(lambda: rd.from_arrow(_table()).repartition(2), TERMS, 3)
    rows = out.to_pandas().sort_values(["score", "doc_id"], ascending=[False, True])
    got = list(zip(rows["doc_id"], rows["score"]))
    assert [(i, round(s, 6)) for i, s in got] == [(i, s) for i, s in want]


def test_more_occurrences_score_higher(ray_session):
    # same doc length, increasing tf of one query term -> higher score
    docs = ["hash a b c", "hash hash b c", "hash hash hash c"]
    t = pa.table({"doc_id": pa.array(range(3), pa.int64()), "text": pa.array(docs)})
    out = bm25_topk(lambda: rd.from_arrow(t), ["hash"], 3).to_pandas()
    out = out.set_index("doc_id")["score"]
    assert out[2] > out[1] > out[0] > 0
