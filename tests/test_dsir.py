"""DSIR importance weights: discriminative direction, edge cases,
determinism."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from document_ai_ray.stages.dsir import dsir_logweights


def _corpus():
    rng = np.random.RandomState(3)
    voc_t = ["alpha", "beta", "gamma", "delta"]
    voc_o = ["uno", "dos", "tres", "quatro"]
    rows = []
    for i in range(60):
        tgt = i % 2 == 0
        voc = voc_t if tgt else voc_o
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(rng.choice(voc, 30)),
                "lang": "en" if tgt else "es",
            }
        )
    rows.append({"doc_id": 100, "text": "solo", "lang": "en"})   # 0 bigrams
    rows.append({"doc_id": 101, "text": "", "lang": "es"})       # empty
    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_target_docs_score_higher():
    out = {r["doc_id"]: r for r in dsir_logweights(_corpus()).take_all()}
    assert len(out) == 62
    t_mean = np.mean([out[i]["logweight"] for i in range(0, 60, 2)])
    o_mean = np.mean([out[i]["logweight"] for i in range(1, 60, 2)])
    # target-distribution docs must score clearly above the others
    assert t_mean > 0 > o_mean
    assert out[0]["n_bigrams"] == 29


def test_short_docs_zero():
    out = {r["doc_id"]: r for r in dsir_logweights(_corpus()).take_all()}
    for did in (100, 101):
        assert out[did]["n_bigrams"] == 0
        assert out[did]["logweight"] == 0.0


def test_deterministic():
    a = sorted((r["doc_id"], r["logweight"]) for r in dsir_logweights(_corpus()).take_all())
    b = sorted((r["doc_id"], r["logweight"]) for r in dsir_logweights(_corpus()).take_all())
    assert a == b
