"""Sweep harness: scoring semantics + seeded random search
(≙ /root/reference/analysis/cv/tuning.py)."""

import json
import os

import pyarrow.parquet as pq
import ray.data as rd

from document_ai_ray.config import DEFAULT_CONFIG
from document_ai_ray.pipelines.extract import extract_pipeline
from document_ai_ray.pipelines.tuning import (
    best_per_metric,
    random_search,
    sample_config,
    score_extraction,
)
from document_ai_ray.synth import pages_table

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "golden_extraction.parquet")


def test_default_config_scores_perfect_vs_golden():
    golden = pq.read_table(GOLDEN)
    res = extract_pipeline(rd.from_arrow(pages_table(200)))
    scores = score_extraction(res, golden)
    g = scores["general"]
    assert g["filling"] == 1.0 and g["content"] == 1.0 and g["fuzzy"] == 1.0
    assert g["text_exact"] == 1.0
    assert scores["n_pairs"] > 0
    assert set(scores["by_lang"]) == {"en", "fr", "de", "es", "it"}


def test_random_search_recovers_incumbent(tmp_path):
    golden = pq.read_table(GOLDEN)
    log = str(tmp_path / "search.jsonl")
    best = random_search(golden, n_iters=3, n_rows=100, seed=11, out_jsonl=log)
    # iteration 0 runs the incumbent (default) config, which produced
    # the goldens -> nothing can beat it, so best is perfect
    assert best["scores"]["general"]["content"] == 1.0
    with open(log) as f:
        lines = [json.loads(l) for l in f]
    assert len(lines) == 3
    assert lines[0]["config"]["min_block_chars"] == DEFAULT_CONFIG.min_block_chars

    bpm = best_per_metric(log)
    assert set(bpm["metric"]) == {"filling", "content", "fuzzy", "text_exact"}
    assert (bpm["value"] == 1.0).all()


def test_sample_config_deterministic():
    import random

    a = sample_config(random.Random(3))
    b = sample_config(random.Random(3))
    assert a == b
