"""Hyperparameter sweep harness — seeded random search scored against
golden fixtures.

Re-expresses the reference's tuning loop (/root/reference/analysis/cv/
tuning.py):

  - accuracy metrics `filling/content/fuzzy` (tuning.py:24-79) ->
    `score_extraction` per (url, field) with the same three-way
    sentinel-aware semantics;
  - nested general/by_file/by_block/by_key aggregation
    (tuning.py:82-167) -> one exploded (url, field, ...) frame,
    aggregated general / by_field / by_lang;
  - random config sampling + JSONL append + best-per-metric scan
    (tuning.py:291-345, 347-397) -> `random_search` (seeded RNG, one
    Dataset job per config, driver-side fan-out as SURVEY.md §2.6
    prescribes — config search is control flow, not data flow).
"""

from __future__ import annotations

import json
import os
import random
from dataclasses import replace

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from document_ai_ray.config import DEFAULT_CONFIG, STATUS_FOUND, ExtractConfig
from document_ai_ray.functions.strings import levenshtein
from document_ai_ray.pipelines.extract import extract_pipeline
from document_ai_ray.synth import pages_dataset

# search space (≙ the reference's hyperparams_possible_values,
# tuning.py:400-447 — geometric/OCR knobs become scoring knobs)
SEARCH_SPACE: dict[str, list] = {
    "min_block_chars": [10, 25, 40, 80],
    "max_link_density": [0.2, 0.35, 0.5],
    "chrome_min_chars": [40, 80, 160],
    "distance_margin": [0, 1, 2],
    "min_yield_ratio": [0.1, 0.2, 0.4],
}


def _golden_fields(g: pa.Table) -> dict:
    return {
        u: (dict(f or {}), dict(s or {}), t or "")
        for u, f, s, t in zip(
            g.column("url").to_pylist(),
            g.column("fields").to_pylist(),
            g.column("field_status").to_pylist(),
            g.column("extracted_text").to_pylist(),
        )
    }


def _score_batch(t: pa.Table, golden_ref: tuple) -> pa.Table:
    """Per-batch scoring vs broadcast golden fields (one row out per
    (url, field); task stage with per-worker broadcast cache)."""
    from document_ai_ray.pipelines.ops import get_broadcast

    fields_map = get_broadcast(golden_ref, _golden_fields, tag="golden-fields")
    rows = []
    for u, lang, f, s, txt in zip(
        t.column("url").to_pylist(),
        t.column("lang").to_pylist(),
        t.column("fields").to_pylist(),
        t.column("field_status").to_pylist(),
        t.column("extracted_text").to_pylist(),
    ):
        if u not in fields_map:
            continue
        gf, gs, gtext = fields_map[u]
        f, s = dict(f or {}), dict(s or {})
        for fld in set(gs) | set(s):
            want_status = gs.get(fld, "NOT_FOUND")
            got_status = s.get(fld, "NOT_FOUND")
            filling = float(
                (want_status == STATUS_FOUND) == (got_status == STATUS_FOUND)
            )
            want_v, got_v = gf.get(fld), f.get(fld)
            if want_status == STATUS_FOUND:
                content = float(got_v == want_v)
                if got_v and want_v:
                    d = levenshtein(got_v, want_v)
                    fuzzy = 1.0 - d / max(len(got_v), len(want_v))
                else:
                    fuzzy = content
            else:  # nothing to extract: correct iff nothing extracted
                content = fuzzy = float(got_v is None)
            rows.append(
                {
                    "url": u,
                    "lang": lang,
                    "field": fld,
                    "filling": filling,
                    "content": content,
                    "fuzzy": fuzzy,
                    "text_exact": float(txt == gtext),
                }
            )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("lang", pa.string()),
                ("field", pa.string()),
                ("filling", pa.float64()),
                ("content", pa.float64()),
                ("fuzzy", pa.float64()),
                ("text_exact", pa.float64()),
            ]
        ),
    )


def score_extraction(
    results: rd.Dataset, golden: pa.Table
) -> dict:
    """-> {general: {...}, by_field: {...}, by_lang: {...}} (≙
    compute_metrics_for_multiple_jsons, tuning.py:82-167)."""
    ref = ray.put(golden)
    scored = results.map_batches(
        _score_batch, fn_kwargs={"golden_ref": (ref,)}, batch_format="pyarrow"
    )
    df = scored.to_pandas()  # (url x field) rows: small
    metrics = ["filling", "content", "fuzzy", "text_exact"]
    return {
        "general": {m: float(df[m].mean()) for m in metrics},
        "by_field": {
            k: {m: float(v[m].mean()) for m in metrics} for k, v in df.groupby("field")
        },
        "by_lang": {
            k: {m: float(v[m].mean()) for m in metrics} for k, v in df.groupby("lang")
        },
        "n_pairs": int(len(df)),
    }


def sample_config(rng: random.Random) -> ExtractConfig:
    return replace(
        DEFAULT_CONFIG, **{k: rng.choice(v) for k, v in SEARCH_SPACE.items()}
    )


def random_search(
    golden: pa.Table,
    n_iters: int = 10,
    n_rows: int = 200,
    seed: int = 7,
    out_jsonl: str | None = None,
    objective: str = "content",
) -> dict:
    """Seeded random search: one streaming pipeline run per sampled
    config, scored vs golden; appends one JSONL line per iteration
    (≙ tuning.py:317-319) and returns the best result."""
    rng = random.Random(seed)
    best: dict | None = None
    for it in range(n_iters):
        cfg = sample_config(rng) if it else DEFAULT_CONFIG  # iter 0 = incumbent
        res = extract_pipeline(pages_dataset(n_rows), cfg)
        scores = score_extraction(res, golden)
        rec = {
            "iter": it,
            "config": {k: getattr(cfg, k) for k in SEARCH_SPACE},
            "scores": scores,
        }
        if out_jsonl:
            os.makedirs(os.path.dirname(out_jsonl) or ".", exist_ok=True)
            with open(out_jsonl, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if best is None or scores["general"][objective] > best["scores"]["general"][objective]:
            best = rec
    return best


def best_per_metric(jsonl_path: str) -> pd.DataFrame:
    """Scan a search log for the best config per metric (≙ the
    streaming-max scan, tuning.py:347-397)."""
    rows = []
    with open(jsonl_path) as f:
        for line in f:
            rec = json.loads(line)
            for m, v in rec["scores"]["general"].items():
                rows.append({"metric": m, "value": v, "iter": rec["iter"], **rec["config"]})
    df = pd.DataFrame(rows)
    idx = df.groupby("metric")["value"].idxmax()
    return df.loc[idx].reset_index(drop=True)
