"""Evaluation metrics: predictions vs golden causes.

Re-expresses the reference's batch-evaluation harness
(/root/reference/performances.py:40-93, 129-189):

  - per-batch confusion partials ≙ `expand_df` + `calculate_metrics`
    (explode doc x cause membership, per-cause TP/FP/TN/FN,
    accuracy/precision/recall incl. the quality-conditioning)
  - broadcast join on url ≙ `pd.merge(..., on='document_name')`
  - FP/FN listings ≙ `get_false_positives_negatives`

The golden side is small relative to the corpus (labeled subset), so it
broadcasts (ray.put once, materialized once per worker); the
explode+aggregate runs distributed over predictions as task stages.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from document_ai_ray.config import CAUSES


def _golden_map(golden: pa.Table) -> dict[str, set]:
    return {
        u: set(c or [])
        for u, c in zip(golden.column("url").to_pylist(), golden.column("causes").to_pylist())
    }


def _confusion_batch(t: pa.Table, golden_ref: tuple) -> pa.Table:
    """results x golden -> 14-row partial confusion matrix per batch
    (combiner pattern: the final merge sums tiny partials)."""
    from document_ai_ray.pipelines.ops import get_broadcast

    gm = get_broadcast(golden_ref, _golden_map, tag="golden-causes")
    urls = t.column("url").to_pylist()
    preds = t.column("refused_causes").to_pylist()
    counts = {c: np.zeros(4, dtype=np.int64) for c in CAUSES}  # tp, fp, tn, fn
    for u, p in zip(urls, preds):
        if u not in gm:
            continue
        actual = gm[u]
        pred = set(p or [])
        for c in CAUSES:
            a, q = c in actual, c in pred
            if a and q:
                counts[c][0] += 1
            elif not a and q:
                counts[c][1] += 1
            elif not a and not q:
                counts[c][2] += 1
            else:
                counts[c][3] += 1
    rows = [
        {"cause": c, "tp": int(v[0]), "fp": int(v[1]), "tn": int(v[2]), "fn": int(v[3])}
        for c, v in counts.items()
    ]
    return pa.Table.from_pylist(rows)


def cause_confusion(results: rd.Dataset, golden: pa.Table, concurrency: int = 4) -> pd.DataFrame:
    """Per-cause confusion + derived metrics (small result -> pandas)."""
    ref = ray.put(golden)
    partials = results.map_batches(
        _confusion_batch, fn_kwargs={"golden_ref": (ref,)}, batch_format="pyarrow"
    )
    df = partials.to_pandas().groupby("cause", as_index=False).sum()
    n = df[["tp", "fp", "tn", "fn"]].sum(axis=1)
    df["accuracy"] = (df.tp + df.tn) / n.where(n > 0, 1)
    df["precision"] = df.tp / (df.tp + df.fp).where((df.tp + df.fp) > 0, 1)
    df["recall"] = df.tp / (df.tp + df.fn).where((df.tp + df.fn) > 0, 1)
    return df.sort_values("cause").reset_index(drop=True)


def _mismatch_batch(t: pa.Table, golden_ref: tuple) -> pa.Table:
    """FP/FN row listings (≙ get_false_positives_negatives)."""
    from document_ai_ray.pipelines.ops import get_broadcast

    gm = get_broadcast(golden_ref, _golden_map, tag="golden-causes")
    urls = t.column("url").to_pylist()
    preds = t.column("refused_causes").to_pylist()
    out = []
    for u, p in zip(urls, preds):
        if u not in gm:
            continue
        actual, pred = gm[u], set(p or [])
        for c in pred - actual:
            out.append({"url": u, "cause": c, "kind": "fp"})
        for c in actual - pred:
            out.append({"url": u, "cause": c, "kind": "fn"})
    return pa.Table.from_pylist(out) if out else pa.Table.from_pylist(
        [], schema=pa.schema([("url", pa.string()), ("cause", pa.string()), ("kind", pa.string())])
    )


def mismatches(results: rd.Dataset, golden: pa.Table, concurrency: int = 4) -> rd.Dataset:
    ref = ray.put(golden)
    return results.map_batches(
        _mismatch_batch, fn_kwargs={"golden_ref": (ref,)}, batch_format="pyarrow"
    )
