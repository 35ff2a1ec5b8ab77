"""Evaluation-metrics queries (≙ the reference's performance harness,
/root/reference/performances.py:129-189, run as a driver-checkable op).

`metrics_cause_confusion` runs the REAL pipeline (synthetic corpus ->
extract -> validate) and aggregates the per-cause confusion matrix
against the intent-derived golden labels.  The oracle is computed from
the SAME intent labels (`synth.expected_causes`) in pure Python and
embedded as a VALUES literal — i.e. the check asserts the engine's
predictions reproduce the labels exactly (tp = label count, fp = fn = 0),
which is the golden-fixture contract expressed as SQL.
"""

from __future__ import annotations

from document_ai_ray.pipelines.registry import register

N_METRICS_ROWS = 300


def _confusion_oracle() -> str:
    from document_ai_ray.config import CAUSES
    from document_ai_ray.synth import expected_causes

    labeled = [c for c in (expected_causes(i) for i in range(N_METRICS_ROWS)) if c is not None]
    n = len(labeled)
    rows = []
    for c in sorted(CAUSES):
        tp = sum(1 for cs in labeled if c in cs)
        rows.append(f"('{c}', {tp}, 0, {n - tp}, 0)")
    return (
        "SELECT * FROM (VALUES " + ", ".join(rows) + ") AS t(cause, tp, fp, tn, fn)"
    )


@register("metrics_cause_confusion", oracle=_confusion_oracle())
def metrics_cause_confusion(sf_dir: str):
    """Per-cause TP/FP/TN/FN of the validator vs golden labels
    (self-contained synthetic corpus; sf_dir unused)."""
    from document_ai_ray.pipelines.extract import extract_pipeline
    from document_ai_ray.pipelines.metrics import cause_confusion
    from document_ai_ray.synth import golden_causes_table, pages_dataset

    res = extract_pipeline(pages_dataset(N_METRICS_ROWS))
    df = cause_confusion(res, golden_causes_table(N_METRICS_ROWS))
    return df[["cause", "tp", "fp", "tn", "fn"]]


@register(
    "metrics_mismatch_listing",
    oracle=(
        "SELECT CAST(NULL AS VARCHAR) AS url, CAST(NULL AS VARCHAR) AS cause, "
        "CAST(NULL AS VARCHAR) AS kind WHERE 1 = 0"
    ),
)
def metrics_mismatch_listing(sf_dir: str):
    """FP/FN listing (≙ get_false_positives_negatives).  The oracle is
    the EMPTY set: the engine must produce zero mismatches against the
    intent labels — any FP/FN row fails the row-count check."""
    import pandas as pd

    from document_ai_ray.pipelines.extract import extract_pipeline
    from document_ai_ray.pipelines.metrics import mismatches
    from document_ai_ray.synth import golden_causes_table, pages_dataset

    res = extract_pipeline(pages_dataset(N_METRICS_ROWS))
    df = mismatches(res, golden_causes_table(N_METRICS_ROWS)).to_pandas()
    # an empty Dataset drops its schema through to_pandas; pin the
    # columns so the (empty) oracle comparison sees the same shape
    return df.reindex(columns=["url", "cause", "kind"]).astype(str) if len(df) else pd.DataFrame(
        {"url": pd.Series(dtype=str), "cause": pd.Series(dtype=str), "kind": pd.Series(dtype=str)}
    )
