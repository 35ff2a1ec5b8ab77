"""Plain-text metrics report.

≙ the reference's matplotlib metric plots
(/root/reference/ai_documents/plotting.py:9-120,
/root/reference/scripts/metric_plotting_script.py): per-refusal-cause
precision/recall bars over the confusion counts.  No plotting libraries
exist in this environment, so the same content renders as a markdown
table + ASCII bars — trivially diffable and greppable, which is what a
100 TB batch run's logs want anyway.
"""

from __future__ import annotations

import pandas as pd

BAR_WIDTH = 24


def _bar(x: float) -> str:
    n = int(round(x * BAR_WIDTH))
    return "#" * n + "." * (BAR_WIDTH - n)


def render_confusion_report(df: pd.DataFrame) -> str:
    """Confusion dataframe (cause, tp, fp, fn[, tn]) -> markdown report
    with per-cause precision / recall / F1 and ASCII bars."""
    lines = [
        "# Refusal-cause confusion report",
        "",
        "| cause | tp | fp | fn | precision | recall | f1 | recall bar |",
        "|---|---:|---:|---:|---:|---:|---:|---|",
    ]
    tot_tp = tot_fp = tot_fn = 0
    for _, r in df.sort_values("cause").iterrows():
        tp, fp, fn = int(r["tp"]), int(r["fp"]), int(r["fn"])
        tot_tp, tot_fp, tot_fn = tot_tp + tp, tot_fp + fp, tot_fn + fn
        prec = tp / (tp + fp) if tp + fp else 1.0
        rec = tp / (tp + fn) if tp + fn else 1.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        lines.append(
            f"| {r['cause']} | {tp} | {fp} | {fn} "
            f"| {prec:.3f} | {rec:.3f} | {f1:.3f} | `{_bar(rec)}` |"
        )
    prec = tot_tp / (tot_tp + tot_fp) if tot_tp + tot_fp else 1.0
    rec = tot_tp / (tot_tp + tot_fn) if tot_tp + tot_fn else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    lines += [
        "",
        f"**micro-avg** precision {prec:.3f} · recall {rec:.3f} · f1 {f1:.3f} "
        f"(tp={tot_tp} fp={tot_fp} fn={tot_fn})",
        "",
    ]
    return "\n".join(lines)
