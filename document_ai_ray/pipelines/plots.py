"""Dependency-free SVG metric plots.

≙ the reference's matplotlib visualization modules
(/root/reference/ai_documents/plotting.py:9-120 bounding-box overlays,
/root/reference/scripts/metric_plotting_script.py:7-59 grouped
per-cause metric bars).  No plotting library exists in this container,
so the charts are rendered directly as SVG — deterministic strings
(testable byte-for-byte), viewable in any browser, and cheap enough to
emit from a driver-side summary of a 100 TB run (the input is always
an already-aggregated, output-sized frame, never the corpus).
"""

from __future__ import annotations

from xml.sax.saxutils import escape

import pandas as pd

_PALETTE = ["#4e79a7", "#f28e2b", "#59a14f", "#e15759", "#76b7b2", "#b07aa1"]


def _svg_header(width: int, height: int, title: str) -> list[str]:
    return [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}" font-family="sans-serif">',
        f'<title>{escape(title)}</title>',
        f'<rect width="{width}" height="{height}" fill="white"/>',
        f'<text x="{width / 2:.0f}" y="18" text-anchor="middle" font-size="14" '
        f'font-weight="bold">{escape(title)}</text>',
    ]


def svg_grouped_bars(
    df: pd.DataFrame,
    label_col: str,
    metric_cols: list[str],
    title: str = "",
    width: int = 640,
    bar_height: int = 160,
) -> str:
    """One horizontal panel per metric column, one bar per label —
    the layout of the reference's metric_plotting_script (metrics
    stacked vertically, causes on the x axis, one color per series)."""
    labels = [str(x) for x in df[label_col].tolist()]
    n = max(1, len(labels))
    panel_pad, left, bottom = 34, 50, 40
    height = panel_pad + len(metric_cols) * (bar_height + bottom)
    out = _svg_header(width, height, title)
    slot = (width - left - 10) / n
    bw = max(4.0, slot * 0.6)
    for mi, metric in enumerate(metric_cols):
        top = panel_pad + mi * (bar_height + bottom)
        vals = [float(v) for v in df[metric].tolist()]
        vmax = max([abs(v) for v in vals] + [1e-12])
        color = _PALETTE[mi % len(_PALETTE)]
        out.append(
            f'<text x="{left}" y="{top + 12}" font-size="12" '
            f'font-weight="bold">{escape(metric)}</text>'
        )
        base = top + bar_height
        out.append(
            f'<line x1="{left}" y1="{base}" x2="{width - 10}" y2="{base}" '
            f'stroke="#888" stroke-width="1"/>'
        )
        for i, (lab, v) in enumerate(zip(labels, vals)):
            h = (abs(v) / vmax) * (bar_height - 20)
            x = left + i * slot + (slot - bw) / 2
            out.append(
                f'<rect x="{x:.1f}" y="{base - h:.1f}" width="{bw:.1f}" '
                f'height="{h:.1f}" fill="{color}"/>'
            )
            out.append(
                f'<text x="{x + bw / 2:.1f}" y="{base - h - 3:.1f}" text-anchor="middle" '
                f'font-size="9">{v:g}</text>'
            )
            out.append(
                f'<text x="{x + bw / 2:.1f}" y="{base + 12}" text-anchor="end" '
                f'font-size="9" transform="rotate(-30 {x + bw / 2:.1f} {base + 12})">'
                f"{escape(lab)}</text>"
            )
    out.append("</svg>")
    return "\n".join(out)


def svg_confusion_report(df: pd.DataFrame, title: str = "Refusal-cause metrics") -> str:
    """Confusion frame (cause, tp, fp, fn) -> grouped bars of
    precision / recall / f1 per cause — the SVG analogue of the
    reference's error-analysis plot."""
    d = df.sort_values("cause").copy()
    tp, fp, fn = (d[c].astype(float) for c in ("tp", "fp", "fn"))
    d["precision"] = (tp / (tp + fp)).fillna(1.0).round(3)
    d["recall"] = (tp / (tp + fn)).fillna(1.0).round(3)
    d["f1"] = (
        2 * d["precision"] * d["recall"] / (d["precision"] + d["recall"])
    ).fillna(0.0).round(3)
    return svg_grouped_bars(
        d, "cause", ["precision", "recall", "f1"], title=title
    )


def svg_block_spans(
    blocks: list[dict],
    doc_len: int,
    title: str = "Extracted block map",
    width: int = 640,
) -> str:
    """Block offset spans -> rectangles over the document axis — the
    span-space analogue of the reference's bounding-box overlay
    (blocks have 1-D text offsets here, not 2-D page coordinates).
    Each block dict needs (start, end[, kind]); kind colors the box."""
    left, row_h, top0 = 50, 22, 34
    height = top0 + row_h * max(1, len(blocks)) + 20
    out = _svg_header(width, height, title)
    span_w = width - left - 20
    kinds = sorted({str(b.get("kind", "block")) for b in blocks})
    color_of = {k: _PALETTE[i % len(_PALETTE)] for i, k in enumerate(kinds)}
    out.append(
        f'<line x1="{left}" y1="{top0 - 6}" x2="{left + span_w}" y2="{top0 - 6}" '
        f'stroke="#888"/>'
    )
    for i, b in enumerate(blocks):
        s, e = int(b["start"]), int(b["end"])
        kind = str(b.get("kind", "block"))
        x = left + span_w * (s / max(1, doc_len))
        w = max(1.0, span_w * ((e - s) / max(1, doc_len)))
        y = top0 + i * row_h
        out.append(
            f'<rect x="{x:.1f}" y="{y}" width="{w:.1f}" height="{row_h - 6}" '
            f'fill="{color_of[kind]}" fill-opacity="0.7" stroke="#333" stroke-width="0.5"/>'
        )
        out.append(
            f'<text x="{left - 4}" y="{y + row_h - 10}" text-anchor="end" '
            f'font-size="9">{escape(kind)} {s}-{e}</text>'
        )
    out.append("</svg>")
    return "\n".join(out)
