"""PDF branch: layout parse + reading-order reconstruction.

Mirrors the reference's PDF rasterization branch
(/root/reference/analysis/cv/document_parsing.py:5-14 `convert_pdf_to_jpg`)
re-expressed as a *layout* problem in the style of pdfminer: the payload
carries positioned text lines; we rebuild reading order by (-y, x) —
the analogue of the reference's rotation/orientation normalization
(/root/reference/detection/sam.py:104-145) plus cartesian conversion
(/root/reference/analysis/cv/document_parsing.py:16-29) — then group
lines into blocks by vertical gaps.

Real PDF decoding (poppler / pdfminer) is NOT available in this
container, so the parser handles the deterministic synthetic subset
produced by ``synth.make_pdf_bytes``; any other PDF payload yields a
``pdf_parse_error`` row (never an exception), matching the reference's
row-level fallback semantics (/root/reference/performances.py:282-294).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_TJ_RE = re.compile(
    rb"BT /F\d+ (\d+) Tf ([0-9.]+) ([0-9.]+) Td \(((?:[^()\\]|\\.)*)\) Tj ET"
)
_UNESC = {b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\"}
GAP_FACTOR = 1.5


@dataclass
class PdfBlock:
    text: str
    y_top: float
    size: int
    heading: bool
    lines: list[str] = field(default_factory=list)


def parse_pdf(payload: bytes) -> tuple[list[PdfBlock], list[str], str | None]:
    """-> (blocks in reading order, individual lines in reading order,
    error-or-None).  Pure function; never raises."""
    try:
        if not payload.startswith(b"%PDF-"):
            return [], [], "pdf_parse_error:not_pdf"
        raw = _TJ_RE.findall(payload)
        if not raw:
            return [], [], "pdf_parse_error:no_text_objects"
        items = []
        for size_b, x_b, y_b, txt_b in raw:
            for esc, rep in _UNESC.items():
                txt_b = txt_b.replace(esc, rep)
            items.append((float(y_b), float(x_b), int(size_b), txt_b.decode("utf-8", "replace")))
        # reading order: top-to-bottom, then left-to-right
        items.sort(key=lambda t: (-t[0], t[1]))
        blocks: list[PdfBlock] = []
        lines: list[str] = []
        prev_y: float | None = None
        prev_size = 12
        for y, _x, size, text in items:
            lines.append(text)
            new_block = (
                prev_y is None
                or (prev_y - y) > GAP_FACTOR * prev_size
                or size != prev_size
            )
            if new_block:
                blocks.append(PdfBlock(text=text, y_top=y, size=size, heading=size >= 16, lines=[text]))
            else:
                b = blocks[-1]
                b.lines.append(text)
                b.text = f"{b.text} {text}"
            prev_y, prev_size = y, size
        return blocks, lines, None
    except Exception as exc:  # defensive: a bad payload must not kill the batch
        return [], [], f"pdf_parse_error:{type(exc).__name__}"
