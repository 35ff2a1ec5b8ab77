"""Online single-document entry point.

≙ the reference's request-scoped analysis API
(/root/reference/app/api.py:27-75: receive one document, run the full
detection/analysis/validation chain, return the structured result) —
here a plain function over the same pure per-row kernels the batch
pipeline uses, so "analyze one page now" and the 10^12-page batch path
can never drift apart.

No Ray session is touched: this is the zero-infrastructure path for
debugging a single URL, serving a spot-check endpoint, or unit tests.
"""

from __future__ import annotations

from datetime import datetime

from document_ai_ray.config import DEFAULT_CONFIG, ExtractConfig
from document_ai_ray.stages.html_extract import extract_row
from document_ai_ray.stages.validate import validate_row


def analyze_document(
    payload: bytes,
    url: str = "",
    warc_ts: datetime | None = None,
    lang: str | None = None,
    cfg: ExtractConfig | None = None,
) -> dict:
    """Extract + validate ONE page (HTML or PDF payload, sniffed the
    same way as the batch pipeline).  Returns the full result row with
    `refused_causes` and `validated` attached; never raises — failures
    surface in `error` / causes, matching the batch semantics."""
    row = extract_row(url, warc_ts, lang, payload, cfg or DEFAULT_CONFIG)
    causes, ok = validate_row(row)
    row["refused_causes"] = causes
    row["validated"] = ok
    return row
