"""Rule-based validator -> refused_causes + validated.

Re-expresses the reference's `ResultValidator`
(/root/reference/validation/entities.py:27-143): a battery of
deterministic rule checks over the extraction result, each appending a
cause string; `validated` iff no causes.  The 14-cause vocabulary lives
in ``config.CAUSES`` (≙ /root/reference/performances.py:145-149).

Stateless -> plain ``map_batches`` task stage.
"""

from __future__ import annotations

import pyarrow as pa

from document_ai_ray.config import STATUS_FOUND

TOO_SHORT_CHARS = 50
LINK_FARM_MIN_BLOCKS = 10


def validate_row(row: dict) -> tuple[list[str], bool]:
    causes: list[str] = []
    q = row["quality"] or {}
    err = row.get("error")
    if err:
        causes.append("pdf_parse_error" if str(err).startswith("pdf_parse_error") else "parse_error")
    if not q.get("charset_ok", False):
        causes.append("charset_error")
    if not q.get("parse_ok", False) and "parse_error" not in causes:
        causes.append("parse_error")
    if not q.get("is_readable", False):
        causes.append("quality_is_not_ok")
    text = row.get("extracted_text") or ""
    if not text:
        causes.append("extracted_text_is_empty")
    elif len(text) < TOO_SHORT_CHARS:
        causes.append("too_short")
    if q.get("n_kept", 0) == 0 and q.get("n_blocks", 0) >= LINK_FARM_MIN_BLOCKS:
        causes.append("link_farm")
    status = dict(row.get("field_status") or {})
    for fld in ("title", "author", "date", "reference"):
        if fld in status and status[fld] != STATUS_FOUND:
            causes.append(f"{fld}_is_not_filled")
    if "contact" in status and status["contact"] != STATUS_FOUND:
        causes.append("contact_is_not_present")
    if not q.get("has_byline", False):
        causes.append("byline_is_not_present")
    pred = row.get("pred_lang") or "und"
    if pred not in ("und", row.get("lang")):
        causes.append("lang_mismatch")
    return causes, not causes


_NEEDED = ["quality", "error", "extracted_text", "field_status", "pred_lang", "lang"]


def validate_batch(batch: pa.Table) -> pa.Table:
    # only the rule inputs round-trip through Python — the wide columns
    # (blocks, fields, text payloads) stay as Arrow buffers
    cols = {c: batch.column(c).to_pylist() for c in _NEEDED}
    causes_col, validated_col = [], []
    for i in range(len(batch)):
        causes, ok = validate_row({c: cols[c][i] for c in _NEEDED})
        causes_col.append(causes)
        validated_col.append(ok)
    return batch.append_column(
        "refused_causes", pa.array(causes_col, pa.list_(pa.string()))
    ).append_column("validated", pa.array(validated_col, pa.bool_()))
