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
    # vectorized twin of validate_row (rule-for-rule, same cause order;
    # pinned equal by tests/test_validate.py): the quality struct reads
    # as numpy child arrays and the text column contributes only its
    # pc.utf8_length — materializing every extracted_text as a Python
    # str just to len() it was the stage's entire cost
    import numpy as np
    import pyarrow.compute as pc

    n = len(batch)
    q = batch.column("quality")
    if isinstance(q, pa.ChunkedArray):
        q = q.combine_chunks()
    charset_ok = q.field("charset_ok").to_numpy(zero_copy_only=False)
    parse_ok = q.field("parse_ok").to_numpy(zero_copy_only=False)
    readable = q.field("is_readable").to_numpy(zero_copy_only=False)
    n_kept = q.field("n_kept").to_numpy(zero_copy_only=False)
    n_blocks = q.field("n_blocks").to_numpy(zero_copy_only=False)
    has_byline = q.field("has_byline").to_numpy(zero_copy_only=False)
    err = batch.column("error").to_pylist()
    tlen = (
        pc.fill_null(pc.utf8_length(batch.column("extracted_text")), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    pred = batch.column("pred_lang").to_pylist()
    lang = batch.column("lang").to_pylist()
    fstat = batch.column("field_status").to_pylist()
    causes_col, validated_col = [], []
    for i in range(n):
        causes: list[str] = []
        e = err[i]
        if e:
            causes.append(
                "pdf_parse_error" if e.startswith("pdf_parse_error") else "parse_error"
            )
        if not charset_ok[i]:
            causes.append("charset_error")
        if not parse_ok[i] and "parse_error" not in causes:
            causes.append("parse_error")
        if not readable[i]:
            causes.append("quality_is_not_ok")
        if tlen[i] == 0:
            causes.append("extracted_text_is_empty")
        elif tlen[i] < TOO_SHORT_CHARS:
            causes.append("too_short")
        if n_kept[i] == 0 and n_blocks[i] >= LINK_FARM_MIN_BLOCKS:
            causes.append("link_farm")
        status = dict(fstat[i] or {})
        for fld in ("title", "author", "date", "reference"):
            if fld in status and status[fld] != STATUS_FOUND:
                causes.append(f"{fld}_is_not_filled")
        if "contact" in status and status["contact"] != STATUS_FOUND:
            causes.append("contact_is_not_present")
        if not has_byline[i]:
            causes.append("byline_is_not_present")
        p = pred[i] or "und"
        if p != "und" and p != lang[i]:
            causes.append("lang_mismatch")
        causes_col.append(causes)
        validated_col.append(not causes)
    return batch.append_column(
        "refused_causes", pa.array(causes_col, pa.list_(pa.string()))
    ).append_column("validated", pa.array(validated_col, pa.bool_()))
