"""Differential test: the vectorized `validate_batch` must be
rule-for-rule identical to the per-row `validate_row` reference
implementation (same causes, same order, same validated bit) over a
corpus that exercises every rule branch (PDF payloads, truncated HTML,
latin-1 charset repair, link farms, tiny content, missing fields, lang
mismatch, null payload)."""

from __future__ import annotations

import pyarrow as pa

from document_ai_ray.config import DEFAULT_CONFIG, PAGES_SCHEMA
from document_ai_ray.stages.html_extract import Extractor
from document_ai_ray.stages.validate import validate_batch, validate_row
from document_ai_ray.synth import EPOCH, pages_table


def _diff(out: pa.Table) -> None:
    v = validate_batch(out)
    causes_col = v.column("refused_causes").to_pylist()
    ok_col = v.column("validated").to_pylist()
    for i, row in enumerate(out.to_pylist()):
        causes, ok = validate_row(row)
        assert causes_col[i] == causes, (i, causes_col[i], causes)
        assert ok_col[i] == ok, (i, ok_col[i], ok)


def test_validate_batch_matches_validate_row_varied_corpus():
    # rows 0..399 cover the generator's full i%100 defect battery
    out = Extractor(DEFAULT_CONFIG)(pages_table(400))
    _diff(out)


def test_validate_batch_matches_validate_row_null_payload():
    t = pa.Table.from_pylist(
        [
            {"url": "u://none", "warc_ts": EPOCH, "html": None, "text": "", "lang": "en"},
            {"url": "u://empty", "warc_ts": EPOCH, "html": b"", "text": "", "lang": "en"},
        ],
        schema=PAGES_SCHEMA,
    )
    _diff(Extractor(DEFAULT_CONFIG)(t))
