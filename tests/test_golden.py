"""Golden-fixture byte-identity (FIXTURES.md F2; north-rule invariant).

The committed parquet pins the frozen whitespace canon + extraction
semantics (≙ the reference's golden JSONs,
/root/reference/data/performances_data/valid_data/arval_classic_restitution_json/).
Any change to the canon, block scoring or field extraction that alters
a single byte of `extracted_text` (or any field/status/block) fails
here — regenerate the fixture ONLY for an intentional semantic change.
"""

import os

import pyarrow.parquet as pq
import ray.data as rd

from document_ai_ray.pipelines.extract import extract_pipeline
from document_ai_ray.synth import pages_table

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "golden_extraction.parquet")
N = 400


def test_extraction_matches_golden_fixture_byte_exact():
    golden = pq.read_table(GOLDEN)
    want = {r["url"]: r for r in golden.to_pylist()}
    assert len(want) == N

    res = extract_pipeline(rd.from_arrow(pages_table(N))).to_pandas()
    assert len(res) == N
    mismatches = []
    for _, r in res.iterrows():
        g = want[r["url"]]
        if r["extracted_text"] != g["extracted_text"]:
            mismatches.append((r["url"], "extracted_text"))
        if r["content_type"] != g["content_type"]:
            mismatches.append((r["url"], "content_type"))
        if dict(r["fields"] or {}) != dict(g["fields"] or {}):
            mismatches.append((r["url"], "fields"))
        if dict(r["field_status"] or {}) != dict(g["field_status"] or {}):
            mismatches.append((r["url"], "field_status"))
        if r["pred_lang"] != g["pred_lang"]:
            mismatches.append((r["url"], "pred_lang"))
        got_blocks = [dict(b) for b in (r["blocks"] if r["blocks"] is not None else [])]
        if got_blocks != [dict(b) for b in (g["blocks"] or [])]:
            mismatches.append((r["url"], "blocks"))
    assert not mismatches, f"{len(mismatches)} golden divergences, first 5: {mismatches[:5]}"
