"""Pipeline builder: presets, custom stage insertion (≙ analyzer
subclass hierarchy, /root/reference/analysis/entities.py:31,390,495)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from document_ai_ray.pipelines.builder import StageSpec, assemble, build, preset
from document_ai_ray.synth import pages_table

N = 60


def test_default_preset_matches_extract_pipeline():
    from document_ai_ray.pipelines.extract import extract_pipeline

    a = build(rd.from_arrow(pages_table(N))).to_pandas().sort_values("url")
    b = extract_pipeline(rd.from_arrow(pages_table(N))).to_pandas().sort_values("url")
    assert list(a["extracted_text"]) == list(b["extracted_text"])
    assert list(a["validated"]) == list(b["validated"])


def test_strict_preset_refuses_more():
    relaxed = build(rd.from_arrow(pages_table(N)), "default").to_pandas()
    strict = build(rd.from_arrow(pages_table(N)), "strict").to_pandas()
    assert strict["validated"].sum() <= relaxed["validated"].sum()


def test_custom_stage_insertion():
    def shout(t: pa.Table, suffix: str) -> pa.Table:
        upper = pc.utf8_upper(t.column("extracted_text"))
        out = pc.binary_join_element_wise(upper, pa.scalar(suffix), "")
        return t.set_column(
            t.schema.get_field_index("extracted_text"), "extracted_text", out
        )

    stages = preset("default")
    stages.insert(1, StageSpec("shout", shout, {"suffix": "!!"}))
    out = assemble(rd.from_arrow(pages_table(20)), stages).to_pandas()
    non_empty = out[out["extracted_text"].str.len() > 2]
    assert (non_empty["extracted_text"].str.endswith("!!")).all()
    assert non_empty["extracted_text"].str.isupper().any()


def test_unknown_preset_raises():
    with pytest.raises(KeyError):
        preset("vendor-llm")
