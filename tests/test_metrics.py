"""Metrics harness: per-cause confusion + FP/FN listings vs golden
labels (≙ /root/reference/performances.py:40-93, 129-189)."""

import pyarrow as pa
import ray.data as rd

from document_ai_ray.config import CAUSES
from document_ai_ray.pipelines.extract import extract_pipeline
from document_ai_ray.pipelines.metrics import cause_confusion, mismatches
from document_ai_ray.synth import expected_causes, golden_causes_table, pages_table

N = 200


def _golden(rows):
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("url", pa.string()), ("causes", pa.list_(pa.string())), ("validated", pa.bool_())]
        ),
    )


def _preds(rows):
    return rd.from_arrow(
        pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("url", pa.string()), ("refused_causes", pa.list_(pa.string()))]
            ),
        )
    )


def test_confusion_math_hand_built():
    golden = _golden(
        [
            {"url": "a", "causes": ["too_short"], "validated": False},
            {"url": "b", "causes": [], "validated": True},
            {"url": "c", "causes": ["too_short", "link_farm"], "validated": False},
        ]
    )
    preds = _preds(
        [
            {"url": "a", "refused_causes": ["too_short"]},          # tp(too_short)
            {"url": "b", "refused_causes": ["link_farm"]},          # fp(link_farm)
            {"url": "c", "refused_causes": ["too_short"]},          # tp(too_short), fn(link_farm)
            {"url": "unlabeled", "refused_causes": ["too_short"]},  # ignored
        ]
    )
    df = cause_confusion(preds, golden).set_index("cause")
    assert df.loc["too_short", ["tp", "fp", "tn", "fn"]].tolist() == [2, 0, 1, 0]
    assert df.loc["link_farm", ["tp", "fp", "tn", "fn"]].tolist() == [0, 1, 1, 1]
    assert df.loc["charset_error", ["tp", "fp", "tn", "fn"]].tolist() == [0, 0, 3, 0]
    assert set(df.index) == set(CAUSES)
    assert df.loc["too_short", "precision"] == 1.0
    assert df.loc["link_farm", "precision"] == 0.0 and df.loc["link_farm", "recall"] == 0.0

    mm = mismatches(preds, golden).to_pandas().sort_values("kind").reset_index(drop=True)
    assert len(mm) == 2
    assert mm.iloc[0].tolist() == ["c", "link_farm", "fn"]
    assert mm.iloc[1].tolist() == ["b", "link_farm", "fp"]


def test_engine_reproduces_golden_labels():
    """The full pipeline must reproduce the intent labels exactly on the
    labeled subset: fp = fn = 0 for every cause (golden-fixture
    contract, cause-level)."""
    res = extract_pipeline(rd.from_arrow(pages_table(N)))
    golden = golden_causes_table(N)
    df = cause_confusion(res, golden)
    assert int(df.fp.sum()) == 0 and int(df.fn.sum()) == 0
    labeled = [c for c in (expected_causes(i) for i in range(N)) if c is not None]
    for _, r in df.iterrows():
        assert r.tp == sum(1 for cs in labeled if r.cause in cs)
        assert r.tp + r.fp + r.tn + r.fn == len(labeled)
        if r.tp > 0:
            assert r.precision == 1.0 and r.recall == 1.0

    assert len(mismatches(extract_pipeline(rd.from_arrow(pages_table(N))), golden).to_pandas()) == 0


def test_svg_plots_render_valid_xml():
    """SVG chart module (reference plotting parity): well-formed XML,
    one bar per (metric, cause), block map draws every span."""
    import xml.etree.ElementTree as ET

    import pandas as pd

    from document_ai_ray.pipelines.plots import (
        svg_block_spans,
        svg_confusion_report,
        svg_grouped_bars,
    )

    conf = pd.DataFrame(
        {"cause": ["empty", "short", "no_title"], "tp": [8, 3, 5], "fp": [1, 0, 2], "fn": [2, 1, 0]}
    )
    svg = svg_confusion_report(conf)
    root = ET.fromstring(svg)                      # well-formed
    rects = [e for e in root.iter() if e.tag.endswith("rect")]
    assert len(rects) == 1 + 3 * 3                 # background + 3 metrics x 3 causes
    assert "precision" in svg and "recall" in svg and "f1" in svg

    svg2 = svg_grouped_bars(conf, "cause", ["tp"], title="tp & <causes>")
    ET.fromstring(svg2)
    assert "&amp;" in svg2 and "&lt;causes&gt;" in svg2   # titles are escaped

    blocks = [
        {"start": 0, "end": 40, "kind": "heading"},
        {"start": 45, "end": 200, "kind": "para"},
        {"start": 210, "end": 300, "kind": "para"},
    ]
    svg3 = svg_block_spans(blocks, doc_len=300)
    root3 = ET.fromstring(svg3)
    rects3 = [e for e in root3.iter() if e.tag.endswith("rect")]
    assert len(rects3) == 1 + len(blocks)
