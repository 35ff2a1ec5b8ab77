"""CLI entry point (≙ reference main.py): extract --resume + metrics,
exercised in one subprocess (the CLI owns its own Ray session)."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq

from document_ai_ray.synth import golden_causes_table, pages_table

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_extract_resume_metrics(tmp_path):
    pages = tmp_path / "pages.parquet"
    golden = tmp_path / "golden.parquet"
    out = tmp_path / "out"
    csv = tmp_path / "metrics.csv"
    pq.write_table(pages_table(60), str(pages))
    pq.write_table(golden_causes_table(60), str(golden))

    script = f"""
import sys
sys.path.insert(0, {REPO!r})
from document_ai_ray.__main__ import main
rc = main(["extract", "--input", {str(pages)!r}, "--out", {str(out)!r},
           "--resume", "--shards", "2", "--max-block-bytes", "32768"])
assert rc == 0
rc = main(["metrics", "--results", {str(out)!r}, "--golden", {str(golden)!r},
           "--out", {str(csv)!r}])
assert rc == 0
"""
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [json.loads(l) for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines[0]["shards_processed"] == [0, 1]
    assert lines[1]["fp"] == 0 and lines[1]["fn"] == 0
    assert (out / "_manifest").is_dir()
    assert "cause,tp,fp,tn,fn" in csv.read_text()


def test_analyze_document_api():
    """Online single-doc entry point (= reference app/api.py request
    path): full extract + validate on one payload, no Ray involved."""
    from document_ai_ray.api import analyze_document
    from document_ai_ray.synth import gen_page

    p = next(g for g in (gen_page(i) for i in range(50)) if g["html"][:5] != b"%PDF-")
    row = analyze_document(p["html"], url=p["url"], lang=p["lang"])
    assert row["url"] == p["url"]
    assert isinstance(row["refused_causes"], list)
    assert row["validated"] == (not row["refused_causes"])
    assert row["extracted_text"] or row["refused_causes"]
    # PDF branch too
    pdf = next(g for g in (gen_page(i) for i in range(80)) if g["html"][:5] == b"%PDF-")
    row = analyze_document(pdf["html"], url=pdf["url"], lang=pdf["lang"])
    assert row["content_type"] == "application/pdf"


def test_cli_analyze_and_report(tmp_path):
    from document_ai_ray.synth import gen_page

    page = next(g for g in (gen_page(i) for i in range(50)) if g["html"][:5] != b"%PDF-")
    f = tmp_path / "page.html"
    f.write_bytes(page["html"])
    script = f"""
import sys
sys.path.insert(0, {REPO!r})
from document_ai_ray.__main__ import main
rc = main(["analyze", "--input", {str(f)!r}, "--lang", "en"])
assert rc == 0
"""
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=120
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    row = json.loads(proc.stdout.strip().splitlines()[-1])
    assert row["url"] == str(f) and "validated" in row


def test_render_confusion_report():
    import pandas as pd

    from document_ai_ray.pipelines.report import render_confusion_report

    df = pd.DataFrame(
        [{"cause": "too_short", "tp": 8, "fp": 2, "fn": 0},
         {"cause": "link_farm", "tp": 0, "fp": 0, "fn": 4}]
    )
    text = render_confusion_report(df)
    assert "| too_short | 8 | 2 | 0 | 0.800 | 1.000 |" in text
    assert "micro-avg" in text and "link_farm" in text


def test_cli_extract_from_warc(tmp_path):
    from document_ai_ray.sources.warc import write_warc_file
    from document_ai_ray.synth import pages_table

    warc = tmp_path / "crawl.warc.gz"
    write_warc_file(pages_table(30).to_pylist(), str(warc), compress=True)
    out = tmp_path / "out"
    script = f"""
import sys
sys.path.insert(0, {REPO!r})
from document_ai_ray.__main__ import main
rc = main(["extract", "--input", {str(warc)!r}, "--out", {str(out)!r},
           "--format", "warc"])
assert rc == 0
"""
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    n = sum(pq.read_metadata(os.path.join(out, f)).num_rows
            for f in os.listdir(out) if f.endswith(".parquet"))
    assert n == 30
