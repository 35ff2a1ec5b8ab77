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
