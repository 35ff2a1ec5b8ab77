"""Ingestion variants: raw binary files, causes CSV, golden JSONL."""

import json
import os

from document_ai_ray.sources.raw import (
    pages_from_binary_files,
    read_causes_csv,
    read_golden_json,
    write_metrics_csv,
)
from document_ai_ray.pipelines.extract import extract_pipeline
from document_ai_ray.synth import gen_page


def test_pages_from_binary_files_roundtrip(tmp_path):
    # drop a few synthetic payloads (html + pdf) as raw files
    texts = {}
    for i in (0, 3, 5):  # 3 -> pdf payload
        p = gen_page(i)
        name = f"doc{i}.bin"
        (tmp_path / name).write_bytes(p["html"])
        texts[name] = p["html"]
    ds = pages_from_binary_files(str(tmp_path))
    out = extract_pipeline(ds).to_pandas()
    assert len(out) == 3
    assert all(u.startswith("file://") for u in out["url"])
    assert set(out["content_type"]) == {"text/html", "application/pdf"}
    assert (out["extracted_text"].str.len() > 0).all()


def test_read_causes_csv(tmp_path):
    p = tmp_path / "gt.csv"
    p.write_text("url,causes\nu1,too_short;link_farm\nu2,\n")
    df = read_causes_csv(str(p)).to_pandas()
    got = {r["url"]: list(r["causes"]) for _, r in df.iterrows()}
    assert got == {"u1": ["too_short", "link_farm"], "u2": []}


def test_read_golden_json(tmp_path):
    p = tmp_path / "golden.jsonl"
    rows = [
        {"url": "u1", "extracted_text": "hello world"},
        {"url": "u2", "extracted_text": "zwei"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    df = read_golden_json(str(p)).to_pandas().sort_values("url")
    assert list(df["extracted_text"]) == ["hello world", "zwei"]


def test_write_metrics_csv(tmp_path):
    import pandas as pd

    out = tmp_path / "m.csv"
    write_metrics_csv(pd.DataFrame({"cause": ["a"], "tp": [1]}), str(out))
    assert "cause,tp" in out.read_text()


def test_warc_roundtrip_plain_and_gzip(tmp_path):
    """pages -> WARC file (plain + gzip) -> read_warc -> identical
    url/warc_ts/html; the extraction pipeline runs unchanged on WARC
    input (Common-Crawl-native ingestion)."""
    from document_ai_ray.pipelines.extract import extract_pipeline
    from document_ai_ray.sources.warc import parse_warc_records, read_warc, write_warc_file
    from document_ai_ray.synth import pages_table

    t = pages_table(40)
    rows = t.to_pylist()
    plain = tmp_path / "a.warc"
    gz = tmp_path / "b.warc.gz"
    write_warc_file(rows[:25], str(plain))
    write_warc_file(rows[25:], str(gz), compress=True)

    ds = read_warc([str(plain), str(gz)])
    got = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == sorted(r["url"] for r in rows)
    by_url = {r["url"]: r["html"] for r in rows}
    for u, h in zip(got["url"], got["html"]):
        assert bytes(h) == bytes(by_url[u])          # payload byte-identity

    # extraction over WARC input == extraction over the parquet-shaped input
    out = extract_pipeline(read_warc([str(plain)])).to_pandas()
    assert len(out) == 25 and out["error"].isna().all()

    # truncated archive yields its intact prefix, no exception
    data = plain.read_bytes()
    recs = parse_warc_records(data[: len(data) // 2])
    assert 0 < len(recs) < 25
