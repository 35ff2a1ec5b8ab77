"""Checkpoint/resume contract (north rule: per-partition lineage,
failed runs resume without reprocessing completed partitions) and skew
re-blocking."""

import json
import os

import pyarrow as pa
import pytest
import ray.data as rd

from document_ai_ray.pipelines.extract import extract_pipeline
from document_ai_ray.stages.skew import split_batch_by_bytes, split_blocks_by_bytes
from document_ai_ray.state.resume import (
    completed_shards,
    read_output,
    run_resumable,
    shard_of,
    write_manifest,
)
from document_ai_ray.synth import pages_table, skewed_pages_table

N = 120
SHARDS = 4


def _make_pages():
    return rd.from_arrow(pages_table(N))


def test_resumable_full_run_and_idempotent_rerun(tmp_path):
    out = str(tmp_path / "run")
    processed = run_resumable(_make_pages, extract_pipeline, out, num_shards=SHARDS)
    assert sorted(processed) == list(range(SHARDS))
    assert completed_shards(out, SHARDS) == set(range(SHARDS))

    res = read_output(out)
    urls = sorted(u for u in res.to_pandas()["url"])
    want = sorted(pages_table(N).column("url").to_pylist())
    assert urls == want  # every row exactly once across shards

    # manifests certify the files on disk
    for s in range(SHARDS):
        with open(os.path.join(out, "_manifest", f"shard-{s:05d}.json")) as f:
            m = json.load(f)
        assert m["complete"] and m["rows"] > 0 and m["files"]
        total = sum(
            os.path.getsize(os.path.join(out, f"shard={s:05d}", fn)) for fn in m["files"]
        )
        assert total == m["bytes"]

    # second run: everything is already committed -> no work
    assert run_resumable(_make_pages, extract_pipeline, out, num_shards=SHARDS) == []


def test_resume_after_crash_skips_completed(tmp_path):
    out = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(
            _make_pages, extract_pipeline, out, num_shards=SHARDS, fail_after=2
        )
    assert len(completed_shards(out, SHARDS)) == 2
    # the injected crash happens mid-commit: the uncommitted shards'
    # parquet data sits in raw __shard= staging dirs (the real crash
    # window — write_parquet done, promote/manifest not)
    staging = [d for d in os.listdir(out) if d.startswith("__shard=")]
    assert len(staging) == SHARDS - 2

    processed = run_resumable(_make_pages, extract_pipeline, out, num_shards=SHARDS)
    assert len(processed) == SHARDS - 2  # only the missing shards ran
    assert not any(d.startswith("__shard=") for d in os.listdir(out))

    got = sorted(read_output(out).to_pandas()["url"])
    # EXACTLY once: a stale staging dir would double rows here
    assert got == sorted(pages_table(N).column("url").to_pylist())


def test_partial_shard_without_manifest_is_rebuilt(tmp_path):
    out = str(tmp_path / "partial")
    run_resumable(_make_pages, extract_pipeline, out, num_shards=SHARDS)
    # simulate a crash between parquet flush and manifest commit
    os.remove(os.path.join(out, "_manifest", "shard-00001.json"))
    processed = run_resumable(_make_pages, extract_pipeline, out, num_shards=SHARDS)
    assert processed == [1]
    assert sorted(read_output(out).to_pandas()["url"]) == sorted(
        pages_table(N).column("url").to_pylist()
    )


def test_shard_assignment_stable_and_total():
    urls = pages_table(50).column("url").to_pylist()
    shards = [shard_of(u, SHARDS) for u in urls]
    assert set(shards) <= set(range(SHARDS))
    assert shards == [shard_of(u, SHARDS) for u in urls]  # deterministic


def test_split_batch_by_bytes_isolates_giants():
    t = skewed_pages_table(60, giant_every=20, giant_mb=1)
    budget = 32 << 10
    parts = list(split_batch_by_bytes(t, budget))
    # all rows preserved, in order
    assert sum(len(p) for p in parts) == len(t)
    got = [u for p in parts for u in p.column("url").to_pylist()]
    assert got == t.column("url").to_pylist()
    import pyarrow.compute as pc

    for p in parts:
        sizes = pc.binary_length(p.column("html")).to_pylist()
        if len(p) > 1:
            assert sum(sizes) <= budget  # multi-row blocks respect the budget
        else:
            pass  # giant rows ride alone (may exceed the budget by themselves)
    assert any(len(p) == 1 for p in parts)  # the giants were isolated


def test_split_blocks_by_bytes_dataset_roundtrip():
    t = skewed_pages_table(60, giant_every=20, giant_mb=1)
    ds = split_blocks_by_bytes(rd.from_arrow(t), max_bytes=32 << 10)
    out = extract_pipeline(ds).to_pandas()
    assert sorted(out["url"]) == sorted(t.column("url").to_pylist())


def test_shard_layout_change_does_not_duplicate(tmp_path):
    """Re-running with a SMALLER --shards on the same out dir must not
    leave stale out-of-range shard dirs/manifests behind: read_output
    reads only manifest-certified files of the current layout."""
    out = str(tmp_path / "relayout")
    run_resumable(_make_pages, extract_pipeline, out, num_shards=8)
    processed = run_resumable(_make_pages, extract_pipeline, out, num_shards=2)
    assert sorted(processed) == [0, 1]  # full rebuild under the new layout
    got = sorted(read_output(out).to_pandas()["url"])
    want = sorted(pages_table(N).column("url").to_pylist())
    assert got == want  # every row exactly once, no stale-dir duplicates
    # no stale 8-shard dirs or manifests survive
    assert not any(
        d.startswith("shard=") and int(d.split("=")[1]) >= 2 for d in os.listdir(out)
    )


def test_extract_pipeline_giant_row_isolated():
    """End-to-end skew path: a giant page flows through the byte-capped
    splitter wired into extract_pipeline and extracts correctly next to
    normal pages; with a tiny byte budget the giant must land in its
    own single-row batch (observed via per-batch row counts)."""
    import dataclasses

    import pyarrow as pa
    import ray.data as rd

    from document_ai_ray.config import ExtractConfig
    from document_ai_ray.pipelines.extract import extract_pipeline
    from document_ai_ray.synth import pages_table

    t = pages_table(30)
    # blow one page up to ~3 MB of body text inside valid HTML
    big_body = "giant paragraph word " * 150_000
    html = f"<html><body><p>{big_body}</p></body></html>".encode()
    col_idx = t.schema.get_field_index("html")
    htmls = t.column("html").to_pylist()
    htmls[7] = html
    t = t.set_column(col_idx, "html", pa.array(htmls, pa.binary()))

    cfg = dataclasses.replace(ExtractConfig(), max_payload_bytes=1 << 20, batch_size=8)
    out = extract_pipeline(rd.from_arrow(t), cfg)
    rows = out.select_columns(["url", "extracted_text"]).take_all()
    assert len(rows) == 30
    giant = [r for r in rows if len(r["extracted_text"]) > 1_000_000]
    assert len(giant) == 1

    # splitter invariant directly: the giant is alone in its slice
    from document_ai_ray.stages.skew import split_batch_by_bytes

    parts = list(split_batch_by_bytes(t, 1 << 20, max_rows=8))
    assert sum(len(p) for p in parts) == 30
    assert all(len(p) <= 8 for p in parts)
    giant_parts = [p for p in parts if any(len(h) > 1 << 20 for h in p.column("html").to_pylist())]
    assert len(giant_parts) == 1 and len(giant_parts[0]) == 1


def test_split_batch_by_bytes_property():
    """Property sweep: slices reconstruct the input exactly in order;
    every multi-row slice respects both budgets; single-row slices may
    exceed the byte budget only when that row alone does."""
    import random

    import pyarrow as pa

    from document_ai_ray.stages.skew import split_batch_by_bytes

    rng = random.Random(42)
    for _ in range(60):
        n = rng.randint(0, 40)
        sizes = [rng.choice([0, 1, 5, 100, 3000]) for _ in range(n)]
        payloads = [b"x" * s for s in sizes]
        t = pa.table({"id": list(range(n)), "html": pa.array(payloads, pa.binary())})
        budget = rng.choice([1, 50, 200, 5000])
        max_rows = rng.choice([None, 1, 3, 7])
        parts = list(split_batch_by_bytes(t, budget, max_rows=max_rows))
        flat = [r for p in parts for r in p.column("id").to_pylist()]
        assert flat == list(range(n))
        for p in parts:
            szs = [len(h) for h in p.column("html").to_pylist()]
            if max_rows is not None:
                assert len(p) <= max_rows
            if len(p) > 1:
                assert sum(szs) <= budget
            else:
                assert len(szs) == 1 and (szs[0] <= budget or True)


def _fragment_shards(out: str):
    """Split every shard's parquet into per-row-group single-row files
    to simulate a high-parallelism write, and re-manifest from disk."""
    import pyarrow.parquet as pq

    for s in range(SHARDS):
        sd = os.path.join(out, f"shard={s:05d}")
        files = [f for f in os.listdir(sd) if f.endswith(".parquet")]
        tbl = pa.concat_tables([pq.read_table(os.path.join(sd, f)) for f in files])
        for f in files:
            os.remove(os.path.join(sd, f))
        for i in range(tbl.num_rows):
            pq.write_table(tbl.slice(i, 1), os.path.join(sd, f"tiny-{i:05d}.parquet"))
        write_manifest(out, s, SHARDS, sd)


def test_compact_shards_preserves_rows_and_reduces_files(tmp_path):
    from document_ai_ray.state.resume import compact_shards

    out = str(tmp_path / "compact")
    run_resumable(_make_pages, extract_pipeline, out, num_shards=SHARDS)
    before = read_output(out).to_pandas().sort_values("url").reset_index(drop=True)
    _fragment_shards(out)
    assert read_output(out).count() == len(before)

    stats = compact_shards(out, target_bytes=1 << 30)  # everything -> 1 file/shard
    assert set(stats) == set(range(SHARDS))
    for s, (nb, na) in stats.items():
        assert nb > na == 1
    after = read_output(out).to_pandas().sort_values("url").reset_index(drop=True)
    assert after.equals(before)
    # manifests re-certify the compacted files on disk
    for s in range(SHARDS):
        with open(os.path.join(out, "_manifest", f"shard-{s:05d}.json")) as f:
            m = json.load(f)
        assert m["complete"] and m["files"] == ["compact-0000.parquet"]


def test_compact_crash_window_degrades_to_rebuild(tmp_path):
    """A crash between manifest delete and dir swap must leave the shard
    INCOMPLETE (not corrupt): read_output skips it, run_resumable
    rebuilds it, and no rows are lost or duplicated at the end."""
    from document_ai_ray.state.resume import compact_shards

    out = str(tmp_path / "compact-crash")
    run_resumable(_make_pages, extract_pipeline, out, num_shards=SHARDS)
    want = sorted(read_output(out).to_pandas()["url"])
    _fragment_shards(out)

    with pytest.raises(RuntimeError, match="injected failure"):
        compact_shards(out, target_bytes=1 << 30, fail_inside=2)
    done = completed_shards(out, SHARDS)
    assert len(done) == SHARDS - 1          # exactly one shard de-manifested
    # recovery is the normal resumable path
    processed = run_resumable(_make_pages, extract_pipeline, out, num_shards=SHARDS)
    assert len(processed) == 1
    assert sorted(read_output(out).to_pandas()["url"]) == want
