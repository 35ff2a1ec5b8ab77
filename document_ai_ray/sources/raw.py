"""Raw-file and CSV/JSON ingestion variants (SURVEY.md §2.1).

- `pages_from_binary_files`: the raw-ingest analogue of the reference's
  image reader (/root/reference/detection/template_matching.py:48-50,
  app/api.py:36-39 upload sink): a directory of .html/.pdf payload
  files becomes a pages-schema Dataset via `ray.data.read_binary_files`
  (file discovery, streaming reads and parallelism are the datasource's
  job — no manual dir listing like performances.py:211-225).
- `read_causes_csv` / `read_golden_json`: the ground-truth CSV and
  golden-JSON readers (/root/reference/performances.py:122-126,
  utils.py:16-28) over `ray.data.read_csv` / `read_json`.
"""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from document_ai_ray.config import PAGES_SCHEMA

_EPOCH = datetime(2024, 1, 1)


def pages_from_binary_files(path: str, lang: str = "und") -> rd.Dataset:
    """Directory (or list) of raw .html/.pdf files -> pages Dataset.
    url = 'file://<path>'; warc_ts = fixed epoch (raw files carry no
    crawl time); text empty (nothing to roundtrip-check against)."""
    ds = rd.read_binary_files(path, include_paths=True)

    def to_pages(t: pa.Table) -> pa.Table:
        paths = t.column("path").to_pylist()
        payloads = t.column("bytes").to_pylist()
        return pa.Table.from_pylist(
            [
                {
                    "url": f"file://{p}",
                    "warc_ts": _EPOCH,
                    "html": b,
                    "text": "",
                    "lang": lang,
                }
                for p, b in zip(paths, payloads)
            ],
            schema=PAGES_SCHEMA,
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


def read_causes_csv(path: str) -> rd.Dataset:
    """Ground-truth causes CSV (url, causes as ';'-joined string) ->
    (url, causes list<string>) — ≙ the admin-comment cause CSVs
    (/root/reference/performances.py:122-126, 202-205)."""
    ds = rd.read_csv(path)

    def parse(t: pa.Table) -> pa.Table:
        causes = [
            [c for c in (x or "").split(";") if c]
            for x in t.column("causes").to_pylist()
        ]
        return pa.Table.from_arrays(
            [t.column("url"), pa.array(causes, pa.list_(pa.string()))],
            names=["url", "causes"],
        )

    return ds.map_batches(parse, batch_format="pyarrow")


def read_golden_json(path: str) -> rd.Dataset:
    """Golden fixture JSONL (one object per line: url, extracted_text,
    fields) — ≙ the per-document golden JSON loader
    (/root/reference/utils.py:16-28)."""
    return rd.read_json(path)


def write_metrics_csv(df, path: str) -> None:
    """Metrics sink (≙ the summary/error CSV writers,
    /root/reference/performances.py:188-189, 295-296).  Metrics frames
    are tiny aggregates — a plain driver-side write."""
    df.to_csv(path, index=False)
