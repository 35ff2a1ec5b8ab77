"""Flagship pipeline assembly (SURVEY.md §3 lifecycle).

read_parquet(pages) -> map_batches(Extractor actor pool)
[normalize+parse+segment+score+extract+classify, html dropped inside]
-> map_batches(validate) -> sink (write_parquet / aggregate).

Streaming end-to-end: nothing materializes the full dataset.
"""

from __future__ import annotations

import ray.data as rd

from document_ai_ray.config import DEFAULT_CONFIG, ExtractConfig
from document_ai_ray.stages.html_extract import Extractor
from document_ai_ray.stages.validate import validate_batch


def extract_pipeline(pages: rd.Dataset, cfg: ExtractConfig | None = None) -> rd.Dataset:
    """pages (url, warc_ts, html, text, lang) -> validated extraction
    results (VALIDATED_SCHEMA).  The Extractor is an actor pool sized by
    cfg; the validator is a stateless task stage."""
    cfg = cfg or DEFAULT_CONFIG
    extracted = pages.map_batches(
        Extractor,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        # autoscaling pool: never demands more CPUs than the session has
        # (a fixed pool larger than the cluster deadlocks the stage)
        concurrency=(1, cfg.concurrency),
        num_cpus=1,
    )
    return extracted.map_batches(validate_batch, batch_format="pyarrow")


def flagship(sf_dir: str, cfg: ExtractConfig | None = None) -> rd.Dataset:
    """The end-to-end roundtrip job over the driver's `documents` table:
    wrap text in boilerplate HTML -> extract -> validate."""
    from document_ai_ray.sources.tables import pages_from_documents

    return extract_pipeline(pages_from_documents(sf_dir), cfg)
