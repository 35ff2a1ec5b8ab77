"""Flagship pipeline assembly (SURVEY.md §3 lifecycle).

read_parquet(pages) -> map_batches(extract: normalize+parse+segment+
score+extract+classify, html dropped inside) -> map_batches(validate)
-> sink (write_parquet / aggregate).

Streaming end-to-end: nothing materializes the full dataset.
"""

from __future__ import annotations

import ray.data as rd

from document_ai_ray.config import DEFAULT_CONFIG, ExtractConfig
from document_ai_ray.stages.html_extract import Extractor
from document_ai_ray.stages.validate import validate_batch

# per-worker-process warm extractor (module global: built once per
# worker, reused across task invocations — same amortization as an
# actor's __init__, without reserving cores for a pool)
_WARM: dict[ExtractConfig, Extractor] = {}


def extract_batch(batch, cfg: ExtractConfig):
    ex = _WARM.get(cfg)
    if ex is None:
        ex = _WARM[cfg] = Extractor(cfg)
    return ex(batch)


def extract_pipeline(
    pages: rd.Dataset, cfg: ExtractConfig | None = None, use_actors: bool = False
) -> rd.Dataset:
    """pages (url, warc_ts, html, text, lang) -> validated extraction
    results (VALIDATED_SCHEMA).

    Execution mode (measured at 50k synthetic pages, 32 CPUs local):
    task-based map_batches with a per-worker warm Extractor sustains
    2-3x the throughput of an actor pool (6.3-9.9k vs 3.2-3.4k docs/s)
    because tasks share cores elastically with up/downstream stages and
    reuse already-warm worker processes, while a fresh 28-actor pool
    pays ~10 s of process startup and pins cores.  The extractor's
    state (compiled regexes + config tables) is cheap to rebuild per
    worker, so tasks are the default; ``use_actors=True`` keeps the
    explicit-pool path for genuinely heavy warm state — the shape the
    reference's SAM/doctr models would need
    (/root/reference/detection/sam.py:21-46)."""
    cfg = cfg or DEFAULT_CONFIG
    if cfg.max_payload_bytes is not None:
        # skew mitigation: byte-cap blocks (row-capped at batch_size)
        # so a giant page is its own single-row block; the task path
        # below then consumes block-as-batch (batch_size=None) so
        # row-count bundling cannot re-attach a giant to 1023 peers
        from document_ai_ray.stages.skew import split_blocks_by_bytes

        pages = split_blocks_by_bytes(
            pages, cfg.max_payload_bytes, payload_col="html", max_rows=cfg.batch_size
        )
    if use_actors:
        if cfg.concurrency is None:
            import ray

            pool_max = max(2, int(ray.cluster_resources().get("CPU", 8)) - 2)
        else:
            pool_max = cfg.concurrency
        extracted = pages.map_batches(
            Extractor,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            # autoscaling pool: never demands more CPUs than the session
            # has (a fixed pool larger than the cluster deadlocks)
            concurrency=(1, pool_max),
            num_cpus=1,
        )
    else:
        extracted = pages.map_batches(
            extract_batch,
            fn_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            # block-as-batch when the skew splitter shaped the blocks
            # (it enforces both the byte and the row budget); else the
            # plain row-count batching
            batch_size=None if cfg.max_payload_bytes is not None else cfg.batch_size,
        )
    return extracted.map_batches(validate_batch, batch_format="pyarrow")


def flagship(sf_dir: str, cfg: ExtractConfig | None = None) -> rd.Dataset:
    """The end-to-end roundtrip job over the driver's `documents` table:
    wrap text in boilerplate HTML -> extract -> validate."""
    from document_ai_ray.sources.tables import pages_from_documents

    return extract_pipeline(pages_from_documents(sf_dir), cfg)
