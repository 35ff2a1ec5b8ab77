"""Parquet table sources with column pruning at the read.

Replaces the reference's dir-listing + per-file readers
(/root/reference/performances.py:211-225, utils.py:7-13): discovery,
pruning and row-group pushdown all happen in ``ray.data.read_parquet``.
"""

from __future__ import annotations

import os

import ray.data as rd


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    """Read one testdata table; always pass ``columns`` in pipelines so
    only needed columns leave storage."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    return rd.read_parquet(path, columns=columns, **kwargs)


def pages_from_documents(sf_dir: str) -> rd.Dataset:
    """`documents` -> synthetic pages (url='doc://<id>') for the
    byte-identity roundtrip (see synth.wrap_documents_batch)."""
    from document_ai_ray.synth import wrap_documents_batch

    return read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"]).map_batches(
        wrap_documents_batch, batch_format="pyarrow"
    )
