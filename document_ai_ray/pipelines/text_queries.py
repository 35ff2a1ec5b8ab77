"""Text-analysis queries over the documents table (lang-ID, quality
scoring, token counting, fingerprinting)."""

from __future__ import annotations

import pyarrow as pa

from document_ai_ray.pipelines.ops import partial_group_agg
from document_ai_ray.pipelines.registry import register
from document_ai_ray.sources.tables import read_table
from document_ai_ray.stages.text_analysis import (
    fingerprint_batch,
    langid_batch,
    quality_batch,
    token_count_batch,
)


@register(
    "token_counts",
    oracle="""
    SELECT doc_id, len(string_split(text, ' ')) AS n_ws_tokens
    FROM documents
    """,
)
def token_counts(sf_dir: str):
    """Whitespace token counts (the BPE-ish count has no SQL analogue
    and rides in `token_stats` below)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def project(t: pa.Table) -> pa.Table:
        t = token_count_batch(t)
        return t.select(["doc_id", "n_ws_tokens"])

    return ds.map_batches(project, batch_format="pyarrow")


@register("token_stats")
def token_stats(sf_dir: str):
    """Full token statistics incl. BPE-ish regex tokens (rows-only)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_ws_tokens", "n_bpe_tokens"]
    )


@register(
    "doc_length_hist",
    oracle="""
    SELECT CAST(floor(n_chars / 100) AS BIGINT) AS bucket, COUNT(*) AS n
    FROM documents GROUP BY 1
    """,
)
def doc_length_hist(sf_dir: str):
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["n_chars"])

    def derive(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(t.column("n_chars").cast(pa.float64()), 100.0)), pa.int64())
        return pa.Table.from_arrays([b], names=["bucket"])

    return partial_group_agg(ds.map_batches(derive, batch_format="pyarrow"), ["bucket"], count_alias="n")


@register("langid_docs")
def langid_docs(sf_dir: str):
    """Heuristic language ID per document + agreement with the declared
    lang column (rows-only: the stopword heuristic has no SQL form)."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def project(t: pa.Table) -> pa.Table:
        t = langid_batch(t)
        agree = pc.equal(t.column("pred_lang"), t.column("lang"))
        return pa.Table.from_arrays(
            [t.column("doc_id"), t.column("pred_lang"), agree],
            names=["doc_id", "pred_lang", "agrees"],
        )

    return ds.map_batches(project, batch_format="pyarrow")


@register("quality_scores")
def quality_scores(sf_dir: str):
    """Quality features + composite score per document (rows-only)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(quality_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_words", "alpha_ratio", "stopword_ratio", "mean_word_len", "quality_score"]
    )


@register("fingerprint_docs")
def fingerprint_docs(sf_dir: str):
    """Winnowing fingerprints + simhash per document (rows-only)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "fingerprint", "simhash"]
    )
