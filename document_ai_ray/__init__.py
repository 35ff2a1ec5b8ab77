"""document_ai_ray — a Ray-Data-native main-content extraction engine.

A from-scratch re-expression of the capability classes of the reference
`kiurtis/document-ai` system (see SURVEY.md) over Common-Crawl-style web
pages: ingest -> normalize -> segment into blocks -> score/strip
boilerplate -> extract text/fields -> classify -> validate -> aggregate
metrics, plus the large-scale training-data operators (dedup, similarity
search, text analysis, multimodal plumbing).

Everything is expressed as ``ray.data.Dataset`` pipelines of
``map_batches`` over Arrow batches.  Stateful stages keep their warm
state (parsers, compiled regexes, broadcast lookup tables) once per
WORKER — task stages with module-level caches by default (measured
2-3x faster than actor pools at bench scale; see pipelines/extract.py),
with the explicit actor-pool form available for heavy model state.

No module in this package calls ``ray.init`` / ``ray.shutdown``; only
``bench.py``, CLI entry points and the test fixture own a Ray session.
"""

from document_ai_ray.config import ExtractConfig

__all__ = ["ExtractConfig"]
__version__ = "0.1.0"
