"""Registry of driver-checkable queries + their DuckDB oracle SQL.

Every implemented operator from SURVEY.md §2 (and the training-data
operator suite) registers here: ``queries()[name](sf_dir)`` runs the
Ray Data pipeline; ``oracle_sql()[name]`` is the ANSI-SQL equivalent
DuckDB runs on the same parquet tables.  Column names are aligned
between the two on purpose (the driver hashes values under sorted
column names).  Ops whose semantics SQL can't express (LSH, heuristics,
streaming state) appear in ``queries()`` only -> rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_QUERIES: dict[str, Callable[[str], Any]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[str], Any]):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, Callable[[str], Any]]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from document_ai_ray.pipelines import extract_queries  # noqa: F401
    from document_ai_ray.pipelines import relational  # noqa: F401
    from document_ai_ray.pipelines import analytics  # noqa: F401
    from document_ai_ray.pipelines import dedup_queries  # noqa: F401
    from document_ai_ray.pipelines import similarity_queries  # noqa: F401
    from document_ai_ray.pipelines import text_queries  # noqa: F401
    from document_ai_ray.pipelines import metrics_queries  # noqa: F401
    from document_ai_ray.pipelines import media_queries  # noqa: F401
    from document_ai_ray.pipelines import corpus  # noqa: F401
    from document_ai_ray.pipelines import link_queries  # noqa: F401
    from document_ai_ray.pipelines import curation_queries  # noqa: F401

    _LOADED = True
