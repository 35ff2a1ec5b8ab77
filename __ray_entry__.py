"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in document_ai_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: wrap `documents` in
    boilerplate HTML -> extract main content (byte-identical to the
    source text) -> validate.  Returns the result Dataset."""
    from document_ai_ray.pipelines.extract import flagship

    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from document_ai_ray.pipelines import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from document_ai_ray.pipelines import registry

    return registry.oracle_sql()
