"""Composable pipeline builder — the user-extension surface.

Re-expresses the reference's analyzer class hierarchy + model selector
(/root/reference/analysis/entities.py:31,390,495 — CV base class with
GPT/Gemini subclasses overriding `analyze_block*`/`assess_overall_
quality`; selector string at app/api.py:47-56) as data, not
inheritance: a pipeline is an ordered list of ``StageSpec``s, each
lowered to exactly one ``map_batches`` call.  Swapping the scorer =
swapping one spec; adding a custom enrichment = inserting one spec.
Presets play the role of the 'GPT'/'GEMINI' selector strings.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Callable

import ray.data as rd

from document_ai_ray.config import DEFAULT_CONFIG, ExtractConfig


@dataclass(frozen=True)
class StageSpec:
    """One pipeline stage = one map_batches call.

    fn: a batch callable ``(pa.Table, **kwargs) -> pa.Table`` (task
    stage) or a callable CLASS with ``__init__(**kwargs)`` +
    ``__call__(pa.Table)`` (actor-pool stage, for heavy warm state).
    """

    name: str
    fn: Callable
    kwargs: dict[str, Any] = field(default_factory=dict)
    actors: bool = False
    concurrency: tuple[int, int] = (1, 8)
    batch_size: int | None = None
    num_cpus: float = 1.0


def assemble(pages: rd.Dataset, stages: list[StageSpec]) -> rd.Dataset:
    ds = pages
    for s in stages:
        if s.actors:
            ds = ds.map_batches(
                s.fn,
                fn_constructor_kwargs=s.kwargs,
                batch_format="pyarrow",
                batch_size=s.batch_size,
                concurrency=s.concurrency,
                num_cpus=s.num_cpus,
            )
        else:
            ds = ds.map_batches(
                s.fn,
                fn_kwargs=s.kwargs,
                batch_format="pyarrow",
                batch_size=s.batch_size,
            )
    return ds


def default_stages(cfg: ExtractConfig | None = None) -> list[StageSpec]:
    from document_ai_ray.pipelines.extract import extract_batch
    from document_ai_ray.stages.validate import validate_batch

    cfg = cfg or DEFAULT_CONFIG
    return [
        StageSpec("extract", extract_batch, {"cfg": cfg}, batch_size=cfg.batch_size),
        StageSpec("validate", validate_batch),
    ]


# preset name -> stage list (≙ the 'GPT'/'GEMINI' selector,
# app/api.py:47-56; here scorers differ in calibration, not vendor)
def preset(name: str = "default") -> list[StageSpec]:
    if name == "default":
        return default_stages()
    if name == "strict":
        return default_stages(
            replace(DEFAULT_CONFIG, min_yield_ratio=0.4, min_readable_chars=100)
        )
    raise KeyError(f"unknown pipeline preset: {name!r}")


def build(pages: rd.Dataset, preset_name: str = "default") -> rd.Dataset:
    return assemble(pages, preset(preset_name))
