"""Pipeline profiles (§2.9 of SURVEY.md): the reference's named
processor-list presets (configs/pipeline_config.py:6-37 — `default`,
`performance`, `quality`; mode overrides worker/document_processor.py:
128-136 — BASIC forces fast + max_pages=3) re-expressed as ExtractConfig
presets plus a tiny declarative PipelineSpec for user extension.

A custom stage is "any callable (or callable class for an actor pool)
with __call__(batch: pa.Table) -> pa.Table" — the UDF contract of
map_batches, replacing the reference's attribute-poking plugin registry
(worker/pipeline/pipeline_builder.py:37-120).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Sequence

import ray.data as rd

from .extract_pipeline import ExtractConfig, extract_pipeline

#: Named presets mirroring the reference's profiles/modes.
PROFILES: dict[str, ExtractConfig] = {
    # reference `default`: full layout, no page cap
    "default": ExtractConfig(emit="full"),
    # reference `performance`: fewest processors / fastest path -> text+stats
    "performance": ExtractConfig(emit="summary"),
    # reference `quality`: everything on, dedup shuffle included
    "quality": ExtractConfig(emit="full", dedup=True),
    # reference BASIC mode: fast (M10 1600px OCR downscale) + max_pages=3
    "basic": ExtractConfig(emit="summary", max_pages=3, fast=True),
}


def profile(name: str) -> ExtractConfig:
    if name not in PROFILES:
        raise KeyError(f"unknown profile {name!r}; have {sorted(PROFILES)}")
    return PROFILES[name]


@dataclass
class StageSpec:
    """One pipeline stage: a batch callable or actor class + knobs."""
    fn: Callable | type
    batch_size: Optional[int] = None
    concurrency: Optional[int | tuple[int, int]] = None
    num_cpus: float = 1.0
    batch_format: str = "pyarrow"
    fn_constructor_kwargs: dict = field(default_factory=dict)


@dataclass
class PipelineSpec:
    """Declarative pipeline: extraction profile + extra user stages,
    compiled onto a Dataset chain."""
    profile: str = "default"
    extra_stages: Sequence[StageSpec] = ()

    def build(self, paths: str | Sequence[str]) -> rd.Dataset:
        ds = extract_pipeline(paths, profile(self.profile))
        for st in self.extra_stages:
            kwargs: dict[str, Any] = dict(batch_format=st.batch_format,
                                          batch_size=st.batch_size,
                                          num_cpus=st.num_cpus)
            if isinstance(st.fn, type):
                kwargs["concurrency"] = st.concurrency or 2
                kwargs["fn_constructor_kwargs"] = st.fn_constructor_kwargs
            elif st.concurrency is not None:
                kwargs["concurrency"] = st.concurrency
            ds = ds.map_batches(st.fn, **kwargs)
        return ds
