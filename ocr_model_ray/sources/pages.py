"""Source: the `pages` Parquet corpus (BASELINE.json input_hint shape).

Reads prune at the source: only the columns a pipeline needs leave
storage (S1 semantics — the reference reads whole files from local
storage, worker/storage_manager.py:64-69; here the read is a
column-pruned, row-group-parallel ray.data.read_parquet).
"""

from __future__ import annotations

from typing import Optional, Sequence

import ray.data as rd

#: Columns needed by the extraction pipeline. `text` and `lang` are
#: auxiliary WET-style columns — excluded by default so multi-MB HTML
#: blocks aren't widened further.
EXTRACT_COLUMNS = ["url", "html"]


def read_pages(paths: str | Sequence[str],
               columns: Optional[Sequence[str]] = EXTRACT_COLUMNS,
               **kwargs) -> rd.Dataset:
    """Read the pages corpus with column pruning.

    ``paths`` may be a directory of shards or an explicit file list; at
    cluster scale pass the shard list so partition-level resume
    (pipelines.checkpoint) can align output partitions to input shards.
    """
    return rd.read_parquet(paths, columns=list(columns) if columns else None,
                           **kwargs)
