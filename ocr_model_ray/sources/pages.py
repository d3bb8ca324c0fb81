"""Source: the `pages` corpus (BASELINE.json input_hint shape).

Reads prune at the source: only the columns a pipeline needs leave
storage (S1 semantics — the reference reads whole files from local
storage, worker/storage_manager.py:64-69; here the read is a
column-pruned, row-group-parallel ray.data.read_parquet).

Two container formats serve the same (url, warc_ts, html) shape:

* Parquet shards — the canonical processed layout.
* WARC shards (``.warc`` / ``.warc.gz``) — the raw-crawl container
  (sources/warc.py); detected from the path's file extensions, so
  ``run_resumable("/crawl/warcs", ...)`` ingests a crawl directly.
  WARC has no column projection — the record must be parsed to find
  any field — so pruning happens at the first map instead.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import ray.data as rd

#: Columns needed by the extraction pipeline. `text` and `lang` are
#: auxiliary WET-style columns — excluded by default so multi-MB HTML
#: blocks aren't widened further.
EXTRACT_COLUMNS = ["url", "html"]

_WARC_SUFFIXES = (".warc", ".warc.gz")


def _is_warc(paths: str | Sequence[str]) -> bool:
    """True when the input is WARC-shaped: a .warc[.gz] file, a list
    of them, or a directory whose files are .warc[.gz]. A MIXED list
    (some WARC, some not) is rejected loudly — silently routing both
    halves through one reader would fail or drop the other half."""
    if not isinstance(paths, str):
        flags = [str(p).endswith(_WARC_SUFFIXES) for p in paths]
        if flags and any(flags) and not all(flags):
            raise ValueError(
                "read_pages: mixed WARC and non-WARC paths in one "
                "list — split the call per format")
        return bool(flags) and all(flags)
    if paths.endswith(_WARC_SUFFIXES):
        return True
    if os.path.isdir(paths):
        try:
            names = os.listdir(paths)
        except OSError:
            return False
        return bool(names) and all(
            n.endswith(_WARC_SUFFIXES) for n in names
            if not n.startswith("."))
    return False


def read_pages(paths: str | Sequence[str],
               columns: Optional[Sequence[str]] = EXTRACT_COLUMNS,
               **kwargs) -> rd.Dataset:
    """Read the pages corpus with column pruning.

    ``paths`` may be a directory of shards or an explicit file list; at
    cluster scale pass the shard list so partition-level resume
    (pipelines.checkpoint) can align output partitions to input shards.
    WARC input is detected from the file extensions and streamed
    through sources.warc.read_warc into the identical schema.
    """
    if _is_warc(paths):
        from .warc import read_warc

        ds = read_warc(paths, **kwargs)
        if columns:
            keep = [c for c in columns if c in ("url", "warc_ts", "html")]
            if keep != ["url", "warc_ts", "html"]:
                ds = ds.select_columns(keep)
        return ds
    return rd.read_parquet(paths, columns=list(columns) if columns else None,
                           **kwargs)
