"""Exact content dedup (D1): extract once per content_hash, fan out to
every url (the reference's FS result-cache, worker/document_processor.py:
149-205 + worker/storage_manager.py:27-47, re-expressed as a shuffle).

``distinct_by_hash`` is the ONE all-to-all exchange of raw payload bytes
in the pipeline: a ``groupby(content_hash).map_groups`` that keeps each
group's payload once plus the sorted url list. Extraction then runs per
distinct document and assembly replicates per url inside ExtractWorker
(fanout mode) — no second shuffle, because the extraction result is a
pure function of the payload and ids are recomputed per url.

At 100 TB: the shuffle moves each payload exactly once (same cost as a
repartition); with web-crawl dup ratios of 20-40% it removes that
fraction of the expensive extract work. For dup-free inputs, skip this
stage entirely (extraction is pure, dedup is only an optimization).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def _first_with_urls(group: pa.Table) -> pa.Table:
    order = pa.compute.sort_indices(group["url"])
    first = order[0].as_py()
    urls = pa.compute.take(group["url"], order)
    cols = {name: group[name].take(pa.array([first])) for name in group.schema.names}
    cols["urls"] = pa.array([urls.to_pylist()], pa.list_(pa.string()))
    return pa.Table.from_pydict(cols)


def distinct_by_hash(ds: rd.Dataset) -> rd.Dataset:
    """Group by ``content_hash``; one row per distinct payload with a
    ``urls`` list column (sorted for determinism). Requires the derive
    stage to have run."""
    return ds.groupby("content_hash").map_groups(
        _first_with_urls, batch_format="pyarrow")
