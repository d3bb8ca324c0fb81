"""Incremental snapshot extraction: re-extract ONLY what changed.

The 100-TB workflow this serves: crawl corpora arrive as periodic
snapshots (Common Crawl ships monthly), and between snapshots most
pages are byte-identical — re-running the expensive extraction stage
over the unchanged mass is pure waste. ``run_incremental`` processes
snapshot N+1 against snapshot N's extraction output:

    new crawl ──derive──► (url, html, content_hash, ...)
                                 │ one hash-bucket join on url with the
                                 │ prior output's (url, content_hash)
                                 │ narrow index (16-48 B rows)
            ┌────────────────────┴───────────────────┐
       changed / new urls                   unchanged urls
            │                                        │
       ExtractWorker (the expensive        prior FULL rows join in by
       stage runs on the CHANGE RATE,      url — one exchange of prior
       not the corpus)                     rows, no re-extraction
            └───────────────── union ───────────────┘
                        partitioned write + manifests

Correctness: ``content_hash`` is the sha256 of the payload, and
extraction is a pure function of (url, payload) — equal hash + equal
url means the carried prior row is byte-identical to what
re-extraction would produce (pinned by test: incremental output ==
full re-extraction output, per url).

Scale shape: payloads cross exactly ONE exchange (the verdict join,
where carried rows drop their payload in the bucket task); prior rows
cross one; the extraction actor pool — the dominant cost at real OCR
weights — runs on the changed subset only. The prior index is NEVER a
driver-side set (a 10^12-url broadcast is impossible); both semi
joins are the bucketed exchange from ``functions/joins.py``. Output
urls are exactly the NEW snapshot's urls: pages that disappeared from
the crawl drop out, new ones appear, changed ones are fresh.

Reference seam: the reference's result cache
(worker/cache.py:34-88) reuses extraction results WITHIN a job by
content hash; this module is the cross-snapshot generalization the
survey's D1/J1 analysis calls for at corpus scale.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Sequence

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..state import manifest as mf
from .extract_pipeline import ExtractConfig, extract_pipeline

#: columns the verdict join keeps for the extraction side
_PAGE_COLS = ["url", "html", "content_hash", "mime", "size_bytes"]


def _data_root(out_dir: str) -> str:
    path = os.path.join(out_dir, mf.DATA_DIR)
    os.makedirs(path, exist_ok=True)
    return path


def run_incremental(paths: str | Sequence[str], prior_dir: str,
                    out_dir: str, cfg: Optional[ExtractConfig] = None,
                    num_partitions: int = 16,
                    num_buckets: int = 32) -> dict:
    """Extract a new crawl snapshot into ``out_dir``, carrying over
    the prior snapshot's rows for pages whose (url, content_hash) is
    unchanged. ``prior_dir`` is a completed ``run_resumable`` /
    ``run_incremental`` output (its ``data/`` tree is read
    column-pruned for the index, then joined for the carried rows).

    The new output must be schema-compatible with the prior run: use
    the same ``cfg.emit`` the prior run used (asserted before the
    union). Returns a metrics record with the carry/extract split."""
    from ..functions.joins import hash_bucket_join
    from .extract_pipeline import derived_pages

    cfg = cfg or ExtractConfig()
    t0 = time.monotonic()
    prior_data = os.path.join(prior_dir, mf.DATA_DIR)

    pages = derived_pages(paths, num_blocks=cfg.num_blocks)

    prior_idx = rd.read_parquet(prior_data,
                                columns=["url", "content_hash"])

    def verdict(t):
        # prior hash rides in as content_hash_r (suffix join); equal ->
        # carry. Carried rows drop the payload RIGHT HERE, inside the
        # bucket task, so unchanged bytes never leave the exchange.
        # The join hands Arrow or pandas depending on the bucket path.
        import pyarrow.compute as pc
        if isinstance(t, pd.DataFrame):
            t = pa.Table.from_pandas(t, preserve_index=False)
        carry = pc.fill_null(
            pc.equal(t["content_hash"], t["content_hash_r"]), False)
        html = pc.if_else(carry,
                          pa.nulls(t.num_rows, t.schema.field("html").type),
                          t["html"])
        cols = {c: (html if c == "html" else t[c]) for c in _PAGE_COLS}
        cols["__carry"] = carry
        return pa.table(cols)

    # materialized once: both branches below consume it, and without
    # the pin each branch would re-run the whole verdict join. Its
    # volume is bounded — changed pages with payload (the change rate
    # x corpus) plus bare urls for the carried mass — and the object
    # store spills it rather than holding it in heap.
    judged = hash_bucket_join(
        pages, prior_idx, on="url", how="left",
        num_buckets=num_buckets, post_merge=verdict).materialize()

    changed = judged.filter(expr="__carry == False") \
        .drop_columns(["__carry"])
    carried_urls = judged.filter(expr="__carry == True") \
        .select_columns(["url"])

    # the expensive stage: extraction over the changed subset only
    from ..stages.extract import ExtractWorker
    kwargs = dict(batch_format="pyarrow", batch_size=cfg.batch_size,
                  num_cpus=cfg.num_cpus)
    ctor = {"max_pages": cfg.max_pages, "emit": cfg.emit,
            "engine": cfg.engine, "fast": cfg.fast}
    if cfg.concurrency is not None:
        fresh = changed.map_batches(ExtractWorker,
                                    concurrency=cfg.concurrency,
                                    fn_constructor_kwargs=ctor, **kwargs)
    else:
        fresh = changed.map_batches(ExtractWorker(**ctor), **kwargs)

    # hive layout puts part_id in the path, not the file schema; it
    # rides in as a column and gets recomputed for the merged write.
    # The carry is a SEMI filter, not a join — the full-emit layout
    # columns are nested (list<struct>), which the bucket join's acero
    # merge rejects, and a filter passes any schema through untouched.
    from ..functions.joins import hash_bucket_semi
    prior_full = rd.read_parquet(prior_data).drop_columns(["part_id"])
    carried = hash_bucket_semi(prior_full, carried_urls, on="url",
                               num_buckets=num_buckets)

    # schema compatibility from METADATA, not Dataset.schema() (which
    # would execute the lazy joins): the prior run's file schema vs
    # this run's emit schema
    import glob

    import pyarrow.parquet as pq
    prior_files = glob.glob(os.path.join(prior_data, "**", "*.parquet"),
                            recursive=True)
    if not prior_files:
        raise ValueError(f"no prior output under {prior_data}")
    carried_cols = set(pq.read_schema(prior_files[0]).names)
    from ..stages.extract import EXTRACTED_SCHEMA, SUMMARY_SCHEMA
    emit_schema = (SUMMARY_SCHEMA if cfg.emit == "summary"
                   else EXTRACTED_SCHEMA)
    fresh_cols = set(emit_schema.names)
    if fresh_cols != carried_cols:
        raise ValueError(
            "prior output schema differs from this run's emit "
            f"(prior-only: {sorted(carried_cols - fresh_cols)}, "
            f"new-only: {sorted(fresh_cols - carried_cols)}); run "
            "with the prior snapshot's ExtractConfig(emit=...)")
    cols = list(emit_schema.names)  # run_resumable's column order

    merged = fresh.select_columns(cols).union(
        carried.select_columns(cols))
    merged = merged.map_batches(
        lambda b: mf.add_partition_column(b, num_partitions),
        batch_format="pyarrow")
    merged.write_parquet(_data_root(out_dir), partition_cols=["part_id"])

    rows = 0
    errors = 0
    written = []
    ddir = _data_root(out_dir)
    for name in os.listdir(ddir):
        if name.startswith("part_id="):
            try:
                pid = int(name.split("=", 1)[1])
            except ValueError:
                continue
            facts = mf.summarize_partition(out_dir, pid)
            rows += facts["row_count"]
            errors += facts["error_count"]
            mf.commit_manifest(out_dir, pid, input_files=None, **facts)
            written.append(pid)

    n_carried = carried_urls.count()
    wall = round(time.monotonic() - t0, 3)
    record = {
        "mode": "incremental",
        "prior_dir": prior_dir,
        "partitions_total": num_partitions,
        "partitions_written": sorted(written),
        "rows_written": rows,
        "rows_carried": n_carried,
        "rows_extracted": rows - n_carried,
        "change_rate": round((rows - n_carried) / rows, 4) if rows else None,
        "error_rows": errors,
        "wall_s": wall,
        "config": {"dedup": cfg.dedup, "max_pages": cfg.max_pages,
                   "batch_size": cfg.batch_size, "emit": cfg.emit},
    }
    mf.write_metrics(out_dir, record)
    return record
