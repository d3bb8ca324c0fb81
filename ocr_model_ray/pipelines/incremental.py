"""Incremental snapshot extraction: re-extract ONLY what changed.

The 100-TB workflow this serves: crawl corpora arrive as periodic
snapshots (Common Crawl ships monthly), and between snapshots most
pages are byte-identical — re-running the expensive extraction stage
over the unchanged mass is pure waste. ``run_incremental`` processes
snapshot N+1 against snapshot N's extraction output:

    new crawl ──derive──► NARROW (url, content_hash) stream
                                 │ one FULL OUTER hash-bucket join with
                                 │ the prior output's (url, hash) index
                                 │ — only 16-48 B rows ever shuffle
                 verdict per url: carry / extract / drop
            ┌────────────────────┴───────────────────┐
     extract set (changed+new)            drop set (changed+gone)
            │ broadcast semi filter              │ broadcast ANTI filter
            │ over a re-read of the crawl        │ over the prior rows
       ExtractWorker (the expensive        carried rows stream parquet
       stage runs on the CHANGE RATE,      -> writer, no exchange, no
       not the corpus)                     re-extraction
            └───────────────── union ───────────────┘
                        partitioned write + manifests

Correctness: ``content_hash`` is the sha256 of the payload, and
extraction is a pure function of (url, payload) — equal hash + equal
url means the carried prior row is byte-identical to what
re-extraction would produce (pinned by test: incremental output ==
full re-extraction output, per url).

Scale shape: NO payload ever crosses an exchange in the default plan —
the only shuffle is the narrow verdict join; the new crawl is read
twice (hash pass + filtered extract pass: a second column-pruned
parquet/WARC read is far cheaper than shuffling payload blocks, the
measured difference on the soak corpus is 2x end-to-end), and prior
rows stream read->filter->write. The url filter sets broadcast
exactly below a 5M-url cut (~250 MB object-store copy); above it both
sides fall back to the exact bucketed semi filter
(``joins.hash_bucket_semi``) — at 10^10 changed urls a broadcast is
impossible and ONE payload exchange is the honest cost. Output urls
are exactly the NEW snapshot's urls: pages that disappeared from the
crawl drop out, new ones appear, changed ones are fresh.

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

#: above this many filter urls, broadcast turns into the exact
#: bucketed semi exchange (tests monkeypatch this to force that path)
BROADCAST_CUT = 5_000_000


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
    from ..functions.joins import (broadcast_semi_filter,
                                   hash_bucket_join, hash_bucket_semi)
    from .extract_pipeline import derived_pages

    cfg = cfg or ExtractConfig()
    t0 = time.monotonic()
    prior_data = os.path.join(prior_dir, mf.DATA_DIR)

    # -------- phase 1: NARROW verdict join (no payload in any
    # exchange). The new crawl is read+hashed once (a streaming map —
    # derive needs the payload, but only 16-48 B (url, hash) rows
    # enter the exchange). Each side pre-aggregates PER URL first —
    # real crawls carry duplicate captures of a url, and a url is
    # carryable only when BOTH snapshots have exactly one capture
    # with equal hashes (any multiplicity -> re-extract all new
    # captures and drop all prior rows, which is what a full run
    # would produce). The aggregation also keeps the outer join free
    # of dup-key row products.
    from ..functions.bucketed import bucketed_agg

    new_idx = derived_pages(paths, num_blocks=cfg.num_blocks) \
        .map_batches(lambda t: t.select(["url", "content_hash"]),
                     batch_format="pyarrow")
    prior_idx = rd.read_parquet(prior_data,
                                columns=["url", "content_hash"])
    new_agg = bucketed_agg(
        new_idx, "url",
        {"n_new": ("content_hash", "size"),
         "h_new_lo": ("content_hash", "min")},
        num_buckets=num_buckets)
    old_agg = bucketed_agg(
        prior_idx, "url",
        {"n_old": ("content_hash", "size"),
         "h_old_lo": ("content_hash", "min")},
        num_buckets=num_buckets)

    def classify(t):
        # status: 0 carry (1x1 capture, equal hash) / 1 extract (url
        # in the new crawl, not carryable) / 2 drop (prior-only url)
        import pyarrow.compute as pc
        if isinstance(t, pd.DataFrame):
            t = pa.Table.from_pandas(t, preserve_index=False)
        new_p = pc.is_valid(t["n_new"])
        old_p = pc.is_valid(t["n_old"])
        one_each = pc.and_(
            pc.fill_null(pc.equal(t["n_new"], 1), False),
            pc.fill_null(pc.equal(t["n_old"], 1), False))
        same = pc.fill_null(pc.equal(t["h_new_lo"], t["h_old_lo"]),
                            False)
        carry = pc.and_(pc.and_(pc.and_(new_p, old_p), one_each), same)
        status = pc.if_else(
            carry, pa.scalar(0, pa.int8()),
            pc.if_else(new_p, pa.scalar(1, pa.int8()),
                       pa.scalar(2, pa.int8())))
        return pa.table({"url": t["url"], "status": status})

    verdict = hash_bucket_join(
        new_agg, old_agg, on="url", how="outer",
        num_buckets=num_buckets, post_merge=classify).materialize()

    n_carried = verdict.filter(expr="status == 0").count()
    extract_urls = verdict.filter(expr="status == 1") \
        .select_columns(["url"])
    n_extract = extract_urls.count()
    # prior rows to DROP = changed urls (status 1 with a prior row —
    # conservatively all status-1: a brand-new url simply isn't in the
    # prior, so anti-filtering it is a no-op) + gone urls (status 2)
    drop_urls = verdict.filter(expr="status != 0").select_columns(["url"])
    n_drop = drop_urls.count()

    # -------- phase 2: the changed pages re-read + filter + extract,
    # through extract_pipeline itself (so cfg.dedup / concurrency /
    # num_blocks wiring is THE flagship wiring, not a copy) with the
    # url filter as its pages_transform. Below the cut the changed-url
    # set broadcasts EXACTLY (one object-store copy, ~50 B/url ->
    # ~250 MB at the cut) and NO payload ever enters an exchange;
    # above it, the payload stream takes ONE bucketed semi exchange
    # (still only to co-locate with the url set — at a 10^10-url
    # change set a broadcast is impossible).
    if n_extract <= BROADCAST_CUT:
        keys = pa.concat_arrays([
            b["url"].combine_chunks().cast(pa.string())
            for b in extract_urls.iter_batches(batch_format="pyarrow",
                                               batch_size=None)]
            or [pa.array([], pa.string())])

        def keep_changed(pages_ds):
            return broadcast_semi_filter(pages_ds, keys, on="url")
    else:  # pragma: no cover - exercised via forced-cut test
        def keep_changed(pages_ds):
            return hash_bucket_semi(pages_ds, extract_urls, on="url",
                                    num_buckets=num_buckets)

    # the expensive stage: extraction over the changed subset only
    fresh = extract_pipeline(paths, cfg, pages_transform=keep_changed)

    # -------- phase 3: carry the prior rows forward. The DROP set
    # (changed + gone) is the small side of a realistic snapshot
    # delta, so below the cut the carry is an exact broadcast ANTI
    # filter — prior rows stream straight from parquet to the writer
    # with no exchange. Above it, one bucketed SEMI exchange against
    # the carried urls (a filter, not a join — the full-emit layout
    # columns are nested, which the bucket join's acero merge
    # rejects). hive part_id rides in from the path and is recomputed
    # for the merged write.
    prior_full = rd.read_parquet(prior_data).drop_columns(["part_id"])
    if n_drop <= BROADCAST_CUT:
        drop_keys = pa.concat_arrays([
            b["url"].combine_chunks().cast(pa.string())
            for b in drop_urls.iter_batches(batch_format="pyarrow",
                                            batch_size=None)]
            or [pa.array([], pa.string())])
        carried = broadcast_semi_filter(prior_full, drop_keys,
                                        on="url", anti=True)
    else:  # pragma: no cover - exercised via forced-cut test
        carried_urls = verdict.filter(expr="status == 0") \
            .select_columns(["url"])
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
    # the PRIOR's schema is the output contract — the fresh side
    # projects down to it when it can. A summary-schema prior (either
    # emit='summary', or run_resumable's default drop_nested
    # projection of a full emit) accepts any cfg.emit: the summary
    # columns carry identical values in both modes (the
    # summary-vs-full golden invariant). A full-schema prior needs
    # emit='full' — a summary emit cannot synthesize the nested
    # layout columns.
    if carried_cols == set(SUMMARY_SCHEMA.names):
        cols = list(SUMMARY_SCHEMA.names)
    elif carried_cols == set(EXTRACTED_SCHEMA.names):
        if cfg.emit != "full":
            raise ValueError(
                "prior output carries the full nested layout; run "
                "with ExtractConfig(emit='full') so the fresh side "
                "produces the same columns")
        cols = list(EXTRACTED_SCHEMA.names)
    else:
        raise ValueError(
            "prior output schema is neither the summary nor the full "
            f"extraction schema (found: {sorted(carried_cols)}) — not "
            "a run_resumable/run_incremental output?")

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
