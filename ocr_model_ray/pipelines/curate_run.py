"""Resumable curation runner: the clean -> dedup -> decontam -> pack
chain as a `ray job submit`-able job with per-partition lineage
manifests and per-stage metrics (round-4 verdict #5 — the curation
composite previously ran only as queries; this wires it behind the
same checkpoint/manifest protocol `run.py` uses for extraction).

Three phases, each independently resumable:

1. **Decision checkpoint** (`<out>/groups/`): the fused curation
   funnel (`pipelines/curation.curation_groups`) computes the global
   dedup-group verdict table (h, keep_id, chars, contaminated) and
   the 5-stage funnel. The verdict table streams to parquet and the
   funnel commits atomically as the `_DONE.json` marker — a killed
   run recomputes only if the marker is missing (the table is the
   corpus-global decision; partition-local resume cannot split it,
   so it checkpoints as one unit — its rows are ~60 B/doc, never
   text).
2. **Curated write** (`<out>/data/part_id=P/` + `<out>/_manifests/`):
   surviving texts join back (bloom prefilter + one bucketed join)
   and write partitioned by ``doc_id % P`` under the SAME manifest
   protocol as extraction (`state/manifest.py`): done partitions are
   filtered out before the join on resume, torn partitions are
   cleaned, each written partition commits a manifest with row count
   + checksum + char count. A synthetic ``url = doc://<doc_id>``
   and ``error = NULL`` columns make the extraction manifest
   summarizer work unchanged.
3. **Packing** (`<out>/packed/`): once every partition's manifest is
   committed, `functions/packing.sequence_pack` runs over the
   curated output and streams the (doc_id, n_tokens, cum_before,
   seq_id) plan to parquet with its own `_DONE.json` marker.

The funnel counts written to the marker equal
`queries()['docs_curation_funnel']`'s oracle on the same corpus
(pinned by test)."""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..state import manifest as mf
from .curation import DEFAULT_LANGS, curation_groups

GROUPS_DIR = "groups"
PACKED_DIR = "packed"
DONE_MARKER = "_DONE.json"


def _marker(path: str) -> str:
    return os.path.join(path, DONE_MARKER)


def _commit_marker(path: str, payload: dict) -> None:
    tmp = _marker(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, _marker(path))


def _decide(corpus: rd.Dataset, out_dir: str, eval_grams: set,
            langs, n: int, mode: str) -> tuple[rd.Dataset, pd.DataFrame, bool]:
    """Phase 1: the global verdict table, checkpointed once."""
    gdir = os.path.join(out_dir, GROUPS_DIR)
    gdata = os.path.join(gdir, "data")
    if os.path.exists(_marker(gdir)):
        with open(_marker(gdir)) as f:
            saved = json.load(f)
        funnel = pd.DataFrame(saved["funnel"]).astype(
            {"docs": "int64", "chars": "int64"})
        return rd.read_parquet(gdata), funnel, True
    import shutil
    shutil.rmtree(gdir, ignore_errors=True)   # torn prior attempt
    os.makedirs(gdata, exist_ok=True)
    groups, funnel = curation_groups(corpus, eval_grams, langs=langs,
                                     n=n, mode=mode)
    groups.write_parquet(gdata)
    _commit_marker(gdir, {"funnel": funnel.to_dict(orient="list")})
    return rd.read_parquet(gdata), funnel, False


def run_curation(input_path: str, out_dir: str, eval_grams: set,
                 langs=DEFAULT_LANGS, n: int = 8,
                 num_partitions: int = 16, seq_len: int = 256,
                 pack: bool = True, mode: str = "auto",
                 waves: int = 1) -> dict:
    """Run (or resume) the curation chain into ``out_dir``. Returns a
    metrics record (per-stage walls, funnel, partitions written).

    ``waves`` sets the COMMIT GRANULARITY of the curated write — the
    same contract as ``checkpoint.run_resumable``: partition p
    belongs to wave ``p % waves`` and each wave's manifests commit
    before the next wave's join starts, so a SIGKILL loses at most
    one wave of curated output (with waves=1 a kill forfeits the
    whole write; the groups checkpoint always survives either way)."""
    t0 = time.monotonic()
    corpus = rd.read_parquet(input_path,
                             columns=["doc_id", "text", "lang"])

    t1 = time.monotonic()
    groups, funnel, resumed_groups = _decide(corpus, out_dir,
                                             eval_grams, langs, n, mode)
    decide_s = round(time.monotonic() - t1, 3)

    done_before = mf.done_partitions(out_dir)
    cleaned = mf.clean_partial(out_dir)
    todo_all = sorted(set(range(num_partitions)) - done_before)
    t2 = time.monotonic()
    written: list[int] = []
    rows_written = 0
    waves = max(1, int(waves))
    wave_sets = [[p for p in todo_all if p % waves == w]
                 for w in range(waves)]
    if todo_all:
        def keep_ids(t: pa.Table) -> pa.Table:
            sel = t.filter(pc.invert(pc.cast(t["contaminated"],
                                             pa.bool_())))
            return pa.table({"doc_id": sel["keep_id"].cast(pa.int64())})

        ids = groups.map_batches(keep_ids,
                                 batch_format="pyarrow").materialize()
        n_keep = int(ids.count()) if ids.schema() is not None else 0
        if n_keep == 0:
            # nothing survived curation (an aggressively-filtered
            # corpus is a legal outcome, not a crash): the partitions
            # are DONE with zero rows — commit their manifests so a
            # resume terminates
            for pid in todo_all:
                mf.commit_manifest(out_dir, pid, row_count=0,
                                   url_checksum=0, char_count=0,
                                   error_count=0, input_files=None)
            written.extend(todo_all)
            wave_sets = []

        from ..functions.joins import (bloom_from_dataset,
                                       bloom_semi_filter,
                                       hash_bucket_join)
        bf = None
        if n_keep:
            bf = bloom_from_dataset(ids, "doc_id", capacity=n_keep)

        def tag_and_prune(t: pa.Table) -> pa.Table:
            # tag part_id and drop already-done partitions; the bloom
            # filter below then cuts non-survivors, so the MATERIALIZED
            # projection is O(kept rows) — the corpus is read ONCE for
            # all waves (a per-wave re-scan read W x the input from
            # storage; the candidate set is narrow and spillable)
            dids = t["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            pid = pa.array((dids % num_partitions).astype(np.int32))
            t = t.append_column("part_id", pid)
            return t.filter(pc.is_in(
                t["part_id"], value_set=pa.array(todo_all, pa.int32())))

        def finish(t: pa.Table) -> pa.Table:
            txt = t["text"]
            urls = pc.binary_join_element_wise(
                pa.array(["doc://"] * t.num_rows, pa.string()),
                pc.cast(t["doc_id"], pa.string()), "")
            return pa.table({
                "url": urls,
                "doc_id": t["doc_id"].cast(pa.int64()),
                "text": txt,
                "lang": t["lang"],
                "char_count": pc.utf8_length(
                    pc.cast(txt, pa.string())).cast(pa.int64()),
                "error": pa.nulls(t.num_rows, pa.string()),
                "part_id": t["part_id"].cast(pa.int32())})

        candidates = None
        if wave_sets:
            candidates = bloom_semi_filter(
                corpus.map_batches(tag_and_prune,
                                   batch_format="pyarrow"),
                bf, on="doc_id").materialize()

        for wave_todo in wave_sets:
            if not wave_todo:
                continue
            wave_arr = pa.array(wave_todo, pa.int32())
            survivors = candidates.map_batches(
                lambda t, _w=wave_arr: t.filter(
                    pc.is_in(t["part_id"], value_set=_w)),
                batch_format="pyarrow")
            curated = hash_bucket_join(survivors, ids, on="doc_id",
                                       post_merge=finish)
            curated.write_parquet(os.path.join(out_dir, mf.DATA_DIR),
                                  partition_cols=["part_id"])
            # commit THIS wave's manifests before the next wave runs
            ddir = os.path.join(out_dir, mf.DATA_DIR)
            todo_set = set(wave_todo)
            wave_written = []
            if os.path.isdir(ddir):
                for name in os.listdir(ddir):
                    if name.startswith("part_id="):
                        try:
                            pid = int(name.split("=", 1)[1])
                        except ValueError:
                            continue
                        if pid in todo_set:
                            wave_written.append(pid)
            for pid in sorted(wave_written):
                facts = mf.summarize_partition(out_dir, pid)
                rows_written += facts["row_count"]
                mf.commit_manifest(out_dir, pid, input_files=None,
                                   **facts)
            # a partition with ZERO surviving rows writes no part dir
            # — commit its empty manifest too, or done_partitions()
            # never reaches num_partitions and the job cannot finish
            # (review finding: parity-structured doc_ids leave half
            # the partitions permanently un-done otherwise)
            for pid in sorted(todo_set - set(wave_written)):
                mf.commit_manifest(out_dir, pid, row_count=0,
                                   url_checksum=0, char_count=0,
                                   error_count=0, input_files=None)
                wave_written.append(pid)
            written.extend(wave_written)
    write_s = round(time.monotonic() - t2, 3)

    pack_s = None
    packed_done = False
    if pack and len(mf.done_partitions(out_dir)) == num_partitions:
        pdir = os.path.join(out_dir, PACKED_DIR)
        if os.path.exists(_marker(pdir)):
            packed_done = True
        elif not os.path.isdir(os.path.join(out_dir, mf.DATA_DIR)):
            # zero-row curation: an empty packing plan, marker only
            import shutil
            shutil.rmtree(pdir, ignore_errors=True)
            os.makedirs(os.path.join(pdir, "data"), exist_ok=True)
            _commit_marker(pdir, {"rows": 0, "seq_len": seq_len})
            packed_done = True
            pack_s = 0.0
        else:
            import shutil
            shutil.rmtree(pdir, ignore_errors=True)
            t3 = time.monotonic()
            from ..functions.packing import sequence_pack
            curated_ds = rd.read_parquet(
                os.path.join(out_dir, mf.DATA_DIR),
                columns=["doc_id", "text"])
            packed = sequence_pack(curated_ds, seq_len=seq_len,
                                   mode=mode)
            pdata = os.path.join(pdir, "data")
            os.makedirs(pdata, exist_ok=True)
            packed.write_parquet(pdata)
            import pyarrow.dataset as pads
            n_rows = pads.dataset(pdata).count_rows()
            _commit_marker(pdir, {"rows": int(n_rows),
                                  "seq_len": seq_len})
            pack_s = round(time.monotonic() - t3, 3)
            packed_done = True

    record = {
        "job": "curation",
        "partitions_total": num_partitions,
        "partitions_done_before": sorted(done_before),
        "partitions_cleaned": sorted(cleaned),
        "partitions_written": sorted(written),
        "rows_written": rows_written,
        "groups_resumed": resumed_groups,
        "funnel": funnel.to_dict(orient="list"),
        "decide_s": decide_s, "write_s": write_s, "pack_s": pack_s,
        "packed_done": packed_done,
        "wall_s": round(time.monotonic() - t0, 3),
    }
    mf.write_metrics(out_dir, record)
    return record
