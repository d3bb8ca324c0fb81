"""Benchmark harness (SURVEY.md §7.1 milestone 10).

Headline: the flagship extraction pipeline over the deterministic bench
corpus (FIXTURES.md t2 recipe × BENCH_MULTIPLIER replicas with distinct
seeded content), consumed by a partitioned parquet write — i.e. the
full read -> derive -> extract -> write stream. Also times every
queries() entry over $GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {name: sec}, "sf": ..., "num_cpus": N,
     "docs": n, "docs_per_sec": r}

--scaling: runs the headline twice in fresh processes (RAY_GRAFT_CPUS=8
then 32) on the same input and reports throughput at both plus scaling
efficiency (the sandbox stand-in for the N vs 4N node criterion —
BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

#: 100 replicas of the t2 recipe = 400k docs (~700 MB of page payloads).
#: Big enough that the ~2s fixed executor/plan cost amortizes and
#: scaling measures the streamed compute (tiny jobs are constant-
#: dominated at every cluster size; the N vs 4N criterion is about
#: sustained throughput). Generated once, cached under /tmp.
BENCH_MULTIPLIER = int(os.environ.get("BENCH_MULTIPLIER", "100"))
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

#: queries excluded from per-query timing (they re-run the flagship,
#: which is already the headline measurement)
SKIP_QUERIES = {"extract_flagship", "extract_rows", "extract_dedup"}


def run_headline() -> dict:
    import __ray_entry__ as entrymod
    from ocr_model_ray.pipelines.extract_pipeline import (
        ExtractConfig, extract_pipeline)

    pages_dir = entrymod._fixture_dir("t2", multiplier=BENCH_MULTIPLIER,
                                      rows_per_file=2000)
    files = [os.path.join(pages_dir, f) for f in sorted(os.listdir(pages_dir))
             if f.endswith(".parquet")]
    # BENCH_REPEAT_INPUT=k streams the corpus k times (longer sustained
    # run amortizes the fixed executor/plan cost in scaling ratios
    # without k-fold corpus generation; extraction is pure per doc)
    repeat = int(os.environ.get("BENCH_REPEAT_INPUT", "1"))
    files = files * repeat
    pages_dir = files
    # count docs + warm the OS page cache (untimed)
    import pyarrow.dataset as pads
    n_docs = pads.dataset(files[:len(files) // repeat]).count_rows() * repeat

    out_dir = f"/tmp/bench_out_{NUM_CPUS}"
    sink = os.environ.get("BENCH_SINK", "write")
    cfg = ExtractConfig(emit="summary", num_blocks=4 * NUM_CPUS)
    walls = []
    for _ in range(2):  # first run pays worker/page-cache warmup; report steady state
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.monotonic()
        ds = extract_pipeline(pages_dir, cfg)
        if sink == "count":
            # compute-stream measurement: consumes every block without the
            # (single shared local disk) parquet write — used by --scaling,
            # where a disk-bound sink would measure the sandbox disk, not
            # the engine (see BASELINE.md)
            ds.count()
        else:
            ds.write_parquet(out_dir)
        walls.append(time.monotonic() - t0)
    headline = walls[-1]
    out = {"sec": round(headline, 3), "cold_sec": round(walls[0], 3),
           "docs": n_docs, "sink": sink,
           "docs_per_sec": round(n_docs / headline, 1)}
    if not os.environ.get("BENCH_SKIP_QUERIES"):
        # one measured pass of the FULL emit (nested regions/rows/tables
        # layout columns materialized) — the layout-production cost
        t0 = time.monotonic()
        extract_pipeline(pages_dir, ExtractConfig(
            emit="full", num_blocks=4 * NUM_CPUS)).count()
        full_sec = time.monotonic() - t0
        out["full_emit_sec"] = round(full_sec, 3)
        out["full_emit_docs_per_sec"] = round(n_docs / full_sec, 1)
    return out


def run_queries() -> dict[str, float]:
    import __ray_entry__ as entrymod
    import ray.data as rd
    out = {}
    for name, fn in entrymod.queries().items():
        if name in SKIP_QUERIES:
            continue
        t0 = time.monotonic()
        res = fn(SF_DIR)
        if isinstance(res, rd.Dataset):
            res.to_pandas()  # force execution; query results are small
        out[name] = round(time.monotonic() - t0, 3)
    return out


def main() -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # Our operators emit typed (never schema-less) blocks — the round-1
    # sources of Ray's "RefBundle with a different schema" warning are
    # fixed. The residual emissions come from Ray's OWN AggregateNumRows
    # / aggregate-reduce internals (empty count partitions have schema
    # "."); silence that logger so the bench tail shows real signal.
    import logging
    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).setLevel(logging.ERROR)

    # untimed warmup: spins up the worker pool and warms the page cache
    # so the timed run measures steady-state compute, not process forks
    import __ray_entry__ as entrymod
    entrymod.entry().count()

    head = run_headline()
    queries = {} if os.environ.get("BENCH_SKIP_QUERIES") else run_queries()
    ray.shutdown()
    print(json.dumps({
        "metric": "flagship extraction wall time (bench corpus, parquet sink)",
        "value": head["sec"],
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs": head["docs"],
        "docs_per_sec": head["docs_per_sec"],
        "cold_sec": head["cold_sec"],
        "sink": head["sink"],
        "full_emit_sec": head.get("full_emit_sec"),
        "full_emit_docs_per_sec": head.get("full_emit_docs_per_sec"),
    }))


def _cpu_stat() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from /proc/stat — the sandbox is a
    shared host, and steal time is the direct evidence of neighbor load
    during a measurement window."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(v) for v in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def _mem_bw_probe(n_mb: int = 256, reps: int = 3) -> float:
    """Single-thread memory-copy bandwidth (GB/s), best of ``reps``.
    Neighbor tenants saturating the host's shared memory bus do NOT
    show up as steal time; this probe makes that contention visible
    (measured: a zero-steal window with this probe down ~35% matched a
    ~35% whole-pipeline throughput drop)."""
    import numpy as np
    src = np.ones(n_mb * 131072, dtype=np.float64)  # n_mb MiB
    dst = np.empty_like(src)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        np.copyto(dst, src)
        dt = time.perf_counter() - t0
        # copy touches 2x the buffer (read + write)
        best = max(best, 2 * src.nbytes / dt / 1e9)
    return round(best, 2)


def scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_SKIP_QUERIES="1",
                   BENCH_SINK=os.environ.get("BENCH_SINK", "count"),
                   # sustained stream (1.66M docs): the ~2s fixed
                   # executor/plan cost dominates short runs and
                   # understates the streaming ratio the N-vs-4N
                   # criterion is about (round-3 measured, same quiet
                   # window: raw 0.67-0.70 at 2x [14s @32cpu] vs
                   # 0.841 at 4x [23s @32cpu]; steal ~0 in all)
                   BENCH_REPEAT_INPUT=os.environ.get(
                       "BENCH_REPEAT_INPUT", "4"))
        bw_pre = _mem_bw_probe()
        s0, t0 = _cpu_stat()
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True, cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        s1, t1 = _cpu_stat()
        parsed = json.loads(out.strip().splitlines()[-1])
        parsed["steal_pct"] = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)
        # probe BRACKETS the run (contention starting mid-run would be
        # invisible to a single pre-run probe); report the worse reading
        parsed["mem_bw_gbps"] = min(bw_pre, _mem_bw_probe())
        return parsed

    # N and 4N are env-overridable: the criterion is "N vs 4N", and on
    # this single-box sandbox the 32-CPU point saturates the shared
    # memory bus (BASELINE.md r4-14: zero steal, record 8-CPU speed,
    # 32-CPU side bus-capped) — 4 -> 16 measures the same 4x scaling
    # with the top end inside the bus budget, which is the regime a
    # real 4N-node cluster (per-node buses) actually runs in
    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "32"))
    r_lo, r_hi = run(lo), run(hi)
    eff = (r_lo["docs_per_sec"] and
           (r_hi["docs_per_sec"] / r_lo["docs_per_sec"]) / (hi / lo))

    # self-calibration: the raw-multiprocessing ceiling for the SAME
    # per-doc work measured in the same minutes — the sandbox shares one
    # memory bus and has variable neighbor load (BASELINE.md), so the
    # engine's efficiency is only meaningful relative to this bound
    ceiling = subprocess.run(
        [sys.executable, "scripts/mp_ceiling.py", "8"],
        capture_output=True, text=True, check=True,
        env=dict(os.environ, GRAFT_SCALE_LO=str(lo),
                 GRAFT_SCALE_HI=str(hi)),
        cwd=os.path.dirname(os.path.abspath(__file__))).stdout
    ceiling = json.loads(ceiling.strip().splitlines()[-1])

    print(json.dumps({
        "metric": f"extraction throughput scaling "
                  f"({lo} -> {hi} cpus, same input)",
        "docs": r_lo["docs"], "sink": r_lo.get("sink"),
        "sec_8": r_lo["value"], "docs_per_sec_8": r_lo["docs_per_sec"],
        "sec_32": r_hi["value"], "docs_per_sec_32": r_hi["docs_per_sec"],
        "steal_pct_8": r_lo.get("steal_pct"),
        "steal_pct_32": r_hi.get("steal_pct"),
        "mem_bw_gbps_8": r_lo.get("mem_bw_gbps"),
        "mem_bw_gbps_32": r_hi.get("mem_bw_gbps"),
        "scaling_efficiency": round(eff, 3),
        "mp_ceiling_docs_per_sec_8": ceiling["docs_per_sec_8"],
        "mp_ceiling_docs_per_sec_32": ceiling["docs_per_sec_32"],
        "mp_ceiling_efficiency": ceiling["ceiling_efficiency"],
        "efficiency_vs_ceiling": round(eff / ceiling["ceiling_efficiency"], 3)
        if ceiling["ceiling_efficiency"] else None,
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
