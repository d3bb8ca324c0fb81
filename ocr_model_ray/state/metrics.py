"""Per-stage metrics: parquet projection + rollup (SURVEY.md §7.1
milestone 9 / §7.2 "metrics rollup -> trivial global aggregate").

``run_resumable`` commits one JSON record per run under
``out_dir/metrics/run-<k>.json`` (stage walls, rows, errors, config).
This module flattens those records into a flat per-stage parquet table
(queryable like any other output) and a cross-run rollup.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from . import manifest as mf

STAGE_SCHEMA = pa.schema([
    ("run", pa.int32()),
    ("stage", pa.string()),
    ("wall_s", pa.float64()),
    ("rows_written", pa.int64()),
    ("error_rows", pa.int64()),
    ("docs_per_sec", pa.float64()),
])


def _run_records(out_dir: str) -> list[tuple[int, dict]]:
    mdir = os.path.join(out_dir, mf.METRICS_DIR)
    out = []
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if not (name.startswith("run-") and name.endswith(".json")):
            continue
        try:
            k = int(name[len("run-"):-len(".json")])
            with open(os.path.join(mdir, name)) as f:
                out.append((k, json.load(f)))
        except (ValueError, OSError):
            continue
    return out


def metrics_table(out_dir: str) -> pa.Table:
    """Flat (run, stage, wall_s, rows, errors, docs/s) rows across all
    committed run records."""
    rows = []
    for k, rec in _run_records(out_dir):
        for st in rec.get("stage_stats") or []:
            rows.append({"run": k, "stage": st.get("stage", ""),
                         "wall_s": float(st.get("wall_s", 0.0)),
                         "rows_written": int(rec.get("rows_written", 0)),
                         "error_rows": int(rec.get("error_rows", 0)),
                         "docs_per_sec": float(rec.get("docs_per_sec") or 0.0)})
    return pa.Table.from_pylist(rows, schema=STAGE_SCHEMA)


def write_metrics_parquet(out_dir: str) -> str:
    """Materialize the flat stage table as
    ``out_dir/metrics/stages.parquet`` (idempotent)."""
    path = os.path.join(out_dir, mf.METRICS_DIR, "stages.parquet")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(metrics_table(out_dir), tmp)
    os.replace(tmp, path)
    return path


def metrics_rollup(out_dir: str) -> pd.DataFrame:
    """Per-stage aggregate across runs: n_runs, total/mean wall seconds
    — sorted by total wall descending (the "where does time go" view)."""
    t = metrics_table(out_dir).to_pandas()
    if t.empty:
        return pd.DataFrame(columns=["stage", "n_runs", "total_wall_s",
                                     "mean_wall_s"])
    out = (t.groupby("stage", as_index=False)
           .agg(n_runs=("run", "nunique"),
                total_wall_s=("wall_s", "sum"),
                mean_wall_s=("wall_s", "mean"))
           .sort_values("total_wall_s", ascending=False)
           .reset_index(drop=True))
    out["total_wall_s"] = out["total_wall_s"].round(3)
    out["mean_wall_s"] = out["mean_wall_s"].round(3)
    return out
