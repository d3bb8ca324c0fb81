"""Kill/resume soak for the CURATION runner: SIGKILL a real
`run_curation(waves=8)` job mid-write (whole process group — driver,
raylet, workers die together) and prove the resume completes with
committed partitions skipped and output byte-facts identical to an
uninterrupted run (the round-4 verdict #5 chain, exercised the way
`scale_soak_resume.py` exercises extraction).

    python scripts/scale_soak_curate_resume.py [--docs 400000]

Corpus: synthetic documents (doc_id, text, lang) with planted exact
duplicates (every 7th doc repeats doc-3's text), non-target languages
(every 11th), short low-quality docs (every 13th) and eval-set
contamination (every 17th embeds a held-out eval sentence) — every
funnel stage has real attrition. Checks:
  1. the kill landed mid-run (some, not all, manifests committed)
  2. the resume skipped every committed partition
  3. every final manifest (row_count, url_checksum, char_count)
     equals the uninterrupted reference's
  4. the curated data and packed plan read back identical
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EVAL_SENT = ("the held out benchmark sentence nobody should train on "
             "ever at all costs")

CHILD = r"""
import json, os, sys
import ray
ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from ocr_model_ray.functions.decontam import ngram_set
from ocr_model_ray.pipelines.curate_run import run_curation
grams = ngram_set([%r])
rec = run_curation(sys.argv[1], sys.argv[2], grams,
                   num_partitions=64, waves=8)
print("RECORD " + json.dumps({k: rec[k] for k in
      ("partitions_done_before", "partitions_written",
       "rows_written", "packed_done")}))
ray.shutdown()
""" % EVAL_SENT


def child(corpus: str, out: str, new_session: bool = False):
    return subprocess.Popen(
        [sys.executable, "-c", CHILD, corpus, out],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, start_new_session=new_session)


def manifests(out: str) -> set[int]:
    d = os.path.join(out, "manifest")
    if not os.path.isdir(d):
        return set()
    return {int(f.split(".")[0].split("-")[-1])
            for f in os.listdir(d)
            if f.startswith("part-") and f.endswith(".json")}


def build_corpus(n: int, path: str) -> None:
    import numpy as np
    import pandas as pd
    # the vocab includes the Gopher probe stopwords so a normal doc
    # PASSES the quality gate (a pure token-soup corpus fails the
    # stopword rule and curates to zero — found the hard way)
    words = np.array([f"tok{i:03d}" for i in range(500)]
                     + ["the", "and", "of", "to", "in", "is"] * 40,
                     dtype=object)
    rows_id, rows_tx, rows_lg = [], [], []
    base3 = None
    for i in range(n):
        rng = np.random.RandomState(i * 31 + 5)
        toks = words[rng.randint(0, len(words), 80)].tolist()
        text = " ".join(toks)
        if i == 3:
            base3 = text
        if i % 7 == 0 and i > 3:
            text = base3                  # exact duplicate family
        if i % 13 == 0:
            text = " ".join(toks[:8])     # too short for Gopher
        if i % 17 == 0:
            text = text + " " + EVAL_SENT   # contaminated
        rows_id.append(i)
        rows_tx.append(text)
        rows_lg.append("en" if i % 11 else "xx")  # lang-gated tail
    pd.DataFrame({"doc_id": pd.array(rows_id, dtype="int64"),
                  "text": rows_tx,
                  "lang": rows_lg}).to_parquet(path)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400_000)
    args = ap.parse_args()

    root = "/tmp/ocr_model_ray_soak/curate_resume"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    corpus = os.path.join(root, "docs.parquet")
    t0 = time.time()
    build_corpus(args.docs, corpus)
    build_s = round(time.time() - t0, 1)

    ref_out = os.path.join(root, "ref")
    kill_out = os.path.join(root, "killed")

    # reference: uninterrupted run
    t0 = time.time()
    p = child(corpus, ref_out)
    ref_stdout, _ = p.communicate()
    assert p.returncode == 0, ref_stdout
    ref_s = round(time.time() - t0, 1)

    # killed run: SIGKILL the whole group once >= 2 waves committed
    p = child(corpus, kill_out, new_session=True)
    killed_at = None
    for _ in range(2400):
        committed = manifests(kill_out)
        if len(committed) >= 16:          # 2 of 8 waves (64 parts)
            os.killpg(os.getpgid(p.pid), signal.SIGKILL)
            killed_at = len(committed)
            break
        if p.poll() is not None:
            break
        time.sleep(0.05)
    p.wait()
    mid_run = killed_at is not None and killed_at < 64
    committed = manifests(kill_out)

    # resume
    t0 = time.time()
    p = child(corpus, kill_out)
    res_stdout, _ = p.communicate()
    assert p.returncode == 0, res_stdout
    resume_s = round(time.time() - t0, 1)
    rec = json.loads(
        [ln for ln in res_stdout.splitlines()
         if ln.startswith("RECORD ")][0][len("RECORD "):])
    skipped_ok = (set(rec["partitions_done_before"]) == committed
                  and not (set(rec["partitions_written"]) & committed))

    # byte-facts: every manifest equal to the reference's
    def load_manifests(out):
        d = os.path.join(out, "manifest")
        facts = {}
        for f in sorted(os.listdir(d)):
            if f.startswith("part-") and f.endswith(".json"):
                j = json.load(open(os.path.join(d, f)))
                facts[j["partition"]] = (j["row_count"],
                                         j["url_checksum"],
                                         j["char_count"])
        return facts

    m_eq = load_manifests(ref_out) == load_manifests(kill_out)

    import pyarrow.dataset as pads

    def read_sorted(out, sub, cols=None):
        return (pads.dataset(os.path.join(out, sub), partitioning="hive")
                .to_table(columns=cols).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))

    d_eq = read_sorted(ref_out, "data").equals(
        read_sorted(kill_out, "data"))
    p_eq = read_sorted(ref_out, "packed/data").equals(
        read_sorted(kill_out, "packed/data"))

    ok = mid_run and skipped_ok and m_eq and d_eq and p_eq \
        and rec["packed_done"]
    print(json.dumps({
        "soak": "curate_resume", "docs": args.docs,
        "build_s": build_s, "ref_run_s": ref_s, "resume_s": resume_s,
        "committed_at_kill": sorted(committed)[:4] + ["..."],
        "n_committed_at_kill": len(committed),
        "kill_mid_run": mid_run, "resume_skipped_committed": skipped_ok,
        "manifests_equal": m_eq, "data_equal": d_eq,
        "packed_equal": p_eq, "pass": ok}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
