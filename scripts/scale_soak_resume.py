"""Kill/resume soak: SIGKILL a real checkpointed extraction run
mid-flight (the whole process group — driver, raylet, workers die
together, exactly like a preempted node) and prove the resume
completes with the committed waves skipped and output byte-facts
identical to an uninterrupted run.

    python scripts/scale_soak_resume.py [--multiplier 25]

Corpus: the bench fixture pages corpus (t2 recipe x multiplier =
4k x 25 = 100k docs). The run uses waves=8 over 64 partitions so
manifests commit incrementally; the parent polls the manifest
directory and fires SIGKILL once >= 2 waves are committed. Verdict
checks (all against a separately produced reference run):
  1. the kill landed mid-run (some, not all, manifests committed)
  2. the resume skipped every committed partition (done_before is
     the committed set; partitions_written is disjoint from it)
  3. every final manifest (row_count, url_checksum) equals the
     reference run's — byte-facts, not just counts
  4. the data read back has exactly the reference's url set, no dupes
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r"""
import json, os, sys
import ray
ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from ocr_model_ray.pipelines.checkpoint import run_resumable
rec = run_resumable(sys.argv[1], sys.argv[2], num_partitions=64, waves=8)
print("RECORD " + json.dumps({k: rec[k] for k in
      ("partitions_done_before", "partitions_written", "rows_written")}))
ray.shutdown()
"""


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
            for f in os.listdir(d) if f.endswith(".json")}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--multiplier", type=int, default=25)
    args = ap.parse_args()

    import __ray_entry__ as em
    corpus = em._fixture_dir("t2", multiplier=args.multiplier,
                             rows_per_file=2000)

    import shutil
    ref_out = "/tmp/ocr_model_ray_soak/resume_ref"
    kill_out = "/tmp/ocr_model_ray_soak/resume_kill"
    shutil.rmtree(ref_out, ignore_errors=True)
    shutil.rmtree(kill_out, ignore_errors=True)

    t = time.time()
    p = child(corpus, ref_out)
    rec_line = [ln for ln in p.stdout.read().splitlines()
                if ln.startswith("RECORD ")][0]
    assert p.wait() == 0
    ref_rec = json.loads(rec_line[7:])
    print(json.dumps({"phase": "reference", "seconds": round(time.time() - t, 1),
                      "rows": ref_rec["rows_written"],
                      "partitions": len(ref_rec["partitions_written"])}),
          flush=True)

    # killed run: SIGKILL the whole process group once >= 2 waves commit
    t = time.time()
    p = child(corpus, kill_out, new_session=True)
    committed = set()
    while True:
        committed = manifests(kill_out)
        if len(committed) >= 16:        # >= 2 of 8 waves
            os.killpg(os.getpgid(p.pid), signal.SIGKILL)
            break
        if p.poll() is not None:        # finished before we could kill
            break
        time.sleep(0.05)
    p.wait()
    committed = manifests(kill_out)
    killed_mid_run = 0 < len(committed) < 64
    print(json.dumps({"phase": "kill", "seconds": round(time.time() - t, 1),
                      "committed_at_kill": len(committed),
                      "killed_mid_run": killed_mid_run}), flush=True)

    # resume in a fresh process
    t = time.time()
    p = child(corpus, kill_out)
    rec_line = [ln for ln in p.stdout.read().splitlines()
                if ln.startswith("RECORD ")][0]
    assert p.wait() == 0
    res_rec = json.loads(rec_line[7:])
    skipped = set(res_rec["partitions_done_before"])
    redone = set(res_rec["partitions_written"])
    print(json.dumps({"phase": "resume", "seconds": round(time.time() - t, 1),
                      "skipped": len(skipped), "redone": len(redone)}),
          flush=True)

    # verify byte-facts vs the reference run
    ok = killed_mid_run and skipped == committed and skipped.isdisjoint(redone)
    ref_m, kill_m = {}, {}
    for out, dst in ((ref_out, ref_m), (kill_out, kill_m)):
        d = os.path.join(out, "manifest")
        for f in sorted(os.listdir(d)):
            with open(os.path.join(d, f)) as fh:
                m = json.load(fh)
            dst[f] = (m["row_count"], m["url_checksum"])
    manifests_equal = ref_m == kill_m

    import pyarrow.dataset as pads
    urls = pads.dataset(os.path.join(kill_out, "data"),
                        partitioning="hive").to_table(
        columns=["url"])["url"].to_pylist()
    ref_urls = pads.dataset(os.path.join(ref_out, "data"),
                            partitioning="hive").to_table(
        columns=["url"])["url"].to_pylist()
    data_equal = (len(urls) == len(set(urls)) and
                  set(urls) == set(ref_urls))

    ok = bool(ok and manifests_equal and data_equal)
    print(json.dumps({"soak": "PASS" if ok else "FAIL",
                      "manifests_equal": manifests_equal,
                      "data_equal": data_equal,
                      "urls": len(urls)}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
