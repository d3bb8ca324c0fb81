"""Resumable curation runner (pipelines/curate_run.py — round-4
verdict #5): CLI smoke, kill/resume equivalence, and funnel parity
with the query-surface composite."""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _inputs(tmp_path):
    """Corpus/eval parquet split exactly like the query shim's
    _curation_inputs: doc_id % 50 == 0 is the held-out eval split."""
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text", "lang"]).to_pandas()
    ev = docs[docs["doc_id"] % 50 == 0]
    corpus = docs[docs["doc_id"] % 50 != 0]
    cpath = str(tmp_path / "corpus.parquet")
    epath = str(tmp_path / "eval.parquet")
    corpus.to_parquet(cpath)
    ev.to_parquet(epath)
    return cpath, epath, corpus, ev


@pytest.mark.usefixtures("ray_session")
def test_curate_cli_smoke_and_funnel_parity(tmp_path):
    from ocr_model_ray.functions.decontam import ngram_set
    from ocr_model_ray.pipelines.curation import curation_funnel
    from ocr_model_ray.run import main

    cpath, epath, corpus, ev = _inputs(tmp_path)
    out = str(tmp_path / "curated")
    rc = main(["--curate", "--input", cpath, "--output", out,
               "--eval-set", epath, "--partitions", "4"])
    assert rc == 0

    with open(os.path.join(out, "groups", "_DONE.json")) as f:
        funnel = pd.DataFrame(json.load(f)["funnel"])
    # parity with the query-surface composite on the same corpus
    import ray.data as rd
    want = curation_funnel(rd.from_pandas(corpus),
                           ngram_set(ev["text"]))
    assert funnel["stage"].tolist() == want["stage"].tolist()
    assert funnel["docs"].astype("int64").tolist() == \
        want["docs"].tolist()
    assert funnel["chars"].astype("int64").tolist() == \
        want["chars"].tolist()

    # manifests all committed; curated rows match the funnel's last
    # uncontaminated-dedup stage count
    from ocr_model_ray.state import manifest as mf
    assert mf.done_partitions(out) == {0, 1, 2, 3}
    data = pads.dataset(os.path.join(out, "data"), partitioning="hive")
    assert data.count_rows() == int(want["docs"].iloc[-1])
    # packing phase completed over the curated output
    with open(os.path.join(out, "packed", "_DONE.json")) as f:
        packed = json.load(f)
    assert packed["rows"] == data.count_rows()


@pytest.mark.usefixtures("ray_session")
def test_curate_kill_resume_equals_uninterrupted(tmp_path):
    from ocr_model_ray.functions.decontam import ngram_set
    from ocr_model_ray.pipelines.curate_run import run_curation

    cpath, epath, corpus, ev = _inputs(tmp_path)
    grams = ngram_set(ev["text"])

    ref_dir = str(tmp_path / "ref")
    ref = run_curation(cpath, ref_dir, grams, num_partitions=4)
    assert ref["packed_done"]

    # simulate a SIGKILL after two partitions: start from the ref
    # output, delete two manifests + one data dir + the pack marker
    kill_dir = str(tmp_path / "killed")
    shutil.copytree(ref_dir, kill_dir)
    for pid in (2, 3):
        os.remove(os.path.join(kill_dir, "manifest",
                               f"part-{pid}.json"))
    shutil.rmtree(os.path.join(kill_dir, "data", "part_id=3"))
    shutil.rmtree(os.path.join(kill_dir, "packed"))

    resumed = run_curation(cpath, kill_dir, grams, num_partitions=4)
    assert resumed["groups_resumed"] is True
    assert resumed["partitions_done_before"] == [0, 1]
    assert sorted(resumed["partitions_written"]) == [2, 3]
    assert resumed["packed_done"]

    def read_sorted(d):
        return (pads.dataset(os.path.join(d, "data"),
                             partitioning="hive").to_table()
                .to_pandas().sort_values("doc_id")
                .reset_index(drop=True)
                [["url", "doc_id", "text", "lang", "char_count"]])

    pd.testing.assert_frame_equal(read_sorted(kill_dir),
                                  read_sorted(ref_dir))

    def read_packed(d):
        return (pads.dataset(os.path.join(d, "packed", "data"))
                .to_table().to_pandas().sort_values("doc_id")
                .reset_index(drop=True))

    pd.testing.assert_frame_equal(read_packed(kill_dir),
                                  read_packed(ref_dir))

    # a second resume is a no-op: nothing written, groups reused
    again = run_curation(cpath, kill_dir, grams, num_partitions=4)
    assert again["partitions_written"] == []
    assert again["rows_written"] == 0


@pytest.mark.usefixtures("ray_session")
def test_curate_all_filtered_corpus_terminates(tmp_path):
    """An aggressively-filtered corpus (every doc fails the Gopher
    stopword rule) is a legal outcome: zero-row manifests commit for
    every partition, packing writes an empty marker, and a resume is
    a clean no-op — no crash on the empty keep set."""
    from ocr_model_ray.pipelines.curate_run import run_curation

    soup = pd.DataFrame({
        "doc_id": pd.array(range(100), dtype="int64"),
        "text": [" ".join(f"tok{j}" for j in range(60))] * 100,
        "lang": ["en"] * 100})
    cpath = str(tmp_path / "soup.parquet")
    soup.to_parquet(cpath)
    out = str(tmp_path / "out")
    rec = run_curation(cpath, out, set(), num_partitions=4)
    assert rec["packed_done"]
    assert sorted(rec["partitions_written"]) == [0, 1, 2, 3]
    assert rec["rows_written"] == 0
    again = run_curation(cpath, out, set(), num_partitions=4)
    assert again["partitions_written"] == []


@pytest.mark.usefixtures("ray_session")
def test_curate_parity_empty_partitions_still_commit(tmp_path):
    """Review regression: kept doc_ids all even + num_partitions=4
    leaves partitions 1/3 with zero rows — they must still commit
    manifests (zero-row) so the job terminates and packs."""
    from ocr_model_ray.pipelines.curate_run import run_curation

    n = 120
    docs = pd.DataFrame({
        "doc_id": pd.array([2 * i for i in range(n)], dtype="int64"),
        "text": [" ".join(["the", "and", "of", "to", "is", "in"]
                          * 10 + [f"u{i}x{j}" for j in range(20)])
                 for i in range(n)],
        "lang": ["en"] * n})
    cpath = str(tmp_path / "even.parquet")
    docs.to_parquet(cpath)
    out = str(tmp_path / "out")
    rec = run_curation(cpath, out, set(), num_partitions=4, waves=2)
    from ocr_model_ray.state import manifest as mf
    assert mf.done_partitions(out) == {0, 1, 2, 3}
    assert rec["packed_done"]
    # every curated survivor landed (the funnel's last stage count);
    # short unique tokens push a few docs under the mean-word-length
    # gate, so compare to the funnel rather than n
    assert rec["rows_written"] == rec["funnel"]["docs"][-1] > 0
    again = run_curation(cpath, out, set(), num_partitions=4)
    assert again["partitions_written"] == []
