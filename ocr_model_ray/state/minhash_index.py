"""Cross-run NEAR-dup index: find near-duplicates of a new crawl shard
against every document ever ingested, without rescanning the old
corpus — the MinHash twin of ``state/dedup_index.py`` (which answers
the same question for exact duplicates).

At 100 TB the corpus arrives as monthly dumps; "is this text a
near-copy of anything we already kept?" must be answered against ALL
prior dumps. This module keeps a persistent index of LSH band rows —
``num_bands`` x 12 B per doc instead of the documents — and each
ingest touches only the index buckets its own band hashes land in.

Index layout (shared storage at multi-node scale):

    index_dir/bucket=<B>/ingest_<run_id>.parquet
        # columns: band:int32, band_hash:int64, doc_id:int64

* bucketed by hash of (band, band_hash), so an ingest's per-bucket
  task reads ONLY its bucket's partitions;
* append-only immutable parts, written tmp + atomic rename (a killed
  ingest leaves only ``.tmp`` files later runs ignore);
* idempotent per run_id (a retry excludes its own prior parts), the
  same protocol as ``dedup_ingest``.

``minhash_ingest`` returns CANDIDATE pairs (old_doc, new_doc) — one
band collision is enough. Compose with
``dedup_algos._verify_pairs_distributed`` for exact-Jaccard-confirmed
pairs (``minhash_ingest_verified`` does exactly that). Banding and
recall are the near_dup_pairs defaults (``_lsh_params`` derives the
band count from the threshold), so cross-run recall matches the
one-shot operator's.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..functions.dedup_algos import (MinHashWorker, _lsh_params,
                                     _verify_pairs_distributed)

_PART_SCHEMA = pa.schema([("band", pa.int32()),
                          ("band_hash", pa.int64()),
                          ("doc_id", pa.int64())])


def _bucket_dir(index_dir: str, b: int) -> str:
    return os.path.join(index_dir, f"bucket={b}")


def _index_parts(bdir: str, exclude_run: str | None = None) -> list[str]:
    if not os.path.isdir(bdir):
        return []
    out = []
    for f in sorted(os.listdir(bdir)):
        if not f.endswith(".parquet"):
            continue   # torn .tmp files from a killed ingest
        if exclude_run is not None and f == f"ingest_{exclude_run}.parquet":
            continue
        out.append(os.path.join(bdir, f))
    return out


def minhash_ingest(ds: rd.Dataset, index_dir: str, run_id: str,
                   threshold: float = 0.8, ngram: int = 3,
                   num_buckets: int = 64, id_col: str = "doc_id",
                   text_col: str = "text") -> rd.Dataset:
    """Ingest a shard against the index: returns candidate near-dup
    pairs (doc_a = indexed doc, doc_b = new doc), deduplicated across
    bands, and appends the shard's band rows to the index.

    Consume the returned Dataset fully — the index append happens
    inside the per-bucket tasks as the stream runs."""
    os.makedirs(index_dir, exist_ok=True)
    num_bands = _lsh_params(threshold)
    worker = MinHashWorker(ngram=ngram, num_bands=num_bands)

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = worker(df.rename(columns={id_col: "doc_id",
                                        text_col: "text"}))
        b = np.uint64(0x9E3779B97F4A7C15)
        with np.errstate(over="ignore"):
            h = (out["band_hash"].to_numpy().view(np.uint64)
                 + out["band"].to_numpy().astype(np.uint64)) * b
        out = out[["band", "band_hash", "doc_id"]].copy()
        out["__b"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bkt = int(g["__b"].iloc[0])
        bdir = _bucket_dir(index_dir, bkt)
        os.makedirs(bdir, exist_ok=True)
        new = g[["band", "band_hash", "doc_id"]].drop_duplicates()
        parts = _index_parts(bdir, exclude_run=run_id)
        if parts:
            old = pa.concat_tables(
                [pq.read_table(p) for p in parts]).to_pandas()
            cand = old.merge(new, on=["band", "band_hash"],
                             suffixes=("_a", "_b"))
            cand = (cand[["doc_id_a", "doc_id_b"]]
                    .rename(columns={"doc_id_a": "doc_a",
                                     "doc_id_b": "doc_b"})
                    .drop_duplicates())
        else:
            cand = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})
        part = pa.Table.from_pandas(new.reset_index(drop=True),
                                    schema=_PART_SCHEMA,
                                    preserve_index=False)
        dst = os.path.join(bdir, f"ingest_{run_id}.parquet")
        pq.write_table(part, dst + ".tmp")
        os.replace(dst + ".tmp", dst)      # atomic: never torn
        cand["doc_a"] = cand["doc_a"].astype("int64")
        cand["doc_b"] = cand["doc_b"].astype("int64")
        return cand

    return (ds.map_batches(band_rows, batch_format="pandas")
            .groupby("__b").map_groups(per_bucket,
                                       batch_format="pandas"))


def minhash_ingest_verified(corpus: rd.Dataset, cand: rd.Dataset,
                            threshold: float = 0.8,
                            ngram: int = 3) -> rd.Dataset:
    """Exact-Jaccard confirmation of cross-run candidates: the same
    no-driver-state verify join near_dup_pairs uses (bloom semi-filter
    -> text join -> coarse pair-bucket Jaccard), thresholded. ``corpus``
    must contain the texts of BOTH runs' doc ids."""
    import pyarrow.compute as pc

    # a band collision can repeat (a, b) in either role order across
    # buckets; _verify_pairs_distributed keys pairs as given, so
    # normalize to doc_a < doc_b first
    def norm(df: pd.DataFrame) -> pd.DataFrame:
        a = df["doc_a"].to_numpy(dtype=np.int64)
        b = df["doc_b"].to_numpy(dtype=np.int64)
        return (pd.DataFrame({"doc_a": np.minimum(a, b),
                              "doc_b": np.maximum(a, b)})
                .drop_duplicates())

    pairs = cand.map_batches(norm, batch_format="pandas")
    verified = _verify_pairs_distributed(corpus, pairs, ngram)

    def thresh(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "jaccard" not in t.column_names:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        return t.filter(pc.greater_equal(t["jaccard"], threshold))

    return verified.map_batches(thresh, batch_format="pyarrow")


def minhash_delta(new_docs: rd.Dataset, index_dir: str, run_id: str,
                  corpus: rd.Dataset, threshold: float = 0.8,
                  ngram: int = 3, num_buckets: int = 64,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> rd.Dataset:
    """Per-NEW-DOC near-dup verdict against every prior ingest — the
    incremental-extraction analogue for fuzzy dedup (round-4 verdict
    #6): "which documents of this new crawl are near-copies of
    anything we already kept, and of what?".

    Composes the existing verified primitives end-to-end: ingest the
    new shard's band rows (idempotent per ``run_id`` — a retry
    excludes its own prior parts), collect OLD x NEW band-collision
    candidates from the touched index buckets only, confirm them with
    the no-driver-state exact-Jaccard verify join (``corpus`` must
    hold both sides' texts), and fold per new doc in one bucketed
    aggregation. Roles survive the whole pipeline: ``minhash_ingest``
    emits (doc_a = indexed old doc, doc_b = new doc) and
    ``_verify_pairs_distributed`` keys pairs as given.

    Output (one row per NEW doc): ``(doc_id, is_dup [0/1 int],
    match_old [min matching old id, -1 if none], best_jaccard
    [0.0 if none], n_matches)``. Sentinels instead of NULLs keep the
    SQL twin's hash comparable.

    Scale shape: every stage is a bucketed exchange or a broadcast
    (bloom) filter; pairs, texts and the verdict table all stay in
    the object store — the result is O(new shard) rows, the honest
    output size."""
    import pyarrow.compute as pc

    from ..functions.bucketed import bucketed_agg, bucketed_distinct
    from ..functions.dedup_algos import _EMPTY_VERIFIED
    from ..functions.joins import hash_bucket_join

    cand = minhash_ingest(new_docs, index_dir, run_id,
                          threshold=threshold, ngram=ngram,
                          num_buckets=num_buckets, id_col=id_col,
                          text_col=text_col)
    # a band collision repeats across bands/buckets: one row per
    # (old, new) pair before texts ship into the verify join
    cand = bucketed_distinct(cand, ["doc_a", "doc_b"]).materialize()

    new_ids = new_docs.map_batches(
        lambda t: pa.table({"doc_id": t[id_col].cast(pa.int64())}),
        batch_format="pyarrow")

    def _clean(t: pa.Table) -> pa.Table:
        n = t.num_rows
        z = np.zeros(n, dtype=np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "is_dup": pa.array(z),
            "match_old": pa.array(np.full(n, -1, dtype=np.int64)),
            "best_jaccard": pa.array(z.astype(np.float64)),
            "n_matches": pa.array(z)})

    if cand.count() == 0:
        return new_ids.map_batches(_clean, batch_format="pyarrow")

    ver = _verify_pairs_distributed(corpus, cand, ngram)
    ver = ver.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], threshold))
        if t.num_rows and "jaccard" in t.column_names
        else pa.Table.from_pandas(pd.DataFrame(_EMPTY_VERIFIED)),
        batch_format="pyarrow")
    matches = bucketed_agg(ver, "doc_b",
                           {"match_old": ("doc_a", "min"),
                            "best_jaccard": ("jaccard", "max"),
                            "n_matches": ("doc_a", "size")},
                           num_buckets=num_buckets)
    mschema = matches.schema()
    if mschema is None or "match_old" not in mschema.names:
        return new_ids.map_batches(_clean, batch_format="pyarrow")

    def as_new(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_b"].cast(pa.int64()),
            "match_old": t["match_old"].cast(pa.int64()),
            "best_jaccard": t["best_jaccard"].cast(pa.float64()),
            "n_matches": t["n_matches"].cast(pa.int64())})

    def verdict(t: pa.Table) -> pa.Table:
        hit = pc.is_valid(t["match_old"])
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "is_dup": pc.cast(hit, pa.int64()),
            "match_old": pc.fill_null(
                t["match_old"], -1).cast(pa.int64()),
            "best_jaccard": pc.fill_null(
                t["best_jaccard"], 0.0).cast(pa.float64()),
            "n_matches": pc.fill_null(
                t["n_matches"], 0).cast(pa.int64())})

    return hash_bucket_join(
        new_ids, matches.map_batches(as_new, batch_format="pyarrow"),
        on="doc_id", how="left", num_buckets=num_buckets,
        post_merge=verdict)
