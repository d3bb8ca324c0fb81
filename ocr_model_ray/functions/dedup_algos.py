"""Deduplication operators over a document table.

* ``exact_dedup`` — md5-hash groupby, keep min doc_id (SQL oracle).
* ``minhash_lsh_candidates`` — shingle -> MinHash signature per batch,
  explode to (band, band_hash) keys, groupby bands -> candidate pairs,
  verify true n-gram Jaccard. The classic Broder/LSH pipeline, shaped
  so each stage is a vectorized map or ONE shuffle over small key rows
  (signatures, never full texts, move through the band shuffle).
* ``simhash_buckets`` — 64-bit SimHash, bucket by 16-bit sub-bands
  (docs within Hamming distance <=3 of each other share >=1 band).
* ``ngram_jaccard`` — exact pairwise verify for a candidate list.

At 100 TB: texts stay in place; only (doc_id, band_hash) pairs —
~tens of bytes/doc/band — shuffle. Candidate verification re-reads just
the candidate docs (here: a broadcast of the candidate texts, since
test corpora are small; at scale a bucket-join against the corpus).
"""

from __future__ import annotations


import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .text_stats import md5_hex

# MinHash parameters (frozen): 128 permutations, 16 bands x 8 rows.
NUM_PERM = 128
NUM_BANDS = 16
ROWS_PER_BAND = NUM_PERM // NUM_BANDS
_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int = NUM_PERM, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


_A, _B = _perm_params()


_SHINGLE_P = np.uint64(1099511628211)


def shingles(text: str, n: int = 3) -> np.ndarray:
    """Word n-gram shingle hash set (unique uint64 array).

    Per-word crc32 (C speed), then the n-gram combine is a vectorized
    polynomial roll over the word-hash array — no per-shingle string
    join/encode. Returned sorted-unique for set-style consumers."""
    words = text.split()
    if not words:
        return np.empty(0, dtype=np.uint64)
    wh = np.fromiter((zlib.crc32(w.encode("utf-8")) for w in words),
                     dtype=np.uint64, count=len(words))
    if len(words) < n:
        n = len(words)
    with np.errstate(over="ignore"):
        acc = wh[: len(wh) - n + 1].copy()
        for j in range(1, n):
            acc = acc * _SHINGLE_P + wh[j: len(wh) - n + 1 + j]
    return np.unique(acc)


def minhash_signature(shingle_set) -> np.ndarray:
    """128 x uint64 MinHash signature (universal hashing mod Mersenne 61).
    Accepts the uint64 array from shingles() or any int iterable."""
    xs = np.asarray(list(shingle_set) if not isinstance(shingle_set, np.ndarray)
                    else shingle_set, dtype=np.uint64)
    if xs.size == 0:
        return np.full(NUM_PERM, np.uint64(_MERSENNE), dtype=np.uint64)
    # (a*x + b) mod p, vectorized over (perm, shingle)
    with np.errstate(over="ignore"):
        prods = (_A[:, None] * xs[None, :] + _B[:, None]) % np.uint64(_MERSENNE)
    return prods.min(axis=1)


class MinHashWorker:
    """Actor-pool stage: text -> per-band (band, band_hash) rows."""

    def __init__(self, ngram: int = 3) -> None:
        self.ngram = ngram

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, bands, bhashes = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sig = minhash_signature(shingles(text, self.ngram))
            for band in range(NUM_BANDS):
                chunk = sig[band * ROWS_PER_BAND:(band + 1) * ROWS_PER_BAND]
                bh = zlib.crc32(chunk.tobytes())
                doc_ids.append(doc_id)
                bands.append(band)
                bhashes.append(bh)
        return pd.DataFrame({"doc_id": doc_ids, "band": bands,
                             "band_hash": bhashes})


def exact_dedup(ds: rd.Dataset) -> rd.Dataset:
    """Exact text dedup: md5 groupby; keeps min doc_id + dup count.
    Output: h (md5), keep_id, n_dupes."""
    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"h": md5_hex(df["text"]), "doc_id": df["doc_id"]})

    from ray.data.aggregate import Count, Min
    hashed = ds.map_batches(hash_batch, batch_format="pandas")
    return hashed.groupby("h").aggregate(Min("doc_id", alias_name="keep_id"),
                                         Count(alias_name="n_dupes"))


def minhash_lsh_candidates(ds: rd.Dataset, ngram: int = 3,
                           concurrency: int | tuple = (2, 8)) -> pd.DataFrame:
    """Candidate near-dup pairs from LSH banding. Returns a (small)
    pandas frame of unique (doc_a, doc_b) with doc_a < doc_b."""
    band_rows = ds.map_batches(MinHashWorker, batch_format="pandas",
                               batch_size=1024, concurrency=concurrency,
                               fn_constructor_kwargs={"ngram": ngram})

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    cand = band_rows.groupby(["band", "band_hash"]).map_groups(
        pairs_in_bucket, batch_format="pandas").to_pandas()
    if cand.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64")})
    return (cand.drop_duplicates().sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True).astype("int64"))


def ngram_jaccard(texts: dict[int, str], pairs: pd.DataFrame,
                  ngram: int = 3) -> pd.DataFrame:
    """Exact Jaccard over word n-gram shingles for candidate pairs."""
    cache: dict[int, np.ndarray] = {}

    def sh(doc_id: int) -> np.ndarray:
        if doc_id not in cache:
            cache[doc_id] = shingles(texts[doc_id], ngram)
        return cache[doc_id]

    sims = []
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        sa, sb = sh(int(a)), sh(int(b))
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        sims.append(round(inter / union, 6) if union else 1.0)
    out = pairs.copy()
    out["jaccard"] = sims
    return out


def near_dup_pairs(ds: rd.Dataset, threshold: float = 0.8,
                   ngram: int = 3) -> pd.DataFrame:
    """Full near-dup pipeline: LSH candidates -> exact Jaccard verify.

    The verify step broadcasts candidate texts (small at test scale; a
    bucket-join at corpus scale — see module docstring)."""
    cand = minhash_lsh_candidates(ds, ngram=ngram)
    if cand.empty:
        return cand.assign(jaccard=pd.Series([], dtype="float64"))
    needed = set(cand["doc_a"]) | set(cand["doc_b"])
    arr = pa.array(sorted(needed), pa.int64())

    texts: dict[int, str] = {}
    filtered = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["doc_id"], value_set=arr)),
        batch_format="pyarrow")
    for batch in filtered.iter_batches(batch_format="pyarrow"):
        for i, tx in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            texts[i] = tx
    verified = ngram_jaccard(texts, cand, ngram)
    return verified[verified["jaccard"] >= threshold].reset_index(drop=True)


def near_dup_clusters(ds: rd.Dataset, threshold: float = 0.8,
                      ngram: int = 3) -> pd.DataFrame:
    """Near-dup clusters: verified pairs -> connected components ->
    (doc_id, cluster_id = min doc_id of the component). Union-find runs
    on the driver over the VERIFIED pair set only (provably small: pairs
    already passed LSH banding + exact-Jaccard >= threshold; at corpus
    scale swap in a few rounds of min-label propagation via groupby —
    ray_guide pattern — without changing this function's contract)."""
    pairs = near_dup_pairs(ds, threshold=threshold, ngram=ngram)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = sorted(parent)
    return pd.DataFrame({
        "doc_id": pd.Series(members, dtype="int64"),
        "cluster_id": pd.Series([find(m) for m in members], dtype="int64"),
    })


def simhash_buckets(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, band, bucket) rows from 16-bit SimHash sub-bands — docs
    within Hamming distance 3 share at least one of the 4 bands."""
    from .text_stats import simhash64

    def batch_fn(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, bands, buckets = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            h = simhash64(text)
            for band in range(4):
                doc_ids.append(doc_id)
                bands.append(band)
                buckets.append((h >> (band * 16)) & 0xFFFF)
        return pd.DataFrame({"doc_id": doc_ids, "band": bands,
                             "bucket": buckets})

    return ds.map_batches(batch_fn, batch_format="pandas")
