"""Unit tests for dedup_algos.hamming_pairs / simhash_near_dup — the
exact Hamming self-join (pigeonhole banding + popcount verify)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ocr_model_ray.functions.dedup_algos import (
    _popcount_u64, hamming_pairs, simhash_near_dup)


def _ds(hashes, ids=None, blocks=1):
    h = np.array(hashes, dtype=np.uint64).view(np.int64)
    ids = list(range(len(hashes))) if ids is None else ids
    return rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.array(ids, dtype="int64"),
         "h64": h})).repartition(blocks)


def _brute(hashes, k):
    out = []
    h = [int(x) for x in hashes]
    for i in range(len(h)):
        for j in range(i + 1, len(h)):
            d = bin(h[i] ^ h[j]).count("1")
            if d <= k:
                out.append((i, j, d))
    return sorted(out)


def _got(ds_pairs):
    df = ds_pairs.to_pandas()
    if df.empty:   # Ray's to_pandas drops 0-row blocks' schema
        return []
    return sorted(zip(df["doc_a"], df["doc_b"], df["hamming"]))


def test_popcount_swar():
    xs = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF, 0x8000000000000001],
                  dtype=np.uint64)
    assert list(_popcount_u64(xs)) == [0, 1, 2, 64, 2]


def test_pairs_vs_bruteforce(ray_session):
    rng = np.random.RandomState(11)
    base = rng.randint(0, 2**63, size=40, dtype=np.int64).astype(np.uint64)
    # plant near-dups: flip 0..5 bits of base[0]
    planted = [base[0]]
    for nbits in (1, 2, 3, 4, 5):
        v = int(base[0])
        for b in rng.choice(64, size=nbits, replace=False):
            v ^= 1 << int(b)
        planted.append(np.uint64(v))
    hashes = np.concatenate([np.array(planted, dtype=np.uint64), base[1:]])
    for mode in ("local", "distributed"):
        for scheme in ("bands", "blocks"):
            got = _got(hamming_pairs(_ds(hashes, blocks=4), max_hamming=3,
                                     scheme=scheme, mode=mode))
            assert got == _brute(hashes, 3), (mode, scheme)
    assert any(d == 3 for _, _, d in _brute(hashes, 3))  # non-trivial


def test_blocks_scheme_radii_and_widths(ray_session):
    rng = np.random.RandomState(5)
    hashes = rng.randint(0, 2**63, size=30, dtype=np.int64) \
        .astype(np.uint64)
    hashes[1] = hashes[0] ^ np.uint64(1)           # d=1
    hashes[2] = hashes[0] ^ np.uint64(0x8001)      # d=2
    for k in (0, 1, 2):
        for m in (max(k + 1, 2), 6, 8):
            got = _got(hamming_pairs(_ds(hashes), max_hamming=k,
                                     scheme="blocks", num_blocks=m,
                                     mode="local"))
            assert got == _brute(hashes, k), (k, m)


def test_radius_zero_and_duplicates(ray_session):
    hashes = [7, 7, 7, 9]
    got = _got(hamming_pairs(_ds(hashes), max_hamming=0, mode="local"))
    assert got == [(0, 1, 0), (0, 2, 0), (1, 2, 0)]


def test_empty_and_single(ray_session):
    out = hamming_pairs(_ds([]), mode="local")
    assert _got(out) == []           # local empty keeps the schema
    assert "doc_a" in out.schema().names
    # distributed all-empty collects are schema-less repo-wide; the
    # contract here is just zero rows
    assert hamming_pairs(_ds([5]), mode="distributed").count() == 0


def test_max_bucket_cap_logs_and_bounds(ray_session, caplog):
    hashes = [1] * 10  # one hot bucket
    got = _got(hamming_pairs(_ds(hashes), max_hamming=1,
                             max_bucket=4, mode="local"))
    # capped to the 4 smallest ids -> C(4,2) pairs
    assert got == [(a, b, 0) for a in range(4) for b in range(a + 1, 4)]


def test_simhash_near_dup_identical_texts(ray_session):
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["the quick brown fox jumps over the lazy dog",
                 "the quick brown fox jumps over the lazy dog",
                 "completely different content about something else"]})
    got = simhash_near_dup(rd.from_pandas(df), mode="local").to_pandas()
    assert [(r["doc_a"], r["doc_b"], r["hamming"])
            for _, r in got.iterrows()] == [(0, 1, 0)]
