"""Cross-run EMBEDDING near-dup index: find embedding-cosine
near-duplicates of a new shard against every vector ever ingested,
without rescanning the old corpus — the third member of the
cross-run dedup-index family (``dedup_index`` = exact,
``minhash_index`` = text MinHash, this = embedding LSH).

At 100 TB the semantic-dedup pass ("is this page an embedding-space
near-copy of anything we already kept?") must run per monthly dump
against ALL prior dumps. This module keeps a persistent index of
random-hyperplane LSH band rows — ``num_tables`` x 12 B per vector,
never the vectors — and each ingest touches only the index buckets
its own band keys land in.

Index layout (shared storage at multi-node scale):

    index_dir/_META.json                # frozen LSH geometry
    index_dir/bucket=<B>/ingest_<run_id>.parquet
        # columns: bkey:int64 (table << 32 | signature), vec_id:int64

* the plane sets derive deterministically from (seed, dim,
  num_planes, num_tables) — the SAME construction as
  ``similarity.cosine_near_dup``'s bucketed plan, frozen at first
  ingest in ``_META.json``; later ingests validate against it (a
  geometry mismatch would silently zero the recall);
* bucketed by hash of bkey, append-only immutable parts, written
  tmp + atomic rename; idempotent per run_id (a retry excludes its
  own prior parts) — the family's shared protocol;
* ``emb_ingest`` returns CANDIDATE pairs (vec_a = indexed old,
  vec_b = new) — one shared bucket is enough; ``emb_delta`` composes
  the exact-cosine verify (no driver state) and the per-new-vec
  fold, mirroring ``minhash_index.minhash_delta``.

Recall is the one-shot operator's: ``_lsh_num_tables(threshold,
num_planes, target_recall)`` tables give ~``target_recall`` for
pairs AT the threshold and higher above it; candidates that share
any bucket verify EXACTLY (float64 cosine, the emb_near_dup
kernel)."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..functions.similarity import (_ids_np, _lsh_num_tables,
                                    _normalize, _signatures, _to_matrix)

_PART_SCHEMA = pa.schema([("bkey", pa.int64()), ("vec_id", pa.int64())])


def _bucket_dir(index_dir: str, b: int) -> str:
    return os.path.join(index_dir, f"bucket={b}")


def _index_parts(bdir: str, exclude_run: str | None = None) -> list[str]:
    if not os.path.isdir(bdir):
        return []
    out = []
    for f in sorted(os.listdir(bdir)):
        if not f.endswith(".parquet"):
            continue                       # torn .tmp parts ignored
        if exclude_run and f == f"ingest_{exclude_run}.parquet":
            continue
        out.append(os.path.join(bdir, f))
    return out


def _meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, "_META.json")


def _load_or_init_meta(index_dir: str, dim: int, threshold: float,
                       num_planes: int, target_recall: float,
                       seed: int) -> dict:
    """Freeze the LSH geometry at first ingest; validate ever after
    (atomic write — two racing first ingests agree because the
    geometry is a pure function of the arguments)."""
    path = _meta_path(index_dir)
    want = {"dim": int(dim), "threshold": float(threshold),
            "num_planes": int(num_planes),
            "num_tables": int(_lsh_num_tables(threshold, num_planes,
                                              target_recall)),
            "seed": int(seed)}
    if os.path.exists(path):
        with open(path) as f:
            have = json.load(f)
        if have != want:
            raise ValueError(
                f"emb_index geometry mismatch: index has {have}, "
                f"ingest wants {want} — a mismatch silently zeroes "
                "recall, so it is an error")
        return have
    os.makedirs(index_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(want, f)
    os.replace(tmp, path)
    return want


def _plane_sets(meta: dict) -> list[np.ndarray]:
    rng = np.random.RandomState(meta["seed"])
    return [rng.normal(size=(meta["num_planes"], meta["dim"]))
            for _ in range(meta["num_tables"])]


def emb_ingest(ds: rd.Dataset, index_dir: str, run_id: str,
               threshold: float = 0.4, num_planes: int = 4,
               target_recall: float = 0.98, seed: int = 17,
               num_buckets: int = 64, id_col: str = "vec_id",
               vec_col: str = "embedding") -> rd.Dataset:
    """Ingest a shard against the index: returns candidate near-dup
    pairs (vec_a = indexed vector, vec_b = new vector), deduplicated
    across tables, and appends the shard's band rows to the index.

    Consume the returned Dataset fully — the index append happens
    inside the per-bucket tasks as the stream runs."""
    peek = ds.take_batch(1, batch_format="pandas")
    if len(peek) == 0:
        return rd.from_pandas(pd.DataFrame({
            "vec_a": pd.Series([], dtype="int64"),
            "vec_b": pd.Series([], dtype="int64")}))
    dim = len(peek[vec_col].iloc[0])
    meta = _load_or_init_meta(index_dir, dim, threshold, num_planes,
                              target_recall, seed)
    import ray
    planes_ref = ray.put(_plane_sets(meta))

    def band_rows(t: pa.Table) -> pd.DataFrame:
        psets = ray.get(planes_ref)
        ids = _ids_np(t[id_col])
        m = _normalize(_to_matrix(t[vec_col]))
        keys, out_ids = [], []
        for tab, planes in enumerate(psets):
            sigs = _signatures(m, planes)
            keys.append((np.int64(tab) << np.int64(32)) | sigs)
            out_ids.append(ids)
        bkey = np.concatenate(keys)
        out = pd.DataFrame({"bkey": bkey,
                            "vec_id": np.concatenate(out_ids)})
        b = np.uint64(0x9E3779B97F4A7C15)
        with np.errstate(over="ignore"):
            h = bkey.view(np.uint64) * b
        out["__b"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bkt = int(g["__b"].iloc[0])
        bdir = _bucket_dir(index_dir, bkt)
        os.makedirs(bdir, exist_ok=True)
        new = g[["bkey", "vec_id"]].drop_duplicates()
        parts = _index_parts(bdir, exclude_run=run_id)
        if parts:
            old = pa.concat_tables(
                [pq.read_table(p) for p in parts]).to_pandas()
            cand = old.merge(new, on="bkey", suffixes=("_a", "_b"))
            cand = (cand[["vec_id_a", "vec_id_b"]]
                    .rename(columns={"vec_id_a": "vec_a",
                                     "vec_id_b": "vec_b"})
                    .drop_duplicates())
        else:
            cand = pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                                 "vec_b": pd.Series([], dtype="int64")})
        part = pa.Table.from_pandas(new.reset_index(drop=True),
                                    schema=_PART_SCHEMA,
                                    preserve_index=False)
        dst = os.path.join(bdir, f"ingest_{run_id}.parquet")
        pq.write_table(part, dst + ".tmp")
        os.replace(dst + ".tmp", dst)      # atomic: never torn
        cand["vec_a"] = cand["vec_a"].astype("int64")
        cand["vec_b"] = cand["vec_b"].astype("int64")
        return cand

    return (ds.map_batches(band_rows, batch_format="pyarrow")
            .groupby("__b").map_groups(per_bucket,
                                       batch_format="pandas"))


#: corpus-vector cut below which the delta's verify runs in the
#: BROADCAST regime: the (ids, float64 matrix) pair rides plasma once
#: (2M x 32 dims = 512 MB) and every candidate batch computes its
#: cosines by two gathers — no membership explode, no vector-payload
#: exchange. Above the cut the no-driver-state bucket join stands
#: (the 10^12-vector shape). Same float64 expression either way —
#: the regimes are bit-equal.
BROADCAST_VECS = 2_000_000


def _verify_cosine_broadcast(corpus: rd.Dataset, cand: rd.Dataset,
                             id_col: str, vec_col: str) -> rd.Dataset:
    """Broadcast verify: one plasma-resident (sorted ids, matrix,
    norms) triple; each candidate batch gathers both endpoints and
    computes ``dot / (|a| * |b|)`` vectorized."""
    import ray

    full = corpus.map_batches(
        lambda t: t.select([id_col, vec_col]),
        batch_format="pyarrow").to_pandas()
    ids = full[id_col].to_numpy(dtype=np.int64)
    order = np.argsort(ids)
    mat = _to_matrix(full[vec_col]).astype(np.float64)[order]
    nrm = np.sqrt((mat * mat).sum(axis=1))
    ref = ray.put((ids[order], mat, nrm))

    def score(t: pa.Table) -> pa.Table:
        sid, m, n = ray.get(ref)
        a = t["vec_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["vec_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        ia = np.searchsorted(sid, a)
        ib = np.searchsorted(sid, b)
        # candidates whose endpoint is missing from the corpus drop
        # (mirrors the join regime's inner semantics)
        ok = (ia < len(sid)) & (ib < len(sid))
        ok &= (sid[np.minimum(ia, len(sid) - 1)] == a)
        ok &= (sid[np.minimum(ib, len(sid) - 1)] == b)
        ia, ib, a, b = ia[ok], ib[ok], a[ok], b[ok]
        sims = (m[ia] * m[ib]).sum(axis=1) / (n[ia] * n[ib])
        return pa.table({"vec_a": pa.array(a),
                         "vec_b": pa.array(b),
                         "sim": pa.array(sims)})

    return cand.map_batches(score, batch_format="pyarrow")


def _verify_cosine_pairs(corpus: rd.Dataset, cand: rd.Dataset,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         num_coarse: int = 32) -> rd.Dataset:
    """Exact float64 cosine for candidate (vec_a, vec_b) id pairs with
    NOTHING on the driver — the `_verify_pairs_distributed` plan with
    a cosine kernel: membership rows -> bloom semi-filter of the
    corpus -> ONE vec_id bucket join -> coarse pair-bucket groups
    computing ``dot / (|a| * |b|)`` per pair (the emb_near_dup SQL
    twin's expression)."""
    from ..functions.joins import (bloom_from_dataset, bloom_semi_filter,
                                   hash_bucket_join)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        a = df["vec_a"].to_numpy(dtype=np.int64)
        b = df["vec_b"].to_numpy(dtype=np.int64)
        return pd.DataFrame({id_col: np.concatenate([a, b]),
                             "pa": np.concatenate([a, a]),
                             "pb": np.concatenate([b, b])})

    memb = cand.map_batches(explode, batch_format="pandas").materialize()
    bf = bloom_from_dataset(memb, id_col,
                            capacity=max(int(memb.count()), 1))

    def pack(t: pa.Table) -> pa.Table:
        # acero rejects list-typed non-key join fields (the
        # hash_bucket_join limitation that motivated
        # hash_bucket_semi) — carry the vector as packed float64
        # bytes through the join instead
        m = _to_matrix(t[vec_col]).astype(np.float64)
        buf = m.tobytes(order="C")
        w = 8 * m.shape[1] if m.ndim == 2 else 0
        return pa.table({
            id_col: t[id_col].cast(pa.int64()),
            "__emb": pa.array([buf[i * w:(i + 1) * w]
                               for i in range(len(t))], pa.binary())})

    cf = bloom_semi_filter(
        corpus.map_batches(pack, batch_format="pyarrow"), bf,
        on=id_col)
    joined = hash_bucket_join(memb, cf, on=id_col)

    def add_pb(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc  # noqa: F401 (schema passthrough)
        a = t["pa"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["pb"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = ((a * np.uint64(1099511628211) + b)
                 * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        return t.replace_schema_metadata(None).append_column(
            "__pb", pa.array((h % np.uint64(num_coarse))
                             .astype(np.int32)))

    def verify_block(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                              "vec_b": pd.Series([], dtype="int64"),
                              "sim": pd.Series([], dtype="float64")})
        if len(g) == 0:
            return empty
        pa_ = g["pa"].to_numpy(dtype=np.int64)
        pb_ = g["pb"].to_numpy(dtype=np.int64)
        vid = g[id_col].to_numpy(dtype=np.int64)
        mat = np.frombuffer(b"".join(g["__emb"]), dtype=np.float64) \
            .reshape(len(g), -1)
        nrm = np.sqrt((mat * mat).sum(axis=1))
        isa = vid == pa_
        order = np.lexsort((~isa, pb_, pa_))   # a-side first per pair
        pa_, pb_, vid, isa = pa_[order], pb_[order], vid[order], isa[order]
        mat, nrm = mat[order], nrm[order]
        n = len(vid)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (pa_[1:] != pa_[:-1]) | (pb_[1:] != pb_[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        # fully vectorized: each complete pair group is (a-side rows,
        # then b-side rows); one gather of the first a row and first
        # b row per group + one batched row-dot computes every cosine
        # (the per-pair Python loop measured ~6 us/pair — the whole
        # wall at millions of random-bucket candidates)
        n_a = np.add.reduceat(isa.astype(np.int64), starts)
        sizes = ends - starts
        okp = (n_a > 0) & (n_a < sizes)    # both endpoints present
        i_idx = starts[okp]
        j_idx = starts[okp] + n_a[okp]
        if not len(i_idx):
            return empty
        sims = (mat[i_idx] * mat[j_idx]).sum(axis=1) \
            / (nrm[i_idx] * nrm[j_idx])
        return pd.DataFrame({
            "vec_a": pd.Series(pa_[i_idx], dtype="int64"),
            "vec_b": pd.Series(pb_[i_idx], dtype="int64"),
            "sim": pd.Series(sims, dtype="float64")})

    return (joined.map_batches(add_pb, batch_format="pyarrow")
            .groupby("__pb").map_groups(verify_block,
                                        batch_format="pandas"))


def emb_delta(new_vecs: rd.Dataset, index_dir: str, run_id: str,
              corpus: rd.Dataset, threshold: float = 0.4,
              num_planes: int = 4, target_recall: float = 0.98,
              seed: int = 17, num_buckets: int = 64,
              round_to: int = 5, id_col: str = "vec_id",
              vec_col: str = "embedding") -> rd.Dataset:
    """Per-NEW-vector near-dup verdict against every prior ingest —
    the embedding analogue of ``minhash_index.minhash_delta``.
    ``corpus`` must hold both runs' vectors. Output (one row per NEW
    vector): ``(vec_id, is_dup [0/1], match_old [min matching old id,
    -1 if none], best_sim [rounded, 0.0 if none], n_matches)``.

    Every stage is a bucketed exchange or a broadcast filter; the
    result is O(new shard) rows. Recall is the LSH geometry's
    (``target_recall`` at the threshold); candidates verify exactly."""
    import pyarrow.compute as pc

    from ..functions.bucketed import bucketed_agg, bucketed_distinct
    from ..functions.joins import hash_bucket_join

    cand = emb_ingest(new_vecs, index_dir, run_id,
                      threshold=threshold, num_planes=num_planes,
                      target_recall=target_recall, seed=seed,
                      num_buckets=num_buckets, id_col=id_col,
                      vec_col=vec_col)
    cand = bucketed_distinct(cand, ["vec_a", "vec_b"]).materialize()

    new_ids = new_vecs.map_batches(
        lambda t: pa.table({"vec_id": t[id_col].cast(pa.int64())}),
        batch_format="pyarrow")

    def _clean(t: pa.Table) -> pa.Table:
        n = t.num_rows
        z = np.zeros(n, dtype=np.int64)
        return pa.table({
            "vec_id": t["vec_id"],
            "is_dup": pa.array(z),
            "match_old": pa.array(np.full(n, -1, dtype=np.int64)),
            "best_sim": pa.array(z.astype(np.float64)),
            "n_matches": pa.array(z)})

    sch = cand.schema()
    if sch is None or cand.count() == 0:
        return new_ids.map_batches(_clean, batch_format="pyarrow")

    n_corpus = int(corpus.count())
    if n_corpus <= BROADCAST_VECS:
        ver = _verify_cosine_broadcast(corpus, cand, id_col, vec_col)
    else:
        ver = _verify_cosine_pairs(corpus, cand, id_col=id_col,
                                   vec_col=vec_col)

    def thresh(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sim" not in t.column_names:
            return pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        t = t.filter(pc.greater_equal(t["sim"], threshold))
        return t.set_column(t.schema.get_field_index("sim"), "sim",
                            pc.round(t["sim"], ndigits=round_to))

    ver = ver.map_batches(thresh, batch_format="pyarrow")
    matches = bucketed_agg(ver, "vec_b",
                           {"match_old": ("vec_a", "min"),
                            "best_sim": ("sim", "max"),
                            "n_matches": ("vec_a", "size")},
                           num_buckets=num_buckets)
    msch = matches.schema()
    if msch is None or "match_old" not in msch.names:
        return new_ids.map_batches(_clean, batch_format="pyarrow")

    def as_new(t: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": t["vec_b"].cast(pa.int64()),
            "match_old": t["match_old"].cast(pa.int64()),
            "best_sim": t["best_sim"].cast(pa.float64()),
            "n_matches": t["n_matches"].cast(pa.int64())})

    def verdict(t: pa.Table) -> pa.Table:
        hit = pc.is_valid(t["match_old"])
        return pa.table({
            "vec_id": t["vec_id"].cast(pa.int64()),
            "is_dup": pc.cast(hit, pa.int64()),
            "match_old": pc.fill_null(t["match_old"], -1)
            .cast(pa.int64()),
            "best_sim": pc.fill_null(t["best_sim"], 0.0)
            .cast(pa.float64()),
            "n_matches": pc.fill_null(t["n_matches"], 0)
            .cast(pa.int64())})

    return hash_bucket_join(
        new_ids, matches.map_batches(as_new, batch_format="pyarrow"),
        on="vec_id", how="left", num_buckets=num_buckets,
        post_merge=verdict)
