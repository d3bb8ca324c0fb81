"""Int8 scalar quantization of embedding vectors — the storage layout
every large-scale ANN index actually serves (4x smaller than float32,
SIMD-friendly dot products), expressed as a pure streaming map.

Per vector: ``m = max(|x_i|)``, ``scale = m / 127.0``, and each
component quantizes to ``q_i = trunc(x_i * 127.0 / m)`` (int8 range
by construction; an all-zero vector quantizes to all-zero codes with
scale 0). ``trunc`` — NOT round — is the frozen rule: both numpy and
DuckDB truncate identically on the bit-identical IEEE double
``x * 127.0 / m`` (banker's-vs-away rounding of ``round`` would
diverge between engines on exact .5 products; the SQL-twin doctrine).

The panel row emits the verifiable per-vector signature
(n_dims, scale, code_sum, code_min, code_max) — integer aggregates of
the codes are order-free and exact, so the oracle comparison pins the
ENTIRE code vector through its sum/extremes without shipping d rows
per vector. ``codes()`` returns the raw (vec_id, q:list<int8>) rows
for consumers building an actual index.

Scale shape: no exchange at all — one batch in, one row per vector
out; at 10^12 vectors the cost is the read itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .similarity import _ids_np, _to_matrix


def _quantize(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(codes int64 (n, d), m float64 (n,)) per the frozen rule."""
    m = np.abs(mat).max(axis=1) if mat.size else \
        np.zeros(len(mat), np.float64)
    safe = np.where(m == 0, 1.0, m)
    q = np.trunc(mat * 127.0 / safe[:, None]).astype(np.int64)
    q[m == 0] = 0
    return q, m


def scalar_quantize_stats(ds: rd.Dataset, id_col: str = "vec_id",
                          vec_col: str = "embedding") -> rd.Dataset:
    """(vec_id, n_dims, scale, code_sum, code_min, code_max) —
    see module doc; empty-embedding rows are absent (no components,
    matching the SQL inner unnest)."""

    def batch(t: pa.Table) -> pa.Table:
        ids = _ids_np(t[id_col])
        mat = _to_matrix(t[vec_col])
        if mat.size == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "n_dims": pa.array([], pa.int64()),
                "scale": pa.array([], pa.float64()),
                "code_sum": pa.array([], pa.int64()),
                "code_min": pa.array([], pa.int64()),
                "code_max": pa.array([], pa.int64())})
        q, m = _quantize(mat)
        return pa.table({
            id_col: pa.array(ids),
            "n_dims": pa.array(np.full(len(ids), mat.shape[1],
                                       np.int64)),
            "scale": pa.array(m / 127.0),
            "code_sum": pa.array(q.sum(axis=1)),
            "code_min": pa.array(q.min(axis=1)),
            "code_max": pa.array(q.max(axis=1))})

    return ds.map_batches(batch, batch_format="pyarrow")


def quantize_codes(ds: rd.Dataset, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> rd.Dataset:
    """(vec_id, q:list<int8>, scale) raw code rows — the index-build
    feed; same frozen rule as ``scalar_quantize_stats``."""

    def batch(t: pa.Table) -> pa.Table:
        ids = _ids_np(t[id_col])
        mat = _to_matrix(t[vec_col])
        if mat.size == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "q": pa.array([], pa.list_(pa.int8())),
                "scale": pa.array([], pa.float64())})
        q, m = _quantize(mat)
        n, d = q.shape
        flat = pa.array(q.astype(np.int8).ravel(), pa.int8())
        lists = pa.FixedSizeListArray.from_arrays(flat, d)
        return pa.table({id_col: pa.array(ids),
                         "q": lists,
                         "scale": pa.array(m / 127.0)})

    return ds.map_batches(batch, batch_format="pyarrow")


def knn_int8(ds: rd.Dataset, queries, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_self: bool = True):
    """Quantized brute-force top-k: every corpus vector AND every
    query quantizes by the frozen trunc rule, neighbors rank by the
    INTEGER code dot product (score desc, neighbor_id asc) — the
    int8-index search an ANN store actually executes, and, because
    the scores are exact integers, the one kNN variant whose oracle
    is bit-exact end to end (the float paths need a rounding grid).

    Returns (query_id, neighbor_id, score:int64). Scale shape =
    ``knn_bruteforce``: queries broadcast once, per-block integer
    matmul + value-threshold partial top-k (ties never dropped), one
    small driver merge."""
    import pandas as pd
    import ray

    from .similarity import _topk_candidates

    if len(queries) == 0:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "neighbor_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="int64")})
    qids = queries[id_col].to_numpy().astype(np.int64)
    qcodes, _ = _quantize(_to_matrix(queries[vec_col]))
    ref = ray.put((qids, qcodes))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q_ids, qc = ray.get(ref)
        ids = _ids_np(batch[id_col])
        codes, _m = _quantize(_to_matrix(batch[vec_col]))
        scores = codes @ qc.T                     # exact int64
        out_q, out_n, out_s = [], [], []
        kk = min(k + (1 if exclude_self else 0), len(ids))
        for qi in range(scores.shape[1]):
            col = scores[:, qi]
            for t in _topk_candidates(col, kk):
                out_q.append(int(q_ids[qi]))
                out_n.append(int(ids[t]))
                out_s.append(int(col[t]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "score": pa.array(out_s, pa.int64())})

    partials = ds.map_batches(partial_topk,
                              batch_format="pyarrow").to_pandas()
    if partials.empty or "query_id" not in partials.columns:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "neighbor_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="int64")})
    from .similarity import _finalize_topk
    return _finalize_topk(partials, k, exclude_self, round_to=None,
                          score_col="score") \
        .astype({"query_id": "int64", "neighbor_id": "int64",
                 "score": "int64"})
