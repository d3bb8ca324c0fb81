"""Generate round-2 oracle goldens (run: python scripts/gen_goldens_round2.py).

Two kinds:

1. ``tests/goldens/docs_text_keyed.parquet`` — deterministic text-stat
   outputs (lang-id, simhash, winnow fingerprints) keyed by md5(text)
   over the UNION of every testdata sf's documents. Oracle SQL joins
   ``documents`` on md5(text), so the same golden serves any sf the
   driver or tests run at.

2. ``tests/goldens/t{1,2}/rows.parquet`` and ``extract_lang_id.parquet``
   — flat extraction outputs per fixture tier. The extract pipeline is
   deterministic (frozen spec.py); each golden is generated twice and
   compared value-identical before being written.

The committed nested golden (extracted.parquet) doubles as the
extract_flagship / extract_dedup oracle via column projection.
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]


def text_keyed_golden() -> pa.Table:
    from ocr_model_ray.functions.text_stats import (
        LangIdWorker, fingerprint_batch, md5_hex, simhash_batch)
    frames = []
    for sf in SF_DIRS:
        t = pq.read_table(os.path.join(sf, "documents.parquet"),
                          columns=["doc_id", "text"]).to_pandas()
        frames.append(t)
    docs = pd.concat(frames, ignore_index=True)
    docs["h"] = md5_hex(docs["text"])
    docs = docs.drop_duplicates("h").reset_index(drop=True)

    lang = LangIdWorker()(docs)
    sim = simhash_batch(docs)
    fp = fingerprint_batch(docs)
    out = pd.DataFrame({
        "h": docs["h"],
        "pred_lang": lang["pred_lang"].to_numpy(),
        "stopword_hit_ratio": lang["stopword_hit_ratio"].to_numpy(),
        "simhash_hex": sim["simhash_hex"].to_numpy(),
        "n_fingerprints": fp["n_fingerprints"].to_numpy(),
        "fingerprint_min": fp["fingerprint_min"].to_numpy(),
        "fingerprint_max": fp["fingerprint_max"].to_numpy(),
    }).sort_values("h").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def extract_goldens(tier: str) -> dict[str, pa.Table]:
    import ray
    import __ray_entry__ as em
    from ocr_model_ray.functions.text_stats import LangIdWorker
    from ocr_model_ray.pipelines.extract_pipeline import (
        extract_pipeline, rows_table)
    pages = em._fixture_dir(tier)
    rows = rows_table(extract_pipeline(pages)).to_pandas()
    sort_cols = [c for c in ["url", "page", "row_id", "region_id"]
                 if c in rows.columns]
    rows = rows.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)

    ext = extract_pipeline(pages).to_pandas()
    lang_in = pd.DataFrame({"doc_id": ext["url"],
                            "text": ext["extracted_text"]})
    lang = LangIdWorker()(lang_in).sort_values("doc_id", kind="mergesort") \
        .reset_index(drop=True)
    return {"rows.parquet": pa.Table.from_pandas(rows, preserve_index=False),
            "extract_lang_id.parquet":
                pa.Table.from_pandas(lang, preserve_index=False)}


def near_dup_pair_golden() -> pa.Table:
    """Near-dup pairs keyed by unordered md5(text) pairs. A pair's
    presence is PAIR-LOCAL (band collision + jaccard are functions of
    the two texts only), so the union over sfs serves any corpus via a
    double join on md5(text). Same-hash (exact-dup) edges are excluded
    — their (rep, member) id assignment is corpus-specific; none of the
    oracle-checked corpora (sf0.001/sf0.01) contain exact dups."""
    import ray.data as rd
    from ocr_model_ray.functions.dedup_algos import near_dup_pairs
    from ocr_model_ray.functions.text_stats import md5_hex
    rows = []
    for sf in SF_DIRS:
        docs = pq.read_table(os.path.join(sf, "documents.parquet"),
                             columns=["doc_id", "text"]).to_pandas()
        h = dict(zip(docs["doc_id"], md5_hex(docs["text"])))
        pairs = near_dup_pairs(rd.from_pandas(docs), threshold=0.8)
        for a, b, j in zip(pairs["doc_a"], pairs["doc_b"], pairs["jaccard"]):
            ha, hb = sorted((h[int(a)], h[int(b)]))
            if ha != hb:
                rows.append((ha, hb, float(j)))
    out = (pd.DataFrame(rows, columns=["ha", "hb", "jaccard"])
           .drop_duplicates(["ha", "hb"]).sort_values(["ha", "hb"])
           .reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


def emb_ann_goldens() -> dict[str, pa.Table]:
    """Recorded deterministic outputs of the seeded approximate-ANN
    queries per sf (lsh planes and ivf centroids are pure functions of
    (seed, corpus)); the oracle branches on lineitem row count to pick
    the matching recording."""
    import __ray_entry__ as em
    out = {}
    for sf, tag in zip(SF_DIRS, ["a", "b", "c"]):
        for q in ["emb_knn_lsh", "emb_knn_ivf"]:
            res = em.queries()[q](sf)
            res = res.sort_values(["query_id", "neighbor_id"]) \
                .reset_index(drop=True)
            out[f"{q}_{tag}.parquet"] = pa.Table.from_pandas(
                res, preserve_index=False)
        km = em.queries()["emb_kmeans"](sf)
        out[f"emb_kmeans_{tag}.parquet"] = pa.Table.from_pandas(
            km, preserve_index=False)
    return out


def main() -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    t = text_keyed_golden()
    t2 = text_keyed_golden()
    assert t.equals(t2), "text-keyed golden not deterministic"
    pq.write_table(t, os.path.join(GOLDEN_DIR, "docs_text_keyed.parquet"))
    print(f"docs_text_keyed.parquet: {t.num_rows} distinct texts")

    nd = near_dup_pair_golden()
    nd2 = near_dup_pair_golden()
    assert nd.equals(nd2), "near-dup pair golden not deterministic"
    pq.write_table(nd, os.path.join(GOLDEN_DIR, "near_dup_pairs_by_hash.parquet"))
    print(f"near_dup_pairs_by_hash.parquet: {nd.num_rows} pairs")

    ann = emb_ann_goldens()
    ann2 = emb_ann_goldens()
    for name in ann:
        assert ann[name].equals(ann2[name]), f"{name} not deterministic"
        pq.write_table(ann[name], os.path.join(GOLDEN_DIR, name))
        print(f"{name}: {ann[name].num_rows} rows")

    for tier in ["t1", "t2"]:
        a = extract_goldens(tier)
        b = extract_goldens(tier)
        for name in a:
            assert a[name].equals(b[name]), f"{tier}/{name} not deterministic"
            path = os.path.join(GOLDEN_DIR, tier, name)
            pq.write_table(a[name], path)
            print(f"{tier}/{name}: {a[name].num_rows} rows")
    ray.shutdown()


if __name__ == "__main__":
    main()
