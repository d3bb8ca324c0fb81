"""Winnowing fingerprints (Schleimer et al. 2003): selection
guarantee, plan equality, and the boilerplate df guard."""

import numpy as np
import pandas as pd
import pytest

from ocr_model_ray.functions.winnow import (
    DEFAULT_K, DEFAULT_W, KR_MOD, _doc_fingerprints, _kr_constants,
    fingerprint_summary, shared_fingerprint_pairs,
)

THRESH = DEFAULT_W + DEFAULT_K - 1  # guarantee: matches >= this length


def test_winnowing_guarantee_property():
    """Paper guarantee: any shared substring of length >= w + k - 1
    shares at least one fingerprint HASH; density is ~2/(w+1)."""
    rng = np.random.default_rng(7)
    consts = _kr_constants(DEFAULT_K)
    alphabet = list("abcdefghij ")
    for trial in range(20):
        a = "".join(rng.choice(alphabet, 80))
        b = "".join(rng.choice(alphabet, 80))
        shared = "".join(rng.choice(alphabet, THRESH))
        ta = a[:40] + shared + a[40:]
        tb = b[:10] + shared + b[10:]
        _, ha = _doc_fingerprints(ta, DEFAULT_K, DEFAULT_W, consts)
        _, hb = _doc_fingerprints(tb, DEFAULT_K, DEFAULT_W, consts)
        assert set(ha) & set(hb), f"trial {trial}: guarantee violated"
    # density sanity on a long doc: ~2n/(w+1) selected positions
    t = "".join(rng.choice(alphabet, 5000))
    pos, _ = _doc_fingerprints(t, DEFAULT_K, DEFAULT_W, consts)
    n_grams = 5000 - DEFAULT_K + 1
    assert len(pos) < 3 * n_grams / (DEFAULT_W + 1)
    assert len(pos) > n_grams / (DEFAULT_W + 1)


def test_doc_fingerprints_edges_and_hash_range():
    consts = _kr_constants(DEFAULT_K)
    # shorter than one full window -> nothing
    pos, h = _doc_fingerprints("x" * (THRESH - 1), DEFAULT_K,
                               DEFAULT_W, consts)
    assert len(pos) == 0
    # exactly one window -> exactly one fingerprint
    pos, h = _doc_fingerprints("abcdefghijkl", DEFAULT_K, DEFAULT_W,
                               consts)
    assert len(pos) == 1 and 0 <= h[0] < KR_MOD
    # positions are 1-based gram starts
    assert 1 <= pos[0] <= DEFAULT_W


@pytest.mark.usefixtures("ray_session")
def test_winnow_pairs_plans_agree_and_detect_partial_copy():
    import ray.data as rd
    rng = np.random.default_rng(3)
    alphabet = list("abcdefghij ")
    base = "".join(rng.choice(alphabet, 200))
    rows = []
    for i in range(30):
        rows.append({"doc_id": i,
                     "text": "".join(rng.choice(alphabet, 200))})
    # docs 100/101: same 200-char core, different 20-char affixes
    rows.append({"doc_id": 100, "text": "prefixprefixprefix!! " + base})
    rows.append({"doc_id": 101, "text": base + " suffixsuffixsuffix!"})
    ds = rd.from_items(rows).repartition(4)
    loc = shared_fingerprint_pairs(ds, min_shared=2, mode="local")
    dst = shared_fingerprint_pairs(ds, min_shared=2, mode="distributed")
    pd.testing.assert_frame_equal(loc, dst)
    assert ((loc["doc_a"] == 100) & (loc["doc_b"] == 101)).any()
    hit = loc[(loc["doc_a"] == 100) & (loc["doc_b"] == 101)].iloc[0]
    assert hit["jaccard"] >= 0.5
    # unrelated random docs don't reach jaccard 1/2
    assert len(loc) < 5


@pytest.mark.usefixtures("ray_session")
def test_winnow_max_df_guard_drops_boilerplate_hash():
    """1k docs sharing one boilerplate banner: with max_df below the
    corpus size the banner's fingerprints are dropped and the pair set
    stays empty instead of exploding quadratically."""
    import ray.data as rd
    banner = "subscribe to our newsletter today okay"
    rng = np.random.default_rng(11)
    alphabet = list("abcdefghij ")
    rows = [{"doc_id": i,
             "text": banner + " " + "".join(rng.choice(alphabet, 30))}
            for i in range(200)]
    ds = rd.from_items(rows).repartition(4)
    guarded = shared_fingerprint_pairs(ds, min_shared=1, jq_num=1,
                                       jq_den=10, max_df=50,
                                       mode="distributed")
    unguarded = shared_fingerprint_pairs(ds, min_shared=1, jq_num=1,
                                         jq_den=10, max_df=10**9,
                                         mode="distributed")
    # without the guard every pair shares the banner fingerprints ->
    # the full quadratic pair set; with it only chance one-hash
    # matches between the random 30-char tails survive
    assert len(unguarded) == 200 * 199 // 2
    assert len(guarded) < 100
    assert (guarded["n_shared"] <= 2).all()


@pytest.mark.usefixtures("ray_session")
def test_winnow_summary_and_empty_corpus():
    import ray.data as rd
    empty = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "text": pd.Series([], dtype="object")}))
    s = fingerprint_summary(empty)
    assert list(s.columns) == ["doc_id", "n_fp", "sum_h",
                               "min_pos", "max_pos"]
    assert s.empty
    p = shared_fingerprint_pairs(empty, mode="local")
    assert list(p.columns) == ["doc_a", "doc_b", "n_shared", "jaccard"]
    assert p.empty
    # all-short corpus: present docs, no fingerprints
    short = rd.from_items([{"doc_id": 0, "text": "tiny"},
                           {"doc_id": 1, "text": ""}])
    assert fingerprint_summary(short).empty


# ---------------------------------------------------------------------------
# overlap-coefficient (quote/containment) metric
# ---------------------------------------------------------------------------
def test_overlap_detects_planted_quote(ray_session):
    import ray.data as rd
    from ocr_model_ray.functions.winnow import shared_fingerprint_pairs
    rng = __import__("random").Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz "
    long_doc = "".join(rng.choice(alphabet) for _ in range(4000))
    quote = long_doc[1000:1250]          # verbatim 250-char quote
    unrelated = "".join(rng.choice(alphabet) for _ in range(300))
    docs = pd.DataFrame({"doc_id": [1, 2, 3],
                         "text": [long_doc, quote, unrelated]})
    ds = rd.from_pandas(docs)
    ov = shared_fingerprint_pairs(ds, min_shared=2, jq_num=3, jq_den=4,
                                  metric="overlap", mode="local")
    # the quote pair qualifies on overlap...
    assert [(1, 2)] == list(zip(ov["doc_a"], ov["doc_b"]))
    assert (ov["overlap"] >= 0.75).all()
    # ...but NOT on jaccard at the same threshold (union is dominated
    # by the long doc) — the reason the metric exists
    jc = shared_fingerprint_pairs(ds, min_shared=2, jq_num=3, jq_den=4,
                                  metric="jaccard", mode="local")
    assert jc.empty


def test_overlap_plans_bit_equal(ray_session):
    import numpy as np
    import ray.data as rd
    from ocr_model_ray.functions.winnow import shared_fingerprint_pairs
    rng = __import__("random").Random(3)
    alphabet = "abcdef "
    base = ["".join(rng.choice(alphabet) for _ in range(500))
            for _ in range(20)]
    texts = base + [b[100:300] for b in base[:5]]   # planted quotes
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    loc = shared_fingerprint_pairs(rd.from_pandas(docs), min_shared=2,
                                   jq_num=3, jq_den=4, metric="overlap",
                                   mode="local")
    dist = shared_fingerprint_pairs(rd.from_pandas(docs).repartition(7),
                                    min_shared=2, jq_num=3, jq_den=4,
                                    metric="overlap", mode="distributed")
    assert loc["doc_a"].tolist() == dist["doc_a"].tolist()
    assert loc["doc_b"].tolist() == dist["doc_b"].tolist()
    assert loc["n_shared"].tolist() == dist["n_shared"].tolist()
    assert np.array_equal(loc["overlap"].to_numpy().view("int64"),
                          dist["overlap"].to_numpy().view("int64"))
    assert len(loc) >= 5


def test_overlap_metric_rejects_unknown(ray_session):
    import pytest
    import ray.data as rd
    from ocr_model_ray.functions.winnow import shared_fingerprint_pairs
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        shared_fingerprint_pairs(ds, metric="dice")


@pytest.mark.usefixtures("ray_session")
def test_winnow_pairs_ds_streams_to_sink_equal_local(tmp_path):
    """The Dataset-returning distributed plan (round-4 verdict #1):
    shared_fingerprint_pairs_ds consumed by a STREAMING parquet sink
    (no driver collect) yields exactly the local plan's pairs, and
    winnow_dedup_clusters' distributed path agrees with the local
    one."""
    import ray.data as rd

    from ocr_model_ray.functions.winnow import (
        shared_fingerprint_pairs_ds, winnow_dedup_clusters)

    rng = np.random.default_rng(7)
    alphabet = list("abcdefghij ")
    rows = []
    for fam in range(6):
        core = "".join(rng.choice(alphabet, 180))
        rows.append({"doc_id": 10 * fam,
                     "text": "AHEAD" + str(fam) + " " + core})
        rows.append({"doc_id": 10 * fam + 1,
                     "text": core + " TAIL" + str(fam)})
    for i in range(40):
        rows.append({"doc_id": 1000 + i,
                     "text": "".join(rng.choice(alphabet, 180))})
    ds = rd.from_items(rows).repartition(4)

    out_dir = str(tmp_path / "winnow_pairs")
    shared_fingerprint_pairs_ds(ds, min_shared=2).write_parquet(out_dir)
    import pyarrow.dataset as pads
    got = (pads.dataset(out_dir).to_table().to_pandas()
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
           [["doc_a", "doc_b", "n_shared", "jaccard"]])
    loc = shared_fingerprint_pairs(ds, min_shared=2, mode="local")
    pd.testing.assert_frame_equal(got, loc)
    assert len(loc) >= 6  # every planted family pairs up

    cl_loc = winnow_dedup_clusters(ds, min_shared=2, mode="local")
    cl_dst = winnow_dedup_clusters(ds, min_shared=2,
                                   mode="distributed")
    pd.testing.assert_frame_equal(
        cl_loc.sort_values("doc_id").reset_index(drop=True),
        cl_dst.sort_values("doc_id").reset_index(drop=True))
