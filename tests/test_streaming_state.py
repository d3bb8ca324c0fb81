"""Tests for the incremental streaming-state actor pool and the
scale-hardening join helpers (Bloom semi-join, salted group count)."""

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_sharded_sessionizer_matches_batch_operator():
    from ocr_model_ray.pipelines.relational import events_sessions
    from ocr_model_ray.state.streaming import ShardedSessionizer
    sf = "/root/testdata/sf0.001"
    batch_result = events_sessions(sf).sort_values("user_id").reset_index(drop=True)

    import pyarrow.parquet as pq
    events = pq.read_table(f"{sf}/events.parquet",
                           columns=["user_id", "ts"]).to_pandas()
    events = events.sort_values(["ts"]).reset_index(drop=True)  # global ts order
    sz = ShardedSessionizer(num_shards=3, gap_minutes=30)
    # feed in three chronological chunks — state survives across feeds
    for chunk in np.array_split(events, 3):
        sz.ingest_batch(chunk)
    inc = sz.finalize().sort_values("user_id").reset_index(drop=True)

    assert (inc["user_id"] == batch_result["user_id"]).all()
    assert (inc["n_events"].astype(int) == batch_result["n_events"].astype(int)).all()
    assert (inc["n_sessions"].astype(int) == batch_result["n_sessions"].astype(int)).all()


def test_bloom_filter_no_false_negatives():
    from ocr_model_ray.functions.joins import BloomFilter
    rng = np.random.RandomState(9)
    members = rng.randint(0, 10 ** 9, size=5000)
    others = rng.randint(10 ** 9, 2 * 10 ** 9, size=5000)
    bf = BloomFilter(capacity=len(members))
    bf.add(members)
    assert bf.might_contain(members).all()          # zero false negatives
    fp = bf.might_contain(others).mean()
    assert fp < 0.05, f"false positive rate too high: {fp}"


@pytest.mark.usefixtures("ray_session")
def test_bloom_semi_filter_superset_of_exact():
    import ray.data as rd
    from ocr_model_ray.functions.joins import bloom_semi_filter
    df = pd.DataFrame({"k": np.arange(2000), "v": np.arange(2000) * 2})
    keys = list(range(0, 2000, 7))
    out = bloom_semi_filter(rd.from_pandas(df), keys, on="k").to_pandas()
    got = set(out["k"])
    assert set(keys) <= got                          # no false negatives
    assert len(got) <= len(keys) * 1.2               # small FP tail


@pytest.mark.usefixtures("ray_session")
def test_salted_group_count_matches_plain():
    import ray.data as rd
    from ocr_model_ray.functions.joins import salted_group_count
    rng = np.random.RandomState(4)
    # skewed: one hot key with 80% of rows
    keys = np.where(rng.random(20000) < 0.8, 7, rng.randint(0, 50, 20000))
    df = pd.DataFrame({"k": keys})
    got = salted_group_count(rd.from_pandas(df).repartition(8), "k",
                             num_salts=8)
    want = df.groupby("k", as_index=False).size().rename(columns={"size": "count"})
    merged = got.merge(want, on="k", suffixes=("_got", "_want"))
    assert len(merged) == len(want)
    assert (merged["count_got"] == merged["count_want"]).all()


@pytest.mark.usefixtures("ray_session")
def test_shard_routing_is_dtype_independent():
    """Round-2 code-review regression: the same logical key must land on
    the same shard whether the batch column arrives as int64 or object
    dtype (a dtype flip used to split one user's stream across actors)."""
    import pandas as pd
    from ocr_model_ray.state.streaming import ShardedSessionizer
    s = ShardedSessionizer(num_shards=4)
    ints = pd.DataFrame({"user_id": pd.Series([1, 7, 42, -3], dtype="int64"),
                         "ts": pd.to_datetime(["2024-01-01"] * 4)})
    objs = ints.copy()
    objs["user_id"] = objs["user_id"].astype(object)
    import numpy as np
    keys = ints["user_id"].to_numpy()
    with np.errstate(over="ignore"):
        vec = ((keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
               >> np.uint64(33)) % np.uint64(4)
    scalar = [s._shard_of(k) for k in objs["user_id"]]
    assert list(vec.astype(int)) == scalar
    # state-level merge: int batch then str batch of the SAME ids must
    # land in one per-key state (not split sessions), and odd keys
    # (inf/NaN) must not crash routing
    s.ingest_batch(ints)
    later = ints.copy()
    later["user_id"] = later["user_id"].map(str).astype(object)
    later["ts"] = later["ts"] + pd.Timedelta(minutes=5)
    s.ingest_batch(later)
    out = s.finalize()
    assert len(out) == 4
    assert (out["n_events"] == 2).all()
    assert (out["n_sessions"] == 1).all()
    weird = pd.DataFrame({"user_id": [float("inf"), float("nan"), "x"],
                          "ts": pd.to_datetime(["2024-01-01"] * 3)})
    ShardedSessionizer(num_shards=2).ingest_batch(weird)  # no crash


@pytest.mark.usefixtures("ray_session")
def test_watermark_sessionizer_handles_bounded_disorder():
    """Out-of-order feed with disorder bounded by the allowed lateness
    must produce EXACTLY the in-order/batch result with zero drops; an
    event later than the lateness bound is counted per key in
    late_dropped, not applied out of order."""
    from ocr_model_ray.pipelines.relational import events_sessions
    from ocr_model_ray.state.streaming import WatermarkSessionizer
    sf = "/root/testdata/sf0.001"
    batch_result = events_sessions(sf).sort_values("user_id") \
        .reset_index(drop=True)

    import pyarrow.parquet as pq
    events = pq.read_table(f"{sf}/events.parquet",
                           columns=["user_id", "ts"]).to_pandas()
    events = events.sort_values(["ts"]).reset_index(drop=True)
    # bounded disorder: shuffle within consecutive windows of 50 events
    rng = np.random.RandomState(6)
    parts = [chunk.iloc[rng.permutation(len(chunk))]
             for chunk in np.array_split(events, len(events) // 50)]
    disordered = pd.concat(parts).reset_index(drop=True)
    max_disorder_s = (events["ts"].diff().dt.total_seconds().fillna(0)
                      .rolling(100).sum().max())

    wz = WatermarkSessionizer(num_shards=3, gap_minutes=30,
                              lateness_minutes=max_disorder_s / 60 + 1)
    for chunk in np.array_split(disordered, 5):
        wz.ingest_batch(chunk)
    inc = wz.finalize().sort_values("user_id").reset_index(drop=True)
    assert (inc["late_dropped"] == 0).all()
    assert (inc["user_id"] == batch_result["user_id"]).all()
    assert (inc["n_events"].astype(int)
            == batch_result["n_events"].astype(int)).all()
    assert (inc["n_sessions"].astype(int)
            == batch_result["n_sessions"].astype(int)).all()


@pytest.mark.usefixtures("ray_session")
def test_watermark_sessionizer_drops_too_late_events():
    from ocr_model_ray.state.streaming import WatermarkSessionizer
    wz = WatermarkSessionizer(num_shards=2, gap_minutes=30,
                              lateness_minutes=1)
    base = pd.Timestamp("2024-01-01 12:00:00")
    # the trailing 2h+5m event pushes the watermark past 2h, so the
    # 2h event FINALIZES (frontier = 2h) before the late event arrives
    feed1 = pd.DataFrame({
        "user_id": [1, 1, 1, 1],
        "ts": [base, base + pd.Timedelta(minutes=5),
               base + pd.Timedelta(hours=2),
               base + pd.Timedelta(hours=2, minutes=5)]})
    wz.ingest_batch(feed1)
    # its position in the session sequence is already finalized -> drop
    late = pd.DataFrame({"user_id": [1],
                         "ts": [base + pd.Timedelta(minutes=6)]})
    wz.ingest_batch(late)
    out = wz.finalize()
    row = out[out["user_id"] == 1].iloc[0]
    assert int(row["late_dropped"]) == 1
    assert int(row["n_events"]) == 4          # the late event is excluded
    assert int(row["n_sessions"]) == 2        # 2h gap closed one session
