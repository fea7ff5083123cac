"""Unit tests for the r5 operator wave: inference batching,
hash-ring negative sampling, k-anonymity generalization."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401 — fixtures from conftest


def test_inference_batches_buckets_and_padding(spark):
    """Docs bucket by binary-length octave; batches slice longest-
    first; padding_waste = n·max − sum per batch."""
    from nass_summary_spark.operators.packing import inference_batches

    rows = [
        (1, 10), (2, 12), (3, 15),   # octave 3 (8..15)
        (4, 16), (5, 31),            # octave 4 (16..31)
        (6, 700),                    # octave 9
        (7, 0),                      # dropped (no tokens)
    ]
    df = spark.createDataFrame(rows, ["id", "n"])
    got = {
        (r["bucket"], r["batch_id"]): (
            r["n_rows"], r["max_tokens"], r["sum_tokens"], r["padding_waste"]
        )
        for r in inference_batches(df, "id", "n", rows_per_batch=2).collect()
    }
    assert got == {
        (3, 0): (2, 15, 27, 3),   # 15,12 → pad 15·2−27
        (3, 1): (1, 10, 10, 0),
        (4, 0): (2, 31, 47, 15),  # 31,16
        (9, 0): (1, 700, 700, 0),
    }


def test_hash_ring_negatives_deterministic_and_self_excluding(spark):
    """Ring sampling: k successors by ring distance, self excluded,
    identical across repeated runs, and every query gets rows even
    when its hash sits at the top of the ring (wraparound probe)."""
    from nass_summary_spark.operators.sampling import hash_ring_negatives

    corpus = spark.createDataFrame([(i,) for i in range(200)], ["cid"])
    queries = spark.createDataFrame([(i,) for i in range(0, 200, 17)], ["cid"])
    kw = dict(k=4, bucket_bits=2, join_width=2)  # 4 arcs → ~50/arc
    a = sorted(
        (r["query_id"], r["rnk"], r["neg_id"])
        for r in hash_ring_negatives(
            queries, corpus, "cid", "cid", **kw
        ).collect()
    )
    b = sorted(
        (r["query_id"], r["rnk"], r["neg_id"])
        for r in hash_ring_negatives(
            queries, corpus, "cid", "cid", **kw
        ).collect()
    )
    assert a == b  # deterministic
    per_q: dict[int, list[int]] = {}
    for qid, rnk, nid in a:
        assert nid != qid
        per_q.setdefault(qid, []).append(nid)
    assert set(per_q) == set(range(0, 200, 17))  # every query served
    assert all(len(v) == 4 == len(set(v)) for v in per_q.values())


def test_k_anonymize_ladder_levels_and_suppression(spark):
    """Finest groups publish at the first ladder level reaching k;
    groups failing every level are suppressed with anon_level −1."""
    from nass_summary_spark.operators.stats import k_anonymize

    rows = (
        [("US", "A", 1)] * 3          # level 0: own group holds k
        + [("US", "A", 2)]            # level 1: (US, A) = 4 ≥ 3
        + [("US", "B", 3)] * 2        # level 2: US total = 6 ≥ 3
        + [("FR", "C", 4)] * 2        # suppressed: FR total = 2 < 3
    )
    df = spark.createDataFrame(rows, ["nat", "seg", "band"])
    got = {
        (r["nat"], r["seg"], r["band"]): (
            r["n"], r["anon_level"], r["anon_n"], r["suppressed"]
        )
        for r in k_anonymize(
            df, [["nat", "seg", "band"], ["nat", "seg"], ["nat"]], k=3
        ).collect()
    }
    assert got[("US", "A", 1)] == (3, 0, 3, False)
    assert got[("US", "A", 2)] == (1, 1, 4, False)
    assert got[("US", "B", 3)] == (2, 2, 6, False)
    assert got[("FR", "C", 4)] == (2, -1, None, True)


def test_bfs_hops_min_distance_and_bounds(spark):
    """Multi-source BFS: min hop distance wins with multiple seeds,
    unreachable components never appear, and max_hops truncates."""
    from nass_summary_spark.operators.graph import bfs_hops

    # chain 1-2-3-4-5, seed at both ends of 1..5; island 10-11
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,), (5,)], ["node"])
    got = {r["node"]: r["hops"] for r in
           bfs_hops(edges, seeds, "node", max_hops=4).collect()}
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}
    capped = {r["node"]: r["hops"] for r in
              bfs_hops(edges, spark.createDataFrame([(1,)], ["node"]),
                       "node", max_hops=2).collect()}
    assert capped == {1: 0, 2: 1, 3: 2}


def test_readability_features_on_known_text(spark):
    """Hand-computed Flesch on a fixed sentence pair."""
    from nass_summary_spark.functions.text import readability_features

    text = "The cat sat on the mat. It was happy!"
    # words=9, sentences=2, vowel groups: e,a,a,o,e,a,i,a,a,y → 10
    df = spark.createDataFrame([(1, text)], ["id", "text"])
    feats = readability_features(F.col("text"))
    r = df.select(*[v.alias(k) for k, v in feats.items()]).collect()[0]
    assert r["n_sentences"] == 2
    assert r["n_syllables"] == 10
    assert r["words_per_sentence"] == 4.5
    assert abs(r["flesch"] - (206.835 - 1.015 * 4.5 - 84.6 * (10 / 9))) < 1e-3


def test_seasonal_anomalies_flags_only_wrong_slot(spark):
    """A value that is normal in its own hour slot but extreme in
    another is flagged only when it lands in the wrong slot."""
    import datetime as dt

    from nass_summary_spark.operators.stats import seasonal_anomalies

    def t(day, hour):
        return dt.datetime(2024, 1, day, hour, 0, 0)

    rows = []
    eid = 0
    # hour 2: baseline ~1.0 over 10 days; hour 14: baseline ~100
    for day in range(1, 11):
        rows.append((eid, "m", t(day, 2), 1.0 + (day % 3) * 0.01)); eid += 1
        rows.append((eid, "m", t(day, 14), 100.0 + (day % 3))); eid += 1
    rows.append((900, "m", t(11, 2), 100.0))   # night spike → anomaly
    rows.append((901, "m", t(11, 14), 100.5))  # normal for daytime
    df = spark.createDataFrame(rows, ["event_id", "k", "ts", "value"])
    got = {r["event_id"]: r["z_score"] for r in seasonal_anomalies(
        df, ["k"], "ts", "value", "event_id", z=3.0
    ).collect()}
    # the anomaly is part of its own slot baseline (standard for a
    # screening pass), which caps its z near sqrt(n): > 3 here
    assert 900 in got and got[900] > 3
    assert 901 not in got


def test_key_skew_profile_gini_bounds(spark):
    """Uniform keys → gini ≈ 0; one dominant key → high gini and
    top1_share; exact values hand-checked on the skewed column."""
    from nass_summary_spark.operators.stats import key_skew_profile

    rows = [(i % 4, "hot" if i < 90 else f"cold{i}") for i in range(100)]
    df = spark.createDataFrame(rows, ["uniform_k", "skew_k"])
    got = {r["key_column"]: r for r in
           key_skew_profile(df, ["uniform_k", "skew_k"]).collect()}
    u = got["uniform_k"]
    assert u["n_keys"] == 4 and u["max_cnt"] == 25 and u["gini"] == 0.0
    s = got["skew_k"]
    # counts: ten 1s then 90 → G = 2*(1*1+..+10*1+11*90)/(11*100) − 12/11
    expect = 2 * (sum(range(1, 11)) + 11 * 90) / (11 * 100) - 12 / 11
    assert s["n_keys"] == 11 and s["max_cnt"] == 90
    assert s["top1_share"] == 0.9
    assert abs(s["gini"] - expect) < 1e-6


def test_k_anonymize_null_quasi_identifier_groups_are_reported(spark):
    """NULL is a real quasi-identifier value (unknown birthplace IS a
    group): ladder joins must be null-safe so NULL-keyed groups are
    judged, not silently dropped from the privacy report."""
    from nass_summary_spark.operators.stats import k_anonymize

    rows = [("US", "A", 1)] * 3 + [(None, "B", 2)] * 5
    df = spark.createDataFrame(rows, "nat string, seg string, band int")
    got = {(r["nat"], r["seg"], r["band"]): (r["anon_level"], r["anon_n"])
           for r in k_anonymize(
               df, [["nat", "seg", "band"], ["nat", "seg"], ["nat"]], k=3
           ).collect()}
    assert got[("US", "A", 1)] == (0, 3)
    assert got[(None, "B", 2)] == (0, 5)  # previously vanished


def test_seasonal_anomalies_null_values_excluded_from_baseline(spark):
    """NULL values must not deflate the slot mean or pad the slot
    past min_n: a slot of ten 1.0s plus five NULLs keeps mean 1.0."""
    import datetime as dt

    from nass_summary_spark.operators.stats import seasonal_anomalies

    rows = [(i, "m", dt.datetime(2024, 1, 1 + i, 2, 0), 1.0)
            for i in range(10)]
    rows += [(100 + i, "m", dt.datetime(2024, 1, 20 + i, 2, 0), None)
             for i in range(5)]
    rows.append((999, "m", dt.datetime(2024, 1, 28, 2, 0), 5.0))
    df = spark.createDataFrame(
        rows, "event_id long, k string, ts timestamp, value double"
    )
    got = {r["event_id"]: r for r in seasonal_anomalies(
        df, ["k"], "ts", "value", "event_id", z=2.0
    ).collect()}
    assert 999 in got
    assert abs(got[999]["slot_mean"] - (10 * 1.0 + 5.0) / 11) < 1e-4  # 4dp round


def test_hash_ring_negatives_rejects_overwide_probe(spark):
    import pytest

    from nass_summary_spark.operators.sampling import hash_ring_negatives

    df = spark.createDataFrame([(1,)], ["cid"])
    with pytest.raises(ValueError):
        hash_ring_negatives(df, df, "cid", "cid", bucket_bits=1, join_width=4)


def test_range_join_bucketed_near_boundary_interval_end(spark):
    """An interval whose exclusive end lies within the old 1e-9
    epsilon ABOVE a bucket boundary must still enumerate the top
    bucket — values in [boundary, hi) were silently dropped before
    the epsilon-free fix."""
    from nass_summary_spark.operators.range_join import range_join_bucketed

    fact = spark.createDataFrame([(10.00000000005,), (7.0,), (3.0,)], ["v"])
    iv = spark.createDataFrame(
        [("t", 5.0, 10.0000000001)], ["tier", "lo", "hi"]
    )
    got = {r["v"]: r["tier"] for r in range_join_bucketed(
        fact, "v", iv, "lo", "hi", bucket_width=10.0
    ).collect()}
    # 3.0 < lo stays out; 7.0 is the ordinary case; the near-boundary
    # value in the top bucket is the regression
    assert got == {10.00000000005: "t", 7.0: "t"}
