"""Regression tests for the round-9 ADVICE items (fixed in r10).

Each test pins the exact failure mode the advisor described:

* hll_overlap zero-overlap pairs — engine and oracle must agree on
  pairs that share no key (the engine emits exact_overlap 0; the
  oracle now generates all pairs with COALESCE).
* neyman_allocation with all-zero quantized variances — must fall
  back to proportional-by-n_rows, never NULL allocations.
* probe_countmin NULL items — NULL estimate, mirroring the build
  side's NULL exclusion (not an arbitrary bucket hash).
* prefix_filter_join cache handle — persisted relations released.
* prefix_filter_join skew guardrail — loud PrefixGroupSkewWarning
  when an uncapped run meets an oversized prefix group.
* pairwise_overlap distinct enforcement — duplicated (group, key)
  rows must not inflate the certified exact intersection.
"""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# hll_overlap: zero-overlap pairs agree across engine and oracle
# ---------------------------------------------------------------------------

def test_pairwise_overlap_emits_zero_overlap_pairs(spark):
    from nass_summary_spark.operators.distinct_sketch import (
        build_distinct_sketches,
        pairwise_overlap,
    )

    # groups a/b share keys; group c is disjoint from both
    rows = (
        [("a", f"k{i}") for i in range(10)]
        + [("b", f"k{i}") for i in range(5, 15)]
        + [("c", f"z{i}") for i in range(7)]
    )
    df = spark.createDataFrame(rows, ["grp", "key"])
    sk = build_distinct_sketches(df, ["grp"], "key", lg_k=21)
    out = pairwise_overlap(
        sk.select("grp", "sketch"), "grp", exact_keys=df
    ).collect()
    got = {(r["type_a"], r["type_b"]): r["exact_overlap"] for r in out}
    # ALL three pairs present, including the two zero-overlap ones
    assert got == {("a", "b"): 5, ("a", "c"): 0, ("b", "c"): 0}


def test_hll_overlap_oracle_agrees_on_disjoint_types(spark, tmp_path):
    """End-to-end: a fixture where one event type shares no user-day
    key with the others must still gate-match the DuckDB oracle."""
    import duckdb

    from nass_summary_spark.plans.queries import ORACLES, QUERIES

    sf = tmp_path / "sf"
    sf.mkdir()
    rows = (
        [(1, i, "click", f"2024-01-{i + 1:02d} 10:00:00") for i in range(4)]
        + [(2, i, "view", f"2024-01-{i + 1:02d} 10:00:00") for i in range(2, 6)]
        # 'purge' users are disjoint from click/view users entirely
        + [(3, 100 + i, "purge", f"2024-02-{i + 1:02d} 10:00:00") for i in range(3)]
    )
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts_s"]
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts_s").cast("timestamp").alias("ts"),
    )
    ev.write.parquet(str(sf / "events.parquet"))
    got = sorted(
        tuple(r) for r in QUERIES["hll_overlap"](spark, str(sf)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{sf}/events.parquet/*.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(ORACLES["hll_overlap"]).fetchall())
    assert got == want
    # sanity: the disjoint pairs are present on both sides with 0
    zero = [t for t in got if t[4] == 0]
    assert len(zero) == 2


# ---------------------------------------------------------------------------
# neyman_allocation: all-constant strata → proportional fallback
# ---------------------------------------------------------------------------

def test_neyman_all_constant_strata_falls_back_proportional(spark):
    from nass_summary_spark.operators.sampling import neyman_allocation

    # every stratum has zero variance → every sigma_fp quantizes to 0
    rows = (
        [("a", 5.0)] * 6 + [("b", 7.0)] * 3 + [("c", 9.0)] * 1
    )
    df = spark.createDataFrame(rows, ["stratum", "v"])
    out = {
        r["stratum"]: r["alloc_n"]
        for r in neyman_allocation(df, "stratum", "v", total_n=20).collect()
    }
    assert None not in out.values()
    assert sum(out.values()) == 20
    # proportional-by-rows: 6/10, 3/10, 1/10 of 20
    assert out == {"a": 12, "b": 6, "c": 2}


def test_neyman_normal_path_unchanged(spark):
    from nass_summary_spark.operators.sampling import neyman_allocation

    rows = [("a", float(i)) for i in range(10)] + [("b", 5.0)] * 10
    df = spark.createDataFrame(rows, ["stratum", "v"])
    out = {
        r["stratum"]: r["alloc_n"]
        for r in neyman_allocation(df, "stratum", "v", total_n=10).collect()
    }
    # all weight sits on the varying stratum
    assert out == {"a": 10, "b": 0}


# ---------------------------------------------------------------------------
# probe_countmin: NULL probe items
# ---------------------------------------------------------------------------

def test_probe_countmin_null_item_returns_null(spark):
    from nass_summary_spark.operators.countmin import (
        build_countmin,
        probe_countmin,
    )

    df = spark.createDataFrame(
        [("x",)] * 4 + [("y",)] * 2 + [(None,)], ["item"]
    )
    sk = build_countmin(df, [], "item")
    probes = spark.createDataFrame([("x",), ("y",), (None,)], ["item"])
    got = {r["item"]: r["est_cnt"] for r in probe_countmin(sk, probes, "item").collect()}
    assert got["x"] == 4 and got["y"] == 2
    assert got[None] is None  # not an arbitrary nonzero bucket count


# ---------------------------------------------------------------------------
# prefix_filter_join: cache handle + skew guardrail
# ---------------------------------------------------------------------------

def _exploded_tokens(spark, n_dups=30):
    """A copy-exploded corpus: n_dups near-identical sets — every
    prefix token is shared by all of them."""
    rows = [(i, t) for i in range(n_dups) for t in ("a", "b", "c", "d")]
    return spark.createDataFrame(rows, ["id", "tok"])


def test_prefix_filter_handle_unpersists(spark):
    from nass_summary_spark.operators.dedup import (
        prefix_filter_join_with_handle,
    )

    tokens = _exploded_tokens(spark, n_dups=5)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out, handle = prefix_filter_join_with_handle(
            tokens, "id", "tok", 0.9
        )
    n_before = len(
        [
            rdd_id
            for rdd_id, _ in spark.sparkContext._jsc.getPersistentRDDs().items()
        ]
    )
    assert out.count() == 5 * 4 // 2  # all pairs are exact dups
    handle.unpersist()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    assert len(jmap) <= max(0, n_before - 2)


def test_prefix_filter_warns_on_hot_prefix_group(spark, monkeypatch):
    import nass_summary_spark.operators.dedup as dedup_mod

    monkeypatch.setattr(dedup_mod, "PREFIX_GROUP_WARN_THRESHOLD", 10)
    tokens = _exploded_tokens(spark, n_dups=30)
    with pytest.warns(dedup_mod.PrefixGroupSkewWarning, match="prefix group"):
        out = dedup_mod.prefix_filter_join(tokens, "id", "tok", 0.9)
        out.count()


def test_prefix_filter_no_warning_below_threshold(spark, monkeypatch):
    import nass_summary_spark.operators.dedup as dedup_mod

    monkeypatch.setattr(dedup_mod, "PREFIX_GROUP_WARN_THRESHOLD", 1000)
    tokens = _exploded_tokens(spark, n_dups=8)
    with warnings.catch_warnings():
        warnings.simplefilter("error", dedup_mod.PrefixGroupSkewWarning)
        dedup_mod.prefix_filter_join(tokens, "id", "tok", 0.9).count()


def test_prefix_filter_capped_logs_metric(spark, caplog):
    import logging

    import nass_summary_spark.operators.dedup as dedup_mod

    tokens = _exploded_tokens(spark, n_dups=12)
    with caplog.at_level(logging.WARNING, logger=dedup_mod.__name__):
        dedup_mod.prefix_filter_join(
            tokens, "id", "tok", 0.9, max_prefix_group=5
        ).count()
    assert any("capped" in r.message for r in caplog.records)


# ---------------------------------------------------------------------------
# pairwise_overlap: duplicated exact_keys must not inflate overlap
# ---------------------------------------------------------------------------

def test_pairwise_overlap_distincts_exact_keys(spark):
    from nass_summary_spark.operators.distinct_sketch import (
        build_distinct_sketches,
        pairwise_overlap,
    )

    clean = [("a", "k1"), ("a", "k2"), ("b", "k1")]
    dirty = clean + [("a", "k1"), ("b", "k1"), ("b", "k1")]
    sk = build_distinct_sketches(
        spark.createDataFrame(clean, ["grp", "key"]), ["grp"], "key", lg_k=21
    ).select("grp", "sketch")
    exact_dirty = spark.createDataFrame(dirty, ["grp", "key"])
    out = pairwise_overlap(sk, "grp", exact_keys=exact_dirty).collect()
    assert len(out) == 1
    assert out[0]["exact_overlap"] == 1  # not 6 (join-row inflation)
