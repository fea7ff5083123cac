"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual surface lives in ``nass_summary_spark.plans.queries``;
this module just adapts it to the driver contract.

Driver-window selection (r3)
----------------------------
The external gate samples the FIRST 50 entries of ``queries()``.
The library registry (``plans/queries.py`` QUERIES) stays in natural
registration order and is never mutated; the gate-facing ordering is
the explicit list below, chosen so every query gets driver-grade
evidence across rounds:

* r1+r2 driver-verified 56 distinct queries (CORRECTNESS_r01/r02 —
  all green in r2).
* ``_DRIVER_WINDOW_R03`` therefore front-loads the 47 queries never
  yet driver-verified (43 oracle-backed + 4 rows-only), plus the 3
  queries whose semantics changed this round and need re-verification:
  ``dedup_ngram_jaccard`` (now runs the lossless prefix-filter mode),
  ``dedup_simhash`` (banding now provably covers the verification
  radius), and ``multimodal_decode_real`` (new: real BMP decode).
* Everything else follows in natural registration order, so
  ``tools/verify_oracle.py`` (which checks ALL entries →
  CORRECTNESS_LOCAL.md) sees the identical ordering and the two
  artifacts can be diffed row-for-row.
* Queries ADDED after the r3 window was frozen (the geometry stage
  F1-F4; the streaming twins C11 geo_zone_windows, C12 quality_gate,
  C13 stream_drift, C14 trending_topk; the curation/embedding/graph operators B50
  quality classifier, B51 covariance/PCA, B52 PQ ANN, B53
  Misra–Gries heavy hitters, B54 BPE tokenizer, B55 n-gram LM
  perplexity, B56 PageRank (chained-CTE oracle), B57 per-source KL
  drift, B58 deletion-neighborhood fuzzy join, B59 OLS trend slopes, B60 IVFADC, B61 entity resolution, B62 asymmetric containment; and the robust
  statistics A35 weighted median, A36 MAD outliers, A37 Pareto share — all built this
  round) sit past slot 50 in natural order: each passed the full
  oracle check locally this round in BOTH the tuned and the
  hostile driver-like session (CORRECTNESS_LOCAL.md: 123/123 + 123/123 (+ trend_slopes verified scoped); all but pca_project / ann_topk_pq / ann_topk_ivfpq / bpe_tokenize carry
  full SQL oracles), and they are the first candidates for the r4
  window.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nass_summary_spark.plans.queries import ORACLES, QUERIES

# The 50 gate-checked slots for round 3.  47 never-driver-verified
# queries (everything absent from CORRECTNESS_r01.json and
# CORRECTNESS_r02.json) + 3 changed-this-round re-checks.
_DRIVER_WINDOW_R03: list[str] = [
    # -- A-block core relational, never driver-verified --------------
    "multigrain_rollup", "multigrain_cube", "range_join_tiers",
    "unpivot_long", "yoy_change", "suppression_antijoin",
    "ordered_list_agg", "rolling_window_avg", "ntile_quartiles",
    "latest_snapshot", "snapshot_diff", "scd2_history", "time_gapfill",
    # -- B-block curation / text / retrieval, never driver-verified --
    "per_key_cap", "token_budget_mix", "embedding_quantize",
    "text_scrub", "grouped_stats", "json_props_agg", "bigram_topk",
    "histogram_fixed", "repetition_stats", "dedup_normalized",
    "zscore_outliers", "alpha_sampling", "dedup_cross_corpus",
    "doc_chunks", "rank_fusion", "url_dedup", "duplicate_passages",
    "data_profile", "sequence_gaps", "inverted_index", "bm25_topk",
    "cooccurrence_pmi",
    # -- SQL-text surface, never driver-verified ---------------------
    "sql_priority_share", "sql_top_customers_window",
    "sql_exists_late_ship", "sql_customers_without_orders",
    "sql_scarce_parts",
    # -- C-block streaming twins, never driver-verified --------------
    "events_enrich", "stream_attribution", "event_funnel",
    # -- rows-only checks, never driver-verified ---------------------
    "approx_distinct", "approx_quantiles", "semantic_dedup",
    "embedding_cosine_dedup_lsh",
    # -- changed this round: needs driver re-verification ------------
    "dedup_ngram_jaccard", "dedup_simhash", "multimodal_decode_real",
]


def _ordered_names() -> list[str]:
    window = [n for n in _DRIVER_WINDOW_R03 if n in QUERIES]
    rest = [n for n in QUERIES if n not in _DRIVER_WINDOW_R03]
    return window + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary) on /root/testdata/sf0.001."""
    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


def _with_cache_hygiene(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """Evict cached blocks left by PREVIOUS queries before building
    the next one. Several operators persist fixed-width
    intermediates that the returned DataFrame still references, so
    they can't unpersist themselves; a long single-session run (the
    driver gate executes 50 queries in one session) otherwise
    accumulates every persisted block and can OOM a default-sized
    (1g) driver heap — observed at query ~100 of the full-surface
    vanilla-session rehearsal. A query's own persists happen after
    this call and are unaffected. Applied only on this driver-facing
    adapter: library consumers (bench two-run timing, notebooks)
    keep normal cache-reuse semantics."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        try:
            spark.catalog.clearCache()
        except Exception:  # pragma: no cover — cache API unavailable
            pass
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: _with_cache_hygiene(QUERIES[n]) for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys absent here are
    rows-only checks (approximate / stateful-streaming operators)."""
    return {n: ORACLES[n] for n in _ordered_names() if n in ORACLES}
