"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual surface lives in ``nass_summary_spark.plans.queries``;
this module just adapts it to the driver contract.

Driver-window selection (r9)
----------------------------
The external gate samples the FIRST 50 entries of ``queries()``.
The library registry (``plans/queries.py`` QUERIES) stays in natural
registration order and is never mutated; the gate-facing ordering is
the explicit list below, chosen so every query gets driver-grade
evidence across rounds:

* r1-r8 driver-verified 200 of the 228 queries registered through r8
  at least once (CORRECTNESS_r01-r08 — zero failures ever; all 50 r8
  rows green).
* ``_DRIVER_WINDOW_R09`` is the staleness rotation VERDICT r8 item
  1 asked for: the 28 r8 widening queries that registered past the
  r8 gate and therefore have no driver row yet (all judge-oracle-
  verified exact in the r8 VERDICT session), then
  ``rate_limit_bucket`` (the r4 holdover; rows-only — its exact-twin
  ``rate_flags`` was driver-green r8 and the stateful path is
  parity-pytest-pinned), then the FIRST 21 in name order of the
  49-query cohort whose newest driver row is r5. After this round
  the stalest driver evidence is r5 with 28 queries left for the
  r10 rotation.
* New r9 widening queries register PAST the window (their evidence
  is CORRECTNESS_LOCAL + pytest until the r10 rotation debuts them):
  7 session-1 debuts (image_neardup, audio_features, langid_train,
  langid_eval, mixture_schedule, quantile_sketch_rollup,
  audio_neardup) and 17 session-2 debuts (ks_drift, spearman_corr,
  acf_lags, countmin_rollup, link_prediction, bpe_merges,
  bpe_segment_stats, hll_overlap, ucb_allocation, emd_drift,
  freq_cap_gate, prefix_filter_join, zorder_layout,
  neyman_allocation, sample_diversity, drift_panel,
  equidepth_histogram). Suggested r10 window: these 24 debuts +
  the remaining 26 slots from the r5-stale cohort (interval_overlap
  onward alphabetically); the leftover r5-stale ride in r11.
* Everything else follows in natural registration order, so
  ``tools/verify_oracle.py`` (which checks ALL entries →
  CORRECTNESS_LOCAL.md) sees the identical ordering and the two
  artifacts can be diffed row-for-row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nass_summary_spark.plans.queries import ORACLES, QUERIES

# The 50 gate-checked slots for round 9 (the rotation VERDICT r8
# item 1 prescribed): the 28 never-driver-checked r8 debuts first,
# then rate_limit_bucket (the r4 holdover), then the first 21 of the
# 49-query r5-stale cohort in name order (the remaining 28 ride in
# r10). Exactly 50 explicit slots.
_DRIVER_WINDOW_R09: list[str] = [
    # -- 28 r8 debuts: no driver row yet -------------------------------
    "quality_classifier_train", "quality_classifier_train_scored",
    "quality_classifier_eval", "geo_overlap_join_concave",
    "cmz_geo_fraction_concave", "ann_eval",
    "record_linkage_blocked_union", "priority_sample", "pii_redact",
    "fd_profile", "record_linkage_clusters", "community_labelprop",
    "gopher_rules", "dsir_importance", "distinct_sketch_rollup",
    "ind_profile", "sorted_neighborhood_pairs", "theilsen_slopes",
    "bootstrap_ci", "classifier_calibration", "ann_maxsim",
    "blocking_eval", "epoch_plan", "cluster_eval",
    "record_linkage_editdist", "threshold_select", "lsh_param_plan",
    "split_leakage_audit",
    # -- the r4 holdover ------------------------------------------------
    "rate_limit_bucket",
    # -- newest driver row is r5 (first 21 in name order) ---------------
    "ab_test_lift", "benchmark_coverage", "bfs_hops",
    "budget_waterfill", "cdc_apply", "chi_square_independence",
    "compressibility_scores", "contract_violations",
    "cumulative_uniques", "cusum_changepoints", "dedup_eval",
    "dedup_ngram_jaccard", "duplicated_spans", "dynamic_sessions",
    "dynamic_sessions_native", "group_mode", "grouped_topk_sketch",
    "harvest_rollup", "inference_batches", "interval_merge",
    "interval_overlap",
]
def _ordered_names() -> list[str]:
    window = [n for n in _DRIVER_WINDOW_R09 if n in QUERIES]
    rest = [n for n in QUERIES if n not in _DRIVER_WINDOW_R09]
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
