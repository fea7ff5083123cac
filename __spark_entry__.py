"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual surface lives in ``nass_summary_spark.plans.queries``;
this module just adapts it to the driver contract.

Driver-window selection (r10)
-----------------------------
The external gate samples the FIRST 50 entries of ``queries()``.
The library registry (``plans/queries.py`` QUERIES) stays in natural
registration order and is never mutated; the gate-facing ordering is
the explicit list below, chosen so every query gets driver-grade
evidence across rounds:

* r1-r9 driver-verified 228 of the 256 queries registered through r9
  at least once (CORRECTNESS_r01-r09 — zero failures ever; all 50 r9
  rows green).
* ``_DRIVER_WINDOW_R10`` is the rotation VERDICT r9 item 1
  prescribed: the 28 r9 widening queries that registered past the
  r9 gate and therefore have no driver row yet (every one
  judge-oracle-verified exact in the r9 VERDICT session), then the
  FIRST 22 in name order of the 28-query cohort whose newest driver
  row is r5. After this round the stalest driver evidence is r5 for
  exactly 6 queries (unattributed_clicks, weighted_sample,
  whiten_embeddings, winsorized_stats, woe_iv,
  yield_by_class_pivot) — they ride the r11 rotation.
* New r10 widening queries register PAST the window (their evidence
  is CORRECTNESS_LOCAL + pytest until the r11 rotation debuts
  them).
* Everything else follows in natural registration order, so
  ``tools/verify_oracle.py`` (which checks ALL entries →
  CORRECTNESS_LOCAL.md) sees the identical ordering and the two
  artifacts can be diffed row-for-row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nass_summary_spark.plans.queries import ORACLES, QUERIES

# The 50 gate-checked slots for round 10 (the rotation VERDICT r9
# item 1 prescribed): the 28 never-driver-checked r9 debuts first,
# then the first 22 of the 28-query r5-stale cohort in name order
# (the remaining 6 ride in r11). Exactly 50 explicit slots.
_DRIVER_WINDOW_R10: list[str] = [
    # -- 28 r9 debuts: no driver row yet -------------------------------
    "image_neardup", "audio_features", "langid_train", "langid_eval",
    "mixture_schedule", "quantile_sketch_rollup", "audio_neardup",
    "ks_drift", "spearman_corr", "acf_lags", "countmin_rollup",
    "link_prediction", "bpe_merges", "bpe_segment_stats",
    "hll_overlap", "ucb_allocation", "emd_drift", "freq_cap_gate",
    "prefix_filter_join", "zorder_layout", "neyman_allocation",
    "sample_diversity", "drift_panel", "equidepth_histogram",
    "pseudonymize_keys", "linkage_review_queue", "hard_negatives",
    "dp_group_counts",
    # -- newest driver row is r5 (first 22 in name order) ---------------
    "irrigation_split", "k_anonymity", "keep_best_duplicate",
    "key_skew_profile", "late_data_metrics", "mann_whitney_u",
    "multilevel_fallback", "multimodal_decode_jpeg",
    "multimodal_features", "nearest_event", "nearest_zone",
    "negative_sampling", "novelty_scores", "quantile_normalize",
    "range_join_tiers", "readability_scores", "remove_spans",
    "rollup_unit_price", "seasonal_anomalies", "session_paths",
    "table_checksum", "total_and_sum_merge",
]
def _ordered_names() -> list[str]:
    window = [n for n in _DRIVER_WINDOW_R10 if n in QUERIES]
    rest = [n for n in QUERIES if n not in _DRIVER_WINDOW_R10]
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
