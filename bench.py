#!/usr/bin/env python
"""Headline benchmark: runs the flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Timing counts full query execution (plan + shuffle + collect-count);
a warm-up query absorbs JVM/session startup so numbers reflect the
engine, not the JVM boot.

Besides wall time, each query reports ``shuffle_bytes`` — shuffle
WRITE bytes of its steady-state run, summed over the stages that run
executed (Spark status REST API; stage attempts are attributed by
(stageId, attemptId) so history eviction can't corrupt the diff).
That turns the scale posture into a number: a plan regression that
starts shuffling the fact table shows up as a bytes jump even when
sf0.1 wall time hides it.

A query that errors is counted at ``PENALTY_SEC`` in the headline
total (and listed under ``errors``) so a broken run can never report
a *better* headline than a clean one.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nass_summary_spark.plans.queries import QUERIES  # noqa: E402
from nass_summary_spark.session import get_spark  # noqa: E402

PENALTY_SEC = 120.0  # charged per errored query: worse than any real query

BENCH_QUERIES = [
    "pricing_summary",
    "harvest_rollup",
    "rollup_unit_price",
    "rollup_avg_of_avgs",
    "yield_by_class_pivot",
    "total_and_sum_merge",
    "irrigation_split",
    "multilevel_fallback",
    "crosstab_matrix",
    "swap_apportion",
    "fractional_weighted_rollup",
    "window_topk",
    "asof_join",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk_bruteforce",
    "embedding_centroids",
    "text_langid",
    "token_count",
    "doc_fingerprint",
    "multimodal_decode_real",
    "multimodal_decode_png",
    "multimodal_decode_jpeg",
    "events_windowed",
    "sessionize",
    "hash_split",
    "token_budget_mix",
    "embedding_quantize",
    "multigrain_rollup",
    "range_join_tiers",
    "stream_attribution",
    "tfidf_topk",
    "grouped_stats",
    "suppression_antijoin",
    "bigram_topk",
    "contamination_check",
    "quality_classifier",
    "session_window_agg",
    "rolling_window_avg",
    "histogram_fixed",
    "curation_pipeline",
    "pack_sequences",
    "latest_snapshot",
    "url_dedup",
    "duplicate_passages",
    "event_funnel",
    "data_profile",
    "sequence_gaps",
    "inverted_index",
    "snapshot_diff",
    "scd2_history",
    "bm25_topk",
    "cooccurrence_pmi",
    "heavy_hitters",
    "embedding_covariance",
    "pca_project",
    "ann_topk_pq",
    "bpe_tokenize",
    "weighted_median",
    "ngram_lm_perplexity",
    "pagerank",
    "source_drift_kl",
    "quality_gate",
    "mad_outliers",
    "fuzzy_join",
    "stream_drift",
    "trend_slopes",
    "ann_topk_ivfpq",
    "canonical_entities",
    "trending_topk",
    "pareto_share",
    "containment_pairs",
    "time_gapfill",
    "interval_overlap",
    "triangle_counts",
    "shard_plan",
    "ewma_smooth",
    "skyline_parts",
    "rate_flags",
    "rate_limit_bucket",
    "duplicated_spans",
    "winsorized_stats",
    "impute_by_group",
    "benford_deviation",
    "dictionary_encode",
    "time_weighted_avg",
    "bloom_semi_join",
    "temporal_join",
    "markov_transitions",
    "cohort_retention",
    "grouped_topk_sketch",
    "late_data_metrics",
    "dynamic_sessions_native",
    "inference_batches",
    "negative_sampling",
    "k_anonymity",
    "unattributed_clicks",
    "bfs_hops",
    "readability_scores",
    "seasonal_anomalies",
    "key_skew_profile",
    "geo_overlap_join",
    "geo_points_in_zones",
    "geo_zone_windows",
    "ab_test_lift",
    "chi_square_independence",
    "mann_whitney_u",
    "cusum_changepoints",
    "compressibility_scores",
    "nearest_zone",
    "table_checksum",
    "cdc_apply",
    "woe_iv",
    "contract_violations",
    "budget_waterfill",
    "dedup_eval",
    # r6 additions
    "dedup_incremental_lsh",
    "weighted_percentiles",
    "ann_index_probe",
    "record_linkage_fs",
    # r7 additions
    "pq_index_probe",
    "multimodal_resize",
    "record_linkage_em",
    "ivfpq_index_probe",
    "record_linkage_em_scored",
    "record_linkage_nullsafe",
    "record_linkage_em_posterior",
    "record_linkage_em_missing",
    # r8 additions: classifier training, concave geometry, ANN recall
    # certification, multi-rule blocking, priority sampling
    "quality_classifier_train",
    "quality_classifier_train_scored",
    "geo_overlap_join_concave",
    "cmz_geo_fraction_concave",
    "ann_eval",
    "record_linkage_blocked_union",
    "priority_sample",
    "quality_classifier_eval",
    # r8 late additions: PII masking, FD audit, score->cluster
    # linkage, label-propagation communities
    "pii_redact",
    "fd_profile",
    "record_linkage_clusters",
    "community_labelprop",
    # r8 session-2 widening
    "gopher_rules",
    "dsir_importance",
    "distinct_sketch_rollup",
    "ind_profile",
    "sorted_neighborhood_pairs",
    "theilsen_slopes",
    "bootstrap_ci",
    "classifier_calibration",
    "ann_maxsim",
    "blocking_eval",
    "epoch_plan",
    "cluster_eval",
    "record_linkage_editdist",
    "threshold_select",
    "lsh_param_plan",
    "split_leakage_audit",
    # r9 additions
    "image_neardup",
    "audio_features",
    "langid_train",
    "langid_eval",
    "mixture_schedule",
    "quantile_sketch_rollup",
    "audio_neardup",
    "ks_drift",
    "spearman_corr",
    "acf_lags",
    "countmin_rollup",
    "link_prediction",
    "bpe_merges",
    "bpe_segment_stats",
    "hll_overlap",
    "ucb_allocation",
    "emd_drift",
    "freq_cap_gate",
    "prefix_filter_join",
    "zorder_layout",
    "neyman_allocation",
    "sample_diversity",
    "drift_panel",
    "equidepth_histogram",
    "pseudonymize_keys",
    "linkage_review_queue",
    "hard_negatives",
    "dp_group_counts",
    # r10 additions
    "html_extract",
    "equidepth_sketch",
    "domain_gate",
    "bpe_encode",
    "kendall_tau",
    "category_profile",
    "kaplan_meier",
    "kcore_members",
    "sentence_stats",
    "sprt_monitor",
    "mad_sketch",
    "gini_coefficient",
    "psi_drift",
    "vocab_coverage",
    "tail_index",
    "join_size_estimate",
]


class ShuffleMeter:
    """Attributes shuffle-write bytes to bench intervals via the
    status REST API. Stage attempts already credited are remembered
    by (stageId, attemptId), so the UI evicting old stages between
    snapshots never double-counts or goes negative."""

    def __init__(self, spark, port: int):
        self._url = (
            f"http://localhost:{port}/api/v1/applications/"
            f"{spark.sparkContext.applicationId}/stages"
        )
        self._seen: set[tuple[int, int]] = set()
        self.available = self._snapshot() is not None

    def _snapshot(self) -> list[dict] | None:
        try:
            with urllib.request.urlopen(self._url, timeout=10) as resp:
                return json.load(resp)
        except Exception:  # noqa: BLE001 — metrics are best-effort
            return None

    def new_bytes(self) -> int | None:
        """Shuffle-write bytes of stage attempts not yet credited."""
        stages = self._snapshot()
        if stages is None:
            return None
        total = 0
        for s in stages:
            key = (s.get("stageId", -1), s.get("attemptId", 0))
            if key in self._seen or s.get("status") == "ACTIVE":
                continue
            self._seen.add(key)
            total += int(s.get("shuffleWriteBytes", 0))
        return total


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    ui_port = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4049"))
    # scope to a comma-separated subset for the isolated re-measure
    # protocol (PLANS.md): SPARK_GRAFT_BENCH_ONLY=q1,q2 runs just
    # those queries in a fresh session with the full bench harness
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    names = (
        [n.strip() for n in only.split(",") if n.strip()]
        if only
        else BENCH_QUERIES
    )
    # loadavg stamps: VERDICT r8 burned judge time proving a 16.8s
    # bloom_semi_join row was tenant noise — record the box's ambient
    # load at run start/end so a contaminated run is machine-
    # detectable without re-litigating
    load_start = os.getloadavg()
    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        extra_configs={
            # bench data is a handful of ~1-10 MB files: split scans at
            # row-group granularity so they parallelize. On a real
            # cluster with 128 MB+ files the engine default stands.
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "1m",
            # UI on only for the status REST API (shuffle metrics)
            "spark.ui.enabled": "true",
            "spark.ui.port": str(ui_port),
            "spark.ui.retainedStages": "20000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + parquet footer reads
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # warm the Python worker pool: Arrow-path queries (geometry,
    # multimodal, PQ encode) otherwise pay a per-worker fork + numpy/
    # pandas import inside their first timed run — a local[32]
    # artifact (long-lived cluster executors keep workers warm) that
    # showed up as 2-10s of run-to-run noise on the geo queries
    def _noop(batches):
        import numpy  # noqa: F401 — import cost is the point
        import pandas  # noqa: F401

        yield from batches

    spark.range(64).repartition(64).mapInPandas(_noop, "id long").count()
    meter = ShuffleMeter(spark, ui_port)

    timings: dict[str, float] = {}
    trials: dict[str, list[float]] = {}
    shuffle_bytes: dict[str, int] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name in names:
        fn = QUERIES[name]
        # two runs, report the min: the first execution of a query
        # pays one-time whole-stage-codegen compilation (hundreds of
        # ms of JVM work that amortizes to nothing over a real
        # dataset); the min reflects engine throughput. Shuffle bytes
        # come from the second (steady-state) run only.
        try:
            runs = []
            n = 0
            for i in range(2):
                if i == 1 and meter.available:
                    meter.new_bytes()  # reset credit line to run 2 start
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                n = df.count()
                runs.append(time.perf_counter() - t0)
            # heavy queries (>1s steady-state) get a THIRD trial: this
            # box has ±50% ambient-load noise, and min-of-3 makes a
            # real plan regression distinguishable from a noisy trial
            # on the expensive composites (canonical_entities,
            # ann_topk_ivfpq drifted ±15% between rounds with no plan
            # change; r5's three flagged sub-2s regressions never got
            # a tie-breaking trial under the old 2s cut, hence 1s).
            # Cheap queries stay at two trials — a third run of
            # ninety 0.3s queries would add an extra ~30s of wall
            # clock for noise that min-of-2 already clips.
            # read run 2's shuffle bytes BEFORE the extra trial —
            # otherwise heavy queries would record runs 2+3 combined
            # (~2x) and fabricate a shuffle regression
            sb = meter.new_bytes() if meter.available else None
            if min(runs) > 1.0:
                t0 = time.perf_counter()
                n = fn(spark, sf_dir).count()
                runs.append(time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001 — one bad query must
            # never zero the whole benchmark: record, charge the
            # penalty, and move on
            errors[name] = repr(exc)[:300]
            total += PENALTY_SEC
            print(f"# {name}: ERROR (+{PENALTY_SEC}s penalty) {exc!r}", file=sys.stderr)
            continue
        dt = round(min(runs), 3)
        timings[name] = dt
        trials[name] = [round(r, 3) for r in runs]
        total += dt
        if meter.available:
            meter.new_bytes()  # drain trial-3 stages off the credit line
        extra = ""
        if sb is not None:
            shuffle_bytes[name] = sb
            extra = f" shuffle={sb / 1e6:.2f}MB"
        print(
            f"# {name}: {dt:.3f}s (first {runs[0]:.3f}s) rows={n}{extra}",
            file=sys.stderr,
        )

    sf = sf_dir.rstrip("/").split("sf")[-1]
    # The stdout contract line carries ONLY scalar fields (~120
    # bytes). Per-query timings, trial spreads, shuffle bytes, and
    # error detail ALL go to the bench_details.json sidecar: the
    # driver's tail capture truncated the final line mid-JSON in BOTH
    # r3 (8 KB line) and r4 (2.5 KB line — the timings dict alone was
    # enough), losing the round's parsed headline twice.
    payload = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "failed_count": len(errors),
    }
    details = {
        **payload,
        "queries": timings,
        "trials": trials,
        "shuffle_bytes": shuffle_bytes,
        "shuffle_bytes_total": sum(shuffle_bytes.values()),
        "errors": errors,
        "penalty_sec_per_failure": PENALTY_SEC,
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }
    # scoped runs must not clobber the committed full-run sidecar
    sidecar = "bench_details_scoped.json" if only else "bench_details.json"
    details_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), sidecar
    )
    with open(details_path, "w") as fh:
        json.dump(details, fh, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
