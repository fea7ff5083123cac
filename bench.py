#!/usr/bin/env python
"""Headline benchmark: runs the flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Timing counts full query execution (plan + shuffle + collect-count);
a warm-up query absorbs JVM/session startup so numbers reflect the
engine, not the JVM boot.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nass_summary_spark.plans.queries import QUERIES  # noqa: E402
from nass_summary_spark.session import get_spark  # noqa: E402

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
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk_bruteforce",
    "embedding_centroids",
    "text_langid",
    "token_count",
    "doc_fingerprint",
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
    "time_gapfill",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        extra_configs={
            # bench data is a handful of ~1-10 MB files: split scans at
            # row-group granularity so they parallelize. On a real
            # cluster with 128 MB+ files the engine default stands.
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "1m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + parquet footer reads
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        # two runs, report the min: the first execution of a query
        # pays one-time whole-stage-codegen compilation (hundreds of
        # ms of JVM work that amortizes to nothing over a real
        # dataset); the min reflects engine throughput.
        try:
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                n = df.count()
                runs.append(time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001 — one bad query must
            # never zero the whole benchmark: record and move on
            errors[name] = repr(exc)[:300]
            print(f"# {name}: ERROR {exc!r}", file=sys.stderr)
            continue
        dt = round(min(runs), 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s (first {runs[0]:.3f}s) rows={n}", file=sys.stderr)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    payload = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
