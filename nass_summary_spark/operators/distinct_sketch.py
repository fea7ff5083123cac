"""Mergeable distinct-count sketches (Apache DataSketches HLL).

``approx_distinct`` (B23) answers "how many distinct, once, over one
scan". At 100 TB the question is incremental: N daily shards each
build a tiny HLL sketch ONCE, and every later rollup (per source,
per month, global) merges persisted sketches WITHOUT rescanning raw
data — the sketch table is KBs where the raw corpus is TBs. Spark
ships the DataSketches HLL pair (``hll_sketch_agg`` /
``hll_union_agg``) whose binary images are stable, mergeable, and
persistable as plain parquet BINARY columns; this module wraps them
into the build-once / merge-later lifecycle the index family
(B100/B101/B103/B105) uses.

Correctness posture: a DataSketches HLL in LIST/SET (sparse) mode
stores coupon hashes and its estimate is EXACT (barring a 2^-26
coupon collision); it promotes to approximate dense mode only past
~3/4·2^lgK coupons. The per-group estimates at the test scales stay
sparse-exact, so the rollup query carries a FULL oracle
(estimate ≡ COUNT(DISTINCT)) — any wiring bug (double-merge, missed
shard, id/key mixup) breaks it. The approximation regime and the
merge law (union-of-sketches ≡ sketch-of-union) are property-pinned
in tests at cardinalities past the promotion threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: lgK for every sketch in a lifecycle — merging sketches of
#: different lgK silently degrades to the coarser one, so the
#: builder pins it (the index family's "no mixed generations" rule,
#: soft-enforced here by construction).
LG_K = 12


def build_distinct_sketches(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    shard: Column | None = None,
    lg_k: int = LG_K,
) -> DataFrame:
    """Per-(keys[, shard]) HLL sketches of ``id_col``.

    One map-side-combinable aggregation; output is one row per group
    carrying a KB-sized binary sketch — the relation a pipeline
    persists per ingest batch (plain parquet, BINARY column).
    """
    grouped = df.withColumn("__shard", shard) if shard is not None else df
    gb = keys + (["__shard"] if shard is not None else [])
    return grouped.groupBy(*gb).agg(
        F.hll_sketch_agg(id_col, F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def rollup_distinct(sketches: DataFrame, by: list[str]) -> DataFrame:
    """Merge persisted sketches up to ``by`` and estimate.

    Reads ONLY the sketch relation — never the raw corpus. One
    bounded aggregation (output ≤ |distinct by|); estimates are
    exact while the merged sketch is sparse, approximate (±~1.6% at
    lgK=12) past promotion.
    """
    return sketches.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_sketches"),
        F.sum("n_rows").alias("n_rows"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_distinct"),
    )
