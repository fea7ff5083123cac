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


def pairwise_overlap(
    sketches: DataFrame,
    group_col: str,
    exact_keys: DataFrame | None = None,
    key_col: str = "key",
) -> DataFrame:
    """Pairwise set-overlap estimates between groups' sketches via
    inclusion-exclusion: ``|A∩B| ≈ est(A) + est(B) − est(A∪B)`` —
    the cross-corpus / cross-epoch "how much do these two feeds
    share" question answered from persisted KB-sized sketches,
    never by joining the raw key sets (at 100 TB the exact
    intersection join is the single most expensive query a dedup
    audit runs; the sketch answer is a broadcast-sized self-join).

    ``sketches`` is ``build_distinct_sketches`` output (one row per
    group). While every sketch is sparse (exact regime, see
    rollup_distinct), the estimate IS the exact overlap — which is
    what makes the demo query fully oracle-able. If ``exact_keys``
    (a (group, key) relation) is given, the exact intersection is
    computed alongside so each row certifies its own error.
    """
    a, b = sketches.alias("a"), sketches.alias("b")
    pairs = a.join(
        b, F.col(f"a.{group_col}") < F.col(f"b.{group_col}")
    ).select(
        F.col(f"a.{group_col}").alias("type_a"),
        F.col(f"b.{group_col}").alias("type_b"),
        F.hll_sketch_estimate("a.sketch").alias("est_a"),
        F.hll_sketch_estimate("b.sketch").alias("est_b"),
        F.hll_sketch_estimate(
            F.hll_union("a.sketch", "b.sketch")
        ).alias("est_union"),
    )
    out = pairs.select(
        "type_a",
        "type_b",
        "est_a",
        "est_b",
        "est_union",
        (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
            "est_overlap"
        ),
    )
    if exact_keys is None:
        return out.orderBy("type_a", "type_b")
    # The exact intersection counts JOIN rows, so a non-distinct
    # (group, key) input would silently inflate the "exact" overlap
    # this relation certifies against — enforce the precondition
    # here rather than trusting every call site to pre-distinct.
    exact_keys = exact_keys.select(group_col, key_col).distinct()
    ka, kb = exact_keys.alias("ka"), exact_keys.alias("kb")
    exact = (
        ka.join(
            kb,
            (F.col(f"ka.{key_col}") == F.col(f"kb.{key_col}"))
            & (F.col(f"ka.{group_col}") < F.col(f"kb.{group_col}")),
        )
        .groupBy(
            F.col(f"ka.{group_col}").alias("type_a"),
            F.col(f"kb.{group_col}").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    return out.join(exact, ["type_a", "type_b"], "left").fillna(
        {"exact_overlap": 0}
    ).orderBy("type_a", "type_b")
