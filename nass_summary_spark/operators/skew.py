"""Skew-handling utilities (SURVEY.md §6).

AQE's skew-join splitting covers sort-merge joins at runtime, but
two shapes still hot-spot a single reducer at 100 TB:

- a groupBy where one key holds a large share of all rows
  (NASS: national-level location codes; web data: one domain),
- a shuffle join against a moderately-sized skewed build side.

``salted_agg`` implements the standard two-phase fix declaratively:
salt the key into S shards, partially aggregate, then merge the
shards. Works for any algebraic aggregate (sum/count/min/max —
things with a merge function).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: merge function per partial-agg function
_MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: output_name -> (fn, input_col) with fn in sum/count/min/max.
    Phase 1 groups by (keys, salt) — the hot key spreads over
    ``salt_buckets`` reducers; phase 2 merges the ≤ salt_buckets
    partials per key (tiny). Both phases get map-side partial
    aggregation from Spark for free, so for non-skewed keys the
    overhead is one narrow extra shuffle of pre-aggregated rows.
    """
    salt = (F.spark_partition_id() % salt_buckets).alias("__salt")
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                getattr(F, fn)(F.col(src)).alias(name)
                for name, (fn, src) in aggs.items()
            ]
        )
    )
    merged = phase1.groupBy(*keys).agg(
        *[
            getattr(F, _MERGE[fn])(F.col(name)).alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )
    return merged


def replicate_broadcast_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-safe equi-join for a dimension too hot for one reducer:
    salt the fact side, replicate each dim row once per salt value,
    and join on (key, salt). The dim side grows ×salt_buckets, the
    hot fact key spreads over salt_buckets tasks.
    """
    salted_facts = facts.withColumn(
        "__salt", F.spark_partition_id() % salt_buckets
    )
    replicated = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_facts.join(replicated, on=[key, "__salt"]).drop("__salt")


def hill_tail_index(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 50,
    round_to: int = 6,
) -> DataFrame:
    """Hill estimator of the power-law tail index per group — the
    quantitative companion to key_skew_profile's descriptive ratios:
    alpha ≈ 2 is classic Zipf, alpha < 2 means the head dominates
    (salting/hub-caps mandatory), large alpha means thin tails
    (uniform-ish, no skew handling needed). Estimated from the top-k
    order statistics only: ``H = mean(ln(x(i)/x(k)))`` over the k−1
    largest values, ``alpha = 1/H``.

    One per-group TOP-K window (WindowGroupLimit prunes to k+ties
    per partition before the sort — never a full per-group sort of
    the value relation), then ≤k ln terms per group at ROUND(6) (the
    B57 posture; tie order cancels — equal values give equal
    ratios). Groups with fewer than k positive values or a
    degenerate (all-equal) top-k report NULL.

    Output: ``(group, k, x_k, hill_mean_ln, alpha)``.
    """
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    base = df.where(
        F.col(value_col).isNotNull() & (F.col(value_col) > 0)
    ).select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("__x"),
    )
    w = Window.partitionBy("grp").orderBy(F.col("__x").desc())
    top = base.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= k
    ).persist()
    xk = top.where(F.col("__rn") == k).select(
        "grp", F.col("__x").alias("__xk")
    )
    agg = (
        top.where(F.col("__rn") < k)
        .join(F.broadcast(xk), "grp")
        .groupBy("grp")
        .agg(
            F.sum(F.log(F.col("__x") / F.col("__xk"))).alias("__s"),
            F.count(F.lit(1)).cast("bigint").alias("__m"),
            F.min("__xk").alias("__k_val"),
        )
    )
    h = F.col("__s") / F.col("__m").cast("double")
    return agg.select(
        F.col("grp").alias(group_col),
        F.lit(int(k)).cast("int").alias("k"),
        F.round("__k_val", round_to).alias("x_k"),
        F.round(F.when(F.col("__s") > 0, h), round_to).alias(
            "hill_mean_ln"
        ),
        F.round(
            F.when(F.col("__s") > 0, F.lit(1.0) / h), round_to
        ).alias("alpha"),
    ).orderBy(group_col)
