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
