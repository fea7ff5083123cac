"""Bucketed tables — co-located joins without a shuffle.

At 100 TB the fact–fact join (lineitem ⋈ orders, events ⋈ users'
history) is the dominant exchange. Writing both sides bucketed by
the join key into the warehouse lets Spark plan a SortMergeJoin with
NO Exchange on either side: each task reads matching buckets.

Spark only honors bucketing through the catalog (``saveAsTable``),
not plain-path parquet — so these helpers manage warehouse tables.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) warehouse
    table. Matching ``num_buckets`` + ``bucket_cols`` on both join
    sides is what eliminates the exchange."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two bucketed tables on their bucket key — planned
    shuffle-free when bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), on=list(on), how=how)
