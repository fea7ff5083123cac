"""Sinks.

Reference exports every summary view with
``\\COPY (select …) to file.csv with csv header`` (`nass.mk:54-60`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_csv(df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite") -> None:
    """CSV-with-header export. ``single_file`` coalesces to one part
    for small summary exports (the reference's use case); large
    outputs keep their partitioning."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", True).csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet sink — partition columns chosen by the
    caller to line up with downstream partition pruning (e.g. year /
    state for NASS summaries)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
) -> None:
    """Incremental partition replacement: overwrite ONLY the
    partitions present in ``df``, leaving sibling partitions intact
    (``partitionOverwriteMode=dynamic``).

    This is the Spark-idiomatic twin of the reference's Make-driven
    re-ingest (`nass.mk:17-33`): re-loading one census year replaces
    that year's slice of the table instead of truncate-and-reload.
    At 100 TB the difference is re-writing one day's partition vs the
    whole table. Scoped via the writer option so the session default
    (static) is untouched for other writers."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (the other columnar interchange format big warehouses
    standardize on). Same partition-pruning contract as parquet."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_parquet_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-clustered sorted parquet layout: ``repartitionByRange``
    gives each output file a DISJOINT key range and
    ``sortWithinPartitions`` orders rows inside it — so parquet
    row-group min/max statistics prune point/range reads down to one
    file (the poor-man's Z-order, exactly what a 100 TB fact table
    wants for its dominant filter column). One range-exchange (sampled
    boundaries), no global sort."""
    from pyspark.sql import functions as F

    (
        df.repartitionByRange(n_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode(mode)
        .parquet(path)
    )
