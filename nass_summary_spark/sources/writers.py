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
