"""Scan-layout helpers.

``spread_narrow_scan`` is the shared cure for the 1-task-scan-stage
disease (guide §2.5 "input skew … repartition immediately after the
read"): heavy map-side work (shingle explode + md5, featurization,
comparators) fused into a scan stage runs at the SCAN's partition
count, and a small single-row-group parquet file arrives as ONE
split, serializing the whole sweep onto one task.  The round-robin
exchange only fires when the scan is narrower than the session
shuffle width — a corpus-scale scan already has more splits than the
session width, so no exchange is added there — and callers are
expected to pass a PROJECTED frame so the exchange carries only the
columns the downstream sweep needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread_narrow_scan"]


def spread_narrow_scan(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` over the session shuffle width iff it
    arrives in fewer partitions (record-sized exchange, conf-driven
    width; identity at corpus scale)."""
    width = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() < width:
        return df.repartition(width)
    return df
