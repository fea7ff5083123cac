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

#: (input-file tuple, width, maxPartitionBytes) → measured scan
#: partition count. The ``.rdd.getNumPartitions()`` probe runs a full
#: analyze→optimize→physical-plan cycle (~0.05-1s of driver time per
#: call — profiled as a visible inter-job gap in every spread_* entry
#: point), but the answer only depends on the underlying file set and
#: split config, so one probe per (scan, width) serves every caller
#: in the session. ``inputFiles()`` itself is ~10ms (analysis only).
_NPARTS_CACHE: dict[tuple, int] = {}


def spread_narrow_scan(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` over the session shuffle width iff it
    arrives in fewer partitions (record-sized exchange, conf-driven
    width; identity at corpus scale)."""
    conf = df.sparkSession.conf
    width = int(conf.get("spark.sql.shuffle.partitions"))
    try:
        files = tuple(sorted(df.inputFiles()))
    except Exception:
        files = ()
    if files:
        key = (files, width, conf.get("spark.sql.files.maxPartitionBytes"))
        n = _NPARTS_CACHE.get(key)
        if n is None:
            n = df.rdd.getNumPartitions()
            _NPARTS_CACHE[key] = n
    else:
        n = df.rdd.getNumPartitions()
    if n < width:
        return df.repartition(width)
    return df
