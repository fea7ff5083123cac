"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the same knobs are what we would
set on a 1000-executor cluster (AQE, partial aggregation, Arrow for
the few Pandas-UDF paths). Callers on a real cluster pass their own
``master``/partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "nass_summary_spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_configs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's defaults.

    - AQE on: runtime partition coalescing + skew-join splitting, the
      cluster-scale answer to skewed NASS location/commodity keys.
    - Arrow on: the multimodal / stateful-streaming paths use Pandas
      UDFs; everything else stays JVM-side.
    - Broadcast threshold left at default (10 MB) — dimension tables
      (region/nation/crosswalks) are far below it; operators also
      mark broadcasts explicitly so the intent survives autotuning.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # parquet TIMESTAMP(NANOS) (e.g. pandas-written event data) is
        # otherwise unreadable; read as long, convert at the source
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_configs or {}).items():
        builder = builder.config(k, v)
    if master is not None:
        builder = builder.master(master)
    elif SparkSession.getActiveSession() is None:
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()
