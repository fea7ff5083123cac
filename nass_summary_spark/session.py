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
        # preferSortMergeJoin=false (guide §9) was A/B'd on the full
        # bench and kept at the engine default: shuffled-hash joins
        # measured neutral on the winners and +0.5-1.2s on several
        # geo/bpe/linkage queries (r10 attribution runs) — strategy
        # hints remain per-operator where they matter.
        # AQE coalescing floor: with parallelismFirst (default) AQE
        # coalesces small shuffles down to ~bytes/minPartitionSize
        # partitions, so a CPU-heavy but byte-tiny reduce stage (CMS
        # bucket hashing, comparator sweeps) collapses onto 2-4 tasks
        # — byte sizing is blind to per-row CPU (guide §2.5). 128k
        # keeps a few-MB shuffle at full width while leaving truly
        # tiny (sub-128k/part) stages coalesced; on a cluster the
        # floor only engages for small shuffles on wide executors,
        # where extra parallelism is equally cheap. Env-overridable.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "128k"),
        )
    )
    for k, v in (extra_configs or {}).items():
        builder = builder.config(k, v)
    if master is not None:
        builder = builder.master(master)
    elif SparkSession.getActiveSession() is None:
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()
