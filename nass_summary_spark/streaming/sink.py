"""Streaming sinks: checkpointed, exactly-once incremental ingest.

The reference's ingest is batch truncate-and-reload driven by Make
(`nass.mk:17`, re-running `\\COPY` loads). The streaming-native form
is a file-source → clean → parquet-sink pipeline with a checkpoint:
new input files are picked up incrementally, each exactly once, and
a restart resumes from the checkpoint instead of reprocessing — the
100 TB posture for continuously-arriving drops (no reload, no
duplicates, bounded work per trigger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def stream_to_parquet(
    sdf: DataFrame,
    out_path: str,
    checkpoint_path: str,
) -> StreamingQuery:
    """Append a streaming DataFrame to a parquet directory with
    exactly-once semantics.

    The checkpoint (source offsets + file-sink transaction log in
    ``_spark_metadata``) makes both the source and the sink
    idempotent across restarts: a file already committed is never
    re-read, a batch already written is never re-appended.
    ``availableNow`` drains everything pending then stops — the
    incremental-batch trigger (cron-style re-runs process only new
    files, Make-like but without reloads).
    """
    return (
        sdf.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
