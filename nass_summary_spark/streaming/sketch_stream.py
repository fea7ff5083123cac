"""C28: streaming distinct-sketch ingest — the stream twin of
operators/distinct_sketch.py (B114).

Each micro-batch of arriving documents aggregates to per-(keys,
batch) HLL shard sketches and APPENDS them to a persisted sketch
table; any later rollup merges sketches without rescanning raw data.
This is the incremental-distinct lifecycle at ingest: the "state" is
the KB-sized sketch table on disk (no streaming aggregation state,
no watermark), exactly the C23 posture with sketches instead of
signatures.

Exactly-once: foreachBatch can replay a batch after a crash. Every
batch writes to its own ``batch_id=N`` partition directory with
overwrite, so a replay rewrites identical bytes (HLL sketch images
are deterministic for a given input multiset under deterministic
partitioning of the batch — and even if executor scheduling produced
a different-but-equivalent image, the MERGED estimate is identical
by the union law pinned in tests). No marker protocol is needed
because the sink is a pure per-batch overwrite — idempotence by
construction, the write_partial_summary pattern.

Parity evidence (tests/test_streaming.py): rollup over the streamed
shard sketches ≡ the batch rollup over the whole corpus (exact at
sparse-mode cardinalities), for any micro-batch split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from nass_summary_spark.operators.distinct_sketch import (
    LG_K,
    build_distinct_sketches,
    rollup_distinct,
)


def sketch_ingest_stream(
    sdf: DataFrame,
    keys: list[str],
    id_col: str,
    sketch_path: str,
    checkpoint_path: str,
    lg_k: int = LG_K,
) -> StreamingQuery:
    """Maintain the persisted per-(keys, batch) sketch table from a
    document stream. Stateless between batches: each batch is one
    map-side-combinable aggregation (≤ |keys-groups| rows out) and
    one partition-directory overwrite."""

    def build_and_append(batch_df: DataFrame, batch_id: int) -> None:
        shards = build_distinct_sketches(batch_df, keys, id_col, lg_k=lg_k)
        (
            shards.write.mode("overwrite").parquet(
                f"{sketch_path}/batch_id={batch_id}"
            )
        )

    return (
        sdf.writeStream.foreachBatch(build_and_append)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_stream_sketches(spark: SparkSession, sketch_path: str) -> DataFrame:
    """The persisted shard-sketch table (one row per (keys, batch))."""
    return spark.read.option("basePath", sketch_path).parquet(
        f"{sketch_path}/batch_id=*"
    )


def rollup_stream_sketches(
    spark: SparkSession, sketch_path: str, by: list[str]
) -> DataFrame:
    """Distinct-count rollup over ONLY the persisted sketches —
    never the raw corpus (the B114 rollup applied to the streamed
    shards)."""
    return rollup_distinct(read_stream_sketches(spark, sketch_path), by)
