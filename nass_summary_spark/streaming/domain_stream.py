"""C32: streaming domain/host gate — the stream twin of
operators/domain.py (B153), for ingest-time curation: documents
arrive in micro-batches and the per-host document cap must hold
ACROSS batches, so the gate carries state — a persisted per-host
count table, maintained with the same per-``batch_id``-overwrite
replay protocol as the sketch ingests (C28/C30).

Cap semantics under streaming are ARRIVAL-ORDER by nature: the first
``max_per_host`` documents a host ships are kept, later ones are
capped (within a batch the order is the batch operator's
deterministic hash order, so a replayed batch reproduces its exact
dispositions). The batch operator ranks one static corpus by hash
order globally; the stream ranks by (batch, hash-within-batch) —
the parity pytest pins the stream output row-for-row against an
independent sequential replay of that definition.

Exactly-once: both writes of a batch (the gated output and the
host-count DELTA) go to their own ``batch_id=N`` directories with
overwrite; prior counts are read only from deltas with id < N, so a
crash-replay rewrites identical bytes and never double-counts.
"""

from __future__ import annotations

import glob as _glob
import re as _re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from nass_summary_spark.operators.domain import extract_host
from nass_summary_spark.operators.sampling import id_bucket

_STATE_SCHEMA = "host string, cnt bigint"


def _prior_counts(
    spark: SparkSession, state_path: str, batch_id: int
) -> DataFrame:
    dirs = [
        d
        for d in _glob.glob(f"{state_path}/batch_id=*")
        if _re.search(r"batch_id=(\d+)$", d)
        and int(d.rsplit("=", 1)[1]) < batch_id
    ]
    if not dirs:
        return spark.createDataFrame([], _STATE_SCHEMA)
    return (
        spark.read.schema(_STATE_SCHEMA)
        .parquet(*dirs)
        .groupBy("host")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def domain_gate_stream(
    sdf: DataFrame,
    url_col: str,
    id_col: str,
    blocklist: DataFrame,
    max_per_host: int,
    out_path: str,
    state_path: str,
    checkpoint_path: str,
) -> StreamingQuery:
    """Gate a document stream host-by-host with a cross-batch cap.

    Per batch: host extraction (map-only), broadcast blocklist join,
    within-batch deterministic rank per host (the B20 hash order),
    shifted by the host's persisted prior count — then one overwrite
    of the gated output and one of the count delta. State is
    host-sized; the corpus never rescans.
    """
    cap = int(max_per_host)
    b = (
        blocklist.select(
            F.lower(F.trim(F.col(blocklist.columns[0]))).alias("host")
        )
        .distinct()
        .withColumn("__blocked", F.lit(1))
    )

    def gate_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        staged = batch_df.withColumn(
            "host", extract_host(F.col(url_col))
        ).join(F.broadcast(b), "host", "left")
        w = Window.partitionBy("host").orderBy(
            id_bucket(id_col).asc(), F.col(id_col).asc()
        )
        prior = _prior_counts(spark, state_path, batch_id)
        ranked = (
            staged.withColumn("__rn", F.row_number().over(w))
            .join(
                F.broadcast(prior.withColumnRenamed("cnt", "__prior")),
                "host",
                "left",
            )
            .fillna({"__prior": 0})
            .withColumn(
                "host_rank",
                (F.col("__prior") + F.col("__rn")).cast("bigint"),
            )
        )
        gated = ranked.withColumn(
            "disposition",
            F.when(F.col("__blocked") == 1, F.lit("blocked"))
            .when(F.col("host_rank") > cap, F.lit("capped"))
            .otherwise(F.lit("kept")),
        ).drop("__blocked", "__rn", "__prior")
        gated.write.mode("overwrite").parquet(
            f"{out_path}/batch_id={batch_id}"
        )
        delta = staged.groupBy("host").agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        delta.write.mode("overwrite").parquet(
            f"{state_path}/batch_id={batch_id}"
        )

    return (
        sdf.writeStream.foreachBatch(gate_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_gated(spark: SparkSession, out_path: str) -> DataFrame:
    """The gated output across all batches (batch_id is the arrival
    partition)."""
    return spark.read.option("basePath", out_path).parquet(
        f"{out_path}/batch_id=*"
    )
