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
from pyspark.sql import functions as F
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


def consolidate_stream_sketches(
    spark: SparkSession,
    sketch_path: str,
    keys: list[str],
    up_to_batch: int,
    keep_backup: bool = False,
) -> dict:
    """Sketch-table COMPACTION by merging, not file rewriting: fold
    every per-batch shard directory with ``batch_id <= up_to_batch``
    into ONE consolidated shard under ``batch_id=<up_to_batch>``.

    This is the maintenance pass the accreting ingest needs (VERDICT
    r8 item 5): months of micro-batches leave thousands of KB-sized
    parquet directories whose listing cost eventually dominates the
    rollup. Because HLL sketch images are MERGEABLE, consolidation is
    semantic, not physical — ``hll_union_agg`` per keys-group over
    the old shards produces one row per group whose union with later
    batches is byte-for-byte the same ESTIMATE as before (the union
    law the C28 parity tests pin), so rollups are unchanged while the
    directory count drops to one per consolidation horizon.

    Crash safety: the merged generation is validated (group count
    re-read from the rewrite must match the merge input), staged in a
    sibling directory, swapped in over ``batch_id=<up_to_batch>`` via
    the Hadoop FS rename pair (functions/fsio.swap_in), and ONLY THEN
    are the other absorbed directories removed. A crash before the
    swap leaves every original directory intact; a crash between the
    swap and the removals leaves ABSORBED shards duplicated next to
    the consolidated one — for the DISTINCT estimates this window is
    harmless (HLL union is idempotent: merging a sketch twice is the
    same sketch), but the per-group ``n_rows`` sum double-counts
    until the leftover ``batch_id=*`` directories (all < the
    consolidated id) are removed, which a re-run's directory listing
    makes obvious. A transactional table format closes the window
    with a real commit protocol — the same caveat as compact_table
    and the dedup-index extend marker. Run in a quiet window. The
    stream's checkpoint is untouched: new batches keep appending
    AFTER ``up_to_batch``, and a replayed old batch is impossible
    once its id is committed to the checkpoint.

    Returns {"batches_merged", "groups", "consolidated_batch_id"}.
    """
    import glob as _glob
    import os as _os
    import re as _re

    dirs = sorted(
        d
        for d in _glob.glob(f"{sketch_path}/batch_id=*")
        if _re.search(r"batch_id=(\d+)$", d)
        and int(d.rsplit("=", 1)[1]) <= up_to_batch
    )
    if len(dirs) < 2:
        return {
            "batches_merged": len(dirs),
            "groups": 0,
            "consolidated_batch_id": up_to_batch,
        }
    old = spark.read.parquet(*dirs)
    merged = old.groupBy(*keys).agg(
        F.expr("hll_union_agg(sketch)").alias("sketch"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
    )
    tmp = f"{sketch_path}/__consolidating_batch_id_{up_to_batch}"
    merged.write.mode("overwrite").parquet(tmp)
    n_groups = spark.read.parquet(tmp).count()
    n_expected = old.select(*keys).distinct().count()
    if n_groups != n_expected:
        raise RuntimeError(
            f"consolidate_stream_sketches: rewrite has {n_groups} groups,"
            f" merge input has {n_expected}; aborting with the original"
            " shard directories untouched"
        )
    from nass_summary_spark.functions.fsio import remove_dir, swap_in

    live = f"{sketch_path}/batch_id={up_to_batch}"
    swap_in(
        spark, live, tmp, backup_suffix="__pre_consolidate",
        keep_backup=keep_backup,
    )
    for d in dirs:
        if _os.path.normpath(d) != _os.path.normpath(live):
            remove_dir(spark, d)
    return {
        "batches_merged": len(dirs),
        "groups": n_groups,
        "consolidated_batch_id": up_to_batch,
    }


# ---------------------------------------------------------------------------
# C30: streaming count-min ingest (the B134 family's stream twin)
# ---------------------------------------------------------------------------

def countmin_ingest_stream(
    sdf: DataFrame,
    keys: list[str],
    item_col: str,
    sketch_path: str,
    checkpoint_path: str,
    depth: int = 4,
    width: int = 1024,
) -> StreamingQuery:
    """Maintain a persisted per-(keys, batch) count-min counter table
    from a stream — the frequency analog of
    :func:`sketch_ingest_stream`. Each batch is one combinable
    aggregation to ≤ depth x width counter rows and one
    partition-directory overwrite.

    Exactly-once nuance vs the HLL table: CMS counters are SUMS, so
    double-merging a replayed batch WOULD double-count (HLL union is
    idempotent; addition is not). The per-``batch_id`` overwrite
    protocol carries the weight here — a replay rewrites the same
    directory with identical counters (the build is deterministic
    for a batch multiset), never appends next to it.
    """
    from nass_summary_spark.operators.countmin import build_countmin

    def build_and_append(batch_df: DataFrame, batch_id: int) -> None:
        shard = build_countmin(
            batch_df, keys, item_col, depth=depth, width=width
        )
        shard.write.mode("overwrite").parquet(
            f"{sketch_path}/batch_id={batch_id}"
        )

    return (
        sdf.writeStream.foreachBatch(build_and_append)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def rollup_stream_countmin(
    spark: SparkSession, sketch_path: str, by: list[str]
) -> DataFrame:
    """Merge the persisted per-batch counter shards up to ``by`` —
    ADDITION over counter rows only, never raw data."""
    from nass_summary_spark.operators.countmin import merge_countmin

    shards = spark.read.option("basePath", sketch_path).parquet(
        f"{sketch_path}/batch_id=*"
    )
    return merge_countmin(shards.drop("batch_id"), by)


# ---------------------------------------------------------------------------
# C31: streaming quantile-sketch ingest (the B129 family's stream twin)
# ---------------------------------------------------------------------------

def quantile_ingest_stream(
    sdf: DataFrame,
    keys: list[str],
    value_col: str,
    sketch_path: str,
    checkpoint_path: str,
) -> StreamingQuery:
    """Maintain a persisted per-(keys, batch) log-histogram table
    from a stream — the rank analog of :func:`sketch_ingest_stream`
    (VERDICT r9 item 3: B114-HLL has C28, B134-CMS has C30; this
    closes the quantile table's streaming lifecycle). Each batch is
    one combinable aggregation to ≤ groups × 512 bucket rows and one
    partition-directory overwrite.

    Exactly-once: bucket counts are SUMS like the CMS counters, so
    the per-``batch_id`` overwrite protocol carries replay safety —
    a replayed batch rewrites the same directory with identical
    counts (the bucket map is deterministic integer arithmetic per
    row), never appends beside it. Merge is ADDITION
    (merge_log_histograms), so any later rollup reads only the
    bucket relation.
    """
    from nass_summary_spark.operators.quantile_sketch import (
        build_log_histogram,
    )

    def build_and_append(batch_df: DataFrame, batch_id: int) -> None:
        shard = build_log_histogram(batch_df, keys, value_col)
        shard.write.mode("overwrite").parquet(
            f"{sketch_path}/batch_id={batch_id}"
        )

    return (
        sdf.writeStream.foreachBatch(build_and_append)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def rollup_stream_quantiles(
    spark: SparkSession,
    sketch_path: str,
    by: list[str],
    pcts: list[int],
) -> DataFrame:
    """Quantile estimates over ONLY the persisted bucket shards —
    merge by addition, then the B129 rank interpolation; the raw
    stream is never rescanned."""
    from nass_summary_spark.operators.quantile_sketch import (
        histogram_quantiles,
        merge_log_histograms,
    )

    shards = spark.read.option("basePath", sketch_path).parquet(
        f"{sketch_path}/batch_id=*"
    )
    merged = merge_log_histograms(shards.drop("batch_id"), by)
    return histogram_quantiles(merged, by, pcts)


# ---------------------------------------------------------------------------
# C33: streaming SPRT monitor (the A55/B160 family's stream twin)
# ---------------------------------------------------------------------------

def sprt_ingest_stream(
    sdf: DataFrame,
    arm_col: str,
    time_col,
    success_pred,
    state_path: str,
    checkpoint_path: str,
) -> StreamingQuery:
    """Maintain per-(arm, period) trial/success counts from an event
    stream — the state a Wald SPRT monitor reads. Sequential testing
    is INHERENTLY a streaming concept (the whole point is deciding
    while data arrives); this twin gives the batch sprt_monitor its
    ingest path with the same merge-is-addition lifecycle as
    C30/C31: per batch one combinable (arm, period) aggregation
    overwritten into the batch's own directory, rollup = ADDITION —
    a replayed batch rewrites identical counts, never double-counts.

    ``time_col``: a Column mapping events to periods (e.g. epoch
    day). ``success_pred``: a boolean Column marking successes.
    """
    def build(batch_df: DataFrame, batch_id: int) -> None:
        shard = batch_df.groupBy(
            F.col(arm_col).alias("arm"),
            time_col.alias("t"),
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(success_pred.cast("int")).cast("bigint").alias("x"),
        )
        shard.write.mode("overwrite").parquet(
            f"{state_path}/batch_id={batch_id}"
        )

    return (
        sdf.writeStream.foreachBatch(build)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def sprt_decision_from_stream(
    spark: SparkSession,
    state_path: str,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.2,
) -> DataFrame:
    """The SPRT monitor over ONLY the persisted count shards: merge
    by addition up to (arm, period), then the batch
    ``sprt_monitor`` on the identical integer constants — so the
    streamed decision sequence equals the batch run over the union
    of arrivals exactly (BIGINT end to end; parity-pinned)."""
    from nass_summary_spark.operators.experiment import sprt_monitor

    shards = spark.read.option("basePath", state_path).parquet(
        f"{state_path}/batch_id=*"
    )
    merged = shards.groupBy("arm", "t").agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("x"),
    )
    return sprt_monitor(
        merged, "arm", "t", "n", "x", p0, p1, alpha=alpha, beta=beta
    )
