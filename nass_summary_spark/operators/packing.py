"""Sequence packing: concat-then-chunk documents into fixed
token-budget training sequences (GPT-style pack-and-chunk).

Each partition's (shard's) token stream — documents concatenated in
``order_col`` order — is cut into ``budget``-token bins; a document
may straddle a bin boundary. The running token offset is a window
partitioned by ``part_col``, so every shard packs independently and
in parallel; the bin fan-out explodes ~(1 + n_tok/budget) rows per
document, linear in corpus tokens. One shuffle total: the window's
per-partition sort also satisfies the final (partition, bin)
aggregation, so no second exchange appears (asserted in PLANS.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_token_bins(
    df: DataFrame,
    order_col: str,
    part_col: str,
    ntok_col: str,
    budget: int = 512,
) -> DataFrame:
    """Per-bin occupancy of the packed stream.

    Returns one row per (``part_col``, bin) with ``n_docs`` (docs
    overlapping the bin), ``n_whole_docs`` (docs wholly inside it)
    and ``n_tokens`` (tokens filled — every interior bin shows
    exactly ``budget``, i.e. zero padding waste). Zero-token rows
    are dropped (nothing to pack)."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = (
        df.select(
            order_col, part_col, F.col(ntok_col).cast("bigint").alias("__n_tok")
        )
        .where(F.col("__n_tok") > 0)
        .withColumn("__cum", F.sum("__n_tok").over(w))
        .select(
            part_col,
            (F.col("__cum") - F.col("__n_tok")).alias("tok0"),
            (F.col("__cum") - 1).alias("tok1"),
        )
    )
    b = t.select(
        part_col,
        "tok0",
        "tok1",
        F.explode(
            F.sequence(F.expr(f"tok0 div {budget}"), F.expr(f"tok1 div {budget}"))
        ).alias("bin"),
    )
    lo = F.col("bin") * budget
    hi = (F.col("bin") + 1) * budget
    return b.groupBy(part_col, "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when((F.col("tok0") >= lo) & (F.col("tok1") < hi), 1)).alias(
            "n_whole_docs"
        ),
        F.sum(
            F.least(F.col("tok1"), hi - 1) - F.greatest(F.col("tok0"), lo) + 1
        ).alias("n_tokens"),
    )


def inference_batches(
    df: DataFrame,
    id_col: str,
    ntok_col: str,
    rows_per_batch: int = 32,
    bucket_bits: int = 1,
) -> DataFrame:
    """Length-bucketed INFERENCE batching — the pad-don't-pack
    counterpart of :func:`pack_token_bins` (inference can't
    concatenate unrelated documents, so every sequence in a batch
    pads to the batch's longest member and the padding is pure
    wasted FLOPs):

    * documents bucket by length octave (``floor(log2(n_tok))``,
      coarsened by ``bucket_bits`` — 1 = power-of-two buckets), so
      co-batched sequences are within ~2× of each other;
    * inside a bucket, ``row_number()`` over (n_tok desc, id) slices
      fixed ``rows_per_batch`` batches — deterministic, and longest-
      first so the one possibly-short final batch absorbs the
      stragglers;
    * per batch the padded cost is ``n_rows · max(n_tok)``; the
      returned ``padding_waste`` (padded − real tokens) is the
      quantity a serving scheduler minimizes, and bucketing is what
      keeps it small: unbucketed batches pad everything to the
      global max.

    One shuffle (the per-bucket window); batch grain output:
    (bucket, batch_id, n_rows, max_tokens, sum_tokens,
    padding_waste). Scale note: rows within ONE bucket form a single
    window partition only per bucket — buckets are logarithmic in
    max document length, so add a shard column to the bucket for
    corpora where one octave exceeds a task (same recipe as B35's
    ``part_col``).
    """
    staged = df.select(
        F.col(id_col).alias("__id"),
        F.col(ntok_col).cast("bigint").alias("__n"),
    ).where(F.col("__n") > 0)
    # floor(log2(n)) computed INTEGER-EXACTLY as the binary digit
    # count minus one (float log2 of an exact power of two can land
    # at 9.999999999999998 in one engine and 10.0 in another — a
    # cross-engine bucket flip the oracle would catch)
    octave = F.length(F.conv(F.col("__n").cast("string"), 10, 2)) - 1
    bucket = F.floor(octave / bucket_bits).cast("int")
    w = Window.partitionBy("__bucket").orderBy(
        F.col("__n").desc(), F.col("__id")
    )
    return (
        staged.withColumn("__bucket", bucket)
        .withColumn(
            "__batch",
            ((F.row_number().over(w) - 1) / rows_per_batch).cast("int"),
        )
        .groupBy(F.col("__bucket").alias("bucket"), F.col("__batch").alias("batch_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("__n").alias("max_tokens"),
            F.sum("__n").alias("sum_tokens"),
            (F.count(F.lit(1)) * F.max("__n") - F.sum("__n")).alias(
                "padding_waste"
            ),
        )
    )
