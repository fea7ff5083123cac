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
