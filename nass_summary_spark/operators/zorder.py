"""Z-order (Morton curve) data layout — the multi-dimensional
clustering device behind Delta/Iceberg ``OPTIMIZE ZORDER BY``: map
each row's (x, y) key pair onto one interleaved-bit integer so that
RANGE-partitioning by that single value co-locates rows that are
close in BOTH dimensions. A file layout written in z-order lets
min/max pruning skip files for 2-D predicates (user × time, region ×
date) where single-column sort orders only prune one dimension.

Everything is exact integer bit arithmetic — interleave, bucket
assignment, and the per-bucket bounding-box readout replay
identically in any engine, so the layout plan is fully
oracle-able. Scale shape: the z-value is a per-row projection (no
shuffle); bucketing is one combinable aggregation; at a real write
path the z-value feeds ``repartitionByRange(z)`` and the readout
here IS the pruning evidence (per-bucket x/y spans a fraction of
the global span — hash layout spans ~everything in both).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension (z-values use 2*BITS bits)
BITS = 10


def z_value(x: Column, y: Column, bits: int = BITS) -> Column:
    """Morton interleave of two ``bits``-bit non-negative integers:
    bit b of x lands at position 2b, bit b of y at 2b+1. Pure
    integer expression (getbit + shifts via multiplication by powers
    of two, exactly replayable in SQL)."""
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        z = (
            z
            + (F.shiftright(x.cast("bigint"), b) % 2)
            * F.lit(1 << (2 * b)).cast("bigint")
            + (F.shiftright(y.cast("bigint"), b) % 2)
            * F.lit(1 << (2 * b + 1)).cast("bigint")
        )
    return z


def z_value_sql(x: str, y: str, bits: int = BITS) -> str:
    """The DuckDB-replayable twin of :func:`z_value` (same shifts,
    same powers of two)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x}) >> {b}) % 2) * {1 << (2 * b)}")
        terms.append(f"((({y}) >> {b}) % 2) * {1 << (2 * b + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_layout(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = BITS,
    n_buckets: int = 16,
) -> DataFrame:
    """Plan a z-ordered layout over the (x, y) key pair and report
    its pruning quality: rows bucket by equi-width ranges of the
    z-value; each bucket row carries its row count and the x/y
    bounding box a min/max-pruning reader would consult.

    ``x``/``y`` must already be reduced to ``[0, 2^bits)`` (callers
    mod or quantize — the layout needs a bounded key domain exactly
    like any space-filling curve index). Output: ``bucket, n_rows,
    x_min, x_max, y_min, y_max, x_span, y_span``.
    """
    staged = df.select(
        x.cast("bigint").alias("__x"), y.cast("bigint").alias("__y")
    ).withColumn("__z", z_value(F.col("__x"), F.col("__y"), bits))
    span = 1 << (2 * bits)
    width = span // n_buckets
    bucket = F.floor(
        F.col("__z").cast("double") / F.lit(float(width))
    ).cast("bigint")
    return (
        staged.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("__x").alias("x_min"),
            F.max("__x").alias("x_max"),
            F.min("__y").alias("y_min"),
            F.max("__y").alias("y_max"),
        )
        .select(
            "bucket",
            "n_rows",
            "x_min",
            "x_max",
            "y_min",
            "y_max",
            (F.col("x_max") - F.col("x_min")).alias("x_span"),
            (F.col("y_max") - F.col("y_min")).alias("y_span"),
        )
        .orderBy("bucket")
    )
