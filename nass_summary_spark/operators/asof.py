"""As-of (time-ordered) join.

The reference joins statistics year-to-year by exact keys; a
time-series engine needs the general "latest right row at or before
the left row's timestamp" join. Spark has no built-in as-of join, so
we use the union-merge trick:

1. tag left rows (probe, side=1) and right rows (reference, side=0),
2. UNION them into one stream keyed by (key, time),
3. one window sorted by (time, side) carries the latest right-row
   payload forward with ``last(..., ignorenulls=True)``,
4. keep the probe rows.

Cost: ONE shuffle (the window partition-by), no pair explosion —
versus the naive join+filter whose intermediate is |L|·|R| per key.
That's what matters when both sides are billions of rows; the window
carries a single payload struct of running state per partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    payload: Sequence[str],
    suffix: str = "",
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest ``right_time`` <= ``left_time`` within the same ``on``
    keys (NULL when none exists).

    A right row at exactly the left row's time IS visible to it
    (matching DuckDB ``ASOF JOIN`` >= semantics): right rows sort
    before probe rows at equal timestamps via the side tag.
    """
    on = list(on)
    payload = list(payload)

    row_struct = F.struct(*[F.col(c) for c in left.columns])
    pay_struct = F.struct(*[F.col(c) for c in payload])
    pay_type = right.select(pay_struct.alias("__pay")).schema["__pay"].dataType

    l_tag = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        row_struct.alias("__row"),
        F.lit(None).cast(pay_type).alias("__pay"),
    )
    row_type = l_tag.schema["__row"].dataType
    r_tag = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(row_type).alias("__row"),
        pay_struct.alias("__pay"),
    )

    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__match", F.last("__pay", ignorenulls=True).over(w))
    probe = carried.where(F.col("__side") == 1)
    out_cols = [F.col("__row")[c].alias(c) for c in left.columns]
    out_cols += [F.col("__match")[c].alias(f"{c}{suffix}") for c in payload]
    return probe.select(*out_cols)


def nearest_event_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    payload: Sequence[str],
    suffix: str = "",
) -> DataFrame:
    """For each left row, attach the payload of the right row whose
    time is NEAREST in either direction (ties → the earlier right
    row) — the bidirectional companion of :func:`asof_join` for
    sensor alignment ("which reading belongs to this event" when
    readings can land just after as well as just before).

    Same union-merge shape, ONE shuffle: the backward candidate is
    the running ``last(ignorenulls)`` and the forward candidate the
    mirrored ``first(ignorenulls)`` over the FOLLOWING frame — both
    windows share the single (key, time, side) sort.  The closer
    candidate wins; equal distance keeps the earlier (backward) one.
    Emits ``{payload}{suffix}`` plus ``__nearest_dt_us`` (signed
    right−left distance in µs) for the caller's tolerance filter.
    """
    from nass_summary_spark.functions.parsing import epoch_micros

    on = list(on)
    payload = list(payload)

    row_struct = F.struct(*[F.col(c) for c in left.columns])
    pay_struct = F.struct(
        epoch_micros(F.col(right_time)).alias("__rt_us"),
        *[F.col(c) for c in payload],
    )
    pay_type = right.select(pay_struct.alias("__pay")).schema["__pay"].dataType

    l_tag = left.select(
        *on,
        F.col(left_time).alias("__t"),
        epoch_micros(F.col(left_time)).alias("__t_us"),
        F.lit(1).alias("__side"),
        row_struct.alias("__row"),
        F.lit(None).cast(pay_type).alias("__pay"),
    )
    row_type = l_tag.schema["__row"].dataType
    r_tag = right.select(
        *on,
        F.col(right_time).alias("__t"),
        epoch_micros(F.col(right_time)).alias("__t_us"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(row_type).alias("__row"),
        pay_struct.alias("__pay"),
    )

    unioned = l_tag.unionByName(r_tag)
    order = [F.col("__t").asc(), F.col("__side").asc()]
    w_back = (
        Window.partitionBy(*on).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*on).orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.withColumn(
        "__back", F.last("__pay", ignorenulls=True).over(w_back)
    ).withColumn("__fwd", F.first("__pay", ignorenulls=True).over(w_fwd))
    d_back = F.col("__t_us") - F.col("__back.__rt_us")  # >= 0
    d_fwd = F.col("__fwd.__rt_us") - F.col("__t_us")  # >= 0
    pick_back = F.col("__fwd").isNull() | (
        F.col("__back").isNotNull() & (d_back <= d_fwd)
    )
    chosen = F.when(pick_back, F.col("__back")).otherwise(F.col("__fwd"))
    probe = carried.where(F.col("__side") == 1).withColumn("__chosen", chosen)
    out_cols = [F.col("__row")[c].alias(c) for c in left.columns]
    out_cols += [F.col("__chosen")[c].alias(f"{c}{suffix}") for c in payload]
    out_cols.append(
        (F.col("__chosen.__rt_us") - F.col("__t_us")).alias("__nearest_dt_us")
    )
    return probe.select(*out_cols)
