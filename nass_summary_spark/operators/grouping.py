"""Multi-grain summaries in one pass: ROLLUP / CUBE / GROUPING SETS.

The reference computes each summary grain as its own view — county,
ag-district, and state totals are separate scans reconciled by
location-code prefixes (nass.sql:110-113 location coding;
commodity_harvest vs commodity_county_yield export one grain each).
The Spark-first consolidation is a single pass that emits every grain
from one scan with ONE shuffle: ``rollup``/``cube``/``groupingSets``
expand each input row to its grouping-set combinations map-side and
feed one hash aggregate, so adding a grain costs row-expansion, not
another scan of a 100 TB fact table.

``grouping(col)`` flags disambiguate "NULL because subtotal" from
"NULL in the data" — the same problem the reference solves with
sentinel location codes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _grain(df: DataFrame, dims: Sequence[str], mode: str, sets: Sequence[Sequence[str]] | None):
    if mode == "rollup":
        return df.rollup(*dims)
    if mode == "cube":
        return df.cube(*dims)
    if mode == "grouping_sets":
        if sets is None:
            raise ValueError("grouping_sets mode requires `sets`")
        return df.groupingSets([list(s) for s in sets], *[F.col(d) for d in dims])
    raise ValueError(f"unknown mode {mode!r}")


def multi_grain_summary(
    df: DataFrame,
    dims: Sequence[str],
    aggs: Sequence[Column],
    mode: str = "rollup",
    sets: Sequence[Sequence[str]] | None = None,
    flag_prefix: str = "g_",
) -> DataFrame:
    """Aggregate ``df`` at every grain of ``dims`` in one shuffle.

    ``mode``: ``rollup`` (telescoping prefixes — the reference's
    county→district→state ladder), ``cube`` (all subsets), or
    ``grouping_sets`` with an explicit ``sets`` list. Adds an integer
    ``g_<dim>`` flag per dimension (1 = aggregated over, 0 = grouped
    by) so downstream consumers never confuse subtotal NULLs with
    data NULLs.
    """
    dims = list(dims)
    grouped = _grain(df, dims, mode, sets)
    flags = [F.grouping(d).cast("int").alias(f"{flag_prefix}{d}") for d in dims]
    return grouped.agg(*flags, *list(aggs))


def time_gapfill_hourly(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Time-series densification (gap-fill): hourly aggregates per
    group with MISSING HOURS MATERIALIZED as zero rows across the
    global [min, max] hour range — so downstream moving averages /
    rate charts see a dense grid, not silent holes.

    Scale shape: the aggregate is the only data-sized shuffle; the
    fill grid is (distinct groups) × (hour range) built from a
    broadcast 1-row bounds aggregate + `sequence`/`explode` — never
    proportional to the event count — and joined LEFT against the
    aggregate on (group, hour).
    """
    hourly = (
        df.groupBy(F.col(group_col), F.date_trunc("hour", F.col(ts_col)).alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )
    bounds = hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    groups = hourly.select(group_col).distinct()
    grid = groups.crossJoin(F.broadcast(bounds)).select(
        F.col(group_col),
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
        ).alias("h"),
    )
    return grid.join(hourly, [group_col, "h"], "left").select(
        F.col(group_col),
        F.col("h").alias("hour"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
    )
