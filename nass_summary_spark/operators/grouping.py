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
