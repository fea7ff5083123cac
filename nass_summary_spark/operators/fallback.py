"""Multi-grain fallback join.

Reference: ``commodity_county_yield`` (nass.sql:466-533) and
``swap.harvest_yield`` (swap.sql:139-169) look a statistic up at the
finest grain (county), fall back to ag-district, then state —
``coalesce`` across three LEFT JOINs.

Spark-first: each grain table is an aggregate over the fact data —
dimension-sized — so every join side is broadcast; the fact table
never shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def multilevel_fallback(
    base: DataFrame,
    levels: Sequence[tuple[DataFrame, Sequence[str], str]],
    out_col: str,
    keep_levels: bool = True,
    broadcast_levels: bool = True,
) -> DataFrame:
    """LEFT JOIN ``base`` against each (lookup_df, join_keys,
    value_col) in priority order; ``out_col`` = first non-null.

    Each lookup's value column must be uniquely named (they become
    the audit columns, like the reference's county_yield / ad_yield /
    st_yield).
    """
    out = base
    names: list[str] = []
    for lookup, keys, value_col in levels:
        side = lookup.select(*keys, value_col)
        if broadcast_levels:
            side = broadcast(side)
        out = out.join(side, on=list(keys), how="left")
        names.append(value_col)
    out = out.withColumn(out_col, F.coalesce(*[F.col(n) for n in names]))
    if not keep_levels:
        out = out.drop(*names)
    return out
