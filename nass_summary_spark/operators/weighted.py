"""Fractional-weight rollup.

Reference: ``nass_cmz.sql`` — counties are split across climate
zones by area fraction; county statistics are re-aggregated to zones
as ``sum(value * fraction) having sum > 0``. The geometry
(PostGIS ``st_area``) produces the weight table; the relational part
is a weighted re-aggregation, which is what this operator provides.

Weight tables are tiny (one row per (child, parent) pair of a
geographic crosswalk) → always broadcast; the fact side aggregates
with map-side partials.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def fractional_weighted_rollup(
    facts: DataFrame,
    weights: DataFrame,
    child_key: str,
    parent_key: str,
    weight_col: str,
    keys: Sequence[str],
    values: Sequence[str],
    min_total: float | None = 0.0,
    cast_int: bool = False,
) -> DataFrame:
    """Reassign ``facts`` rows keyed by ``child_key`` to
    ``parent_key`` groups with fractional weights and sum.

    cast_int mirrors the reference's ``::integer`` output casts
    (nass_cmz.sql:22-24); ``min_total`` mirrors ``having sum>0``.
    """
    w = broadcast(weights.select(child_key, parent_key, weight_col))
    joined = facts.join(w, on=child_key, how="inner")
    aggs = []
    for v in values:
        expr = F.sum(F.col(v) * F.col(weight_col))
        if cast_int:
            expr = expr.cast("bigint")
        aggs.append(expr.alias(v))
    out = joined.groupBy(parent_key, *keys).agg(*aggs)
    if min_total is not None and values:
        out = out.where(F.col(values[-1]) > min_total)
    return out
