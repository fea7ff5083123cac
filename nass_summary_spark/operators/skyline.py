"""Skyline (Pareto frontier) query — the maximal-vector operator of
classic OLAP (Börzsönyi et al., ICDE 2001): all points not dominated
by any other point, where q dominates p iff q ≥ p in every dimension
and q > p in at least one.

The naive plan is a quadratic NOT EXISTS θ-anti-join — dead at
scale.  For the 2-D case (the overwhelmingly common one: price vs
quality, cost vs freshness, size vs score) the frontier has a
sweep-line structure that collapses to relational algebra:

1. per distinct x: the best y (one partial-agg shuffle);
2. over the DISTINCT-X relation, sorted x descending: the running
   best y of all strictly-higher x (one window — the relation is
   distinct-x sized, far smaller than the points);
3. a point survives iff its y equals its x-group's best AND beats
   the running best of every higher x (ties duplicate-safe: exactly
   equal points never dominate each other, so all copies of a
   frontier point survive).

The points table itself never sees a window — just the group-by and
one equi-join back on x.  The DuckDB oracle runs the quadratic
NOT EXISTS definition; exact agreement proves the sweep
decomposition complete and minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """All rows on the maximize-(x, y) Pareto frontier (duplicates of
    frontier points included).  Returns the input columns unchanged.
    """
    grp = df.groupBy(F.col(x_col).alias("__x")).agg(
        F.max(F.col(y_col)).alias("__maxy")
    )
    w = Window.orderBy(F.col("__x").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier_x = grp.select(
        "__x",
        "__maxy",
        F.max("__maxy").over(w).alias("__best_higher"),
    ).where(
        F.col("__best_higher").isNull() | (F.col("__maxy") > F.col("__best_higher"))
    )
    # no broadcast hint: the frontier relation is usually tiny (AQE
    # broadcasts it), but it is worst-case distinct-x sized, so the
    # plan must be allowed to fall back to a shuffle join
    return (
        df.join(
            frontier_x,
            (F.col(x_col) == F.col("__x")) & (F.col(y_col) == F.col("__maxy")),
        )
        .drop("__x", "__maxy", "__best_higher")
    )
