"""Grouped statistical summaries (SURVEY.md §2 B26).

The reference closes its pipeline with an R analysis layer
(`src/budget.r`) — means, spreads, and cross-variable relationships
over the summary tables. The Spark-first twin: per-group mean /
sample stddev / Pearson correlation computed from EXACT decimal
power sums (Σx, Σx², Σy, Σy², Σxy) in one partial-aggregated
shuffle, surfaced through double arithmetic only at the end.

Why power sums instead of the built-in ``stddev``/``corr``: the
built-ins use streaming (Welford-style) updates whose float results
are partition-order dependent — fine for analysis, fatal for a
cross-engine value-hash oracle. Decimal sums are exact and
order-independent, and the closing double formula is evaluated
identically by any IEEE-754 engine, so Spark and DuckDB agree
bit-for-bit. Same one-shuffle cost as the built-ins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Operand width: products of two DECIMAL(18,4) are DECIMAL(37,8) —
#: exact and inside the 38-digit cap on BOTH engines (38,4 operands
#: would overflow DuckDB and trip Spark's precision-loss clamp).
_WIDE = "decimal(18,4)"


def grouped_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group n, mean(x), sample stddev(x), and corr(x, y).

    Output columns: ``n, mean_x, stddev_x, corr_xy`` (rounded).
    Groups with a single row get null stddev; zero-variance groups
    get null corr — matching SQL semantics on both engines.
    """
    x = F.col(x_col).cast(_WIDE)
    y = F.col(y_col).cast(_WIDE)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("__sx"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y).alias("__sy"),
        F.sum(y * y).alias("__syy"),
        F.sum(x * y).alias("__sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    sy = F.col("__sy").cast("double")
    syy = F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    cov = n * sxy - sx * sy
    return agg.select(
        *group_cols,
        "n",
        F.round(sx / n, round_to).alias("mean_x"),
        F.round(
            F.when(F.col("n") > 1, F.sqrt(var_x / (n * (n - F.lit(1.0))))),
            round_to,
        ).alias("stddev_x"),
        F.round(
            F.when(
                (var_x > 0) & (var_y > 0), cov / F.sqrt(var_x * var_y)
            ),
            round_to,
        ).alias("corr_xy"),
    )
