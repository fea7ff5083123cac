"""Hierarchical path rollup — the Spark-first replacement for the
reference's recursive CTEs.

Reference (`nass.sql:198-230` harvest_by_leaves, `nass.sql:322`
yield_by_leaves, `nass.sql:409` price_by_leaves): a RECURSIVE CTE
walks a commodity "subcommodity" array-path hierarchy bottom-up,
summing (or averaging) leaf statistics into every ancestor prefix.

Recursion is the wrong shape for Spark: each step would be a join +
shuffle, serialized on the driver. Because rolling up a value to all
ancestors of its path is equivalent to *emitting the value once per
path prefix* and grouping, we instead:

1. generate every prefix of the path array with built-in
   higher-order functions (``transform`` over ``sequence`` + ``slice``),
2. ``explode`` them (rows multiply by avg depth ≈ 2-4), and
3. run ONE ``groupBy`` — a single shuffle with map-side partial
   aggregation, whatever the hierarchy depth.

At 100 TB this is the difference between one exchange and
depth-many driver-coordinated exchanges.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def path_prefixes(path: Column | str, include_empty: bool = True, include_self: bool = True) -> Column:
    """All prefixes of an ``array<string>`` path.

    ``['A','B','C']`` → ``[[], ['A'], ['A','B'], ['A','B','C']]``
    (bounds controlled by the flags).
    """
    col = F.col(path) if isinstance(path, str) else path
    lo = 0 if include_empty else 1
    hi = F.size(col) if include_self else F.size(col) - 1
    return F.transform(
        F.sequence(F.lit(lo), F.greatest(hi, F.lit(lo - 1))),
        lambda n: F.slice(col, 1, n),
    )


def path_rollup(
    df: DataFrame,
    path_col: str,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    include_empty: bool = True,
    include_self: bool = True,
    prefix_out: str = "path",
) -> DataFrame:
    """Roll values up an array-path hierarchy in one shuffle.

    Parameters
    ----------
    aggs: output_name -> (agg_fn, input_col); agg_fn in
        {sum, avg, max, min, count}.
    prefix_out: name of the output prefix column (``array<string>``).

    Each input row contributes to every prefix of its ``path_col``;
    the result has one row per (keys, prefix).
    """
    exploded = df.select(
        *keys,
        F.explode(
            path_prefixes(path_col, include_empty=include_empty, include_self=include_self)
        ).alias(prefix_out),
        *[F.col(c).alias(c) for c in {src for _, src in aggs.values()} if c not in keys],
    )
    agg_exprs = [
        getattr(F, fn)(F.col(src)).alias(name) for name, (fn, src) in aggs.items()
    ]
    return exploded.groupBy(*keys, prefix_out).agg(*agg_exprs)


def leaf_rows(df: DataFrame, path_col: str, keys: Sequence[str]) -> DataFrame:
    """Rows whose path has no proper extension among the other rows
    of the same key group — the reference's leaf detection
    (`nass.sql:206-212`: anti-join against the set of parent prefixes).

    Implemented as a LEFT ANTI join of each row against the distinct
    set of *parent prefixes* observed in the data: a row is a leaf iff
    its exact path never appears as another row's parent.
    """
    parents = (
        df.select(
            *keys,
            F.explode(
                path_prefixes(path_col, include_empty=False, include_self=False)
            ).alias(path_col),
        )
        .distinct()
    )
    return df.join(parents, on=[*keys, path_col], how="left_anti")
