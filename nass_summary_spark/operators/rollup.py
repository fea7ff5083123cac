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
    # guard: Spark's sequence(lo, hi) runs DESCENDING when hi < lo,
    # which would fabricate bogus prefixes for short paths
    return F.when(
        hi >= F.lit(lo),
        F.transform(F.sequence(F.lit(lo), hi), lambda n: F.slice(col, 1, n)),
    ).otherwise(F.array().cast("array<array<string>>"))


def path_rollup(
    df: DataFrame,
    path_col: str,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    include_empty: bool = True,
    include_self: bool = True,
    prefix_out: str = "path",
    string_sep: str | None = None,
    max_depth: int | None = None,
) -> DataFrame:
    """Roll values up an array-path hierarchy in one shuffle.

    Parameters
    ----------
    aggs: output_name -> (agg_fn, input_col); agg_fn in
        {sum, avg, max, min, count}.
    prefix_out: name of the output prefix column (``array<string>``,
        or joined string when ``string_sep`` is set).
    string_sep: when set, prefixes are emitted as ``sep``-joined
        STRINGS before the shuffle. Grouping/shuffling on strings is
        markedly cheaper than on arrays (~3.5× on the hash aggregate
        in local measurements) — prefer it unless downstream joins
        need the array form.
    max_depth: when the hierarchy depth is bounded and ``string_sep``
        is set, prefix strings are built from plain ``slice`` +
        ``concat_ws`` expressions — whole-stage-codegen instead of
        interpreted lambdas (another ~3× on the explode stage).
        Paths longer than max_depth contribute only their first
        max_depth prefixes.

    Each input row contributes to every prefix of its ``path_col``;
    the result has one row per (keys, prefix).
    """
    col = F.col(path_col)
    if string_sep is not None and max_depth is not None and include_self:
        lo = 0 if include_empty else 1
        all_prefixes = F.array(
            *[F.concat_ws(string_sep, F.slice(col, 1, i)) for i in range(lo, max_depth + 1)]
        )
        prefixes = F.slice(all_prefixes, 1, F.size(col) + (1 - lo))
    else:
        prefixes = path_prefixes(
            path_col, include_empty=include_empty, include_self=include_self
        )
        if string_sep is not None:
            # lambda touches only its own variable — stays linear
            prefixes = F.transform(prefixes, lambda p: F.array_join(p, string_sep))
    exploded = df.select(
        *keys,
        F.explode(prefixes).alias(prefix_out),
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
                path_prefixes(path_col, include_empty=True, include_self=False)
            ).alias(path_col),
        )
        .distinct()
    )
    return df.join(parents, on=[*keys, path_col], how="left_anti")


def tree_rollup_avg(
    df: DataFrame,
    path_col: str,
    keys: Sequence[str],
    values: Sequence[str],
    max_depth: int | None = None,
) -> DataFrame:
    """Average-of-averages tree rollup (yield_by_leaves
    `nass.sql:322`, price_by_leaves `nass.sql:409` semantics): a
    parent's value is the AVERAGE of its direct children, evaluated
    level-synchronously from the deepest leaves upward.

    Pass LEAF rows only (see :func:`leaf_rows`) — the reference's
    recursion likewise seeds from leaves; reported non-leaf rows are
    reconciled later by the total_and_sum coalesce merge.

    (The reference's recursive CTE has iteration-order artifacts for
    mixed-depth trees; we implement the clean level-synchronous
    semantics: nodes at depth d = leaf rows at depth d unioned
    with the average of the derived depth-(d+1) nodes per parent.)

    Unlike sum-rollups this is inherently level-ordered, but the
    depth of real taxonomies is tiny (≤ 5 for NASS commodities), so
    the loop is bounded and each level is one narrow aggregation.
    ``max_depth`` defaults to one driver-side scalar lookup.
    """
    if max_depth is None:
        max_depth = (
            df.select(F.max(F.size(F.col(path_col))).alias("d")).collect()[0]["d"] or 0
        )
    keys = list(keys)
    avgs = [F.avg(F.col(v)).alias(v) for v in values]
    level = df.where(F.size(F.col(path_col)) == max_depth).select(
        *keys, path_col, *values
    )
    out = level
    for depth in range(max_depth - 1, -1, -1):
        parents = (
            level.withColumn(path_col, F.slice(F.col(path_col), 1, depth))
            .groupBy(*keys, path_col)
            .agg(*avgs)
        )
        explicit = df.where(F.size(F.col(path_col)) == depth).select(
            *keys, path_col, *values
        )
        # a node reported explicitly AND derivable from children
        # contributes both rows, averaged in the final regroup —
        # mirroring the reference's closing GROUP BY ... avg()
        level = parents.unionByName(explicit)
        out = out.unionByName(level)
    return out.groupBy(*keys, path_col).agg(*avgs)


def tree_rollup_pg(
    df: DataFrame,
    path_col: str,
    keys: Sequence[str],
    values: Sequence[str],
    agg: str = "avg",
    carry: Sequence[str] = (),
    max_depth: int | None = None,
) -> DataFrame:
    """EXACT replay of the reference's recursive-CTE rollup
    (yield_by_leaves nass.sql:322, price_by_leaves nass.sql:409,
    harvest_by_leaves nass.sql:198) — PostgreSQL evaluation
    semantics included.

    PG evaluates ``WITH RECURSIVE ... UNION`` iteratively: each step
    sees only the rows ADDED by the previous step, and UNION drops
    rows identical to any already-emitted row. For mixed-depth trees
    this is NOT the level-synchronous average: a parent receives one
    derived row per *generation* of children (all leaves are
    generation 0 wherever they sit in the tree), each row holding
    the aggregate over that generation cohort only, and the closing
    ``GROUP BY`` then aggregates across the cohort rows. E.g. HAY
    with direct leaves ALFALFA/SMALL GRAIN/WILD and a deeper leaf
    TAME→(EXCL …): cohort 1 yields avg(7.3, 3.0, 1.6) = 3.97,
    cohort 2 yields 4.7, published value = avg(3.97, 4.7) = 4.33 —
    not the single-level avg 4.15. The reference's shipped CSV
    exports encode these semantics, so parity requires replaying
    them (verified to 100% against commodity_yield.csv in
    tests/test_nass_pipeline.py).

    ``tree_rollup_avg`` remains the *clean* level-synchronous
    alternative for new pipelines.

    ``carry`` columns ride along from child to parent row WITHOUT
    joining the aggregation partition — replaying harvest_by_leaves,
    whose window (nass.sql:221-222) partitions only by
    (commodity, location, year, parent-path) while ``unit`` is
    carried: sums legitimately cross units exactly like the
    reference. The closing group includes carry columns.

    Each generation is one window + distinct + anti-join (bounded by
    path depth ≤ 5); rollup frontiers are tiny relative to the fact
    data, and the null-safe anti-join replays UNION's NULLs-equal
    dedup.
    """
    if agg not in ("avg", "sum"):
        raise ValueError(f"agg must be avg or sum, got {agg!r}")
    agg_fn = F.avg if agg == "avg" else F.sum
    keys = list(keys)
    carry = list(carry)
    cols = [*keys, path_col, *carry, *values]

    if max_depth is None:
        max_depth = (
            df.select(F.max(F.size(F.col(path_col))).alias("d")).collect()[0]["d"]
            or 0
        )

    # base term: UNION dedups the seed rows too
    seen = df.select(*cols).dropDuplicates()
    working = seen

    from pyspark.sql import Window

    for _ in range(max_depth):
        wp = working.where(F.size(F.col(path_col)) > 0).withColumn(
            path_col, F.slice(F.col(path_col), 1, F.size(F.col(path_col)) - 1)
        )
        w = Window.partitionBy(*keys, path_col)
        gen = wp.select(
            *keys,
            path_col,
            *carry,
            *[agg_fn(F.col(v)).over(w).alias(v) for v in values],
        ).dropDuplicates()
        # UNION semantics: drop rows already emitted (NULLs compare
        # equal). gen derives from seen, so alias both sides to keep
        # the self-join unambiguous.
        g, s = gen.alias("__g"), seen.alias("__s")
        cond = None
        for c in cols:
            eq = F.col(f"__g.{c}").eqNullSafe(F.col(f"__s.{c}"))
            cond = eq if cond is None else (cond & eq)
        new = g.join(s, on=cond, how="left_anti")
        # eager localCheckpoint: the anti-join + union reference
        # `seen` twice per generation, so the logical plan would
        # otherwise double each round (see connected_components —
        # same idiom, same 1g-driver OOM failure mode)
        seen = seen.unionByName(new).localCheckpoint()
        working = new

    return seen.groupBy(*keys, path_col, *carry).agg(
        *[agg_fn(F.col(v)).alias(v) for v in values]
    )
