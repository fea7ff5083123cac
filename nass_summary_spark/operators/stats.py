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

from pyspark.sql import DataFrame, Window
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


def data_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Column-level data profiling in ONE aggregate pass: null count,
    approx-exact distinct count, min/max (as strings for a uniform
    schema) per column — the pre-ingest sanity report every pipeline
    run wants (the reference eyeballs the same via ad-hoc SQL).

    All per-column stats are computed in a single global aggregate
    (no per-column scans); the one-row result is exploded to a row
    per column. COUNT(DISTINCT) over many columns expands to Spark's
    expand-node partial-distinct plan — still one scan.
    """
    cols = columns or [f.name for f in df.schema.fields]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias(f"__nul_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__dis_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    one = df.agg(*aggs)
    per_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col("__n").alias("n_rows"),
                    F.col(f"__nul_{c}").alias("n_null"),
                    F.col(f"__dis_{c}").alias("n_distinct"),
                    F.col(f"__min_{c}").alias("min_value"),
                    F.col(f"__max_{c}").alias("max_value"),
                )
                for c in cols
            ]
        )
    ).alias("p")
    return one.select(per_col).select(
        "p.column", "p.n_rows", "p.n_null", "p.n_distinct", "p.min_value", "p.max_value"
    )


def sequence_gaps(
    df: DataFrame, seq_col: str, group_col: str | None = None
) -> DataFrame:
    """Missing-id detection over a dense sequence column: one sorted
    window pass emits (gap_start, gap_end, n_missing) for every hole —
    the ingest-completeness check for event/CDC feeds (did a loader
    drop a chunk?). One shuffle (by group, or single-partition for a
    global sequence — at scale pass a group/shard column)."""
    from pyspark.sql import Window

    w = (Window.partitionBy(group_col) if group_col else Window.partitionBy()).orderBy(seq_col)
    prev = F.lag(F.col(seq_col)).over(w)
    # stage the lag ONCE — re-deriving it after the filter would lag
    # over the filtered rows and misreport gap bounds
    staged = df.select(
        F.col(seq_col), *([F.col(group_col)] if group_col else [])
    ).withColumn("__prev", prev)
    out_cols = ([F.col(group_col)] if group_col else []) + [
        (F.col("__prev") + 1).cast("bigint").alias("gap_start"),
        (F.col(seq_col) - 1).cast("bigint").alias("gap_end"),
        (F.col(seq_col) - F.col("__prev") - 1).cast("bigint").alias("n_missing"),
    ]
    return staged.where(
        F.col("__prev").isNotNull() & (F.col(seq_col) - F.col("__prev") > 1)
    ).select(*out_cols)


def _join_group_totals(
    cum: DataFrame, tot: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Broadcast-join the per-group totals back onto the cumulative
    relation with NULL-SAFE key equality, so NULL-keyed groups (which
    ``groupBy`` emits as their own group) survive the join instead of
    silently vanishing — the groupBy-parity contract ADVICE r6 asked
    for.  The totals' key copies are renamed before the join so the
    self-derived lineage can't make column resolution ambiguous."""
    keys = list(keys)
    if not keys:
        return cum.crossJoin(F.broadcast(tot))
    renamed = tot.select(
        *[F.col(k).alias(f"__tk{i}") for i, k in enumerate(keys)],
        *[c for c in tot.columns if c not in keys],
    )
    cond = F.lit(True)
    for i, k in enumerate(keys):
        cond = cond & F.col(k).eqNullSafe(F.col(f"__tk{i}"))
    return cum.join(F.broadcast(renamed), cond).drop(
        *[f"__tk{i}" for i in range(len(keys))]
    )


def weighted_median(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    weight_col: str,
    out_col: str = "wmedian",
) -> DataFrame:
    """Exact per-group weighted median (lower weighted median): the
    smallest value whose running weight reaches half the group total.

    One shuffle on the group keys; the cumulative-weight window rides
    the same partitioning (sort within partition, no second
    exchange).  Weights accumulate as DECIMAL so the half-total
    comparison (``2·cumw ≥ total``) is exact integer-style
    arithmetic, partition-order independent, and identical on any
    engine — the same order-independence discipline as
    :func:`grouped_stats`.

    This is the robust complement of the reference's avg-based price
    summaries (``price_by_leaves`` nass.sql:409): a quantity-weighted
    median price is insensitive to the suppressed-value tails the
    reference filters with regexes.

    NULL-keyed groups are preserved (null-safe totals join), matching
    plain ``groupBy`` semantics.
    """
    from pyspark.sql import Window

    keys = list(keys)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wd = F.col(weight_col).cast(_WIDE)
    cum = df.select(
        *keys,
        F.col(value_col).alias("__v"),
        wd.alias("__w"),
    ).withColumn("__cumw", F.sum("__w").over(w))
    tot = cum.groupBy(*keys).agg(F.sum("__w").alias("__tot"))
    return (
        _join_group_totals(cum, tot, keys)
        .where(F.col("__cumw") * 2 >= F.col("__tot"))
        .groupBy(*keys)
        .agg(F.min("__v").cast("double").alias(out_col))
    )


def weighted_percentiles(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    weight_col: str,
    ps: Sequence[int] = (25, 50, 75, 95),
    round_dp: int = 6,
) -> DataFrame:
    """Exact per-group WEIGHTED percentiles (lower weighted
    percentile): for each integer rank p in ``ps``, the smallest
    value whose running weight reaches p% of the group's total
    weight — the weighted twin of A22's ``percentile_summary`` and
    the distribution the reference's acreage-weighted analyses
    (``budget.r``) summarize with means.

    Same discipline as :func:`weighted_median` (which is the p=50
    special case): ONE shuffle on the group keys, the cumulative-
    weight window and both aggregates ride the same partitioning,
    and the threshold test ``100·cumw ≥ p·total`` stays in exact
    DECIMAL arithmetic (p integer), so the result is partition- and
    tie-order independent and identical on any engine. All ``ps``
    come out of one pass as pivoted ``p{N}`` columns (driver-friendly
    scalar schema).  NULL-keyed groups are preserved (null-safe
    totals join), matching plain ``groupBy`` semantics.
    """
    keys = list(keys)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wd = F.col(weight_col).cast(_WIDE)
    cum = df.select(
        *keys,
        F.col(value_col).cast("double").alias("__v"),
        wd.alias("__w"),
    ).withColumn("__cumw", F.sum("__w").over(w))
    tot = cum.groupBy(*keys).agg(F.sum("__w").alias("__tot"))
    staged = _join_group_totals(cum, tot, keys)
    aggs = [
        F.round(
            F.min(
                F.when(
                    F.col("__cumw") * 100 >= F.lit(int(p)) * F.col("__tot"),
                    F.col("__v"),
                )
            ),
            round_dp,
        ).alias(f"p{int(p)}")
        for p in ps
    ]
    return staged.groupBy(*keys).agg(*aggs)


def mad_outliers(
    df: DataFrame,
    keys: Sequence[str],
    id_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outliers: |value − median| > k · MAD, where
    MAD is the (lower) median absolute deviation.  The robust twin of
    ``zscore_outliers`` — a single wild value cannot shift the
    median/MAD the way it shifts mean/stddev, so curation thresholds
    survive corrupted slices.

    Three group-key shuffles total (median, MAD, final filter-join);
    group medians are group-sized relations broadcast back onto the
    facts, so the fact table itself never shuffles un-aggregated —
    the same posture as ``zscore_outliers``.  Both medians are the
    deterministic lower median (:func:`weighted_median` with unit
    weights), and every derived quantity is IEEE double arithmetic
    identical across engines: no rounding needed for the oracle.

    Returns the outlier rows: (*keys, id, value, med, mad).
    """
    keys = list(keys)
    base = df.select(
        *keys, F.col(id_col), F.col(value_col).cast("double").alias("__val")
    ).withColumn("__one", F.lit(1.0))
    med = weighted_median(base, keys, "__val", "__one", out_col="med")
    dev = base.join(F.broadcast(med), keys).withColumn(
        "__adev", F.abs(F.col("__val") - F.col("med"))
    )
    mad = weighted_median(dev, keys, "__adev", "__one", out_col="mad")
    return (
        dev.join(F.broadcast(mad), keys)
        .where(F.abs(F.col("__val") - F.col("med")) > F.lit(k) * F.col("mad"))
        .select(*keys, id_col, F.col("__val").alias(value_col), "med", "mad")
    )


def trend_slopes(
    df: DataFrame,
    keys: Sequence[str],
    x_col,
    y_col,
    round_dp: int = 8,
) -> DataFrame:
    """Per-group OLS slope + intercept of y over x in ONE partially-
    aggregated shuffle — the regression twin of :func:`grouped_stats`
    (budget.r's trend analyses over the NASS summaries).

    Same FP discipline: the five power sums accumulate as exact
    DECIMAL (order-independent; callers pass x pre-scaled to a
    small-integer domain, e.g. hours, so x² sums stay inside the
    38-digit cap), and the closing slope/intercept formula is double
    arithmetic any IEEE engine evaluates identically; rounding only
    soaks the final-division ULP.  Groups with zero x-variance yield
    null slope.  Output: (*keys, n, slope, intercept).
    """
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast(_WIDE)
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast(_WIDE)
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(x * y).alias("__sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    sxy = F.col("__sxy").cast("double")
    den = n * sxx - sx * sx
    slope = F.when(den != 0, (n * sxy - sx * sy) / den)
    return agg.select(
        *keys,
        "n",
        F.round(slope, round_dp).alias("slope"),
        F.round((sy - slope * sx) / n, round_dp).alias("intercept"),
    )


def theilsen_slopes(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col,
    round_dp: int = 8,
) -> DataFrame:
    """Per-group Theil-Sen robust trend: the MEDIAN of pairwise
    slopes (y_j - y_i)/(x_j - x_i) over all i < j — the standard
    outlier-resistant alternative to :func:`trend_slopes`' OLS (a
    single corrupted point moves OLS arbitrarily; Theil-Sen has a
    29% breakdown point).

    Scale contract: the caller collapses the series to a BOUNDED x
    domain FIRST (e.g. daily means), so the pairwise expansion is
    quadratic in the domain size (days), never in row count — the
    same device that keeps B91's rank arithmetic off the fact
    stream. Input here is the pre-collapsed (keys, x, ybar) series;
    the pair join is an equi-join on the group keys with an x_i<x_j
    filter, and the median is Spark's exact interpolating
    ``percentile`` over each group's bounded slope set.

    FP discipline: callers produce ybar via exact DECIMAL sums
    divided as double (order-independent), every pairwise slope is
    one IEEE division both engines evaluate identically, and the
    interpolating median (sort + midpoint) is replayed by DuckDB's
    ``quantile_cont``; ROUND soaks the final ulp.
    Output: (*keys, n_points, n_pairs, theil_sen_slope).
    """
    a = df.select(
        *keys, F.col(x_col).alias("__xa"),
        (F.col(y_col) if isinstance(y_col, str) else y_col).alias("__ya"),
    )
    b = df.select(
        *keys, F.col(x_col).alias("__xb"),
        (F.col(y_col) if isinstance(y_col, str) else y_col).alias("__yb"),
    )
    pairs = a.join(b, list(keys)).where(F.col("__xa") < F.col("__xb"))
    slope = (F.col("__yb") - F.col("__ya")) / (
        (F.col("__xb") - F.col("__xa")).cast("double")
    )
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_points"))
    med = pairs.select(*keys, slope.alias("__s")).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.percentile("__s", F.lit(0.5)), round_dp).alias(
            "theil_sen_slope"
        ),
    )
    return counts.join(med, list(keys), "left")


def ewma_smooth(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    val_col: str,
    alpha: float = 0.2,
    round_dp: int = 6,
) -> DataFrame:
    """Per-key exponentially-weighted moving average over the
    time-ordered series: ``y_1 = x_1``, ``y_t = (1−α)·y_{t−1} + α·x_t``
    — the smoothing the yearly NASS summaries do by hand with lag
    windows, and the standard telemetry/metric-drift smoother.

    Emitted per ROW: (keys, ts, value, ewma).  Evaluation is the
    LINEAR-TIME recursion itself, vectorized per key by pandas'
    ``ewm(alpha, adjust=False).mean()`` inside an Arrow-batched
    ``applyInPandas`` — C-speed, O(n) per series (an earlier nested
    -HOF closed form was O(n²) and 6× slower at sf0.1).  The oracle
    replays the mathematically-identical CLOSED FORM
    ``y_i = (1−α)^i·x_0 + α·Σ_{j≤i} (1−α)^{i−j}·x_j`` with a
    triangular self-join; agreement at ``round_dp`` certifies both
    (recursion vs closed form differ only by ~1e-13 relative float
    noise, far inside the rounding).

    Scale contract: one shuffle (groupBy key); a key's series is
    processed by one task — per-key series length must be bounded
    (telemetry keys, station series, per-entity histories; aggregate
    to a coarser grain first, as the demo does with hours).
    """
    import pandas as pd  # noqa: F401 — applyInPandas body below

    from pyspark.sql.types import DoubleType, StructField, StructType

    a = float(alpha)
    staged = df.select(
        *key_cols, F.col(ts_col), F.col(val_col).cast("double").alias("__x")
    )
    fields = [staged.schema[c] for c in key_cols] + [
        staged.schema[ts_col],
        StructField(val_col, DoubleType()),
        StructField("ewma", DoubleType()),
    ]
    schema = StructType(fields)
    keys = list(key_cols)

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":  # noqa: F821
        pdf = pdf.sort_values([ts_col, "__x"], ignore_index=True)
        ew = pdf["__x"].ewm(alpha=a, adjust=False).mean().round(round_dp)
        out = pdf[keys + [ts_col]].copy()
        out[val_col] = pdf["__x"]
        out["ewma"] = ew
        return out

    return staged.groupBy(*keys).applyInPandas(fold, schema)


def winsorized_stats(
    df: DataFrame,
    group_cols: list[str],
    val_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group winsorized summary: clamp values to the group's
    [lower, upper] exact percentiles (linear interpolation — the
    `percentile`/`quantile_cont` semantics A22 pinned across
    engines), then report n and the winsorized mean — the robust
    summary survey statisticians use before publishing means of
    heavy-tailed reported values.  Two partial-agg shuffles (the
    percentile pass and the mean pass); the percentile relation is
    group-cardinality-sized and broadcasts back.

    NULL values are excluded from the population entirely: ``n``
    counts non-null values only, so it is exactly the denominator of
    ``winsorized_mean`` (``AVG`` skips NULLs — counting all rows
    would report an ``n`` the mean doesn't summarize, and NULLs
    passing through the clamp as NULL are not winsorized anything).
    Groups that are all-NULL disappear (the percentile pass has no
    rows to rank).
    """
    df = df.where(F.col(val_col).isNotNull())
    pct = df.groupBy(*group_cols).agg(
        F.percentile(F.col(val_col), F.lit(lower)).alias("__lo"),
        F.percentile(F.col(val_col), F.lit(upper)).alias("__hi"),
    )
    clamped = df.join(F.broadcast(pct), group_cols).withColumn(
        "__w",
        F.least(F.greatest(F.col(val_col).cast("double"), F.col("__lo")), F.col("__hi")),
    )
    return clamped.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("__w"), round_dp).alias("winsorized_mean"),
        F.round(F.first("__lo"), round_dp).alias("p_lower"),
        F.round(F.first("__hi"), round_dp).alias("p_upper"),
    )


def impute_by_group(
    df: DataFrame,
    group_cols: list[str],
    val_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Fill NULLs in ``val_col`` with the group's exact median
    (interpolated percentile 0.5 over the non-null values) — the
    standard robust imputation for survey/telemetry gaps.  One
    group-cardinality aggregation broadcast back; the fact table
    never shuffles.  Adds ``imputed`` (bool)."""
    out_col = out_col or val_col
    med = df.where(F.col(val_col).isNotNull()).groupBy(*group_cols).agg(
        F.percentile(F.col(val_col), F.lit(0.5)).alias("__med")
    )
    return (
        df.join(F.broadcast(med), group_cols, "left")
        .withColumn("imputed", F.col(val_col).isNull())
        .withColumn(out_col, F.coalesce(F.col(val_col).cast("double"), F.col("__med")))
        .drop("__med")
    )


#: Benford first-digit probabilities log10(1 + 1/d), precomputed as
#: PYTHON literals so Spark and the oracle share the exact constants
#: (no cross-engine libm log10 in the hot expression).
BENFORD_P = {
    d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)
}


def benford_deviation(
    df: DataFrame,
    group_cols: list[str],
    val_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """First-significant-digit distribution per group vs Benford's
    law — the classic reported-number audit (survey values, expense
    figures): fabricated or unit-coerced numbers jump out as digit
    skew.  The digit is taken from the DECIMAL STRING of the value
    truncated to BIGINT (portable across engines, no log10 edge
    cases); output is one row per (group, digit) with observed
    count/share, the Benford expectation, and the signed deviation.
    One partial-agg shuffle; Benford constants are Python literals
    shared with the oracle."""
    # floor BEFORE the bigint cast: engines disagree on DECIMAL→BIGINT
    # (Spark truncates, DuckDB rounds); floor is unambiguous in both
    digit = F.substring(
        F.floor(F.col(val_col)).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    staged = df.where(F.floor(F.col(val_col)).cast("bigint") > 0).select(
        *group_cols, digit.alias("digit")
    )
    counts = staged.groupBy(*group_cols, "digit").agg(
        F.count(F.lit(1)).alias("n_digit")
    )
    totals = counts.groupBy(*group_cols).agg(F.sum("n_digit").alias("__tot"))
    bp = F.create_map(
        *[x for d, p in BENFORD_P.items() for x in (F.lit(d), F.lit(p))]
    )
    return (
        counts.join(F.broadcast(totals), group_cols)
        .select(
            *group_cols,
            "digit",
            "n_digit",
            F.round(F.col("n_digit") / F.col("__tot"), round_dp).alias("obs_share"),
            F.round(bp[F.col("digit")], round_dp).alias("benford_p"),
            F.round(
                F.col("n_digit") / F.col("__tot") - bp[F.col("digit")], round_dp
            ).alias("deviation"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    val_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Per-key time-weighted average (TWAP): each observation holds
    until the next one, so the mean weights every value by its
    holding duration — the correct average for irregularly-sampled
    telemetry (the row-mean over-weights bursts).  One window (lead
    event time, riding the key shuffle) + one aggregation; products
    accumulate in DECIMAL so the sum is exact and order-independent
    (engine-portable), with the single double division at the end.
    The last observation per key has no duration and drops out, so
    keys need ≥ 2 observations to appear.
    """
    from nass_summary_spark.functions.parsing import epoch_micros

    us = epoch_micros(F.col(ts_col))
    staged = df.select(
        *key_cols,
        us.alias("__us"),
        F.col(val_col).cast("decimal(18,4)").alias("__v"),
    ).withColumn(
        "__dur",
        F.lead("__us").over(
            Window.partitionBy(*key_cols).orderBy("__us", "__v")
        )
        - F.col("__us"),
    )
    return (
        staged.where(F.col("__dur").isNotNull())
        .groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.round(
                F.sum(
                    F.col("__v") * F.col("__dur").cast("decimal(18,0)")
                ).cast("double")
                / F.sum(F.col("__dur")).cast("double"),
                round_dp,
            ).alias("twap"),
        )
    )


def interval_merge(
    df: DataFrame,
    key_cols: list[str],
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """Merge overlapping/touching half-open intervals per key into
    maximal disjoint spans — the gaps-and-islands coalesce every
    coverage question needs (machine uptime windows, sensor coverage,
    date-range consolidation; the interval twin of
    :func:`dedup.duplicated_spans`' island merge).

    ONE key-partitioned window pass: an island starts where the lo
    exceeds the running max of all PRIOR his; the island ordinal is
    a running sum of those starts; min/max per (key, island) emits
    the merged span.  Empty intervals (lo >= hi) are dropped.
    Returns key cols + (span_lo, span_hi, n_intervals).
    """
    w_order = Window.partitionBy(*key_cols).orderBy(
        F.col(lo_col).asc(), F.col(hi_col).asc()
    )
    prior_max = F.max(F.col(hi_col)).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = (
        df.where(F.col(lo_col) < F.col(hi_col))
        .withColumn(
            "__new_island",
            (prior_max.isNull() | (F.col(lo_col) > prior_max)).cast("int"),
        )
        .withColumn(
            "__island",
            F.sum("__new_island").over(
                w_order.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        staged.groupBy(*key_cols, "__island")
        .agg(
            F.min(lo_col).alias("span_lo"),
            F.max(hi_col).alias("span_hi"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .drop("__island")
    )


def cumulative_uniques(
    events: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Daily active / new / cumulative-unique key counts — the
    DAU-and-reach report.  Cumulative COUNT DISTINCT has no window
    form; the standard decomposition: a key is NEW on its first
    active day (one per-key min), daily news then cumulative-sum
    over the day axis (day-cardinality relation — tiny).  Two
    partial-agg passes + one day-ordered window; the event table
    never sees a window.  Returns (day, active, new_keys, cum_keys).
    """
    day = F.date_trunc("day", F.col(ts_col))
    per_day = (
        events.select(F.col(key_col).alias("k"), day.alias("day")).distinct()
    )
    firsts = per_day.groupBy("k").agg(F.min("day").alias("first_day"))
    daily = per_day.groupBy("day").agg(F.count(F.lit(1)).alias("active"))
    news = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_keys")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.join(news, "day", "left")
        .withColumn("new_keys", F.coalesce("new_keys", F.lit(0)).cast("bigint"))
        .withColumn("cum_keys", F.sum("new_keys").over(w).cast("bigint"))
        .select("day", F.col("active").cast("bigint").alias("active"),
                "new_keys", "cum_keys")
    )


def group_mode(
    df: DataFrame,
    group_cols: list[str],
    val_col: str,
) -> DataFrame:
    """Deterministic per-group MODE: the most frequent value, ties
    broken by the smallest value — unlike the built-in ``mode()``
    (both engines return an arbitrary tie member, useless for a
    value-hash oracle or reproducible pipelines).  Two partial-agg
    passes (value counts, then a top-1 window over the
    group×distinct-value relation — already aggregate-sized).
    Returns group cols + (mode_value, mode_count).
    """
    counts = df.groupBy(*group_cols, val_col).agg(
        F.count(F.lit(1)).alias("__n")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__n").desc(), F.col(val_col).asc()
    )
    return (
        counts.withColumn("__rnk", F.row_number().over(w))
        .where(F.col("__rnk") == 1)
        .select(
            *group_cols,
            F.col(val_col).alias("mode_value"),
            F.col("__n").cast("bigint").alias("mode_count"),
        )
    )


def k_anonymize(
    df: DataFrame,
    ladder: list[list[str]],
    k: int = 5,
) -> DataFrame:
    """k-anonymity assessment with a GENERALIZATION LADDER — the
    privacy gate a curation pipeline runs before releasing
    quasi-identifier columns (Sweeney 2002): a combination of
    quasi-identifiers may only be published if at least ``k`` rows
    share it; failing groups generalize to coarser grain instead of
    being dropped.

    ``ladder`` lists quasi-identifier column sets finest-first, each
    a superset of the next (e.g. ``[[nation, segment, balance_band],
    [nation, segment], [nation]]`` — the same coarsen-until-
    publishable shape as the reference's county→district→state
    fallback, ``nass.sql:466``).  For every finest-grain group the
    chosen level is the FIRST whose group size reaches ``k``;
    ``suppressed`` marks groups no level can publish.

    All aggregates are group-cardinality-sized (one partial-agg
    shuffle per level over already-aggregated rows, L small); the
    fact table is scanned once.  Returns one row per finest group:
    the finest quasi columns, ``n`` (its own size), ``anon_level``
    (0-based chosen ladder index, -1 if suppressed), ``anon_n``
    (size of the published group), ``suppressed``.
    """
    finest = ladder[0]
    g = df.groupBy(*finest).agg(F.count(F.lit(1)).alias("n"))
    sizes = [F.col("n")]
    for i, cols in enumerate(ladder[1:], start=1):
        ci = df.groupBy(*cols).agg(F.count(F.lit(1)).alias(f"__n{i}"))
        # NULL-SAFE equality on the ladder keys: quasi-identifiers
        # are exactly the columns where NULL is a real publishable
        # value (unknown birthplace IS a group), and a plain join
        # would silently DROP those finest groups from the report —
        # absence from a privacy gate's output must never be how an
        # unexamined group gets released
        ci = ci.select(
            *[F.col(c).alias(f"__k{i}_{c}") for c in cols], f"__n{i}"
        )
        cond = None
        for c in cols:
            eq = F.col(c).eqNullSafe(F.col(f"__k{i}_{c}"))
            cond = eq if cond is None else (cond & eq)
        g = g.join(ci, cond).drop(*[f"__k{i}_{c}" for c in cols])
        sizes.append(F.col(f"__n{i}"))
    level = F.lit(-1)
    anon_n = F.lit(None).cast("bigint")
    for i in range(len(sizes) - 1, -1, -1):
        level = F.when(sizes[i] >= k, F.lit(i)).otherwise(level)
        anon_n = F.when(sizes[i] >= k, sizes[i]).otherwise(anon_n)
    return g.select(
        *finest,
        F.col("n"),
        level.alias("anon_level"),
        anon_n.alias("anon_n"),
        (level == -1).alias("suppressed"),
    )


def seasonal_anomalies(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    val_col: str,
    id_col: str,
    z: float = 3.0,
    min_n: int = 8,
    round_dp: int = 4,
) -> DataFrame:
    """Seasonal-baseline anomaly detection: score each observation
    against the mean/stddev of ITS OWN seasonal slot — (key,
    hour-of-day) — and flag |z| > ``z``. The telemetry shape where a
    value normal at 2 pm is an incident at 2 am, which a global
    z-score (B34) cannot see.

    Baselines come from the same exact-decimal power sums as
    :func:`grouped_stats` (order-independent, engine-portable); the
    slot relation is (keys × 24)-sized and broadcasts back onto the
    fact scan, which then filters map-side — one partial-agg shuffle
    total. Slots need ``min_n`` observations and non-zero variance
    to judge (sparse slots flag nothing). ``hour()`` on the naive
    timestamp is tz-independent. Returns the flagged rows:
    (id, keys…, ts, value, slot_mean, z_score).
    """
    keys = list(key_cols)
    # NULL values and NULL timestamps are excluded from the
    # POPULATION, not just the sums: counting them in __n while SUM
    # skips them would bias every slot mean/variance low and let
    # NULL rows push sparse slots past min_n — the same
    # n-vs-denominator mismatch winsorized_stats fixed this round
    df = df.where(F.col(val_col).isNotNull() & F.col(ts_col).isNotNull())
    x = F.col(val_col).cast(_WIDE)
    slots = (
        df.withColumn("__h", F.hour(ts_col))
        .groupBy(*keys, "__h")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(x).alias("__sx"),
            F.sum(x * x).alias("__sxx"),
        )
    )
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    slots = slots.select(
        *keys,
        "__h",
        "__n",
        (sx / n).alias("__mean"),
        # sample variance from exact sums; guarded below
        ((n * sxx - sx * sx) / (n * (n - F.lit(1.0)))).alias("__var"),
    )
    # judge-worthy slots only enter the broadcast: filtering the tiny
    # slot relation BEFORE it ships is free (rows in filtered-out
    # slots are dropped either way) and shrinks both the broadcast
    # and the per-row predicate work
    slots = slots.where((F.col("__n") >= min_n) & (F.col("__var") > 0))
    staged = df.withColumn("__h", F.hour(ts_col)).join(
        F.broadcast(slots), keys + ["__h"]
    )
    zscore = (F.col(val_col).cast("double") - F.col("__mean")) / F.sqrt(
        F.col("__var")
    )
    return (
        staged.where(F.abs(zscore) > z)
        .select(
            F.col(id_col),
            *keys,
            F.col(ts_col),
            F.col(val_col),
            F.round("__mean", round_dp).alias("slot_mean"),
            F.round(zscore, round_dp).alias("z_score"),
        )
    )


def key_skew_profile(
    df: DataFrame,
    key_cols: Sequence[str],
    round_dp: int = 6,
) -> DataFrame:
    """Join-key skew diagnostics: one summary row per profiled
    column — row count, distinct keys, the hottest key's count and
    share, and the GINI coefficient of the key-frequency
    distribution (0 = uniform, →1 = one key owns everything). The
    pre-flight report that decides salting / skew-join hints BEFORE
    a 100 TB shuffle reveals the straggler.

    Per column: one partial-agg shuffle to key counts (keys-
    cardinality relation), a second partial agg folding those counts
    into a frequency-of-frequencies histogram (count value c →
    number of keys m_c), and a scalar fold. Gini via the sorted
    cumulative formula G = (2·Σ i·c_i)/(k·Σc) − (k+1)/k with counts
    ascending — tie-order-invariant, so the m_c keys sharing count c
    form one contiguous rank block whose Σ i·c_i contribution is
    c·(m·base + m(m+1)/2) with base = Σ_{c'<c} m_{c'}. The cumulative
    window therefore runs over the HISTOGRAM only, whose cardinality
    is ≤ √(2·n_rows) (distinct frequencies of a multiset summing to
    N number at most O(√N)) — never over the distinct-key relation,
    which for a billion-key join column would itself be the
    single-task straggler this report exists to predict. All block
    sums are integer-exact (m(m+1) is always even). NULL keys count
    as a key.
    """
    outs = []
    for kc in key_cols:
        counts = df.groupBy(F.col(kc)).agg(F.count(F.lit(1)).alias("c"))
        hist = counts.groupBy("c").agg(F.count(F.lit(1)).alias("m"))
        w = Window.orderBy(F.col("c")).rowsBetween(
            Window.unboundedPreceding, -1
        )
        blocks = hist.select(
            "c",
            "m",
            F.coalesce(F.sum("m").over(w), F.lit(0)).alias("base"),
        )
        # Σ i·c_i restricted to this block of m tied keys
        block_ic = F.col("c") * (
            F.col("m") * F.col("base")
            + F.expr("m * (m + 1) DIV 2")
        )
        outs.append(
            blocks.agg(
                F.lit(kc).alias("key_column"),
                F.sum(F.col("c") * F.col("m")).cast("bigint").alias("n_rows"),
                F.sum("m").cast("bigint").alias("n_keys"),
                F.max("c").cast("bigint").alias("max_cnt"),
                F.round(
                    F.max("c")
                    / F.sum(F.col("c") * F.col("m")).cast("double"),
                    round_dp,
                ).alias("top1_share"),
                F.round(
                    (F.lit(2.0) * F.sum(block_ic))
                    / (
                        F.sum("m") * F.sum(F.col("c") * F.col("m"))
                    ).cast("double")
                    - (F.sum("m") + F.lit(1.0))
                    / F.sum("m").cast("double"),
                    round_dp,
                ).alias("gini"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def cusum_changepoint(
    df: DataFrame,
    group_cols: Sequence[str],
    slot_col: str,
    val_col: str,
) -> DataFrame:
    """Single change-point detection per group via the CUSUM
    statistic (SURVEY.md §2 B91): the slot t maximizing
    ``|S_t - (t/T) * S_T|`` where ``S_t`` is the running sum of the
    per-slot values — the classic cumulative-sum test for a mean
    shift (Page 1954 / Pettitt-style scan), with no recursion, so it
    is pure window algebra.

    The statistic is kept INTEGER-EXACT by scaling: ``D_t * T =
    T*S_t - t*S_T`` (both BIGINT), avoiding every cross-engine FP
    hazard; callers divide by T for the classical value. Output per
    group: ``changepoint_slot`` (argmax, earliest-slot tie-break),
    ``cusum_scaled`` = max |T*S_t - t*S_T|, and ``n_slots`` = T.

    Shape: the per-slot series is built by the CALLER (one grouped
    aggregate); here one window partitioned by group and ordered by
    slot computes the running sum, a second unbounded window adds
    (T, S_T) — both ride the SAME hash-partitioning on the group
    key, so Catalyst plans a single Exchange — and one final groupBy
    picks the argmax via ``min(struct(-|D|, slot))``. Series length
    per group is slot-bounded (e.g. days), never row-bounded, so
    window state stays small at any fact-table scale.
    """
    w_run = (
        Window.partitionBy(*group_cols)
        .orderBy(slot_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    v = F.col(val_col).cast("bigint")
    cum = df.select(
        *group_cols,
        F.col(slot_col).alias("__slot"),
        F.sum(v).over(w_run).alias("__s"),
        F.row_number()
        .over(Window.partitionBy(*group_cols).orderBy(slot_col))
        .alias("__t"),
    ).select(
        *group_cols,
        "__slot",
        "__s",
        "__t",
        F.max("__t").over(w_all).alias("__bigt"),
        F.last("__s").over(
            Window.partitionBy(*group_cols)
            .orderBy("__t")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("__st"),
    )
    d = F.abs(
        F.col("__bigt") * F.col("__s") - F.col("__t") * F.col("__st")
    )
    return (
        cum.select(
            *group_cols,
            F.struct(
                (-d).alias("neg_d"), F.col("__slot").alias("slot")
            ).alias("__key"),
            d.alias("__d"),
            F.col("__bigt").alias("n_slots"),
        )
        .groupBy(*group_cols, "n_slots")
        .agg(F.min("__key").alias("__best"), F.max("__d").alias("cusum_scaled"))
        .select(
            *group_cols,
            F.col("__best.slot").alias("changepoint_slot"),
            F.col("cusum_scaled").cast("bigint").alias("cusum_scaled"),
            F.col("n_slots").cast("bigint").alias("n_slots"),
        )
    )


def spearman_corr(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group Spearman rank correlation with average ranks for
    ties — the monotone-association readout that Pearson (B26
    grouped_stats) gets wrong on heavy-tailed or outlier-laden pairs.

    Scale-correct ranking, same histogram discipline as
    mann_whitney_u (operators/experiment.py): each variable reduces
    to its per-group VALUE histogram, average ranks come from one
    cumulative window over that small relation, and facts join back
    on (group, value) to pick up their ranks — two histogram-sized
    shuffles instead of two per-group row sorts.

    Exactness: the average rank of a tie run is a half-integer, so
    DOUBLED ranks are integers; all five power sums (Σx, Σy, Σx²,
    Σy², Σxy over doubled ranks) accumulate in DECIMAL — exact and
    partition-order independent — and the closing Pearson-on-ranks
    formula is one IEEE expression both engines evaluate identically
    (the doubling cancels: rho is scale-invariant).
    """
    ks = list(keys)
    sub = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        *ks,
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    )

    def doubled_ranks(col: str, out: str) -> DataFrame:
        h = sub.groupBy(*ks, col).agg(F.count(F.lit(1)).alias("__ct"))
        w = (
            Window.partitionBy(*ks)
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # avg rank of a tie run = before + (ct+1)/2; doubled → int
        return h.select(
            *ks,
            col,
            (
                F.lit(2) * (F.sum("__ct").over(w) - F.col("__ct"))
                + F.col("__ct")
                + F.lit(1)
            ).alias(out),
        )

    rx = doubled_ranks("__x", "__rx")
    ry = doubled_ranks("__y", "__ry")
    ranked = sub.join(rx, [*ks, "__x"]).join(ry, [*ks, "__y"])
    d0 = "decimal(18,0)"
    rxd = F.col("__rx").cast(d0)
    ryd = F.col("__ry").cast(d0)
    agg = ranked.groupBy(*ks).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(rxd).alias("__sx"),
        F.sum(ryd).alias("__sy"),
        F.sum(rxd * rxd).alias("__sxx"),
        F.sum(ryd * ryd).alias("__syy"),
        F.sum(rxd * ryd).alias("__sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    var2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
    # a within-group-constant variable has no rank ordering: rho
    # undefined -> NULL (and ANSI mode must not trip on the 0-div)
    rho = F.when(var2 > 0, (n * sxy - sx * sy) / F.sqrt(var2))
    return agg.select(
        *ks, "n", F.round(rho, round_to).alias("spearman_rho")
    ).orderBy(*ks)


def acf_lags(
    series: DataFrame,
    key_col: str,
    order_col: str,
    val_col: str,
    max_lag: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Autocorrelation function per series at lags 1..max_lag — the
    seasonality / burstiness fingerprint of a per-key time series
    (daily event counts, ingest volumes): ACF(7) spikes on weekly
    rhythm, slow ACF decay flags trending (non-stationary) feeds.

    Input is an already-aggregated series (key, t, v) with v
    integer-valued (counts). The classic estimator
    ``ACF(k) = Σ(x_t - m)(x_{t-k} - m) / Σ(x_t - m)²`` expands into
    pure power sums — Σx_t·x_{t-k}, lagged partial sums, and the
    full-series Σx, Σx² — each an exact integer accumulated in
    DECIMAL, so the closing double expression is partition-order
    independent and engine-identical.

    Scale shape: one window per series produces all max_lag lagged
    columns in a single pass (no self-join), stack() turns them long,
    and both aggregations are map-side combinable on the series key.
    Series length is days-per-key — thousands of rows per key at
    most, so the per-key window never concentrates a scan.
    """
    w = Window.partitionBy(key_col).orderBy(order_col)
    d0 = "decimal(18,0)"
    v = F.col(val_col).cast("bigint")
    lagged = series.select(
        F.col(key_col).alias("__k"),
        v.alias("__x"),
        *[
            F.lag(v, k).over(w).alias(f"__l{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    stack_expr = ", ".join(
        f"{k}, __l{k}" for k in range(1, max_lag + 1)
    )
    long = lagged.select(
        "__k",
        "__x",
        F.expr(
            f"stack({max_lag}, {stack_expr}) as (lag, __y)"
        ),
    ).where(F.col("__y").isNotNull())
    base = lagged.groupBy("__k").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col("__x").cast(d0)).alias("__s"),
        F.sum(F.col("__x").cast(d0) * F.col("__x").cast(d0)).alias("__ss"),
    )
    pairs = long.groupBy("__k", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("__x").cast(d0) * F.col("__y").cast(d0)).alias("__sxy"),
        F.sum(F.col("__x").cast(d0)).alias("__sx"),
        F.sum(F.col("__y").cast(d0)).alias("__sy"),
    )
    j = pairs.join(F.broadcast(base), "__k")
    m = F.col("__s").cast("double") / F.col("n_obs").cast("double")
    denom = F.col("__ss").cast("double") - F.col("__s").cast(
        "double"
    ) * m
    numer = (
        F.col("__sxy").cast("double")
        - m * F.col("__sx").cast("double")
        - m * F.col("__sy").cast("double")
        + F.col("n_pairs").cast("double") * m * m
    )
    return j.select(
        F.col("__k").alias(key_col),
        "lag",
        "n_obs",
        "n_pairs",
        # constant series: zero variance, ACF undefined -> NULL
        F.round(F.when(denom != 0, numer / denom), round_to).alias(
            "acf"
        ),
    ).orderBy(key_col, "lag")


def equidepth_histogram(
    df: DataFrame,
    val_col: str,
    n_buckets: int = 8,
    round_to: int = 6,
    mode: str = "exact",
) -> DataFrame:
    """Equi-depth (equal-frequency) histogram: bucket boundaries at
    the 1/n..(n-1)/n percentiles, then the facts bucketed against
    them with per-bucket counts, shares, and observed [lo, hi]
    ranges.

    This is the RANGE-PARTITION PLANNER for skewed keys: equi-WIDTH
    buckets concentrate a Zipfian column's mass into one partition;
    equi-depth boundaries are what ``repartitionByRange`` computes by
    sampling — here reproducible and persistable, so a write path
    can pin file boundaries across reruns (and an optimizer can
    estimate selectivity as bucket shares). Two fact passes (the
    boundary pass, then the bucketing scan); boundaries broadcast;
    the closing aggregation is map-side combinable.

    ``mode`` picks the boundary source — the only part of the plan
    that doesn't scale for free:

    - ``"exact"``: interpolating ``F.percentile`` — ONE aggregation
      buffer accumulates every value of the column, an
      executor-memory wall at 100 TB (the r9 10× sweep's worst
      scaler). The gate-scale certifier: Spark ``percentile`` ≡
      DuckDB ``quantile_cont`` at ROUND(6) (the r8 theilsen device).
    - ``"sketch"``: boundaries rank-interpolated from the B129
      mergeable log-histogram (``quantile_sketch.
      histogram_split_points``) — bounded state (≤512 counters),
      mergeable across shards, error ≤1/8 of the value; requires a
      positive integer-valued domain (the log bucket's). The 100 TB
      production path, and still FULLY oracle-able (exact integer
      arithmetic end to end).
    - ``"approx"``: ``F.approx_percentile`` at accuracy 10000
      (bounded GK state, rank error ≤ n/10000) — for non-positive /
      fractional domains at scale; NOT cross-engine replayable
      (rows-only posture).

    Values bucket by ``v > boundary`` against the ROUNDED boundaries,
    so both engines make identical placements given equal boundaries.
    Output: ``bucket, n_rows, share, lo, hi``.
    """
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    v = F.col(val_col)
    if mode == "exact":
        b = df.where(v.isNotNull()).agg(
            F.transform(
                F.percentile(val_col, F.array(*[F.lit(f) for f in fracs])),
                lambda x: F.round(x, round_to),
            ).alias("__bounds")
        )
    elif mode == "sketch":
        from nass_summary_spark.operators.quantile_sketch import (
            build_log_histogram,
            histogram_split_points,
        )

        hist = build_log_histogram(df.where(v.isNotNull()), [], val_col)
        b = histogram_split_points(hist, [], n_buckets).agg(
            F.sort_array(
                F.collect_list(F.round("est", round_to))
            ).alias("__bounds")
        )
    elif mode == "approx":
        b = df.where(v.isNotNull()).agg(
            F.transform(
                F.approx_percentile(
                    val_col,
                    F.array(*[F.lit(f) for f in fracs]),
                    F.lit(10000),
                ),
                lambda x: F.round(x.cast("double"), round_to),
            ).alias("__bounds")
        )
    else:
        raise ValueError(f"unknown boundary mode: {mode!r}")
    facts = df.where(v.isNotNull()).select(v.alias("__v"))
    bucket = F.size(
        F.filter("__bounds", lambda t: F.col("__v") > t)
    ).cast("bigint")
    agg = (
        facts.crossJoin(F.broadcast(b))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("__v").alias("lo"),
            F.max("__v").alias("hi"),
        )
        # bucket-sized, but it feeds BOTH the total and the output
        # projection — unpersisted, the total branch re-scans the
        # facts (r10 plan census finding)
        .persist()
    )
    tot = agg.agg(F.sum("n_rows").alias("__n"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_rows",
            F.round(
                F.col("n_rows").cast("double") / F.col("__n").cast("double"),
                round_to,
            ).alias("share"),
            "lo",
            "hi",
        )
        .orderBy("bucket")
    )


def kendall_tau(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group Kendall's tau-b — the concordance twin of
    :func:`spearman_corr`, preferred when the series is short or
    tie-heavy (tau-b's tie correction is exact, and its
    interpretation — P(concordant) − P(discordant) — survives
    monotone transforms that distort rho).

    Scale shape, same histogram discipline as spearman: the group
    reduces to its JOINT (x, y) value histogram (≤ series-length
    cells — this operator is for bounded per-group series such as
    daily metrics, never corpus-sized pairs); concordant/discordant
    pairs come from the histogram SELF-join weighted by cell-count
    products, tie corrections from the marginal histograms, so every
    count is exact integer arithmetic and the only float is the
    closing ``(C − D) / sqrt((n0−t_x)(n0−t_y))``.
    """
    ks = list(keys)
    # four branches (joint cells, both tie marginals, totals) read
    # this projection — persist it or each branch re-derives the
    # input lineage (the r9 plan-audit lesson); the relation is the
    # operator's bounded per-group series, never corpus facts
    sub = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        *ks,
        F.col(x_col).alias("__x"),
        F.col(y_col).alias("__y"),
    ).persist()
    cells = sub.groupBy(*ks, "__x", "__y").agg(
        F.count(F.lit(1)).cast("bigint").alias("__ct")
    )
    a, b = cells.alias("a"), cells.alias("b")
    cond = None
    for k in ks:
        c = F.col(f"a.{k}") == F.col(f"b.{k}")
        cond = c if cond is None else (cond & c)
    lex = (F.col("a.__x") < F.col("b.__x")) | (
        (F.col("a.__x") == F.col("b.__x"))
        & (F.col("a.__y") < F.col("b.__y"))
    )
    pair_w = F.col("a.__ct") * F.col("b.__ct")
    conc = F.when(
        (F.col("a.__x") < F.col("b.__x"))
        & (F.col("a.__y") < F.col("b.__y")),
        pair_w,
    ).otherwise(F.lit(0))
    disc = F.when(
        (F.col("a.__x") < F.col("b.__x"))
        & (F.col("a.__y") > F.col("b.__y")),
        pair_w,
    ).otherwise(F.lit(0))
    cd = (
        a.join(b, cond & lex)
        .groupBy(*[F.col(f"a.{k}").alias(k) for k in ks])
        .agg(
            F.sum(conc).cast("bigint").alias("__c"),
            F.sum(disc).cast("bigint").alias("__d"),
        )
    )

    def tie_sum(col: str, out: str) -> DataFrame:
        h = sub.groupBy(*ks, col).agg(
            F.count(F.lit(1)).cast("bigint").alias("__t")
        )
        return h.groupBy(*ks).agg(
            F.sum(
                F.expr("__t * (__t - 1) div 2")
            ).cast("bigint").alias(out)
        )

    totals = sub.groupBy(*ks).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    j = (
        totals.join(cd, ks, "left")
        .join(tie_sum("__x", "__tx"), ks)
        .join(tie_sum("__y", "__ty"), ks)
        .fillna({"__c": 0, "__d": 0})
    )
    n0 = F.expr("n * (n - 1) div 2").cast("bigint")
    denom2 = (n0 - F.col("__tx")) * (n0 - F.col("__ty"))
    tau = F.when(
        denom2 > 0,
        (F.col("__c") - F.col("__d")).cast("double")
        / F.sqrt(denom2.cast("double")),
    )
    return j.select(
        *ks,
        "n",
        F.col("__c").alias("concordant"),
        F.col("__d").alias("discordant"),
        F.round(tau, round_to).alias("tau_b"),
    ).orderBy(*ks)


def category_profile(
    df: DataFrame,
    group_col: str,
    cat_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group categorical composition profile: Shannon entropy
    (nats), Herfindahl–Hirschman concentration, and the top
    category's share — the mixture-monitoring readout for "is this
    corpus slice collapsing onto one language/source/domain"
    (entropy falls, HHI and top_share rise long before a hard gate
    trips). Two combinable aggregations over the (group, category)
    histogram; output is group-sized. The probability terms are the
    same double divisions in both engines and the sums run over
    ≤ |categories| terms, so ROUND(6) certifies them (the B57
    source_drift_kl posture)."""
    # the (group, category) histogram feeds two aggregations —
    # persist it so the fact scan happens once (histogram-sized)
    cnt = df.where(F.col(cat_col).isNotNull()).groupBy(
        group_col, cat_col
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__ct")).persist()
    tot = cnt.groupBy(group_col).agg(
        F.sum("__ct").cast("bigint").alias("__n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cats"),
        F.max("__ct").cast("bigint").alias("__top"),
    )
    p = F.col("__ct").cast("double") / F.col("__n").cast("double")
    ent = cnt.join(tot, group_col).groupBy(group_col).agg(
        (-F.sum(p * F.log(p))).alias("__h"),
        F.sum(p * p).alias("__hhi"),
    )
    return (
        tot.join(ent, group_col)
        .select(
            group_col,
            F.col("__n").alias("n_rows"),
            "n_cats",
            F.round("__h", round_to).alias("entropy"),
            F.round("__hhi", round_to).alias("hhi"),
            F.round(
                F.col("__top").cast("double") / F.col("__n").cast("double"),
                round_to,
            ).alias("top_share"),
        )
        .orderBy(group_col)
    )


def gini_coefficient(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group Gini coefficient over a non-negative value column —
    the inequality readout completing the concentration family
    (pareto_share gives the top-k% mass, category_profile's HHI the
    categorical version; Gini is the standard scalar for "how
    unevenly is this quantity distributed").

    Computed from the rank identity ``G = (2·Σ i·x(i) − (n+1)·Σx)
    / (n·Σx)`` over ascending ranks — one window shuffle per group
    keyed on the group, with Σ i·x(i) accumulated in DECIMAL so the
    sum is exact and partition-order independent (ties contribute
    consecutive ranks times equal values, so any tie order yields
    the identical sum — no tie-break needed). Rows with NULL or
    negative values are excluded (Gini is defined on non-negative
    support); an all-zero group has no inequality to measure → NULL.
    """
    ks = list(keys)
    x = F.col(value_col).cast(_WIDE)
    base = df.where(
        F.col(value_col).isNotNull() & (F.col(value_col) >= 0)
    ).select(*ks, x.alias("__x"))
    w = Window.partitionBy(*ks).orderBy("__x")
    ranked = base.withColumn("__i", F.row_number().over(w))
    agg = ranked.groupBy(*ks).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__x").alias("__sx"),
        F.sum(F.col("__x") * F.col("__i").cast(_WIDE)).alias("__six"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    six = F.col("__six").cast("double")
    gini = F.when(
        F.col("__sx") > 0,
        (F.lit(2.0) * six - (n + F.lit(1.0)) * sx) / (n * sx),
    )
    return agg.select(
        *ks, "n", F.round(gini, round_to).alias("gini")
    ).orderBy(*ks)


def psi_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bin_width: float,
    n_bins: int,
    round_to: int = 6,
) -> DataFrame:
    """Population Stability Index per group against the pooled
    reference — THE industry drift score (credit/scoring practice:
    PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted), joining
    the drift family's KL (B57), KS (B131), and EMD (B140) with the
    number most monitoring dashboards actually alarm on.

    Values bucket into ``n_bins`` fixed-width bins (integer floor
    division; the B29 device) with an overflow bin; per-bin shares
    use add-one (Laplace) smoothing on BOTH sides so empty bins are
    defined deterministically — the standard zero-protection,
    identical in the replay. Two combinable aggregations (group-bin
    histogram, then ≤ groups×bins terms); facts never shuffle
    un-aggregated. ``PSI = Σ (p_g − p_ref)·ln(p_g / p_ref)``,
    ROUND(6) (the B57 posture).
    """
    b = F.least(
        F.floor(F.col(value_col).cast("double") / F.lit(float(bin_width))),
        F.lit(int(n_bins) - 1),
    ).cast("bigint")
    base = df.where(
        F.col(value_col).isNotNull() & (F.col(value_col) >= 0)
    ).select(F.col(group_col).alias("grp"), b.alias("bin"))
    # ONE fact aggregation; the pooled reference histogram derives
    # from the group histogram (bin-sized), never a second fact scan
    gh = base.groupBy("grp", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("__cg")
    ).persist()
    groups = gh.select("grp").distinct()
    bins = groups.sparkSession.range(int(n_bins)).select(
        F.col("id").cast("bigint").alias("bin")
    )
    rh = gh.groupBy("bin").agg(
        F.sum("__cg").cast("bigint").alias("__cr")
    )
    grid = (
        groups.crossJoin(F.broadcast(bins))
        .join(gh, ["grp", "bin"], "left")
        .join(F.broadcast(rh), "bin", "left")
        .fillna({"__cg": 0, "__cr": 0})
        .select(
            "grp",
            "bin",
            (F.col("__cg") + F.lit(1)).alias("__sg"),
            (F.col("__cr") + F.lit(1)).alias("__sr"),
        )
    )
    tg = grid.groupBy("grp").agg(
        F.sum("__sg").cast("bigint").alias("__tg"),
        F.sum("__sr").cast("bigint").alias("__tr"),
    )
    j = grid.join(F.broadcast(tg), "grp")
    pg = F.col("__sg").cast("double") / F.col("__tg").cast("double")
    pr = F.col("__sr").cast("double") / F.col("__tr").cast("double")
    term = (pg - pr) * F.log(pg / pr)
    return (
        j.groupBy(F.col("grp").alias(group_col))
        .agg(F.round(F.sum(term), round_to).alias("psi"))
        .orderBy(group_col)
    )
