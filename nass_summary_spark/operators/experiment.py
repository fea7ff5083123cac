"""Experiment / hypothesis-test statistics (SURVEY.md §2 B89-B91).

The reference's R analysis layer (``src/budget.r``) ends at grouped
means and correlations; a data-curation platform additionally needs
the experiment-readout shapes — did the new filter / mix / dedup
threshold move the metric, and is the movement noise? Three classic
tests, each expressed as ONE partial-aggregated shuffle over exact
sums so a DuckDB oracle can confirm values bit-for-bit:

* :func:`welch_ab_test` — two-sample Welch t on a per-unit metric,
  arms assigned by the md5-stable bucket (operators/sampling.py
  ``id_bucket``), so assignment is reproducible on any engine and
  never resplits a unit across arms.
* :func:`chi_square_independence` — independence of two categorical
  columns via the zero-cell-free identity
  ``chi2 = N * (sum(o^2 / (ra * cb)) - 1)``: absent cells contribute
  nothing to the sum, so the contingency table never needs
  densifying (at 100 TB the observed-cell relation is tiny after
  map-side partial aggregation; the dense a x b grid may not be).
* :func:`mann_whitney_u` — rank-sum test with average ranks for
  ties and the tie-corrected normal approximation; the only wide
  operation is one sort-shuffle of the (value) relation for the
  rank window.

All three follow the grouped_stats discipline (operators/stats.py):
exact DECIMAL / integer accumulation, one closing IEEE-754 double
expression, ``round()`` before output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_WIDE = "decimal(18,4)"


def welch_ab_test(
    df: DataFrame,
    arm_col: str,
    val_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Two-sample Welch t-test: one output row comparing the two
    arms of ``arm_col`` (boolean: False = control, True = treatment)
    on ``val_col``.

    Output: ``n_control, n_treatment, mean_control, mean_treatment,
    lift, t_stat, dof`` (Welch-Satterthwaite degrees of freedom).
    ONE conditional aggregate over exact decimal power sums — no
    join, no second pass; at any scale this is a single map-side
    combinable reduction to one row.

    Degenerate-experiment contract: when either arm has fewer than
    two non-NULL metric values the sample variance is undefined
    (n-1 denominator), so ``t_stat`` and ``dof`` are NULL — and with
    an EMPTY arm the mean/lift columns for that arm are NULL too.
    Readers must treat NULL t_stat as "test not runnable"
    (check ``n_control >= 2 AND n_treatment >= 2``), not as a data
    error; the counts columns always carry the evidence.
    """
    arm = F.col(arm_col)
    x = F.col(val_col).cast(_WIDE)
    agg = df.agg(
        # count the NON-NULL metric values per arm, so n matches the
        # population the mean/variance summarize (the winsorized_stats
        # NULL-population lesson from the r4 review)
        F.count(F.when(~arm, x)).alias("na"),
        F.count(F.when(arm, x)).alias("nb"),
        F.sum(F.when(~arm, x)).alias("__sa"),
        F.sum(F.when(arm, x)).alias("__sb"),
        F.sum(F.when(~arm, x * x)).alias("__saa"),
        F.sum(F.when(arm, x * x)).alias("__sbb"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    sa, sb = F.col("__sa").cast("double"), F.col("__sb").cast("double")
    saa = F.col("__saa").cast("double")
    sbb = F.col("__sbb").cast("double")
    ma, mb = sa / na, sb / nb
    # sample variances from exact sums: (n*sxx - sx^2) / (n*(n-1))
    va = (na * saa - sa * sa) / (na * (na - F.lit(1.0)))
    vb = (nb * sbb - sb * sb) / (nb * (nb - F.lit(1.0)))
    qa, qb = va / na, vb / nb
    se2 = qa + qb
    t = (mb - ma) / F.sqrt(se2)
    dof = (se2 * se2) / (
        qa * qa / (na - F.lit(1.0)) + qb * qb / (nb - F.lit(1.0))
    )
    return agg.select(
        F.col("na").alias("n_control"),
        F.col("nb").alias("n_treatment"),
        F.round(ma, round_to).alias("mean_control"),
        F.round(mb, round_to).alias("mean_treatment"),
        F.round(mb - ma, round_to).alias("lift"),
        F.round(t, round_to).alias("t_stat"),
        F.round(dof, round_to).alias("dof"),
    )


def chi_square_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Pearson chi-square test of independence between two
    categorical columns, plus Cramér's V effect size.

    Uses the algebraic identity
    ``sum_full_grid (o - e)^2 / e  =  N * (sum_observed o^2/(ra*cb) - 1)``
    (``e = ra*cb/N``; zero cells add only to ``sum e = N``), so the
    plan never materializes absent combinations: one groupBy over
    (a, b) — map-side combinable, output bounded by distinct-pair
    count — then marginals as windows over that tiny cell relation.
    Output one row: ``n, card_a, card_b, dof, chi2, cramers_v``.

    Rows where either column is NULL are EXCLUDED (the standard
    complete-case contingency convention): counting them in the
    cells but not in the category cardinalities would silently break
    the ``sum(e) = N`` identity the zero-cell-free form relies on.
    """
    cells = df.where(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).groupBy(
        F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    ).agg(F.count(F.lit(1)).alias("o"))
    wa = Window.partitionBy("__a")
    wb = Window.partitionBy("__b")
    wall = Window.partitionBy()
    enriched = cells.select(
        "__a",
        "__b",
        "o",
        F.sum("o").over(wa).alias("ra"),
        F.sum("o").over(wb).alias("cb"),
        F.sum("o").over(wall).alias("n"),
        F.size(F.collect_set("__a").over(wall)).alias("ka"),
        F.size(F.collect_set("__b").over(wall)).alias("kb"),
    )
    o = F.col("o").cast("double")
    ra, cb = F.col("ra").cast("double"), F.col("cb").cast("double")
    n = F.col("n").cast("double")
    agg = enriched.groupBy("n", "ka", "kb").agg(
        F.sum(o * o / (ra * cb)).alias("__q")
    )
    chi2 = F.col("n").cast("double") * (F.col("__q") - F.lit(1.0))
    dof = (F.col("ka") - F.lit(1)) * (F.col("kb") - F.lit(1))
    mindim = F.least(F.col("ka"), F.col("kb")) - F.lit(1)
    v = F.sqrt(
        chi2 / (F.col("n").cast("double") * mindim.cast("double"))
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("ka").cast("int").alias("card_a"),
        F.col("kb").cast("int").alias("card_b"),
        dof.cast("int").alias("dof"),
        F.round(chi2, round_to).alias("chi2"),
        F.round(v, round_to).alias("cramers_v"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    val_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Mann-Whitney U rank-sum test between two named groups.

    Scale-correct ranking: instead of a global row-level rank window
    (a single-partition sort at any size), the relation is first
    reduced to the VALUE-CARDINALITY histogram — ``(value, ct,
    ct_a)`` — and average ranks are derived per distinct value as
    ``cum_before + (ct + 1)/2`` from one cumulative window over that
    small relation (the key_skew_profile discipline: windows run
    over histograms, never over facts). Tie correction uses
    ``sum(t^3 - t)`` from the same histogram.

    One map-side-combinable shuffle on value; everything after is
    histogram-sized. Ranks are half-integers, so every accumulation
    is exact in doubles; the only inexact step is the closing
    ``z = (U - mu)/sigma`` division, evaluated identically by both
    engines. Output one row: ``n_a, n_b, u_a, z_stat``.
    """
    is_a = F.col(group_col) == F.lit(group_a)
    sub = df.where(
        F.col(group_col).isin([group_a, group_b])
        & F.col(val_col).isNotNull()
    ).select(is_a.alias("__ia"), F.col(val_col).cast("double").alias("__v"))
    vals = sub.groupBy("__v").agg(
        F.count(F.lit(1)).alias("ct"),
        F.count(F.when(F.col("__ia"), F.lit(1))).alias("cta"),
    )
    w = (
        Window.orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = vals.select(
        "ct",
        "cta",
        (F.sum("ct").over(w) - F.col("ct")).alias("__cb"),
    )
    ctd = F.col("ct").cast("double")
    avg_rank = F.col("__cb").cast("double") + (ctd + F.lit(1.0)) / F.lit(2.0)
    agg = ranked.agg(
        F.sum("cta").cast("bigint").alias("n_a"),
        F.sum(F.col("ct") - F.col("cta")).cast("bigint").alias("n_b"),
        F.sum(F.col("cta").cast("double") * avg_rank).alias("__ra"),
        F.sum(ctd * ctd * ctd - ctd).alias("__ties"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = na + nb
    u_a = F.col("__ra") - na * (na + F.lit(1.0)) / F.lit(2.0)
    mu = na * nb / F.lit(2.0)
    sigma2 = (
        na
        * nb
        / F.lit(12.0)
        * (n + F.lit(1.0) - F.col("__ties") / (n * (n - F.lit(1.0))))
    )
    z = (u_a - mu) / F.sqrt(sigma2)
    return agg.select(
        "n_a",
        "n_b",
        F.round(u_a, round_to).alias("u_a"),
        F.round(z, round_to).alias("z_stat"),
    )


def woe_iv(
    df: DataFrame,
    bucket_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Weight-of-evidence / information-value feature screening
    (SURVEY.md §2 B96): per feature bucket, ``WOE = ln(share of
    positives / share of negatives)`` and the feature's total
    ``IV = sum (gs - bs) * WOE`` — the classic "is this column worth
    a model's attention" report (curation analog: does source /
    cohort / length-band predict the quality label?).

    Shares are taken over the FULL population; buckets with a zero
    cell (no positives or no negatives — WOE undefined, IV infinite)
    are excluded from the output AND the IV sum, which is the
    standard zero-cell convention short of smoothing (documented).
    Plan: one combinable groupBy to the bucket histogram, then
    windows over that tiny relation only. Output per bucket:
    ``bucket, n_pos, n_neg, woe, iv_total`` (iv_total repeated — the
    single-number feature verdict riding along each row).
    """
    lbl = F.col(label_col)
    hist = df.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.count(F.when(lbl, F.lit(1))).alias("n_pos"),
        F.count(F.when(~lbl, F.lit(1))).alias("n_neg"),
    )
    wall = Window.partitionBy()
    tot = hist.select(
        "bucket",
        "n_pos",
        "n_neg",
        F.sum("n_pos").over(wall).alias("__tp"),
        F.sum("n_neg").over(wall).alias("__tn"),
    ).where((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
    gs = F.col("n_pos").cast("double") / F.col("__tp").cast("double")
    bs = F.col("n_neg").cast("double") / F.col("__tn").cast("double")
    woe = F.log(gs / bs)
    scored = tot.select(
        "bucket",
        "n_pos",
        "n_neg",
        woe.alias("__woe"),
        ((gs - bs) * woe).alias("__iv"),
    )
    return scored.select(
        "bucket",
        "n_pos",
        "n_neg",
        F.round(F.col("__woe"), round_to).alias("woe"),
        F.round(F.sum("__iv").over(wall), round_to).alias("iv_total"),
    )


def pair_retrieval_metrics(
    gold: DataFrame,
    pred: DataFrame,
    keys: list[str],
    round_to: int = 6,
) -> DataFrame:
    """Set-retrieval quality of a predicted pair relation against a
    gold pair relation (SURVEY.md §2 B99): the evaluation loop every
    approximate dedup/blocking pipeline needs — how much of the
    exact-Jaccard truth does the MinHash/SimHash/LSH shortcut keep,
    and how much junk does it add?

    Output one row: ``n_gold, n_pred, n_hit, precision, recall,
    f1``. Pure relational AND single-pass: each input is tagged with
    its side, unioned, and grouped ONCE by the pair key — the
    distinct, the hit join, and all three counts collapse into one
    pair-key shuffle and a single-row aggregate. The earlier
    distinct+join formulation referenced each side twice (the count
    and the join), so the full gold/pred PIPELINES executed twice —
    at corpus scale that re-runs the expensive exact-Jaccard truth
    (r10 profile: six concurrent repeats of the same 33-task stage).
    NULL pair keys keep the join semantics (they count toward their
    side but never toward ``n_hit``). Callers must emit pairs in a
    canonical order (id_a < id_b) on both sides; this function does
    not reorder.
    """
    tagged = gold.select(
        *keys, F.lit(1).alias("__g"), F.lit(0).alias("__p")
    ).unionByName(
        pred.select(*keys, F.lit(0).alias("__g"), F.lit(1).alias("__p"))
    )
    per_key = tagged.groupBy(*keys).agg(
        F.max("__g").alias("__hg"), F.max("__p").alias("__hp")
    )
    nonnull = F.lit(True)
    for k in keys:
        nonnull = nonnull & F.col(k).isNotNull()
    row = per_key.agg(
        F.coalesce(F.sum("__hg"), F.lit(0)).cast("bigint").alias("n_gold"),
        F.coalesce(F.sum("__hp"), F.lit(0)).cast("bigint").alias("n_pred"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("__hg") == 1) & (F.col("__hp") == 1) & nonnull, 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_hit"),
    )
    prec = F.col("n_hit").cast("double") / F.col("n_pred").cast("double")
    rec = F.col("n_hit").cast("double") / F.col("n_gold").cast("double")
    f1 = F.lit(2.0) * prec * rec / (prec + rec)
    return row.select(
        "n_gold",
        "n_pred",
        "n_hit",
        F.round(prec, round_to).alias("precision"),
        F.round(rec, round_to).alias("recall"),
        F.round(f1, round_to).alias("f1"),
    )


def ann_recall_report(
    exact: DataFrame,
    methods: dict[str, DataFrame],
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
    round_to: int = 6,
) -> DataFrame:
    """Recall@k of approximate ANN rankings against the exact
    baseline, one row per method — the B99 evaluation pattern applied
    to the ANN family: ``(method, n_exact, n_hit, recall)`` where
    ``n_hit`` counts (query, neighbor) pairs the approximate top-k
    shares with the exact top-k. Rank positions are deliberately
    ignored (recall@k is set overlap — the standard ANN quality
    metric). Pure relational per method: distinct pair projections,
    one equi-join, single-row counts cross-joined — combinable all
    the way, so certifying a billion-vector index costs one extra
    join per method. Pass the exact relation itself as a method to
    get the recall=1 control row."""
    keys = [query_col, neighbor_col]
    # the exact pair set is (n_queries × k) rows but costs a corpus
    # ranking to produce, and every method's hit-join references it —
    # eagerly truncate so the baseline is computed ONCE, not once per
    # method (measured ~5s of the report's cost at sf0.1)
    g = exact.select(*keys).distinct().localCheckpoint()
    ng = g.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    rows = None
    for name in sorted(methods):
        # the control row (the exact frame passed as its own method)
        # reuses the checkpointed baseline instead of re-ranking
        p = (
            g
            if methods[name] is exact
            else methods[name].select(*keys).distinct()
        )
        # both sides are (n_queries x k) pair sets, but the
        # checkpointed baseline carries no stats, so the planner
        # falls back to sort-merge without the explicit hint
        nh = (
            g.join(F.broadcast(p), on=keys, how="inner")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
        )
        one = (
            ng.crossJoin(nh)
            .select(
                F.lit(name).alias("method"),
                "n_exact",
                "n_hit",
                F.round(
                    F.col("n_hit").cast("double")
                    / F.col("n_exact").cast("double"),
                    round_to,
                ).alias("recall"),
            )
        )
        rows = one if rows is None else rows.unionByName(one)
    if rows is None:
        raise ValueError("ann_recall_report: no methods supplied")
    return rows


#: Poisson(1) CDF quantized to the 1e6-bucket hash space: a row's
#: bootstrap multiplicity in replicate r is the CASE index of its
#: portable hash bucket against these integer thresholds —
#: floor(CDF(k)·1e6), k = 0..7 (multiplicities ≥ 8 collapse to 8;
#: P(X ≥ 8 | λ=1) ≈ 1e-6, one quantization step). Integer-exact and
#: engine-identical by construction.
POISSON1_CDF_BUCKETS: tuple[int, ...] = (
    367879, 735758, 919698, 981011, 996340, 999405, 999916, 999990,
)


def bootstrap_ci_mean(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    id_col: str,
    n_reps: int = 64,
    alpha: float = 0.05,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group bootstrap confidence interval for the MEAN via the
    POISSON BOOTSTRAP (Chamandy et al., Google 2012 — the standard
    single-pass distributed bootstrap): instead of resampling rows
    (a shuffle per replicate), every row independently draws a
    Poisson(1) multiplicity per replicate, which converges to
    multinomial resampling as n grows. One ``explode(sequence)`` per
    row + ONE map-side-combinable (keys, replicate) aggregation —
    replicate output is ``n_reps × groups`` rows regardless of
    corpus size; no data movement beyond the partial sums.

    Determinism: the multiplicity is a pure function of
    (id, replicate) via the portable md5 bucket against the
    quantized Poisson CDF thresholds (integer comparisons — both
    engines identical); replicate sums accumulate in exact DECIMAL;
    the CI edges are the exact interpolating percentile over each
    group's ``n_reps`` replicate means.

    Output: (*keys, n, mean, ci_lo, ci_hi).
    """
    from nass_summary_spark.functions.vectors import token_hash64

    v = F.col(value_col).cast(_WIDE)
    reps = df.select(
        *keys,
        F.col(id_col).alias("__id"),
        v.alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(n_reps - 1))).alias("__r"),
    )
    bucket = token_hash64(
        F.concat(F.col("__id").cast("string"), F.lit(":"), F.col("__r").cast("string")),
        bits=32,
    ) % F.lit(1_000_000)
    mult = F.lit(len(POISSON1_CDF_BUCKETS)).cast("bigint")
    for k in range(len(POISSON1_CDF_BUCKETS) - 1, -1, -1):
        mult = F.when(
            bucket < POISSON1_CDF_BUCKETS[k], F.lit(k).cast("bigint")
        ).otherwise(mult)
    # An all-zero-multiplicity replicate (possible at tiny n) has no
    # resample to take a mean OF — emit NULL so the percentile skips
    # it, rather than mapping it to 0 and dragging CI edges toward 0.
    rep_means = (
        reps.withColumn("__m", mult)
        .groupBy(*keys, "__r")
        .agg(
            F.when(
                F.sum("__m") > 0,
                F.sum(F.col("__m").cast(_WIDE) * F.col("__v")).cast("double")
                / F.sum("__m").cast("double"),
            ).alias("__mean_r")
        )
    )
    lo, hi = alpha / 2.0, 1.0 - alpha / 2.0
    ci = rep_means.groupBy(*keys).agg(
        F.round(F.percentile("__mean_r", F.lit(lo)), round_dp).alias("ci_lo"),
        F.round(F.percentile("__mean_r", F.lit(hi)), round_dp).alias("ci_hi"),
    )
    base = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(v).cast("double") / F.count(F.lit(1)).cast("double"),
            round_dp,
        ).alias("mean"),
    )
    return base.join(ci, keys).select(*keys, "n", "mean", "ci_lo", "ci_hi")


def _ecdf_grid(
    df: DataFrame, group_col: str, val_col: str
) -> DataFrame:
    """Shared each-group-vs-pooled ECDF scaffolding (ks_drift /
    emd_drift): ONE combinable (group, value) histogram shuffle; the
    pooled histogram and group sizes derive from it without
    rescanning; the histogram densifies over the groups x values
    grid so both ECDFs step at every pooled value. Output one row
    per (group, value): ``__g, __v, n_g, n_all, __cg`` (group
    cumulative count) and ``__ca`` (pooled cumulative count)."""
    sub = df.where(
        F.col(group_col).isNotNull() & F.col(val_col).isNotNull()
    ).select(
        F.col(group_col).alias("__g"),
        F.col(val_col).cast("double").alias("__v"),
    )
    # FOUR branches (pooled histogram, group sizes, corpus total, the
    # grid join) derive from this histogram: persist it or each one
    # re-scans the fact table — AQE's ReusedExchange only dedups at
    # identical exchanges, not below the first aggregate (measured 9
    # parquet scans unpersisted at sf0.01)
    h = sub.groupBy("__g", "__v").agg(
        F.count(F.lit(1)).alias("ct")
    ).persist()
    tot = h.groupBy("__v").agg(F.sum("ct").alias("tot_ct"))
    sizes = h.groupBy("__g").agg(F.sum("ct").alias("n_g"))
    n_all = tot.agg(F.sum("tot_ct").alias("n_all"))
    grid = sizes.crossJoin(F.broadcast(tot)).join(
        h, ["__g", "__v"], "left"
    ).fillna({"ct": 0})
    w = (
        Window.partitionBy("__g")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.select(
        "__g",
        "__v",
        "n_g",
        F.sum("ct").over(w).alias("__cg"),
        F.sum("tot_ct").over(w).alias("__ca"),
    ).crossJoin(F.broadcast(n_all))


def ks_drift(
    df: DataFrame,
    group_col: str,
    val_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group two-sample Kolmogorov-Smirnov drift test: each
    group's value distribution vs the REST of the corpus pooled.

    The curation question this answers: "which source's length /
    score distribution no longer looks like everyone else's?" — the
    distribution-free alarm that per-group means miss (a source can
    keep its mean while growing a second mode).

    Scale shape, same histogram discipline as :func:`mann_whitney_u`:
    ONE map-side-combinable shuffle reduces facts to the (group,
    value) histogram; the pooled histogram and group sizes derive
    from it without rescanning. Both ECDFs must step at every POOLED
    value, so the histogram is densified over the groups x values
    grid — groups-count times histogram-sized, tiny relative to
    facts (and the windows that follow partition by group, never
    global). D and its location are exact-integer-ratio arithmetic,
    so both engines agree bit-for-bit before rounding.

    Output one row per group: ``n_g, n_rest, ks_d`` (sup distance),
    ``d_scaled = D * sqrt(n_g * n_rest / (n_g + n_rest))`` (compare
    to c(alpha), e.g. 1.358 for 5%), and ``at_value`` (smallest
    value attaining the sup).
    """
    cum = _ecdf_grid(df, group_col, val_col)
    n_rest = F.col("n_all") - F.col("n_g")
    fa = F.col("__cg").cast("double") / F.col("n_g").cast("double")
    # single-group input: no "rest" to drift from -> NULL distance
    # (and ANSI mode must not trip on the 0-div)
    fb = F.when(
        n_rest > 0,
        (F.col("__ca") - F.col("__cg")).cast("double")
        / n_rest.cast("double"),
    )
    d = F.abs(fa - fb)
    scored = cum.select(
        "__g",
        "__v",
        "n_g",
        n_rest.alias("n_rest"),
        d.alias("__d"),
    )
    pick = Window.partitionBy("__g").orderBy(
        F.col("__d").desc(), F.col("__v").asc()
    )
    ng, nr = F.col("n_g").cast("double"), F.col("n_rest").cast("double")
    return (
        scored.withColumn("__rn", F.row_number().over(pick))
        .where(F.col("__rn") == 1)
        .select(
            F.col("__g").alias(group_col),
            "n_g",
            "n_rest",
            F.round("__d", round_to).alias("ks_d"),
            F.round(
                F.col("__d") * F.sqrt(ng * nr / (ng + nr)), round_to
            ).alias("d_scaled"),
            F.col("__v").alias("at_value"),
        )
        .orderBy(group_col)
    )


def ucb_allocation(
    df: DataFrame,
    arm_col: str,
    reward_col: str,
    round_to: int = 6,
    fp_scale: int = 1_000_000,
) -> DataFrame:
    """UCB1 exploration scores and next-batch allocation shares per
    arm (Auer et al. 2002) — the bandit view of data-mixture tuning:
    each source/recipe is an arm, its observed per-batch reward the
    payoff, and the next epoch's sampling budget goes to arms by
    ``mean + sqrt(2 ln N / n)`` — exploit high-reward mixes while
    guaranteeing under-sampled ones keep getting probed (the explore
    term decays as an arm accumulates evidence).

    One combinable aggregation to per-arm exact sums (DECIMAL — the
    grouped_stats discipline); the arm relation is tiny, so the
    total-N cross join broadcasts. The transcendental UCB score is
    quantized to fixed point (floor(ucb·scale + 0.5) BIGINT, the
    PLANS.md r8 device) so the allocation shares — ratios of exact
    integers — are engine-identical.
    """
    arms = (
        df.where(
            F.col(arm_col).isNotNull() & F.col(reward_col).isNotNull()
        )
        .groupBy(arm_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col(reward_col).cast(_WIDE)).alias("__s"),
        )
    )
    tot = arms.agg(F.sum("n").alias("__nt"))
    scored = arms.crossJoin(F.broadcast(tot))
    mean = F.col("__s").cast("double") / F.col("n").cast("double")
    explore = F.sqrt(
        F.lit(2.0)
        * F.log(F.col("__nt").cast("double"))
        / F.col("n").cast("double")
    )
    fp = F.floor((mean + explore) * F.lit(float(fp_scale)) + F.lit(0.5)).cast(
        "bigint"
    )
    staged = scored.select(
        arm_col,
        "n",
        F.round(mean, round_to).alias("mean_reward"),
        fp.alias("__fp"),
    )
    fptot = staged.agg(F.sum("__fp").alias("__fpt"))
    return (
        staged.crossJoin(F.broadcast(fptot))
        .select(
            arm_col,
            "n",
            "mean_reward",
            (F.col("__fp").cast("double") / F.lit(float(fp_scale))).alias(
                "ucb_score"
            ),
            F.round(
                F.col("__fp").cast("double") / F.col("__fpt").cast("double"),
                round_to,
            ).alias("alloc_share"),
        )
        .orderBy(arm_col)
    )


def emd_drift(
    df: DataFrame,
    group_col: str,
    val_col: str,
    fp_scale: int = 1_000_000_000,
    round_to: int = 6,
) -> DataFrame:
    """Per-group 1-D earth-mover (Wasserstein-1) distance vs the
    pooled rest — the MAGNITUDE companion to :func:`ks_drift`: KS
    reports the worst single ECDF gap (sensitive to any local
    defect), W1 integrates |F_g − F_rest| over the value axis, so it
    says how much probability mass must MOVE and how far — the
    number a rebalancing decision actually budgets against.

    Same :func:`_ecdf_grid` scaffolding (one combinable histogram
    shuffle; group-partitioned windows only). Each grid term is
    ``|gap| · (v_next − v)`` with the gap an exact integer ratio;
    terms quantize to fixed point (floor(|gap|·scale + 0.5), the
    PLANS.md r8 device) BEFORE the sum so the accumulation is exact
    BIGINT — partition-order independent and engine-identical —
    and the closing division is one IEEE expression. Values are
    assumed integer-valued (counts/lengths); the gap multiplier
    casts to BIGINT.
    """
    cum = _ecdf_grid(df, group_col, val_col)
    n_rest = F.col("n_all") - F.col("n_g")
    fa = F.col("__cg").cast("double") / F.col("n_g").cast("double")
    fb = F.when(
        n_rest > 0,
        (F.col("__ca") - F.col("__cg")).cast("double")
        / n_rest.cast("double"),
    )
    nxt = Window.partitionBy("__g").orderBy("__v")
    stepped = cum.select(
        "__g",
        "n_g",
        n_rest.alias("n_rest"),
        F.abs(fa - fb).alias("__d"),
        (
            F.lead("__v", 1).over(nxt).cast("bigint")
            - F.col("__v").cast("bigint")
        ).alias("__gap"),
    ).where(F.col("__gap").isNotNull())
    term = (
        F.floor(F.col("__d") * F.lit(float(fp_scale)) + F.lit(0.5)).cast(
            "bigint"
        )
        * F.col("__gap")
    )
    agg = stepped.groupBy("__g", "n_g", "n_rest").agg(
        F.sum(term).alias("__w1_fp")
    )
    return agg.select(
        F.col("__g").alias(group_col),
        "n_g",
        "n_rest",
        F.round(
            F.col("__w1_fp").cast("double") / F.lit(float(fp_scale)),
            round_to,
        ).alias("emd"),
    ).orderBy(group_col)


def drift_panel(
    df: DataFrame,
    group_col: str,
    val_col: str,
    ks_crit: float = 1.358,
    emd_rel_crit: float = 0.05,
    fp_scale: int = 1_000_000_000,
    round_to: int = 6,
) -> DataFrame:
    """The per-group drift TRIAGE panel: KS (worst ECDF gap — any
    local defect) and Wasserstein-1 (mass moved x distance — the
    rebalancing budget) computed together from ONE
    :func:`_ecdf_grid` pass, each thresholded into a flag and summed
    into a 0-2 severity — the single table an ingest review actually
    reads, at half the cost of running :func:`ks_drift` +
    :func:`emd_drift` separately (the grid histogram shuffle
    dominates both).

    ``ks_crit`` defaults to the 5% two-sample critical value 1.358
    (applied to the scaled statistic); ``emd_rel_crit`` applies to
    EMD normalized by the pooled value RANGE, so the flag is
    scale-free. Both flags compare deterministic doubles computed
    identically by each engine.
    """
    cum = _ecdf_grid(df, group_col, val_col)
    n_rest = F.col("n_all") - F.col("n_g")
    fa = F.col("__cg").cast("double") / F.col("n_g").cast("double")
    fb = F.when(
        n_rest > 0,
        (F.col("__ca") - F.col("__cg")).cast("double")
        / n_rest.cast("double"),
    )
    nxt = Window.partitionBy("__g").orderBy("__v")
    # three readouts (argmax, sum, span) branch off this relation:
    # persist the histogram-sized grid so the fact scan runs once
    stepped = cum.select(
        "__g",
        "__v",
        "n_g",
        n_rest.alias("n_rest"),
        F.abs(fa - fb).alias("__d"),
        (
            F.lead("__v", 1).over(nxt).cast("bigint")
            - F.col("__v").cast("bigint")
        ).alias("__gap"),
    ).persist()
    pick = Window.partitionBy("__g").orderBy(
        F.col("__d").desc(), F.col("__v").asc()
    )
    ng, nr = F.col("n_g").cast("double"), F.col("n_rest").cast("double")
    ks = (
        stepped.withColumn("__rn", F.row_number().over(pick))
        .where(F.col("__rn") == 1)
        .select(
            "__g",
            "n_g",
            "n_rest",
            F.round("__d", round_to).alias("ks_d"),
            F.round(
                F.col("__d") * F.sqrt(ng * nr / (ng + nr)), round_to
            ).alias("d_scaled"),
        )
    )
    term = (
        F.floor(F.col("__d") * F.lit(float(fp_scale)) + F.lit(0.5)).cast(
            "bigint"
        )
        * F.col("__gap")
    )
    emd = (
        stepped.where(F.col("__gap").isNotNull())
        .groupBy("__g")
        .agg(F.sum(term).alias("__w1_fp"))
    )
    span = stepped.agg(
        (F.max("__v").cast("bigint") - F.min("__v").cast("bigint")).alias(
            "__span"
        )
    )
    emd_val = F.col("__w1_fp").cast("double") / F.lit(float(fp_scale))
    emd_rel = emd_val / F.col("__span").cast("double")
    flag_ks = F.when(
        F.col("d_scaled") >= F.lit(ks_crit), F.lit(1)
    ).otherwise(F.lit(0))
    flag_emd = F.when(
        emd_rel >= F.lit(emd_rel_crit), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        ks.join(emd, "__g")
        .crossJoin(F.broadcast(span))
        .select(
            F.col("__g").alias(group_col),
            "n_g",
            "n_rest",
            "ks_d",
            "d_scaled",
            F.round(emd_val, round_to).alias("emd"),
            F.round(emd_rel, round_to).alias("emd_rel"),
            (flag_ks + flag_emd).cast("int").alias("severity"),
        )
        .orderBy(group_col)
    )


def sprt_constants(
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.2,
    scale: int = 10**9,
) -> dict[str, int]:
    """Wald SPRT constants quantized to ``scale`` fixed point IN
    PYTHON, so both engines consume identical integer literals and
    the whole monitor is exact integer arithmetic — no cross-engine
    transcendental at all (stronger than the quantized-ln column
    device: the ln never runs on either engine).

    Returns per-success / per-failure LLR increments and the two
    Wald decision boundaries (accept H1 when LLR ≥ ``up``, accept
    H0 when LLR ≤ ``lo``)."""
    import math

    if not (0 < p0 < 1 and 0 < p1 < 1 and p0 != p1):
        raise ValueError(f"need distinct p0, p1 in (0,1): {p0}, {p1}")

    def q(x: float) -> int:
        return int(math.floor(x * scale + 0.5))

    return {
        "la": q(math.log(p1 / p0)),
        "lb": q(math.log((1 - p1) / (1 - p0))),
        "up": q(math.log((1 - beta) / alpha)),
        "lo": q(math.log(beta / (1 - alpha))),
        "scale": int(scale),
    }


def sprt_monitor(
    df: DataFrame,
    arm_col: str,
    time_col: str,
    trials_col: str,
    successes_col: str,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.2,
    round_to: int = 6,
) -> DataFrame:
    """Sequential probability ratio test monitor (Wald 1945) per
    arm: the experimentation-platform primitive ab_test_lift (B89)
    lacks — a FIXED-horizon test peeked at daily inflates false
    positives; the SPRT's cumulative log-likelihood ratio against
    Wald boundaries is the test that is VALID under continuous
    monitoring, with decisions typically far before the fixed
    horizon.

    Input: one row per (arm, period) with trial/success counts (the
    pre-aggregated relation — facts never reach this operator).
    Cumulative LLR rides one window per arm over the period-sized
    relation; every quantity is BIGINT (see :func:`sprt_constants`),
    so the demo carries a FULL oracle with zero float risk.

    Output per (arm, period): cumulative trials/successes, the LLR
    (descaled, rounded), the boundary decision at that period, and
    ``decided`` — the sticky first decision (once a boundary is
    crossed the test stops; later rows report the stopped state).
    """
    c = sprt_constants(p0, p1, alpha=alpha, beta=beta)
    w = (
        Window.partitionBy(arm_col)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = F.col(successes_col).cast("bigint")
    n = F.col(trials_col).cast("bigint")
    step = x * F.lit(c["la"]) + (n - x) * F.lit(c["lb"])
    cum = df.select(
        F.col(arm_col).alias("arm"),
        F.col(time_col).alias("t"),
        F.sum(n).over(w).cast("bigint").alias("cum_n"),
        F.sum(x).over(w).cast("bigint").alias("cum_x"),
        F.sum(step).over(w).cast("bigint").alias("__llr_fp"),
    )
    decision = (
        F.when(F.col("__llr_fp") >= F.lit(c["up"]), F.lit("accept_h1"))
        .when(F.col("__llr_fp") <= F.lit(c["lo"]), F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
    )
    w_ord = Window.partitionBy("arm").orderBy("t")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged = cum.select(
        "arm",
        "t",
        "cum_n",
        "cum_x",
        F.round(
            F.col("__llr_fp").cast("double") / F.lit(float(c["scale"])),
            round_to,
        ).alias("llr"),
        decision.alias("decision"),
        F.row_number().over(w_ord).alias("__rn"),
    )
    # sticky stop state: the FIRST boundary crossing wins (the LLR
    # can wander across both boundaries over time; the test stops at
    # the first). Integer-encoded (rn·2 + is_h1) so "first crossing's
    # decision" is one MIN over the cumulative window — no
    # engine-specific FIRST/IGNORE NULLS semantics involved.
    enc = F.when(
        F.col("decision") != "continue",
        F.col("__rn") * 2
        + (F.col("decision") == "accept_h1").cast("int"),
    )
    mm = F.min(enc).over(w_cum)
    return staged.select(
        "arm",
        "t",
        "cum_n",
        "cum_x",
        "llr",
        "decision",
        F.when(mm.isNull(), F.lit("continue"))
        .when(mm % 2 == 1, F.lit("accept_h1"))
        .otherwise(F.lit("accept_h0"))
        .alias("decided"),
    ).orderBy("arm", "t")
