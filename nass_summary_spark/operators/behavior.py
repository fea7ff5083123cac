"""Behavioral / sequence analytics over event streams — the
engagement-analysis layer next to the funnel (C10) and sessionization
(C2) operators.

Both operators here are single-window-plus-aggregation shapes: the
per-user ordering rides the key shuffle, and everything after it is
partial-aggregated — the plans scale with event volume like every
windowed operator in the repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def markov_transitions(
    events: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    order_cols: list[str] | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """First-order transition matrix of ``state_col`` per event
    sequence: for every (state, next_state) pair, the count and the
    conditional probability P(next | state) — the Markov summary
    behind next-action prediction, anomaly scoring (improbable
    transitions), and bot detection (too-probable ones).

    ONE window (lead over the per-key event-time order; extra
    ``order_cols`` break ts ties deterministically) + one
    partial-aggregated groupBy; the totals join is
    state-cardinality-sized and broadcasts.  Last event per key has
    no successor and drops out.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        events.select(
            F.col(key_col),
            F.col(state_col).alias("state"),
            *[F.col(c) for c in ([ts_col] + (order_cols or []))],
        )
        .withColumn("next_state", F.lead("state").over(w))
        .where(F.col("next_state").isNotNull())
    )
    counts = pairs.groupBy("state", "next_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("state").agg(F.sum("n").alias("__tot"))
    return counts.join(F.broadcast(totals), "state").select(
        "state",
        "next_state",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.col("__tot"), round_dp).alias("p"),
    )


def cohort_retention(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen
    week (their cohort); for every (cohort_week, week_offset) the
    number of cohort members active that week and the retained
    fraction — the standard engagement curve.

    Two partial-aggregated passes: per-(user, week) activity (one
    groupBy), then min-week per user derived with a window that
    rides the same user partitioning; the final matrix aggregation
    is cohort×offset-sized.  Week bucketing uses ``date_trunc
    ('week')`` (Monday-start on both engines).
    """
    wk = F.date_trunc("week", F.col(ts_col))
    active = (
        events.select(F.col(key_col).alias("k"), wk.alias("week"))
        .distinct()
    )
    w = Window.partitionBy("k")
    tagged = active.withColumn("cohort_week", F.min("week").over(w)).withColumn(
        "week_offset",
        (
            (F.unix_date(F.col("week").cast("date"))
             - F.unix_date(F.col("cohort_week").cast("date"))) / 7
        ).cast("int"),
    )
    matrix = tagged.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    sizes = matrix.where(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("__size")
    )
    return matrix.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        F.col("n_active").cast("bigint").alias("n_active"),
        F.round(F.col("n_active") / F.col("__size"), round_dp).alias("retained"),
    )


def session_paths(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    order_col: str,
    gap_minutes: int = 30,
    k: int = 20,
) -> DataFrame:
    """Top-k session paths: sessionize each key's events by
    inactivity gap, concatenate the ordered event types into a path
    string, and rank the most common paths — the "how do users
    actually move" report behind funnel design (C10 checks ONE
    hypothesized path; this surfaces the real ones).

    The sessionization is the explicit gaps-and-islands form (lag +
    running sum riding the key shuffle) rather than ``session_window``
    so an external SQL engine replays it verbatim; path assembly is
    the A28 ordered-list discipline (sort-by-struct then join —
    partition-order independent).  The final top-k ranks the
    path-cardinality relation (tiny).  Returns (path, n).
    """
    from nass_summary_spark.functions.parsing import epoch_micros

    us = epoch_micros(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(order_col))
    staged = (
        events.select(
            F.col(key_col), F.col(ts_col), F.col(order_col),
            F.col(state_col).alias("state"), us.alias("__us"),
        )
        .withColumn("__prev", F.lag("__us").over(w))
        .withColumn(
            "__brk",
            (
                F.col("__prev").isNull()
                | (F.col("__us") - F.col("__prev") > gap_minutes * 60_000_000)
            ).cast("int"),
        )
        .withColumn(
            "__sid",
            F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    paths = staged.groupBy(key_col, "__sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col(ts_col), F.col(order_col), F.col("state"))
                    )
                ),
                lambda s: s["state"],
            ),
            ">",
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    wr = Window.orderBy(F.col("n").desc(), F.col("path").asc())
    return (
        counts.withColumn("__rnk", F.row_number().over(wr))
        .where(F.col("__rnk") <= k)
        .select("path", F.col("n").cast("bigint").alias("n"))
    )


def dynamic_gap_sessions(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    gap_sec_expr,
) -> DataFrame:
    """Sessionization with a PER-EVENT inactivity gap — e.g. a
    checkout event closes its session after 2 minutes while browsing
    keeps it alive for 30 (the dynamic-gap semantics of Spark's
    ``session_window(ts, gap_expr)``): each event extends the session
    until ``ts + gap(event)``, sessions merge while they overlap.

    Expressed as gaps-and-islands so the plan is one key-partitioned
    window pass AND an external SQL engine can replay it exactly: a
    session breaks where the event's start exceeds the RUNNING MAX of
    all prior ``ts + gap`` horizons.  Returns one row per session:
    (key, session_start, session_end, n_events) with end = the
    session's furthest horizon.
    """
    from nass_summary_spark.functions.parsing import epoch_micros

    us = epoch_micros(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(order_col))
    staged = (
        events.withColumn("__us", us)
        .withColumn(
            "__horizon", F.col("__us") + (gap_sec_expr * 1_000_000).cast("bigint")
        )
        .withColumn(
            "__prior_max",
            F.max("__horizon").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "__brk",
            (
                F.col("__prior_max").isNull()
                | (F.col("__us") > F.col("__prior_max"))
            ).cast("int"),
        )
        .withColumn(
            "__sid",
            F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    # session_end stays in epoch MICROSECONDS: reconstructing a
    # timestamp from µs is session-timezone-dependent on NTZ inputs
    # (the hostile-session lesson) — the µs integer is portable
    return staged.groupBy(key_col, "__sid").agg(
        F.min(ts_col).alias("session_start"),
        F.max("__horizon").alias("__end_us"),
        F.count(F.lit(1)).alias("n_events"),
    ).select(
        key_col,
        "session_start",
        F.col("__end_us").alias("session_end_us"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )


def dynamic_gap_sessions_native(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_duration,
) -> DataFrame:
    """The NATIVE twin of :func:`dynamic_gap_sessions`: Spark's own
    ``session_window(ts, gap_expr)`` with a per-event gap column —
    one ``groupBy`` the engine turns into its session-merging
    aggregation (UpdatingSessionsIterator riding the key exchange),
    no hand-built window pass, and the same operator works unchanged
    under ``readStream`` with a watermark (where the hand-built
    islands form can't — running windows over streams are
    unbounded-state).

    Kept alongside the islands form because only the latter is
    SQL-replayable for the oracle gate; THIS form is the one to use
    in production Spark. Both return identical rows (the registered
    query shares the islands oracle verbatim): session_end is the
    furthest ``ts + gap`` horizon, emitted as portable epoch µs.
    """
    from nass_summary_spark.functions.parsing import epoch_micros

    sw = F.session_window(F.col(ts_col), gap_duration)
    return (
        events.groupBy(F.col(key_col), sw.alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            epoch_micros(F.col("sw.end")).alias("session_end_us"),
            F.col("n_events").cast("bigint").alias("n_events"),
        )
    )


def kaplan_meier(
    df: DataFrame,
    cohort_col: str,
    duration_col: str,
    event_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-cohort Kaplan–Meier product-limit survival curve over a
    subject relation (one row per subject: time observed, and
    whether the terminal event was seen or the subject was censored
    at that time) — the retention/churn readout cohort_retention's
    raw shares misstate under censoring (subjects still alive at the
    observation edge are neither churned nor ignorable; KM is the
    standard estimator that uses them correctly).

    Scale shape: subjects collapse to the per-(cohort, time) step
    histogram in one combinable aggregation; risk sets and the
    survival product ride ONE window over that step relation
    (≤ cohorts × distinct-times rows — calendar-bounded, never
    subject-bounded). The product is ``exp(Σ ln(1 − d/n))`` with
    per-step terms; d=0 steps contribute ln(1)=0 so censored-only
    times thin the risk set without stepping the curve, exactly the
    textbook estimator. A step that exhausts its risk set (d = n)
    pins survival to 0 from that time on (the ln(0) guard).

    Output (event times only): ``cohort, t, n_risk, n_events,
    n_censored, survival``.
    """
    d = F.col(event_col).cast("int")
    steps = df.groupBy(
        F.col(cohort_col).alias("cohort"),
        F.col(duration_col).cast("bigint").alias("t"),
    ).agg(
        F.sum(d).cast("bigint").alias("n_events"),
        F.sum(F.lit(1) - d).cast("bigint").alias("n_censored"),
    )
    w_cum = (
        Window.partitionBy("cohort")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("cohort")
    removed = F.col("n_events") + F.col("n_censored")
    staged = steps.select(
        "cohort",
        "t",
        "n_events",
        "n_censored",
        (
            F.sum(removed).over(w_all)
            - (F.sum(removed).over(w_cum) - removed)
        ).cast("bigint").alias("n_risk"),
    )
    dead = F.col("n_events") == F.col("n_risk")
    term = F.when(
        dead, F.lit(0.0)
    ).otherwise(
        F.log(
            F.lit(1.0)
            - F.col("n_events").cast("double")
            / F.col("n_risk").cast("double")
        )
    )
    cum = staged.select(
        "cohort",
        "t",
        "n_risk",
        "n_events",
        "n_censored",
        F.sum(term).over(w_cum).alias("__lns"),
        F.max(dead.cast("int")).over(w_cum).alias("__dead"),
    )
    return (
        cum.where(F.col("n_events") > 0)
        .select(
            "cohort",
            "t",
            "n_risk",
            "n_events",
            "n_censored",
            F.when(F.col("__dead") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp("__lns"), round_to))
            .alias("survival"),
        )
        .orderBy("cohort", "t")
    )
