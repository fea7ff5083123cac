"""Deterministic sampling / splitting operators for training-data
pipelines (SURVEY.md §2 B18–B21).

Every membership decision is a pure function of the row's id via md5
— which makes the operators:

- reproducible across engines (the DuckDB oracle computes the same
  buckets byte-for-byte),
- stable across runs, partitionings, and cluster sizes (no RNG seeds
  tied to partition ids, unlike ``df.sample``),
- leakage-safe (a document's split assignment never changes when the
  corpus grows — critical for train/val/test hygiene at 100 TB).

Scale posture: splits and stratified samples are a single codegen
projection + filter (no shuffle at all — the predicate pushes to the
scan when ids are stored); per-key caps are one window shuffle;
budget mixing is one aggregate + a broadcast of per-group rates.
Thresholds use exact integer arithmetic (``bucket * den < num * B``)
so no floating-point boundary can disagree between engines.

The reference has no sampling surface (it exports full summaries);
these generalize its deterministic-ingest posture (quickstats.sql:91
distinct ingest) to corpus curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nass_summary_spark.functions.vectors import token_hash64

#: Bucket-space size for hash-based selection. 1e6 buckets gives
#: 0.0001% selection granularity while keeping ``bucket * den`` far
#: inside int64.
HASH_BUCKETS = 1_000_000


def id_bucket(id_col: Column | str, buckets: int = HASH_BUCKETS) -> Column:
    """Uniform bucket in [0, buckets) from md5 of the id's decimal
    string — portable (DuckDB: ``('0x' || substr(md5(id::VARCHAR),
    1, 8))::BIGINT % buckets``)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return token_hash64(c.cast("string"), bits=32) % F.lit(buckets)


def dd_bucket(id_expr: str, buckets: int = HASH_BUCKETS) -> str:
    """The DuckDB-side mirror of :func:`id_bucket` (oracle SQL
    fragment)."""
    return f"(('0x' || substr(md5(CAST({id_expr} AS VARCHAR)), 1, 8))::BIGINT % {buckets})"


def deterministic_split(
    df: DataFrame,
    id_col: str,
    splits: tuple[tuple[str, int], ...] = (("train", 8), ("val", 1), ("test", 1)),
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a train/val/test split by hash bucket.

    ``splits`` are (name, integer weight); the bucket space is
    partitioned at exact integer boundaries ``B * cum_weight //
    total`` so the assignment is deterministic and FP-free. Purely
    map-side: no shuffle, no RNG.
    """
    total = sum(w for _, w in splits)
    bucket = id_bucket(id_col)
    expr = None
    cum = 0
    for name, w in splits[:-1]:
        cum += w
        edge = HASH_BUCKETS * cum // total
        branch = F.when(bucket < F.lit(edge), F.lit(name))
        expr = branch if expr is None else expr.when(bucket < F.lit(edge), F.lit(name))
    expr = (expr if expr is not None else F).otherwise(F.lit(splits[-1][0]))
    return df.withColumn(out_col, expr)


def dd_split_case(
    id_expr: str,
    splits: tuple[tuple[str, int], ...] = (("train", 8), ("val", 1), ("test", 1)),
) -> str:
    """DuckDB CASE expression mirroring :func:`deterministic_split`."""
    total = sum(w for _, w in splits)
    b = dd_bucket(id_expr)
    parts, cum = [], 0
    for name, w in splits[:-1]:
        cum += w
        edge = HASH_BUCKETS * cum // total
        parts.append(f"WHEN {b} < {edge} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{splits[-1][0]}' END"


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, tuple[int, int]],
    default: tuple[int, int] = (0, 1),
) -> DataFrame:
    """Keep an exact-rational fraction of rows per stratum.

    ``fractions`` maps stratum value -> (numerator, denominator);
    a row survives iff ``bucket * den < num * HASH_BUCKETS`` — pure
    integer arithmetic, so the kept set is engine- and
    partitioning-independent. One codegen filter, no shuffle.
    """
    bucket = id_bucket(id_col)
    keep = None
    for val, (num, den) in fractions.items():
        cond = (F.col(stratum_col) == F.lit(val)) & (
            bucket * F.lit(den) < F.lit(num * HASH_BUCKETS)
        )
        keep = cond if keep is None else keep | cond
    dnum, dden = default
    other = ~F.col(stratum_col).isin(list(fractions)) & (
        bucket * F.lit(dden) < F.lit(dnum * HASH_BUCKETS)
    )
    return df.where(keep | other if keep is not None else other)


def per_key_cap(
    df: DataFrame,
    key_col: str,
    id_col: str,
    k: int,
    out_col: str = "rn",
) -> DataFrame:
    """Deterministic reservoir-style cap: keep at most ``k`` rows per
    key, chosen by hash order (uniform, reproducible) with the id as
    tie-break. One window shuffle on the key; the rank lets callers
    keep fewer later without resampling."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(id_bucket(id_col).asc(), F.col(id_col).asc())
    return df.withColumn(out_col, F.row_number().over(w)).where(F.col(out_col) <= k)


def token_budget_mix(
    docs: DataFrame,
    id_col: str,
    group_col: str,
    token_count: Column,
    budget_per_group: int,
) -> DataFrame:
    """Downsample each corpus/group to ~``budget_per_group`` tokens.

    Phase 1 aggregates per-group token totals (map-side partial agg,
    one small shuffle); phase 2 broadcasts the per-group acceptance
    rate ``min(1, budget/total)`` back and keeps rows with
    ``bucket/B < rate``. The rate is a double computed by the same
    expression in the oracle, and the comparison divides by the same
    constant, so both engines keep identical rows.
    """
    staged = docs.withColumn("__tokens", token_count)
    totals = staged.groupBy(group_col).agg(
        F.sum("__tokens").alias("__total_tokens")
    )
    rates = totals.select(
        group_col,
        F.least(
            F.lit(1.0),
            F.lit(float(budget_per_group))
            / F.col("__total_tokens").cast("double"),
        ).alias("__rate"),
    )
    bucket = id_bucket(id_col)
    return (
        staged.join(F.broadcast(rates), group_col)
        .where(bucket.cast("double") / F.lit(float(HASH_BUCKETS)) < F.col("__rate"))
        .drop("__rate")
    )


def shard_plan(
    df: DataFrame,
    id_col: str,
    token_col: str,
    n_shards: int,
) -> DataFrame:
    """Deterministic training-shard layout: assign every document to
    a shard, give it a stable pseudo-random position inside the
    shard, and annotate its cumulative token offset — the plan a
    data loader consumes to stream shuffled training data without
    ever materializing a global shuffle.

    * shard = md5-bucket of the id mod ``n_shards`` — stable under
      corpus growth (a new document never moves old ones between
      shards, so resumable training keeps its data order);
    * position = rank of the id's 48-bit md5 hash within the shard
      (hash order ≈ uniform shuffle, reproducible on any engine, no
      RNG) with the id as total-order tie-break;
    * cum_tokens = running token total through each document —
      what a loader needs to seek to a global step boundary.

    ONE exchange: the window partitions by shard and sorts within —
    at corpus scale set ``n_shards`` ≈ desired output files and the
    sort parallelizes per shard exactly like the clustered sink.
    The DuckDB oracle replays the identical hash arithmetic +
    window, so assignment, order, and offsets are all value-checked.
    """
    from pyspark.sql import Window

    h = token_hash64(F.col(id_col).cast("string"), bits=48)
    staged = df.select(
        F.col(id_col),
        F.col(token_col).cast("bigint").alias("__tok"),
        (token_hash64(F.col(id_col).cast("string"), bits=32) % n_shards).alias(
            "shard"
        ),
        h.alias("__h"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("__h").asc(), F.col(id_col).asc())
    return staged.select(
        id_col,
        "shard",
        F.row_number().over(w).alias("position"),
        F.sum("__tok").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum_tokens"),
    )


def alpha_sampling(
    docs: DataFrame,
    id_col: str,
    group_col: str,
    target_fraction: float = 0.5,
) -> DataFrame:
    """Temperature-weighted group rebalancing at alpha = 0.5 (the
    mC4/XLM-R multilingual sampling scheme): group l is kept with
    probability proportional to ``n_l**alpha / n_l``, flattening the
    head so low-resource groups survive, scaled so the expected kept
    total is ``target_fraction`` of the corpus.

    Engine-portable determinism: alpha is fixed at 0.5 because IEEE
    ``sqrt`` is correctly rounded on every platform while ``pow``
    depends on the host libm (an arbitrary-alpha variant would be a
    rows-only check). Weights ``sqrt(n_l)`` are rounded to 6 dp and
    summed in DECIMAL (exact, order-independent), and the final rate
    is one fixed-shape double expression — so the oracle keeps
    byte-identical rows. Two tiny shuffles (group counts), one
    1-row cross join, one broadcast join back; the corpus itself
    never shuffles."""
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    weighted = counts.withColumn(
        "__w",
        F.round(F.sqrt(F.col("__n").cast("double")), 6).cast("decimal(28,6)"),
    )
    totals = weighted.agg(
        F.sum("__n").alias("__total_n"), F.sum("__w").alias("__total_w")
    )
    rates = weighted.crossJoin(F.broadcast(totals)).select(
        group_col,
        F.least(
            F.lit(1.0),
            (
                (F.lit(float(target_fraction)) * F.col("__total_n").cast("double"))
                * F.col("__w").cast("double")
            )
            / (F.col("__total_w").cast("double") * F.col("__n").cast("double")),
        ).alias("__rate"),
    )
    bucket = id_bucket(id_col)
    return docs.join(F.broadcast(rates), group_col).where(
        bucket.cast("double") / F.lit(float(HASH_BUCKETS)) < F.col("__rate")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col,
    k: int,
    group_cols: list[str] | None = None,
    key_dp: int = 9,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006): each row draws the sort key
    ``ln(u) / w`` with ``u`` uniform from the row's id hash, and the
    top-``k`` keys are exactly a weight-proportional sample without
    replacement — quality-weighted corpus subsampling with all the
    determinism guarantees of the hash-split family (stable under
    corpus growth and partitioning, no RNG).

    One window over the (optional) groups; the sort key rounds to
    ``key_dp`` with the id as total-order tie-break so ranking is
    identical on any IEEE engine.  Weights must be positive.
    Adds ``sample_key``; keeps the top-k rows per group.
    """
    from pyspark.sql import Window

    u = (id_bucket(id_col) + 1).cast("double") / F.lit(float(HASH_BUCKETS))
    w_expr = weight_col if not isinstance(weight_col, str) else F.col(weight_col)
    key = F.round(F.log(u) / w_expr.cast("double"), key_dp)
    staged = df.where(w_expr > 0).withColumn("sample_key", key)
    win = Window.partitionBy(*(group_cols or [])).orderBy(
        F.col("sample_key").desc(), F.col(id_col).asc()
    )
    return (
        staged.withColumn("__rnk", F.row_number().over(win))
        .where(F.col("__rnk") <= k)
        .drop("__rnk")
    )


def hash_ring_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    q_id: str,
    c_id: str,
    k: int = 3,
    ring_bits: int = 48,
    bucket_bits: int = 4,
    join_width: int = 2,
) -> DataFrame:
    """Deterministic NEGATIVE SAMPLING for contrastive training via a
    consistent-hash ring: each query takes the ``k`` corpus items
    whose id hashes are its nearest CLOCKWISE successors on the
    2^``ring_bits`` ring (wrapping), excluding itself.

    Why a ring instead of "k random rows per query": the assignment
    is a pure function of the two ids — reproducible across engines
    and runs, stable under corpus growth (a new corpus item displaces
    at most the ring segment it lands in, the hash-split stability
    argument of this module), and computable WITHOUT any per-query
    scan of the corpus.  Each side maps to one of 2^``bucket_bits``
    ring arcs by hash prefix; a query probes its own arc plus the
    next ``join_width − 1`` (wrapping), so the join is a bounded
    equi-join on the arc id — candidates per query ≈ join_width ·
    N/arcs, independent of query count — followed by a per-query
    rank on ring distance.  Choose arcs so the expected arc
    occupancy ≫ k; the operator's contract (and its oracle) is the
    probed-arc ring sample: a tail query whose k successors all lie
    beyond the probed arcs keeps the nearest candidates it saw.

    Returns (query_id, neg_id, rnk) with rnk 1..k by ring distance
    (id tie-break).
    """
    from pyspark.sql import Window

    from nass_summary_spark.functions.vectors import token_hash64

    ring = 1 << ring_bits
    arc = 1 << (ring_bits - bucket_bits)
    nb = 1 << bucket_bits
    if join_width > nb:
        # probing more arcs than exist would revisit arcs and emit
        # DUPLICATE candidates that row_number would rank as distinct
        # negatives — refuse rather than silently corrupt the top-k
        raise ValueError(
            f"join_width ({join_width}) must not exceed the arc count "
            f"(2^bucket_bits = {nb})"
        )
    q = queries.select(
        F.col(q_id).alias("query_id"),
        token_hash64(F.col(q_id).cast("string"), bits=ring_bits).alias("__qh"),
    )
    c = corpus.select(
        F.col(c_id).alias("neg_id"),
        token_hash64(F.col(c_id).cast("string"), bits=ring_bits).alias("__ch"),
    ).withColumn("__cb", F.floor(F.col("__ch") / arc).cast("int"))
    probes = q.select(
        "query_id",
        "__qh",
        F.explode(
            F.array(*[F.lit(i) for i in range(join_width)])
        ).alias("__j"),
    ).withColumn(
        "__b",
        ((F.floor(F.col("__qh") / arc) + F.col("__j")) % nb).cast("int"),
    )
    cand = (
        probes.join(c, F.col("__b") == F.col("__cb"))
        .where(F.col("neg_id") != F.col("query_id"))
        .withColumn(
            "__dist", (F.col("__ch") - F.col("__qh") + ring) % ring
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__dist"), F.col("neg_id")
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neg_id", "rnk")
    )


def waterfill_allocation(
    sources: DataFrame,
    key_col: str,
    weight_col: str,
    avail_col: str,
    budget: int,
) -> DataFrame:
    """Capped proportional budget allocation — waterfilling
    (SURVEY.md §2 B98): the PLANNING step ahead of
    :func:`token_budget_mix` — given per-source available tokens and
    mixing weights, split a total token ``budget`` proportionally to
    weight, except that no source can give more than it has; freed-up
    budget re-flows to the others (the classic max-min / waterfill
    solution: ``alloc_i = min(avail_i, lam * w_i)`` with ``lam`` set
    so the allocations sum to the budget).

    Relational closed form, ENTIRELY INTEGER-EXACT: sort sources by
    ``avail/weight`` ascending; a source saturates iff
    ``avail_i * W_rem_before_i <= (budget - A_before_i) * w_i``
    (the cross-multiplied form of ``r_i <= lam`` — no division, so
    no FP anywhere); unsaturated sources get
    ``floor(w_i * remaining_budget / remaining_weight)`` by BIGINT
    division. Output allocations sum to the budget minus at most
    (n_unsaturated - 1) flooring crumbs. All windows run over the
    SOURCE relation (dimension-sized); the fact table is never
    touched — at 100 TB this plan is identical.

    Output: ``key, weight, avail, saturated, alloc_tokens``.
    """
    from pyspark.sql import Window

    # sort on the double avail/weight ratio (ORDER only — every
    # DECISION below is integer arithmetic, so a last-ulp tie in the
    # sort order cannot change the saturation set), key tie-break
    pre = Window.orderBy(
        (F.col(avail_col).cast("double") / F.col(weight_col).cast("double")),
        F.col(key_col),
    ).rowsBetween(Window.unboundedPreceding, -1)
    tot = Window.partitionBy()
    a = F.col(avail_col).cast("bigint")
    w = F.col(weight_col).cast("bigint")
    staged = sources.select(
        F.col(key_col).alias("key"),
        w.alias("weight"),
        a.alias("avail"),
        F.coalesce(F.sum(a).over(pre), F.lit(0)).alias("__a_before"),
        F.coalesce(F.sum(w).over(pre), F.lit(0)).alias("__w_before"),
        F.sum(a).over(tot).alias("__a_tot"),
        F.sum(w).over(tot).alias("__w_tot"),
    )
    w_rem_before = F.col("__w_tot") - F.col("__w_before")
    budget_rem_before = F.lit(budget).cast("bigint") - F.col("__a_before")
    saturated = (
        F.col("avail") * w_rem_before <= budget_rem_before * F.col("weight")
    )
    flagged = staged.withColumn("__sat", saturated)
    # remaining budget/weight after ALL saturated sources (monotone in
    # the sort order, so per-row prefix tests decide the full set)
    sums = Window.partitionBy()
    final = flagged.select(
        "key",
        "weight",
        "avail",
        F.col("__sat").alias("saturated"),
        (
            F.lit(budget).cast("bigint")
            - F.sum(F.when(F.col("__sat"), F.col("avail")).otherwise(0)).over(sums)
        ).alias("__b_unsat"),
        F.sum(F.when(~F.col("__sat"), F.col("weight")).otherwise(0))
        .over(sums)
        .alias("__w_unsat"),
    )
    # integer DIV, not `/`: bigint / bigint is DOUBLE division in
    # Spark and loses exactness past 2^53 — DIV stays exact BIGINT
    alloc = F.when(F.col("saturated"), F.col("avail")).otherwise(
        F.expr("(weight * __b_unsat) div __w_unsat")
    )
    return final.select(
        "key", "weight", "avail", "saturated",
        alloc.cast("bigint").alias("alloc_tokens"),
    )


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col,
    k: int,
    group_cols: list[str] | None = None,
    key_dp: int = 9,
) -> DataFrame:
    """Deterministic PRIORITY SAMPLING (Duffield, Lund & Thorup 2007)
    — the weighted-sample sketch whose kept rows carry an UNBIASED
    subset-sum estimator, completing the weighted family next to
    :func:`weighted_sample` (which samples proportionally but keeps
    raw weights): each row draws priority ``q = w / u`` with ``u``
    uniform from the row's id hash; the sample is the top-``k``
    priorities and every kept row's ``est_weight = max(w, tau)`` with
    ``tau`` the (k+1)-th priority (0 when the group has ≤ k rows —
    the sample is then exhaustive and the estimator EXACT). Summing
    ``est_weight`` over any kept subset estimates that subset's true
    weight sum, the property sketch pipelines aggregate on.

    MERGEABLE BY CONSTRUCTION: priorities are a pure function of
    (id, weight), so the global top-k is contained in every shard's
    local top-k — re-sampling the UNION of per-shard sketches yields
    bit-identically the from-scratch sketch (pytest-pinned); that is
    the map-side-combine shape that lets a 100 TB corpus reduce to
    model-sized sketches per partition before one tiny shuffle.

    Priorities round to ``key_dp`` with the id as tie-break so the
    ranking — and ``tau`` itself — is engine-identical; the whole
    computation is one window + one per-group threshold join, fully
    SQL-replayable (the gate query carries a full oracle). Weights
    must be positive. Output: input columns + ``priority`` +
    ``est_weight``."""
    from pyspark.sql import Window

    u = (id_bucket(id_col) + 1).cast("double") / F.lit(float(HASH_BUCKETS))
    w_expr = weight_col if not isinstance(weight_col, str) else F.col(weight_col)
    pri = F.round(w_expr.cast("double") / u, key_dp)
    staged = df.where(w_expr > 0).withColumn("priority", pri)
    groups = list(group_cols or [])
    win = Window.partitionBy(*groups).orderBy(
        F.col("priority").desc(), F.col(id_col).asc()
    )
    ranked = staged.withColumn("__rnk", F.row_number().over(win)).where(
        F.col("__rnk") <= k + 1
    )
    tau = ranked.where(F.col("__rnk") == k + 1).select(
        *groups, F.col("priority").alias("__tau")
    )
    kept = ranked.where(F.col("__rnk") <= k)
    joined = (
        kept.join(F.broadcast(tau), on=groups, how="left")
        if groups
        else kept.crossJoin(
            F.broadcast(
                tau.select("__tau")
                .unionByName(
                    df.sparkSession.range(1).select(
                        F.lit(None).cast("double").alias("__tau")
                    )
                )
                .orderBy(F.col("__tau").desc_nulls_last())
                .limit(1)
            )
        )
    )
    return joined.select(
        *[c for c in df.columns],
        "priority",
        F.greatest(
            w_expr.cast("double"), F.coalesce(F.col("__tau"), F.lit(0.0))
        ).alias("est_weight"),
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    val_col: str,
    total_n: int,
    sigma_scale: int = 1_000_000,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation: stratum h of a
    ``total_n``-row sample gets ``n_h ∝ N_h · σ_h`` — minimum-
    variance estimation of the population mean under a fixed budget
    (Neyman 1934), the planning step proportional allocation
    (:func:`deterministic_split` / stratified_sample B20) skips:
    volatile strata are worth oversampling, near-constant ones waste
    budget.

    σ_h comes from exact DECIMAL power sums (the grouped_stats
    discipline) and quantizes to fixed point, so weights
    ``w_h = N_h · floor(σ_h·scale + 0.5)`` are exact BIGINTs; seats
    then apportion by LARGEST REMAINDER (floor share + one extra for
    the ``total_n − Σfloor`` biggest remainders, remainder/stratum
    tie-break) — allocations sum to total_n EXACTLY, engine-
    identically. Single-value strata (σ undefined) and constant
    strata (σ = 0) carry no weight. All windows run over the stratum
    relation (dimension-sized); at 100 TB the fact table contributes
    one combinable aggregation. Quantization keeps ``total_n · w_h``
    inside BIGINT for N_h up to ~1e12/σ; widen to DECIMAL sums if a
    deployment exceeds that.

    Output: ``stratum, n_rows, sigma, alloc_n``.
    """
    d4 = "decimal(18,4)"
    x = F.col(val_col).cast(d4)
    stats = (
        df.where(
            F.col(stratum_col).isNotNull() & F.col(val_col).isNotNull()
        )
        .groupBy(F.col(stratum_col).alias("stratum"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(x).alias("__s"),
            F.sum(x * x).alias("__ss"),
        )
    )
    n = F.col("n_rows").cast("double")
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    sigma = F.when(
        F.col("n_rows") >= 2,
        F.sqrt(
            (n * ss - s * s) / (n * (n - F.lit(1.0)))
        ),
    ).otherwise(F.lit(0.0))
    sig_fp = F.floor(sigma * F.lit(float(sigma_scale)) + F.lit(0.5)).cast(
        "bigint"
    )
    weighted = stats.select(
        "stratum",
        "n_rows",
        F.round(sigma, 6).alias("sigma"),
        (F.col("n_rows") * sig_fp).alias("__w"),
    )
    tot = weighted.agg(
        F.sum("__w").alias("__wt"),
        F.sum("n_rows").alias("__nt"),
    )
    # Degenerate guard: if every stratum quantizes to sigma_fp = 0
    # (all-constant / single-row strata) the Neyman weights sum to 0
    # and the div below would yield NULL allocations — fall back to
    # proportional-by-n_rows, the allocation Neyman degrades to when
    # all variances are equal.
    staged = weighted.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_rows",
        "sigma",
        F.expr(
            f"(CAST({int(total_n)} AS BIGINT)"
            " * (CASE WHEN __wt = 0 THEN n_rows ELSE __w END))"
            " div (CASE WHEN __wt = 0 THEN __nt ELSE __wt END)"
        ).alias("__base"),
        F.expr(
            f"(CAST({int(total_n)} AS BIGINT)"
            " * (CASE WHEN __wt = 0 THEN n_rows ELSE __w END))"
            " % (CASE WHEN __wt = 0 THEN __nt ELSE __wt END)"
        ).alias("__rem"),
    )
    # largest-remainder seats: the stratum relation is dimension-
    # sized, so the global windows here never see facts
    from pyspark.sql import Window

    wsum = Window.partitionBy()
    wrank = Window.orderBy(F.col("__rem").desc(), F.col("stratum").asc())
    final = staged.select(
        "stratum",
        "n_rows",
        "sigma",
        "__base",
        (
            F.lit(int(total_n)).cast("bigint")
            - F.sum("__base").over(wsum)
        ).alias("__extra"),
        F.row_number().over(wrank).alias("__rk"),
    )
    return (
        final.select(
            "stratum",
            "n_rows",
            "sigma",
            (
                F.col("__base")
                + F.when(F.col("__rk") <= F.col("__extra"), F.lit(1))
                .otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("alloc_n"),
        )
        .orderBy("stratum")
    )
