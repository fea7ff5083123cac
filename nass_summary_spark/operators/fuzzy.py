"""Fuzzy (edit-distance) joins by deletion-neighborhood blocking —
the equi-join shape of approximate string matching.

The naive fuzzy join is a θ-join (``levenshtein(a, b) ≤ r``) — a
full cross product, dead at any scale.  The deletion-neighborhood
trick (FastSS, Bocek et al. 2007; the same family as the spelling-
correction indexes in production search engines): every string
generates its |s|+1 one-deletion variants (plus itself); two strings
within edit distance 1 PROVABLY share at least one variant —
  * substitution at i: deleting position i from both sides yields
    the same string;
  * insertion/deletion: the longer string minus the inserted char
    equals the shorter string itself;
  * equality: the identity variant.
So an equi-join on the variant key meets every qualifying pair, and
a cheap ``levenshtein`` verify on the candidates removes the false
positives (strings sharing a variant at distance 2).  Candidates per
string are bounded by (|s|+1)² collisions in the worst case but in
practice by near-duplicate density — the same candidate-bounding
argument as MinHash banding.

Scale shape: variant generation is a pure HOF projection (map-side);
the join key is a short string; the verify (`F.levenshtein`, JVM) is
per-candidate.  Nothing quadratic, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(s: Column | str) -> Column:
    """``array<string>``: the string itself + every one-char-deleted
    variant, built with ``transform`` over ``sequence`` (JVM HOF,
    linear in |s|)."""
    c = F.col(s) if isinstance(s, str) else s
    dels = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(
            F.substring(c, F.lit(1), i - 1), F.substring(c, i + 1, F.length(c))
        ),
    )
    return F.array_distinct(F.concat(F.array(c), dels))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All (left_id, right_id) pairs with ``levenshtein ≤ max_dist``
    — exact output, candidate-bounded work.  The deletion-
    neighborhood guarantee covers distance ≤ 1; for ``max_dist`` > 1
    the blocking recall is partial (documented, like SimHash past its
    band radius) — callers needing r=2 should compose two passes.

    Value-level dedup first: real corpora repeat string values (a
    common name appears in thousands of rows), and exploding variants
    per ROW multiplies the hottest join keys by the duplication
    factor squared.  Blocking and verification therefore run over
    DISTINCT values only; the verified value-pairs are expanded back
    to id pairs by two equi-joins at the end.  Output is identical
    (tested) — the duplication factor is paid exactly once, in the
    unavoidable expansion of the true result, never in candidate
    generation.

    Returns (left_id, right_id, left_val, right_val, dist).
    """
    lvals = left.select(F.col(left_col).alias("__lval")).distinct()
    rvals = right.select(F.col(right_col).alias("__rval")).distinct()
    # pin the candidate join's width with an EXPLICIT hash
    # repartition on the join key: the variant join + verify is the
    # CPU-heavy stage, but its bytes are tiny, so AQE's byte-driven
    # coalescing otherwise folds it onto 1-2 tasks (the local-mode
    # trap guide §2.5 warns about — CPU is invisible to advisory
    # byte sizing). An explicit repartition is never AQE-coalesced
    # and pre-satisfies the join's distribution, so no extra
    # exchange is planned; width is the session conf.
    width = int(left.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    lv = lvals.select(
        "__lval", F.explode(deletion_variants("__lval")).alias("__v")
    ).repartition(width, "__v")
    rv = rvals.select(
        "__rval", F.explode(deletion_variants("__rval")).alias("__v")
    ).repartition(width, "__v")
    # verify BEFORE the pair-dedup shuffle: dist is a deterministic
    # function of the value pair, so filtering first yields the same
    # distinct pair set while only TRUE matches enter the exchange;
    # the banded 3-arg levenshtein computes the exact distance inside
    # the radius (O(k·n) per candidate) and -1 beyond it.
    cand = lv.join(rv, "__v")
    # eager localCheckpoint: matched_vals is small (true value-level
    # matches), but every BROADCAST build referencing it re-executes
    # the whole blocking+verify chain independently (the nested-
    # broadcast-rebuild trap — the two expansion joins below plus any
    # downstream consumer, e.g. connected_components' edge
    # checkpoint, each re-ran the 32-task verify stages; profiled 3-4
    # executions in canonical_entities). Truncating here runs the
    # quadratic verify exactly once; the checkpointed relation is the
    # same size class connected_components already checkpoints.
    matched_vals = (
        cand.withColumn(
            "dist", F.levenshtein(F.col("__lval"), F.col("__rval"), max_dist)
        )
        .where((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .dropDuplicates(["__lval", "__rval"])
        .select("__lval", "__rval", "dist")
        .localCheckpoint()
    )
    return (
        matched_vals.join(
            left.select(F.col(left_id).alias("__lid"), F.col(left_col).alias("__lval")),
            "__lval",
        )
        .join(
            right.select(
                F.col(right_id).alias("__rid"), F.col(right_col).alias("__rval")
            ),
            "__rval",
        )
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            F.col("__lval").alias(left_col),
            F.col("__rval").alias(right_col),
            "dist",
        )
    )
