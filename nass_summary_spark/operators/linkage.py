"""Probabilistic record linkage — the Fellegi–Sunter model
(SURVEY.md §2 B102), completing the entity-resolution family:
fuzzy_join (B58) finds string-similar CANDIDATES, canonical_entities
(B61) clusters them, and this scores candidate pairs with the
classic log-likelihood-ratio weights (Fellegi & Sunter 1969, JASA —
the model behind every production matcher from Census to Splink).

Per comparison field f with match probability m_f (P(agree | same
entity), supplied — the reviewable business prior) and u-probability
u_f (P(agree | different entities), ESTIMATED from the candidate
pairs themselves — the standard data-derived estimate, since almost
all cross-pairs are non-matches):

    weight_f = ln(m_f / u_f)            if the pair agrees on f
             = ln((1-m_f) / (1-u_f))    if it disagrees

and a pair's score is the sum over fields. Pairs scoring above the
caller's threshold are candidate matches, reviewable field by field.

Scale shape: ONE blocked equi-join builds candidates (never a cross
join — same discipline as B58's deletion neighborhoods), one
single-row aggregate estimates every u_f (map-side combinable,
broadcast back), and scoring is a pure projection. At 100 TB the
only wide operation is the blocking join itself.

Determinism / oracle: agreements are exact equality on the given
columns, u_f is an AVG over the candidate relation clamped to
[1/(2n), 1-1/(2n)] (the usual guard against ln(0) when a field
always/never agrees — n = candidate count, so the clamp itself is
data-derived and engine-identical), and every ln/division is IEEE
double arithmetic DuckDB replays bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def fellegi_sunter_scores(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    block_col: str,
    m_probs: Mapping[str, float],
    threshold: float = 0.0,
    round_to: int = 6,
    salt: int = 1,
) -> DataFrame:
    """Score blocked candidate pairs between ``left`` and ``right``
    with Fellegi–Sunter log-likelihood weights.

    ``m_probs`` maps each comparison column (present in BOTH frames)
    to its m-probability. Output: ``(left_id, right_id,
    agree_<field>... , score)`` for pairs with score ≥ threshold,
    plus the estimated ``u_<field>`` columns (constant per run) so
    the weights are auditable.

    Block-cardinality contract / ``salt``: per-block candidate work
    is |L_b|·|R_b| — intrinsic to blocking, not to this plan — so a
    hot block key degenerates toward quadratic ON THAT BLOCK. While
    one side broadcasts, the hot block's pairs spread naturally over
    the probe side's partitions; in the shuffle-join regime a hot
    block lands on ONE reducer, and AQE's skew split won't fire
    (its 256 MB byte threshold is far above a block whose ROW PAIR
    count explodes — SCALING_SKEW.json "record_linkage_fs" measures
    the straggler). For that regime pass ``salt=S``: the left side
    gets a deterministic pseudo-salt (xxhash64 of its id, mod S) and
    the right side is replicated S ways, so the hot block's pair
    work spreads over S tasks at the cost of an S× right-side
    shuffle. Output is IDENTICAL for any S (the salt only routes
    rows; pinned by test): pick S ≈ the hot block's size over the
    per-task pair budget, leave S=1 when block sizes are capped by
    construction (the gate query blocks on nation over TPC-H
    customers — bounded by design).
    """
    fields: Sequence[str] = list(m_probs)
    lhs = left.select(
        F.col(left_id).alias("__lid"),
        F.col(block_col).alias("__blk"),
        *[F.col(f).alias(f"__l_{f}") for f in fields],
    )
    rhs = right.select(
        F.col(right_id).alias("__rid"),
        F.col(block_col).alias("__blk"),
        *[F.col(f).alias(f"__r_{f}") for f in fields],
    )
    if salt > 1:
        lhs = lhs.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col("__lid")), F.lit(int(salt)))
        )
        rhs = rhs.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(int(salt) - 1)))
        ).withColumn("__salt", F.col("__salt").cast("long"))
        cand = lhs.join(rhs, ["__blk", "__salt"])
    else:
        cand = lhs.join(rhs, "__blk")
    agrees = [
        (F.col(f"__l_{f}") == F.col(f"__r_{f}"))
        .cast("int")
        .alias(f"agree_{f}")
        for f in fields
    ]
    cand = cand.select("__lid", "__rid", *agrees)

    # one single-row reduction estimates every u_f at once; the
    # clamp bound rides along so both sides of the ln are derived
    # from the same relation
    stats = cand.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.avg(f"agree_{f}").alias(f"u_{f}") for f in fields],
    )
    eps = F.lit(0.5) / F.col("__n").cast("double")
    stats = stats.select(
        "__n",
        *[
            F.least(
                F.greatest(F.col(f"u_{f}"), eps), F.lit(1.0) - eps
            ).alias(f"u_{f}")
            for f in fields
        ],
    )
    scored = cand.join(broadcast(stats))
    weight_terms = [
        F.when(
            F.col(f"agree_{f}") == 1,
            F.log(F.lit(float(m))) - F.log(F.col(f"u_{f}")),
        ).otherwise(
            F.log(F.lit(1.0 - float(m))) - F.log(F.lit(1.0) - F.col(f"u_{f}"))
        )
        for f, m in m_probs.items()
    ]
    score = weight_terms[0]
    for t in weight_terms[1:]:
        score = score + t
    return (
        scored.withColumn("score", F.round(score, round_to))
        .where(F.col("score") >= threshold)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            *[F.col(f"agree_{f}") for f in fields],
            *[F.round(F.col(f"u_{f}"), round_to).alias(f"u_{f}") for f in fields],
            "score",
        )
    )
