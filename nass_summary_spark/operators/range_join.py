"""Range join: match fact values into [lo, hi) interval tables.

Spark's native plan for ``f.value >= r.lo AND f.value < r.hi`` is a
broadcast nested-loop join — fine when the interval table fits in
memory, quadratic disaster otherwise. The scale path decomposes
intervals into fixed-width buckets:

1. each interval explodes into the buckets it covers
   (``sequence(floor(lo/w), floor((hi-ε)/w))`` — built-in, map-side),
2. each fact row computes its single bucket ``floor(value/w)``,
3. an ordinary hash equi-join on the bucket id,
4. the residual predicate ``lo <= value < hi`` filters edge buckets.

Because a fact row belongs to exactly ONE bucket, a (fact, interval)
match surfaces at most once — no dedup pass. Shuffle keys are ints;
the join parallelizes over buckets whatever the interval table's
size. This is the classic interval-bucketing strategy used by
distributed range-join implementations.

The reference has no interval surface (its joins are exact-key year
joins); this fills the same gap as `asof.py` for the other common
time/measure join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    l_lo: str,
    l_hi: str,
    right: DataFrame,
    r_lo: str,
    r_hi: str,
    bucket_width: float,
    broadcast_right: bool = False,
) -> DataFrame:
    """All (left, right) pairs whose half-open intervals overlap
    (``l_lo < r_hi AND r_lo < l_hi``) — the interval×interval
    companion of :func:`range_join_bucketed` (point×interval).

    Same bucket decomposition, plus the CANONICAL-BUCKET trick that
    makes dedup-free pair generation work when BOTH sides span many
    buckets: a pair overlapping in several shared buckets is emitted
    only from the bucket containing the overlap START
    (``greatest(l_lo, r_lo)``) — that point lies in exactly one
    bucket, and both intervals cover it whenever the overlap is
    non-empty, so every qualifying pair surfaces exactly once and no
    ``distinct`` pass (an extra full shuffle of the output) is
    needed.  Shuffle keys are bucket ints; work parallelizes over
    buckets regardless of either table's size.  Empty intervals
    (``lo >= hi``) can never overlap and are dropped before the
    explode (also keeps ``sequence`` ascending).

    Bucket enumeration runs to ``floor(hi / w)`` INCLUSIVE — no
    epsilon.  When ``hi`` sits exactly on a bucket boundary that
    enumerates one bucket the half-open interval doesn't truly
    touch, but that bucket can never emit a pair: any overlap start
    is strictly below ``hi``, so its canonical bucket is strictly
    below a boundary-exact ``floor(hi / w)``.  The alternative (an
    epsilon subtracted from ``hi``) silently broke intervals shorter
    than the epsilon (descending ``sequence`` → spurious buckets)
    and could skip the canonical bucket when the overlap start lay
    within the epsilon of an interval end — exactness beats the one
    extra exploded row.  ``floor(hi/w) >= floor(lo/w)`` whenever
    ``lo < hi``, so the sequence is ascending by construction.

    Column names must be disjoint between the two inputs (alias
    before calling).  Returns left columns + right columns.
    """
    w = float(bucket_width)

    def buckets(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.where(F.col(lo) < F.col(hi)).withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / F.lit(w)).cast("long"),
                    F.floor(F.col(hi) / F.lit(w)).cast("long"),
                )
            ),
        )
    lv = buckets(left, l_lo, l_hi)
    rv = buckets(right, r_lo, r_hi)
    if broadcast_right:
        rv = F.broadcast(rv)
    out = lv.join(
        rv,
        (lv["__bucket"] == rv["__bucket"])
        & (F.col(l_lo) < F.col(r_hi))
        & (F.col(r_lo) < F.col(l_hi))
        & (
            lv["__bucket"]
            == F.floor(F.greatest(F.col(l_lo), F.col(r_lo)) / F.lit(w)).cast("long")
        ),
        "inner",
    )
    return out.drop("__bucket")


def range_join_bucketed(
    fact: DataFrame,
    value_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Join each fact row to every interval with ``lo <= value < hi``
    via fixed-width bucket decomposition (see module docstring).

    ``bucket_width`` should be on the order of typical interval width:
    too small explodes the interval table, too large weakens bucket
    pruning. Returns fact columns + interval columns.

    Set ``broadcast_intervals=True`` when the interval table is
    dimension-sized: without the hint Spark cannot size a local/
    in-memory interval relation and may pick the FACT side as the
    broadcast build — exactly wrong at scale. Leave False for huge
    interval tables (both sides then shuffle on the bucket id).
    """
    w = float(bucket_width)
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
                # enumeration runs to floor(hi/w) INCLUSIVE — no
                # epsilon (the same fix as interval_overlap_join: an
                # epsilon subtracted from hi broke sub-epsilon
                # intervals with a descending sequence and could skip
                # the bucket of a fact value within epsilon of hi).
                # When hi sits exactly on a bucket edge the extra
                # bucket can't match: any qualifying value is
                # strictly below hi, so its bucket is strictly below
                # a boundary-exact floor(hi/w); the exact residual
                # predicate below governs correctness either way.
                F.floor(F.col(hi_col) / F.lit(w)).cast("long"),
            )
        ),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    f = fact.withColumn("__bucket", F.floor(F.col(value_col) / F.lit(w)).cast("long"))
    out = f.join(
        iv,
        (f["__bucket"] == iv["__bucket"])
        & (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) < F.col(hi_col)),
        how,
    )
    return out.drop("__bucket")
