"""Linear text-classifier inference at corpus scale (B50).

Web-scale curation pipelines (CCNet-style) score every document with
a linear model over hashed n-gram features — fastText's
architecture: bucket each unigram/bigram into a fixed-width hashed
feature space, sum the bucket weights, squash. This operator runs
that INFERENCE step Spark-first:

- featurize with built-ins only: `ngrams_from_words` + `explode` +
  the portable md5 bucket hash (`token_hash64 % n_buckets`) — the
  explode stays map-side and the weight sum partial-aggregates
  before the one shuffle per scoring pass, so the plan is a linear
  scan whatever the corpus size;
- the model is a WEIGHT LOOKUP, not data: here weights come from a
  deterministic integer formula (replayable in the DuckDB oracle);
  swapping in trained weights means broadcasting a
  (bucket → weight) map or generating a `CASE`/array literal —
  either way model-sized, never a per-row UDF;
- FP discipline: per-gram weights are INTEGER numerators summed
  exactly as BIGINT (order-independent), converted to double once
  per document for the sigmoid, and the probability is rounded so
  cross-engine `exp()` ULP noise cannot flip a value hash (the
  same convention as the BM25/PMI scorers).

The reference has no ML surface; this extends §2's curation block
the way dedup/sampling/packing do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nass_summary_spark.functions.text import ngrams_from_words, words
from nass_summary_spark.functions.vectors import token_hash64

#: hashed feature-space width (fastText default order of magnitude)
N_BUCKETS = 4096
#: prime modulus for the deterministic weight formula
_W_MOD = 1000003
#: Knuth multiplicative constant — spreads buckets over the modulus
_W_MULT = 2654435761
#: centering shift: weights ≈ uniform in [-0.5, 0.5) after /_W_MOD
_W_SHIFT = _W_MOD // 2
#: logit scale + bias of the shipped model
_SCALE = 16.0
_BIAS = 0.05


def feature_bucket(gram: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Hashed feature id: portable md5 bucket (non-negative)."""
    return F.pmod(token_hash64(gram, bits=48), F.lit(n_buckets))


def weight_numerator(bucket: Column) -> Column:
    """Deterministic integer weight numerator for a bucket; the real
    weight is ``numerator / _W_MOD`` ∈ [-0.5, 0.5)."""
    return (bucket * F.lit(_W_MULT)) % F.lit(_W_MOD) - F.lit(_W_SHIFT)


def score_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = N_BUCKETS,
    threshold: float = 0.5,
) -> DataFrame:
    """Per-document quality probability + keep flag.

    Features = unigram and bigram OCCURRENCES (not distinct — token
    repetition is signal for quality models). One explode + one
    partially-aggregated shuffle keyed by doc id; weight sums stay
    exact BIGINTs until the final per-doc sigmoid.
    Output: id, n_feats, quality_prob (6 dp), keep.
    """
    ws = words(text_col)
    grams = F.concat(ws, ngrams_from_words(ws, 2))
    exploded = df.select(
        F.col(id_col).alias("id"), F.explode(grams).alias("gram")
    )
    scored = (
        exploded.select(
            "id", weight_numerator(feature_bucket(F.col("gram"), n_buckets)).alias("wnum")
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("wnum").alias("snum"),
        )
    )
    logit = F.lit(_BIAS) + F.col("snum").cast("double") / F.lit(float(_W_MOD) * _SCALE)
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
    return scored.select(
        "id",
        "n_feats",
        prob.alias("quality_prob"),
        (prob >= F.lit(threshold)).alias("keep"),
    )


def score_columns(text_col: Column | str, n_buckets: int = N_BUCKETS) -> tuple[Column, Column]:
    """Per-ROW scoring expressions ``(n_feats, quality_prob)`` —
    identical arithmetic to :func:`score_documents` (integer weight
    numerators summed exactly; addition is commutative over BIGINT so
    the HOF fold and the shuffle aggregation provably agree), but as
    a pure projection with NO shuffle.  This is the form the
    STREAMING quality gate runs: stateless, append-mode, no
    aggregation state — and the form a cluster prefers whenever
    per-doc scoring feeds a filter rather than an analytics join.
    Tests pin it equal to the aggregated path row-for-row."""
    tc = F.col(text_col) if isinstance(text_col, str) else text_col
    ws = words(tc)
    grams = F.concat(ws, ngrams_from_words(ws, 2))
    snum = F.aggregate(
        F.transform(grams, lambda g: weight_numerator(feature_bucket(g, n_buckets))),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    n_feats = F.size(grams).cast("bigint")
    logit = F.lit(_BIAS) + snum.cast("double") / F.lit(float(_W_MOD) * _SCALE)
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
    return n_feats, prob
