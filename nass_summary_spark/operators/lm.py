"""Corpus-trained n-gram language-model perplexity scoring — the
CCNet/KenLM-style perplexity filter (Wenzek et al. 2020) every
web-scale curation pipeline runs, expressed as pure relational
algebra so it stays JVM-side and oracle-checkable.

Model: add-one-smoothed bigram LM trained on the corpus itself
(or any reference corpus passed separately):

    p(b | a) = (C(a b) + 1) / (C(a) + V)

where V is the unigram vocabulary size.  Scoring a document is then
one equi-join of its adjacent word pairs against the bigram-count
relation plus the unigram-count relation, followed by a per-doc
aggregate of −ln p and ``ppl = exp(mean(−ln p))``.

Scale shape: training is two partially-aggregated count shuffles
(vocabulary-sized exchanges, same as every dedup op's digest
shuffle).  Scoring joins on the gram string — the count relations
are vocabulary-sized, NOT corpus-sized, so at 100 TB they are either
broadcast (small vocab) or hash-joined on a key whose cardinality the
Zipf law keeps millions, not billions.  No Python anywhere: words,
grams, joins, ln/exp are all Catalyst expressions.

Cross-engine determinism: per-term ``ln`` may differ by an ULP
between engines; the per-doc average of a few hundred terms carries
~1e-13 relative noise, so the emitted perplexity is rounded to 4 dp
— far above the noise floor, far below any curation threshold's
sensitivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nass_summary_spark.functions.text import ngrams_from_words, words


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    w = words(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.explode(ngrams_from_words(w, 2)).alias("gram"),
    ).withColumn("head", F.split(F.col("gram"), " ")[0])


def ngram_lm_perplexity(
    score_df: DataFrame,
    id_col: str,
    text_col: str,
    train_df: DataFrame | None = None,
    train_text_col: str | None = None,
    round_dp: int = 4,
) -> DataFrame:
    """Per-document bigram perplexity under an add-one-smoothed LM
    trained on ``train_df`` (defaults to ``score_df`` itself — the
    self-scoring mode curation pipelines use to find outlier docs).

    Returns (id, n_bigrams, ppl): docs with < 2 words are dropped
    (no bigram evidence), matching the oracle's WHERE.
    """
    train_df = train_df if train_df is not None else score_df
    train_text_col = train_text_col or text_col

    tw = words(F.col(train_text_col))
    uni = (
        train_df.select(F.explode(tw).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_uni"))
    )
    bi = (
        train_df.select(F.explode(ngrams_from_words(tw, 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c_bi"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))

    scored = (
        _doc_bigrams(score_df, id_col, text_col)
        .join(bi, "gram", "left")
        .join(uni.withColumnRenamed("w", "head"), "head", "left")
        .join(F.broadcast(vocab))
        .select(
            id_col,
            (
                F.log(
                    (F.coalesce(F.col("c_bi"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("c_uni"), F.lit(0)) + F.col("v")).cast(
                        "double"
                    )
                )
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.exp(-F.avg("lp")), round_dp).alias("ppl"),
        )
        .where(F.col("n_bigrams") > 0)
    )
