"""TF-IDF top-terms per document (SURVEY.md §2 B25).

The classic corpus-statistics operator a training-data pipeline needs
for keyword extraction / topical filtering. Spark-first shape:

- tokens: ``explode(words(text))`` — map-side, no UDF;
- term frequency: one ``groupBy(doc_id, term)`` shuffle;
- document frequency: one ``groupBy(term)`` over the (already
  doc-distinct) tf rows — counts docs, not occurrences;
- corpus size N: a single-row aggregate cross-joined back (broadcast
  by AQE; never a driver-side ``collect``);
- score: smoothed idf ``ln((N+1)/(df+1))`` in pure double math,
  rounded so the DuckDB oracle hashes identically;
- top-k: per-doc ``row_number`` window ordered by (rounded score
  desc, term asc) — deterministic tie-break.

Scale: the tf table is the big intermediate (docs × distinct terms);
both groupBys are partial-aggregated map-side. The df table is
vocabulary-sized; the tf⋈df join reuses the ``term`` hash
partitioning from df's own shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nass_summary_spark.functions.text import words


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF.

    Output: (doc_id, term, tfidf, rnk) with rnk in 1..k.
    """
    tokens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(text_col)).alias("term"),
    )
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf").cast("double")
                * F.log(
                    (F.col("n_docs").cast("double") + F.lit(1.0))
                    / (F.col("df").cast("double") + F.lit(1.0))
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("doc_id", "term", "tfidf", "rnk")
    )


def inverted_index(
    df: DataFrame, id_col: str, text_col: str, min_df: int = 1
) -> DataFrame:
    """Build an inverted index: term → document frequency + the
    posting list (doc_id:tf pairs, doc-id-ordered) — the retrieval
    complement of TF-IDF ranking and rank fusion.

    Two partial-aggregated shuffles (term-doc tf, then term), exactly
    the TF-IDF shape; the posting list is sorted per term with
    ``array_sort`` so output is partition-order independent. The
    postings column is emitted as a canonical string (not an array)
    so results stay hashable/comparable across engines; ``min_df``
    drops hapax terms (at corpus scale the long tail dominates index
    size — the knob every real index build exposes).
    """
    from nass_summary_spark.functions.text import words

    terms = df.select(
        F.col(id_col).alias("id"), F.explode(words(text_col)).alias("term")
    )
    tf = terms.groupBy("term", "id").agg(F.count(F.lit(1)).alias("tf"))
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("id"), F.col("tf")))),
                    lambda s: F.concat_ws(":", s["id"].cast("string"), s["tf"].cast("string")),
                ),
                ",",
            ).alias("postings"),
        )
        .where(F.col("df") >= min_df)
    )
