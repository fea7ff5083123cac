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


def bm25_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
    top_k: int = 20,
) -> DataFrame:
    """BM25 ranking of documents against a fixed query-term set — the
    classic retrieval scorer over the same two-shuffle shape as
    TF-IDF.

    Plan: tokenize once, keep only query terms (map-side filter — the
    corpus shrinks before any shuffle), tf per (doc, term); df per
    term and the corpus length stats are tiny aggregates CROSS-JOINED
    back (broadcast, one row / |q| rows); the score is a pure
    projection, top-k via one WindowGroupLimit-bounded sort. Scores
    round to ``round_to`` so cross-engine float (ln) noise cannot
    flip the hash; ranking ties break by doc id.
    """
    from nass_summary_spark.functions.text import words

    toks = df.select(F.col(id_col).alias("id"), F.explode(words(text_col)).alias("term"))
    dl = toks.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    qt = toks.where(F.col("term").isin(query_terms))
    tf = qt.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0).alias("idf"),
        "avgdl",
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "id")
        .withColumn(
            "__s",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("id")
        .agg(F.round(F.sum("__s"), round_to).alias("bm25"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("bm25").desc(), F.col("id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("id", "bm25", "rank")
    )


def cooccurrence_pmi(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 10,
    top_pairs: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Word-association mining: pointwise mutual information over
    within-document co-occurrence of frequent terms.

    Scale shape: the vocabulary is cut to document frequency ≥
    ``min_df`` FIRST and broadcast back, so the quadratic
    within-doc pair join runs over frequent-term presence rows only
    (pairs per doc ≤ (frequent terms per doc)², not (all words)²).
    PMI = ln(n_ab·N / (n_a·n_b)) on distinct-presence counts; rank
    orders by the ROUNDED score (+ lexicographic tie-break) so the
    top-``top_pairs`` cut is identical on every engine.
    """
    from pyspark.sql import Window

    from nass_summary_spark.functions.text import words

    pres = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(words(text_col))).alias("w"),
    )
    freq = pres.groupBy("w").agg(F.count(F.lit(1)).alias("dfw")).where(
        F.col("dfw") >= min_df
    )
    wf = pres.join(F.broadcast(freq), "w")
    n_docs = df.select(F.col(id_col)).agg(F.count(F.lit(1)).cast("double").alias("n"))
    pairs = (
        wf.alias("a")
        .join(
            wf.alias("b"),
            (F.col("a.id") == F.col("b.id")) & (F.col("a.w") < F.col("b.w")),
        )
        .groupBy(
            F.col("a.w").alias("w1"),
            F.col("b.w").alias("w2"),
            F.col("a.dfw").alias("df1"),
            F.col("b.dfw").alias("df2"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    scored = pairs.crossJoin(F.broadcast(n_docs)).select(
        "w1",
        "w2",
        F.col("n_ab").cast("bigint").alias("n_ab"),
        F.round(
            F.log(F.col("n_ab") * F.col("n") / (F.col("df1") * F.col("df2"))), round_to
        ).alias("pmi"),
    )
    w = Window.orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_pairs)
        .select("w1", "w2", "n_ab", "pmi", "rank")
    )


def vocab_coverage(
    df: DataFrame,
    group_col: str,
    text_col: str,
    ks: list[int],
    round_to: int = 6,
) -> DataFrame:
    """Vocabulary coverage curve per group: what share of all token
    occurrences the top-k vocabulary entries cover, at each budget k
    — the Zipf readout a tokenizer/vocab-budget decision reads first
    (BPE merges, OOV policies, and stopword cuts are all bets on
    this curve's shape).

    One corpus-wide combinable (group, word) histogram shuffle; the
    ranking window and the k-budget explode run over the
    vocabulary-sized relation. Deterministic rank order (count desc,
    word asc); budgets larger than the vocabulary saturate at
    coverage 1. All integer sums + one closing division.

    Output: ``(group, k, n_vocab, covered, total, coverage)``.
    """
    from nass_summary_spark.functions.text import words

    hist = (
        df.select(
            F.col(group_col).alias("grp"),
            F.explode(words(F.col(text_col))).alias("w"),
        )
        .groupBy("grp", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w_rank = Window.partitionBy("grp").orderBy(
        F.col("cnt").desc(), F.col("w").asc()
    )
    ranked = hist.select(
        "grp", "cnt", F.row_number().over(w_rank).alias("rn")
    ).persist()
    tot = ranked.groupBy("grp").agg(
        F.sum("cnt").cast("bigint").alias("total")
    )
    kdf = F.explode(F.array(*[F.lit(int(k)) for k in ks])).alias("k")
    cov = (
        ranked.select("grp", "cnt", "rn", kdf)
        .where(F.col("rn") <= F.col("k"))
        .groupBy("grp", "k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vocab"),
            F.sum("cnt").cast("bigint").alias("covered"),
        )
    )
    return (
        cov.join(F.broadcast(tot), "grp")
        .select(
            F.col("grp").alias(group_col),
            F.col("k").cast("int").alias("k"),
            "n_vocab",
            "covered",
            "total",
            F.round(
                F.col("covered").cast("double")
                / F.col("total").cast("double"),
                round_to,
            ).alias("coverage"),
        )
        .orderBy(group_col, "k")
    )
