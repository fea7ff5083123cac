"""Tests for the r3 post-window additions: heavy hitters (B53),
covariance/PCA (B51), PQ ANN (B52), BPE induction (B54), weighted
median (A35), LM perplexity (B55), PageRank (B56), KL drift (B57),
fuzzy join (B58), MAD outliers (A36), trend slopes (B59), and the
per-row classifier scoring behind the C12 stream gate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# heavy hitters
# ---------------------------------------------------------------------------

def test_heavy_hitters_matches_exact_groupby(spark):
    """MG candidates + verify must equal the naive exact group-by,
    on a skewed stream where the sketch actually evicts (k=3 counters
    over 12 distinct items across 4 partitions)."""
    from nass_summary_spark.operators.sketches import heavy_hitters

    rows = (
        [("hot",)] * 300
        + [("warm",)] * 120
        + [(f"tail{i}",) for i in range(10) for _ in range(8)]
    )
    df = spark.createDataFrame(rows, ["item"]).repartition(4)
    n = len(rows)  # 500
    # support 1/5 -> threshold 100: {hot, warm}
    got = {r["item"]: r["cnt"] for r in heavy_hitters(
        df, "item", support_num=1, support_den=5, mg_counters=6
    ).collect()}
    assert got == {"hot": 300, "warm": 120}
    # exact counts, not MG estimates
    assert sum(got.values()) <= n


def test_grouped_topk_sketch_matches_exact_topk(spark):
    """Per-group MG sketch + exact recount must equal the naive
    per-group top-k on skewed streams where the sketch actually
    evicts (8 counters, 40+ distinct items per group across 4
    partitions), with deterministic ties and group isolation."""
    from nass_summary_spark.operators.sketches import grouped_topk_sketch

    rows = (
        [("A", "x")] * 50 + [("A", "y")] * 30
        + [("A", f"za{i}") for i in range(40)]
        + [("B", "p")] * 25 + [("B", "q")] * 25
        + [("B", f"zb{i}") for i in range(45)]
    )
    df = spark.createDataFrame(rows, ["g", "item"]).repartition(4)
    got = {
        (r["g"], r["rnk"]): (r["item"], r["cnt"])
        for r in grouped_topk_sketch(df, "g", "item", k=2, mg_counters=8).collect()
    }
    assert got == {
        ("A", 1): ("x", 50), ("A", 2): ("y", 30),
        ("B", 1): ("p", 25), ("B", 2): ("q", 25),  # tie → item asc
    }


def test_heavy_hitters_rejects_unsound_counter_budget(spark):
    from nass_summary_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([("a",)], ["item"])
    with pytest.raises(ValueError):
        heavy_hitters(df, "item", support_num=1, support_den=10, mg_counters=10)


def test_heavy_hitters_threshold_is_integer_exact(spark):
    """An item exactly at the threshold is reported (>=), one below
    is not — integer arithmetic, no FP wobble."""
    from nass_summary_spark.operators.sketches import heavy_hitters

    # N = 10, support 1/5 -> threshold 2
    rows = [("a",)] * 2 + [("b",)] * 1 + [(f"c{i}",) for i in range(7)]
    df = spark.createDataFrame(rows, ["item"]).repartition(2)
    got = {r["item"] for r in heavy_hitters(
        df, "item", support_num=1, support_den=5, mg_counters=8
    ).collect()}
    assert "a" in got and "b" not in got


# ---------------------------------------------------------------------------
# covariance / PCA
# ---------------------------------------------------------------------------

def _emb_df(spark, n=60, d=6, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic: dim 0 has 4x the stddev so PCA order is unambiguous
    x = rng.normal(size=(n, d)) * np.array([4.0, 2.0, 1.0, 0.5, 0.25, 0.1])
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]), x


def test_covariance_long_matches_numpy(spark):
    from nass_summary_spark.operators.linalg import covariance_long

    df, x = _emb_df(spark)
    got = {(r["i"], r["j"]): r["cov"] for r in
           covariance_long(df, "embedding", 6, round_dp=10).collect()}
    ref = np.cov(x, rowvar=False, bias=True)  # population (/n)
    assert len(got) == 6 * 7 // 2
    for (i, j), v in got.items():
        assert i <= j
        assert v == pytest.approx(ref[i][j], abs=1e-9)


def test_pca_model_components_orthonormal_and_ordered(spark):
    from nass_summary_spark.operators.linalg import pca_model

    df, x = _emb_df(spark)
    mean, comps, evals = pca_model(df, "embedding", 6, k=4)
    assert np.allclose(mean, x.mean(axis=0), atol=1e-12)
    c = np.array(comps)
    assert np.allclose(c @ c.T, np.eye(4), atol=1e-9)  # orthonormal
    assert evals == sorted(evals, reverse=True)
    # dominant direction is dim 0 (4x stddev)
    assert abs(c[0][0]) > 0.9


def test_pca_project_variance_matches_eigenvalues(spark):
    from nass_summary_spark.operators.linalg import pca_model, pca_project

    df, x = _emb_df(spark)
    mean, comps, evals = pca_model(df, "embedding", 6, k=3)
    out = pca_project(df, "vec_id", "embedding", mean, comps, round_dp=9)
    pcs = np.array(
        [[r["pc0"], r["pc1"], r["pc2"]] for r in out.orderBy("vec_id").collect()]
    )
    var = pcs.var(axis=0)  # population variance; projection is centred
    for k in range(3):
        assert var[k] == pytest.approx(evals[k], rel=1e-6)
    assert var[0] >= var[1] >= var[2]


# ---------------------------------------------------------------------------
# PQ ANN
# ---------------------------------------------------------------------------

def test_pq_encode_roundtrip_shape(spark):
    from nass_summary_spark.operators.pq import pq_encode, pq_train

    df, _ = _emb_df(spark, n=40, d=6)
    books = pq_train(df, "vec_id", "embedding", dim=6, m=2, ksub=4, n_iter=2)
    assert len(books) == 2 and len(books[0]) == 4 and len(books[0][0]) == 3
    codes = pq_encode(df, "vec_id", "embedding", books)
    rows = codes.collect()
    assert len(rows) == 40
    for r in rows:
        assert 0 <= r["code0"] < 4 and 0 <= r["code1"] < 4


def test_pq_encode_arrow_matches_hof(spark, sf_dir):
    """The Arrow-batched encode (production path) and the pure-HOF
    Catalyst expression must produce identical codes — same pin as
    the geometry clip's two paths."""
    from nass_summary_spark.operators.pq import pq_encode, pq_train

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    books = pq_train(emb, "vec_id", "embedding", 64, m=4, ksub=8, n_iter=2)
    a = sorted(map(tuple, pq_encode(
        emb, "vec_id", "embedding", books, arrow=True).collect()))
    h = sorted(map(tuple, pq_encode(
        emb, "vec_id", "embedding", books, arrow=False).collect()))
    assert a == h


def test_ann_topk_pq_recall_vs_bruteforce(spark, sf_dir):
    """PQ ADC + exact re-rank on the real embeddings table: recall@5
    against the exact cosine baseline.  These embeddings are
    isotropic random — PQ's worst case (nothing to quantize), so the
    bar is set there: shortlist R=100 of 500 must deliver >= 0.5.
    Real manifold-structured corpora do far better at the same
    budget."""
    from nass_summary_spark.operators.pq import ann_topk_pq
    from nass_summary_spark.operators.similarity import knn_bruteforce

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             knn_bruteforce(emb, q, "vec_id", "embedding", k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in ann_topk_pq(
        emb, q, "vec_id", "embedding", dim=64, k=5, m=8, ksub=16,
        n_iter=2, rerank=100,
    ).collect()}
    assert len(approx) == len(exact) == 25
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"PQ recall@5 too low: {recall}"


def test_ann_topk_pq_rerank_subset_of_adc_shortlist(spark, sf_dir):
    """The reranked top-k must be drawn from the ADC shortlist (the
    refine stage only reorders, never widens)."""
    from nass_summary_spark.operators.pq import ann_topk_pq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 2)
    adc = {(r["query_id"], r["neighbor_id"]) for r in ann_topk_pq(
        emb, q, "vec_id", "embedding", dim=64, k=30, m=8, ksub=16, n_iter=2
    ).collect()}
    rr = {(r["query_id"], r["neighbor_id"]) for r in ann_topk_pq(
        emb, q, "vec_id", "embedding", dim=64, k=5, m=8, ksub=16,
        n_iter=2, rerank=30,
    ).collect()}
    assert rr <= adc


def test_ann_topk_pq_join_lut_path_matches_collect_path(spark, sf_dir):
    """collect_queries=False computes the ADC LUTs as expressions over
    the query relation instead of a driver collect: same codebooks,
    same math → the returned (query, neighbor, rnk) must be identical
    (approx_dist2 to float tolerance; rounding both to 6 dp makes
    summation-order noise invisible)."""
    from nass_summary_spark.operators.pq import ann_topk_pq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    kw = dict(dim=64, k=5, m=8, ksub=16, n_iter=2)
    a = {(r["query_id"], r["neighbor_id"], r["rnk"]): r["approx_dist2"]
         for r in ann_topk_pq(emb, q, "vec_id", "embedding", **kw).collect()}
    b = {(r["query_id"], r["neighbor_id"], r["rnk"]): r["approx_dist2"]
         for r in ann_topk_pq(emb, q, "vec_id", "embedding",
                              collect_queries=False, **kw).collect()}
    assert a.keys() == b.keys()
    for key in a:
        assert a[key] == pytest.approx(b[key], abs=1e-5)


def test_ann_topk_ivfpq_join_lut_path_matches_collect_path(spark, sf_dir):
    """IVFADC with distributed probe assignment + LUT build must equal
    the collect path pair-for-pair (including the rerank stage)."""
    from nass_summary_spark.operators.pq import ann_topk_ivfpq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    kw = dict(dim=64, k=5, n_cells=8, nprobe=3, m=8, ksub=16,
              n_iter=2, rerank=30)
    a = {(r["query_id"], r["neighbor_id"], r["rnk"]) for r in
         ann_topk_ivfpq(emb, q, "vec_id", "embedding", **kw).collect()}
    b = {(r["query_id"], r["neighbor_id"], r["rnk"]) for r in
         ann_topk_ivfpq(emb, q, "vec_id", "embedding",
                        collect_queries=False, **kw).collect()}
    assert a == b


def test_pq_auto_mode_selects_and_matches_both_sides(spark, sf_dir, monkeypatch):
    """collect_queries="auto" (the default) must produce identical
    results whichever side of the query-count threshold it lands on:
    with the threshold above nq it takes the collect path, with the
    threshold monkeypatched below nq it takes the distributed-LUT
    path — both must equal the explicit paths."""
    from nass_summary_spark.operators import pq as pq_mod

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    kw = dict(dim=64, k=5, m=8, ksub=16, n_iter=2)

    def result(**extra):
        return {
            (r["query_id"], r["neighbor_id"], r["rnk"])
            for r in pq_mod.ann_topk_pq(
                emb, q, "vec_id", "embedding", **kw, **extra
            ).collect()
        }

    explicit = result(collect_queries=True)
    assert result() == explicit  # auto → collect (nq=3 < 4096)
    monkeypatch.setattr(pq_mod, "AUTO_COLLECT_MAX_QUERIES", 1)
    assert result() == explicit  # auto → distributed (nq=3 > 1)


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------

def test_bpe_train_learns_frequent_pair_and_is_deterministic(spark):
    from nass_summary_spark.operators.bpe import bpe_train

    df = spark.createDataFrame(
        [("the cat the hat the mat",), ("the bat the rat",)], ["text"]
    )
    m1 = bpe_train(df, "text", n_merges=10, max_words=100)
    m2 = bpe_train(df, "text", n_merges=10, max_words=100)
    assert m1 == m2  # deterministic
    # 'the' appears 6x: its internal pairs must be merged early
    joined = ["".join(p) for p in m1]
    assert any("th" in t or "he" in t for t in joined[:2])


def test_bpe_encode_word_roundtrip_and_bound():
    from nass_summary_spark.operators.bpe import EOW, encode_word

    ranks = {("t", "h"): 0, ("th", "e"): 1, ("the", EOW): 2}
    toks = encode_word("the", ranks)
    assert "".join(toks) == "the" + EOW  # lossless
    assert toks == ["the" + EOW]
    toks2 = encode_word("thx", ranks)
    assert "".join(toks2) == "thx" + EOW
    assert len(toks2) <= len("thx") + 1  # never longer than chars+EOW


def test_bpe_encode_dataframe_counts(spark):
    from nass_summary_spark.operators.bpe import bpe_encode, bpe_train

    df = spark.createDataFrame(
        [(1, "aaa aaa aaa"), (2, "aaa bbb")], ["doc_id", "text"]
    )
    merges = bpe_train(df, "text", n_merges=5, max_words=10)
    out = {r["doc_id"]: r for r in
           bpe_encode(df, "doc_id", "text", merges).collect()}
    assert out[1]["n_words"] == 3 and out[2]["n_words"] == 2
    # 'aaa' occurs 4x -> fully merged into one token
    assert out[1]["n_bpe_tokens"] == 3
    assert out[1]["n_unique_tokens"] == 1


def test_bpe_encode_tokenizes_identically_to_train_on_unicode(spark):
    """Train and encode must share ONE tokenization: NBSP-separated
    text (Python .split() would split it; JVM \\s+ does not) and
    uppercase input must produce word segmentation identical to the
    words() column function that word_counts uses."""
    from nass_summary_spark.functions.text import words
    from pyspark.sql import functions as F

    from nass_summary_spark.operators.bpe import bpe_encode, bpe_train

    df = spark.createDataFrame(
        [(1, "AAA aaa aaa"), (2, "aaa bbb")], ["doc_id", "text"]
    )
    merges = bpe_train(df, "text", n_merges=5, max_words=10)
    got = {r["doc_id"]: r["n_words"] for r in
           bpe_encode(df, "doc_id", "text", merges).collect()}
    want = {r["doc_id"]: r["nw"] for r in
            df.select("doc_id", F.size(words(F.col("text"))).alias("nw")).collect()}
    assert got == want  # JVM \s+ keeps NBSP-joined words single on BOTH paths


# ---------------------------------------------------------------------------
# weighted median
# ---------------------------------------------------------------------------

def test_weighted_median_hand_computed(spark):
    from nass_summary_spark.operators.stats import weighted_median

    # group a: values 1(w3), 5(w1), 9(w2) -> total 6, half 3 -> cum at
    # v=1 is 3, 2*3 >= 6 -> lower weighted median = 1
    # group b: values 2(w1), 4(w1), 6(w1) -> cum at 4 is 2, 2*2 >= 3
    rows = [("a", 1.0, 3.0), ("a", 5.0, 1.0), ("a", 9.0, 2.0),
            ("b", 2.0, 1.0), ("b", 4.0, 1.0), ("b", 6.0, 1.0)]
    df = spark.createDataFrame(rows, ["k", "v", "w"])
    got = {r["k"]: r["wmedian"] for r in
           weighted_median(df, ["k"], "v", "w").collect()}
    assert got == {"a": 1.0, "b": 4.0}


def test_weighted_median_tie_block_deterministic(spark):
    from nass_summary_spark.operators.stats import weighted_median

    # many equal values at the boundary: intra-tie window order must
    # not matter (run twice with different partitioning)
    rows = [("k", 3.0, 1.0)] * 10 + [("k", 7.0, 1.0)] * 10
    df1 = spark.createDataFrame(rows, ["k", "v", "w"]).repartition(7)
    df2 = spark.createDataFrame(list(reversed(rows)), ["k", "v", "w"]).repartition(2)
    m1 = weighted_median(df1, ["k"], "v", "w").collect()[0]["wmedian"]
    m2 = weighted_median(df2, ["k"], "v", "w").collect()[0]["wmedian"]
    assert m1 == m2 == 3.0  # lower weighted median at exact half


def test_weighted_stats_preserve_null_keyed_group(spark):
    """ADVICE r6: the totals join must be null-safe so a NULL-keyed
    group (a real group under groupBy semantics) survives instead of
    silently vanishing — pinned for both weighted_median and
    weighted_percentiles."""
    from nass_summary_spark.operators.stats import (
        weighted_median,
        weighted_percentiles,
    )

    rows = [("a", 1.0, 1.0), ("a", 3.0, 1.0),
            (None, 10.0, 1.0), (None, 20.0, 3.0)]
    df = spark.createDataFrame(rows, "k string, v double, w double")
    med = {r["k"]: r["wmedian"] for r in
           weighted_median(df, ["k"], "v", "w").collect()}
    # NULL group: total 4, cum at 20 is 4 (10 first), 2*1 < 4 at 10,
    # 2*4 >= 4 at 20 -> lower weighted median = 20
    assert med == {"a": 1.0, None: 20.0}
    pct = {r["k"]: r["p50"] for r in
           weighted_percentiles(df, ["k"], "v", "w", ps=(50,)).collect()}
    assert pct == {"a": 1.0, None: 20.0}


def test_weighted_median_equals_plain_median_unit_weights(spark):
    import numpy as np
    from nass_summary_spark.operators.stats import weighted_median

    vals = [float(x) for x in [9, 1, 7, 3, 5, 11, 13]]
    df = spark.createDataFrame([("g", v, 1.0) for v in vals], ["k", "v", "w"])
    got = weighted_median(df, ["k"], "v", "w").collect()[0]["wmedian"]
    assert got == float(np.median(vals))


# ---------------------------------------------------------------------------
# n-gram LM perplexity
# ---------------------------------------------------------------------------

def test_ngram_lm_perplexity_uniform_corpus(spark):
    """A corpus where every bigram is equally frequent: every doc
    gets the same perplexity, computable in closed form."""
    import math
    from nass_summary_spark.operators.lm import ngram_lm_perplexity

    # two docs, same text "a b a b": bigrams 'a b'(x2), 'b a'(x1) each
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b a b")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in
           ngram_lm_perplexity(docs, "doc_id", "text").collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_bigrams"] == 3
    assert out[1]["ppl"] == out[2]["ppl"]
    # V=2; C(a)=4, C(b)=4 per corpus... verify against direct math:
    # corpus counts: 'a b' 4, 'b a' 2; C(a)=4, C(b)=4 (2 docs)
    p_ab = (4 + 1) / (4 + 2)
    p_ba = (2 + 1) / (4 + 2)
    lp = (2 * math.log(p_ab) + math.log(p_ba)) / 3
    assert out[1]["ppl"] == pytest.approx(math.exp(-lp), abs=1e-3)


def test_ngram_lm_perplexity_flags_outlier_doc(spark):
    """A doc full of rare bigrams must score higher perplexity than
    docs made of the corpus's dominant pattern."""
    from nass_summary_spark.operators.lm import ngram_lm_perplexity

    common = [(i, "x y x y x y x y") for i in range(20)]
    outlier = [(99, "q w e r t z u i")]
    docs = spark.createDataFrame(common + outlier, ["doc_id", "text"])
    out = {r["doc_id"]: r["ppl"] for r in
           ngram_lm_perplexity(docs, "doc_id", "text").collect()}
    assert out[99] > 3 * out[0]


def test_ngram_lm_perplexity_short_docs_dropped(spark):
    from nass_summary_spark.operators.lm import ngram_lm_perplexity

    docs = spark.createDataFrame(
        [(1, "only"), (2, "two words")], ["doc_id", "text"]
    )
    out = {r["doc_id"] for r in
           ngram_lm_perplexity(docs, "doc_id", "text").collect()}
    assert out == {2}


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

def test_pagerank_matches_numpy_power_iteration(spark):
    from nass_summary_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (4, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r["rank"] for r in
           pagerank(df, n_iter=12).collect()}

    ids = sorted({n for e in edges for n in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    odeg = {}
    for s, _ in edges:
        odeg[s] = odeg.get(s, 0) + 1
    r = np.full(n, 1.0 / n)
    for _ in range(12):
        nxt = np.full(n, 0.15 / n)
        for s, d in edges:
            nxt[idx[d]] += 0.85 * r[idx[s]] / odeg[s]
        r = nxt
    for v in ids:
        assert got[v] == pytest.approx(r[idx[v]], abs=1e-12)


def test_pagerank_sums_to_one_without_dangling(spark):
    from nass_summary_spark.operators.graph import pagerank

    # symmetric edges: every node has out-degree >= 1, mass conserved
    base = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)]
    edges = base + [(b, a) for a, b in base]
    df = spark.createDataFrame(edges, ["src", "dst"])
    total = sum(r["rank"] for r in pagerank(df, n_iter=15).collect())
    assert total == pytest.approx(1.0, abs=1e-9)


def test_pagerank_fallback_mode_matches_and_never_broadcasts(spark):
    """broadcast_ranks=False is the documented beyond-broadcast-size
    escape hatch: values must be identical AND the physical plan must
    contain NO broadcast exchange/join of any node-sized relation —
    otherwise the fallback would OOM on the very graphs it targets."""
    from nass_summary_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (4, 1), (4, 3)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    want = {r["id"]: r["rank"] for r in pagerank(df, n_iter=8).collect()}
    fb = pagerank(df, n_iter=8, broadcast_ranks=False, checkpoint_every=0)
    got = {r["id"]: r["rank"] for r in fb.collect()}
    for v, r in want.items():
        assert got[v] == pytest.approx(r, abs=1e-12)
    # disable auto-broadcast so the assertion checks OUR hints, not
    # Catalyst's small-table threshold picking broadcast on toy data
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            pagerank(df, n_iter=3, broadcast_ranks=False, checkpoint_every=0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert "BroadcastExchange" not in plan
    assert "BroadcastHashJoin" not in plan


def test_triangle_counts_known_graph(spark):
    """Hand-checked graph: K4 on {1,2,3,4} (4 triangles, coeff 1.0
    everywhere) plus a pendant node 5 attached to 1 (degree 1, no
    triangle) and an isolated edge 6-7."""
    from nass_summary_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = k4 + [(5, 1), (6, 7), (7, 6), (1, 2)]  # dup + reversed dup
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r for r in triangle_counts(df).collect()}
    for v in (2, 3, 4):
        assert got[v]["n_tri"] == 3  # each K4 vertex is in 3 triangles
        assert got[v]["clustering_coeff"] == 1.0
    assert got[1]["degree"] == 4 and got[1]["n_tri"] == 3
    # node 1: 3 triangles among 4 neighbors -> 2*3/(4*3) = 0.5
    assert got[1]["clustering_coeff"] == pytest.approx(0.5)
    assert got[5]["n_tri"] == 0 and got[5]["clustering_coeff"] == 0.0
    assert got[6]["degree"] == 1 and got[7]["n_tri"] == 0


def test_triangle_counts_matches_naive_on_random_graph(spark):
    """Oriented enumeration vs a brute-force triple count on a
    random graph with a deliberate high-degree hub."""
    import itertools
    import random

    from nass_summary_spark.operators.graph import triangle_counts

    rng = random.Random(3)
    edges = {(min(a, b), max(a, b))
             for a, b in (sorted(rng.sample(range(30), 2)) for _ in range(120))}
    edges |= {(0, v) for v in range(1, 25)}  # hub
    df = spark.createDataFrame(sorted(edges), ["src", "dst"])
    got = {r["id"]: r["n_tri"] for r in triangle_counts(df).collect()}
    eset = set(edges)
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(range(30), 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    for v, n in want.items():
        assert got[v] == n
    # nodes in no triangle must report 0, so the totals match exactly
    assert sum(got.values()) == sum(want.values())
    assert sum(want.values()) > 0


def test_pagerank_hub_outranks_leaf(spark):
    from nass_summary_spark.operators.graph import pagerank

    # star: everyone links to 0, 0 links back to 1
    edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r["rank"] for r in pagerank(df, n_iter=20).collect()}
    assert got[0] > got[1] > got[2]


# ---------------------------------------------------------------------------
# source drift (KL)
# ---------------------------------------------------------------------------

def test_source_drift_flags_off_domain_slice(spark, sf_dir):
    """Two sources drawn from the same distribution score near-zero
    KL; an off-domain slice scores much higher."""
    from nass_summary_spark.plans.queries import QUERIES

    # build a temp documents table: a/b same distribution, c disjoint
    import tempfile, os
    rows = []
    for i in range(40):
        rows.append((i, "alpha beta gamma delta", "en", "src_a"))
        rows.append((100 + i, "alpha beta gamma delta", "en", "src_b"))
        rows.append((200 + i, "omega psi chi phi", "en", "src_c"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["source"]: r["kl"] for r in
               QUERIES["source_drift_kl"](spark, d).collect()}
    # a and b have identical token counts -> identical divergence
    # from the corpus mixture; the off-domain slice diverges much
    # more (each source is compared against the MIXTURE, so even
    # matching slices carry the mixture's cross-entropy floor)
    assert out["src_a"] == pytest.approx(out["src_b"], abs=1e-9)
    assert out["src_c"] > 2 * out["src_a"]
    assert all(v >= 0 for v in out.values())


# ---------------------------------------------------------------------------
# per-row classifier scoring (C12 building block)
# ---------------------------------------------------------------------------

def test_score_columns_matches_aggregated_path(spark, sf_dir):
    """The per-row HOF scoring (stream form) must equal the
    oracle-checked shuffle-aggregation path row-for-row."""
    from nass_summary_spark.operators.classifier import (
        score_columns,
        score_documents,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_feats, prob = score_columns("text")
    rowwise = {r["id"]: (r["n"], r["p"]) for r in docs.select(
        F.col("doc_id").alias("id"), n_feats.alias("n"), prob.alias("p")
    ).collect()}
    agg = {r["id"]: (r["n_feats"], r["quality_prob"]) for r in
           score_documents(docs, "doc_id", "text").collect()}
    assert rowwise == agg


# ---------------------------------------------------------------------------
# fuzzy join (deletion-neighborhood blocking)
# ---------------------------------------------------------------------------

def test_fuzzy_join_covers_all_edit1_kinds(spark):
    from nass_summary_spark.operators.fuzzy import fuzzy_join

    left = spark.createDataFrame(
        [(1, "cat"), (2, "hello"), (3, "spark")], ["lid", "ls"]
    )
    right = spark.createDataFrame(
        [(10, "cut"),    # substitution
         (11, "cats"),   # insertion
         (12, "ca"),     # deletion
         (13, "hello"),  # identical
         (14, "shark"),  # substitution (s_ark)
         (15, "xyzzy")], # unrelated
        ["rid", "rs"],
    )
    got = {(r["lid"], r["rid"]): r["dist"] for r in
           fuzzy_join(left, right, "lid", "ls", "rid", "rs").collect()}
    assert got == {(1, 10): 1, (1, 11): 1, (1, 12): 1, (2, 13): 0, (3, 14): 1}


def test_fuzzy_join_matches_naive_theta_join(spark):
    """Blocking + verify must equal the quadratic baseline on random
    short strings (completeness at r=1 is the theorem being pinned)."""
    import itertools
    from nass_summary_spark.operators.fuzzy import fuzzy_join

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a):
            cur = [i + 1]
            for j, cb in enumerate(b):
                cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (ca != cb)))
            prev = cur
        return prev[-1]

    import random
    rng = random.Random(42)
    strs = ["".join(rng.choice("ab") for _ in range(rng.randint(2, 4)))
            for _ in range(30)]
    df = spark.createDataFrame(list(enumerate(strs)), ["id", "s"])
    got = {(r["id"], r["id2"]) for r in fuzzy_join(
        df, df.select(F.col("id").alias("id2"), F.col("s").alias("s2")),
        "id", "s", "id2", "s2").collect()}
    want = {(i, j) for (i, a), (j, b) in
            itertools.product(enumerate(strs), repeat=2) if lev(a, b) <= 1}
    assert got == want


# ---------------------------------------------------------------------------
# MAD outliers
# ---------------------------------------------------------------------------

def test_skyline_2d_matches_bruteforce_with_ties_and_duplicates(spark):
    """Sweep-line skyline vs the quadratic dominance definition on a
    randomized set engineered with tied x, tied y, and exact
    duplicate points (duplicates of a frontier point must ALL
    survive; equal points never dominate each other)."""
    import random

    from nass_summary_spark.operators.skyline import skyline_2d

    rng = random.Random(11)
    pts = [(i, rng.randrange(0, 12), float(rng.randrange(0, 12))) for i in range(120)]
    pts += [(200, 11, 11.0), (201, 11, 11.0)]  # duplicate frontier point
    df = spark.createDataFrame(pts, ["pid", "x", "y"])
    got = sorted(r["pid"] for r in skyline_2d(df, "x", "y").collect())
    want = sorted(
        i
        for i, x, y in pts
        if not any(
            (x2 >= x and y2 >= y and (x2 > x or y2 > y))
            for _, x2, y2 in pts
        )
    )
    assert got == want
    assert {200, 201} <= set(got)


def test_ewma_smooth_matches_recursion(spark):
    """Closed-form per-row EWMA must equal the textbook recursion
    y1=x1, yt=(1-a)y(t-1)+a·xt on a hand-built two-key series, to
    the 6-dp rounding the operator applies."""
    from nass_summary_spark.operators.stats import ewma_smooth

    series = {"a": [10.0, 20.0, 10.0, 40.0], "b": [5.0, 5.0, 5.0]}
    rows = [(k, t, x) for k, xs in series.items() for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    got = {(r["k"], r["t"]): r["ewma"] for r in
           ewma_smooth(df, ["k"], "t", "x", alpha=0.2).collect()}
    for k, xs in series.items():
        y = xs[0]
        assert got[(k, 0)] == pytest.approx(y, abs=1e-6)
        for t in range(1, len(xs)):
            y = 0.8 * y + 0.2 * xs[t]
            assert got[(k, t)] == pytest.approx(y, abs=1e-6)


def test_mad_outliers_hand_computed(spark):
    from nass_summary_spark.operators.stats import mad_outliers

    # group g: values 1..9 (median 5, MAD 2) plus a wild 100
    rows = [("g", i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 100])]
    df = spark.createDataFrame(rows, ["k", "id", "v"])
    out = mad_outliers(df, ["k"], "id", "v", k=3.0).collect()
    # median of 10 values (lower) = 5; adevs sorted: 0,1,1,2,2,3,3,4,4,95
    # -> lower MAD = 2; threshold 6: only 100 qualifies
    assert len(out) == 1
    assert out[0]["id"] == 9 and out[0]["v"] == 100.0
    assert out[0]["med"] == 5.0 and out[0]["mad"] == 2.0


def test_mad_outliers_robust_to_contamination(spark):
    """A handful of wild values must not inflate the threshold the
    way they inflate stddev: MAD still flags them all."""
    from nass_summary_spark.operators.stats import mad_outliers

    base = [("g", i, float(50 + (i % 11) - 5)) for i in range(100)]
    wild = [("g", 1000 + i, 1e6 + i) for i in range(5)]
    df = spark.createDataFrame(base + wild, ["k", "id", "v"])
    out = {r["id"] for r in mad_outliers(df, ["k"], "id", "v", k=3.0).collect()}
    assert out == {1000, 1001, 1002, 1003, 1004}


# ---------------------------------------------------------------------------
# trend slopes
# ---------------------------------------------------------------------------

def test_trend_slopes_recovers_known_line(spark):
    from nass_summary_spark.operators.stats import trend_slopes

    # y = 3x + 10 exactly, plus a flat group
    rows = [("a", x, float(3 * x + 10)) for x in range(20)]
    rows += [("b", x, 7.0) for x in range(5)]
    df = spark.createDataFrame(rows, ["k", "xh", "v"])
    got = {r["k"]: r for r in trend_slopes(df, ["k"], "xh", "v").collect()}
    assert got["a"]["slope"] == pytest.approx(3.0, abs=1e-8)
    assert got["a"]["intercept"] == pytest.approx(10.0, abs=1e-8)
    assert got["b"]["slope"] == pytest.approx(0.0, abs=1e-8)
    assert got["b"]["intercept"] == pytest.approx(7.0, abs=1e-8)


def test_trend_slopes_zero_variance_is_null(spark):
    from nass_summary_spark.operators.stats import trend_slopes

    df = spark.createDataFrame([("g", 5, 1.0), ("g", 5, 9.0)], ["k", "xh", "v"])
    row = trend_slopes(df, ["k"], "xh", "v").collect()[0]
    assert row["slope"] is None


def test_ann_topk_ivfpq_recall_and_probe_pruning(spark, sf_dir):
    """B60 IVFADC: recall@5 vs exact on the worst-case isotropic
    corpus (residual coding + nprobe=4 + rerank); candidates must be
    restricted to probed cells (nprobe = n_cells reduces to full-PQ
    behavior and can only improve recall)."""
    from nass_summary_spark.operators.pq import ann_topk_ivfpq
    from nass_summary_spark.operators.similarity import knn_bruteforce

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             knn_bruteforce(emb, q, "vec_id", "embedding", k=5).collect()}
    got4 = {(r["query_id"], r["neighbor_id"]) for r in ann_topk_ivfpq(
        emb, q, "vec_id", "embedding", dim=64, k=5, n_cells=8, nprobe=4,
        m=8, ksub=16, n_iter=3, rerank=100).collect()}
    assert len(got4) == 25
    r4 = len(exact & got4) / len(exact)
    assert r4 >= 0.6, f"IVFPQ recall too low: {r4}"
    got8 = {(r["query_id"], r["neighbor_id"]) for r in ann_topk_ivfpq(
        emb, q, "vec_id", "embedding", dim=64, k=5, n_cells=8, nprobe=8,
        m=8, ksub=16, n_iter=3, rerank=100).collect()}
    r8 = len(exact & got8) / len(exact)
    assert r8 >= r4  # widening the probe set can only help


def test_canonical_entities_hand_graph(spark):
    """ER composition on a hand graph: probe 'cat' links cat+cut
    (both within distance 1) -> one entity; 'dog' stays its own."""
    from nass_summary_spark.operators.dedup import connected_components
    from nass_summary_spark.operators.fuzzy import fuzzy_join

    left = spark.createDataFrame([(100, "cat")], ["pid", "probe"])
    right = spark.createDataFrame(
        [(1, "cat"), (2, "cut"), (3, "dog")], ["cid", "name"]
    )
    edges = fuzzy_join(left, right, "pid", "probe", "cid", "name").select(
        F.col("pid").alias("id_a"), F.col("cid").alias("id_b")
    )
    comp = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    # probe 100 bridges 1 and 2 into entity 1; node 3 is absent
    assert comp == {100: 1, 1: 1, 2: 1}


# ---------------------------------------------------------------------------
# asymmetric containment
# ---------------------------------------------------------------------------

def test_containment_detects_subset_doc(spark):
    """A short doc quoted whole inside a long one: containment ~ 1
    in the A->B direction only; Jaccard would stay small."""
    from nass_summary_spark.operators.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"filler{i} pad{i} extra{i}" for i in range(20))
    df = spark.createDataFrame([(1, short), (2, long)], ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"]): r["containment"] for r in
           containment_pairs(df, "doc_id", "text", n=3, threshold=0.6).collect()}
    assert got == {(1, 2): 1.0}  # only the contained direction


def test_containment_prefix_matches_naive(spark):
    """The one-sided prefix filter must lose no qualifying pair:
    compare against a brute-force python computation on random
    small-vocab docs (high collision density)."""
    import itertools
    import random

    from nass_summary_spark.operators.dedup import containment_pairs

    rng = random.Random(7)
    docs = []
    for i in range(25):
        words = [rng.choice("abcdefg") for _ in range(rng.randint(5, 15))]
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    t = 0.5
    got = {(r["id_a"], r["id_b"]) for r in
           containment_pairs(df, "doc_id", "text", n=3, threshold=t).collect()}

    def shingles(text):
        ws = text.split()
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    want = set()
    for (i, a), (j, b) in itertools.product(docs, repeat=2):
        if i == j:
            continue
        sa, sb = shingles(a), shingles(b)
        if sa and round(len(sa & sb) / len(sa), 6) >= t:
            want.add((i, j))
    assert got == want


# ---------------------------------------------------------------------------
# r4 stats additions: winsorize / impute / benford / dictionary / twap
# ---------------------------------------------------------------------------

def test_winsorized_stats_clamps_outlier(spark):
    """One huge outlier: the winsorized mean must sit near the bulk,
    far below the raw mean."""
    from nass_summary_spark.operators.stats import winsorized_stats

    rows = [("g", float(v)) for v in range(1, 101)] + [("g", 1e9)]
    df = spark.createDataFrame(rows, ["k", "v"])
    r = winsorized_stats(df, ["k"], "v", lower=0.05, upper=0.95).collect()[0]
    assert r["n"] == 101
    raw_mean = (sum(range(1, 101)) + 1e9) / 101
    assert r["winsorized_mean"] < 110 < raw_mean
    assert r["p_upper"] < 110  # p95 sits inside the bulk, not the outlier


def test_impute_by_group_uses_group_median(spark):
    from nass_summary_spark.operators.stats import impute_by_group

    rows = [
        (1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0), (4, "a", None),
        (5, "b", 100.0), (6, "b", None),
    ]
    df = spark.createDataFrame(rows, "id long, k string, v double")
    got = {r["id"]: r for r in impute_by_group(df, ["k"], "v").collect()}
    assert got[4]["v"] == 20.0 and got[4]["imputed"]
    assert got[6]["v"] == 100.0 and got[6]["imputed"]
    assert got[1]["v"] == 10.0 and not got[1]["imputed"]


def test_benford_deviation_flat_vs_benford(spark):
    """Uniform 1..9 leading digits deviate from Benford with the
    exact arithmetic signs: digit 1 under-represented (1/9 < 0.301),
    digit 9 over-represented (1/9 > 0.046)."""
    from nass_summary_spark.operators.stats import benford_deviation

    rows = [("u", d * 100 + i) for d in range(1, 10) for i in range(10)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {r["digit"]: r for r in benford_deviation(df, ["k"], "v").collect()}
    assert len(got) == 9
    for d in range(1, 10):
        assert got[d]["n_digit"] == 10
        assert got[d]["obs_share"] == pytest.approx(1 / 9, abs=1e-6)
    assert got[1]["deviation"] < 0 < got[9]["deviation"]


def test_dictionary_encode_roundtrip(spark):
    from nass_summary_spark.operators.encoding import dictionary_encode

    df = spark.createDataFrame(
        [(1, "carrot"), (2, "apple"), (3, "banana"), (4, "apple"), (5, None)],
        "id long, fruit string",
    )
    encoded, dim = dictionary_encode(df, "fruit", id_name="fid")
    d = {r["fruit"]: r["fid"] for r in dim.collect()}
    assert d == {"apple": 1, "banana": 2, "carrot": 3}  # dense, value-ordered
    e = {r["id"]: r["fid"] for r in encoded.collect()}
    assert e == {1: 3, 2: 1, 3: 2, 4: 1, 5: None}  # NULL survives as NULL id


def test_time_weighted_avg_hand_computed(spark):
    """v=10 for 3s then v=40 for 1s -> TWAP 17.5; the last point has
    no duration and contributes only as an interval end."""
    import datetime as dt

    from nass_summary_spark.operators.stats import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("k", t0, 10.0),
        ("k", t0 + dt.timedelta(seconds=3), 40.0),
        ("k", t0 + dt.timedelta(seconds=4), 999.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    r = time_weighted_avg(df, ["k"], "ts", "v").collect()[0]
    assert r["n_intervals"] == 2
    assert r["twap"] == pytest.approx((10 * 3 + 40 * 1) / 4, abs=1e-6)


# ---------------------------------------------------------------------------
# bloom semi join (B71)
# ---------------------------------------------------------------------------

def test_bloom_never_false_negative_and_fp_rate_sane(spark):
    """Every true member must pass the probe (Bloom guarantees no
    false negatives); non-members pass at roughly the theoretical FP
    rate (1 - e^{-kn/m})^k — assert an order-of-magnitude bound."""
    from pyspark.sql import functions as F

    from nass_summary_spark.operators.bloom import build_bloom, might_contain

    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    n_bits, k = 1 << 13, 4  # m/n = 16.4 -> fp ~ 0.24% theoretical
    bloom = build_bloom(keys, "k", n_bits=n_bits, k=k)
    members = keys.where(might_contain(F.col("k"), bloom, n_bits, k=k)).count()
    assert members == 500  # zero false negatives
    probes = spark.range(10_000, 30_000).select(F.col("id").alias("k"))
    fps = probes.where(might_contain(F.col("k"), bloom, n_bits, k=k)).count()
    assert fps / 20_000 < 0.02  # well under 10x the theoretical rate


def test_bloom_semi_join_equals_plain_semi_join(spark, sf_dir):
    """The composed operator must be row-identical to the plain LEFT
    SEMI join, while the Bloom pre-filter alone already removes most
    non-matching fact rows (the shuffle-reduction claim)."""
    from pyspark.sql import functions as F

    from nass_summary_spark.operators.bloom import (
        bloom_semi_join,
        build_bloom,
        might_contain,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .where(F.col("p_size") >= 48)
        .select("p_partkey")
    )
    got = sorted(r["l_orderkey"] * 10 + r["l_linenumber"] for r in
                 bloom_semi_join(li, keys, "l_partkey", "p_partkey")
                 .select("l_orderkey", "l_linenumber").collect())
    want = sorted(r["l_orderkey"] * 10 + r["l_linenumber"] for r in
                  li.join(keys.withColumnRenamed("p_partkey", "l_partkey"),
                          "l_partkey", "left_semi")
                  .select("l_orderkey", "l_linenumber").collect())
    assert got == want and len(want) > 0
    bloom = build_bloom(keys, "p_partkey")
    pre = li.where(might_contain(F.col("l_partkey"), bloom, 1 << 16)).count()
    total, true = li.count(), len(want)
    # the pre-filter keeps the true matches plus only a small FP margin
    assert true <= pre < true + 0.02 * total


# ---------------------------------------------------------------------------
# behavioral analytics (B72/B73)
# ---------------------------------------------------------------------------

def test_markov_transitions_hand_computed(spark):
    """Two users: u1 walks a->b->a->c, u2 walks a->b. Transition
    counts and conditional probabilities by hand; last events have
    no successor; probabilities per source state sum to 1."""
    import datetime as dt

    from nass_summary_spark.operators.behavior import markov_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "a"), (1, 2, t0.replace(hour=1), "b"),
        (1, 3, t0.replace(hour=2), "a"), (1, 4, t0.replace(hour=3), "c"),
        (2, 5, t0, "a"), (2, 6, t0.replace(hour=1), "b"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    got = {(r["state"], r["next_state"]): (r["n"], r["p"]) for r in
           markov_transitions(df, "user_id", "event_type", "ts",
                              order_cols=["event_id"]).collect()}
    # a->b twice (both users), b->a once, a->c once
    assert got[("a", "b")] == (2, pytest.approx(2 / 3))
    assert got[("a", "c")] == (1, pytest.approx(1 / 3))
    assert got[("b", "a")] == (1, 1.0)
    assert len(got) == 3
    from collections import defaultdict
    sums = defaultdict(float)
    for (s, _), (_, p) in got.items():
        sums[s] += p
    for s, tot in sums.items():
        assert tot == pytest.approx(1.0, abs=1e-6)


def test_cohort_retention_hand_computed(spark):
    """Cohort of week0 = {u1, u2}; u1 returns in week1, nobody in
    week2; u3 starts in week1 (its own cohort)."""
    import datetime as dt

    from nass_summary_spark.operators.behavior import cohort_retention

    mon0 = dt.datetime(2024, 1, 1)  # a Monday
    mon1 = dt.datetime(2024, 1, 8)
    rows = [
        (1, mon0), (2, mon0.replace(day=3)),    # cohort week0
        (1, mon1.replace(day=9)),               # u1 active week1
        (3, mon1),                              # u3 cohort week1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(str(r["cohort_week"])[:10], r["week_offset"]):
           (r["n_active"], r["retained"]) for r in
           cohort_retention(df, "user_id", "ts").collect()}
    assert got[("2024-01-01", 0)] == (2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 0.5)
    assert got[("2024-01-08", 0)] == (1, 1.0)
    assert len(got) == 3


def test_interval_merge_hand_computed(spark):
    """[1,5) [4,7) [7,9) merge to [1,9) (touching endpoints chain
    through the running max); [12,13) stays alone; empty [20,20)
    drops; second key independent."""
    from nass_summary_spark.operators.stats import interval_merge

    rows = [
        ("a", 1.0, 5.0), ("a", 4.0, 7.0), ("a", 7.0, 9.0),
        ("a", 12.0, 13.0), ("a", 20.0, 20.0),
        ("b", 2.0, 3.0),
    ]
    df = spark.createDataFrame(rows, ["k", "lo", "hi"])
    got = {(r["k"], r["span_lo"]): (r["span_hi"], r["n_intervals"])
           for r in interval_merge(df, ["k"], "lo", "hi").collect()}
    assert got == {
        ("a", 1.0): (9.0, 3),
        ("a", 12.0): (13.0, 1),
        ("b", 2.0): (3.0, 1),
    }


def test_cumulative_uniques_hand_computed(spark):
    import datetime as dt

    from nass_summary_spark.operators.stats import cumulative_uniques

    d0 = dt.datetime(2024, 1, 1)
    d1 = dt.datetime(2024, 1, 2)
    d2 = dt.datetime(2024, 1, 3)
    rows = [
        (1, d0), (2, d0), (1, d0.replace(hour=5)),   # day0: active {1,2}
        (1, d1), (3, d1),                            # day1: {1,3}, new {3}
        (2, d2),                                     # day2: {2}, new {}
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {str(r["day"])[:10]: (r["active"], r["new_keys"], r["cum_keys"])
           for r in cumulative_uniques(df, "user_id", "ts").collect()}
    assert got == {
        "2024-01-01": (2, 2, 2),
        "2024-01-02": (2, 1, 3),
        "2024-01-03": (1, 0, 3),
    }


def test_session_paths_hand_computed(spark):
    """u1 has two sessions (a>b then c); u2 has one session a>b —
    path 'a>b' counts 2, 'c' counts 1, ordering by count then path."""
    import datetime as dt

    from nass_summary_spark.operators.behavior import session_paths

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "a"),
        (1, 2, t0 + dt.timedelta(minutes=5), "b"),
        (1, 3, t0 + dt.timedelta(hours=3), "c"),      # gap > 30min: new session
        (2, 4, t0, "a"),
        (2, 5, t0 + dt.timedelta(minutes=29), "b"),   # 29min: same session
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    got = [(r["path"], r["n"]) for r in
           session_paths(df, "user_id", "ts", "event_type", "event_id",
                         gap_minutes=30, k=10).collect()]
    assert got == [("a>b", 2), ("c", 1)]


def test_dynamic_gap_sessions_hand_computed(spark):
    """purchase gap 2min, browse gap 30min: browse@0 holds until :30;
    purchase@10 holds until :12 (session still open via browse);
    browse@40 continues the session (40 < 0+30? no - 40 > 30... the
    running max horizon is max(30, 12) = 30 < 40 -> NEW session)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from nass_summary_spark.operators.behavior import dynamic_gap_sessions

    t0 = dt.datetime(2024, 1, 1)
    m = lambda x: t0 + dt.timedelta(minutes=x)  # noqa: E731
    rows = [
        (1, 1, m(0), "view"),
        (1, 2, m(10), "purchase"),
        (1, 3, m(40), "view"),      # horizon max(30, 12) < 40 -> new
        (1, 4, m(41), "purchase"),  # inside (40+30)
        (1, 5, m(44), "view"),      # purchase horizon 43 but view@40
                                    # holds to 70 -> same session
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    gap = F.when(F.col("event_type") == "purchase", F.lit(120)).otherwise(
        F.lit(1800)
    )
    got = sorted(
        (str(r["session_start"])[:16], r["n_events"])
        for r in dynamic_gap_sessions(df, "user_id", "ts", "event_id", gap).collect()
    )
    assert got == [("2024-01-01 00:00", 2), ("2024-01-01 00:40", 3)]


def test_weighted_sample_is_weight_proportional_and_deterministic(spark):
    """Two weight classes 10:1 — the heavy class must dominate the
    sample roughly in proportion; repeated runs identical; k rows."""
    from nass_summary_spark.operators.sampling import weighted_sample

    rows = [(i, 10.0 if i < 500 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    s1 = sorted(r["doc_id"] for r in weighted_sample(df, "doc_id", "w", k=100).collect())
    s2 = sorted(r["doc_id"] for r in weighted_sample(df, "doc_id", "w", k=100).collect())
    assert s1 == s2 and len(s1) == 100
    heavy = sum(1 for i in s1 if i < 500)
    # E[heavy] ~ 90+ under 10:1 weights; even loose bounds separate
    # it decisively from the unweighted expectation of 50
    assert heavy > 70


def test_whiten_project_output_has_identity_covariance(spark):
    """Whitened coordinates must be uncorrelated with unit variance
    (population covariance ~ I_k) on anisotropic data, and invariant
    under the eigenvalue ordering."""
    from nass_summary_spark.operators.linalg import whiten_project

    df, x = _emb_df(spark, n=80, d=6)
    out = whiten_project(df, "vec_id", "embedding", dim=6, k=3, round_dp=9)
    w = np.array([[r["wc0"], r["wc1"], r["wc2"]]
                  for r in out.orderBy("vec_id").collect()])
    cov = np.cov(w, rowvar=False, bias=True)
    assert np.allclose(cov, np.eye(3), atol=1e-4)


def test_group_mode_deterministic_ties(spark):
    from nass_summary_spark.operators.stats import group_mode

    rows = [("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c"),
            ("h", "z")]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {r["k"]: (r["mode_value"], r["mode_count"]) for r in
           group_mode(df, ["k"], "v").collect()}
    assert got == {"g": ("a", 2), "h": ("z", 1)}  # tie a/b -> smallest
