"""r10 statistical widening: kendall_tau, category_profile,
kaplan_meier — hand-computed / brute-force pins."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nass_summary_spark.operators.behavior import kaplan_meier
from nass_summary_spark.operators.stats import category_profile, kendall_tau


def _brute_tau_b(xs, ys):
    n = len(xs)
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (xs[i] - xs[j]) * (ys[i] - ys[j])
            if s > 0:
                c += 1
            elif s < 0:
                d += 1
    n0 = n * (n - 1) // 2

    def ties(v):
        from collections import Counter

        return sum(t * (t - 1) // 2 for t in Counter(v).values())

    den = (n0 - ties(xs)) * (n0 - ties(ys))
    return c, d, (c - d) / math.sqrt(den) if den > 0 else None


def test_kendall_tau_matches_bruteforce(spark):
    series = {
        "g1": ([1, 2, 3, 4, 5, 6], [2, 1, 4, 3, 6, 5]),
        "g2": ([1, 1, 2, 3, 3, 4], [1, 2, 2, 3, 4, 4]),  # tie-heavy
        "g3": ([5, 4, 3, 2, 1], [1, 2, 3, 4, 5]),        # perfect disc.
    }
    rows = [
        (g, x, y) for g, (xs, ys) in series.items() for x, y in zip(xs, ys)
    ]
    df = spark.createDataFrame(rows, "g string, x int, y int")
    got = {r["g"]: r for r in kendall_tau(df, ["g"], "x", "y").collect()}
    for g, (xs, ys) in series.items():
        c, d, tau = _brute_tau_b(xs, ys)
        assert got[g]["concordant"] == c and got[g]["discordant"] == d
        assert abs(got[g]["tau_b"] - round(tau, 6)) < 1e-9
    assert got["g3"]["tau_b"] == -1.0


def test_kendall_tau_constant_series_null(spark):
    df = spark.createDataFrame(
        [("g", 1, i) for i in range(5)], "g string, x int, y int"
    )
    row = kendall_tau(df, ["g"], "x", "y").collect()[0]
    assert row["tau_b"] is None  # all-tied x: denominator 0


def test_category_profile_hand_values(spark):
    # 4 cats uniform -> entropy ln(4), hhi 0.25, top_share 0.25
    rows = [("u", f"c{i % 4}") for i in range(40)] + [("s", "only")] * 7
    df = spark.createDataFrame(rows, "g string, cat string")
    got = {r["g"]: r for r in category_profile(df, "g", "cat").collect()}
    u = got["u"]
    assert u["n_rows"] == 40 and u["n_cats"] == 4
    assert abs(u["entropy"] - round(math.log(4), 6)) < 1e-9
    assert u["hhi"] == 0.25 and u["top_share"] == 0.25
    s = got["s"]
    assert s["entropy"] == 0.0 and s["hhi"] == 1.0 and s["top_share"] == 1.0


def test_kaplan_meier_textbook(spark):
    # classic small example: times 1,2+,3,4+ (+'= censored), one
    # cohort of 4 subjects
    rows = [("a", 1, 1), ("a", 2, 0), ("a", 3, 1), ("a", 4, 0)]
    df = spark.createDataFrame(rows, "cohort string, t int, ev int")
    out = {r["t"]: r for r in kaplan_meier(df, "cohort", "t", "ev").collect()}
    # event rows only (t=1, t=3)
    assert set(out) == {1, 3}
    assert out[1]["n_risk"] == 4 and out[1]["survival"] == 0.75
    # at t=3 risk set is {3,4+}: S = 0.75 * (1 - 1/2) = 0.375
    assert out[3]["n_risk"] == 2 and out[3]["survival"] == 0.375


def test_kaplan_meier_exhausted_risk_set(spark):
    rows = [("a", 1, 1), ("a", 2, 1), ("a", 2, 1)]
    df = spark.createDataFrame(rows, "cohort string, t int, ev int")
    out = {r["t"]: r for r in kaplan_meier(df, "cohort", "t", "ev").collect()}
    assert out[2]["survival"] == 0.0  # d == n_risk: curve pinned to 0


def test_kaplan_meier_censored_only_times_thin_risk(spark):
    # censor at t=2 must reduce the risk set for t=3 without a step
    rows = [("a", 1, 1), ("a", 2, 0), ("a", 2, 0), ("a", 3, 1), ("a", 3, 0)]
    df = spark.createDataFrame(rows, "cohort string, t int, ev int")
    out = {r["t"]: r for r in kaplan_meier(df, "cohort", "t", "ev").collect()}
    assert set(out) == {1, 3}
    assert out[1]["n_risk"] == 5
    assert out[3]["n_risk"] == 2 and out[3]["n_censored"] == 1
    want = round((1 - 1 / 5) * (1 - 1 / 2), 6)
    assert abs(out[3]["survival"] - want) < 1e-9


def test_kcore_hand_graph(spark):
    from nass_summary_spark.operators.graph import kcore_members

    # K4 clique {1,2,3,4} + pendant 5-1 + chain 5-6-7; 3-core = K4
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = k4 + [(1, 5), (5, 6), (6, 7)]
    df = spark.createDataFrame(edges, "id_a int, id_b int")
    out = {r["id"]: r["core_degree"] for r in kcore_members(df, k=3).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_cascading_peel_needs_rounds(spark):
    from nass_summary_spark.operators.graph import kcore_members
    import pytest

    # a chain peels one node per round from each end: 2-core of a
    # pure path is empty, but needs len/2 rounds to drain
    chain = [(i, i + 1) for i in range(8)]
    df = spark.createDataFrame(chain, "id_a int, id_b int")
    out = kcore_members(df, k=2, n_rounds=8).collect()
    assert out == []
    with pytest.raises(RuntimeError, match="not converged"):
        kcore_members(df, k=2, n_rounds=2)


def test_kcore_validates_k(spark):
    from nass_summary_spark.operators.graph import kcore_members
    import pytest

    df = spark.createDataFrame([(1, 2)], "id_a int, id_b int")
    with pytest.raises(ValueError, match="k must be"):
        kcore_members(df, k=0)


def test_sentence_stats_hand_cases(spark):
    from nass_summary_spark.operators.quality_rules import sentence_stats

    rows = [
        (1, 'First one. Second sentence here! "Quoted?" trailing bit'),
        (2, ""),
        (3, "no terminal punctuation at all"),
        (4, "One.\nTwo two.   Three three three."),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in sentence_stats(df, "text", "doc_id").collect()}
    r1 = got[1]
    assert r1["n_sentences"] == 4  # trailing unterminated bit counts
    assert r1["ends_terminal"] == 0
    assert r1["max_sentence_words"] == 3
    assert got[2]["n_sentences"] == 0
    assert got[2]["avg_sentence_words"] is None
    assert got[3]["n_sentences"] == 1 and got[3]["ends_terminal"] == 0
    r4 = got[4]
    assert r4["n_sentences"] == 3 and r4["ends_terminal"] == 1
    assert r4["n_sentence_words"] == 6
    assert r4["avg_sentence_words"] == 2.0


def test_sprt_monitor_decisions(spark):
    from nass_summary_spark.operators.experiment import (
        sprt_constants,
        sprt_monitor,
    )

    c = sprt_constants(0.3, 0.6, alpha=0.05, beta=0.05)
    # arm 'hi': all successes -> crosses H1 fast; then failures pull
    # the LLR back but the decision must stay sticky.
    # arm 'lo': all failures -> H0.  arm 'mid': tiny counts -> continue
    rows = (
        [("hi", t, 10, 10) for t in range(1, 4)]
        + [("hi", t, 10, 0) for t in range(4, 10)]
        + [("lo", t, 10, 0) for t in range(1, 4)]
        + [("mid", 1, 1, 1)]
    )
    df = spark.createDataFrame(rows, "arm string, t int, n int, x int")
    out = sprt_monitor(df, "arm", "t", "n", "x", 0.3, 0.6,
                       alpha=0.05, beta=0.05).collect()
    by = {}
    for r in out:
        by.setdefault(r["arm"], []).append(r)
    hi = by["hi"]
    # python replay of the integer LLR
    llr = 0
    want = []
    for r, (arm, t, n, x) in zip(hi, [x for x in rows if x[0] == "hi"]):
        llr += x * c["la"] + (n - x) * c["lb"]
        want.append(round(llr / c["scale"], 6))
        assert r["llr"] == want[-1]
    assert hi[0]["decided"] == hi[0]["decision"]
    crossed = [r for r in hi if r["decision"] == "accept_h1"]
    assert crossed  # the run of successes crossed the H1 boundary
    # after the failures drag the LLR down, decision column may read
    # differently but 'decided' stays at the first crossing
    assert all(r["decided"] == "accept_h1"
               for r in hi[hi.index(crossed[0]):])
    assert by["lo"][-1]["decided"] == "accept_h0"
    assert by["mid"][-1]["decided"] == "continue"


def test_gini_hand_values(spark):
    from nass_summary_spark.operators.stats import gini_coefficient

    rows = (
        [("eq", 5.0)] * 4                      # perfect equality -> 0
        + [("one", 0.0), ("one", 0.0), ("one", 0.0), ("one", 10.0)]
        + [("mix", 1.0), ("mix", 2.0), ("mix", 3.0), ("mix", 4.0)]
        + [("zero", 0.0)] * 3                  # no mass -> NULL
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r["gini"] for r in gini_coefficient(df, ["g"], "v").collect()}
    assert got["eq"] == 0.0
    assert got["one"] == 0.75  # (n-1)/n concentration in one holder
    assert got["mix"] == 0.25  # classic 1,2,3,4 example
    assert got["zero"] is None


def test_gini_tie_order_invariant(spark):
    from nass_summary_spark.operators.stats import gini_coefficient

    rows = [("g", v) for v in [3.0, 1.0, 3.0, 1.0, 3.0, 1.0]]
    df = spark.createDataFrame(rows, "g string, v double")
    a = gini_coefficient(df.repartition(5), ["g"], "v").collect()[0]["gini"]
    b = gini_coefficient(df.repartition(1), ["g"], "v").collect()[0]["gini"]
    assert a == b == 0.25


def test_psi_identical_distribution_stable(spark):
    from nass_summary_spark.operators.stats import psi_drift

    # groups identical to the pool: PSI is not exactly 0 (add-one
    # smoothing normalizes group and pool over different totals) but
    # must sit far below the 0.1 "drifting" alarm
    rows = [(g, v) for g in ("a", "b") for v in (50, 150, 250, 350) * 25]
    df = spark.createDataFrame(rows, "grp string, v int")
    got = {r["grp"]: r["psi"] for r in psi_drift(df, "grp", "v", 100.0, 8).collect()}
    assert abs(got["a"]) < 0.05 and abs(got["b"]) < 0.05


def test_psi_shifted_distribution_alarms(spark):
    from nass_summary_spark.operators.stats import psi_drift

    # the pool is dominated by the stable group, so the stable group
    # scores near zero and the shifted minority slice alarms
    rows = [("stable", v) for v in (50, 150, 250, 350) * 250] + [
        ("shifted", 750)
    ] * 20
    df = spark.createDataFrame(rows, "grp string, v int")
    got = {r["grp"]: r["psi"] for r in psi_drift(df, "grp", "v", 100.0, 8).collect()}
    assert got["shifted"] > 0.25  # the industry "shifted" alarm
    assert got["stable"] < 0.1
    assert got["shifted"] > got["stable"]


def test_vocab_coverage_hand_values(spark):
    from nass_summary_spark.operators.tfidf import vocab_coverage

    # corpus: 'a' x6, 'b' x3, 'c' x1 -> total 10
    docs = [("g", "a a a b"), ("g", "a a a b b c")]
    df = spark.createDataFrame(docs, "src string, text string")
    got = {
        r["k"]: r for r in vocab_coverage(df, "src", "text", ks=[1, 2, 5]).collect()
    }
    assert got[1]["covered"] == 6 and got[1]["coverage"] == 0.6
    assert got[2]["covered"] == 9 and got[2]["coverage"] == 0.9
    # budget past the vocabulary saturates: 3 entries cover all 10
    assert got[5]["n_vocab"] == 3 and got[5]["coverage"] == 1.0
    assert all(r["total"] == 10 for r in got.values())


def test_vocab_coverage_monotone(spark, sf_dir):
    from nass_summary_spark.operators.tfidf import vocab_coverage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = vocab_coverage(docs, "source", "text", ks=[10, 100, 1000]).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs = sorted(rs, key=lambda r: r["k"])
        covs = [r["coverage"] for r in rs]
        assert covs == sorted(covs)  # more budget, never less coverage
        assert all(0 < c <= 1 for c in covs)


def test_hill_tail_index_pareto(spark):
    import numpy as np

    from nass_summary_spark.operators.skew import hill_tail_index

    # exact Pareto(alpha) quantile sample: x_i = (1 - u_i)^(-1/alpha)
    # on a deterministic uniform grid -> Hill on the top-k recovers
    # alpha closely
    rng = np.random.RandomState(7)
    for alpha in (1.5, 3.0):
        u = (np.arange(2000) + 0.5) / 2000
        x = (1 - u) ** (-1.0 / alpha)
        rows = [("g", float(v)) for v in x]
        df = spark.createDataFrame(rows, "g string, v double")
        out = hill_tail_index(df, "g", "v", k=200).collect()[0]
        assert abs(out["alpha"] - alpha) / alpha < 0.15, (alpha, out)


def test_hill_tail_index_degenerate_and_validation(spark):
    import pytest

    from nass_summary_spark.operators.skew import hill_tail_index

    df = spark.createDataFrame([("g", 5.0)] * 100, "g string, v double")
    out = hill_tail_index(df, "g", "v", k=10).collect()[0]
    assert out["alpha"] is None  # all-equal top-k: no tail to fit
    with pytest.raises(ValueError, match="k must be"):
        hill_tail_index(df, "g", "v", k=1)


def test_cms_inner_product_one_sided_and_exact_when_clean(spark):
    from nass_summary_spark.operators.countmin import (
        build_countmin,
        cms_inner_product,
    )

    # small key universe: few collisions at width 1024, but the
    # one-sided bound must hold regardless
    a = spark.createDataFrame(
        [(k,) for k in range(100) for _ in range(k % 3 + 1)], "k int"
    )
    b = spark.createDataFrame(
        [(k,) for k in range(50, 150) for _ in range(2)], "k int"
    )
    sa = build_countmin(a, [], "k")
    sb = build_countmin(b, [], "k")
    est = cms_inner_product(sa, sb).collect()[0]["est_join_size"]
    exact = (
        a.join(b, "k").count()
    )
    assert est >= exact
    # with 200 keys in 1024 buckets collisions are rare: tight
    assert est <= exact * 1.5 + 10


def test_cms_inner_product_disjoint_keys(spark):
    from nass_summary_spark.operators.countmin import (
        build_countmin,
        cms_inner_product,
    )

    a = spark.createDataFrame([(k,) for k in range(40)], "k int")
    b = spark.createDataFrame([(k,) for k in range(1000, 1040)], "k int")
    sa = build_countmin(a, [], "k")
    sb = build_countmin(b, [], "k")
    est = cms_inner_product(sa, sb).collect()[0]["est_join_size"]
    # disjoint: only collision noise survives, and the min over
    # rows usually kills it entirely at this density
    assert est <= 5
