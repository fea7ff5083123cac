"""Property-based tests (hypothesis) for the r10 operators:
invariants that must hold for ANY input — extraction round-trips,
scale/permutation invariances, estimator bounds. Examples are kept
small (each builds a DataFrame and runs Spark jobs) and deadlines
disabled (JVM warm-up makes wall-clock noisy)."""

from __future__ import annotations

import math
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words_st = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=6),
    min_size=5,
    max_size=25,
)


@SETTINGS
@given(ws=words_st)
def test_html_extract_roundtrips_plain_prose(spark, ws):
    """Tag-wrapped prose with >= 5 words and no markup must survive
    extraction verbatim (whitespace-normalized)."""
    from nass_summary_spark.operators.html import html_extract

    prose = " ".join(ws)
    df = spark.createDataFrame(
        [(1, f"<html><body><p>{prose}</p></body></html>")],
        "doc_id int, html string",
    )
    row = html_extract(df, "doc_id", "html").collect()[0]
    assert row["extracted"] == re.sub(r"\s+", " ", prose).strip()
    assert row["n_kept"] == 1
    assert row["n_words"] == len(prose.split())


@SETTINGS
@given(
    vals=st.lists(
        st.floats(0.01, 1000, allow_nan=False), min_size=2, max_size=30
    ),
    c=st.floats(0.5, 20),
)
def test_gini_scale_invariant_and_bounded(spark, vals, c):
    from nass_summary_spark.operators.stats import gini_coefficient

    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    df2 = spark.createDataFrame(
        [("g", v * c) for v in vals], "g string, v double"
    )
    g1 = gini_coefficient(df, ["g"], "v").collect()[0]["gini"]
    g2 = gini_coefficient(df2, ["g"], "v").collect()[0]["gini"]
    n = len(vals)
    assert abs(g1 - g2) < 1e-4  # scale invariance (round-to-6 slack)
    assert -1e-9 <= g1 <= (n - 1) / n + 1e-9  # Gini bounds


@SETTINGS
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=3,
        max_size=20,
    )
)
def test_kendall_tau_bounds_and_antisymmetry(spark, pairs):
    from nass_summary_spark.operators.stats import kendall_tau

    rows = [("g", x, y) for x, y in pairs]
    df = spark.createDataFrame(rows, "g string, x int, y int")
    t_xy = kendall_tau(df, ["g"], "x", "y").collect()[0]["tau_b"]
    neg = spark.createDataFrame(
        [("g", x, -y) for x, y in pairs], "g string, x int, y int"
    )
    t_xny = kendall_tau(neg, ["g"], "x", "y").collect()[0]["tau_b"]
    if t_xy is None:
        assert t_xny is None  # degenerate marginals stay degenerate
    else:
        assert -1 - 1e-9 <= t_xy <= 1 + 1e-9
        assert abs(t_xy + t_xny) < 1e-9  # tau(x, -y) == -tau(x, y)


@SETTINGS
@given(
    subj=st.lists(
        st.tuples(st.integers(1, 6), st.booleans()),
        min_size=1,
        max_size=25,
    )
)
def test_kaplan_meier_matches_sequential_estimator(spark, subj):
    """The distributed KM must equal the classic sequential
    product-limit computation on any subject set."""
    from nass_summary_spark.operators.behavior import kaplan_meier

    rows = [("c", t, int(e)) for t, e in subj]
    df = spark.createDataFrame(rows, "cohort string, t int, ev int")
    got = {
        r["t"]: r for r in kaplan_meier(df, "cohort", "t", "ev").collect()
    }
    # sequential replay
    times = sorted({t for t, _ in subj})
    at_risk = len(subj)
    s = 1.0
    dead = False
    for t in times:
        d = sum(1 for tt, e in subj if tt == t and e)
        c = sum(1 for tt, e in subj if tt == t and not e)
        if d:
            if d == at_risk:
                dead = True
                s = 0.0
            elif not dead:
                s *= 1 - d / at_risk
            assert t in got
            assert got[t]["n_risk"] == at_risk
            assert got[t]["n_events"] == d and got[t]["n_censored"] == c
            want = 0.0 if dead else round(s, 6)
            assert abs(got[t]["survival"] - want) <= 1e-6
        else:
            assert t not in got  # censored-only times emit no row
        at_risk -= d + c


@SETTINGS
@given(
    text=st.text(
        alphabet="ab .!?\n", min_size=0, max_size=60
    )
)
def test_sentence_stats_accounting_consistent(spark, text):
    from nass_summary_spark.operators.quality_rules import sentence_stats

    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    r = sentence_stats(df, "text", "doc_id").collect()[0]
    # python replay of the segmentation contract
    body = re.sub(r"\s+$", "", re.sub(r"^\s+", "", text))
    sents = [
        re.sub(r"\s+$", "", re.sub(r"^\s+", "", s))
        for s in re.split(r"[.!?]+[\"')\]]*", body)
    ]
    sents = [s for s in sents if s]
    assert r["n_sentences"] == len(sents)
    assert r["n_sentence_words"] == sum(len(s.split()) for s in sents)
    if sents:
        assert r["max_sentence_words"] == max(len(s.split()) for s in sents)


@SETTINGS
@given(
    ws=st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
        min_size=1,
        max_size=40,
    ),
    k=st.integers(1, 6),
)
def test_vocab_coverage_matches_counter(spark, ws, k):
    from nass_summary_spark.operators.tfidf import vocab_coverage

    df = spark.createDataFrame([("g", " ".join(ws))], "g string, text string")
    r = vocab_coverage(df, "g", "text", ks=[k]).collect()[0]
    cnt = Counter(ws)
    order = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    covered = sum(c for _, c in order)
    assert r["covered"] == covered and r["total"] == len(ws)
    assert r["n_vocab"] == min(k, len(cnt))
    assert abs(r["coverage"] - round(covered / len(ws), 6)) < 1e-9
