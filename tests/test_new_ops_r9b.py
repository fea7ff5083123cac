"""Round-9 session-2 additions: nonparametric stats (B131-B133) —
KS drift, grouped Spearman, per-series ACF."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from nass_summary_spark.operators.experiment import ks_drift
from nass_summary_spark.operators.stats import acf_lags, spearman_corr


# ---------------------------------------------------------------------------
# ks_drift
# ---------------------------------------------------------------------------

def test_ks_identical_groups_score_zero(spark):
    # two groups drawn as the SAME multiset: each-vs-rest ECDFs
    # coincide at every pooled value -> D == 0 exactly
    rows = [("a", float(v)) for v in [1, 2, 2, 3, 5]] + [
        ("b", float(v)) for v in [1, 2, 2, 3, 5]
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r["g"]: r for r in ks_drift(df, "g", "v").collect()}
    assert out["a"]["ks_d"] == 0.0 and out["b"]["ks_d"] == 0.0
    assert out["a"]["n_g"] == 5 and out["a"]["n_rest"] == 5
    # tie-break: smallest value attaining the (everywhere-0) sup
    assert out["a"]["at_value"] == 1.0


def test_ks_disjoint_supports_score_one(spark):
    rows = [("lo", float(v)) for v in range(10)] + [
        ("hi", float(v + 100)) for v in range(10)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r["g"]: r for r in ks_drift(df, "g", "v").collect()}
    assert out["lo"]["ks_d"] == 1.0
    # sup first attained at the largest lo value (ECDF_lo hits 1,
    # rest still 0)
    assert out["lo"]["at_value"] == 9.0
    assert out["hi"]["ks_d"] == 1.0
    assert out["lo"]["d_scaled"] == round(math.sqrt(100 / 20), 6)


def test_ks_matches_scipy_style_bruteforce(spark):
    rng = np.random.RandomState(7)
    a = np.round(rng.normal(0, 1, 200), 1)
    b = np.round(rng.normal(0.5, 1.3, 300), 1)
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r["g"]: r["ks_d"] for r in ks_drift(df, "g", "v").collect()}
    pooled = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), pooled, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), pooled, side="right") / len(b)
    want = round(float(np.max(np.abs(fa - fb))), 6)
    assert got["a"] == want and got["b"] == want


def test_ks_null_values_and_groups_dropped(spark):
    rows = [("a", 1.0), ("a", None), (None, 2.0), ("b", 2.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r["g"]: r for r in ks_drift(df, "g", "v").collect()}
    assert out["a"]["n_g"] == 1 and out["a"]["n_rest"] == 2


# ---------------------------------------------------------------------------
# spearman_corr
# ---------------------------------------------------------------------------

def test_spearman_perfect_monotone(spark):
    rows = [("g", float(x), float(x * x)) for x in range(1, 30)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = spearman_corr(df, ["g"], "x", "y").collect()
    assert out[0]["spearman_rho"] == 1.0
    anti = spark.createDataFrame(
        [("g", float(x), float(-(x ** 3))) for x in range(1, 30)],
        ["g", "x", "y"],
    )
    assert spearman_corr(anti, ["g"], "x", "y").collect()[0][
        "spearman_rho"
    ] == -1.0


def test_spearman_ties_match_scipy_formula(spark):
    # heavy tie runs in x (quantity-like) — compare to a local
    # average-rank Pearson computed with numpy
    rng = np.random.RandomState(3)
    x = rng.randint(1, 8, 150).astype(float)
    y = x * 10 + rng.normal(0, 5, 150)
    rows = [("g", float(a), float(b)) for a, b in zip(x, y)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    got = spearman_corr(df, ["g"], "x", "y").collect()[0]["spearman_rho"]

    def avg_rank(v):
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v))
        sv = v[order]
        i = 0
        while i < len(v):
            j = i
            while j < len(v) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0
            i = j
        return ranks

    rx, ry = avg_rank(x), avg_rank(y)
    want = np.corrcoef(rx, ry)[0, 1]
    assert got == pytest.approx(want, abs=1e-6)


def test_spearman_groups_independent(spark):
    rows = [("up", float(x), float(x)) for x in range(10)] + [
        ("dn", float(x), float(9 - x)) for x in range(10)
    ]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r["g"]: r["spearman_rho"] for r in
           spearman_corr(df, ["g"], "x", "y").collect()}
    assert out == {"up": 1.0, "dn": -1.0}


# ---------------------------------------------------------------------------
# acf_lags
# ---------------------------------------------------------------------------

def _np_acf(x: np.ndarray, k: int) -> float:
    m = x.mean()
    return float(
        np.sum((x[k:] - m) * (x[:-k] - m)) / np.sum((x - m) ** 2)
    )


def test_acf_matches_numpy(spark):
    rng = np.random.RandomState(11)
    vals = rng.randint(5, 100, 60)
    rows = [("k", i, int(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = acf_lags(df, "k", "t", "v", max_lag=3).collect()
    assert [r["lag"] for r in out] == [1, 2, 3]
    for r in out:
        assert r["n_obs"] == 60 and r["n_pairs"] == 60 - r["lag"]
        assert r["acf"] == pytest.approx(
            _np_acf(vals.astype(float), r["lag"]), abs=1e-6
        )


def test_acf_periodic_series_sign_structure(spark):
    # strict period-2 alternation: lag-1 strongly negative, lag-2
    # strongly positive
    vals = np.array([0, 10] * 30)
    rows = [("k", i, int(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = {r["lag"]: r["acf"] for r in
           acf_lags(df, "k", "t", "v", max_lag=2).collect()}
    assert out[1] < -0.9 and out[2] > 0.9
    assert out[1] == pytest.approx(_np_acf(vals.astype(float), 1), abs=1e-6)


def test_acf_constant_series_null(spark):
    rows = [("k", i, 7) for i in range(20)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    for r in acf_lags(df, "k", "t", "v", max_lag=2).collect():
        assert r["acf"] is None  # zero variance: no defined ACF


def test_acf_multiple_keys(spark):
    rows = [("a", i, i % 2 * 10) for i in range(20)] + [
        ("b", i, i) for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = acf_lags(df, "k", "t", "v", max_lag=1).collect()
    by = {r["k"]: r["acf"] for r in out}
    assert by["a"] < 0 < by["b"]
