"""Scale-safe boundary modes for equidepth_histogram (r9 verdict
"What's wrong" #1): the sketch path must land every boundary within
the B129 log-histogram's documented ≤1/8-of-value error of the
exact interpolating percentile, and the bucketing downstream must
stay sane. The exact path stays the gate-scale certifier.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nass_summary_spark.operators.stats import equidepth_histogram


def _bounds(df, val_col, mode, n_buckets=8):
    """The boundary list a mode produces (replicating the internal
    pass so the test can compare modes directly)."""
    from nass_summary_spark.operators.quantile_sketch import (
        build_log_histogram,
        histogram_split_points,
    )

    v = F.col(val_col)
    if mode == "exact":
        fracs = [i / n_buckets for i in range(1, n_buckets)]
        row = df.where(v.isNotNull()).agg(
            F.percentile(val_col, F.array(*[F.lit(f) for f in fracs]))
            .alias("b")
        ).first()
        return [float(x) for x in row["b"]]
    hist = build_log_histogram(df.where(v.isNotNull()), [], val_col)
    rows = histogram_split_points(hist, [], n_buckets).orderBy("i").collect()
    return [float(r["est"]) for r in rows]


def test_sketch_boundaries_within_error_bound(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = _bounds(docs, "n_chars", "exact")
    sketch = _bounds(docs, "n_chars", "sketch")
    assert len(exact) == len(sketch) == 7
    for e, s in zip(exact, sketch):
        # B129 bound: a rank estimate lands inside a bucket whose
        # width is <= 1/8 of the value
        assert abs(s - e) <= e / 8 + 1e-6, (e, s)


def test_sketch_mode_histogram_properties(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = equidepth_histogram(
        docs, "n_chars", n_buckets=8, mode="sketch"
    ).collect()
    n_total = docs.where(F.col("n_chars").isNotNull()).count()
    assert sum(r["n_rows"] for r in rows) == n_total
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    # buckets ordered and ranges non-overlapping
    hist = sorted(rows, key=lambda r: r["bucket"])
    for a, b in zip(hist, hist[1:]):
        assert a["hi"] <= b["lo"]
    # near-equi-depth: no bucket hoards the mass (value error <=1/8
    # translates to bounded share skew on this corpus)
    assert max(r["share"] for r in rows) < 0.35


def test_exact_and_sketch_agree_on_clean_powers(spark):
    # a domain where every boundary is exactly representable in the
    # log histogram: ranks land on bucket edges, modes coincide
    df = spark.range(1, 10001).select(F.col("id").alias("v"))
    exact = equidepth_histogram(df, "v", n_buckets=4, mode="exact")
    sketch = equidepth_histogram(df, "v", n_buckets=4, mode="sketch")
    er = {r["bucket"]: r["n_rows"] for r in exact.collect()}
    sr = {r["bucket"]: r["n_rows"] for r in sketch.collect()}
    assert set(er) == set(sr) == {0, 1, 2, 3}
    for b in er:
        assert abs(er[b] - sr[b]) <= 10000 / 8  # value error bound

def test_approx_mode_runs_and_orders(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = equidepth_histogram(
        docs, "n_chars", n_buckets=8, mode="approx"
    ).collect()
    assert sum(r["n_rows"] for r in rows) == docs.where(
        F.col("n_chars").isNotNull()
    ).count()


def test_unknown_mode_raises(spark):
    df = spark.range(10).select(F.col("id").alias("v"))
    with pytest.raises(ValueError, match="mode"):
        equidepth_histogram(df, "v", mode="bogus")


def test_robust_center_spread_error_bounds(spark, sf_dir):
    import numpy as np

    from nass_summary_spark.operators.quantile_sketch import (
        robust_center_spread,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["source"]: r
        for r in robust_center_spread(docs, ["source"], "n_chars").collect()
    }
    rows = docs.where(F.col("n_chars") >= 1).select(
        "source", "n_chars"
    ).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["n_chars"])
    for src, vals in by_src.items():
        v = np.array(sorted(vals), dtype=np.int64)
        n = len(v)
        # engine's rank convention: lower-interpolated rank (n-1)//2
        exact_med = float(v[(n - 1) // 2])
        g = got[src]
        assert g["n"] == n
        assert abs(g["med_est"] - exact_med) <= exact_med / 8 + 1
        # MAD is measured around the reported center (a rank
        # statistic within 1/8 of the true median)
        c = g["center"]
        assert abs(c - exact_med) <= exact_med / 8 + 1
        d1 = np.sort(np.abs(v - c) + 1)
        exact_mad1 = float(d1[(n - 1) // 2])
        assert abs((g["mad_est"] + 1) - exact_mad1) <= exact_mad1 / 8 + 1


def test_robust_center_spread_point_mass(spark):
    from nass_summary_spark.operators.quantile_sketch import (
        robust_center_spread,
    )

    df = spark.createDataFrame([("g", 64)] * 50, "source string, v int")
    row = robust_center_spread(df, ["source"], "v").collect()[0]
    # a constant column centers on its own value and reports zero
    # spread — the point-mass exactness the bucket-floor statistics
    # guarantee (interpolated versions drift into the bucket)
    assert row["center"] == 64
    assert 64 <= row["med_est"] <= 72
    assert row["mad_est"] == 0
