"""Unit tests for the r5 session-2 wave: experiment statistics
(Welch t, chi-square, Mann-Whitney), CUSUM change-point scan,
compressibility signal, nearest-zone fold."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


def test_welch_ab_test_hand_computed(spark):
    rows = [(False, 1.0), (False, 2.0), (False, 3.0),
            (True, 3.0), (True, 4.0), (True, 5.0), (True, 6.0)]
    df = spark.createDataFrame(rows, ["treat", "m"])
    from nass_summary_spark.operators.experiment import welch_ab_test

    r = welch_ab_test(df, "treat", "m").collect()[0]
    na, nb, ma, mb = 3.0, 4.0, 2.0, 4.5
    va, vb = 1.0, (4 * 86.0 - 18.0 * 18.0) / (4 * 3.0)
    qa, qb = va / na, vb / nb
    t = (mb - ma) / math.sqrt(qa + qb)
    dof = (qa + qb) ** 2 / (qa * qa / 2.0 + qb * qb / 3.0)
    assert (r["n_control"], r["n_treatment"]) == (3, 4)
    assert r["mean_control"] == 2.0 and r["mean_treatment"] == 4.5
    assert r["lift"] == 2.5
    assert r["t_stat"] == round(t, 6)
    assert r["dof"] == round(dof, 6)


def test_welch_ab_test_null_metric_excluded(spark):
    rows = [(False, 1.0), (False, None), (False, 3.0),
            (True, 2.0), (True, 4.0), (True, None)]
    df = spark.createDataFrame(rows, ["treat", "m"])
    from nass_summary_spark.operators.experiment import welch_ab_test

    r = welch_ab_test(df, "treat", "m").collect()[0]
    # n matches the non-null population the mean summarizes
    assert (r["n_control"], r["n_treatment"]) == (2, 2)
    assert r["mean_control"] == 2.0 and r["mean_treatment"] == 3.0


def test_chi_square_2x2_matches_closed_form(spark):
    rows = (
        [("x", "u")] * 10 + [("x", "v")] * 20
        + [("y", "u")] * 30 + [("y", "v")] * 40
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    from nass_summary_spark.operators.experiment import (
        chi_square_independence,
    )

    r = chi_square_independence(df, "a", "b").collect()[0]
    # classic 2x2 closed form: N(ad-bc)^2 / (r1 r2 c1 c2)
    chi2 = 100.0 * (10 * 40 - 20 * 30) ** 2 / (30 * 70 * 40 * 60)
    assert (r["n"], r["card_a"], r["card_b"], r["dof"]) == (100, 2, 2, 1)
    assert abs(r["chi2"] - chi2) < 1e-6
    assert abs(r["cramers_v"] - math.sqrt(chi2 / 100.0)) < 1e-6


def test_chi_square_zero_cells_equal_dense_formula(spark):
    # (y, v) never observed: the o^2/(ra*cb) identity must equal the
    # dense-grid sum where the zero cell contributes its expected mass
    rows = [("x", "u")] * 5 + [("x", "v")] * 5 + [("y", "u")] * 10
    df = spark.createDataFrame(rows, ["a", "b"])
    from nass_summary_spark.operators.experiment import (
        chi_square_independence,
    )

    r = chi_square_independence(df, "a", "b").collect()[0]
    n = 20.0
    dense = 0.0
    obs = {("x", "u"): 5, ("x", "v"): 5, ("y", "u"): 10, ("y", "v"): 0}
    ra = {"x": 10, "y": 10}
    cb = {"u": 15, "v": 5}
    for (a, b), o in obs.items():
        e = ra[a] * cb[b] / n
        dense += (o - e) ** 2 / e
    assert abs(r["chi2"] - round(dense, 6)) < 1e-6


def test_mann_whitney_hand_computed_with_ties(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 2.0), ("b", 3.0), ("b", 4.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    from nass_summary_spark.operators.experiment import mann_whitney_u

    r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    # ranks: 1, 2.5, 2.5, 4.5, 4.5, 6 → R_a = 8, U_a = 2
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["u_a"] == 2.0
    sigma2 = (9.0 / 12.0) * (7.0 - 12.0 / 30.0)
    assert r["z_stat"] == round((2.0 - 4.5) / math.sqrt(sigma2), 6)


def test_mann_whitney_u_sums_to_na_nb(spark):
    # U_a + U_b = n_a * n_b (rank-sum identity), any data
    rows = [("a", float(i * 7 % 13)) for i in range(20)] + [
        ("b", float(i * 5 % 11)) for i in range(15)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    from nass_summary_spark.operators.experiment import mann_whitney_u

    ra = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    rb = mann_whitney_u(df, "g", "v", "b", "a").collect()[0]
    assert ra["u_a"] + rb["u_a"] == ra["n_a"] * ra["n_b"]


def test_cusum_finds_mean_shift(spark):
    rows = [("g", i, v) for i, v in enumerate([0, 0, 0, 10, 10, 10], 1)]
    df = spark.createDataFrame(rows, ["g", "slot", "v"])
    from nass_summary_spark.operators.stats import cusum_changepoint

    r = cusum_changepoint(df, ["g"], "slot", "v").collect()[0]
    # S = [0,0,0,10,20,30]; |6*S_t - 30t| peaks at t=3 with 90
    assert r["changepoint_slot"] == 3
    assert r["cusum_scaled"] == 90
    assert r["n_slots"] == 6


def test_cusum_flat_series_ties_break_earliest(spark):
    rows = [("g", i, 5) for i in range(1, 5)]
    df = spark.createDataFrame(rows, ["g", "slot", "v"])
    from nass_summary_spark.operators.stats import cusum_changepoint

    r = cusum_changepoint(df, ["g"], "slot", "v").collect()[0]
    assert r["cusum_scaled"] == 0
    assert r["changepoint_slot"] == 1


def test_compressibility_bands_and_determinism(spark):
    import hashlib

    noisy = "".join(
        hashlib.sha256(str(i).encode()).hexdigest() for i in range(40)
    )
    rows = [(1, "spam " * 400), (2, noisy), (3, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from nass_summary_spark.operators.compress import (
        compressibility_scores,
    )

    out = {r["doc_id"]: r for r in compressibility_scores(df).collect()}
    assert out[1]["n_bytes"] == 2000
    assert out[1]["ratio"] < 0.05 and out[1]["flag_repetitive"]
    assert out[2]["ratio"] > out[1]["ratio"] and not out[2]["flag_repetitive"]
    assert out[3]["ratio"] is None
    again = {r["doc_id"]: r["ratio"] for r in
             compressibility_scores(df).collect()}
    assert {k: v["ratio"] for k, v in out.items()} == again


def test_nearest_ring_centroid_argmin_and_ties(spark):
    from nass_summary_spark.operators.geo import (
        nearest_ring_centroid,
        rect_ring,
    )

    zones = spark.createDataFrame(
        [("z1", 0, 0, 10, 10), ("z2", 20, 0, 30, 10)],
        ["cmz", "x0", "y0", "x1", "y1"],
    ).select(
        "cmz",
        rect_ring(F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"))
        .alias("zone_ring"),
    )
    # centroids: z1=(5,5), z2=(25,5); (14,5) is nearer z1 by 81<121;
    # (15,5) is equidistant → tie breaks to the smaller key z1
    pts = spark.createDataFrame(
        [(1, 4.0, 5.0), (2, 24.0, 5.0), (3, 15.0, 5.0)],
        ["pid", "x", "y"],
    )
    for arrow in (True, False):
        out = {r["pid"]: r for r in
               nearest_ring_centroid(pts, zones, key_col="cmz",
                                     arrow=arrow).collect()}
        assert out[1]["cmz"] == "z1" and out[1]["dist2_x4"] == 4
        assert out[2]["cmz"] == "z2" and out[2]["dist2_x4"] == 4
        assert out[3]["cmz"] == "z1" and out[3]["dist2_x4"] == 400


def test_nearest_ring_centroid_twins_identical(spark, sf_dir):
    """The Arrow numpy sweep and the pure-Column fold must agree
    row-for-row on real data (the intersection_area twin pattern)."""
    from nass_summary_spark.operators.geo import (
        nearest_ring_centroid,
        rect_ring,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    pts = o.select(
        "o_orderkey",
        ((k * 29) % 1000 + 0.5).cast("double").alias("x"),
        ((k * 71) % 1000 + 0.5).cast("double").alias("y"),
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    sk = F.col("s_suppkey")
    zones = s.select(
        F.concat(F.lit("z"), F.lpad(sk.cast("string"), 3, "0")).alias("cmz"),
        rect_ring(
            (sk * 53) % 900, (sk * 67) % 900,
            (sk * 53) % 900 + 40 + sk % 61,
            (sk * 67) % 900 + 40 + sk % 53,
        ).alias("zone_ring"),
    )
    a = nearest_ring_centroid(pts, zones, arrow=True).orderBy("o_orderkey")
    b = nearest_ring_centroid(pts, zones, arrow=False).orderBy("o_orderkey")
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_nearest_ring_centroid_rejects_empty_zones(spark):
    from nass_summary_spark.operators.geo import (
        nearest_ring_centroid,
        rect_ring,
    )

    zones = spark.createDataFrame(
        [("z", 0, 0, 1, 1)], ["cmz", "a", "b", "c", "d"]
    ).select(
        "cmz",
        rect_ring(F.col("a"), F.col("b"), F.col("c"), F.col("d"))
        .alias("zone_ring"),
    ).where(F.lit(False))
    pts = spark.createDataFrame([(1, 0.0, 0.0)], ["pid", "x", "y"])
    with pytest.raises(ValueError):
        nearest_ring_centroid(pts, zones, key_col="cmz")


def test_nearest_zone_plan_is_shuffle_free(spark, sf_dir):
    """The fold formulation must not exchange the point table."""
    from nass_summary_spark.plans.queries import QUERIES

    plan = (
        QUERIES["nearest_zone"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_table_checksum_order_independent_and_sensitive(spark):
    from nass_summary_spark.operators.integrity import table_checksum

    rows = [(i, f"s{i % 3}") for i in range(100)]
    a = spark.createDataFrame(rows, ["k", "s"])
    b = spark.createDataFrame(list(reversed(rows)), ["k", "s"]) \
        .repartition(7)
    ca = table_checksum(a, ["k", "s"]).collect()[0]
    cb = table_checksum(b, ["k", "s"]).collect()[0]
    assert tuple(ca) == tuple(cb)  # row order / partitioning invisible
    mutated = spark.createDataFrame(
        rows[:-1] + [(99, "sX")], ["k", "s"]
    )
    cm = table_checksum(mutated, ["k", "s"]).collect()[0]
    assert cm["n_rows"] == ca["n_rows"]
    assert cm["xor_checksum"] != ca["xor_checksum"]
    assert cm["sum_checksum"] != ca["sum_checksum"]


def test_table_checksum_grouped_localizes_mismatch(spark):
    from nass_summary_spark.operators.integrity import table_checksum

    rows = [(i, i % 2) for i in range(40)]
    a = spark.createDataFrame(rows, ["k", "g"])
    b = spark.createDataFrame(
        [(i, i % 2) if i != 7 else (777, 1) for i in range(40)],
        ["k", "g"],
    )
    da = {r["g"]: r for r in table_checksum(a, ["k"], ["g"]).collect()}
    db = {r["g"]: r for r in table_checksum(b, ["k"], ["g"]).collect()}
    assert tuple(da[0]) == tuple(db[0])          # untouched group equal
    assert da[1]["xor_checksum"] != db[1]["xor_checksum"]


def test_table_checksum_rejects_float_columns(spark):
    import pytest as _pytest

    from nass_summary_spark.operators.integrity import table_checksum

    df = spark.createDataFrame([(1, 1.5)], ["k", "x"])
    with _pytest.raises(ValueError):
        table_checksum(df, ["k", "x"])


def test_cdc_apply_merge_semantics(spark):
    from nass_summary_spark.operators.merge import cdc_apply

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 1, "U"),
            (3, "c", 1, "D"),
            (4, "d", 1, "I"),
            (1, "a2", 1, "U"),
            (1, "a2", 2, "D"),   # delete outranks the update
        ],
        ["k", "v", "seq", "op"],
    )
    out = {r["k"]: r["v"] for r in
           cdc_apply(base, changes, ["k"], ["v"]).collect()}
    assert out == {2: "b2", 4: "d"}


def test_woe_iv_hand_computed_and_zero_cell_excluded(spark):
    import math

    from nass_summary_spark.operators.experiment import woe_iv

    # bucket A: 30 pos / 10 neg; bucket B: 10 pos / 30 neg;
    # bucket C: 5 pos / 0 neg -> excluded (zero cell)
    rows = ([("A", True)] * 30 + [("A", False)] * 10
            + [("B", True)] * 10 + [("B", False)] * 30
            + [("C", True)] * 5)
    df = spark.createDataFrame(rows, ["b", "l"])
    out = {r["bucket"]: r for r in woe_iv(df, "b", "l").collect()}
    assert set(out) == {"A", "B"}
    tp, tn = 45.0, 40.0
    woe_a = math.log((30 / tp) / (10 / tn))
    woe_b = math.log((10 / tp) / (30 / tn))
    iv = (30 / tp - 10 / tn) * woe_a + (10 / tp - 30 / tn) * woe_b
    assert out["A"]["woe"] == round(woe_a, 6)
    assert out["B"]["woe"] == round(woe_b, 6)
    assert out["A"]["iv_total"] == round(iv, 6)
    assert (out["A"]["n_pos"], out["A"]["n_neg"]) == (30, 10)


def test_contract_violations_all_rule_classes(spark):
    from nass_summary_spark.operators.contract import contract_violations

    child = spark.createDataFrame(
        [
            (1, 1, 10, None),     # ok, parented
            (1, 1, 60, 100),      # DUPLICATE key + qty violation, orphan fk
            (2, 1, 5, 1),         # ok
            (3, 1, None, None),   # null qty (not counted by > rule)
        ],
        "k int, sub int, qty int, fk int",
    )
    parent = spark.createDataFrame([(1,)], "pk int")
    out = {r["rule"]: r for r in contract_violations(
        child,
        {"qty_gt_45": F.col("qty") > 45},
        unique_keys=["k", "sub"],
        ref=(parent, "fk", "pk"),
    ).collect()}
    assert out["qty_gt_45"]["n_violations"] == 1
    assert out["unique:k,sub"]["n_violations"] == 1   # 4 rows, 3 keys
    # fk=100 is an orphan; NULL fks are exempt by contract
    assert out["ref:fk"]["n_violations"] == 1
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["qty_gt_45"]["violation_rate"] == 0.25


def test_waterfill_hand_computed(spark):
    from nass_summary_spark.operators.sampling import waterfill_allocation

    src = spark.createDataFrame(
        [("A", 1, 100), ("B", 1, 10), ("C", 2, 1000)],
        "key string, w int, avail int",
    )
    out = {r["key"]: r for r in
           waterfill_allocation(src, "key", "w", "avail", 200).collect()}
    # ratios B=10 < A=100 < C=500; only B saturates at budget 200;
    # remaining 190 splits 1:2 over A,C with integer DIV
    assert out["B"]["saturated"] and out["B"]["alloc_tokens"] == 10
    assert not out["A"]["saturated"] and out["A"]["alloc_tokens"] == 63
    assert not out["C"]["saturated"] and out["C"]["alloc_tokens"] == 126


def test_waterfill_budget_exceeds_supply(spark):
    from nass_summary_spark.operators.sampling import waterfill_allocation

    src = spark.createDataFrame(
        [("A", 3, 50), ("B", 1, 20)], "key string, w int, avail int"
    )
    out = {r["key"]: r for r in
           waterfill_allocation(src, "key", "w", "avail", 1000).collect()}
    assert all(r["saturated"] for r in out.values())
    assert out["A"]["alloc_tokens"] == 50 and out["B"]["alloc_tokens"] == 20


def test_row_digest_encoding_is_injective(spark):
    """Separator injection and the NULL sentinel must not collide:
    ('a|b','c') vs ('a','b|c'), and a literal backslash-N string vs
    a real NULL, all hash differently."""
    from nass_summary_spark.operators.integrity import table_checksum

    a = spark.createDataFrame([("a|b", "c")], "x string, y string")
    b = spark.createDataFrame([("a", "b|c")], "x string, y string")
    c = spark.createDataFrame([("\\N", "c")], "x string, y string")
    d = spark.createDataFrame([(None, "c")], "x string, y string")
    digs = [
        table_checksum(df, ["x", "y"]).collect()[0]["xor_checksum"]
        for df in (a, b, c, d)
    ]
    assert len(set(digs)) == 4


def test_contract_violations_without_row_rules(spark):
    import pytest as _pytest

    from nass_summary_spark.operators.contract import contract_violations

    df = spark.createDataFrame([(1, 1), (1, 1), (2, 1)], "k int, s int")
    out = contract_violations(df, {}, unique_keys=["k", "s"]).collect()
    assert len(out) == 1 and out[0]["n_violations"] == 1
    with _pytest.raises(ValueError):
        contract_violations(df, {})


def test_contract_uniqueness_null_keys_not_miscounted(spark):
    from nass_summary_spark.operators.contract import contract_violations

    df = spark.createDataFrame(
        [(None, 1), (None, 2), (3, 1)], "k int, s int"
    )
    out = contract_violations(df, {}, unique_keys=["k", "s"]).collect()[0]
    # three distinct (k, s) tuples even with NULL fields → 0 dupes
    assert out["n_violations"] == 0


def test_chi_square_null_categories_excluded(spark):
    from nass_summary_spark.operators.experiment import (
        chi_square_independence,
    )

    rows = ([("x", "u")] * 10 + [("x", "v")] * 20
            + [("y", "u")] * 30 + [("y", "v")] * 40
            + [(None, "u")] * 7 + [("x", None)] * 5)
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi_square_independence(df, "a", "b").collect()[0]
    # identical to the no-NULL fixture: complete-case convention
    assert (r["n"], r["card_a"], r["card_b"]) == (100, 2, 2)


def test_pair_retrieval_metrics_hand_computed(spark):
    from nass_summary_spark.operators.experiment import (
        pair_retrieval_metrics,
    )

    gold = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5)], "id_a int, id_b int"
    )
    pred = spark.createDataFrame(
        [(1, 2), (2, 3), (6, 7), (6, 7)], "id_a int, id_b int"
    )
    r = pair_retrieval_metrics(gold, pred, ["id_a", "id_b"]).collect()[0]
    # pred distinct = 3; hits = {(1,2),(2,3)}
    assert (r["n_gold"], r["n_pred"], r["n_hit"]) == (4, 3, 2)
    assert r["precision"] == round(2 / 3, 6)
    assert r["recall"] == 0.5
    p, q = 2 / 3, 0.5
    assert r["f1"] == round(2 * p * q / (p + q), 6)
