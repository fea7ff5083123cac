"""Pins the driver-side logreg weight update (_wnum_update) against
the Spark expression it replaced:

    CAST(ROUND(CAST(wnum AS DOUBLE)
               - lr * (CAST(gnum AS DOUBLE) / n_docs), 0) AS BIGINT)

over exact .5 ties (HALF_UP vs Python's banker's rounding is the
classic divergence), negatives, >2^53 magnitudes where DECIMAL→double
conversion rounds, and a seeded random sweep. Any JVM/Python drift in
double formatting or rounding semantics fails loudly here before it
can perturb a trained model."""

import decimal
import random

from nass_summary_spark.operators.classifier import _wnum_update


def _spark_update(spark, cases):
    rows = ",".join(
        f"({w}L, CAST('{g}' AS DECIMAL(38,0)), {lr!r}D, {n!r}D)"
        for (w, g, lr, n) in cases
    )
    out = spark.sql(
        "SELECT CAST(ROUND(CAST(wnum AS DOUBLE)"
        "       - lr * (CAST(gnum AS DOUBLE) / n_docs), 0) AS BIGINT) AS r"
        f" FROM VALUES {rows} AS t(wnum, gnum, lr, n_docs)"
    ).collect()
    return [r["r"] for r in out]


def _cases():
    cases = [
        # exact .5 ties, both signs: HALF_UP rounds away from zero
        (0, "-5", 0.5, 1.0),     # x = 2.5  -> 3
        (0, "5", 0.5, 1.0),      # x = -2.5 -> -3
        (2, "5", 0.5, 1.0),      # x = -0.5 -> -1
        (2, "3", 0.5, 1.0),      # x = 0.5  -> 1
        (-7, "-5", 0.5, 1.0),    # x = -4.5 -> -5
        (1, "1", 0.5, 2.0),      # x = 0.75 -> 1
        # zero / no-op updates
        (0, "0", 0.5, 836.0),
        (123456789012, "0", 0.02, 836.0),
        # > 2^53: DECIMAL→double must round identically
        (0, str(2**53 + 1), 0.5, 1.0),
        (0, str(2**53 + 3), 0.02, 7.0),
        (0, str(-(10**16 + 1)), 0.5, 3.0),
        (0, str(10**18 + 7), 0.02, 836.0),
        # magnitudes past BIGINT raise CAST_OVERFLOW under ANSI in
        # BOTH the old expression and any model this replay serves —
        # deliberately not exercised (unreachable for bounded weights)
        (0, str(-(10**19 + 17)), 0.02, 12345.0),
        (0, str(10**20 + 999), 0.02, 99991.0),
        # large weights against small gradients and vice versa
        (2**52 - 1, "3", 0.5, 7.0),
        (-(2**52) + 1, "-3", 0.5, 7.0),
        (999999999999, str(10**15 + 1), 0.02, 443.0),
    ]
    rng = random.Random(20260817)
    for _ in range(120):
        w = rng.randint(-(10**13), 10**13)
        g = rng.randint(-(10**17), 10**17)
        lr = rng.choice([0.5, 0.02, 0.1, 0.25])
        n = float(rng.randint(1, 10**5))
        cases.append((w, str(g), lr, n))
    return cases


def test_wnum_update_matches_spark_expression(spark):
    cases = _cases()
    got_spark = _spark_update(spark, cases)
    got_py = [
        _wnum_update(w, decimal.Decimal(g), lr, n)
        for (w, g, lr, n) in cases
    ]
    assert got_py == got_spark


def test_wnum_update_null_propagation():
    assert _wnum_update(None, decimal.Decimal(1), 0.5, 1) is None
    assert _wnum_update(3, None, 0.5, 1) is None
