"""Pin the literal-array helpers bit-identical to the F.lit path.

The helpers exist purely for driver-side speed (one parsed expr vs
~75 py4j round-trips per element); any value drift would silently
change ADC distances / bloom probes, so equality is asserted on the
JVM over random + adversarial doubles and the BIGINT extremes.
"""

import random
import struct

from pyspark.sql import functions as F

from nass_summary_spark.functions.lits import (
    bigint_array,
    double_array,
    double_array2d,
)


def _bits(x):
    return struct.pack("<d", x)


def test_double_array_bit_identical(spark):
    rng = random.Random(20260817)
    vals = [rng.uniform(-1e9, 1e9) for _ in range(64)]
    vals += [0.0, -0.0, 1e-300, 1.7e308, 2**-52, 0.1 + 0.2, float("inf"),
             float("-inf"), float("nan"), 3.0, -12345.678901234567]
    row = (
        spark.range(1)
        .select(
            double_array(vals).alias("n"),
            F.array(*[F.lit(float(v)) for v in vals]).alias("o"),
        )
        .collect()[0]
    )
    assert [_bits(a) for a in row["n"]] == [_bits(b) for b in row["o"]]


def test_double_array2d_matches_nested_lits(spark):
    rng = random.Random(7)
    rows = [[rng.uniform(-100, 100) for _ in range(5)] for _ in range(7)]
    row = (
        spark.range(1)
        .select(
            double_array2d(rows).alias("n"),
            F.array(
                *[F.array(*[F.lit(v) for v in r]) for r in rows]
            ).alias("o"),
        )
        .collect()[0]
    )
    assert [[_bits(v) for v in r] for r in row["n"]] == [
        [_bits(v) for v in r] for r in row["o"]
    ]


def test_bigint_array_extremes(spark):
    vals = [-(2**63), -1, 0, 1, 2**63 - 1, 123456789012345678]
    row = spark.range(1).select(bigint_array(vals).alias("a")).collect()[0]
    assert list(row["a"]) == vals


def test_empty_arrays_typed(spark):
    df = spark.range(1).select(
        double_array([]).alias("d"),
        double_array2d([]).alias("dd"),
        bigint_array([]).alias("b"),
    )
    assert dict(df.dtypes)["d"] == "array<double>"
    assert dict(df.dtypes)["dd"] == "array<array<double>>"
    assert dict(df.dtypes)["b"] == "array<bigint>"
    r = df.collect()[0]
    assert list(r["d"]) == [] and list(r["dd"]) == [] and list(r["b"]) == []


def test_bigint_map_lookup_and_nulls(spark):
    from nass_summary_spark.functions.lits import bigint_map

    pairs = [(-1, -62106756089), (0, 0), (7, None), (2**62, -(2**62))]
    m = bigint_map(pairs)
    row = (
        spark.range(1)
        .select(
            F.element_at(m, F.lit(-1).cast("bigint")).alias("a"),
            F.element_at(m, F.lit(0).cast("bigint")).alias("b"),
            F.element_at(m, F.lit(7).cast("bigint")).alias("c"),
            F.element_at(m, F.lit(2**62).cast("bigint")).alias("d"),
            F.element_at(m, F.lit(999).cast("bigint")).alias("missing"),
        )
        .collect()[0]
    )
    assert row["a"] == -62106756089
    assert row["b"] == 0
    assert row["c"] is None
    assert row["d"] == -(2**62)
    assert row["missing"] is None


def test_bigint_map_empty_typed(spark):
    from nass_summary_spark.functions.lits import bigint_map

    df = spark.range(1).select(bigint_map([]).alias("m"))
    assert dict(df.dtypes)["m"] == "map<bigint,bigint>"
