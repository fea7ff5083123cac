"""Unit tests for the column-function library, on tiny frames with
hand-computed expectations."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from nass_summary_spark.functions.parsing import (
    commodity_name,
    dataitem_paths,
    location_code,
    safe_number,
    strip_measured_in,
)
from nass_summary_spark.functions.text import (
    FINGERPRINT_BASE,
    FINGERPRINT_MOD,
    bpe_ish_token_count,
    langid_best,
    rolling_fingerprint,
    whitespace_token_count,
    word_shingles,
)
from nass_summary_spark.functions.vectors import (
    cosine_similarity,
    hamming64,
    simhash64,
    token_hash64,
)


def test_safe_number_suppressed_and_commas(spark):
    df = spark.createDataFrame(
        [("1,234.5",), ("(D)",), ("(NA)",), (" 42 ",), ("junk",)], ["value"]
    )
    got = [r[0] for r in df.select(safe_number("value")).collect()]
    assert got == [1234.5, None, None, 42.0, None]


def test_location_code_grains(spark):
    df = spark.createDataFrame(
        [("06", "001", "40"), ("06", "", "40"), ("06", "", ""), ("06", None, None)],
        ["fips", "county", "asd"],
    )
    got = [r[0] for r in df.select(location_code("fips", "county", "asd")).collect()]
    assert got == ["06001", "06ag40", "06", "06"]


def test_dataitem_paths_and_unit(spark):
    df = spark.createDataFrame(
        [("CORN, GRAIN - PRODUCTION, MEASURED IN BU",)], ["dataitem"]
    )
    com, item = dataitem_paths("dataitem")
    row = df.select(com.alias("c"), item.alias("i")).collect()[0]
    assert row["c"] == ["CORN", "GRAIN"]
    assert row["i"] == ["PRODUCTION", "MEASURED IN BU"]
    unit = df.select(strip_measured_in(F.element_at(item, 2))).collect()[0][0]
    assert unit == "BU"


def test_commodity_name_composition(spark):
    df = spark.createDataFrame(
        [
            ("WHEAT", "WINTER", "ALL UTILIZATION PRACTICES"),
            ("CORN", "ALL CLASSES", "GRAIN"),
            ("HAY", "ALL CLASSES", "ALL UTILIZATION PRACTICES"),
        ],
        ["c", "k", "u"],
    )
    got = [r[0] for r in df.select(commodity_name("c", "k", "u")).collect()]
    assert got == ["WHEAT, WINTER", "CORN, GRAIN", "HAY"]


def test_ngrams_keep_multiplicity_and_order(spark):
    from nass_summary_spark.functions.text import ngrams_from_words, words

    df = spark.createDataFrame([("a b a b",), ("a",), ("",)], ["text"])
    got = [r[0] for r in df.select(ngrams_from_words(words("text"), 2)).collect()]
    assert got[0] == ["a b", "b a", "a b"]  # duplicates retained, in order
    assert got[1] == []
    assert got[2] == []


def test_word_shingles_short_doc_is_empty(spark):
    df = spark.createDataFrame([("one two",), ("a b c d",), ("",)], ["text"])
    got = [r[0] for r in df.select(word_shingles("text", 3)).collect()]
    assert got[0] == []
    assert got[1] == ["a b c", "b c d"]
    assert got[2] == []


def test_token_counts(spark):
    df = spark.createDataFrame([("Hello, world 42 times!",)], ["text"])
    row = df.select(
        whitespace_token_count("text").alias("ws"),
        bpe_ish_token_count("text").alias("bpe"),
    ).collect()[0]
    assert row["ws"] == 4
    # Hello , world 42 times !  → 6 BPE-ish tokens
    assert row["bpe"] == 6


def test_langid_best(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat on the mat and it is that",),
            ("el perro y la casa de los que en las",),
            ("xyzzy qwerty",),
        ],
        ["text"],
    )
    got = [r[0] for r in df.select(langid_best("text")).collect()]
    assert got == ["en", "es", "und"]


def test_rolling_fingerprint_matches_python(spark):
    text = "alpha beta gamma"
    df = spark.createDataFrame([(text,)], ["text"])
    got = df.select(rolling_fingerprint("text")).collect()[0][0]
    acc = 0
    for tok in text.split():
        h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
        acc = (acc * FINGERPRINT_BASE + h) % FINGERPRINT_MOD
    assert got == acc


def test_token_hash64_matches_md5(spark):
    df = spark.createDataFrame([("hello",)], ["t"])
    got = df.select(token_hash64("t", bits=32)).collect()[0][0]
    assert got == int(hashlib.md5(b"hello").hexdigest()[:8], 16)


def test_cosine_similarity_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [2.0, 4.0]), ([0.0, 0.0], [1.0, 1.0])],
        ["a", "b"],
    )
    got = [r[0] for r in df.select(cosine_similarity("a", "b")).collect()]
    assert got[0] == 0.0
    assert abs(got[1] - 1.0) < 1e-12
    assert got[2] is None  # zero vector → NULL, not inf


def test_simhash_identical_texts_zero_hamming(spark):
    df = spark.createDataFrame(
        [(F_id, t) for F_id, t in [(1, "a b c d"), (2, "a b c d"), (3, "w x y z")]],
        ["id", "text"],
    )
    from nass_summary_spark.functions.text import words

    fp = df.select("id", simhash64(words("text")).alias("fp"))
    rows = {r["id"]: r["fp"] for r in fp.collect()}
    assert rows[1] == rows[2]
    dist = (
        fp.alias("a")
        .crossJoin(fp.alias("b"))
        .where((F.col("a.id") == 1) & (F.col("b.id") == 3))
        .select(hamming64(F.col("a.fp"), F.col("b.fp")))
        .collect()[0][0]
    )
    assert dist > 0


def test_local_struct_df_matches_createdataframe(spark):
    """functions/smalldf: the one-expression local relation must be
    value- and schema-identical to the createDataFrame it replaces
    (the expr path exists because every job over a pickled local
    relation pays a multi-second Python-runner tax), including exact
    double round-trips, string escaping, NULLs, and array<double>."""
    from nass_summary_spark.functions.smalldf import local_struct_df

    schema = (
        "a int, b bigint, c double, d string, e boolean, f array<double>"
    )
    rows = [
        (1, 2**40, 0.1, "it's a 'test'\\path", True, [0.25, 1e-17]),
        (None, None, float(2**53 - 1), "", False, [3.3333333333333335]),
    ]
    got = local_struct_df(spark, schema, rows)
    want = spark.createDataFrame(rows, schema)
    # nullability differs (expr literals are non-null); names + types
    # and the VALUES are the contract
    assert [(f.name, f.dataType.simpleString()) for f in got.schema] == [
        (f.name, f.dataType.simpleString()) for f in want.schema
    ]
    key = repr
    assert sorted(map(tuple, got.collect()), key=key) == sorted(
        map(tuple, want.collect()), key=key
    )
    # empty-rows branch keeps the schema
    empty = local_struct_df(spark, "x int, y double", [])
    assert empty.count() == 0 and [f.name for f in empty.schema] == ["x", "y"]


def test_local_struct_df_rejects_unsupported_types_even_empty(spark):
    """Type validation happens at parse time on EVERY path: a
    parameterized type (decimal(10,2)) must fail loudly with zero
    rows too — the old empty-rows branch rendered then re-split a
    projection string and never reached validation."""
    import pytest

    for rows in ([], [(1.0,)]):
        with pytest.raises(ValueError, match="unsupported field type"):
            from nass_summary_spark.functions.smalldf import (
                local_struct_df,
            )

            local_struct_df(spark, "x decimal(10,2)", rows)
    # the empty path still produces array<double> columns correctly
    from nass_summary_spark.functions.smalldf import local_struct_df

    empty = local_struct_df(spark, "v array<double>", [])
    assert empty.count() == 0
    assert empty.schema[0].dataType.simpleString() == "array<double>"
