

def test_jsonl_roundtrip_gzip(spark, tmp_path):
    """JSONL sink -> source round trip through gzip part files,
    schema pinned on read (no inference scan)."""
    from nass_summary_spark.sources.readers import read_jsonl
    from nass_summary_spark.sources.writers import write_jsonl

    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", None), (3, 'quote"s', 0.0)],
        "id long, name string, score double",
    )
    out = str(tmp_path / "jsonl")
    write_jsonl(df, out, compression="gzip")
    import glob
    assert glob.glob(out + "/*.gz"), "expected gzip part files"
    back = read_jsonl(spark, out, "id long, name string, score double")
    got = sorted(map(tuple, back.collect()))
    assert got == sorted(map(tuple, df.collect()))


def test_zorder_sink_localizes_both_dimensions(spark, tmp_path):
    """Z-order layout: every output file must cover a BOUNDED patch
    of the (x, y) plane — per-file x AND y spans far below the full
    domain — which is what lets row-group stats prune reads on
    either column. A single-column sort would leave y spans at
    ~full domain."""
    import glob

    from pyspark.sql import functions as F

    from nass_summary_spark.sources.writers import write_parquet_zorder

    n = 1 << 12
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 64).cast("double").alias("x"),
        ((F.col("id") * 7919) % 64).cast("double").alias("y"),
    )
    out = str(tmp_path / "zorder")
    write_parquet_zorder(df, out, "x", "y", n_files=16, bits=6)
    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) >= 8
    spans_x, spans_y = [], []
    for f in files:
        pdf = spark.read.parquet(f).agg(
            F.min("x"), F.max("x"), F.min("y"), F.max("y")
        ).collect()[0]
        spans_x.append(pdf[1] - pdf[0])
        spans_y.append(pdf[3] - pdf[2])
    domain = 63.0
    # average per-file span must be well under the domain on BOTH axes
    assert sum(spans_x) / len(spans_x) < 0.6 * domain
    assert sum(spans_y) / len(spans_y) < 0.6 * domain
    # round trip: no rows lost
    assert spark.read.parquet(out).count() == n


def test_read_parquet_evolving_conforms_mixed_generations(spark, tmp_path):
    """Three file generations (v1 missing a column, v2 int ids, v3
    long ids + extra column) read as ONE contract-conformed relation:
    missing columns are typed nulls, ints widen to the contract
    long, extra columns drop."""
    from nass_summary_spark.sources.readers import read_parquet_evolving

    base = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id int, name string").write.mode(
        "append"
    ).parquet(base)
    spark.createDataFrame(
        [(2, "b", 2.5)], "id int, name string, score double"
    ).write.mode("append").parquet(base)
    spark.createDataFrame(
        [(3, "c", 3.5, "junk")],
        "id long, name string, score double, debug string",
    ).write.mode("append").parquet(base)

    got = read_parquet_evolving(
        spark, base, "id long, name string, score double"
    )
    assert [f.simpleString() for f in got.schema.fields] == [
        "id:bigint", "name:string", "score:double"
    ]
    rows = {r["id"]: (r["name"], r["score"]) for r in got.collect()}
    assert rows == {1: ("a", None), 2: ("b", 2.5), 3: ("c", 3.5)}
