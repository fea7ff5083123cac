

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
