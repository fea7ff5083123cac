"""spread_narrow_scan: decision correctness + the per-(scan, width)
probe cache (the .rdd numPartitions probe costs a full plan cycle of
driver time, so it must run once per file set, not once per call)."""

from pyspark.sql import functions as F

from nass_summary_spark.functions import layout
from nass_summary_spark.functions.layout import spread_narrow_scan


def test_narrow_scan_is_spread(spark, tmp_path):
    p = str(tmp_path / "narrow.parquet")
    spark.range(100).select(
        F.col("id"), F.col("id").cast("string").alias("t")
    ).coalesce(1).write.mode("overwrite").parquet(p)
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = spark.read.parquet(p).select("id", "t")
    out = spread_narrow_scan(df)
    assert out.rdd.getNumPartitions() == width
    # row content unchanged
    assert sorted(r["id"] for r in out.collect()) == list(range(100))


def test_probe_cache_hits_per_file_set(spark, tmp_path):
    p = str(tmp_path / "cached.parquet")
    spark.range(10).coalesce(1).write.mode("overwrite").parquet(p)
    layout._NPARTS_CACHE.clear()
    df = spark.read.parquet(p)
    spread_narrow_scan(df)
    assert len(layout._NPARTS_CACHE) == 1
    # same files, new DataFrame object: no new cache entry
    spread_narrow_scan(spark.read.parquet(p).select("id"))
    assert len(layout._NPARTS_CACHE) == 1


def test_no_input_files_falls_back(spark):
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = spark.range(50, numPartitions=2)
    out = spread_narrow_scan(df)
    assert out.rdd.getNumPartitions() == width
