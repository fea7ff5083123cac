"""Bucketed co-located joins: matching bucket specs must eliminate
the shuffle on BOTH sides of a fact-fact join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nass_summary_spark.sources.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "li_b", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"])
    write_bucketed(orders, "ord_b", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"])
    yield "li_b", "ord_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # AQE rewrites can hide bucket scans behind runtime plans; assert
    # on the static physical plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, on=["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_partition_pruning(spark, sf_dir, tmp_path_factory):
    """Partitioned parquet sink: a filter on the partition column must
    prune at planning time (PartitionFilters), not scan-and-filter."""
    out = str(tmp_path_factory.mktemp("part")) + "/orders"
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    from nass_summary_spark.sources.writers import write_parquet

    write_parquet(orders, out, partition_by=["o_year"])
    df = spark.read.parquet(out).where(F.col("o_year") == 1997)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_year" in plan
    assert df.count() > 0


def test_orc_roundtrip_with_pruning(spark, tmp_path):
    """ORC sink/source parity: partitioned write, partition-pruned
    read, column pruning reaches the scan."""
    import io, contextlib
    from pyspark.sql import functions as F
    from nass_summary_spark.sources.readers import read_orc
    from nass_summary_spark.sources.writers import write_orc

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3), float(i)) for i in range(30)], ["id", "grp", "v"]
    )
    path = str(tmp_path / "orc_t")
    write_orc(df, path, partition_by=["grp"])
    back = read_orc(spark, path, columns=["id", "v", "grp"])
    assert back.count() == 30
    pruned = back.where(F.col("grp") == "g1")
    assert pruned.count() == 10
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.select("v").explain("formatted")
    plan = buf.getvalue()
    assert "Scan orc" in plan
    # partition filter prunes directories; value columns pruned to v
    assert "PartitionFilters" in plan


def test_dynamic_partition_overwrite(spark, tmp_path):
    """Re-writing one partition replaces only that partition: sibling
    partitions keep their data (incremental re-ingest semantics)."""
    from pyspark.sql import functions as F
    from nass_summary_spark.sources.writers import overwrite_partitions, write_parquet

    path = str(tmp_path / "inc_t")
    base = spark.createDataFrame(
        [(1, 2012, 10.0), (2, 2012, 20.0), (3, 2017, 30.0)], ["id", "year", "v"]
    )
    write_parquet(base, path, partition_by=["year"])
    # corrected 2012 slice: one row instead of two
    fix = spark.createDataFrame([(9, 2012, 99.0)], ["id", "year", "v"])
    overwrite_partitions(fix, path, partition_by=["year"])
    back = spark.read.parquet(path)
    assert back.where(F.col("year") == 2017).count() == 1  # untouched
    got_2012 = back.where(F.col("year") == 2012).collect()
    assert len(got_2012) == 1 and got_2012[0]["id"] == 9


def test_binary_file_source(spark, tmp_path):
    from nass_summary_spark.sources.readers import read_binary_files

    (tmp_path / "a.png").write_bytes(b"\x89PNG\r\n" + b"x" * 40)
    (tmp_path / "b.png").write_bytes(b"\x89PNG\r\n" + b"y" * 2000)
    (tmp_path / "c.txt").write_text("not a blob")
    df = read_binary_files(spark, str(tmp_path), glob="*.png", max_bytes=1000)
    rows = df.collect()
    # glob pruned c.txt; max_bytes dropped b.png
    assert len(rows) == 1 and rows[0]["path"].endswith("a.png")
    assert bytes(rows[0]["content"]).startswith(b"\x89PNG")
    # feeds the multimodal pipeline unchanged
    from nass_summary_spark.operators.multimodal import binary_metadata

    meta = binary_metadata(
        df.select(F.col("path").alias("item_id"), F.col("content").alias("blob")),
        "item_id", "blob",
    ).collect()
    assert meta[0]["format"] == "png" and meta[0]["n_bytes"] == 46


def test_text_corpus_source_line_and_wholefile(spark, tmp_path):
    from nass_summary_spark.sources.readers import read_text_corpus

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "f1.txt").write_text("alpha doc one\n\nbeta doc two\n")
    (d / "f2.txt").write_text("gamma doc three\n")
    lines = read_text_corpus(spark, str(d)).collect()
    assert len(lines) == 3  # blank line dropped
    by_file = {}
    for r in lines:
        by_file.setdefault(r["doc_path"].rsplit("/", 1)[-1], []).append(
            (r["doc_seq"], r["text"])
        )
    assert sorted(by_file["f1.txt"]) == [(0, "alpha doc one"), (2, "beta doc two")]
    whole = read_text_corpus(spark, str(d), whole_file=True).collect()
    assert len(whole) == 2
    assert all(r["doc_seq"] == 0 for r in whole)
    assert any("alpha doc one\n\nbeta doc two" in r["text"] for r in whole)


def test_text_corpus_multi_split_file_ordinal(spark, tmp_path):
    """A file wider than one scan split must still get doc_seq in
    FILE order: the ordinal sorts splits by byte offset
    (_metadata.file_block_start), not by partition index — Spark
    packs splits into partitions largest-first, so index order is
    not offset order."""
    from nass_summary_spark.sources.readers import read_text_corpus

    d = tmp_path / "big"
    d.mkdir()
    n = 2000
    (d / "big.txt").write_text("".join(f"line-{i:06d} {'x' * 40}\n" for i in range(n)))
    tiny = {"spark.sql.files.maxPartitionBytes": "8192",
            "spark.sql.files.openCostInBytes": "0"}
    old = {k: spark.conf.get(k) for k in tiny}
    for k, v in tiny.items():
        spark.conf.set(k, v)
    try:
        rows = read_text_corpus(spark, str(d)).collect()
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    assert len(rows) == n
    seq_to_line = {r["doc_seq"]: r["text"] for r in rows}
    assert all(seq_to_line[i].startswith(f"line-{i:06d}") for i in range(n))


def test_clustered_write_disjoint_sorted_files(spark, tmp_path):
    """Range-clustered layout: every output file holds a disjoint key
    range (parquet min/max stats then prune reads to one file)."""
    from nass_summary_spark.sources.writers import write_parquet_clustered

    df = spark.range(0, 10000).withColumn("k", (F.col("id") * 7919) % 10000)
    path = str(tmp_path / "clustered")
    write_parquet_clustered(df, path, "k", n_files=4)
    back = spark.read.parquet(path).select(
        F.input_file_name().alias("f"), F.col("k")
    )
    ranges = (
        back.groupBy("f")
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sum(r["n"] for r in ranges) == 10000
    spans = sorted((r["lo"], r["hi"]) for r in ranges)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2  # disjoint ranges across files
    # point-lookup pruning is real: one file serves k = 17
    hit_files = {r["f"] for r in back.where(F.col("k") == 17).collect()}
    assert len(hit_files) == 1


def test_compact_table_reduces_files_preserves_rows(spark, tmp_path):
    """Small-files compaction: a fragmented partitioned table is
    rewritten to ~1 file per partition volume, values intact, and the
    swap leaves no temp dirs behind."""
    import os

    from pyspark.sql import functions as F

    from nass_summary_spark.sources.writers import compact_table

    path = str(tmp_path / "frag")
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 3).alias("p"), (F.col("id") * 2).alias("v")
    )
    # fragment: 8 writer tasks per partition value
    df.repartition(8).write.partitionBy("p").parquet(path)
    want = {(r["id"], r["p"], r["v"]) for r in spark.read.parquet(path).collect()}

    stats = compact_table(spark, path, partition_by=["p"])
    assert stats["rows"] == 2000
    assert stats["files_after"] < stats["files_before"]
    got = {(r["id"], r["p"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == want
    assert not os.path.exists(path + "__compacting")
    assert not os.path.exists(path + "__pre_compact")
