

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


def test_read_csv_quarantine_splits_clean_and_rejects(spark, tmp_path):
    from nass_summary_spark.sources.readers import read_csv_quarantine

    p = tmp_path / "drop.csv"
    p.write_text(
        "id,qty,name\n"
        "1,10,alpha\n"
        "2,notanumber,beta\n"   # qty fails INT contract
        "3,30,gamma\n"
    )
    clean, quarantined, parsed = read_csv_quarantine(
        spark, str(p), "id INT, qty INT, name STRING"
    )
    got = {r["id"]: (r["qty"], r["name"]) for r in clean.collect()}
    assert got == {1: (10, "alpha"), 3: (30, "gamma")}
    bad = [r["raw_line"] for r in quarantined.collect()]
    assert bad == ["2,notanumber,beta"]
    parsed.unpersist()


def test_manifest_incremental_read_processes_each_file_once(spark, tmp_path):
    from nass_summary_spark.sources.readers import (
        manifest_commit,
        manifest_incremental_read,
    )

    data = tmp_path / "lake"
    mdir = str(tmp_path / "manifest")
    spark.createDataFrame([(1,)], "id long").write.parquet(str(data / "f1"))
    spark.createDataFrame([(2,)], "id long").write.parquet(str(data / "f2"))
    glob_pat = str(data / "*" / "*.parquet")

    df1, files1 = manifest_incremental_read(spark, glob_pat, mdir)
    assert sorted(r["id"] for r in df1.collect()) == [1, 2]
    manifest_commit(mdir, files1)

    # no new files -> empty batch, schema preserved
    df2, files2 = manifest_incremental_read(spark, glob_pat, mdir)
    assert files2 == [] and df2.count() == 0
    assert df2.schema == df1.schema

    # a third file arrives -> only it is read
    spark.createDataFrame([(3,)], "id long").write.parquet(str(data / "f3"))
    df3, files3 = manifest_incremental_read(spark, glob_pat, mdir)
    assert [r["id"] for r in df3.collect()] == [3]
    assert all("f3" in f for f in files3)
    manifest_commit(mdir, files3)

    # re-commit of the same list is harmless (idempotent retry)
    manifest_commit(mdir, files3)
    df4, files4 = manifest_incremental_read(spark, glob_pat, mdir)
    assert files4 == [] and df4.count() == 0


def test_manifest_incremental_read_empty_lake(spark, tmp_path):
    """Pre-first-file state: schema= yields an empty typed batch; no
    schema raises a clear error instead of Spark's PATH_NOT_FOUND."""
    import pytest as _pytest

    from nass_summary_spark.sources.readers import (
        manifest_incremental_read,
    )

    glob_pat = str(tmp_path / "nothing" / "*.parquet")
    df, files = manifest_incremental_read(
        spark, glob_pat, str(tmp_path / "m"), schema="id long"
    )
    assert files == [] and df.count() == 0
    assert [f.simpleString() for f in df.schema.fields] == ["id:bigint"]
    with _pytest.raises(ValueError):
        manifest_incremental_read(spark, glob_pat, str(tmp_path / "m"))


def test_manifest_vacuum_expires_only_committed_old_files(spark, tmp_path):
    """VACUUM lifecycle (D22): only files that are BOTH committed to
    the manifest AND older than retention are deleted; uncommitted
    files survive at any age; manifest entries for deleted and
    already-missing files are pruned; the incremental reader keeps
    working against the vacuumed lake."""
    import os
    import time

    from nass_summary_spark.sources.readers import (
        manifest_commit,
        manifest_incremental_read,
        manifest_vacuum,
    )

    data = tmp_path / "lake"
    mdir = str(tmp_path / "manifest")
    for k in (1, 2, 3):
        spark.createDataFrame([(k,)], "id long").write.parquet(
            str(data / f"f{k}")
        )
    glob_pat = str(data / "*" / "*.parquet")

    df1, files1 = manifest_incremental_read(spark, glob_pat, mdir)
    # commit f1 and f2 only; f3 stays unprocessed
    committed = [f for f in files1 if "/f3/" not in f]
    manifest_commit(mdir, committed)
    # plus an orphan entry for a file that no longer exists
    manifest_commit(mdir, [str(data / "gone" / "part-0.parquet")])

    now = time.time()
    # age every data file far past retention
    for f in files1:
        os.utime(f, (now - 10_000, now - 10_000))

    report = manifest_vacuum(glob_pat, mdir, retention_sec=3600, now=now)
    assert sorted(report["deleted"]) == sorted(committed)
    assert report["kept"] == []
    assert all("/f3/" in f for f in report["unprocessed"])
    # every deleted part file + the one orphan pruned
    assert report["pruned_entries"] == len(committed) + 1
    assert all(not os.path.exists(f) for f in committed)

    # the reader still offers exactly the unprocessed file
    df2, files2 = manifest_incremental_read(spark, glob_pat, mdir)
    assert [r["id"] for r in df2.collect()] == [3]

    # a second vacuum inside retention deletes nothing (f3 committed
    # but fresh)
    manifest_commit(mdir, files2)
    for f in files2:
        os.utime(f, (now - 100, now - 100))
    report2 = manifest_vacuum(glob_pat, mdir, retention_sec=3600, now=now)
    assert report2["deleted"] == [] and report2["kept"] == files2
    assert report2["pruned_entries"] == 0


def test_manifest_time_travel_read(spark, tmp_path):
    """D21b: three versioned commits; reads as-of each version
    return exactly that snapshot's rows, the latest is the default,
    unknown versions loud-fail, and a leftover .tmp commit is
    invisible (crash mid-commit leaves the log unchanged)."""
    import pytest

    from nass_summary_spark.sources.readers import (
        manifest_commit_versioned,
        manifest_read_as_of,
        manifest_versioned_new_files,
    )

    land = tmp_path / "land"
    land.mkdir()
    mdir = str(tmp_path / "manifest")
    glob_pat = str(land / "*.parquet")

    def drop(name, lo, hi):
        spark.range(lo, hi).coalesce(1).write.mode("overwrite").parquet(
            str(land / name)
        )

    versions = []
    for i, (lo, hi) in enumerate([(0, 10), (10, 25), (25, 30)]):
        drop(f"f{i}.parquet", lo, hi)
        new = manifest_versioned_new_files(glob_pat, mdir)
        assert len(new) == 1
        versions.append(manifest_commit_versioned(mdir, new))
    assert versions == [1, 2, 3]
    assert manifest_versioned_new_files(glob_pat, mdir) == []

    for v, n in [(1, 10), (2, 25), (3, 30)]:
        df, got_v, files = manifest_read_as_of(spark, mdir, v)
        assert got_v == v and len(files) == v
        assert df.count() == n
    df, got_v, _ = manifest_read_as_of(spark, mdir)  # latest
    assert got_v == 3 and df.count() == 30

    with pytest.raises(ValueError, match="not in"):
        manifest_read_as_of(spark, mdir, 99)

    # a torn commit (leftover .tmp) must be invisible everywhere
    (tmp_path / "manifest" / "commits" / "000004.txt.tmp").write_text(
        "ghost.parquet\n"
    )
    _, got_v, _ = manifest_read_as_of(spark, mdir)
    assert got_v == 3
    with pytest.raises(ValueError):
        manifest_commit_versioned(mdir, [])
