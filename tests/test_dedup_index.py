"""Persisted MinHash index + incremental dedup (operators/dedup_index).

The load-bearing identity: because every hash in the pipeline is
deterministic (minhash_perms + md5), probing a NEW batch against an
index built from the HISTORICAL corpus must return EXACTLY the pairs
that re-running minhash_lsh_pairs from scratch on the union would
return, restricted to pairs touching the batch. These tests pin that
identity on real sf0.001 documents, plus the index-extension cycle
(day 2 probes day 1's documents through the index, never their text).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nass_summary_spark.operators.dedup import minhash_lsh_pairs
from nass_summary_spark.operators.dedup_index import (
    build_minhash_index,
    extend_minhash_index,
    incremental_minhash_pairs,
)

_KW = dict(n=3, num_perm=32, bands=8)
_TH = 0.35


@pytest.fixture
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def _pairs_set(df):
    return {
        (r["id_a"], r["id_b"], r["est_jaccard"]) for r in df.collect()
    }


def test_incremental_equals_from_scratch_on_union(spark, tmp_path, docs):
    hist = docs.where(F.col("doc_id") % 4 != 0)
    batch = docs.where(F.col("doc_id") % 4 == 0)
    idx = str(tmp_path / "idx")
    build_minhash_index(hist, "doc_id", "text", idx, **_KW)

    inc = _pairs_set(
        incremental_minhash_pairs(
            spark, batch, "doc_id", "text", idx, threshold=_TH, **_KW
        )
    )
    scratch = _pairs_set(
        minhash_lsh_pairs(docs, "doc_id", "text", threshold=_TH, **_KW)
    )
    hist_only = _pairs_set(
        minhash_lsh_pairs(hist, "doc_id", "text", threshold=_TH, **_KW)
    )
    # the union decomposes exactly: old-only pairs + batch-touching
    assert inc and scratch == hist_only | inc
    # and the incremental result is precisely the batch-touching slice
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    assert inc == {
        p for p in scratch if p[0] in batch_ids or p[1] in batch_ids
    }


def test_extend_then_probe_second_batch(spark, tmp_path, docs):
    """Day-2 cycle: extend the index with day-1's batch, then probe a
    second batch — results must equal from-scratch pairs on the full
    union restricted to pairs touching batch 2."""
    day0 = docs.where(F.col("doc_id") % 4 == 1)
    day1 = docs.where(F.col("doc_id") % 4 == 2)
    day2 = docs.where(F.col("doc_id") % 4 == 3)
    idx = str(tmp_path / "idx")
    build_minhash_index(day0, "doc_id", "text", idx, **_KW)
    extend_minhash_index(day1, "doc_id", "text", idx, **_KW)

    inc2 = _pairs_set(
        incremental_minhash_pairs(
            spark, day2, "doc_id", "text", idx, threshold=_TH, **_KW
        )
    )
    union = day0.unionByName(day1).unionByName(day2)
    scratch = _pairs_set(
        minhash_lsh_pairs(union, "doc_id", "text", threshold=_TH, **_KW)
    )
    d2_ids = {r["doc_id"] for r in day2.select("doc_id").collect()}
    assert inc2 == {
        p for p in scratch if p[0] in d2_ids or p[1] in d2_ids
    }


def test_empty_batch_probe(spark, tmp_path, docs):
    idx = str(tmp_path / "idx")
    build_minhash_index(
        docs.limit(50), "doc_id", "text", idx, **_KW
    )
    empty = docs.where(F.lit(False))
    got = incremental_minhash_pairs(
        spark, empty, "doc_id", "text", idx, threshold=_TH, **_KW
    )
    assert got.count() == 0


def test_index_layout_prunes_band_partitions(spark, tmp_path, docs):
    """The band table is partitioned by band: a single-band read must
    plan a partition-pruned scan (PartitionFilters), the physical
    property the daily probe's cost model rests on."""
    idx = str(tmp_path / "idx")
    build_minhash_index(docs.limit(100), "doc_id", "text", idx, **_KW)
    scan = spark.read.parquet(f"{idx}/bands").where(F.col("band") == 3)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    # a DATA filter on band would mean the partitioning was lost: the
    # filter must appear in PartitionFilters, metadata-only
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("band" in ln for ln in pf), plan[:1500]
    # and the data actually lives under band=<k> directories
    import os

    assert any(
        d.startswith("band=") for d in os.listdir(f"{idx}/bands")
    )


def test_verify_join_reads_candidate_sigs_only(spark, tmp_path, docs):
    """VERDICT r6 item 3: the candidate-verification join must NOT
    consume the full historical signature relation — the stored-sig
    scan is semi-filtered by the (batch-bounded, broadcast) candidate
    id set, so daily verification volume is candidate-sized, not
    corpus-sized. Pinned two ways: the pair plan contains a broadcast
    LeftSemi over the sigs scan, and the pruned probe's output is
    identical to the from-scratch decomposition (the existing parity
    test re-certifies values; this one pins the plan shape)."""
    spark.catalog.clearCache()
    hist = docs.where(F.col("doc_id") % 4 != 0)
    batch = docs.where(F.col("doc_id") % 4 == 0)
    idx = str(tmp_path / "idx")
    build_minhash_index(hist, "doc_id", "text", idx, **_KW)
    pairs = incremental_minhash_pairs(
        spark, batch, "doc_id", "text", idx, threshold=_TH, **_KW
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_probe_is_replay_proof_after_self_append(spark, tmp_path, docs):
    """A foreachBatch crash-replay probes a batch whose signatures
    already reached the index: the anti-join on the batch's own ids
    must make that probe IDENTICAL to the pre-append probe (no
    self-pairs, no duplicated rows)."""
    hist = docs.where(F.col("doc_id") % 4 != 0)
    batch = docs.where(F.col("doc_id") % 4 == 0)
    idx = str(tmp_path / "idx")
    build_minhash_index(hist, "doc_id", "text", idx, **_KW)
    before_rows = incremental_minhash_pairs(
        spark, batch, "doc_id", "text", idx, threshold=_TH, **_KW
    ).collect()
    extend_minhash_index(batch, "doc_id", "text", idx, **_KW)
    after_rows = incremental_minhash_pairs(
        spark, batch, "doc_id", "text", idx, threshold=_TH, **_KW
    ).collect()
    # row-level equality (not set) also proves no duplicate rows
    key = lambda r: (r["id_a"], r["id_b"], r["est_jaccard"])
    assert sorted(map(key, after_rows)) == sorted(map(key, before_rows))


def test_params_mismatch_fails_loudly(spark, tmp_path, docs):
    """Probing or extending with hash parameters that differ from the
    build must raise, not silently halve est_jaccard (the index
    records its parameters in a sidecar)."""
    idx = str(tmp_path / "idx")
    build_minhash_index(docs.limit(40), "doc_id", "text", idx, **_KW)
    with pytest.raises(ValueError, match="built with"):
        incremental_minhash_pairs(
            spark, docs.limit(5), "doc_id", "text", idx,
            n=3, num_perm=64, bands=8, threshold=_TH,
        )
    with pytest.raises(ValueError, match="built with"):
        extend_minhash_index(
            docs.limit(5), "doc_id", "text", idx, n=4, num_perm=32, bands=8
        )


def test_band_table_compaction_preserves_probe(spark, tmp_path, docs):
    """The extend cycle accretes small band files; the generic
    compaction pass (sources/writers.py compact_table) must work on
    the index's partitioned band table — file count drops, probe
    results stay byte-identical. This is the maintenance step the
    extend docstring promises."""
    import glob

    from nass_summary_spark.sources.writers import compact_table

    hist = docs.where(F.col("doc_id") % 4 == 1)
    idx = str(tmp_path / "idx")
    build_minhash_index(hist, "doc_id", "text", idx, **_KW)
    # accrete: three small extends
    for k in (2, 3, 0):
        extend_minhash_index(
            docs.where(F.col("doc_id") % 8 == k), "doc_id", "text", idx, **_KW
        )
    batch = docs.where(F.col("doc_id") % 8 == 4)
    before = _pairs_set(
        incremental_minhash_pairs(
            spark, batch, "doc_id", "text", idx, threshold=_TH, **_KW
        )
    )
    n_files_before = len(glob.glob(f"{idx}/bands/band=*/*.parquet"))
    report = compact_table(spark, f"{idx}/bands", partition_by=["band"])
    n_files_after = len(glob.glob(f"{idx}/bands/band=*/*.parquet"))
    assert n_files_after < n_files_before
    after = _pairs_set(
        incremental_minhash_pairs(
            spark, batch, "doc_id", "text", idx, threshold=_TH, **_KW
        )
    )
    assert before and after == before
    assert report["rows"] > 0
    # VERDICT r8 item 5: compaction must not demote the physical
    # layout — the band-partition pruning the probe's cost model
    # rests on has to survive the rewrite (PartitionFilters, not a
    # data filter), i.e. the B100 plan assertion re-run post-compact
    scan = spark.read.parquet(f"{idx}/bands").where(F.col("band") == 3)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("band" in ln for ln in pf), plan[:1500]
