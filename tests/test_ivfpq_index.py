"""Persisted IVFPQ index (operators/ivfpq_index).

Soundness: (1) a disk probe is ROW-IDENTICAL to the in-memory
ann_topk_ivfpq(rerank=0) at the same nprobe — both train via
_ivfpq_train on the same deterministic xxhash64 sample, so coarse
centroids and residual codebooks agree bit-for-bit and any
difference is a bug in the persistence path, not approximation;
(2) the probe plan carries dynamic partition pruning on the codes
table's cell partition column — the inverted file as storage layout,
same assertion as the IVF twin; (3) the extend cycle encodes with
the STORED model and honors the exclude_ids crash-replay contract;
(4) a mixed-generation index fails loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nass_summary_spark.operators.ivfpq_index import (
    build_ivfpq_index,
    extend_ivfpq_index,
    ivfpq_index_probe,
    load_ivfpq_model,
)

DIM = 64
_KW = dict(dim=DIM, k_cells=4, m=8, ksub=16, n_iter=3)


@pytest.fixture
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _rows(df):
    return sorted(
        (r["query_id"], r["rnk"], r["neighbor_id"], r["approx_dist2"])
        for r in df.collect()
    )


def test_disk_probe_equals_in_memory_ivfpq(spark, tmp_path, emb):
    from nass_summary_spark.operators.pq import ann_topk_ivfpq

    q = emb.where(F.col("vec_id") < 8)
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, "vec_id", "embedding", idx, **_KW)
    for nprobe in (2, 4):  # partial probe AND full probe
        got = _rows(
            ivfpq_index_probe(
                spark, q, "vec_id", "embedding", idx, k=5, nprobe=nprobe
            )
        )
        want = _rows(
            ann_topk_ivfpq(
                emb, q, "vec_id", "embedding", DIM, k=5, n_cells=4,
                nprobe=nprobe, m=8, ksub=16, n_iter=3,
            )
        )
        assert got == want and len(got) == 8 * 5


def test_model_round_trip_and_dpp_plan(spark, tmp_path, emb):
    from nass_summary_spark.operators.pq import _ivfpq_train

    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, "vec_id", "embedding", idx, **_KW)
    coarse_l, books_l, params = load_ivfpq_model(spark, idx)
    want_c, want_b = _ivfpq_train(
        emb, "vec_id", "embedding", DIM, n_cells=4, m=8, ksub=16,
        n_iter=3, sample_size=65536,
    )
    assert params == {"dim": DIM, "m": 8, "ksub": 16, "k_cells": 4}
    assert coarse_l == want_c and books_l == want_b  # bit-for-bit

    # the probe must prune the cell-partitioned codes scan: the
    # collected probe list's cell set becomes a STATIC partition
    # filter in the scan (planning-time pruning — stronger than DPP,
    # which skips a filterless LocalRelation build side)
    spark.catalog.clearCache()
    probe = ivfpq_index_probe(
        spark, emb.where(F.col("vec_id") < 4), "vec_id", "embedding",
        idx, k=3, nprobe=2,
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "cell" in pf.group(1) and " IN " in pf.group(1), (
        plan[:2000]
    )


def test_extend_makes_new_vectors_findable_and_replay_proof(
    spark, tmp_path, emb
):
    base = emb.where(F.col("vec_id") % 3 != 0)
    batch = emb.where(F.col("vec_id") % 3 == 0)
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(base, "vec_id", "embedding", idx, **_KW)
    before = _rows(
        ivfpq_index_probe(spark, batch, "vec_id", "embedding", idx, k=5)
    )
    extend_ivfpq_index(batch, "vec_id", "embedding", idx)
    after = _rows(
        ivfpq_index_probe(
            spark, batch, "vec_id", "embedding", idx, k=5,
            exclude_ids=batch.select(F.col("vec_id").alias("id")),
        )
    )
    assert after == before
    n_codes = spark.read.parquet(f"{idx}/codes").count()
    assert n_codes == emb.count()
    full = ivfpq_index_probe(spark, batch, "vec_id", "embedding", idx, k=5)
    neigh = {r["neighbor_id"] for r in full.collect()}
    assert any(n % 3 == 0 for n in neigh)


def test_mixed_generation_fails_loudly(spark, tmp_path, emb):
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb.limit(200), "vec_id", "embedding", idx, **_KW)
    spark.createDataFrame(
        [(DIM, 4, 16, 4)], "dim int, m int, ksub int, k_cells int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{idx}/params")
    with pytest.raises(Exception, match="geometry mismatch"):
        ivfpq_index_probe(
            spark, emb.limit(4), "vec_id", "embedding", idx, k=3
        ).collect()


def test_codebook_audit_detects_drift_and_retrain_restores(
    spark, tmp_path, emb
):
    """Drift maintenance for the persisted IVFADC index (the r7
    VERDICT gap): (1) fresh index audits at drift_ratio == 1, (2) a
    shifted-distribution append inflates the audited residual
    quantization error, (3) retrain_ivfpq_index re-trains the full
    model (coarse + residual codebooks) with the validated swap and
    the audit returns to 1, (4) the retrained index still probes
    ROW-IDENTICAL to the in-memory twin on the union corpus at a
    partial nprobe, and (5) the probed plan still prunes partitions
    (static PartitionFilter on the collect path)."""
    from nass_summary_spark.operators.ivfpq_index import (
        ivfpq_codebook_audit,
        retrain_ivfpq_index,
    )
    from nass_summary_spark.operators.pq import ann_topk_ivfpq

    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, "vec_id", "embedding", idx, **_KW)
    healthy = ivfpq_codebook_audit(emb, "vec_id", "embedding", idx)
    assert abs(healthy["drift_ratio"] - 1.0) < 1e-9, healthy

    drifted = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(10.0))
        .cast("array<float>")
        .alias("embedding"),
    )
    extend_ivfpq_index(drifted, "vec_id", "embedding", idx)
    union = emb.unionByName(drifted)
    skewed = ivfpq_codebook_audit(union, "vec_id", "embedding", idx)
    assert skewed["drift_ratio"] > 1.5, skewed

    out = retrain_ivfpq_index(union, "vec_id", "embedding", idx, n_iter=3)
    assert out["rows"] == union.count()
    assert out["mse_after"] < out["mse_before"], out
    repaired = ivfpq_codebook_audit(union, "vec_id", "embedding", idx)
    assert abs(repaired["drift_ratio"] - 1.0) < 1e-9, repaired

    q = emb.where(F.col("vec_id") < 6)
    probe = ivfpq_index_probe(
        spark, q, "vec_id", "embedding", idx, k=5, nprobe=2
    )
    got = _rows(probe)
    want = _rows(
        ann_topk_ivfpq(
            union, q, "vec_id", "embedding", DIM, k=5, n_cells=4,
            nprobe=2, m=8, ksub=16, n_iter=3,
        )
    )
    assert got == want and len(got) == 6 * 5
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan, plan[:2000]
