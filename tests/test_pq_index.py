"""Persisted PQ index (operators/pq_index).

Soundness: (1) a disk probe is ROW-IDENTICAL to the in-memory
ann_topk_pq(rerank=0) — both train on the same deterministic
xxhash64 sample with the same Lloyd init, so the codebooks agree
bit-for-bit and any difference is a bug in the persistence path,
not approximation; (2) the extend cycle encodes with the STORED
codebooks and makes new vectors findable, with the exclude_ids
crash-replay contract of the IVF twin; (3) a mixed-generation index
(codes columns disagreeing with the params sidecar) fails loudly
instead of scoring with misaligned LUTs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nass_summary_spark.operators.pq_index import (
    build_pq_index,
    extend_pq_index,
    load_pq_codebooks,
    pq_index_probe,
)

DIM = 64
_KW = dict(dim=DIM, m=8, ksub=16, n_iter=3)


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


def test_disk_probe_equals_in_memory_adc(spark, tmp_path, emb):
    from nass_summary_spark.operators.pq import ann_topk_pq

    q = emb.where(F.col("vec_id") < 8)
    idx = str(tmp_path / "pq")
    build_pq_index(emb, "vec_id", "embedding", idx, **_KW)
    got = _rows(
        pq_index_probe(spark, q, "vec_id", "embedding", idx, k=5)
    )
    want = _rows(
        ann_topk_pq(emb, q, "vec_id", "embedding", DIM, k=5, m=8,
                    ksub=16, n_iter=3)
    )
    assert got == want and len(got) == 8 * 5


def test_codebooks_round_trip(spark, tmp_path, emb):
    from nass_summary_spark.operators.pq import pq_train

    idx = str(tmp_path / "pq")
    build_pq_index(emb, "vec_id", "embedding", idx, **_KW)
    books, params = load_pq_codebooks(spark, idx)
    want = pq_train(emb, "vec_id", "embedding", DIM, m=8, ksub=16, n_iter=3)
    assert params == {"dim": DIM, "m": 8, "ksub": 16}
    assert books == want  # bit-for-bit: same sample, same Lloyd


def test_extend_makes_new_vectors_findable_and_replay_proof(
    spark, tmp_path, emb
):
    base = emb.where(F.col("vec_id") % 3 != 0)
    batch = emb.where(F.col("vec_id") % 3 == 0)
    idx = str(tmp_path / "pq")
    build_pq_index(base, "vec_id", "embedding", idx, **_KW)
    before = _rows(
        pq_index_probe(spark, batch, "vec_id", "embedding", idx, k=5)
    )
    extend_pq_index(batch, "vec_id", "embedding", idx)
    # replay contract: excluding the batch's own ids reproduces the
    # pre-append probe exactly (exclusion before ranking)
    after = _rows(
        pq_index_probe(
            spark, batch, "vec_id", "embedding", idx, k=5,
            exclude_ids=batch.select(F.col("vec_id").alias("id")),
        )
    )
    assert after == before
    # and without exclusion the appended vectors are candidates:
    # each batch doc's nearest stored code-twin is now its own cohort
    n_codes = spark.read.parquet(f"{idx}/codes").count()
    assert n_codes == emb.count()
    full = pq_index_probe(spark, batch, "vec_id", "embedding", idx, k=5)
    neigh = {r["neighbor_id"] for r in full.collect()}
    assert any(n % 3 == 0 for n in neigh)


def test_mixed_generation_fails_loudly(spark, tmp_path, emb):
    idx = str(tmp_path / "pq")
    build_pq_index(emb.limit(200), "vec_id", "embedding", idx, **_KW)
    # overwrite the params sidecar with a different geometry (m=4):
    # the codes table still has code0..code7 -> must raise, not score
    spark.createDataFrame(
        [(DIM, 4, 16)], "dim int, m int, ksub int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{idx}/params")
    with pytest.raises(Exception, match="geometry mismatch"):
        pq_index_probe(
            spark, emb.limit(4), "vec_id", "embedding", idx, k=3
        ).collect()


def test_codebook_audit_detects_drift_and_retrain_restores(
    spark, tmp_path, emb
):
    """The r7 VERDICT maintenance gap: extend encodes with the STORED
    codebooks forever, so residual codebook quality decays silently
    as the corpus distribution moves. Pinned end-to-end: (1) a fresh
    index audits at drift_ratio == 1 against its own fitness sidecar,
    (2) a shifted-distribution append inflates the audited
    quantization error, (3) retrain_pq_index re-trains + re-encodes
    with the validated swap and the audit returns to 1, and (4) the
    retrained index probes ROW-IDENTICAL to the in-memory twin
    trained on the union corpus — the same parity contract as the
    build path."""
    from nass_summary_spark.operators.pq import ann_topk_pq
    from nass_summary_spark.operators.pq_index import (
        pq_codebook_audit,
        retrain_pq_index,
    )

    idx = str(tmp_path / "pq")
    build_pq_index(emb, "vec_id", "embedding", idx, **_KW)
    healthy = pq_codebook_audit(emb, "vec_id", "embedding", idx)
    assert abs(healthy["drift_ratio"] - 1.0) < 1e-9, healthy

    drifted = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(10.0))
        .cast("array<float>")
        .alias("embedding"),
    )
    extend_pq_index(drifted, "vec_id", "embedding", idx)
    union = emb.unionByName(drifted)
    skewed = pq_codebook_audit(union, "vec_id", "embedding", idx)
    assert skewed["drift_ratio"] > 1.5, skewed

    out = retrain_pq_index(union, "vec_id", "embedding", idx, n_iter=3)
    assert out["rows"] == union.count()
    assert out["mse_after"] < out["mse_before"], out
    repaired = pq_codebook_audit(union, "vec_id", "embedding", idx)
    assert abs(repaired["drift_ratio"] - 1.0) < 1e-9, repaired

    q = emb.where(F.col("vec_id") < 6)
    got = _rows(pq_index_probe(spark, q, "vec_id", "embedding", idx, k=5))
    want = _rows(
        ann_topk_pq(union, q, "vec_id", "embedding", DIM, k=5, m=8,
                    ksub=16, n_iter=3)
    )
    assert got == want and len(got) == 6 * 5
