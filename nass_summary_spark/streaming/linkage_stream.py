"""Streaming record linkage (SURVEY.md §2 C25) — the stream twin of
operators/linkage.py, completing the Fellegi–Sunter pair the same way
dedup_stream.py twins dedup_index.py and ann_stream.py twins
ann_index.py.

A curated reference relation (the entity master) is persisted ONCE
with FROZEN Fellegi–Sunter parameters — supplied priors, or EM
estimates from :func:`~nass_summary_spark.operators.linkage.
fellegi_sunter_em` over a labeled-free seed (``em_params`` converts
the EM output). Each micro-batch of arriving records is then
blocked-joined against the stored reference and scored with those
frozen weights: freezing is what makes scores COMPARABLE across
batches (a per-batch u estimate would drift with batch composition)
and makes every batch's output a pure projection over one blocked
equi-join — no aggregation, no state, nothing held between batches.

Exactly-once: the scorer mutates nothing (the reference is static),
so idempotent per-batch overwrite of the match sink is the whole
story — a replayed batch rewrites identical rows. The params sidecar
fails loudly when m- and u-mappings disagree on the field set
(the mixed-generation guard of the index family, applied to model
parameters).

Parity evidence (tests/test_streaming.py): scoring is per-pair with
frozen weights, so the union of per-batch match outputs equals the
batch scorer over the union of arrivals, for ANY batch split.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from nass_summary_spark.functions.smalldf import local_struct_df
from nass_summary_spark.operators.linkage import fellegi_sunter_scores


def build_linkage_reference(
    reference: DataFrame,
    ref_id: str,
    block_col: str,
    m_probs: Mapping[str, float],
    u_probs: Mapping[str, float],
    path: str,
) -> None:
    """Persist the entity master plus its frozen Fellegi–Sunter
    parameters under ``path``: ``reference/`` (id, block and
    comparison columns only — pruned at write so probes never scan
    unrelated master columns), ``params/`` (field, m, u) and
    ``meta/`` (ref_id, block_col). Fails loudly when the m- and
    u-mappings disagree on fields."""
    if set(m_probs) != set(u_probs):
        raise ValueError(
            "linkage reference parameter mismatch: m fields "
            f"{sorted(m_probs)} != u fields {sorted(u_probs)}"
        )
    fields = list(m_probs)
    spark = reference.sparkSession
    (
        reference.select(ref_id, block_col, *fields)
        .write.mode("overwrite")
        .parquet(f"{path}/reference")
    )
    local_struct_df(
        spark,
        "field string, m double, u double",
        [(f, float(m_probs[f]), float(u_probs[f])) for f in fields],
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")
    local_struct_df(
        spark, "ref_id string, block_col string", [(ref_id, block_col)]
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_linkage_reference(
    spark: SparkSession, path: str
) -> tuple[DataFrame, str, str, dict, dict]:
    """Read back ``(reference, ref_id, block_col, m_probs,
    u_probs)`` — params and meta are model-sized collects."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    rows = spark.read.parquet(f"{path}/params").collect()
    m_probs = {r["field"]: r["m"] for r in rows}
    u_probs = {r["field"]: r["u"] for r in rows}
    reference = spark.read.parquet(f"{path}/reference")
    missing = (set(m_probs) | {meta["ref_id"], meta["block_col"]}) - set(
        reference.columns
    )
    if missing:
        raise ValueError(
            f"linkage reference at {path} lacks columns {sorted(missing)}"
            " that its own params/meta declare — the reference mixes"
            " generations; rebuild it"
        )
    return reference, meta["ref_id"], meta["block_col"], m_probs, u_probs


def linkage_stream(
    sdf: DataFrame,
    reference_path: str,
    matches_path: str,
    checkpoint_path: str,
    arrival_id: str,
    threshold: float = 0.0,
    salt: int = 1,
) -> StreamingQuery:
    """Score each micro-batch of arriving records against the stored
    reference with its frozen weights. Matches for batch N land under
    ``{matches_path}/batch_id=N`` (idempotent overwrite).
    ``build_linkage_reference`` must have run first."""

    def score_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ref, ref_id, block_col, m_probs, u_probs = load_linkage_reference(
            spark, reference_path
        )
        fellegi_sunter_scores(
            batch_df, ref, arrival_id, ref_id, block_col, m_probs,
            threshold=threshold, salt=salt, u_probs=u_probs,
        ).write.mode("overwrite").parquet(
            f"{matches_path}/batch_id={batch_id}"
        )

    return (
        sdf.writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_stream_matches(spark: SparkSession, matches_path: str) -> DataFrame:
    """All per-batch match readouts emitted so far."""
    return spark.read.parquet(f"{matches_path}/batch_id=*")
