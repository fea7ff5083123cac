"""Mergeable count-min sketch (the third mergeable-sketch family,
next to the HLL distinct table and the log-histogram quantile
sketch): fixed-size frequency estimates with a one-sided error
bound, built for the same accreting-ingest lifecycle — per-batch
shards persisted as plain parquet counter rows that MERGE BY
ADDITION into the global sketch without rescanning raw data.

Why a sketch when groupBy(item).count() is exact: at 100 TB the
exact per-item relation is itself huge (billions of distinct URLs /
users / n-grams) and must be re-shuffled on every merge window; the
CMS is ``depth x width`` counters per group — bytes, not terabytes —
and answers "how often did THIS item occur across all epochs" with
``est >= true`` and ``est <= true + (e/width) * N`` guarantees
(Cormode & Muthukrishnan 2005). The classic use in a curation
pipeline: cheap frequency gates (drop items seen > k times) over
streams too wide to count exactly.

Cross-engine exactness: bucket indices derive from md5 of
``item ':' row`` (15 hex chars → 60-bit positive BIGINT, the
fixture-hashing device from PLANS.md r9 notes) — deterministic and
replayable in any engine, so counters (exact integer sums) and the
min-over-rows probe match DuckDB bit-for-bit: the SKETCH is
approximate, the ORACLE of the sketch is FULL.

Scale shape: facts reduce to the per-item histogram in ONE
map-side-combinable shuffle; the depth-fold explode happens on that
histogram (never on facts), and everything downstream — merge,
probe — is counter-relation-sized. Probes broadcast the sketch
(``depth x width`` rows) so lookups never shuffle the probe side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default geometry: 4 rows x 1024 buckets = 4096 counters per group
DEPTH = 4
WIDTH = 1024


def _bucket(item: Column, row: Column, width: int) -> Column:
    """md5-derived bucket index, replayable cross-engine: 60-bit
    positive BIGINT from the first 15 hex chars, mod width."""
    h = F.md5(F.concat_ws(":", item.cast("string"), row.cast("string")))
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
        % F.lit(width)
    ).cast("bigint")


def build_countmin(
    df: DataFrame,
    keys: list[str],
    item_col: str,
    depth: int = DEPTH,
    width: int = WIDTH,
    shard: Column | None = None,
) -> DataFrame:
    """Per-(keys[, shard]) count-min sketch of an item column:
    ``(*keys[, __shard], row, bucket, cnt)`` counter rows.

    Facts collapse to the (keys, item) histogram first — the only
    full-data shuffle, map-side combinable — then each distinct item
    fans out to its ``depth`` counter cells.
    """
    gb = list(keys) + (["__shard"] if shard is not None else [])
    hist = (
        df.where(F.col(item_col).isNotNull())
        .select(
            *keys,
            *([shard.alias("__shard")] if shard is not None else []),
            F.col(item_col).alias("__item"),
        )
        .groupBy(*gb, "__item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )
    rows = F.explode(
        F.array(*[F.lit(r) for r in range(depth)])
    ).alias("row")
    return (
        hist.select(*gb, "__item", "__n", rows)
        .withColumn("bucket", _bucket(F.col("__item"), F.col("row"), width))
        .groupBy(*gb, "row", "bucket")
        .agg(F.sum("__n").alias("cnt"))
    )


def merge_countmin(shards: DataFrame, by: list[str]) -> DataFrame:
    """Merge persisted shard sketches up to ``by`` — ADDITION, the
    mergeability law (touches only counter rows, never raw data)."""
    return shards.groupBy(*by, "row", "bucket").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def probe_countmin(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = DEPTH,
    width: int = WIDTH,
    out_col: str = "est_cnt",
) -> DataFrame:
    """Point-frequency estimates for a probe relation: min over the
    sketch rows of the counter at each probe's bucket (absent cell =
    0 → estimate 0). The sketch is broadcast — probes never shuffle.
    ``depth``/``width`` must match the build geometry (they are part
    of the sketch's identity, like an HLL's lgK).

    NULL probe items get a NULL estimate: the build side excludes
    NULL items, so hashing a NULL probe (concat_ws would skip it and
    hash the row index alone) would return an arbitrary counter
    instead of the build-side contract's "not counted".
    """
    d = depth
    fan = probes.select(
        "*",
        F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("row"),
    ).withColumn(
        "bucket", _bucket(F.col(item_col), F.col("row"), width)
    )
    joined = fan.join(F.broadcast(sketch), ["row", "bucket"], "left")
    probe_cols = [c for c in probes.columns]
    est = (
        joined.fillna({"cnt": 0})
        .groupBy(*probe_cols)
        .agg(F.min("cnt").cast("bigint").alias(out_col))
    )
    return est.select(
        *probe_cols,
        F.when(F.col(item_col).isNotNull(), F.col(out_col))
        .cast("bigint")
        .alias(out_col),
    )


def cms_inner_product(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    depth: int = DEPTH,
) -> DataFrame:
    """Equi-join SIZE ESTIMATE from two count-min sketches — the
    classic CMS inner product (Cormode & Muthukrishnan 2005,
    §4.3): for each depth row, Σ_bucket a[r][b]·b[r][b]
    overestimates ``Σ_key f_a(key)·f_b(key)`` (= the exact inner
    join row count) by only the hash-collision cross terms; the MIN
    over rows is the estimate. This is the 100 TB join PLANNER'S
    question — "how big is orders ⋈ lineitem on this key" — answered
    from two KB-sized persisted counter relations without touching
    either fact table (the B134 build-once lifecycle; sketches must
    share depth/width, like HLL lgK).

    One counter-relation equi-join on (row, bucket) + one bounded
    aggregation; everything BIGINT-exact, so the demo carries a FULL
    oracle. Guaranteed ``estimate ≥ exact`` (one-sided error) — the
    property the certification test pins.

    Output: one row ``(est_join_size,)``.
    """
    a = sketch_a.select("row", "bucket", F.col("cnt").alias("__ca"))
    b = sketch_b.select("row", "bucket", F.col("cnt").alias("__cb"))
    per_row = (
        a.join(b, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__ip"))
    )
    return per_row.agg(
        F.min("__ip").cast("bigint").alias("est_join_size")
    )
