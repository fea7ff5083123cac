"""Dictionary encoding — the warehouse-side categorical compaction
step: replace a repeated string column with a dense integer id plus
a dimension table.  At 100 TB a 30-byte category string repeated per
row dwarfs the data it annotates; the encoded fact joins, shuffles,
and stores as a 4-byte int, and the dimension rides along as a
broadcast table (the same split the reference's `usda_region`
crosswalk makes by hand — nass.sql:7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_dictionary(df: DataFrame, col: str, id_name: str = "code_id") -> DataFrame:
    """(id, value) dimension with DENSE ids 1..k assigned in value
    order — deterministic on any engine (a hash-based id would be
    portable too, but dense ids pack into the smallest int type and
    index arrays downstream).  The ranking window runs over the
    DISTINCT-value relation only: dictionary cardinality is bounded
    by design (that is what makes the column a category), so the
    single-partition sort is model-sized, never data-sized."""
    w = Window.orderBy(F.col(col).asc())
    return (
        df.select(F.col(col)).where(F.col(col).isNotNull()).distinct()
        .select(F.row_number().over(w).cast("int").alias(id_name), F.col(col))
    )


def dictionary_encode(
    df: DataFrame, col: str, id_name: str = "code_id"
) -> tuple[DataFrame, DataFrame]:
    """Returns (encoded_fact, dimension): the fact with ``col``
    replaced by its dense id via a broadcast hash join (NULLs encode
    as NULL id and survive)."""
    dim = build_dictionary(df, col, id_name)
    encoded = df.join(F.broadcast(dim), col, "left").drop(col)
    return encoded, dim


def pseudonymize_key(col, salt: str):
    """Deterministic keyed pseudonymization of an identifier column:
    a salted-md5-derived 60-bit positive BIGINT replaces the real
    key. The privacy device a training-data pipeline applies before
    identifiers leave the trust boundary — REFERENTIAL INTEGRITY
    SURVIVES (the same key pseudonymizes identically everywhere, so
    fact-dim joins still align), but the mapping is one-way without
    the salt. Per-row projection (no shuffle, no lookup table to
    leak); 60 bits keep collisions negligible at any realistic key
    cardinality (~N²/2⁶¹ expected pairs) and the value positive in
    BIGINT engines (the PLANS.md r9 15-hex device). Exactly
    replayable cross-engine:
    ``('0x' || substr(md5(salt || '|' || CAST(k AS VARCHAR)), 1,
    15))::BIGINT`` in DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat_ws("|", F.lit(salt), c.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")


def dp_noisy_counts(
    df: DataFrame,
    keys: list[str],
    epsilon: float = 1.0,
    salt: str = "dp",
    fp_scale: int = 1_000_000,
    round_to: int = 6,
) -> DataFrame:
    """Per-group counts released through the Laplace mechanism with
    SEEDED, replayable noise: the epsilon-DP release shape for
    publishing group statistics over sensitive membership (count
    sensitivity 1 → scale 1/epsilon), drawn deterministically so a
    pipeline re-run — or a cross-engine audit — reproduces the exact
    release (the reproducible-noise posture production DP systems get
    from a recorded seed; the salt IS the seed and must stay as
    secret as one).

    Noise = inverse-CDF Laplace over a 52-bit md5-derived uniform in
    (0,1): ``-1/eps * sign(u - 0.5) * ln(1 - 2|u - 0.5|)``, quantized
    to fixed point (the r8 transcendental device) so both engines
    release identical values. One combinable aggregation; noise is a
    per-group projection. The demo surfaces ``n_true`` next to the
    noised count to certify the mechanism — a production release
    drops it.
    """
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true")
    )
    seed = F.md5(
        F.concat_ws("|", F.lit(salt), *[F.col(k).cast("string") for k in keys])
    )
    # 13 hex chars = 52 bits; +1 keeps u in (0, 1) exclusive
    h = F.conv(F.substring(seed, 1, 13), 16, 10).cast("bigint")
    u = (h + F.lit(1)).cast("double") / F.lit(float((1 << 52) + 2))
    d = u - F.lit(0.5)
    noise = (
        F.lit(-1.0 / float(epsilon))
        * F.signum(d)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(d))
    )
    noise_fp = F.floor(noise * F.lit(float(fp_scale)) + F.lit(0.5)).cast(
        "bigint"
    )
    noise_val = noise_fp.cast("double") / F.lit(float(fp_scale))
    return agg.select(
        *keys,
        "n_true",
        F.round(noise_val, round_to).alias("noise"),
        F.round(F.col("n_true").cast("double") + noise_val, round_to).alias(
            "n_noised"
        ),
    ).orderBy(*keys)
