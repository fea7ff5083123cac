"""Bloom-filter semi-join pre-filtering — the shuffle-reduction
pattern engines apply as "runtime row-level filtering", built here
from public primitives (salted ``xxhash64`` positions + ``bit_or``
word aggregation + ``getbit`` probes); correctness is oracle-checked
against the plain semi join the filter accelerates.

Why it matters at 100 TB: a semi join of a fact table against a key
set too large to broadcast EXACTLY shuffles the whole fact table.
The key set's BLOOM FILTER is model-sized by construction
(``n_bits / 8`` bytes regardless of key count), so it ships to every
task as a literal and eliminates the non-matching fact rows
MAP-SIDE; only probable matches enter the exchange.  False positives
are then removed by the exact join — the result is identical to the
plain semi join (the oracle), only the shuffle shrinks.

The filter build is one explode + one ``bit_or`` aggregation over
(word index) — k·|keys| fixed-width rows, partial-aggregated; the
driver collects ``n_bits/64`` longs (the sketch, not the keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nass_summary_spark.functions.lits import bigint_array


def _positions(key: Column, n_bits: int, k: int) -> list[Column]:
    """k salted ``xxhash64`` bit positions.  Unlike the oracle-facing
    operators, the filter's internals need NO cross-engine
    portability — the oracle replays the plain semi join, not the
    sketch — so the hash can be the native JVM xxhash64 (no string
    cast, no hex parsing): ~4× cheaper per probe than the md5 chain
    on a fact-table scan, which is exactly where this filter lives."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits)) for i in range(k)
    ]


def build_bloom(
    keys_df: DataFrame, key_col: str, n_bits: int = 1 << 16, k: int = 4
) -> list[int]:
    """Aggregate the key set into a Bloom bitset: returns
    ``n_bits / 64`` longs.  Distributed: keys explode to (word, bit)
    pairs, ``bit_or`` folds them per word (partial-aggregated), and
    only the word relation reaches the driver."""
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, n_bits, k))).alias("p")
    words = (
        keys_df.select(pos)
        .select((F.col("p") / 64).cast("int").alias("w"),
                (F.col("p") % 64).cast("int").alias("b"))
        .groupBy("w")
        # F.shiftleft takes only a literal bit count; the SQL form
        # accepts the column
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), b)")).alias("m"))
        .collect()
    )
    out = [0] * (n_bits // 64)
    for r in words:
        out[r["w"]] = r["m"]
    return out


def might_contain(key: Column, bloom: list[int], n_bits: int, k: int = 4) -> Column:
    """Pure-Catalyst membership probe against the literal bitset:
    true iff ALL k bits are set (may false-positive, never
    false-negative)."""
    arr = bigint_array(bloom)
    cond = None
    for p in _positions(key, n_bits, k):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        bit = (p % 64).cast("int")
        test = F.getbit(word, bit) == 1  # getbit accepts a column pos
        cond = test if cond is None else cond & test
    return cond


def bloom_semi_join(
    fact: DataFrame,
    keys_df: DataFrame,
    fact_key: str,
    set_key: str,
    n_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """EXACT semi join of ``fact`` against the key set, with a Bloom
    pre-filter so non-matching fact rows die map-side before the
    join's exchange.  Identical output to a plain LEFT SEMI join
    (oracle-checked); the pre-filter only changes WHERE rows are
    eliminated."""
    bloom = build_bloom(keys_df, set_key, n_bits=n_bits, k=k)
    pre = fact.where(might_contain(F.col(fact_key), bloom, n_bits, k=k))
    rhs = keys_df.select(F.col(set_key).alias(fact_key)).distinct()
    return pre.join(rhs, fact_key, "left_semi")
