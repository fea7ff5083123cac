"""Frequency-sketch operators: exact heavy hitters via a one-pass
Misra–Gries candidate sweep plus a candidates-only verify pass.

The 100 TB problem this solves: "which items appear in at least a
fraction *s* of the corpus" normally costs a full-width shuffle of
every item occurrence (the exact group-by).  At web scale the item
column is multi-TB and almost all of it belongs to the long tail that
can never reach the threshold.  The classic two-pass answer
(Misra–Gries 1982; the "frequent"/"space-saving" family surveyed in
Cormode & Hadjieleftheriou, VLDB 2008):

1. **Candidate pass** — each partition runs a Misra–Gries summary
   with ``k`` counters over its local stream (Arrow-batched
   ``mapInPandas``; memory is O(k) per partition, independent of
   partition size).  MG guarantees any item whose *partition* count
   exceeds W_p/k survives that partition's summary; by the averaging
   argument, any item with *global* frequency > N/k therefore
   survives in at least one partition.  The union of the per-partition
   survivors — at most ``partitions × k`` items, a few KB — is the
   candidate set, and it is a *superset* of every true heavy hitter
   whenever the support threshold s ≥ 1/k.
2. **Verify pass** — the tiny candidate set is broadcast back and
   only candidate occurrences are counted exactly.  The shuffle now
   carries ≤ partitions × k partial rows instead of the full item
   column.

Because the candidate set provably contains every qualifying item,
the composition is EXACT (same output as the naive full group-by) —
which is why the demo query carries a plain-SQL DuckDB oracle, not a
rows-only check.  Threshold arithmetic is integer-only
(``cnt · den ≥ N · num`` for support num/den), so no FP boundary can
flip membership cross-engine.

Reference anchor: the reference's catalog/count surfaces
(``nass.sql:453`` commodity_list, the distinct-count ingest checks in
``quickstats.sql:91``) are exact small-scale counts; this operator is
their corpus-scale complement for curation vocabularies and
frequent-token audits.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_SWEEP_SCHEMA = StructType(
    [
        StructField("item", StringType(), True),
        StructField("w", LongType(), False),
    ]
)


def _mg_sweep(items: DataFrame, k: int) -> DataFrame:
    """Per-partition Misra–Gries sweep over the ``item`` column.

    Weighted MG update per Arrow batch: batch-local exact counts
    (bounded by the batch's distinct items) are folded into the k
    bounded counters; when the table overflows, the global "subtract
    the minimum from everyone" step evicts the tail.  Undercount per
    item is bounded by W_p/k, so every item with partition weight
    > W_p/k is still present at the end of the partition's stream.

    Output: one row per surviving item (``w`` = residual counter) and
    one NULL-item row per partition carrying the partition's total
    item count — so the corpus total rides the same single scan
    instead of costing a third pass over the items.
    """

    def sweep(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        counters: dict[str, int] = {}
        seen = 0
        for b in batches:
            seen += len(b)
            # exact within-batch pre-aggregation (vectorized); the
            # python loop below is over *distinct* items of one batch
            for item, w in b["item"].value_counts().items():
                if item in counters:
                    counters[item] += int(w)
                else:
                    counters[item] = int(w)
                    if len(counters) > k:
                        m = min(counters.values())
                        counters = {
                            i: c - m for i, c in counters.items() if c > m
                        }
        yield pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "w": list(counters.values()) + [seen],
            }
        )

    return items.mapInPandas(sweep, _SWEEP_SCHEMA)


def heavy_hitters(
    df: DataFrame,
    item_col: Column | str,
    support_num: int = 1,
    support_den: int = 100,
    mg_counters: int | None = None,
) -> DataFrame:
    """Exact items with frequency ≥ (support_num/support_den)·N.

    Returns ``(item, cnt)`` with exact counts.  ``mg_counters``
    defaults to ``2·den/num`` so the MG survival bound (freq > N/k)
    sits at half the reporting threshold — every reported item is
    provably in the candidate superset.
    """
    if mg_counters is None:
        mg_counters = 2 * ((support_den + support_num - 1) // support_num)
    if mg_counters * support_num <= support_den:
        raise ValueError(
            "mg_counters must exceed den/num for the candidate pass "
            "to be a provable superset of the heavy hitters"
        )
    item = F.col(item_col) if isinstance(item_col, str) else item_col
    items = df.select(item.alias("item")).where(F.col("item").isNotNull())
    # ONE candidate scan yields both the MG survivors and the corpus
    # total (NULL-item marker rows); localCheckpoint so the verify
    # pass below doesn't recompute the sweep
    sweep = _mg_sweep(items, mg_counters).localCheckpoint()
    cand = sweep.where(F.col("item").isNotNull()).select("item").distinct()
    total = sweep.where(F.col("item").isNull()).agg(F.sum("w").alias("n"))
    exact = (
        items.join(F.broadcast(cand), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.join(F.broadcast(total))
        .where(F.col("cnt") * F.lit(support_den) >= F.col("n") * F.lit(support_num))
        .select("item", "cnt")
    )
