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


_GROUPED_SWEEP_SCHEMA = StructType(
    [
        StructField("grp", StringType(), True),
        StructField("item", StringType(), True),
        StructField("w", LongType(), False),
    ]
)


def grouped_topk_sketch(
    df: DataFrame,
    group_col: str,
    item_col: Column | str,
    k: int = 5,
    mg_counters: int = 256,
) -> DataFrame:
    """Per-GROUP top-k items by exact count, with candidate
    generation through MERGEABLE per-partition Misra–Gries summaries
    — the grouped sibling of :func:`heavy_hitters` and the sketch
    shape a per-source / per-language vocabulary audit needs at
    100 TB.

    1. **Sketch pass** — each partition keeps an independent
       ``mg_counters``-counter MG summary PER GROUP (memory
       O(groups·m) per partition, independent of partition size).
       MG summaries are mergeable (Agarwal et al., "Mergeable
       Summaries", PODS'12): the union of the per-partition
       survivors is a provable superset of every item whose
       group-wide count exceeds N_g/m — the merge that matters for
       candidacy is the relational UNION the next pass consumes, at
       most partitions·m fixed-width rows per group.
    2. **Exact pass** — only candidate (group, item) occurrences are
       recounted exactly (a semi join the engine sizes as broadcast
       or shuffle), then ranked per group: ``rank ≤ k`` by
       (count desc, item asc — deterministic ties).

    The composition returns the EXACT top-k whenever the k-th item
    of each group has frequency > N_g/``mg_counters`` — the demo
    query satisfies this by orders of magnitude (Zipfian word
    frequencies vs a 1/256 threshold), which is why it carries a
    plain-SQL oracle rather than a rows-only check. Output:
    (``group_col``, item, cnt, rnk).
    """
    from pyspark.sql import Window

    item = F.col(item_col) if isinstance(item_col, str) else item_col
    items = df.select(
        F.col(group_col).cast("string").alias("grp"), item.alias("item")
    ).where(F.col("item").isNotNull() & F.col("grp").isNotNull())

    m = int(mg_counters)

    def sweep(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        tables: dict[str, dict[str, int]] = {}
        for b in batches:
            # vectorized within-batch exact pre-aggregation; the
            # python loop is over distinct (group, item) of one batch
            for (grp, itm), w in (
                b.groupby(["grp", "item"], sort=False).size().items()
            ):
                counters = tables.setdefault(grp, {})
                if itm in counters:
                    counters[itm] += int(w)
                else:
                    counters[itm] = int(w)
                    if len(counters) > m:
                        mn = min(counters.values())
                        tables[grp] = {
                            i: c - mn for i, c in counters.items() if c > mn
                        }
        rows = [
            {"grp": g, "item": i, "w": w}
            for g, counters in tables.items()
            for i, w in counters.items()
        ]
        yield pd.DataFrame(rows, columns=["grp", "item", "w"])

    sketch = items.mapInPandas(sweep, _GROUPED_SWEEP_SCHEMA)
    cand = sketch.select("grp", "item").distinct()
    exact = (
        items.join(cand, ["grp", "item"], "left_semi")
        .groupBy("grp", "item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("grp").orderBy(F.col("cnt").desc(), F.col("item"))
    return (
        exact.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .withColumnRenamed("grp", group_col)
    )
