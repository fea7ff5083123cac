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


#: Idle horizon after which a user's running-stats state is evicted
#: (fires once the event-time watermark passes last-seen + this gap).
USER_STATS_EVICT_MS = 60 * 60 * 1000


def _update_user_stats(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # watermark passed the idle horizon: emit the final state row
        # one last time and drop the state — per-key state stays
        # bounded by ACTIVE keys, not all keys ever seen
        if state.exists:
            n, s, m = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "n_events": n, "sum_value": s, "max_value": m}]
            )
        return
    if state.exists:
        n, s, m = state.get
    else:
        n, s, m = 0, 0.0, float("-inf")
    max_ts = 0
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            m = max(m, float(pdf["value"].max()))
            micros = pdf["ts"].astype("datetime64[us]").astype("int64")
            max_ts = max(max_ts, int(micros.max()))
    state.update((n, round(s, 4), m))
    state.setTimeoutTimestamp(
        max(max_ts // 1000, state.getCurrentWatermarkMs()) + USER_STATS_EVICT_MS
    )
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "sum_value": round(s, 4), "max_value": m}]
    )


def running_user_stats(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Per-user running statistics as a custom stateful operator.

    Works on both a streaming frame (true incremental state) and a
    batch frame (one 'micro-batch'; the batch twin for parity tests).

    Stream state is bounded: ``EventTimeTimeout`` evicts a user —
    emitting their final state row — once the event-time watermark
    passes their last event by ``USER_STATS_EVICT_MS``, so state size
    tracks the ACTIVE key set on an unbounded user population instead
    of growing forever (the funnel operator's eviction pattern).
    """
    if events.isStreaming:
        from nass_summary_spark.streaming.events import ensure_event_time

        grouped = (
            ensure_event_time(events.select("user_id", "ts", "value"))
            .withWatermark("ts", watermark)
            .groupBy("user_id")
        )
        return grouped.applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    grouped = events.select("user_id", "value").groupBy("user_id")
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


#: Idle horizon after which a user's funnel state is evicted (fires
#: once the event-time watermark passes last-seen-event + this gap).
FUNNEL_EVICT_MS = 60 * 60 * 1000


def _update_funnel(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # watermark passed the eviction horizon: emit the final
        # completion row and drop the state
        lists = [list(x) for x in state.get] if state.exists else [[], [], []]
        t0, t1, t2 = _funnel_times(*lists)
        state.remove()
        yield pd.DataFrame([{"user_id": user_id, "t0": t0, "t1": t1, "t2": t2}])
        return
    lists = [list(x) for x in state.get] if state.exists else [[], [], []]
    step_idx = {s: i for i, s in enumerate(FUNNEL_STEPS)}
    max_ts = 0
    for pdf in pdfs:
        micros = pdf["ts"].astype("datetime64[us]").astype("int64")
        for t, et in zip(micros, pdf["event_type"]):
            i = step_idx.get(et)
            if i is not None:
                lists[i].append(int(t))
                max_ts = max(max_ts, int(t))
    # PRUNE before storing — only times that can still affect the
    # min-after-previous-step derivation are retained:
    #  * step 0: only min(l0) is ever read, and late arrivals can
    #    only lower it → a singleton.
    #  * steps 1-2: any future t0 is >= min(current t0, watermark)
    #    (later-batch events below the watermark are dropped by the
    #    engine), so times at or below that bound can never satisfy
    #    the strictly-after chain → drop them.
    wm_us = state.getCurrentWatermarkMs() * 1000
    t0_now = min(lists[0]) if lists[0] else None
    bound = min(t0_now, wm_us) if t0_now is not None else wm_us
    lists = [
        [t0_now] if t0_now is not None else [],
        [x for x in lists[1] if x > bound],
        [x for x in lists[2] if x > bound],
    ]
    state.update(tuple(lists))
    state.setTimeoutTimestamp(
        max(max_ts // 1000, state.getCurrentWatermarkMs()) + FUNNEL_EVICT_MS
    )
    t0, t1, t2 = _funnel_times(*lists)
    yield pd.DataFrame([{"user_id": user_id, "t0": t0, "t1": t1, "t2": t2}])


def funnel_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming twin of ``funnel_batch`` (C10) as a custom stateful
    operator: per-user funnel-step event times accumulate in state and
    the exact ordered-completion times are re-derived per micro-batch
    — correct under out-of-order arrival (a late step-1 event can
    retroactively unlock an earlier step-2 time, which incremental
    min-tracking would miss).

    State is bounded two ways: per-batch pruning keeps only times
    that can still affect the min-after-previous-step chain given the
    current watermark (step 0 collapses to a singleton), and
    ``EventTimeTimeout`` evicts a user outright — emitting the final
    completion row — once the watermark passes their last event by
    ``FUNNEL_EVICT_MS``. The parity test runs the file stream to
    completion and compares per-user completion against the batch
    operator.
    """
    from nass_summary_spark.streaming.events import ensure_event_time

    grouped = (
        ensure_event_time(events.select("user_id", "ts", "event_type"))
        .withWatermark("ts", watermark)
        .where(F.col("event_type").isin(list(FUNNEL_STEPS)))
        .groupBy("user_id")
    )
    return grouped.applyInPandasWithState(
        _update_funnel,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


EWMA_STATE_SCHEMA = StructType(
    [
        StructField("last_ewma", DoubleType()),
    ]
)

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("series_key", LongType()),
        StructField("ts_us", LongType()),
        StructField("value", DoubleType()),
        StructField("ewma", DoubleType()),
    ]
)

#: Idle horizon after which a series' EWMA state is evicted.
EWMA_EVICT_MS = 6 * 60 * 60 * 1000


def _make_ewma_update(alpha: float, round_dp: int):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (series_key,) = key
        if state.hasTimedOut:
            state.remove()
            return
        last = state.get[0] if state.exists else None
        rows: list[tuple[int, float]] = []
        for pdf in pdfs:
            rows.extend(
                (int(t), float(v)) for t, v in zip(pdf["ts_us"], pdf["value"])
            )
        rows.sort()
        out = []
        for t, v in rows:
            last = v if last is None else (1.0 - alpha) * last + alpha * v
            out.append((series_key, t, v, round(last, round_dp)))
        state.update((last,))
        max_ts = rows[-1][0] // 1000 if rows else 0
        state.setTimeoutTimestamp(
            max(max_ts, state.getCurrentWatermarkMs()) + EWMA_EVICT_MS
        )
        yield pd.DataFrame(
            out, columns=["series_key", "ts_us", "value", "ewma"]
        )

    return update


def ewma_stream(
    events: DataFrame,
    alpha: float = 0.2,
    round_dp: int = 6,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming twin of the batch :func:`operators.stats.ewma_smooth`
    (C16): per-key EWMA carried INCREMENTALLY in state — one double
    per active series (`EventTimeTimeout` eviction past the
    watermark horizon), rows folded in event-time order within each
    micro-batch.  Under ordered arrival the emitted values equal the
    batch operator exactly (parity-tested); a late row folds at its
    arrival position — the standard incremental-smoothing trade,
    same as every streaming EWMA monitor.

    Expects (series_key, ts, value); emits (series_key, ts_us,
    value, ewma) per row in append mode.
    """
    from nass_summary_spark.functions.parsing import epoch_micros
    from nass_summary_spark.streaming.events import ensure_event_time

    cols = ensure_event_time(
        events.select(
            F.col("series_key"),
            F.col("ts"),
            F.col("value").cast("double").alias("value"),
        )
    ).withColumn("ts_us", epoch_micros(F.col("ts")))
    update = _make_ewma_update(alpha, round_dp)
    return (
        cols.withWatermark("ts", watermark)
        .groupBy("series_key")
        .applyInPandasWithState(
            update,
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
