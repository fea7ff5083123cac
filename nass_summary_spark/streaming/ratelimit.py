"""Per-key rate limiting (SURVEY.md §2 C15) — the ingest-guard
operator every event pipeline needs in front of expensive stages
(enrichment joins, model scoring, downstream quotas).

Two related operators:

* :func:`rate_flags` — BATCH, closed-form: flag each event by
  whether the key's raw event count in the trailing window already
  reached the cap.  One RANGE-frame window per key (rides the key
  shuffle); fully SQL-expressible, so it carries a DuckDB oracle.

* :func:`rate_limit_stream` — STREAMING, stateful token bucket via
  ``applyInPandasWithState``: per key, a bucket of ``capacity``
  tokens refilling at ``refill_per_sec`` (event-time based), each
  admitted event spending one.  Admission depends on prior
  admissions (a true recursion), which no window can express — this
  is exactly the custom-stateful-operator shape.  Idle keys are
  evicted by ``EventTimeTimeout`` past the watermark horizon, so
  state tracks the active key set (the C5/C10 eviction pattern).
  Works on a batch frame too (one fold per key) — the parity twin
  the tests replay against a pure-Python simulation.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from nass_summary_spark.functions.parsing import epoch_micros


def rate_flags(
    events: DataFrame,
    key_col: str,
    id_col: str,
    ts_col: str = "ts",
    window_sec: int = 60,
    max_events: int = 5,
) -> DataFrame:
    """Closed-form sliding-window rate guard: an event is admitted
    iff its key saw FEWER than ``max_events`` raw events in the
    trailing ``window_sec`` (exclusive of the event's own
    microsecond).  Counting raw arrivals (not admissions) keeps the
    rule non-recursive — one RANGE window, no state — which is why
    a plain batch engine (and the oracle) can evaluate it exactly.
    Returns (key, id, ts, n_recent, admitted).
    """
    us = epoch_micros(F.col(ts_col))
    w = (
        Window.partitionBy(key_col)
        .orderBy(us)
        .rangeBetween(-window_sec * 1_000_000, -1)
    )
    return events.select(
        F.col(key_col),
        F.col(id_col),
        F.col(ts_col),
        F.count(F.lit(1)).over(w).alias("n_recent"),
    ).withColumn("admitted", F.col("n_recent") < F.lit(max_events))


BUCKET_STATE_SCHEMA = StructType(
    [
        StructField("tokens", DoubleType()),
        StructField("last_us", LongType()),
    ]
)

BUCKET_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("admitted", BooleanType()),
    ]
)

#: Idle horizon after which a key's bucket state is evicted.
BUCKET_EVICT_MS = 60 * 60 * 1000


def simulate_bucket(
    series: list[tuple[int, int]],
    capacity: float,
    refill_per_sec: float,
    tokens: float | None = None,
    last_us: int | None = None,
) -> tuple[list[bool], float, int]:
    """Reference token-bucket fold over an event-time-sorted series
    of (event_id, ts_us): returns (admitted flags, tokens, last_us).
    Shared by the executor-side update function and the tests'
    pure-Python replay — the semantics live in one place; the
    STATE machinery around it is what the stream twin certifies."""
    if tokens is None:
        tokens = float(capacity)
    flags: list[bool] = []
    for _eid, t in series:
        if last_us is not None and t > last_us:
            tokens = min(
                float(capacity), tokens + refill_per_sec * (t - last_us) / 1e6
            )
        last_us = t if last_us is None else max(last_us, t)
        if tokens >= 1.0:
            tokens -= 1.0
            flags.append(True)
        else:
            flags.append(False)
    return flags, tokens, last_us if last_us is not None else 0


def _make_bucket_update(capacity: float, refill_per_sec: float):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            tokens, last_us = state.get
        else:
            tokens, last_us = None, None
        rows: list[tuple[int, int]] = []
        for pdf in pdfs:
            rows.extend(
                (int(e), int(t)) for e, t in zip(pdf["event_id"], pdf["ts_us"])
            )
        rows.sort(key=lambda r: (r[1], r[0]))  # event-time fold order
        flags, tokens, last_us = simulate_bucket(
            rows, capacity, refill_per_sec, tokens, last_us
        )
        state.update((tokens, last_us))
        state.setTimeoutTimestamp(
            max(last_us // 1000, state.getCurrentWatermarkMs()) + BUCKET_EVICT_MS
        )
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": [e for e, _ in rows],
                "ts_us": [t for _, t in rows],
                "admitted": flags,
            }
        )

    return update


def rate_limit_stream(
    events: DataFrame,
    capacity: float = 5.0,
    refill_per_sec: float = 0.1,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stateful per-user token bucket over (user_id, event_id, ts):
    emits every event tagged ``admitted``.  Streaming frames keep
    (tokens, last_us) per ACTIVE user (EventTimeTimeout eviction);
    batch frames run the identical fold in one pass per key via the
    same ``applyInPandas`` body — stream-vs-batch parity is the
    correctness pin."""
    # event time reaches Python as a plain int64 µs column computed
    # JVM-side (tz-independent) — no pandas datetime coercion in the
    # Arrow batches
    cols = events.select(
        "user_id", "event_id", "ts", epoch_micros(F.col("ts")).alias("ts_us")
    )
    update = _make_bucket_update(capacity, refill_per_sec)
    if events.isStreaming:
        from nass_summary_spark.streaming.events import ensure_event_time

        return (
            ensure_event_time(cols)
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType=BUCKET_OUTPUT_SCHEMA,
                stateStructType=BUCKET_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )

    def batch_fold(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = [(int(e), int(t)) for e, t in zip(pdf["event_id"], pdf["ts_us"])]
        rows.sort(key=lambda r: (r[1], r[0]))
        flags, _, _ = simulate_bucket(rows, capacity, refill_per_sec)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].iloc[0],
                "event_id": [e for e, _ in rows],
                "ts_us": [t for _, t in rows],
                "admitted": flags,
            }
        )

    # explicit key-repartition: pre-satisfies the applyInPandas
    # distribution (no extra exchange) and pins the Python fold's
    # width against AQE byte-coalescing (the folds are CPU-bound,
    # byte-tiny); per-user results are partitioning-independent
    width = int(cols.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        cols.repartition(width, "user_id")
        .groupBy("user_id")
        .applyInPandas(batch_fold, BUCKET_OUTPUT_SCHEMA)
    )
