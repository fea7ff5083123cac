from nass_summary_spark.streaming.events import (
    sessionize_batch,
    sessionize_stream,
    stream_dedup,
    windowed_agg_batch,
    windowed_agg_stream,
)

__all__ = [
    "windowed_agg_batch",
    "windowed_agg_stream",
    "sessionize_batch",
    "sessionize_stream",
    "stream_dedup",
]
