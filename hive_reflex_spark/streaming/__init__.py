"""Structured Streaming operators (SURVEY §2A ST1-ST8)."""

from hive_reflex_spark.streaming.ops import (
    run_to_memory,
    stateful_user_counts,
    stream_events,
)

__all__ = ["run_to_memory", "stateful_user_counts", "stream_events"]
