"""Structured Streaming jobs (extension; the reference is batch-only,
SURVEY §2.7)."""

from .windows import events_stream_tumbling, tumbling_counts

__all__ = ["tumbling_counts", "events_stream_tumbling"]
