"""Structured Streaming variants of the event-time operators.

Streaming is a MODE of the same queries (SURVEY.md milestone 3), not
a separate engine: the batch twins live in ``operators/events.py``.
"""

from lisp_batch_processor_spark.streaming.windows import (  # noqa: F401
    streaming_sessionize,
    streaming_tumbling_counts,
)
