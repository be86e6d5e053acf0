"""Operator modules; importing this package registers every query."""

from lisp_batch_processor_spark.operators import (  # noqa: F401
    dedup,
    events,
    multimodal,
    quality,
    relational,
    scalar,
    similarity,
    skew,
    streaming_twins,
    text,
    tpch,
)
