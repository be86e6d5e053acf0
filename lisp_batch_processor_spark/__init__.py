"""lisp_batch_processor_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of ``jiraiya78/lisp-batch-processor``
(see SURVEY.md): an ordered, fault-tolerant, deduplicating
transformation pipeline over a collection of inputs — generalized to
columnar DataFrames, full relational operators, event-time windowing,
and LLM-training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis), all designed for 100 TB scale.

Layout:
    session.py    — SparkSession factory tuned for the harness
    catalog.py    — table loading over the driver's parquet fixtures
    registry.py   — query registry: name -> (spark fn, duckdb oracle)
    pipeline.py   — the ordered-stage pipeline abstraction (ref §1.2)
    operators/    — relational, scalar, events, text, dedup, similarity,
                    multimodal, quality operators (SURVEY.md §2.C)
    streaming/    — Structured Streaming variants
"""

from lisp_batch_processor_spark.registry import all_queries, oracles  # noqa: F401

__version__ = "0.1.0"
