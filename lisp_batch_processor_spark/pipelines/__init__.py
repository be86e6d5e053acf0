"""End-to-end pipelines composed from the engine's operators.

`corpus.assemble_corpus` is the product-shaped artifact: the full
LLM training-data path (URL dedup -> sub-document dedup -> near-dup
-> quality filters -> decontamination -> split -> pack -> shuffle)
as ONE function whose every stage writes durable parquet and
accounts for its rows with Catalyst CollectMetrics.
"""

from lisp_batch_processor_spark.pipelines.corpus import (  # noqa: F401
    CorpusAssembly,
    StageResult,
    assemble_corpus,
)
