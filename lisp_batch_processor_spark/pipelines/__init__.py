"""End-to-end pipelines composed from the engine's operators.

`corpus.assemble_corpus` is the product-shaped artifact: the full
LLM training-data path (URL dedup -> sub-document dedup -> near-dup
-> quality filters -> decontamination -> split -> pack -> shuffle)
as ONE function whose every stage writes durable parquet and
accounts for its rows with Catalyst CollectMetrics.

`ingest.streaming_corpus_ingest` is its continuous twin for the
ingest-side stages: micro-batches deduplicate against persisted
URL/line/near-dup stores (never a corpus re-scan), epoch
concatenation pinned equal to the batch reference.
"""

from lisp_batch_processor_spark.pipelines.corpus import (  # noqa: F401
    CorpusAssembly,
    StageResult,
    assemble_corpus,
)
from lisp_batch_processor_spark.pipelines.report import (  # noqa: F401
    corpus_diff,
    corpus_report,
)
from lisp_batch_processor_spark.pipelines.ingest import (  # noqa: F401
    corpus_ingest_batch,
    corpus_ingest_compact,
    corpus_ingest_epoch,
    corpus_ingest_init,
    corpus_ingest_seed,
    corpus_read,
    ingest_report,
    start_corpus_ingest,
    streaming_corpus_ingest,
)
