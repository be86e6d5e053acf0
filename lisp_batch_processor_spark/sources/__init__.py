"""Source/sink connectors: directory scans, explicit path lists,
incremental dedup-on-insert ingest, partitioned/bucketed writers."""

from lisp_batch_processor_spark.sources.readers import (  # noqa: F401
    incremental_append,
    read_path_list,
    scan_directory,
)
from lisp_batch_processor_spark.sources.shards import (  # noqa: F401
    read_manifest,
    read_training_shards,
    write_training_shards,
)
from lisp_batch_processor_spark.sources.writers import (  # noqa: F401
    overwrite_partitions_dynamic,
    write_bucketed,
    write_partitioned,
)
