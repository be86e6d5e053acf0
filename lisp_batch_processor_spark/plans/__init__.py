"""Plan inspection: assert physical-plan properties in tests."""

from lisp_batch_processor_spark.plans.inspect import (  # noqa: F401
    assert_no_cartesian,
    assert_pushed_filters,
    assert_read_schema_pruned,
    disallowed_nested_loops,
    physical_plan,
)
