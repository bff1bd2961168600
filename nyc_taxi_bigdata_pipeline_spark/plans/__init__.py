from .explain import (
    assert_broadcast_join,
    assert_no_python_udf,
    assert_pushed_filters,
    assert_read_schema_pruned,
    physical_plan,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_python_udf",
    "assert_pushed_filters",
    "assert_read_schema_pruned",
    "physical_plan",
]
