from .quality import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_no_python_row_udf,
    assert_pushed_filter,
    assert_read_schema,
    executed_plan,
)

__all__ = [
    "executed_plan",
    "assert_pushed_filter",
    "assert_read_schema",
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_no_python_row_udf",
]
