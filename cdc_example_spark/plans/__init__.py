from cdc_example_spark.plans.audit import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_read_schema_pruned,
    explain_formatted,
    plan_summary,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_pushed_filters",
    "assert_read_schema_pruned",
    "explain_formatted",
    "plan_summary",
]
