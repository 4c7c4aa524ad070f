from ligra_spark.plans.audit import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_whole_stage_codegen,
    physical_plan,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_pushed_filters",
    "assert_whole_stage_codegen",
    "physical_plan",
]
