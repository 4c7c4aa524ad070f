"""Physical-plan audit helpers — enforce the plans we designed for.

A query that is correct but compiles to the wrong physical strategy
(filter not pushed to the parquet scan, dimension join shuffled
instead of broadcast, an accidental cartesian product) passes every
value-level oracle and still dies at 100 TB. These helpers turn the
`.explain("formatted")` review into pytest regression assertions so a
plan downgrade fails CI, not the cluster.

They string-match Spark's formatted physical plan, which is stable
enough for coarse node names (`BroadcastHashJoin`, `PushedFilters`,
`CartesianProduct`, `WholeStageCodegen`) across Spark 3.x/4.x.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan (what `.explain('formatted')`
    prints), as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def assert_no_cartesian(df: DataFrame, label: str = "") -> None:
    """No CartesianProduct / BroadcastNestedLoopJoin anywhere — the
    textbook scale-killers (an equi-join that lost its keys)."""
    plan = physical_plan(df)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, f"{label}: {bad} in physical plan:\n{plan}"


def assert_broadcast_join(df: DataFrame, at_least: int = 1, label: str = "") -> None:
    """At least ``at_least`` BroadcastHashJoin nodes — dimension joins
    must not shuffle the fact table."""
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, (
        f"{label}: expected >= {at_least} BroadcastHashJoin, found {n}:\n{plan}"
    )


def assert_pushed_filters(df: DataFrame, fragment: str, label: str = "") -> None:
    """The parquet scan carries a pushed filter mentioning
    ``fragment`` (column name) — the predicate reached the source."""
    plan = physical_plan(df)
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line
    ]
    assert any(fragment in line and "[]" not in line.split("PushedFilters")[1][:4]
               for line in pushed), (
        f"{label}: no pushed filter on {fragment!r}; PushedFilters lines: "
        f"{pushed}\n{plan}"
    )


def assert_whole_stage_codegen(df: DataFrame, label: str = "") -> None:
    """The plan contains whole-stage-codegen spans — the hot
    expressions run inside generated JVM code, not interpreted
    row-at-a-time. Codegen markers (``[codegen id : N]``) appear only
    on the FINAL adaptive plan of THIS DataFrame's query execution, so
    this collects the df itself (a separate ``count()`` would build
    its own query execution and leave this one unfinalized)."""
    df.collect()
    plan = physical_plan(df)
    assert "codegen id" in plan or "WholeStageCodegen" in plan, (
        f"{label}: no whole-stage-codegen span:\n{plan}"
    )
