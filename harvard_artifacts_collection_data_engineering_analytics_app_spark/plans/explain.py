"""Plan-inspection helpers: make physical-plan properties testable.

"Would this survive a 100× scale-up?" is a plan property, not a timing:
filters must reach the scan, small dims must broadcast, top-k must plan
TakeOrderedAndProject (never a global sort), aggregates must have a
partial (map-side) phase. These helpers extract that from
``explain('formatted')`` so tests/test_plans.py can assert it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line.removeprefix("PushedFilters:").strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema entries — verifies column pruning reached the scan."""
    return [
        line.strip().removeprefix("ReadSchema:").strip()
        for line in formatted_plan(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def has_operator(df: DataFrame, name: str) -> bool:
    return name in formatted_plan(df)


def uses_broadcast_join(df: DataFrame) -> bool:
    return has_operator(df, "BroadcastHashJoin") or has_operator(
        df, "BroadcastNestedLoopJoin"
    )


def uses_take_ordered(df: DataFrame) -> bool:
    """Top-k plans as TakeOrderedAndProject — no global sort materialized."""
    return has_operator(df, "TakeOrderedAndProject")


def has_partial_aggregate(df: DataFrame) -> bool:
    """Two HashAggregate phases ⇒ map-side partial aggregation is present."""
    return formatted_plan(df).count("HashAggregate") >= 2


def has_cartesian_product(df: DataFrame) -> bool:
    return has_operator(df, "CartesianProduct")


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen subtree count (explain mode 'codegen').

    The formatted plan hides codegen ids under AQE before execution, but
    codegen mode reports 'Found N WholeStageCodegen subtrees' directly.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    # AQE defers physical planning, hiding codegen ids from explain; plan
    # this one inspection without it (conf is read at planning time).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = formatted_plan(df)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    ids = {
        line.split("codegen id :")[1].split("]")[0].strip()
        for line in plan.splitlines()
        if "codegen id :" in line
    }
    return len(ids)
