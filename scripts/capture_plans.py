#!/usr/bin/env python
"""Capture .explain('formatted') for named queries into plans/r15/.

    python scripts/capture_plans.py before ss_nsw_nn_descent_converge gr_pagerank ...

Writes plans/r15/<name>_<tag>.txt. Uses the bench session config
(local[$SPARK_GRAFT_CPUS]) and $SPARK_GRAFT_SF_DIR (default sf0.1) so the
plan matches what the bench executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from harvard_artifacts_collection_data_engineering_analytics_app_spark.queries import (  # noqa: E402
    registry,
)
from harvard_artifacts_collection_data_engineering_analytics_app_spark.session import (  # noqa: E402
    get_spark,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", "r15")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        df = specs[name].builder(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
