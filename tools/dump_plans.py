#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/r11/<q>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> <query> [<query> ...]
       REPO=/some/worktree python tools/dump_plans.py before q1 q2

The optional REPO env var points at the source tree to import the
engine from (e.g. a worktree pinned at the pre-optimization commit for
"before" plans); output always lands in THIS repo's plans/r11/.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPO = os.environ.get("REPO", HERE)
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(HERE, "plans", "r11")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)

    from bigquery_cross_environment_etl_pipeline_spark import queries_catalog
    from bigquery_cross_environment_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"dump_plans_{tag}")
    queries = queries_catalog.spark_queries()
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
