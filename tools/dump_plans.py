#!/usr/bin/env python
"""Dump .explain('formatted') for named catalog queries to plans/r06/.

Usage: python tools/dump_plans.py <suffix> name1 name2 ...
Writes plans/r06/<name>_<suffix>.txt for each query name (suffix is
'before' or 'after'). Judge-facing artifact per the round-6 deliverables.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pl_marker_spark import queries_catalog
    from pl_marker_spark.session import get_spark

    spark = get_spark(app="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries_catalog.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
