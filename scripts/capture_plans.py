#!/usr/bin/env python3
"""Capture .explain("formatted") for headline (or named) queries into
plans/$SPARK_GRAFT_PLANS_ROUND/ (default r10).

Usage: python scripts/capture_plans.py before|after [name ...]
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

USAGE = "Usage: python scripts/capture_plans.py before|after [name ...]"

def main():
    if len(sys.argv) < 2 or sys.argv[1] not in ("before", "after"):
        print(USAGE, file=sys.stderr)
        sys.exit(2)
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_QUIET_LOGS", "1")
    from iceberg_classifier_spark.plans.registry import load_all_queries
    from iceberg_classifier_spark.session import get_spark
    spark = get_spark("capture_plans")
    reg = load_all_queries()
    todo = names or sorted(n for n, qd in reg.items() if qd.headline)
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r10")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    for name in todo:
        df = reg[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        spark.catalog.clearCache()
        print(f"captured {name}_{tag}: {plan.count('Exchange')} Exchange-mentions, {len(plan)} chars")
    spark.stop()

if __name__ == "__main__":
    main()
