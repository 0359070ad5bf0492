#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes its full plan via the noop sink (no driver
materialization, no result-size bias).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_QUIET_LOGS", "1")

    from iceberg_classifier_spark.plans.registry import load_all_queries
    from iceberg_classifier_spark.session import get_spark

    spark = get_spark("bench")
    registry = load_all_queries()
    headline = {n: qd for n, qd in registry.items() if qd.headline}

    # one warmup pass to exclude JVM/codegen cold-start from per-query times
    next(iter(headline.values())).fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    times: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name, qd in sorted(headline.items()):
        # best-of-5: the first run may pay codegen/JIT compilation for this
        # query's operators, and single runs carry ±20% scheduler noise on
        # a busy host; the min is the steady-state number. The median is
        # reported alongside so a round-over-round delta can be classified:
        # min moved ⇒ the plan changed; only median moved ⇒ host noise
        # (methodology note per round-4 verdict task 8 — top_customers'
        # +21% was noise on an unchanged plan).
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        times[name] = round(runs[0], 3)
        medians[name] = round(runs[len(runs) // 2], 3)

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "queries_median": medians,
        "runs_per_query": 5,
        "method": "min of 5 timed runs per query (the first timed run "
        "absorbs that query's codegen; one global JVM warmup pass runs "
        "before any timing); medians reported to separate plan "
        "regressions from scheduler noise",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
