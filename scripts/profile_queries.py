#!/usr/bin/env python3
"""Time every registered query at $SPARK_GRAFT_TEST_SF_DIR (default
sf0.01) — the scale and collection style (toPandas) of the driver's
correctness gate — and print the slowest ones. Used to keep per-query
latency low so the driver's sampling budget covers more of the registry.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_classifier_spark.plans.registry import load_all_queries
os.environ.setdefault("SPARK_GRAFT_QUIET_LOGS", "1")
from iceberg_classifier_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("profile")
    times: dict[str, float] = {}
    for name, qd in sorted(load_all_queries().items()):
        t0 = time.perf_counter()
        try:
            n = len(qd.fn(spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001
            times[name] = -1.0
            print(f"ERR {name}: {repr(e)[:150]}", flush=True)
            continue
        times[name] = round(time.perf_counter() - t0, 2)
    total = sum(t for t in times.values() if t > 0)
    print(json.dumps({"total_sec": round(total, 1), "n": len(times)}))
    for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{t:8.2f}s  {name}")
    spark.stop()


if __name__ == "__main__":
    main()
