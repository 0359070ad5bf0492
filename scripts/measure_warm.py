"""Warm steady-state measurement for named queries across SF frames.

The per-round runtime sweeps are single COLD runs (per-query codegen, JIT,
and first-touch page cache included), so a sweep ratio between two SFs
conflates cold-start constants with real data-driven growth. This script
answers the follow-up question the r7 verdict asked for the
vocabulary-coupled text tail (task 5): run each named query N times warm
on each frame and report min + median, so the committed artifact can
attribute a high sweep ratio to cold-start (warm ratio ≈ data ratio) or to
genuine superlinearity (warm ratio >> data ratio).

Usage:
  python scripts/measure_warm.py out.json q1,q2,... sf_dir1 [sf_dir2 ...]
Env: SPARK_GRAFT_WARM_RUNS (default 3 timed runs after 1 warmup).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_QUIET_LOGS", "1")
    from iceberg_classifier_spark.plans.registry import load_all_queries
    from iceberg_classifier_spark.session import get_spark

    out_path = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dirs = sys.argv[3:]
    runs = int(os.environ.get("SPARK_GRAFT_WARM_RUNS", "3"))
    spark = get_spark("warm-measure")
    registry = load_all_queries()
    try:
        with open("/proc/loadavg") as f:
            load = f.read().split()[0]
    except OSError:
        load = None
    # refuse a busy host like bench.py strict mode does (r9: the itemitem
    # warm artifact shipped stamped loadavg 6.72 — the exact contamination
    # this guard exists for). SPARK_GRAFT_WARM_FORCE=1 overrides, and the
    # stamp records that it did.
    forced = os.environ.get("SPARK_GRAFT_WARM_FORCE") == "1"
    if load is not None and float(load) > 1.0 and not forced:
        sys.exit(
            f"host busy (loadavg {load} > 1.0) — warm ratios measured now"
            " would be contaminated; wait for idle or set"
            " SPARK_GRAFT_WARM_FORCE=1 to record a forced run"
        )
    out: dict[str, object] = {
        "runs": runs,
        "loadavg_start": load,
        "forced_on_busy_host": forced,
        "frames": {},
    }
    for sf_dir in sf_dirs:
        frame: dict[str, object] = {}
        for name in names:
            fn = registry[name].fn
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            # each fn() call may persist()/cache() fresh blocks (e.g.
            # recsysx's ui/co_half/scored); without clearing between
            # timed runs those accumulate across the 1+N executions and
            # GC/eviction pressure contaminates the warm min/median —
            # the same cache-contamination class sweep_runtimes.py fixed
            spark.catalog.clearCache()
            ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            ts.sort()
            frame[name] = {
                "min": round(ts[0], 3),
                "median": round(ts[len(ts) // 2], 3),
            }
            print(sf_dir, name, frame[name], flush=True)
        out["frames"][sf_dir] = frame
    json.dump(out, open(out_path, "w"), indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
