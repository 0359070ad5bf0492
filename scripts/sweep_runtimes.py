"""Run EVERY registered query once at a given SF and report per-query
wall time + errors — the whole-surface health sweep (the driver's bench
only times headline queries; this catches scale bugs and perf outliers
in the other ~580).

Round-5 finds: 4 int64/int32 overflow crashes at sf0.1 (ANSI mode) and
a dozen 7-88 s outliers (branch-recomputed expensive frames, O(n^2)
hot-bucket joins, interpreted-lambda CSE misses) — all fixed.

Usage: python scripts/sweep_runtimes.py [sf_dir] [out_json] [names_csv]
names_csv (optional): only sweep these query names — for re-measuring a
table-scoped subset (e.g. every documents-backed query after a testdata
generator change) without paying for the full registry.
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

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_times.json"
    spark = get_spark("sweep")
    registry = load_all_queries()
    if len(sys.argv) > 3 and sys.argv[3]:
        names = set(sys.argv[3].split(","))
        unknown = names - set(registry)
        assert not unknown, f"unknown query names: {sorted(unknown)}"
        registry = {k: v for k, v in registry.items() if k in names}
    out: dict[str, object] = {}
    # SPARK_GRAFT_SWEEP_RESUME=1: preload a checkpointed artifact and run
    # only what it doesn't record yet (same convention as sweep_parity.py)
    # — a multi-hour cold sweep killed mid-run resumes instead of redoing
    # every completed query. Resumed timings stay honest: each retained
    # entry was itself a cold first run in its own JVM.
    if os.environ.get("SPARK_GRAFT_SWEEP_RESUME") == "1" and os.path.exists(
        out_path
    ):
        out = {
            k: v
            for k, v in json.load(open(out_path)).items()
            if not isinstance(v, str)  # ERR entries re-run
        }
        print(f"resumed: {len(out)} recorded", flush=True)
    for name in sorted(registry):
        if name in out:
            continue
        t0 = time.perf_counter()
        try:
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out[name] = round(time.perf_counter() - t0, 2)
        except Exception as exc:  # noqa: BLE001 — report and continue
            out[name] = f"ERR {type(exc).__name__}"
        # drop every cached/persisted block the query left behind: the
        # shared session otherwise ACCUMULATES them (r8: 39 GB of heap
        # junk after 243 sf10 queries → each 1 s query paid ~55 s of GC),
        # and cross-query cache hits would flatter later queries anyway
        try:
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001 — cleanup must not kill the sweep
            pass
        print(name, out[name], flush=True)
        tmp = out_path + ".tmp"
        json.dump(out, open(tmp, "w"))
        os.replace(tmp, out_path)
    json.dump(out, open(out_path, "w"))
    errs = [k for k, v in out.items() if isinstance(v, str)]
    slow = sorted(
        ((v, k) for k, v in out.items() if not isinstance(v, str)),
        reverse=True,
    )[:15]
    print("ERRORS:", errs)
    print("SLOWEST:", [(k, v) for v, k in slow])


if __name__ == "__main__":
    main()
