"""Walk every registered query's optimized logical plan and report which
queries contain a Window (or WindowGroupLimit) node with an EMPTY partition
spec — the single-partition-sort hazard class. Used once to generate the
audited allowlist in tests/test_plan_guards.py; re-run after intentional
changes.

Usage: python scripts/gen_window_allowlist.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def unpartitioned_window_count(df) -> int:
    plan = df._jdf.queryExecution().optimizedPlan()
    n = 0
    stack = [plan]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        if name in ("Window", "WindowGroupLimit"):
            try:
                if node.partitionSpec().isEmpty():
                    n += 1
            except Exception:
                pass
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return n


def main() -> None:
    from iceberg_classifier_spark.plans.registry import load_all_queries
    from iceberg_classifier_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("window-audit")
    registry = load_all_queries()
    flagged: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name in sorted(registry):
        try:
            df = registry[name].fn(spark, sf_dir)
            n = unpartitioned_window_count(df)
            if n:
                flagged[name] = n
        except Exception as exc:  # noqa: BLE001 — report and continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
        print(f"done {name}: {flagged.get(name, 0)}", flush=True)
    print("=== FLAGGED (unpartitioned Window nodes in optimized plan) ===")
    for name, n in sorted(flagged.items()):
        print(f"    \"{name}\": {n},")
    print(f"=== {len(flagged)} queries flagged, {len(errors)} errors ===")
    for name, e in errors.items():
        print("ERROR", name, e)


if __name__ == "__main__":
    main()
