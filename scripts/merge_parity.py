"""Merge sharded sweep_parity outputs into one committable artifact.

Usage: python scripts/merge_parity.py out.json shard1.json [shard2.json ...]

Entries are deduped by query name (a resumed shard may carry entries
preloaded from a pre-shard checkpoint); a "pass" beats any other status
for the same name so a stale timeout/ERR from an interrupted run never
shadows a completed comparison.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, shard_paths = sys.argv[1], sys.argv[2:]
    merged: dict[str, dict] = {}
    meta = None
    for p in shard_paths:
        doc = json.load(open(p))
        meta = meta or {k: v for k, v in doc.items() if k != "queries"}
        for name, rec in doc["queries"].items():
            prev = merged.get(name)
            if prev is None or (
                prev.get("status") != "pass" and rec.get("status") == "pass"
            ):
                merged[name] = rec
    statuses = [str(r.get("status")) for r in merged.values()]
    n_pass = sum(s == "pass" for s in statuses)
    n_rows_only = sum(s == "rows_only" for s in statuses)
    n_skip = sum(s.startswith("skipped_infeasible") for s in statuses)
    n_fail = len(statuses) - n_pass - n_rows_only - n_skip
    doc = {
        **(meta or {}),
        "merged_from": shard_paths,
        "n_pass": n_pass,
        "n_rows_only": n_rows_only,
        "n_skipped": n_skip,
        "n_fail": n_fail,
        "n_total": len(merged),
        "queries": dict(sorted(merged.items())),
    }
    json.dump(doc, open(out_path, "w"), indent=1)
    print(
        f"merged {len(shard_paths)} shards -> {out_path}: "
        f"{n_pass} pass, {n_rows_only} rows_only, {n_skip} skipped, "
        f"{n_fail} fail/err of {len(merged)}"
    )


if __name__ == "__main__":
    main()
