"""Synthesize a larger scale-factor directory from a driver-generated one
by union-replicating every fact table N times with per-replica key offsets
(round-6 verdict task 1: demonstrate the 100x-scale claims above sf0.1).

TESTDATA.md forbids modifying /root/testdata, not deriving from it: the
source is read-only input and the scaled copy lands elsewhere (/tmp by
default). Replication rules:

- region/nation: copied verbatim — fixed dimensions whose keys are
  referenced by nationkey/regionkey columns that are NOT offset, so every
  replica joins to the same 25/5 rows (exactly how a real warehouse scales:
  facts grow, enum-like dims don't).
- every other table: replica r adds r * stride to its primary key and to
  the foreign keys into OTHER replicated tables, where stride = max(key)+1
  of the source — so each replica is a self-consistent copy of the star
  schema (joins match within a replica, never across) and key-derived
  slices (doc_id % 7, vec_id < 8, user_id % buckets) keep their density.
- value/timestamp/text columns are unchanged: per-day volumes, per-user
  series, token statistics and embedding geometry all scale by exactly N,
  which is the point — a query whose runtime grows faster than N at fixed
  parallelism has a super-linear plan, not bigger constants. Identical
  replicated texts also make the dedup family's job 10x harder in the
  realistic direction (replicated corpora are WHY dedup exists).

Usage: python scripts/gen_scaled_testdata.py [src_sf_dir] [dst_dir] [N]
Defaults: /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

import duckdb

# table -> {column: stride_source_table} for key columns to offset;
# stride_source_table names whose primary-key max defines the stride.
OFFSETS: dict[str, dict[str, tuple[str, str]]] = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
VERBATIM = ("region", "nation")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    strides: dict[tuple[str, str], int] = {}
    for spec in OFFSETS.values():
        for table, key in spec.values():
            if (table, key) not in strides:
                strides[(table, key)] = (
                    con.execute(
                        f"SELECT max({key}) + 1 FROM"
                        f" '{src}/{table}.parquet'"
                    ).fetchone()[0]
                )

    for t in VERBATIM:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet')"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied verbatim", flush=True)

    for t, spec in OFFSETS.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for r in range(n):
            exprs = []
            for c in cols:
                if c in spec:
                    stride = strides[spec[c]]
                    # preserve the source column type (BIGINT keys)
                    exprs.append(f"CAST({c} + {r} * {stride} AS BIGINT) AS {c}")
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM '{src}/{t}.parquet'"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)})"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        rows = con.execute(
            f"SELECT count(*) FROM '{dst}/{t}.parquet'"
        ).fetchone()[0]
        print(t, rows, "rows", flush=True)


if __name__ == "__main__":
    main()
