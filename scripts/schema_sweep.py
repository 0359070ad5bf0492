#!/usr/bin/env python3
"""Sweep every registered query's OUTPUT schema for columns the driver's
pandas-hashing correctness gate cannot hash (array/map/struct).

The round-1 driver failed three queries with `TypeError: unhashable type:
'list'` because their outputs carried array<> columns. This sweep builds
each plan (schema only, no execution — except fixture-staging ops, which
run their staging on first touch) and reports any non-scalar output column
on an oracle-carrying query.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql.types import ArrayType, MapType, StructType

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_classifier_spark.plans.registry import load_all_queries
os.environ.setdefault("SPARK_GRAFT_QUIET_LOGS", "1")
from iceberg_classifier_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("schema-sweep")
    bad = []
    errs = []
    for name, qd in sorted(load_all_queries().items()):
        try:
            schema = qd.fn(spark, sf_dir).schema
        except Exception as e:  # noqa: BLE001
            errs.append((name, repr(e)[:200]))
            continue
        nonscalar = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if nonscalar:
            bad.append((name, nonscalar, qd.oracle is not None))
    for name, cols, has_oracle in bad:
        print(f"NONSCALAR {'ORACLE' if has_oracle else 'rows-only'} {name}: {cols}")
    for name, e in errs:
        print(f"ERR {name}: {e}")
    if not bad and not errs:
        print("all outputs scalar")
    spark.stop()


if __name__ == "__main__":
    main()
