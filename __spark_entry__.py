"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json). Backed by the registry in
``iceberg_classifier_spark.plans.registry``.

Caller contract for long-lived sessions: a few pair-scaled plans
(``itemitem_cosine_topk``, ``coverage_novelty_recs``,
``dedup_embedding_cosine``) ``persist(DISK_ONLY)``/``cache()``
intermediate frames that feed multiple subtrees, and a few others run a
small eager scalar job at plan-construction time (e.g. fetching a key
bound from column stats). A harness that executes many queries on one
SparkSession should call ``spark.catalog.clearCache()`` between queries —
as bench.py, scripts/sweep_runtimes.py and scripts/measure_warm.py do —
or disk blocks from those persists accumulate across queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from iceberg_classifier_spark.plans.registry import load_all_queries

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from iceberg_classifier_spark.plans.relational import q1_pricing_summary

    return q1_pricing_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in load_all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.oracle
        for name, qd in load_all_queries().items()
        if qd.oracle is not None
    }
