"""Query registry — single source of truth for the driver contract.

Each entry pairs a Spark DataFrame builder ``fn(spark, sf_dir) -> DataFrame``
with an optional DuckDB-runnable ANSI-SQL oracle string. ``__spark_entry__``
exposes these via ``queries()`` / ``oracle_sql()``. Output column names are
aliased identically on both sides (the driver sorts columns by name before
value-hashing); float outputs are rounded at the query edge so both engines
hash identically.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does a rows-only check
    headline: bool = False  # included in bench.py


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, headline: bool = False):
    """Decorator registering a query builder under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


def load_all_queries() -> dict[str, QueryDef]:
    """Import every query module (side-effect: fills REGISTRY)."""
    from iceberg_classifier_spark.plans import (  # noqa: F401
        relational,
        relational2,
        relational3,
        relational4,
        curation2,
        curation3,
        curation4,
        behavior,
        scaleops,
        vectors,
        vectors2,
        profiling,
        mlprep,
        stacking,
        textops,
        dedup,
        similarity,
        mlpipe,
        multimodal,
        streaming_q,
        advanced,
        advanced2,
        advanced3,
        analytics,
        analytics2,
        analytics3,
        analytics4,
        analytics5,
        analytics6,
        search,
        pipeline_ops,
        warehouse2,
        geo,
        pysource,
        modernapi,
        modernapi2,
        governance,
        warehouse4,
        textops3,
        modernapi3,
        curation5,
    )

    return REGISTRY
