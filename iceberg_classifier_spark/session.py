"""SparkSession factory tuned for the target workload.

Local testing runs on ``local[N]``; the same conf holds on a real cluster —
AQE handles runtime re-planning (skew joins, partition coalescing), Arrow
keeps the few Pandas-UDF paths batch-vectorized, and shuffle partitions are
sized for the local SF (a cluster deployment would raise them or rely on
AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def get_spark(app_name: str = "iceberg-classifier-spark") -> SparkSession:
    # Python workers resolve closure references to this package by module
    # name (cloudpickle pickles module functions by reference), so the repo
    # root must be importable in the worker regardless of the driver's cwd.
    pp = os.environ.get("PYTHONPATH", "")
    if _REPO_ROOT not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = _REPO_ROOT + (os.pathsep + pp if pp else "")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # parity sweeps collect whole query outputs for the oracle
        # compare; at the sf10 decade the widest exploded frames
        # (channel_stack: 320 rows/vec = 64M rows) pass 1 GiB serialized
        # — a harness collect, not a query plan, so size the cap to the
        # decade instead of skipping the value check
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_GRAFT_MAX_RESULT", "4g"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.ts is TIMESTAMP(NANOS); Spark reads it as long ns
        # with this flag and sources/tables.py casts back to a µs timestamp.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # bucketed-table demos persist outside the repo regardless of cwd
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
        .config(
            "javax.jdo.option.ConnectionURL",
            "jdbc:derby:;databaseName=/tmp/spark_graft_metastore;create=true",
        )
    )
    spark = builder.getOrCreate()
    if os.environ.get("SPARK_GRAFT_QUIET_LOGS", "") == "1":
        _quiet_audited_window_warnings(spark)
    return spark


def _quiet_audited_window_warnings(spark: SparkSession) -> None:
    """Raise org.apache.spark.sql.execution.window to ERROR.

    Every ``WindowExec: No Partition Defined`` warning in this repo comes
    from the 124 bounded-frame windows audited in
    tests/test_plan_guards.py's UNPARTITIONED_WINDOW_ALLOWLIST (the guard
    enforces that no query OUTSIDE the allowlist introduces one), so the
    warning carries no signal here and ~400 repetitions were burying the
    bench's single JSON metric line.

    Gated behind ``SPARK_GRAFT_QUIET_LOGS=1`` — the repo's own entry
    points (bench.py, scripts/sweep_*, tests) set it; a library user
    calling ``get_spark()`` keeps stock Spark logging, so THEIR
    accidental single-partition windows and double-caches still warn
    (round-6 advice).
    """
    try:
        jvm = spark._jvm
        for logger in (
            "org.apache.spark.sql.execution.window",
            # "Asked to cache already cached data": several plans cache a
            # frame that multiple registered branches re-request — benign
            # by construction and audited like the window allowlist
            "org.apache.spark.sql.execution.CacheManager",
        ):
            jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
                logger, jvm.org.apache.logging.log4j.Level.ERROR
            )
    except Exception:  # noqa: BLE001 — logging tweak must never break startup
        pass
