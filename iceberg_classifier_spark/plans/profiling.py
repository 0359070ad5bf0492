"""Data-profiling operators: trend regression, histograms, and a column
profiler — the observability layer a 100 TB ingest pipeline runs before
and after every curation stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_EPOCH0 = 1_704_067_200  # 2024-01-01 UTC — centers x so regr math is stable


@query(
    "events_trend",
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(xd) AS DOUBLE) AS sx,
             CAST(sum(yc) AS DOUBLE) AS sy,
             CAST(sum(xd * yc) AS DOUBLE) AS sxy,
             CAST(sum(xd * xd) AS DOUBLE) AS sxx,
             CAST(sum(yc * yc) AS DOUBLE) AS syy
      FROM (SELECT event_type,
                   CAST(floor((epoch(ts) - {_EPOCH0}) / 86400.0) AS BIGINT)
                     AS xd,
                   CAST(round(value * 100) AS BIGINT) AS yc
            FROM events)
      GROUP BY event_type
    )
    SELECT event_type, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0, 6)
             AS slope_per_day,
           round(sy / 100.0 / n
                 - (n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0
                   * (sx / n), 6) AS intercept,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r
    FROM s ORDER BY event_type
    """,
)
def events_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series least-squares trend (slope/intercept/correlation of value
    against days-since-2024-01-01) — drift detection over time-series
    without a window sort.

    Scale: the five moment sums are one-pass mergeable aggregates
    (map-side partials), so the trend of a 100 TB series costs one shuffle
    of |groups| rows — same plan shape as the built-in regr_* aggregates.
    Those built-ins differ from DuckDB's by summation-order float noise
    (~1e-5 on the intercept), so instead the sums are taken over EXACT
    integers (whole days × value-in-cents: both exactly representable),
    making every partial sum order-independent; the slope/intercept/corr
    formulas are then evaluated with an identical IEEE double expression
    tree on both engines, which makes the 6dp-rounded outputs bit-exact.
    """
    e = load(spark, sf_dir, "events")
    xd = F.floor((F.unix_timestamp("ts") - F.lit(_EPOCH0)) / 86400.0).cast("bigint")
    yc = F.round(F.col("value") * 100).cast("bigint")
    s = (
        e.select(F.col("event_type"), xd.alias("xd"), yc.alias("yc"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("xd").cast("double").alias("sx"),
            F.sum("yc").cast("double").alias("sy"),
            F.sum(F.col("xd") * F.col("yc")).cast("double").alias("sxy"),
            F.sum(F.col("xd") * F.col("xd")).cast("double").alias("sxx"),
            F.sum(F.col("yc") * F.col("yc")).cast("double").alias("syy"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0
    return s.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope_per_day"),
        F.round(sy / 100.0 / n - slope * (sx / n), 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r"),
    ).orderBy("event_type")


_BIN_W = 50.0  # events.value spans ~[0, 490]


@query(
    "events_histogram",
    oracle=f"""
    SELECT event_type,
           CAST(least(floor(value / {_BIN_W}), 9) AS BIGINT) AS bin,
           round(least(floor(value / {_BIN_W}), 9) * {_BIN_W}, 2) AS bin_lo,
           count(*) AS n,
           round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY event_type),
                 6) AS frac
    FROM events
    GROUP BY 1, 2, 3 ORDER BY event_type, bin
    """,
)
def events_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per series (10 bins of 50, top bin
    open-ended) with within-series fractions — the distribution profile
    stage of a pipeline health check.

    Scale: binning is a per-row floor, the count shuffles |series|×|bins|
    partial sums, and the fraction is a window over that already-tiny
    frame. Bin edges are computed with identical double ops on both
    engines (2-decimal inputs / exact-power-of-two-friendly width), so
    assignment can't straddle engines.
    """
    e = load(spark, sf_dir, "events")
    bin_ = F.least(F.floor(F.col("value") / _BIN_W), F.lit(9)).cast("bigint")
    from pyspark.sql import Window

    w = Window.partitionBy("event_type")
    return (
        e.groupBy("event_type", bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bin_lo", F.round(F.col("bin") * _BIN_W, 2))
        .withColumn("frac", F.round(F.col("n") / F.sum("n").over(w), 6))
        .select("event_type", "bin", "bin_lo", "n", "frac")
        .orderBy("event_type", "bin")
    )


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "o_orderpriority"]


@query(
    "profile_orders",
    oracle="""
    SELECT 'o_orderkey' AS col, count(*) AS n,
           count(*) - count(o_orderkey) AS n_null,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_s,
           CAST(max(o_orderkey) AS VARCHAR) AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           CAST(CAST(round(min(o_totalprice), 2) AS DECIMAL(18, 2)) AS VARCHAR),
           CAST(CAST(round(max(o_totalprice), 2) AS DECIMAL(18, 2)) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority), min(o_orderpriority),
           max(o_orderpriority)
    FROM orders
    ORDER BY col
    """,
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler over ``orders``: row/null/distinct counts and
    min/max per column in long format — the schema-drift and data-quality
    report each pipeline stage emits.

    Scale: ALL columns profile in a SINGLE scan — one aggregate computes
    every per-column statistic at once (the literal UNION-ALL oracle scans
    the table once per column), then a stack() unpivots the 1-row wide
    result into the long report. count(DISTINCT) over multiple columns in
    one agg expands via Spark's internal grouping-sets rewrite; swap to
    approx_count_distinct sketches when exactness isn't required.
    Numerics are stringified via DECIMAL(18,2) so both engines format
    identically.
    """
    o = load(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        col = F.col(c)
        if c == "o_totalprice":
            mn = F.round(F.min(col), 2).cast("decimal(18,2)").cast("string")
            mx = F.round(F.max(col), 2).cast("decimal(18,2)").cast("string")
        else:
            mn = F.min(col).cast("string")
            mx = F.max(col).cast("string")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(col)).alias(f"{c}__n_null"),
            F.count_distinct(col).alias(f"{c}__n_distinct"),
            mn.alias(f"{c}__min_s"),
            mx.alias(f"{c}__max_s"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__n_null, {c}__n_distinct, {c}__min_s, {c}__max_s"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args})"
        " as (col, n, n_null, n_distinct, min_s, max_s)"
    ).orderBy("col")
