"""Extended relational coverage: semi/anti joins, conditional aggregation,
rollup, pivot, exact quantiles, and an as-of join (an operator Spark lacks
natively, built from the union+window pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load


@query(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority AS orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY 1 ORDER BY 1
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style EXISTS as a left-semi join (no row duplication, the
    build side carries only the join keys)."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    sat = o.join(
        l,
        (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        sat.groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("orderpriority")
    )


@query(
    "q6_revenue_change",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 24
    """,
)
def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure scan-filter-agg; every predicate must reach the
    parquet reader (PushedFilters) — the canonical pushdown check."""
    l = load(spark, sf_dir, "lineitem")
    return l.where(
        (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.02, 0.09)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q12_shipmode_class",
    oracle="""
    SELECT l.l_returnflag AS returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1 ORDER BY 1
    """,
)
def q12_shipmode_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style conditional aggregation over a fact-fact join."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~is_high, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .orderBy("returnflag")
    )


@query(
    "customers_without_orders",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY custkey
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
        .orderBy("custkey")
    )


@query(
    "sales_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_extendedprice), 4) AS sum_price,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP totals (flag → flag×status → grand total) in one
    pass — Spark expands grouping sets map-side, still a single shuffle."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "sum_price",
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


@query(
    "events_pivot",
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type → columns. Values are enumerated explicitly so the
    pivot is a single-pass conditional agg (no extra distinct-values job)."""
    ev = load(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .select(
            "user_bucket", *[F.col(t).cast("bigint").alias(t) for t in types]
        )
        .orderBy("user_bucket")
    )


@query(
    "events_quantiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6)  AS p50,
           round(quantile_cont(value, 0.9), 6)  AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group. At 100 TB swap
    F.percentile for approx_percentile (t-digest, mergeable) — kept exact
    here because the oracle is exact."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
            F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


@query(
    "asof_join_orders",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey AS last_orderkey, o.o_orderdate AS last_orderdate
    FROM events e
    ASOF LEFT JOIN orders o
      ON o.o_custkey = e.user_id % 150 + 1 AND o.o_orderdate <= e.ts
    ORDER BY e.event_id
    """,
)
def asof_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (latest order at or before each event) — an operator Spark
    lacks natively, composed from the union+window pattern: tag both streams,
    union on the key/time axis, forward-fill the last order attributes, keep
    event rows. ONE shuffle on (key), no range explosion — the standard
    scalable as-of (what DuckDB's ASOF JOIN does natively, which is the
    oracle here).

    Ties: orders sort before events at the same instant (o_orderdate <= ts
    inclusive); among equal o_orderdate the highest o_orderkey wins,
    matching DuckDB's last-written-wins on its sort.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        (F.col("user_id") % 150 + 1).alias("k"),
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey"),
        F.col("o_orderdate"),
    )
    tagged = ev.select(
        "k",
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
    ).unionByName(
        o.select(
            "k",
            F.col("o_orderdate").alias("t"),
            F.lit(0).alias("is_event"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("long").alias("user_id"),
            F.lit(None).cast("timestamp").alias("ts"),
            "o_orderkey",
            "o_orderdate",
        )
    )
    # orders first at equal t (is_event asc); later orderkey wins ties
    w = Window.partitionBy("k").orderBy(
        "t", "is_event", F.col("o_orderkey").asc_nulls_last()
    ).rowsBetween(Window.unboundedPreceding, 0)
    filled = tagged.select(
        "is_event",
        "event_id",
        "user_id",
        "ts",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("last_orderkey"),
        F.last("o_orderdate", ignorenulls=True).over(w).alias("last_orderdate"),
    )
    return (
        filled.where(F.col("is_event") == 1)
        .select("event_id", "user_id", "ts", "last_orderkey", "last_orderdate")
        .orderBy("event_id")
    )
