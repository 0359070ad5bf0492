"""TPC-H-adapted deep relational coverage (Q7/Q9/Q10/Q13/Q14/Q15/Q17/Q18/
Q19/Q22 analogues on the testdata star schema) plus grouped top-k, grouped
correlation stats, a bucketed range join, CUBE grouping sets, JSON
extraction, and corpus-wide token top-k.

Scale notes (100 TB): every fact-fact join shuffles on its equi-key and
lets AQE pick broadcast for the dim side; correlated-subquery patterns are
rewritten as agg-then-join (the aggregate side is tiny → broadcast); the
range join is bucketed by day so candidate pairs come from an equi-join,
never a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load


@query(
    "q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE n1.n_name < n2.n_name
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style shipping volume between nation pairs by year.

    Two fact-fact shuffles (lineitem⋈orders on orderkey, then ⋈customer on
    custkey); supplier and both nation copies are broadcast so the nation
    attribution adds zero shuffles.
    """
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .where(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "o_year")
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - 0.6 * p.p_retailprice * l.l_quantity), 4) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'PROMO'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style profit by supplier nation × year (supply cost modeled
    as 60% of retail price; the testdata has no partsupp table).

    The p_type filter prunes part BEFORE the join (pushed to the parquet
    scan), shrinking the lineitem⋈part probe; part/supplier/nation are
    broadcast, leaving one shuffle join (lineitem⋈orders).
    """
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
                ),
                4,
            ).alias("profit")
        )
        .orderBy("nation", "o_year")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2, 4
    ORDER BY revenue DESC, custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top 20 customers by revenue lost to returns in a
    year. Both filters (returnflag on lineitem, date range on orders) are
    pushed to the scans; the custkey tiebreaker makes LIMIT deterministic."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("custkey", "name", "revenue", "nation")
        .orderBy(F.col("revenue").desc(), "custkey")
        .limit(20)
    )


@query(
    "q13_order_count_dist",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1
    ) GROUP BY 1 ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style distribution of orders-per-customer (zeros included
    via left join). Two aggregations; the second input is |customers| rows
    pre-shrunk by the first, so only the first shuffle is sized by data."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo revenue share: date-pruned scan, broadcast
    part join, single conditional aggregate (no shuffle beyond the final
    1-row reduce)."""
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_pct")
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS name, r.total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier by quarterly revenue. The max-revenue
    correlated subquery becomes a single-partition window max over the
    already-aggregated (tiny, |suppliers|-row) frame — no second scan of
    lineitem, unlike the literal SQL."""
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    rev = l.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    w = Window.partitionBy()  # global max over |suppliers| rows — cheap
    return (
        rev.withColumn("max_rev", F.max("total_revenue").over(w))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("suppkey") == s.s_suppkey)
        .select("suppkey", F.col("s_name").alias("name"), "total_revenue")
        .orderBy("suppkey")
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, 0.5 * avg(l_quantity) AS qty_cut
          FROM lineitem GROUP BY 1) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND l.l_quantity < a.qty_cut
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style small-quantity-order revenue. The per-part avg(qty)
    correlated subquery is rewritten as agg-then-join; the aggregate side is
    |parts| rows → broadcast, so the probe of lineitem never shuffles."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    cut = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(cut), l.l_partkey == F.col("a_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c.c_name AS name, c.c_custkey AS custkey, o.o_orderkey AS orderkey,
           o.o_orderdate AS orderdate, o.o_totalprice AS totalprice,
           round(sum(l.l_quantity), 4) AS sum_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250
    )
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY totalprice DESC, orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume orders. The HAVING subquery becomes a
    left-semi join against the per-order qty aggregate; at scale the semi
    side is already shrunk by the HAVING filter before it ships."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > 250)
        .select("l_orderkey")
    )
    return (
        l.join(big.withColumnRenamed("l_orderkey", "b_orderkey"),
               F.col("l_orderkey") == F.col("b_orderkey"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .orderBy(F.col("totalprice").desc(), "orderkey")
        .limit(100)
    )


@query(
    "q19_disjunctive_pred",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           count(*) AS n_rows
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive join predicate. The part-only disjunct
    (brand ∈ {12,23,34}) is factored out so it prunes the broadcast build
    side before the join instead of running per joined row."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q22_idle_customers",
    oracle="""
    WITH pos AS (SELECT avg(c_acctbal) AS cut FROM customer WHERE c_acctbal > 0)
    SELECT n.n_name AS nation, count(*) AS numcust,
           round(sum(c.c_acctbal), 4) AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT cut FROM pos)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY 1 ORDER BY 1
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: wealthy customers with no recent (2000+) orders, by
    nation. The scalar avg subquery is computed once and cross-broadcast
    (1 row); the NOT EXISTS is a left-anti join on custkey whose build side
    is pre-shrunk by the pushed date filter."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    n = load(spark, sf_dir, "nation")
    cut = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("cut"))
    return (
        c.join(F.broadcast(cut))
        .where(F.col("c_acctbal") > F.col("cut"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
        .orderBy("nation")
    )


@query(
    "grouped_topk_parts",
    oracle="""
    SELECT brand, partkey, revenue, rk FROM (
      SELECT p.p_brand AS brand, p.p_partkey AS partkey,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
             CAST(row_number() OVER (
               PARTITION BY p.p_brand
               ORDER BY round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                        DESC, p.p_partkey) AS INT) AS rk
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ) WHERE rk <= 3 ORDER BY brand, rk
    """,
)
def grouped_topk_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by revenue within each brand: aggregate first (shrinks to
    |parts| rows), then one window shuffle on brand. partkey tiebreak makes
    row_number deterministic."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    per_part = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_partkey").alias("partkey"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("brand").orderBy(F.col("revenue").desc(), "partkey")
    return (
        per_part.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= 3)
        .orderBy("brand", "rk")
    )


@query(
    "segment_corr_stats",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           round(corr(o.o_totalprice, c.c_acctbal), 6) AS price_bal_corr,
           round(covar_samp(o.o_totalprice, c.c_acctbal), 4) AS price_bal_covar,
           round(stddev_samp(o.o_totalprice), 4) AS price_sd,
           count(*) AS n
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1 ORDER BY 1
    """,
)
def segment_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped second-moment statistics (Pearson corr, sample covariance,
    stddev) — all single-pass mergeable aggregates, map-side combinable."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.round(F.corr("o_totalprice", "c_acctbal"), 6).alias("price_bal_corr"),
            F.round(F.covar_samp("o_totalprice", "c_acctbal"), 4).alias(
                "price_bal_covar"
            ),
            F.round(F.stddev_samp("o_totalprice"), 4).alias("price_sd"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("segment")
    )


@query(
    "events_cube_daily",
    oracle="""
    SELECT coalesce(event_type, 'ALL') AS etype,
           coalesce(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS day,
           count(*) AS n, round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY CUBE (event_type, CAST(ts AS DATE))
    ORDER BY etype, day
    """,
)
def events_cube_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day): all four grouping sets in one shuffle
    (Spark expands grouping sets map-side with a grouping-id column)."""
    ev = load(spark, sf_dir, "events").withColumn(
        "day_d", F.col("ts").cast("date")
    )
    return (
        ev.cube("event_type", "day_d")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("etype"),
            F.coalesce(F.col("day_d").cast("string"), F.lit("ALL")).alias("day"),
            "n",
            "sum_value",
        )
        .orderBy("etype", "day")
    )


@query(
    "events_json_extract",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
           count(*) AS n
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON props column → typed field → agg.
    get_json_object runs JVM-side inside codegen (no Python)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k_bucket")
    )


@query(
    "range_join_events",
    oracle="""
    SELECT a.event_id AS event_id, b.event_id AS next_event_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 60 MINUTE
    ORDER BY event_id, next_event_id
    """,
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range self-join: pairs of same-user events within a 60-minute
    follow window. Executed as a pure equi-join: left events explode to
    the (at most two) 1-hour epoch buckets their window can land in, right
    events compute their single bucket, and the join key is
    (user_id, bucket) — candidate pairs are bounded by bucket occupancy,
    never a per-key cross product. The residual range predicate filters
    exactly. At 100 TB this is the standard interval-bucketing range join:
    shuffle scales with |events|·(window/bucket + 1), tunable via bucket
    width."""
    window_s = 60 * 60
    bucket_s = window_s  # bucket = window width → left explodes to ≤2 buckets
    ev = load(spark, sf_dir, "events")
    left = ev.select(
        F.col("event_id").alias("event_id"),
        F.col("user_id").alias("k"),
        F.col("ts").alias("a_ts"),
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("ts") / bucket_s),
                F.floor((F.unix_timestamp("ts") + window_s) / bucket_s),
            )
        ).alias("b"),
    )
    right = ev.select(
        F.col("event_id").alias("next_event_id"),
        F.col("user_id").alias("k"),
        F.col("ts").alias("b_ts"),
        F.floor(F.unix_timestamp("ts") / bucket_s).alias("b"),
    )
    return (
        left.join(right, ["k", "b"])
        .where(
            (F.col("b_ts") > F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 60 MINUTES"))
        )
        .select("event_id", "next_event_id")
        .orderBy("event_id", "next_event_id")
    )


@query(
    "doc_token_topk",
    oracle="""
    SELECT token, n FROM (
      SELECT token, count(*) AS n
      FROM (
        SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
        FROM documents
      ) WHERE token <> ''
      GROUP BY 1
    ) ORDER BY n DESC, token LIMIT 25
    """,
)
def doc_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-25 tokens. explode→groupBy is map-side combinable, so
    the shuffle carries |vocab| partial counts, not |tokens| rows."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("token")
        )
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(25)
    )


@query(
    "salted_agg",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage aggregation: stage 1 groups on
    (key, salt=hash(row)%16) so a hot key spreads over 16 reducers; stage 2
    merges the 16 partials per key. Same answer as a plain GROUP BY (the
    oracle), but the shuffle for any single key is bounded by 1/16 of its
    rows — the manual form of what AQE's skew handling does for joins,
    needed when one key dominates a 100 TB aggregation. (Here sums are also
    algebraic so map-side combine already bounds skew; the pattern matters
    for holistic aggregates — collect_list/percentile — that cannot
    partially combine.)"""
    ev = load(spark, sf_dir, "events")
    partial = (
        ev.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(16)))
        .groupBy("event_type", "salt")
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("value").alias("psum"))
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.round(F.sum("psum"), 4).alias("sum_value"),
        )
        .orderBy("event_type")
    )


@query(
    "bucketed_join",
    oracle="""
    SELECT c.c_mktsegment AS segment, count(*) AS n_orders,
           round(sum(o.o_totalprice), 4) AS total_price
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1 ORDER BY 1
    """,
)
def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-pruned co-located join: orders and customer are materialized
    as tables bucketed (and sorted) on the join key with the same bucket
    count, so the sort-merge join needs NO shuffle on either side — the
    scan is already hash-distributed by custkey. This is the 100 TB answer
    to repeated fact⋈dim joins on a stable key: pay one bucketed write,
    then every subsequent join is exchange-free (ShuffledHashJoin/SMJ reads
    buckets aligned 1:1).

    The merge hint pins SMJ so the demo shows the exchange-free plan even
    where AQE would pick broadcast at test scale.
    """
    import os

    from iceberg_classifier_spark.sources.tables import table_path

    # table identity carries the source fingerprint: regenerated testdata
    # gets fresh bucketed tables, repeat runs on the same data skip the
    # two bucketed writes entirely
    src = os.stat(table_path(sf_dir, "orders"))
    tag = (
        f"{os.path.basename(os.path.normpath(sf_dir)).replace('.', '_')}"
        f"_{src.st_mtime_ns:x}_{src.st_size:x}"
    )
    tbl_o, tbl_c = f"orders_bkt_{tag}", f"customer_bkt_{tag}"
    base = f"/tmp/spark_graft_warehouse/bucketed_{tag}"
    if not (spark.catalog.tableExists(tbl_o) and spark.catalog.tableExists(tbl_c)):
        (
            load(spark, sf_dir, "orders")
            .write.bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .mode("overwrite")
            .option("path", f"{base}/orders")
            .saveAsTable(tbl_o)
        )
        (
            load(spark, sf_dir, "customer")
            .write.bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .mode("overwrite")
            .option("path", f"{base}/customer")
            .saveAsTable(tbl_c)
        )
    o = spark.table(tbl_o).hint("merge")
    c = spark.table(tbl_c)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
        .orderBy("segment")
    )


@query(
    "q8_market_share",
    oracle="""
    WITH rev AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             n2.n_name AS supp_nation,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'CHINA' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM rev GROUP BY 1 ORDER BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style national market share: one nation's slice of PROMO
    part revenue sold into ASIA, by year. Customer-side nation/region and
    supplier-side nation are all broadcast (two aliases of nation again);
    the only data-sized shuffles are lineitem⋈orders and ⋈customer."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey"))
    n2 = n.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == r.r_regionkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.col("supp_nation"),
            vol.alias("volume"),
        )
    )
    return (
        rev.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "CHINA", F.col("volume")).otherwise(
                        0.0
                    )
                )
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "customer_value_ntile",
    oracle="""
    SELECT n.n_name AS nation, c.c_custkey AS custkey,
           round(c.c_acctbal, 4) AS acctbal,
           CAST(ntile(4) OVER (PARTITION BY n.n_name
                               ORDER BY c.c_acctbal DESC, c.c_custkey) AS INT)
             AS value_quartile
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    ORDER BY nation, value_quartile, custkey
    """,
)
def customer_value_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation customer value quartiles (ntile window). One shuffle on
    the partition key; custkey tiebreak makes bucket assignment
    deterministic across engines."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_custkey").alias("custkey"),
            F.round("c_acctbal", 4).alias("acctbal"),
            F.ntile(4).over(w).cast("int").alias("value_quartile"),
        )
        .orderBy("nation", "value_quartile", "custkey")
    )


@query(
    "events_grouping_sets",
    oracle="""
    SELECT coalesce(event_type, 'ALL') AS etype,
           coalesce(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS day,
           CAST(grouping(event_type) * 2 + grouping(CAST(ts AS DATE))
                AS INTEGER) AS gid,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
    ORDER BY gid, etype, day
    """,
)
def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the third member of the grouping-set
    family beside sales_rollup (ROLLUP) and events_cube_daily (CUBE):
    exactly the (type), (day), and grand-total groupings in ONE pass with
    grouping() disambiguating the NULL-vs-'ALL' cells (the canonical
    dashboard query that would otherwise be three scans unioned).

    Scale: Spark expands grouping sets map-side (one scan, one Expand +
    combinable aggregate) — the shuffle carries |sets| × |groups| rows,
    never three scans.
    """
    e = load(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT coalesce(event_type, 'ALL') AS etype,
               coalesce(CAST(CAST(ts AS DATE) AS STRING), 'ALL') AS day,
               CAST(grouping(event_type) * 2 + grouping(CAST(ts AS DATE))
                    AS INT) AS gid,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM {e}
        GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
        ORDER BY gid, etype, day
        """,
        e=e,
    )
