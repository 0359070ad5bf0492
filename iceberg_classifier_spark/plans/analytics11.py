"""Analytics wave 11: empirical-Bayes rate shrinkage and Mahalanobis
outliers.

EB shrinkage is the fix for every "top performers" leaderboard ranked
by raw rates — small-sample flukes dominate until each entity's rate is
shrunk toward a Beta prior fit from the population (the
batting-average construction). Mahalanobis distance is the
multivariate outlier score that respects correlation — a point can be
unremarkable on each axis and still be wildly anomalous jointly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_EB_TOPK = 15


@query(
    "eb_shrunken_rates",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey AS cust,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END) AS BIGINT) AS k
      FROM orders GROUP BY 1
    ), rates AS (
      SELECT cust, n, k, CAST(k AS DOUBLE) / n AS p FROM per_cust
    ), mom AS (
      SELECT
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list(p ORDER BY cust)), (a, v) -> a + v)
          / count(*) AS mu,
        (list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list(p * p ORDER BY cust)), (a, v) -> a + v)
         - list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(p ORDER BY cust)), (a, v) -> a + v)
           * list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(p ORDER BY cust)), (a, v) -> a + v) / count(*))
          / (count(*) - 1) AS v
      FROM rates
    ), prior AS (
      SELECT mu, v,
             mu * (mu * (1 - mu) / v - 1) AS alpha0,
             (1 - mu) * (mu * (1 - mu) / v - 1) AS beta0
      FROM mom
    ), shrunk AS (
      SELECT r.cust, r.n, r.k,
             CAST(r.k * 1000000 // r.n AS BIGINT) AS raw_ppm,
             (r.k + p.alpha0) / (r.n + p.alpha0 + p.beta0) AS sp,
             p.alpha0, p.beta0
      FROM rates r CROSS JOIN prior p
    ), top AS (
      SELECT * FROM shrunk ORDER BY sp DESC, cust LIMIT {_EB_TOPK}
    )
    SELECT CAST(row_number() OVER (ORDER BY sp DESC, cust) AS INTEGER)
             AS rank,
           cust, n, k, raw_ppm,
           round(sp, 6) AS shrunk_rate,
           round(alpha0, 6) AS alpha0, round(beta0, 6) AS beta0
    FROM top ORDER BY rank
    """,
)
def eb_shrunken_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrunken urgent-order rates: fit a Beta(α₀, β₀)
    prior to the population of per-customer rates by method of moments
    (α₀ = μ(μ(1−μ)/v − 1), the batting-average construction), then
    rank customers by the shrunken posterior mean (k+α₀)/(n+α₀+β₀) —
    the leaderboard that stops a 2-for-2 customer outranking a
    40-for-60 one, which ranking by raw_ppm (also shown) does. The
    population moments sum per-customer rates in a cust-SORTED ordered
    fold; the prior and posteriors are identical double expressions
    over exact (k, n) integers.

    Scale: one map-side-combined per-customer aggregate; the moment
    fold runs over the customer dimension (two-level bucketed beyond
    array scale — or exact integer moments via Σk/Σn and Σ(k/n)²
    partials); the prior is a 1-row broadcast into the scoring pass.
    Top-k is TakeOrdered.
    """
    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("k"),
        )
    )
    rates = per_cust.select(
        "cust", "n", "k", (F.col("k").cast("double") / F.col("n")).alias("p")
    )
    sum_p = F.expr(
        """
        aggregate(transform(array_sort(collect_list(struct(cust, p))),
                  s -> s.p), CAST(0.0 AS DOUBLE), (a, v) -> a + v)
        """
    )
    sum_pp = F.expr(
        """
        aggregate(transform(array_sort(collect_list(struct(cust, p))),
                  s -> s.p * s.p), CAST(0.0 AS DOUBLE), (a, v) -> a + v)
        """
    )
    mom = rates.agg(
        (sum_p / F.count(F.lit(1))).alias("mu"),
        (
            (sum_pp - sum_p * sum_p / F.count(F.lit(1)))
            / (F.count(F.lit(1)) - 1)
        ).alias("v"),
    )
    prior = mom.select(
        (
            F.col("mu")
            * (F.col("mu") * (1 - F.col("mu")) / F.col("v") - 1)
        ).alias("alpha0"),
        (
            (1 - F.col("mu"))
            * (F.col("mu") * (1 - F.col("mu")) / F.col("v") - 1)
        ).alias("beta0"),
    )
    shrunk = rates.crossJoin(F.broadcast(prior)).select(
        "cust",
        "n",
        "k",
        F.expr("CAST(k * 1000000 div n AS BIGINT)").alias("raw_ppm"),
        (
            (F.col("k") + F.col("alpha0"))
            / (F.col("n") + F.col("alpha0") + F.col("beta0"))
        ).alias("sp"),
        "alpha0",
        "beta0",
    )
    top = shrunk.orderBy(F.desc("sp"), "cust").limit(_EB_TOPK)
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("sp"), "cust"))
        .cast("int")
        .alias("rank"),
        "cust",
        "n",
        "k",
        "raw_ppm",
        F.round("sp", 6).alias("shrunk_rate"),
        F.round("alpha0", 6).alias("alpha0"),
        F.round("beta0", 6).alias("beta0"),
    ).orderBy("rank")


_MAHA_TOPK = 15


@query(
    "mahalanobis_outliers_2d",
    oracle=f"""
    WITH q AS (
      SELECT l_orderkey, l_linenumber,
             CAST(round(l_quantity) AS BIGINT) AS x,
             CAST(round(l_extendedprice) AS BIGINT) AS y
      FROM lineitem
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n1,
             CAST(CAST(sum(x) AS BIGINT) AS DOUBLE) AS sx,
             CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy,
             CAST(CAST(sum(x * x) AS BIGINT) AS DOUBLE) AS sxx,
             CAST(CAST(sum(x * y) AS BIGINT) AS DOUBLE) AS sxy,
             CAST(CAST(sum(y * y) AS BIGINT) AS DOUBLE) AS syy
      FROM q
    ), cov AS (
      SELECT n1, sx / n1 AS mx, sy / n1 AS my,
             (sxx - sx * sx / n1) / (n1 - 1) AS cxx,
             (sxy - sx * sy / n1) / (n1 - 1) AS cxy,
             (syy - sy * sy / n1) / (n1 - 1) AS cyy
      FROM stats
    ), scored AS (
      SELECT q.l_orderkey, q.l_linenumber, q.x, q.y,
             ((q.x - c.mx) * (q.x - c.mx) * c.cyy
              - 2 * (q.x - c.mx) * (q.y - c.my) * c.cxy
              + (q.y - c.my) * (q.y - c.my) * c.cxx)
             / (c.cxx * c.cyy - c.cxy * c.cxy) AS d2
      FROM q CROSS JOIN cov c
    ), top AS (
      SELECT * FROM scored
      ORDER BY d2 DESC, l_orderkey, l_linenumber LIMIT {_MAHA_TOPK}
    )
    SELECT CAST(row_number() OVER (ORDER BY d2 DESC, l_orderkey,
                                   l_linenumber) AS INTEGER) AS rank,
           l_orderkey, l_linenumber, x AS quantity, y AS price_dollars,
           round(d2, 6) AS mahalanobis_d2
    FROM top ORDER BY rank
    """,
)
def mahalanobis_outliers_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mahalanobis-distance outliers over (quantity, price): the
    top-{_MAHA_TOPK} line items by squared Mahalanobis distance under
    the closed-form 2×2 covariance inverse — the multivariate outlier
    score that catches points unremarkable on each axis but anomalous
    JOINTLY (high quantity at a low price), which per-column z-scores
    (events_mad_outliers) structurally miss. Sufficient statistics are
    exact dollar-quantized int64s; distances are identical double
    expressions, ranked with exact key tiebreaks.

    Scale: one stats pass (map-side combined) + a broadcast of the
    1-row covariance into a map-only scoring pass; top-k is a
    TakeOrdered merge. p dimensions swap the closed-form inverse for
    the p×p solve on the driver (embedding_cov_matrix's layout) —
    scoring stays map-only.
    """
    q = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity").cast("bigint").alias("x"),
        F.round("l_extendedprice").cast("bigint").alias("y"),
    )
    stats = q.agg(
        F.count(F.lit(1)).cast("double").alias("n1"),
        F.sum("x").cast("bigint").cast("double").alias("sx"),
        F.sum("y").cast("bigint").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").cast("double").alias("syy"),
    )
    cov = stats.select(
        (F.col("sx") / F.col("n1")).alias("mx"),
        (F.col("sy") / F.col("n1")).alias("my"),
        ((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n1")) / (F.col("n1") - 1)).alias("cxx"),
        ((F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n1")) / (F.col("n1") - 1)).alias("cxy"),
        ((F.col("syy") - F.col("sy") * F.col("sy") / F.col("n1")) / (F.col("n1") - 1)).alias("cyy"),
    )
    dx = F.col("x") - F.col("mx")
    dy = F.col("y") - F.col("my")
    d2 = (
        dx * dx * F.col("cyy") - 2 * dx * dy * F.col("cxy") + dy * dy * F.col("cxx")
    ) / (F.col("cxx") * F.col("cyy") - F.col("cxy") * F.col("cxy"))
    scored = q.crossJoin(F.broadcast(cov)).select(
        "l_orderkey", "l_linenumber", "x", "y", d2.alias("d2")
    )
    top = scored.orderBy(
        F.desc("d2"), "l_orderkey", "l_linenumber"
    ).limit(_MAHA_TOPK)
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("d2"), "l_orderkey", "l_linenumber"))
        .cast("int")
        .alias("rank"),
        "l_orderkey",
        "l_linenumber",
        F.col("x").alias("quantity"),
        F.col("y").alias("price_dollars"),
        F.round("d2", 6).alias("mahalanobis_d2"),
    ).orderBy("rank")
