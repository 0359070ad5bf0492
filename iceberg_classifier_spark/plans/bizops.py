"""Business-analytics wave: metric driver trees, cohort LTV curves,
and inventory safety stock.

The driver tree decomposes a headline metric change into its
multiplicative drivers (volume vs value) — the "why did revenue move"
question every metrics platform answers first; cohort LTV curves are
the revenue companion to cohort_retention; safety stock / reorder
points are the operations-research staple that turns demand statistics
into stocking decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_DT_SPLIT = 15  # period A = days 1-15, period B = rest of month


@query(
    "metric_driver_tree",
    oracle=f"""
    WITH p AS (
      SELECT (CAST(day(ts) AS BIGINT) > {_DT_SPLIT}) AS period_b,
             user_id, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), agg AS (
      SELECT period_b,
             CAST(count(DISTINCT user_id) AS BIGINT) AS buyers,
             CAST(count(*) AS BIGINT) AS orders,
             CAST(sum(cents) AS BIGINT) AS rev
      FROM p GROUP BY 1
    ), w AS (
      SELECT
        max(CASE WHEN NOT period_b THEN buyers END) AS b_a,
        max(CASE WHEN period_b THEN buyers END) AS b_b,
        max(CASE WHEN NOT period_b THEN orders END) AS o_a,
        max(CASE WHEN period_b THEN orders END) AS o_b,
        max(CASE WHEN NOT period_b THEN rev END) AS r_a,
        max(CASE WHEN period_b THEN rev END) AS r_b
      FROM agg
    )
    SELECT r_a AS rev_a_cents, r_b AS rev_b_cents,
           r_b - r_a AS delta_cents,
           b_a AS buyers_a, b_b AS buyers_b,
           round((CAST(b_b AS DOUBLE) - b_a) * (CAST(o_a AS DOUBLE) / b_a)
                 * (CAST(r_a AS DOUBLE) / o_a) / 100, 6) AS buyers_effect,
           round(CAST(b_b AS DOUBLE)
                 * (CAST(o_b AS DOUBLE) / b_b - CAST(o_a AS DOUBLE) / b_a)
                 * (CAST(r_a AS DOUBLE) / o_a) / 100, 6) AS freq_effect,
           round(CAST(b_b AS DOUBLE) * (CAST(o_b AS DOUBLE) / b_b)
                 * (CAST(r_b AS DOUBLE) / o_b - CAST(r_a AS DOUBLE) / o_a)
                 / 100, 6) AS aov_effect,
           (abs(((CAST(b_b AS DOUBLE) - b_a) * (CAST(o_a AS DOUBLE) / b_a)
                  * (CAST(r_a AS DOUBLE) / o_a)
                 + CAST(b_b AS DOUBLE)
                   * (CAST(o_b AS DOUBLE) / b_b - CAST(o_a AS DOUBLE) / b_a)
                   * (CAST(r_a AS DOUBLE) / o_a)
                 + CAST(b_b AS DOUBLE) * (CAST(o_b AS DOUBLE) / b_b)
                   * (CAST(r_b AS DOUBLE) / o_b - CAST(r_a AS DOUBLE) / o_a))
                - (r_b - r_a)) / 100 < 1e-6) AS decomposition_exact
    FROM w
    """,
)
def metric_driver_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric driver tree: decompose the period-over-period purchase
    revenue change through revenue = buyers × (orders/buyer) ×
    (revenue/order), attributing the delta to a buyers effect, a
    frequency effect, and an AOV effect via sequential substitution
    (each factor swapped A→B left to right — the telescoping scheme
    whose three terms sum EXACTLY to the total delta, asserted by
    decomposition_exact). This is the "why did the metric move"
    first-responder every analytics platform ships above
    mix_shift_decomposition (which splits by segment; this splits by
    driver). Cell inputs are exact int64 cents/counts; the effects are
    identical double expressions.

    Scale: one map-side-combined period aggregate (count-distinct
    buyers is the only shuffle-heavy input; swap for HLL at extreme
    cardinality as hll_union_setops shows); the tree evaluates on a
    1-row pivot.
    """
    p = load(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select(
        (F.dayofmonth("ts").cast("bigint") > _DT_SPLIT).alias("period_b"),
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    agg = p.groupBy("period_b").agg(
        F.count_distinct("user_id").cast("bigint").alias("buyers"),
        F.count(F.lit(1)).cast("bigint").alias("orders"),
        F.sum("cents").cast("bigint").alias("rev"),
    )

    def pick(b, c):
        return F.max(F.when(F.col("period_b") == b, F.col(c)))

    w = agg.agg(
        pick(False, "buyers").alias("b_a"),
        pick(True, "buyers").alias("b_b"),
        pick(False, "orders").alias("o_a"),
        pick(True, "orders").alias("o_b"),
        pick(False, "rev").alias("r_a"),
        pick(True, "rev").alias("r_b"),
    )
    fb_a = F.col("o_a").cast("double") / F.col("b_a")
    fb_b = F.col("o_b").cast("double") / F.col("b_b")
    aov_a = F.col("r_a").cast("double") / F.col("o_a")
    aov_b = F.col("r_b").cast("double") / F.col("o_b")
    buyers_eff = (F.col("b_b").cast("double") - F.col("b_a")) * fb_a * aov_a
    freq_eff = F.col("b_b").cast("double") * (fb_b - fb_a) * aov_a
    aov_eff = F.col("b_b").cast("double") * fb_b * (aov_b - aov_a)
    return w.select(
        F.col("r_a").alias("rev_a_cents"),
        F.col("r_b").alias("rev_b_cents"),
        (F.col("r_b") - F.col("r_a")).alias("delta_cents"),
        F.col("b_a").alias("buyers_a"),
        F.col("b_b").alias("buyers_b"),
        F.round(buyers_eff / 100, 6).alias("buyers_effect"),
        F.round(freq_eff / 100, 6).alias("freq_effect"),
        F.round(aov_eff / 100, 6).alias("aov_effect"),
        (
            F.abs(
                (buyers_eff + freq_eff + aov_eff)
                - (F.col("r_b") - F.col("r_a"))
            )
            / 100
            < 1e-6
        ).alias("decomposition_exact"),
    )


@query(
    "cohort_ltv_curves",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(min(day(ts)) AS BIGINT) AS d0
      FROM events GROUP BY 1
    ), spend AS (
      SELECT e.user_id, f.d0,
             CAST(day(e.ts) AS BIGINT) - f.d0 AS age,
             CAST(round(e.value * 100) AS BIGINT) AS cents
      FROM events e JOIN first_seen f USING (user_id)
      WHERE e.event_type = 'purchase'
    ), cohort_sz AS (
      SELECT (d0 - 1) // 7 AS cohort_week,
             CAST(count(*) AS BIGINT) AS n_users
      FROM first_seen GROUP BY 1
    ), cell AS (
      SELECT (s.d0 - 1) // 7 AS cohort_week, s.age // 7 AS age_week,
             CAST(sum(s.cents) AS BIGINT) AS rev
      FROM spend s GROUP BY 1, 2
    ), cum AS (
      SELECT c.cohort_week, c.age_week, c.rev,
             CAST(sum(c.rev) OVER (PARTITION BY c.cohort_week
                                   ORDER BY c.age_week) AS BIGINT) AS cum_rev
      FROM cell c
    )
    SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
           CAST(c.age_week AS BIGINT) AS age_week,
           z.n_users, c.rev AS rev_cents, c.cum_rev AS cum_rev_cents,
           CAST(c.cum_rev * 100 // z.n_users AS BIGINT)
             AS ltv_per_user_cents
    FROM cum c JOIN cohort_sz z USING (cohort_week)
    ORDER BY cohort_week, age_week
    """,
)
def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: users grouped into weekly acquisition cohorts
    by first-seen day; each cohort's purchase revenue accumulates over
    cohort age (weeks since acquisition) into the cumulative
    LTV-per-user curve — the revenue companion to cohort_retention and
    the table behind every payback-period decision ("week-3 LTV covers
    CAC?"). Revenue is exact cents, cumulative sums run per cohort over
    the bounded age dimension, LTV-per-user is exact integer
    (cents×100) division.

    Scale: first-seen is one map-side-combined min per user; the cohort
    × age cell grid is calendar-bounded; the cumulative window
    partitions by cohort over ≤|weeks| rows — no corpus-sized window
    anywhere.
    """
    e = load(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min(F.dayofmonth("ts")).cast("bigint").alias("d0")
    )
    spend = (
        e.where(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .select(
            F.expr("(d0 - 1) div 7").alias("cohort_week"),
            F.expr("(CAST(day(ts) AS BIGINT) - d0) div 7").alias("age_week"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    cohort_sz = first_seen.groupBy(
        F.expr("(d0 - 1) div 7").alias("cohort_week")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    cell = spend.groupBy("cohort_week", "age_week").agg(
        F.sum("cents").cast("bigint").alias("rev")
    )
    wcum = Window.partitionBy("cohort_week").orderBy("age_week")
    cum = cell.select(
        "cohort_week",
        "age_week",
        "rev",
        F.sum("rev").over(wcum).cast("bigint").alias("cum_rev"),
    )
    return (
        cum.join(F.broadcast(cohort_sz), "cohort_week")
        .select(
            F.col("cohort_week").cast("bigint").alias("cohort_week"),
            F.col("age_week").cast("bigint").alias("age_week"),
            "n_users",
            F.col("rev").alias("rev_cents"),
            F.col("cum_rev").alias("cum_rev_cents"),
            F.expr("CAST(cum_rev * 100 div n_users AS BIGINT)").alias(
                "ltv_per_user_cents"
            ),
        )
        .orderBy("cohort_week", "age_week")
    )


_SS_Z_X100 = 165  # z ≈ 1.65 (95% service level), stored as z*100
_SS_LEAD_DAYS = 7


@query(
    "safety_stock_reorder",
    oracle=f"""
    WITH daily AS (
      SELECT l_partkey, date_trunc('day', l_shipdate) AS day,
             CAST(round(sum(l_quantity)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ), horizon AS (
      SELECT CAST(datediff('day', min(day), max(day)) + 1 AS BIGINT)
               AS n_days
      FROM daily
    ), stats AS (
      SELECT d.l_partkey,
             CAST(CAST(sum(d.q) AS BIGINT) AS DOUBLE) AS s,
             CAST(CAST(sum(d.q * d.q) AS BIGINT) AS DOUBLE) AS ss,
             CAST(max(h.n_days) AS DOUBLE) AS n1,
             CAST(max(h.n_days) AS BIGINT) AS n_days
      FROM daily d CROSS JOIN horizon h
      GROUP BY 1
    ), calc AS (
      SELECT l_partkey, n_days,
             s / n1 AS mu,
             sqrt((ss - s * s / n1) / (n1 - 1)) AS sigma
      FROM stats
    )
    SELECT l_partkey AS partkey, n_days,
           round(mu, 6) AS mean_daily_demand,
           round(sigma, 6) AS sd_daily_demand,
           CAST(ceil({_SS_Z_X100} / 100.0 * sigma
                     * sqrt(CAST({_SS_LEAD_DAYS} AS DOUBLE))) AS BIGINT)
             AS safety_stock,
           CAST(ceil(mu * {_SS_LEAD_DAYS}
                     + {_SS_Z_X100} / 100.0 * sigma
                       * sqrt(CAST({_SS_LEAD_DAYS} AS DOUBLE))) AS BIGINT)
             AS reorder_point
    FROM calc
    ORDER BY safety_stock DESC, partkey LIMIT 25
    """,
)
def safety_stock_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety stock and reorder points per part: from each part's daily
    shipped-quantity statistics (zero-days included via the shared
    calendar horizon), safety stock = z·σ_daily·√L at a 95% service
    level (z=1.65) over a {_SS_LEAD_DAYS}-day lead time, reorder point
    = μ·L + safety stock — the operations-research formula that turns
    demand variability into stocking decisions, reported for the 25
    most variable parts. Demand sums are exact ints (including the
    zero-day correction: Σq and Σq² over ship days equal the full-
    calendar sums because absent days contribute zero); μ/σ and the
    stocking levels are identical double expressions with exact ceil
    outputs.

    Scale: one map-side-combined (part, day) aggregate, then a per-part
    rollup carrying two exact moments — the sufficient-statistics
    layout; the horizon is a 1-row broadcast; top-25 is TakeOrdered.
    """
    daily = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            "l_partkey", F.date_trunc("day", F.col("l_shipdate")).alias("day")
        )
        .agg(F.round(F.sum("l_quantity")).cast("bigint").alias("q"))
    )
    horizon = daily.agg(
        (F.datediff(F.max("day"), F.min("day")) + 1)
        .cast("bigint")
        .alias("n_days")
    )
    stats = (
        daily.crossJoin(F.broadcast(horizon))
        .groupBy("l_partkey")
        .agg(
            F.sum("q").cast("bigint").cast("double").alias("s"),
            F.sum(F.col("q") * F.col("q")).cast("bigint").cast("double").alias("ss"),
            F.max("n_days").cast("double").alias("n1"),
            F.max("n_days").cast("bigint").alias("n_days"),
        )
    )
    mu = F.col("s") / F.col("n1")
    sigma = F.sqrt(
        (F.col("ss") - F.col("s") * F.col("s") / F.col("n1"))
        / (F.col("n1") - 1)
    )
    ss_expr = F.ceil(
        _SS_Z_X100 / 100.0 * sigma * F.sqrt(F.lit(float(_SS_LEAD_DAYS)))
    ).cast("bigint")
    rp_expr = F.ceil(
        mu * _SS_LEAD_DAYS
        + _SS_Z_X100 / 100.0 * sigma * F.sqrt(F.lit(float(_SS_LEAD_DAYS)))
    ).cast("bigint")
    return (
        stats.select(
            F.col("l_partkey").alias("partkey"),
            "n_days",
            F.round(mu, 6).alias("mean_daily_demand"),
            F.round(sigma, 6).alias("sd_daily_demand"),
            ss_expr.alias("safety_stock"),
            rp_expr.alias("reorder_point"),
        )
        .orderBy(F.desc("safety_stock"), "partkey")
        .limit(25)
    )
