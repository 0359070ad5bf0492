"""Analytics wave 10: latency percentile heatmaps, session
bounce/dwell, capture-recapture population estimates, and join-
cardinality feedback.

Percentile heatmaps are the SRE latency dashboard; bounce/dwell is the
product-analytics session readout; Lincoln-Petersen capture-recapture
estimates an unobserved population from two overlapping samples; and
cardinality feedback (estimated vs actual join sizes, q-error) is the
optimizer-quality loop every CBO ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_LPH_QS = (50, 95, 99)


@query(
    "latency_percentile_heatmap",
    oracle=f"""
    WITH v AS (
      SELECT CAST(hour(ts) AS BIGINT) AS hod,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ), g AS (
      SELECT hod, cents, CAST(count(*) AS BIGINT) AS c
      FROM v GROUP BY 1, 2
    ), cum AS (
      SELECT hod, cents, c,
             CAST(sum(c) OVER (PARTITION BY hod ORDER BY cents)
                  AS BIGINT) AS cc,
             CAST(sum(c) OVER (PARTITION BY hod) AS BIGINT) AS n
      FROM g
    ), qs AS (SELECT unnest(ARRAY{list(_LPH_QS)}) AS q),
    hits AS (
      SELECT cum.hod, qs.q, min(cum.cents) AS qv
      FROM cum JOIN qs ON cum.cc * 100 >= qs.q * cum.n
      GROUP BY 1, 2
    )
    SELECT hod AS hour_of_day,
           max(CASE WHEN q = 50 THEN qv END) AS p50_cents,
           max(CASE WHEN q = 95 THEN qv END) AS p95_cents,
           max(CASE WHEN q = 99 THEN qv END) AS p99_cents
    FROM hits GROUP BY 1 ORDER BY hour_of_day
    """,
)
def latency_percentile_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour-of-day exact p50/p95/p99 of the value distribution —
    the latency heatmap every SRE dashboard leads with, computed with
    EXACT lower quantiles (per-hour value-grouped counts + a
    hod-partitioned cumulative over the bounded distinct-cents
    dimension — quantile_treatment_effects' machinery fanned out over
    the hour key). Zero floats; trivially bit-exact.

    Scale: one map-side-combined (hour, cents) aggregate; cumulative
    windows partition by hour over ≤10⁴ distinct values each; the
    3-row quantile dimension broadcasts.
    """
    v = load(spark, sf_dir, "events").select(
        F.hour("ts").cast("bigint").alias("hod"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    g = v.groupBy("hod", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wcum = Window.partitionBy("hod").orderBy("cents")
    whod = Window.partitionBy("hod")
    cum = g.select(
        "hod",
        "cents",
        F.sum("c").over(wcum).cast("bigint").alias("cc"),
        F.sum("c").over(whod).cast("bigint").alias("n"),
    )
    qs = spark.range(0, len(_LPH_QS)).select(
        F.element_at(
            F.array(*[F.lit(q) for q in _LPH_QS]), (F.col("id") + 1).cast("int")
        ).alias("q")
    )
    hits = (
        cum.join(F.broadcast(qs), F.col("cc") * 100 >= F.col("q") * F.col("n"))
        .groupBy("hod", "q")
        .agg(F.min("cents").alias("qv"))
    )
    return (
        hits.groupBy(F.col("hod").alias("hour_of_day"))
        .agg(
            F.max(F.when(F.col("q") == 50, F.col("qv"))).alias("p50_cents"),
            F.max(F.when(F.col("q") == 95, F.col("qv"))).alias("p95_cents"),
            F.max(F.when(F.col("q") == 99, F.col("qv"))).alias("p99_cents"),
        )
        .orderBy("hour_of_day")
    )


_BOUNCE_GAP_MIN = 30


@query(
    "session_bounce_dwell",
    oracle=f"""
    WITH x AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                     >= {_BOUNCE_GAP_MIN} * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM x
    ), sess AS (
      SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events,
             CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS dwell_us
      FROM s GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS bounce_rate_ppm,
           CAST(sum(dwell_us) AS BIGINT) AS total_dwell_us,
           CAST(sum(dwell_us) // sum(CASE WHEN n_events > 1 THEN 1 ELSE 0
                                     END) AS BIGINT)
             AS avg_engaged_dwell_us,
           CAST(max(dwell_us) AS BIGINT) AS max_dwell_us
    FROM sess
    """,
)
def session_bounce_dwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session bounce rate and dwell time: sessions cut at
    {_BOUNCE_GAP_MIN}-minute gaps (events_sessionize's rule), a bounce
    is a single-event session, dwell is first-to-last event time —
    the engagement readout (bounce %, average engaged dwell) product
    analytics reports beside retention. All exact integers: ppm bounce
    rate, µs dwell sums.

    Scale: the lag+cumsum sessionization is user-partitioned (bounded
    per-user frames); the rollup is one map-side-combined aggregate
    over the session dimension.
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    x = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                >= _BOUNCE_GAP_MIN * 60 * 1000000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    s = x.select(
        "user_id",
        "ts",
        F.sum("new_s")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    sess = s.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
        .cast("bigint")
        .alias("dwell_us"),
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    engaged = F.sum(F.when(F.col("n_events") > 1, 1).otherwise(0))
    return sess.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        bounce.cast("bigint").alias("n_bounces"),
        F.expr(
            "CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000"
            " div count(*) AS BIGINT)"
        ).alias("bounce_rate_ppm"),
        F.sum("dwell_us").cast("bigint").alias("total_dwell_us"),
        (F.sum("dwell_us").cast("bigint") / engaged)
        .cast("bigint")
        .alias("avg_engaged_dwell_us"),
        F.max("dwell_us").cast("bigint").alias("max_dwell_us"),
    )


@query(
    "capture_recapture_estimate",
    oracle="""
    WITH w1 AS (
      SELECT DISTINCT user_id FROM events
      WHERE day(ts) BETWEEN 1 AND 3
    ), w2 AS (
      SELECT DISTINCT user_id FROM events
      WHERE day(ts) BETWEEN 4 AND 6
    ), m AS (
      SELECT CAST((SELECT count(*) FROM w1) AS BIGINT) AS n1,
             CAST((SELECT count(*) FROM w2) AS BIGINT) AS n2,
             CAST((SELECT count(*) FROM w1 JOIN w2 USING (user_id))
                  AS BIGINT) AS m12,
             CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT)
               AS true_pop
    )
    SELECT n1, n2, m12, true_pop,
           CAST((n1 + 1) * (n2 + 1) // (m12 + 1) - 1 AS BIGINT)
             AS chapman_estimate,
           CAST(abs((n1 + 1) * (n2 + 1) // (m12 + 1) - 1 - true_pop)
                * 1000000 // true_pop AS BIGINT) AS rel_err_ppm
    FROM m
    """,
)
def capture_recapture_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture population estimation (Chapman's corrected
    Lincoln-Petersen): treat the users active on days 1-3 and days 4-6
    as two capture samples; N̂ = (n1+1)(n2+1)/(m+1) − 1 estimates the
    total active population from the overlap — the ecology/epidemiology
    estimator data teams reuse to size populations they can't observe
    directly (total customers when each channel sees a sample). The
    true distinct count is included so the oracle checks the
    estimator's actual relative error (exact ppm) on this corpus, not
    just its arithmetic. (This synthetic feed has every user active in
    both windows, so the samples saturate the population and the
    estimator lands exactly — rel_err 0 — which is itself the correct
    asymptotic behavior; sparse-activity corpora exercise the
    interesting regime.)

    Scale: two DISTINCT projections + one key join + one global
    distinct — all map-side-combinable; at 10⁹ users the distincts
    become HLL sketches (hll_union_setops) with the same estimator on
    top.
    """
    e = load(spark, sf_dir, "events")
    w1 = e.where(F.dayofmonth("ts").between(1, 3)).select("user_id").distinct()
    w2 = e.where(F.dayofmonth("ts").between(4, 6)).select("user_id").distinct()
    n1 = w1.agg(F.count(F.lit(1)).cast("bigint").alias("n1"))
    n2 = w2.agg(F.count(F.lit(1)).cast("bigint").alias("n2"))
    m12 = w1.join(w2, "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("m12")
    )
    tp = e.agg(F.count_distinct("user_id").cast("bigint").alias("true_pop"))
    return (
        n1.crossJoin(n2)
        .crossJoin(m12)
        .crossJoin(tp)
        .select(
            "n1",
            "n2",
            "m12",
            "true_pop",
            F.expr("CAST((n1 + 1) * (n2 + 1) div (m12 + 1) - 1 AS BIGINT)").alias(
                "chapman_estimate"
            ),
            F.expr(
                "CAST(abs((n1 + 1) * (n2 + 1) div (m12 + 1) - 1 - true_pop)"
                " * 1000000 div true_pop AS BIGINT)"
            ).alias("rel_err_ppm"),
        )
    )


@query(
    "join_cardinality_feedback",
    oracle="""
    WITH s AS (
      SELECT CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_o,
             CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_l,
             CAST((SELECT count(DISTINCT o_orderkey) FROM orders)
                  AS BIGINT) AS d_o,
             CAST((SELECT count(DISTINCT l_orderkey) FROM lineitem)
                  AS BIGINT) AS d_l,
             CAST((SELECT count(*) FROM orders JOIN lineitem
                   ON o_orderkey = l_orderkey) AS BIGINT) AS actual_ol,
             CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_c,
             CAST((SELECT count(DISTINCT c_custkey) FROM customer)
                  AS BIGINT) AS d_c,
             CAST((SELECT count(DISTINCT o_custkey) FROM orders)
                  AS BIGINT) AS d_oc,
             CAST((SELECT count(*) FROM customer JOIN orders
                   ON c_custkey = o_custkey) AS BIGINT) AS actual_co
    )
    SELECT * FROM (
      SELECT 'orders_lineitem' AS join_name,
             n_o * n_l // greatest(d_o, d_l) AS estimated,
             actual_ol AS actual,
             round(greatest(CAST(n_o * n_l // greatest(d_o, d_l) AS DOUBLE)
                              / actual_ol,
                            CAST(actual_ol AS DOUBLE)
                              / (n_o * n_l // greatest(d_o, d_l))), 6)
               AS q_error
      FROM s
      UNION ALL
      SELECT 'customer_orders',
             n_c * n_o // greatest(d_c, d_oc),
             actual_co,
             round(greatest(CAST(n_c * n_o // greatest(d_c, d_oc) AS DOUBLE)
                              / actual_co,
                            CAST(actual_co AS DOUBLE)
                              / (n_c * n_o // greatest(d_c, d_oc))), 6)
      FROM s
    ) ORDER BY join_name
    """,
)
def join_cardinality_feedback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality-estimation feedback: the textbook CBO equi-join
    estimate |A⋈B| = |A|·|B| / max(ndv_A, ndv_B) versus the ACTUAL join
    cardinality, with the q-error (max of over/under ratio) every
    learned-cardinality paper benchmarks against — run for the two core
    star joins. This is the feedback loop adaptive optimizers close at
    runtime (AQE replans on actual sizes); persisted, it's how
    cardinality-feedback optimizers learn. Estimates are exact integer
    formulas over exact stats; q-errors are identical double
    expressions.

    Scale: the stats are map-side-combinable counts/distincts a real
    engine reads from table statistics; only the actual counts touch
    the joins themselves (and AQE broadcasts the dimension sides).
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")
    s = (
        o.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_o"),
            F.count_distinct("o_orderkey").cast("bigint").alias("d_o"),
            F.count_distinct("o_custkey").cast("bigint").alias("d_oc"),
        )
        .crossJoin(
            li.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_l"),
                F.count_distinct("l_orderkey").cast("bigint").alias("d_l"),
            )
        )
        .crossJoin(
            c.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_c"),
                F.count_distinct("c_custkey").cast("bigint").alias("d_c"),
            )
        )
        .crossJoin(
            o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).agg(
                F.count(F.lit(1)).cast("bigint").alias("actual_ol")
            )
        )
        .crossJoin(
            c.join(o, F.col("c_custkey") == F.col("o_custkey")).agg(
                F.count(F.lit(1)).cast("bigint").alias("actual_co")
            )
        )
    )
    est_ol = F.expr("n_o * n_l div greatest(d_o, d_l)")
    est_co = F.expr("n_c * n_o div greatest(d_c, d_oc)")
    r1 = s.select(
        F.lit("orders_lineitem").alias("join_name"),
        est_ol.alias("estimated"),
        F.col("actual_ol").alias("actual"),
        F.round(
            F.greatest(
                est_ol.cast("double") / F.col("actual_ol"),
                F.col("actual_ol").cast("double") / est_ol,
            ),
            6,
        ).alias("q_error"),
    )
    r2 = s.select(
        F.lit("customer_orders").alias("join_name"),
        est_co.alias("estimated"),
        F.col("actual_co").alias("actual"),
        F.round(
            F.greatest(
                est_co.cast("double") / F.col("actual_co"),
                F.col("actual_co").cast("double") / est_co,
            ),
            6,
        ).alias("q_error"),
    )
    return r1.unionByName(r2).orderBy("join_name")
