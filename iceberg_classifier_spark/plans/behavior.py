"""Behavioral-analytics operators over the ``events`` stream: ordered
conversion funnels, weekly cohort retention, and hopping (sliding) window
aggregation — the product-analytics surface a large event pipeline serves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load


@query(
    "events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1
        AND e.ts <= v.t1 + INTERVAL 7 DAY
      GROUP BY 1
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        AND e.ts <= c.t2 + INTERVAL 7 DAY
      GROUP BY 1
    ), n AS (
      SELECT 1 AS stage, 'view' AS event_type,
             (SELECT count(*) FROM v) AS users
      UNION ALL
      SELECT 2, 'click', (SELECT count(*) FROM c)
      UNION ALL
      SELECT 3, 'purchase', (SELECT count(*) FROM p)
    )
    SELECT stage, event_type, users,
           round(users * 1.0
                 / first_value(users) OVER (ORDER BY stage), 6)
             AS frac_of_first,
           round(CASE WHEN lag(users, 1, users) OVER (ORDER BY stage) = 0
                      THEN 0.0
                      ELSE users * 1.0
                           / lag(users, 1, users) OVER (ORDER BY stage)
                 END, 6) AS frac_of_prev
    FROM n ORDER BY stage
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel view → click → purchase, where
    each next stage must land within 7 days AFTER the previous stage's
    first hit; reports per-stage user counts and conversion fractions.

    Scale: each stage is a filtered per-user min (map-combined agg over the
    pushed-down ``event_type`` filter), and every join keys on the
    already-aggregated |users|-row frame — broadcast at any corpus size
    where |users| << |events|. The fact table is scanned once per stage
    with the stage's type filter reaching the parquet scan; no windows, no
    per-user event arrays.
    """
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df: DataFrame, num: int, etype: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(num).alias("stage"), F.lit(etype).alias("event_type"), "users"
        )

    n = stage(v, 1, "view").unionAll(stage(c, 2, "click")).unionAll(
        stage(p, 3, "purchase")
    )
    w = Window.orderBy("stage")
    prev = F.coalesce(F.lag("users", 1).over(w), F.col("users"))
    return n.select(
        "stage",
        "event_type",
        "users",
        F.round(F.col("users") / F.first("users").over(w), 6).alias(
            "frac_of_first"
        ),
        F.round(
            F.when(prev == 0, F.lit(0.0)).otherwise(F.col("users") / prev), 6
        ).alias("frac_of_prev"),
    ).orderBy("stage")


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY 1
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    ), sizes AS (
      SELECT cohort_week, count(*) AS cohort_users FROM firsts GROUP BY 1
    ), act AS (
      SELECT f.cohort_week,
             CAST(date_diff('day', f.cohort_week, a.week) / 7 AS BIGINT)
               AS week_offset,
             count(*) AS active_users
      FROM activity a JOIN firsts f USING (user_id)
      GROUP BY 1, 2
    )
    SELECT a.cohort_week, a.week_offset, a.active_users, s.cohort_users,
           round(a.active_users * 1.0 / s.cohort_users, 6) AS retention
    FROM act a JOIN sizes s USING (cohort_week)
    ORDER BY cohort_week, week_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the week of their
    first event; for each cohort × week-offset, the fraction of the cohort
    active that week.

    Scale: one shuffle builds the |users|-row first-activity frame and one
    builds the distinct (user, week) activity frame; the cohort join
    broadcasts the firsts frame, and because activity is already distinct
    per (user, week) the retention matrix needs only count(*) — no
    count-distinct shuffle of raw events. Matrix size is |cohorts| ×
    |offsets|, independent of event volume.
    """
    e = load(spark, sf_dir, "events").select("user_id", "ts")
    firsts = (
        e.groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    act = (
        activity.join(F.broadcast(firsts), "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    return (
        act.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            "cohort_users",
            F.round(F.col("active_users") / F.col("cohort_users"), 6).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "events_hopping",
    oracle="""
    SELECT ws AS window_start, event_type, count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM (
      SELECT event_type, value,
             unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts)
                       - INTERVAL '30 minutes']) AS ws
      FROM events
    )
    GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
)
def events_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregation: 1-hour windows sliding every 30 minutes
    (each event lands in exactly 2 overlapping windows) — the smoothing
    window shape dashboards use over tumbling counts.

    Scale: ``F.window(slide < duration)`` expands each row to
    duration/slide = 2 window assignments before the hash agg, so shuffle
    volume is 2× the tumbling equivalent — still map-side combined to
    |windows|×|types| rows. The oracle mirrors the expansion explicitly by
    unnesting each row's two candidate 30-minute-aligned starts.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "events_rolling_1h_range",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           round(sum(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0, 2)
             AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY user_id, ts, event_id
    """,
)
def events_rolling_1h_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval rolling window: per user, the event count and value
    sum over the trailing 1 HOUR (a RANGE frame over event time, not a
    row-count frame) — "activity in the last hour" features for every
    event.

    Scale: one exchange + sort on (user_id, ts) feeds both frame
    aggregates; the RANGE frame is evaluated by Spark's sliding-window
    frame processor over microsecond longs (`unix_micros`), so frame
    boundaries are integer-exact and identical to the oracle's
    INTERVAL arithmetic (event timestamps are exact microseconds).
    Values are summed as integer cents inside the frame, making the
    windowed sums order-independent bit-for-bit.
    """
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum(cents).over(w) / 100.0, 2).alias("sum_1h"),
    ).orderBy("user_id", "ts", "event_id")


@query(
    "set_ops_users",
    oracle="""
    WITH a AS (
      SELECT DISTINCT user_id FROM events
      WHERE ts < TIMESTAMP '2024-01-16 00:00:00' AND event_type = 'purchase'
        AND value > 100
    ), b AS (
      SELECT DISTINCT user_id FROM events
      WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' AND event_type = 'purchase'
        AND value > 100
    )
    SELECT 'both_halves' AS segment,
           (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
             AS n_users
    UNION ALL
    SELECT 'first_only',
           (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
    UNION ALL
    SELECT 'second_only',
           (SELECT count(*) FROM (SELECT * FROM b EXCEPT SELECT * FROM a))
    ORDER BY segment
    """,
)
def set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation segmentation: high-value purchasers (value > 100)
    active in both month halves
    (INTERSECT), churned (EXCEPT), and newly-converted (reverse EXCEPT) —
    the retention-segment report expressed with relational set operators.

    Scale: INTERSECT/EXCEPT compile to aggregate-based semi/anti plans on
    the already-distinct key sets, so each segment costs one shuffle of
    |users| rows — the same plan a hand-written left_semi/left_anti would
    produce, with clearer intent.
    """
    e = load(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    p = e.filter((F.col("event_type") == "purchase") & (F.col("value") > 100))
    a = p.filter(F.col("ts") < cut).select("user_id").distinct()
    b = p.filter(F.col("ts") >= cut).select("user_id").distinct()

    def seg(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("segment"), "n_users"
        )

    return (
        seg(a.intersect(b), "both_halves")
        .unionAll(seg(a.exceptAll(b), "first_only"))
        .unionAll(seg(b.exceptAll(a), "second_only"))
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Session MRR (mean reciprocal rank of first conversion)
# ---------------------------------------------------------------------------

_MRR_UNITS = 1_000_000


@query(
    "session_mrr",
    oracle=f"""
    WITH x AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1
                  ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_s) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS sid
      FROM x
    ), ranked AS (
      SELECT user_id, sid, event_type,
             row_number() OVER (PARTITION BY user_id, sid
                                ORDER BY ts, event_id) AS rk
      FROM s
    ), per_session AS (
      SELECT user_id, sid,
             min(CASE WHEN event_type = 'purchase' THEN rk END) AS conv_rk
      FROM ranked GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(conv_rk) AS BIGINT) AS n_converted,
           round(count(conv_rk) * 1.0 / count(*), 6) AS conversion_rate,
           round(sum({_MRR_UNITS} // conv_rk) * 1.0
                 / count(conv_rk) / {_MRR_UNITS}, 6) AS mrr
    FROM per_session
    """,
)
def session_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank of the first conversion within a session: the
    ranking metric search/recommendation teams track, applied to 30-min
    sessions — how early in a session does the purchase happen (MRR → 1
    means first-action conversions). Reciprocal ranks are floored integer
    micro-units ({_MRR_UNITS} div rank), so the mean is an exact-integer
    sum with one final division — immune to float aggregation order.

    Scale: reuses the sessionization shuffle (one user-partitioned window
    chain builds session ids AND in-session ranks); per-session reduction
    and the 1-row rollup are map-side combined.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    x = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(gap_us.isNull() | (gap_us >= 30 * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_s"),
    )
    s = x.withColumn("sid", F.sum("new_s").over(w))
    ranked = s.select(
        "user_id",
        "sid",
        "event_type",
        F.row_number()
        .over(Window.partitionBy("user_id", "sid").orderBy("ts", "event_id"))
        .alias("rk"),
    )
    per_session = ranked.groupBy("user_id", "sid").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("rk"))
        ).alias("conv_rk")
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count("conv_rk").alias("n_converted"),
        F.round(F.count("conv_rk") * 1.0 / F.count(F.lit(1)), 6).alias(
            "conversion_rate"
        ),
        F.round(
            F.sum(F.expr(f"{_MRR_UNITS} div conv_rk"))
            * 1.0
            / F.count("conv_rk")
            / _MRR_UNITS,
            6,
        ).alias("mrr"),
    )
