"""Analytics wave 31: session-gap sensitivity and MTBF/availability.

"Why is the session timeout 30 minutes?" — the gap-sensitivity curve
is the honest answer: session counts as a function of the threshold,
computed from the inter-event-gap histogram in one pass. MTBF/MTTR/
availability are THE reliability numbers; here incidents are derived
from hourly error intensity with islands-and-gaps run detection over
the bounded hour dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_GAP_THRESH_MIN = [5, 10, 30, 60, 120]


@query(
    "session_gap_sensitivity",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts)
               - epoch_us(lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      FROM events
    ), counts AS (
      SELECT CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events
    ), ghist AS (
      SELECT CAST(count(*) AS BIGINT) AS n_gaps FROM gaps
      WHERE gap_us IS NOT NULL
    )
    SELECT t.thresh_min,
           c.n_events, c.n_users,
           CAST(c.n_users + (SELECT count(*) FROM gaps
                WHERE gap_us > t.thresh_min * CAST(60000000 AS BIGINT))
             AS BIGINT) AS n_sessions,
           round(c.n_events * 1.0
                 / (c.n_users + (SELECT count(*) FROM gaps
                    WHERE gap_us > t.thresh_min
                          * CAST(60000000 AS BIGINT))), 4)
             AS events_per_session,
           CAST((SELECT count(*) FROM gaps
                 WHERE gap_us > t.thresh_min * CAST(60000000 AS BIGINT))
                * 1000000 // g.n_gaps AS BIGINT) AS boundary_gap_ppm
    FROM (SELECT unnest([{", ".join(str(t) for t in _GAP_THRESH_MIN)}])
            AS thresh_min) t
    CROSS JOIN counts c CROSS JOIN ghist g
    ORDER BY t.thresh_min
    """,
)
def session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-timeout sensitivity curve: for gap thresholds of 5 to
    120 minutes, the implied session count (users + gaps exceeding the
    threshold — the exact identity for gap-based sessionization),
    events per session, and the share of inter-event gaps that become
    boundaries — the curve whose elbow justifies (or indicts)
    `events_sessionize`'s 30-minute default instead of folklore.

    Determinism: gaps are exact epoch-MICROSECOND differences from
    (ts, event_id)-ordered user windows; every output is exact
    integer counting per threshold.

    Scale: one user-partitioned lag window over the fact stream
    computes all gaps once; each threshold is a count over the gap
    frame (at extreme scale: bucket gaps into a log-spaced histogram
    first and answer every threshold from it — same one-pass shape).
    """
    e = load(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact MICROSECOND gaps: every testdata ts carries sub-second parts,
    # and second-level truncation is not portable — Spark's long cast
    # truncates while DuckDB's CAST(epoch() AS BIGINT) ROUNDS the double,
    # shifting half the gaps by ±1 s and flipping threshold counts at
    # sf0.1 (round-6 parity sweep). unix_micros/epoch_us are both exact.
    gaps = e.select(
        (
            F.unix_micros(F.col("ts"))
            - F.lag(F.unix_micros(F.col("ts"))).over(wu)
        ).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    counts = e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )
    n_gaps = gaps.count()
    thr = spark.createDataFrame(
        [(t,) for t in _GAP_THRESH_MIN], "thresh_min int"
    )
    per_thr = (
        gaps.crossJoin(F.broadcast(thr))
        .groupBy("thresh_min")
        .agg(
            F.sum(
                F.when(
                    F.col("gap_us")
                    > F.col("thresh_min").cast("bigint") * 60000000,
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_boundaries")
        )
    )
    return (
        per_thr.crossJoin(F.broadcast(counts))
        .select(
            "thresh_min",
            "n_events",
            "n_users",
            (F.col("n_users") + F.col("n_boundaries"))
            .cast("bigint")
            .alias("n_sessions"),
            F.round(
                F.col("n_events")
                * 1.0
                / (F.col("n_users") + F.col("n_boundaries")),
                4,
            ).alias("events_per_session"),
            F.expr(
                f"CAST(n_boundaries * 1000000 div {n_gaps} AS BIGINT)"
            ).alias("boundary_gap_ppm"),
        )
        .orderBy("thresh_min")
    )


_MTBF_ERR_THRESH = 2  # hour is "down" when error count exceeds this


@query(
    "mtbf_availability",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hr,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS errs
      FROM events GROUP BY 1
    ), flagged AS (
      SELECT hr, errs,
             CASE WHEN errs > {_MTBF_ERR_THRESH} THEN 1 ELSE 0 END
               AS down,
             row_number() OVER (ORDER BY hr) AS rn
      FROM hourly
    ), islands AS (
      SELECT down, rn - row_number() OVER (PARTITION BY down
               ORDER BY rn) AS grp, hr
      FROM flagged
    ), episodes AS (
      SELECT down, grp, CAST(count(*) AS BIGINT) AS len_hours
      FROM islands GROUP BY down, grp
    )
    SELECT CAST(sum(CASE WHEN down = 0 THEN len_hours ELSE 0 END)
             AS BIGINT) AS up_hours,
           CAST(sum(CASE WHEN down = 1 THEN len_hours ELSE 0 END)
             AS BIGINT) AS down_hours,
           CAST(sum(down) AS BIGINT) AS n_incidents,
           round(sum(CASE WHEN down = 0 THEN len_hours ELSE 0 END) * 1.0
                 / greatest(sum(down), 1), 4) AS mtbf_hours,
           round(sum(CASE WHEN down = 1 THEN len_hours ELSE 0 END) * 1.0
                 / greatest(sum(down), 1), 4) AS mttr_hours,
           CAST(sum(CASE WHEN down = 0 THEN len_hours ELSE 0 END)
                * 1000000 // sum(len_hours) AS BIGINT)
             AS availability_ppm
    FROM episodes
    """,
)
def mtbf_availability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MTBF / MTTR / availability from hourly error intensity:
    hours with more than 2 error events are "down"; gaps-and-islands
    over the hour dimension turns the flag sequence into incident
    episodes, giving mean time between failures (up-hours per
    incident), mean time to recovery (down-hours per incident), and
    the availability ppm — the three numbers every reliability review
    opens with, derived reproducibly from raw events instead of
    hand-curated incident tickets (`slo_burn_rate_alerts` is the
    real-time view; this is the postmortem ledger).

    Determinism: hourly error counts, island lengths, and all ratios
    are exact integers (ratios rounded at the edge).

    Scale: one map-side-combined groupBy(hour); the islands windows
    run over the bounded hour dimension (partition by month for
    unbounded horizons).
    """
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr")).agg(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("errs")
    )
    flagged = hourly.select(
        "hr",
        (F.col("errs") > _MTBF_ERR_THRESH).cast("int").alias("down"),
        F.row_number().over(Window.orderBy("hr")).alias("rn"),
    )
    islands = flagged.select(
        "down",
        (
            F.col("rn")
            - F.row_number().over(
                Window.partitionBy("down").orderBy("rn")
            )
        ).alias("grp"),
    )
    episodes = islands.groupBy("down", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("len_hours")
    )
    up = F.sum(
        F.when(F.col("down") == 0, F.col("len_hours")).otherwise(0)
    )
    dn = F.sum(
        F.when(F.col("down") == 1, F.col("len_hours")).otherwise(0)
    )
    ninc = F.sum("down")
    return episodes.agg(
        up.cast("bigint").alias("up_hours"),
        dn.cast("bigint").alias("down_hours"),
        ninc.cast("bigint").alias("n_incidents"),
        F.round(up * 1.0 / F.greatest(ninc, F.lit(1)), 4).alias(
            "mtbf_hours"
        ),
        F.round(dn * 1.0 / F.greatest(ninc, F.lit(1)), 4).alias(
            "mttr_hours"
        ),
        F.expr(
            """
            CAST(sum(CASE WHEN down = 0 THEN len_hours ELSE 0 END)
                 * 1000000 div sum(len_hours) AS BIGINT)
            """
        ).alias("availability_ppm"),
    )
