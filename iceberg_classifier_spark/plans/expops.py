"""Experiment guardrails: sample-ratio mismatch and Poisson rate
intervals.

SRM is the first check every experiment readout must pass — a
traffic-split chi-square so sensitive that failing it invalidates
everything downstream (bucketing bugs, bot filters, redirect loss all
show up here first). The Poisson score interval is the right CI for
low-count incident/error rates, where the normal interval collapses
or goes negative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_SRM_CRIT = 3.841459  # chi²₁ at 95%


@query(
    "sample_ratio_mismatch",
    oracle=f"""
    WITH assign AS (
      SELECT DISTINCT user_id, CAST(user_id % 2 AS BIGINT) AS arm
      FROM events
    ), daily AS (
      SELECT CAST(e.ts AS DATE) AS day,
             CAST(sum(CASE WHEN e.user_id % 2 = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n1,
             CAST(sum(CASE WHEN e.user_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n0
      FROM events e GROUP BY 1
    ), overall AS (
      SELECT CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS u1,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS u0
      FROM assign
    )
    SELECT d.day, d.n1, d.n0,
           round((d.n1 - (d.n1 + d.n0) / 2.0)
                 * (d.n1 - (d.n1 + d.n0) / 2.0)
                 / ((d.n1 + d.n0) / 2.0)
                 + (d.n0 - (d.n1 + d.n0) / 2.0)
                   * (d.n0 - (d.n1 + d.n0) / 2.0)
                   / ((d.n1 + d.n0) / 2.0), 6) AS srm_chi2,
           CASE WHEN (d.n1 - (d.n1 + d.n0) / 2.0)
                     * (d.n1 - (d.n1 + d.n0) / 2.0)
                     / ((d.n1 + d.n0) / 2.0)
                     + (d.n0 - (d.n1 + d.n0) / 2.0)
                       * (d.n0 - (d.n1 + d.n0) / 2.0)
                       / ((d.n1 + d.n0) / 2.0) > {_SRM_CRIT}
                THEN 1 ELSE 0 END AS srm_flag,
           o.u1 AS users_arm1, o.u0 AS users_arm0
    FROM daily d CROSS JOIN overall o
    ORDER BY d.day
    """,
)
def sample_ratio_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for the 50/50 user-parity split:
    per day, the event-traffic chi-square against the expected equal
    split (plus the distinct-user split overall) — the check that
    catches bucketing bugs, bot filtering, and logging loss before
    anyone reads a metric. A flagged day invalidates that day's
    experiment readouts regardless of how significant they look
    (SRM failures are assignment corruption, not treatment effects).

    Determinism: counts are exact integers; the χ² is one closed-form
    double per day.

    Scale: one map-side-combined groupBy(day) plus one distinct-user
    aggregate; the test is day-dimension arithmetic.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
    )
    overall = (
        e.select("user_id").distinct()
        .agg(
            F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("u1"),
            F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("u0"),
        )
    )
    exp_half = (F.col("n1") + F.col("n0")) / 2.0
    chi2 = (F.col("n1") - exp_half) * (F.col("n1") - exp_half) / exp_half + (
        F.col("n0") - exp_half
    ) * (F.col("n0") - exp_half) / exp_half
    return (
        daily.crossJoin(F.broadcast(overall))
        .select(
            "day",
            "n1",
            "n0",
            F.round(chi2, 6).alias("srm_chi2"),
            F.when(chi2 > _SRM_CRIT, 1).otherwise(0).alias("srm_flag"),
            F.col("u1").alias("users_arm1"),
            F.col("u0").alias("users_arm0"),
        )
        .orderBy("day")
    )


_Z95 = 1.959964


@query(
    "poisson_rate_scoreci",
    oracle=f"""
    WITH expo AS (
      SELECT user_id,
             CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
               AS active_days,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS errors
      FROM events GROUP BY user_id
    ), agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(active_days) AS BIGINT) AS exposure_days,
             CAST(sum(errors) AS BIGINT) AS x
      FROM expo
    )
    SELECT n_users, exposure_days, x AS n_errors,
           round(x * 1000.0 / exposure_days, 4) AS rate_per_1000d,
           round((x + {_Z95} * {_Z95} / 2
                  - {_Z95} * sqrt(x + {_Z95} * {_Z95} / 4))
                 * 1000.0 / exposure_days, 4) AS ci_lo_per_1000d,
           round((x + {_Z95} * {_Z95} / 2
                  + {_Z95} * sqrt(x + {_Z95} * {_Z95} / 4))
                 * 1000.0 / exposure_days, 4) AS ci_hi_per_1000d
    FROM agg
    """,
)
def poisson_rate_scoreci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson score interval for the error-event rate per 1000 active
    user-days: with x events over E exposure, the 95% score CI is
    (x + z²/2 ± z·√(x + z²/4))/E — the interval that stays positive
    and calibrated at low counts where the Wald ±z√x/E interval
    collapses (the incident-rate / SLO-breach CI every reliability
    report should use; frequentist cousin of the engine's
    `bootstrap_ci_poisson`).

    Determinism: exposure and event counts are exact integers; the
    interval is one closed-form double expression.

    Scale: one map-side-combined per-user aggregate (distinct-day
    exposure via count distinct within the user partition), one
    integer re-aggregate.
    """
    e = load(spark, sf_dir, "events")
    expo = e.groupBy("user_id").agg(
        F.countDistinct(F.col("ts").cast("date"))
        .cast("bigint")
        .alias("active_days"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("errors"),
    )
    agg = expo.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("active_days").cast("bigint").alias("exposure_days"),
        F.sum("errors").cast("bigint").alias("x"),
    )
    z = _Z95
    lo = (
        F.col("x") + z * z / 2 - z * F.sqrt(F.col("x") + z * z / 4)
    ) * 1000.0 / F.col("exposure_days")
    hi = (
        F.col("x") + z * z / 2 + z * F.sqrt(F.col("x") + z * z / 4)
    ) * 1000.0 / F.col("exposure_days")
    return agg.select(
        "n_users",
        "exposure_days",
        F.col("x").alias("n_errors"),
        F.round(F.col("x") * 1000.0 / F.col("exposure_days"), 4).alias(
            "rate_per_1000d"
        ),
        F.round(lo, 4).alias("ci_lo_per_1000d"),
        F.round(hi, 4).alias("ci_hi_per_1000d"),
    )
