"""Business-ops wave 2: Erlang-C staffing and time/volume-weighted
average price.

Erlang C turns arrival-rate profiles into staffing requirements — the
workforce-management computation behind every call-center/ops-queue
dashboard; TWAP vs VWAP vs naive mean is the execution-quality
benchmark finance data platforms report, and the divergence between
them is exactly what irregular event spacing causes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_ERL_MU = 20.0  # service rate: 20 jobs/hour per agent (3-min handle time)
_ERL_MAX_C = 40
_ERL_TARGET = 0.2  # acceptable P(wait)

# Erlang-C pieces over a = offered load, c = agents — shared text.
# sum_{k=0}^{c-1} a^k/k! and a^c/c! both via an ordered product fold.
# NB: Spark's sequence(1, 0) runs DESCENDING (not empty) — guard c=1
_ERL_SUM = (
    "CASE WHEN c = 1 THEN CAST(1.0 AS DOUBLE) ELSE"
    " aggregate(sequence(1, c - 1), array(CAST(1.0 AS DOUBLE),"
    " CAST(1.0 AS DOUBLE)), (acc, k) -> array(acc[0] * a / k,"
    " acc[1] + acc[0] * a / k))[1] END"
)
_ERL_TERM = (
    "aggregate(sequence(1, c), CAST(1.0 AS DOUBLE),"
    " (acc, k) -> acc * a / k)"
)
_ERL_PWAIT = (
    f"CASE WHEN a >= c THEN CAST(1.0 AS DOUBLE) ELSE"
    f" ({_ERL_TERM}) / (({_ERL_TERM}) + (1 - a / c) * ({_ERL_SUM})) END"
)

_DUCK_ERL_SUM = (
    "list_reduce(list_prepend([CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE)],"
    " list_transform(range(1, c), k -> [CAST(k AS DOUBLE),"
    " CAST(0 AS DOUBLE)])), (acc, v) -> [acc[1] * a / v[1],"
    " acc[2] + acc[1] * a / v[1]])[2]"
)
_DUCK_ERL_TERM = (
    "list_reduce(list_prepend(CAST(1.0 AS DOUBLE),"
    " list_transform(range(1, c + 1), k -> CAST(k AS DOUBLE))),"
    " (acc, v) -> acc * a / v)"
)
_DUCK_ERL_PWAIT = (
    f"CASE WHEN a >= c THEN CAST(1.0 AS DOUBLE) ELSE"
    f" ({_DUCK_ERL_TERM}) / (({_DUCK_ERL_TERM}) + (1 - a / c)"
    f" * ({_DUCK_ERL_SUM})) END"
)


@query(
    "erlang_c_staffing",
    oracle=f"""
    WITH lam AS (
      SELECT CAST(hour(ts) AS BIGINT) AS hod,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS days
      FROM events GROUP BY 1
    ), load AS (
      SELECT hod, n, CAST(n AS DOUBLE) / days AS lambda_hr,
             CAST(n AS DOUBLE) / days / {_ERL_MU} AS a
      FROM lam
    ), grid AS (
      SELECT l.hod, l.n, l.lambda_hr, l.a, c.c,
             {_DUCK_ERL_PWAIT} AS p_wait
      FROM load l CROSS JOIN
           (SELECT unnest(range(1, {_ERL_MAX_C} + 1)) AS c) c
    ), feas AS (
      SELECT hod, n, lambda_hr, a, c, p_wait
      FROM grid
      WHERE a < c AND p_wait <= {_ERL_TARGET}
    ), best AS (
      SELECT hod, n, lambda_hr, a,
             min(c) AS c_required
      FROM feas GROUP BY 1, 2, 3, 4
    )
    SELECT b.hod AS hour_of_day, b.n AS n_events,
           round(b.lambda_hr, 6) AS lambda_per_hr,
           round(b.a, 6) AS offered_load,
           CAST(b.c_required AS BIGINT) AS agents_required,
           round(g.p_wait, 6) AS p_wait_at_c
    FROM best b JOIN grid g ON g.hod = b.hod AND g.c = b.c_required
    ORDER BY hour_of_day
    """,
)
def erlang_c_staffing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erlang-C staffing curve: for each hour-of-day's arrival rate
    (events/hour averaged over the month), find the minimum number of
    agents c such that the M/M/c wait probability
    C(c, a) = (aᶜ/c!) / (aᶜ/c! + (1 − a/c)·Σ_{{k<c}} aᵏ/k!) stays
    under {_ERL_TARGET:.0%} at a {_ERL_MU:.0f}/hour service rate — the
    workforce-management computation behind queue staffing dashboards.
    The factorial series are ordered product folds (k ascending,
    identical left-to-right IEEE ops in both engines), evaluated on an
    (hours × {_ERL_MAX_C}-agent) candidate grid; the argmin is an
    exact integer min over the feasible set.

    Scale: one map-side-combined hour-of-day aggregate; the Erlang grid
    is 24×{_ERL_MAX_C} dimension rows regardless of corpus size. Per-
    queue staffing partitions the same grid by queue key.
    """
    lam = (
        load(spark, sf_dir, "events")
        .groupBy(F.hour("ts").cast("bigint").alias("hod"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_distinct(F.date_trunc("day", F.col("ts")))
            .cast("bigint")
            .alias("days"),
        )
    )
    loadf = lam.select(
        "hod",
        "n",
        (F.col("n").cast("double") / F.col("days")).alias("lambda_hr"),
        (F.col("n").cast("double") / F.col("days") / _ERL_MU).alias("a"),
    )
    cs = spark.range(1, _ERL_MAX_C + 1).select(F.col("id").cast("int").alias("c"))
    grid = loadf.crossJoin(F.broadcast(cs)).select(
        "hod",
        "n",
        "lambda_hr",
        "a",
        "c",
        F.expr(_ERL_PWAIT).alias("p_wait"),
    )
    feas = grid.where((F.col("a") < F.col("c")) & (F.col("p_wait") <= _ERL_TARGET))
    best = feas.groupBy("hod", "n", "lambda_hr", "a").agg(
        F.min("c").alias("c_required")
    )
    g2 = grid.select(
        F.col("hod").alias("ghod"), F.col("c").alias("gc"), "p_wait"
    )
    return (
        best.join(
            g2,
            (F.col("ghod") == F.col("hod")) & (F.col("gc") == F.col("c_required")),
        )
        .select(
            F.col("hod").alias("hour_of_day"),
            F.col("n").alias("n_events"),
            F.round("lambda_hr", 6).alias("lambda_per_hr"),
            F.round("a", 6).alias("offered_load"),
            F.col("c_required").cast("bigint").alias("agents_required"),
            F.round("p_wait", 6).alias("p_wait_at_c"),
        )
        .orderBy("hour_of_day")
    )


@query(
    "twap_vs_mean_daily",
    oracle="""
    WITH pts AS (
      SELECT date_trunc('day', ts) AS day, ts,
             CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) AS t,
             lead(epoch_us(ts)) OVER (PARTITION BY date_trunc('day', ts)
                                      ORDER BY ts, event_id) AS t_next
      FROM events WHERE event_type = 'purchase'
    ), seg AS (
      SELECT day, cents, t_next - t AS dur
      FROM pts WHERE t_next IS NOT NULL
    ), agg AS (
      SELECT day,
             CAST(count(*) AS BIGINT) AS n_segments,
             CAST(sum(cents * dur) AS BIGINT) AS wsum,
             CAST(sum(dur) AS BIGINT) AS tsum,
             CAST(sum(cents) AS BIGINT) AS psum
      FROM seg GROUP BY 1
    )
    SELECT day, n_segments,
           round(CAST(wsum AS DOUBLE) / tsum / 100, 6) AS twap,
           round(CAST(psum AS DOUBLE) / n_segments / 100, 6) AS naive_mean,
           round((CAST(wsum AS DOUBLE) / tsum
                  - CAST(psum AS DOUBLE) / n_segments) / 100, 6)
             AS twap_minus_mean
    FROM agg ORDER BY day
    """,
)
def twap_vs_mean_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily TWAP (time-weighted average price) of the purchase-value
    series versus the naive per-event mean: each observation is held
    for the interval until the next event (lead over the day-
    partitioned time order, exact µs durations), so prices that persist
    longer weigh more — the execution-benchmark definition. The
    twap_minus_mean column isolates exactly what irregular event
    spacing does to an unweighted average. Weighted sums are exact
    int64 (cents × µs), divisions are identical double expressions.

    Scale: one day-partitioned lead window (the standard sessionize
    shape — bounded partitions) and a map-side-combined day aggregate;
    no global windows, no per-row state.
    """
    w = Window.partitionBy(F.date_trunc("day", F.col("ts"))).orderBy(
        "ts", "event_id"
    )
    pts = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
            F.unix_micros("ts").alias("t"),
            F.lead(F.unix_micros("ts")).over(w).alias("t_next"),
        )
    )
    seg = pts.where(F.col("t_next").isNotNull()).select(
        "day", "cents", (F.col("t_next") - F.col("t")).alias("dur")
    )
    agg = seg.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum(F.col("cents") * F.col("dur")).cast("bigint").alias("wsum"),
        F.sum("dur").cast("bigint").alias("tsum"),
        F.sum("cents").cast("bigint").alias("psum"),
    )
    twap = F.col("wsum").cast("double") / F.col("tsum")
    nmean = F.col("psum").cast("double") / F.col("n_segments")
    return agg.select(
        "day",
        "n_segments",
        F.round(twap / 100, 6).alias("twap"),
        F.round(nmean / 100, 6).alias("naive_mean"),
        F.round((twap - nmean) / 100, 6).alias("twap_minus_mean"),
    ).orderBy("day")
