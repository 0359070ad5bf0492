"""Analytics wave 25: Little's-law consistency and Taylor's power law.

Little's law L = λW is the queueing identity every capacity model
quietly assumes; auditing it against data catches broken duration
logging and boundary truncation. Taylor's law (variance ∝ mean^b
across populations) is the fluctuation-scaling diagnostic — b ≈ 1 is
Poisson-like arrivals, b → 2 means burst-dominated traffic, which
changes how you provision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load


@query(
    "littles_law_audit",
    oracle="""
    WITH o AS (
      SELECT o.o_orderkey AS k, CAST(o.o_orderdate AS DATE) AS arr,
             least(greatest(max(CAST(l.l_shipdate AS DATE)),
                            CAST(o.o_orderdate AS DATE)),
                   (SELECT max(CAST(o_orderdate AS DATE)) FROM orders))
               AS dep_trunc,
             greatest(max(CAST(l.l_shipdate AS DATE)),
                      CAST(o.o_orderdate AS DATE)) AS dep_full
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
    ), win AS (
      SELECT CAST(date_diff('day', min(arr), max(arr)) + 1 AS BIGINT)
               AS d
      FROM o
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           w.d AS window_days,
           round(count(*) * 1.0 / w.d, 4) AS lambda_per_day,
           round(sum(date_diff('day', arr, dep_full)) * 1.0 / count(*),
                 4) AS w_days,
           round(sum(date_diff('day', arr, dep_trunc)) * 1.0 / w.d, 4)
             AS l_inflight,
           round(count(*) * 1.0 / w.d
                 * (sum(date_diff('day', arr, dep_full)) * 1.0
                    / count(*)), 4) AS lambda_times_w,
           CAST(round((count(*) * 1.0 / w.d
                       * (sum(date_diff('day', arr, dep_full)) * 1.0
                          / count(*))
                       - sum(date_diff('day', arr, dep_trunc)) * 1.0
                         / w.d)
                      * 1000000
                      / (count(*) * 1.0 / w.d
                         * (sum(date_diff('day', arr, dep_full)) * 1.0
                            / count(*)))) AS BIGINT)
             AS boundary_gap_ppm
    FROM o CROSS JOIN win w
    GROUP BY w.d
    """,
)
def littles_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's-law audit over the order pipeline: arrival = order
    date, departure = last line shipped; λ = orders/day over the
    observation window, W = mean full time-in-system, L = mean
    in-flight count (integral of truncated durations over the
    window). The identity L = λW holds EXACTLY when every departure
    falls inside the window, so the reported gap isolates the
    boundary effect (orders still open at window end) — the
    queueing-theory consistency check that catches broken duration
    logging and censoring bias in one number.

    Determinism: all durations are exact integer day differences;
    the three statistics are closed-form over integer sums.

    Scale: one map-side-combined groupBy(order) over the join, one
    integer re-aggregate — the window bounds come from a 1-row
    broadcast min/max.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    win_end = o.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("we")
    ).collect()[0][0]
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderdate").cast("date").alias("arr"),
        )
        .agg(
            F.greatest(
                F.max(F.col("l_shipdate").cast("date")), F.col("arr")
            ).alias("dep_full")
        )
        .select(
            "k",
            "arr",
            "dep_full",
            F.least(F.col("dep_full"), F.lit(win_end)).alias("dep_trunc"),
        )
    )
    win = per_order.agg(
        (
            F.datediff(F.max("arr"), F.min("arr")) + 1
        )
        .cast("bigint")
        .alias("d")
    )
    agg = per_order.crossJoin(F.broadcast(win)).groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.datediff("dep_full", "arr")).cast("bigint").alias("sw"),
        F.sum(F.datediff("dep_trunc", "arr"))
        .cast("bigint")
        .alias("st"),
    )
    lam = F.col("n") * 1.0 / F.col("d")
    w_days = F.col("sw") * 1.0 / F.col("n")
    l_in = F.col("st") * 1.0 / F.col("d")
    return agg.select(
        F.col("n").alias("n_orders"),
        F.col("d").alias("window_days"),
        F.round(lam, 4).alias("lambda_per_day"),
        F.round(w_days, 4).alias("w_days"),
        F.round(l_in, 4).alias("l_inflight"),
        F.round(lam * w_days, 4).alias("lambda_times_w"),
        F.round((lam * w_days - l_in) * 1000000 / (lam * w_days))
        .cast("bigint")
        .alias("boundary_gap_ppm"),
    )


@query(
    "taylors_law_fit",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ), grp AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(x * x) AS BIGINT) AS s2
      FROM daily GROUP BY event_type
    ), mv AS (
      SELECT event_type, n_days,
             s1 * 1.0 / n_days AS m,
             (s2 - s1 * 1.0 * s1 / n_days) / (n_days - 1) AS v
      FROM grp
    ), fit AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(ln(m) ORDER BY event_type)), (a, b) -> a + b) AS sx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(ln(v) ORDER BY event_type)), (a, b) -> a + b) AS sy,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(ln(m) * ln(m) ORDER BY event_type)),
               (a, b) -> a + b) AS sxx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(ln(m) * ln(v) ORDER BY event_type)),
               (a, b) -> a + b) AS sxy
      FROM mv WHERE m > 0 AND v > 0
    )
    SELECT mv.event_type,
           round(mv.m, 4) AS mean_daily,
           round(mv.v, 4) AS var_daily,
           round(mv.v / mv.m, 4) AS dispersion_index,
           round((f.k * f.sxy - f.sx * f.sy)
                 / (f.k * f.sxx - f.sx * f.sx), 6) AS taylor_b
    FROM mv CROSS JOIN fit f
    ORDER BY mv.event_type
    """,
)
def taylors_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Taylor's power law across the event-type populations: each
    series' daily-count variance against its mean on log-log axes,
    the fitted exponent b from Var = a·Mean^b — b ≈ 1 is Poisson-like
    (provision for the mean), b → 2 means fluctuations scale with the
    mean itself (provision for bursts; autoscaling must react, not
    average). Per-series dispersion indices accompany the pooled
    exponent (the cross-population generalization of
    `fano_burstiness`' single-series index).

    Determinism: per-series moments are exact integers; the 5-point
    log-log OLS folds in series order.

    Scale: one map-side-combined groupBy((series, day)) then a
    series-level aggregate; the fit is k-row arithmetic.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    grp = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("s2"),
    )
    mv = grp.select(
        "event_type",
        (F.col("s1") * 1.0 / F.col("n_days")).alias("m"),
        (
            (F.col("s2") - F.col("s1") * 1.0 * F.col("s1") / F.col("n_days"))
            / (F.col("n_days") - 1)
        ).alias("v"),
    )

    def fold(expr: str) -> F.Column:
        return F.expr(
            f"""
            aggregate(transform(array_sort(collect_list(struct(event_type,
                ({expr}) AS vv))), s -> s.vv), CAST(0.0 AS DOUBLE),
              (a, b) -> a + b)
            """
        )

    fit = mv.filter((F.col("m") > 0) & (F.col("v") > 0)).agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        fold("ln(m)").alias("sx"),
        fold("ln(v)").alias("sy"),
        fold("ln(m) * ln(m)").alias("sxx"),
        fold("ln(m) * ln(v)").alias("sxy"),
    )
    b = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        mv.crossJoin(F.broadcast(fit))
        .select(
            "event_type",
            F.round("m", 4).alias("mean_daily"),
            F.round("v", 4).alias("var_daily"),
            F.round(F.col("v") / F.col("m"), 4).alias("dispersion_index"),
            F.round(b, 6).alias("taylor_b"),
        )
        .orderBy("event_type")
    )
