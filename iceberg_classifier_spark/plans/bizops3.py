"""Business-ops wave 3: revenue-recognition waterfall and peak
detection.

Deferred-revenue waterfalls spread each contract's value over its
service months with exact cent accounting (the close-process query
every finance warehouse runs); peak detection flags the local maxima
of an operational series — the alerting primitive between plain
thresholds (seasonal_anomaly_zscore) and changepoints (binseg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_RR_MONTHS = 12  # recognition schedule length


@query(
    "revenue_recognition_waterfall",
    oracle=f"""
    WITH contracts AS (
      SELECT o_orderkey,
             CAST((year(o_orderdate) - 1995) * 12
                  + month(o_orderdate) - 1 AS BIGINT) AS m0,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderpriority = '1-URGENT'
    ), sched AS (
      SELECT c.o_orderkey, c.m0 + s.k AS month_idx,
             c.cents // {_RR_MONTHS}
               + CASE WHEN s.k < c.cents % {_RR_MONTHS} THEN 1 ELSE 0 END
               AS rec_cents
      FROM contracts c CROSS JOIN
           (SELECT unnest(range({_RR_MONTHS})) AS k) s
    ), monthly AS (
      SELECT month_idx,
             CAST(count(*) AS BIGINT) AS n_contracts,
             CAST(sum(rec_cents) AS BIGINT) AS recognized_cents
      FROM sched GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(cents) AS BIGINT) AS total_contracted
      FROM contracts
    )
    SELECT m.month_idx, m.n_contracts, m.recognized_cents,
           CAST(sum(m.recognized_cents) OVER (ORDER BY m.month_idx)
                AS BIGINT) AS cum_recognized_cents,
           CAST(t.total_contracted
                - sum(m.recognized_cents) OVER (ORDER BY m.month_idx)
                AS BIGINT) AS deferred_cents
    FROM monthly m CROSS JOIN tot t
    ORDER BY month_idx
    """,
)
def revenue_recognition_waterfall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deferred-revenue recognition waterfall: each urgent-priority
    order is a {_RR_MONTHS}-month service contract whose value spreads
    over its recognition schedule by integer largest-remainder (first
    `cents % 12` months get the extra cent — every contract's schedule
    sums to EXACTLY its contracted cents, the invariant auditors
    check), then rolled up to recognized-per-month, cumulative, and
    remaining-deferred balances. The proration_largest_remainder
    pattern applied to the time axis — the finance-close query that
    must be exact to the cent, and is.

    Scale: the schedule explode is a bounded ×{_RR_MONTHS} Generate
    against a {_RR_MONTHS}-row broadcast dimension (how real rev-rec
    engines materialize schedules); the rollup aggregates map-side;
    the waterfall window runs over the bounded month dimension.
    """
    contracts = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(
        "o_orderkey",
        F.expr(
            "CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1"
            " AS BIGINT)"
        ).alias("m0"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    ks = spark.range(0, _RR_MONTHS).select(F.col("id").alias("k"))
    sched = contracts.crossJoin(F.broadcast(ks)).select(
        (F.col("m0") + F.col("k")).alias("month_idx"),
        (
            F.expr(f"cents div {_RR_MONTHS}")
            + F.when(F.col("k") < F.col("cents") % _RR_MONTHS, 1).otherwise(0)
        ).alias("rec_cents"),
    )
    monthly = sched.groupBy("month_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_contracts"),
        F.sum("rec_cents").cast("bigint").alias("recognized_cents"),
    )
    tot = contracts.agg(
        F.sum("cents").cast("bigint").alias("total_contracted")
    )
    wcum = Window.partitionBy().orderBy("month_idx")
    return (
        monthly.crossJoin(F.broadcast(tot))
        .select(
            "month_idx",
            "n_contracts",
            "recognized_cents",
            F.sum("recognized_cents").over(wcum).cast("bigint").alias(
                "cum_recognized_cents"
            ),
            (
                F.col("total_contracted")
                - F.sum("recognized_cents").over(wcum)
            )
            .cast("bigint")
            .alias("deferred_cents"),
        )
        .orderBy("month_idx")
    )


_PEAK_W = 3  # strict local max over ±3 days


@query(
    "peak_detection_daily",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ), med AS (
      SELECT CAST(quantile_disc(y, 0.5) AS BIGINT) AS m FROM daily
    ), nb AS (
      SELECT day, y,
             max(y) OVER (ORDER BY day
               ROWS BETWEEN {_PEAK_W} PRECEDING AND 1 PRECEDING) AS mx_l,
             max(y) OVER (ORDER BY day
               ROWS BETWEEN 1 FOLLOWING AND {_PEAK_W} FOLLOWING) AS mx_r,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM daily
    )
    SELECT nb.day, nb.y,
           CAST(nb.y - m.m AS BIGINT) AS height_over_median
    FROM nb CROSS JOIN med m
    WHERE nb.rn > {_PEAK_W} AND nb.rn <= nb.n - {_PEAK_W}
      AND nb.y > nb.mx_l AND nb.y > nb.mx_r AND nb.y > m.m
    ORDER BY nb.day
    """,
)
def peak_detection_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum peak detection on the daily event-count series: a
    day is a peak when it strictly exceeds every neighbor within
    ±{_PEAK_W} days AND sits above the series median (edge days with
    truncated windows excluded) — the peak-picking primitive between
    threshold alarms (seasonal_anomaly_zscore) and regime detection
    (binseg_changepoints), reported with height-over-median. Exact
    integer comparisons throughout; the median comes from the discrete
    quantile (quantile_treatment_effects' exact machinery at this
    bounded scale).

    Scale: one map-side-combined groupBy(day); neighbor maxima are
    bounded-frame windows over the calendar day dimension — the same
    dimension-frame exception every series op here documents.
    """
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    # exact discrete median over the bounded day dimension
    wv = Window.partitionBy().orderBy("y")
    wn = Window.partitionBy()
    med = (
        daily.select(
            "y",
            F.row_number().over(wv).alias("r"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .where(F.col("r") == F.expr("(n + 1) div 2"))
        .select(F.col("y").cast("bigint").alias("m"))
    )
    wd = Window.partitionBy().orderBy("day")
    nb = daily.select(
        "day",
        "y",
        F.max("y").over(wd.rowsBetween(-_PEAK_W, -1)).alias("mx_l"),
        F.max("y").over(wd.rowsBetween(1, _PEAK_W)).alias("mx_r"),
        F.row_number().over(wd).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )
    return (
        nb.crossJoin(F.broadcast(med))
        .where(
            (F.col("rn") > _PEAK_W)
            & (F.col("rn") <= F.col("n") - _PEAK_W)
            & (F.col("y") > F.col("mx_l"))
            & (F.col("y") > F.col("mx_r"))
            & (F.col("y") > F.col("m"))
        )
        .select(
            "day",
            "y",
            (F.col("y") - F.col("m")).cast("bigint").alias(
                "height_over_median"
            ),
        )
        .orderBy("day")
    )
