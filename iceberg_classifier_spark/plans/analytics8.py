"""Analytics wave 8: CDC changelog compaction and rolling-origin
forecast backtesting.

Log compaction is the Debezium→lakehouse ingestion primitive (latest
image per key wins, deletes tombstone); the rolling-origin backtest is
how forecasting models are actually evaluated in production — refit on
each prefix, score the one-step-ahead error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

# event_type -> CDC operation: the events stream replayed as a changelog
_CDC_OP = (
    "CASE WHEN event_type = 'signup' THEN 'INSERT'"
    " WHEN event_type = 'error' THEN 'DELETE'"
    " ELSE 'UPSERT' END"
)


@query(
    "cdc_log_compaction",
    oracle=f"""
    WITH log AS (
      SELECT user_id, ts, event_id,
             {_CDC_OP} AS op,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ), ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
               AS n_log_entries
      FROM log
    ), latest AS (
      SELECT user_id, op AS final_op, ts AS final_ts, cents AS final_cents,
             n_log_entries
      FROM ranked WHERE rn = 1
    )
    SELECT user_id, final_op, final_ts, final_cents, n_log_entries,
           (final_op <> 'DELETE') AS survives
    FROM latest ORDER BY user_id
    """,
)
def cdc_log_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog compaction: replay the event stream as a Debezium-
    style log (signup=INSERT, error=DELETE tombstone, everything else=
    UPSERT), keep only the LATEST image per key by (ts, event_id), and
    mark tombstoned keys — the kernel behind Kafka compacted topics and
    every streaming-CDC→lakehouse materializer (orders_merge_upsert
    merges two static tables; this collapses an ordered log, delete
    semantics included). Ordering ties break on event_id so the winner
    is exact.

    Scale: one shuffle on the key with a per-key window — the
    partitioned max-by shape (never a global rank). Production
    compaction is this exact plan run per micro-batch with the previous
    snapshot unioned in as one more log segment; key-skew is handled by
    the same salting the repo uses in skew_salted_join.
    """
    log = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.expr(_CDC_OP).alias("op"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    wc = Window.partitionBy("user_id")
    ranked = log.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).cast("bigint").alias("n_log_entries"),
    )
    return (
        ranked.where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("op").alias("final_op"),
            F.col("ts").alias("final_ts"),
            F.col("cents").alias("final_cents"),
            "n_log_entries",
            (F.col("op") != "DELETE").alias("survives"),
        )
        .orderBy("user_id")
    )


_BT_ORIGINS = 14  # evaluate the last 14 one-step-ahead forecasts
_BT_A = 0.5  # Holt level smoothing (matches exp_smoothing_forecast)
_BT_B = 0.3  # Holt trend smoothing


@query(
    "forecast_backtest_rolling",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), series AS (
      SELECT list(x ORDER BY day) AS xs, CAST(count(*) AS BIGINT) AS n
      FROM daily
    ), origins AS (
      SELECT s.xs, s.n, o.h
      FROM series s,
           (SELECT unnest(range(1, {_BT_ORIGINS} + 1)) AS h) o
      WHERE s.n - o.h >= 2
    ), fits AS (
      SELECT n, h,
             xs[CAST(n - h + 1 AS BIGINT)] AS actual,
             list_reduce(
               list_prepend([xs[1], CAST(0.0 AS DOUBLE)],
                 list_transform(xs[2:CAST(n - h AS BIGINT)],
                                x -> [x, CAST(0.0 AS DOUBLE)])),
               (acc, v) -> [
                 {_BT_A} * v[1] + {1 - _BT_A} * (acc[1] + acc[2]),
                 {_BT_B} * (({_BT_A} * v[1] + {1 - _BT_A} * (acc[1] + acc[2]))
                            - acc[1]) + {1 - _BT_B} * acc[2]
               ]) AS lt
      FROM origins
    )
    SELECT CAST(n - h AS BIGINT) AS train_len,
           round(actual, 6) AS actual,
           round(lt[1] + lt[2], 6) AS forecast,
           round(abs(actual - (lt[1] + lt[2])), 6) AS abs_err,
           round(abs(actual - (lt[1] + lt[2])) / actual, 6) AS ape
    FROM fits ORDER BY train_len
    """,
)
def forecast_backtest_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast backtest: for each of the last
    {_BT_ORIGINS} days, refit the Holt linear smoother
    (exp_smoothing_forecast's α={_BT_A}/β={_BT_B}) on the series prefix
    ENDING before that day and score the one-step-ahead forecast
    against the actual — the out-of-sample evaluation discipline
    (sliding-origin cross-validation) that separates a usable
    forecaster from an in-sample curve fit. Each refit is an ordered
    fold over the day-sorted prefix array (identical left-to-right IEEE
    ops in both engines), so every forecast and APE carries a full 6dp
    oracle.

    Scale: one map-side-combined groupBy(day) builds the series once;
    the {_BT_ORIGINS} origins explode off a range dimension and each
    fold runs over a slice of the SAME per-key array — no re-scan, no
    shuffle growth with origins. Calendar-bounded array sizes make this
    the right shape below ~1e5 points; beyond that the associative
    matrix-prefix-product scan distributes the recurrence.
    """
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    series = daily.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, x))), s -> s.x)"
        ).alias("xs"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    origins = (
        series.crossJoin(
            spark.range(1, _BT_ORIGINS + 1).select(F.col("id").alias("h"))
        )
        .where(F.col("n") - F.col("h") >= 2)
    )
    a, b = _BT_A, _BT_B
    newl = f"{a} * v + {1 - a} * (acc[0] + acc[1])"
    fits = origins.select(
        "n",
        "h",
        F.expr("xs[CAST(n - h AS INT)]").alias("actual"),
        F.expr(
            f"""
            aggregate(
              slice(xs, 2, CAST(n - h - 1 AS INT)),
              array(xs[0], CAST(0.0 AS DOUBLE)),
              (acc, v) -> array(
                {newl},
                {b} * (({newl}) - acc[0]) + {1 - b} * acc[1]
              )
            )
            """
        ).alias("lt"),
    )
    return fits.select(
        (F.col("n") - F.col("h")).cast("bigint").alias("train_len"),
        F.round("actual", 6).alias("actual"),
        F.round(F.col("lt")[0] + F.col("lt")[1], 6).alias("forecast"),
        F.round(F.abs(F.col("actual") - (F.col("lt")[0] + F.col("lt")[1])), 6).alias(
            "abs_err"
        ),
        F.round(
            F.abs(F.col("actual") - (F.col("lt")[0] + F.col("lt")[1]))
            / F.col("actual"),
            6,
        ).alias("ape"),
    ).orderBy("train_len")
