"""DQ/systems wave: sequential-ID gap auditing and PID autoscaler
replay.

Gap/duplicate detection over an ID space is the ingestion-completeness
check every pipeline needs ("did we drop a partition?") — done here
with bucket-partitioned windows so no global sort ever happens. The
PID replay closes the loop on capacity planning: it simulates the
standard proportional-integral-derivative autoscaler against the
observed arrival series (erlang_c_staffing sizes the steady state;
this shows the controller dynamics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_GAP_B = 1024  # id-range bucket width


@query(
    "id_gap_audit",
    oracle=f"""
    WITH ids AS (
      SELECT o_orderkey AS id, o_orderkey // {_GAP_B} AS bkt FROM orders
    ), within AS (
      SELECT bkt, id,
             id - lag(id) OVER (PARTITION BY bkt ORDER BY id) - 1 AS gap
      FROM (SELECT DISTINCT bkt, id FROM ids)
    ), bstat AS (
      SELECT bkt, CAST(min(id) AS BIGINT) AS bmin,
             CAST(max(id) AS BIGINT) AS bmax,
             CAST(max(gap) AS BIGINT) AS max_inner_gap
      FROM within GROUP BY 1
    ), bounds AS (
      SELECT bkt, bmax,
             lead(bmin) OVER (ORDER BY bkt) - bmax - 1 AS boundary_gap,
             max_inner_gap
      FROM bstat
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT id) AS BIGINT) AS n_distinct,
             CAST(min(id) AS BIGINT) AS id_min,
             CAST(max(id) AS BIGINT) AS id_max
      FROM ids
    ), gaps AS (
      SELECT CAST(max(greatest(coalesce(boundary_gap, 0),
                               coalesce(max_inner_gap, 0))) AS BIGINT)
               AS largest_gap
      FROM bounds
    )
    SELECT t.n_rows, t.n_distinct, t.id_min, t.id_max,
           CAST(t.id_max - t.id_min + 1 - t.n_distinct AS BIGINT)
             AS n_missing,
           CAST(t.n_rows - t.n_distinct AS BIGINT) AS n_duplicates,
           g.largest_gap,
           (t.id_max - t.id_min + 1 = t.n_distinct
            AND t.n_rows = t.n_distinct) AS is_dense_unique
    FROM tot t CROSS JOIN gaps g
    """,
)
def id_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-ID completeness audit over the order keys: missing-id
    count (span − distinct), duplicate count, and the LARGEST gap —
    the "did ingestion drop a chunk" check. The gap scan is fully
    bucket-partitioned: within-bucket gaps use a lag window PARTITIONED
    by the {_GAP_B}-wide id-range bucket, and cross-bucket gaps use one
    lead over the bucket-dimension min/max stats — no global sort over
    the id space anywhere (the two-level pattern mandated for
    fact-sized ordered scans). Every number is an exact integer.

    Scale: the distinct-project shuffles once on (bucket, id) with
    map-side combine; bucket stats are dimension-sized; a dropped
    partition shows up as a bucket-boundary gap of ~{_GAP_B}.
    """
    ids = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.expr(f"o_orderkey div {_GAP_B}").alias("bkt"),
    )
    dids = ids.distinct()
    wb = Window.partitionBy("bkt").orderBy("id")
    within = dids.select(
        "bkt",
        "id",
        (F.col("id") - F.lag("id").over(wb) - 1).alias("gap"),
    )
    bstat = within.groupBy("bkt").agg(
        F.min("id").cast("bigint").alias("bmin"),
        F.max("id").cast("bigint").alias("bmax"),
        F.max("gap").cast("bigint").alias("max_inner_gap"),
    )
    wo = Window.partitionBy().orderBy("bkt")
    bounds = bstat.select(
        "bkt",
        (F.lead("bmin").over(wo) - F.col("bmax") - 1).alias("boundary_gap"),
        "max_inner_gap",
    )
    tot = ids.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_distinct("id").cast("bigint").alias("n_distinct"),
        F.min("id").cast("bigint").alias("id_min"),
        F.max("id").cast("bigint").alias("id_max"),
    )
    gaps = bounds.agg(
        F.max(
            F.greatest(
                F.coalesce("boundary_gap", F.lit(0)),
                F.coalesce("max_inner_gap", F.lit(0)),
            )
        )
        .cast("bigint")
        .alias("largest_gap")
    )
    return tot.crossJoin(F.broadcast(gaps)).select(
        "n_rows",
        "n_distinct",
        "id_min",
        "id_max",
        (F.col("id_max") - F.col("id_min") + 1 - F.col("n_distinct"))
        .cast("bigint")
        .alias("n_missing"),
        (F.col("n_rows") - F.col("n_distinct"))
        .cast("bigint")
        .alias("n_duplicates"),
        "largest_gap",
        (
            (F.col("id_max") - F.col("id_min") + 1 == F.col("n_distinct"))
            & (F.col("n_rows") == F.col("n_distinct"))
        ).alias("is_dense_unique"),
    )


_PID_KP = 0.5
_PID_KI = 0.1
_PID_KD = 0.2

# state = [capacity, integral, prev_error, max_under, sum_abs_err]
_PID_SPARK = f"""
    aggregate(
      slice(xs, 2, size(xs) - 1),
      array(xs[0], CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
            CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),
      (acc, v) -> array(
        acc[0] + {_PID_KP} * (v - acc[0]) + {_PID_KI} * (acc[1] + (v - acc[0]))
               + {_PID_KD} * ((v - acc[0]) - acc[2]),
        acc[1] + (v - acc[0]),
        v - acc[0],
        greatest(acc[3], v - acc[0]),
        acc[4] + abs(v - acc[0])
      )
    )
"""

_PID_DUCK = f"""
    list_reduce(
      list_prepend([xs[1], CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                    CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)],
        list_transform(xs[2:], x -> [x, CAST(0.0 AS DOUBLE),
                                     CAST(0.0 AS DOUBLE),
                                     CAST(0.0 AS DOUBLE),
                                     CAST(0.0 AS DOUBLE)])),
      (acc, v) -> [
        acc[1] + {_PID_KP} * (v[1] - acc[1])
               + {_PID_KI} * (acc[2] + (v[1] - acc[1]))
               + {_PID_KD} * ((v[1] - acc[1]) - acc[3]),
        acc[2] + (v[1] - acc[1]),
        v[1] - acc[1],
        greatest(acc[4], v[1] - acc[1]),
        acc[5] + abs(v[1] - acc[1])
      ]
    )
"""


@query(
    "pid_autoscaler_replay",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hr, CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), series AS (
      SELECT list(x ORDER BY hr) AS xs, CAST(count(*) AS BIGINT) AS n
      FROM hourly
    ), fit AS (
      SELECT n, ({_PID_DUCK}) AS st FROM series
    )
    SELECT n AS n_hours,
           round(st[1], 6) AS final_capacity,
           round(st[2], 6) AS integral_term,
           round(st[4], 6) AS max_underprovision,
           round(st[5] / (n - 1), 6) AS mean_abs_error
    FROM fit
    """,
)
def pid_autoscaler_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PID autoscaler replay against the hourly arrival series: a
    proportional-integral-derivative controller (kp={_PID_KP},
    ki={_PID_KI}, kd={_PID_KD}) tracks demand, and the replay reports
    where it would have landed (final capacity, accumulated integral)
    and how it performed (worst under-provision, mean absolute tracking
    error) — the control-loop evaluation capacity teams run before
    trusting an autoscaler with real traffic (erlang_c_staffing gives
    the static answer; this gives the dynamics). The controller state
    is a 5-slot vector carried through one hour-ORDERED array fold —
    identical IEEE updates in both engines, full 6dp oracle.

    Scale: one map-side-combined groupBy(hour); the fold runs over the
    calendar-bounded hour array. Per-service replay partitions the
    same fold by service key.
    """
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    series = hourly.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(hr, x))), s -> s.x)"
        ).alias("xs"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    fit = series.select("n", F.expr(_PID_SPARK).alias("st"))
    return fit.select(
        F.col("n").alias("n_hours"),
        F.round(F.col("st")[0], 6).alias("final_capacity"),
        F.round(F.col("st")[1], 6).alias("integral_term"),
        F.round(F.col("st")[3], 6).alias("max_underprovision"),
        F.round(F.col("st")[4] / (F.col("n") - 1), 6).alias("mean_abs_error"),
    )
