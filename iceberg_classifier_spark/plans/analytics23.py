"""Analytics wave 23: long-memory, random-walk, and range-based
volatility diagnostics.

Hurst's rescaled-range exponent detects long memory (H > 0.5:
trending/persistent, < 0.5: mean-reverting) — the fractal diagnostic
behind capacity burstiness and market persistence debates. The
Lo-MacKinlay variance ratio tests the random-walk hypothesis directly
(VR(q) ≈ 1 under iid increments). Garman-Klass turns the engine's
OHLC bars into a volatility estimate ~7.4× more efficient than
close-to-close returns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_HURST_WINDOWS = [4, 8, 16]


@query(
    "hurst_exponent_rs",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x,
             row_number() OVER (ORDER BY CAST(ts AS DATE)) - 1 AS idx
      FROM events GROUP BY 1
    ), assigned AS (
      SELECT d.day, d.x, d.idx, w.m, d.idx // w.m AS blk
      FROM daily d,
           (SELECT unnest([{", ".join(str(m) for m in _HURST_WINDOWS)}])
              AS m) w
      WHERE d.idx < (SELECT (count(*) // w.m) * w.m FROM daily)
    ), blocks AS (
      SELECT m, blk, CAST(count(*) AS BIGINT) AS nb,
             CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(x * x) AS BIGINT) AS s2,
             list(x ORDER BY idx) AS xs
      FROM assigned GROUP BY m, blk
    ), rs AS (
      SELECT m, blk,
             (list_reduce(list_prepend(CAST([0, -1e18, 1e18]
                 AS DOUBLE[]),
               list_transform(xs, v -> [CAST(v AS DOUBLE), 0, 0])),
               (a, v) -> [a[1] + v[1] - s1 * 1.0 / nb,
                          greatest(a[2], a[1] + v[1] - s1 * 1.0 / nb),
                          least(a[3], a[1] + v[1] - s1 * 1.0 / nb)])[2]
              - list_reduce(list_prepend(CAST([0, -1e18, 1e18]
                  AS DOUBLE[]),
                list_transform(xs, v -> [CAST(v AS DOUBLE), 0, 0])),
                (a, v) -> [a[1] + v[1] - s1 * 1.0 / nb,
                           greatest(a[2], a[1] + v[1] - s1 * 1.0 / nb),
                           least(a[3], a[1] + v[1] - s1 * 1.0 / nb)])[3])
             / sqrt((s2 - s1 * 1.0 * s1 / nb) / nb) AS rs_val
      FROM blocks WHERE s2 * nb > s1 * s1
    ), perm AS (
      SELECT m, CAST(count(*) AS BIGINT) AS n_blocks,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(rs_val ORDER BY blk)), (a, v) -> a + v) / count(*)
               AS mean_rs
      FROM rs GROUP BY m
    ), fit AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(ln(CAST(m AS DOUBLE)) ORDER BY m)),
               (a, v) -> a + v) AS sx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(ln(mean_rs) ORDER BY m)), (a, v) -> a + v) AS sy,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(ln(CAST(m AS DOUBLE)) * ln(CAST(m AS DOUBLE))
                    ORDER BY m)), (a, v) -> a + v) AS sxx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(ln(CAST(m AS DOUBLE)) * ln(mean_rs) ORDER BY m)),
               (a, v) -> a + v) AS sxy
      FROM perm
    )
    SELECT p.m AS window_size, p.n_blocks, round(p.mean_rs, 6) AS mean_rs,
           round((f.k * f.sxy - f.sx * f.sy)
                 / (f.k * f.sxx - f.sx * f.sx), 6) AS hurst_h
    FROM perm p CROSS JOIN fit f
    ORDER BY window_size
    """,
)
def hurst_exponent_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range analysis of the daily event
    series: for window sizes m ∈ {{4, 8, 16}}, split the series into
    blocks, compute each block's R/S (range of cumulative mean
    deviations over the population std), average per m, and read H as
    the log-log OLS slope — H ≈ 0.5 iid, > 0.5 persistent/trending
    (bursts cluster — provision for runs, not averages), < 0.5
    mean-reverting. Emits the per-m curve plus the fitted H.

    Determinism: block sums are exact integers; the cumdev range is a
    [cum, max, min] flat fold in day order per block; per-m means and
    the OLS fold in fixed order.

    Scale: blocks are (m, blk)-keyed — every fold bounded by m;
    parallel across blocks and window sizes (the fact table collapses
    to per-day counts first).
    """
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
        .withColumn(
            "idx", F.row_number().over(Window.orderBy("day")) - 1
        )
    )
    n_days = daily.count()
    ws = spark.createDataFrame(
        [(m,) for m in _HURST_WINDOWS], "m int"
    )
    assigned = (
        daily.crossJoin(F.broadcast(ws))
        .filter(
            F.col("idx")
            < F.floor(F.lit(n_days) / F.col("m")).cast("bigint")
            * F.col("m")
        )
        .select(
            "m",
            (F.col("idx") / F.col("m")).cast("bigint").alias("blk"),
            "idx",
            "x",
        )
    )
    blocks = assigned.groupBy("m", "blk").agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum("x").cast("bigint").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("s2"),
        F.expr(
            "transform(array_sort(collect_list(struct(idx, x))), s -> s.x)"
        ).alias("xs"),
    )
    fold = """
        aggregate(transform(xs, v -> CAST(v AS DOUBLE)),
          CAST(array(0.0, -1e18, 1e18) AS ARRAY<DOUBLE>),
          (a, v) -> array(a[0] + v - s1 * 1.0 / nb,
                          greatest(a[1], a[0] + v - s1 * 1.0 / nb),
                          least(a[2], a[0] + v - s1 * 1.0 / nb)))
    """
    rs = blocks.filter(
        F.col("s2") * F.col("nb") > F.col("s1") * F.col("s1")
    ).select(
        "m",
        "blk",
        (
            (F.expr(f"({fold})[1]") - F.expr(f"({fold})[2]"))
            / F.sqrt(
                (F.col("s2") - F.col("s1") * 1.0 * F.col("s1") / F.col("nb"))
                / F.col("nb")
            )
        ).alias("rs_val"),
    )
    perm = rs.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        (
            F.expr(
                """
                aggregate(transform(array_sort(collect_list(struct(blk,
                    rs_val))), s -> s.rs_val), CAST(0.0 AS DOUBLE),
                  (a, v) -> a + v)
                """
            )
            / F.count(F.lit(1))
        ).alias("mean_rs"),
    )
    fit = perm.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.expr(
            """
            aggregate(transform(array_sort(collect_list(struct(m,
                ln(CAST(m AS DOUBLE)) AS vv))), s -> s.vv),
              CAST(0.0 AS DOUBLE), (a, v) -> a + v)
            """
        ).alias("sx"),
        F.expr(
            """
            aggregate(transform(array_sort(collect_list(struct(m,
                ln(mean_rs) AS vv))), s -> s.vv),
              CAST(0.0 AS DOUBLE), (a, v) -> a + v)
            """
        ).alias("sy"),
        F.expr(
            """
            aggregate(transform(array_sort(collect_list(struct(m,
                ln(CAST(m AS DOUBLE)) * ln(CAST(m AS DOUBLE)) AS vv))),
              s -> s.vv), CAST(0.0 AS DOUBLE), (a, v) -> a + v)
            """
        ).alias("sxx"),
        F.expr(
            """
            aggregate(transform(array_sort(collect_list(struct(m,
                ln(CAST(m AS DOUBLE)) * ln(mean_rs) AS vv))),
              s -> s.vv), CAST(0.0 AS DOUBLE), (a, v) -> a + v)
            """
        ).alias("sxy"),
    )
    h = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        perm.crossJoin(F.broadcast(fit))
        .select(
            F.col("m").cast("bigint").alias("window_size"),
            "n_blocks",
            F.round("mean_rs", 6).alias("mean_rs"),
            F.round(h, 6).alias("hurst_h"),
        )
        .orderBy("window_size")
    )


_VR_QS = [2, 4, 8]


@query(
    "variance_ratio_test",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x,
             row_number() OVER (ORDER BY CAST(ts AS DATE)) AS idx
      FROM events GROUP BY 1
    ), d1 AS (
      SELECT a.idx, b.x - a.x AS r
      FROM daily a JOIN daily b ON b.idx = a.idx + 1
    ), base AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r) AS BIGINT) AS s1,
             CAST(sum(r * r) AS BIGINT) AS s2
      FROM d1
    ), dq AS (
      SELECT q.q, a.idx, b.x - a.x AS rq
      FROM daily a
      JOIN (SELECT unnest([{", ".join(str(q) for q in _VR_QS)}]) AS q) q
        ON 1 = 1
      JOIN daily b ON b.idx = a.idx + q.q
    ), varq AS (
      SELECT q, CAST(count(*) AS BIGINT) AS nq,
             CAST(sum(rq) AS BIGINT) AS sq1,
             CAST(sum(rq * rq) AS BIGINT) AS sq2
      FROM dq GROUP BY q
    )
    SELECT v.q AS horizon_q, b.n AS n_1d_returns, v.nq AS n_qd_returns,
           round(((v.sq2 - v.sq1 * 1.0 * v.sq1 / v.nq) / v.nq)
                 / (v.q * ((b.s2 - b.s1 * 1.0 * b.s1 / b.n) / b.n)), 6)
             AS variance_ratio,
           round((((v.sq2 - v.sq1 * 1.0 * v.sq1 / v.nq) / v.nq)
                  / (v.q * ((b.s2 - b.s1 * 1.0 * b.s1 / b.n) / b.n)) - 1)
                 * sqrt(b.n * 1.0 / (2 * (v.q - 1))), 6) AS z_approx
    FROM varq v CROSS JOIN base b
    ORDER BY horizon_q
    """,
)
def variance_ratio_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio test on the daily event-count
    changes: VR(q) = Var(q-day change)/(q·Var(1-day change)) with the
    homoskedastic z ≈ (VR−1)·√(n/2(q−1)) for q ∈ {{2, 4, 8}} — under a
    random walk VR ≈ 1; VR > 1 means positive serial dependence
    (momentum/bursts), VR < 1 mean reversion. The direct test of the
    hypothesis `runs_test_daily` and `ljung_box_test` probe through
    signs and autocorrelation mass.

    Determinism: q-day changes are exact integer differences via
    index self-joins; variances come from exact (n, Σr, Σr²).

    Scale: per-day aggregate first; the lag joins are index-keyed on
    the bounded day dimension.
    """
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
        .withColumn("idx", F.row_number().over(Window.orderBy("day")))
    )
    a = daily.alias("a")
    b = daily.alias("b")
    d1 = a.join(b, F.col("b.idx") == F.col("a.idx") + 1).select(
        (F.col("b.x") - F.col("a.x")).alias("r")
    )
    base = d1.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").cast("bigint").alias("s1"),
        F.sum(F.col("r") * F.col("r")).cast("bigint").alias("s2"),
    )
    qs = spark.createDataFrame([(q,) for q in _VR_QS], "q int")
    dq = (
        a.crossJoin(F.broadcast(qs))
        .join(b, F.col("b.idx") == F.col("a.idx") + F.col("q"))
        .select("q", (F.col("b.x") - F.col("a.x")).alias("rq"))
    )
    varq = dq.groupBy("q").agg(
        F.count(F.lit(1)).cast("bigint").alias("nq"),
        F.sum("rq").cast("bigint").alias("sq1"),
        F.sum(F.col("rq") * F.col("rq")).cast("bigint").alias("sq2"),
    )
    var1 = (F.col("s2") - F.col("s1") * 1.0 * F.col("s1") / F.col("n")) / F.col(
        "n"
    )
    varq_e = (
        F.col("sq2") - F.col("sq1") * 1.0 * F.col("sq1") / F.col("nq")
    ) / F.col("nq")
    vr = varq_e / (F.col("q") * var1)
    return (
        varq.crossJoin(F.broadcast(base))
        .select(
            F.col("q").cast("bigint").alias("horizon_q"),
            F.col("n").alias("n_1d_returns"),
            F.col("nq").alias("n_qd_returns"),
            F.round(vr, 6).alias("variance_ratio"),
            F.round(
                (vr - 1) * F.sqrt(F.col("n") * 1.0 / (2 * (F.col("q") - 1))),
                6,
            ).alias("z_approx"),
        )
        .orderBy("horizon_q")
    )


@query(
    "garman_klass_volatility",
    oracle="""
    WITH v AS (
      SELECT event_type, date_trunc('hour', ts) AS bar, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY event_type,
               date_trunc('hour', ts) ORDER BY ts, event_id) AS rn_open,
             row_number() OVER (PARTITION BY event_type,
               date_trunc('hour', ts) ORDER BY ts DESC, event_id DESC)
               AS rn_close
      FROM events
    ), bars AS (
      SELECT event_type, bar,
             max(CASE WHEN rn_open = 1 THEN cents END) AS o,
             max(cents) AS h, min(cents) AS l,
             max(CASE WHEN rn_close = 1 THEN cents END) AS c,
             CAST(count(*) AS BIGINT) AS n_ticks
      FROM v GROUP BY 1, 2 HAVING count(*) >= 2 AND min(cents) > 0
    ), gk AS (
      SELECT event_type, bar,
             0.5 * ln(h * 1.0 / l) * ln(h * 1.0 / l)
             - (2 * ln(2) - 1) * ln(c * 1.0 / o) * ln(c * 1.0 / o)
               AS gk_var
      FROM bars
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_bars,
           round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(gk_var ORDER BY bar)), (a, v) -> a + v) / count(*), 8)
             AS mean_gk_var,
           round(sqrt(greatest(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(gk_var ORDER BY bar)), (a, v) -> a + v) / count(*),
             0.0)), 6) AS gk_volatility
    FROM gk GROUP BY event_type ORDER BY event_type
    """,
)
def garman_klass_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Garman-Klass range-based volatility per event series from the
    hourly OHLC bars (`events_ohlc_bars`' deterministic open/close
    construction): σ̂² = ½·ln(H/L)² − (2ln2−1)·ln(C/O)² per bar,
    averaged per series — the range-based estimator ~7.4× more
    statistically efficient than close-to-close returns because the
    intra-bar extremes carry most of the information.

    Determinism: OHLC come from exact integer cents with (ts,
    event_id)-ranked open/close; per-bar GK terms are identical
    doubles folded in bar order.

    Scale: one window + aggregate pass partitioned by (series, hour);
    the volatility aggregate runs over the bounded bar dimension per
    series.
    """
    e = load(spark, sf_dir, "events")
    w_open = Window.partitionBy(
        "event_type", F.date_trunc("hour", F.col("ts"))
    ).orderBy("ts", "event_id")
    w_close = Window.partitionBy(
        "event_type", F.date_trunc("hour", F.col("ts"))
    ).orderBy(F.desc("ts"), F.desc("event_id"))
    v = e.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bar"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.row_number().over(w_open).alias("rn_open"),
        F.row_number().over(w_close).alias("rn_close"),
    )
    bars = (
        v.groupBy("event_type", "bar")
        .agg(
            F.max(
                F.when(F.col("rn_open") == 1, F.col("cents"))
            ).alias("o"),
            F.max("cents").alias("h"),
            F.min("cents").alias("l"),
            F.max(
                F.when(F.col("rn_close") == 1, F.col("cents"))
            ).alias("c"),
            F.count(F.lit(1)).cast("bigint").alias("n_ticks"),
        )
        .filter((F.col("n_ticks") >= 2) & (F.col("l") > 0))
    )
    gk_var = 0.5 * F.log(F.col("h") * 1.0 / F.col("l")) * F.log(
        F.col("h") * 1.0 / F.col("l")
    ) - (2 * 0.6931471805599453 - 1) * F.log(
        F.col("c") * 1.0 / F.col("o")
    ) * F.log(F.col("c") * 1.0 / F.col("o"))
    gk = bars.select("event_type", "bar", gk_var.alias("gk_var"))
    return (
        gk.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bars"),
            (
                F.expr(
                    """
                    aggregate(transform(array_sort(collect_list(
                        struct(bar, gk_var))), s -> s.gk_var),
                      CAST(0.0 AS DOUBLE), (a, v) -> a + v)
                    """
                )
                / F.count(F.lit(1))
            ).alias("mean_gk"),
        )
        .select(
            "event_type",
            "n_bars",
            F.round("mean_gk", 8).alias("mean_gk_var"),
            F.round(
                F.sqrt(F.greatest(F.col("mean_gk"), F.lit(0.0))), 6
            ).alias("gk_volatility"),
        )
        .orderBy("event_type")
    )
