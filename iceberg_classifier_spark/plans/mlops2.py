"""MLOps wave 2: RANSAC robust fitting, SLO burn-rate alerting, and
successive-halving hyperparameter scheduling.

RANSAC is the consensus-based robust fit (outliers get votes, not
leverage); multiwindow burn-rate alerts are the Google-SRE-workbook
standard for paging on error budgets; successive halving (the core of
Hyperband) is the budget-aware scheduler that replaced grid search in
production tuning. All three run on dimension-sized frames with exact
integer decisions, so each carries a full value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_RANSAC_K = 25  # deterministic candidate models


@query(
    "ransac_line_fit",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
             y
      FROM (
        SELECT date_trunc('day', o_orderdate) AS day,
               CAST(round(sum(o_totalprice)) AS BIGINT) AS y
        FROM orders GROUP BY 1
      )
    ), tot AS (
      SELECT CAST(max(rn) AS BIGINT) AS n,
             CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) / max(rn) AS ybar
      FROM daily
    ), cand AS (
      SELECT c.cid,
             CAST(c.cid + 1 AS BIGINT) AS i,
             CAST(t.n - c.cid AS BIGINT) AS j
      FROM (SELECT unnest(range({_RANSAC_K})) AS cid) c
      CROSS JOIN tot t
      WHERE c.cid + 1 < t.n - c.cid
    ), model AS (
      SELECT cd.cid, cd.i, cd.j,
             CAST(pj.y - pi.y AS DOUBLE) / (cd.j - cd.i) AS slope,
             pi.y - CAST(pj.y - pi.y AS DOUBLE) / (cd.j - cd.i) * cd.i
               AS icept
      FROM cand cd
      JOIN daily pi ON pi.rn = cd.i
      JOIN daily pj ON pj.rn = cd.j
    ), votes AS (
      SELECT m.cid, m.i, m.j, m.slope, m.icept,
             CAST(sum(CASE WHEN abs(d.y - (m.icept + m.slope * d.rn))
                                <= 0.1 * t.ybar
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_inliers,
             CAST(max(t.n) AS BIGINT) AS n
      FROM model m CROSS JOIN tot t JOIN daily d ON TRUE
      GROUP BY 1, 2, 3, 4, 5
    ), best AS (
      SELECT * FROM votes ORDER BY n_inliers DESC, cid LIMIT 1
    )
    SELECT CAST(cid AS BIGINT) AS cand_id, i AS rn_a, j AS rn_b,
           round(slope, 6) AS slope, round(icept, 6) AS intercept,
           n_inliers, n AS n_days,
           CAST(n_inliers * 1000000 // n AS BIGINT) AS inlier_frac_ppm
    FROM best
    """,
)
def ransac_line_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC line fit of the daily revenue trend: {_RANSAC_K}
    deterministic two-point candidate models (endpoints (c+1, n−c) —
    no RNG needed for an oracle-able consensus search), each voted on
    by every day within a ±10%-of-mean residual band, best model by
    inlier count. Unlike OLS (ols_normal_equations) a few crazy days
    can't drag the line — the consensus set ignores them; unlike
    Theil-Sen (theil_sen_trend) the answer comes with its inlier
    support attached. Candidate geometry and votes are exact integer
    comparisons on identically-computed doubles, so the winning model
    is bit-exact.

    Scale: the day series is calendar-bounded, so the candidates×days
    vote join is dimension-sized; at 10⁹-point regressions RANSAC
    becomes sampled candidates over a broadcast model dimension with
    the same vote-aggregate shape — map-side-combined, one pass per
    candidate batch.
    """
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(F.round(F.sum("o_totalprice")).cast("bigint").alias("y"))
        .select(
            F.row_number().over(Window.orderBy("day")).cast("bigint").alias("rn"),
            "y",
        )
    )
    tot = daily.agg(
        F.max("rn").cast("bigint").alias("n"),
        (F.sum("y").cast("bigint").cast("double") / F.max("rn")).alias("ybar"),
    )
    cand = (
        spark.range(0, _RANSAC_K)
        .select(F.col("id").alias("cid"))
        .crossJoin(F.broadcast(tot))
        .where(F.col("cid") + 1 < F.col("n") - F.col("cid"))
        .select(
            "cid",
            (F.col("cid") + 1).cast("bigint").alias("i"),
            (F.col("n") - F.col("cid")).cast("bigint").alias("j"),
        )
    )
    pi = daily.select(F.col("rn").alias("ri"), F.col("y").alias("yi"))
    pj = daily.select(F.col("rn").alias("rj"), F.col("y").alias("yj"))
    model = (
        cand.join(F.broadcast(pi), F.col("i") == F.col("ri"))
        .join(F.broadcast(pj), F.col("j") == F.col("rj"))
        .select(
            "cid",
            "i",
            "j",
            ((F.col("yj") - F.col("yi")).cast("double") / (F.col("j") - F.col("i"))).alias(
                "slope"
            ),
            (
                F.col("yi")
                - (F.col("yj") - F.col("yi")).cast("double")
                / (F.col("j") - F.col("i"))
                * F.col("i")
            ).alias("icept"),
        )
    )
    votes = (
        model.crossJoin(F.broadcast(tot))
        .join(daily, F.lit(True))
        .groupBy("cid", "i", "j", "slope", "icept")
        .agg(
            F.sum(
                F.when(
                    F.abs(
                        F.col("y") - (F.col("icept") + F.col("slope") * F.col("rn"))
                    )
                    <= 0.1 * F.col("ybar"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_inliers"),
            F.max("n").cast("bigint").alias("n"),
        )
    )
    best = votes.orderBy(F.desc("n_inliers"), "cid").limit(1)
    return best.select(
        F.col("cid").cast("bigint").alias("cand_id"),
        F.col("i").alias("rn_a"),
        F.col("j").alias("rn_b"),
        F.round("slope", 6).alias("slope"),
        F.round("icept", 6).alias("intercept"),
        "n_inliers",
        F.col("n").alias("n_days"),
        F.expr("CAST(n_inliers * 1000000 div n AS BIGINT)").alias(
            "inlier_frac_ppm"
        ),
    )


_SLO_PPM = 25000  # error budget: 2.5% of events may be errors


@query(
    "slo_burn_rate_alerts",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hr,
             CAST(count(*) AS BIGINT) AS total,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS errors
      FROM events GROUP BY 1
    ), win AS (
      SELECT hr, total, errors,
             CAST(sum(total) OVER (ORDER BY hr
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS t6,
             CAST(sum(errors) OVER (ORDER BY hr
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS e6
      FROM hourly
    )
    SELECT hr, total, errors,
           CAST(errors * 1000000 // total AS BIGINT) AS err_rate_ppm,
           CAST(errors * 1000000 * 100 // ({_SLO_PPM} * total) AS BIGINT)
             AS burn_1h_x100,
           CAST(e6 * 1000000 * 100 // ({_SLO_PPM} * t6) AS BIGINT)
             AS burn_6h_x100,
           (errors * 1000000 * 10 >= 144 * {_SLO_PPM} * total
            AND e6 * 1000000 >= 6 * {_SLO_PPM} * t6) AS page_fast_burn
    FROM win ORDER BY hr
    """,
)
def slo_burn_rate_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiwindow SLO burn-rate alerting (Google SRE workbook): with a
    2.5% error budget, compute each hour's burn rate (error rate
    ÷ budget) and the trailing-6h burn rate, and raise the fast-burn
    page exactly when burn_1h ≥ 14.4 AND burn_6h ≥ 6 — the two-window
    AND that makes pages both fast and non-flappy. Every rate and
    threshold comparison is EXACT integer arithmetic (burn×100 via
    integer division, the 14.4 threshold cross-multiplied to integers),
    so alert decisions carry bit-exact oracles — the property you want
    from the thing that wakes humans at 3am.

    Scale: one map-side-combined groupBy(hour); the rolling window runs
    over the calendar-bounded hour dimension (the documented dimension-
    frame exception — ≤8.8k rows/year). Per-service fan-out partitions
    the same window by service key.
    """
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("errors"),
        )
    )
    w6 = Window.partitionBy().orderBy("hr").rowsBetween(-5, 0)
    win = hourly.select(
        "hr",
        "total",
        "errors",
        F.sum("total").over(w6).cast("bigint").alias("t6"),
        F.sum("errors").over(w6).cast("bigint").alias("e6"),
    )
    return win.select(
        "hr",
        "total",
        "errors",
        F.expr("CAST(errors * 1000000 div total AS BIGINT)").alias(
            "err_rate_ppm"
        ),
        F.expr(
            f"CAST(errors * 1000000 * 100 div ({_SLO_PPM} * total) AS BIGINT)"
        ).alias("burn_1h_x100"),
        F.expr(
            f"CAST(e6 * 1000000 * 100 div ({_SLO_PPM} * t6) AS BIGINT)"
        ).alias("burn_6h_x100"),
        (
            (F.col("errors") * 1000000 * 10 >= 144 * _SLO_PPM * F.col("total"))
            & (F.col("e6") * 1000000 >= 6 * _SLO_PPM * F.col("t6"))
        ).alias("page_fast_burn"),
    ).orderBy("hr")


_SHA_CONFIGS = 16
_SHA_RUNGS = (1, 2, 4, 8)  # budget per rung; half survive each rung
_HEX = "0123456789abcdef"


def _sha_loss_sql(cfg: str, rung: str) -> str:
    """Deterministic micro-loss in [0, 1e6): md5-derived per (config,
    budget), decreasing-in-expectation with budget via a rung discount."""
    h = (
        f"((strpos('{_HEX}', substr(md5(CAST({cfg} AS VARCHAR) || '@' ||"
        f" CAST({rung} AS VARCHAR)), 1, 1)) - 1) * 65536"
        f" + (strpos('{_HEX}', substr(md5(CAST({cfg} AS VARCHAR) || '@' ||"
        f" CAST({rung} AS VARCHAR)), 2, 1)) - 1) * 4096"
        f" + (strpos('{_HEX}', substr(md5(CAST({cfg} AS VARCHAR) || '@' ||"
        f" CAST({rung} AS VARCHAR)), 3, 1)) - 1) * 256)"
    )
    return f"({h} // {rung})"


def _sha_loss_spark(cfg: str, rung: str) -> str:
    return (
        f"(CAST(conv(substr(md5(CAST(concat(CAST({cfg} AS STRING), '@',"
        f" CAST({rung} AS STRING)) AS BINARY)), 1, 3), 16, 10) AS BIGINT)"
        f" * 256 div {rung})"
    )


@query(
    "successive_halving_replay",
    oracle=f"""
    WITH cfgs AS (SELECT unnest(range(1, {_SHA_CONFIGS} + 1)) AS cfg),
    r1 AS (
      SELECT cfg, CAST({_sha_loss_sql("cfg", "1")} AS BIGINT) AS loss,
             row_number() OVER (ORDER BY {_sha_loss_sql("cfg", "1")}, cfg)
               AS rk
      FROM cfgs
    ),
    r2 AS (
      SELECT cfg, CAST({_sha_loss_sql("cfg", "2")} AS BIGINT) AS loss,
             row_number() OVER (ORDER BY {_sha_loss_sql("cfg", "2")}, cfg)
               AS rk
      FROM r1 WHERE rk <= {_SHA_CONFIGS // 2}
    ),
    r4 AS (
      SELECT cfg, CAST({_sha_loss_sql("cfg", "4")} AS BIGINT) AS loss,
             row_number() OVER (ORDER BY {_sha_loss_sql("cfg", "4")}, cfg)
               AS rk
      FROM r2 WHERE rk <= {_SHA_CONFIGS // 4}
    ),
    r8 AS (
      SELECT cfg, CAST({_sha_loss_sql("cfg", "8")} AS BIGINT) AS loss,
             row_number() OVER (ORDER BY {_sha_loss_sql("cfg", "8")}, cfg)
               AS rk
      FROM r4 WHERE rk <= {_SHA_CONFIGS // 8}
    ),
    allr AS (
      SELECT 1 AS rung, cfg, loss, (rk <= {_SHA_CONFIGS // 2}) AS survived
      FROM r1
      UNION ALL
      SELECT 2, cfg, loss, (rk <= {_SHA_CONFIGS // 4}) FROM r2
      UNION ALL
      SELECT 4, cfg, loss, (rk <= {_SHA_CONFIGS // 8}) FROM r4
      UNION ALL
      SELECT 8, cfg, loss, (rk <= 1) FROM r8
    )
    SELECT CAST(rung AS BIGINT) AS rung, CAST(cfg AS BIGINT) AS config,
           loss AS micro_loss, survived
    FROM allr ORDER BY rung, micro_loss, config
    """,
)
def successive_halving_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Successive-halving scheduler replay (the inner loop of
    Hyperband): {_SHA_CONFIGS} configs start at budget 1; after each
    rung the best half (by deterministic md5-derived micro-loss, which
    shrinks with budget) advance to double budget — rungs {_SHA_RUNGS},
    one winner. This is the budget-allocation discipline that replaced
    grid search (mllib_grid_search_cv trains every config to full
    budget; SHA spends <2n budget total on n configs). The whole replay
    is exact integer losses and ranks on a {_SHA_CONFIGS}-row config
    dimension — fully oracle-able, unlike a real trainer, while
    exercising the exact promotion logic a production tuner runs.

    Scale: each rung is a rank over the surviving-config dimension; in
    production each config's loss at a rung comes from a distributed
    fit (early_stopping_head's shape) and THIS op is the scheduler that
    decides which fits launch — the control plane is dimension-sized by
    construction.
    """
    cfgs = spark.range(1, _SHA_CONFIGS + 1).select(F.col("id").alias("cfg"))
    cur = cfgs
    frames = []
    keep = _SHA_CONFIGS
    for rung in _SHA_RUNGS:
        keep = keep // 2 if rung > 1 else _SHA_CONFIGS // 2
        loss = F.expr(_sha_loss_spark("cfg", str(rung))).cast("bigint")
        scored = cur.select("cfg", loss.alias("loss")).select(
            "cfg",
            "loss",
            F.row_number().over(Window.orderBy("loss", "cfg")).alias("rk"),
        )
        keep_n = max(1, _SHA_CONFIGS // (2 * rung))
        frames.append(
            scored.select(
                F.lit(rung).cast("bigint").alias("rung"),
                F.col("cfg").cast("bigint").alias("config"),
                F.col("loss").alias("micro_loss"),
                (F.col("rk") <= keep_n).alias("survived"),
            )
        )
        cur = scored.where(F.col("rk") <= keep_n).select("cfg")
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.orderBy("rung", "micro_loss", "config")
