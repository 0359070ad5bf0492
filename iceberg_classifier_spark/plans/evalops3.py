"""Evaluation wave 3: quantile treatment effects and DP clipped means.

QTE reports WHERE in the outcome distribution an effect lives (means
hide tail effects — the standard complement to difference_in_
differences); the DP clipped mean is the contribution-bounded,
Laplace-noised release every privacy-preserving metrics pipeline ships
(dp_noisy_counts covers counts; this covers means with per-user
clipping, which is where sensitivity analysis actually bites).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_QTE_QS = (25, 50, 75)  # quantiles in percent


@query(
    "quantile_treatment_effects",
    oracle=f"""
    WITH v AS (
      SELECT (user_id % 2 = 1) AS treated,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ), g AS (
      SELECT treated, cents, CAST(count(*) AS BIGINT) AS c
      FROM v GROUP BY 1, 2
    ), cum AS (
      SELECT treated, cents, c,
             CAST(sum(c) OVER (PARTITION BY treated ORDER BY cents)
                  AS BIGINT) AS cc,
             CAST(sum(c) OVER (PARTITION BY treated) AS BIGINT) AS n
      FROM g
    ), qs AS (SELECT unnest(ARRAY{list(_QTE_QS)}) AS q),
    hits AS (
      SELECT qs.q, cum.treated, min(cum.cents) AS qv
      FROM cum JOIN qs
        ON cum.cc * 100 >= qs.q * cum.n
      GROUP BY 1, 2
    )
    SELECT CAST(h.q AS BIGINT) AS q_pct,
           max(CASE WHEN h.treated THEN h.qv END) AS treat_cents,
           max(CASE WHEN NOT h.treated THEN h.qv END) AS ctrl_cents,
           max(CASE WHEN h.treated THEN h.qv END)
             - max(CASE WHEN NOT h.treated THEN h.qv END) AS qte_cents
    FROM hits h GROUP BY 1 ORDER BY q_pct
    """,
)
def quantile_treatment_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects at p{_QTE_QS}: the per-arm EXACT lower
    quantiles of the outcome (value in cents) and their differences —
    the readout that catches effects living in the tails where the mean
    (difference_in_differences) is flat. Everything is exact integers:
    per-arm value-grouped counts, a cumulative window over the bounded
    distinct-cents dimension (≤10⁴ values at any corpus size — prices
    quantize), and min-cents-reaching-the-rank per quantile. Zero
    floats anywhere, so the oracle match is trivial bit-equality.

    Scale: one map-side-combined (arm, cents) aggregate; the cumulative
    runs per-arm over the distinct-value dimension (two-level bucketed
    if the value domain were unbounded — two_pass_median's bracket is
    the fallback); the quantile probe is a broadcast join of a 3-row
    dimension.
    """
    v = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 2 == 1).alias("treated"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    g = v.groupBy("treated", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wcum = Window.partitionBy("treated").orderBy("cents")
    warm = Window.partitionBy("treated")
    cum = g.select(
        "treated",
        "cents",
        F.sum("c").over(wcum).cast("bigint").alias("cc"),
        F.sum("c").over(warm).cast("bigint").alias("n"),
    )
    qs = spark.range(0, len(_QTE_QS)).select(
        F.element_at(
            F.array(*[F.lit(q) for q in _QTE_QS]), (F.col("id") + 1).cast("int")
        ).alias("q")
    )
    hits = (
        cum.join(F.broadcast(qs), F.col("cc") * 100 >= F.col("q") * F.col("n"))
        .groupBy("q", "treated")
        .agg(F.min("cents").alias("qv"))
    )
    return (
        hits.groupBy(F.col("q").cast("bigint").alias("q_pct"))
        .agg(
            F.max(F.when(F.col("treated"), F.col("qv"))).alias("treat_cents"),
            F.max(F.when(~F.col("treated"), F.col("qv"))).alias("ctrl_cents"),
        )
        .select(
            "q_pct",
            "treat_cents",
            "ctrl_cents",
            (F.col("treat_cents") - F.col("ctrl_cents")).alias("qte_cents"),
        )
        .orderBy("q_pct")
    )


_DP_CLIP = 300000  # per-user contribution cap, cents (~50% clip at sf0.01)
_DP_EPS = 1.0
_HEX = "0123456789abcdef"
_DP_SEED = "dp_clipped_mean_seed_r4"

# deterministic uniform in (0,1): first 6 md5 hex chars of the seed / 16^6
_DUCK_U = (
    f"((strpos('{_HEX}', substr(md5('{_DP_SEED}'), 1, 1)) - 1) * 1048576.0"
    f" + (strpos('{_HEX}', substr(md5('{_DP_SEED}'), 2, 1)) - 1) * 65536.0"
    f" + (strpos('{_HEX}', substr(md5('{_DP_SEED}'), 3, 1)) - 1) * 4096.0"
    f" + (strpos('{_HEX}', substr(md5('{_DP_SEED}'), 4, 1)) - 1) * 256.0"
    f" + (strpos('{_HEX}', substr(md5('{_DP_SEED}'), 5, 1)) - 1) * 16.0"
    f" + (strpos('{_HEX}', substr(md5('{_DP_SEED}'), 6, 1)) - 1) + 0.5)"
    f" / 16777216.0"
)


@query(
    "dp_clipped_mean",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS tot
      FROM events GROUP BY 1
    ), clipped AS (
      SELECT user_id, tot,
             least(tot, {_DP_CLIP}) AS ctot,
             CASE WHEN tot > {_DP_CLIP} THEN 1 ELSE 0 END AS was_clipped
      FROM per_user
    ), agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(CAST(sum(tot) AS BIGINT) AS DOUBLE) AS s_true,
             CAST(CAST(sum(ctot) AS BIGINT) AS DOUBLE) AS s_clip,
             CAST(sum(was_clipped) AS BIGINT) AS n_clipped,
             CAST(count(*) AS DOUBLE) AS n1
      FROM clipped
    ), noise AS (
      SELECT ({_DUCK_U}) AS u
    )
    SELECT a.n_users, a.n_clipped,
           CAST(a.n_clipped * 1000000 // a.n_users AS BIGINT)
             AS clip_frac_ppm,
           round(a.s_true / a.n1 / 100, 6) AS true_mean,
           round(a.s_clip / a.n1 / 100, 6) AS clipped_mean,
           round((a.s_clip / a.n1
                  + (-({_DP_CLIP} / ({_DP_EPS} * a.n1))
                    * CASE WHEN n.u < 0.5 THEN -1.0 ELSE 1.0 END
                    * ln(1 - 2 * abs(n.u - 0.5)))) / 100, 6) AS dp_mean,
           round(abs((-({_DP_CLIP} / ({_DP_EPS} * a.n1))
                    * CASE WHEN n.u < 0.5 THEN -1.0 ELSE 1.0 END
                    * ln(1 - 2 * abs(n.u - 0.5)))) / 100, 6) AS noise_abs
    FROM agg a CROSS JOIN noise n
    """,
)
def dp_clipped_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private mean of per-user spend: cap each user's
    contribution at {_DP_CLIP} cents (bounding the L1 sensitivity to
    C/n), then add Laplace(C/(ε·n)) noise at ε={_DP_EPS} via the
    inverse-CDF transform of a DETERMINISTIC md5-derived uniform — the
    repo's seeded-noise convention (dp_noisy_counts), which keeps a
    bit-exact oracle while exercising the real DP release pipeline:
    clip → aggregate → calibrate noise to sensitivity. The output also
    reports the clip fraction and clipped-vs-true mean gap — the
    bias/variance tradeoff a DP practitioner tunes C against.

    Scale: per-user totals are one map-side-combined groupBy; the
    release is a 1-row aggregate. Per-user clipping is the part that
    matters at 100 TB — bounding EACH user before the sum is what makes
    user-level (not row-level) privacy accounting valid.
    """
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("tot")
        )
    )
    clipped = per_user.select(
        "tot",
        F.least(F.col("tot"), F.lit(_DP_CLIP)).alias("ctot"),
        F.when(F.col("tot") > _DP_CLIP, 1).otherwise(0).alias("was_clipped"),
    )
    agg = clipped.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("tot").cast("bigint").cast("double").alias("s_true"),
        F.sum("ctot").cast("bigint").cast("double").alias("s_clip"),
        F.sum("was_clipped").cast("bigint").alias("n_clipped"),
        F.count(F.lit(1)).cast("double").alias("n1"),
    )
    spark_u = (
        f"((conv(substr(md5(CAST('{_DP_SEED}' AS BINARY)), 1, 6), 16, 10)"
        f" + 0.5) / 16777216.0)"
    )
    lap = (
        f"(-({_DP_CLIP} / ({_DP_EPS} * n1))"
        f" * CASE WHEN {spark_u} < 0.5 THEN -1.0 ELSE 1.0 END"
        f" * ln(1 - 2 * abs({spark_u} - 0.5)))"
    )
    return agg.select(
        "n_users",
        "n_clipped",
        F.expr("CAST(n_clipped * 1000000 div n_users AS BIGINT)").alias(
            "clip_frac_ppm"
        ),
        F.round(F.col("s_true") / F.col("n1") / 100, 6).alias("true_mean"),
        F.round(F.col("s_clip") / F.col("n1") / 100, 6).alias("clipped_mean"),
        F.round(F.expr(f"(s_clip / n1 + {lap}) / 100"), 6).alias("dp_mean"),
        F.round(F.expr(f"abs({lap}) / 100"), 6).alias("noise_abs"),
    )
