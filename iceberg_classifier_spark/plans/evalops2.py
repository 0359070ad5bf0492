"""Evaluation wave 2: exact rank correlations and the decile
gains/lift table.

Kendall's τ and Spearman's ρ are the nonparametric dependence measures
(robust to monotone transforms and outliers where Pearson is not); the
cumulative-gains table is how scoring models are consumed by campaign
teams — "mail the top decile, capture X% of responders".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.mlprep import duck_pseudo_prob, pseudo_prob
from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_RC_A, _RC_B = "click", "purchase"  # the two daily series to correlate


@query(
    "rank_correlation_daily",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(sum(CASE WHEN event_type = '{_RC_A}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS xa,
             CAST(sum(CASE WHEN event_type = '{_RC_B}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS xb
      FROM events GROUP BY 1
    ), pairs AS (
      SELECT CAST(sum(CASE WHEN sign(p.xa - q.xa) * sign(p.xb - q.xb) = 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS conc,
             CAST(sum(CASE WHEN sign(p.xa - q.xa) * sign(p.xb - q.xb) = -1
                           THEN 1 ELSE 0 END) AS BIGINT) AS disc,
             CAST(sum(CASE WHEN p.xa = q.xa AND p.xb <> q.xb
                           THEN 1 ELSE 0 END) AS BIGINT) AS tie_a,
             CAST(sum(CASE WHEN p.xb = q.xb AND p.xa <> q.xa
                           THEN 1 ELSE 0 END) AS BIGINT) AS tie_b,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM daily p JOIN daily q ON p.day < q.day
    ), ranks AS (
      SELECT day,
             CAST(2 * rank() OVER (ORDER BY xa)
                  + count(*) OVER (PARTITION BY xa) - 1 AS BIGINT) AS rxa2,
             CAST(2 * rank() OVER (ORDER BY xb)
                  + count(*) OVER (PARTITION BY xb) - 1 AS BIGINT) AS rxb2
      FROM daily
    ), sp AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum((rxa2 - rxb2) * (rxa2 - rxb2)) AS BIGINT) AS d2_4
      FROM ranks
    )
    SELECT p.n_pairs, p.conc, p.disc, p.tie_a, p.tie_b,
           round((p.conc - p.disc)
                 / (sqrt(CAST(p.n_pairs - p.tie_a AS DOUBLE))
                    * sqrt(CAST(p.n_pairs - p.tie_b AS DOUBLE))), 6)
             AS kendall_tau_b,
           round(1 - 6 * (CAST(s.d2_4 AS DOUBLE) / 4)
                     / (s.n * (CAST(s.n AS DOUBLE) * s.n - 1)), 6)
             AS spearman_rho
    FROM pairs p CROSS JOIN sp s
    """,
)
def rank_correlation_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Kendall τ-b and Spearman ρ between the daily {_RC_A!r} and
    {_RC_B!r} count series — the nonparametric dependence pair every
    metrics platform needs next to Pearson (segment_corr_stats):
    monotone-invariant, outlier-robust, tie-corrected. τ-b counts
    concordant/discordant/tied pairs with exact integer sign products
    over the day-pair join; ρ uses doubled midranks (2r — exact ints,
    the mann_whitney_u convention) and the classical Σd² formula (the
    Pearson-of-ranks tie correction is negligible at these tie rates
    and the formula choice is pinned identically in both engines).
    Only the final
    normalizations are doubles, from exact int64 inputs with identical
    expression text, so both coefficients are bit-exact at 6dp.

    Scale: the series lives on the calendar-bounded day dimension, so
    the O(|days|²) pair join is dimension-sized (365² pairs/year —
    trivial), never corpus-sized; the midrank windows run over the same
    bounded frame. For corpus-sized rank correlation the repo's
    two-level bucketed midrank (mann_whitney_u) replaces the windows
    and τ switches to the O(n log n) merge-count formulation.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.sum(F.when(F.col("event_type") == _RC_A, 1).otherwise(0))
        .cast("bigint")
        .alias("xa"),
        F.sum(F.when(F.col("event_type") == _RC_B, 1).otherwise(0))
        .cast("bigint")
        .alias("xb"),
    )
    p = daily.select(
        F.col("day").alias("pd"), F.col("xa").alias("pxa"), F.col("xb").alias("pxb")
    )
    q = daily.select(
        F.col("day").alias("qd"), F.col("xa").alias("qxa"), F.col("xb").alias("qxb")
    )
    sgn = F.signum(F.col("pxa") - F.col("qxa")) * F.signum(
        F.col("pxb") - F.col("qxb")
    )
    pairs = (
        p.join(q, F.col("pd") < F.col("qd"))
        .agg(
            F.sum(F.when(sgn == 1, 1).otherwise(0)).cast("bigint").alias("conc"),
            F.sum(F.when(sgn == -1, 1).otherwise(0)).cast("bigint").alias("disc"),
            F.sum(
                F.when(
                    (F.col("pxa") == F.col("qxa")) & (F.col("pxb") != F.col("qxb")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("tie_a"),
            F.sum(
                F.when(
                    (F.col("pxb") == F.col("qxb")) & (F.col("pxa") != F.col("qxa")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("tie_b"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
    )
    wa = Window.partitionBy().orderBy("xa")
    wb = Window.partitionBy().orderBy("xb")
    ranks = daily.select(
        (
            2 * F.rank().over(wa)
            + F.count(F.lit(1)).over(Window.partitionBy("xa"))
            - 1
        )
        .cast("bigint")
        .alias("rxa2"),
        (
            2 * F.rank().over(wb)
            + F.count(F.lit(1)).over(Window.partitionBy("xb"))
            - 1
        )
        .cast("bigint")
        .alias("rxb2"),
    )
    sp = ranks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("rxa2") - F.col("rxb2")) * (F.col("rxa2") - F.col("rxb2")))
        .cast("bigint")
        .alias("d2_4"),
    )
    tau = (F.col("conc") - F.col("disc")) / (
        F.sqrt((F.col("n_pairs") - F.col("tie_a")).cast("double"))
        * F.sqrt((F.col("n_pairs") - F.col("tie_b")).cast("double"))
    )
    rho = 1 - 6 * (F.col("d2_4").cast("double") / 4) / (
        F.col("n") * (F.col("n").cast("double") * F.col("n") - 1)
    )
    return pairs.crossJoin(F.broadcast(sp)).select(
        "n_pairs",
        "conc",
        "disc",
        "tie_a",
        "tie_b",
        F.round(tau, 6).alias("kendall_tau_b"),
        F.round(rho, 6).alias("spearman_rho"),
    )


_GAIN_DECILES = 10


@query(
    "lift_gain_deciles",
    oracle=f"""
    WITH s AS (
      SELECT CAST(label % 2 AS BIGINT) AS y,
             CAST(round({duck_pseudo_prob(0)} * 1000000) AS BIGINT) AS p6
      FROM embeddings
    ), g AS (
      SELECT p6, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS pos
      FROM s GROUP BY 1
    ), c AS (
      SELECT p6, n, pos,
             CAST(coalesce(sum(n) OVER (ORDER BY p6 DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS nb
      FROM g
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(pos) AS BIGINT) AS pt
      FROM g
    ), dec AS (
      SELECT least(c.nb * {_GAIN_DECILES} // t.nt,
                   {_GAIN_DECILES} - 1) AS decile,
             CAST(sum(c.n) AS BIGINT) AS n,
             CAST(sum(c.pos) AS BIGINT) AS pos
      FROM c CROSS JOIN tot t GROUP BY 1
    ), cum AS (
      SELECT decile, n, pos,
             CAST(sum(pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
             CAST(sum(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n
      FROM dec
    )
    SELECT CAST(c.decile AS BIGINT) AS decile, c.n, c.pos,
           CAST(c.pos * 1000000 // c.n AS BIGINT) AS resp_rate_ppm,
           CAST(c.cum_pos * 1000000 // t.pt AS BIGINT) AS cum_capture_ppm,
           round((CAST(c.pos AS DOUBLE) / c.n)
                 / (CAST(t.pt AS DOUBLE) / t.nt), 6) AS lift
    FROM cum c CROSS JOIN tot t ORDER BY decile
    """,
)
def lift_gain_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table: rank units by predicted score
    (the deterministic pseudo-model shared with roc_auc_exact), cut
    into {_GAIN_DECILES} population deciles, and report per-decile
    response rate, cumulative capture of all positives, and lift over
    the base rate — the table campaign/risk teams actually read
    ("contact the top 2 deciles, reach X% of responders"). Deciles are
    assigned from exact cumulative counts over the DISTINCT-score
    dimension (no per-row global rank — whole score-ties land in one
    decile, the honest treatment); every rate is exact ppm.

    Scale: one value groupBy + a cumulative window over the distinct-
    score dimension (two-level bucketed at extreme cardinality, per
    roc_auc_exact); the decile rollup is a {_GAIN_DECILES}-row frame.
    """
    s = load(spark, sf_dir, "embeddings").select(
        (F.col("label") % 2).cast("bigint").alias("y"),
        F.round(pseudo_prob(0) * 1000000).cast("bigint").alias("p6"),
    )
    g = s.groupBy("p6").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    wc = (
        Window.partitionBy()
        .orderBy(F.desc("p6"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = g.select(
        "p6",
        "n",
        "pos",
        F.coalesce(F.sum("n").over(wc), F.lit(0)).cast("bigint").alias("nb"),
    )
    tot = g.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("pos").cast("bigint").alias("pt"),
    )
    dec = (
        c.crossJoin(F.broadcast(tot))
        .groupBy(
            F.least(
                F.expr(f"nb * {_GAIN_DECILES} div nt"),
                F.lit(_GAIN_DECILES - 1),
            ).alias("decile")
        )
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("pos"),
        )
    )
    wd = Window.partitionBy().orderBy("decile")
    cum = dec.select(
        "decile",
        "n",
        "pos",
        F.sum("pos").over(wd).cast("bigint").alias("cum_pos"),
        F.sum("n").over(wd).cast("bigint").alias("cum_n"),
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        F.col("decile").cast("bigint").alias("decile"),
        "n",
        "pos",
        F.expr("pos * 1000000 div n").cast("bigint").alias("resp_rate_ppm"),
        F.expr("cum_pos * 1000000 div pt").cast("bigint").alias(
            "cum_capture_ppm"
        ),
        F.round(
            (F.col("pos").cast("double") / F.col("n"))
            / (F.col("pt").cast("double") / F.col("nt")),
            6,
        ).alias("lift"),
    ).orderBy("decile")
