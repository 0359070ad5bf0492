"""CV preparation + metric queries (reference's sklearn surface).

Pseudo-probabilities for metric/stacking checks are derived from embedding
elements with the rational squash p = 0.5 + x/(2(1+|x|)) — exactly-rounded
IEEE arithmetic (no libm), so Spark and DuckDB produce bit-identical
values before rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.operators import metrics
from iceberg_classifier_spark.operators.folds import (
    stratified_split,
    with_stratified_folds,
)
from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

K_FOLDS = 8  # reference main.py:250 (K=8)
_SCALE = 20.0


def squash(x: Column) -> Column:
    return 0.5 + x / (2.0 * (1.0 + F.abs(x)))


def pseudo_prob(model_j: int) -> Column:
    """Deterministic stand-in for model j's predicted probability."""
    x = _SCALE * F.element_at(F.col("embedding").cast("array<double>"), 8 * model_j + 1)
    return squash(x)


def duck_pseudo_prob(model_j: int) -> str:
    return (
        f"(0.5 + (20.0 * CAST(embedding[{8 * model_j + 1}] AS DOUBLE)) / "
        f"(2.0 * (1.0 + abs(20.0 * CAST(embedding[{8 * model_j + 1}] AS DOUBLE)))))"
    )


@query(
    "stratified_folds",
    oracle=f"""
    SELECT vec_id, label,
           CAST((row_number() OVER (PARTITION BY label ORDER BY vec_id) - 1)
                % {K_FOLDS} AS INTEGER) AS fold
    FROM embeddings ORDER BY vec_id
    """,
)
def stratified_folds_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified K-fold assignment (ref StratifiedKFold,
    main.py:252). No global sort, no seed; the rank shuffle is salted on
    (label, id-range bucket) so a binary label still spreads over every
    core — see operators/folds.py."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    return with_stratified_folds(e, "label", "vec_id", K_FOLDS).sortWithinPartitions("vec_id")


@query(
    "fold_balance",
    oracle=f"""
    WITH f AS (
      SELECT label,
             CAST((row_number() OVER (PARTITION BY label ORDER BY vec_id) - 1)
                  % {K_FOLDS} AS INTEGER) AS fold
      FROM embeddings
    )
    SELECT fold, label, count(*) AS n
    FROM f GROUP BY fold, label ORDER BY fold, label
    """,
)
def fold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratification sanity: fold × label counts differ by ≤1 per stratum."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        with_stratified_folds(e, "label", "vec_id", K_FOLDS)
        .groupBy("fold", "label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("fold", "label")
    )


@query(
    "train_val_split",
    oracle="""
    SELECT vec_id, label,
           CASE WHEN (row_number() OVER (PARTITION BY label ORDER BY vec_id) - 1)
                     % 4 = 0
                THEN 'val' ELSE 'train' END AS split
    FROM embeddings ORDER BY vec_id
    """,
)
def train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 75/25 train/val split (ref StratifiedShuffleSplit)."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    return stratified_split(e, "label", "vec_id", val_fraction=0.25).sortWithinPartitions("vec_id")


@query(
    "log_loss",
    oracle=f"""
    SELECT label,
           count(*) AS n,
           round(avg(-(CAST(label % 2 AS DOUBLE) * ln(p)
                       + (1 - CAST(label % 2 AS DOUBLE)) * ln(1 - p))), 6)
             AS avg_log_loss
    FROM (
      SELECT label,
             least(greatest({duck_pseudo_prob(0)}, 1e-15), 1 - 1e-15) AS p
      FROM embeddings
    )
    GROUP BY label ORDER BY label
    """,
)
def log_loss_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary log-loss aggregate with sklearn clipping (ref main.py:313-314),
    grouped by stratum — a single map-combinable pass."""
    e = load(spark, sf_dir, "embeddings")
    y = (F.col("label") % 2).cast("double")
    return (
        e.select("label", metrics.log_loss_expr(y, pseudo_prob(0)).alias("ll"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("ll"), 6).alias("avg_log_loss"))
        .orderBy("label")
    )


@query(
    "submission",
    oracle=f"""
    SELECT vec_id AS id, round({duck_pseudo_prob(0)}, 6) AS is_iceberg
    FROM embeddings ORDER BY id
    """,
)
def submission_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaggle-style (id, is_iceberg) submission frame (ref main.py:320-324);
    sinks.write_submission handles the single-file CSV export."""
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        F.col("vec_id").alias("id"), F.round(pseudo_prob(0), 6).alias("is_iceberg")
    ).orderBy("id")


GROUP_K = 5


@query(
    "grouped_kfold_assign",
    oracle=f"""
    WITH f AS (
      SELECT user_id,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, 8),
                 k -> CAST(strpos('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR)),
                               CAST(k AS INTEGER), 1)) - 1 AS BIGINT))),
               (acc, c) -> acc * 16 + c) % {GROUP_K} AS INTEGER) AS fold,
             count(*) AS n_ev
      FROM events GROUP BY 1
    ), tot AS (SELECT sum(n_ev) AS t FROM f)
    SELECT fold, CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(n_ev) AS BIGINT) AS n_events,
           CAST(sum(n_ev) * 1000000 // (SELECT t FROM tot) AS BIGINT)
             AS events_share_ppm
    FROM f GROUP BY 1 ORDER BY 1
    """,
)
def grouped_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped K-fold assignment (sklearn GroupKFold semantics): every
    GROUP (user) lands in exactly one fold — fold = portable-hash(user)
    % K — so no user's events leak across the train/validation boundary,
    the split discipline any per-user behavioral model needs. The report
    is per-fold group counts, event counts, and event share in exact ppm
    (hash splits balance groups, not rows; the share column is what you
    check before trusting the split).

    Scale: fold assignment is a map-only hash (no rank, no shuffle of
    events beyond the per-user rollup); leakage-freedom is by
    construction, not by a post-hoc check.
    """
    f = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_ev"))
        .select(
            (
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                    16,
                    10,
                ).cast("bigint")
                % GROUP_K
            ).cast("int").alias("fold"),
            "n_ev",
        )
    )
    tot = f.agg(F.sum("n_ev").alias("t"))
    return (
        f.groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("n_ev").cast("bigint").alias("n_events"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "fold",
            "n_groups",
            "n_events",
            F.expr("CAST(n_events * 1000000 div t AS BIGINT)").alias(
                "events_share_ppm"
            ),
        )
        .orderBy("fold")
    )


@query(
    "roc_auc_exact",
    oracle=f"""
    WITH s AS (
      SELECT CAST(label % 2 AS BIGINT) AS y,
             CAST(round({duck_pseudo_prob(0)} * 1000000) AS BIGINT) AS p6
      FROM embeddings
    ), g AS (
      SELECT p6, sum(y) AS c1, sum(1 - y) AS c0 FROM s GROUP BY 1
    ), c AS (
      SELECT p6, c1, c0, c1 + c0 AS t,
             coalesce(sum(c1 + c0) OVER (ORDER BY p6
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM g
    ), agg AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c0) AS BIGINT) AS n0,
             CAST(sum(c1 * (2 * cb + t + 1)) AS BIGINT) AS r1_2
      FROM c
    )
    SELECT n1, n0,
           CAST(r1_2 - n1 * (n1 + 1) AS BIGINT) AS auc_num_doubled,
           round(CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE) / (2.0 * n1 * n0), 6)
             AS auc
    FROM agg
    """,
)
def roc_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC as the normalized Mann-Whitney statistic: AUC =
    P(score⁺ > score⁻) + ½P(tie), computed from value-grouped doubled
    midranks over micro-quantized scores — no per-row rank, ties handled
    exactly, the numerator an exact int64 both engines replay (the metric
    companion to `log_loss`; the reference reports only log-loss, AUC is
    the other number every classification pipeline publishes).

    Scale: one map-combinable value groupBy + one cumulative window over
    the ≤10⁶-row distinct-score dimension (two-level bucketed at extreme
    cardinality, as in ks_two_sample).
    """
    s = load(spark, sf_dir, "embeddings").select(
        (F.col("label") % 2).cast("bigint").alias("y"),
        F.round(pseudo_prob(0) * 1000000).cast("bigint").alias("p6"),
    )
    g = s.groupBy("p6").agg(
        F.sum("y").alias("c1"), F.sum(1 - F.col("y")).alias("c0")
    )
    from pyspark.sql import Window as W

    wc = W.partitionBy().orderBy("p6").rowsBetween(W.unboundedPreceding, -1)
    c = g.withColumn("t", F.col("c1") + F.col("c0")).withColumn(
        "cb", F.coalesce(F.sum(F.col("c1") + F.col("c0")).over(wc), F.lit(0))
    )
    agg = c.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c0").cast("bigint").alias("n0"),
        F.sum(F.col("c1") * (2 * F.col("cb") + F.col("t") + 1))
        .cast("bigint")
        .alias("r1_2"),
    )
    num = F.col("r1_2") - F.col("n1") * (F.col("n1") + 1)
    return agg.select(
        "n1",
        "n0",
        num.cast("bigint").alias("auc_num_doubled"),
        F.round(
            num.cast("double") / (2.0 * F.col("n1") * F.col("n0")), 6
        ).alias("auc"),
    )


@query(
    "calibration_reliability_bins",
    oracle=f"""
    WITH s AS (
      SELECT CAST(label % 2 AS BIGINT) AS y,
             CAST(round({duck_pseudo_prob(0)} * 1000000) AS BIGINT) AS p6
      FROM embeddings
    ), b AS (
      SELECT least(p6 // 100000, 9) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(p6) AS BIGINT) AS sp6,
             CAST(sum(y) AS BIGINT) AS pos
      FROM s GROUP BY 1
    ), t AS (SELECT sum(n) AS nt FROM b)
    SELECT CAST(bin AS INTEGER) AS bin, n,
           CAST(sp6 // n AS BIGINT) AS mean_pred_ppm,
           CAST(pos * 1000000 // n AS BIGINT) AS frac_pos_ppm,
           CAST(abs(sp6 // n - pos * 1000000 // n) AS BIGINT) AS gap_ppm,
           CAST(sum(n * abs(sp6 // n - pos * 1000000 // n))
                  OVER () // (SELECT nt FROM t) AS BIGINT) AS ece_ppm
    FROM b ORDER BY bin
    """,
)
def calibration_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-calibration audit (reliability diagram + ECE): scores
    bucket into 10 equal-width bins; each bin reports mean predicted
    probability vs realized positive fraction (both exact integer ppm)
    and their gap; the expected calibration error is the bin-weighted
    mean gap, computed in pure integer arithmetic over the 10-row bin
    dimension — the post-training check that decides whether a model's
    probabilities need Platt/isotonic recalibration (the engine's
    isotonic_regression_daily is the fix; this op is the detector).

    Scale: one map-combinable bin groupBy; everything after runs on ≤10
    rows.
    """
    s = load(spark, sf_dir, "embeddings").select(
        (F.col("label") % 2).cast("bigint").alias("y"),
        F.round(pseudo_prob(0) * 1000000).cast("bigint").alias("p6"),
    )
    b = s.groupBy(
        F.least(F.expr("p6 div 100000"), F.lit(9)).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("p6").cast("bigint").alias("sp6"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    from pyspark.sql import Window as W

    gap = F.expr("abs(sp6 div n - pos * 1000000 div n)")
    return (
        b.withColumn("gap_ppm", gap.cast("bigint"))
        .withColumn(
            "ece_ppm",
            F.expr(
                "CAST(sum(n * abs(sp6 div n - pos * 1000000 div n)) OVER ()"
                " div sum(n) OVER () AS BIGINT)"
            ),
        )
        .select(
            F.col("bin").cast("int").alias("bin"),
            "n",
            F.expr("CAST(sp6 div n AS BIGINT)").alias("mean_pred_ppm"),
            F.expr("CAST(pos * 1000000 div n AS BIGINT)").alias("frac_pos_ppm"),
            "gap_ppm",
            "ece_ppm",
        )
        .orderBy("bin")
    )
