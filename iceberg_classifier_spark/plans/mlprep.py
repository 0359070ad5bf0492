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
    return with_stratified_folds(e, "label", "vec_id", K_FOLDS).orderBy("vec_id")


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
    return stratified_split(e, "label", "vec_id", val_fraction=0.25).orderBy("vec_id")


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
