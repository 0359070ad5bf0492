"""Ensemble stacking queries (reference sub_stacking.py / sub_fold_stacking.py).

Three pseudo-submissions (models 0..2) + a base submission are derived
deterministically from embedding elements (see mlprep.pseudo_prob), then
each reference stacking mode runs as a single groupBy(id) aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.operators.stacking import stack, stack_stats
from iceberg_classifier_spark.plans.mlprep import duck_pseudo_prob, pseudo_prob
from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

N_MODELS = 3


def _long_subs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, model_id, prob) long-form union of the pseudo-submissions."""
    e = load(spark, sf_dir, "embeddings")
    frames = [
        e.select(
            F.col("vec_id").alias("id"),
            F.lit(j).alias("model_id"),
            pseudo_prob(j).alias("prob"),
        )
        for j in range(N_MODELS)
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _duck_long() -> str:
    parts = [
        f"SELECT vec_id AS id, {j} AS model_id, {duck_pseudo_prob(j)} AS prob FROM embeddings"
        for j in range(N_MODELS)
    ]
    return " UNION ALL ".join(parts)


@query(
    "stack_mean_median",
    oracle=f"""
    WITH subs AS ({_duck_long()})
    SELECT id,
           CAST(count(*) AS BIGINT) AS n_models,
           round(avg(prob), 6)    AS p_mean,
           round(median(prob), 6) AS p_median,
           round(min(prob), 6)    AS p_min,
           round(max(prob), 6)    AS p_max
    FROM subs GROUP BY id ORDER BY id
    """,
)
def stack_mean_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-wise ensemble stats (ref sub_stacking.py:31-35) as one
    groupBy(id) — the scalable form of pandas' axis=1 concat."""
    s = stack_stats(_long_subs(spark, sf_dir))
    return s.select(
        "id",
        F.col("n_models").cast("bigint").alias("n_models"),
        F.round("p_mean", 6).alias("p_mean"),
        F.round("p_median", 6).alias("p_median"),
        F.round("p_min", 6).alias("p_min"),
        F.round("p_max", 6).alias("p_max"),
    ).orderBy("id")


@query(
    "stack_pushout_median",
    oracle=f"""
    WITH subs AS ({_duck_long()})
    SELECT id,
           round(CASE WHEN bool_and(prob > 0.8) THEN 1.0
                      WHEN bool_and(prob < 0.2) THEN 0.0
                      ELSE median(prob) END, 6) AS prob
    FROM subs GROUP BY id ORDER BY id
    """,
)
def stack_pushout_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PushOut+Median (ref sub_stacking.py:49-53)."""
    out = stack(_long_subs(spark, sf_dir), "PushOut+Median")
    return out.select("id", F.round("prob", 6).alias("prob")).orderBy("id")


@query(
    "stack_minmax_mean",
    oracle=f"""
    WITH subs AS ({_duck_long()})
    SELECT id,
           round(CASE WHEN bool_and(prob > 0.8) THEN max(prob)
                      WHEN bool_and(prob < 0.2) THEN min(prob)
                      ELSE avg(prob) END, 6) AS prob
    FROM subs GROUP BY id ORDER BY id
    """,
)
def stack_minmax_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinMax+Mean (ref sub_stacking.py:55-60)."""
    out = stack(_long_subs(spark, sf_dir), "MinMax+Mean")
    return out.select("id", F.round("prob", 6).alias("prob")).orderBy("id")


@query(
    "stack_minmax_bestbase",
    oracle=f"""
    WITH subs AS ({_duck_long()}),
    base AS (SELECT vec_id AS id, {duck_pseudo_prob(1)} AS p_base FROM embeddings)
    SELECT s.id,
           round(CASE WHEN bool_and(s.prob > 0.8) THEN max(s.prob)
                      WHEN bool_and(s.prob < 0.2) THEN min(s.prob)
                      ELSE any_value(b.p_base) END, 6) AS prob
    FROM subs s JOIN base b ON s.id = b.id
    GROUP BY s.id ORDER BY s.id
    """,
)
def stack_minmax_bestbase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinMax+BestBase (ref sub_stacking.py:67-74): fall back to the best
    single submission unless the ensemble is unanimous."""
    e = load(spark, sf_dir, "embeddings")
    base = e.select(F.col("vec_id").alias("id"), pseudo_prob(1).alias("prob"))
    out = stack(_long_subs(spark, sf_dir), "MinMax+BestBase", base=base)
    return out.select("id", F.round("prob", 6).alias("prob")).orderBy("id")


@query(
    "fold_stacking",
    oracle="""
    WITH folds AS (
      SELECT vec_id AS id, f.j AS fold,
             (0.5 + (20.0 * CAST(embedding[f.j * 8 + 1] AS DOUBLE))
              / (2.0 * (1.0 + abs(20.0 * CAST(embedding[f.j * 8 + 1] AS DOUBLE)))))
               AS prob
      FROM embeddings, (SELECT unnest(generate_series(0, 7)) AS j) f
    )
    SELECT id, round(avg(prob), 6) AS prob, CAST(count(*) AS BIGINT) AS n_folds
    FROM folds GROUP BY id ORDER BY id
    """,
)
def fold_stacking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean over per-fold submissions (ref sub_fold_stacking.py, Mean mode;
    also the K-fold test-pred averaging in main.py:306-311)."""
    e = load(spark, sf_dir, "embeddings")
    frames = [
        e.select(
            F.col("vec_id").alias("id"),
            F.lit(j).alias("fold"),
            pseudo_prob(j).alias("prob"),
        )
        for j in range(8)
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return (
        out.groupBy("id")
        .agg(
            F.round(F.avg("prob"), 6).alias("prob"),
            F.count(F.lit(1)).cast("bigint").alias("n_folds"),
        )
        .orderBy("id")
    )


@query(
    "stack_minmax_median",
    oracle=f"""
    WITH subs AS ({_duck_long()})
    SELECT id,
           round(CASE WHEN bool_and(prob > 0.8) THEN max(prob)
                      WHEN bool_and(prob < 0.2) THEN min(prob)
                      ELSE median(prob) END, 6) AS prob
    FROM subs GROUP BY id ORDER BY id
    """,
)
def stack_minmax_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinMax+Median (ref sub_stacking.py:61-66) — completes the
    reference's six stacking modes."""
    out = stack(_long_subs(spark, sf_dir), "MinMax+Median")
    return out.select("id", F.round("prob", 6).alias("prob")).orderBy("id")
