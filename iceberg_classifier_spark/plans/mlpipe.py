"""MLlib pipeline queries (rows-only checks — model fitting is not
SQL-expressible; the driver verifies execution, row count, and schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.ml.pipeline import (
    engineered_features,
    kfold_cv,
)
from iceberg_classifier_spark.operators import metrics
from iceberg_classifier_spark.operators.folds import stratified_split
from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

FEATURES = ["f_mean", "f_std", "f_min", "f_max", "f_size", "f_iso_active"]


def _prepped(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    e = e.withColumn("y", (F.col("label") % 2).cast("double"))
    return engineered_features(e)


@query("mllib_logreg_cv", oracle=None)
def mllib_logreg_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified K-fold LogisticRegression CV (ref myAngleCV main.py:248-317):
    returns per-fold OOF log-loss + overall — the reference's headline
    numbers (main.py:313-314)."""
    d = _prepped(spark, sf_dir)
    split = stratified_split(d, "y", "vec_id", val_fraction=0.25)
    train = split.where(F.col("split") == "train")
    test = split.where(F.col("split") == "val")
    cv = kfold_cv(train, test, FEATURES, "vec_id", k=4, model="logreg")
    per_fold = (
        cv.oof.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.avg(metrics.log_loss_expr(F.col("y"), F.col("prob"))), 4
            ).alias("oof_log_loss"),
        )
        .orderBy("fold")
    )
    return per_fold


@query("mllib_gbt", oracle=None)
def mllib_gbt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GBTClassifier pipeline (the CNN-strength learner slot in the
    reference's model zoo, main.py:166-214): fit on the stratified train
    split, score the val split, report log-loss + accuracy."""
    from iceberg_classifier_spark.ml.pipeline import build_pipeline, prob_of_one

    d = _prepped(spark, sf_dir)
    split = stratified_split(d, "y", "vec_id", val_fraction=0.25)
    train = split.where(F.col("split") == "train")
    val = split.where(F.col("split") == "val")
    m = build_pipeline(FEATURES, "gbt").fit(train)
    scored = prob_of_one(m, val)
    return scored.agg(
        F.count(F.lit(1)).alias("n_val"),
        F.round(F.avg(metrics.log_loss_expr(F.col("y"), F.col("prob"))), 4).alias(
            "val_log_loss"
        ),
        F.round(metrics.accuracy_expr(F.col("y"), F.col("prob")), 4).alias(
            "val_accuracy"
        ),
    )


@query("mllib_kmeans", oracle=None)
def mllib_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib KMeans over the embedding column (the trainable counterpart of
    ann_ivf_topk's fixed centroids; at scale this is the IVF coarse
    quantizer). Seeded, so locally deterministic; model fitting is not
    SQL-expressible → rows-only check. Returns per-cluster sizes + inertia
    contribution."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    km = KMeans(k=8, seed=42, maxIter=5, featuresCol="features")
    model = km.fit(e)
    pred = model.transform(e)
    return (
        pred.groupBy(F.col("prediction").cast("int").alias("cluster"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cluster")
    )
