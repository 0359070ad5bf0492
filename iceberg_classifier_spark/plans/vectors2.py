"""Vector analytics round 2: nearest-centroid classification and
quantile sketches.

Completes the centroid work in ``curation2.embed_label_centroids`` into a
full classifier evaluation (the MLlib-free baseline every embedding store
needs), and adds the mergeable quantile-sketch path next to the exact
percentiles in ``events_quantiles``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load


@query(
    "nearest_centroid_classify",
    oracle="""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), ex AS (
      SELECT label, unnest(v) AS x,
             unnest(generate_series(1, len(v))) AS pos
      FROM e
    ), d AS (
      SELECT label, pos, round(avg(x), 6) AS m FROM ex GROUP BY 1, 2
    ), c AS (
      SELECT label AS pred, list(m ORDER BY pos) AS centroid
      FROM d GROUP BY label
    ), a AS (
      SELECT e.vec_id, e.label, c.pred,
             round(list_sum(list_transform(generate_series(1, len(e.v)),
                   i -> (e.v[i] - c.centroid[i]) * (e.v[i] - c.centroid[i]))),
                   6) AS dist2
      FROM e, c
    ), best AS (
      SELECT vec_id, label, pred FROM a
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist2, pred) = 1
    )
    SELECT label, pred, count(*) AS n,
           CAST(label = pred AS BOOLEAN) AS is_correct
    FROM best GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def nearest_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classifier evaluated as a confusion matrix: per-label
    centroids (train) → assign every vector to its closest centroid by
    squared L2 (predict) → (true, predicted) counts.

    Scale: centroids come from the |labels|×dim posexplode transpose (tiny
    shuffle, map-side combined); assignment is a broadcast nested-loop over
    |labels| centroids — a map-only pass over the 100 TB vector store, no
    shuffle touches full vectors. Argmin ranks on the 6dp-ROUNDED distance
    with a label tiebreak so both engines pick identical winners.
    """
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    ex = e.select("label", F.posexplode("v").alias("pos", "x"))
    d = ex.groupBy("label", "pos").agg(F.round(F.avg("x"), 6).alias("m"))
    cent = d.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s.m
        ).alias("centroid")
    ).select(F.col("label").alias("pred"), "centroid")
    dist2 = F.aggregate(
        F.zip_with("v", "centroid", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    best = (
        e.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "label",
            F.struct(F.round(dist2, 6).alias("d"), F.col("pred").alias("p")).alias(
                "cand"
            ),
        )
        .groupBy("vec_id", "label")
        .agg(F.min("cand").alias("best"))
    )
    return (
        best.groupBy("label", F.col("best.p").alias("pred"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("is_correct", F.col("label") == F.col("pred"))
        .orderBy("label", "pred")
    )


@query("events_approx_quantiles")  # sketch output — engine-specific, rows-only
def events_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate percentiles next to the exact answer,
    with realized absolute error per (event_type, percentile).

    Scale: the GK sketch is the mergeable fixed-size summary that replaces
    a full sort at 100 TB — exact grouped percentiles (events_quantiles)
    need every value of a group on one node; the sketch needs ~accuracy⁻¹
    entries per partition and merges associatively. Rows-only check: sketch
    internals are engine-specific, so no cross-engine hash oracle exists.
    """
    e = load(spark, sf_dir, "events")
    pcts = [0.5, 0.9, 0.99]
    approx = F.percentile_approx(
        "value", F.array(*[F.lit(p) for p in pcts]), 10_000
    ).alias("approx")
    exact = F.percentile("value", F.array(*[F.lit(p) for p in pcts])).alias("exact")
    out = e.groupBy("event_type").agg(approx, exact)
    cols = [
        c
        for i, p in enumerate(pcts)
        for c in (
            F.round(F.col("approx")[i], 6).alias(f"p{int(p * 100)}_approx"),
            F.round(F.col("exact")[i], 6).alias(f"p{int(p * 100)}_exact"),
            F.round(F.abs(F.col("approx")[i] - F.col("exact")[i]), 6).alias(
                f"p{int(p * 100)}_abs_err"
            ),
        )
    ]
    return out.select("event_type", *cols).orderBy("event_type")
