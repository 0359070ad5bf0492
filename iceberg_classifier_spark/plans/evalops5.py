"""Eval wave 5: Bradley-Terry strength estimation and train/test
embedding-leakage scanning.

Bradley-Terry is the pairwise-comparison model behind chess ratings,
LLM arena leaderboards, and reward-model training — fitted here with
the classic minorization-maximization iteration, which is exact
closed-form per step. The leakage scan is the embedding-space
contamination check (near-identical train/test items) that n-gram
decontamination (`decontaminate_8gram`) misses when the duplicate is
paraphrased.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_BT_ITERS = 20


@query(
    "bradley_terry_strengths",
    oracle=f"""
    WITH byarm AS (
      SELECT CAST(ts AS DATE) AS day,
             CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
               WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END
               AS arm,
             CAST(CAST(sum(round(value * 100)) AS BIGINT) * 10000
                  // count(*) AS BIGINT) AS r6
      FROM events GROUP BY 1, 2
    ), duels AS (
      SELECT a.arm AS i, b.arm AS j,
             CAST(sum(CASE WHEN a.r6 > b.r6
                            OR (a.r6 = b.r6 AND a.arm < b.arm)
                      THEN 1 ELSE 0 END) AS BIGINT) AS w,
             CAST(count(*) AS BIGINT) AS n
      FROM byarm a JOIN byarm b
        ON a.day = b.day AND a.arm <> b.arm
      GROUP BY 1, 2
    ), packed AS (
      SELECT list(struct_pack(k := i * 5 + j, w := w, n := n)) AS ents
      FROM duels
    ), mats AS (
      SELECT list_transform(range(0, 25), k ->
               coalesce(list_filter(ents, e -> e.k = k)[1].w, 0)) AS wm,
             list_transform(range(0, 25), k ->
               coalesce(list_filter(ents, e -> e.k = k)[1].n, 0)) AS nm
      FROM packed
    ), fit AS (
      SELECT wm, nm,
        list_reduce(list_prepend(CAST([0.2, 0.2, 0.2, 0.2, 0.2]
            AS DOUBLE[]),
          list_transform(range(1, {_BT_ITERS + 1}),
            i -> CAST([] AS DOUBLE[]))),
          (a, v) -> list_transform(range(0, 5), i2 ->
            (list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(0, 5), j2 ->
                 CAST(wm[CAST(i2 * 5 + j2 + 1 AS INTEGER)] AS DOUBLE))),
               (s2, t2) -> s2 + t2)
             / list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(range(0, 5), j2 ->
                   CASE WHEN j2 = i2 THEN 0.0
                   ELSE nm[CAST(i2 * 5 + j2 + 1 AS INTEGER)]
                        / (a[CAST(i2 + 1 AS INTEGER)]
                           + a[CAST(j2 + 1 AS INTEGER)]) END)),
                 (s2, t2) -> s2 + t2))
            / list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(range(0, 5), i3 ->
                  list_reduce(list_prepend(CAST(0 AS DOUBLE),
                    list_transform(range(0, 5), j3 ->
                      CAST(wm[CAST(i3 * 5 + j3 + 1 AS INTEGER)]
                        AS DOUBLE))), (s3, t3) -> s3 + t3)
                  / list_reduce(list_prepend(CAST(0 AS DOUBLE),
                      list_transform(range(0, 5), j3 ->
                        CASE WHEN j3 = i3 THEN 0.0
                        ELSE nm[CAST(i3 * 5 + j3 + 1 AS INTEGER)]
                             / (a[CAST(i3 + 1 AS INTEGER)]
                                + a[CAST(j3 + 1 AS INTEGER)]) END)),
                      (s3, t3) -> s3 + t3))),
                (s4, t4) -> s4 + t4)))
          AS pi
      FROM mats
    )
    SELECT g.st AS arm,
           CASE g.st WHEN 0 THEN 'click' WHEN 1 THEN 'error'
             WHEN 2 THEN 'purchase' WHEN 3 THEN 'signup' ELSE 'view'
             END AS arm_name,
           CAST(list_sum(list_transform(range(0, 5), j ->
             wm[CAST(g.st * 5 + j + 1 AS INTEGER)])) AS BIGINT) AS wins,
           CAST(list_sum(list_transform(range(0, 5), j ->
             nm[CAST(g.st * 5 + j + 1 AS INTEGER)])) AS BIGINT)
             AS games,
           round(pi[CAST(g.st + 1 AS INTEGER)], 6) AS strength
    FROM fit, (SELECT unnest(range(0, 5)) AS st) g
    ORDER BY arm
    """,
)
def bradley_terry_strengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths for the five event types from daily
    pairwise duels (higher mean daily value wins, lower index on
    exact ties): 20 minorization-maximization iterations
    π_i ← W_i / Σ_{{j≠i}} n_ij/(π_i+π_j), normalized each step — the
    pairwise-preference model behind Elo-style leaderboards and
    reward-model fitting, here as exact engine arithmetic (MM is
    closed-form per step, unlike gradient fits). Reports wins, games,
    and the fitted strength per arm.

    Determinism: duel outcomes are exact integer comparisons of exact
    µ-dollar daily means; W/n pack into fixed-index flat arrays; the
    MM fold runs identical nested double arithmetic on both engines
    (normalization inside the fold keeps the scale pinned).

    Scale: duels aggregate from the bounded (day × arm) frame (the
    self-join is day-keyed); the fit is k² constant-size per
    iteration. Arena-scale item counts swap the dense matrix for the
    sparse (i, j) edge list with the same MM update.
    """
    e = load(spark, sf_dir, "events")
    arm_idx = (
        F.when(F.col("event_type") == "click", 0)
        .when(F.col("event_type") == "error", 1)
        .when(F.col("event_type") == "purchase", 2)
        .when(F.col("event_type") == "signup", 3)
        .otherwise(4)
    )
    byarm = e.groupBy(
        F.col("ts").cast("date").alias("day"), arm_idx.alias("arm")
    ).agg(
        F.expr(
            "CAST(CAST(sum(round(value * 100)) AS BIGINT) * 10000"
            " div count(1) AS BIGINT)"
        ).alias("r6")
    )
    a = byarm.alias("a")
    b = byarm.alias("b")
    duels = (
        a.join(
            b,
            (F.col("a.day") == F.col("b.day"))
            & (F.col("a.arm") != F.col("b.arm")),
        )
        .groupBy(F.col("a.arm").alias("i"), F.col("b.arm").alias("j"))
        .agg(
            F.sum(
                F.when(
                    (F.col("a.r6") > F.col("b.r6"))
                    | (
                        (F.col("a.r6") == F.col("b.r6"))
                        & (F.col("a.arm") < F.col("b.arm"))
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("w"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    packed = duels.agg(
        F.expr("collect_list(struct(i * 5 + j AS k, w, n))").alias("ents")
    )
    mats = packed.select(
        F.expr(
            """
            transform(sequence(0, 24),
              k -> coalesce(get(filter(ents, e -> e.k = k), 0).w, 0L))
            """
        ).alias("wm"),
        F.expr(
            """
            transform(sequence(0, 24),
              k -> coalesce(get(filter(ents, e -> e.k = k), 0).n, 0L))
            """
        ).alias("nm"),
    )
    raw_i = (
        "(aggregate(sequence(0, 4), CAST(0.0 AS DOUBLE),"
        " (s2, j2) -> s2 + CAST(wm[{i} * 5 + j2] AS DOUBLE))"
        " / aggregate(sequence(0, 4), CAST(0.0 AS DOUBLE),"
        " (s2, j2) -> s2 + IF(j2 = {i}, 0.0,"
        " nm[{i} * 5 + j2] / (a[{i}] + a[j2]))))"
    )
    fit = mats.select(
        "wm",
        "nm",
        F.expr(
            f"""
            aggregate(sequence(1, {_BT_ITERS}),
              CAST(array(0.2, 0.2, 0.2, 0.2, 0.2) AS ARRAY<DOUBLE>),
              (a, it) -> transform(sequence(0, 4), i2 ->
                {raw_i.format(i="i2")}
                / aggregate(sequence(0, 4), CAST(0.0 AS DOUBLE),
                    (s4, i3) -> s4 + {raw_i.format(i="i3")})))
            """
        ).alias("pi"),
    )
    arms = spark.range(0, 5).select(F.col("id").cast("int").alias("st"))
    name = (
        F.when(F.col("st") == 0, "click")
        .when(F.col("st") == 1, "error")
        .when(F.col("st") == 2, "purchase")
        .when(F.col("st") == 3, "signup")
        .otherwise("view")
    )
    return (
        fit.crossJoin(F.broadcast(arms))
        .select(
            F.col("st").cast("bigint").alias("arm"),
            name.alias("arm_name"),
            F.expr(
                """
                CAST(aggregate(sequence(0, 4), CAST(0 AS BIGINT),
                  (s, j) -> s + wm[st * 5 + j]) AS BIGINT)
                """
            ).alias("wins"),
            F.expr(
                """
                CAST(aggregate(sequence(0, 4), CAST(0 AS BIGINT),
                  (s, j) -> s + nm[st * 5 + j]) AS BIGINT)
                """
            ).alias("games"),
            F.round(F.expr("pi[st]"), 6).alias("strength"),
        )
        .orderBy("arm")
    )


_LEAK_MOD = 10  # test split: vec_id % 10 == 0
_LEAK_THRESH = [(800000, "n_above_80"), (900000, "n_above_90")]


@query(
    "embedding_leakage_scan",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS DOUBLE)) AS v
      FROM embeddings
    ), n AS (
      SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm
      FROM e
    ), test AS (SELECT * FROM n WHERE vec_id % {_LEAK_MOD} = 0),
    train AS (SELECT * FROM n WHERE vec_id % {_LEAK_MOD} <> 0),
    nearest AS (
      SELECT t.vec_id, t.label,
             max(CAST(round(list_dot_product(t.v, c.v)
                 / (c.nrm * t.nrm) * 1000000) AS BIGINT)) AS best6
      FROM test t JOIN train c ON 1 = 1
      GROUP BY t.vec_id, t.label
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(best6) // count(*) AS BIGINT) AS mean_best_ppm,
           CAST(max(best6) AS BIGINT) AS max_best_ppm,
           {", ".join(
               f"CAST(sum(CASE WHEN best6 >= {t} THEN 1 ELSE 0 END)"
               f" AS BIGINT) AS {c}" for t, c in _LEAK_THRESH)}
    FROM nearest GROUP BY label ORDER BY label
    """,
)
def embedding_leakage_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination scan in embedding space: for every
    held-out vector (vec_id % 10 = 0) find its nearest TRAIN neighbor
    by exact fixed-point cosine and report, per label, the mean/max
    best-match similarity (ppm) and how many test items exceed the
    0.8 / 0.9 leak thresholds — the semantic-duplicate check that
    catches paraphrased contamination `decontaminate_8gram`'s exact
    n-grams cannot. (With this corpus's random embeddings the counts
    sit near zero — the scan proves absence, which is the point.)

    Determinism: fixed-point dots are exact integers, so each test
    item's best similarity quantizes to the same ppm on both engines
    BEFORE the max/mean; per-label sums are integer-exact.

    Scale: the Spark side streams the TRAIN corpus through the blocked
    GEMM (one matmul per Arrow batch) against the broadcast test
    block; each partition emits one running best per test id and a
    final max merges them — nothing pairwise ever shuffles. The audit
    block stays bounded by construction (a deterministic sample at
    production scale); full-corpus scans swap in `ann_ivf_topk`'s
    bucketed path.
    """
    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 10000).cast("long"),
        ).alias("vi"),
    )
    test_rows = sorted(
        e.where(F.col("vec_id") % _LEAK_MOD == 0).collect(),
        key=lambda r: r.vec_id,
    )
    tids = np.array([r.vec_id for r in test_rows], dtype=np.int64)
    tlab = np.array([r.label for r in test_rows], dtype=np.int64)
    T = np.array([r.vi for r in test_rows], dtype=np.float64)
    tn = np.sqrt((T * T).sum(axis=1))
    train = e.where(F.col("vec_id") % _LEAK_MOD != 0)

    def best_blocks(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf["vi"].to_numpy()).astype(np.float64)
            nn = np.sqrt((M * M).sum(axis=1))
            cos = (M @ T.T) / (nn[:, None] * tn[None, :])
            best = np.round(cos.max(axis=0) * 1000000).astype(np.int64)
            yield pd.DataFrame(
                {
                    "vec_id": tids,
                    "label": tlab,
                    "best6": best,
                }
            )

    nearest = (
        train.mapInPandas(
            best_blocks, "vec_id long, label long, best6 long"
        )
        .groupBy("vec_id", "label")
        .agg(F.max("best6").alias("best6"))
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.expr("CAST(sum(best6) div count(1) AS BIGINT)").alias(
            "mean_best_ppm"
        ),
        F.max("best6").cast("bigint").alias("max_best_ppm"),
    ]
    for t, c in _LEAK_THRESH:
        aggs.append(
            F.sum(F.when(F.col("best6") >= t, 1).otherwise(0))
            .cast("bigint")
            .alias(c)
        )
    return nearest.groupBy("label").agg(*aggs).orderBy("label")
