"""Curation wave 8: confident-learning label-noise detection and
active-learning acquisition batches.

Confident learning (Northcutt et al.) estimates WHICH examples carry
wrong labels from predicted probabilities alone — the label-noise
audit run before any re-annotation budget is spent. Active-learning
acquisition picks the next batch to label; comparing margin,
disagreement, and random baselines shows what the fancy strategies
actually buy. Both consume the engine's deterministic pseudo-prob
scores (mlprep.py), so the whole pipeline is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.mlprep import duck_pseudo_prob, pseudo_prob
from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_SCORED_SQL = f"""
      SELECT vec_id, CAST(label % 2 AS BIGINT) AS y,
             CAST(round({duck_pseudo_prob(0)} * 1000000) AS BIGINT) AS p6
      FROM embeddings
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "embeddings").select(
        "vec_id",
        (F.col("label") % 2).cast("bigint").alias("y"),
        F.round(pseudo_prob(0) * 1000000).cast("bigint").alias("p6"),
    )


@query(
    "confident_learning_noise",
    oracle=f"""
    WITH s AS ({_SCORED_SQL}),
    thr AS (
      SELECT y AS c, CAST(count(*) AS BIGINT) AS n_c,
             CAST(sum(CASE WHEN c.c2 = 1 THEN p6
                           ELSE 1000000 - p6 END) AS BIGINT) AS sp
      FROM s, (SELECT unnest([0, 1]) AS c2) c
      WHERE c.c2 = y
      GROUP BY y
    ), joint AS (
      SELECT s.y AS given, cc.c AS suggested,
             CAST(count(*) AS BIGINT) AS n
      FROM s
      JOIN thr t1 ON t1.c = 1
      JOIN thr t0 ON t0.c = 0
      CROSS JOIN (SELECT unnest([0, 1]) AS c) cc
      WHERE (cc.c = 1 AND s.p6 * t1.n_c >= t1.sp
             AND NOT ((1000000 - s.p6) * t0.n_c >= t0.sp
                      AND 1000000 - s.p6 > s.p6))
         OR (cc.c = 0 AND (1000000 - s.p6) * t0.n_c >= t0.sp
             AND NOT (s.p6 * t1.n_c >= t1.sp AND s.p6 > 1000000 - s.p6))
      GROUP BY 1, 2
    ), tot AS (SELECT CAST(sum(n) AS BIGINT) AS cj_total FROM joint)
    SELECT j.given, j.suggested, j.n,
           CAST(j.n * 1000000 // t.cj_total AS BIGINT) AS joint_ppm,
           CASE WHEN j.given <> j.suggested THEN 1 ELSE 0 END
             AS is_noise_cell
    FROM joint j CROSS JOIN tot t
    ORDER BY j.given, j.suggested
    """,
)
def confident_learning_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confident-learning label-noise audit (Northcutt's confident
    joint): per class c the confidence threshold t_c is the MEAN
    predicted probability of c among examples LABELED c; an example
    joins cell (given=y, suggested=c) when its probability for c
    clears t_c (ties to the higher-probability class when both
    clear) — off-diagonal mass is the estimated label-noise rate,
    and those cells are the re-annotation worklist. Run on the
    engine's deterministic scores, so the whole audit is exact.

    Determinism: probabilities are ppm integers; the threshold
    comparison p̄_c ≤ p is evaluated as the EXACT integer cross-
    product p6·n_c ≥ Σp6 (no mean division); all cells are integer
    counts.

    Scale: thresholds are one map-side-combined per-class aggregate
    (a broadcast 2-row dimension); cell assignment is a map-side
    predicate; the joint is a k² aggregate.
    """
    s = _scored(spark, sf_dir)
    thr = s.groupBy(F.col("y").alias("c")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_c"),
        F.sum(
            F.when(F.col("y") == 1, F.col("p6")).otherwise(
                1000000 - F.col("p6")
            )
        )
        .cast("bigint")
        .alias("sp"),
    )
    t1 = thr.filter(F.col("c") == 1).select(
        F.col("n_c").alias("n1"), F.col("sp").alias("sp1")
    )
    t0 = thr.filter(F.col("c") == 0).select(
        F.col("n_c").alias("n0"), F.col("sp").alias("sp0")
    )
    j = s.crossJoin(F.broadcast(t1)).crossJoin(F.broadcast(t0))
    clears1 = F.col("p6") * F.col("n1") >= F.col("sp1")
    clears0 = (1000000 - F.col("p6")) * F.col("n0") >= F.col("sp0")
    pref1 = F.col("p6") > 1000000 - F.col("p6")
    sug1 = clears1 & ~(clears0 & ~pref1)
    sug0 = clears0 & ~(clears1 & pref1)
    cells = (
        j.select(
            "y",
            F.when(sug1, 1).when(sug0, 0).alias("suggested"),
        )
        .filter(F.col("suggested").isNotNull())
        .groupBy(F.col("y").alias("given"), "suggested")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = cells.agg(F.sum("n").cast("bigint").alias("cj_total"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "given",
            F.col("suggested").cast("bigint").alias("suggested"),
            "n",
            F.expr("CAST(n * 1000000 div cj_total AS BIGINT)").alias(
                "joint_ppm"
            ),
            F.when(F.col("given") != F.col("suggested"), 1)
            .otherwise(0)
            .alias("is_noise_cell"),
        )
        .orderBy("given", "suggested")
    )


_AL_K = 20


@query(
    "active_learning_batch",
    oracle=f"""
    WITH s AS (
      SELECT vec_id, CAST(label % 2 AS BIGINT) AS y,
             CAST(round({duck_pseudo_prob(0)} * 1000000) AS BIGINT) AS pa6,
             CAST(round({duck_pseudo_prob(1)} * 1000000) AS BIGINT) AS pb6
      FROM embeddings
    ), scoredall AS (
      SELECT vec_id, y, pa6, pb6,
             abs(pa6 - 500000) AS margin,
             abs(pa6 - pb6) AS disagree,
             {{MD5H}} % 1000000 AS rnd
      FROM s
    ), m AS (
      SELECT 'margin' AS strategy, vec_id, y, pa6
      FROM scoredall ORDER BY margin, vec_id LIMIT {_AL_K}
    ), d AS (
      SELECT 'disagreement' AS strategy, vec_id, y, pa6
      FROM scoredall ORDER BY disagree DESC, vec_id LIMIT {_AL_K}
    ), r AS (
      SELECT 'random' AS strategy, vec_id, y, pa6
      FROM scoredall ORDER BY rnd, vec_id LIMIT {_AL_K}
    ), picks AS (
      SELECT * FROM m UNION ALL SELECT * FROM d UNION ALL SELECT * FROM r
    ), ov AS (
      SELECT CAST(count(*) AS BIGINT) AS md_overlap
      FROM m JOIN d ON m.vec_id = d.vec_id
    )
    SELECT p.strategy,
           CAST(count(*) AS BIGINT) AS k,
           CAST(sum(p.y) AS BIGINT) AS positives,
           CAST(sum(p.pa6) // count(*) AS BIGINT) AS mean_p_ppm,
           CAST(min(p.vec_id) AS BIGINT) AS min_id,
           (SELECT md_overlap FROM ov) AS margin_disagree_overlap
    FROM picks p GROUP BY p.strategy ORDER BY p.strategy
    """.replace(
        "{MD5H}",
        "list_reduce(list_prepend(CAST(0 AS BIGINT),"
        " list_transform(generate_series(1, 8),"
        " i -> CAST(strpos('0123456789abcdef',"
        " substr(md5(CAST(vec_id AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1"
        " AS BIGINT))), (acc, c) -> acc * 16 + c)",
    ),
)
def active_learning_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-learning batch selection, three acquisition strategies
    side by side over the unlabeled pool: margin (closest to the 0.5
    boundary — classic uncertainty sampling), query-by-committee
    disagreement (largest |p_A − p_B| between the two models), and a
    deterministic random baseline — each picking k=20, reporting label
    yield, mean score, and the margin∩disagreement overlap (how
    different the strategies' picks actually are, the question that
    decides whether committee costs are worth it).

    Determinism: margin and disagreement are exact integer ppm
    distances; random is the portable md5 coin; every top-k is
    (score, vec_id)-ordered.

    Scale: all three selections are TakeOrdered (orderBy().limit())
    over map-side scores — no global rank materializes; overlap joins
    k-row frames.
    """
    s = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        (F.col("label") % 2).cast("bigint").alias("y"),
        F.round(pseudo_prob(0) * 1000000).cast("bigint").alias("pa6"),
        F.round(pseudo_prob(1) * 1000000).cast("bigint").alias("pb6"),
    )
    scored = s.select(
        "vec_id",
        "y",
        "pa6",
        F.abs(F.col("pa6") - 500000).alias("margin"),
        F.abs(F.col("pa6") - F.col("pb6")).alias("disagree"),
        (
            F.expr(
                "CAST(conv(substr(md5(CAST(vec_id AS STRING)), 1, 8),"
                " 16, 10) AS BIGINT)"
            )
            % 1000000
        ).alias("rnd"),
    )
    m = (
        scored.orderBy("margin", "vec_id")
        .limit(_AL_K)
        .select(F.lit("margin").alias("strategy"), "vec_id", "y", "pa6")
    )
    d = (
        scored.orderBy(F.desc("disagree"), "vec_id")
        .limit(_AL_K)
        .select(
            F.lit("disagreement").alias("strategy"), "vec_id", "y", "pa6"
        )
    )
    r = (
        scored.orderBy("rnd", "vec_id")
        .limit(_AL_K)
        .select(F.lit("random").alias("strategy"), "vec_id", "y", "pa6")
    )
    ov = m.select(F.col("vec_id").alias("mid")).join(
        d.select(F.col("vec_id").alias("did")),
        F.col("mid") == F.col("did"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("md_overlap"))
    picks = m.unionAll(d).unionAll(r)
    return (
        picks.groupBy("strategy")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k"),
            F.sum("y").cast("bigint").alias("positives"),
            F.expr("CAST(sum(pa6) div count(1) AS BIGINT)").alias(
                "mean_p_ppm"
            ),
            F.min("vec_id").cast("bigint").alias("min_id"),
        )
        .crossJoin(F.broadcast(ov))
        .select(
            "strategy",
            "k",
            "positives",
            "mean_p_ppm",
            "min_id",
            F.col("md_overlap").alias("margin_disagree_overlap"),
        )
        .orderBy("strategy")
    )
