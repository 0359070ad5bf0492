"""LLM-pipeline wave 70: contrastive-loss evaluation and corpus
source divergence.

- `infonce_loss_eval` — the InfoNCE contrastive objective evaluated
  exactly over the embedding store: each vector's POSITIVE view is
  its int8 quantize-dequantize round trip (the
  `quantize_embeddings_int8` scheme as augmentation), negatives are
  the other vectors in its 16-vector batch, temperature 0.1; emits
  the mean loss, the retrieval accuracy (positive ranked first),
  and the positive/negative similarity gap — the training-objective
  audit for a contrastive embedding pipeline.
- `source_vocab_jsd_matrix` — pairwise Jensen-Shannon divergence
  between the 20 corpus sources' word distributions on the global
  top-200 vocabulary: the most- and least-divergent source pairs —
  the cross-source drift matrix behind mixture decisions
  (`domain_mix_weights`) and contamination checks.

Determinism: quantized views and batch memberships are exact
integer algebra; similarities come from exact 1e-4-unit dot
products; per-anchor losses quantize to micro-units before
averaging; JSD sums bounded identical terms.

Scale: InfoNCE blocks ALL pair work inside 16-vector batches
(batch x batch x dim, never corpus^2); the JSD matrix lives on the
20 x 200 source-vocabulary frame after one token pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_NCE_BATCH = 16
_NCE_TAU = 0.1


@query(
    "infonce_loss_eval",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, CAST(vec_id // {_NCE_BATCH} AS BIGINT) AS b,
             list_transform(generate_series(1, len(embedding)),
               i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)) AS x
      FROM embeddings
    ), scaled AS (
      SELECT vec_id, b, x,
             list_max(list_transform(x, v -> abs(v))) AS mx
      FROM base
    ), views AS (
      SELECT vec_id, b, x,
             list_transform(x, v -> CASE WHEN mx = 0 THEN 0.0
               ELSE round(v * 127.0 / mx) * mx / 127.0 END) AS xq,
             sqrt(CAST(list_sum(list_transform(x, v -> v * v))
               AS DOUBLE)) AS nx,
             sqrt(list_sum(list_transform(
               list_transform(x, v -> CASE WHEN mx = 0 THEN 0.0
                 ELSE round(v * 127.0 / mx) * mx / 127.0 END),
               v -> v * v))) AS nq
      FROM scaled
    ), sims AS (
      SELECT a.vec_id AS i, v.vec_id AS j, a.b,
             list_sum(list_transform(generate_series(1, len(a.x)),
               k -> a.x[k] * v.xq[k])) / (a.nx * v.nq) AS s
      FROM views a JOIN views v ON v.b = a.b
    ), per_anchor AS (
      SELECT i, b,
             CAST(round((-ln(exp(max(CASE WHEN i = j THEN s END)
                   / {_NCE_TAU})
               / sum(exp(s / {_NCE_TAU})))) * 1000000) AS BIGINT)
               AS loss_micro,
             CASE WHEN max(CASE WHEN i = j THEN s END)
                  >= COALESCE(max(CASE WHEN i <> j THEN s END),
                              -1e18) THEN 1 ELSE 0 END AS top1,
             max(CASE WHEN i = j THEN s END) AS pos_s,
             (sum(s) - max(CASE WHEN i = j THEN s END))
               / (count(*) - 1) AS neg_s
      FROM sims GROUP BY i, b
    )
    SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_batches,
           CAST(count(*) AS BIGINT) AS n_anchors,
           CAST((2 * sum(loss_micro) + count(*)) // (2 * count(*))
             AS DOUBLE) / 1000000 AS mean_infonce_loss,
           CAST((2000000 * sum(top1) + count(*)) // (2 * count(*))
             AS DOUBLE) / 1000000 AS retrieval_acc,
           round(avg(pos_s), 6) AS mean_positive_sim,
           round(avg(neg_s), 6) AS mean_negative_sim
    FROM per_anchor
    """,
)
def infonce_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfoNCE (CPC / SimCLR-style) contrastive objective evaluated
    exactly over the embedding store: the positive view of each
    vector is its int8 quantize-dequantize round trip (a
    deterministic 'augmentation' with known distortion), negatives
    are the other members of its {_NCE_BATCH}-vector batch,
    temperature {_NCE_TAU}; loss_i =
    -ln(exp(s_ii/tau) / sum_j exp(s_ij/tau)). The retrieval
    accuracy (positive ranked first, ties to the anchor) should sit
    near 1 — the audit that says the augmentation is learnable-from
    rather than destructive, which is exactly what a contrastive
    data pipeline needs to know before burning GPU time.

    Determinism: quantized coordinates are exact integer algebra;
    dot products are exact 1e-4-unit sums; per-anchor losses
    quantize to micro-units before the exact mean; top-1 ties break
    toward the anchor id.

    Scale: the ONLY pair work is batch-blocked ({_NCE_BATCH}^2 x d
    per batch, linear in corpus size) — the standard in-batch-
    negatives trick that makes contrastive training tractable, here
    mirrored in the evaluation plan.
    """
    e = load(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        F.floor(F.col("vec_id") / _NCE_BATCH).cast("bigint").alias("b"),
        F.expr(
            "transform(embedding,"
            " v -> CAST(round(v * 10000) AS BIGINT))"
        ).alias("x"),
    )
    views = base.select(
        "vec_id",
        "b",
        "x",
        F.expr("array_max(transform(x, v -> abs(v)))").alias("mx"),
    ).select(
        "vec_id",
        "b",
        "x",
        F.expr(
            "transform(x, v -> CASE WHEN mx = 0 THEN 0D"
            " ELSE round(v * 127.0 / mx) * mx / 127.0 END)"
        ).alias("xq"),
        F.expr(
            "sqrt(CAST(aggregate(x, 0L, (acc, v) -> acc + v * v)"
            " AS DOUBLE))"
        ).alias("nx"),
        F.expr(
            "sqrt(aggregate(transform(x, v -> CASE WHEN mx = 0 THEN 0D"
            " ELSE round(v * 127.0 / mx) * mx / 127.0 END),"
            " 0D, (acc, v) -> acc + v * v))"
        ).alias("nq"),
    )
    a = views.select(
        F.col("vec_id").alias("i"), "b", F.col("x").alias("ax"),
        F.col("nx").alias("nxa"),
    )
    v = views.select(
        F.col("vec_id").alias("j"), F.col("b").alias("b2"),
        F.col("xq").alias("vq"), F.col("nq").alias("nqv"),
    )
    sims = a.join(v, F.col("b") == F.col("b2")).select(
        "i",
        "j",
        "b",
        (
            F.expr(
                "aggregate(zip_with(ax, vq, (p, q) -> p * q),"
                " 0D, (acc, t) -> acc + t)"
            )
            / (F.col("nxa") * F.col("nqv"))
        ).alias("s"),
    )
    per_anchor = sims.groupBy("i", "b").agg(
        F.round(
            (
                -F.log(
                    F.exp(
                        F.max(
                            F.when(F.col("i") == F.col("j"), F.col("s"))
                        )
                        / _NCE_TAU
                    )
                    / F.sum(F.exp(F.col("s") / _NCE_TAU))
                )
            )
            * 1000000
        )
        .cast("bigint")
        .alias("loss_micro"),
        F.when(
            F.max(F.when(F.col("i") == F.col("j"), F.col("s")))
            >= F.coalesce(
                F.max(F.when(F.col("i") != F.col("j"), F.col("s"))),
                F.lit(-1e18),
            ),
            1,
        )
        .otherwise(0)
        .alias("top1"),
        F.max(F.when(F.col("i") == F.col("j"), F.col("s"))).alias("pos_s"),
        (
            (
                F.sum("s")
                - F.max(F.when(F.col("i") == F.col("j"), F.col("s")))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("neg_s"),
    )
    return per_anchor.agg(
        F.countDistinct("b").cast("bigint").alias("n_batches"),
        F.count(F.lit(1)).cast("bigint").alias("n_anchors"),
        # integer HALF_UP (see motif_trade_triangles): round(a/b, 6) as
        # ((2e6*a + b) div (2b)) / 1e6 — no double half boundary
        F.expr(
            "CAST((2 * sum(loss_micro) + count(*)) div (2 * count(*))"
            " AS DOUBLE) / 1000000"
        ).alias("mean_infonce_loss"),
        F.expr(
            "CAST((2000000 * sum(top1) + count(*)) div (2 * count(*))"
            " AS DOUBLE) / 1000000"
        ).alias("retrieval_acc"),
        F.round(F.avg("pos_s"), 6).alias("mean_positive_sim"),
        F.round(F.avg("neg_s"), 6).alias("mean_negative_sim"),
    )


_JSD_VOCAB = 200
_JSD_TOPK = 5


@query(
    "source_vocab_jsd_matrix",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(string_split(trim(text), ' ')) AS w
      FROM documents
    ), vocab AS (
      SELECT w FROM (
        SELECT w, row_number() OVER (ORDER BY count(*) DESC, w)
          AS rk
        FROM toks GROUP BY w
      ) WHERE rk <= {_JSD_VOCAB}
    ), sw AS (
      SELECT t.source, t.w, CAST(count(*) AS BIGINT) AS n
      FROM toks t JOIN vocab v ON v.w = t.w
      GROUP BY 1, 2
    ), full_grid AS (
      SELECT s.source, v.w, COALESCE(sw.n, 0) AS n
      FROM (SELECT DISTINCT source FROM sw) s
      CROSS JOIN vocab v
      LEFT JOIN sw ON sw.source = s.source AND sw.w = v.w
    ), probs AS (
      SELECT source, w,
             n * 1.0 / sum(n) OVER (PARTITION BY source) AS p
      FROM full_grid
    ), pairs AS (
      SELECT a.source AS sa, b.source AS sb,
             sum(CASE WHEN a.p > 0
                 THEN 0.5 * a.p * ln(a.p / ((a.p + b.p) / 2))
                 ELSE 0 END
               + CASE WHEN b.p > 0
                 THEN 0.5 * b.p * ln(b.p / ((a.p + b.p) / 2))
                 ELSE 0 END) AS jsd
      FROM probs a JOIN probs b ON a.w = b.w AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT sa AS source_a, sb AS source_b, round(jsd, 6) AS jsd
    FROM pairs
    ORDER BY round(jsd, 6) DESC, source_a, source_b
    LIMIT {_JSD_TOPK}
    """,
)
def source_vocab_jsd_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the corpus sources'
    word distributions on the global top-{_JSD_VOCAB} vocabulary
    (zeros kept — JSD's mixture denominator makes every term
    finite), reporting the {_JSD_TOPK} most-divergent source pairs.
    High-JSD sources need separate mixture weights
    (`domain_mix_weights`) and are prime contamination-check
    boundaries; near-zero pairs are candidates for merging. The
    cross-source matrix view of `js_hellinger_drift` (two fixed
    populations) built on vocabulary rather than prices.

    Determinism: the vocabulary is a count-ranked top-{_JSD_VOCAB}
    with word tie-breaks; counts are exact int64; each pair's JSD
    sums {_JSD_VOCAB} identical closed-form terms rounded 6dp
    (ordering by the ROUNDED value).

    Scale: ONE token pass reduces to the 20 x {_JSD_VOCAB}
    source-vocabulary frame; the pair join is 190 x {_JSD_VOCAB}
    bounded rows — no document ever meets another document.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
    )
    # top-vocab via TakeOrdered (parallel per-partition top-k), not an
    # unpartitioned row_number over the full corpus vocabulary
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "w")
        .limit(_JSD_VOCAB)
        .select("w")
    )
    sw = (
        toks.join(F.broadcast(vocab), "w")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    sources = sw.select("source").distinct()
    full_grid = (
        sources.crossJoin(F.broadcast(vocab))
        .join(sw, ["source", "w"], "left")
        .select(
            "source", "w", F.coalesce(F.col("n"), F.lit(0)).alias("n")
        )
    )
    probs = full_grid.select(
        "source",
        "w",
        (
            F.col("n")
            * 1.0
            / F.sum("n").over(Window.partitionBy("source"))
        ).alias("p"),
    )
    a = probs.select(
        F.col("source").alias("sa"), "w", F.col("p").alias("pa")
    )
    b = probs.select(
        F.col("source").alias("sb"), "w", F.col("p").alias("pb")
    )
    pairs = (
        a.join(b, "w")
        .where(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(
            F.sum(
                F.when(
                    F.col("pa") > 0,
                    0.5
                    * F.col("pa")
                    * F.log(F.col("pa") / ((F.col("pa") + F.col("pb")) / 2)),
                ).otherwise(0.0)
                + F.when(
                    F.col("pb") > 0,
                    0.5
                    * F.col("pb")
                    * F.log(F.col("pb") / ((F.col("pa") + F.col("pb")) / 2)),
                ).otherwise(0.0)
            ).alias("jsd")
        )
    )
    return (
        pairs.select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            F.round("jsd", 6).alias("jsd"),
        )
        .orderBy(F.desc("jsd"), "source_a", "source_b")
        .limit(_JSD_TOPK)
    )
