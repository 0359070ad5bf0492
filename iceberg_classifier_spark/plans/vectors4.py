"""Vector wave 4: 1-bit embedding compression, closed-form linear
discriminants, and sample-efficiency curves.

`binary_quantization_hamming` is the 64x-compression retrieval path
every modern vector store ships (sign-bit codes + Hamming scan +
exact rerank) with recall measured against the exact top-k;
`fisher_lda_direction` computes the 2-class Fisher discriminant in
closed form from distributed moments; `learning_curve_ridge` fits a
ridge regression on growing nested training subsets entirely from
cumulative sufficient statistics and evaluates on a held-out bucket —
the "is more data still buying accuracy" curve, with zero refit
passes over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_BQ_QUERIES = 8
_BQ_CAND = 32  # Hamming candidates kept per query
_BQ_K = 10  # final reranked top-k


@query(
    "binary_quantization_hamming",
    oracle=f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))
               AS v
      FROM embeddings
    ), coded AS (
      SELECT vec_id, v,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, 33),
                 j -> CASE WHEN v[CAST(j AS INTEGER)] >= 0
                      THEN (CAST(1 AS BIGINT) << (j - 1))
                      ELSE CAST(0 AS BIGINT) END)),
               (a, b) -> a + b) AS h1,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(33, 65),
                 j -> CASE WHEN v[CAST(j AS INTEGER)] >= 0
                      THEN (CAST(1 AS BIGINT) << (j - 33))
                      ELSE CAST(0 AS BIGINT) END)),
               (a, b) -> a + b) AS h2
      FROM e
    ), q AS (SELECT * FROM coded WHERE vec_id < {_BQ_QUERIES}),
    ham AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(bit_count(xor(q.h1, c.h1))
                  + bit_count(xor(q.h2, c.h2)) AS BIGINT) AS hd
      FROM q JOIN coded c ON q.vec_id <> c.vec_id
    ), cand AS (
      SELECT query_id, neighbor_id, hd
      FROM ham
      QUALIFY row_number() OVER (PARTITION BY query_id
                                 ORDER BY hd, neighbor_id)
              <= {_BQ_CAND}
    ), reranked AS (
      SELECT ca.query_id, ca.neighbor_id, ca.hd,
             list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(c.v, c.v))) AS cos
      FROM cand ca
      JOIN coded q ON q.vec_id = ca.query_id
      JOIN coded c ON c.vec_id = ca.neighbor_id
      QUALIFY row_number() OVER (PARTITION BY ca.query_id
                                 ORDER BY cos DESC, ca.neighbor_id)
              <= {_BQ_K}
    ), exact AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM q JOIN coded c ON q.vec_id <> c.vec_id
      QUALIFY row_number() OVER (PARTITION BY q.vec_id
        ORDER BY list_dot_product(q.v, c.v)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(c.v, c.v))) DESC,
                 c.vec_id) <= {_BQ_K}
    )
    SELECT r.query_id,
           CAST(count(*) AS BIGINT) AS returned,
           CAST(sum(CASE WHEN x.neighbor_id IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS exact_overlap,
           round(sum(CASE WHEN x.neighbor_id IS NOT NULL
                     THEN 1 ELSE 0 END) * 1.0 / {_BQ_K}, 6)
             AS recall_at_{_BQ_K},
           round(avg(r.hd * 1.0), 6) AS mean_hamming,
           round(min(r.cos), 6) AS min_cos,
           round(max(r.cos), 6) AS max_cos
    FROM reranked r
    LEFT JOIN exact x
      ON x.query_id = r.query_id AND x.neighbor_id = r.neighbor_id
    GROUP BY r.query_id
    ORDER BY r.query_id
    """,
)
def binary_quantization_hamming(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """1-bit (sign) quantization retrieval: each 64-dim embedding
    compresses to two 32-bit sign words (64x smaller), candidate
    generation is a Hamming scan (two XOR+popcounts per vector —
    SIMD-trivial), the top-{_BQ_CAND} candidates are reranked with
    the exact cosine, and recall@{_BQ_K} is measured against the
    exact top-{_BQ_K}. The memory-bound regime every billion-vector
    store runs in: full-precision vectors touched only for ~32
    candidates per query.

    Determinism: codes and Hamming distances are exact integers;
    cosines divide exact fixed-point dot products; ties break on
    neighbor_id.

    Scale: the query block ({_BQ_QUERIES} codes) broadcasts; the
    Hamming scan ships 16 bytes per corpus vector, and only
    candidate ids reach the rerank join. The exact arm exists purely
    as the recall oracle (same role as in `ann_ivf_recall`).
    """
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 10000).cast("long"),
        ).alias("v"),
    )
    pack = (
        "aggregate(transform(sequence({lo}, {hi}),"
        " j -> CASE WHEN element_at(v, j) >= 0"
        " THEN shiftleft(CAST(1 AS BIGINT), j - {lo})"
        " ELSE CAST(0 AS BIGINT) END),"
        " CAST(0 AS BIGINT), (a, b) -> a + b)"
    )
    coded = e.select(
        "vec_id",
        "v",
        F.expr(pack.format(lo=1, hi=32)).alias("h1"),
        F.expr(pack.format(lo=33, hi=64)).alias("h2"),
    )
    q = coded.filter(F.col("vec_id") < _BQ_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("h1").alias("qh1"),
        F.col("h2").alias("qh2"),
    )
    ham = coded.join(
        F.broadcast(q), F.col("vec_id") != F.col("qid")
    ).select(
        F.col("qid").alias("query_id"),
        F.col("vec_id").alias("neighbor_id"),
        F.expr(
            "CAST(bit_count(qh1 ^ h1) + bit_count(qh2 ^ h2) AS BIGINT)"
        ).alias("hd"),
    )
    wq = Window.partitionBy("query_id").orderBy("hd", "neighbor_id")
    cand = ham.withColumn("rk", F.row_number().over(wq)).filter(
        F.col("rk") <= _BQ_CAND
    )
    dot = (
        "aggregate(zip_with(qv, cv, (a, b) -> CAST(a * b AS DOUBLE)),"
        " CAST(0 AS DOUBLE), (s, x) -> s + x)"
    )
    rerank_base = (
        cand.join(
            F.broadcast(
                q.select(F.col("qid"), F.col("qv"))
            ),
            F.col("query_id") == F.col("qid"),
        )
        .join(
            coded.select(
                F.col("vec_id").alias("cid"), F.col("v").alias("cv")
            ),
            F.col("neighbor_id") == F.col("cid"),
        )
        .withColumn(
            "cos",
            F.expr(
                f"{dot} / (sqrt(aggregate(transform(qv,"
                " x -> CAST(x * x AS DOUBLE)), CAST(0 AS DOUBLE),"
                " (s, y) -> s + y)) * sqrt(aggregate(transform(cv,"
                " x -> CAST(x * x AS DOUBLE)), CAST(0 AS DOUBLE),"
                " (s, y) -> s + y)))"
            ),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), "neighbor_id"
    )
    reranked = rerank_base.withColumn(
        "rk2", F.row_number().over(wr)
    ).filter(F.col("rk2") <= _BQ_K)
    # exact top-k arm (the recall baseline, as in ann_ivf_recall)
    exact_base = coded.join(
        F.broadcast(q), F.col("vec_id") != F.col("qid")
    ).withColumn(
        "cos",
        F.expr(
            "aggregate(zip_with(qv, v, (a, b) -> CAST(a * b AS DOUBLE)),"
            " CAST(0 AS DOUBLE), (s, x) -> s + x)"
            " / (sqrt(aggregate(transform(qv, x -> CAST(x * x AS"
            " DOUBLE)), CAST(0 AS DOUBLE), (s, y) -> s + y))"
            " * sqrt(aggregate(transform(v, x -> CAST(x * x AS"
            " DOUBLE)), CAST(0 AS DOUBLE), (s, y) -> s + y)))"
        ),
    )
    we = Window.partitionBy("qid").orderBy(F.desc("cos"), "vec_id")
    exact = (
        exact_base.withColumn("rk", F.row_number().over(we))
        .filter(F.col("rk") <= _BQ_K)
        .select(
            F.col("qid").alias("e_qid"),
            F.col("vec_id").alias("e_nid"),
        )
    )
    return (
        reranked.join(
            F.broadcast(exact),
            (F.col("query_id") == F.col("e_qid"))
            & (F.col("neighbor_id") == F.col("e_nid")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("returned"),
            F.sum(
                F.when(F.col("e_nid").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("exact_overlap"),
            F.round(
                F.sum(
                    F.when(F.col("e_nid").isNotNull(), 1).otherwise(0)
                )
                * 1.0
                / _BQ_K,
                6,
            ).alias(f"recall_at_{_BQ_K}"),
            F.round(F.avg(F.col("hd") * 1.0), 6).alias("mean_hamming"),
            F.round(F.min("cos"), 6).alias("min_cos"),
            F.round(F.max("cos"), 6).alias("max_cos"),
        )
        .orderBy("query_id")
    )


@query(
    "fisher_lda_direction",
    oracle="""
    WITH pts AS (
      SELECT CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y,
             CAST(round(CAST(embedding[1] AS DOUBLE) * 10000) AS BIGINT)
               AS x1,
             CAST(round(CAST(embedding[2] AS DOUBLE) * 10000) AS BIGINT)
               AS x2
      FROM embeddings
    ), moms AS (
      SELECT y,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x1) AS BIGINT) AS s1,
             CAST(sum(x2) AS BIGINT) AS s2,
             CAST(sum(x1 * x1) AS BIGINT) AS s11,
             CAST(sum(x1 * x2) AS BIGINT) AS s12,
             CAST(sum(x2 * x2) AS BIGINT) AS s22
      FROM pts GROUP BY y
    ), pooled AS (
      SELECT
        max(CASE WHEN y = 1 THEN s1 * 1.0 / n END)
          - max(CASE WHEN y = 0 THEN s1 * 1.0 / n END) AS d1,
        max(CASE WHEN y = 1 THEN s2 * 1.0 / n END)
          - max(CASE WHEN y = 0 THEN s2 * 1.0 / n END) AS d2,
        sum(s11 - s1 * 1.0 * s1 / n) / (sum(n) - 2) AS c11,
        sum(s12 - s1 * 1.0 * s2 / n) / (sum(n) - 2) AS c12,
        sum(s22 - s2 * 1.0 * s2 / n) / (sum(n) - 2) AS c22,
        max(CASE WHEN y = 0 THEN s1 * 1.0 / n END) AS m01,
        max(CASE WHEN y = 0 THEN s2 * 1.0 / n END) AS m02,
        max(CASE WHEN y = 1 THEN s1 * 1.0 / n END) AS m11,
        max(CASE WHEN y = 1 THEN s2 * 1.0 / n END) AS m12
      FROM moms
    ), wvec AS (
      SELECT (c22 * d1 - c12 * d2) / (c11 * c22 - c12 * c12) AS w1,
             (c11 * d2 - c12 * d1) / (c11 * c22 - c12 * c12) AS w2,
             m01, m02, m11, m12
      FROM pooled
    ), thr AS (
      SELECT w1, w2,
             (w1 * (m01 + m11) + w2 * (m02 + m12)) / 2 AS cut,
             w1 * m01 + w2 * m02 AS p0,
             w1 * m11 + w2 * m12 AS p1
      FROM wvec
    )
    SELECT p.y AS label_group,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN (CASE WHEN t.w1 * p.x1 + t.w2 * p.x2
                                         > t.cut
                               THEN 1 ELSE 0 END) = p.y
                    THEN 1 ELSE 0 END) AS BIGINT) AS correct,
           round(sum(CASE WHEN (CASE WHEN t.w1 * p.x1 + t.w2 * p.x2
                                          > t.cut
                                THEN 1 ELSE 0 END) = p.y
                     THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS accuracy,
           round(t.w1 * 1e8, 6) AS w1_scaled,
           round(t.w2 * 1e8, 6) AS w2_scaled,
           round((t.p1 - t.p0) / 10000.0, 6) AS class_separation
    FROM pts p CROSS JOIN thr t
    GROUP BY p.y, t.w1, t.w2, t.p0, t.p1
    ORDER BY label_group
    """,
)
def fisher_lda_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's linear discriminant in closed form: classes are the
    coarse label split (label >= 5), features the first two embedding
    coordinates; the pooled within-class covariance and class-mean
    difference give w = S_w^-1 (mu1 - mu0) by exact 2x2 inversion,
    and every point is classified against the midpoint threshold in
    the same pass. Emits the per-class confusion with the
    discriminant direction and projected class separation — LDA as
    two distributed moment aggregations + one broadcast, no MLlib
    iteration, no gradient.

    Determinism: per-class moments are exact int64 (fixed-point 1e-4
    coordinates); all downstream algebra is closed-form doubles.

    Scale: one map-side-combined groupBy(label) over 6 sums, a 2-row
    pooled frame, then one classification pass with the 5-constant
    discriminant broadcast. The 100 TB shape of "fit a linear probe
    on embeddings".
    """
    e = load(spark, sf_dir, "embeddings")
    pts = e.select(
        F.when(F.col("label") >= 5, 1).otherwise(0).alias("y"),
        F.expr(
            "CAST(round(CAST(embedding[0] AS DOUBLE) * 10000) AS BIGINT)"
        ).alias("x1"),
        F.expr(
            "CAST(round(CAST(embedding[1] AS DOUBLE) * 10000) AS BIGINT)"
        ).alias("x2"),
    )
    moms = pts.groupBy("y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("s1"),
        F.sum("x2").cast("bigint").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("s22"),
    )
    m = lambda y, c: F.max(F.when(F.col("y") == y, c))  # noqa: E731
    pooled = moms.agg(
        (
            m(1, F.col("s1") * 1.0 / F.col("n"))
            - m(0, F.col("s1") * 1.0 / F.col("n"))
        ).alias("d1"),
        (
            m(1, F.col("s2") * 1.0 / F.col("n"))
            - m(0, F.col("s2") * 1.0 / F.col("n"))
        ).alias("d2"),
        (
            F.sum(F.col("s11") - F.col("s1") * 1.0 * F.col("s1") / F.col("n"))
            / (F.sum("n") - 2)
        ).alias("c11"),
        (
            F.sum(F.col("s12") - F.col("s1") * 1.0 * F.col("s2") / F.col("n"))
            / (F.sum("n") - 2)
        ).alias("c12"),
        (
            F.sum(F.col("s22") - F.col("s2") * 1.0 * F.col("s2") / F.col("n"))
            / (F.sum("n") - 2)
        ).alias("c22"),
        m(0, F.col("s1") * 1.0 / F.col("n")).alias("m01"),
        m(0, F.col("s2") * 1.0 / F.col("n")).alias("m02"),
        m(1, F.col("s1") * 1.0 / F.col("n")).alias("m11"),
        m(1, F.col("s2") * 1.0 / F.col("n")).alias("m12"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    thr = pooled.select(
        ((F.col("c22") * F.col("d1") - F.col("c12") * F.col("d2")) / det).alias(
            "w1"
        ),
        ((F.col("c11") * F.col("d2") - F.col("c12") * F.col("d1")) / det).alias(
            "w2"
        ),
        "m01",
        "m02",
        "m11",
        "m12",
    ).select(
        "w1",
        "w2",
        (
            (
                F.col("w1") * (F.col("m01") + F.col("m11"))
                + F.col("w2") * (F.col("m02") + F.col("m12"))
            )
            / 2
        ).alias("cut"),
        (F.col("w1") * F.col("m01") + F.col("w2") * F.col("m02")).alias("p0"),
        (F.col("w1") * F.col("m11") + F.col("w2") * F.col("m12")).alias("p1"),
    )
    pred = F.when(
        F.col("w1") * F.col("x1") + F.col("w2") * F.col("x2") > F.col("cut"),
        1,
    ).otherwise(0)
    return (
        pts.crossJoin(F.broadcast(thr))
        .groupBy(
            F.col("y").alias("label_group"),
            "w1",
            "w2",
            "p0",
            "p1",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(pred == F.col("y"), 1).otherwise(0))
            .cast("bigint")
            .alias("correct"),
            F.round(
                F.sum(F.when(pred == F.col("y"), 1).otherwise(0))
                * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("accuracy"),
        )
        .select(
            "label_group",
            "n",
            "correct",
            "accuracy",
            F.round(F.col("w1") * 1e8, 6).alias("w1_scaled"),
            F.round(F.col("w2") * 1e8, 6).alias("w2_scaled"),
            F.round((F.col("p1") - F.col("p0")) / 10000.0, 6).alias(
                "class_separation"
            ),
        )
        .orderBy("label_group")
    )


_LC_LAMBDA = 1000.0  # ridge penalty (cents^2 scale)
_LC_FRACTIONS = [(0, 1), (2, 3), (5, 6), (8, 9)]  # (max bucket, n/10)


@query(
    "learning_curve_ridge",
    oracle=f"""
    WITH pts2 AS (
      SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, 8),
                 i -> CAST(strpos('0123456789abcdef',
                        substr(md5(CAST(l_orderkey * 16 + l_linenumber
                                        AS VARCHAR)),
                               CAST(i AS INTEGER), 1)) - 1
                      AS BIGINT))),
               (acc, c) -> acc * 16 + c) % 10 AS bkt,
             CAST(l_quantity AS BIGINT) AS x1,
             CAST(round(p_retailprice * 100) AS BIGINT) AS x2,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS yy
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ), bstats AS (
      SELECT bkt,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x1) AS BIGINT) AS s1,
             CAST(sum(x2) AS BIGINT) AS s2,
             CAST(sum(yy) AS BIGINT) AS sy,
             CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
             CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
             CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
             CAST(sum(CAST(x1 AS HUGEINT) * yy) AS HUGEINT) AS s1y,
             CAST(sum(CAST(x2 AS HUGEINT) * yy) AS HUGEINT) AS s2y,
             CAST(sum(CAST(yy AS HUGEINT) * yy) AS HUGEINT) AS syy
      FROM pts2 GROUP BY bkt
    ), cum AS (
      SELECT g.mb AS max_bucket,
             CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(s1) AS BIGINT) AS s1,
             CAST(sum(s2) AS BIGINT) AS s2,
             CAST(sum(sy) AS BIGINT) AS sy,
             CAST(sum(s11) AS DOUBLE) AS s11,
             CAST(sum(s12) AS DOUBLE) AS s12,
             CAST(sum(s22) AS DOUBLE) AS s22,
             CAST(sum(s1y) AS DOUBLE) AS s1y,
             CAST(sum(s2y) AS DOUBLE) AS s2y
      FROM (SELECT unnest([{", ".join(str(b) for b, _ in _LC_FRACTIONS)}])
              AS mb) g
      JOIN bstats b ON b.bkt <= g.mb
      GROUP BY g.mb
    ), fits AS (
      SELECT max_bucket, n,
             s11 - s1 * 1.0 * s1 / n + {_LC_LAMBDA} AS a11,
             s12 - s1 * 1.0 * s2 / n AS a12,
             s22 - s2 * 1.0 * s2 / n + {_LC_LAMBDA} AS a22,
             s1y - s1 * 1.0 * sy / n AS b1,
             s2y - s2 * 1.0 * sy / n AS b2,
             s1 * 1.0 / n AS mx1, s2 * 1.0 / n AS mx2,
             sy * 1.0 / n AS my
      FROM cum
    ), solved AS (
      SELECT max_bucket, n,
             (a22 * b1 - a12 * b2) / (a11 * a22 - a12 * a12) AS w1,
             (a11 * b2 - a12 * b1) / (a11 * a22 - a12 * a12) AS w2,
             mx1, mx2, my
      FROM fits
    ), vstats AS (
      SELECT CAST(count(*) AS BIGINT) AS vn,
             CAST(sum(x1) AS BIGINT) AS v1,
             CAST(sum(x2) AS BIGINT) AS v2,
             CAST(sum(yy) AS BIGINT) AS vy,
             CAST(sum(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS v11,
             CAST(sum(CAST(x1 AS HUGEINT) * x2) AS DOUBLE) AS v12,
             CAST(sum(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS v22,
             CAST(sum(CAST(x1 AS HUGEINT) * yy) AS DOUBLE) AS v1y,
             CAST(sum(CAST(x2 AS HUGEINT) * yy) AS DOUBLE) AS v2y,
             CAST(sum(CAST(yy AS HUGEINT) * yy) AS DOUBLE) AS vyy
      FROM pts2 WHERE bkt = 9
    )
    SELECT s.max_bucket, s.n AS n_train, v.vn AS n_val,
           round(s.w1 / 100.0, 6) AS w1_dollars_per_unit,
           round(s.w2, 6) AS w2,
           round((s.my - s.w1 * s.mx1 - s.w2 * s.mx2) / 100.0, 4)
             AS intercept,
           round(sqrt(greatest(
             (v.vyy
              - 2 * (s.my - s.w1 * s.mx1 - s.w2 * s.mx2) * v.vy
              - 2 * s.w1 * v.v1y - 2 * s.w2 * v.v2y
              + v.vn * (s.my - s.w1 * s.mx1 - s.w2 * s.mx2)
                     * (s.my - s.w1 * s.mx1 - s.w2 * s.mx2)
              + 2 * (s.my - s.w1 * s.mx1 - s.w2 * s.mx2)
                  * (s.w1 * v.v1 + s.w2 * v.v2)
              + s.w1 * s.w1 * v.v11 + 2 * s.w1 * s.w2 * v.v12
              + s.w2 * s.w2 * v.v22) / v.vn, 0.0)) / 100.0, 4)
             AS val_rmse,
           round(1 - ((v.vyy
              - 2 * (s.my - s.w1 * s.mx1 - s.w2 * s.mx2) * v.vy
              - 2 * s.w1 * v.v1y - 2 * s.w2 * v.v2y
              + v.vn * (s.my - s.w1 * s.mx1 - s.w2 * s.mx2)
                     * (s.my - s.w1 * s.mx1 - s.w2 * s.mx2)
              + 2 * (s.my - s.w1 * s.mx1 - s.w2 * s.mx2)
                  * (s.w1 * v.v1 + s.w2 * v.v2)
              + s.w1 * s.w1 * v.v11 + 2 * s.w1 * s.w2 * v.v12
              + s.w2 * s.w2 * v.v22))
              / (v.vyy - v.vy * 1.0 * v.vy / v.vn), 6) AS r2_val
    FROM solved s CROSS JOIN vstats v
    ORDER BY s.max_bucket
    """,
)
def learning_curve_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning curve without refits: ridge regression of line-item
    revenue on (quantity, part retail price) is fit on nested
    training subsets (hash-buckets 0..b for b in 0/2/5/8 — 10% to
    90% of the data) purely by SUMMING per-bucket sufficient
    statistics, then evaluated on the held-out bucket 9 by expanding
    E[(y - a - w.x)^2] into the same moment sums. Four models, one
    validation set, ZERO additional data passes — the
    sample-efficiency curve ("is more data still buying RMSE?") at
    sufficient-statistic cost.

    Determinism: every moment is an exact int64 sum; the subset
    bucket is the engine-portable md5-prefix hash of
    l_orderkey*16+l_linenumber (Spark `conv(substr(md5,1,8))` ==
    DuckDB hex fold) mod 10; doubles enter only in the closed-form
    2x2 ridge solve.

    Scale: one groupBy over 10 buckets; the cumulative roll-up is a
    10-row dimension join. This is THE pattern for
    hyperparameter-free data-scaling studies on 100 TB: no
    per-subset scans, no model-fit jobs.

    On this synthetic data the features carry no linear signal
    (corr ~ 0.003), so the curve converges to the noise floor with
    r2_val rising toward 0 from below as the spurious small-sample
    fit washes out — exactly the "more data will NOT help, fix the
    features" verdict learning curves exist to deliver.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    pts = li.join(
        F.broadcast(p), li.l_partkey == p.p_partkey
    ).select(
        F.expr(
            "CAST(conv(substr(md5(CAST(l_orderkey * 16 + l_linenumber"
            " AS STRING)), 1, 8), 16, 10) AS BIGINT) % 10"
        ).alias("bkt"),
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.expr("CAST(round(p_retailprice * 100) AS BIGINT)").alias("x2"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("yy"),
    )
    # second-order moments (x·y products summed over the fact rows) cross
    # int64 at 10x scale (sf1 sweep crash: yy is cents ~1e7, so Σyy² ~1e19
    # per bucket) — widen the OPERAND to decimal(38,0) (oracle: HUGEINT),
    # keep the per-bucket sums exact, and convert the cumulative roll-up
    # to double identically on both engines.
    def _wide(a: str, b: str):
        return F.sum(F.col(a).cast("decimal(38,0)") * F.col(b))

    bstats = pts.groupBy("bkt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("s1"),
        F.sum("x2").cast("bigint").alias("s2"),
        F.sum("yy").cast("bigint").alias("sy"),
        _wide("x1", "x1").alias("s11"),
        _wide("x1", "x2").alias("s12"),
        _wide("x2", "x2").alias("s22"),
        _wide("x1", "yy").alias("s1y"),
        _wide("x2", "yy").alias("s2y"),
        _wide("yy", "yy").alias("syy"),
    )
    grid = spark.createDataFrame(
        [(b,) for b, _ in _LC_FRACTIONS], "mb bigint"
    )
    cum = (
        grid.join(F.broadcast(bstats), F.col("bkt") <= F.col("mb"))
        .groupBy(F.col("mb").alias("max_bucket"))
        .agg(
            *[
                F.sum(c).cast("bigint").alias(c)
                for c in ["n", "s1", "s2", "sy"]
            ],
            *[
                F.sum(c).cast("double").alias(c)
                for c in ["s11", "s12", "s22", "s1y", "s2y"]
            ],
        )
    )
    lam = _LC_LAMBDA
    fits = cum.select(
        "max_bucket",
        "n",
        (
            F.col("s11") - F.col("s1") * 1.0 * F.col("s1") / F.col("n") + lam
        ).alias("a11"),
        (F.col("s12") - F.col("s1") * 1.0 * F.col("s2") / F.col("n")).alias(
            "a12"
        ),
        (
            F.col("s22") - F.col("s2") * 1.0 * F.col("s2") / F.col("n") + lam
        ).alias("a22"),
        (F.col("s1y") - F.col("s1") * 1.0 * F.col("sy") / F.col("n")).alias(
            "b1"
        ),
        (F.col("s2y") - F.col("s2") * 1.0 * F.col("sy") / F.col("n")).alias(
            "b2"
        ),
        (F.col("s1") * 1.0 / F.col("n")).alias("mx1"),
        (F.col("s2") * 1.0 / F.col("n")).alias("mx2"),
        (F.col("sy") * 1.0 / F.col("n")).alias("my"),
    )
    det = F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12")
    solved = fits.select(
        "max_bucket",
        "n",
        ((F.col("a22") * F.col("b1") - F.col("a12") * F.col("b2")) / det).alias(
            "w1"
        ),
        ((F.col("a11") * F.col("b2") - F.col("a12") * F.col("b1")) / det).alias(
            "w2"
        ),
        "mx1",
        "mx2",
        "my",
    )
    vstats = pts.filter(F.col("bkt") == 9).agg(
        F.count(F.lit(1)).cast("bigint").alias("vn"),
        F.sum("x1").cast("bigint").alias("v1"),
        F.sum("x2").cast("bigint").alias("v2"),
        F.sum("yy").cast("bigint").alias("vy"),
        _wide("x1", "x1").cast("double").alias("v11"),
        _wide("x1", "x2").cast("double").alias("v12"),
        _wide("x2", "x2").cast("double").alias("v22"),
        _wide("x1", "yy").cast("double").alias("v1y"),
        _wide("x2", "yy").cast("double").alias("v2y"),
        _wide("yy", "yy").cast("double").alias("vyy"),
    )
    a0 = F.col("my") - F.col("w1") * F.col("mx1") - F.col("w2") * F.col("mx2")
    sse = (
        F.col("vyy")
        - 2 * a0 * F.col("vy")
        - 2 * F.col("w1") * F.col("v1y")
        - 2 * F.col("w2") * F.col("v2y")
        + F.col("vn") * a0 * a0
        + 2 * a0 * (F.col("w1") * F.col("v1") + F.col("w2") * F.col("v2"))
        + F.col("w1") * F.col("w1") * F.col("v11")
        + 2 * F.col("w1") * F.col("w2") * F.col("v12")
        + F.col("w2") * F.col("w2") * F.col("v22")
    )
    sst = F.col("vyy") - F.col("vy") * 1.0 * F.col("vy") / F.col("vn")
    return (
        solved.crossJoin(F.broadcast(vstats))
        .select(
            "max_bucket",
            F.col("n").alias("n_train"),
            F.col("vn").alias("n_val"),
            F.round(F.col("w1") / 100.0, 6).alias("w1_dollars_per_unit"),
            F.round(F.col("w2"), 6).alias("w2"),
            F.round(a0 / 100.0, 4).alias("intercept"),
            F.round(
                F.sqrt(F.greatest(sse / F.col("vn"), F.lit(0.0))) / 100.0, 4
            ).alias("val_rmse"),
            F.round(1 - sse / sst, 6).alias("r2_val"),
        )
        .orderBy("max_bucket")
    )
