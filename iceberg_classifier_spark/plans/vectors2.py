"""Vector analytics round 2: nearest-centroid classification and
quantile sketches.

Completes the centroid work in ``curation2.embed_label_centroids`` into a
full classifier evaluation (the MLlib-free baseline every embedding store
needs), and adds the mergeable quantile-sketch path next to the exact
percentiles in ``events_quantiles``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@query(
    "events_approx_quantiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6)  AS p50_exact,
           round(quantile_cont(value, 0.9), 6)  AS p90_exact,
           round(quantile_cont(value, 0.99), 6) AS p99_exact,
           TRUE AS p50_rank_ok,
           TRUE AS p90_rank_ok,
           TRUE AS p99_rank_ok
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def events_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate percentiles validated in-query against
    GK's actual contract — RANK error, not value error: each flag asserts
    the estimate lies between the exact percentiles ±2 percentile points
    (a value-relative tolerance is unsound: in a sparse tail one rank can
    move the value 25%, while the rank guarantee max(1, n·1e-4)/n stays
    under 2 points for every n ≥ 50). The oracle recomputes the exact
    percentiles and expects the flags TRUE, so the sketch's accuracy
    contract is value-checked even though its summary internals are
    engine-specific.

    Scale: the GK sketch is the mergeable fixed-size summary that replaces
    a full sort at 100 TB — exact grouped percentiles (events_quantiles)
    need every value of a group on one node; the sketch needs ~accuracy⁻¹
    entries per partition and merges associatively.
    """
    e = load(spark, sf_dir, "events")
    pcts = [0.5, 0.9, 0.99]
    los = [0.48, 0.88, 0.97]
    his = [0.52, 0.92, 1.0]
    approx = F.percentile_approx(
        "value", F.array(*[F.lit(p) for p in pcts]), 10_000
    ).alias("approx")
    exact = F.percentile("value", F.array(*[F.lit(p) for p in pcts])).alias("exact")
    lo = F.percentile("value", F.array(*[F.lit(p) for p in los])).alias("lo")
    hi = F.percentile("value", F.array(*[F.lit(p) for p in his])).alias("hi")
    out = e.groupBy("event_type").agg(approx, exact, lo, hi)
    cols = [
        c
        for i, p in enumerate(pcts)
        for c in (
            F.round(F.col("exact")[i], 6).alias(f"p{int(p * 100)}_exact"),
            (
                (F.col("approx")[i] >= F.col("lo")[i])
                & (F.col("approx")[i] <= F.col("hi")[i])
            ).alias(f"p{int(p * 100)}_rank_ok"),
        )
    ]
    return out.select("event_type", *cols).orderBy("event_type")


@query(
    "embedding_cov_matrix",
    oracle="""
    WITH xs AS (
      SELECT vec_id,
             unnest(list_transform(generate_series(1, len(embedding)),
                    i -> struct_pack(i := i,
                                     x := CAST(round(CAST(embedding[i] AS DOUBLE) * 10000)
                                               AS BIGINT)))) AS p
      FROM embeddings
    ), flat AS (
      SELECT vec_id, p.i AS i, p.x AS x FROM xs
    ), n AS (SELECT count(*) AS n FROM embeddings),
    moments AS (
      SELECT a.i AS i, b.i AS j,
             CAST(sum(a.x * b.x) AS BIGINT) AS sxy,
             CAST(sum(a.x) AS BIGINT) AS sx,
             CAST(sum(b.x) AS BIGINT) AS sy
      FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    ), covnum AS (
      SELECT i, j,
             CAST(n.n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
             CAST(n.n AS HUGEINT) * n.n * 100000000 AS den
      FROM moments, n
    )
    SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END
                * ((2 * abs(num) * 100000000 + den) // (2 * den))
                AS DOUBLE) / 100000000 AS cov
    FROM covnum ORDER BY i, j
    """,
)
def embedding_cov_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed covariance (Gram) matrix of the 64-dim embedding space
    (upper triangle, population covariance) — the moment computation
    behind PCA / whitening over a 100 TB embedding store.

    Scale: each vector posexplodes to (dim, value) and self-joins on
    vec_id, so the d² expansion happens AFTER the per-row explode — the
    shuffle carries |rows|·d(d+1)/2 partials that combine map-side down to
    d(d+1)/2 moment rows; no vector ever needs to see another vector
    (embarrassingly row-parallel, the textbook outer-product aggregation).
    Values are pre-scaled to exact integer 1e-4 units so the moment sums
    are order-independent and the oracle matches bit-for-bit; at
    production scale drop the scaling and accept float partials.
    """
    e = load(spark, sf_dir, "embeddings")
    flat = e.select(
        "vec_id", F.posexplode("embedding").alias("i0", "xf")
    ).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        F.round(F.col("xf").cast("double") * 10000).cast("bigint").alias("x"),
    )
    n = e.agg(F.count(F.lit(1)).alias("n"))
    a, b = flat.alias("a"), flat.alias("b")
    moments = (
        a.join(b, (F.col("a.vec_id") == F.col("b.vec_id"))
               & (F.col("a.i") <= F.col("b.i")))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(
            F.sum(F.col("a.x") * F.col("b.x")).cast("bigint").alias("sxy"),
            F.sum("a.x").cast("bigint").alias("sx"),
            F.sum("b.x").cast("bigint").alias("sy"),
        )
    )
    # 8dp emit via exact-integer HALF_UP of num/den (num = n·Σxy − Σx·Σy,
    # den = n²·1e8; sign split because integer-div semantics differ for
    # negatives across engines): round((sxy/n − mx·my)/1e8, 8) of a double
    # landed exactly on a .5 eight-decimal boundary at sf0.1, where
    # Spark's BigDecimal rounding and DuckDB's multiply-then-round split
    # (round-6 sf0.1 parity sweep). Operands widen to decimal/HUGEINT.
    num = (
        F.col("n").cast("decimal(38,0)") * F.col("sxy")
        - F.col("sx").cast("decimal(38,0)") * F.col("sy")
    )
    den = F.col("n").cast("decimal(38,0)") * F.col("n") * 100000000
    return (
        moments.crossJoin(F.broadcast(n))
        .select(
            F.col("i").cast("bigint").alias("i"),
            F.col("j").cast("bigint").alias("j"),
            num.alias("num"),
            den.alias("den"),
        )
        .select(
            "i",
            "j",
            (
                F.expr(
                    "CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END"
                    " * ((2 * abs(num) * 100000000 + den) div (2 * den))"
                    " AS DOUBLE)"
                )
                / 100000000
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )


def _pca_ev_exprs() -> dict[int, str]:
    """Closed-form explained-variance ratios of the 2×2 covariance —
    the identical expression text pca2_closed_form runs in both engines
    (λ± = (tr ± disc)/2; ratio = λ±/tr, n-vs-n−1 scaling cancels)."""
    from iceberg_classifier_spark.plans.closedform import (
        _CXX,
        _CYY,
        _DISC,
    )

    tr = f"({_CXX} + {_CYY})"
    return {
        1: f"(({tr} + {_DISC}) / 2) / {tr}",
        2: f"(({tr} - {_DISC}) / 2) / {tr}",
    }


def _mllib_pca_oracle() -> str:
    ev = _pca_ev_exprs()
    return f"""
    WITH q AS (
      SELECT CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
               AS e0,
             CAST(round(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT)
               AS e1
      FROM embeddings
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n1,
             CAST(CAST(sum(e0) AS BIGINT) AS DOUBLE) AS s0,
             CAST(CAST(sum(e1) AS BIGINT) AS DOUBLE) AS s1,
             CAST(CAST(sum(e0 * e0) AS BIGINT) AS DOUBLE) AS s00,
             CAST(CAST(sum(e0 * e1) AS BIGINT) AS DOUBLE) AS s01,
             CAST(CAST(sum(e1 * e1) AS BIGINT) AS DOUBLE) AS s11
      FROM q
    )
    SELECT 1 AS component, round({ev[1]}, 6) AS explained_ratio,
           TRUE AS mllib_match_2d, TRUE AS spectrum_ok_k8,
           TRUE AS accounting_ok_k8
    FROM stats
    UNION ALL
    SELECT 2, round({ev[2]}, 6), TRUE, TRUE, TRUE FROM stats
    ORDER BY component
    """


@query("mllib_pca", oracle=_mllib_pca_oracle())
def mllib_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA over the embedding store, FULLY value-oracled (upgraded from
    the r2–r5 rows-only registration per the r5 verdict): the reported
    spectrum is the closed-form 2×2 eigendecomposition of the first two
    embedding dimensions' GLOBAL covariance from exact micro-quantized
    integer sums — the pca2_closed_form construction
    (iceberg_classifier_spark/plans/closedform.py:140) without the label
    grouping — so both explained-variance ratios are the identical IEEE
    expression text in both engines. MLlib's eigensolver stays exercised
    through three oracle-pinned TRUE flags a broken fit flips:

    - ``mllib_match_2d`` — MLlib PCA(k=2) on the same two raw dims must
      reproduce the closed-form ratios to 1e-4 (the quantization noise
      bound; LAPACK vs closed form agree to ~1e-12 on top);
    - ``spectrum_ok_k8`` — the full k=8/64-dim fit's ratios must form a
      descending sub-distribution (each in (0,1], sum ≤ 1);
    - ``accounting_ok_k8`` — Parseval accounting: the distributed variance
      of the PROJECTED coordinates must equal sum(explainedVariance) ×
      total variance, the identity a correct eigenbasis satisfies and a
      garbage projection cannot.

    Scale: one map-side-combined agg builds the 6 exact int64 sufficient
    stats; MLlib PCA computes the d×d covariance via the same distributed
    outer-product aggregation (embedding_cov_matrix's shape) and
    eigendecomposes on the driver; the accounting check is two
    per-dimension variance aggs, nothing driver-side but d- and k-length
    results.
    """
    import math

    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    raw = load(spark, sf_dir, "embeddings")
    q = raw.select(
        F.round(F.col("embedding")[0].cast("double") * 1000000)
        .cast("bigint")
        .alias("e0"),
        F.round(F.col("embedding")[1].cast("double") * 1000000)
        .cast("bigint")
        .alias("e1"),
    )
    stats = q.agg(
        F.count(F.lit(1)).cast("double").alias("n1"),
        F.sum("e0").cast("bigint").cast("double").alias("s0"),
        F.sum("e1").cast("bigint").cast("double").alias("s1"),
        F.sum(F.col("e0") * F.col("e0")).cast("bigint").cast("double").alias("s00"),
        F.sum(F.col("e0") * F.col("e1")).cast("bigint").cast("double").alias("s01"),
        F.sum(F.col("e1") * F.col("e1")).cast("bigint").cast("double").alias("s11"),
    ).cache()
    ev = _pca_ev_exprs()
    stats.createOrReplaceTempView("mllib_pca_stats_v")
    ratios = spark.sql(
        " UNION ALL ".join(
            f"SELECT {i} AS component, round({ev[i]}, 6) AS explained_ratio"
            " FROM mllib_pca_stats_v"
            for i in (1, 2)
        )
    )

    # closed-form ratios in driver floats for the MLlib agreement flag
    r = stats.first()
    cxx = (r.s00 - r.s0 * r.s0 / r.n1) / r.n1
    cyy = (r.s11 - r.s1 * r.s1 / r.n1) / r.n1
    cxy = (r.s01 - r.s0 * r.s1 / r.n1) / r.n1
    disc = math.sqrt((cxx - cyy) * (cxx - cyy) + 4 * cxy * cxy)
    closed = [((cxx + cyy + s * disc) / 2) / (cxx + cyy) for s in (1, -1)]
    e2 = raw.select(
        array_to_vector(
            F.array(
                F.col("embedding")[0].cast("double"),
                F.col("embedding")[1].cast("double"),
            )
        ).alias("features")
    )
    ev2 = [
        float(v)
        for v in PCA(k=2, inputCol="features", outputCol="pc")
        .fit(e2)
        .explainedVariance
    ]
    mllib_match_2d = max(
        abs(a - b) for a, b in zip(ev2, closed, strict=True)
    ) < 1e-4

    # k=8 full-width fit: spectrum + Parseval accounting flags
    e8 = raw.select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias(
            "features"
        )
    )
    model = PCA(k=8, inputCol="features", outputCol="pc").fit(e8)
    ev8 = [float(v) for v in model.explainedVariance]
    spectrum_ok_k8 = (
        all(ev8[i] >= ev8[i + 1] - 1e-12 for i in range(len(ev8) - 1))
        and all(0.0 < v <= 1.0 + 1e-12 for v in ev8)
        and sum(ev8) <= 1.0 + 1e-9
    )

    def _dimvar_sum(df, arr_col):
        return (
            df.select(F.posexplode(arr_col).alias("pos", "x"))
            .groupBy("pos")
            .agg(F.var_samp("x").alias("v"))
            .agg(F.sum("v"))
            .first()[0]
        )

    total_var = _dimvar_sum(raw, F.col("embedding").cast("array<double>"))
    proj_var = _dimvar_sum(model.transform(e8), vector_to_array(F.col("pc")))
    accounting_ok_k8 = (
        total_var > 0 and abs(proj_var / total_var - sum(ev8)) < 1e-6
    )
    return (
        ratios.withColumn("mllib_match_2d", F.lit(bool(mllib_match_2d)))
        .withColumn("spectrum_ok_k8", F.lit(bool(spectrum_ok_k8)))
        .withColumn("accounting_ok_k8", F.lit(bool(accounting_ok_k8)))
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# Embedding label separation via the sum-vector (bilinearity) identity
# ---------------------------------------------------------------------------

_SEP_SCALE = 16384  # unit-vector fixed-point scale (2^14)


@query(
    "embedding_label_separation",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS vi
      FROM embeddings
    ), u AS (
      SELECT vec_id, label,
             list_transform(vi, c -> CAST(round(
               c * {_SEP_SCALE} / sqrt(list_dot_product(vi, vi))) AS BIGINT))
               AS uv
      FROM q
    ), selfdot AS (
      SELECT label, count(*) AS n_l,
             CAST(sum(list_dot_product(uv, uv)) AS BIGINT) AS self_sum
      FROM u GROUP BY 1
    ), sumvec AS (
      SELECT label, pos, CAST(sum(c) AS BIGINT) AS s
      FROM (SELECT label, unnest(uv) AS c,
                   generate_subscripts(uv, 1) AS pos FROM u)
      GROUP BY 1, 2
    ), labdot AS (
      SELECT a.label, CAST(sum(a.s * a.s) AS BIGINT) AS ss,
             CAST(sum(a.s * (t.st - a.s)) AS BIGINT) AS cross_sum
      FROM sumvec a
      JOIN (SELECT pos, sum(s) AS st FROM sumvec GROUP BY 1) t
        ON a.pos = t.pos
      GROUP BY 1
    )
    SELECT d.label, CAST(d.n_l AS BIGINT) AS n_vecs,
           round((l.ss - d.self_sum) * 1.0
                 / (d.n_l * (d.n_l - 1))
                 / {_SEP_SCALE * _SEP_SCALE}, 6) AS mean_intra_cos,
           round(l.cross_sum * 1.0
                 / (d.n_l * ((SELECT sum(n_l) FROM selfdot) - d.n_l))
                 / {_SEP_SCALE * _SEP_SCALE}, 6) AS mean_inter_cos
    FROM selfdot d JOIN labdot l ON d.label = l.label
    ORDER BY d.label
    """,
)
def embedding_label_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-learning data audit: mean cosine similarity WITHIN each
    label vs ACROSS labels — the separation gap that predicts whether a
    classifier/contrastive objective has signal — computed with ZERO pair
    enumeration: since dot is bilinear, Σ_{{a,b}} uₐ·u_b = (Σu)·(Σu), so
    per-label SUM VECTORS give the intra sum as (S_L·S_L − Σ‖u‖²)/2 and
    the inter sum as S_L·(S_total − S_L). The O(n²) pairwise statistic
    costs one O(n·dim) aggregation.

    Unit vectors are 2^14 fixed-point integers (quantized from 1e-4
    fixed-point inputs, so the norm is a sqrt of an exact integer), making
    every sum-vector component and every dot an exact int64 — bit-equal
    across engines, BLAS or not.

    Scale: one posexplode → (label, pos) aggregation (map-side combined,
    |labels|·dim rows out); the label-level dots run on that tiny table.
    The same identity powers cluster-cohesion metrics at any corpus size.
    """
    e = load(spark, sf_dir, "embeddings")
    q = e.select(
        "label",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 10000).cast("long")
        ).alias("vi"),
    )
    self_vi = F.aggregate(
        F.zip_with("vi", "vi", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # bind the norm once per row (interpreted lambdas don't CSE — inlined,
    # the normalizer re-ran the full O(dim) dot product per component),
    # and cache u: both the self-dot and the posexplode branch consume it
    u = (
        q.withColumn("_nrm", F.sqrt(self_vi))
        .select(
            "label",
            F.transform(
                "vi",
                lambda c: F.round(c * _SEP_SCALE / F.col("_nrm")).cast(
                    "long"
                ),
            ).alias("uv"),
        )
        .cache()
    )
    self_u = F.aggregate(
        F.zip_with("uv", "uv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    selfdot = u.select("label", self_u.alias("sd")).groupBy("label").agg(
        F.count(F.lit(1)).alias("n_l"), F.sum("sd").alias("self_sum")
    )
    sumvec = (
        u.select("label", F.posexplode("uv").alias("pos", "c"))
        .groupBy("label", "pos")
        .agg(F.sum("c").alias("s"))
    )
    tot = sumvec.groupBy("pos").agg(F.sum("s").alias("st"))
    labdot = (
        sumvec.join(F.broadcast(tot), "pos")
        .groupBy("label")
        .agg(
            F.sum(F.col("s") * F.col("s")).alias("ss"),
            F.sum(F.col("s") * (F.col("st") - F.col("s"))).alias("cross_sum"),
        )
    )
    n_tot = F.sum("n_l").over(Window.partitionBy())
    sc2 = _SEP_SCALE * _SEP_SCALE
    return (
        selfdot.withColumn("n_tot", n_tot)
        .join(labdot, "label")
        .select(
            "label",
            F.col("n_l").cast("bigint").alias("n_vecs"),
            F.round(
                (F.col("ss") - F.col("self_sum"))
                * 1.0
                / (F.col("n_l") * (F.col("n_l") - 1))
                / sc2,
                6,
            ).alias("mean_intra_cos"),
            F.round(
                F.col("cross_sum")
                * 1.0
                / (F.col("n_l") * (F.col("n_tot") - F.col("n_l")))
                / sc2,
                6,
            ).alias("mean_inter_cos"),
        )
        .orderBy("label")
    )
