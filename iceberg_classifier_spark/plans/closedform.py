"""Closed-form model fits with FULL value oracles.

The MLlib fits (logreg/GBT/MLP/kmeans/PCA) are iterative and can only be
rows-only checked; these operators cover the same modeling surface where
EXACT closed forms exist — OLS by normal equations (Cramer 3x3) and 2-D
PCA by the quadratic eigen formula — so distributed model fitting gets a
bit-exact DuckDB oracle. The pattern: one map-side-combinable pass builds
exact-integer sufficient statistics; the solve runs on a 1-row (or
per-label dimension) frame with IDENTICAL double expression trees in both
engines (reference: main.py trains its head by SGD; the analytics-engine
re-expression is "sufficient statistics + closed-form solve", the shape
that actually distributes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

# Cramer's rule for A = [[n1,sx1,sx2],[sx1,s11,s12],[sx2,s12,s22]],
# rhs = [sy, s1y, s2y] — shared verbatim by Spark and DuckDB so the
# double arithmetic is the identical IEEE expression tree.
_DET = "(n1*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2) + sx2*(sx1*s12 - s11*sx2))"
_D0 = "(sy*(s11*s22 - s12*s12) - sx1*(s1y*s22 - s12*s2y) + sx2*(s1y*s12 - s11*s2y))"
_D1 = "(n1*(s1y*s22 - s12*s2y) - sy*(sx1*s22 - s12*sx2) + sx2*(sx1*s2y - s1y*sx2))"
_D2 = "(n1*(s11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2) + sy*(sx1*s12 - s11*sx2))"

_OLS_SOLVE = f"""
    SELECT n_exact AS n,
           round({_D0} / {_DET}, 6) AS b0,
           round({_D1} / {_DET}, 6) AS b1,
           round({_D2} / {_DET}, 6) AS b2,
           round(1 - (syy - ({_D0} / {_DET} * sy + {_D1} / {_DET} * s1y
                             + {_D2} / {_DET} * s2y))
                     / (syy - sy * sy / n1), 6) AS r2
"""


@query(
    "ols_normal_equations",
    oracle=f"""
    WITH per_order AS (
      SELECT l_orderkey AS ok,
             CAST(count(*) AS BIGINT) AS x1,
             CAST(round(sum(l_quantity)) AS BIGINT) AS x2
      FROM lineitem GROUP BY 1
    ), xy AS (
      SELECT p.x1, p.x2, CAST(round(o.o_totalprice) AS BIGINT) AS y
      FROM per_order p JOIN orders o ON o.o_orderkey = p.ok
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_exact,
             CAST(count(*) AS DOUBLE) AS n1,
             CAST(CAST(sum(x1) AS BIGINT) AS DOUBLE) AS sx1,
             CAST(CAST(sum(x2) AS BIGINT) AS DOUBLE) AS sx2,
             CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy,
             CAST(CAST(sum(x1 * x1) AS BIGINT) AS DOUBLE) AS s11,
             CAST(CAST(sum(x1 * x2) AS BIGINT) AS DOUBLE) AS s12,
             CAST(CAST(sum(x2 * x2) AS BIGINT) AS DOUBLE) AS s22,
             CAST(CAST(sum(x1 * y) AS BIGINT) AS DOUBLE) AS s1y,
             CAST(CAST(sum(x2 * y) AS BIGINT) AS DOUBLE) AS s2y,
             CAST(CAST(sum(y * y) AS BIGINT) AS DOUBLE) AS syy
      FROM xy
    )
    {_OLS_SOLVE}
    FROM stats
    """,
)
def ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple linear regression by the normal equations: regress order
    total (whole dollars) on (lineitem count, total quantity) with an
    exact-integer sufficient-statistics pass and a Cramer 3x3 solve —
    the distributed OLS every engine's "fit a trend" surface needs, and
    the closed-form stand-in for the reference's SGD-trained dense head
    (main.py:185-237). Every sum (Σx, Σxy, Σy², …) is an exact int64
    (dollar-quantized response keeps Σy² < 2^63 at any TPC-H SF); the
    determinant arithmetic then runs in doubles via the SAME expression
    string in both engines, so coefficients and R² agree bit-for-bit at
    6dp.

    Scale: groupBy(l_orderkey) with map-side combine + one broadcast-able
    fact join + a global 10-number aggregate; the solve itself is a
    1-row select. Adding regressors grows the stats vector O(p²), never
    the data passes — the classic scalable-OLS layout.
    """
    per_order = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("x1"),
            F.round(F.sum("l_quantity")).cast("bigint").alias("x2"),
        )
    )
    xy = per_order.join(
        load(spark, sf_dir, "orders"),
        per_order.ok == F.col("o_orderkey"),
    ).select(
        "x1", "x2", F.round("o_totalprice").cast("bigint").alias("y")
    )
    stats = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.count(F.lit(1)).cast("double").alias("n1"),
        F.sum("x1").cast("bigint").cast("double").alias("sx1"),
        F.sum("x2").cast("bigint").cast("double").alias("sx2"),
        F.sum("y").cast("bigint").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").cast("double").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").cast("double").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").cast("double").alias("s22"),
        F.sum(F.col("x1") * F.col("y")).cast("bigint").cast("double").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("bigint").cast("double").alias("s2y"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").cast("double").alias("syy"),
    )
    stats.createOrReplaceTempView("ols_stats_v")
    return spark.sql(_OLS_SOLVE + " FROM ols_stats_v")


# Shared eigen-solve expressions for the 2x2 covariance matrix
# [[cxx, cxy], [cxy, cyy]] — verbatim in both engines.
_CXX = "((s00 - s0 * s0 / n1) / n1)"
_CYY = "((s11 - s1 * s1 / n1) / n1)"
_CXY = "((s01 - s0 * s1 / n1) / n1)"
_DISC = f"sqrt(({_CXX} - {_CYY}) * ({_CXX} - {_CYY}) + 4 * {_CXY} * {_CXY})"

_PCA_SOLVE = f"""
    SELECT label, n_exact AS n,
           round({_CXX}, 6) AS var_d0,
           round({_CYY}, 6) AS var_d1,
           round({_CXY}, 6) AS cov_d01,
           round(({_CXX} + {_CYY} + {_DISC}) / 2, 6) AS lambda1,
           round(({_CXX} + {_CYY} - {_DISC}) / 2, 6) AS lambda2,
           round((({_CXX} + {_CYY} + {_DISC}) / 2) / ({_CXX} + {_CYY}), 6)
             AS explained_ratio,
           round(atan2(2 * {_CXY}, {_CXX} - {_CYY}) / 2, 6) AS theta
"""


@query(
    "pca2_closed_form",
    oracle=f"""
    WITH q AS (
      SELECT label,
             CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
               AS e0,
             CAST(round(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT)
               AS e1
      FROM embeddings
    ), stats AS (
      SELECT label,
             CAST(count(*) AS BIGINT) AS n_exact,
             CAST(count(*) AS DOUBLE) AS n1,
             CAST(CAST(sum(e0) AS BIGINT) AS DOUBLE) AS s0,
             CAST(CAST(sum(e1) AS BIGINT) AS DOUBLE) AS s1,
             CAST(CAST(sum(e0 * e0) AS BIGINT) AS DOUBLE) AS s00,
             CAST(CAST(sum(e0 * e1) AS BIGINT) AS DOUBLE) AS s01,
             CAST(CAST(sum(e1 * e1) AS BIGINT) AS DOUBLE) AS s11
      FROM q GROUP BY 1
    )
    {_PCA_SOLVE}
    FROM stats ORDER BY label
    """,
)
def pca2_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label 2-D PCA by the closed-form 2x2 eigendecomposition: for
    the first two embedding dimensions of each label group, compute the
    covariance matrix from exact micro-quantized integer sums, then the
    principal eigenvalues λ± = (tr ± sqrt((cxx−cyy)² + 4cxy²))/2, the
    explained-variance ratio, and the principal-axis angle
    θ = atan2(2cxy, cxx−cyy)/2. The fully-value-checked complement to
    the rows-only mllib_pca: where an exact eigen formula exists, the
    distributed fit carries a bit-exact oracle (units: covariances are
    in quantized-micro² — scale-free for λ-ratios and θ).

    Scale: float32→double is exact, so the 1e6 quantization is
    deterministic; one map-side-combined groupBy(label) builds 7 exact
    int64 sums per label and the eigen solve runs on the |labels|-row
    dimension frame. Full-width PCA at scale = the same pass with a
    p(p+1)/2 upper-triangle sum vector (embedding_cov_matrix) + a
    driver-side eigensolve of the tiny p×p matrix.
    """
    q = load(spark, sf_dir, "embeddings").select(
        "label",
        F.round(F.col("embedding")[0].cast("double") * 1000000)
        .cast("bigint")
        .alias("e0"),
        F.round(F.col("embedding")[1].cast("double") * 1000000)
        .cast("bigint")
        .alias("e1"),
    )
    stats = q.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.count(F.lit(1)).cast("double").alias("n1"),
        F.sum("e0").cast("bigint").cast("double").alias("s0"),
        F.sum("e1").cast("bigint").cast("double").alias("s1"),
        F.sum(F.col("e0") * F.col("e0")).cast("bigint").cast("double").alias("s00"),
        F.sum(F.col("e0") * F.col("e1")).cast("bigint").cast("double").alias("s01"),
        F.sum(F.col("e1") * F.col("e1")).cast("bigint").cast("double").alias("s11"),
    )
    stats.createOrReplaceTempView("pca2_stats_v")
    return spark.sql(_PCA_SOLVE + " FROM pca2_stats_v ORDER BY label")


# Pairwise correlations from exact integer sums; R²_j of each feature on
# the other two via the 3-variable closed form; VIF_j = 1/(1-R²_j).
_R = (
    "((n1 * s{a}{b} - s{a} * s{b})"
    " / sqrt((n1 * s{a}{a} - s{a} * s{a}) * (n1 * s{b}{b} - s{b} * s{b})))"
)
_R12, _R13, _R23 = (
    _R.format(a=1, b=2),
    _R.format(a=1, b=3),
    _R.format(a=2, b=3),
)
# R²_1 (x1 on x2,x3) = (r12² + r13² − 2·r12·r13·r23) / (1 − r23²), etc.
_VIF_R2 = {
    1: f"(({_R12})*({_R12}) + ({_R13})*({_R13})"
       f" - 2*({_R12})*({_R13})*({_R23})) / (1 - ({_R23})*({_R23}))",
    2: f"(({_R12})*({_R12}) + ({_R23})*({_R23})"
       f" - 2*({_R12})*({_R23})*({_R13})) / (1 - ({_R13})*({_R13}))",
    3: f"(({_R13})*({_R13}) + ({_R23})*({_R23})"
       f" - 2*({_R13})*({_R23})*({_R12})) / (1 - ({_R12})*({_R12}))",
}

_VIF_FEATURES = {1: "l_quantity", 2: "l_extendedprice", 3: "l_discount"}

def _vif_solve(from_rel: str) -> str:
    """UNION ALL of the three per-feature VIF selects over ``from_rel``
    — the same text drives Spark (temp view) and DuckDB (CTE)."""
    return "\nUNION ALL\n".join(
        f"""
        SELECT '{_VIF_FEATURES[j]}' AS feature,
               round({_VIF_R2[j]}, 6) AS r2_on_others,
               round(1.0 / (1.0 - ({_VIF_R2[j]})), 6) AS vif
        FROM {from_rel}
        """
        for j in (1, 2, 3)
    )


@query(
    "vif_multicollinearity",
    oracle=f"""
    WITH q AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
             CAST(round(l_extendedprice) AS BIGINT) AS x2,
             CAST(round(l_discount * 100) AS BIGINT) AS x3
      FROM lineitem
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n1,
             CAST(CAST(sum(x1) AS BIGINT) AS DOUBLE) AS s1,
             CAST(CAST(sum(x2) AS BIGINT) AS DOUBLE) AS s2,
             CAST(CAST(sum(x3) AS BIGINT) AS DOUBLE) AS s3,
             CAST(CAST(sum(x1 * x1) AS BIGINT) AS DOUBLE) AS s11,
             CAST(CAST(sum(x1 * x2) AS BIGINT) AS DOUBLE) AS s12,
             CAST(CAST(sum(x1 * x3) AS BIGINT) AS DOUBLE) AS s13,
             CAST(CAST(sum(x2 * x2) AS BIGINT) AS DOUBLE) AS s22,
             CAST(CAST(sum(x2 * x3) AS BIGINT) AS DOUBLE) AS s23,
             CAST(CAST(sum(x3 * x3) AS BIGINT) AS DOUBLE) AS s33
      FROM q
    )
    SELECT * FROM ({_vif_solve("stats")})
    ORDER BY feature
    """,
)
def vif_multicollinearity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-inflation factors for the lineitem feature triple
    (quantity, extendedprice, discount): pairwise Pearson correlations
    from one exact-integer sufficient-statistics pass, then the
    3-variable closed form R²_j = (r_jk² + r_jl² − 2·r_jk·r_jl·r_kl) /
    (1 − r_kl²) and VIF_j = 1/(1 − R²_j) — the collinearity screen that
    belongs before any regression fit (ols_normal_equations). On this
    synthetic data the three columns are generated independently, so
    the audit correctly reports VIF ≈ 1 for all features — the
    no-collinearity verdict is itself the checked output (on real
    TPC-H, extendedprice ≈ qty × unit price would flag).
    Dollar/percent quantization keeps every Σx·y an exact int64
    through TPC-H SF100; the correlation and VIF arithmetic is the
    identical double expression text in both engines.

    Scale: one map-side-combined aggregate builds all 10 sufficient
    statistics; the solve is a 3-row dimension select. p features cost
    a p(p+1)/2 stat vector — same single-pass layout as
    embedding_cov_matrix.
    """
    q = load(spark, sf_dir, "lineitem").select(
        F.round("l_quantity").cast("bigint").alias("x1"),
        F.round("l_extendedprice").cast("bigint").alias("x2"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x3"),
    )
    stats = q.agg(
        F.count(F.lit(1)).cast("double").alias("n1"),
        F.sum("x1").cast("bigint").cast("double").alias("s1"),
        F.sum("x2").cast("bigint").cast("double").alias("s2"),
        F.sum("x3").cast("bigint").cast("double").alias("s3"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").cast("double").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").cast("double").alias("s12"),
        F.sum(F.col("x1") * F.col("x3")).cast("bigint").cast("double").alias("s13"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").cast("double").alias("s22"),
        F.sum(F.col("x2") * F.col("x3")).cast("bigint").cast("double").alias("s23"),
        F.sum(F.col("x3") * F.col("x3")).cast("bigint").cast("double").alias("s33"),
    )
    stats.createOrReplaceTempView("vif_stats_v")
    return spark.sql(
        f"SELECT * FROM ({_vif_solve('vif_stats_v')}) ORDER BY feature"
    )


# Pairwise correlations with the response, shared text in both engines.
_R1Y = "((n1 * s1y - sx1 * sy) / sqrt((n1 * s11 - sx1 * sx1) * (n1 * syy - sy * sy)))"
_R2Y = "((n1 * s2y - sx2 * sy) / sqrt((n1 * s22 - sx2 * sx2) * (n1 * syy - sy * sy)))"
_R12X = "((n1 * s12 - sx1 * sx2) / sqrt((n1 * s11 - sx1 * sx1) * (n1 * s22 - sx2 * sx2)))"
_R2_FULL = (
    f"((({_R1Y})*({_R1Y}) + ({_R2Y})*({_R2Y})"
    f" - 2*({_R1Y})*({_R2Y})*({_R12X})) / (1 - ({_R12X})*({_R12X})))"
)
_SHAP1 = (
    f"(0.5 * ({_R1Y})*({_R1Y})"
    f" + 0.5 * ({_R2_FULL} - ({_R2Y})*({_R2Y})))"
)
_SHAP2 = (
    f"(0.5 * ({_R2Y})*({_R2Y})"
    f" + 0.5 * ({_R2_FULL} - ({_R1Y})*({_R1Y})))"
)


def _shapley_solve(from_rel: str) -> str:
    return f"""
    SELECT 'n_lineitems' AS feature,
           round(({_R1Y})*({_R1Y}), 6) AS r2_alone,
           round({_R2_FULL} - ({_R2Y})*({_R2Y}), 6) AS r2_marginal,
           round({_SHAP1}, 6) AS shapley_r2,
           round({_R2_FULL}, 6) AS r2_full,
           (abs(({_SHAP1}) + ({_SHAP2}) - {_R2_FULL}) < 1e-12)
             AS decomposition_exact
    FROM {from_rel}
    UNION ALL
    SELECT 'total_quantity' AS feature,
           round(({_R2Y})*({_R2Y}), 6) AS r2_alone,
           round({_R2_FULL} - ({_R1Y})*({_R1Y}), 6) AS r2_marginal,
           round({_SHAP2}, 6) AS shapley_r2,
           round({_R2_FULL}, 6) AS r2_full,
           (abs(({_SHAP1}) + ({_SHAP2}) - {_R2_FULL}) < 1e-12)
             AS decomposition_exact
    FROM {from_rel}
    """


_OLS_STATS_SQL = """
    WITH per_order AS (
      SELECT l_orderkey AS ok,
             CAST(count(*) AS BIGINT) AS x1,
             CAST(round(sum(l_quantity)) AS BIGINT) AS x2
      FROM lineitem GROUP BY 1
    ), xy AS (
      SELECT p.x1, p.x2, CAST(round(o.o_totalprice) AS BIGINT) AS y
      FROM per_order p JOIN orders o ON o.o_orderkey = p.ok
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n1,
             CAST(CAST(sum(x1) AS BIGINT) AS DOUBLE) AS sx1,
             CAST(CAST(sum(x2) AS BIGINT) AS DOUBLE) AS sx2,
             CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy,
             CAST(CAST(sum(x1 * x1) AS BIGINT) AS DOUBLE) AS s11,
             CAST(CAST(sum(x1 * x2) AS BIGINT) AS DOUBLE) AS s12,
             CAST(CAST(sum(x2 * x2) AS BIGINT) AS DOUBLE) AS s22,
             CAST(CAST(sum(x1 * y) AS BIGINT) AS DOUBLE) AS s1y,
             CAST(CAST(sum(x2 * y) AS BIGINT) AS DOUBLE) AS s2y,
             CAST(CAST(sum(y * y) AS BIGINT) AS DOUBLE) AS syy
      FROM xy
    )
"""


@query(
    "shapley_r2_decomposition",
    oracle=f"""
    {_OLS_STATS_SQL}
    SELECT * FROM ({_shapley_solve("stats")}) ORDER BY feature
    """,
)
def shapley_r2_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley decomposition of regression R²: split
    ols_normal_equations' model fit EXACTLY between its two features by
    averaging each feature's marginal R² contribution over both entry
    orders — Shapley value = ½·R²(alone) + ½·(R²(full) − R²(other)).
    This is the game-theoretic feature-importance attribution (LMG /
    Shapley regression) analysts use when features correlate and
    "which feature explains the variance" has no naive answer; the
    decomposition_exact column asserts the shares sum to the full R²
    (the Shapley efficiency axiom) inside 1e-12. Same exact-int
    sufficient statistics as the OLS fit; every R² is a shared double
    expression tree, so all shares are bit-exact at 6dp.

    Scale: identical to ols_normal_equations — one stats pass, a 2-row
    dimension solve. p features need 2^p subset R²s (closed-form up to
    ~10 features from the same p² stat vector); beyond that production
    uses sampled permutations, the same stats pass feeding each.
    """
    per_order = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("x1"),
            F.round(F.sum("l_quantity")).cast("bigint").alias("x2"),
        )
    )
    xy = per_order.join(
        load(spark, sf_dir, "orders"),
        per_order.ok == F.col("o_orderkey"),
    ).select("x1", "x2", F.round("o_totalprice").cast("bigint").alias("y"))
    stats = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n1"),
        F.sum("x1").cast("bigint").cast("double").alias("sx1"),
        F.sum("x2").cast("bigint").cast("double").alias("sx2"),
        F.sum("y").cast("bigint").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").cast("double").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").cast("double").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").cast("double").alias("s22"),
        F.sum(F.col("x1") * F.col("y")).cast("bigint").cast("double").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("bigint").cast("double").alias("s2y"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").cast("double").alias("syy"),
    )
    stats.createOrReplaceTempView("shapley_stats_v")
    return spark.sql(
        f"SELECT * FROM ({_shapley_solve('shapley_stats_v')}) ORDER BY feature"
    )
