"""Probabilistic record linkage (Fellegi-Sunter) with blocked pair
generation — the entity-resolution layer above fuzzy_name_match /
golden_record_merge: instead of ad-hoc similarity thresholds, each field
agreement contributes a log-likelihood weight ln(m/u) derived from the
data's own value-frequency distribution, and pair decisions come from the
summed weight against match/possible thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_FS_M = 0.95  # per-field m-probability (agreement given true match)
_FS_HI = 4.0  # score > HI  -> match
_FS_LO = -2.0  # LO < score <= HI -> possible; else nonmatch

# (field key, SQL expression over a customer row) — segment, name last-3,
# $1000 account-balance bucket
# (key, Spark SQL expr, DuckDB expr) — only integer-division spelling differs
_FS_FIELDS = [
    ("seg", "c_mktsegment", "c_mktsegment"),
    (
        "nm3",
        "substr(c_name, length(c_name) - 2)",
        "substr(c_name, length(c_name) - 2)",
    ),
    (
        "bal",
        "CAST(CAST(round(c_acctbal * 100) AS BIGINT) div 100000 AS STRING)",
        "CAST(CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS VARCHAR)",
    ),
]


def _fs_u_sql(key: str, expr: str) -> str:
    """Exact u-probability numerator/denominator: P(two random records
    agree on the field) = Σ_v cnt_v² / n²."""
    return f"""
    u_{key} AS (
      SELECT CAST(sum(c * c) AS BIGINT) AS num, CAST(sum(c) AS BIGINT) AS n
      FROM (SELECT {expr} AS v, CAST(count(*) AS BIGINT) AS c
            FROM customer GROUP BY 1)
    )"""


_FS_W_SQL = ", ".join(
    f"ln({_FS_M} * (u_{k}.n * u_{k}.n) * 1.0 / u_{k}.num) AS w_{k}, "
    f"ln({1 - _FS_M:.2f} * (u_{k}.n * u_{k}.n) * 1.0"
    f" / (u_{k}.n * u_{k}.n - u_{k}.num)) AS d_{k}"
    for k, _, _ in _FS_FIELDS
)

_FS_SCORE_SQL = " + ".join(
    f"CASE WHEN a.f_{k} = b.f_{k} THEN w.w_{k} ELSE w.d_{k} END"
    for k, _, _ in _FS_FIELDS
)

_FS_FIELD_SEL = ", ".join(f"{de} AS f_{k}" for k, _, de in _FS_FIELDS)


@query(
    "fellegi_sunter_linkage",
    oracle=f"""
    WITH {", ".join(_fs_u_sql(k, de) for k, _, de in _FS_FIELDS)},
    w AS (
      SELECT {_FS_W_SQL}
      FROM u_{_FS_FIELDS[0][0]}, u_{_FS_FIELDS[1][0]}, u_{_FS_FIELDS[2][0]}
    ), recs AS (
      SELECT c_custkey AS k, c_nationkey AS blk, {_FS_FIELD_SEL}
      FROM customer
    ), scored AS (
      SELECT {_FS_SCORE_SQL} AS score
      FROM recs a JOIN recs b ON a.blk = b.blk AND a.k < b.k
      CROSS JOIN w
    ), classed AS (
      SELECT CASE WHEN score > {_FS_HI} THEN 'match'
                  WHEN score > {_FS_LO} THEN 'possible'
                  ELSE 'nonmatch' END AS decision,
             score
      FROM scored
    )
    SELECT decision, CAST(count(*) AS BIGINT) AS n_pairs,
           round(min(score), 6) AS min_score,
           round(max(score), 6) AS max_score
    FROM classed GROUP BY 1 ORDER BY 1
    """,
)
def fellegi_sunter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage over customers:
    candidate pairs generate ONLY within nation blocks (blocked
    equi-join, never all-pairs); each of three fields — market segment,
    name last-3, $1000 balance bucket — contributes ln(m/u) on
    agreement or ln((1-m)/(1-u)) on disagreement, where the
    u-probabilities (chance agreement of two random records) are EXACT
    integer ratios Σcnt²/n² from the field's own value-frequency table
    and m is the standard fixed typo-tolerance prior. Pairs classify as
    match / possible / nonmatch against the decision thresholds; the
    report gives per-decision counts and score ranges. Every weight is a
    double derived from exact int64 sums by the identical expression
    tree, so scores — and therefore the classification counts — are
    bit-exact across engines.

    Scale: u-estimation is three tiny value-frequency aggs; the pair
    join's fan-out is bounded by block size (at skew, sub-block on a
    second field — the standard blocking ladder); the weight frame is a
    1-row broadcast. This is exactly how production linkage (Splink et
    al.) runs on Spark.
    """
    u_frames = {}
    for k, expr, _ in _FS_FIELDS:
        cnts = (
            load(spark, sf_dir, "customer")
            .groupBy(F.expr(expr).alias("v"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        u_frames[k] = cnts.agg(
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias(f"num_{k}"),
            F.sum("c").cast("bigint").alias(f"n_{k}"),
        )
    w = u_frames[_FS_FIELDS[0][0]]
    for k, _, _ in _FS_FIELDS[1:]:
        w = w.crossJoin(u_frames[k])
    w_cols = []
    for k, _, _ in _FS_FIELDS:
        n2 = F.col(f"n_{k}") * F.col(f"n_{k}")
        w_cols.append(
            F.log(F.lit(_FS_M) * n2 * 1.0 / F.col(f"num_{k}")).alias(f"w_{k}")
        )
        w_cols.append(
            F.log(
                F.lit(round(1 - _FS_M, 2)) * n2 * 1.0 / (n2 - F.col(f"num_{k}"))
            ).alias(f"d_{k}")
        )
    w = w.select(*w_cols)

    recs = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_nationkey").alias("blk"),
        *[F.expr(expr).alias(f"f_{k}") for k, expr, _ in _FS_FIELDS],
    )
    a = recs.alias("a")
    b = recs.alias("b")
    score = None
    for k, _, _ in _FS_FIELDS:
        term = F.when(
            F.col(f"a.f_{k}") == F.col(f"b.f_{k}"), F.col(f"w_{k}")
        ).otherwise(F.col(f"d_{k}"))
        score = term if score is None else score + term
    scored = (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.k") < F.col("b.k")))
        .crossJoin(F.broadcast(w))
        .select(score.alias("score"))
    )
    decision = (
        F.when(F.col("score") > _FS_HI, "match")
        .when(F.col("score") > _FS_LO, "possible")
        .otherwise("nonmatch")
    )
    return (
        scored.groupBy(decision.alias("decision"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.min("score"), 6).alias("min_score"),
            F.round(F.max("score"), 6).alias("max_score"),
        )
        .orderBy("decision")
    )
