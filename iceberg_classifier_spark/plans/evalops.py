"""Evaluation + causal-inference wave: exact average precision (PR-AUC)
and difference-in-differences.

PR-AUC/average-precision is the metric that matters under class
imbalance where ROC-AUC flatters (completes the roc_auc_exact /
calibration_reliability_bins / log_loss eval suite); DiD is the classic
two-period panel estimator every experimentation platform reaches for
when randomization isn't available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.mlprep import duck_pseudo_prob, pseudo_prob
from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load


@query(
    "pr_auc_exact",
    oracle=f"""
    WITH s AS (
      SELECT CAST(label % 2 AS BIGINT) AS y,
             CAST(round({duck_pseudo_prob(0)} * 1000000) AS BIGINT) AS p6
      FROM embeddings
    ), g AS (
      SELECT p6, CAST(sum(y) AS BIGINT) AS c1,
             CAST(sum(1 - y) AS BIGINT) AS c0
      FROM s GROUP BY 1
    ), c AS (
      SELECT p6, c1, c0,
             CAST(sum(c1) OVER (ORDER BY p6 DESC) AS BIGINT) AS tp,
             CAST(sum(c0) OVER (ORDER BY p6 DESC) AS BIGINT) AS fp
      FROM g
    ), tot AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c0) AS BIGINT) AS n0
      FROM g
    ), ap AS (
      SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(c1 * (CAST(tp AS DOUBLE) / (tp + fp))
                    ORDER BY p6 DESC)),
               (a, v) -> a + v) AS ap_num
      FROM c
    )
    SELECT t.n1, t.n0,
           round(a.ap_num / t.n1, 6) AS average_precision,
           round(CAST(t.n1 AS DOUBLE) / (t.n1 + t.n0), 6) AS baseline_prec,
           round((a.ap_num / t.n1)
                 / (CAST(t.n1 AS DOUBLE) / (t.n1 + t.n0)), 6) AS lift
    FROM tot t CROSS JOIN ap a
    """,
)
def pr_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact average precision (step-wise PR-AUC): AP = Σ_k ΔR_k · P_k
    over descending distinct score thresholds, with ties value-grouped —
    the imbalance-honest companion to roc_auc_exact (a random scorer's
    AP equals the positive base rate; the lift column reports the
    multiple over that floor). TP/FP at each threshold are exact int64
    cumulatives over the distinct-score dimension; the per-threshold
    terms sum in a score-DESC ordered fold, so AP is bit-exact at 6dp
    across engines.

    Scale: one map-side-combinable value groupBy + one cumulative
    window over the distinct-score dimension (bucketed two-level at
    extreme score cardinality, exactly as roc_auc_exact documents); the
    ordered fold runs on that same bounded frame.
    """
    s = load(spark, sf_dir, "embeddings").select(
        (F.col("label") % 2).cast("bigint").alias("y"),
        F.round(pseudo_prob(0) * 1000000).cast("bigint").alias("p6"),
    )
    g = s.groupBy("p6").agg(
        F.sum("y").cast("bigint").alias("c1"),
        F.sum(1 - F.col("y")).cast("bigint").alias("c0"),
    )
    wc = Window.partitionBy().orderBy(F.desc("p6"))
    c = g.select(
        "p6",
        "c1",
        "c0",
        F.sum("c1").over(wc).cast("bigint").alias("tp"),
        F.sum("c0").over(wc).cast("bigint").alias("fp"),
    )
    tot = g.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c0").cast("bigint").alias("n0"),
    )
    ap = c.select(
        "p6",
        (
            F.col("c1") * (F.col("tp").cast("double") / (F.col("tp") + F.col("fp")))
        ).alias("term"),
    ).agg(
        F.expr(
            """
            aggregate(
              transform(array_sort(collect_list(struct(-p6 AS np, term))),
                        x -> x.term),
              CAST(0.0 AS DOUBLE), (a, v) -> a + v)
            """
        ).alias("ap_num")
    )
    return tot.crossJoin(F.broadcast(ap)).select(
        "n1",
        "n0",
        F.round(F.col("ap_num") / F.col("n1"), 6).alias("average_precision"),
        F.round(
            F.col("n1").cast("double") / (F.col("n1") + F.col("n0")), 6
        ).alias("baseline_prec"),
        F.round(
            (F.col("ap_num") / F.col("n1"))
            / (F.col("n1").cast("double") / (F.col("n1") + F.col("n0"))),
            6,
        ).alias("lift"),
    )


_DID_SPLIT_DAY = 15  # pre = days 1-15, post = rest of the month


@query(
    "difference_in_differences",
    oracle=f"""
    WITH p AS (
      SELECT (user_id % 2 = 1) AS treated,
             (CAST(day(ts) AS BIGINT) > {_DID_SPLIT_DAY}) AS post,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ), cell AS (
      SELECT treated, post,
             CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) AS s,
             CAST(CAST(sum(cents * cents) AS BIGINT) AS DOUBLE) AS ss
      FROM p GROUP BY 1, 2
    ), w AS (
      SELECT
        max(CASE WHEN treated AND post THEN s / n END) AS m_tp,
        max(CASE WHEN treated AND NOT post THEN s / n END) AS m_t0,
        max(CASE WHEN NOT treated AND post THEN s / n END) AS m_cp,
        max(CASE WHEN NOT treated AND NOT post THEN s / n END) AS m_c0,
        max(CASE WHEN treated AND post THEN (ss - s * s / n) / (n - 1) / n END)
          AS v_tp,
        max(CASE WHEN treated AND NOT post
                 THEN (ss - s * s / n) / (n - 1) / n END) AS v_t0,
        max(CASE WHEN NOT treated AND post
                 THEN (ss - s * s / n) / (n - 1) / n END) AS v_cp,
        max(CASE WHEN NOT treated AND NOT post
                 THEN (ss - s * s / n) / (n - 1) / n END) AS v_c0,
        CAST(sum(n) AS BIGINT) AS n_total
      FROM cell
    )
    SELECT n_total,
           round(m_t0 / 100, 6) AS mean_treat_pre,
           round(m_tp / 100, 6) AS mean_treat_post,
           round(m_c0 / 100, 6) AS mean_ctrl_pre,
           round(m_cp / 100, 6) AS mean_ctrl_post,
           round(((m_tp - m_t0) - (m_cp - m_c0)) / 100, 6) AS did_estimate,
           round(sqrt(v_tp + v_t0 + v_cp + v_c0) / 100, 6) AS se,
           round(((m_tp - m_t0) - (m_cp - m_c0))
                 / sqrt(v_tp + v_t0 + v_cp + v_c0), 6) AS t_stat,
           (abs(((m_tp - m_t0) - (m_cp - m_c0))
                / sqrt(v_tp + v_t0 + v_cp + v_c0)) > 1.96) AS significant
    FROM w
    """,
)
def difference_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the 2×2 panel estimator
    (treat − control) × (post − pre) on event value, with treatment
    assigned by a deterministic user-id parity and the period split at
    day {_DID_SPLIT_DAY} — the workhorse causal design when
    randomization isn't available (parallel-trends assumption). On this
    null synthetic feed the true effect is zero, so the estimator's
    job — and what the oracle checks — is a near-zero estimate with an
    honest standard error and an insignificant t-stat (the same
    null-data discipline as benjamini_hochberg_fdr). Cell sums are
    exact int64 cents; means/variances/t are identical double
    expressions, bit-exact at 6dp.

    Scale: one map-side-combined (treated, post) cell aggregate — four
    cells regardless of corpus size; the estimator runs on the 1-row
    pivot. Covariate-adjusted DiD at scale = the same cells per
    stratum + ipf_raking/cuped-style adjustment, all dimension-sized.
    """
    p = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 2 == 1).alias("treated"),
        (F.dayofmonth("ts").cast("bigint") > _DID_SPLIT_DAY).alias("post"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    cell = p.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").cast("double").alias("s"),
        F.sum(F.col("cents") * F.col("cents"))
        .cast("bigint")
        .cast("double")
        .alias("ss"),
    )

    def m(t, po):
        cond = (F.col("treated") == t) & (F.col("post") == po)
        return F.max(F.when(cond, F.col("s") / F.col("n")))

    def v(t, po):
        cond = (F.col("treated") == t) & (F.col("post") == po)
        return F.max(
            F.when(
                cond,
                (F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
                / (F.col("n") - 1)
                / F.col("n"),
            )
        )

    w = cell.agg(
        m(True, True).alias("m_tp"),
        m(True, False).alias("m_t0"),
        m(False, True).alias("m_cp"),
        m(False, False).alias("m_c0"),
        v(True, True).alias("v_tp"),
        v(True, False).alias("v_t0"),
        v(False, True).alias("v_cp"),
        v(False, False).alias("v_c0"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    did = (F.col("m_tp") - F.col("m_t0")) - (F.col("m_cp") - F.col("m_c0"))
    se = F.sqrt(
        F.col("v_tp") + F.col("v_t0") + F.col("v_cp") + F.col("v_c0")
    )
    return w.select(
        "n_total",
        F.round(F.col("m_t0") / 100, 6).alias("mean_treat_pre"),
        F.round(F.col("m_tp") / 100, 6).alias("mean_treat_post"),
        F.round(F.col("m_c0") / 100, 6).alias("mean_ctrl_pre"),
        F.round(F.col("m_cp") / 100, 6).alias("mean_ctrl_post"),
        F.round(did / 100, 6).alias("did_estimate"),
        F.round(se / 100, 6).alias("se"),
        F.round(did / se, 6).alias("t_stat"),
        (F.abs(did / se) > 1.96).alias("significant"),
    )
