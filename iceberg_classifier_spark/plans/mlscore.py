"""ML scoring wave: credit-scoring WoE/IV binning, an exact decision
stump (the one-split tree), and MAP@k retrieval evaluation.

Weight-of-evidence / information-value is the feature-screening
workhorse of scorecard modelling; the decision stump is the smallest
useful tree (and the weak learner inside AdaBoost) — both are
closed-form over histograms, so they distribute as one map-side
aggregate plus tiny-frame arithmetic. MAP@k completes the retrieval
metric suite next to `ndcg_ann_eval` and `pr_auc_exact`.

Reference: the reference trains Keras CNN classifiers (main.py) —
these supply the feature-screening and evaluation surface around such
a model at data-pipeline scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_WOE_BIN = 25000  # fixed-width price bins (dollars)


@query(
    "woe_iv_binning",
    oracle=f"""
    WITH labeled AS (
      SELECT CAST(floor(o_totalprice / {_WOE_BIN}) AS BIGINT) AS bin,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      FROM orders
    ), bins AS (
      SELECT bin,
             CAST(sum(y) AS BIGINT) AS good,
             CAST(count(*) - sum(y) AS BIGINT) AS bad
      FROM labeled GROUP BY bin
    ), tot AS (
      SELECT bin, good, bad,
             CAST(sum(good) OVER () AS BIGINT) AS g_tot,
             CAST(sum(bad) OVER () AS BIGINT) AS b_tot
      FROM bins
    ), woe AS (
      SELECT bin, good, bad,
             ln(((good + 0.5) / g_tot) / ((bad + 0.5) / b_tot)) AS w,
             ((good + 0.5) / g_tot - (bad + 0.5) / b_tot)
               * ln(((good + 0.5) / g_tot) / ((bad + 0.5) / b_tot)) AS ivc
      FROM tot
    )
    SELECT bin, good, bad,
           round(w, 6) AS woe,
           round(ivc, 6) AS iv_contrib,
           round(sum(ivc) OVER (ORDER BY bin
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 6)
             AS iv_total
    FROM woe ORDER BY bin
    """,
)
def woe_iv_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value screen of order total-price
    (fixed-width $25k bins) against the urgent-priority label:
    WoE_b = ln((good_b/G)/(bad_b/B)) with +0.5 Laplace smoothing, and
    IV = Σ_b (good%−bad%)·WoE_b — the scorecard-modelling screen that
    says how separable the label is along this feature (IV < 0.02
    useless, > 0.3 strong) and hands the binned WoE transform to a
    downstream logistic model.

    Determinism: bin counts are exact integers; WoE/IV are identical
    double expressions per bin; iv_total sums the ≤20-row bin frame in
    a full-frame ORDER BY bin window (fixed fold order both engines).

    Scale: fixed-width binning is a map-side expression (no global
    quantile pass), one map-side-combined groupBy(bin); everything
    after runs on the ≤20-row bin summary.
    """
    labeled = load(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") / _WOE_BIN).cast("bigint").alias("bin"),
        (F.col("o_orderpriority") == "1-URGENT").cast("bigint").alias("y"),
    )
    bins = labeled.groupBy("bin").agg(
        F.sum("y").alias("good"),
        (F.count(F.lit(1)) - F.sum("y")).alias("bad"),
    )
    wall = Window.partitionBy()
    tot = bins.select(
        "bin",
        "good",
        "bad",
        F.sum("good").over(wall).alias("g_tot"),
        F.sum("bad").over(wall).alias("b_tot"),
    )
    gshare = (F.col("good") + 0.5) / F.col("g_tot")
    bshare = (F.col("bad") + 0.5) / F.col("b_tot")
    woe = tot.select(
        "bin",
        "good",
        "bad",
        F.log(gshare / bshare).alias("w"),
        ((gshare - bshare) * F.log(gshare / bshare)).alias("ivc"),
    )
    wfull = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return woe.select(
        "bin",
        "good",
        "bad",
        F.round("w", 6).alias("woe"),
        F.round("ivc", 6).alias("iv_contrib"),
        F.round(F.sum("ivc").over(wfull), 6).alias("iv_total"),
    ).orderBy("bin")


# Binary entropy of a (k, n) split as an inline SQL fragment — the k=0 /
# k=n branches are exact zeros, never a log(0).
def _h_sql(k: str, n: str) -> str:
    k, n = f"({k})", f"({n})"
    return f"""(CASE WHEN {k} = 0 OR {k} = {n} THEN 0.0 ELSE
      -(({k} * 1.0 / {n}) * ln({k} * 1.0 / {n})
        + (({n} - {k}) * 1.0 / {n}) * ln(({n} - {k}) * 1.0 / {n}))
      END)"""


def _h_col(k, n):
    p = k * 1.0 / n
    q = (n - k) * 1.0 / n
    return F.when((k == 0) | (k == n), F.lit(0.0)).otherwise(
        -(p * F.log(p) + q * F.log(q))
    )


@query(
    "decision_stump_split",
    oracle=f"""
    WITH pts AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS q,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ), hist AS (
      SELECT q, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS k
      FROM pts GROUP BY q
    ), cum AS (
      SELECT q,
             CAST(sum(n) OVER (ORDER BY q) AS BIGINT) AS nl,
             CAST(sum(k) OVER (ORDER BY q) AS BIGINT) AS kl,
             CAST(sum(n) OVER () AS BIGINT) AS nt,
             CAST(sum(k) OVER () AS BIGINT) AS kt
      FROM hist
    ), gains AS (
      SELECT q AS threshold, nl, kl, nt - nl AS nr, kt - kl AS kr,
             {_h_sql("kt", "nt")}
               - (nl * 1.0 / nt) * {_h_sql("kl", "nl")}
               - ((nt - nl) * 1.0 / nt)
                 * {_h_sql("kt - kl", "nt - nl")} AS gain
      FROM cum WHERE nl < nt
    ), best AS (
      SELECT * FROM gains ORDER BY gain DESC, threshold LIMIT 1
    )
    SELECT threshold, nl AS n_left, kl AS k_left,
           nr AS n_right, kr AS k_right,
           CAST(kl * 1000000 // nl AS BIGINT) AS left_pos_ppm,
           CAST(kr * 1000000 // nr AS BIGINT) AS right_pos_ppm,
           round(gain, 6) AS info_gain
    FROM best
    """,
)
def decision_stump_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decision stump: the single split `quantity ≤ θ` on lineitem
    that maximizes information gain for the returned-flag label —
    IG(θ) = H(parent) − (n_L/n)·H(left) − (n_R/n)·H(right) evaluated at
    every distinct integer quantity via cumulative (k, n) histograms,
    smallest-θ tiebreak. The one-split tree IS AdaBoost's weak learner
    and the standard "is this feature worth anything" probe; the same
    cumulative-histogram construction is how distributed GBDT builders
    (LightGBM/XGBoost-style) scan split candidates.

    Determinism: the argmax compares doubles built from exact integer
    (k, n) cumulative counts with a θ tiebreak; entropy branches make
    k=0/k=n exact zeros (never log(0)·0 = NaN).

    Scale: one map-side-combined groupBy over the ≤50-value quantity
    histogram; the split scan is window arithmetic on that tiny frame
    (binned features keep candidate sets bounded at any fact size);
    best-split is a 1-row TakeOrdered.
    """
    pts = load(spark, sf_dir, "lineitem").select(
        F.round("l_quantity").cast("bigint").alias("q"),
        (F.col("l_returnflag") == "R").cast("bigint").alias("y"),
    )
    hist = pts.groupBy("q").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("k")
    )
    wq = Window.orderBy("q")
    wall = Window.partitionBy()
    cum = hist.select(
        "q",
        F.sum("n").over(wq).alias("nl"),
        F.sum("k").over(wq).alias("kl"),
        F.sum("n").over(wall).alias("nt"),
        F.sum("k").over(wall).alias("kt"),
    )
    gain = (
        _h_col(F.col("kt"), F.col("nt"))
        - (F.col("nl") * 1.0 / F.col("nt"))
        * _h_col(F.col("kl"), F.col("nl"))
        - ((F.col("nt") - F.col("nl")) * 1.0 / F.col("nt"))
        * _h_col(F.col("kt") - F.col("kl"), F.col("nt") - F.col("nl"))
    )
    gains = (
        cum.filter(F.col("nl") < F.col("nt"))
        .select(
            F.col("q").alias("threshold"),
            "nl",
            "kl",
            (F.col("nt") - F.col("nl")).alias("nr"),
            (F.col("kt") - F.col("kl")).alias("kr"),
            gain.alias("gain"),
        )
    )
    best = gains.orderBy(F.desc("gain"), "threshold").limit(1)
    return best.select(
        "threshold",
        F.col("nl").alias("n_left"),
        F.col("kl").alias("k_left"),
        F.col("nr").alias("n_right"),
        F.col("kr").alias("k_right"),
        F.expr("CAST(kl * 1000000 div nl AS BIGINT)").alias("left_pos_ppm"),
        F.expr("CAST(kr * 1000000 div nr AS BIGINT)").alias("right_pos_ppm"),
        F.round("gain", 6).alias("info_gain"),
    )


_MAP_Q = 16  # query vectors: vec_id < 16
_MAP_K = 10


@query(
    "map_at_k_eval",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS DOUBLE)) AS v
      FROM embeddings
    ), q AS (SELECT * FROM e WHERE vec_id < {_MAP_Q}),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS qlab,
             c.vec_id AS neighbor_id, c.label AS clab,
             list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(c.v, c.v))
                  * sqrt(list_dot_product(q.v, q.v))) AS cos
      FROM q JOIN e c ON q.vec_id <> c.vec_id
    ), ranked AS (
      SELECT query_id,
             CASE WHEN clab = qlab THEN 1 ELSE 0 END AS rel,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS r
      FROM scored
    ), topk AS (
      SELECT query_id, rel, r,
             sum(rel) OVER (PARTITION BY query_id ORDER BY r) AS cum_rel
      FROM ranked WHERE r <= {_MAP_K}
    ), perq AS (
      SELECT query_id,
             CAST(sum(rel) AS BIGINT) AS n_rel_topk,
             sum(CASE WHEN rel = 1 THEN cum_rel * 1.0 / r ELSE 0 END)
               / {_MAP_K} AS ap
      FROM topk GROUP BY query_id
    )
    SELECT query_id, n_rel_topk, round(ap, 6) AS ap_at_k FROM perq
    UNION ALL
    SELECT CAST(-1 AS BIGINT) AS query_id,
           CAST(sum(n_rel_topk) AS BIGINT) AS n_rel_topk,
           round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(ap ORDER BY query_id)), (a, v) -> a + v)
                 / count(*), 6) AS ap_at_k
    FROM perq
    ORDER BY query_id
    """,
)
def map_at_k_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP@10 retrieval evaluation over the embedding corpus: each query
    vector (vec_id < 16) retrieves exact cosine top-10; a neighbor is
    relevant iff it shares the query's label; AP@k = Σ_{rel hits} P@i / k
    per query and the -1 summary row carries MAP = mean AP — the
    ranking-quality headline metric next to `ndcg_ann_eval` (gain-
    discounted) and `pr_auc_exact` (threshold-free).

    Determinism: vectors are 1e-4 fixed-point ints so every dot product
    is an exact integer and ranks are bit-stable (the
    `ann_bruteforce_topk` construction); P@i sums run in rank order
    inside a window; the MAP mean folds AP values in query_id order.

    Scale: scoring is the blocked-GEMM shape — the bounded query block
    broadcasts, each Arrow batch emits only its local top-k per query,
    a final per-query window merges partition winners. Nothing
    corpus-sized shuffles.
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
    qrows = sorted(
        e.where(F.col("vec_id") < _MAP_Q).collect(), key=lambda r: r.vec_id
    )
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    qlab = np.array([r.label for r in qrows], dtype=np.int64)
    Q = np.array([r.vi for r in qrows], dtype=np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))

    def topk_blocks(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            labs = pdf["label"].to_numpy(dtype=np.int64)
            M = np.stack(pdf["vi"].to_numpy()).astype(np.float64)
            nn = np.sqrt((M * M).sum(axis=1))
            cos = (M @ Q.T) / (nn[:, None] * qn[None, :])
            rows = []
            for j in range(len(qids)):
                keep = np.flatnonzero(ids != qids[j])
                order = keep[np.lexsort((ids[keep], -cos[keep, j]))][:_MAP_K]
                rows += [
                    (int(qids[j]), int(ids[i]), float(cos[i, j]),
                     int(labs[i] == qlab[j]))
                    for i in order
                ]
            yield pd.DataFrame(
                rows, columns=["query_id", "neighbor_id", "cos", "rel"]
            )

    scored = e.mapInPandas(
        topk_blocks, "query_id long, neighbor_id long, cos double, rel int"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    topk = (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= _MAP_K)
        .withColumn(
            "cum_rel",
            F.sum("rel").over(
                Window.partitionBy("query_id").orderBy("r")
            ),
        )
    )
    perq = topk.groupBy("query_id").agg(
        F.sum("rel").cast("bigint").alias("n_rel_topk"),
        (
            F.sum(
                F.when(
                    F.col("rel") == 1, F.col("cum_rel") * 1.0 / F.col("r")
                ).otherwise(F.lit(0.0))
            )
            / _MAP_K
        ).alias("ap"),
    )
    summary = perq.agg(
        F.lit(-1).cast("bigint").alias("query_id"),
        F.sum("n_rel_topk").cast("bigint").alias("n_rel_topk"),
        F.round(
            F.expr(
                """
                aggregate(transform(array_sort(
                    collect_list(struct(query_id, ap))), s -> s.ap),
                  CAST(0.0 AS DOUBLE), (a, v) -> a + v)
                """
            )
            / F.count(F.lit(1)),
            6,
        ).alias("ap_at_k"),
    )
    return (
        perq.select(
            "query_id", "n_rel_topk", F.round("ap", 6).alias("ap_at_k")
        )
        .unionAll(summary)
        .orderBy("query_id")
    )
