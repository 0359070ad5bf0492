"""ML scoring wave 2: operating-threshold selection, permutation
feature importance, and sampling-temperature entropy.

Threshold selection turns a scored model into a decision rule — by
F1, Youden's J, or expected cost, three criteria that rarely agree.
Permutation importance measures what a feature is worth by destroying
it (deterministically) and re-measuring AUC. The temperature sweep is
the LLM-sampling diagnostic: how next-token entropy responds to
temperature, computed analytically from the engine's bigram LM
counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.mlprep import duck_pseudo_prob, pseudo_prob
from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_COST_FP = 1
_COST_FN = 5


@query(
    "optimal_threshold_selection",
    oracle=f"""
    WITH s AS (
      SELECT CAST(label % 2 AS BIGINT) AS y,
             least(CAST(round({duck_pseudo_prob(0)} * 1000000) AS BIGINT)
                   // 10000, 99) AS b
      FROM embeddings
    ), hist AS (
      SELECT b, CAST(sum(y) AS BIGINT) AS p1,
             CAST(count(*) - sum(y) AS BIGINT) AS p0
      FROM s GROUP BY b
    ), grid AS (SELECT unnest(range(0, 101)) AS t),
    conf AS (
      SELECT g.t,
             CAST(coalesce(sum(CASE WHEN h.b >= g.t THEN h.p1 END), 0)
               AS BIGINT) AS tp,
             CAST(coalesce(sum(CASE WHEN h.b >= g.t THEN h.p0 END), 0)
               AS BIGINT) AS fp,
             CAST(coalesce(sum(CASE WHEN h.b < g.t THEN h.p1 END), 0)
               AS BIGINT) AS fn,
             CAST(coalesce(sum(CASE WHEN h.b < g.t THEN h.p0 END), 0)
               AS BIGINT) AS tn
      FROM grid g CROSS JOIN hist h
      GROUP BY g.t
    ), scoredt AS (
      SELECT t, tp, fp, fn, tn,
             CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
                  ELSE 2.0 * tp / (2 * tp + fp + fn) END AS f1,
             CASE WHEN tp + fn = 0 OR fp + tn = 0 THEN 0.0
                  ELSE tp * 1.0 / (tp + fn) - fp * 1.0 / (fp + tn) END
               AS youden_j,
             {_COST_FP} * fp + {_COST_FN} * fn AS cost
      FROM conf
    ), best_f1 AS (
      SELECT 'f1' AS criterion, t, tp, fp, fn, tn, round(f1, 6) AS value
      FROM scoredt ORDER BY f1 DESC, t LIMIT 1
    ), best_j AS (
      SELECT 'youden_j' AS criterion, t, tp, fp, fn, tn,
             round(youden_j, 6) AS value
      FROM scoredt ORDER BY youden_j DESC, t LIMIT 1
    ), best_cost AS (
      SELECT 'min_cost' AS criterion, t, tp, fp, fn, tn,
             CAST(cost AS DOUBLE) AS value
      FROM scoredt ORDER BY cost, t LIMIT 1
    )
    SELECT criterion, CAST(t * 10000 AS BIGINT) AS threshold_ppm,
           tp, fp, fn, tn, value
    FROM (SELECT * FROM best_f1 UNION ALL SELECT * FROM best_j
          UNION ALL SELECT * FROM best_cost)
    ORDER BY criterion
    """,
)
def optimal_threshold_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-threshold selection for the scored classifier over a
    101-point threshold grid (1%-wide score bins): the F1-maximizing,
    Youden's-J-maximizing (TPR−FPR — the ROC corner), and expected-
    cost-minimizing (FP=1, FN=5) thresholds with their confusion
    counts — three defensible answers to "where do I cut", which
    disagree exactly when the base rate is skewed or costs are
    asymmetric (the point of showing all three).

    Determinism: bin counts and confusion cells are exact integers;
    per-criterion argmax is (value, threshold)-ordered with double
    values built from identical expressions.

    Scale: one map-side-combined 100-bin histogram off the fact pass;
    the grid×histogram expansion is 101×100 bounded rows; selections
    are 1-row TakeOrdereds.
    """
    s = load(spark, sf_dir, "embeddings").select(
        (F.col("label") % 2).cast("bigint").alias("y"),
        F.round(pseudo_prob(0) * 1000000).cast("bigint").alias("p6"),
    ).select(
        "y",
        F.least(F.expr("p6 div 10000"), F.lit(99).cast("bigint")).alias("b"),
    )
    hist = s.groupBy("b").agg(
        F.sum("y").cast("bigint").alias("p1"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("p0"),
    )
    grid = spark.range(0, 101).select(F.col("id").cast("bigint").alias("t"))
    conf = (
        grid.crossJoin(F.broadcast(hist))
        .groupBy("t")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("b") >= F.col("t"), F.col("p1"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tp"),
            F.coalesce(
                F.sum(F.when(F.col("b") >= F.col("t"), F.col("p0"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("fp"),
            F.coalesce(
                F.sum(F.when(F.col("b") < F.col("t"), F.col("p1"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("fn"),
            F.coalesce(
                F.sum(F.when(F.col("b") < F.col("t"), F.col("p0"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tn"),
        )
    )
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") == 0, F.lit(0.0)
    ).otherwise(
        2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn"))
    )
    jj = F.when(
        ((F.col("tp") + F.col("fn")) == 0)
        | ((F.col("fp") + F.col("tn")) == 0),
        F.lit(0.0),
    ).otherwise(
        F.col("tp") * 1.0 / (F.col("tp") + F.col("fn"))
        - F.col("fp") * 1.0 / (F.col("fp") + F.col("tn"))
    )
    cost = _COST_FP * F.col("fp") + _COST_FN * F.col("fn")
    scoredt = conf.select(
        "t",
        "tp",
        "fp",
        "fn",
        "tn",
        f1.alias("f1"),
        jj.alias("youden_j"),
        cost.alias("cost"),
    )
    best_f1 = (
        scoredt.orderBy(F.desc("f1"), "t")
        .limit(1)
        .select(
            F.lit("f1").alias("criterion"),
            "t",
            "tp",
            "fp",
            "fn",
            "tn",
            F.round("f1", 6).alias("value"),
        )
    )
    best_j = (
        scoredt.orderBy(F.desc("youden_j"), "t")
        .limit(1)
        .select(
            F.lit("youden_j").alias("criterion"),
            "t",
            "tp",
            "fp",
            "fn",
            "tn",
            F.round("youden_j", 6).alias("value"),
        )
    )
    best_cost = (
        scoredt.orderBy("cost", "t")
        .limit(1)
        .select(
            F.lit("min_cost").alias("criterion"),
            "t",
            "tp",
            "fp",
            "fn",
            "tn",
            F.col("cost").cast("double").alias("value"),
        )
    )
    return (
        best_f1.unionAll(best_j)
        .unionAll(best_cost)
        .select(
            "criterion",
            (F.col("t") * 10000).cast("bigint").alias("threshold_ppm"),
            "tp",
            "fp",
            "fn",
            "tn",
            "value",
        )
        .orderBy("criterion")
    )


@query(
    "permutation_importance_auc",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, CAST(label % 2 AS BIGINT) AS y,
             CAST(round({duck_pseudo_prob(0)} * 1000000) AS BIGINT) AS p6
      FROM embeddings
    ), partner AS (
      SELECT a.vec_id, a.y, b.p6 AS p6_perm
      FROM base a JOIN base b
        ON b.vec_id = CAST(xor(a.vec_id, 1) AS BIGINT)
    ), auc_base AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c0) AS BIGINT) AS n0,
             CAST(sum(c1 * (2 * cb + t + 1)) AS BIGINT) AS r1_2
      FROM (
        SELECT p6, c1, c0, c1 + c0 AS t,
               CAST(coalesce(sum(c1 + c0) OVER (ORDER BY p6
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cb
        FROM (SELECT p6, CAST(sum(y) AS BIGINT) AS c1,
                     CAST(count(*) - sum(y) AS BIGINT) AS c0
              FROM base GROUP BY p6)
      )
    ), auc_perm AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c0) AS BIGINT) AS n0,
             CAST(sum(c1 * (2 * cb + t + 1)) AS BIGINT) AS r1_2
      FROM (
        SELECT p6, c1, c0, c1 + c0 AS t,
               CAST(coalesce(sum(c1 + c0) OVER (ORDER BY p6
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cb
        FROM (SELECT p6_perm AS p6, CAST(sum(y) AS BIGINT) AS c1,
                     CAST(count(*) - sum(y) AS BIGINT) AS c0
              FROM partner GROUP BY p6_perm)
      )
    )
    SELECT b.n1, b.n0,
           round((b.r1_2 - b.n1 * (b.n1 + 1.0))
                 / (2.0 * b.n1 * b.n0), 6) AS auc_base,
           round((p.r1_2 - p.n1 * (p.n1 + 1.0))
                 / (2.0 * p.n1 * p.n0), 6) AS auc_permuted,
           round((b.r1_2 - b.n1 * (b.n1 + 1.0)) / (2.0 * b.n1 * b.n0)
                 - (p.r1_2 - p.n1 * (p.n1 + 1.0))
                   / (2.0 * p.n1 * p.n0), 6) AS importance_drop
    FROM auc_base b CROSS JOIN auc_perm p
    """,
)
def permutation_importance_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation feature importance by AUC drop: the model's score is
    re-attached to each example from its XOR-1 partner (a
    deterministic derangement-by-pairs — the portable stand-in for a
    random permutation), breaking the feature-label link while
    preserving the score marginal exactly; importance = AUC(original)
    − AUC(permuted) ≈ AUC − 0.5 for a real feature, ≈ 0 for a useless
    one. The model-agnostic importance that doesn't retrain.

    Determinism: both AUCs are the exact midrank Mann-Whitney
    construction (`roc_auc_exact`) over ppm-integer scores; the
    permutation is an exact integer pairing.

    Scale: the pairing is a key equi-join; each AUC is one value-
    grouped histogram + bounded cumulative window — two passes, no
    per-row ranks.
    """
    base = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        (F.col("label") % 2).cast("bigint").alias("y"),
        F.round(pseudo_prob(0) * 1000000).cast("bigint").alias("p6"),
    )
    pb = base.select(
        F.col("vec_id").alias("pid"), F.col("p6").alias("p6_perm")
    )
    partner = base.join(
        pb, F.expr("CAST(vec_id ^ 1 AS BIGINT)") == F.col("pid")
    ).select("y", "p6_perm")

    def auc_of(df: DataFrame, col: str) -> DataFrame:
        g = df.groupBy(F.col(col).alias("p6")).agg(
            F.sum("y").alias("c1"),
            (F.count(F.lit(1)) - F.sum("y")).alias("c0"),
        )
        wc = (
            Window.partitionBy()
            .orderBy("p6")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        c = g.withColumn("t", F.col("c1") + F.col("c0")).withColumn(
            "cb",
            F.coalesce(
                F.sum(F.col("c1") + F.col("c0")).over(wc), F.lit(0)
            ),
        )
        return c.agg(
            F.sum("c1").cast("bigint").alias("n1"),
            F.sum("c0").cast("bigint").alias("n0"),
            F.sum(F.col("c1") * (2 * F.col("cb") + F.col("t") + 1))
            .cast("bigint")
            .alias("r1_2"),
        )

    ab = auc_of(base.select("y", "p6"), "p6")
    ap = auc_of(partner, "p6_perm").select(
        F.col("n1").alias("pn1"),
        F.col("n0").alias("pn0"),
        F.col("r1_2").alias("pr1_2"),
    )
    auc_b = (F.col("r1_2") - F.col("n1") * (F.col("n1") + 1.0)) / (
        2.0 * F.col("n1") * F.col("n0")
    )
    auc_p = (F.col("pr1_2") - F.col("pn1") * (F.col("pn1") + 1.0)) / (
        2.0 * F.col("pn1") * F.col("pn0")
    )
    return ab.crossJoin(F.broadcast(ap)).select(
        "n1",
        "n0",
        F.round(auc_b, 6).alias("auc_base"),
        F.round(auc_p, 6).alias("auc_permuted"),
        F.round(auc_b - auc_p, 6).alias("importance_drop"),
    )


_TEMPS = [0.5, 1.0, 2.0]
_TS_CTX = 5  # top-5 contexts by bigram mass


@query(
    "temperature_entropy_sweep",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, i.i AS pos,
             string_split(trim(text), ' ')[CAST(i.i AS INTEGER)] AS w,
             string_split(trim(text), ' ')[CAST(i.i + 1 AS INTEGER)]
               AS nxt
      FROM documents,
           unnest(range(1, len(string_split(trim(text), ' ')))) AS i(i)
    ), big AS (
      SELECT w AS ctx, nxt, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    ), ctxtot AS (
      SELECT ctx, CAST(sum(c) AS BIGINT) AS n FROM big GROUP BY ctx
    ), top_ctx AS (
      SELECT ctx, n FROM ctxtot ORDER BY n DESC, ctx LIMIT {_TS_CTX}
    ), temps AS (SELECT unnest([{", ".join(str(t) for t in _TEMPS)}]) AS temp),
    scored AS (
      SELECT t.ctx, t.n, tm.temp,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(power(b.c, 1.0 / tm.temp) ORDER BY b.nxt)),
               (a, v) -> a + v) AS z
      FROM top_ctx t
      JOIN big b ON b.ctx = t.ctx
      CROSS JOIN temps tm
      GROUP BY t.ctx, t.n, tm.temp
    ), ent AS (
      SELECT s.ctx, s.n, s.temp, s.z,
             -list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(power(b.c, 1.0 / s.temp) / s.z
                    * ln(power(b.c, 1.0 / s.temp) / s.z)
                    ORDER BY b.nxt)), (a, v) -> a + v) AS h
      FROM scored s JOIN big b ON b.ctx = s.ctx
      GROUP BY s.ctx, s.n, s.temp, s.z
    )
    SELECT ctx, n AS ctx_count, round(temp, 1) AS temperature,
           round(h, 6) AS next_token_entropy,
           round(exp(h), 4) AS perplexity
    FROM ent ORDER BY ctx, temperature
    """,
)
def temperature_entropy_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling-temperature diagnostics from the corpus bigram LM: for
    the five heaviest contexts, the next-token distribution is
    re-scaled as p ∝ c^{{1/T}} for T ∈ {{0.5, 1, 2}} and its entropy /
    perplexity reported — the analytic view of what temperature does
    to generation (T→0 collapses to argmax, T→∞ flattens to uniform),
    computed exactly from counts instead of sampling.

    Determinism: bigram counts are exact integers; Z and the entropy
    fold run in next-token order per (context, T).

    Scale: one map-side-combined bigram groupBy; the sweep touches
    only the top-5 contexts' bounded next-token rows (TakeOrdered
    context selection, broadcast join).
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        F.posexplode(F.split(F.trim(F.col("text")), " ")).alias("pos", "w"),
        F.split(F.trim(F.col("text")), " ").alias("all_toks"),
    ).select(
        "w",
        F.expr("get(all_toks, pos + 1)").alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    big = toks.groupBy(F.col("w").alias("ctx"), "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ctxtot = big.groupBy("ctx").agg(F.sum("c").cast("bigint").alias("n"))
    top_ctx = ctxtot.orderBy(F.desc("n"), "ctx").limit(_TS_CTX)
    temps = spark.createDataFrame(
        [(t,) for t in _TEMPS], "temp double"
    )
    joined = (
        big.join(F.broadcast(top_ctx), "ctx")
        .crossJoin(F.broadcast(temps))
    )
    scored = joined.groupBy("ctx", "n", "temp").agg(
        F.expr(
            """
            aggregate(transform(array_sort(collect_list(struct(nxt,
                power(c, 1.0 / temp) AS vv))), s -> s.vv),
              CAST(0.0 AS DOUBLE), (a, v) -> a + v)
            """
        ).alias("z"),
        F.expr("collect_list(struct(nxt, c))").alias("ents"),
    )
    ent = scored.select(
        "ctx",
        "n",
        "temp",
        (
            -F.expr(
                """
                aggregate(transform(array_sort(ents), s ->
                    power(s.c, 1.0 / temp) / z
                    * ln(power(s.c, 1.0 / temp) / z)),
                  CAST(0.0 AS DOUBLE), (a, v) -> a + v)
                """
            )
        ).alias("h"),
    )
    return ent.select(
        "ctx",
        F.col("n").alias("ctx_count"),
        F.round("temp", 1).alias("temperature"),
        F.round("h", 6).alias("next_token_entropy"),
        F.round(F.exp("h"), 4).alias("perplexity"),
    ).orderBy("ctx", "temperature")
