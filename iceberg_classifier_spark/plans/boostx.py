"""Boosting/privacy/Bayes wave 48: in-engine AdaBoost, l-diversity,
and a gridded Bayesian A/B posterior.

- `adaboost_stumps` — 3 rounds of discrete AdaBoost over decision
  stumps on binned lineitem features, run ENTIRELY on the bounded
  feature-cell frame: round-1 errors are exact integers, later
  rounds recompute cell weights in closed form from the selected
  stumps (no incremental float state), and every argmin quantizes
  errors to 1e-9 before ordering so both engines select identically.
- `l_diversity_audit` — l-diversity of the sensitive order status
  within (priority, order-year) quasi-identifier groups: distinct-l,
  entropy-l, and the violation census that k-anonymity alone misses.
- `bayes_ab_grid` — exact-count Beta posteriors for URGENT-vs-LOW
  order fill rates, P(A>B) by a 400-point grid convolution with
  prefix sums (log-pdf stabilized by the grid max), plus posterior
  means.

Determinism: cell counts are exact int64; stump selection quantizes
to 1e-9 with lexicographic tie-breaks; alphas/weights are identical
closed-form doubles both engines; grid weights normalize against
in-grid maxima; outputs rounded 6dp.

Scale: AdaBoost touches the fact table ONCE (map-side combine to
<=550 cells); all 3 rounds join 42 candidate stumps against those
cells. The audit and the A/B grid are one conditional-aggregate
pass plus bounded-frame work (QI groups / 400 grid points).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_ROUNDS = 3


def _ada_oracle() -> str:
    """Generate the chained-CTE oracle: the identical round template
    instantiated 3 times (select stump r on weights implied by
    stumps 1..r-1), then the ensemble training error. Every CTE is
    MATERIALIZED and prior stumps enter each round via a 1-row
    cross join (never per-row scalar subqueries) — without this
    DuckDB re-executes the whole upstream chain per reference.
    """
    head = """
    WITH cells AS MATERIALIZED (
      SELECT least(4, CAST(floor((l_quantity - 1) / 10.0) AS INT))
               AS qb,
             CAST(round(l_discount * 100) AS INT) AS db,
             least(4, CAST(floor(l_extendedprice / 20000.0) AS INT))
               AS pb,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END AS y,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1, 2, 3, 4
    ), cand AS MATERIALIZED (
      SELECT f, t, pol FROM (
        SELECT 'q' AS f, qb AS t FROM cells GROUP BY 2
        UNION ALL SELECT 'd', db FROM cells GROUP BY 2
        UNION ALL SELECT 'p', pb FROM cells GROUP BY 2
      ) CROSS JOIN (SELECT 1 AS pol UNION ALL SELECT -1) s
    )"""

    def h_of(j: int) -> str:
        # stump j's vote on cell c, with stump j joined as w{j}
        return (
            f"(CASE WHEN (CASE WHEN w{j}.f = 'q' THEN c.qb"
            f" WHEN w{j}.f = 'd' THEN c.db ELSE c.pb END) <= w{j}.t"
            f" THEN w{j}.pol ELSE -w{j}.pol END)"
        )

    rounds = []
    for r in range(1, _ROUNDS + 1):
        joins = "".join(f" CROSS JOIN s{j} w{j}" for j in range(1, r))
        if r == 1:
            w = "CAST(c.n AS DOUBLE)"
        else:
            margin = " + ".join(
                f"w{j}.alpha * {h_of(j)}" for j in range(1, r)
            )
            w = f"c.n * exp(-c.y * ({margin}))"
        rounds.append(f"""
    , s{r} AS MATERIALIZED (
      SELECT f, t, pol, werr / wtot AS err,
             0.5 * ln((wtot - werr) / werr) AS alpha
      FROM (
        SELECT k.f, k.t, k.pol,
               sum(CASE WHEN (CASE WHEN (CASE WHEN k.f = 'q' THEN c.qb
                      WHEN k.f = 'd' THEN c.db ELSE c.pb END) <= k.t
                      THEN k.pol ELSE -k.pol END) <> c.y
                   THEN {w} ELSE 0 END) AS werr,
               sum({w}) AS wtot
        FROM cand k CROSS JOIN cells c{joins}
        GROUP BY 1, 2, 3
      )
      ORDER BY CAST(round(werr / wtot * 1000000000) AS BIGINT),
               f, t, pol
      LIMIT 1
    )""")
    ens_joins = "".join(
        f" CROSS JOIN s{j} w{j}" for j in range(1, _ROUNDS + 1)
    )
    ens_margin = " + ".join(
        f"w{j}.alpha * {h_of(j)}" for j in range(1, _ROUNDS + 1)
    )
    tail = f"""
    , ens AS MATERIALIZED (
      SELECT sum(CASE WHEN c.y * ({ens_margin}) <= 0 THEN c.n
                 ELSE 0 END) * 1.0 / sum(c.n) AS train_err
      FROM cells c{ens_joins}
    )
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS round, s1.f AS feature,
             CAST(s1.t AS BIGINT) AS threshold,
             CAST(s1.pol AS BIGINT) AS polarity,
             round(s1.err, 6) AS round_error,
             round(s1.alpha, 6) AS alpha,
             round(ens.train_err, 6) AS ensemble_train_error
      FROM s1 CROSS JOIN ens
      UNION ALL
      SELECT CAST(2 AS BIGINT), s2.f, CAST(s2.t AS BIGINT),
             CAST(s2.pol AS BIGINT), round(s2.err, 6),
             round(s2.alpha, 6), round(ens.train_err, 6)
      FROM s2 CROSS JOIN ens
      UNION ALL
      SELECT CAST(3 AS BIGINT), s3.f, CAST(s3.t AS BIGINT),
             CAST(s3.pol AS BIGINT), round(s3.err, 6),
             round(s3.alpha, 6), round(ens.train_err, 6)
      FROM s3 CROSS JOIN ens
    ) ORDER BY round
    """
    return head + "".join(rounds) + tail


@query("adaboost_stumps", oracle=_ada_oracle())
def adaboost_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete AdaBoost (Freund-Schapire) with depth-1 stumps, run
    entirely in the engine on the bounded feature-cell frame: 3
    rounds over 42 candidate stumps (3 binned lineitem features x
    thresholds x 2 polarities) against the returnflag target. Round
    weights are NEVER carried as incremental float state — each
    round recomputes every cell's weight in closed form
    exp(-y * sum alpha_j h_j(x)) from the already-selected stumps,
    so both engines evaluate identical expressions; stump selection
    quantizes weighted error to 1e-9 and tie-breaks
    lexicographically. Emits each round's stump, error, and alpha,
    plus the ensemble training error. The boosting step up from
    `decision_stump_split` (one stump) and `cart_depth2_tree`
    (one tree).

    Determinism: round-1 errors are exact integer ratios; later
    rounds' log/exp terms are identical closed forms; the 1e-9
    quantized argmin makes selection order-insensitive to float
    summation order across engines.

    Scale: ONE fact scan with map-side combine to <=550 cells
    (5*11*5*2); every round is a 42x550 bounded join — adding fact
    rows changes only the first aggregation, never the boosting
    work.
    """
    li = load(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.least(F.lit(4), F.floor((F.col("l_quantity") - 1) / 10.0))
        .cast("int")
        .alias("qb"),
        F.round(F.col("l_discount") * 100).cast("int").alias("db"),
        F.least(F.lit(4), F.floor(F.col("l_extendedprice") / 20000.0))
        .cast("int")
        .alias("pb"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(-1).alias("y"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    thr = (
        cells.groupBy(F.col("qb").alias("t")).agg(F.lit(1).alias("_"))
        .select(F.lit("q").alias("f"), "t")
        .unionByName(
            cells.groupBy(F.col("db").alias("t"))
            .agg(F.lit(1).alias("_"))
            .select(F.lit("d").alias("f"), "t")
        )
        .unionByName(
            cells.groupBy(F.col("pb").alias("t"))
            .agg(F.lit(1).alias("_"))
            .select(F.lit("p").alias("f"), "t")
        )
    )
    pols = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(-1))).alias("pol")
    )
    cand = thr.crossJoin(pols)

    def x_of(f_col: str) -> F.Column:
        return (
            F.when(F.col(f_col) == "q", F.col("qb"))
            .when(F.col(f_col) == "d", F.col("db"))
            .otherwise(F.col("pb"))
        )

    selected: list[DataFrame] = []
    for r in range(1, _ROUNDS + 1):
        base = cand.crossJoin(cells)
        # cell weight entering this round, closed-form from the
        # stumps already selected (each a broadcast 1-row frame)
        w = F.col("n").cast("double")
        if selected:
            margin = F.lit(0.0)
            for j, s in enumerate(selected, start=1):
                base = base.crossJoin(
                    F.broadcast(
                        s.select(
                            F.col("f").alias(f"sf{j}"),
                            F.col("t").alias(f"st{j}"),
                            F.col("pol").alias(f"sp{j}"),
                            F.col("alpha").alias(f"sa{j}"),
                        )
                    )
                )
                hj = F.when(
                    x_of(f"sf{j}") <= F.col(f"st{j}"), F.col(f"sp{j}")
                ).otherwise(-F.col(f"sp{j}"))
                margin = margin + F.col(f"sa{j}") * hj
            w = F.col("n") * F.exp(-F.col("y") * margin)
        pred = F.when(x_of("f") <= F.col("t"), F.col("pol")).otherwise(
            -F.col("pol")
        )
        err = base.groupBy("f", "t", "pol").agg(
            F.sum(F.when(pred != F.col("y"), w).otherwise(0.0)).alias(
                "werr"
            ),
            F.sum(w).alias("wtot"),
        )
        sel = (
            err.select(
                "f",
                "t",
                "pol",
                (F.col("werr") / F.col("wtot")).alias("err"),
                (
                    0.5
                    * F.log((F.col("wtot") - F.col("werr")) / F.col("werr"))
                ).alias("alpha"),
                F.round(F.col("werr") / F.col("wtot") * 1000000000)
                .cast("bigint")
                .alias("errq"),
            )
            .orderBy("errq", "f", "t", "pol")
            .limit(1)
        )
        selected.append(sel)

    ens = cells
    margin = F.lit(0.0)
    for j, s in enumerate(selected, start=1):
        ens = ens.crossJoin(
            F.broadcast(
                s.select(
                    F.col("f").alias(f"sf{j}"),
                    F.col("t").alias(f"st{j}"),
                    F.col("pol").alias(f"sp{j}"),
                    F.col("alpha").alias(f"sa{j}"),
                )
            )
        )
        hj = F.when(
            x_of(f"sf{j}") <= F.col(f"st{j}"), F.col(f"sp{j}")
        ).otherwise(-F.col(f"sp{j}"))
        margin = margin + F.col(f"sa{j}") * hj
    ens = ens.agg(
        (
            F.sum(F.when(F.col("y") * margin <= 0, F.col("n")).otherwise(0))
            * 1.0
            / F.sum("n")
        ).alias("train_err")
    )

    outs = []
    for r, s in enumerate(selected, start=1):
        outs.append(
            s.crossJoin(F.broadcast(ens)).select(
                F.lit(r).cast("bigint").alias("round"),
                F.col("f").alias("feature"),
                F.col("t").cast("bigint").alias("threshold"),
                F.col("pol").cast("bigint").alias("polarity"),
                F.round("err", 6).alias("round_error"),
                F.round("alpha", 6).alias("alpha"),
                F.round("train_err", 6).alias("ensemble_train_error"),
            )
        )
    return outs[0].unionByName(outs[1]).unionByName(outs[2]).orderBy(
        "round"
    )


@query(
    "l_diversity_audit",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS qi1,
             CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS qi2,
             o_orderstatus AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2, 3
    ), grp AS (
      SELECT qi1, qi2,
             CAST(sum(n) AS BIGINT) AS group_size,
             CAST(count(*) AS BIGINT) AS distinct_l
      FROM base GROUP BY 1, 2
    ), ent AS (
      SELECT qi1, qi2,
             exp(sum(-(n * 1.0 / tot) * ln(n * 1.0 / tot)))
               AS entropy_l
      FROM (SELECT qi1, qi2, n,
                   sum(n) OVER (PARTITION BY qi1, qi2) AS tot
            FROM base)
      GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(g.distinct_l) AS BIGINT) AS min_distinct_l,
           round(min(e.entropy_l), 6) AS min_entropy_l,
           CAST(sum(CASE WHEN g.distinct_l < 2 THEN 1 ELSE 0 END)
             AS BIGINT) AS groups_below_l2,
           CAST(sum(CASE WHEN e.entropy_l < 2.0 THEN 1 ELSE 0 END)
             AS BIGINT) AS groups_below_entropy_l2,
           CAST(min(g.group_size) AS BIGINT) AS min_group_size
    FROM grp g JOIN ent e ON e.qi1 = g.qi1 AND e.qi2 = g.qi2
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit of the sensitive order status within
    (priority, order-year) quasi-identifier groups: per group the
    distinct-l (how many sensitive values appear) and entropy-l
    (exp of the sensitive-value entropy — penalizes skew that
    distinct-l hides), with the census of groups violating l >= 2
    on either definition. The attribute-disclosure complement of
    `k_anonymity_audit` — a group can be k-anonymous yet reveal
    everyone's status if all share one value.

    Determinism: all counts are exact int64; entropy-l is a smooth
    closed form over per-group shares rounded 6dp.

    Scale: ONE fact pass with map-side combine to the bounded
    (QI, sensitive) frame (~35*3 cells); everything downstream is
    per-group arithmetic on that frame.
    """
    o = load(spark, sf_dir, "orders")
    base = o.groupBy(
        F.col("o_orderpriority").alias("qi1"),
        F.year(F.col("o_orderdate").cast("date")).cast("bigint").alias("qi2"),
        F.col("o_orderstatus").alias("s"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wg = Window.partitionBy("qi1", "qi2")
    per = base.select(
        "qi1",
        "qi2",
        "n",
        F.sum("n").over(wg).alias("tot"),
    )
    grp = per.groupBy("qi1", "qi2").agg(
        F.sum("n").cast("bigint").alias("group_size"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_l"),
        F.exp(
            F.sum(
                -(F.col("n") * 1.0 / F.col("tot"))
                * F.log(F.col("n") * 1.0 / F.col("tot"))
            )
        ).alias("entropy_l"),
    )
    return grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("distinct_l").cast("bigint").alias("min_distinct_l"),
        F.round(F.min("entropy_l"), 6).alias("min_entropy_l"),
        F.sum(F.when(F.col("distinct_l") < 2, 1).otherwise(0))
        .cast("bigint")
        .alias("groups_below_l2"),
        F.sum(F.when(F.col("entropy_l") < 2.0, 1).otherwise(0))
        .cast("bigint")
        .alias("groups_below_entropy_l2"),
        F.min("group_size").cast("bigint").alias("min_group_size"),
    )


_GRID = 400


@query(
    "bayes_ab_grid",
    oracle=f"""
    WITH counts AS (
      SELECT CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                      AND o_orderstatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) AS sa,
             CAST(sum(CASE WHEN o_orderpriority = '5-LOW'
                      THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN o_orderpriority = '5-LOW'
                      AND o_orderstatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) AS sb
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ), grid AS (
      SELECT (i - 0.5) / {_GRID} AS p
      FROM generate_series(1, {_GRID}) AS t(i)
    ), logpdf AS (
      SELECT p,
             sa * ln(p) + (na - sa) * ln(1 - p) AS la,
             sb * ln(p) + (nb - sb) * ln(1 - p) AS lb
      FROM grid CROSS JOIN counts
    ), wts AS (
      SELECT p,
             exp(la - max(la) OVER ()) AS ua,
             exp(lb - max(lb) OVER ()) AS ub
      FROM logpdf
    ), nrm0 AS (
      SELECT p,
             ua / sum(ua) OVER () AS wa,
             ub / sum(ub) OVER () AS wb_here
      FROM wts
    ), nrm AS (
      SELECT p, wa, wb_here,
             COALESCE(sum(wb_here) OVER (ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cb_lt
      FROM nrm0
    ), prob AS (
      SELECT sum(wa * (cb_lt + 0.5 * wb_here)) AS p_a_gt_b
      FROM nrm
    )
    SELECT c.na AS n_a, c.sa AS conv_a, c.nb AS n_b, c.sb AS conv_b,
           round((1.0 + c.sa) / (2.0 + c.na), 6) AS post_mean_a,
           round((1.0 + c.sb) / (2.0 + c.nb), 6) AS post_mean_b,
           round(p.p_a_gt_b, 6) AS p_a_gt_b,
           CAST(p.p_a_gt_b > 0.95 OR p.p_a_gt_b < 0.05 AS BOOLEAN)
             AS decisive_95
    FROM counts c CROSS JOIN prob p
    """,
)
def bayes_ab_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian A/B comparison of URGENT-vs-LOW order fill rates:
    Beta(1+s, 1+n-s) posteriors from exact conversion counts, and
    P(rate_A > rate_B) by a 400-point grid convolution — normalized
    log-pdf weights (stabilized against the in-grid max) with a
    prefix-sum over B's cdf, the half-cell correction handling the
    shared cell. The decision-theoretic complement of
    `ab_power_analysis` (frequentist design) and
    `sample_ratio_mismatch` (allocation health).

    Determinism: counts are exact int64; the grid, log-pdf,
    normalization, and prefix convolution are identical closed-form
    doubles in both engines, rounded 6dp.

    Scale: ONE filtered fact pass (predicate pushed) to a 4-count
    row; ALL posterior work happens on the fixed 400-row grid —
    data volume never touches the integration cost.
    """
    o = load(spark, sf_dir, "orders")
    counts = o.where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).agg(
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0))
        .cast("bigint")
        .alias("na"),
        F.sum(
            F.when(
                (F.col("o_orderpriority") == "1-URGENT")
                & (F.col("o_orderstatus") == "F"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("sa"),
        F.sum(F.when(F.col("o_orderpriority") == "5-LOW", 1).otherwise(0))
        .cast("bigint")
        .alias("nb"),
        F.sum(
            F.when(
                (F.col("o_orderpriority") == "5-LOW")
                & (F.col("o_orderstatus") == "F"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("sb"),
    )
    grid = spark.range(1, _GRID + 1).select(
        ((F.col("id") - 0.5) / _GRID).alias("p")
    )
    logpdf = grid.crossJoin(F.broadcast(counts)).select(
        "p",
        "na",
        "sa",
        "nb",
        "sb",
        (
            F.col("sa") * F.log("p")
            + (F.col("na") - F.col("sa")) * F.log(1 - F.col("p"))
        ).alias("la"),
        (
            F.col("sb") * F.log("p")
            + (F.col("nb") - F.col("sb")) * F.log(1 - F.col("p"))
        ).alias("lb"),
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wts = logpdf.select(
        "p",
        F.exp(F.col("la") - F.max("la").over(wall)).alias("ua"),
        F.exp(F.col("lb") - F.max("lb").over(wall)).alias("ub"),
    )
    wpre = Window.orderBy("p").rowsBetween(Window.unboundedPreceding, -1)
    nrm = wts.select(
        "p",
        (F.col("ua") / F.sum("ua").over(wall)).alias("wa"),
        (F.col("ub") / F.sum("ub").over(wall)).alias("wb_here"),
    ).select(
        "p",
        "wa",
        "wb_here",
        F.coalesce(F.sum("wb_here").over(wpre), F.lit(0.0)).alias("cb_lt"),
    )
    prob = nrm.agg(
        F.sum(
            F.col("wa") * (F.col("cb_lt") + 0.5 * F.col("wb_here"))
        ).alias("p_a_gt_b")
    )
    return counts.crossJoin(F.broadcast(prob)).select(
        F.col("na").alias("n_a"),
        F.col("sa").alias("conv_a"),
        F.col("nb").alias("n_b"),
        F.col("sb").alias("conv_b"),
        F.round((1.0 + F.col("sa")) / (2.0 + F.col("na")), 6).alias(
            "post_mean_a"
        ),
        F.round((1.0 + F.col("sb")) / (2.0 + F.col("nb")), 6).alias(
            "post_mean_b"
        ),
        F.round("p_a_gt_b", 6).alias("p_a_gt_b"),
        ((F.col("p_a_gt_b") > 0.95) | (F.col("p_a_gt_b") < 0.05)).alias(
            "decisive_95"
        ),
    )
