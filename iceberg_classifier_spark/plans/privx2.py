"""Privacy/decision wave 72: t-closeness and optimal stopping.

- `t_closeness_audit` — t-closeness of the sensitive order status
  within (priority, order-year) quasi-identifier groups: the
  ordered-attribute Earth-Mover's Distance between each group's
  status distribution and the global one (sum of |cumulative share
  gaps| / (m-1)), with the census of groups breaching t = 0.2 —
  completing the anonymity trilogy after `k_anonymity_audit`
  (group size) and `l_diversity_audit` (value diversity): a group
  can be k-anonymous AND l-diverse yet leak through a skewed
  distribution, which only t-closeness catches.
- `secretary_problem_replay` — the 1/e optimal-stopping rule
  replayed over each year of daily revenues: observe the first 37%
  of days, then take the first day beating that sample maximum
  (last day as fallback); per-year outcome and the fleet success
  rate against the theoretical ~0.368.

Determinism: group counts and cumulative shares are exact int64
ratios; the stopping rule is exact window algebra with day
tie-breaks.

Scale: both reduce the fact table in ONE pass (QI x status cells /
year-day frames); t-closeness is algebra on the bounded cell frame;
the stopping rule is per-year windows over bounded partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_TC_T = 0.2


@query(
    "t_closeness_audit",
    oracle=f"""
    WITH base AS (
      SELECT o_orderpriority AS qi1,
             CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS qi2,
             o_orderstatus AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2, 3
    ), statuses AS (
      SELECT s, row_number() OVER (ORDER BY s) AS si
      FROM (SELECT DISTINCT s FROM base)
    ), gdist AS (
      SELECT b.s, sum(b.n) * 1.0
               / (SELECT sum(n) FROM base) AS gp
      FROM base b GROUP BY b.s
    ), grid AS (
      SELECT g.qi1, g.qi2, st.s, st.si,
             COALESCE(b.n, 0) AS n
      FROM (SELECT DISTINCT qi1, qi2 FROM base) g
      CROSS JOIN statuses st
      LEFT JOIN base b
        ON b.qi1 = g.qi1 AND b.qi2 = g.qi2 AND b.s = st.s
    ), shares AS (
      SELECT qi1, qi2, s, si,
             n * 1.0 / sum(n) OVER (PARTITION BY qi1, qi2) AS p
      FROM grid
    ), cums AS (
      SELECT sh.qi1, sh.qi2, sh.si,
             sum(sh.p) OVER (PARTITION BY sh.qi1, sh.qi2
               ORDER BY sh.si) AS cp,
             sum(gl.gp) OVER (PARTITION BY sh.qi1, sh.qi2
               ORDER BY sh.si) AS cg
      FROM shares sh JOIN gdist gl ON gl.s = sh.s
    ), emd AS (
      SELECT qi1, qi2,
             sum(abs(cp - cg))
               / ((SELECT count(*) FROM statuses) - 1) AS t
      FROM cums WHERE si < (SELECT count(*) FROM statuses)
      GROUP BY qi1, qi2
    ), worst AS (
      SELECT qi1, qi2, t FROM emd ORDER BY t DESC, qi1, qi2 LIMIT 1
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM emd) AS n_groups,
           round(w.t, 6) AS max_t,
           w.qi1 AS worst_priority,
           w.qi2 AS worst_year,
           (SELECT CAST(sum(CASE WHEN t > {_TC_T} THEN 1 ELSE 0 END)
              AS BIGINT) FROM emd) AS groups_breaching_t,
           {_TC_T} AS t_threshold
    FROM worst w
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness (Li-Li-Venkatasubramanian) of the sensitive order
    status within (priority, order-year) QI groups: for the ordered
    status attribute the Earth-Mover's Distance reduces to the sum
    of |cumulative share gaps| between group and global
    distributions, normalized by m-1. Reports the worst group and
    the census breaching t = {_TC_T}. Completes the anonymity
    trilogy — `k_anonymity_audit` bounds re-identification,
    `l_diversity_audit` bounds bare attribute disclosure, and
    t-closeness bounds the DISTRIBUTIONAL skew the other two miss.

    Determinism: all counts are exact int64; shares, cumulative
    gaps, and t are closed forms with lexicographic worst-group
    tie-breaks.

    Scale: ONE fact pass to the bounded (QI, status) cell frame;
    EMD is a 3-step cumulative window per group on that frame.
    """
    o = load(spark, sf_dir, "orders")
    base = o.groupBy(
        F.col("o_orderpriority").alias("qi1"),
        F.year(F.col("o_orderdate").cast("date")).cast("bigint").alias("qi2"),
        F.col("o_orderstatus").alias("s"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n")).cache()
    statuses = (
        base.select("s")
        .distinct()
        .select(
            "s", F.row_number().over(Window.orderBy("s")).alias("si")
        )
        .cache()
    )
    m = statuses.agg(F.count(F.lit(1)).alias("m"))
    tot = base.agg(F.sum("n").alias("tn"))
    glob = (
        base.groupBy("s")
        .agg(F.sum("n").alias("gn"))
        .crossJoin(F.broadcast(tot))
        .select("s", (F.col("gn") * 1.0 / F.col("tn")).alias("gp"))
    )
    groups = base.select("qi1", "qi2").distinct()
    grid = (
        groups.crossJoin(F.broadcast(statuses))
        .join(base, ["qi1", "qi2", "s"], "left")
        .select(
            "qi1",
            "qi2",
            "s",
            "si",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )
    wg = Window.partitionBy("qi1", "qi2")
    shares = grid.select(
        "qi1",
        "qi2",
        "s",
        "si",
        (F.col("n") * 1.0 / F.sum("n").over(wg)).alias("p"),
    )
    wcum = Window.partitionBy("qi1", "qi2").orderBy("si")
    cums = shares.join(F.broadcast(glob), "s").select(
        "qi1",
        "qi2",
        "si",
        F.sum("p").over(wcum).alias("cp"),
        F.sum("gp").over(wcum).alias("cg"),
    )
    emd = (
        cums.crossJoin(F.broadcast(m))
        .where(F.col("si") < F.col("m"))
        .groupBy("qi1", "qi2")
        .agg(
            (
                F.sum(F.abs(F.col("cp") - F.col("cg")))
                / (F.max("m") - 1)
            ).alias("t")
        )
        .cache()
    )
    worst = emd.orderBy(F.desc("t"), "qi1", "qi2").limit(1)
    census = emd.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("t") > _TC_T, 1).otherwise(0))
        .cast("bigint")
        .alias("groups_breaching_t"),
    )
    return worst.crossJoin(F.broadcast(census)).select(
        "n_groups",
        F.round("t", 6).alias("max_t"),
        F.col("qi1").alias("worst_priority"),
        F.col("qi2").alias("worst_year"),
        "groups_breaching_t",
        F.lit(_TC_T).alias("t_threshold"),
    )


@query(
    "secretary_problem_replay",
    oracle="""
    WITH daily AS (
      SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
             CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1, 2
    ), ranked AS (
      SELECT yr, d, rev,
             row_number() OVER (PARTITION BY yr ORDER BY d) AS rn,
             count(*) OVER (PARTITION BY yr) AS n,
             max(rev) OVER (PARTITION BY yr) AS best
      FROM daily
    ), thresholds AS (
      SELECT yr, max(rev) AS thr,
             max(CAST(floor(0.37 * n) AS BIGINT)) AS cutoff
      FROM ranked WHERE rn <= CAST(floor(0.37 * n) AS BIGINT)
      GROUP BY yr
    ), picks AS (
      SELECT r.yr,
             COALESCE(min(CASE WHEN r.rn > t.cutoff
                      AND r.rev > t.thr THEN r.rn END),
                      max(r.n)) AS pick_rn
      FROM ranked r JOIN thresholds t ON t.yr = r.yr
      GROUP BY r.yr
    ), outcome AS (
      SELECT p.yr, t.cutoff, p.pick_rn, r.n,
             CASE WHEN r2.rev = r.best THEN 1 ELSE 0 END AS success
      FROM picks p
      JOIN thresholds t ON t.yr = p.yr
      JOIN (SELECT DISTINCT yr, n, best FROM ranked) r
        ON r.yr = p.yr
      JOIN ranked r2 ON r2.yr = p.yr AND r2.rn = p.pick_rn
    )
    SELECT yr AS year, CAST(n AS BIGINT) AS n_days,
           CAST(cutoff AS BIGINT) AS observe_cutoff,
           CAST(pick_rn AS BIGINT) AS picked_day_rank,
           CAST(success AS BIGINT) AS picked_the_best,
           round(sum(success) OVER () * 1.0
                 / count(*) OVER (), 6) AS fleet_success_rate,
           round(0.367879, 6) AS theoretical_rate
    FROM outcome ORDER BY year
    """,
)
def secretary_problem_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The secretary problem's 1/e stopping rule replayed over each
    order year (candidates = daily revenues arriving in date order):
    observe the first 37% of days, then accept the first day
    exceeding the observed maximum, falling back to the last day —
    per-year outcomes plus the fleet success rate against the
    theoretical 1/e ~ 0.368 probability of picking the year's true
    maximum. The optimal-stopping complement of
    `sprt_sequential_test` (sequential evidence) and
    `ucb_bandit_replay` (explore-exploit): here NO recall of passed
    candidates is allowed.

    Determinism: daily revenues are exact int64; the rule is exact
    window algebra (rank cutoffs, strict comparisons, day order).

    Scale: ONE fact pass to the year-day frames; every window
    partitions by year over <=366 rows — fully parallel across
    years (episodes), the standard policy-replay layout.
    """
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.year(F.col("o_orderdate").cast("date")).cast("bigint").alias("yr"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice")).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    wy = Window.partitionBy("yr")
    ranked = daily.select(
        "yr",
        "rev",
        F.row_number().over(wy.orderBy("d")).alias("rn"),
        F.count(F.lit(1)).over(
            wy.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
        F.max("rev").over(
            wy.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("best"),
    ).cache()
    thresholds = (
        ranked.where(
            F.col("rn") <= F.floor(0.37 * F.col("n")).cast("bigint")
        )
        .groupBy("yr")
        .agg(
            F.max("rev").alias("thr"),
            F.max(F.floor(0.37 * F.col("n")).cast("bigint")).alias(
                "cutoff"
            ),
        )
    )
    picks = (
        ranked.join(F.broadcast(thresholds), "yr")
        .groupBy("yr")
        .agg(
            F.coalesce(
                F.min(
                    F.when(
                        (F.col("rn") > F.col("cutoff"))
                        & (F.col("rev") > F.col("thr")),
                        F.col("rn"),
                    )
                ),
                F.max("n"),
            ).alias("pick_rn")
        )
    )
    meta = ranked.select("yr", "n", "best").distinct()
    picked_rev = ranked.select(
        "yr", F.col("rn").alias("pick_rn"), F.col("rev").alias("pick_rev")
    )
    outcome = (
        picks.join(F.broadcast(thresholds), "yr")
        .join(F.broadcast(meta), "yr")
        .join(picked_rev, ["yr", "pick_rn"])
        .select(
            "yr",
            "n",
            "cutoff",
            "pick_rn",
            F.when(F.col("pick_rev") == F.col("best"), 1)
            .otherwise(0)
            .alias("success"),
        )
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return outcome.select(
        F.col("yr").alias("year"),
        F.col("n").cast("bigint").alias("n_days"),
        F.col("cutoff").cast("bigint").alias("observe_cutoff"),
        F.col("pick_rn").cast("bigint").alias("picked_day_rank"),
        F.col("success").cast("bigint").alias("picked_the_best"),
        F.round(
            F.sum("success").over(wall) * 1.0
            / F.count(F.lit(1)).over(wall),
            6,
        ).alias("fleet_success_rate"),
        F.round(F.lit(0.367879), 6).alias("theoretical_rate"),
    ).orderBy("year")
