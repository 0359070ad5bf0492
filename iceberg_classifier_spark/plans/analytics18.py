"""Analytics wave 18: Weibull rank regression, the Wald-Wolfowitz runs
test, Ljung-Box whiteness, and graph modularity.

Weibull median-rank regression is reliability engineering's standard
fit (shape β tells wear-out vs infant-mortality). The runs test and
Ljung-Box are the two canonical "is this series actually random"
checks — sign patterns and autocorrelation mass respectively.
Modularity scores how much better than chance a given partition
explains a graph's edges — the target quantity community detection
(`dedup_clusters`, label propagation) optimizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load


@query(
    "weibull_rank_regression",
    oracle="""
    WITH dur AS (
      SELECT greatest(1, date_diff('day', CAST(o.o_orderdate AS DATE),
                                   CAST(l.l_shipdate AS DATE))) AS t
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE date_diff('day', CAST(o.o_orderdate AS DATE),
                      CAST(l.l_shipdate AS DATE)) < 60
    ), hist AS (
      SELECT t, CAST(count(*) AS BIGINT) AS c FROM dur GROUP BY t
    ), cum AS (
      SELECT t, c,
             CAST(sum(c) OVER (ORDER BY t) AS BIGINT) AS cc,
             CAST(sum(c) OVER () AS BIGINT) AS n
      FROM hist
    ), pts AS (
      SELECT t,
             ln(CAST(t AS DOUBLE)) AS x,
             ln(-ln(1 - (cc - 0.3) / (n + 0.4))) AS y
      FROM cum WHERE cc < n
    ), s AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(x ORDER BY t)), (a, v) -> a + v) AS sx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(y ORDER BY t)), (a, v) -> a + v) AS sy,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(x * x ORDER BY t)), (a, v) -> a + v) AS sxx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(x * y ORDER BY t)), (a, v) -> a + v) AS sxy
      FROM pts
    )
    SELECT k AS n_points,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
             AS shape_beta,
           round(exp(-((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx)
                        * sx) / k)
                     / ((k * sxy - sx * sy) / (k * sxx - sx * sx))), 4)
             AS scale_eta_days,
           CASE WHEN (k * sxy - sx * sy) / (k * sxx - sx * sx) > 1
                THEN 'wear_out' ELSE 'infant_mortality' END AS regime
    FROM s
    """,
)
def weibull_rank_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull fit of the order→ship delay by median-rank regression:
    plot ln(−ln(1−F̂)) against ln t with Benard's median ranks
    F̂ = (i−0.3)/(n+0.4) built from the bounded delay histogram, and
    read shape β (slope) and scale η = exp(−intercept/β) off the OLS
    line — the reliability-engineering standard that also CLASSIFIES
    the process: β > 1 wear-out (delays concentrate late), β < 1
    infant-mortality (most ship immediately, stragglers linger).

    Determinism: the histogram and cumulative ranks are exact
    integers; the ≤59 plotting positions fold in t order; slope/
    intercept are closed-form doubles.

    Scale: one map-side-combined groupBy(delay-day); the regression
    runs on the bounded histogram — never per-row ranks.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    raw = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    dur = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(raw < 60)
        .select(F.greatest(F.lit(1), raw).alias("t"))
    )
    hist = dur.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    wt = Window.orderBy("t")
    cum = hist.select(
        "t",
        F.sum("c").over(wt).alias("cc"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    pts = cum.filter(F.col("cc") < F.col("n")).select(
        "t",
        F.log(F.col("t").cast("double")).alias("x"),
        F.log(
            -F.log(1 - (F.col("cc") - 0.3) / (F.col("n") + 0.4))
        ).alias("y"),
    )

    def fold(expr: str) -> F.Column:
        return F.expr(
            f"""
            aggregate(transform(array_sort(collect_list(struct(t,
                ({expr}) AS vv))), s -> s.vv), CAST(0.0 AS DOUBLE),
              (a, v) -> a + v)
            """
        )

    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        fold("x").alias("sx"),
        fold("y").alias("sy"),
        fold("x * x").alias("sxx"),
        fold("x * y").alias("sxy"),
    )
    beta = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - beta * F.col("sx")) / F.col("k")
    return s.select(
        F.col("k").alias("n_points"),
        F.round(beta, 6).alias("shape_beta"),
        F.round(F.exp(-intercept / beta), 4).alias("scale_eta_days"),
        F.when(beta > 1, "wear_out")
        .otherwise("infant_mortality")
        .alias("regime"),
    )


@query(
    "runs_test_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ), med AS (
      SELECT CAST(min(x) AS BIGINT) AS m FROM (
        SELECT x, row_number() OVER (ORDER BY x, day) AS r,
               count(*) OVER () AS n
        FROM daily
      ) WHERE 2 * r >= n + 1
    ), signs AS (
      SELECT day, CASE WHEN x > m THEN 1 ELSE 0 END AS s
      FROM daily CROSS JOIN med WHERE x <> m
    ), runs AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(s) AS BIGINT) AS n_plus,
             CAST(1 + sum(CASE WHEN s <> prev THEN 1 ELSE 0 END)
               AS BIGINT) AS r
      FROM (
        SELECT s, lag(s) OVER (ORDER BY day) AS prev FROM signs
      ) WHERE prev IS NOT NULL OR 1 = 1
    )
    SELECT n AS n_days, n_plus, n - n_plus AS n_minus, r AS n_runs,
           round(1.0 + 2.0 * n_plus * (n - n_plus) / n, 4)
             AS expected_runs,
           round(sqrt(2.0 * n_plus * (n - n_plus)
                      * (2.0 * n_plus * (n - n_plus) - n)
                      / (CAST(n AS DOUBLE) * n * (n - 1))), 4)
             AS sd_runs,
           round((r - (1.0 + 2.0 * n_plus * (n - n_plus) / n))
                 / sqrt(2.0 * n_plus * (n - n_plus)
                        * (2.0 * n_plus * (n - n_plus) - n)
                        / (CAST(n AS DOUBLE) * n * (n - 1))), 6)
             AS z_score
    FROM runs
    """,
)
def runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily event-count series: code
    each day above/below the series median (median days dropped, the
    standard convention), count sign runs R, and compare against
    E[R] = 1 + 2n₊n₋/n with the exact runs-test variance — too FEW
    runs means positive autocorrelation (trends/regimes), too many
    means oscillation. The non-parametric companion to
    `ljung_box_test` (which weighs autocorrelation magnitude).

    Determinism: the median comes from an exact rank over the bounded
    day frame; runs are integer counts from an ordered lag; E/V/z are
    closed-form doubles.

    Scale: per-day aggregate map-side; the test runs on the ≤366-row
    day dimension.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    ranked = daily.select(
        "x",
        "day",
        F.row_number().over(Window.orderBy("x", "day")).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    med = ranked.filter(2 * F.col("r") >= F.col("n") + 1).agg(
        F.min("x").cast("bigint").alias("m")
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("x") != F.col("m"))
        .select("day", (F.col("x") > F.col("m")).cast("bigint").alias("s"))
    )
    lagged = signs.select(
        "s", F.lag("s").over(Window.orderBy("day")).alias("prev")
    )
    runs = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("s").cast("bigint").alias("n_plus"),
        (
            1
            + F.sum(
                F.when(F.col("s") != F.col("prev"), 1).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("r"),
    )
    npl = F.col("n_plus")
    nmi = F.col("n") - F.col("n_plus")
    er = 1.0 + 2.0 * npl * nmi / F.col("n")
    vr = (
        2.0
        * npl
        * nmi
        * (2.0 * npl * nmi - F.col("n"))
        / (F.col("n").cast("double") * F.col("n") * (F.col("n") - 1))
    )
    return runs.select(
        F.col("n").alias("n_days"),
        "n_plus",
        nmi.alias("n_minus"),
        F.col("r").alias("n_runs"),
        F.round(er, 4).alias("expected_runs"),
        F.round(F.sqrt(vr), 4).alias("sd_runs"),
        F.round((F.col("r") - er) / F.sqrt(vr), 6).alias("z_score"),
    )


_LB_LAGS = 7


@query(
    "ljung_box_test",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ), seq AS (
      SELECT list(x ORDER BY day) AS xs, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s1
      FROM daily
    ), dev AS (
      SELECT n,
             list_transform(xs, v -> CAST(v AS DOUBLE) - s1 * 1.0 / n)
               AS d
      FROM seq
    ), denom AS (
      SELECT n, d,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(d, v -> v * v)), (a, v) -> a + v) AS c0
      FROM dev
    ), lags AS (
      SELECT n, g.lag_k,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, CAST(n - g.lag_k + 1 AS INTEGER)),
                 i -> d[CAST(i AS INTEGER)]
                      * d[CAST(i + g.lag_k AS INTEGER)])),
               (a, v) -> a + v) / c0 AS rk
      FROM denom, (SELECT unnest(range(1, {_LB_LAGS + 1})) AS lag_k) g
    )
    SELECT CAST(max(n) AS BIGINT) AS n_days,
           CAST({_LB_LAGS} AS BIGINT) AS n_lags,
           round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(rk * rk / (n - lag_k) ORDER BY lag_k)),
             (a, v) -> a + v) * max(n) * (max(n) + 2.0), 6) AS lb_q,
           CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
                  list(rk * rk / (n - lag_k) ORDER BY lag_k)),
                  (a, v) -> a + v) * max(n) * (max(n) + 2.0)
                > 14.067140 THEN 1 ELSE 0 END AS reject_05
    FROM lags
    """,
)
def ljung_box_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box whiteness test on the daily event-count series:
    Q = n(n+2)·Σ_{{k≤7}} r̂_k²/(n−k) over the first 7 autocorrelations,
    against χ²₇ at 95% (14.0671) — the portmanteau test that asks "is
    there ANY autocorrelation structure left", the standard residual
    diagnostic after fitting a forecaster (`holt_winters_daily`,
    `kalman_filter_1d`). Complements `acf_daily_counts` (the
    individual r̂_k) and `runs_test_daily` (sign patterns).

    Determinism: deviations come from exact integer (Σx, n); each
    lag's autocovariance folds positions in index order; the 7-term Q
    folds in lag order.

    Scale: the fact stream collapses to per-day counts map-side; all
    autocorrelation arithmetic runs on the bounded day array.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    seq = daily.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, x))),"
            " s -> s.x)"
        ).alias("xs"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s1"),
    )
    dev = seq.select(
        "n",
        F.expr(
            "transform(xs, v -> CAST(v AS DOUBLE) - s1 * 1.0 / n)"
        ).alias("d"),
    )
    denom = dev.select(
        "n",
        "d",
        F.expr(
            """
            aggregate(transform(d, v -> v * v), CAST(0.0 AS DOUBLE),
              (a, v) -> a + v)
            """
        ).alias("c0"),
    )
    lags = denom.select(
        "n",
        "c0",
        F.explode(F.sequence(F.lit(1), F.lit(_LB_LAGS))).alias("lag_k"),
        "d",
    ).select(
        "n",
        "lag_k",
        (
            F.expr(
                """
                aggregate(transform(sequence(0, CAST(size(d) - lag_k - 1
                    AS INT)), i -> element_at(d, i + 1)
                      * element_at(d, CAST(i + lag_k + 1 AS INT))),
                  CAST(0.0 AS DOUBLE), (a, v) -> a + v)
                """
            )
            / F.col("c0")
        ).alias("rk"),
    )
    q = (
        F.expr(
            """
            aggregate(transform(array_sort(collect_list(struct(lag_k,
                rk * rk / (n - lag_k) AS vv))), s -> s.vv),
              CAST(0.0 AS DOUBLE), (a, v) -> a + v)
            """
        )
        * F.max("n")
        * (F.max("n") + 2.0)
    )
    return lags.agg(
        F.max("n").cast("bigint").alias("n_days"),
        F.lit(_LB_LAGS).cast("bigint").alias("n_lags"),
        F.round(q, 6).alias("lb_q"),
        F.when(q > 14.067140, 1).otherwise(0).alias("reject_05"),
    )


@query(
    "graph_modularity_score",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT least(a.l_suppkey, b.l_suppkey) AS u,
             greatest(a.l_suppkey, b.l_suppkey) AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ), comm AS (
      SELECT s_suppkey AS node, s_nationkey AS c FROM supplier
    ), deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
      ) GROUP BY node
    ), m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM edges),
    intra AS (
      SELECT cu.c, CAST(count(*) AS BIGINT) AS e_in
      FROM edges e
      JOIN comm cu ON e.u = cu.node
      JOIN comm cv ON e.v = cv.node
      WHERE cu.c = cv.c GROUP BY cu.c
    ), degsum AS (
      SELECT c.c, CAST(sum(d.d) AS BIGINT) AS dtot
      FROM deg d JOIN comm c ON d.node = c.node GROUP BY c.c
    ), per_comm AS (
      SELECT ds.c, coalesce(i.e_in, 0) AS e_in, ds.dtot, m.m,
             coalesce(i.e_in, 0) * 1.0 / m.m
             - (ds.dtot * 1.0 / (2 * m.m))
               * (ds.dtot * 1.0 / (2 * m.m)) AS q_c
      FROM degsum ds LEFT JOIN intra i ON ds.c = i.c CROSS JOIN m
    )
    SELECT CAST(count(*) AS BIGINT) AS n_communities,
           CAST(max(m) AS BIGINT) AS n_edges,
           round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(q_c ORDER BY c)), (a, v) -> a + v), 6) AS modularity_q
    FROM per_comm
    """,
)
def graph_modularity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the supplier co-order graph partitioned by
    NATION: Q = Σ_c [e_in(c)/m − (deg(c)/2m)²] — how much more intra-
    community edge mass the partition captures than a degree-matched
    random graph would (Q≈0: nation explains nothing about who
    co-supplies orders; Q→1: nations are silos). The objective that
    community detection maximizes, here scoring a GIVEN partition —
    the evaluation side of the engine's `dedup_clusters` / label-
    propagation family.

    Determinism: edge, degree, and intra counts are exact integers
    (distinct co-order pairs, u < v); per-community terms fold in
    community order.

    Scale: the pair join is keyed on l_orderkey (bounded fan-out per
    order — never all-pairs over suppliers); degrees and intra counts
    are map-side-combined aggregates; the score is a ≤25-row fold.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("u"),
            F.col("b.l_suppkey").alias("v"),
        )
        .distinct()
    )
    comm = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("node"), F.col("s_nationkey").alias("c")
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    m = edges.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    cu = comm.select(F.col("node").alias("u"), F.col("c").alias("cu"))
    cv = comm.select(F.col("node").alias("v"), F.col("c").alias("cv"))
    intra = (
        edges.join(F.broadcast(cu), "u")
        .join(F.broadcast(cv), "v")
        .filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("c"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_in"))
    )
    degsum = (
        deg.join(F.broadcast(comm), "node")
        .groupBy("c")
        .agg(F.sum("d").cast("bigint").alias("dtot"))
    )
    per_comm = (
        degsum.join(intra, "c", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "c",
            (
                F.coalesce(F.col("e_in"), F.lit(0)) * 1.0 / F.col("m")
                - (F.col("dtot") * 1.0 / (2 * F.col("m")))
                * (F.col("dtot") * 1.0 / (2 * F.col("m")))
            ).alias("q_c"),
            "m",
        )
    )
    return per_comm.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_communities"),
        F.max("m").cast("bigint").alias("n_edges"),
        F.round(
            F.expr(
                """
                aggregate(transform(array_sort(collect_list(struct(c,
                    q_c))), s -> s.q_c), CAST(0.0 AS DOUBLE),
                  (a, v) -> a + v)
                """
            ),
            6,
        ).alias("modularity_q"),
    )
