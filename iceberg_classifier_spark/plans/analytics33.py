"""Analytics wave 33: exact categorical inference and regression
diagnostics.

`fisher_exact_test` brings the exact 2x2 hypergeometric test (the
small-sample replacement for chi-square) over a bounded deterministic
sample; `cochran_armitage_trend` tests for a monotone dose-response
across the ordered priority classes; `press_loocv_regression` computes
the leave-one-out PRESS statistic and leverage diagnostics for the
price~quantity regression entirely from per-x sufficient statistics;
`ar2_yule_walker_forecast` fits an AR(2) by the Yule-Walker moment
equations and folds out a 7-day forecast.

Reference surface: the reference's train/validation diagnostics
(main.py:171-179 monitors validation loss; sub_stacking.py compares
model families) motivate the regression-diagnostic and trend-test
family: the same "is this effect real, which points dominate the fit"
questions asked of model outputs, answered here in-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_FISHER_N = 400  # bounded deterministic sample size (exact test regime)

_FISHER_BASE = f"""
    sample AS (
      SELECT o_orderkey,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS exposed,
             CASE WHEN o_totalprice >= 150000 THEN 1 ELSE 0 END AS hit
      FROM orders
      ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
      LIMIT {_FISHER_N}
    ),
    tab AS (
      SELECT CAST(sum(exposed * hit) AS BIGINT) AS a,
             CAST(sum(exposed * (1 - hit)) AS BIGINT) AS b,
             CAST(sum((1 - exposed) * hit) AS BIGINT) AS c,
             CAST(sum((1 - exposed) * (1 - hit)) AS BIGINT) AS d
      FROM sample
    ),
    marg AS (
      SELECT a, b, c, d, a + b AS r1, c + d AS r2, a + c AS c1,
             a + b + c + d AS n
      FROM tab
    ),
    lf AS (
      SELECT k,
             sum(ln(greatest(k, 1))) OVER
               (ORDER BY k ROWS UNBOUNDED PRECEDING) AS v
      FROM (SELECT unnest(range(0, (SELECT n FROM marg) + 1)) AS k)
    ),
    lfarr AS (SELECT list(v ORDER BY k) AS arr FROM lf),
    support AS (
      SELECT m.*, f.arr,
             greatest(0, m.c1 - m.r2) AS klo,
             least(m.r1, m.c1) AS khi
      FROM marg m CROSS JOIN lfarr f
    ),
    pmfs AS (
      SELECT s.*, u.k,
             exp(s.arr[CAST(s.r1 + 1 AS INTEGER)]
                 - s.arr[CAST(u.k + 1 AS INTEGER)]
                 - s.arr[CAST(s.r1 - u.k + 1 AS INTEGER)]
                 + s.arr[CAST(s.r2 + 1 AS INTEGER)]
                 - s.arr[CAST(s.c1 - u.k + 1 AS INTEGER)]
                 - s.arr[CAST(s.r2 - s.c1 + u.k + 1 AS INTEGER)]
                 - s.arr[CAST(s.n + 1 AS INTEGER)]
                 + s.arr[CAST(s.c1 + 1 AS INTEGER)]
                 + s.arr[CAST(s.n - s.c1 + 1 AS INTEGER)]) AS pmf
      FROM support s,
           unnest(range(s.klo, s.khi + 1)) AS u(k)
    ),
    obs AS (SELECT pmf AS pmf_obs FROM pmfs WHERE k = a)
"""


@query(
    "fisher_exact_test",
    oracle=f"""
    WITH {_FISHER_BASE}
    SELECT p.a, p.b, p.c, p.d,
           round(CASE WHEN p.b * p.c = 0 THEN NULL
                 ELSE p.a * 1.0 * p.d / (p.b * 1.0 * p.c) END, 6)
             AS odds_ratio,
           round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(CASE WHEN p.pmf <= o.pmf_obs * (1 + 1e-7)
                  THEN p.pmf ELSE 0.0 END ORDER BY p.k)),
             (x, y) -> x + y), 6) AS p_two_sided,
           round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(CASE WHEN p.k <= p.a THEN p.pmf ELSE 0.0 END
                  ORDER BY p.k)), (x, y) -> x + y), 6) AS p_left,
           round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(CASE WHEN p.k >= p.a THEN p.pmf ELSE 0.0 END
                  ORDER BY p.k)), (x, y) -> x + y), 6) AS p_right
    FROM pmfs p CROSS JOIN obs o
    GROUP BY p.a, p.b, p.c, p.d, o.pmf_obs
    """,
)
def fisher_exact_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's exact test on the 2x2 table (urgent-priority x
    high-value) over a deterministic 400-order sample: the
    hypergeometric null distribution is enumerated exactly via a
    log-factorial prefix-sum table, and the two-sided p-value sums
    every table at-most-as-probable as the observed one (the
    conventional Fisher two-sided rule, with the standard (1+1e-7)
    tie tolerance). The small-sample test chi-square approximates.

    Determinism: the sample is a hash-ordered TakeOrdered LIMIT; the
    lnfact table is an ascending windowed cumsum (identical fold
    order both engines); p-values are k-ordered folds.

    Scale: the exact test is *defined* on bounded samples — the
    TakeOrdered cap keeps N fixed at any corpus size; everything
    downstream is dimension-sized (<=401-element array, <=401
    support terms).
    """
    o = load(spark, sf_dir, "orders")
    sample = (
        o.select(
            "o_orderkey",
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            )
            .otherwise(0)
            .alias("exposed"),
            F.when(F.col("o_totalprice") >= 150000, 1)
            .otherwise(0)
            .alias("hit"),
        )
        .orderBy(F.md5(F.col("o_orderkey").cast("string")), "o_orderkey")
        .limit(_FISHER_N)
    )
    marg = sample.agg(
        F.sum(F.col("exposed") * F.col("hit")).cast("bigint").alias("a"),
        F.sum(F.col("exposed") * (1 - F.col("hit")))
        .cast("bigint")
        .alias("b"),
        F.sum((1 - F.col("exposed")) * F.col("hit"))
        .cast("bigint")
        .alias("c"),
        F.sum((1 - F.col("exposed")) * (1 - F.col("hit")))
        .cast("bigint")
        .alias("d"),
    ).select(
        "a",
        "b",
        "c",
        "d",
        (F.col("a") + F.col("b")).alias("r1"),
        (F.col("c") + F.col("d")).alias("r2"),
        (F.col("a") + F.col("c")).alias("c1"),
        (F.col("a") + F.col("b") + F.col("c") + F.col("d")).alias("n"),
    )
    # log-factorial prefix table 0..N as an ordered windowed cumsum,
    # collected into one bounded array for O(1) indexed lookups
    lf = (
        marg.select(F.explode(F.sequence(F.lit(0), F.col("n"))).alias("k"))
        .withColumn(
            "v",
            F.sum(F.log(F.greatest(F.col("k"), F.lit(1)))).over(
                Window.orderBy("k").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(k, v))),"
                " s -> s.v)"
            ).alias("arr")
        )
    )
    support = marg.crossJoin(F.broadcast(lf)).select(
        "*",
        F.greatest(F.lit(0), F.col("c1") - F.col("r2")).alias("klo"),
        F.least(F.col("r1"), F.col("c1")).alias("khi"),
    )
    pmfs = support.select(
        "*",
        F.explode(F.sequence(F.col("klo"), F.col("khi"))).alias("k"),
    ).withColumn(
        "pmf",
        F.exp(
            F.expr(
                "element_at(arr, CAST(r1 + 1 AS INT))"
                " - element_at(arr, CAST(k + 1 AS INT))"
                " - element_at(arr, CAST(r1 - k + 1 AS INT))"
                " + element_at(arr, CAST(r2 + 1 AS INT))"
                " - element_at(arr, CAST(c1 - k + 1 AS INT))"
                " - element_at(arr, CAST(r2 - c1 + k + 1 AS INT))"
                " - element_at(arr, CAST(n + 1 AS INT))"
                " + element_at(arr, CAST(c1 + 1 AS INT))"
                " + element_at(arr, CAST(n - c1 + 1 AS INT))"
            )
        ),
    )
    obs = pmfs.filter(F.col("k") == F.col("a")).select(
        F.col("pmf").alias("pmf_obs")
    )
    return (
        pmfs.crossJoin(F.broadcast(obs))
        .groupBy("a", "b", "c", "d", "pmf_obs")
        .agg(
            F.expr(
                "array_sort(collect_list(struct(k AS kk, pmf AS pp)))"
            ).alias("terms")
        )
        .select(
            "a",
            "b",
            "c",
            "d",
            F.round(
                F.when(
                    F.col("b") * F.col("c") == 0, F.lit(None)
                ).otherwise(
                    F.col("a") * 1.0 * F.col("d")
                    / (F.col("b") * 1.0 * F.col("c"))
                ),
                6,
            ).alias("odds_ratio"),
            F.round(
                F.expr(
                    "aggregate(transform(terms, t -> CASE WHEN"
                    " t.pp <= pmf_obs * (1 + 1e-7) THEN t.pp"
                    " ELSE CAST(0 AS DOUBLE) END),"
                    " CAST(0 AS DOUBLE), (x, y) -> x + y)"
                ),
                6,
            ).alias("p_two_sided"),
            F.round(
                F.expr(
                    "aggregate(transform(terms, t -> CASE WHEN"
                    " t.kk <= a THEN t.pp ELSE CAST(0 AS DOUBLE) END),"
                    " CAST(0 AS DOUBLE), (x, y) -> x + y)"
                ),
                6,
            ).alias("p_left"),
            F.round(
                F.expr(
                    "aggregate(transform(terms, t -> CASE WHEN"
                    " t.kk >= a THEN t.pp ELSE CAST(0 AS DOUBLE) END),"
                    " CAST(0 AS DOUBLE), (x, y) -> x + y)"
                ),
                6,
            ).alias("p_right"),
        )
    )


@query(
    "cochran_armitage_trend",
    oracle="""
    WITH doses AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n_i,
             CAST(sum(CASE WHEN o_totalprice >= 150000
                      THEN 1 ELSE 0 END) AS BIGINT) AS r_i
      FROM orders GROUP BY 1
    ), tots AS (
      SELECT CAST(sum(n_i) AS BIGINT) AS n,
             CAST(sum(r_i) AS BIGINT) AS r,
             CAST(sum(s * r_i) AS BIGINT) AS sr,
             CAST(sum(s * n_i) AS BIGINT) AS sn,
             CAST(sum(s * s * n_i) AS BIGINT) AS ssn
      FROM doses
    )
    SELECT d.s AS dose,
           d.n_i AS n_orders,
           d.r_i AS n_high_value,
           round(d.r_i * 1.0 / d.n_i, 6) AS rate,
           round((t.sr - t.r * 1.0 * t.sn / t.n)
                 / sqrt((t.r * 1.0 / t.n) * (1 - t.r * 1.0 / t.n)
                        * (t.ssn - t.sn * 1.0 * t.sn / t.n)), 6)
             AS z_trend,
           round(pow((t.sr - t.r * 1.0 * t.sn / t.n), 2)
                 / ((t.r * 1.0 / t.n) * (1 - t.r * 1.0 / t.n)
                    * (t.ssn - t.sn * 1.0 * t.sn / t.n)), 6)
             AS chi2_trend
    FROM doses d CROSS JOIN tots t
    ORDER BY dose
    """,
)
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: is the high-value-order rate
    monotonically associated with the ordered priority class (scores
    1..5 parsed from the priority label)? T = Sum s_i r_i - p_bar *
    Sum s_i n_i with Var = p_bar (1-p_bar)(Sum s^2 n - (Sum s n)^2/N)
    — the 1-df test that beats the omnibus chi-square whenever the
    alternative is ordered, which is exactly the dose-response shape
    priority classes imply. Emits the per-dose table with the shared
    trend z / chi-square.

    Determinism: five exact integer sufficient statistics; z is one
    closed-form double per row.

    Scale: one map-side-combined groupBy over 5 dose classes; the
    totals row broadcasts back.
    """
    o = load(spark, sf_dir, "orders")
    doses = o.groupBy(
        F.expr("CAST(substr(o_orderpriority, 1, 1) AS BIGINT)").alias("s")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum(F.when(F.col("o_totalprice") >= 150000, 1).otherwise(0))
        .cast("bigint")
        .alias("r_i"),
    )
    tots = doses.agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("r_i").cast("bigint").alias("r"),
        F.sum(F.col("s") * F.col("r_i")).cast("bigint").alias("sr"),
        F.sum(F.col("s") * F.col("n_i")).cast("bigint").alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("n_i"))
        .cast("bigint")
        .alias("ssn"),
    )
    t_num = F.col("sr") - F.col("r") * 1.0 * F.col("sn") / F.col("n")
    pbar = F.col("r") * 1.0 / F.col("n")
    var = (
        pbar
        * (1 - pbar)
        * (F.col("ssn") - F.col("sn") * 1.0 * F.col("sn") / F.col("n"))
    )
    return (
        doses.crossJoin(F.broadcast(tots))
        .select(
            F.col("s").alias("dose"),
            F.col("n_i").alias("n_orders"),
            F.col("r_i").alias("n_high_value"),
            F.round(F.col("r_i") * 1.0 / F.col("n_i"), 6).alias("rate"),
            F.round(t_num / F.sqrt(var), 6).alias("z_trend"),
            F.round(F.pow(t_num, 2) / var, 6).alias("chi2_trend"),
        )
        .orderBy("dose")
    )


@query(
    "press_loocv_regression",
    oracle="""
    WITH grp AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS n_x,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS sy,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * CAST(round(l_extendedprice * 100) AS BIGINT))
               AS HUGEINT) AS syy
      FROM lineitem GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(n_x) AS BIGINT) AS n,
             CAST(sum(n_x * x) AS BIGINT) AS sx,
             CAST(sum(n_x * x * x) AS BIGINT) AS sxx,
             CAST(sum(sy) AS BIGINT) AS sy_t,
             CAST(sum(x * sy) AS BIGINT) AS sxy,
             CAST(sum(syy) AS HUGEINT) AS syy_t
      FROM grp
    ), fit AS (
      SELECT n, sx, sxx, sy_t, sxy, syy_t,
             (n * 1.0 * sxy - sx * 1.0 * sy_t)
               / (n * 1.0 * sxx - sx * 1.0 * sx) AS b,
             sx * 1.0 / n AS xbar,
             (sxx - sx * 1.0 * sx / n) AS ssx
      FROM tot
    ), fit2 AS (
      SELECT *, sy_t * 1.0 / n - b * xbar AS a FROM fit
    ), diag AS (
      SELECT g.x, g.n_x,
             1.0 / f.n + (g.x - f.xbar) * (g.x - f.xbar) / f.ssx AS h,
             g.syy - 2 * (f.a + f.b * g.x) * g.sy
               + g.n_x * (f.a + f.b * g.x) * (f.a + f.b * g.x) AS sse_x,
             f.a AS a, f.b AS b, f.n AS n, f.syy_t, f.sy_t
      FROM grp g CROSS JOIN fit2 f
    ), press AS (
      SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(sse_x / ((1 - h) * (1 - h)) ORDER BY x)),
             (p, q) -> p + q) AS press_tot,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(sse_x ORDER BY x)), (p, q) -> p + q) AS sse_tot
      FROM diag
    )
    SELECT d.x AS quantity, d.n_x AS n_rows,
           round(d.h, 8) AS leverage,
           round(d.sse_x / 1e8, 4) AS sse_group,
           round(d.sse_x / ((1 - d.h) * (1 - d.h)) / 1e8, 4)
             AS press_group,
           round(d.b / 100.0, 6) AS slope,
           round(d.a / 100.0, 4) AS intercept,
           round(1 - p.sse_tot
                 / (d.syy_t - d.sy_t * 1.0 * d.sy_t / d.n), 6) AS r2,
           round(p.press_tot / 1e8, 2) AS press_total,
           round(1 - p.press_tot
                 / (d.syy_t - d.sy_t * 1.0 * d.sy_t / d.n), 6)
             AS r2_predicted
    FROM diag d CROSS JOIN press p
    ORDER BY quantity
    """,
)
def press_loocv_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRESS / leave-one-out diagnostics for the extendedprice ~
    quantity regression, computed WITHOUT refitting n models: because
    leverage h_i depends only on x_i and x has 50 distinct values,
    the LOO residual identity e_i/(1-h_i) collapses to per-x-group
    sufficient statistics (n_x, Sum y, Sum y^2) — the classic PRESS
    shortcut. Emits the per-quantity leverage/SSE/PRESS table with
    the global slope, R^2, PRESS, and predicted-R^2 (the honest
    out-of-sample R^2 the in-sample one inflates).

    Determinism: all sufficient statistics are exact int64 (cents and
    cents^2); doubles appear only in closed-form per-group
    expressions; the two global float totals are x-ordered folds.

    Scale: one map-side-combined groupBy on 50 quantity values; no
    per-row residual pass, no second scan, no window over the fact
    table. Sums of y^2 accumulate in decimal(38,0)/HUGEINT — int64
    overflows just below sf0.1 (caught by the r5 sf0.1 run sweep).
    """
    li = load(spark, sf_dir, "lineitem")
    cents = "CAST(round(l_extendedprice * 100) AS BIGINT)"
    grp = li.groupBy(
        F.col("l_quantity").cast("bigint").alias("x")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_x"),
        F.sum(F.expr(cents)).cast("bigint").alias("sy"),
        # cents^2 sums pass 9.2e18 near sf0.1 — accumulate in decimal(38,0)
        F.sum(F.expr(f"CAST({cents} AS DECIMAL(38,0)) * {cents}")).alias(
            "syy"
        ),
    )
    tot = grp.agg(
        F.sum("n_x").cast("bigint").alias("n"),
        F.sum(F.col("n_x") * F.col("x")).cast("bigint").alias("sx"),
        F.sum(F.col("n_x") * F.col("x") * F.col("x"))
        .cast("bigint")
        .alias("sxx"),
        F.sum("sy").cast("bigint").alias("sy_t"),
        F.sum(F.col("x") * F.col("sy")).cast("bigint").alias("sxy"),
        F.sum("syy").alias("syy_t"),
    )
    fit = tot.select(
        "*",
        (
            (F.col("n") * 1.0 * F.col("sxy") - F.col("sx") * 1.0 * F.col("sy_t"))
            / (F.col("n") * 1.0 * F.col("sxx") - F.col("sx") * 1.0 * F.col("sx"))
        ).alias("b"),
        (F.col("sx") * 1.0 / F.col("n")).alias("xbar"),
        (F.col("sxx") - F.col("sx") * 1.0 * F.col("sx") / F.col("n")).alias(
            "ssx"
        ),
    ).withColumn("a", F.col("sy_t") * 1.0 / F.col("n") - F.col("b") * F.col("xbar"))
    yhat = F.col("a") + F.col("b") * F.col("x")
    diag = grp.crossJoin(F.broadcast(fit)).select(
        "x",
        "n_x",
        (
            1.0 / F.col("n")
            + (F.col("x") - F.col("xbar")) * (F.col("x") - F.col("xbar"))
            / F.col("ssx")
        ).alias("h"),
        (
            F.col("syy") - 2 * yhat * F.col("sy") + F.col("n_x") * yhat * yhat
        ).alias("sse_x"),
        "a",
        "b",
        "n",
        "syy_t",
        "sy_t",
    )
    press = diag.agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(x,"
            " (sse_x / ((1 - h) * (1 - h))) AS pv))), t -> t.pv),"
            " CAST(0 AS DOUBLE), (p, q) -> p + q)"
        ).alias("press_tot"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(x,"
            " sse_x AS sv))), t -> t.sv),"
            " CAST(0 AS DOUBLE), (p, q) -> p + q)"
        ).alias("sse_tot"),
    )
    sst = F.col("syy_t") - F.col("sy_t") * 1.0 * F.col("sy_t") / F.col("n")
    return (
        diag.crossJoin(F.broadcast(press))
        .select(
            F.col("x").alias("quantity"),
            F.col("n_x").alias("n_rows"),
            F.round(F.col("h"), 8).alias("leverage"),
            F.round(F.col("sse_x") / 1e8, 4).alias("sse_group"),
            F.round(
                F.col("sse_x") / ((1 - F.col("h")) * (1 - F.col("h"))) / 1e8,
                4,
            ).alias("press_group"),
            F.round(F.col("b") / 100.0, 6).alias("slope"),
            F.round(F.col("a") / 100.0, 4).alias("intercept"),
            F.round(1 - F.col("sse_tot") / sst, 6).alias("r2"),
            F.round(F.col("press_tot") / 1e8, 2).alias("press_total"),
            F.round(1 - F.col("press_tot") / sst, 6).alias("r2_predicted"),
        )
        .orderBy("quantity")
    )


_AR_H = 7  # forecast horizon (days)


@query(
    "ar2_yule_walker_forecast",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ), idx AS (
      SELECT day, c,
             row_number() OVER (ORDER BY day) AS i,
             count(*) OVER () AS n
      FROM daily
    ), lagged AS (
      SELECT i, n, c,
             lag(c, 1) OVER (ORDER BY day) AS c1,
             lag(c, 2) OVER (ORDER BY day) AS c2
      FROM idx
    ), moms AS (
      SELECT CAST(max(n) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS s0,
             CAST(sum(CASE WHEN c1 IS NOT NULL THEN c * c1 END)
               AS BIGINT) AS p1,
             CAST(sum(CASE WHEN c1 IS NOT NULL THEN c END)
               AS BIGINT) AS a1,
             CAST(sum(CASE WHEN c1 IS NOT NULL THEN c1 END)
               AS BIGINT) AS b1,
             CAST(sum(CASE WHEN c2 IS NOT NULL THEN c * c2 END)
               AS BIGINT) AS p2,
             CAST(sum(CASE WHEN c2 IS NOT NULL THEN c END)
               AS BIGINT) AS a2,
             CAST(sum(CASE WHEN c2 IS NOT NULL THEN c2 END)
               AS BIGINT) AS b2
      FROM lagged
    ), gam AS (
      SELECT n, s * 1.0 / n AS mu,
             s0 * 1.0 / n - (s * 1.0 / n) * (s * 1.0 / n) AS g0,
             (p1 - (s * 1.0 / n) * (a1 + b1)
              + (n - 1) * (s * 1.0 / n) * (s * 1.0 / n)) / n AS g1,
             (p2 - (s * 1.0 / n) * (a2 + b2)
              + (n - 2) * (s * 1.0 / n) * (s * 1.0 / n)) / n AS g2
      FROM moms
    ), phi AS (
      SELECT n, mu, g0, g1, g2,
             (g1 * g0 - g1 * g2) / (g0 * g0 - g1 * g1) AS phi1,
             (g0 * g2 - g1 * g1) / (g0 * g0 - g1 * g1) AS phi2
      FROM gam
    ), tail AS (
      SELECT max(CASE WHEN i = n THEN c END) AS y_n,
             max(CASE WHEN i = n - 1 THEN c END) AS y_n1
      FROM idx
    ), fc AS (
      SELECT p.mu, p.phi1, p.phi2, p.g0, p.g1, p.g2,
             list_reduce(
               list_prepend([CAST(t.y_n1 AS DOUBLE), CAST(t.y_n AS DOUBLE)],
                 list_transform(range(1, {_AR_H} + 1),
                   h -> [CAST(h AS DOUBLE)])),
               (acc, v) -> list_concat(acc,
                 [p.mu + p.phi1 * (acc[len(acc)] - p.mu)
                       + p.phi2 * (acc[len(acc) - 1] - p.mu)])) AS st
      FROM phi p CROSS JOIN tail t
    )
    SELECT u.h AS horizon,
           round(f.st[CAST(u.h + 2 AS INTEGER)], 4) AS forecast,
           round(f.phi1, 6) AS phi1,
           round(f.phi2, 6) AS phi2,
           round(f.mu, 4) AS mu,
           round(f.g0 * (1 - f.phi1 * f.g1 / f.g0
                         - f.phi2 * f.g2 / f.g0), 4) AS sigma2
    FROM fc f, unnest(range(1, {_AR_H} + 1)) AS u(h)
    ORDER BY horizon
    """,
)
def ar2_yule_walker_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(2) fit by the Yule-Walker moment equations over the daily
    event-count series — phi solved from the 2x2 Toeplitz system on
    the lag-0/1/2 autocovariances — then a 7-day-ahead forecast by
    folding the recursion f_h = mu + phi1 (f_{{h-1}} - mu) + phi2
    (f_{{h-2}} - mu) out from the last two observed days. Emits one
    row per horizon with the shared (phi1, phi2, mu, innovation
    variance). The autoregressive complement to `holt_winters_daily`
    (smoothing) and `pacf_durbin_levinson` (which identifies p=2).

    Determinism: all lag cross-products are exact int64 sums; the
    gamma/phi algebra and the 9-step fold are fixed-order double
    expressions (flat DOUBLE[] state per the engine-parity rule).

    Scale: the fact table collapses to per-day counts map-side; lags
    and the fold run on the bounded day dimension.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wd = Window.orderBy("day")
    idx = daily.select(
        "day",
        "c",
        F.row_number().over(wd).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.lag("c", 1).over(wd).alias("c1"),
        F.lag("c", 2).over(wd).alias("c2"),
    )
    moms = idx.agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s0"),
        F.sum(
            F.when(F.col("c1").isNotNull(), F.col("c") * F.col("c1"))
        )
        .cast("bigint")
        .alias("p1"),
        F.sum(F.when(F.col("c1").isNotNull(), F.col("c")))
        .cast("bigint")
        .alias("a1"),
        F.sum(F.when(F.col("c1").isNotNull(), F.col("c1")))
        .cast("bigint")
        .alias("b1"),
        F.sum(
            F.when(F.col("c2").isNotNull(), F.col("c") * F.col("c2"))
        )
        .cast("bigint")
        .alias("p2"),
        F.sum(F.when(F.col("c2").isNotNull(), F.col("c")))
        .cast("bigint")
        .alias("a2"),
        F.sum(F.when(F.col("c2").isNotNull(), F.col("c2")))
        .cast("bigint")
        .alias("b2"),
    )
    mu = F.col("s") * 1.0 / F.col("n")
    gam = moms.select(
        "n",
        mu.alias("mu"),
        (F.col("s0") * 1.0 / F.col("n") - mu * mu).alias("g0"),
        (
            (
                F.col("p1")
                - mu * (F.col("a1") + F.col("b1"))
                + (F.col("n") - 1) * mu * mu
            )
            / F.col("n")
        ).alias("g1"),
        (
            (
                F.col("p2")
                - mu * (F.col("a2") + F.col("b2"))
                + (F.col("n") - 2) * mu * mu
            )
            / F.col("n")
        ).alias("g2"),
    )
    phi = gam.select(
        "*",
        (
            (F.col("g1") * F.col("g0") - F.col("g1") * F.col("g2"))
            / (F.col("g0") * F.col("g0") - F.col("g1") * F.col("g1"))
        ).alias("phi1"),
        (
            (F.col("g0") * F.col("g2") - F.col("g1") * F.col("g1"))
            / (F.col("g0") * F.col("g0") - F.col("g1") * F.col("g1"))
        ).alias("phi2"),
    )
    tail = idx.agg(
        F.max(F.when(F.col("i") == F.col("n"), F.col("c"))).alias("y_n"),
        F.max(F.when(F.col("i") == F.col("n") - 1, F.col("c"))).alias(
            "y_n1"
        ),
    )
    fc = phi.crossJoin(F.broadcast(tail)).select(
        "mu",
        "phi1",
        "phi2",
        "g0",
        "g1",
        "g2",
        F.expr(
            f"""
            aggregate(transform(sequence(1, {_AR_H}),
                h -> CAST(h AS DOUBLE)),
              array(CAST(y_n1 AS DOUBLE), CAST(y_n AS DOUBLE)),
              (acc, v) -> concat(acc,
                array(mu + phi1 * (element_at(acc, size(acc)) - mu)
                         + phi2 * (element_at(acc, size(acc) - 1) - mu))))
            """
        ).alias("st"),
    )
    return (
        fc.select(
            "*",
            F.explode(F.sequence(F.lit(1), F.lit(_AR_H))).alias("h"),
        )
        .select(
            F.col("h").alias("horizon"),
            F.round(
                F.expr("element_at(st, CAST(h + 2 AS INT))"), 4
            ).alias("forecast"),
            F.round(F.col("phi1"), 6).alias("phi1"),
            F.round(F.col("phi2"), 6).alias("phi2"),
            F.round(F.col("mu"), 4).alias("mu"),
            F.round(
                F.col("g0")
                * (
                    1
                    - F.col("phi1") * F.col("g1") / F.col("g0")
                    - F.col("phi2") * F.col("g2") / F.col("g0")
                ),
                4,
            ).alias("sigma2"),
        )
        .orderBy("horizon")
    )
