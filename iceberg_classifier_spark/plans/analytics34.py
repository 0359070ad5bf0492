"""Analytics wave 34: omnibus distribution comparison, inventory
policy, spatial autocorrelation, and variance homogeneity.

`cramer_von_mises_two_sample` integrates the squared ECDF gap (the
all-moments alternative to KS's single supremum) on the same
two-level prefix-sum machinery as `ks_two_sample`;
`newsvendor_quantile_policy` computes the critical-fractile order
quantity per brand and replays its cost against the naive
mean-demand policy; `morans_i_cells` measures spatial
autocorrelation of customer mass over the geo grid with a queen-
adjacency cell join (no point-pair blowup); `bartlett_test` is the
classic k-sample variance-homogeneity test from exact per-group
moments (the parametric sharp-tool next to `brown_forsythe_test`'s
robust version).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_O_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


@query(
    "cramer_von_mises_two_sample",
    oracle=f"""
    WITH g AS (
      SELECT {_O_CENTS} AS cents,
             CAST(sum(CASE WHEN c_mktsegment = 'BUILDING'
                      THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY'
                      THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      GROUP BY 1
    ), cum AS (
      SELECT cents, c1, c2,
             CAST(sum(c1) OVER (ORDER BY cents
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc1,
             CAST(sum(c2) OVER (ORDER BY cents
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc2
      FROM g
    ), tots AS (
      SELECT CAST(max(cc1) AS BIGINT) AS n,
             CAST(max(cc2) AS BIGINT) AS m
      FROM cum
    ), core AS (
      SELECT t.n, t.m,
             CAST(sum((c.c1 + c.c2)
                      * (CAST(c.cc1 AS HUGEINT) * t.m
                         - CAST(c.cc2 AS HUGEINT) * t.n)
                      * (CAST(c.cc1 AS HUGEINT) * t.m
                         - CAST(c.cc2 AS HUGEINT) * t.n)) AS DOUBLE) AS u
      FROM cum c CROSS JOIN tots t
      GROUP BY t.n, t.m
    )
    SELECT n, m,
           round(u * 1.0 / ((n + m) * 1.0 * (n + m))
                 / (n * 1.0 * m), 6) AS t_stat,
           round((1.0 + 1.0 / (n + m)) / 6, 6) AS null_mean,
           round(u * 1.0 / ((n + m) * 1.0 * (n + m))
                 / (n * 1.0 * m)
                 / ((1.0 + 1.0 / (n + m)) / 6), 6) AS t_over_null
    FROM core
    """,
)
def cramer_von_mises_two_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-sample Cramér-von Mises: T = nm/N^2 * sum over the pooled
    sample of (F_n - G_m)^2 — the INTEGRATED squared ECDF gap, which
    weights the whole distribution where KS takes only the supremum
    (so CvM catches spread/shape differences KS's single crossing
    point misses). The core sum runs on exact integers:
    (C1*m - C2*n)^2 per distinct value, weighted by its multiplicity.
    Reported against the null mean E[T] = (1 + 1/N)/6.

    Determinism: counts, cumulative counts, and the weighted square
    sum are exact int64 (the balanced-sample difference keeps the
    square far from overflow at tested SFs); one closed-form double
    at the edge.

    Scale: same shape as `ks_two_sample` — one value-grouped
    aggregate, an ECDF prefix sum (two-level at scale), one
    map-side-combined reduction. No sort of raw rows.
    """
    o = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    g = (
        o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .groupBy(F.expr(_O_CENTS).alias("cents"))
        .agg(
            F.sum(
                F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("c1"),
            F.sum(
                F.when(F.col("c_mktsegment") == "MACHINERY", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("c2"),
        )
    )
    wc = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = g.select(
        "cents",
        "c1",
        "c2",
        F.sum("c1").over(wc).cast("bigint").alias("cc1"),
        F.sum("c2").over(wc).cast("bigint").alias("cc2"),
    )
    tots = cum.agg(
        F.max("cc1").cast("bigint").alias("n"),
        F.max("cc2").cast("bigint").alias("m"),
    )
    # cc1*m ~ (3e5)^2 at 10x scale, so the square is ~1e21 — far past
    # int64 (sf1 sweep crash). Widen the ECDF-gap operands to
    # decimal(38,0) (oracle: HUGEINT), keep the weighted square-sum
    # exact, and convert the one exact total to double identically on
    # both engines.
    diff = (
        F.col("cc1").cast("decimal(38,0)") * F.col("m")
        - F.col("cc2").cast("decimal(38,0)") * F.col("n")
    )
    core = (
        cum.crossJoin(F.broadcast(tots))
        .groupBy("n", "m")
        .agg(
            F.sum((F.col("c1") + F.col("c2")) * diff * diff)
            .cast("double")
            .alias("u")
        )
    )
    nm = F.col("n") * 1.0 * F.col("m")
    nn = (F.col("n") + F.col("m")) * 1.0
    t_stat = F.col("u") * 1.0 / (nn * nn) / nm
    null_mean = (1.0 + 1.0 / (F.col("n") + F.col("m"))) / 6
    return core.select(
        "n",
        "m",
        F.round(t_stat, 6).alias("t_stat"),
        F.round(null_mean, 6).alias("null_mean"),
        F.round(t_stat / null_mean, 6).alias("t_over_null"),
    )


_NV_CU = 3  # underage cost per unit
_NV_CO = 1  # overage cost per unit


@query(
    "newsvendor_quantile_policy",
    oracle=f"""
    WITH demand AS (
      SELECT p_brand AS brand, l_shipdate AS day,
             CAST(sum(l_quantity) AS BIGINT) AS d
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT brand, d,
             row_number() OVER (PARTITION BY brand
                                ORDER BY d, day) AS rk,
             count(*) OVER (PARTITION BY brand) AS n_days
      FROM demand
    ), q AS (
      SELECT brand, CAST(max(n_days) AS BIGINT) AS n_days,
             CAST(min(CASE WHEN rk * ({_NV_CU} + {_NV_CO})
                           >= n_days * {_NV_CU}
                      THEN d END) AS BIGINT) AS q_star
      FROM ranked GROUP BY brand
    ), means AS (
      SELECT brand, CAST(sum(d) // count(*) AS BIGINT) AS mean_d,
             CAST(sum(d) AS BIGINT) AS total_demand
      FROM demand GROUP BY brand
    ), cost AS (
      SELECT d.brand, q.n_days, q.q_star, m.mean_d, m.total_demand,
             CAST(sum(CASE WHEN d.d > q.q_star
                      THEN {_NV_CU} * (d.d - q.q_star)
                      ELSE {_NV_CO} * (q.q_star - d.d) END) AS BIGINT)
               AS cost_newsvendor,
             CAST(sum(CASE WHEN d.d > m.mean_d
                      THEN {_NV_CU} * (d.d - m.mean_d)
                      ELSE {_NV_CO} * (m.mean_d - d.d) END)
               AS BIGINT) AS cost_mean_policy
      FROM demand d
      JOIN q ON d.brand = q.brand
      JOIN means m ON d.brand = m.brand
      GROUP BY d.brand, q.n_days, q.q_star, m.mean_d, m.total_demand
    )
    SELECT brand, n_days, q_star,
           CAST(total_demand // n_days AS BIGINT) AS mean_demand,
           cost_newsvendor, cost_mean_policy,
           CAST((cost_mean_policy - cost_newsvendor) * 1000000
                // greatest(cost_mean_policy, 1) AS BIGINT)
             AS savings_ppm
    FROM cost
    ORDER BY brand
    """,
)
def newsvendor_quantile_policy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Newsvendor optimal stocking per brand: with underage cost
    cu={_NV_CU} and overage co={_NV_CO}, the optimal order quantity
    is the critical fractile F^-1(cu/(cu+co)) = the 75th percentile
    of daily demand (histogram-exact, via the per-brand rank
    identity rk*(cu+co) >= n*cu); the replay prices that policy and
    the naive order-the-mean policy over the same demand history.
    The savings column is Jensen's inequality made operational: the
    mean policy ignores asymmetric costs; the quantile policy is
    provably optimal for them.

    Determinism: demands, quantiles, and both cost replays are exact
    int64; the mean policy uses integer-floor mean demand.

    Scale: demand collapses map-side to (brand, day); the rank
    window partitions BY BRAND over day-dimension frames; the replay
    is one more grouped pass. No global sorts, no quantile sketch
    approximation error.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    demand = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("l_shipdate").alias("day"))
        .agg(F.sum("l_quantity").cast("bigint").alias("d"))
    )
    wb = Window.partitionBy("brand").orderBy("d", "day")
    ranked = demand.select(
        "brand",
        "d",
        F.row_number().over(wb).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("brand"))
        .alias("n_days"),
    )
    q = ranked.groupBy("brand").agg(
        F.max("n_days").cast("bigint").alias("n_days"),
        F.min(
            F.when(
                F.col("rk") * (_NV_CU + _NV_CO)
                >= F.col("n_days") * _NV_CU,
                F.col("d"),
            )
        )
        .cast("bigint")
        .alias("q_star"),
    )
    means = demand.groupBy("brand").agg(
        F.expr("CAST(sum(d) div count(*) AS BIGINT)").alias("mean_d"),
        F.sum("d").cast("bigint").alias("total_demand"),
    )
    cost = (
        demand.join(F.broadcast(q), "brand")
        .join(F.broadcast(means), "brand")
        .groupBy("brand", "n_days", "q_star", "mean_d", "total_demand")
        .agg(
            F.sum(
                F.when(
                    F.col("d") > F.col("q_star"),
                    _NV_CU * (F.col("d") - F.col("q_star")),
                ).otherwise(_NV_CO * (F.col("q_star") - F.col("d")))
            )
            .cast("bigint")
            .alias("cost_newsvendor"),
            F.sum(
                F.when(
                    F.col("d") > F.col("mean_d"),
                    _NV_CU * (F.col("d") - F.col("mean_d")),
                ).otherwise(_NV_CO * (F.col("mean_d") - F.col("d")))
            )
            .cast("bigint")
            .alias("cost_mean_policy"),
        )
    )
    return cost.select(
        "brand",
        "n_days",
        "q_star",
        F.expr("CAST(total_demand div n_days AS BIGINT)").alias(
            "mean_demand"
        ),
        "cost_newsvendor",
        "cost_mean_policy",
        F.expr(
            "CAST((cost_mean_policy - cost_newsvendor) * 1000000"
            " div greatest(cost_mean_policy, 1) AS BIGINT)"
        ).alias("savings_ppm"),
    ).orderBy("brand")


_MI_CELL = 10_000_000  # 10-degree cells in micro-degrees


@query(
    "morans_i_cells",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS k,
             (c_custkey * 48271) % 120000000 AS lat,
             (c_custkey * 69621) % 360000000 AS lon
      FROM customer
    ), cells AS (
      SELECT lat // {_MI_CELL} AS cy, lon // {_MI_CELL} AS cx,
             CAST(count(*) AS BIGINT) AS x
      FROM pts GROUP BY 1, 2
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(x * x) AS BIGINT) AS s2
      FROM cells
    ), offs AS (
      SELECT u.dy, v.dx
      FROM (SELECT unnest([-1, 0, 1]) AS dy) u
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) v
      WHERE NOT (u.dy = 0 AND v.dx = 0)
    ), pairs AS (
      SELECT a.x AS xa, b.x AS xb
      FROM cells a
      CROSS JOIN offs o
      JOIN cells b ON b.cy = a.cy + o.dy AND b.cx = a.cx + o.dx
    ), agg AS (
      SELECT CAST(count(*) AS BIGINT) AS w,
             CAST(sum(xa * xb) AS BIGINT) AS pxy,
             CAST(sum(xa + xb) AS BIGINT) AS pxpy
      FROM pairs
    )
    SELECT t.n AS n_cells, a.w AS w_links,
           round((t.n * 1.0 / a.w)
                 * (a.pxy - (t.s * 1.0 / t.n) * a.pxpy
                    + a.w * (t.s * 1.0 / t.n) * (t.s * 1.0 / t.n))
                 / (t.s2 - t.s * 1.0 * t.s / t.n), 6) AS morans_i,
           round(-1.0 / (t.n - 1), 6) AS expected_i
    FROM tot t CROSS JOIN agg a
    """,
)
def morans_i_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I spatial autocorrelation of customer mass over the
    10-degree geo grid (same deterministic micro-degree plane as
    `geo_radius_pairs`): I = (n/W) * sum_ij w_ij (x_i - mu)(x_j - mu)
    / sum_i (x_i - mu)^2 with queen (8-neighbour) adjacency —
    positive I = clustered mass, ~E[I] = -1/(n-1) = spatially random.
    The cross term expands to exact integer sums (sum x_a x_b, sum
    x_a + x_b over links), so no per-pair float accumulates.

    Determinism: all sums exact int64; I is one closed-form double.

    Scale: the adjacency join is cells x 8 offsets -> equi-join on
    the neighbour cell key — link count scales with occupied cells,
    never point pairs; the offsets dimension broadcasts. The
    standard spatial-autocorrelation shape for planetary grids.
    """
    cust = load(spark, sf_dir, "customer")
    cells = (
        cust.select(
            ((F.col("c_custkey") * 48271) % 120000000).alias("lat"),
            ((F.col("c_custkey") * 69621) % 360000000).alias("lon"),
        )
        .groupBy(
            F.expr(f"lat div {_MI_CELL}").alias("cy"),
            F.expr(f"lon div {_MI_CELL}").alias("cx"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    tot = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("s2"),
    )
    offs = spark.createDataFrame(
        [
            (dy, dx)
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
            if not (dy == 0 and dx == 0)
        ],
        "dy long, dx long",
    )
    a = cells.select(
        F.col("cy").alias("acy"), F.col("cx").alias("acx"), F.col("x").alias("xa")
    )
    pairs = (
        a.crossJoin(F.broadcast(offs))
        .join(
            cells,
            (F.col("cy") == F.col("acy") + F.col("dy"))
            & (F.col("cx") == F.col("acx") + F.col("dx")),
        )
        .select("xa", F.col("x").alias("xb"))
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("w"),
        F.sum(F.col("xa") * F.col("xb")).cast("bigint").alias("pxy"),
        F.sum(F.col("xa") + F.col("xb")).cast("bigint").alias("pxpy"),
    )
    mu = F.col("s") * 1.0 / F.col("n")
    return tot.crossJoin(F.broadcast(agg)).select(
        F.col("n").alias("n_cells"),
        F.col("w").alias("w_links"),
        F.round(
            (F.col("n") * 1.0 / F.col("w"))
            * (
                F.col("pxy")
                - mu * F.col("pxpy")
                + F.col("w") * mu * mu
            )
            / (F.col("s2") - F.col("s") * 1.0 * F.col("s") / F.col("n")),
            6,
        ).alias("morans_i"),
        F.round(-1.0 / (F.col("n") - 1), 6).alias("expected_i"),
    )


@query(
    "bartlett_test",
    oracle="""
    WITH grp AS (
      SELECT o_orderpriority AS pri,
             CAST(count(*) AS BIGINT) AS n_i,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS s,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)
                      * CAST(round(o_totalprice * 100) AS BIGINT))
               AS HUGEINT) AS s2
      FROM orders GROUP BY 1
    ), vars AS (
      SELECT pri, n_i,
             (s2 - s * 1.0 * s / n_i) / (n_i - 1) AS v_i
      FROM grp
    ), pool AS (
      SELECT CAST(sum(n_i) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list((n_i - 1) * v_i ORDER BY pri)), (a, b) -> a + b)
               / sum(n_i - 1) AS v_p,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list((n_i - 1) * ln(v_i) ORDER BY pri)), (a, b) -> a + b)
               AS sum_ln,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(1.0 / (n_i - 1) ORDER BY pri)), (a, b) -> a + b)
               AS sum_inv
      FROM vars
    )
    SELECT v.pri AS priority, v.n_i,
           round(sqrt(v.v_i) / 100.0, 2) AS sd_dollars,
           round(((p.n - p.k) * ln(p.v_p) - p.sum_ln)
                 / (1 + (p.sum_inv - 1.0 / (p.n - p.k))
                        / (3 * (p.k - 1))), 6) AS bartlett_chi2,
           CAST(p.k - 1 AS BIGINT) AS df
    FROM vars v CROSS JOIN pool p
    ORDER BY priority
    """,
)
def bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test of variance homogeneity across the five order
    priorities: T = ((N-k) ln s_p^2 - sum (n_i-1) ln s_i^2) / C —
    the likelihood-ratio-based sharp test that assumes normality,
    complementing `brown_forsythe_test` (its robust median-based
    cousin): when both agree variances differ, the ANOVA pooling
    assumption is dead. Emits per-group SDs with the shared chi^2.

    Determinism: per-group moments are exact int64 (cents and
    cents^2); the log/ratio algebra is closed-form doubles on a
    5-row frame (the sum over 5 group terms is a deterministic
    5-value aggregate whose operand count is fixed — not a
    data-order-dependent float fold).

    Scale: one map-side-combined groupBy(priority); everything
    downstream is dimension-sized.
    """
    o = load(spark, sf_dir, "orders")
    cents = "CAST(round(o_totalprice * 100) AS BIGINT)"
    grp = o.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum(F.expr(cents)).cast("bigint").alias("s"),
        # cents^2 summed in decimal(38,0): ~2.5e15 per row overflows an
        # int64 accumulator beyond ~3.7k rows (hit at sf0.1 under ANSI)
        F.sum(F.expr(f"CAST({cents} AS DECIMAL(38,0)) * {cents}")).alias(
            "s2"
        ),
    )
    vars_ = grp.select(
        "pri",
        "n_i",
        (
            (F.col("s2").cast("double") - F.col("s") * 1.0 * F.col("s") / F.col("n_i"))
            / (F.col("n_i") - 1)
        ).alias("v_i"),
    )
    # priority-ordered folds keep the 5-term float sums fixed-order
    # (the engine-parity rule for any multi-row float aggregate)
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(pri,"
        " ({v}) AS vv))), t -> t.vv), CAST(0 AS DOUBLE),"
        " (a, b) -> a + b)"
    )
    pool = vars_.agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        (
            F.expr(fold.format(v="(n_i - 1) * v_i"))
            / F.sum(F.col("n_i") - 1)
        ).alias("v_p"),
        F.expr(fold.format(v="(n_i - 1) * ln(v_i)")).alias("sum_ln"),
        F.expr(fold.format(v="1.0D / (n_i - 1)")).alias("sum_inv"),
    )
    chi2 = (
        (F.col("n") - F.col("k")) * F.log(F.col("v_p")) - F.col("sum_ln")
    ) / (
        1
        + (F.col("sum_inv") - 1.0 / (F.col("n") - F.col("k")))
        / (3 * (F.col("k") - 1))
    )
    return (
        vars_.crossJoin(F.broadcast(pool))
        .select(
            F.col("pri").alias("priority"),
            "n_i",
            F.round(F.sqrt(F.col("v_i")) / 100.0, 2).alias("sd_dollars"),
            F.round(chi2, 6).alias("bartlett_chi2"),
            (F.col("k") - 1).cast("bigint").alias("df"),
        )
        .orderBy("priority")
    )
