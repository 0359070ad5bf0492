"""Analytics wave 24: hash-space collision auditing, adstock media
regression, and geometric retention fitting.

The collision audit checks a hash partitioning scheme against its
birthday-problem and Poisson-occupancy expectations — the test that
catches weak or truncated hashes before they skew a 1000-executor
shuffle. Adstock is marketing-mix modeling's carryover transform
(today's clicks echo into tomorrow); the grid fit picks the decay
that best explains purchases. The geometric retention fit compresses
a cohort curve into one churn parameter with a through-origin
log-linear OLS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.analytics2 import _md5_prefix_sql
from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_HC_M = 65536  # bucket space
_HC_MAXK = 5


@query(
    "hash_collision_audit",
    oracle=f"""
    WITH b AS (
      SELECT {_md5_prefix_sql("CAST(o_orderkey AS VARCHAR)")} % {_HC_M}
               AS bucket
      FROM orders
    ), occ AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS k FROM b GROUP BY bucket
    ), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
    occ_hist AS (
      SELECT least(k, {_HC_MAXK}) AS k, CAST(count(*) AS BIGINT) AS buckets
      FROM occ GROUP BY 1
    ), full_hist AS (
      SELECT g.k,
             CAST(coalesce(o.buckets, 0)
                  + CASE WHEN g.k = 0
                    THEN {_HC_M} - (SELECT count(*) FROM occ)
                    ELSE 0 END AS BIGINT) AS observed
      FROM (SELECT unnest(range(0, {_HC_MAXK + 1})) AS k) g
      LEFT JOIN occ_hist o ON g.k = o.k
    )
    SELECT f.k AS occupancy,
           f.observed,
           CAST(round({_HC_M} * exp(-n.n * 1.0 / {_HC_M})
                      * power(n.n * 1.0 / {_HC_M}, f.k)
                      / CASE f.k WHEN 0 THEN 1 WHEN 1 THEN 1
                        WHEN 2 THEN 2 WHEN 3 THEN 6 WHEN 4 THEN 24
                        ELSE 120 END) AS BIGINT) AS poisson_expected,
           n.n AS n_keys,
           CAST(n.n - (SELECT count(*) FROM occ) AS BIGINT)
             AS n_collisions,
           CAST(round(n.n * 1.0 * n.n / (2 * {_HC_M}))
             AS BIGINT) AS birthday_expected
    FROM full_hist f CROSS JOIN n
    ORDER BY occupancy
    """,
)
def hash_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-partitioning collision audit: order keys hash into a 2¹⁶
    bucket space via the portable md5-prefix; the bucket-occupancy
    histogram (how many buckets hold k keys, k capped at 5) is
    compared against the Poisson(n/m) expectation, and total
    collisions n − |occupied| against the birthday estimate n²/2m —
    the audit that certifies a hash function spreads keys like a
    uniform one BEFORE that hash decides a 1000-executor shuffle's
    balance (weak hashes pass eyeball checks and fail exactly this).

    Determinism: occupancy counts are exact integers; Poisson
    expectations are closed-form doubles rounded to integer buckets.

    Scale: one map-side hash + groupBy(bucket) with map-side combine;
    the histogram-of-histogram is ≤m rows collapsing to 6.

    The zero-occupancy row is reconstructed as m − |occupied| — empty
    buckets never appear in the groupBy.
    """
    o = load(spark, sf_dir, "orders")
    b = o.select(
        (
            F.expr(
                "CAST(conv(substr(md5(CAST(o_orderkey AS STRING)), 1, 8),"
                " 16, 10) AS BIGINT)"
            )
            % _HC_M
        ).alias("bucket")
    )
    occ = b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    n_keys = b.count()
    n_occupied = occ.count()
    occ_hist = occ.groupBy(
        F.least(F.col("k"), F.lit(_HC_MAXK)).alias("k")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("buckets"))
    grid = spark.range(0, _HC_MAXK + 1).select(
        F.col("id").cast("bigint").alias("k")
    )
    full_hist = (
        grid.join(occ_hist, "k", "left")
        .select(
            "k",
            (
                F.coalesce(F.col("buckets"), F.lit(0))
                + F.when(
                    F.col("k") == 0, F.lit(_HC_M - n_occupied)
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("observed"),
        )
    )
    lam = n_keys * 1.0 / _HC_M
    fact = (
        F.when(F.col("k") == 0, 1)
        .when(F.col("k") == 1, 1)
        .when(F.col("k") == 2, 2)
        .when(F.col("k") == 3, 6)
        .when(F.col("k") == 4, 24)
        .otherwise(120)
    )
    import math

    return full_hist.select(
        F.col("k").alias("occupancy"),
        "observed",
        F.round(
            _HC_M * math.exp(-lam) * F.pow(F.lit(lam), F.col("k")) / fact
        )
        .cast("bigint")
        .alias("poisson_expected"),
        F.lit(n_keys).cast("bigint").alias("n_keys"),
        F.lit(n_keys - n_occupied).cast("bigint").alias("n_collisions"),
        F.lit(round(n_keys * 1.0 * n_keys / (2 * _HC_M)))
        .cast("bigint")
        .alias("birthday_expected"),
    ).orderBy("occupancy")


_ADSTOCK_ALPHAS = [0.0, 0.3, 0.6]


@query(
    "adstock_lag_regression",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS clicks,
             CAST(sum(CASE WHEN event_type = 'purchase'
                      THEN round(value * 100) ELSE 0 END) AS BIGINT)
               AS rev_cents
      FROM events GROUP BY 1
    ), seq AS (
      SELECT list(clicks ORDER BY day) AS cs,
             list(rev_cents ORDER BY day) AS ys,
             CAST(count(*) AS BIGINT) AS n
      FROM daily
    ), sweep AS (
      SELECT al.alpha, s.n, s.ys,
             list_reduce(list_prepend(CAST([] AS DOUBLE[]),
               list_transform(s.cs, c -> [CAST(c AS DOUBLE)])),
               (a, v) -> list_append(a,
                 v[1] + CASE WHEN len(a) = 0 THEN 0.0
                        ELSE al.alpha * a[len(a)] END)) AS ad
      FROM seq s,
           (SELECT unnest([{", ".join(str(a) for a in _ADSTOCK_ALPHAS)}])
              AS alpha) al
    ), sums AS (
      SELECT alpha, n,
             list_reduce(list_prepend(CAST(0 AS DOUBLE), ad),
               (a, v) -> a + v) AS sx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(ad, v -> v * v)), (a, v) -> a + v) AS sxx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, CAST(n + 1 AS INTEGER)),
                 i -> ad[CAST(i AS INTEGER)]
                      * ys[CAST(i AS INTEGER)] / 100.0)),
               (a, v) -> a + v) AS sxy,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(ys, v -> v / 100.0)), (a, v) -> a + v)
               AS sy,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(ys, v -> v / 100.0 * v / 100.0)),
               (a, v) -> a + v) AS syy
      FROM sweep
    )
    SELECT round(alpha, 1) AS alpha, n AS n_days,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS slope_rev_per_adstock,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS r2
    FROM sums ORDER BY alpha
    """,
)
def adstock_lag_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adstock carryover regression (marketing-mix modeling): daily
    clicks transform through geometric adstock
    a_t = clicks_t + α·a_{{t−1}} for α ∈ {{0, 0.3, 0.6}}, and daily
    purchase revenue regresses on each transformed series — the α
    with the best R² estimates how long advertising pressure echoes
    (α=0 is the no-carryover baseline the comparison needs). The MMM
    building block, exact over counts.

    Determinism: daily counts/cents are exact integers; each adstock
    series is an append fold in day order; the OLS sums fold the
    bounded day arrays in index order.

    Scale: one map-side-combined groupBy(day); the α sweep is 3
    independent bounded folds (a grid of αs = a grid of folds — the
    per-cell-independent shape).
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("clicks"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("rev_cents"),
    )
    seq = daily.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, clicks))),"
            " s -> s.clicks)"
        ).alias("cs"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, rev_cents))),"
            " s -> s.rev_cents)"
        ).alias("ys"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    alphas = spark.createDataFrame(
        [(a,) for a in _ADSTOCK_ALPHAS], "alpha double"
    )
    sweep = seq.crossJoin(F.broadcast(alphas)).select(
        "alpha",
        "n",
        "ys",
        F.expr(
            """
            aggregate(cs, CAST(array() AS ARRAY<DOUBLE>),
              (a, c) -> concat(a, array(
                CAST(c AS DOUBLE)
                + IF(size(a) = 0, 0.0, alpha * element_at(a, -1)))))
            """
        ).alias("ad"),
    )
    sums = sweep.select(
        "alpha",
        "n",
        F.expr(
            "aggregate(ad, CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
        ).alias("sx"),
        F.expr(
            "aggregate(transform(ad, v -> v * v), CAST(0.0 AS DOUBLE),"
            " (a, v) -> a + v)"
        ).alias("sxx"),
        F.expr(
            """
            aggregate(transform(sequence(0, CAST(n - 1 AS INT)),
              i -> element_at(ad, i + 1)
                   * element_at(ys, i + 1) / 100.0),
              CAST(0.0 AS DOUBLE), (a, v) -> a + v)
            """
        ).alias("sxy"),
        F.expr(
            "aggregate(transform(ys, v -> v / 100.0),"
            " CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
        ).alias("sy"),
        F.expr(
            "aggregate(transform(ys, v -> v / 100.0 * v / 100.0),"
            " CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
        ).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return sums.select(
        F.round("alpha", 1).alias("alpha"),
        F.col("n").alias("n_days"),
        F.round(num / denx, 6).alias("slope_rev_per_adstock"),
        F.round(num * num / (denx * deny), 6).alias("r2"),
    ).orderBy("alpha")


@query(
    "geometric_retention_fit",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST((min(CAST(ts AS DATE)) - DATE '2024-01-01') // 7
               AS BIGINT) AS cohort
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id,
             CAST((CAST(e.ts AS DATE) - DATE '2024-01-01') // 7
               AS BIGINT) AS wk
      FROM events e
    ), ret AS (
      SELECT f.cohort, a.wk - f.cohort AS offset_wk,
             CAST(count(DISTINCT a.user_id) AS BIGINT) AS active
      FROM firsts f JOIN activity a ON f.user_id = a.user_id
      WHERE a.wk >= f.cohort
      GROUP BY 1, 2
    ), size_ AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS n0 FROM firsts
      GROUP BY cohort
    ), pts AS (
      SELECT r.cohort, r.offset_wk,
             ln(r.active * 1.0 / s.n0) AS lr
      FROM ret r JOIN size_ s ON r.cohort = s.cohort
      WHERE r.offset_wk >= 1 AND r.active > 0
    ), fit AS (
      SELECT cohort,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(offset_wk * lr ORDER BY offset_wk)),
               (a, v) -> a + v)
             / list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list(CAST(offset_wk * offset_wk AS DOUBLE)
                      ORDER BY offset_wk)), (a, v) -> a + v) AS lnp,
             CAST(count(*) AS BIGINT) AS n_points
      FROM pts GROUP BY cohort
    )
    SELECT f.cohort, s.n0 AS cohort_size, f.n_points,
           round(exp(f.lnp), 6) AS weekly_retention_p,
           CASE WHEN exp(f.lnp) >= 1.0 THEN NULL
                ELSE round(1.0 / (1.0 - exp(f.lnp)), 4) END
             AS expected_lifetime_wk
    FROM fit f JOIN size_ s ON f.cohort = s.cohort
    WHERE f.n_points >= 2
    ORDER BY f.cohort
    """,
)
def geometric_retention_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric retention model per signup cohort: weekly retention
    r_k ≈ p^k fitted through the origin (ln p = Σk·ln r_k / Σk²) from
    each cohort's observed weekly-active curve; expected customer
    lifetime = 1/(1−p) weeks — the one-parameter churn model that
    turns `cohort_retention`'s raw matrix into a forecastable number
    (and the sanity baseline under any fancier sBG fit).

    Determinism: cohort sizes and active counts are exact integers;
    the per-cohort fit folds offsets in order.

    Scale: first-touch and weekly-activity frames are map-side-
    combined user aggregates; the fit runs per cohort over its
    bounded offset curve.
    """
    e = load(spark, sf_dir, "events")
    wk = F.floor(
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        / 7
    ).cast("bigint")
    firsts = e.groupBy("user_id").agg(F.min(wk).alias("cohort"))
    activity = e.select("user_id", wk.alias("wk")).distinct()
    ret = (
        firsts.join(activity, "user_id")
        .filter(F.col("wk") >= F.col("cohort"))
        .groupBy("cohort", (F.col("wk") - F.col("cohort")).alias("offset_wk"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("active"))
    )
    size_ = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("n0")
    )
    pts = (
        ret.join(size_, "cohort")
        .filter((F.col("offset_wk") >= 1) & (F.col("active") > 0))
        .select(
            "cohort",
            "offset_wk",
            F.log(F.col("active") * 1.0 / F.col("n0")).alias("lr"),
        )
    )
    fit = pts.groupBy("cohort").agg(
        (
            F.expr(
                """
                aggregate(transform(array_sort(collect_list(
                    struct(offset_wk, offset_wk * lr AS vv))), s -> s.vv),
                  CAST(0.0 AS DOUBLE), (a, v) -> a + v)
                """
            )
            / F.expr(
                """
                aggregate(transform(array_sort(collect_list(
                    struct(offset_wk,
                      CAST(offset_wk * offset_wk AS DOUBLE) AS vv))),
                  s -> s.vv), CAST(0.0 AS DOUBLE), (a, v) -> a + v)
                """
            )
        ).alias("lnp"),
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
    )
    return (
        fit.join(size_, "cohort")
        .filter(F.col("n_points") >= 2)
        .select(
            "cohort",
            F.col("n0").alias("cohort_size"),
            "n_points",
            F.round(F.exp("lnp"), 6).alias("weekly_retention_p"),
            F.when(F.exp("lnp") >= 1.0, None)
            .otherwise(F.round(1.0 / (1.0 - F.exp("lnp")), 4))
            .alias("expected_lifetime_wk"),
        )
        .orderBy("cohort")
    )
