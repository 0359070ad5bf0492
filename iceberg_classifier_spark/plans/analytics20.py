"""Analytics wave 20: partial autocorrelation (Durbin-Levinson),
duplicate-payment detection, and price-ending bias.

PACF is the ARIMA order-selection diagnostic the ACF can't provide
(it cuts off at the true AR order); Durbin-Levinson computes it in
closed recursion from the ACF. Duplicate-payment detection is the
classic accounts-payable audit (same payer, same amount, days apart)
as a pure blocked equi-join. Price-ending analysis (the .99 effect)
is a chi-square against uniform cent endings — the forensic cousin of
`benford_digit_audit`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_PACF_LAGS = 7


@query(
    "pacf_durbin_levinson",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ), seq AS (
      SELECT list(x ORDER BY day) AS xs, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s1
      FROM daily
    ), dev AS (
      SELECT n, list_transform(xs, v -> CAST(v AS DOUBLE) - s1 * 1.0 / n)
               AS d
      FROM seq
    ), c0 AS (
      SELECT n, d,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(d, v -> v * v)), (a, v) -> a + v) AS c
      FROM dev
    ), acf AS (
      SELECT list_transform(range(1, {_PACF_LAGS + 1}), k ->
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(range(1, CAST(n - k + 1 AS INTEGER)),
                   i -> d[CAST(i AS INTEGER)]
                        * d[CAST(i + k AS INTEGER)])),
                 (a, v) -> a + v) / c) AS r
      FROM c0
    ), dl AS (
      SELECT r,
        list_reduce(
          list_prepend([r[1], r[1]],
            list_transform(range(2, {_PACF_LAGS + 1}),
              i -> CAST([] AS DOUBLE[]))),
          (a, v) -> list_concat(list_concat(
            list_transform(range(1, CAST((len(a)) // 2 + 1 AS INTEGER)),
              j -> a[CAST(j AS INTEGER)]
                 - ((r[CAST((len(a)) // 2 + 1 AS INTEGER)]
                     - list_reduce(list_prepend(CAST(0 AS DOUBLE),
                         list_transform(range(1,
                             CAST((len(a)) // 2 + 1 AS INTEGER)),
                           j2 -> a[CAST(j2 AS INTEGER)]
                                 * r[CAST((len(a)) // 2 + 1 - j2
                                     AS INTEGER)])),
                       (s2, t2) -> s2 + t2))
                    / (1 - list_reduce(list_prepend(CAST(0 AS DOUBLE),
                         list_transform(range(1,
                             CAST((len(a)) // 2 + 1 AS INTEGER)),
                           j2 -> a[CAST(j2 AS INTEGER)]
                                 * r[CAST(j2 AS INTEGER)])),
                       (s2, t2) -> s2 + t2)))
                   * a[CAST((len(a)) // 2 + 1 - j AS INTEGER)]),
            [(r[CAST((len(a)) // 2 + 1 AS INTEGER)]
              - list_reduce(list_prepend(CAST(0 AS DOUBLE),
                  list_transform(range(1,
                      CAST((len(a)) // 2 + 1 AS INTEGER)),
                    j2 -> a[CAST(j2 AS INTEGER)]
                          * r[CAST((len(a)) // 2 + 1 - j2 AS INTEGER)])),
                (s2, t2) -> s2 + t2))
             / (1 - list_reduce(list_prepend(CAST(0 AS DOUBLE),
                  list_transform(range(1,
                      CAST((len(a)) // 2 + 1 AS INTEGER)),
                    j2 -> a[CAST(j2 AS INTEGER)]
                          * r[CAST(j2 AS INTEGER)])),
                (s2, t2) -> s2 + t2))]),
            list_concat(
              list_slice(a, CAST((len(a)) // 2 + 1 AS INTEGER), len(a)),
              [(r[CAST((len(a)) // 2 + 1 AS INTEGER)]
                - list_reduce(list_prepend(CAST(0 AS DOUBLE),
                    list_transform(range(1,
                        CAST((len(a)) // 2 + 1 AS INTEGER)),
                      j2 -> a[CAST(j2 AS INTEGER)]
                            * r[CAST((len(a)) // 2 + 1 - j2
                                AS INTEGER)])),
                  (s2, t2) -> s2 + t2))
               / (1 - list_reduce(list_prepend(CAST(0 AS DOUBLE),
                    list_transform(range(1,
                        CAST((len(a)) // 2 + 1 AS INTEGER)),
                      j2 -> a[CAST(j2 AS INTEGER)]
                            * r[CAST(j2 AS INTEGER)])),
                  (s2, t2) -> s2 + t2))])))
          AS st
      FROM acf
    )
    SELECT g.lag_k, round(r[CAST(g.lag_k AS INTEGER)], 6) AS acf,
           round(st[CAST(len(st) // 2 + g.lag_k AS INTEGER)], 6) AS pacf
    FROM dl, (SELECT unnest(range(1, {_PACF_LAGS + 1})) AS lag_k) g
    ORDER BY g.lag_k
    """,
)
def pacf_durbin_levinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily event-count series via the
    Durbin-Levinson recursion: from the ACF r₁..r₇, each level k
    computes φ_kk = (r_k − Σφ_{{k−1,j}}r_{{k−j}})/(1 − Σφ_{{k−1,j}}r_j)
    and updates the AR coefficients — the PACF whose cutoff lag IS the
    AR order (the order-selection diagnostic next to `acf_daily_counts`
    and `ljung_box_test`). Emits ACF and PACF per lag. The fold state
    is one flat DOUBLE[] ([φ_{{k,1..k}} || pacf₁..pacf_k] — the engine's
    struct-accumulator workaround), with the half-length recovering
    both segments.

    Determinism: ACF comes from exact integer moments folded in index
    order; the recursion is identical double arithmetic at every
    level on both engines.

    Scale: per-day aggregate map-side; the recursion is k²
    constant-size arithmetic on the bounded lag frame.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    seq = daily.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, x))), s -> s.x)"
        ).alias("xs"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s1"),
    )
    dev = seq.select(
        "n",
        F.expr("transform(xs, v -> CAST(v AS DOUBLE) - s1 * 1.0 / n)").alias(
            "d"
        ),
    )
    c0 = dev.select(
        "n",
        "d",
        F.expr(
            "aggregate(transform(d, v -> v * v), CAST(0.0 AS DOUBLE),"
            " (a, v) -> a + v)"
        ).alias("c"),
    )
    acf = c0.select(
        F.expr(
            f"""
            transform(sequence(1, {_PACF_LAGS}), k ->
              aggregate(transform(sequence(0, CAST(size(d) - k - 1
                  AS INT)), i -> element_at(d, i + 1)
                    * element_at(d, CAST(i + k + 1 AS INT))),
                CAST(0.0 AS DOUBLE), (a, v) -> a + v) / c)
            """
        ).alias("r")
    )
    # Durbin-Levinson fold; Spark arrays 0-based: state a =
    # [phi_1..phi_m, pacf_1..pacf_m], m = size(a)/2; r[k-1] = r_k
    pk = """
        ((r[size(a) div 2]
          - aggregate(sequence(1, size(a) div 2), CAST(0.0 AS DOUBLE),
              (s2, j2) -> s2 + a[j2 - 1]
                          * r[size(a) div 2 - j2]))
         / (1 - aggregate(sequence(1, size(a) div 2),
              CAST(0.0 AS DOUBLE),
              (s2, j2) -> s2 + a[j2 - 1] * r[j2 - 1])))
    """
    dl = acf.select(
        "r",
        F.expr(
            f"""
            aggregate(sequence(2, {_PACF_LAGS}),
              CAST(array(r[0], r[0]) AS ARRAY<DOUBLE>),
              (a, it) -> concat(
                transform(sequence(1, size(a) div 2),
                  j -> a[j - 1] - ({pk}) * a[size(a) div 2 - j]),
                array({pk}),
                slice(a, size(a) div 2 + 1, size(a) div 2),
                array({pk})))
            """
        ).alias("st"),
    )
    lags = spark.range(1, _PACF_LAGS + 1).select(
        F.col("id").cast("bigint").alias("lag_k")
    )
    return (
        dl.crossJoin(F.broadcast(lags))
        .select(
            "lag_k",
            F.round(F.expr("r[CAST(lag_k - 1 AS INT)]"), 6).alias("acf"),
            F.round(
                F.expr("st[CAST(size(st) div 2 + lag_k - 1 AS INT)]"), 6
            ).alias("pacf"),
        )
        .orderBy("lag_k")
    )


_DUP_TOPK = 15
_DUP_DAYS = 7


@query(
    "duplicate_payment_detection",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey AS k, o_custkey AS cust,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS d
      FROM orders
    ), pairs AS (
      SELECT a.cust, a.k AS ka, b.k AS kb, a.cents,
             abs(date_diff('day', a.d, b.d)) AS day_gap
      FROM o a JOIN o b
        ON a.cust = b.cust AND a.cents = b.cents AND a.k < b.k
      WHERE abs(date_diff('day', a.d, b.d)) <= {_DUP_DAYS}
    ), summary AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(count(DISTINCT cust) AS BIGINT) AS n_customers,
             CAST(sum(cents) AS BIGINT) AS exposure_cents
      FROM pairs
    ), top AS (
      SELECT * FROM pairs
      ORDER BY cents DESC, cust, ka, kb LIMIT {_DUP_TOPK}
    )
    SELECT CAST(row_number() OVER (ORDER BY t.cents DESC, t.cust,
             t.ka, t.kb) AS INTEGER) AS rank,
           t.cust, t.ka, t.kb,
           round(t.cents / 100.0, 2) AS amount,
           CAST(t.day_gap AS BIGINT) AS day_gap,
           s.n_pairs, s.n_customers,
           round(s.exposure_cents / 100.0, 2) AS exposure_total
    FROM top t CROSS JOIN summary s
    ORDER BY rank
    """,
)
def duplicate_payment_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment audit: order pairs from the SAME customer with
    the SAME amount (exact cents) within 7 days — the accounts-payable
    red flag every audit runs first. Candidates come exclusively from
    the (customer, cents) equi-join — the blocking key makes candidate
    volume proportional to actual collisions, never |orders|². Emits
    the top-15 largest exposures plus the global pair/customer/
    exposure summary on each row.

    Determinism: amounts are exact integer cents; pairs are (ka < kb)
    ordered; top-k is (cents DESC, cust, ka, kb).

    Scale: self-equi-join on the composite blocking key with map-side
    pruning (AQE handles the skewed all-identical-amount key if a
    pathological customer appears); the summary is one aggregate of
    the collision frame; top-k is TakeOrdered.
    """
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("cust"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    a = o.alias("a")
    b = o.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cust") == F.col("b.cust"))
            & (F.col("a.cents") == F.col("b.cents"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .filter(
            F.abs(F.datediff(F.col("a.d"), F.col("b.d"))) <= _DUP_DAYS
        )
        .select(
            F.col("a.cust").alias("cust"),
            F.col("a.k").alias("ka"),
            F.col("b.k").alias("kb"),
            F.col("a.cents").alias("cents"),
            F.abs(F.datediff(F.col("a.d"), F.col("b.d")))
            .cast("bigint")
            .alias("day_gap"),
        )
    )
    summary = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.countDistinct("cust").cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("exposure_cents"),
    )
    top = pairs.orderBy(F.desc("cents"), "cust", "ka", "kb").limit(
        _DUP_TOPK
    )
    return (
        top.crossJoin(F.broadcast(summary))
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("cents"), "cust", "ka", "kb"))
            .cast("int")
            .alias("rank"),
            "cust",
            "ka",
            "kb",
            F.round(F.col("cents") / 100.0, 2).alias("amount"),
            "day_gap",
            "n_pairs",
            "n_customers",
            F.round(F.col("exposure_cents") / 100.0, 2).alias(
                "exposure_total"
            ),
        )
        .orderBy("rank")
    )


@query(
    "price_ending_bias",
    oracle="""
    WITH endings AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 100 AS ending,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ), nt AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt FROM endings
    ), tot AS (
      -- chi2 = sum (n_i - N/100)^2 / (N/100) = S / (100 N) with
      -- S = sum (100 n_i - N)^2 exact; round half-up to 4dp in integers:
      -- r = (20000 S + 100 N) div (200 N)
      SELECT max(x.nt) AS nt,
             (20000 * sum(CAST(100 * e.n - x.nt AS HUGEINT)
                          * (100 * e.n - x.nt)) + 100 * max(x.nt))
               // (200 * max(x.nt)) AS r4
      FROM endings e CROSS JOIN nt x
    ), top AS (
      SELECT ending, n FROM endings
      ORDER BY n DESC, ending LIMIT 10
    )
    SELECT CAST(row_number() OVER (ORDER BY t.n DESC, t.ending)
             AS INTEGER) AS rank,
           t.ending, t.n,
           CAST(t.n * 1000000 // s.nt AS BIGINT) AS share_ppm,
           CAST(10000 AS BIGINT) AS uniform_ppm,
           CAST(s.r4 AS DOUBLE) / 10000 AS chi2_all_endings,
           CASE WHEN s.r4 > 1232250 THEN 1 ELSE 0 END AS reject_05
    FROM top t CROSS JOIN tot s
    ORDER BY rank
    """,
)
def price_ending_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-ending forensics: the distribution of cent endings (0–99)
    of order totals, χ²₉₉-tested against uniform (95% critical value
    123.225) with the top-10 most common endings — the psychological-
    pricing / fabricated-amount screen that complements
    `benford_digit_audit` (leading digits) with trailing-digit
    structure (real charges spread endings; invented and .99-priced
    amounts don't).

    Determinism: ending counts are exact integers; χ² uses the exact
    closed form S/(100N) with S = Σ(100·nᵢ − N)² kept in wide integers
    (decimal(38,0) / HUGEINT) and HALF_UP-rounded to 4dp by integer
    division — order-independent and engine-exact, no double fold at a
    representation boundary (the r4→r5 sf0.01 sweep caught the old
    float fold landing on a 4dp half); shares are integer ppm.

    Scale: one map-side-combined groupBy over a map-side expression;
    the test runs on the 100-row ending dimension; top-10 is
    TakeOrdered.
    """
    o = load(spark, sf_dir, "orders")
    endings = o.groupBy(
        (F.expr("CAST(round(o_totalprice * 100) AS BIGINT)") % 100).alias(
            "ending"
        )
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    nt1 = endings.agg(F.sum("n").cast("bigint").alias("nt"))
    tot = (
        endings.crossJoin(F.broadcast(nt1))
        .agg(
            F.max("nt").alias("nt"),
            F.sum(
                (100 * F.col("n") - F.col("nt")).cast("decimal(38,0)")
                * (100 * F.col("n") - F.col("nt"))
            ).alias("s2"),
        )
        .select(
            "nt",
            F.expr(
                "CAST((20000 * s2 + 100 * nt) div (200 * nt) AS BIGINT)"
            ).alias("r4"),
        )
    )
    top = endings.orderBy(F.desc("n"), "ending").limit(10)
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("n"), "ending"))
            .cast("int")
            .alias("rank"),
            "ending",
            "n",
            F.expr("CAST(n * 1000000 div nt AS BIGINT)").alias(
                "share_ppm"
            ),
            F.lit(10000).cast("bigint").alias("uniform_ppm"),
            (F.col("r4").cast("double") / 10000).alias("chi2_all_endings"),
            F.when(F.col("r4") > 1232250, 1)
            .otherwise(0)
            .alias("reject_05"),
        )
        .orderBy("rank")
    )
