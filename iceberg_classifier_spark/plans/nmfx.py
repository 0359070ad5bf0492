"""Factorization/inequality wave 57: in-engine NMF and the Lorenz
curve.

- `nmf_multiplicative_updates` — rank-2 non-negative matrix
  factorization of the (segment x year) revenue matrix by 6 rounds
  of Lee-Seung multiplicative updates executed as query stages
  (H <- H (W'V)/(W'WH), W <- W (VH')/(WHH')), from a deterministic
  asymmetric init; emits the H factor and the Frobenius
  reconstruction fit. Spark truncates the per-round lineage with
  localCheckpoint — the standard iterative-algorithm pattern MLlib
  uses internally — because each update consumes W and H multiple
  times (caching alone leaves an exponентial logical plan).
- `lorenz_curve_deciles` — the Lorenz curve of customer revenue at
  decile resolution from a bounded $1k-cell histogram: cumulative
  population share vs cumulative revenue share, the curve behind
  `inequality_indices`' scalars.

Determinism: the revenue matrix and histogram are exact int64; NMF
updates are identical closed forms over <=7-term sums (outputs 5dp
for the 6-round division chains); Lorenz points are exact integer
prefix ratios.

Scale: NMF's data pass is ONE aggregation to the 35-cell matrix;
all factor algebra is on 10/14-row frames. Lorenz reduces customers
to the bounded revenue-cell histogram; the decile walk is a prefix
window over those cells only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_NMF_R = 2
_NMF_ITERS = 6


def _nmf_oracle() -> str:
    head = """
    WITH v AS MATERIALIZED (
      SELECT CAST(dense_rank() OVER (ORDER BY seg) AS BIGINT) AS i,
             yr - 1991 AS j, val
      FROM (
        SELECT c.c_mktsegment AS seg,
               CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS yr,
               sum(CAST(round(o.o_totalprice) AS BIGINT)) / 1000000.0
                 AS val
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
      )
    ), w0 AS MATERIALIZED (
      SELECT i, k, 1.0 + 0.1 * ((i + k) % 3) AS w
      FROM (SELECT DISTINCT i FROM v)
      CROSS JOIN (SELECT unnest(generate_series(1, 2)) AS k)
    ), h0 AS MATERIALIZED (
      SELECT k, j, 1.0 + 0.1 * ((k + j) % 2) AS h
      FROM (SELECT DISTINCT j FROM v)
      CROSS JOIN (SELECT unnest(generate_series(1, 2)) AS k)
    )"""
    steps = []
    for t in range(1, _NMF_ITERS + 1):
        p = t - 1
        steps.append(f"""
    , wtv{t} AS MATERIALIZED (
      SELECT w.k, v.j, sum(w.w * v.val) AS x
      FROM w{p} w JOIN v ON v.i = w.i GROUP BY 1, 2
    ), wtw{t} AS MATERIALIZED (
      SELECT a.k AS k1, b.k AS k2, sum(a.w * b.w) AS x
      FROM w{p} a JOIN w{p} b ON a.i = b.i GROUP BY 1, 2
    ), wtwh{t} AS MATERIALIZED (
      SELECT m.k1 AS k, h.j, sum(m.x * h.h) AS x
      FROM wtw{t} m JOIN h{p} h ON h.k = m.k2 GROUP BY 1, 2
    ), h{t} AS MATERIALIZED (
      SELECT h.k, h.j, h.h * n.x / d.x AS h
      FROM h{p} h
      JOIN wtv{t} n ON n.k = h.k AND n.j = h.j
      JOIN wtwh{t} d ON d.k = h.k AND d.j = h.j
    ), vht{t} AS MATERIALIZED (
      SELECT v.i, h.k, sum(v.val * h.h) AS x
      FROM v JOIN h{t} h ON h.j = v.j GROUP BY 1, 2
    ), hht{t} AS MATERIALIZED (
      SELECT a.k AS k1, b.k AS k2, sum(a.h * b.h) AS x
      FROM h{t} a JOIN h{t} b ON a.j = b.j GROUP BY 1, 2
    ), whht{t} AS MATERIALIZED (
      SELECT w.i, m.k2 AS k, sum(w.w * m.x) AS x
      FROM w{p} w JOIN hht{t} m ON m.k1 = w.k GROUP BY 1, 2
    ), w{t} AS MATERIALIZED (
      SELECT w.i, w.k, w.w * n.x / d.x AS w
      FROM w{p} w
      JOIN vht{t} n ON n.i = w.i AND n.k = w.k
      JOIN whht{t} d ON d.i = w.i AND d.k = w.k
    )""")
    last = _NMF_ITERS
    return head + "".join(steps) + f"""
    , recon AS MATERIALIZED (
      SELECT v.i, v.j, v.val,
             sum(w.w * h.h) AS vhat
      FROM v JOIN w{last} w ON w.i = v.i
      JOIN h{last} h ON h.j = v.j AND h.k = w.k
      GROUP BY 1, 2, 3
    ), fit AS (
      SELECT sqrt(sum(pow(val - vhat, 2))) AS err,
             sqrt(sum(val * val)) AS nrm
      FROM recon
    )
    SELECT h.k AS factor, h.j AS year_idx,
           round(h.h, 5) AS h_value,
           round(fit.err, 5) AS recon_error,
           round(1.0 - pow(fit.err / fit.nrm, 2), 6) AS fit_fraction
    FROM h{last} h CROSS JOIN fit
    ORDER BY factor, year_idx
    """


@query("nmf_multiplicative_updates", oracle=_nmf_oracle())
def nmf_multiplicative_updates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rank-{_NMF_R} non-negative matrix factorization of the
    (segment x year) revenue matrix ($M units) by {_NMF_ITERS}
    Lee-Seung multiplicative update rounds run as query stages:
    H <- H (W'V)/(W'WH) then W <- W (VH')/(WHH'), from the
    deterministic asymmetric init W = 1 + 0.1((i+k) mod 3),
    H = 1 + 0.1((k+j) mod 2). Emits the year-factor matrix H and
    the Frobenius fit 1 - (err/||V||)^2 — parts-based additive
    structure (no cancellation), which PCA/eigen methods cannot
    give; the factorization complement of `power_iteration_top_eigen`
    and `mllib_pca`.

    Determinism: V is exact integer dollars scaled to $M; every
    update is an identical closed form over <=7-term sums; the
    update sequence is identical in both engines, outputs 5dp.

    Scale: ONE data pass aggregates the fact table to the 35-cell
    matrix; all factor algebra runs on 10/14-row frames. Each round
    consumes W and H several times, so Spark truncates lineage with
    eager localCheckpoint per round (the MLlib iterative pattern) —
    without it the logical plan grows exponentially even though the
    data is tiny.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    v = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.year(F.col("o_orderdate").cast("date"))
            .cast("bigint")
            .alias("yr"),
        )
        .agg(
            (
                F.sum(F.round(F.col("o_totalprice")).cast("bigint"))
                / 1000000.0
            ).alias("val")
        )
        .select(
            F.dense_rank()
            .over(Window.orderBy("seg"))
            .cast("bigint")
            .alias("i"),
            (F.col("yr") - 1991).alias("j"),
            "val",
        )
        .localCheckpoint(eager=True)
    )
    ks = spark.range(1, _NMF_R + 1).select(F.col("id").alias("k"))
    w = (
        v.select("i")
        .distinct()
        .crossJoin(F.broadcast(ks))
        .select("i", "k", (1.0 + 0.1 * ((F.col("i") + F.col("k")) % 3)).alias("w"))
        .localCheckpoint(eager=True)
    )
    h = (
        v.select("j")
        .distinct()
        .crossJoin(F.broadcast(ks))
        .select("k", "j", (1.0 + 0.1 * ((F.col("k") + F.col("j")) % 2)).alias("h"))
        .localCheckpoint(eager=True)
    )
    for _ in range(_NMF_ITERS):
        wtv = (
            w.join(v, "i")
            .groupBy("k", "j")
            .agg(F.sum(F.col("w") * F.col("val")).alias("x"))
        )
        wtw = (
            w.alias("a")
            .join(w.alias("b"), F.col("a.i") == F.col("b.i"))
            .groupBy(
                F.col("a.k").alias("k1"), F.col("b.k").alias("k2")
            )
            .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("x"))
        )
        wtwh = (
            wtw.join(h.withColumnRenamed("k", "k2"), "k2")
            .groupBy(F.col("k1").alias("k"), "j")
            .agg(F.sum(F.col("x") * F.col("h")).alias("x"))
        )
        h = (
            h.join(
                wtv.withColumnRenamed("x", "num"), ["k", "j"]
            )
            .join(wtwh.withColumnRenamed("x", "den"), ["k", "j"])
            .select(
                "k",
                "j",
                (F.col("h") * F.col("num") / F.col("den")).alias("h"),
            )
            .localCheckpoint(eager=True)
        )
        vht = (
            v.join(h, "j")
            .groupBy("i", "k")
            .agg(F.sum(F.col("val") * F.col("h")).alias("x"))
        )
        hht = (
            h.alias("a")
            .join(h.alias("b"), F.col("a.j") == F.col("b.j"))
            .groupBy(
                F.col("a.k").alias("k1"), F.col("b.k").alias("k2")
            )
            .agg(F.sum(F.col("a.h") * F.col("b.h")).alias("x"))
        )
        whht = (
            w.withColumnRenamed("k", "k1")
            .join(hht, "k1")
            .groupBy("i", F.col("k2").alias("k"))
            .agg(F.sum(F.col("w") * F.col("x")).alias("x"))
        )
        w = (
            w.join(vht.withColumnRenamed("x", "num"), ["i", "k"])
            .join(whht.withColumnRenamed("x", "den"), ["i", "k"])
            .select(
                "i",
                "k",
                (F.col("w") * F.col("num") / F.col("den")).alias("w"),
            )
            .localCheckpoint(eager=True)
        )
    recon = (
        v.join(w, "i")
        .join(h, ["k", "j"])
        .groupBy("i", "j", "val")
        .agg(F.sum(F.col("w") * F.col("h")).alias("vhat"))
    )
    fit = recon.agg(
        F.sqrt(F.sum(F.pow(F.col("val") - F.col("vhat"), 2))).alias("err"),
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nrm"),
    )
    return (
        h.crossJoin(F.broadcast(fit))
        .select(
            F.col("k").alias("factor"),
            F.col("j").alias("year_idx"),
            F.round("h", 5).alias("h_value"),
            F.round("err", 5).alias("recon_error"),
            F.round(
                1.0 - F.pow(F.col("err") / F.col("nrm"), 2), 6
            ).alias("fit_fraction"),
        )
        .orderBy("factor", "year_idx")
    )


@query(
    "lorenz_curve_deciles",
    oracle="""
    WITH crev AS (
      SELECT o_custkey,
             CAST(round(CAST(sum(CAST(round(o_totalprice) AS BIGINT))
               AS DOUBLE) / 1000.0) AS BIGINT) AS rk
      FROM orders GROUP BY 1
    ), hist AS (
      SELECT rk AS val, CAST(count(*) AS BIGINT) AS n
      FROM crev GROUP BY 1
    ), pre AS (
      SELECT val, n,
             CAST(sum(n) OVER (ORDER BY val) AS BIGINT) AS cum_n,
             CAST(sum(n * val) OVER (ORDER BY val) AS BIGINT)
               AS cum_s,
             CAST(sum(n) OVER () AS BIGINT) AS nn,
             CAST(sum(n * val) OVER () AS BIGINT) AS ss
      FROM hist
    ), dec AS (
      SELECT d,
             max(CASE WHEN cum_n * 10 <= d * nn THEN cum_s
                 ELSE 0 END) AS below_s
      FROM pre CROSS JOIN (
        SELECT unnest(generate_series(1, 10)) AS d)
      GROUP BY d
    )
    SELECT CAST(d.d AS BIGINT) AS decile,
           round(d.d / 10.0, 6) AS pop_share,
           round(d.below_s * 1.0 / (SELECT max(ss) FROM pre), 6)
             AS revenue_share,
           round(d.d / 10.0
                 - d.below_s * 1.0 / (SELECT max(ss) FROM pre), 6)
             AS gap
    FROM dec d ORDER BY decile
    """,
)
def lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lorenz curve of per-customer revenue at decile resolution:
    for each population share d/10 (customers ordered poorest-first
    by $1k-quantized revenue), the cumulative revenue share held —
    the curve whose area defect IS `inequality_indices`' Gini, here
    emitted as the 10 plottable points plus the equality gap. Points
    are cell-exact: a decile takes the cumulative revenue of all
    histogram cells fully inside it (the conservative step-function
    reading, identical in both engines).

    Determinism: the histogram and all prefix sums are exact int64;
    shares are single divisions rounded 6dp.

    Scale: one shuffle to per-customer revenue, map-side combine to
    the bounded $1k-cell histogram; the decile walk is a prefix
    window over those cells crossed with a fixed 10-row dimension.
    """
    o = load(spark, sf_dir, "orders")
    crev = o.groupBy("o_custkey").agg(
        F.expr(
            "CAST(round(CAST(sum(CAST(round(o_totalprice) AS BIGINT))"
            " AS DOUBLE) / 1000.0) AS BIGINT)"
        ).alias("rk")
    )
    hist = crev.groupBy(F.col("rk").alias("val")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wcum = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pre = hist.select(
        "val",
        "n",
        F.sum("n").over(wcum).cast("bigint").alias("cum_n"),
        F.sum(F.col("n") * F.col("val")).over(wcum).cast("bigint").alias("cum_s"),
        F.sum("n").over(wall).cast("bigint").alias("nn"),
        F.sum(F.col("n") * F.col("val")).over(wall).cast("bigint").alias("ss"),
    )
    ds = spark.range(1, 11).select(F.col("id").alias("d"))
    dec = (
        pre.crossJoin(F.broadcast(ds))
        .groupBy("d")
        .agg(
            F.max(
                F.when(
                    F.col("cum_n") * 10 <= F.col("d") * F.col("nn"),
                    F.col("cum_s"),
                ).otherwise(0)
            ).alias("below_s"),
            F.max("ss").alias("ss"),
        )
    )
    return dec.select(
        F.col("d").cast("bigint").alias("decile"),
        F.round(F.col("d") / 10.0, 6).alias("pop_share"),
        F.round(F.col("below_s") * 1.0 / F.col("ss"), 6).alias(
            "revenue_share"
        ),
        F.round(
            F.col("d") / 10.0 - F.col("below_s") * 1.0 / F.col("ss"), 6
        ).alias("gap"),
    ).orderBy("decile")
