"""Warehouse + applied-statistics breadth: RFM segmentation, exact
largest-remainder proration, weighted medians, Welch's t-test, a Benford
first-digit audit, CDC snapshot reconciliation with bucket checksums, a
point-in-time SCD2 join, and a Markov event-transition matrix.

Every op follows the repo's exactness discipline: money flows as integer
cents, ranks/quantiles carry deterministic tiebreaks, and any float math is
a fixed formula over exact integer aggregates evaluated identically in both
engines, so 6-dp rounding is bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_O_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"
_L_CENTS = "CAST(round(l_extendedprice * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------


def _distributed_ntile(df: DataFrame, nb: int, sort_cols, out: str) -> DataFrame:
    """Exact ``ntile(nb) OVER (ORDER BY sort_cols)`` without the
    single-partition sort ``WindowExec`` would use: range-repartition on the
    sort key (a parallel sampled range shuffle, the same primitive a
    distributed ORDER BY uses), rank locally inside each ordered range, then
    add per-partition row-count offsets — a #partitions-sized driver fetch,
    scale-independent. The rank→bucket map is then pure arithmetic
    (first ``n % nb`` buckets hold ``n div nb + 1`` rows), so the bucket
    assignment is bit-identical to the oracle's ntile for any total order
    (sort_cols must end in a unique tiebreak so no ties straddle ranges).
    """
    d = df.repartitionByRange(*sort_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    d = d.localCheckpoint(eager=False)  # pin partitioning: count + rank reuse it
    counts = sorted(
        (r["_pid"], r["c"])
        for r in d.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    total = sum(c for _, c in counts)
    offs, acc = [], 0
    for pid, c in counts:
        offs.append((pid, acc))
        acc += c
    off = F.broadcast(
        d.sparkSession.createDataFrame(offs, "pid int, _off bigint")
    )
    q, r = divmod(total, nb) if total else (0, 0)
    rank = (
        F.row_number().over(Window.partitionBy("_pid").orderBy(*sort_cols))
        + F.col("_off")
    )
    d = d.join(off, d["_pid"] == off["pid"]).withColumn("_rk", rank)
    first_block = r * (q + 1)
    bucket = F.when(
        F.col("_rk") <= first_block, F.ceil(F.col("_rk") / (q + 1))
    ).otherwise(r + F.ceil((F.col("_rk") - first_block) / F.greatest(F.lit(q), F.lit(1))))
    return d.withColumn(out, bucket.cast("int")).drop("_pid", "pid", "_off", "_rk")


@query(
    "rfm_segments",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey AS ck,
             date_diff('day', CAST(max(o_orderdate) AS DATE),
                       (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
               AS recency_days,
             count(*) AS frequency,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ), scored AS (
      SELECT recency_days, frequency, cents,
             ntile(5) OVER (ORDER BY recency_days, ck) AS r_q,
             ntile(5) OVER (ORDER BY frequency DESC, ck) AS f_q,
             ntile(5) OVER (ORDER BY cents DESC, ck) AS m_q
      FROM per_cust
    )
    SELECT r_q, f_q, m_q, count(*) AS n_customers,
           round(sum(cents) / 100.0, 2) AS total_monetary,
           round(avg(recency_days), 2) AS avg_recency_days
    FROM scored GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: score every customer 1-5 on Recency (days since
    last order, vs the corpus max date), Frequency (order count) and
    Monetary (lifetime cents), then report segment sizes and value — the
    classic CRM cube (5×5×5) marketing teams drive campaigns from.

    Scale: the fact-sized work is one groupBy(custkey) with map-side
    combine. The three quintile assignments are exact ntile semantics but
    run as range-repartitioned two-phase ranks (``_distributed_ntile``):
    a parallel range shuffle + per-partition row_number + broadcast
    offsets — no single-partition WindowExec sort, so hundreds of millions
    of customers rank in parallel. Tiebreak by custkey makes every
    quintile assignment deterministic.
    """
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.expr(_O_CENTS)).alias("cents"),
    )
    # corpus max date: 1-row aggregate broadcast into the frame (no
    # unpartitioned window max, which would single-partition the customers)
    maxd = per_cust.agg(F.max("last_order").alias("_corpus_max"))
    scored = per_cust.crossJoin(F.broadcast(maxd)).withColumn(
        "recency_days", F.datediff(F.col("_corpus_max"), F.col("last_order"))
    )
    scored = _distributed_ntile(scored, 5, [F.col("recency_days").asc(), F.col("ck").asc()], "r_q")
    scored = _distributed_ntile(scored, 5, [F.col("frequency").desc(), F.col("ck").asc()], "f_q")
    scored = _distributed_ntile(scored, 5, [F.col("cents").desc(), F.col("ck").asc()], "m_q")
    return (
        scored.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("cents") / 100.0, 2).alias("total_monetary"),
            F.round(F.avg("recency_days"), 2).alias("avg_recency_days"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


# ---------------------------------------------------------------------------
# Largest-remainder proration (exact integer allocation)
# ---------------------------------------------------------------------------

@query(
    "proration_largest_remainder",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem
    ), j AS (
      SELECT o.o_orderkey, o.o_orderpriority, li.l_linenumber,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS header, li.c,
             sum(li.c) OVER (PARTITION BY o.o_orderkey) AS t
      FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
    ), base AS (
      SELECT *, header * c // t AS base_alloc,
             row_number() OVER (
               PARTITION BY o_orderkey
               ORDER BY header * c % t DESC, l_linenumber) AS rem_rank,
             header - sum(header * c // t) OVER (PARTITION BY o_orderkey)
               AS deficit
      FROM j
    ), alloc AS (
      SELECT o_orderkey, o_orderpriority,
             base_alloc + CASE WHEN rem_rank <= deficit THEN 1 ELSE 0 END
               AS alloc, header
      FROM base
    ), per_order AS (
      SELECT o_orderkey, o_orderpriority, sum(alloc) AS order_alloc,
             any_value(header) AS header, count(*) AS n_lines
      FROM alloc GROUP BY 1, 2
    )
    SELECT o_orderpriority, count(*) AS n_orders,
           CAST(sum(n_lines) AS BIGINT) AS n_lines,
           round(sum(order_alloc) / 100.0, 2) AS allocated_total,
           CAST(sum(CASE WHEN order_alloc = header THEN 1 ELSE 0 END)
                AS BIGINT) AS n_conserved
    FROM per_order GROUP BY 1 ORDER BY o_orderpriority
    """,
)
def proration_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allocate each order's header total across its line items
    proportionally to line price using the largest-remainder method: floor
    the proportional integer shares, then hand the leftover cents to the
    lines with the largest remainders (linenumber tiebreak). Conservation
    is exact — every order's allocations sum to its header total to the
    cent, the property naive `round(share)` allocation violates — and
    n_conserved == n_orders proves it.

    Scale: one equi-join orders⋈lineitem (broadcastable header side if
    pre-filtered) plus two windows partitioned by orderkey — narrow state
    per key (lines per order is bounded), no global sort. All arithmetic
    is int64 (header·cents products stay < 2^63 at any realistic price).
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.expr(_L_CENTS).alias("c")
    )
    j = (
        o.select("o_orderkey", "o_orderpriority", F.expr(_O_CENTS).alias("header"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .withColumn("t", F.sum("c").over(Window.partitionBy("o_orderkey")))
    )
    wk = Window.partitionBy("o_orderkey")
    base = j.select(
        "o_orderkey",
        "o_orderpriority",
        "header",
        F.expr("header * c div t").alias("base_alloc"),
        F.row_number()
        .over(
            wk.orderBy(F.desc(F.expr("header * c % t")), "l_linenumber")
        )
        .alias("rem_rank"),
        (F.col("header") - F.sum(F.expr("header * c div t")).over(wk)).alias(
            "deficit"
        ),
    )
    alloc = base.select(
        "o_orderkey",
        "o_orderpriority",
        "header",
        (
            F.col("base_alloc")
            + (F.col("rem_rank") <= F.col("deficit")).cast("bigint")
        ).alias("alloc"),
    )
    per_order = alloc.groupBy("o_orderkey", "o_orderpriority").agg(
        F.sum("alloc").alias("order_alloc"),
        F.any_value("header").alias("header"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return (
        per_order.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_lines").alias("n_lines"),
            F.round(F.sum("order_alloc") / 100.0, 2).alias("allocated_total"),
            F.sum(
                (F.col("order_alloc") == F.col("header")).cast("bigint")
            ).alias("n_conserved"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Weighted median (quantity-weighted price per return flag)
# ---------------------------------------------------------------------------

@query(
    "weighted_median_price",
    oracle="""
    WITH li AS (
      SELECT l_returnflag AS rf,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
             CAST(round(l_quantity) AS BIGINT) AS w,
             l_orderkey, l_linenumber
      FROM lineitem
    ), cum AS (
      SELECT rf, c, w,
             sum(w) OVER (PARTITION BY rf
                          ORDER BY c, l_orderkey, l_linenumber) AS cw,
             sum(w) OVER (PARTITION BY rf) AS tw
      FROM li
    )
    SELECT rf, round(min(CASE WHEN 2 * cw >= tw THEN c END) / 100.0, 2)
             AS weighted_median_price,
           CAST(any_value(tw) AS BIGINT) AS total_qty
    FROM cum GROUP BY rf ORDER BY rf
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median line price per return flag: the smallest
    price where the cumulative quantity reaches half the group's total —
    the 'typical unit's price', robust to a few huge-quantity outliers in
    a way the plain median of line rows is not.

    Exact by construction: prices are integer cents, weights integer
    units, and the half-total test is `2·cw ≥ tw` in int64 (no float
    division), with a (price, orderkey, linenumber) total order so the
    running sum is identical in any engine.

    Scale: one window sort per flag group (3 groups) — at extreme group
    width this becomes the classic distributed weighted-quantile: per
    partition weight histograms merged on the driver, or an
    approx_percentile pre-pass to bracket the median before an exact
    second pass over one narrow value range.
    """
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        F.expr(_L_CENTS).alias("c"),
        F.round("l_quantity").cast("bigint").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    wrf = Window.partitionBy("rf")
    cum = li.select(
        "rf",
        "c",
        F.sum("w").over(wrf.orderBy("c", "l_orderkey", "l_linenumber")).alias("cw"),
        F.sum("w").over(wrf).alias("tw"),
    )
    return (
        cum.groupBy("rf")
        .agg(
            F.round(
                F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("c")))
                / 100.0,
                2,
            ).alias("weighted_median_price"),
            F.any_value("tw").alias("total_qty"),
        )
        .orderBy("rf")
    )


# ---------------------------------------------------------------------------
# Welch's t-test from exact integer moments
# ---------------------------------------------------------------------------

@query(
    "welch_ttest_priority",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority AS grp, count(*) AS n,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sx,
             sum(CAST(round(o_totalprice * 100) AS HUGEINT)
                 * CAST(round(o_totalprice * 100) AS BIGINT)) AS sxx
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT sum(n) AS n, sum(sx) AS sx, sum(sxx) AS sxx FROM m
    ), pair AS (
      SELECT m.grp, m.n AS n1, m.sx AS sx1, m.sxx AS sxx1,
             tot.n - m.n AS n2, tot.sx - m.sx AS sx2, tot.sxx - m.sxx AS sxx2
      FROM m, tot
    ), st AS (
      SELECT grp, n1, n2,
             sx1 * 1.0 / n1 AS m1, sx2 * 1.0 / n2 AS m2,
             (sxx1 - sx1 * 1.0 / n1 * sx1) / (n1 - 1) AS v1,
             (sxx2 - sx2 * 1.0 / n2 * sx2) / (n2 - 1) AS v2
      FROM pair
    )
    SELECT grp, CAST(n1 AS BIGINT) AS n_group,
           round(m1 / 100.0, 2) AS mean_group,
           round(m2 / 100.0, 2) AS mean_rest,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
                 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                    + (v2 / n2) * (v2 / n2) / (n2 - 1)), 4) AS welch_df
    FROM st ORDER BY grp
    """,
)
def welch_ttest_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test of mean order value, each priority
    class vs the rest of the book — the A/B-test statistic every
    experimentation platform computes, done the distributed way: one scan
    collects exact integer moment sums (n, Σx, Σx²) per group, the
    complement group's moments come from total−group (no second scan),
    and the t statistic + Welch–Satterthwaite df are a fixed double
    formula over those exact integers — bit-reproducible across engines.

    Scale: the only fact-sized work is a 5-group moment aggregation with
    map-side combine; everything after runs on 5 rows. Adding covariates
    = more moment columns, never more passes.
    """
    o = load(spark, sf_dir, "orders")
    # Σx² would overflow int64 (ANSI mode errors; DuckDB widens to int128),
    # so the second moment rides as exact decimal(38,0) — same integers,
    # identical nearest-double conversion at the formula edge.
    m = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(_O_CENTS)).alias("sx"),
        F.sum(
            F.expr(
                f"CAST({_O_CENTS} AS DECIMAL(19,0))"
                f" * CAST({_O_CENTS} AS DECIMAL(19,0))"
            )
        ).alias("sxx"),
    )
    # complement-group moments from global window sums over the 5-row
    # aggregate (total − group) — one scan of orders, no self-join
    wall = Window.partitionBy()
    pair = m.select(
        "grp",
        F.col("n").alias("n1"),
        F.col("sx").alias("sx1"),
        F.col("sxx").alias("sxx1"),
        (F.sum("n").over(wall) - F.col("n")).alias("n2"),
        (F.sum("sx").over(wall) - F.col("sx")).alias("sx2"),
        (F.sum("sxx").over(wall) - F.col("sxx")).alias("sxx2"),
    )
    st = pair.select(
        "grp",
        "n1",
        "n2",
        (F.col("sx1") * 1.0 / F.col("n1")).alias("m1"),
        (F.col("sx2") * 1.0 / F.col("n2")).alias("m2"),
        (
            (F.col("sxx1") - F.col("sx1") * 1.0 / F.col("n1") * F.col("sx1"))
            / (F.col("n1") - 1)
        ).alias("v1"),
        (
            (F.col("sxx2") - F.col("sx2") * 1.0 / F.col("n2") * F.col("sx2"))
            / (F.col("n2") - 1)
        ).alias("v2"),
    )
    se2_1 = F.col("v1") / F.col("n1")
    se2_2 = F.col("v2") / F.col("n2")
    return st.select(
        "grp",
        F.col("n1").alias("n_group"),
        F.round(F.col("m1") / 100.0, 2).alias("mean_group"),
        F.round(F.col("m2") / 100.0, 2).alias("mean_rest"),
        F.round(
            (F.col("m1") - F.col("m2")) / F.sqrt(se2_1 + se2_2), 6
        ).alias("t_stat"),
        F.round(
            (se2_1 + se2_2)
            * (se2_1 + se2_2)
            / (
                se2_1 * se2_1 / (F.col("n1") - 1)
                + se2_2 * se2_2 / (F.col("n2") - 1)
            ),
            4,
        ).alias("welch_df"),
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

@query(
    "benford_digit_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders
      WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0
    ), c AS (
      SELECT digit, count(*) AS n, sum(count(*)) OVER () AS total
      FROM d GROUP BY 1
    ), t AS (
      SELECT digit, n, total,
             sum((n - total * log10(1 + 1.0 / digit))
                 * (n - total * log10(1 + 1.0 / digit))
                 / (total * log10(1 + 1.0 / digit)))
               OVER (ORDER BY digit
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS chi2_cum
      FROM c
    )
    SELECT digit, n, round(n * 1.0 / total, 6) AS observed_share,
           round(log10(1 + 1.0 / digit), 6) AS benford_share,
           round(max(chi2_cum) OVER (), 4) AS chi2_stat
    FROM t ORDER BY digit
    """,
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: distribution of the first
    significant digit vs the log10(1+1/d) law, with the χ² goodness-of-fit
    statistic — the standard forensic-accounting screen for fabricated
    amounts. The digit is extracted from the integer-cents STRING (never
    float log/pow, whose pow(10, floor(log10 x)) edge cases differ across
    engines); the only floats are the fixed Benford constants. The χ² sum
    accumulates in digit order via an ordered cumulative window (its max =
    the full ordered sum, since every term is ≥0) — an unordered 9-term
    float SUM would make the rounding depend on engine partition order.

    Scale: a 9-bucket aggregation with map-side combine — one scan,
    tiny result, trivially partition-parallel.
    """
    o = load(spark, sf_dir, "orders")
    d = o.select(F.expr(_O_CENTS).alias("cents")).filter(
        F.col("cents") > 0
    ).select(F.substring(F.col("cents").cast("string"), 1, 1).cast("bigint").alias("digit"))
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n")).withColumn(
        "total", F.sum("n").over(Window.partitionBy())
    )
    exp_n = F.col("total") * F.log10(1 + 1.0 / F.col("digit"))
    wcum = Window.orderBy("digit").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = c.withColumn(
        "chi2_cum",
        F.sum((F.col("n") - exp_n) * (F.col("n") - exp_n) / exp_n).over(wcum),
    )
    return t.select(
        "digit",
        "n",
        F.round(F.col("n") * 1.0 / F.col("total"), 6).alias("observed_share"),
        F.round(F.log10(1 + 1.0 / F.col("digit")), 6).alias("benford_share"),
        F.round(F.max("chi2_cum").over(Window.partitionBy()), 4).alias(
            "chi2_stat"
        ),
    ).orderBy("digit")


# ---------------------------------------------------------------------------
# CDC snapshot diff with per-bucket checksums
# ---------------------------------------------------------------------------

_V2_SQL = """
      SELECT o_orderkey AS k,
             CAST(round(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 13 = 0 THEN 500 ELSE 0 END AS cents
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000,
             CAST(round(o_totalprice * 100) AS BIGINT) + 7
      FROM orders WHERE o_orderkey % 89 = 0
"""


@query(
    "snapshot_diff_checksum",
    oracle=f"""
    WITH v1 AS (
      SELECT o_orderkey AS k,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), v2 AS ({_V2_SQL}
    ), d AS (
      SELECT coalesce(v1.k, v2.k) AS k, v1.cents AS c1, v2.cents AS c2
      FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
    )
    SELECT k % 8 AS bucket,
           CAST(sum(CASE WHEN c2 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_deleted,
           CAST(sum(CASE WHEN c1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_inserted,
           CAST(sum(CASE WHEN c1 IS NOT NULL AND c2 IS NOT NULL
                         AND c1 <> c2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_updated,
           CAST(sum(CASE WHEN c1 = c2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_same,
           -- exact wide sum (HUGEINT / DECIMAL(38,0)) then mod 2^63-1:
           -- the raw additive sum crossed 2^63 at the sf10 decade
           CAST(sum(CASE WHEN c1 IS NOT NULL THEN k * 1000003 + c1 END)
                % 9223372036854775807 AS BIGINT) AS checksum_v1,
           CAST(sum(CASE WHEN c2 IS NOT NULL THEN k * 1000003 + c2 END)
                % 9223372036854775807 AS BIGINT) AS checksum_v2
    FROM d GROUP BY 1 ORDER BY bucket
    """,
)
def snapshot_diff_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation between two table versions (v2 is derived
    from orders with deterministic deletes / +5.00 updates / shifted-key
    inserts): a full-outer diff classifies every key as
    inserted/deleted/updated/same, grouped into 8 hash buckets with an
    additive `Σ(key·p + cents)` checksum per version — the two-level scheme
    real reconciliation uses at scale: compare per-bucket checksums first
    (one tiny exchange), row-diff only the buckets that disagree.

    The checksum is an exact wide-integer sum reduced mod 2^63-1
    (DECIMAL(38,0) on Spark, HUGEINT in the oracle — the raw sum crossed
    int64 at the sf10 decade), order-insensitive and mergeable, so it is
    computable map-side under any partitioning.

    Scale: the diff is one equi-join on the key; bucket checksums need no
    join at all (each side aggregates independently) — the join here also
    produces the per-bucket row classifications in the same pass.
    """
    o = load(spark, sf_dir, "orders")
    v1 = o.select(F.col("o_orderkey").alias("k"), F.expr(_O_CENTS).alias("cents"))
    v2 = (
        o.filter(F.expr("o_orderkey % 97 <> 0"))
        .select(
            F.col("o_orderkey").alias("k"),
            (
                F.expr(_O_CENTS)
                + F.when(F.expr("o_orderkey % 13 = 0"), 500).otherwise(0)
            ).alias("cents"),
        )
        .unionAll(
            o.filter(F.expr("o_orderkey % 89 = 0")).select(
                (F.col("o_orderkey") + 100000000).alias("k"),
                (F.expr(_O_CENTS) + 7).alias("cents"),
            )
        )
    )
    d = (
        v1.alias("a")
        .join(v2.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer")
        .select(
            F.coalesce("a.k", "b.k").alias("k"),
            F.col("a.cents").alias("c1"),
            F.col("b.cents").alias("c2"),
        )
    )
    return (
        d.groupBy((F.col("k") % 8).alias("bucket"))
        .agg(
            F.sum(F.col("c2").isNull().cast("bigint")).alias("n_deleted"),
            F.sum(F.col("c1").isNull().cast("bigint")).alias("n_inserted"),
            F.sum(
                (
                    F.col("c1").isNotNull()
                    & F.col("c2").isNotNull()
                    & (F.col("c1") != F.col("c2"))
                ).cast("bigint")
            ).alias("n_updated"),
            F.sum((F.col("c1") == F.col("c2")).cast("bigint")).alias("n_same"),
            (
                F.sum(
                    F.when(
                        F.col("c1").isNotNull(),
                        F.col("k") * 1000003 + F.col("c1"),
                    ).cast("decimal(38,0)")
                )
                % F.lit(9223372036854775807)
            )
            .cast("bigint")
            .alias("checksum_v1"),
            (
                F.sum(
                    F.when(
                        F.col("c2").isNotNull(),
                        F.col("k") * 1000003 + F.col("c2"),
                    ).cast("decimal(38,0)")
                )
                % F.lit(9223372036854775807)
            )
            .cast("bigint")
            .alias("checksum_v2"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Point-in-time join against SCD2 history
# ---------------------------------------------------------------------------

@query(
    "pit_scd2_lookup",
    oracle="""
    WITH h AS (
      SELECT o_custkey, o_orderdate AS vf,
             lead(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS vt,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS version
      FROM orders
    ), fact AS (
      SELECT o.o_custkey AS ck, l.l_shipdate AS sd,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), pit AS (
      SELECT CASE WHEN h.version >= 6 THEN 6 ELSE h.version END AS vb,
             fact.cents
      FROM fact JOIN h
        ON fact.ck = h.o_custkey
       AND fact.sd >= h.vf
       AND (h.vt IS NULL OR fact.sd < h.vt)
    )
    SELECT CAST(vb AS BIGINT) AS version_bucket, count(*) AS n_lineitems,
           round(sum(cents) / 100.0, 2) AS revenue
    FROM pit GROUP BY 1 ORDER BY version_bucket
    """,
)
def pit_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) join: each lineitem, at its SHIP date,
    looks up the customer-dimension version that was valid right then in
    the SCD2 history (built as in `scd2_customer_history`: one version per
    order, [valid_from, valid_to) half-open intervals). Revenue rolls up
    by the version ordinal the shipment saw (capped at 6+) — 'how much
    revenue shipped while customers were on their Nth state'.

    The interval predicate `vf ≤ ship < vt` against lead()-closed
    intervals matches at most one version per (customer, instant), so the
    join never duplicates fact rows — the correctness property PIT joins
    must prove.

    Scale: equi-join on custkey carries the interval filter as a
    post-join predicate; versions-per-customer is bounded (it's a
    dimension history), so the per-key expansion is small and AQE handles
    any hot customer. The alternative union+forward-fill as-of kernel
    (see asof_join_orders) covers the unbounded-history case.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    wv = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    h = o.select(
        "o_custkey",
        F.col("o_orderdate").alias("vf"),
        F.lead("o_orderdate").over(wv).alias("vt"),
        F.row_number().over(wv).alias("version"),
    )
    fact = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("ck"),
        F.col("l_shipdate").alias("sd"),
        F.expr(_L_CENTS).alias("cents"),
    )
    pit = fact.join(
        h,
        (F.col("ck") == F.col("o_custkey"))
        & (F.col("sd") >= F.col("vf"))
        & (F.col("vt").isNull() | (F.col("sd") < F.col("vt"))),
    ).select(
        F.when(F.col("version") >= 6, 6)
        .otherwise(F.col("version"))
        .cast("bigint")
        .alias("version_bucket"),
        "cents",
    )
    return (
        pit.groupBy("version_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
        )
        .orderBy("version_bucket")
    )


# ---------------------------------------------------------------------------
# Markov event-transition matrix
# ---------------------------------------------------------------------------

@query(
    "markov_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), pairs AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY prev_type), 6)
             AS transition_prob
    FROM pairs ORDER BY prev_type, next_type
    """,
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next event type | current event type), estimated from consecutive
    event pairs ordered by (ts, event_id) within each user — the model
    behind next-action prediction and funnel-anomaly detection.

    Scale: one window shuffle partitioned by user (the same partitioning
    sessionization uses — on a real pipeline these share the exchange),
    then a |types|² aggregation with map-side combine. Counts are exact
    ints; the probability is a single final division.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(
            F.col("n") * 1.0 / F.sum("n").over(Window.partitionBy("prev_type")),
            6,
        ).alias("transition_prob"),
    ).orderBy("prev_type", "next_type")
