"""Data-profiling operators: trend regression, histograms, and a column
profiler — the observability layer a 100 TB ingest pipeline runs before
and after every curation stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_EPOCH0 = 1_704_067_200  # 2024-01-01 UTC — centers x so regr math is stable


@query(
    "events_trend",
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(xd) AS DOUBLE) AS sx,
             CAST(sum(yc) AS DOUBLE) AS sy,
             CAST(sum(xd * yc) AS DOUBLE) AS sxy,
             CAST(sum(xd * xd) AS DOUBLE) AS sxx,
             CAST(sum(yc * yc) AS DOUBLE) AS syy
      FROM (SELECT event_type,
                   CAST(floor((epoch(ts) - {_EPOCH0}) / 86400.0) AS BIGINT)
                     AS xd,
                   CAST(round(value * 100) AS BIGINT) AS yc
            FROM events)
      GROUP BY event_type
    )
    SELECT event_type, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0, 6)
             AS slope_per_day,
           round(sy / 100.0 / n
                 - (n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0
                   * (sx / n), 6) AS intercept,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r
    FROM s ORDER BY event_type
    """,
)
def events_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series least-squares trend (slope/intercept/correlation of value
    against days-since-2024-01-01) — drift detection over time-series
    without a window sort.

    Scale: the five moment sums are one-pass mergeable aggregates
    (map-side partials), so the trend of a 100 TB series costs one shuffle
    of |groups| rows — same plan shape as the built-in regr_* aggregates.
    Those built-ins differ from DuckDB's by summation-order float noise
    (~1e-5 on the intercept), so instead the sums are taken over EXACT
    integers (whole days × value-in-cents: both exactly representable),
    making every partial sum order-independent; the slope/intercept/corr
    formulas are then evaluated with an identical IEEE double expression
    tree on both engines, which makes the 6dp-rounded outputs bit-exact.
    """
    e = load(spark, sf_dir, "events")
    xd = F.floor((F.unix_timestamp("ts") - F.lit(_EPOCH0)) / 86400.0).cast("bigint")
    yc = F.round(F.col("value") * 100).cast("bigint")
    s = (
        e.select(F.col("event_type"), xd.alias("xd"), yc.alias("yc"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("xd").cast("double").alias("sx"),
            F.sum("yc").cast("double").alias("sy"),
            F.sum(F.col("xd") * F.col("yc")).cast("double").alias("sxy"),
            F.sum(F.col("xd") * F.col("xd")).cast("double").alias("sxx"),
            F.sum(F.col("yc") * F.col("yc")).cast("double").alias("syy"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0
    return s.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope_per_day"),
        F.round(sy / 100.0 / n - slope * (sx / n), 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r"),
    ).orderBy("event_type")


_BIN_W = 50.0  # events.value spans ~[0, 490]


@query(
    "events_histogram",
    oracle=f"""
    SELECT event_type,
           CAST(least(floor(value / {_BIN_W}), 9) AS BIGINT) AS bin,
           round(least(floor(value / {_BIN_W}), 9) * {_BIN_W}, 2) AS bin_lo,
           count(*) AS n,
           round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY event_type),
                 6) AS frac
    FROM events
    GROUP BY 1, 2, 3 ORDER BY event_type, bin
    """,
)
def events_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per series (10 bins of 50, top bin
    open-ended) with within-series fractions — the distribution profile
    stage of a pipeline health check.

    Scale: binning is a per-row floor, the count shuffles |series|×|bins|
    partial sums, and the fraction is a window over that already-tiny
    frame. Bin edges are computed with identical double ops on both
    engines (2-decimal inputs / exact-power-of-two-friendly width), so
    assignment can't straddle engines.
    """
    e = load(spark, sf_dir, "events")
    bin_ = F.least(F.floor(F.col("value") / _BIN_W), F.lit(9)).cast("bigint")
    from pyspark.sql import Window

    w = Window.partitionBy("event_type")
    return (
        e.groupBy("event_type", bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bin_lo", F.round(F.col("bin") * _BIN_W, 2))
        .withColumn("frac", F.round(F.col("n") / F.sum("n").over(w), 6))
        .select("event_type", "bin", "bin_lo", "n", "frac")
        .orderBy("event_type", "bin")
    )


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "o_orderpriority"]


@query(
    "profile_orders",
    oracle="""
    SELECT 'o_orderkey' AS col, count(*) AS n,
           count(*) - count(o_orderkey) AS n_null,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_s,
           CAST(max(o_orderkey) AS VARCHAR) AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           CAST(CAST(round(min(o_totalprice), 2) AS DECIMAL(18, 2)) AS VARCHAR),
           CAST(CAST(round(max(o_totalprice), 2) AS DECIMAL(18, 2)) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority), min(o_orderpriority),
           max(o_orderpriority)
    FROM orders
    ORDER BY col
    """,
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler over ``orders``: row/null/distinct counts and
    min/max per column in long format — the schema-drift and data-quality
    report each pipeline stage emits.

    Scale: ALL columns profile in a SINGLE scan — one aggregate computes
    every per-column statistic at once (the literal UNION-ALL oracle scans
    the table once per column), then a stack() unpivots the 1-row wide
    result into the long report. count(DISTINCT) over multiple columns in
    one agg expands via Spark's internal grouping-sets rewrite; swap to
    approx_count_distinct sketches when exactness isn't required.
    Numerics are stringified via DECIMAL(18,2) so both engines format
    identically.
    """
    o = load(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        col = F.col(c)
        if c == "o_totalprice":
            mn = F.round(F.min(col), 2).cast("decimal(18,2)").cast("string")
            mx = F.round(F.max(col), 2).cast("decimal(18,2)").cast("string")
        else:
            mn = F.min(col).cast("string")
            mx = F.max(col).cast("string")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(col)).alias(f"{c}__n_null"),
            F.count_distinct(col).alias(f"{c}__n_distinct"),
            mn.alias(f"{c}__min_s"),
            mx.alias(f"{c}__max_s"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__n_null, {c}__n_distinct, {c}__min_s, {c}__max_s"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args})"
        " as (col, n, n_null, n_distinct, min_s, max_s)"
    ).orderBy("col")


_CMS_P = 1_000_000_007
_CMS_W = 256
_CMS_SEEDS = [(0, 1000003, 17), (1, 1000033, 29), (2, 1000037, 41),
              (3, 1000039, 53)]


@query(
    "cms_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(trim(text), ' ')) AS t FROM documents
    ), cnt AS (
      SELECT t, count(*) AS exact_n FROM toks GROUP BY 1
    ), hs AS (
      SELECT t, exact_n,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                            list_transform(generate_series(1, length(t)),
                                           i -> ord(substr(t, CAST(i AS INTEGER), 1)))),
               (acc, c) -> (acc * 31 + c) % {_CMS_P}) AS h
      FROM cnt
    ), seeds(row_i, a, b) AS (VALUES
      {", ".join(f"({r}, {a}, {b})" for r, a, b in _CMS_SEEDS)}
    ), tok_cells AS (
      SELECT t, exact_n, row_i, ((a * h + b) % {_CMS_P}) % {_CMS_W} AS col
      FROM hs CROSS JOIN seeds
    ), sketch AS (
      SELECT row_i, col, CAST(sum(exact_n) AS BIGINT) AS cell_n
      FROM tok_cells GROUP BY 1, 2
    ), est AS (
      SELECT tc.t, tc.exact_n, min(s.cell_n) AS cms_est
      FROM tok_cells tc JOIN sketch s USING (row_i, col) GROUP BY 1, 2
    )
    SELECT t AS token, exact_n, cms_est, cms_est - exact_n AS overestimate,
           CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, row_number() OVER (ORDER BY exact_n DESC, t) AS rk
          FROM est)
    WHERE rk <= 20 ORDER BY rk
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters: a 4×256 CMS over the corpus token
    stream, compared against exact counts for the top-20 tokens (the
    guaranteed-overestimate property shows up in the `overestimate`
    column) — the fixed-memory frequency sketch a 100 TB pipeline uses
    where an exact token count would not fit.

    Scale: each CMS cell is a mergeable counter, so the sketch builds with
    one map-side-combined agg over |D×W| = 1024 cells no matter the corpus
    size, then broadcasts for estimation. Hashes are the repo's portable
    polynomial fingerprint (identical integer fold on both engines), so
    the sketch — not just the exact side — is verified cross-engine.
    In production the raw stream aggregates straight into cells; here the
    stream is pre-aggregated per token first (same cells, one less pass).
    """
    from iceberg_classifier_spark.functions import text as T

    d = load(spark, sf_dir, "documents")
    cnt = (
        d.select(F.explode(F.split(F.trim("text"), " ")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    hs = cnt.withColumn("h", T.rolling_fingerprint("t"))
    seeds = spark.createDataFrame(
        _CMS_SEEDS, "row_i int, a long, b long"
    )
    tok_cells = hs.crossJoin(F.broadcast(seeds)).select(
        "t",
        "exact_n",
        "row_i",
        (((F.col("a") * F.col("h") + F.col("b")) % _CMS_P) % _CMS_W).alias(
            "col"
        ),
    )
    sketch = tok_cells.groupBy("row_i", "col").agg(
        F.sum("exact_n").cast("bigint").alias("cell_n")
    )
    est = (
        tok_cells.join(F.broadcast(sketch), ["row_i", "col"])
        .groupBy("t", "exact_n")
        .agg(F.min("cell_n").alias("cms_est"))
    )
    from pyspark.sql import Window

    ranked = est.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.col("exact_n").desc(), "t")),
    ).filter(F.col("rk") <= 20)
    return ranked.select(
        F.col("t").alias("token"),
        "exact_n",
        "cms_est",
        (F.col("cms_est") - F.col("exact_n")).alias("overestimate"),
        F.col("rk").cast("bigint").alias("rk"),
    ).orderBy("rk")


@query(
    "events_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ), dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ), mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           count(*) AS n,
           round(d.med, 6) AS med,
           round(m.mad, 6) AS mad,
           CAST(count(*) FILTER (WHERE d.adev > 3 * 1.4826 * m.mad)
                AS BIGINT) AS n_outliers,
           round(count(*) FILTER (WHERE d.adev > 3 * 1.4826 * m.mad) * 1.0
                 / count(*), 6) AS outlier_frac
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type, d.med, m.mad ORDER BY d.event_type
    """,
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly gate per series: median / MAD (median absolute
    deviation) and the count of points beyond 3 robust sigmas
    (1.4826·MAD ≈ σ under normality) — the outlier monitor that, unlike
    mean±3σ, is not dragged by the outliers it is trying to find.

    Scale: two grouped exact medians (swap for approx_percentile's
    t-digest at 100 TB) with the tiny per-group medians broadcast back
    between passes; the threshold comparison uses an identical IEEE
    expression on both engines, so the boundary can't straddle.
    """
    e = load(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    out_cond = F.col("adev") > 3 * 1.4826 * F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(out_cond.cast("long")).cast("bigint").alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n_outliers",
            F.round(F.col("n_outliers") / F.col("n"), 6).alias("outlier_frac"),
        )
        .orderBy("event_type")
    )


@query(
    "chi2_type_bucket",
    oracle="""
    WITH obs AS (
      SELECT event_type, user_id % 4 AS b, count(*) AS o
      FROM events GROUP BY 1, 2
    ), rt AS (SELECT event_type, sum(o) AS rt FROM obs GROUP BY 1),
    ct AS (SELECT b, sum(o) AS ct FROM obs GROUP BY 1),
    tot AS (SELECT sum(o) AS n FROM obs)
    SELECT CAST(tot.n AS BIGINT) AS n,
           CAST((SELECT count(*) FROM rt) - 1 AS BIGINT)
             * CAST((SELECT count(*) FROM ct) - 1 AS BIGINT) AS dof,
           round(sum((o - rt.rt * ct.ct / tot.n)
                     * (o - rt.rt * ct.ct / tot.n)
                     / (rt.rt * ct.ct / tot.n)), 6) AS chi2
    FROM obs JOIN rt USING (event_type) JOIN ct USING (b) CROSS JOIN tot
    GROUP BY tot.n ORDER BY n
    """,
)
def chi2_type_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and user-hash
    bucket (contingency 5×4) — the categorical-drift / A-B-split sanity
    check a pipeline runs on its partitioning.

    Scale: the contingency table is one map-combined count agg
    (|types|×|buckets| cells regardless of event volume); marginals and
    the statistic are computed on that tiny frame with broadcast joins.
    All inputs to the float math are exact integer counts and the
    statistic uses an identical IEEE expression on both engines, so the
    6dp-rounded χ² matches bit-for-bit. (p-value needs the χ² CDF —
    pair with MLlib's ChiSquareTest when the decision threshold matters.)
    """
    e = load(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", (F.col("user_id") % 4).alias("b")
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("rt"))
    ct = obs.groupBy("b").agg(F.sum("o").alias("ct"))
    tot = obs.agg(F.sum("o").alias("n"))
    dof = obs.agg(
        (
            (F.count_distinct("event_type") - 1)
            * (F.count_distinct("b") - 1)
        ).alias("dof")
    )
    exp_ = F.col("rt") * F.col("ct") / F.col("n")
    dev = F.col("o") - exp_
    return (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "b")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(dof))
        .groupBy(F.col("n").cast("bigint").alias("n"),
                 F.col("dof").cast("bigint").alias("dof"))
        .agg(F.round(F.sum(dev * dev / exp_), 6).alias("chi2"))
        .orderBy("n")
    )


@query(
    "kl_drift",
    oracle=f"""
    WITH binned AS (
      SELECT event_type,
             CAST(least(floor(value / {_BIN_W}), 9) AS BIGINT) AS bin,
             CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 'p'
                  ELSE 'q' END AS half,
             count(*) AS c
      FROM events GROUP BY 1, 2, 3
    ), grid AS (
      SELECT t.event_type, g.bin
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bin) g
    ), cells AS (
      SELECT g.event_type, g.bin,
             coalesce(p.c, 0) AS cp, coalesce(q.c, 0) AS cq
      FROM grid g
      LEFT JOIN binned p ON p.event_type = g.event_type AND p.bin = g.bin
                        AND p.half = 'p'
      LEFT JOIN binned q ON q.event_type = g.event_type AND q.bin = g.bin
                        AND q.half = 'q'
    ), totals AS (
      SELECT event_type, sum(cp) AS np, sum(cq) AS nq FROM cells GROUP BY 1
    )
    SELECT c.event_type, CAST(t.np AS BIGINT) AS n_first,
           CAST(t.nq AS BIGINT) AS n_second,
           round(sum(((c.cp + 1.0) / (t.np + 10))
                     * ln(((c.cp + 1.0) / (t.np + 10))
                          / ((c.cq + 1.0) / (t.nq + 10)))), 6) AS kl
    FROM cells c JOIN totals t USING (event_type)
    GROUP BY 1, 2, 3 ORDER BY event_type
    """,
)
def kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detector: KL divergence between each series'
    first-half and second-half value histograms (10 fixed bins, add-one
    smoothing so empty bins stay defined) — the statistical gate that
    catches a feature distribution shifting between pipeline runs.

    Scale: one map-combined count agg produces the |types|×|bins|×2
    histogram; the dense (type, bin) grid and the divergence are computed
    on that tiny frame. Counts are exact integers and both engines
    evaluate the identical smoothed-ratio expression, so the 6dp-rounded
    divergence matches despite the transcendental ln (≤1 ulp apart).
    """
    e = load(spark, sf_dir, "events")
    binned = e.groupBy(
        "event_type",
        F.least(F.floor(F.col("value") / _BIN_W), F.lit(9))
        .cast("bigint")
        .alias("bin"),
        F.when(
            F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"), "p"
        )
        .otherwise("q")
        .alias("half"),
    ).agg(F.count(F.lit(1)).alias("c"))
    types = e.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(spark.range(10).select(F.col("id").alias("bin"))))
    p = binned.filter(F.col("half") == "p").select(
        "event_type", "bin", F.col("c").alias("cp")
    )
    q = binned.filter(F.col("half") == "q").select(
        "event_type", "bin", F.col("c").alias("cq")
    )
    cells = (
        grid.join(p, ["event_type", "bin"], "left")
        .join(q, ["event_type", "bin"], "left")
        .fillna(0, ["cp", "cq"])
    )
    totals = cells.groupBy("event_type").agg(
        F.sum("cp").alias("np"), F.sum("cq").alias("nq")
    )
    pp = (F.col("cp") + 1.0) / (F.col("np") + 10)
    qq = (F.col("cq") + 1.0) / (F.col("nq") + 10)
    return (
        cells.join(F.broadcast(totals), "event_type")
        .groupBy(
            "event_type",
            F.col("np").cast("bigint").alias("n_first"),
            F.col("nq").cast("bigint").alias("n_second"),
        )
        .agg(F.round(F.sum(pp * F.log(pp / qq)), 6).alias("kl"))
        .orderBy("event_type")
    )


@query(
    "dq_constraint_suite",
    oracle="""
    SELECT 'events.event_type accepted-values' AS check_name,
           count(*) AS n_checked,
           CAST(sum(CASE WHEN event_type NOT IN
                    ('click', 'error', 'purchase', 'signup', 'view')
                    OR event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations
    FROM events
    UNION ALL
    SELECT 'events.ts in 2024', count(*),
           CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-01 00:00:00'
                    OR ts >= TIMESTAMP '2025-01-01 00:00:00'
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'events.value non-negative', count(*),
           CAST(sum(CASE WHEN value < 0 OR value IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'lineitem.l_orderkey FK -> orders', count(*),
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem l
    LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
      ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'orders.o_custkey FK -> customer', count(*),
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM orders ord
    LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON ord.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'orders.o_orderkey unique',
           count(*), count(*) - count(DISTINCT o_orderkey)
    FROM orders
    ORDER BY check_name
    """,
)
def dq_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality constraint suite: uniqueness, referential
    integrity (two FK edges of the star schema), accepted values, range,
    and time-domain checks — one violations report per pipeline run, the
    gate that blocks a bad batch from publishing.

    Scale: every check is a map-combined aggregate or a broadcast-probed
    left join flagged inline (never an anti-join that re-shuffles the
    fact table); uniqueness is count-vs-count-distinct in a single agg.
    All verdicts are integer counts — bit-exact across engines.
    """
    e = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cust = load(spark, sf_dir, "customer")

    def check(df: DataFrame, name: str, viol) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(F.when(viol, 1).otherwise(0)).cast("bigint").alias(
                "n_violations"
            ),
        ).select(F.lit(name).alias("check_name"), "n_checked", "n_violations")

    types = ["click", "error", "purchase", "signup", "view"]
    c1 = check(
        e,
        "events.event_type accepted-values",
        ~F.col("event_type").isin(types) | F.col("event_type").isNull(),
    )
    c2 = check(
        e,
        "events.ts in 2024",
        (F.col("ts") < F.lit("2024-01-01 00:00:00").cast("timestamp"))
        | (F.col("ts") >= F.lit("2025-01-01 00:00:00").cast("timestamp")),
    )
    c3 = check(
        e,
        "events.value non-negative",
        (F.col("value") < 0) | F.col("value").isNull(),
    )
    ok = o.select("o_orderkey").distinct().withColumn("hit", F.lit(1))
    c4 = check(
        li.join(F.broadcast(ok), li.l_orderkey == ok.o_orderkey, "left"),
        "lineitem.l_orderkey FK -> orders",
        F.col("hit").isNull(),
    )
    ck = cust.select("c_custkey").distinct().withColumn("chit", F.lit(1))
    c5 = check(
        o.join(F.broadcast(ck), o.o_custkey == ck.c_custkey, "left"),
        "orders.o_custkey FK -> customer",
        F.col("chit").isNull(),
    )
    c6 = o.agg(
        F.count(F.lit(1)).alias("n_checked"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey"))
        .cast("bigint")
        .alias("n_violations"),
    ).select(
        F.lit("orders.o_orderkey unique").alias("check_name"),
        "n_checked",
        "n_violations",
    )
    out = c1
    for c in [c2, c3, c4, c5, c6]:
        out = out.unionAll(c)
    return out.orderBy("check_name")


# ---------------------------------------------------------------------------
# Earth-mover's (Wasserstein-1) drift between half-month distributions
# ---------------------------------------------------------------------------

@query(
    "emd_value_drift",
    oracle=f"""
    WITH binned AS (
      SELECT event_type,
             CAST(least(floor(value / {_BIN_W}), 9) AS BIGINT) AS bin,
             CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 'p'
                  ELSE 'q' END AS half,
             count(*) AS c
      FROM events GROUP BY 1, 2, 3
    ), grid AS (
      SELECT t.event_type, g.bin
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bin) g
    ), cells AS (
      SELECT g.event_type, g.bin,
             coalesce(p.c, 0) AS cp, coalesce(q.c, 0) AS cq
      FROM grid g
      LEFT JOIN binned p ON p.event_type = g.event_type AND p.bin = g.bin
                        AND p.half = 'p'
      LEFT JOIN binned q ON q.event_type = g.event_type AND q.bin = g.bin
                        AND q.half = 'q'
    ), cum AS (
      SELECT event_type, bin,
             sum(cp) OVER (PARTITION BY event_type ORDER BY bin) AS sp,
             sum(cq) OVER (PARTITION BY event_type ORDER BY bin) AS sq,
             sum(cp) OVER (PARTITION BY event_type) AS np,
             sum(cq) OVER (PARTITION BY event_type) AS nq
      FROM cells
    )
    SELECT event_type, CAST(max(np) AS BIGINT) AS n_first,
           CAST(max(nq) AS BIGINT) AS n_second,
           round(sum(abs(sp * nq - sq * np)) * 1.0
                 / (max(np) * max(nq)), 6) AS emd_bins
    FROM cum GROUP BY 1 ORDER BY event_type
    """,
)
def emd_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earth-mover's (Wasserstein-1) distance between each series' first-
    and second-half-of-month value distributions — the drift metric that,
    unlike KL (`kl_drift`), stays finite on disjoint support and weighs
    HOW FAR mass moved, not just that it moved. For 1-D histograms EMD is
    the area between CDFs: Σ|cumP·nq − cumQ·np| / (np·nq) — an exact
    int64 numerator per bin (no smoothing, no logs), reported in bin
    units.

    Scale: identical shape to kl_drift — one (series, bin, half)
    aggregation with map-side combine, then windows over the 10-bin grid;
    both drift metrics could share one scan in production.
    """
    e = load(spark, sf_dir, "events")
    binned = e.groupBy(
        "event_type",
        F.least(F.floor(F.col("value") / _BIN_W), F.lit(9))
        .cast("bigint")
        .alias("bin"),
        F.when(F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"), "p")
        .otherwise("q")
        .alias("half"),
    ).agg(F.count(F.lit(1)).alias("c"))
    grid = (
        e.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(spark.range(10).select(F.col("id").alias("bin"))))
    )
    cells = (
        grid.join(
            binned.filter(F.col("half") == "p").select(
                "event_type", "bin", F.col("c").alias("cp")
            ),
            ["event_type", "bin"],
            "left",
        )
        .join(
            binned.filter(F.col("half") == "q").select(
                "event_type", "bin", F.col("c").alias("cq")
            ),
            ["event_type", "bin"],
            "left",
        )
        .select(
            "event_type",
            "bin",
            F.coalesce("cp", F.lit(0)).alias("cp"),
            F.coalesce("cq", F.lit(0)).alias("cq"),
        )
    )
    wb = Window.partitionBy("event_type").orderBy("bin")
    wp = Window.partitionBy("event_type")
    cum = cells.select(
        "event_type",
        F.sum("cp").over(wb).alias("sp"),
        F.sum("cq").over(wb).alias("sq"),
        F.sum("cp").over(wp).alias("np"),
        F.sum("cq").over(wp).alias("nq"),
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("np").alias("n_first"),
            F.max("nq").alias("n_second"),
            F.round(
                F.sum(
                    F.abs(F.col("sp") * F.col("nq") - F.col("sq") * F.col("np"))
                )
                * 1.0
                / (F.max("np") * F.max("nq")),
                6,
            ).alias("emd_bins"),
        )
        .orderBy("event_type")
    )
