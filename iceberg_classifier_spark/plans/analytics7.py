"""Analytics wave 7: survey-sampling design operators."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_NEY_K = 1000  # total sample size to allocate


@query(
    "neyman_allocation_sample",
    oracle=f"""
    WITH o AS (
      SELECT o_orderpriority AS pri,
             CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS d
      FROM orders
    ), st AS (
      SELECT pri, CAST(count(*) AS BIGINT) AS n_pop,
             CAST(sum(d) AS BIGINT) AS s, CAST(sum(d * d) AS BIGINT) AS ss
      FROM o GROUP BY 1
    ), w AS (
      SELECT pri, n_pop,
             CAST(floor(sqrt(CAST(CAST(n_pop AS HUGEINT) * ss
                      - CAST(s AS HUGEINT) * s AS DOUBLE))) AS BIGINT)
               AS wgt
      FROM st
    ), t AS (SELECT CAST(sum(wgt) AS BIGINT) AS tot FROM w),
    base AS (
      SELECT w.pri, w.n_pop, w.wgt,
             ({_NEY_K} * w.wgt) // t.tot AS base_n,
             ({_NEY_K} * w.wgt) % t.tot AS rem
      FROM w CROSS JOIN t
    ), fin AS (
      SELECT pri, n_pop, wgt, base_n,
             base_n + CASE WHEN row_number()
                 OVER (ORDER BY rem DESC, pri)
               <= {_NEY_K} - sum(base_n) OVER () THEN 1 ELSE 0 END AS alloc
      FROM base
    )
    SELECT pri AS priority, n_pop, wgt AS neyman_weight,
           CAST(alloc AS BIGINT) AS alloc_n,
           round(alloc * 1.0 / n_pop, 6) AS sampling_frac,
           (sum(alloc) OVER () = {_NEY_K}) AS alloc_sums_ok
    FROM fin ORDER BY priority
    """,
)
def neyman_allocation_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation: split a {_NEY_K}-unit
    sampling budget across order-priority strata proportional to
    N_h x S_h (population size x within-stratum spread) — the allocation
    that minimizes the stratified estimator's variance. All inputs stay
    EXACT: N_h·S_h = sqrt(N_h·Σx² − (Σx)²) whose radicand is an exact
    int64 (dollar-quantized), floored to an integer weight both engines
    reproduce bit-for-bit; the budget is then dealt by integer
    largest-remainder (base = K·w div W, +1 to the largest remainders)
    so the allocations sum to exactly K — asserted by the in-query
    alloc_sums_ok column.

    Scale: one map-side-combined pass builds the three sufficient
    statistics per stratum; everything after runs on the 5-row stratum
    dimension. The actual row draw would be the existing
    sample_stratified_det hash filter with these per-stratum rates.
    """
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100").alias("d"),
    )
    st = o.groupBy("pri").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pop"),
        F.sum("d").cast("bigint").alias("s"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("ss"),
    )
    # n_pop*ss and s*s reach ~1e21 at sf0.1 — cross-multiply in
    # decimal(38,0) (int64 overflows under ANSI); the double conversion
    # of the exact wide difference matches DuckDB's HUGEINT-to-double
    w = st.select(
        "pri",
        "n_pop",
        F.floor(
            F.sqrt(
                F.expr(
                    "CAST(CAST(n_pop AS DECIMAL(38,0)) * ss"
                    " - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE)"
                )
            )
        )
        .cast("bigint")
        .alias("wgt"),
    )
    t = w.agg(F.sum("wgt").cast("bigint").alias("tot"))
    base = w.crossJoin(F.broadcast(t)).select(
        "pri",
        "n_pop",
        "wgt",
        F.expr(f"({_NEY_K} * wgt) div tot").alias("base_n"),
        F.expr(f"({_NEY_K} * wgt) % tot").alias("rem"),
    )
    wd = Window.partitionBy()  # 5-row stratum dimension
    fin = base.select(
        "pri",
        "n_pop",
        "wgt",
        (
            F.col("base_n")
            + F.when(
                F.row_number().over(Window.orderBy(F.desc("rem"), "pri"))
                <= F.lit(_NEY_K) - F.sum("base_n").over(wd),
                1,
            ).otherwise(0)
        ).alias("alloc"),
    )
    return fin.select(
        F.col("pri").alias("priority"),
        "n_pop",
        F.col("wgt").alias("neyman_weight"),
        F.col("alloc").cast("bigint").alias("alloc_n"),
        F.round(F.col("alloc") * 1.0 / F.col("n_pop"), 6).alias("sampling_frac"),
        (F.sum("alloc").over(wd) == _NEY_K).alias("alloc_sums_ok"),
    ).orderBy("priority")


# ---------------------------------------------------------------------------
# Holt linear exponential smoothing via ordered fold
# ---------------------------------------------------------------------------

_HOLT_A = 0.5  # level smoothing
_HOLT_B = 0.3  # trend smoothing
_HOLT_H = 7  # forecast horizon (days)


@query(
    "exp_smoothing_forecast",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ), series AS (
      SELECT event_type, list(x ORDER BY day) AS xs,
             CAST(count(*) AS BIGINT) AS n_days
      FROM daily GROUP BY 1
    ), fit AS (
      SELECT event_type, n_days,
             list_reduce(
               list_prepend([xs[1], CAST(0.0 AS DOUBLE)],
                            list_transform(xs[2:], x -> [x, CAST(0.0 AS DOUBLE)])),
               (acc, v) -> [
                 {_HOLT_A} * v[1] + {1 - _HOLT_A} * (acc[1] + acc[2]),
                 {_HOLT_B} * (({_HOLT_A} * v[1] + {1 - _HOLT_A} * (acc[1] + acc[2]))
                              - acc[1]) + {1 - _HOLT_B} * acc[2]
               ]) AS lt
      FROM series
    )
    SELECT event_type, n_days,
           round(lt[1], 6) AS level,
           round(lt[2], 6) AS trend,
           round(lt[1] + {_HOLT_H} * lt[2], 6) AS forecast_7d
    FROM fit ORDER BY event_type
    """,
)
def exp_smoothing_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (level+trend) exponential smoothing of each event
    type's daily-count series, with a {_HOLT_H}-day-ahead forecast —
    the workhorse short-horizon forecaster. A smoothing recurrence is
    inherently SEQUENTIAL (state t depends on t-1), which a distributed
    engine handles by collapsing the series to a per-key ARRAY and
    running the recurrence as an ordered fold (F.aggregate over the
    day-sorted array) — identical left-to-right IEEE operations in both
    engines, so a recursive float computation still gets a full value
    oracle. The trend expression re-derives the new level inline rather
    than binding it (neither engine's lambda has let-bindings); both
    duplicate the same expression, so the results agree bit-for-bit.

    Scale: one map-side-combined groupBy(day) pass; each series is
    |days|-long (bounded by calendar, not corpus), so the per-key array
    fold is dimension-sized. For series too long to hold per key, the
    associative-scan reformulation of linear recurrences (matrix prefix
    products) distributes — this fold is the right shape below ~1e5
    points per key.
    """
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("sx"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    ).select(
        "event_type",
        "n_days",
        F.expr("transform(sx, s -> s.x)").alias("xs"),
    )
    a, b = _HOLT_A, _HOLT_B
    newl = f"{a} * v + {1 - a} * (acc[0] + acc[1])"
    fit = series.select(
        "event_type",
        "n_days",
        F.expr(
            f"""
            aggregate(
              slice(xs, 2, size(xs) - 1),
              array(xs[0], CAST(0.0 AS DOUBLE)),
              (acc, v) -> array(
                {newl},
                {b} * (({newl}) - acc[0]) + {1 - b} * acc[1]
              )
            )
            """
        ).alias("lt"),
    )
    return fit.select(
        "event_type",
        "n_days",
        F.round(F.col("lt")[0], 6).alias("level"),
        F.round(F.col("lt")[1], 6).alias("trend"),
        F.round(F.col("lt")[0] + _HOLT_H * F.col("lt")[1], 6).alias(
            "forecast_7d"
        ),
    ).orderBy("event_type")


@query(
    "kadane_best_run",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(cents) AS BIGINT) AS total
      FROM daily
    ), dev AS (
      SELECT list(cents - (SELECT total // n_days FROM tot)
                  ORDER BY day) AS xs
      FROM daily
    ), kad AS (
      SELECT list_reduce(
               list_prepend([CAST(-9223372036854775807 AS BIGINT),
                             CAST(0 AS BIGINT)],
                            list_transform(xs, x -> [x, CAST(0 AS BIGINT)])),
               (acc, v) -> [
                 greatest(acc[1], greatest(v[1], acc[2] + v[1])),
                 greatest(v[1], acc[2] + v[1])
               ]) AS bc
      FROM dev
    )
    SELECT t.n_days, t.total AS total_cents,
           t.total // t.n_days AS mean_daily_cents,
           kad.bc[1] AS best_run_excess_cents
    FROM tot t CROSS JOIN kad
    """,
)
def kadane_best_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-sum contiguous run (Kadane) over the mean-adjusted daily
    revenue series: the single best stretch of consecutive days measured
    as total excess over the average daily take — 'when was the hottest
    streak, and how hot'. Another inherently sequential recurrence run as
    an ordered array fold (exp_smoothing_forecast's pattern), but in
    EXACT int64 cents: best/current accumulator, zero float anywhere.

    Scale: one map-side-combined groupBy(day); the fold runs over the
    calendar-bounded day array. (Kadane also has an associative
    divide-and-conquer form — (total, best, prefix, suffix) per segment —
    which is the distributed-scan fallback for series too long for one
    array.)
    """
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("cents").cast("bigint").alias("total"),
    )
    dev = (
        daily.crossJoin(F.broadcast(tot))
        .groupBy("n_days", "total")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(day, cents))),"
                " s -> s.cents - (total div n_days))"
            ).alias("xs")
        )
    )
    kad = dev.select(
        "n_days",
        "total",
        F.expr(
            """
            aggregate(
              xs,
              array(CAST(-9223372036854775807 AS BIGINT), CAST(0 AS BIGINT)),
              (acc, v) -> array(
                greatest(acc[0], greatest(v, acc[1] + v)),
                greatest(v, acc[1] + v)
              )
            )
            """
        ).alias("bc"),
    )
    return kad.select(
        "n_days",
        F.col("total").alias("total_cents"),
        F.expr("total div n_days").alias("mean_daily_cents"),
        F.col("bc")[0].alias("best_run_excess_cents"),
    )


# ---------------------------------------------------------------------------
# Iterative proportional fitting (raking) to target margins
# ---------------------------------------------------------------------------

_IPF_ROUNDS = 3

_IPF_ITER_SQL = "".join(
    f""",
    r{i}a AS (
      SELECT et, dow,
             w * (tr.target_row / sum(w) OVER (PARTITION BY et)) AS w
      FROM r{i - 1} JOIN tr USING (et)
    ), r{i} AS (
      SELECT et, dow,
             w * (tc.target_col / sum(w) OVER (PARTITION BY dow)) AS w
      FROM r{i}a JOIN tc USING (dow)
    )"""
    for i in range(1, _IPF_ROUNDS + 1)
)


@query(
    "ipf_raking",
    oracle=f"""
    WITH cell AS (
      SELECT event_type AS et, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
             CAST(count(*) AS DOUBLE) AS w
      FROM events GROUP BY 1, 2
    ), tot AS (SELECT CAST(sum(w) AS DOUBLE) AS n FROM cell),
    tr AS (
      SELECT et, (SELECT n FROM tot) / 5.0 AS target_row
      FROM (SELECT DISTINCT et FROM cell)
    ), tc AS (
      SELECT dow, (SELECT n FROM tot) / 7.0 AS target_col
      FROM (SELECT DISTINCT dow FROM cell)
    ), r0 AS (SELECT et, dow, w FROM cell)
    {_IPF_ITER_SQL}
    SELECT et AS event_type, dow,
           round(fin.w, 6) AS raked_weight,
           round(fin.w / cell.w, 6) AS weight_ratio
    FROM r{_IPF_ROUNDS} fin JOIN cell USING (et, dow)
    ORDER BY event_type, dow
    """,
)
def ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking): adjust the event_type ×
    day-of-week contingency table so both margins hit uniform targets
    (n/5 per type, n/7 per dow) — the survey-weighting / post-
    stratification workhorse. {_IPF_ROUNDS} fixed alternating row/column
    scaling rounds, each a join + dimension-partitioned window on the
    ≤35-cell table; the fixed round count makes every intermediate
    deterministic, and both engines run the identical scaling expression
    sequence, so the raked weights carry a full value oracle. (The
    per-margin window sums run over ≤7 cells — dimension frames — and
    the float sums within them are over single-digit row counts with a
    deterministic grouping, identical in both engines.)

    Scale: one map-side-combined pass builds the cells; all iterations
    run on the |types|×|dows| dimension. For high-dimensional raking the
    same alternating scaling runs one margin per shuffle-free broadcast
    join round — cost = rounds × dimension size, independent of corpus.
    """
    cell = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("et"),
            F.expr("CAST(dayofweek(ts) AS BIGINT)").alias("dow"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w0"))
    )
    tot = cell.agg(F.sum("w0").cast("double").alias("n"))
    tr = (
        cell.select("et")
        .distinct()
        .crossJoin(F.broadcast(tot))
        .select("et", (F.col("n") / 5.0).alias("target_row"))
    )
    tc = (
        cell.select("dow")
        .distinct()
        .crossJoin(F.broadcast(tot))
        .select("dow", (F.col("n") / 7.0).alias("target_col"))
    )
    cur = cell.select("et", "dow", F.col("w0").alias("w"))
    for _ in range(_IPF_ROUNDS):
        cur = cur.join(F.broadcast(tr), "et").select(
            "et",
            "dow",
            (
                F.col("w")
                * (
                    F.col("target_row")
                    / F.sum("w").over(Window.partitionBy("et"))
                )
            ).alias("w"),
        )
        cur = cur.join(F.broadcast(tc), "dow").select(
            "et",
            "dow",
            (
                F.col("w")
                * (
                    F.col("target_col")
                    / F.sum("w").over(Window.partitionBy("dow"))
                )
            ).alias("w"),
        )
    return (
        cur.join(cell, ["et", "dow"])
        .select(
            F.col("et").alias("event_type"),
            "dow",
            F.round("w", 6).alias("raked_weight"),
            F.round(F.col("w") / F.col("w0"), 6).alias("weight_ratio"),
        )
        .orderBy("event_type", "dow")
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR multiple-testing correction
# ---------------------------------------------------------------------------

_BH_Q = 0.05


@query(
    "benjamini_hochberg_fdr",
    oracle=f"""
    WITH cell AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS k
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT hr, CAST(sum(k) AS BIGINT) AS nh FROM cell GROUP BY 1
    ), z AS (
      SELECT c.event_type, c.hr, c.k, m.nh,
             (c.k - m.nh / 5.0)
               / sqrt(m.nh / 5.0 * (1 - 1.0 / 5.0)) AS zs
      FROM cell c JOIN m USING (hr)
    ), p AS (
      SELECT event_type, hr, k, round(zs, 6) AS zscore,
             round(2.0 / (1.0 + exp(1.702 * abs(zs))), 6) AS pval
      FROM z
    ), rk AS (
      SELECT *, row_number() OVER (ORDER BY pval, event_type, hr) AS i,
             count(*) OVER () AS mm
      FROM p
    ), thresh AS (
      SELECT CAST(max(CASE WHEN pval * mm <= {_BH_Q} * i THEN i ELSE 0 END)
                  AS BIGINT) AS cut
      FROM rk
    )
    SELECT rk.event_type, rk.hr, rk.k, rk.zscore, rk.pval,
           (rk.pval <= {_BH_Q}) AS naive_flag,
           (rk.i <= thresh.cut) AS discovery
    FROM rk CROSS JOIN thresh
    ORDER BY rk.pval, rk.event_type, rk.hr
    """,
)
def benjamini_hochberg_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over the (event_type × hour) rate
    anomaly scan: each of the 120 cells gets a two-sided normal p-value
    for 'this type's share within the hour deviates from the equal-share
    null', and BH's step-up rule
    (largest i with p_(i) ≤ q·i/m) marks discoveries at q={_BH_Q} — the
    multiple-testing discipline a metrics platform needs when it runs
    thousands of screens a day (seasonal_anomaly_zscore flags cells
    one-at-a-time; this controls the family-wise false-discovery rate).
    p-values use the logistic approximation of the normal tail
    (Φ(z) ≈ σ(1.702z), max abs error < 0.01 — erfc is absent from one
    engine's SQL surface, and BH only needs a monotone, identically
    computed p) — exp is correctly rounded and identical in both
    engines; ranks run over the 120-cell dimension. On this uniform
    synthetic feed the naive per-test threshold still flags a handful of
    cells (naive_flag — the expected ~5% false positives); BH correctly
    discovers NONE — the contrast between the two flag columns is the
    operator's whole value.

    Scale: one map-side-combined pass builds the cells; ranking and the
    step-up cut run on the |types|×|hours| dimension frame. For
    million-test scans the rank becomes the two-level bucketed prefix
    (p-value buckets), same as mann_whitney_u.
    """
    cell = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.expr("CAST(hour(ts) AS BIGINT)").alias("hr"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    )
    m = cell.groupBy("hr").agg(F.sum("k").cast("bigint").alias("nh"))
    z = cell.join(F.broadcast(m), "hr").select(
        "event_type",
        "hr",
        "k",
        (
            (F.col("k") - F.col("nh") / 5.0)
            / F.sqrt(F.col("nh") / 5.0 * (1 - 1.0 / 5.0))
        ).alias("zs"),
    )
    p = z.select(
        "event_type",
        "hr",
        "k",
        F.round("zs", 6).alias("zscore"),
        # 6dp-quantized BEFORE ranking: Math.exp (JVM) and libm exp can
        # differ in the last ulp, which would flip tie order / the step-up
        # boundary between engines
        F.round(F.expr("2.0 / (1.0 + exp(1.702 * abs(zs)))"), 6).alias("pval"),
    )
    wd = Window.partitionBy()
    rk = p.select(
        "*",
        F.row_number()
        .over(Window.orderBy("pval", "event_type", "hr"))
        .alias("i"),
        F.count(F.lit(1)).over(wd).alias("mm"),
    )
    thresh = rk.agg(
        F.max(
            F.when(F.col("pval") * F.col("mm") <= _BH_Q * F.col("i"), F.col("i"))
            .otherwise(0)
        )
        .cast("bigint")
        .alias("cut")
    )
    return (
        rk.crossJoin(F.broadcast(thresh))
        .select(
            "event_type",
            "hr",
            "k",
            "zscore",
            "pval",
            (F.col("pval") <= _BH_Q).alias("naive_flag"),
            (F.col("i") <= F.col("cut")).alias("discovery"),
        )
        .orderBy("pval", "event_type", "hr")
    )


# ---------------------------------------------------------------------------
# Simpson's-paradox detector: pooled vs within-stratum trend reversal
# ---------------------------------------------------------------------------


@query(
    "simpson_paradox_detector",
    oracle="""
    WITH o AS (
      SELECT c.c_nationkey AS nation, c.c_mktsegment AS seg,
             CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS hi
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
    ), cell AS (
      SELECT nation, seg, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(hi) AS BIGINT) AS h
      FROM o GROUP BY 1, 2
    ), strat AS (
      SELECT nation,
             max(CASE WHEN seg = 'BUILDING' THEN n END) AS na,
             max(CASE WHEN seg = 'BUILDING' THEN h END) AS ha,
             max(CASE WHEN seg = 'MACHINERY' THEN n END) AS nb,
             max(CASE WHEN seg = 'MACHINERY' THEN h END) AS hb
      FROM cell GROUP BY 1
      HAVING max(CASE WHEN seg = 'BUILDING' THEN n END) > 0
         AND max(CASE WHEN seg = 'MACHINERY' THEN n END) > 0
    ), pooled AS (
      SELECT CAST(sum(ha) AS BIGINT) AS pha, CAST(sum(na) AS BIGINT) AS pna,
             CAST(sum(hb) AS BIGINT) AS phb, CAST(sum(nb) AS BIGINT) AS pnb
      FROM strat
    )
    SELECT s.nation,
           CAST(s.ha * 1000000 // s.na AS BIGINT) AS rate_a_ppm,
           CAST(s.hb * 1000000 // s.nb AS BIGINT) AS rate_b_ppm,
           sign(s.ha * s.nb - s.hb * s.na) = -sign(p.pha * p.pnb - p.phb * p.pna)
             AND sign(s.ha * s.nb - s.hb * s.na) <> 0 AS reversed,
           CAST(p.pha * 1000000 // p.pna AS BIGINT) AS pooled_a_ppm,
           CAST(p.phb * 1000000 // p.pnb AS BIGINT) AS pooled_b_ppm
    FROM strat s CROSS JOIN pooled p
    ORDER BY s.nation
    """,
)
def simpson_paradox_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen: does the pooled BUILDING-vs-MACHINERY
    difference in urgent-order rate REVERSE inside individual nation
    strata? Per-nation rate comparisons use the exact cross-product sign
    test h_a·n_b − h_b·n_a (no float rates ever compared), so 'reversed'
    is an exact integer predicate; rates are reported in exact ppm. The
    aggregation-pitfall audit that belongs next to mix_shift_decomposition
    (which quantifies composition effects; this one flags where they
    flip a conclusion outright).

    Scale: one fact join + one (nation × segment) cell aggregate; the
    stratum pivot and pooled totals run on the 25-row nation dimension
    with a 1-row broadcast.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    cell = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("bigint").alias("hi"),
        )
        .groupBy("nation", "seg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"), F.sum("hi").cast("bigint").alias("h"))
    )
    strat = (
        cell.groupBy("nation")
        .agg(
            F.max(F.when(F.col("seg") == "BUILDING", F.col("n"))).alias("na"),
            F.max(F.when(F.col("seg") == "BUILDING", F.col("h"))).alias("ha"),
            F.max(F.when(F.col("seg") == "MACHINERY", F.col("n"))).alias("nb"),
            F.max(F.when(F.col("seg") == "MACHINERY", F.col("h"))).alias("hb"),
        )
        .where(F.col("na").isNotNull() & F.col("nb").isNotNull())
        .where((F.col("na") > 0) & (F.col("nb") > 0))
    )
    pooled = strat.agg(
        F.sum("ha").cast("bigint").alias("pha"),
        F.sum("na").cast("bigint").alias("pna"),
        F.sum("hb").cast("bigint").alias("phb"),
        F.sum("nb").cast("bigint").alias("pnb"),
    )
    d_strat = F.col("ha") * F.col("nb") - F.col("hb") * F.col("na")
    d_pool = F.col("pha") * F.col("pnb") - F.col("phb") * F.col("pna")
    return (
        strat.crossJoin(F.broadcast(pooled))
        .select(
            "nation",
            F.expr("ha * 1000000 div na").cast("bigint").alias("rate_a_ppm"),
            F.expr("hb * 1000000 div nb").cast("bigint").alias("rate_b_ppm"),
            (
                (F.signum(d_strat) == -F.signum(d_pool))
                & (F.signum(d_strat) != 0)
            ).alias("reversed"),
            F.expr("pha * 1000000 div pna").cast("bigint").alias("pooled_a_ppm"),
            F.expr("phb * 1000000 div pnb").cast("bigint").alias("pooled_b_ppm"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# Off-policy evaluation: inverse-propensity scoring of a greedy policy
# ---------------------------------------------------------------------------


@query(
    "offline_policy_ips",
    oracle="""
    WITH logs AS (
      SELECT CAST(hour(ts) AS BIGINT) AS ctx, event_type AS act,
             CAST(round(value * 100) AS BIGINT) AS r
      FROM events
    ), cell AS (
      SELECT ctx, act, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(r) AS BIGINT) AS s
      FROM logs GROUP BY 1, 2
    ), nx AS (SELECT ctx, CAST(sum(c) AS BIGINT) AS n FROM cell GROUP BY 1),
    pi AS (
      -- greedy target policy: the empirically-best action per context,
      -- exact cross-product comparison s_a * c_b > s_b * c_a, ties by act
      SELECT ctx, act AS pi_act FROM (
        SELECT ctx, act,
               row_number() OVER (PARTITION BY ctx
                                  ORDER BY s * 1000000 // c DESC, act) AS rk
        FROM cell
      ) WHERE rk = 1
    ), contrib AS (
      SELECT c.ctx, c.act, c.c, c.s, nx.n,
             CAST(c.s AS DOUBLE) * nx.n / c.c AS ips_part
      FROM cell c JOIN nx USING (ctx) JOIN pi
        ON pi.ctx = c.ctx AND pi.pi_act = c.act
    ), tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_matched,
             CAST(sum(s) AS BIGINT) AS matched_reward_cents,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
                         list(ips_part ORDER BY ctx)),
                         (a, v) -> a + v) AS ips_sum
      FROM contrib
    ), base AS (
      SELECT CAST(sum(s) AS BIGINT) AS total_reward_cents,
             CAST(sum(c) AS BIGINT) AS n_logs
      FROM cell
    )
    SELECT t.n_matched, t.matched_reward_cents,
           round(t.ips_sum / b.n_logs / 100.0, 6) AS ips_value,
           round(b.total_reward_cents * 1.0 / b.n_logs / 100.0, 6)
             AS behavior_value,
           (t.ips_sum / b.n_logs
              >= b.total_reward_cents * 1.0 / b.n_logs) AS policy_wins
    FROM tot t CROSS JOIN base b
    """,
)
def offline_policy_ips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation by inverse-propensity scoring: the logged
    event stream is treated as (context = hour, action = event type,
    reward = value in exact cents); the GREEDY target policy picks each
    context's empirically-best action (exact integer rate comparison),
    and its value is estimated as IPS = 1/n Σ 1{a=π(x)}·r/p̂(a|x) with
    the behavior propensity p̂ = c(x,a)/n(x) from the log's own counts —
    so each (context, action) cell contributes the exact rational
    s·n/c. The ≤|ctx| cell contributions are float-summed in a SORTED
    ordered fold (list_reduce / sorted-array aggregate), the repo's
    standard trick for cross-engine float determinism. This is the
    counterfactual 'what would the greedy policy have earned' readout —
    the evaluation layer a recommendation/bandit pipeline needs before
    shipping a policy.

    Scale: one map-side-combined (context, action) aggregate; policy
    selection and IPS run on that dimension frame; nothing per-row after
    the first pass.
    """
    logs = load(spark, sf_dir, "events").select(
        F.expr("CAST(hour(ts) AS BIGINT)").alias("ctx"),
        F.col("event_type").alias("act"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("r"),
    )
    cell = logs.groupBy("ctx", "act").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("r").cast("bigint").alias("s"),
    )
    nx = cell.groupBy("ctx").agg(F.sum("c").cast("bigint").alias("n"))
    pi = (
        cell.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("ctx").orderBy(
                    F.expr("s * 1000000 div c").desc(), "act"
                )
            ),
        )
        .where(F.col("rk") == 1)
        .select("ctx", F.col("act").alias("pi_act"))
    )
    pi2 = pi.select(F.col("ctx").alias("pctx"), "pi_act")
    contrib = (
        cell.join(F.broadcast(nx), "ctx")
        .join(
            F.broadcast(pi2),
            (F.col("ctx") == F.col("pctx")) & (F.col("act") == F.col("pi_act")),
        )
        .select(
            F.col("ctx").alias("cctx"),
            "c",
            "s",
            "n",
            (F.col("s").cast("double") * F.col("n") / F.col("c")).alias(
                "ips_part"
            ),
        )
    )
    tot = contrib.agg(
        F.sum("c").cast("bigint").alias("n_matched"),
        F.sum("s").cast("bigint").alias("matched_reward_cents"),
        F.expr(
            """
            aggregate(
              transform(array_sort(collect_list(struct(cctx, ips_part))),
                        x -> x.ips_part),
              CAST(0.0 AS DOUBLE), (a, v) -> a + v)
            """
        ).alias("ips_sum"),
    )
    base = cell.agg(
        F.sum("s").cast("bigint").alias("total_reward_cents"),
        F.sum("c").cast("bigint").alias("n_logs"),
    )
    return tot.crossJoin(F.broadcast(base)).select(
        "n_matched",
        "matched_reward_cents",
        F.round(F.col("ips_sum") / F.col("n_logs") / 100.0, 6).alias("ips_value"),
        F.round(
            F.col("total_reward_cents") * 1.0 / F.col("n_logs") / 100.0, 6
        ).alias("behavior_value"),
        (
            F.col("ips_sum") / F.col("n_logs")
            >= F.col("total_reward_cents") * 1.0 / F.col("n_logs")
        ).alias("policy_wins"),
    )
