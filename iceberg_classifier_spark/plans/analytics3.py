"""Third analytics batch: CUSUM changepoint detection, day-of-week
seasonality indices, and association-rule mining with exact SQL oracles.

Same exactness rules as the rest of the repo: cents as int64, CUSUM scores
as exact integer cross-products compared without division, one final float
step at the query edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_CENTS_V = "CAST(round(value * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# CUSUM mean-shift changepoint per series
# ---------------------------------------------------------------------------

@query(
    "cusum_changepoint",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(extract(day FROM ts) AS BIGINT) AS day,
             sum({_CENTS_V}) AS cents
      FROM events GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, day, cents,
             sum(cents) OVER (PARTITION BY event_type ORDER BY day) AS sk,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
             sum(cents) OVER (PARTITION BY event_type) AS sn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ), scored AS (
      SELECT event_type, day, k, n,
             abs(CAST(n AS HUGEINT) * sk - CAST(k AS HUGEINT) * sn) AS score,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY abs(CAST(n AS HUGEINT) * sk
                            - CAST(k AS HUGEINT) * sn) DESC, day) AS r,
             sk, sn
      FROM cum WHERE k < n
    )
    SELECT event_type, day AS changepoint_day,
           CAST((200 * abs(CAST(n AS HUGEINT) * sk - CAST(k AS HUGEINT) * sn)
                 + n * n)
                // (2 * CAST(n AS HUGEINT) * n) AS DOUBLE) / 100
             AS shift_score,
           CAST((200 * sk + 100 * k) // (200 * k) AS DOUBLE) / 100
             AS mean_before,
           CAST((200 * (sn - sk) + 100 * (n - k)) // (200 * (n - k))
                AS DOUBLE) / 100 AS mean_after
    FROM scored WHERE r = 1 ORDER BY event_type
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event series: the split day k that
    maximizes |S_k − (k/n)·S_n| — the binary-segmentation statistic for a
    mean shift — plus before/after means. The score is compared as the
    EXACT integer cross-product |n·S_k − k·S_n| (no division, no floats in
    the argmax), with a day tiebreak, so the detected changepoint is
    bit-stable across engines; divisions happen once on the winning row.

    Scale: the fact table collapses to per-(series, day) sums with
    map-side combine; the CUSUM windows run over day-level rows per
    series. Recursing into sub-segments (full binary segmentation) reuses
    the same daily aggregate with segment-bounded windows.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.dayofmonth("ts").cast("bigint").alias("day")
    ).agg(F.sum(F.expr(_CENTS_V)).alias("cents"))
    ws = Window.partitionBy("event_type").orderBy("day")
    wp = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "day",
        F.sum("cents").over(ws).alias("sk"),
        F.row_number().over(ws).alias("k"),
        F.sum("cents").over(wp).alias("sn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    ).filter(F.col("k") < F.col("n"))
    # operands widened BEFORE the products (not just the result cast):
    # n*sk / k*sn are int64×int64 and overflow before any outer cast at
    # large scale factors; decimal(38,0)×bigint promotes to decimal, so
    # the products themselves are exact (oracle mirrors with HUGEINT)
    score = F.abs(
        F.col("n").cast("decimal(38,0)") * F.col("sk")
        - F.col("k").cast("decimal(38,0)") * F.col("sn")
    )
    scored = cum.withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(score.desc(), "day")
        ),
    )
    return (
        scored.filter(F.col("r") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            # integer HALF_UP (motif convention): round2(a/b) ==
            # ((200a + b) div (2b)) / 100 — exact quotients of exact ints
            # never round a double at a decimal boundary; the PRODUCT
            # OPERANDS are widened to decimal(38,0) before multiplying
            # (n*sk and k*sn would overflow int64 at large scale factors
            # if computed first and cast after)
            (
                F.expr(
                    "CAST((200 * abs(CAST(n AS DECIMAL(38,0)) * sk"
                    " - CAST(k AS DECIMAL(38,0)) * sn)"
                    " + n * n) div (2 * CAST(n AS DECIMAL(38,0)) * n)"
                    " AS DOUBLE)"
                )
                / 100
            ).alias("shift_score"),
            (
                F.expr("(200 * sk + 100 * k) div (200 * k)").cast("double")
                / 100
            ).alias("mean_before"),
            (
                F.expr(
                    "(200 * (sn - sk) + 100 * (n - k)) div (200 * (n - k))"
                ).cast("double")
                / 100
            ).alias("mean_after"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Day-of-week seasonality indices
# ---------------------------------------------------------------------------

@query(
    "seasonal_dow_index",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(extract(isodow FROM ts) AS BIGINT) AS dow,
             CAST(ts AS DATE) AS d,
             sum({_CENTS_V}) AS cents,
             count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(n) AS BIGINT) AS n_events,
           round(sum(cents) * 1.0 / count(*) / 100.0, 2) AS avg_daily_value,
           round((sum(cents) * 1.0 / count(*))
                 / ((sum(sum(cents)) OVER ()) * 1.0
                    / (sum(count(*)) OVER ())), 6) AS seasonal_index
    FROM daily GROUP BY 1 ORDER BY dow
    """,
)
def seasonal_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile: average daily value per ISO
    weekday and the multiplicative seasonal index (weekday average ÷
    all-days average) — the classical-decomposition building block used to
    deseasonalize series before trend/anomaly work (the ratio-to-moving-
    average method's seasonal step). Index > 1 = that weekday runs hot.

    Scale: one (weekday, date) aggregation with map-side combine, then the
    index from global window sums over the ≤7-row result — a single scan,
    no join, same shape at any volume.
    """
    e = load(spark, sf_dir, "events")
    # ISO weekday (1=Mon..7=Sun) to match DuckDB's isodow
    daily = e.groupBy(
        (F.weekday("ts") + 1).cast("bigint").alias("dow"),
        F.col("ts").cast("date").alias("d"),
    ).agg(F.sum(F.expr(_CENTS_V)).alias("cents"), F.count(F.lit(1)).alias("n"))
    wall = Window.partitionBy()
    by_dow = daily.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("n_events"),
        F.sum("cents").alias("cents"),
    )
    return by_dow.select(
        "dow",
        "n_days",
        "n_events",
        F.round(F.col("cents") * 1.0 / F.col("n_days") / 100.0, 2).alias(
            "avg_daily_value"
        ),
        F.round(
            (F.col("cents") * 1.0 / F.col("n_days"))
            / (
                F.sum("cents").over(wall)
                * 1.0
                / F.sum("n_days").over(wall)
            ),
            6,
        ).alias("seasonal_index"),
    ).orderBy("dow")


# ---------------------------------------------------------------------------
# Association rules (support / confidence / lift) over daily baskets
# ---------------------------------------------------------------------------

@query(
    "association_rules",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT user_id, CAST(extract(day FROM ts) AS BIGINT) AS day,
             event_type
      FROM events
    ), nb AS (
      SELECT count(DISTINCT (user_id, day)) AS n
      FROM baskets
    ), item AS (
      SELECT event_type, count(*) AS cnt FROM baskets GROUP BY 1
    ), pair AS (
      SELECT a.event_type AS ante, b.event_type AS cons, count(*) AS cnt
      FROM baskets a JOIN baskets b
        ON a.user_id = b.user_id AND a.day = b.day
       AND a.event_type <> b.event_type
      GROUP BY 1, 2
    )
    SELECT p.ante, p.cons, p.cnt AS pair_count,
           round(p.cnt * 1.0 / nb.n, 6) AS support,
           round(p.cnt * 1.0 / ia.cnt, 6) AS confidence,
           round((p.cnt * 1.0 / ia.cnt) / (ic.cnt * 1.0 / nb.n), 6) AS lift
    FROM pair p
    JOIN item ia ON p.ante = ia.event_type
    JOIN item ic ON p.cons = ic.event_type
    CROSS JOIN nb
    ORDER BY ante, cons
    """,
)
def association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules ante→cons over (user, day) baskets of event
    types: support, confidence and lift from exact basket counts — the
    rule-quality layer on top of frequent-itemset mining (the
    `fpgrowth_itemsets` op finds the itemsets; this scores the directed
    rules, fully SQL-oracle-checked).

    Scale: baskets dedup with one (user, day, type) aggregation; the pair
    join is blocked on the basket key (never a cross join) and collapses
    immediately to a |types|² count table; item counts and the basket
    total broadcast onto it. At larger vocabularies the same plan holds —
    the pair explosion is bounded by items-per-basket², not corpus size.
    """
    e = load(spark, sf_dir, "events")
    baskets = e.select(
        "user_id", F.dayofmonth("ts").cast("bigint").alias("day"), "event_type"
    ).distinct()
    nb = baskets.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    item = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") != F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ante"),
            F.col("b.event_type").alias("cons"),
        )
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    ia = F.broadcast(item.select(F.col("event_type").alias("ante"), F.col("cnt").alias("ante_cnt")))
    ic = F.broadcast(item.select(F.col("event_type").alias("cons"), F.col("cnt").alias("cons_cnt")))
    return (
        pair.join(ia, "ante")
        .join(ic, "cons")
        .crossJoin(F.broadcast(nb))
        .select(
            "ante",
            "cons",
            "pair_count",
            F.round(F.col("pair_count") * 1.0 / F.col("n"), 6).alias("support"),
            F.round(
                F.col("pair_count") * 1.0 / F.col("ante_cnt"), 6
            ).alias("confidence"),
            F.round(
                (F.col("pair_count") * 1.0 / F.col("ante_cnt"))
                / (F.col("cons_cnt") * 1.0 / F.col("n")),
                6,
            ).alias("lift"),
        )
        .orderBy("ante", "cons")
    )


# ---------------------------------------------------------------------------
# Seasonal anomaly z-scores (residuals vs the weekday-hour profile)
# ---------------------------------------------------------------------------

@query(
    "seasonal_anomaly_zscore",
    oracle=f"""
    WITH slot AS (
      SELECT CAST(extract(isodow FROM ts) AS BIGINT) AS dow,
             CAST(extract(hour FROM ts) AS BIGINT) AS hr,
             CAST(ts AS DATE) AS d,
             sum({_CENTS_V}) AS cents
      FROM events GROUP BY 1, 2, 3
    ), prof AS (
      SELECT dow, hr, cents, d,
             count(*) OVER w AS n,
             sum(cents) OVER w AS sx,
             sum(CAST(cents AS HUGEINT) * cents) OVER w AS sxx
      FROM slot WINDOW w AS (PARTITION BY dow, hr)
    ), z AS (
      SELECT dow, hr, d, cents, n,
             (cents - sx * 1.0 / n)
             / sqrt((sxx - sx * 1.0 / n * sx) / (n - 1)) AS zscore
      FROM prof WHERE n >= 3
        AND (sxx - sx * 1.0 / n * sx) > 0
    )
    SELECT dow, hr, CAST(d AS VARCHAR) AS day, round(cents / 100.0, 2)
             AS slot_value,
           round(zscore, 4) AS zscore
    FROM z
    ORDER BY abs(round(zscore, 4)) DESC, dow, hr, day LIMIT 20
    """,
)
def seasonal_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal anomaly detection: each (weekday, hour, date) slot's value
    is z-scored against the profile of the SAME weekday-hour across all
    weeks — so a quiet Sunday 3am doesn't alarm against a busy Monday noon
    baseline — and the 20 most anomalous slots surface. Mean and variance
    come from exact integer moment sums per profile (the Σx² rides as
    int128/decimal), so the z-scores are a fixed double formula over exact
    integers — bit-stable across engines.

    Scale: one (dow, hr, date) aggregation with map-side combine; the
    profile moments are window sums over that ~(7·24·31)-row aggregate.
    Streaming flavor: the same profile broadcast against a live window agg.
    """
    e = load(spark, sf_dir, "events")
    slot = e.groupBy(
        (F.weekday("ts") + 1).cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hr"),
        F.col("ts").cast("date").alias("d"),
    ).agg(F.sum(F.expr(_CENTS_V)).alias("cents"))
    wp = Window.partitionBy("dow", "hr")
    prof = slot.select(
        "dow",
        "hr",
        "d",
        "cents",
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("cents").over(wp).alias("sx"),
        F.sum(
            F.col("cents").cast("decimal(19,0)") * F.col("cents").cast("decimal(19,0)")
        )
        .over(wp)
        .alias("sxx"),
    )
    mean = F.col("sx") * 1.0 / F.col("n")
    var = (F.col("sxx") - mean * F.col("sx")) / (F.col("n") - 1)
    z = prof.filter((F.col("n") >= 3) & (var > 0)).select(
        "dow",
        "hr",
        F.col("d").cast("string").alias("day"),
        F.round(F.col("cents") / 100.0, 2).alias("slot_value"),
        F.round((F.col("cents") - mean) / F.sqrt(var), 4).alias("zscore"),
    )
    # top-k by |z|, not a fixed σ gate: with w weeks of history a profile
    # has n = w points and max |z| = (n-1)/sqrt(n) — a 2σ cut is
    # unreachable until n > 5, so it silently returns nothing on short
    # histories; ranking always surfaces the most anomalous slots
    return z.orderBy(F.abs(F.col("zscore")).desc(), "dow", "hr", "day").limit(20)


# ---------------------------------------------------------------------------
# OHLC bars (open-high-low-close per series per hour)
# ---------------------------------------------------------------------------

@query(
    "events_ohlc_bars",
    oracle=f"""
    WITH v AS (
      SELECT event_type, date_trunc('hour', ts) AS bar, ts, event_id,
             {_CENTS_V} AS cents,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_open,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events
    )
    SELECT event_type, CAST(bar AS VARCHAR) AS bar_start,
           round(max(CASE WHEN rn_open = 1 THEN cents END) / 100.0, 2)
             AS open,
           round(max(cents) / 100.0, 2) AS high,
           round(min(cents) / 100.0, 2) AS low,
           round(max(CASE WHEN rn_close = 1 THEN cents END) / 100.0, 2)
             AS close,
           count(*) AS n_ticks
    FROM v GROUP BY 1, 2 ORDER BY event_type, bar_start
    """,
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candlestick bars per event series: open and close come
    from deterministic (ts, event_id) first/last ranks — never
    shuffle-order first()/last(), which are nondeterministic in a
    distributed engine — high/low/count are plain aggregates. The
    market-data downsampling every time-series store ships.

    Scale: one window + aggregation pass partitioned by (series, hour) —
    the same exchange serves both; bars are emitted with map-side partial
    aggregation for high/low/count. Finer bars = same plan, more groups.
    """
    e = load(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bar"),
        "ts",
        "event_id",
        F.expr(_CENTS_V).alias("cents"),
    )
    wb = Window.partitionBy("event_type", "bar")
    v = base.select(
        "event_type",
        "bar",
        "cents",
        F.row_number().over(wb.orderBy("ts", "event_id")).alias("rn_open"),
        F.row_number()
        .over(wb.orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("rn_close"),
    )
    return (
        v.groupBy("event_type", F.col("bar").cast("string").alias("bar_start"))
        .agg(
            F.round(
                F.max(F.when(F.col("rn_open") == 1, F.col("cents"))) / 100.0, 2
            ).alias("open"),
            F.round(F.max("cents") / 100.0, 2).alias("high"),
            F.round(F.min("cents") / 100.0, 2).alias("low"),
            F.round(
                F.max(F.when(F.col("rn_close") == 1, F.col("cents"))) / 100.0, 2
            ).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .orderBy("event_type", "bar_start")
    )


# ---------------------------------------------------------------------------
# FIFO inventory matching via cumulative-interval overlap join
# ---------------------------------------------------------------------------

@query(
    "fifo_inventory_matching",
    oracle="""
    WITH flow AS (
      SELECT l_partkey AS pk, l_returnflag AS f,
             CAST(round(l_quantity) AS BIGINT) AS q,
             l_shipdate, l_orderkey, l_linenumber
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ), cum AS (
      SELECT pk, f, q,
             sum(q) OVER (PARTITION BY pk, f
                          ORDER BY l_shipdate, l_orderkey, l_linenumber) AS hi
      FROM flow
    ), supply AS (
      SELECT pk, hi - q AS lo, hi FROM cum WHERE f = 'R'
    ), demand AS (
      SELECT pk, hi - q AS lo, hi FROM cum WHERE f = 'N'
    ), matches AS (
      SELECT s.pk,
             least(s.hi, d.hi) - greatest(s.lo, d.lo) AS mq
      FROM supply s JOIN demand d
        ON s.pk = d.pk AND s.lo < d.hi AND d.lo < s.hi
    ), totals AS (
      SELECT pk,
             sum(CASE WHEN f = 'R' THEN q ELSE 0 END) AS ts,
             sum(CASE WHEN f = 'N' THEN q ELSE 0 END) AS td
      FROM flow GROUP BY 1
    )
    SELECT t.pk % 8 AS bucket,
           CAST(count(DISTINCT t.pk) AS BIGINT) AS n_parts,
           CAST(coalesce(sum(m.n_matches), 0) AS BIGINT) AS n_matches,
           CAST(coalesce(sum(m.matched_qty), 0) AS BIGINT) AS matched_qty,
           CAST(sum(greatest(t.td - t.ts, 0)) AS BIGINT) AS unmet_demand
    FROM totals t LEFT JOIN (
      SELECT pk, count(*) AS n_matches, sum(mq) AS matched_qty
      FROM matches GROUP BY 1
    ) m ON t.pk = m.pk
    GROUP BY 1 ORDER BY bucket
    """,
)
def fifo_inventory_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO inventory matching: per part, receipts (returnflag R) and
    issues (returnflag N) each become cumulative-quantity intervals
    [cum−q, cum) in FIFO order, and an issue consumes exactly the receipt
    intervals it overlaps — the standard costing/lot-attribution
    construction that turns a sequential 'walk both lists' algorithm into
    a relational interval-overlap join. Matched quantity is the overlap
    length (exact int64); unmet demand is the demand tail beyond total
    supply. Reported per part-bucket.

    Scale: the overlap join is an equi-join on partkey with the interval
    predicate applied post-join; FIFO geometry bounds true matches at
    supplies+demands per part, so per-key fan-out is linear in chain
    length. For parts with huge chains, block the join further on
    (partkey, cum div B) so candidates stay near the diagonal.
    """
    flow = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("R", "N"))
        .select(
            F.col("l_partkey").alias("pk"),
            F.col("l_returnflag").alias("f"),
            F.round("l_quantity").cast("bigint").alias("q"),
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
        )
    )
    wc = Window.partitionBy("pk", "f").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    cum = flow.select(
        "pk", "f", "q", F.sum("q").over(wc).alias("hi")
    ).withColumn("lo", F.col("hi") - F.col("q"))
    supply = cum.filter(F.col("f") == "R").select(
        "pk", F.col("lo").alias("slo"), F.col("hi").alias("shi")
    )
    demand = cum.filter(F.col("f") == "N").select(
        F.col("pk").alias("dpk"), F.col("lo").alias("dlo"), F.col("hi").alias("dhi")
    )
    matches = (
        supply.join(
            demand,
            (F.col("pk") == F.col("dpk"))
            & (F.col("slo") < F.col("dhi"))
            & (F.col("dlo") < F.col("shi")),
        )
        .select(
            "pk",
            (
                F.least("shi", "dhi") - F.greatest("slo", "dlo")
            ).alias("mq"),
        )
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("n_matches"), F.sum("mq").alias("matched_qty"))
    )
    totals = flow.groupBy("pk").agg(
        F.sum(F.when(F.col("f") == "R", F.col("q")).otherwise(0)).alias("ts"),
        F.sum(F.when(F.col("f") == "N", F.col("q")).otherwise(0)).alias("td"),
    )
    return (
        totals.join(matches, "pk", "left")
        .groupBy((F.col("pk") % 8).alias("bucket"))
        .agg(
            F.count_distinct("pk").alias("n_parts"),
            F.coalesce(F.sum("n_matches"), F.lit(0)).alias("n_matches"),
            F.coalesce(F.sum("matched_qty"), F.lit(0)).alias("matched_qty"),
            F.sum(F.greatest(F.col("td") - F.col("ts"), F.lit(0))).alias(
                "unmet_demand"
            ),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Maximum drawdown per user (running peak-to-trough)
# ---------------------------------------------------------------------------

@query(
    "max_drawdown_users",
    oracle=f"""
    WITH flows AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase' THEN {_CENTS_V}
                  ELSE -{_CENTS_V} END AS d
      FROM events WHERE event_type IN ('purchase', 'click')
    ), eq AS (
      SELECT user_id, ts, event_id,
             sum(d) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s
      FROM flows
    ), dd AS (
      SELECT user_id, s,
             max(s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS peak
      FROM eq
    )
    SELECT user_id,
           round(max(peak - s) / 100.0, 2) AS max_drawdown,
           round(max(peak) / 100.0, 2) AS peak_equity,
           round(CAST(sum(CASE WHEN s = peak THEN 1 ELSE 0 END) AS BIGINT)
                 * 1.0 / count(*), 6) AS at_peak_frac
    FROM dd GROUP BY 1
    ORDER BY max(peak - s) DESC, user_id LIMIT 20
    """,
)
def max_drawdown_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user equity curve (purchases credit, clicks
    debit): the largest peak-to-trough drop of the running balance — the
    risk metric every portfolio/treasury dashboard carries — plus the peak
    itself and the fraction of time spent AT the running peak. The same
    prefix-extremum trick as `clamped_running_balance` with min flipped to
    max: drawdown_t = (running max of S) − S_t, all exact int64 cents, so
    a single window pass replaces the sequential scan.

    Scale: one (user) shuffle feeding two stacked running windows and a
    final aggregate — no join, no recursion; top-20 with deterministic
    tiebreaks keeps the output bounded.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    flows = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.expr(_CENTS_V))
        .otherwise(-F.expr(_CENTS_V))
        .alias("d"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    eq = flows.select("user_id", "ts", "event_id", F.sum("d").over(w).alias("s"))
    dd = eq.select("user_id", "s", F.max("s").over(w).alias("peak"))
    return (
        dd.groupBy("user_id")
        .agg(
            F.round(F.max(F.col("peak") - F.col("s")) / 100.0, 2).alias(
                "max_drawdown"
            ),
            F.round(F.max("peak") / 100.0, 2).alias("peak_equity"),
            F.round(
                F.sum((F.col("s") == F.col("peak")).cast("bigint"))
                * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("at_peak_frac"),
            F.max(F.col("peak") - F.col("s")).alias("_dd_cents"),
        )
        .orderBy(F.desc("_dd_cents"), "user_id")
        .limit(20)
        .drop("_dd_cents")
    )


# ---------------------------------------------------------------------------
# Positional phrase search (posting-list intersection)
# ---------------------------------------------------------------------------

_PHRASE = ("table", "value")


@query(
    "phrase_search",
    oracle=f"""
    WITH hits AS (
      SELECT doc_id,
             len(list_filter(generate_series(1, len(toks) - 1),
                 i -> toks[i] = '{_PHRASE[0]}'
                      AND toks[i + 1] = '{_PHRASE[1]}')) AS n_hits
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ), nz AS (SELECT * FROM hits WHERE n_hits > 0)
    SELECT doc_id, n_hits,
           CAST(sum(n_hits) OVER () AS BIGINT) AS total_hits,
           CAST(count(*) OVER () AS BIGINT) AS n_matching_docs
    FROM nz ORDER BY n_hits DESC, doc_id LIMIT 10
    """,
)
def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ('{_PHRASE[0]} {_PHRASE[1]}') the way a search
    engine executes it: tokenize once into a POSITIONAL posting list
    (doc_id, term, position), then intersect the two terms' postings with
    an adjacency predicate pos₂ = pos₁ + 1 — a doc-blocked equi-join, not
    a rescan of the corpus per query. Returns the top-10 matching docs
    plus corpus-wide totals.

    Scale: the posting build is one map-side explode pruned to the query
    terms BEFORE any shuffle (predicate on the exploded term), so the join
    input is |occurrences of the two terms|, not |tokens|. A real index
    would persist the posting list partitioned by term — this op is the
    query-side plan over it; longer phrases chain more adjacency joins.
    """
    from iceberg_classifier_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents")
    posting = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "term")
    ).filter(F.col("term").isin(*_PHRASE))
    p1 = posting.filter(F.col("term") == _PHRASE[0]).select(
        "doc_id", F.col("pos").alias("p1")
    )
    p2 = posting.filter(F.col("term") == _PHRASE[1]).select(
        F.col("doc_id").alias("d2"), F.col("pos").alias("p2")
    )
    hits = (
        p1.join(
            p2,
            (F.col("doc_id") == F.col("d2")) & (F.col("p2") == F.col("p1") + 1),
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    wall = Window.partitionBy()
    return (
        hits.select(
            "doc_id",
            "n_hits",
            F.sum("n_hits").over(wall).alias("total_hits"),
            F.count(F.lit(1)).over(wall).alias("n_matching_docs"),
        )
        .orderBy(F.desc("n_hits"), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend per series
# ---------------------------------------------------------------------------

@query(
    "theil_sen_trend",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(extract(day FROM ts) AS BIGINT) AS day,
             sum({_CENTS_V}) AS cents
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT a.event_type,
             (b.cents - a.cents) * 1.0 / (b.day - a.day) AS slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
    ), ranked AS (
      SELECT event_type, slope,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY slope) AS r,
             count(*) OVER (PARTITION BY event_type) AS np
      FROM pairs
    )
    SELECT event_type, CAST(max(np) AS BIGINT) AS n_pairs,
           round(max(CASE WHEN r = (np + 1) // 2 THEN slope END) / 100.0, 4)
             AS theil_sen_slope
    FROM ranked GROUP BY 1 ORDER BY event_type
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event series: the MEDIAN of all pairwise
    day-to-day slopes of the daily totals — up to ~29% of outlier days
    cannot move it, unlike the least-squares slope (`events_trend`), its
    non-robust counterpart here. Slopes are exact-integer differences with
    one division; the lower median is picked by rank over a (slope) order
    — identical doubles on both engines, so the rank order agrees.

    Scale: the pairwise self-join runs on the per-(series, day) AGGREGATE
    (≤31 rows per series → ≤465 pairs), never raw events — the fact-sized
    work is one map-side-combined aggregation. For very long series,
    Theil-Sen has O(n log n) randomized variants; the aggregate-first
    shape is the part that carries to 100 TB.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.dayofmonth("ts").cast("bigint").alias("day")
    ).agg(F.sum(F.expr(_CENTS_V)).alias("cents"))
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.cents") - F.col("a.cents"))
            * 1.0
            / (F.col("b.day") - F.col("a.day"))
        ).alias("slope"),
    )
    wr = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(wr.orderBy("slope")).alias("r"),
        F.count(F.lit(1)).over(wr).alias("np"),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("np").alias("n_pairs"),
            F.round(
                F.max(
                    F.when(
                        F.col("r") == F.expr("(np + 1) div 2"),
                        F.col("slope"),
                    )
                )
                / 100.0,
                4,
            ).alias("theil_sen_slope"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Isotonic regression on the daily series (minimax closed form)
# ---------------------------------------------------------------------------

@query(
    "isotonic_regression_daily",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(extract(day FROM ts) AS BIGINT) AS day,
             sum({_CENTS_V}) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), idx AS (
      SELECT day, cents,
             row_number() OVER (ORDER BY day) AS i,
             sum(cents) OVER (ORDER BY day) AS s
      FROM daily
    ), seg AS (
      SELECT a.i AS j, b.i AS k,
             (b.s - coalesce(a.s - a.cents, 0)) * 1.0 / (b.i - a.i + 1)
               AS seg_mean
      FROM idx a JOIN idx b ON a.i <= b.i
    ), mn AS (
      SELECT j, k,
             min(seg_mean) OVER (PARTITION BY j ORDER BY k DESC) AS m_jk
      FROM seg
    ), fit AS (
      SELECT k AS i, max(m_jk) OVER (PARTITION BY k ORDER BY j) AS f
      FROM mn
    ), best AS (
      SELECT i, max(f) AS fitted FROM (
        SELECT i, f, row_number() OVER (PARTITION BY i ORDER BY f DESC) AS r
        FROM fit) WHERE r = 1 GROUP BY 1
    )
    SELECT idx.day, round(idx.cents / 100.0, 2) AS observed,
           round(best.fitted / 100.0, 2) AS fitted
    FROM idx JOIN best ON idx.i = best.i
    ORDER BY idx.day
    """,
)
def isotonic_regression_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone non-decreasing) regression of the daily purchase
    totals — the shape-constrained fit used for calibration curves and
    monotone dose-response — computed NOT by the sequential
    pool-adjacent-violators algorithm but by its minimax closed form:
    fitted_i = max_{j≤i} min_{k≥i} mean(y_j..y_k). Segment means come from
    exact integer prefix sums; the max-of-min runs as two window passes
    over the all-segments table, so the whole fit is declarative.

    Scale: the fact-sized work is one aggregated scan; the O(n²) segment
    table is over the 31-row daily aggregate. For series too long for n²,
    PAVA runs inside applyInPandas per series — this op is the exact
    closed form where n is aggregate-sized, which is the common reporting
    case.
    """
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = e.groupBy(F.dayofmonth("ts").cast("bigint").alias("day")).agg(
        F.sum(F.expr(_CENTS_V)).alias("cents")
    )
    wd = Window.orderBy("day")
    idx = daily.select(
        "day",
        "cents",
        F.row_number().over(wd).alias("i"),
        F.sum("cents").over(wd).alias("s"),
    )
    a = idx.alias("a")
    b = idx.alias("b")
    seg = a.join(b, F.col("a.i") <= F.col("b.i")).select(
        F.col("a.i").alias("j"),
        F.col("b.i").alias("k"),
        (
            (F.col("b.s") - F.coalesce(F.col("a.s") - F.col("a.cents"), F.lit(0)))
            * 1.0
            / (F.col("b.i") - F.col("a.i") + 1)
        ).alias("seg_mean"),
    )
    mn = seg.select(
        "j",
        "k",
        F.min("seg_mean")
        .over(Window.partitionBy("j").orderBy(F.desc("k")))
        .alias("m_jk"),
    )
    fit = mn.select(
        F.col("k").alias("i"),
        F.max("m_jk").over(Window.partitionBy("k").orderBy("j")).alias("f"),
    )
    best = (
        fit.withColumn(
            "r", F.row_number().over(Window.partitionBy("i").orderBy(F.desc("f")))
        )
        .filter(F.col("r") == 1)
        .groupBy("i")
        .agg(F.max("f").alias("fitted"))
    )
    return (
        idx.join(best, "i")
        .select(
            "day",
            F.round(F.col("cents") / 100.0, 2).alias("observed"),
            F.round(F.col("fitted") / 100.0, 2).alias("fitted"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Week-over-week growth report
# ---------------------------------------------------------------------------

@query(
    "wow_growth_report",
    oracle=f"""
    WITH weekly AS (
      SELECT event_type, CAST(extract(week FROM ts) AS BIGINT) AS wk,
             sum({_CENTS_V}) AS cents, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, wk,
           round(cents / 100.0, 2) AS value,
           CAST(n AS BIGINT) AS n_events,
           round((cents - lag(cents) OVER w) * 1.0
                 / lag(cents) OVER w, 6) AS wow_growth,
           round((n - lag(n) OVER w) * 1.0 / lag(n) OVER w, 6)
             AS wow_event_growth
    FROM weekly
    WINDOW w AS (PARTITION BY event_type ORDER BY wk)
    ORDER BY event_type, wk
    """,
)
def wow_growth_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per series: ISO-week totals with relative
    growth in value and event count against the previous week (NULL for
    the first week) — the staple KPI report. Growth ratios are one
    division over exact integer weekly sums.

    Scale: one map-side-combined weekly aggregation; the lag windows run
    on the ~(series × weeks) aggregate. The same plan feeds MoM/QoQ by
    swapping the bucket function.
    """
    e = load(spark, sf_dir, "events")
    weekly = e.groupBy(
        "event_type", F.weekofyear("ts").cast("bigint").alias("wk")
    ).agg(F.sum(F.expr(_CENTS_V)).alias("cents"), F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("wk")
    return weekly.select(
        "event_type",
        "wk",
        F.round(F.col("cents") / 100.0, 2).alias("value"),
        F.col("n").alias("n_events"),
        F.round(
            (F.col("cents") - F.lag("cents").over(w))
            * 1.0
            / F.lag("cents").over(w),
            6,
        ).alias("wow_growth"),
        F.round(
            (F.col("n") - F.lag("n").over(w)) * 1.0 / F.lag("n").over(w), 6
        ).alias("wow_event_growth"),
    ).orderBy("event_type", "wk")


# ---------------------------------------------------------------------------
# Two-pass exact median (bracket-then-count, no global sort)
# ---------------------------------------------------------------------------

_TPM_BUCKETS = 1024


@query(
    "two_pass_median",
    oracle="""
    WITH v AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
             o_orderkey AS k
      FROM orders
    ), ranked AS (
      SELECT c, row_number() OVER (ORDER BY c, k) AS r,
             count(*) OVER () AS n
      FROM v
    )
    SELECT CAST(max(n) AS BIGINT) AS n_rows,
           round(max(CASE WHEN r = (n + 1) // 2 THEN c END) / 100.0, 2)
             AS median_price
    FROM ranked
    """,
)
def two_pass_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (lower) median with NO global sort — the two-pass bracketing
    algorithm a distributed engine actually uses when the exact quantile
    of billions of rows is required: pass 1 histograms values into 1024
    fixed-width buckets (map-side combined, one tiny exchange) and locates
    the bucket holding the median rank; pass 2 scans only values inside
    that bucket, ranking a sliver of the data. The oracle is the plain
    order-statistic — same answer, but its global sort is exactly what
    this plan avoids.

    Scale: both passes are full scans but shuffle almost nothing (1024
    counter rows, then one bucket's values — expected n/1024). Iterating
    the bracket instead of ranking pass-2 gives exact quantiles in
    O(log_B n) passes at any size.
    """
    v = load(spark, sf_dir, "orders").select(
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("c"),
        F.col("o_orderkey").alias("k"),
    )
    lohi = v.agg(
        F.min("c").alias("lo"), F.max("c").alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    lo, hi, n = lohi.lo, lohi.hi, lohi.n
    width = max(1, (hi - lo) // _TPM_BUCKETS + 1)
    hist = (
        v.groupBy(((F.col("c") - lo) / width).cast("bigint").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("b")
        .collect()
    )
    target = (n + 1) // 2
    acc = 0
    for row in hist:
        if acc + row.cnt >= target:
            med_bucket, rank_in_bucket = row.b, target - acc
            break
        acc += row.cnt
    b_lo = lo + med_bucket * width
    b_hi = b_lo + width
    in_bucket = v.filter((F.col("c") >= b_lo) & (F.col("c") < b_hi))
    ranked = in_bucket.select(
        "c", F.row_number().over(Window.orderBy("c", "k")).alias("r")
    )
    return ranked.filter(F.col("r") == rank_in_bucket).select(
        F.lit(n).cast("bigint").alias("n_rows"),
        F.round(F.col("c") / 100.0, 2).alias("median_price"),
    )


# ---------------------------------------------------------------------------
# Inter-arrival exponential fit + KS goodness-of-fit
# ---------------------------------------------------------------------------

@query(
    "interarrival_exp_ks",
    oracle="""
    WITH arr AS (
      SELECT event_type, ts, event_id,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY event_type ORDER BY ts, event_id) AS x
      FROM events
    ), xs AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY x, ts, event_id) AS i,
             count(*) OVER (PARTITION BY event_type) AS n,
             sum(x) OVER (PARTITION BY event_type) AS sx
      FROM arr WHERE x IS NOT NULL
    ), d AS (
      SELECT event_type, n, sx,
             greatest(i * 1.0 / n - (1 - exp(-(n * 1.0 / sx) * x)),
                      (1 - exp(-(n * 1.0 / sx) * x)) - (i - 1) * 1.0 / n)
               AS dd
      FROM xs
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n_gaps,
           round(max(sx) * 1.0 / max(n) / 1000000, 4) AS mean_gap_s,
           round(max(n) * 3600.0 * 1000000 / max(sx), 4) AS rate_per_hour,
           round(max(dd), 6) AS ks_stat
    FROM d GROUP BY 1 ORDER BY event_type
    """,
)
def interarrival_exp_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival-process model check per event series: fit an exponential
    inter-arrival distribution (λ = n/Σx from exact µs-integer gaps) and
    compute the two-sided Kolmogorov-Smirnov statistic against it —
    max(i/n − F(xᵢ), F(xᵢ) − (i−1)/n) over the rank-ordered gaps — the
    standard 'is this actually Poisson?' test behind alerting thresholds
    and queueing models. Deterministic: gaps and their ranks are exact
    integers with (ts, event_id) tiebreaks; F(x) is exp() of identical
    doubles on both engines.

    Scale: one (series)-partitioned window pass produces gaps; the KS scan
    is a second window over the same partitioning (the sort is reused);
    the per-row ECDF never leaves the executor — only 4 numbers per series
    come back.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    arr = e.select(
        "event_type",
        "ts",
        "event_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("x"),
    ).filter(F.col("x").isNotNull())
    wp = Window.partitionBy("event_type")
    xs = arr.select(
        "event_type",
        "x",
        F.row_number().over(wp.orderBy("x", "ts", "event_id")).alias("i"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("x").over(wp).alias("sx"),
    )
    cdf = 1 - F.exp(-(F.col("n") * 1.0 / F.col("sx")) * F.col("x"))
    dd = F.greatest(
        F.col("i") * 1.0 / F.col("n") - cdf,
        cdf - (F.col("i") - 1) * 1.0 / F.col("n"),
    )
    return (
        xs.select("event_type", "n", "sx", dd.alias("dd"))
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n_gaps"),
            F.round(F.max("sx") * 1.0 / F.max("n") / 1000000, 4).alias(
                "mean_gap_s"
            ),
            F.round(
                F.max("n") * 3600.0 * 1000000 / F.max("sx"), 4
            ).alias("rate_per_hour"),
            F.round(F.max("dd"), 6).alias("ks_stat"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# CUPED variance reduction (pre-period covariate adjustment)
# ---------------------------------------------------------------------------

@query(
    "cuped_variance_reduction",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             sum(CASE WHEN extract(day FROM ts) <= 15
                      THEN {_CENTS_V} ELSE 0 END) AS x,
             sum(CASE WHEN extract(day FROM ts) > 15
                      THEN {_CENTS_V} ELSE 0 END) AS y
      FROM events GROUP BY 1
    ), m AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
      FROM per_user
    ), st AS (
      SELECT n,
             sy * 1.0 / n AS mean_y,
             (sxy - sx * 1.0 / n * sy) / (n - 1) AS cov_xy,
             (sxx - sx * 1.0 / n * sx) / (n - 1) AS var_x,
             (syy - sy * 1.0 / n * sy) / (n - 1) AS var_y
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           round(mean_y / 100.0, 2) AS mean_post_value,
           round(cov_xy / var_x, 6) AS theta,
           round(cov_xy * cov_xy / (var_x * var_y), 6)
             AS variance_reduction
    FROM st
    """,
)
def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data): each
    user's pre-period value (days 1-15) becomes the covariate x for their
    experiment-period metric y (days 16-31); θ = cov(x,y)/var(x) is the
    adjustment coefficient and cov²/(var_x·var_y) = ρ² is the variance an
    A/B test's metric loses after adjustment — the sensitivity boost
    experimentation platforms quote. All second moments ride as exact
    integer sums (decimal/int128), so θ and the reduction are a fixed
    double formula over exact integers.

    Scale: one scan with conditional map-side-combined sums per user, one
    5-number moment aggregate — the same single-pass moment shape as
    welch_ttest_priority; per-variant CUPED just adds a group key.
    """
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.dayofmonth("ts") <= 15, F.expr(_CENTS_V)).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(F.dayofmonth("ts") > 15, F.expr(_CENTS_V)).otherwise(0)
        ).alias("y"),
    )
    m = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(
            F.expr("CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))")
        ).alias("sxy"),
        F.sum(
            F.expr("CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))")
        ).alias("sxx"),
        F.sum(
            F.expr("CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))")
        ).alias("syy"),
    )
    st = m.select(
        "n",
        (F.col("sy") * 1.0 / F.col("n")).alias("mean_y"),
        (
            (F.col("sxy") - F.col("sx") * 1.0 / F.col("n") * F.col("sy"))
            / (F.col("n") - 1)
        ).alias("cov_xy"),
        (
            (F.col("sxx") - F.col("sx") * 1.0 / F.col("n") * F.col("sx"))
            / (F.col("n") - 1)
        ).alias("var_x"),
        (
            (F.col("syy") - F.col("sy") * 1.0 / F.col("n") * F.col("sy"))
            / (F.col("n") - 1)
        ).alias("var_y"),
    )
    return st.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.round(F.col("mean_y") / 100.0, 2).alias("mean_post_value"),
        F.round(F.col("cov_xy") / F.col("var_x"), 6).alias("theta"),
        F.round(
            F.col("cov_xy") * F.col("cov_xy") / (F.col("var_x") * F.col("var_y")),
            6,
        ).alias("variance_reduction"),
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution (first / last / exactly-conserved linear)
# ---------------------------------------------------------------------------

_ATTR_UNITS = 1_000_000  # micro-credits distributed per conversion


@query(
    "multitouch_attribution",
    oracle=f"""
    WITH purch AS (
      SELECT user_id, ts AS pts, event_id AS pid
      FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts AS cts, event_id AS cid,
             CAST(json_extract(props, '$.k') AS BIGINT) % 4 AS channel
      FROM events WHERE event_type = 'click'
    ), touch AS (
      SELECT p.pid, c.channel, c.cts, c.cid,
             count(*) OVER (PARTITION BY p.pid) AS n,
             row_number() OVER (PARTITION BY p.pid
                                ORDER BY c.cts, c.cid) AS rk,
             row_number() OVER (PARTITION BY p.pid
                                ORDER BY c.cts DESC, c.cid DESC) AS rk_last
      FROM purch p JOIN clicks c
        ON p.user_id = c.user_id
       AND c.cts >= p.pts - INTERVAL 72 HOUR AND c.cts < p.pts
    )
    SELECT channel,
           CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS first_touch,
           CAST(sum(CASE WHEN rk_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS last_touch,
           round(sum({_ATTR_UNITS} // n
                     + CASE WHEN rk <= {_ATTR_UNITS} % n THEN 1 ELSE 0 END)
                 / {_ATTR_UNITS}.0, 6) AS linear_credit,
           count(*) AS n_touches
    FROM touch GROUP BY 1 ORDER BY channel
    """,
)
def multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution over the click→purchase journey
    (clicks within the trailing 72 hours of each purchase): first-touch and
    last-touch credits as exact counts, plus the LINEAR model with exactly
    conserved credit — each conversion distributes {_ATTR_UNITS}
    micro-credits across its n touches by largest remainder (floor + the
    earliest `rem` touches get one extra), so channel credits sum to
    exactly the number of attributed conversions; a naive Σ 1/n float sum
    would drift with aggregation order.

    Scale: the touch join is user-blocked with a time-range predicate
    (bucket by epoch as in range_join_events for heavy users); the three
    windows share the per-purchase partitioning; channel rollup is
    map-side combined. Swapping in U-shaped/time-decay models only changes
    the credit expression.
    """
    e = load(spark, sf_dir, "events")
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
        F.col("event_id").alias("cid"),
        (F.get_json_object("props", "$.k").cast("bigint") % 4).alias("channel"),
    )
    touch = purch.join(
        clicks,
        (F.col("user_id") == F.col("cu"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 72 HOUR"))
        & (F.col("cts") < F.col("pts")),
    )
    wp = Window.partitionBy("pid")
    scored = touch.select(
        "channel",
        F.count(F.lit(1)).over(wp).alias("n"),
        F.row_number().over(wp.orderBy("cts", "cid")).alias("rk"),
        F.row_number()
        .over(wp.orderBy(F.desc("cts"), F.desc("cid")))
        .alias("rk_last"),
    )
    micro = F.expr(f"{_ATTR_UNITS} div n") + (
        F.col("rk") <= F.expr(f"{_ATTR_UNITS} % n")
    ).cast("bigint")
    return (
        scored.groupBy("channel")
        .agg(
            F.sum((F.col("rk") == 1).cast("bigint")).alias("first_touch"),
            F.sum((F.col("rk_last") == 1).cast("bigint")).alias("last_touch"),
            F.round(F.sum(micro) / float(_ATTR_UNITS), 6).alias(
                "linear_credit"
            ),
            F.count(F.lit(1)).alias("n_touches"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Business-day SLA report (weekend-aware delays)
# ---------------------------------------------------------------------------

_SLA_BDAYS = 600  # synthetic ship delays center near 600 business days


@query(
    "business_days_sla",
    oracle=f"""
    WITH d AS (
      SELECT o.o_orderpriority AS mode,
             CAST(o.o_orderdate AS DATE) AS a,
             CAST(l.l_shipdate AS DATE) AS b
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    ), bd AS (
      SELECT mode,
             5 * (date_diff('day', a, b) // 7)
             + len(list_filter(generate_series(1, 6),
                   i -> i <= date_diff('day', a, b) % 7
                        AND extract(isodow FROM a + to_days(CAST(i AS INTEGER)))
                            <= 5)) AS bdays
      FROM d
    )
    SELECT mode, count(*) AS n_shipments,
           round(avg(bdays), 4) AS avg_business_days,
           CAST(sum(CASE WHEN bdays > {_SLA_BDAYS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_breaches,
           round(sum(CASE WHEN bdays > {_SLA_BDAYS} THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS breach_rate
    FROM bd GROUP BY 1 ORDER BY mode
    """,
)
def business_days_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend-aware SLA reporting: order→ship delay in BUSINESS days
    (weekdays in the half-open interval (order, ship]) via the closed
    form 5·⌊n/7⌋ plus a ≤6-step weekday scan of the remainder window —
    calendar arithmetic every ops dashboard needs, with no calendar table
    join. Per ship mode: mean business-day delay, {_SLA_BDAYS}-day breach
    count and rate — all exact integers until the two final divisions.

    Scale: the business-day expression is per-row JVM codegen (the
    remainder scan is a bounded 6-element higher-order function, not a
    per-day explode); the rollup is one map-side-combined aggregation.
    Holiday calendars would add one broadcast array membership test.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    d = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.col("o_orderpriority").alias("mode"),
            F.col("o_orderdate").cast("date").alias("a"),
            F.col("l_shipdate").cast("date").alias("b"),
        )
    )
    # weekday(a + i) uses Spark weekday (0=Mon..6=Sun) ⇒ weekday <= 4
    bdays = F.expr(
        """
        5 * (datediff(b, a) div 7)
        + size(filter(sequence(1, 6),
                      i -> i <= datediff(b, a) % 7
                           AND weekday(date_add(a, i)) <= 4))
        """
    )
    bd = d.select("mode", bdays.alias("bdays"))
    return (
        bd.groupBy("mode")
        .agg(
            F.count(F.lit(1)).alias("n_shipments"),
            F.round(F.avg("bdays"), 4).alias("avg_business_days"),
            F.sum((F.col("bdays") > _SLA_BDAYS).cast("bigint")).alias(
                "n_breaches"
            ),
            F.round(
                F.sum((F.col("bdays") > _SLA_BDAYS).cast("bigint"))
                * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("breach_rate"),
        )
        .orderBy("mode")
    )


# ---------------------------------------------------------------------------
# Self-join size (F2) estimation from a count-min sketch
# ---------------------------------------------------------------------------

@query(
    "selfjoin_size_estimate",
    oracle=f"""
    WITH seeds(row_i, a, b) AS (VALUES
      (0, 1000003, 17), (1, 1000033, 29), (2, 1000037, 41), (3, 1000039, 59)
    ), keys AS (
      SELECT 'l_partkey' AS key_col, l_partkey AS k, count(*) AS c
      FROM lineitem GROUP BY 1, 2
      UNION ALL
      SELECT 'l_suppkey', l_suppkey, count(*) FROM lineitem GROUP BY 1, 2
    ), cells AS (
      SELECT key_col, row_i,
             ((a * (k % 1000000007) + b) % 1000000007) % 256 AS col,
             CAST(sum(c) AS BIGINT) AS cell_n
      FROM keys CROSS JOIN seeds GROUP BY 1, 2, 3
    ), f2est AS (
      SELECT key_col, row_i,
             CAST(sum(cell_n * cell_n) AS BIGINT) AS row_f2
      FROM cells GROUP BY 1, 2
    ), exact AS (
      SELECT key_col, CAST(sum(c * c) AS BIGINT) AS f2_exact,
             CAST(count(*) AS BIGINT) AS n_keys
      FROM keys GROUP BY 1
    )
    SELECT e.key_col, e.n_keys, e.f2_exact,
           CAST(min(f.row_f2) AS BIGINT) AS f2_cms,
           round(min(f.row_f2) * 1.0 / e.f2_exact, 6) AS overestimate_ratio
    FROM exact e JOIN f2est f ON e.key_col = f.key_col
    GROUP BY 1, 2, 3 ORDER BY e.key_col
    """,
)
def selfjoin_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation the optimizer-statistics way: the
    self-join size on a key (Σ c(k)² — the second frequency moment F2,
    what `lineitem ⋈ lineitem ON partkey` would produce) estimated from a
    4×256 count-min sketch as min over rows of Σ cell² — fixed memory,
    one pass, mergeable — against the exact F2, with the guaranteed
    overestimate ratio (CMS collisions only inflate Σ cell²). This is the
    statistic a planner consults before choosing a join strategy at
    100 TB, where exact key histograms don't fit.

    Sketch cells are exact integer counters built with the portable
    affine hashes, so DuckDB rebuilds the identical sketch and the
    estimate itself is value-checked — same discipline as
    `cms_heavy_hitters`/`theta_sketch_setops`.

    Scale: per-key counts aggregate with map-side combine; the sketch is
    4×256 counters regardless of key cardinality; F2 of the sketch is a
    1024-row aggregation.
    """
    li = load(spark, sf_dir, "lineitem")
    keys = (
        li.groupBy(F.lit("l_partkey").alias("key_col"), F.col("l_partkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
        .unionAll(
            li.groupBy(
                F.lit("l_suppkey").alias("key_col"), F.col("l_suppkey").alias("k")
            ).agg(F.count(F.lit(1)).alias("c"))
        )
    )
    seeds = spark.createDataFrame(
        [(0, 1000003, 17), (1, 1000033, 29), (2, 1000037, 41), (3, 1000039, 59)],
        "row_i int, a long, b long",
    )
    cells = (
        keys.crossJoin(F.broadcast(seeds))
        .groupBy(
            "key_col",
            "row_i",
            F.expr("((a * (k % 1000000007) + b) % 1000000007) % 256").alias("col"),
        )
        .agg(F.sum("c").alias("cell_n"))
    )
    f2est = cells.groupBy("key_col", "row_i").agg(
        F.sum(F.col("cell_n") * F.col("cell_n")).alias("row_f2")
    )
    exact = keys.groupBy("key_col").agg(
        F.sum(F.col("c") * F.col("c")).alias("f2_exact"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    return (
        exact.join(f2est, "key_col")
        .groupBy("key_col", "n_keys", "f2_exact")
        .agg(
            F.min("row_f2").alias("f2_cms"),
            F.round(F.min("row_f2") * 1.0 / F.col("f2_exact"), 6).alias(
                "overestimate_ratio"
            ),
        )
        .orderBy("key_col")
    )


# ---------------------------------------------------------------------------
# Grouped weighted quantiles (p25/p50/p75)
# ---------------------------------------------------------------------------

@query(
    "weighted_quantiles_price",
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
    SELECT rf,
           round(min(CASE WHEN 4 * cw >= tw THEN c END) / 100.0, 2) AS p25,
           round(min(CASE WHEN 2 * cw >= tw THEN c END) / 100.0, 2) AS p50,
           round(min(CASE WHEN 4 * cw >= 3 * tw THEN c END) / 100.0, 2)
             AS p75,
           CAST(any_value(tw) AS BIGINT) AS total_qty
    FROM cum GROUP BY rf ORDER BY rf
    """,
)
def weighted_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted p25/p50/p75 line prices per return flag — the
    full quartile profile of 'what a typical unit costs', extending
    `weighted_median_price`: all three quantiles fall out of the SAME
    cumulative-weight window (the threshold test 4·cw ≥ q·tw is exact
    int64, no float division), so the marginal cost of more quantiles is
    zero extra passes.

    Scale: the quantile thresholds only ever test the cumulative weight
    at the END of each distinct price's run (a price qualifies iff its
    last row's cw crosses the bound), so the rows are collapsed to
    (rf, price) → Σw with a map-side-combinable groupBy BEFORE the
    cumulative window: the per-group sort shrinks from row count to
    distinct-price count, and the 3-value partition key stops being a
    3-way-parallel sort of the whole fact table (measured 14.5× wall at
    10× data before the collapse, vs ~n·log n growth in distinct prices
    after). At extreme distinct-value width, bracket with approx
    quantiles then one exact pass per narrow range (see two_pass_median
    for the machinery).
    """
    li = (
        load(spark, sf_dir, "lineitem")
        .select(
            F.col("l_returnflag").alias("rf"),
            F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("c"),
            F.round("l_quantity").cast("bigint").alias("w"),
        )
        .groupBy("rf", "c")
        .agg(F.sum("w").alias("w"))
    )
    wrf = Window.partitionBy("rf")
    cum = li.select(
        "rf",
        "c",
        F.sum("w").over(wrf.orderBy("c")).alias("cw"),
        F.sum("w").over(wrf).alias("tw"),
    )
    def q_at(num, den):
        return F.round(
            F.min(F.when(den * F.col("cw") >= num * F.col("tw"), F.col("c")))
            / 100.0,
            2,
        )
    return (
        cum.groupBy("rf")
        .agg(
            q_at(1, 4).alias("p25"),
            q_at(1, 2).alias("p50"),
            q_at(3, 4).alias("p75"),
            F.any_value("tw").alias("total_qty"),
        )
        .orderBy("rf")
    )
