"""Second advanced round: higher-order graph motifs, a deterministic
t-digest-style mergeable quantile sketch, an interval sweep-line
(max-concurrency) operator, gaps-and-islands streak detection, and a
bit-exact exponentially-weighted moving average.

These extend the saturated SURVEY §2 inventory with the stretch items the
build plan named (4-node motif chains, t-digest quantile merge) plus three
classic warehouse/time-series patterns every OLAP engine is asked for. All
five carry full value oracles — including the sketch and the EWMA, which
are normally float-order-dependent: the sketch uses a deterministic
rank-strided compression rule both engines can replay, and the EWMA picks
alpha = 1/2 so every weight is a power of two and the accumulation is
EXACT integer arithmetic until one final division.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load


# ---------------------------------------------------------------------------
# 4-node motif chains with a negated-edge (chordless) test
# ---------------------------------------------------------------------------

def _heavy_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-weight edges of the buyer-nation -> supplier-nation
    trade graph (exact integer cents x pct weights; same construction as
    ``motif_trade_triangles``)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    w_int = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    e = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.sum(w_int).alias("w"))
    )
    tot = e.agg(F.count(F.lit(1)).alias("n_edges"), F.sum("w").alias("total"))
    return (
        e.crossJoin(F.broadcast(tot))
        .where(F.col("w") * F.col("n_edges") > F.col("total"))
        .select("src", "dst", "w")
    )


@query(
    "motif_trade_quads",
    oracle="""
    WITH e AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS w
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2
    ), tot AS (SELECT count(*) AS n_edges, sum(w) AS total FROM e),
    he AS (SELECT e.src, e.dst, e.w FROM e, tot
           WHERE e.w * tot.n_edges > tot.total),
    quad AS (
      SELECT e1.src AS a, e2.src AS b, e3.src AS c, e4.src AS d,
             e1.w + e2.w + e3.w + e4.w AS wsum
      FROM he e1 JOIN he e2 ON e1.dst = e2.src
      JOIN he e3 ON e2.dst = e3.src
      JOIN he e4 ON e3.dst = e4.src AND e4.dst = e1.src
      WHERE e1.src < e2.src AND e1.src < e3.src AND e1.src < e4.src
        AND e2.src <> e4.src
    )
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
           CAST((wsum + 50) // 100 AS DOUBLE) / 100 AS cycle_value,
           (NOT EXISTS (SELECT 1 FROM he x
                        WHERE x.src = quad.a AND x.dst = quad.c)
            AND NOT EXISTS (SELECT 1 FROM he x
                            WHERE x.src = quad.b AND x.dst = quad.d))
             AS chordless
    FROM quad ORDER BY a, b, c, d
    """,
)
def motif_trade_quads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphFrames-style 4-node motif ``(a)-[]->(b); (b)-[]->(c);
    (c)-[]->(d); (d)-[]->(a)`` over the heavy-edge nation trade graph,
    with the negated-edge test GraphFrames writes as ``!(a)-[]->(c)``:
    each directed 4-cycle is flagged ``chordless`` when neither diagonal
    a->c nor b->d is itself a heavy edge. Canonical rotation puts the
    smallest node first; node distinctness comes from the strict
    inequalities plus b != d (edge endpoints already differ).

    Scale: like the triangle motif, the only large shuffle is the star
    join collapsing the fact table to a |nations|^2 edge list; the 4-way
    cycle enumeration and the two diagonal anti-join probes all run on
    broadcast copies of the ~hundreds-row heavy-edge table, so motif
    arity grows the number of broadcast joins, never the shuffled bytes.
    """
    he = _heavy_trade_edges(spark, sf_dir)
    e1 = he.alias("e1")
    e2, e3, e4 = (F.broadcast(he.alias(n)) for n in ("e2", "e3", "e4"))
    quad = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(e3, F.col("e2.dst") == F.col("e3.src"))
        .join(
            e4,
            (F.col("e3.dst") == F.col("e4.src"))
            & (F.col("e4.dst") == F.col("e1.src")),
        )
        .where(
            (F.col("e1.src") < F.col("e2.src"))
            & (F.col("e1.src") < F.col("e3.src"))
            & (F.col("e1.src") < F.col("e4.src"))
            & (F.col("e2.src") != F.col("e4.src"))
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e2.src").alias("b"),
            F.col("e3.src").alias("c"),
            F.col("e4.src").alias("d"),
            (F.col("e1.w") + F.col("e2.w") + F.col("e3.w") + F.col("e4.w")).alias(
                "wsum"
            ),
        )
    )
    ac = F.broadcast(he.select(F.col("src").alias("xa"), F.col("dst").alias("xc")))
    bd = F.broadcast(he.select(F.col("src").alias("xb"), F.col("dst").alias("xd")))
    return (
        quad.join(ac, (F.col("a") == F.col("xa")) & (F.col("c") == F.col("xc")), "left")
        .join(bd, (F.col("b") == F.col("xb")) & (F.col("d") == F.col("xd")), "left")
        .select(
            F.col("a").cast("bigint").alias("a"),
            F.col("b").cast("bigint").alias("b"),
            F.col("c").cast("bigint").alias("c"),
            F.col("d").cast("bigint").alias("d"),
            # exact int64 HALF_UP — see motif_trade_triangles (advanced.py):
            # round(s/10000, 2) == ((s+50) div 100) / 100 with no double
            # x.xx5 boundary for either engine to disagree on.
            (F.expr("(wsum + 50) div 100").cast("double") / 100).alias(
                "cycle_value"
            ),
            (F.col("xa").isNull() & F.col("xb").isNull()).alias("chordless"),
        )
        .orderBy("a", "b", "c", "d")
    )


# ---------------------------------------------------------------------------
# Deterministic t-digest-style mergeable quantile sketch
# ---------------------------------------------------------------------------

_TD_K = 64  # max centroids per sketch
_TD_QS = [0.25, 0.5, 0.75, 0.9, 0.99]


@query(
    "tdigest_quantile_merge",
    oracle=f"""
    WITH v AS (
      SELECT o_orderpriority AS p,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey AS k
      FROM orders
    ), r1 AS (
      SELECT p, cents,
             row_number() OVER (PARTITION BY p ORDER BY cents, k) AS rn,
             count(*) OVER (PARTITION BY p) AS ns
      FROM v
    ), c1 AS (
      SELECT p, (rn - 1) // ((ns + {_TD_K - 1}) // {_TD_K}) AS b1,
             CAST(sum(cents) AS BIGINT) AS s, count(*) AS cnt
      FROM r1 GROUP BY 1, 2
    ), r2 AS (
      SELECT s, cnt,
             row_number() OVER (ORDER BY s * 1.0 / cnt, s, cnt, p) AS rn2,
             count(*) OVER () AS nc
      FROM c1
    ), c2 AS (
      SELECT (rn2 - 1) // ((nc + {_TD_K - 1}) // {_TD_K}) AS b2,
             CAST(sum(s) AS BIGINT) AS s2, CAST(sum(cnt) AS BIGINT) AS w
      FROM r2 GROUP BY 1
    ), cum AS (
      SELECT b2, s2, w, CAST(sum(w) OVER (ORDER BY b2) AS BIGINT) AS cw,
             CAST(sum(w) OVER () AS BIGINT) AS n,
             count(*) OVER () AS n_centroids
      FROM c2
    ), qs AS (SELECT unnest([{", ".join(str(q) for q in _TD_QS)}]) AS q),
    hit AS (
      SELECT qs.q, cum.s2, cum.w, cum.n, cum.n_centroids, cum.b2
      FROM qs JOIN cum ON cum.cw >= CAST(ceil(qs.q * cum.n) AS BIGINT)
      QUALIFY row_number() OVER (PARTITION BY qs.q ORDER BY cum.b2) = 1
    ), ranked AS (
      SELECT cents, row_number() OVER (ORDER BY cents, k) AS rn3 FROM v
    )
    SELECT hit.q, round(hit.s2 * 1.0 / hit.w / 100.0, 6) AS est,
           round(ranked.cents / 100.0, 6) AS exact,
           round(abs(hit.s2 * 1.0 / hit.w / 100.0 - ranked.cents / 100.0), 6)
             AS abs_err,
           hit.n_centroids
    FROM hit JOIN ranked ON ranked.rn3 = CAST(ceil(hit.q * hit.n) AS BIGINT)
    ORDER BY q
    """,
)
def tdigest_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest-style mergeable quantile sketch over order totals: each
    order-priority segment compresses its values into <= 64 weighted
    centroids (sum, count — exact integer cents), the per-segment sketches
    MERGE by sorting all centroids by mean and re-compressing to <= 64, and
    quantile queries interpolate the merged cumulative weights. Estimates
    are reported next to the exact order statistics with realized error.

    Unlike a textbook t-digest (whose centroids depend on input order),
    the compression rule here is rank-strided — bucket = rank div
    ceil(n/k) under a total order with explicit tiebreaks — so the sketch
    is DETERMINISTIC and the SQL oracle rebuilds it bit-for-bit: a
    quantile sketch with a full value oracle, not a rows-only check.

    Scale: stage 1 is a per-segment distributed sort (the same single
    shuffle any exact percentile needs); from there on everything is
    sketch algebra — merging S segments costs O(S*k log(S*k)) on k-row
    sketches regardless of raw data size, which is the t-digest property
    that matters at 100 TB: per-partition/per-day sketches roll up to
    global quantiles without ever re-touching the data. The exact-answer
    column is the demo's verification path only — and it too avoids a
    global sort: a 1024-bucket histogram brackets each target rank
    (two_pass_median's algorithm), so the only row_number runs inside the
    few bracketed buckets (expected n/1024 rows each), partitioned per
    bucket, never over the raw fact table.
    """
    v = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("p"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.col("o_orderkey").alias("k"),
    )
    wp = Window.partitionBy("p")
    r1 = v.select(
        "p",
        "cents",
        F.row_number().over(wp.orderBy("cents", "k")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("ns"),
    )
    c1 = (
        r1.withColumn("b1", F.expr(f"(rn - 1) div ((ns + {_TD_K - 1}) div {_TD_K})"))
        .groupBy("p", "b1")
        .agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("cnt"))
    )
    r2 = c1.select(
        "s",
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.col("s") / F.col("cnt"), "s", "cnt", "p"))
        .alias("rn2"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nc"),
    )
    c2 = (
        r2.withColumn("b2", F.expr(f"(rn2 - 1) div ((nc + {_TD_K - 1}) div {_TD_K})"))
        .groupBy("b2")
        .agg(F.sum("s").alias("s2"), F.sum("cnt").alias("w"))
    )
    wall = Window.partitionBy()
    cum = c2.select(
        "b2",
        "s2",
        "w",
        F.sum("w").over(Window.orderBy("b2")).alias("cw"),
        F.sum("w").over(wall).alias("n"),
        F.count(F.lit(1)).over(wall).alias("n_centroids"),
    )
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in _TD_QS])).alias("q")
    )
    hit = (
        F.broadcast(qs)
        .join(cum, F.col("cw") >= F.ceil(F.col("q") * F.col("n")))
        .withColumn(
            "hrn", F.row_number().over(Window.partitionBy("q").orderBy("b2"))
        )
        .where(F.col("hrn") == 1)
    )
    # Exact comparison values via histogram bracketing (two_pass_median's
    # shape): 1024-bucket counts locate each target rank's bucket, and
    # row_number runs only inside the bracketed buckets, partitioned by
    # bucket — the raw table is never globally sorted.
    stats = v.agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    lo, hi, n_total = stats.lo, stats.hi, stats.n
    width = max(1, (hi - lo) // 1024 + 1)
    hist = dict(
        (row.b, row.cnt)
        for row in v.groupBy(((F.col("cents") - lo) / width).cast("bigint").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    targets = []  # (q, bucket, rank_within_bucket)
    for q in _TD_QS:
        # IEEE-double ceil(q*n), same arithmetic the SQL oracle runs
        t = max(1, min(n_total, int(math.ceil(q * n_total))))
        acc = 0
        for b in sorted(hist):
            if acc + hist[b] >= t:
                targets.append((float(q), int(b), int(t - acc)))
                break
            acc += hist[b]
    tdf = spark.createDataFrame(targets, "q double, tb bigint, rq bigint")
    needed = sorted({b for _, b, _ in targets})
    in_b = v.withColumn(
        "b", ((F.col("cents") - F.lit(lo)) / F.lit(width)).cast("bigint")
    ).filter(F.col("b").isin(needed))
    bucket_ranked = in_b.select(
        "b",
        "cents",
        F.row_number()
        .over(Window.partitionBy("b").orderBy("cents", "k"))
        .alias("rb"),
    )
    exact_vals = F.broadcast(tdf).join(
        bucket_ranked, (F.col("tb") == F.col("b")) & (F.col("rq") == F.col("rb"))
    ).select(F.col("q").alias("qe"), "cents")
    est = F.col("s2") / F.col("w") / 100.0
    exact = F.col("cents") / 100.0
    return (
        hit.join(F.broadcast(exact_vals), F.col("q") == F.col("qe"))
        .select(
            "q",
            F.round(est, 6).alias("est"),
            F.round(exact, 6).alias("exact"),
            F.round(F.abs(est - exact), 6).alias("abs_err"),
            "n_centroids",
        )
        .orderBy("q")
    )


# ---------------------------------------------------------------------------
# Interval sweep-line: peak concurrent in-flight orders
# ---------------------------------------------------------------------------

@query(
    "interval_inflight_peak",
    oracle="""
    WITH last_ship AS (
      SELECT l_orderkey, max(l_shipdate) AS endts FROM lineitem GROUP BY 1
    ), iv AS (
      SELECT o.o_orderdate AS startts,
             greatest(o.o_orderdate, ls.endts) AS endts
      FROM orders o JOIN last_ship ls ON o.o_orderkey = ls.l_orderkey
    ), deltas AS (
      SELECT date_trunc('day', startts) AS day, 1 AS delta FROM iv
      UNION ALL
      SELECT date_trunc('day', endts) + INTERVAL 1 DAY AS day, -1 AS delta
      FROM iv
    ), daily AS (
      SELECT day, CAST(sum(delta) AS BIGINT) AS net FROM deltas GROUP BY 1
    ), run AS (
      SELECT day, CAST(sum(net) OVER (ORDER BY day) AS BIGINT) AS inflight
      FROM daily
    )
    SELECT CAST(extract(year FROM day) AS BIGINT) AS year,
           max(inflight) AS peak_inflight,
           min(day) FILTER (WHERE inflight = peak) AS peak_day
    FROM (SELECT day, inflight,
                 max(inflight) OVER (PARTITION BY extract(year FROM day)) AS peak
          FROM run)
    GROUP BY 1 ORDER BY 1
    """,
)
def interval_inflight_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval max-concurrency via a sweep line: each order is 'in flight'
    from its order date until its last line-item ships; emit +1/-1 boundary
    deltas, collapse them to per-day nets, run a cumulative sum over days,
    and report each year's peak concurrent in-flight count with the
    earliest day it was hit. The classic room-scheduling/max-overlap
    operator, done without expanding intervals into their covered days.

    Scale: the sweep reduces N intervals to <= 2N boundary events, then
    immediately to |distinct days| rows in one map-side-combined groupBy —
    the running sum's single-partition window touches only ~thousands of
    day rows no matter how many billions of intervals feed it (day
    cardinality grows with time span, not data volume). Interval
    expansion (one row per covered day) would be O(N x avg_duration);
    the sweep is O(N + days).
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    last_ship = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("ship"))
    # clamp: the synthetic data has last shipments BEFORE the order date;
    # an inverted interval would emit its -1 before its +1 and silently
    # undercount the sweep (caught by the direct-coverage kernel test)
    iv = o.join(last_ship, o.o_orderkey == last_ship.l_orderkey).select(
        F.col("o_orderdate").alias("startts"),
        F.greatest("o_orderdate", "ship").alias("endts"),
    )
    deltas = iv.select(
        F.date_trunc("day", "startts").alias("day"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select(
            (F.date_trunc("day", "endts") + F.expr("INTERVAL 1 DAY")).alias("day"),
            F.lit(-1).alias("delta"),
        )
    )
    daily = deltas.groupBy("day").agg(F.sum("delta").alias("net"))
    run = daily.select(
        "day", F.sum("net").over(Window.orderBy("day")).alias("inflight")
    )
    yearly = run.select(
        "day",
        "inflight",
        F.max("inflight")
        .over(Window.partitionBy(F.year("day")))
        .alias("peak"),
    )
    return (
        yearly.groupBy(F.year("day").cast("bigint").alias("year"))
        .agg(
            F.max("inflight").alias("peak_inflight"),
            F.min(F.when(F.col("inflight") == F.col("peak"), F.col("day"))).alias(
                "peak_day"
            ),
        )
        .orderBy("year")
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands: per-user consecutive-day activity streaks
# ---------------------------------------------------------------------------

@query(
    "user_streak_islands",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, CAST(extract(day FROM ts) AS BIGINT) AS day
      FROM events
    ), g AS (
      SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      FROM active
    ), streaks AS (
      SELECT user_id, grp, count(*) AS len, min(day) AS start_day
      FROM g GROUP BY 1, 2
    )
    SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
           count(*) AS n_streaks, max(len) AS longest_streak,
           min(start_day) FILTER (WHERE len = ml) AS longest_start_day
    FROM (SELECT *, max(len) OVER (PARTITION BY user_id) AS ml FROM streaks)
    GROUP BY 1 ORDER BY 1
    """,
)
def user_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over user activity: collapse events to distinct
    active days (all of January 2024, so day-of-month is the integer time
    axis), tag each island of consecutive days with the classic
    ``day - row_number()`` group key, and report per user the active-day
    total, streak count, longest streak, and the earliest day the longest
    streak started.

    Scale: two exchanges, both right-sized — the distinct runs map-side
    partial aggregation on (user, day) so the first shuffle moves only
    day-level rows, then one regroup on user_id serves the island window
    and both aggregations (shuffling raw events straight to user_id would
    move strictly more bytes). Integer day arithmetic everywhere;
    deterministic earliest-start tiebreak.
    """
    active = (
        load(spark, sf_dir, "events")
        .select("user_id", F.dayofmonth("ts").cast("bigint").alias("day"))
        .distinct()
    )
    g = active.select(
        "user_id",
        "day",
        (
            F.col("day")
            - F.row_number().over(Window.partitionBy("user_id").orderBy("day"))
        ).alias("grp"),
    )
    streaks = g.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"), F.min("day").alias("start_day")
    )
    ranked = streaks.select(
        "user_id",
        "len",
        "start_day",
        F.max("len").over(Window.partitionBy("user_id")).alias("ml"),
    )
    return (
        ranked.groupBy("user_id")
        .agg(
            F.sum("len").alias("n_active_days"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("len").alias("longest_streak"),
            F.min(F.when(F.col("len") == F.col("ml"), F.col("start_day"))).alias(
                "longest_start_day"
            ),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Bit-exact EWMA (alpha = 1/2) with spike flags
# ---------------------------------------------------------------------------

@query(
    "ewma_user_activity",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(extract(day FROM ts) AS BIGINT) AS day,
             count(*) AS x
      FROM events GROUP BY 1, 2
    ), seq AS (
      SELECT user_id, day, x,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS t,
             first_value(x) OVER (PARTITION BY user_id ORDER BY day) AS x1
      FROM daily
    ), acc AS (
      SELECT user_id, day, x, t, x1,
             CAST(sum(x * (CAST(1 AS BIGINT) << (t - 1)))
                  OVER (PARTITION BY user_id ORDER BY t) AS BIGINT) AS s
      FROM seq
    ), y AS (
      SELECT user_id, day, x,
             (x1 + s) / power(2.0, t) AS ewma,
             lag((x1 + s) / power(2.0, t))
               OVER (PARTITION BY user_id ORDER BY t) AS prev_ewma
      FROM acc
    )
    SELECT user_id, day, x, round(ewma, 6) AS ewma,
           round(coalesce(x - prev_ewma, 0.0), 6) AS dev,
           coalesce(abs(x - prev_ewma) >= 3.0, FALSE) AS is_spike
    FROM y ORDER BY user_id, day
    """,
)
def ewma_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's daily event
    count (recursive form y_t = a*x_t + (1-a)*y_{t-1}, a = 1/2) plus a
    spike flag when a day's count departs >= 3 from the prior smoothed
    level. EWMA is the textbook 'SQL can't do recursion' operator; the
    closed form 2^t * y_t = x_1 + sum_j x_j * 2^(j-1) turns it into a
    plain cumulative sum.

    Choosing alpha = 1/2 makes every weight a power of two, so the
    accumulation is EXACT int64 arithmetic (counts <= ~100, t <= 31 →
    no overflow) and the single final division by 2^t is lossless in
    IEEE doubles — the EWMA matches the oracle bit-for-bit, no float
    order-of-summation hazard. For general alpha the same shape works
    with per-partition rescaling to bound the weight ratio.

    Scale: the daily rollup partially aggregates map-side so the first
    shuffle moves day-level rows, then a single user_id regroup covers
    every window; time series of any length stream through
    partition-local sorts. The integer closed form needs t bounded (weight
    ratio 2^t) — production would chunk long series and carry the chunk
    boundary, still one pass.
    """
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", F.dayofmonth("ts").cast("bigint").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    wu = Window.partitionBy("user_id").orderBy("day")
    seq = daily.select(
        "user_id",
        "day",
        "x",
        F.row_number().over(wu).alias("t"),
        F.first("x").over(wu).alias("x1"),
    )
    acc = seq.withColumn(
        "s",
        F.sum(F.expr("x * shiftleft(CAST(1 AS BIGINT), CAST(t - 1 AS INT))")).over(
            Window.partitionBy("user_id").orderBy("t")
        ),
    )
    ewma = (F.col("x1") + F.col("s")) / F.pow(F.lit(2.0), F.col("t"))
    y = acc.select(
        "user_id",
        "day",
        "x",
        ewma.alias("ewma_raw"),
        F.lag(ewma).over(Window.partitionBy("user_id").orderBy("t")).alias(
            "prev_ewma"
        ),
    )
    return y.select(
        "user_id",
        "day",
        "x",
        F.round("ewma_raw", 6).alias("ewma"),
        F.round(F.coalesce(F.col("x") - F.col("prev_ewma"), F.lit(0.0)), 6).alias(
            "dev"
        ),
        F.coalesce(
            F.abs(F.col("x") - F.col("prev_ewma")) >= 3.0, F.lit(False)
        ).alias("is_spike"),
    ).orderBy("user_id", "day")


# ---------------------------------------------------------------------------
# Bloom-filter semi-join reduction (runtime-filter pattern, value-checked)
# ---------------------------------------------------------------------------

_BLOOM_M = 4096  # bits
_BLOOM_SEEDS = [1, 2, 3]
_BLOOM_NATION = 7


def _bloom_pos_sql(key_expr: str, seed_expr: str) -> str:
    """DuckDB expression: first 8 hex digits of md5(key:seed) as an int,
    reduced mod _BLOOM_M (identical to the Spark side's
    conv(substr(md5, 1, 8), 16, 10) — one hash call per probe instead of a
    32-step character fold, which dominated the fact-side scan cost)."""
    return f"""list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(generate_series(1, 8),
        i -> CAST(strpos('0123456789abcdef',
                         substr(md5(CAST({key_expr} AS VARCHAR) || ':' ||
                                    CAST({seed_expr} AS VARCHAR)),
                                CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
      (acc, c) -> acc * 16 + c) % {_BLOOM_M}"""


@query(
    "bloom_semijoin_reduction",
    oracle=f"""
    WITH keys AS (
      SELECT DISTINCT o.o_orderkey AS k
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_nationkey = {_BLOOM_NATION}
    ), pos AS (
      SELECT DISTINCT {_bloom_pos_sql("k", "seed")} AS p
      FROM keys, (SELECT unnest([{", ".join(map(str, _BLOOM_SEEDS))}]) AS seed)
    ), bloom AS (
      SELECT list(p ORDER BY p) AS bits, count(*) AS bits_set FROM pos
    ), flags AS (
      SELECT ({" AND ".join(
          f"list_contains(bloom.bits, {_bloom_pos_sql('l.l_orderkey', s)})"
          for s in _BLOOM_SEEDS)}) AS cand,
             (k.k IS NOT NULL) AS ex
      FROM lineitem l CROSS JOIN bloom
      LEFT JOIN keys k ON l.l_orderkey = k.k
    )
    SELECT (SELECT count(*) FROM keys) AS n_keys,
           (SELECT bits_set FROM bloom) AS bits_set,
           count(*) AS fact_rows,
           CAST(count(*) FILTER (WHERE cand) AS BIGINT) AS candidate_rows,
           CAST(count(*) FILTER (WHERE ex) AS BIGINT) AS exact_rows,
           CAST(count(*) FILTER (WHERE cand AND NOT ex) AS BIGINT)
             AS false_positives,
           round(count(*) FILTER (WHERE cand AND NOT ex) * 1.0
                 / count(*) FILTER (WHERE NOT ex), 6) AS fp_rate
    FROM flags
    """,
)
def bloom_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter pattern: build a {_BLOOM_M}-bit bloom filter over the
    order keys of one nation's customers (the small semi-join side), apply
    it to the lineitem scan as a cheap pre-filter, and report the reduction
    it buys — candidate rows vs the exact semi-join, false positives, and
    realized false-positive rate. The bloom uses the portable md5-prefix
    hash, so the oracle rebuilds the IDENTICAL filter and the fp counts
    match exactly — the sketch itself is value-checked, not just the final
    join result.

    Scale: this is what Spark's own runtime row-group filtering / bloom
    join pushdown does under AQE — built here explicitly: the filter is a
    one-row broadcast (a sorted position array), the fact side evaluates
    j=3 JVM-side hashes per row with NO shuffle, and only surviving
    candidates reach the exact (broadcast) semi-join. At 100 TB the bloom
    drops ~(1-fp) of non-matching fact rows before any join exchange; bits
    scale as ~1.44*log2(1/fp)*n_keys independent of fact size.
    """
    c = load(spark, sf_dir, "customer").where(
        F.col("c_nationkey") == _BLOOM_NATION
    )
    o = load(spark, sf_dir, "orders")
    keys = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )

    def pos(key, seed):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", key.cast("string"), seed.cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % _BLOOM_M
        )

    positions = (
        keys.select(
            F.explode(F.array(*[F.lit(s) for s in _BLOOM_SEEDS])).alias("seed"),
            "k",
        )
        .select(pos(F.col("k"), F.col("seed")).alias("p"))
        .distinct()
    )
    # materialize the filter as a REAL bitmap: M/64 words bit_or-folded
    # and fetched to the driver (<= 64 rows, size fixed by _BLOOM_M, not
    # by data), embedded as an array literal — the probe is then an O(1)
    # word-index + bit-test per seed instead of an O(bits_set)
    # array_contains scan per fact row (measured 14 s -> ~2 s at sf0.1)
    word_rows = (
        positions.groupBy(F.expr("p div 64").alias("w"))
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT)))").alias("m"))
        .collect()
    )
    words = [0] * (_BLOOM_M // 64)
    bits_set = 0
    for r in word_rows:
        words[int(r["w"])] = int(r["m"])
        bits_set += bin(int(r["m"]) & ((1 << 64) - 1)).count("1")
    words_lit = F.array(*[F.lit(w) for w in words])
    li = load(spark, sf_dir, "lineitem").withColumn(
        "_bloom_words", words_lit
    )
    for s in _BLOOM_SEEDS:
        li = li.withColumn(f"_p{s}", pos(F.col("l_orderkey"), F.lit(s)))
    cand = None
    for s in _BLOOM_SEEDS:
        hit = F.expr(
            f"(element_at(_bloom_words, CAST(_p{s} div 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(_p{s} % 64 AS INT)))"
            " != 0"
        )
        cand = hit if cand is None else (cand & hit)
    flags = (
        li.join(F.broadcast(keys), li.l_orderkey == keys.k, "left")
        .select(
            cand.alias("cand"),
            F.col("k").isNotNull().alias("ex"),
            F.lit(bits_set).cast("bigint").alias("bits_set"),
        )
    )
    n_keys = keys.agg(F.count(F.lit(1)).alias("n_keys"))
    agg = flags.groupBy("bits_set").agg(
        F.count(F.lit(1)).alias("fact_rows"),
        F.sum(F.when(F.col("cand"), 1).otherwise(0)).alias("candidate_rows"),
        F.sum(F.when(F.col("ex"), 1).otherwise(0)).alias("exact_rows"),
        F.sum(F.when(F.col("cand") & ~F.col("ex"), 1).otherwise(0)).alias(
            "false_positives"
        ),
    )
    return agg.crossJoin(F.broadcast(n_keys)).select(
        "n_keys",
        "bits_set",
        "fact_rows",
        "candidate_rows",
        "exact_rows",
        "false_positives",
        F.round(
            F.col("false_positives")
            * 1.0
            / (F.col("fact_rows") - F.col("exact_rows")),
            6,
        ).alias("fp_rate"),
    )


# ---------------------------------------------------------------------------
# Rolling 7-day distinct users per event type (day-grain set algebra)
# ---------------------------------------------------------------------------

@query(
    "rolling_distinct_users",
    oracle="""
    WITH ad AS (
      SELECT DISTINCT event_type, CAST(extract(day FROM ts) AS BIGINT) AS day,
             user_id
      FROM events
    ), days AS (SELECT DISTINCT event_type, day FROM ad),
    w AS (
      SELECT d.event_type, d.day, count(DISTINCT a.user_id) AS users_7d
      FROM days d JOIN ad a ON a.event_type = d.event_type
                           AND a.day BETWEEN d.day - 6 AND d.day
      GROUP BY 1, 2
    ), today AS (
      SELECT event_type, day, count(*) AS users_today FROM ad GROUP BY 1, 2
    ), prev AS (
      SELECT d.event_type, d.day, count(DISTINCT a.user_id) AS users_prev6
      FROM days d LEFT JOIN ad a ON a.event_type = d.event_type
                                AND a.day BETWEEN d.day - 6 AND d.day - 1
      GROUP BY 1, 2
    )
    SELECT w.event_type, w.day, w.users_7d, t.users_today,
           w.users_7d - p.users_prev6 AS new_users
    FROM w JOIN today t USING (event_type, day)
    JOIN prev p USING (event_type, day)
    ORDER BY 1, 2
    """,
)
def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per event type, plus how many
    of today's users are NEW (absent from the prior 6 days) — the rolling
    COUNT(DISTINCT) window SQL engines refuse (DISTINCT aggregates over
    window frames), solved with day-grain set algebra: collect each
    (type, day)'s user set once, then union/diff sets across a 6-day RANGE
    frame. new = |7d set| - |prev-6d set| since the 7d window is the
    disjoint-union of 'today' and 'previous six'.

    Scale: the only fact-sized operation is the (type, day, user) dedup
    with map-side partial aggregation; the windows slide over day-grain
    rows (|types| x |days|), each carrying a bounded user set. When per-day
    sets outgrow memory, the same plan holds with mergeable sketches in
    place of exact sets — HLL for counts (events_approx_distinct shows the
    union algebra) or roaring bitmaps for exact — because only the
    per-day PARTIALS, never raw rows, enter the window.
    """
    ad = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.dayofmonth("ts").cast("bigint").alias("day"),
            "user_id",
        )
        .distinct()
    )
    daysets = ad.groupBy("event_type", "day").agg(
        F.collect_set("user_id").alias("u")
    )
    w7 = (
        Window.partitionBy("event_type").orderBy("day").rangeBetween(-6, 0)
    )
    w6 = (
        Window.partitionBy("event_type").orderBy("day").rangeBetween(-6, -1)
    )
    both = daysets.select(
        "event_type",
        "day",
        F.size(F.array_distinct(F.flatten(F.collect_list("u").over(w7)))).alias(
            "users_7d"
        ),
        F.size("u").alias("users_today"),
        F.size(
            F.array_distinct(F.flatten(F.collect_list("u").over(w6)))
        ).alias("users_prev6"),
    )
    return both.select(
        "event_type",
        "day",
        "users_7d",
        "users_today",
        (F.col("users_7d") - F.col("users_prev6")).alias("new_users"),
    ).orderBy("event_type", "day")
