"""Advanced wave 4: HITS link analysis and binary-segmentation
changepoints.

HITS (Kleinberg's hubs-and-authorities) complements pagerank_tokens /
label_propagation_communities on the trade graph; binary segmentation
complements cusum_changepoint with the top-2 SSE-optimal changepoints.
Both are engineered for full value oracles: HITS runs fixed
un-normalized rounds in EXACT int64 (score ratios are normalization-
free), and binseg does all float math as identical expression trees
over exact integer prefix sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_HITS_TOPK = 15


@query(
    "hits_hub_authority",
    oracle=f"""
    WITH e AS (
      SELECT o.o_custkey AS c, l.l_suppkey AS s,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ), h1 AS (
      SELECT c, CAST(sum(w) AS BIGINT) AS h FROM e GROUP BY 1
    ), a1 AS (
      SELECT e.s, CAST(sum(e.w * h1.h) AS BIGINT) AS a
      FROM e JOIN h1 USING (c) GROUP BY 1
    ), h2 AS (
      SELECT e.c, CAST(sum(e.w * a1.a) AS BIGINT) AS h
      FROM e JOIN a1 USING (s) GROUP BY 1
    ), th AS (
      SELECT 'hub' AS role, c AS node_id, h AS score
      FROM h2 ORDER BY h DESC, c LIMIT {_HITS_TOPK}
    ), ta AS (
      SELECT 'authority' AS role, s AS node_id, a AS score
      FROM a1 ORDER BY a DESC, s LIMIT {_HITS_TOPK}
    ), u AS (SELECT * FROM th UNION ALL SELECT * FROM ta)
    SELECT role,
           CAST(row_number() OVER (PARTITION BY role
                ORDER BY score DESC, node_id) AS INTEGER) AS rank,
           node_id, score
    FROM u ORDER BY role, rank
    """,
)
def hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities over the customer→supplier trade graph
    (edge weight = lineitem count): 1.5 un-normalized power-iteration
    rounds — h1 = out-strength, a1 = Σ w·h1 over in-edges, h2 = Σ w·a1 —
    reported as top-{_HITS_TOPK} hubs (customers) and authorities
    (suppliers). Skipping the usual per-round normalization keeps every
    score an EXACT int64 (rankings and score ratios are invariant to
    normalization, which only prevents float overflow — irrelevant for
    a fixed small round count: scores stay < 2^63 through round 2 at
    any TPC-H SF), so an inherently iterative float algorithm gets a
    bit-exact oracle.

    Scale: each round is one broadcast-able dimension join (node scores
    are |customers| / |suppliers| sized) + a map-side-combinable
    groupBy on the edge list — the textbook distributed power-iteration
    shape (same as pagerank_tokens); top-k are TakeOrdered limits with
    rank applied on the bounded result, never a global window.
    """
    e = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    h1 = e.groupBy("c").agg(F.sum("w").cast("bigint").alias("h"))
    a1 = (
        e.join(h1, "c")
        .groupBy("s")
        .agg(F.sum(F.col("w") * F.col("h")).cast("bigint").alias("a"))
    )
    h2 = (
        e.join(a1, "s")
        .groupBy("c")
        .agg(F.sum(F.col("w") * F.col("a")).cast("bigint").alias("h"))
    )
    th = (
        h2.orderBy(F.desc("h"), "c")
        .limit(_HITS_TOPK)
        .select(
            F.lit("hub").alias("role"),
            F.col("c").alias("node_id"),
            F.col("h").alias("score"),
        )
    )
    ta = (
        a1.orderBy(F.desc("a"), "s")
        .limit(_HITS_TOPK)
        .select(
            F.lit("authority").alias("role"),
            F.col("s").alias("node_id"),
            F.col("a").alias("score"),
        )
    )
    u = th.unionByName(ta)
    return u.select(
        "role",
        F.row_number()
        .over(
            Window.partitionBy("role").orderBy(F.desc("score"), "node_id")
        )
        .cast("int")
        .alias("rank"),
        "node_id",
        "score",
    ).orderBy("role", "rank")


# Shared SSE expressions over exact integer prefix sums (cs = cumulative
# Σy as int64, cq = cumulative Σy² as DECIMAL(38,0) — y² crosses int64 at
# 10x scale, and DECIMAL(38,0) is the widening both engines spell the
# same way; 1-indexed by rn; cs0/cq0 = prefix BEFORE the segment start).
# SSE(a..b) = (cqb-cqa0) - (csb-csa0)²/(b-a+1): the exact-integer
# differences are taken first, then one identical promotion to double.
_SSE = (
    "(({cqb} - {cqa0}) - CAST({csb} - {csa0} AS DOUBLE)"
    " * CAST({csb} - {csa0} AS DOUBLE) / CAST({b} - {a0} AS DOUBLE))"
)

_BINSEG_BODY = """
    pre AS (
      SELECT rn, day, y,
             CAST(sum(y) OVER (ORDER BY rn) AS BIGINT) AS cs,
             CAST(sum(CAST(y AS DECIMAL(19,0)) * y) OVER (ORDER BY rn)
                  AS DECIMAL(38,0)) AS cq
      FROM binseg_daily
    ), tot AS (
      SELECT CAST(max(rn) AS BIGINT) AS n,
             CAST(max(cs) AS BIGINT) AS s,
             CAST(max(cq) AS DECIMAL(38,0)) AS q
      FROM pre
    ), red1 AS (
      SELECT p.rn, p.day,
             {sse_all} - {sse_left} - {sse_right} AS red
      FROM pre p CROSS JOIN tot t
      WHERE p.rn < t.n
    ), best1 AS (
      SELECT rn AS t1, day AS day1, red AS red1
      FROM red1 ORDER BY red DESC, rn LIMIT 1
    ), segs AS (
      SELECT 0 AS a0, b1.t1 AS b, b1.t1, b1.day1, b1.red1 FROM best1 b1
      UNION ALL
      SELECT b1.t1 AS a0, t.n AS b, b1.t1, b1.day1, b1.red1
      FROM best1 b1 CROSS JOIN tot t
    ), bounds AS (
      SELECT g.a0, g.b, g.t1, g.day1, g.red1,
             CASE WHEN g.a0 = 0 THEN CAST(0 AS BIGINT) ELSE pa.cs END AS csa0,
             CASE WHEN g.a0 = 0 THEN CAST(0 AS DECIMAL(38,0)) ELSE pa.cq END
               AS cqa0,
             pb.cs AS csb, pb.cq AS cqb
      FROM segs g
      LEFT JOIN pre pa ON pa.rn = g.a0
      JOIN pre pb ON pb.rn = g.b
    ), red2 AS (
      SELECT p.rn, p.day, bo.t1, bo.day1, bo.red1,
             {sse_seg} - {sse_seg_left} - {sse_seg_right} AS red
      FROM bounds bo JOIN pre p ON p.rn > bo.a0 AND p.rn < bo.b
    ), best2 AS (
      SELECT rn AS t2, day AS day2, red AS red2v, t1, day1, red1
      FROM red2 ORDER BY red DESC, rn LIMIT 1
    )
    SELECT 1 AS cp_rank, day1 AS day, round(red1, 6) AS sse_reduction
    FROM best2
    UNION ALL
    SELECT 2 AS cp_rank, day2 AS day, round(red2v, 6) AS sse_reduction
    FROM best2
    ORDER BY cp_rank
"""


def _binseg_sql() -> str:
    sse_all = _SSE.format(cqb="t.q", cqa0="0", csb="t.s", csa0="0", b="t.n", a0="0")
    sse_left = _SSE.format(
        cqb="p.cq", cqa0="0", csb="p.cs", csa0="0", b="p.rn", a0="0"
    )
    sse_right = _SSE.format(
        cqb="t.q", cqa0="p.cq", csb="t.s", csa0="p.cs", b="t.n", a0="p.rn"
    )
    sse_seg = _SSE.format(
        cqb="bo.cqb", cqa0="bo.cqa0", csb="bo.csb", csa0="bo.csa0",
        b="bo.b", a0="bo.a0",
    )
    sse_seg_left = _SSE.format(
        cqb="p.cq", cqa0="bo.cqa0", csb="p.cs", csa0="bo.csa0",
        b="p.rn", a0="bo.a0",
    )
    sse_seg_right = _SSE.format(
        cqb="bo.cqb", cqa0="p.cq", csb="bo.csb", csa0="p.cs",
        b="bo.b", a0="p.rn",
    )
    return _BINSEG_BODY.format(
        sse_all=sse_all,
        sse_left=sse_left,
        sse_right=sse_right,
        sse_seg=sse_seg,
        sse_seg_left=sse_seg_left,
        sse_seg_right=sse_seg_right,
    )


# Daily revenue as an exact dollar int64: sum EXACT integer cents
# (per-row round(price*100) is deterministic; bigint summation is
# order-free), then integer HALF_UP to dollars — round(sum(double))
# flipped ±1 on 77/2405 days at sf1 when partition-order double sums
# straddled a .5-cent boundary (the events_hourly convention).
_DAILY_SQL = """
    SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn, day, y
    FROM (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST((sum(CAST(round(o_totalprice * 100) AS BIGINT)) + 50)
                  // 100 AS BIGINT) AS y
      FROM orders GROUP BY 1
    )
"""


@query(
    "binseg_changepoints",
    oracle=f"WITH binseg_daily AS ({_DAILY_SQL}),\n{_binseg_sql()}",
)
def binseg_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation changepoint detection on the daily revenue
    series: the split maximizing the SSE reduction (variance explained
    by a mean shift) picks changepoint 1; the best split INSIDE either
    resulting segment picks changepoint 2 — the greedy top-down scheme
    production changepoint libraries (ruptures' BinSeg, PELT's cousin)
    use. Complements cusum_changepoint (fixed-threshold drift alarm)
    with an optimality-based segmentation. Daily totals are exact
    dollar int64s (integer-cents sum + integer HALF_UP, never
    round(sum(double))); cumulative Σy/Σy² stay exact integers, and every
    SSE is the identical double expression over those ints in both
    engines, so the argmax splits and 6dp reductions are bit-exact.

    Scale: one map-side-combined groupBy(day); everything after runs on
    the calendar-bounded day dimension (the unpartitioned prefix-sum
    window is over ≤ a few thousand rows at any corpus size — the
    documented dimension-frame exception). Deeper segmentations recurse
    k times over the same prefix arrays — cost O(k·|days|), no new data
    passes.
    """
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(
            F.expr(
                "CAST((sum(CAST(round(o_totalprice * 100) AS BIGINT)) + 50)"
                " DIV 100 AS BIGINT)"
            ).alias("y")
        )
        .select(
            F.row_number().over(Window.orderBy("day")).cast("bigint").alias("rn"),
            "day",
            "y",
        )
    )
    daily.createOrReplaceTempView("binseg_daily")
    return spark.sql("WITH " + _binseg_sql().lstrip())
