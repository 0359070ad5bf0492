"""Analytics wave 32: empirical reserve-price optimization and the
rich-club coefficient.

The reserve-price grid turns `second_price_auction_clearing`'s
(top, second) bid pairs into the revenue curve a seller actually
optimizes — each candidate reserve either lifts the clearing price to
the reserve or kills the sale, and the empirical argmax is the
Myerson-style answer without a distribution assumption. The rich-club
coefficient asks whether high-degree nodes in the supplier co-order
graph preferentially interconnect — the hub-oligarchy structure
degree distributions alone cannot see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_RESERVE_PCTS = [0, 50, 75, 90, 100, 110, 125]


@query(
    "reserve_price_grid",
    oracle=f"""
    WITH bids AS (
      SELECT date_trunc('hour', ts) AS slot,
             CAST(round(value * 100) AS BIGINT) AS bid, event_id
      FROM events WHERE event_type = 'view'
    ), ranked AS (
      SELECT slot, bid,
             row_number() OVER (PARTITION BY slot
                                ORDER BY bid DESC, event_id) AS rk
      FROM bids
    ), pairs AS (
      SELECT f.slot, f.bid AS top_bid, s.bid AS second_bid
      FROM ranked f JOIN ranked s
        ON f.slot = s.slot AND f.rk = 1 AND s.rk = 2
    ), base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_slots,
             CAST(sum(second_bid) AS BIGINT) AS base_cents,
             CAST((SELECT sum(second_bid) * 1.0 / count(*)
                   FROM pairs) AS DOUBLE) AS mean_second
      FROM pairs
    ), grid AS (
      SELECT g.pct,
             CAST(round(b.mean_second * g.pct / 100.0) AS BIGINT) AS r
      FROM (SELECT unnest([{", ".join(str(p) for p in _RESERVE_PCTS)}])
              AS pct) g
      CROSS JOIN base b
    ), rev AS (
      SELECT g.pct, g.r,
             CAST(sum(CASE WHEN p.top_bid >= g.r
                      THEN greatest(p.second_bid, g.r) ELSE 0 END)
               AS BIGINT) AS revenue_cents,
             CAST(sum(CASE WHEN p.top_bid < g.r THEN 1 ELSE 0 END)
               AS BIGINT) AS lost_sales
      FROM grid g CROSS JOIN pairs p
      GROUP BY g.pct, g.r
    )
    SELECT r.pct AS reserve_pct_of_mean,
           round(r.r / 100.0, 2) AS reserve_price,
           b.n_slots,
           round(r.revenue_cents / 100.0, 2) AS revenue,
           r.lost_sales,
           CAST((r.revenue_cents - b.base_cents) * 1000000
                // greatest(b.base_cents, 1) AS BIGINT)
             AS lift_vs_no_reserve_ppm
    FROM rev r CROSS JOIN base b
    ORDER BY reserve_pct_of_mean
    """,
)
def reserve_price_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical reserve-price optimization over the hourly second-
    price auctions: for reserves at 0–125% of the mean clearing
    price, replay every auction — the sale survives iff the top bid
    clears the reserve, and then pays max(second bid, reserve) —
    reporting revenue, lost sales, and lift vs no reserve. The
    distribution-free version of Myerson's optimal-reserve argument,
    and the honest exhibit of its trade-off (revenue lift vs killed
    auctions).

    Determinism: bids and revenues are exact integer cents; the grid
    reserve quantizes the mean once; replay is exact comparisons.

    Scale: the (top, second) pairs come from slot-partitioned rank
    windows (one pass); the grid×pairs replay is a broadcast of 7
    constants against the bounded pair frame with map-side combine.
    """
    e = load(spark, sf_dir, "events")
    bids = e.filter(F.col("event_type") == "view").select(
        F.date_trunc("hour", F.col("ts")).alias("slot"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("bid"),
        "event_id",
    )
    w = Window.partitionBy("slot").orderBy(F.desc("bid"), "event_id")
    ranked = bids.withColumn("rk", F.row_number().over(w))
    f_ = ranked.filter(F.col("rk") == 1).select(
        "slot", F.col("bid").alias("top_bid")
    )
    s_ = ranked.filter(F.col("rk") == 2).select(
        "slot", F.col("bid").alias("second_bid")
    )
    pairs = f_.join(s_, "slot")
    base = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_slots"),
        F.sum("second_bid").cast("bigint").alias("base_cents"),
        (F.sum("second_bid") * 1.0 / F.count(F.lit(1))).alias(
            "mean_second"
        ),
    )
    grid = (
        spark.createDataFrame(
            [(p,) for p in _RESERVE_PCTS], "pct int"
        )
        .crossJoin(F.broadcast(base))
        .select(
            "pct",
            F.round(F.col("mean_second") * F.col("pct") / 100.0)
            .cast("bigint")
            .alias("r"),
        )
    )
    rev = (
        pairs.crossJoin(F.broadcast(grid))
        .groupBy("pct", "r")
        .agg(
            F.sum(
                F.when(
                    F.col("top_bid") >= F.col("r"),
                    F.greatest(F.col("second_bid"), F.col("r")),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("revenue_cents"),
            F.sum(
                F.when(F.col("top_bid") < F.col("r"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("lost_sales"),
        )
    )
    return (
        rev.crossJoin(F.broadcast(base))
        .select(
            F.col("pct").alias("reserve_pct_of_mean"),
            F.round(F.col("r") / 100.0, 2).alias("reserve_price"),
            "n_slots",
            F.round(F.col("revenue_cents") / 100.0, 2).alias("revenue"),
            "lost_sales",
            F.expr(
                """
                CAST((revenue_cents - base_cents) * 1000000
                     div greatest(base_cents, 1) AS BIGINT)
                """
            ).alias("lift_vs_no_reserve_ppm"),
        )
        .orderBy("reserve_pct_of_mean")
    )


_RC_DEGREES = [2, 4, 8, 16]


@query(
    "rich_club_coefficient",
    oracle=f"""
    WITH edges AS (
      SELECT DISTINCT least(a.l_suppkey, b.l_suppkey) AS u,
             greatest(a.l_suppkey, b.l_suppkey) AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ), deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
      ) GROUP BY node
    ), grid AS (
      SELECT unnest([{", ".join(str(k) for k in _RC_DEGREES)}]) AS k
    ), club AS (
      SELECT g.k, CAST(count(*) AS BIGINT) AS n_club
      FROM grid g JOIN deg d ON d.d > g.k GROUP BY g.k
    ), club_edges AS (
      SELECT g.k, CAST(count(*) AS BIGINT) AS e_club
      FROM grid g
      JOIN edges e ON 1 = 1
      JOIN deg du ON du.node = e.u AND du.d > g.k
      JOIN deg dv ON dv.node = e.v AND dv.d > g.k
      GROUP BY g.k
    )
    SELECT c.k AS degree_threshold,
           c.n_club AS club_size,
           coalesce(ce.e_club, 0) AS club_edges,
           CAST(c.n_club * (c.n_club - 1) / 2 AS BIGINT)
             AS possible_edges,
           round(coalesce(ce.e_club, 0) * 2.0
                 / greatest(c.n_club * (c.n_club - 1), 1), 6)
             AS rich_club_phi
    FROM club c LEFT JOIN club_edges ce ON c.k = ce.k
    ORDER BY degree_threshold
    """,
)
def rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient of the supplier co-order graph: for
    degree thresholds k ∈ {{2, 4, 8, 16}}, φ(k) = the edge density
    among nodes of degree > k — rising φ(k) means the hubs form an
    oligarchy that trades among itself (supply-chain concentration
    risk the plain degree histogram can't see; the structural
    complement of `graph_degree_assortativity`'s single correlation
    number).

    Determinism: degrees, club memberships, and club-edge counts are
    exact integers; φ is one ratio per threshold.

    Scale: edges come from the order-keyed pair join (bounded
    per-order fan-out); club filtering is a broadcast of the degree
    dimension; each threshold reuses the SAME edge and degree frames
    (the grid join costs |edges|×|grid| map-side predicate work, not
    new shuffles).
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("u"),
            F.col("b.l_suppkey").alias("v"),
        )
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    grid = spark.createDataFrame(
        [(k,) for k in _RC_DEGREES], "k int"
    )
    club = (
        grid.join(F.broadcast(deg), deg.d > grid.k)
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_club"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    club_edges = (
        edges.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .crossJoin(F.broadcast(grid))
        .filter((F.col("du") > F.col("k")) & (F.col("dv") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_club"))
    )
    return (
        club.join(club_edges, "k", "left")
        .select(
            F.col("k").alias("degree_threshold"),
            F.col("n_club").alias("club_size"),
            F.coalesce("e_club", F.lit(0))
            .cast("bigint")
            .alias("club_edges"),
            F.expr(
                "CAST(n_club * (n_club - 1) div 2 AS BIGINT)"
            ).alias("possible_edges"),
            F.round(
                F.coalesce(F.col("e_club"), F.lit(0))
                * 2.0
                / F.greatest(
                    F.col("n_club") * (F.col("n_club") - 1), F.lit(1)
                ),
                6,
            ).alias("rich_club_phi"),
        )
        .orderBy("degree_threshold")
    )
