"""Flow/apportionment wave 65: min-cut max-flow and proportional
seats.

- `maxflow_mincut_bipartite` — the maximum flow through the
  segment -> priority trade network (source->segment capacity =
  segment revenue, cell capacities, priority->sink = priority
  revenue) computed by EXHAUSTIVE MIN-CUT enumeration: all 1024
  (segment-subset x priority-subset) cuts costed, the minimum
  equals the max flow by strong duality — for a fixed small node
  set, enumeration IS the scalable plan (no augmenting-path state).
- `dhondt_seat_apportionment` — 20 seats allocated to the 5
  segments by revenue under three classic rules: D'Hondt (divisors
  1,2,3...), Sainte-Laguë (1,3,5...), and Hamilton largest
  remainder, with per-rule seat counts side by side (D'Hondt's
  large-party bias visible directly).

Determinism: capacities/votes are exact int64; cut values are exact
sums; quotient rankings tie-break on (divisor, segment); Hamilton
remainders compare exact integer cross-products.

Scale: both reduce the fact table to the 25-cell revenue matrix in
ONE pass; the cut enumeration crosses fixed 32x32 masks with those
cells; apportionment ranks a fixed 100-quotient frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_SEATS = 20


@query(
    "maxflow_mincut_bipartite",
    oracle="""
    WITH cells AS (
      SELECT CAST(dense_rank() OVER (ORDER BY seg) AS BIGINT) - 1
               AS i,
             CAST(dense_rank() OVER (ORDER BY pri) AS BIGINT) - 1
               AS j,
             CAST(round(rev / 1000000.0) AS BIGINT) AS c
      FROM (
        SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
               sum(CAST(round(o.o_totalprice) AS BIGINT)) AS rev
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
      )
    ), supply AS (
      SELECT i, CAST(sum(c) AS BIGINT) AS cap FROM cells GROUP BY 1
    ), demand AS (
      SELECT j, CAST(sum(c) AS BIGINT) AS cap FROM cells GROUP BY 1
    ), masks AS (
      SELECT ma, mb
      FROM generate_series(0, 31) t1(ma)
      CROSS JOIN generate_series(0, 31) t2(mb)
    ), cut_src AS (
      SELECT m.ma, m.mb, CAST(sum(s.cap) AS BIGINT) AS v
      FROM masks m JOIN supply s ON ((m.ma >> s.i) & 1) = 0
      GROUP BY 1, 2
    ), cut_snk AS (
      SELECT m.ma, m.mb, CAST(sum(d.cap) AS BIGINT) AS v
      FROM masks m JOIN demand d ON ((m.mb >> d.j) & 1) = 1
      GROUP BY 1, 2
    ), cut_mid AS (
      SELECT m.ma, m.mb, CAST(sum(c.c) AS BIGINT) AS v
      FROM masks m JOIN cells c
        ON ((m.ma >> c.i) & 1) = 1 AND ((m.mb >> c.j) & 1) = 0
      GROUP BY 1, 2
    ), cuts AS (
      SELECT m.ma, m.mb,
             COALESCE(s.v, 0) + COALESCE(k.v, 0) + COALESCE(x.v, 0)
               AS cut
      FROM masks m
      LEFT JOIN cut_src s ON s.ma = m.ma AND s.mb = m.mb
      LEFT JOIN cut_snk k ON k.ma = m.ma AND k.mb = m.mb
      LEFT JOIN cut_mid x ON x.ma = m.ma AND x.mb = m.mb
    ), best AS (
      SELECT ma, mb, cut FROM cuts ORDER BY cut, ma, mb LIMIT 1
    ), tot AS (
      SELECT (SELECT CAST(sum(cap) AS BIGINT) FROM supply) AS ts,
             (SELECT CAST(sum(cap) AS BIGINT) FROM demand) AS td
    )
    SELECT b.cut AS max_flow_m,
           CAST(b.ma AS BIGINT) AS cut_segment_mask,
           CAST(b.mb AS BIGINT) AS cut_priority_mask,
           t.ts AS total_supply_m,
           t.td AS total_demand_m,
           round(b.cut * 1.0 / least(t.ts, t.td), 6)
             AS flow_utilization
    FROM best b CROSS JOIN tot t
    """,
)
def maxflow_mincut_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum flow through the segment->priority trade network
    (source->segment arcs carry each segment's $M revenue, the 25
    interior arcs the cell revenues, priority->sink the priority
    totals), computed by exhaustively costing all 1024
    (segment-subset, priority-subset) s-t cuts: cut value =
    excluded-supply + crossing-cell + included-demand capacity, and
    by max-flow/min-cut strong duality the minimum IS the maximum
    flow. With a fixed 10-node network the 32x32 enumeration is the
    right distributed plan — no sequential augmenting-path state.
    The network-capacity complement of `sinkhorn_transport_plan`
    (soft coupling) and `gale_shapley_assignment` (preferences).

    Determinism: all capacities and cut values are exact int64; the
    argmin tie-breaks on the masks.

    Scale: ONE joined fact pass to the 25-cell matrix; the
    enumeration crosses fixed 1024 masks with bounded capacity
    frames (~26k light rows).
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cells = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice")).cast("bigint")).alias("rev")
        )
        .select(
            (F.dense_rank().over(Window.orderBy("seg")) - 1)
            .cast("bigint")
            .alias("i"),
            (F.dense_rank().over(Window.orderBy("pri")) - 1)
            .cast("bigint")
            .alias("j"),
            F.round(F.col("rev") / 1000000.0).cast("bigint").alias("c"),
        )
        .cache()
    )
    supply = cells.groupBy("i").agg(
        F.sum("c").cast("bigint").alias("cap")
    )
    demand = cells.groupBy("j").agg(
        F.sum("c").cast("bigint").alias("cap")
    )
    ma = spark.range(0, 32).select(F.col("id").alias("ma"))
    mb = spark.range(0, 32).select(F.col("id").alias("mb"))
    masks = ma.crossJoin(mb)
    cut_src = (
        masks.join(
            F.broadcast(supply),
            F.expr("((ma >> i) & 1) = 0"),
        )
        .groupBy("ma", "mb")
        .agg(F.sum("cap").cast("bigint").alias("v_src"))
    )
    cut_snk = (
        masks.join(
            F.broadcast(demand),
            F.expr("((mb >> j) & 1) = 1"),
        )
        .groupBy("ma", "mb")
        .agg(F.sum("cap").cast("bigint").alias("v_snk"))
    )
    cut_mid = (
        masks.join(
            F.broadcast(cells),
            F.expr("((ma >> i) & 1) = 1 AND ((mb >> j) & 1) = 0"),
        )
        .groupBy("ma", "mb")
        .agg(F.sum("c").cast("bigint").alias("v_mid"))
    )
    cuts = (
        masks.join(cut_src, ["ma", "mb"], "left")
        .join(cut_snk, ["ma", "mb"], "left")
        .join(cut_mid, ["ma", "mb"], "left")
        .select(
            "ma",
            "mb",
            (
                F.coalesce(F.col("v_src"), F.lit(0))
                + F.coalesce(F.col("v_snk"), F.lit(0))
                + F.coalesce(F.col("v_mid"), F.lit(0))
            ).alias("cut"),
        )
    )
    best = cuts.orderBy("cut", "ma", "mb").limit(1)
    tot = supply.agg(F.sum("cap").cast("bigint").alias("ts")).crossJoin(
        F.broadcast(
            demand.agg(F.sum("cap").cast("bigint").alias("td"))
        )
    )
    return best.crossJoin(F.broadcast(tot)).select(
        F.col("cut").alias("max_flow_m"),
        F.col("ma").cast("bigint").alias("cut_segment_mask"),
        F.col("mb").cast("bigint").alias("cut_priority_mask"),
        F.col("ts").alias("total_supply_m"),
        F.col("td").alias("total_demand_m"),
        F.round(
            F.col("cut") * 1.0 / F.least(F.col("ts"), F.col("td")), 6
        ).alias("flow_utilization"),
    )


@query(
    "dhondt_seat_apportionment",
    oracle=f"""
    WITH votes AS (
      SELECT CAST(dense_rank() OVER (ORDER BY seg) AS BIGINT) AS s,
             v
      FROM (
        SELECT c.c_mktsegment AS seg,
               CAST(sum(CAST(round(o.o_totalprice) AS BIGINT))
                 AS BIGINT) AS v
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1
      )
    ), tot AS (SELECT CAST(sum(v) AS BIGINT) AS tv FROM votes),
    dh AS (
      SELECT s, CAST(count(*) AS BIGINT) AS seats FROM (
        SELECT s FROM (
          SELECT v.s, v.v * 1.0 / d.d AS q,
                 row_number() OVER (ORDER BY v.v * 1.0 / d.d DESC,
                                    v.s, d.d) AS rk
          FROM votes v CROSS JOIN generate_series(1, {_SEATS}) d(d)
        ) WHERE rk <= {_SEATS}
      ) GROUP BY s
    ), sl AS (
      SELECT s, CAST(count(*) AS BIGINT) AS seats FROM (
        SELECT s FROM (
          SELECT v.s, v.v * 1.0 / (2 * d.d - 1) AS q,
                 row_number() OVER (
                   ORDER BY v.v * 1.0 / (2 * d.d - 1) DESC, v.s, d.d)
                   AS rk
          FROM votes v CROSS JOIN generate_series(1, {_SEATS}) d(d)
        ) WHERE rk <= {_SEATS}
      ) GROUP BY s
    ), ham AS (
      SELECT s, fl + CASE WHEN rr <= extra THEN 1 ELSE 0 END AS seats
      FROM (
        SELECT v.s,
               CAST(floor(v.v * {_SEATS} * 1.0 / t.tv) AS BIGINT)
                 AS fl,
               row_number() OVER (
                 ORDER BY v.v * {_SEATS} % t.tv DESC, v.s) AS rr,
               {_SEATS} - CAST(sum(floor(v.v * {_SEATS} * 1.0 / t.tv))
                 OVER () AS BIGINT) AS extra
        FROM votes v CROSS JOIN tot t
      )
    )
    SELECT v.s AS segment_rank,
           round(v.v * 1.0 / t.tv, 6) AS vote_share,
           COALESCE(dh.seats, 0) AS seats_dhondt,
           COALESCE(sl.seats, 0) AS seats_sainte_lague,
           CAST(ham.seats AS BIGINT) AS seats_hamilton
    FROM votes v
    CROSS JOIN tot t
    LEFT JOIN dh ON dh.s = v.s
    LEFT JOIN sl ON sl.s = v.s
    JOIN ham ON ham.s = v.s
    ORDER BY segment_rank
    """,
)
def dhondt_seat_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional apportionment of {_SEATS} seats to the 5 market
    segments by revenue under the three classic rules: D'Hondt
    (highest averages, divisors 1,2,3... — favors large parties),
    Sainte-Laguë (divisors 1,3,5... — near-unbiased), and Hamilton
    largest remainder (exact quotas + remainder ranking — the
    method `proration_largest_remainder` uses for rounding, here in
    its electoral form). Side-by-side seat counts make the method
    bias directly visible. Remainder ranking uses EXACT integer
    modular arithmetic (v*S mod total), not float remainders.

    Determinism: votes are exact int64; quotient rankings tie-break
    on (segment, divisor); Hamilton remainders are exact integers.

    Scale: ONE joined fact pass to 5 vote rows; every allocation
    ranks a fixed <=100-row quotient frame.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    votes = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.sum(F.round(F.col("o_totalprice")).cast("bigint"))
            .cast("bigint")
            .alias("v")
        )
        .select(
            F.dense_rank().over(Window.orderBy("seg")).cast("bigint").alias("s"),
            "v",
        )
        .cache()
    )
    tot = votes.agg(F.sum("v").cast("bigint").alias("tv"))
    ds = spark.range(1, _SEATS + 1).select(F.col("id").alias("d"))

    def highest_averages(divisor: F.Column, name: str) -> DataFrame:
        q = votes.crossJoin(F.broadcast(ds)).select(
            "s",
            "d",
            (F.col("v") * 1.0 / divisor).alias("q"),
        )
        top = q.select(
            "s",
            F.row_number()
            .over(Window.orderBy(F.desc("q"), "s", "d"))
            .alias("rk"),
        ).where(F.col("rk") <= _SEATS)
        return top.groupBy("s").agg(
            F.count(F.lit(1)).cast("bigint").alias(name)
        )

    dh = highest_averages(F.col("d"), "seats_dhondt")
    sl = highest_averages(2 * F.col("d") - 1, "seats_sainte_lague")
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ham = votes.crossJoin(F.broadcast(tot)).select(
        "s",
        "v",
        "tv",
        F.floor(F.col("v") * _SEATS * 1.0 / F.col("tv"))
        .cast("bigint")
        .alias("fl"),
        F.row_number()
        .over(Window.orderBy(F.desc((F.col("v") * _SEATS) % F.col("tv")), "s"))
        .alias("rr"),
    ).select(
        "s",
        "fl",
        "rr",
        (
            _SEATS
            - F.sum("fl").over(wall).cast("bigint")
        ).alias("extra"),
    ).select(
        "s",
        (
            F.col("fl")
            + F.when(F.col("rr") <= F.col("extra"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("seats_hamilton"),
    )
    return (
        votes.crossJoin(F.broadcast(tot))
        .join(dh, "s", "left")
        .join(sl, "s", "left")
        .join(ham, "s")
        .select(
            F.col("s").alias("segment_rank"),
            F.round(F.col("v") * 1.0 / F.col("tv"), 6).alias("vote_share"),
            F.coalesce(F.col("seats_dhondt"), F.lit(0)).alias(
                "seats_dhondt"
            ),
            F.coalesce(F.col("seats_sainte_lague"), F.lit(0)).alias(
                "seats_sainte_lague"
            ),
            "seats_hamilton",
        )
        .orderBy("segment_rank")
    )
