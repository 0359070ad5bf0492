"""Spatial operators via grid blocking: radius neighbor join and
neighbor-smoothed hotspot cells.

Coordinates are synthesized deterministically from customer keys as integer
micro-degrees on a [0,120°)×[0,360°) plane (pure `(key·a) mod m` arithmetic
both engines reproduce bit-for-bit — no trig, no floats), which keeps the
focus on the part that matters at scale: turning an all-pairs distance
predicate into an equi-join on grid cells. The same plans run unchanged on
real lat/lon once multiplied into µdeg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

# 1° cells in µdeg; radius 0.25° < cell size ⇒ a 3×3 neighborhood is a
# complete candidate cover for the radius predicate.
_CELL = 1_000_000
_R = 250_000

_PTS_SQL = """
      SELECT c_custkey AS k,
             (c_custkey * 48271) % 120000000 AS lat,
             (c_custkey * 69621) % 360000000 AS lon
      FROM customer
"""


@query(
    "geo_radius_pairs",
    oracle=f"""
    WITH pts AS ({_PTS_SQL}
    ), pairs AS (
      SELECT a.k AS ka, a.lat AS alat,
             (a.lat - b.lat) * (a.lat - b.lat)
             + (a.lon - b.lon) * (a.lon - b.lon) AS d2
      FROM pts a JOIN pts b
        ON a.k < b.k
       AND (a.lat - b.lat) * (a.lat - b.lat)
           + (a.lon - b.lon) * (a.lon - b.lon) <= {_R * _R}
    )
    SELECT alat // 10000000 AS lat_band,
           count(*) AS n_pairs,
           CAST(min(d2) AS BIGINT) AS min_d2,
           CAST(max(d2) AS BIGINT) AS max_d2
    FROM pairs GROUP BY 1 ORDER BY lat_band
    """,
)
def geo_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius neighbor join: all point pairs within 0.25° (squared integer
    µdeg distance — exact, no floats), reported per 10° latitude band.

    The scale pattern is grid blocking: each point lands in one 1° cell;
    the LEFT side replicates into its 3×3 neighborhood and the join is a
    plain equi-join on the cell key, so every qualifying pair is found
    exactly once — via the RIGHT point's home cell — and the quadratic
    all-pairs predicate (the oracle does it the naive way) never
    materializes. Candidate work is |pts|·9 rows hashed on cell, then the
    exact distance filter; `ka < kb` dedupes the symmetric candidates.

    Scale: shuffle is by cell key (spatially uniform keys hash well; a
    hot city = AQE skew split or a finer cell size for dense areas).
    Radius > cell size would just widen the offset ring.
    """
    pts = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        (F.col("c_custkey") * 48271 % 120000000).alias("lat"),
        (F.col("c_custkey") * 69621 % 360000000).alias("lon"),
    )
    offsets = spark.range(-1, 2).select(F.col("id").alias("dx")).crossJoin(
        spark.range(-1, 2).select(F.col("id").alias("dy"))
    )
    left = (
        pts.crossJoin(F.broadcast(offsets))
        .select(
            F.col("k").alias("ka"),
            F.col("lat").alias("alat"),
            F.col("lon").alias("alon"),
            (F.expr(f"lat div {_CELL}") + F.col("dx")).alias("cx"),
            (F.expr(f"lon div {_CELL}") + F.col("dy")).alias("cy"),
        )
    )
    right = pts.select(
        F.col("k").alias("kb"),
        F.col("lat").alias("blat"),
        F.col("lon").alias("blon"),
        F.expr(f"lat div {_CELL}").alias("cx"),
        F.expr(f"lon div {_CELL}").alias("cy"),
    )
    d2 = (F.col("alat") - F.col("blat")) * (F.col("alat") - F.col("blat")) + (
        F.col("alon") - F.col("blon")
    ) * (F.col("alon") - F.col("blon"))
    pairs = (
        left.join(right, ["cx", "cy"])
        .filter((F.col("ka") < F.col("kb")) & (d2 <= _R * _R))
        .select("alat", d2.alias("d2"))
    )
    return (
        pairs.groupBy(F.expr(f"alat div 10000000").alias("lat_band"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("d2").alias("min_d2"),
            F.max("d2").alias("max_d2"),
        )
        .orderBy("lat_band")
    )


@query(
    "geo_cell_hotspots",
    oracle=f"""
    WITH pts AS ({_PTS_SQL}
    ), cells AS (
      SELECT lat // {_CELL} AS cx, lon // {_CELL} AS cy, count(*) AS n
      FROM pts GROUP BY 1, 2
    ), smoothed AS (
      SELECT c.cx, c.cy, c.n,
             (SELECT sum(o.n) FROM cells o
              WHERE o.cx BETWEEN c.cx - 1 AND c.cx + 1
                AND o.cy BETWEEN c.cy - 1 AND c.cy + 1) AS n_3x3
      FROM cells c
    )
    SELECT cx, cy, n, CAST(n_3x3 AS BIGINT) AS n_3x3
    FROM smoothed
    ORDER BY n_3x3 DESC, cx, cy LIMIT 15
    """,
)
def geo_cell_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial hotspot detection: per-cell point counts smoothed over the
    3×3 neighborhood (box-kernel density), top-15 by smoothed count with a
    deterministic (cx, cy) tiebreak.

    Scale: the points reduce to per-cell counts FIRST (map-side combine,
    one fact-sized aggregation); the neighborhood smoothing then joins the
    tiny cell aggregate against its 9-offset replication — never the raw
    points. The oracle's correlated subquery is the semantic spec; the
    engine plan is aggregate → offset-explode → re-aggregate.
    """
    pts = load(spark, sf_dir, "customer").select(
        (F.col("c_custkey") * 48271 % 120000000).alias("lat"),
        (F.col("c_custkey") * 69621 % 360000000).alias("lon"),
    )
    cells = pts.groupBy(
        F.expr(f"lat div {_CELL}").alias("cx"),
        F.expr(f"lon div {_CELL}").alias("cy"),
    ).agg(F.count(F.lit(1)).alias("n"))
    offsets = spark.range(-1, 2).select(F.col("id").alias("dx")).crossJoin(
        spark.range(-1, 2).select(F.col("id").alias("dy"))
    )
    # each cell donates its count to the 9 neighborhoods it belongs to
    donated = cells.crossJoin(F.broadcast(offsets)).select(
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
        F.col("n").alias("dn"),
    )
    smoothed = (
        cells.join(donated, ["cx", "cy"])
        .groupBy("cx", "cy")
        .agg(F.any_value("n").alias("n"), F.sum("dn").alias("n_3x3"))
    )
    return smoothed.orderBy(F.desc("n_3x3"), "cx", "cy").limit(15)
