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
    ), cells AS (
      SELECT k, lat, lon, lat // {_CELL} AS cx, lon // {_CELL} AS cy
      FROM pts
    ), lhs AS (
      -- 3x3 neighborhood replication: radius ({_R}) < cell ({_CELL}) makes
      -- the ring a complete candidate cover, so the grid equi-join finds
      -- every qualifying pair exactly once (via b's home cell). The former
      -- naive theta-join spec is O(n^2) with no hashable key — DuckDB
      -- ground past 300 s on 150k points at sf1; this form hash-joins.
      SELECT c.k, c.lat, c.lon, c.cx + dx.o AS cx, c.cy + dy.o AS cy
      FROM cells c
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS o) dx
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS o) dy
    ), pairs AS (
      SELECT a.k AS ka, a.lat AS alat,
             (a.lat - b.lat) * (a.lat - b.lat)
             + (a.lon - b.lon) * (a.lon - b.lon) AS d2
      FROM lhs a JOIN cells b
        ON a.cx = b.cx AND a.cy = b.cy AND a.k < b.k
      WHERE (a.lat - b.lat) * (a.lat - b.lat)
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
    all-pairs predicate never materializes. (The oracle uses the same
    3×3-cover equi-join: its former naive theta-join form was the
    semantic spec but had no hashable key, and DuckDB ground past 300 s
    on sf1's 150k points; the cover property radius < cell is what makes
    both forms exact.) Candidate work is |pts|·9 rows hashed on cell, then the
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


# ---------------------------------------------------------------------------
# Grid-DBSCAN: density clustering via cell counting + core-cell components
# ---------------------------------------------------------------------------

_DB_CELL = 10_000_000  # 10-degree cells in udeg
_DB_ROUNDS = 3

_DB_PTS_SQL = """
      SELECT c_custkey AS k,
             CASE WHEN c_custkey % 10 < 2
                  THEN 30000000 + (c_custkey * 48271) % 8000000
                  WHEN c_custkey % 10 < 4
                  THEN 70000000 + (c_custkey * 48271) % 8000000
                  ELSE (c_custkey * 2654435761) % 120000000 END AS lat,
             CASE WHEN c_custkey % 10 < 2
                  THEN 100000000 + (c_custkey * 69621) % 8000000
                  WHEN c_custkey % 10 < 4
                  THEN 250000000 + (c_custkey * 69621) % 8000000
                  ELSE (c_custkey * 2246822519) % 360000000 END AS lon
      FROM customer
"""

_DB_GRID_SQL = f"""
    pts AS ({_DB_PTS_SQL}
    ), cells AS (
      SELECT (lat // {_DB_CELL}) * 1000 + (lon // {_DB_CELL}) AS cid,
             lat // {_DB_CELL} AS cy, lon // {_DB_CELL} AS cx,
             CAST(count(*) AS BIGINT) AS n
      FROM pts GROUP BY 1, 2, 3
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS npts,
             CAST(count(*) AS BIGINT) AS ncells
      FROM cells
    ), off AS (
      SELECT dy, dx FROM (SELECT unnest([-1, 0, 1]) AS dy),
                         (SELECT unnest([-1, 0, 1]) AS dx)
    ), neigh AS (
      SELECT c.cid, c.cy, c.cx, c.n,
             CAST(sum(nb.n) AS BIGINT) AS n_neigh
      FROM cells c
      JOIN off ON TRUE
      JOIN cells nb ON nb.cy = c.cy + off.dy AND nb.cx = c.cx + off.dx
      GROUP BY 1, 2, 3, 4
    ), core AS (
      SELECT nh.cid, nh.cy, nh.cx, nh.n FROM neigh nh CROSS JOIN tot
      WHERE nh.n_neigh * 24 > tot.npts
    ), und AS (
      SELECT a.cid AS a, b.cid AS b
      FROM core a JOIN off ON NOT (off.dy = 0 AND off.dx = 0)
      JOIN core b ON b.cy = a.cy + off.dy AND b.cx = a.cx + off.dx
    ), l0 AS (SELECT cid AS node, cid AS lbl FROM core)
"""

_DB_ITER_SQL = "".join(
    f""",
    l{i} AS (
      SELECT n.node, least(n.lbl, coalesce(min(p.lbl), n.lbl)) AS lbl
      FROM l{i - 1} n
      LEFT JOIN und u ON u.a = n.node
      LEFT JOIN l{i - 1} p ON p.node = u.b
      GROUP BY n.node, n.lbl
    )"""
    for i in range(1, _DB_ROUNDS + 1)
)


@query(
    "dbscan_grid_clusters",
    oracle=f"""
    WITH {_DB_GRID_SQL} {_DB_ITER_SQL}
    SELECT CAST(lbl AS BIGINT) AS cluster,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(core.n) AS BIGINT) AS n_points,
           CAST(min(core.cid) AS BIGINT) AS min_cell,
           CAST(max(core.cid) AS BIGINT) AS max_cell
    FROM l{_DB_ROUNDS} fin JOIN core ON core.cid = fin.node
    GROUP BY 1 ORDER BY 1
    """,
)
def dbscan_grid_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-DBSCAN density clustering: points land in 10-degree cells;
    a cell is CORE when its 3x3-neighborhood occupancy is strictly above
    the corpus-average neighborhood occupancy (a self-scaling minPts, so
    the same query is meaningful at every scale factor); clusters are the
    connected components of 8-adjacent core cells, resolved by
    {_DB_ROUNDS} rounds of synchronous min-label propagation (the same
    deterministic Pregel shape as label_propagation_communities, oracle-
    replayed as unrolled CTEs). This is the distributed DBSCAN family's
    standard trick: density estimation and connectivity both become
    equi-joins on cell keys — never a pairwise distance join.

    Scale: one grouped pass bins points; the 3x3 density join replicates
    each CELL (not each point) 9 times; propagation runs on the core-cell
    dimension. Cost tracks occupied-cell count, not point pairs.
    """
    c = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    pts = c.select(
        F.when(k % 10 < 2, 30_000_000 + (k * 48271) % 8_000_000)
        .when(k % 10 < 4, 70_000_000 + (k * 48271) % 8_000_000)
        .otherwise((k * 2654435761) % 120_000_000)
        .alias("lat"),
        F.when(k % 10 < 2, 100_000_000 + (k * 69621) % 8_000_000)
        .when(k % 10 < 4, 250_000_000 + (k * 69621) % 8_000_000)
        .otherwise((k * 2246822519) % 360_000_000)
        .alias("lon"),
    )
    cells = (
        pts.groupBy(
            F.expr(f"(lat div {_DB_CELL}) * 1000 + (lon div {_DB_CELL})").alias(
                "cid"
            ),
            F.expr(f"lat div {_DB_CELL}").alias("cy"),
            F.expr(f"lon div {_DB_CELL}").alias("cx"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .cache()
    )
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("npts"),
        F.count(F.lit(1)).cast("bigint").alias("ncells"),
    )
    off = spark.createDataFrame(
        [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)], "dy long, dx long"
    )
    nb = cells.select(
        F.col("cy").alias("nby"), F.col("cx").alias("nbx"), F.col("n").alias("nbn")
    )
    neigh = (
        cells.crossJoin(F.broadcast(off))
        .join(
            nb,
            (F.col("nby") == F.col("cy") + F.col("dy"))
            & (F.col("nbx") == F.col("cx") + F.col("dx")),
        )
        .groupBy("cid", "cy", "cx", "n")
        .agg(F.sum("nbn").cast("bigint").alias("n_neigh"))
    )
    core = (
        neigh.crossJoin(F.broadcast(tot))
        .where(F.col("n_neigh") * 24 > F.col("npts"))
        .select("cid", "cy", "cx", "n")
        .cache()
    )
    cb = core.select(
        F.col("cid").alias("bcid"), F.col("cy").alias("bcy"), F.col("cx").alias("bcx")
    )
    und = (
        core.crossJoin(
            F.broadcast(off.where(~((F.col("dy") == 0) & (F.col("dx") == 0))))
        )
        .join(
            cb,
            (F.col("bcy") == F.col("cy") + F.col("dy"))
            & (F.col("bcx") == F.col("cx") + F.col("dx")),
        )
        .select(F.col("cid").alias("a"), F.col("bcid").alias("b"))
    )
    labels = core.select(F.col("cid").alias("node"), F.col("cid").alias("lbl"))
    for _ in range(_DB_ROUNDS):
        nmin = (
            und.join(F.broadcast(labels), und.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("lbl").alias("nmin"))
        )
        labels = labels.join(F.broadcast(nmin), "node", "left").select(
            "node",
            F.least(F.col("lbl"), F.coalesce(F.col("nmin"), F.col("lbl"))).alias(
                "lbl"
            ),
        )
    return (
        labels.join(core, labels.node == core.cid)
        .groupBy(F.col("lbl").alias("cluster"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum("n").cast("bigint").alias("n_points"),
            F.min("cid").cast("bigint").alias("min_cell"),
            F.max("cid").cast("bigint").alias("max_cell"),
        )
        .orderBy("cluster")
    )


# ---------------------------------------------------------------------------
# Point-in-polygon tagging (integer ray casting)
# ---------------------------------------------------------------------------

# Two fixed fence polygons in µdeg (x = lon, y = lat): a convex quad and a
# concave pentagon. Integer vertices ⇒ every crossing test below is exact
# int64 arithmetic (|num| ≤ 3.6e8 · 3.6e8 ≈ 1.3e17 < 2⁶³).
_POLYGONS = {
    0: [(40_000_000, 10_000_000), (50_000_000, 50_000_000),
        (120_000_000, 45_000_000), (100_000_000, 5_000_000)],
    1: [(200_000_000, 60_000_000), (210_000_000, 100_000_000),
        (300_000_000, 110_000_000), (250_000_000, 80_000_000),
        (310_000_000, 62_000_000)],
}


def _poly_edges():
    for pid, vs in _POLYGONS.items():
        for i, (x1, y1) in enumerate(vs):
            x2, y2 = vs[(i + 1) % len(vs)]
            yield pid, x1, y1, x2, y2


_EDGES_SQL = " UNION ALL ".join(
    f"SELECT {p} AS pid, CAST({x1} AS BIGINT) AS x1, CAST({y1} AS BIGINT)"
    f" AS y1, CAST({x2} AS BIGINT) AS x2, CAST({y2} AS BIGINT) AS y2"
    for p, x1, y1, x2, y2 in _poly_edges()
)


@query(
    "point_in_polygon_tag",
    oracle=f"""
    WITH pts AS ({_PTS_SQL}),
    edges AS ({_EDGES_SQL}),
    crossings AS (
      SELECT e.pid, p.k,
             CASE WHEN (e.y1 > p.lat) <> (e.y2 > p.lat)
                   AND (CASE WHEN e.y2 - e.y1 > 0
                        THEN (e.x1 - p.lon) * (e.y2 - e.y1)
                             + (p.lat - e.y1) * (e.x2 - e.x1) > 0
                        ELSE (e.x1 - p.lon) * (e.y2 - e.y1)
                             + (p.lat - e.y1) * (e.x2 - e.x1) < 0 END)
                  THEN 1 ELSE 0 END AS c
      FROM pts p CROSS JOIN edges e
    ), tagged AS (
      SELECT pid, k, CAST(sum(c) % 2 AS BIGINT) AS inside
      FROM crossings GROUP BY pid, k
    )
    SELECT pid AS polygon_id,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(inside) AS BIGINT) AS n_inside,
           CAST(sum(inside) * 1000000 // count(*) AS BIGINT) AS inside_ppm,
           CAST(sum(CASE WHEN inside = 1 THEN k ELSE 0 END) AS BIGINT)
             AS key_checksum
    FROM tagged GROUP BY pid ORDER BY pid
    """,
)
def point_in_polygon_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofence tagging by even-odd ray casting, all in exact integer
    arithmetic: for each synthetic µdeg point and each fixed fence
    polygon (one convex, one concave), count edges whose segment
    crosses the +x ray — an edge (x₁,y₁)→(x₂,y₂) crosses iff the
    y-interval straddles the point's y AND the signed numerator
    (x₁−pₓ)(y₂−y₁) + (p_y−y₁)(x₂−x₁) has the sign of (y₂−y₁); odd
    crossing count = inside. No division, no floats — the test is
    bit-exact on both engines by construction (the standard robustness
    trick in computational geometry: compare cross products, never
    intersection coordinates).

    Scale: the polygon edge set is a tiny broadcast dimension; each
    point evaluates its crossings map-side (points × edges stays
    inside one stage, combined per point with map-side partial
    aggregation). For thousands of fences, block by bounding-box grid
    cell first (the `geo_radius_pairs` equi-join pattern) so each
    point only tests fences whose bbox cell it shares.
    """
    pts = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        (F.col("c_custkey") * 48271 % 120000000).alias("lat"),
        (F.col("c_custkey") * 69621 % 360000000).alias("lon"),
    )
    edges = spark.createDataFrame(
        list(_poly_edges()), "pid int, x1 long, y1 long, x2 long, y2 long"
    )
    num = (F.col("x1") - F.col("lon")) * (F.col("y2") - F.col("y1")) + (
        F.col("lat") - F.col("y1")
    ) * (F.col("x2") - F.col("x1"))
    crossing = (
        ((F.col("y1") > F.col("lat")) != (F.col("y2") > F.col("lat")))
        & F.when(F.col("y2") - F.col("y1") > 0, num > 0).otherwise(num < 0)
    ).cast("bigint")
    tagged = (
        pts.crossJoin(F.broadcast(edges))
        .groupBy("pid", "k")
        .agg((F.sum(crossing) % 2).cast("bigint").alias("inside"))
    )
    return (
        tagged.groupBy(F.col("pid").alias("polygon_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.sum("inside").cast("bigint").alias("n_inside"),
            F.expr(
                "CAST(sum(inside) * 1000000 div count(1) AS BIGINT)"
            ).alias("inside_ppm"),
            F.sum(F.when(F.col("inside") == 1, F.col("k")).otherwise(0))
            .cast("bigint")
            .alias("key_checksum"),
        )
        .orderBy("polygon_id")
    )
