"""Systems-ops wave: consistent-hashing ring placement.

The consistent-hash ring with virtual nodes is THE distributed
placement scheme (Dynamo/Cassandra/memcache): keys route to the next
vnode clockwise, and adding a node moves only ~1/n of the keys. The
audit measures both properties — per-node balance and the resharding
movement fraction — against rendezvous_shard_balance's alternative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_RING_NODES = 8
_RING_VNODES = 16  # virtual nodes per physical node
_HEX = "0123456789abcdef"


def _h24_sql(s: str) -> str:
    """24-bit hash from the first 6 md5 hex chars (DuckDB)."""
    return (
        f"((strpos('{_HEX}', substr(md5({s}), 1, 1)) - 1) * 1048576"
        f" + (strpos('{_HEX}', substr(md5({s}), 2, 1)) - 1) * 65536"
        f" + (strpos('{_HEX}', substr(md5({s}), 3, 1)) - 1) * 4096"
        f" + (strpos('{_HEX}', substr(md5({s}), 4, 1)) - 1) * 256"
        f" + (strpos('{_HEX}', substr(md5({s}), 5, 1)) - 1) * 16"
        f" + (strpos('{_HEX}', substr(md5({s}), 6, 1)) - 1))"
    )


def _h24_spark(s: str) -> str:
    return (
        f"CAST(conv(substr(md5(CAST({s} AS BINARY)), 1, 6), 16, 10)"
        f" AS BIGINT)"
    )


@query(
    "consistent_hash_ring_balance",
    oracle=f"""
    WITH vn AS (
      SELECT n.node, v.v,
             CAST({_h24_sql("'n' || CAST(n.node AS VARCHAR) || '_v' || CAST(v.v AS VARCHAR)")} * 1024
                  + n.node * 64 + v.v AS BIGINT) AS vh
      FROM (SELECT unnest(range({_RING_NODES})) AS node) n
      CROSS JOIN (SELECT unnest(range({_RING_VNODES})) AS v) v
    ), vn2 AS (
      SELECT node, v, vh FROM vn
      UNION ALL
      SELECT {_RING_NODES} AS node, v.v,
             CAST({_h24_sql("'n' || CAST(" + str(_RING_NODES) + " AS VARCHAR) || '_v' || CAST(v.v AS VARCHAR)")} * 1024
                  + {_RING_NODES} * 64 + v.v AS BIGINT) AS vh
      FROM (SELECT unnest(range({_RING_VNODES})) AS v) v
    ), keys AS (
      SELECT o_orderkey AS k,
             CAST({_h24_sql("CAST(o_orderkey AS VARCHAR)")} * 1024 AS BIGINT)
               AS kh
      FROM orders
    ), owner1 AS (
      SELECT k.k, k.kh,
             coalesce(
               (SELECT min_by(vn.node, vn.vh) FROM vn WHERE vn.vh >= k.kh),
               (SELECT min_by(vn.node, vn.vh) FROM vn)) AS node
      FROM keys k
    ), owner2 AS (
      SELECT k.k,
             coalesce(
               (SELECT min_by(vn2.node, vn2.vh) FROM vn2
                WHERE vn2.vh >= k.kh),
               (SELECT min_by(vn2.node, vn2.vh) FROM vn2)) AS node
      FROM keys k
    ), bal AS (
      SELECT o1.node, CAST(count(*) AS BIGINT) AS n_keys
      FROM owner1 o1 GROUP BY 1
    ), moved AS (
      SELECT CAST(sum(CASE WHEN o1.node <> o2.node THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_moved,
             CAST(count(*) AS BIGINT) AS n_total
      FROM owner1 o1 JOIN owner2 o2 USING (k)
    )
    SELECT b.node, b.n_keys,
           CAST(b.n_keys * 1000000 // m.n_total AS BIGINT) AS share_ppm,
           CAST(m.n_moved * 1000000 // m.n_total AS BIGINT)
             AS moved_on_add_ppm,
           (m.n_moved * {_RING_NODES + 1} < 2 * m.n_total)
             AS movement_near_1_over_n
    FROM bal b CROSS JOIN moved m
    ORDER BY b.node
    """,
)
def consistent_hash_ring_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Consistent-hashing ring placement audit: {_RING_NODES} nodes ×
    {_RING_VNODES} virtual nodes on a 24-bit md5 ring; every order key
    routes to the first vnode clockwise (wrap-around to the ring
    minimum). Reports per-node load shares AND the defining property —
    adding node {_RING_NODES} moves only ~1/{_RING_NODES + 1} of the
    keys (moved_on_add_ppm, asserted < 2× the ideal by
    movement_near_1_over_n) — versus naive modulo placement that
    reshuffles almost everything. All hashes and routing decisions are
    exact integers.

    Scale: the ring is a {_RING_NODES * _RING_VNODES}-row broadcast
    dimension; successor lookup is a broadcast min-aggregate per key
    (map-side, no shuffle of keys by ring position); the movement
    audit joins the two placements on the key — one bounded shuffle.
    The same plan at 10⁹ keys is exactly how placement simulations for
    real clusters run.
    """
    nodes1 = spark.range(0, _RING_NODES)
    nodes2 = spark.range(0, _RING_NODES + 1)
    vgrid = spark.range(0, _RING_VNODES).select(F.col("id").alias("v"))

    def ring(nodes):
        return nodes.select(F.col("id").alias("node")).crossJoin(vgrid).select(
            "node",
            "v",
            (
                F.expr(
                    _h24_spark(
                        "concat('n', CAST(node AS STRING), '_v',"
                        " CAST(v AS STRING))"
                    )
                )
                * 1024
                + F.col("node") * 64
                + F.col("v")
            ).alias("vh"),
        )

    vn1, vn2 = ring(nodes1), ring(nodes2)
    keys = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        (F.expr(_h24_spark("CAST(o_orderkey AS STRING)")) * 1024).alias(
            "kh"
        ),
    )

    def owners(vn, out):
        # successor lookup: min vnode hash >= key hash, else ring min —
        # via a broadcast non-equi join + min_by per key
        cand = keys.join(F.broadcast(vn), F.col("vh") >= F.col("kh"), "left")
        succ = cand.groupBy("k", "kh").agg(
            F.min_by("node", "vh").alias("succ_node")
        )
        ring_min = vn.agg(F.min_by("node", "vh").alias("wrap_node"))
        return succ.crossJoin(F.broadcast(ring_min)).select(
            "k",
            F.coalesce("succ_node", "wrap_node").alias(out),
        )

    o1 = owners(vn1, "node")
    o2 = owners(vn2, "node2")
    bal = o1.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys")
    )
    moved = o1.join(o2, "k").agg(
        F.sum(F.when(F.col("node") != F.col("node2"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_moved"),
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
    )
    return (
        bal.crossJoin(F.broadcast(moved))
        .select(
            "node",
            "n_keys",
            F.expr("CAST(n_keys * 1000000 div n_total AS BIGINT)").alias(
                "share_ppm"
            ),
            F.expr("CAST(n_moved * 1000000 div n_total AS BIGINT)").alias(
                "moved_on_add_ppm"
            ),
            (
                F.col("n_moved") * (_RING_NODES + 1) < 2 * F.col("n_total")
            ).alias("movement_near_1_over_n"),
        )
        .orderBy("node")
    )
