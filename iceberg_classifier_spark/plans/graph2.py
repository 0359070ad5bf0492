"""Graph wave 2: neighborhood-overlap link prediction.

Jaccard link prediction scores NON-edges by shared-neighbor overlap
(over repeat-relationship edges) —
the classic baseline for "which connections will form next" (friend
suggestions, vendor recommendations), and a different output semantics
from similarity search: the candidates must EXCLUDE existing edges via
an anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_LP_TOPK = 10
_LP_MIN_SHARED = 2


@query(
    "link_prediction_jaccard",
    oracle=f"""
    WITH e AS (
      -- repeat relationships only (>= 2 distinct orders): the edge
      -- sparsification that makes neighborhood overlap carry signal and
      -- keeps the blocked self-join linear-ish (one-off purchases make
      -- every supplier a hub in this uniformly dense graph)
      SELECT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2 HAVING count(DISTINCT o.o_orderkey) >= 2
    ), deg AS (
      SELECT c, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1
    ), shared AS (
      SELECT a.c AS ca, b.c AS cb, CAST(count(*) AS BIGINT) AS inter
      FROM e a JOIN e b ON a.s = b.s AND a.c < b.c
      GROUP BY 1, 2
      HAVING count(*) >= {_LP_MIN_SHARED}
    ), nonedge AS (
      -- customers are never linked to customers in the bipartite graph,
      -- so every customer pair is a candidate "future co-purchase" link;
      -- the anti-join excludes pairs already sharing an ORDER (the
      -- direct-relationship proxy on this schema)
      SELECT sh.ca, sh.cb, sh.inter, da.d AS deg_a, db.d AS deg_b
      FROM shared sh
      JOIN deg da ON da.c = sh.ca
      JOIN deg db ON db.c = sh.cb
      WHERE NOT EXISTS (
        SELECT 1 FROM orders o1 JOIN orders o2
          ON o1.o_orderkey = o2.o_orderkey
        WHERE o1.o_custkey = sh.ca AND o2.o_custkey = sh.cb
      )
    ), scored AS (
      SELECT ca, cb, inter, deg_a, deg_b,
             round(CAST(inter AS DOUBLE) / (deg_a + deg_b - inter), 6)
               AS jaccard
      FROM nonedge
    ), top AS (
      SELECT * FROM scored ORDER BY jaccard DESC, ca, cb
      LIMIT {_LP_TOPK}
    )
    SELECT CAST(row_number() OVER (ORDER BY jaccard DESC, ca, cb)
                AS INTEGER) AS rank,
           ca AS cust_a, cb AS cust_b, inter AS shared_suppliers,
           deg_a, deg_b, jaccard
    FROM top ORDER BY rank
    """,
)
def link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard link prediction on the customer-supplier bipartite
    graph: score customer pairs by shared-supplier overlap
    |N(a)∩N(b)| / |N(a)∪N(b)| (support ≥{_LP_MIN_SHARED}) — the
    neighborhood-overlap baseline behind "you may also know" features,
    predicting which co-purchase relationships will form. Candidates
    come ONLY from the supplier-blocked self-join (pairs sharing a
    neighbor — no cross join can occur by construction), intersections
    are exact ints, and the union denominator is inclusion-exclusion
    on exact degrees.

    Scale: the graph keeps REPEAT relationships only (>= 2 distinct
    orders) — the standard edge-weight threshold that both carries the
    actual signal (one-off co-purchases are noise) and bounds the
    supplier-blocked pair generation: on the uniformly dense raw graph
    every supplier is a ~600-customer hub and the self-join emits 345M
    pairs at sf0.1 (measured, 88 s); thresholded it emits ~150k. Hub
    suppliers that survive the threshold would be df-capped exactly as
    NGRAM_DF_CAP. The exclusion check is a key anti-join, the top-k a
    TakeOrdered merge.
    """
    e = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(F.count_distinct("o_orderkey").alias("w"))
        .where(F.col("w") >= 2)
        .select("c", "s")
    )
    deg = e.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    a = e.select(F.col("c").alias("ca"), F.col("s").alias("sa"))
    b = e.select(F.col("c").alias("cb"), F.col("s").alias("sb"))
    shared = (
        a.join(b, (F.col("sa") == F.col("sb")) & (F.col("ca") < F.col("cb")))
        .groupBy("ca", "cb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
        .where(F.col("inter") >= _LP_MIN_SHARED)
    )
    da = deg.select(F.col("c").alias("ca"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("c").alias("cb"), F.col("d").alias("deg_b"))
    # exclusion frame: pairs of DISTINCT customers on the same order
    # cannot exist (one customer per order), so the anti-join is
    # structurally empty here — kept for the real-graph shape where the
    # "already linked" relation is non-trivial
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    o2 = o.select(
        F.col("o_orderkey").alias("ok2"), F.col("o_custkey").alias("ck2")
    )
    linked = (
        o.join(o2, F.col("o_orderkey") == F.col("ok2"))
        .where(F.col("o_custkey") < F.col("ck2"))
        .select(
            F.col("o_custkey").alias("ca"), F.col("ck2").alias("cb")
        )
        .distinct()
    )
    nonedge = (
        shared.join(linked, ["ca", "cb"], "left_anti")
        .join(da, "ca")
        .join(db, "cb")
    )
    scored = nonedge.select(
        "ca",
        "cb",
        "inter",
        "deg_a",
        "deg_b",
        F.round(
            F.col("inter").cast("double")
            / (F.col("deg_a") + F.col("deg_b") - F.col("inter")),
            6,
        ).alias("jaccard"),
    )
    top = scored.orderBy(F.desc("jaccard"), "ca", "cb").limit(_LP_TOPK)
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("jaccard"), "ca", "cb"))
        .cast("int")
        .alias("rank"),
        F.col("ca").alias("cust_a"),
        F.col("cb").alias("cust_b"),
        F.col("inter").alias("shared_suppliers"),
        "deg_a",
        "deg_b",
        "jaccard",
    ).orderBy("rank")
