"""Analytics-breadth round: Pareto concentration analysis, key-skew
diagnostics for shuffle planning, and level-synchronous BFS shortest
paths with path counting.

The skew report deliberately uses exact-integer concentration metrics
(top-k shares, Gini from the rank formula) instead of entropy: a float
Σ p·ln p over thousands of keys is order-dependent across engines, while
the Gini numerator Σ (2i−n−1)·c_i is a pure int64 sum under a total order
with explicit tiebreaks — bit-exact, like every other float-noise-prone
op in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.advanced2 import _heavy_trade_edges
from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_CENTS_W = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


# ---------------------------------------------------------------------------
# Pareto / revenue-concentration deciles
# ---------------------------------------------------------------------------

@query(
    "pareto_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT o.o_custkey AS ck,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS cents
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1
    ), ranked AS (
      SELECT cents, ntile(10) OVER (ORDER BY cents DESC, ck) AS decile
      FROM rev
    ), dec AS (
      SELECT decile, count(*) AS n_customers,
             CAST(sum(cents) AS BIGINT) AS dec_cents
      FROM ranked GROUP BY 1
    )
    SELECT decile, n_customers,
           CAST((dec_cents + 50) // 100 AS DOUBLE) / 100 AS decile_revenue,
           round(CAST(sum(dec_cents) OVER (ORDER BY decile) AS BIGINT) * 1.0
                 / CAST(sum(dec_cents) OVER () AS BIGINT), 6) AS cum_share
    FROM dec ORDER BY decile
    """,
)
def pareto_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) concentration analysis: rank customers by lifetime
    revenue, cut them into deciles, and report each decile's revenue plus
    the cumulative share — the 'top 10% of customers produce X% of
    revenue' curve. Revenue is exact integer cents×pct; the decile cut has
    a deterministic tiebreak, so shares are bit-stable.

    Scale: the fact-sized work is one groupBy(custkey) with map-side
    partial aggregation; the decile assignment then reproduces EXACT
    ntile(10) semantics without a single-partition sort of the customer
    frame — a 1024-bucket revenue histogram gives broadcast rank offsets
    (dimension-sized window over buckets only) and ranks are computed
    per bucket (window PARTITIONED by bucket), so decile =
    ntile-from-rank arithmetic. The same two-level rank the tdigest
    exact side and token_budget_selection use; the customer frame is
    never globally sorted anywhere in the plan.
    """
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    rev = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(F.sum(F.expr(_CENTS_W)).alias("cents"))
        # revenue-range buckets for the two-level rank; DESCENDING cents
        # order maps to ASCENDING bucket ids
        .withColumn("bkt", F.expr("-(cents div 100000000)"))
    )
    bcnt = rev.groupBy("bkt").agg(F.count(F.lit(1)).alias("bn"))
    off = bcnt.select(
        "bkt",
        (
            F.sum("bn").over(Window.partitionBy().orderBy("bkt")) - F.col("bn")
        ).alias("off"),
        F.sum("bn").over(Window.partitionBy()).alias("n"),
    )
    wl = Window.partitionBy("bkt").orderBy(F.desc("cents"), "ck")
    # exact ntile(10) from the global rank r among n: the first (n mod 10)
    # deciles carry ceil(n/10) customers, the rest floor(n/10)
    ranked = (
        rev.join(F.broadcast(off), "bkt")
        .withColumn("r", F.col("off") + F.row_number().over(wl))
        .withColumn(
            "decile",
            F.expr(
                """
                CASE WHEN r <= (n % 10) * (n div 10 + 1)
                     THEN (r - 1) div (n div 10 + 1) + 1
                     ELSE (n % 10)
                          + (r - (n % 10) * (n div 10 + 1) - 1) div (n div 10)
                          + 1
                END
                """
            ).cast("int"),
        )
        .select("cents", "decile")
    )
    dec = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("dec_cents"),
    )
    return (
        dec.select(
            "decile",
            "n_customers",
            # exact int64 HALF_UP (motif_trade_triangles convention): the
            # cents×pct sum has a true 4dp expansion, so rounding the
            # double quotient to 2dp sits on half-cent boundaries
            (F.expr("(dec_cents + 50) div 100").cast("double") / 100).alias(
                "decile_revenue"
            ),
            F.round(
                F.sum("dec_cents").over(Window.orderBy("decile"))
                * 1.0
                / F.sum("dec_cents").over(Window.partitionBy()),
                6,
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Key-skew diagnostics (shuffle-planning observability)
# ---------------------------------------------------------------------------

@query(
    "key_skew_report",
    oracle="""
    WITH c AS (
      SELECT 'l_suppkey' AS key_col, l_suppkey AS k, count(*) AS cnt
      FROM lineitem GROUP BY 1, 2
      UNION ALL
      SELECT 'l_partkey', l_partkey, count(*) FROM lineitem GROUP BY 1, 2
      UNION ALL
      SELECT 'o_custkey', o_custkey, count(*) FROM orders GROUP BY 1, 2
    ), r AS (
      SELECT key_col, cnt,
             row_number() OVER (PARTITION BY key_col ORDER BY cnt, k) AS i,
             row_number() OVER (PARTITION BY key_col ORDER BY cnt DESC, k)
               AS ri,
             count(*) OVER (PARTITION BY key_col) AS nk,
             CAST(sum(cnt) OVER (PARTITION BY key_col) AS BIGINT) AS nr
      FROM c
    )
    SELECT key_col, any_value(nk) AS n_keys, any_value(nr) AS n_rows,
           round(max(CASE WHEN ri = 1 THEN cnt END) * 1.0 / any_value(nr), 6)
             AS top1_share,
           round(CAST(sum(CASE WHEN ri <= 5 THEN cnt ELSE 0 END) AS BIGINT)
                 * 1.0 / any_value(nr), 6) AS top5_share,
           round(CAST(sum((2 * i - nk - 1) * cnt) AS BIGINT) * 1.0
                 / (CAST(any_value(nk) AS BIGINT) * any_value(nr)), 6) AS gini
    FROM r GROUP BY key_col ORDER BY key_col
    """,
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-planning observability: for each candidate join/aggregation
    key, report cardinality, the share of rows behind the hottest 1 and 5
    keys, and the Gini coefficient of the key-frequency distribution — the
    numbers that decide whether a key needs salting, AQE skew splitting,
    or is safe to hash-partition as-is (see skew_salted_join for the cure
    this op diagnoses).

    Gini comes from the rank formula Σ(2i−n−1)·c_i / (n·Σc) under an
    ascending-count order with key tiebreaks: an exact int64 numerator and
    one final division, bit-identical across engines (an entropy metric
    would be an order-dependent float sum — wrong tool for a parity-tested
    engine).

    Scale: each key profile is a groupBy with map-side combine — the
    shuffled rows are (key, count) pairs, not facts. The rank windows run
    per key_col over key-cardinality rows; at extreme cardinality swap the
    exact ranks for a CMS top-k plus a sampled Gini, same output shape.
    """
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    parts = [
        l.groupBy(F.col("l_suppkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("l_suppkey").alias("key_col"), "k", "cnt"),
        l.groupBy(F.col("l_partkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("l_partkey").alias("key_col"), "k", "cnt"),
        o.groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("o_custkey").alias("key_col"), "k", "cnt"),
    ]
    c = parts[0].unionAll(parts[1]).unionAll(parts[2])
    wc = Window.partitionBy("key_col")
    r = c.select(
        "key_col",
        "cnt",
        F.row_number().over(wc.orderBy("cnt", "k")).alias("i"),
        F.row_number().over(wc.orderBy(F.desc("cnt"), "k")).alias("ri"),
        F.count(F.lit(1)).over(wc).alias("nk"),
        F.sum("cnt").over(wc).alias("nr"),
    )
    return (
        r.groupBy("key_col")
        .agg(
            F.any_value("nk").alias("n_keys"),
            F.any_value("nr").alias("n_rows"),
            F.round(
                F.max(F.when(F.col("ri") == 1, F.col("cnt"))) * 1.0
                / F.any_value("nr"),
                6,
            ).alias("top1_share"),
            F.round(
                F.sum(F.when(F.col("ri") <= 5, F.col("cnt")).otherwise(0)) * 1.0
                / F.any_value("nr"),
                6,
            ).alias("top5_share"),
            F.round(
                F.sum((2 * F.col("i") - F.col("nk") - 1) * F.col("cnt")) * 1.0
                / (F.any_value("nk") * F.any_value("nr")),
                6,
            ).alias("gini"),
        )
        .orderBy("key_col")
    )


# ---------------------------------------------------------------------------
# Level-synchronous BFS with shortest-path counting
# ---------------------------------------------------------------------------

_BFS_HOPS = 4


@query(
    "graph_shortest_hops",
    oracle=f"""
    WITH RECURSIVE e AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS w
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2
    ), tot AS (SELECT count(*) AS n_edges, sum(w) AS total FROM e),
    he AS (SELECT e.src, e.dst FROM e, tot
           WHERE e.w * tot.n_edges > tot.total),
    w AS (
      SELECT (SELECT min(src) FROM he) AS node, 0 AS len
      UNION ALL
      SELECT he.dst, w.len + 1 FROM w JOIN he ON he.src = w.node
      WHERE w.len < {_BFS_HOPS}
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(min(len) AS BIGINT) AS dist,
           CAST(count(*) FILTER (WHERE len = md) AS BIGINT) AS shortest_paths
    FROM (SELECT node, len, min(len) OVER (PARTITION BY node) AS md FROM w)
    GROUP BY node ORDER BY node
    """,
)
def graph_shortest_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-synchronous BFS over the heavy-edge trade graph from its
    smallest source node: minimum hop distance to every reachable nation
    within {_BFS_HOPS} hops, plus the NUMBER of distinct shortest paths
    (walk counting — minimal-length walks cannot revisit a node, so walk
    counts at the minimal length are exactly shortest-path counts, which
    is what the oracle's recursive CTE enumerates row by row).

    Scale: the iterative frontier expansion is the Pregel/GraphFrames
    pattern expressed as {_BFS_HOPS} broadcast joins on the aggregated
    edge list — per level the frontier is (node, path_count) AGGREGATED,
    so state stays |V|-bounded regardless of how many walks exist. The
    only fact-sized work is the one-time star join building the edges;
    on a billion-edge graph each level becomes one shuffled join+groupBy,
    i.e. cost = diameter × (join + agg), the standard distributed-BFS
    bound.
    """
    he = _heavy_trade_edges(spark, sf_dir).select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
    ).cache()
    seed = he.agg(F.min("src")).first()[0]
    frontier = spark.createDataFrame([(int(seed), 1)], "node bigint, cnt bigint")
    levels = [frontier.select("node", "cnt", F.lit(0).alias("len"))]
    for depth in range(1, _BFS_HOPS + 1):
        frontier = (
            frontier.join(F.broadcast(he), frontier.node == he.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("cnt").alias("cnt"))
        )
        levels.append(frontier.select("node", "cnt", F.lit(depth).alias("len")))
    walks = levels[0]
    for lv in levels[1:]:
        walks = walks.unionAll(lv)
    md = walks.withColumn(
        "md", F.min("len").over(Window.partitionBy("node"))
    )
    return (
        md.groupBy("node")
        .agg(
            F.min("len").cast("bigint").alias("dist"),
            F.sum(F.when(F.col("len") == F.col("md"), F.col("cnt"))).alias(
                "shortest_paths"
            ),
        )
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# Synchronous min-label propagation (community detection)
# ---------------------------------------------------------------------------

_LP_ROUNDS = 3

# MATERIALIZED throughout for the same reason as _KCORE_ITER_SQL below:
# DuckDB inlines plain CTEs, and each propagation round references the
# previous one twice, so the star join re-expands 2^rounds times (372 s +
# a disk-filling spill at sf0.1 in the round-6 parity sweep).
_LP_EDGE_SQL = """
    e AS MATERIALIZED (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS w
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2
    ), tot AS MATERIALIZED (SELECT count(*) AS n_edges, sum(w) AS total
                            FROM e),
    he AS MATERIALIZED (SELECT e.src, e.dst FROM e, tot
           WHERE e.w * tot.n_edges > tot.total),
    und AS MATERIALIZED (SELECT src AS a, dst AS b FROM he
            UNION SELECT dst, src FROM he),
    l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lbl FROM und)
"""

_LP_ITER_SQL = "".join(
    f""",
    l{i} AS MATERIALIZED (
      SELECT n.node, least(n.lbl, coalesce(min(p.lbl), n.lbl)) AS lbl
      FROM l{i - 1} n
      LEFT JOIN und u ON u.a = n.node
      LEFT JOIN l{i - 1} p ON p.node = u.b
      GROUP BY n.node, n.lbl
    )"""
    for i in range(1, _LP_ROUNDS + 1)
)


@query(
    "label_propagation_communities",
    oracle=f"""
    WITH {_LP_EDGE_SQL} {_LP_ITER_SQL}
    SELECT CAST(node AS BIGINT) AS node, CAST(lbl AS BIGINT) AS community,
           CAST(count(*) OVER (PARTITION BY lbl) AS BIGINT)
             AS community_size
    FROM l{_LP_ROUNDS} ORDER BY node
    """,
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by SYNCHRONOUS min-label propagation over the
    undirected heavy-trade graph: every node starts with its own id as
    label and, for {_LP_ROUNDS} rounds, adopts the minimum label in its
    closed neighborhood — all nodes update from the same previous-round
    snapshot, so the fixed round count is deterministic and the oracle
    replays it as {_LP_ROUNDS} unrolled CTE iterations (async/randomized
    LPA variants trade that determinism for speed; the synchronous form
    is the one a correctness-checked pipeline runs).

    Scale: the Pregel shape — each round is one join of the |V|-sized
    label frame against the aggregated edge list plus a groupBy(node)
    min; cost = rounds × (join + agg), state never exceeds |V|. The
    fact-sized star join builds edges once (same construction as
    graph_shortest_hops); after that every frame is graph-dimension-sized.
    """
    from iceberg_classifier_spark.plans.advanced2 import _heavy_trade_edges

    he = _heavy_trade_edges(spark, sf_dir).select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
    )
    und = (
        he.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(he.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .cache()
    )
    labels = und.select(F.col("a").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    for _ in range(_LP_ROUNDS):
        neigh = (
            und.join(F.broadcast(labels), und.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("lbl").alias("nmin"))
        )
        labels = (
            labels.join(F.broadcast(neigh), "node", "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nmin"), F.col("lbl"))
                ).alias("lbl"),
            )
        )
    out = labels.withColumn(
        "community_size",
        F.count(F.lit(1)).over(Window.partitionBy("lbl")).cast("bigint"),
    )
    return out.select(
        "node", F.col("lbl").alias("community"), "community_size"
    ).orderBy("node")


# ---------------------------------------------------------------------------
# k-core decomposition by synchronous peeling
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 3

# MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, so a_i
# referencing a_{i-1} twice re-expands the whole chain 2^i times — at
# sf0.1 the re-inlined star join spilled >75 GB of temp and died (found
# by the round-6 sf0.1 parity sweep); materialized, each round runs once.
_KCORE_ITER_SQL = "".join(
    f""",
    a{i} AS MATERIALIZED (
      SELECT u.a AS node, CAST(count(*) AS BIGINT) AS deg
      FROM und u
      JOIN a{i - 1} x ON x.node = u.a
      JOIN a{i - 1} y ON y.node = u.b
      GROUP BY 1 HAVING count(*) >= {_KCORE_K}
    )"""
    for i in range(1, _KCORE_ROUNDS + 1)
)


@query(
    "kcore_trade_graph",
    oracle=f"""
    WITH e AS MATERIALIZED (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS w
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2
    ), tot AS MATERIALIZED (SELECT count(*) AS n_edges, sum(w) AS total
                            FROM e),
    he AS MATERIALIZED (SELECT e.src, e.dst FROM e, tot
           WHERE e.w * tot.n_edges > tot.total),
    und AS MATERIALIZED (SELECT src AS a, dst AS b FROM he
            UNION SELECT dst, src FROM he),
    a0 AS MATERIALIZED (SELECT DISTINCT a AS node, CAST(0 AS BIGINT) AS deg
                        FROM und)
    {_KCORE_ITER_SQL}
    SELECT CAST(node AS BIGINT) AS node, deg AS core_degree
    FROM a{_KCORE_ROUNDS} ORDER BY node
    """,
)
def kcore_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_KCORE_K}-core of the undirected heavy-trade graph by SYNCHRONOUS
    peeling: every round recomputes each surviving node's degree within
    the surviving set and drops nodes below k — after {_KCORE_ROUNDS}
    rounds the report lists the remaining core members with their
    within-core degree. The fixed synchronous round count makes the
    intermediate state deterministic (the oracle replays it as unrolled
    CTEs); full convergence just runs the same round until no node drops
    — the standard distributed k-core (Montresor et al.) shape.

    Scale: each round is one self-joined degree count on the
    edge-dimension frame — cost = rounds × (join + agg) on aggregated
    edges, never on fact rows; the star join builds edges once.
    """
    from iceberg_classifier_spark.plans.advanced2 import _heavy_trade_edges

    he = _heavy_trade_edges(spark, sf_dir).select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
    )
    und = (
        he.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(he.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .cache()
    )
    active = und.select(F.col("a").alias("node")).distinct()
    surv = None
    for _ in range(_KCORE_ROUNDS):
        x = active.select(F.col("node").alias("xa"))
        y = active.select(F.col("node").alias("yb"))
        surv = (
            und.join(F.broadcast(x), und.a == F.col("xa"))
            .join(F.broadcast(y), und.b == F.col("yb"))
            .groupBy(F.col("a").alias("node"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
        )
        active = surv.select("node")
    return surv.select("node", F.col("deg").alias("core_degree")).orderBy("node")
