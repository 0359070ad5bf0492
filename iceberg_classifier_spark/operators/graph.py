"""Distributed graph operators.

Connected components via alternating large-star / small-star (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14): each round
rewires edges toward per-neighborhood minima, halving component diameter
roughly every two rounds, so a path of length n converges in O(log n)
rounds where plain min-label propagation needs O(n). The fixed point is a
set of stars whose centers are the component minima.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(e: DataFrame) -> DataFrame:
    return e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )


def _canon(pairs: DataFrame, x: str, y: str) -> DataFrame:
    return (
        pairs.select(
            F.least(F.col(x), F.col(y)).alias("a"),
            F.greatest(F.col(x), F.col(y)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components(
    edges: DataFrame, max_rounds: int = 16
) -> tuple[DataFrame, int]:
    """Label every node of the undirected graph ``edges`` (columns a, b)
    with the minimum node id of its connected component.

    Returns ``(labels, rounds)`` where labels has columns (node, lbl) and
    rounds is the number of large+small-star rounds executed before the
    edge set stabilized.

    Per round: two groupBy-min aggregations and two equi-joins over the
    current edge frame — every shuffle key is a node id and no frame ever
    exceeds the (shrinking) edge list; the convergence probe is a 4-scalar
    aggregate, not a collect. Each round's edge frame is eagerly
    localCheckpoint-ed: a round references its predecessor ~16× through
    the star expansions, so without truncating the LOGICAL lineage the
    plan tree (and Catalyst's canonicalization time) grows 16^rounds even
    though the data itself is cached — the standard iterative-graph
    checkpoint pattern (on a cluster, swap localCheckpoint for a reliable
    checkpoint dir to survive executor loss).
    """
    E = _canon(edges, "a", "b").localCheckpoint(eager=True)
    nodes = (
        E.select(F.col("a").alias("node"))
        .unionAll(E.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_probe = None
    rounds = 0
    for i in range(max_rounds):
        # large-star: every neighbor v > u links to u's neighborhood min
        sym = _sym(E)
        mn = sym.groupBy("u").agg(F.min("v").alias("mv"))
        mn = mn.select("u", F.least("mv", F.col("u")).alias("m"))
        large = _canon(
            sym.join(mn, "u").where(F.col("v") > F.col("u")), "v", "m"
        )
        # small-star: every neighbor v < u (and u itself) links to the min
        sym1 = _sym(large)
        lo = sym1.where(F.col("v") < F.col("u"))
        mn1 = lo.groupBy("u").agg(F.min("v").alias("m"))
        small = lo.join(mn1, "u").select(F.col("v").alias("x"), "m").unionAll(
            mn1.select(F.col("u").alias("x"), "m")
        )
        E = _canon(small, "x", "m").localCheckpoint(eager=True)
        probe = tuple(
            E.agg(
                F.count(F.lit(1)),
                F.sum("a"),
                F.sum("b"),
                F.sum(F.col("a") * 1_000_003 + F.col("b")),
            ).first()
        )
        rounds = i + 1
        if probe == prev_probe:
            break
        prev_probe = probe
    # at the fixed point E is a union of stars centered on component minima
    centers = _sym(E).groupBy("u").agg(F.min("v").alias("mv"))
    labels = (
        nodes.join(centers, nodes.node == centers.u, "left")
        .select("node", F.least("node", F.coalesce("mv", "node")).alias("lbl"))
    )
    return labels, rounds
