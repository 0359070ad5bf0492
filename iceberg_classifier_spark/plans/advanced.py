"""Advanced analytics round: graph motif search, Python UDTF surface,
theta-style KMV set-operation sketches, and dynamic-time-warping series
distance.

These close the last backlog items from SURVEY §7: pattern queries that
GraphFrames popularised (motif finding as relational self-joins), the
PySpark 4 user-defined *table* function API, mergeable distinct-count
sketches that support union/intersection algebra (the theta-sketch
capability, built portably so a SQL oracle can verify the estimates
bit-for-bit), and a classic non-SQL dynamic-programming kernel (DTW)
expressed as a per-pair vectorized UDF — with an exact anti-diagonal
recursive-CTE oracle proving the SQL engine can check even DP outputs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.functions import text as T
from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_BIG = 1 << 50  # DP sentinel, far above any reachable path cost


# ---------------------------------------------------------------------------
# Graph motif finding (GraphFrames-style) as relational self-joins
# ---------------------------------------------------------------------------

@query(
    "motif_trade_triangles",
    oracle="""
    WITH e AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS w
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ), tot AS (
      SELECT count(*) AS n_edges, sum(w) AS total FROM e
    ), he AS (  -- heavy edges: strictly above the mean weight (exact integers)
      SELECT e.src, e.dst, e.w FROM e, tot WHERE e.w * tot.n_edges > tot.total
    )
    SELECT CAST(e1.src AS BIGINT) AS a, CAST(e1.dst AS BIGINT) AS b,
           CAST(e2.dst AS BIGINT) AS c,
           CAST((e1.w + e2.w + e3.w + 50) // 100 AS DOUBLE) / 100 AS cycle_value
    FROM he e1
    JOIN he e2 ON e1.dst = e2.src
    JOIN he e3 ON e2.dst = e3.src AND e3.dst = e1.src
    WHERE e1.src < e1.dst AND e1.src < e2.dst
    ORDER BY a, b, c
    """,
)
def motif_trade_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphFrames-style motif query ``(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)``
    over the nation-level trade graph: edge ``buyer_nation -> supplier_nation``
    weighted by revenue, keep above-average edges, enumerate directed cyclic
    triangles (canonical rotation: ``a`` is the smallest node, both cycle
    orientations kept as distinct motifs).

    Scale: motif finding compiles to self-joins on the EDGE LIST, not the
    fact table — the only big shuffle is the 4-way star join aggregating
    100 TB of lineitem down to |nations|² edge rows; the triangle enumeration
    then runs on a broadcast-sized table (two broadcast hash joins, no
    exchange). Edge weights are exact integer cents×pct so the above-average
    cut is order-independent (integer cross-multiply ``w·n > total`` — no
    float mean at the membership boundary; at extreme scale swap to a
    decimal/avg compare to dodge int64 overflow).
    """
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
    tot = e.agg(
        F.count(F.lit(1)).alias("n_edges"), F.sum("w").alias("total")
    )
    he = (
        e.crossJoin(F.broadcast(tot))
        .where(F.col("w") * F.col("n_edges") > F.col("total"))
        .select("src", "dst", "w")
    )
    e1, e2, e3 = he.alias("e1"), F.broadcast(he.alias("e2")), F.broadcast(he.alias("e3"))
    return (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e2.dst") == F.col("e3.src"))
            & (F.col("e3.dst") == F.col("e1.src")),
        )
        .where(
            (F.col("e1.src") < F.col("e1.dst"))
            & (F.col("e1.src") < F.col("e2.dst"))
        )
        .select(
            F.col("e1.src").cast("bigint").alias("a"),
            F.col("e1.dst").cast("bigint").alias("b"),
            F.col("e2.dst").cast("bigint").alias("c"),
            # round(s/10000, 2) HALF_UP done in exact int64 — (s+50) div 100
            # is the rounded value in cents; the final /100 maps an exact
            # integer to the identical double on every engine (no x.xx5
            # double boundary, the bug the sf0.01 oracle caught at r4).
            (
                ((F.col("e1.w") + F.col("e2.w") + F.col("e3.w") + F.lit(50)))
                .cast("bigint")
            ).alias("_s"),
        )
        .select(
            "a",
            "b",
            "c",
            (F.expr("_s div 100").cast("double") / 100).alias("cycle_value"),
        )
        .orderBy("a", "b", "c")
    )


# ---------------------------------------------------------------------------
# Python UDTF surface (PySpark 4): sliding-window token chunker
# ---------------------------------------------------------------------------

_CHUNK, _STRIDE = 32, 16


@query(
    "udtf_token_chunks",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    c AS (SELECT doc_id, unnest(generate_series(1, len(toks), {_STRIDE})) AS s,
                 len(toks) AS n, toks
          FROM t)
    SELECT doc_id, (s - 1) // {_STRIDE} AS chunk_idx,
           array_to_string(toks[s : least(s + {_CHUNK} - 1, n)], ' ') AS chunk,
           least(s + {_CHUNK} - 1, n) - s + 1 AS chunk_tokens
    FROM c ORDER BY doc_id, chunk_idx
    """,
)
def udtf_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM training-data chunker as a Python UDTF (PySpark 4 table-function
    API): each document expands to overlapping 32-token windows at stride 16
    via ``LATERAL chunk_tokens(text)`` — the one-row-in / many-rows-out shape
    UDTFs exist for.

    Scale: the UDTF runs per-row with no shuffle (a lateral join is a
    map-side generate); chunking 100 TB of documents is embarrassingly
    parallel and the output inherits the input partitioning. The same logic
    is expressible with ``sequence``+``transform`` JVM-side (faster); the
    UDTF form is the API-surface demonstration, batched through Arrow.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: bigint, chunk: string, chunk_tokens: bigint")
    class ChunkTokens:
        def eval(self, text):
            if text is None:
                return
            toks = text.split(" ")
            n = len(toks)
            for idx, st in enumerate(range(0, n, _STRIDE)):
                piece = toks[st : st + _CHUNK]
                yield idx, " ".join(piece), len(piece)

    spark.udtf.register("chunk_tokens", ChunkTokens)
    load(spark, sf_dir, "documents").createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk, c.chunk_tokens
        FROM docs_for_udtf d, LATERAL chunk_tokens(d.text) c
        ORDER BY d.doc_id, c.chunk_idx
        """
    )


# ---------------------------------------------------------------------------
# Theta-sketch-style KMV set operations (portable hash → SQL-checkable)
# ---------------------------------------------------------------------------

_K = 128  # KMV sketch size


@query(
    "theta_sketch_setops",
    oracle=f"""
    WITH du AS (SELECT DISTINCT o_orderpriority AS p, o_custkey AS k FROM orders),
    h AS (SELECT p, k,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(generate_series(1, 32),
                i -> ord(substr(md5(CAST(k AS VARCHAR)), CAST(i AS INTEGER), 1)))),
              (acc, c) -> (acc * {T.FP_BASE} + c) % {T.FP_MOD}) * 1.0
              / {T.FP_MOD} AS u
          FROM du),
    sk AS (SELECT p, k, u FROM h
           QUALIFY row_number() OVER (PARTITION BY p ORDER BY u, k) <= {_K}),
    st AS (SELECT p, count(*) AS ns, max(u) AS kth FROM sk GROUP BY p),
    est AS (SELECT p, CASE WHEN ns < {_K} THEN 1.0 ELSE kth END AS theta,
                   CASE WHEN ns < {_K} THEN CAST(ns AS DOUBLE)
                        ELSE ({_K} - 1) / kth END AS est
            FROM st),
    pairs AS (SELECT a.p AS pa, b.p AS pb, least(a.theta, b.theta) AS tmin,
                     a.est AS ea, b.est AS eb
              FROM est a JOIN est b ON a.p < b.p),
    us AS (SELECT pr.pa, pr.pb, s.k, min(s.u) AS u
           FROM pairs pr JOIN sk s ON s.p IN (pr.pa, pr.pb) GROUP BY 1, 2, 3),
    ur AS (SELECT pa, pb, u,
                  row_number() OVER (PARTITION BY pa, pb ORDER BY u, k) AS rn,
                  count(*) OVER (PARTITION BY pa, pb) AS nu
           FROM us),
    ue AS (SELECT pa, pb,
                  CASE WHEN any_value(nu) < {_K} THEN CAST(any_value(nu) AS DOUBLE)
                       ELSE ({_K} - 1) / max(CASE WHEN rn = {_K} THEN u END)
                  END AS est_union
           FROM ur WHERE rn <= {_K} GROUP BY 1, 2),
    com AS (SELECT a.p AS pa2, b.p AS pb2, a.u AS u
            FROM sk a JOIN sk b ON a.k = b.k AND a.p < b.p),
    ie AS (SELECT pr.pa, pr.pb,
                  count(CASE WHEN com.u < pr.tmin THEN 1 END)
                    / any_value(pr.tmin) AS est_inter
           FROM pairs pr
           LEFT JOIN com ON com.pa2 = pr.pa AND com.pb2 = pr.pb
           GROUP BY 1, 2),
    exi AS (SELECT a.p AS pa, b.p AS pb, count(*) AS exact_inter
            FROM du a JOIN du b ON a.k = b.k AND a.p < b.p GROUP BY 1, 2),
    exn AS (SELECT p, count(*) AS n FROM du GROUP BY p)
    SELECT pr.pa, pr.pb, round(pr.ea, 6) AS est_a, round(pr.eb, 6) AS est_b,
           round(ue.est_union, 6) AS est_union,
           round(ie.est_inter, 6) AS est_inter,
           na.n + nb.n - exi.exact_inter AS exact_union, exi.exact_inter
    FROM pairs pr JOIN ue USING (pa, pb) JOIN ie USING (pa, pb)
    JOIN exi ON exi.pa = pr.pa AND exi.pb = pr.pb
    JOIN exn na ON na.p = pr.pa JOIN exn nb ON nb.p = pr.pb
    ORDER BY pa, pb
    """,
)
def theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style set algebra over distinct customers per order
    priority: a KMV (k minimum values) sketch per set, then pairwise UNION
    and INTERSECTION cardinality estimates next to the exact answers.
    Union = k smallest of the merged samples; intersection = samples present
    in both sketches below theta_min, scaled by 1/theta_min; sets smaller
    than k degrade to exact (theta=1).

    The hash is the portable md5→polynomial-fold unit-interval value, so the
    oracle rebuilds the IDENTICAL sketches in SQL and the estimates match
    bit-for-bit at 6dp — a sketch op with a full value oracle, not rows-only.

    Scale: KMV sketches are mergeable — per-partition top-k partials merge
    associatively, so the 100 TB pass is one map-side combine per set (the
    window formulation here is the small-demo plan; the production shape is
    an aggregator, same numbers). Set algebra then runs on k-row sketches:
    union/intersection of petabyte key sets costs O(k) per pair.
    """
    orders = load(spark, sf_dir, "orders")
    du = orders.select(
        F.col("o_orderpriority").alias("p"), F.col("o_custkey").alias("k")
    ).distinct()
    u = (
        T.rolling_fingerprint(F.md5(F.col("k").cast("string"))) * 1.0
    ) / F.lit(float(T.FP_MOD))
    h = du.withColumn("u", u)
    sk = (
        h.withColumn(
            "rn", F.row_number().over(Window.partitionBy("p").orderBy("u", "k"))
        )
        .where(F.col("rn") <= _K)
        .drop("rn")
    )
    st = sk.groupBy("p").agg(F.count(F.lit(1)).alias("ns"), F.max("u").alias("kth"))
    est = st.select(
        "p",
        F.when(F.col("ns") < _K, F.lit(1.0)).otherwise(F.col("kth")).alias("theta"),
        F.when(F.col("ns") < _K, F.col("ns").cast("double"))
        .otherwise(F.lit(_K - 1) / F.col("kth"))
        .alias("est"),
    )
    a, b = est.alias("a"), est.alias("b")
    pairs = a.join(F.broadcast(b), F.col("a.p") < F.col("b.p")).select(
        F.col("a.p").alias("pa"),
        F.col("b.p").alias("pb"),
        F.least(F.col("a.theta"), F.col("b.theta")).alias("tmin"),
        F.col("a.est").alias("ea"),
        F.col("b.est").alias("eb"),
    )
    # union sketch: merged samples (dedup by key), k smallest
    us = (
        F.broadcast(pairs)
        .join(sk, (sk.p == F.col("pa")) | (sk.p == F.col("pb")))
        .groupBy("pa", "pb", "k")
        .agg(F.min("u").alias("u"))
    )
    wu = Window.partitionBy("pa", "pb").orderBy("u", "k")
    ur = us.select(
        "pa",
        "pb",
        "u",
        F.row_number().over(wu).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("pa", "pb")).alias("nu"),
    )
    ue = (
        ur.where(F.col("rn") <= _K)
        .groupBy("pa", "pb")
        .agg(
            F.when(F.any_value("nu") < _K, F.any_value("nu").cast("double"))
            .otherwise(
                F.lit(_K - 1) / F.max(F.when(F.col("rn") == _K, F.col("u")))
            )
            .alias("est_union")
        )
    )
    ska, skb = sk.alias("sa"), sk.alias("sb")
    com = ska.join(
        skb, (F.col("sa.k") == F.col("sb.k")) & (F.col("sa.p") < F.col("sb.p"))
    ).select(
        F.col("sa.p").alias("pa2"), F.col("sb.p").alias("pb2"), F.col("sa.u").alias("cu")
    )
    ie = (
        pairs.join(
            com,
            (F.col("pa2") == F.col("pa")) & (F.col("pb2") == F.col("pb")),
            "left",
        )
        .groupBy("pa", "pb")
        .agg(
            (
                F.sum(
                    F.when(F.col("cu") < F.col("tmin"), F.lit(1)).otherwise(F.lit(0))
                )
                / F.any_value("tmin")
            ).alias("est_inter")
        )
    )
    dua, dub = du.alias("da"), du.alias("db")
    exi = dua.join(
        dub, (F.col("da.k") == F.col("db.k")) & (F.col("da.p") < F.col("db.p"))
    ).groupBy(
        F.col("da.p").alias("pa"), F.col("db.p").alias("pb")
    ).agg(F.count(F.lit(1)).alias("exact_inter"))
    exn = du.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    na, nb = exn.alias("na"), exn.alias("nb")
    return (
        pairs.join(ue, ["pa", "pb"])
        .join(ie, ["pa", "pb"])
        .join(exi, ["pa", "pb"])
        .join(F.broadcast(na), F.col("na.p") == F.col("pa"))
        .join(F.broadcast(nb), F.col("nb.p") == F.col("pb"))
        .select(
            "pa",
            "pb",
            F.round("ea", 6).alias("est_a"),
            F.round("eb", 6).alias("est_b"),
            F.round("est_union", 6).alias("est_union"),
            F.round("est_inter", 6).alias("est_inter"),
            (F.col("na.n") + F.col("nb.n") - F.col("exact_inter")).alias(
                "exact_union"
            ),
            "exact_inter",
        )
        .orderBy("pa", "pb")
    )


# ---------------------------------------------------------------------------
# Dynamic time warping — per-pair DP kernel with a recursive-CTE oracle
# ---------------------------------------------------------------------------

@query(
    "dtw_event_series",
    oracle=f"""
    WITH RECURSIVE
    s AS (
      SELECT user_id, list(cnt ORDER BY d) AS v
      FROM (SELECT user_id, date_trunc('day', ts) AS d, count(*) AS cnt
            FROM events WHERE user_id < 10 GROUP BY 1, 2)
      GROUP BY user_id
    ),
    p AS (
      SELECT a.user_id AS ua, b.user_id AS ub, a.v AS va, b.v AS vb,
             len(a.v) AS n, len(b.v) AS m
      FROM s a JOIN s b ON a.user_id < b.user_id
    ),
    dp AS (
      SELECT ua, ub, va, vb, n, m, 2 AS d,
             [abs(va[1] - vb[1])] AS cur,
             CAST(NULL AS BIGINT[]) AS prev
      FROM p
      UNION ALL
      SELECT ua, ub, va, vb, n, m, d + 1,
        list_transform(generate_series(greatest(1, d + 1 - m), least(n, d)),
          i -> abs(va[i] - vb[d + 1 - i]) + least(
            coalesce(CASE WHEN i - 1 >= greatest(1, d - m)
                          AND i - 1 <= least(n, d - 1)
                     THEN cur[i - 1 - greatest(1, d - m) + 1] END, {_BIG}),
            coalesce(CASE WHEN i >= greatest(1, d - m)
                          AND i <= least(n, d - 1)
                     THEN cur[i - greatest(1, d - m) + 1] END, {_BIG}),
            coalesce(CASE WHEN i - 1 >= greatest(1, d - 1 - m)
                          AND i - 1 <= least(n, d - 2)
                     THEN prev[i - 1 - greatest(1, d - 1 - m) + 1] END, {_BIG}))),
        cur
      FROM dp WHERE d < n + m
    )
    SELECT ua, ub, cur[1] AS dtw_cost,
           CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m
    FROM dp WHERE d = n + m ORDER BY ua, ub
    """,
)
def dtw_event_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-time-warping distance between users' daily event-count
    series (|a-b| local cost, unit steps): the classic alignment measure for
    comparing behavioral time series that exact SQL engines can't express
    directly — the oracle proves ours CAN, by marching the DP anti-diagonal
    frontier through a recursive CTE (each diagonal depends only on the two
    previous ones, carried as list columns).

    Scale: series build is one groupBy over the fact table (map-side
    combined daily counts, then one shuffle per user); pairing is a blocked
    self-join (here a 10-user demo block → 45 pairs) and each O(n·m) DP runs
    inside an Arrow-batched pandas UDF — per-pair local compute with no
    further shuffle, so a 100 TB deployment parallelizes over pairs and is
    bounded by the pair-generation policy (LSH/segment blocking), not the
    kernel. Integer counts → integer costs → bit-exact across engines.
    """
    ev = load(spark, sf_dir, "events").where(F.col("user_id") < 10)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    series = daily.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "cnt"))), lambda s: s.cnt
        ).alias("v")
    )

    @F.pandas_udf("long")
    def dtw_cost(va: pd.Series, vb: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for a, b in zip(va, vb):
            a = np.asarray(a, dtype=np.int64)
            b = np.asarray(b, dtype=np.int64)
            n, m = len(a), len(b)
            D = np.full((n + 1, m + 1), _BIG, dtype=np.int64)
            D[0, 0] = 0
            for i in range(1, n + 1):
                cost = np.abs(a[i - 1] - b)
                for j in range(1, m + 1):
                    D[i, j] = cost[j - 1] + min(
                        D[i - 1, j], D[i, j - 1], D[i - 1, j - 1]
                    )
            out.append(int(D[n, m]))
        return pd.Series(out)

    sa, sb = series.alias("a"), F.broadcast(series.alias("b"))
    return (
        sa.join(sb, F.col("a.user_id") < F.col("b.user_id"))
        .select(
            F.col("a.user_id").alias("ua"),
            F.col("b.user_id").alias("ub"),
            dtw_cost(F.col("a.v"), F.col("b.v")).alias("dtw_cost"),
            F.size("a.v").cast("bigint").alias("n"),
            F.size("b.v").cast("bigint").alias("m"),
        )
        .orderBy("ua", "ub")
    )
