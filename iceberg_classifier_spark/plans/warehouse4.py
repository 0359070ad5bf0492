"""Warehouse wave 4: incremental materialized-view maintenance, leave-one-
out target encoding, and skip-gram negative-sampling pair generation.

Numeric discipline as everywhere: exact integer cents/ppm feed every
output; `div` only on non-negative quantities.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


@query(
    "incremental_matview_maintenance",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS st, {_CENTS} AS cents
      FROM orders
    ), cdc AS (
      -- deterministic CDC batch: 10% price corrections, 1% new orders
      SELECT k, st, cents + 500 AS cents, 'U' AS op FROM base WHERE k % 10 = 0
      UNION ALL
      SELECT k + 100000000, 'O' AS st, cents, 'I' AS op
      FROM base WHERE k % 100 = 0
    ), mv0 AS (
      SELECT st, CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
      FROM base GROUP BY 1
    ), delta AS (
      -- per-group NET deltas: retract the old row image, insert the new
      SELECT st, CAST(sum(dn) AS BIGINT) AS dn, CAST(sum(ds) AS BIGINT) AS ds
      FROM (
        SELECT b.st, -1 AS dn, -b.cents AS ds
        FROM cdc c JOIN base b ON b.k = c.k WHERE c.op = 'U'
        UNION ALL
        SELECT c.st, 1 AS dn, c.cents AS ds FROM cdc c
      ) GROUP BY 1
    )
    SELECT coalesce(m.st, d.st) AS status,
           CAST(coalesce(m.n, 0) + coalesce(d.dn, 0) AS BIGINT) AS n_orders,
           round((coalesce(m.s, 0) + coalesce(d.ds, 0)) / 100.0, 2)
             AS total_price
    FROM mv0 m FULL OUTER JOIN delta d ON m.st = d.st
    ORDER BY status
    """,
)
def incremental_matview_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a per-status revenue
    view is kept current under a CDC batch WITHOUT recomputing from the
    fact table — each change contributes a retraction of its old row
    image and an insertion of its new one, the deltas aggregate to
    per-group (Δcount, Δsum), and the view update is a |groups|-row
    merge. The oracle replays the identical delta algebra, and because
    counts/sums form an abelian group the incremental state equals a full
    recompute by construction (the property that makes streaming/Delta
    MVs correct).

    Scale: the CDC batch joins the base ONLY to fetch old row images
    (key-equi-join, broadcast when the batch is small); the view itself
    never rescans the fact table — maintenance cost is O(|batch| +
    |groups|), the entire point versus the O(|fact|) recompute.
    """
    base = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.expr(_CENTS).alias("cents"),
    )
    upd = base.where(F.col("k") % 10 == 0).select(
        "k", "st", (F.col("cents") + 500).alias("cents"), F.lit("U").alias("op")
    )
    ins = base.where(F.col("k") % 100 == 0).select(
        (F.col("k") + 100000000).alias("k"),
        F.lit("O").alias("st"),
        "cents",
        F.lit("I").alias("op"),
    )
    cdc = upd.unionByName(ins)
    mv0 = base.groupBy("st").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    old_images = (
        cdc.where(F.col("op") == "U")
        .select("k")
        .join(base, "k")
        .select("st", F.lit(-1).alias("dn"), (-F.col("cents")).alias("ds"))
    )
    new_images = cdc.select("st", F.lit(1).alias("dn"), F.col("cents").alias("ds"))
    delta = (
        old_images.unionByName(new_images)
        .groupBy("st")
        .agg(
            F.sum("dn").cast("bigint").alias("dn"),
            F.sum("ds").cast("bigint").alias("ds"),
        )
    )
    return (
        mv0.join(delta, "st", "full_outer")
        .select(
            F.col("st").alias("status"),
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0)))
            .cast("bigint")
            .alias("n_orders"),
            F.round(
                (F.coalesce("s", F.lit(0)) + F.coalesce("ds", F.lit(0))) / 100.0,
                2,
            ).alias("total_price"),
        )
        .orderBy("status")
    )


_TE_M = 20  # smoothing pseudo-count


@query(
    "loo_target_encoding",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey AS k, c_mktsegment AS seg,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      FROM orders JOIN customer ON c_custkey = o_custkey
    ), stats AS (
      SELECT seg, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s
      FROM o GROUP BY 1
    ), prior AS (
      SELECT CAST(sum(s) AS BIGINT) AS gs, CAST(sum(n) AS BIGINT) AS gn
      FROM stats
    ), enc AS (
      -- numerator ~ s * gn * 1e6 crossed 2^63 at the sf10 decade:
      -- widen to HUGEINT (Spark side: DECIMAL(38,0)) before multiplying
      SELECT o.k, o.seg, o.y,
             CAST((CAST(st.s - o.y AS HUGEINT) * prior.gn
                   + {_TE_M} * prior.gs) * 1000000
                  // (CAST(st.n - 1 + {_TE_M} AS HUGEINT) * prior.gn)
                  AS BIGINT) AS enc_ppm
      FROM o JOIN stats st ON st.seg = o.seg CROSS JOIN prior
    )
    SELECT seg, CAST(count(*) AS BIGINT) AS n,
           CAST(min(enc_ppm) AS BIGINT) AS enc_min_ppm,
           CAST(max(enc_ppm) AS BIGINT) AS enc_max_ppm,
           CAST(sum(enc_ppm) AS BIGINT) AS enc_sum_ppm
    FROM enc GROUP BY 1 ORDER BY 1
    """,
)
def loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing: each row's
    categorical feature (market segment) becomes the urgency rate of its
    OWN segment computed WITHOUT the row itself — enc = (s − y + m·prior)
    / (n − 1 + m) — the standard high-cardinality encoding that avoids
    target leakage. Encodings are exact integer ppm (the prior folds in
    as integer cross-products, one `div`), so per-segment min/max/sum of
    the row-level encodings are bit-identical across engines — the
    aggregate fingerprint value-checks every row's encoding.

    Scale: one map-combinable stats pass, a 1-row prior broadcast, and a
    broadcast join back — the encode itself is map-only; no per-row
    state, no shuffle of the fact beyond the stats aggregation.
    """
    o = (
        load(spark, sf_dir, "orders")
        .join(
            F.broadcast(load(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            (F.col("o_orderpriority") == "1-URGENT").cast("bigint").alias("y"),
        )
    )
    stats = o.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
    )
    prior = stats.agg(
        F.sum("s").cast("bigint").alias("gs"),
        F.sum("n").cast("bigint").alias("gn"),
    )
    enc = (
        o.join(F.broadcast(stats), "seg")
        .crossJoin(F.broadcast(prior))
        .select(
            "seg",
            F.expr(
                f"CAST((CAST(s - y AS DECIMAL(38,0)) * gn"
                f" + {_TE_M} * gs) * 1000000"
                f" div (CAST(n - 1 + {_TE_M} AS DECIMAL(38,0)) * gn)"
                " AS BIGINT)"
            ).alias("enc_ppm"),
        )
    )
    return (
        enc.groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("enc_ppm").cast("bigint").alias("enc_min_ppm"),
            F.max("enc_ppm").cast("bigint").alias("enc_max_ppm"),
            F.sum("enc_ppm").cast("bigint").alias("enc_sum_ppm"),
        )
        .orderBy("seg")
    )


_NS_K = 2  # negatives per positive
_NS_WINDOW = 2  # skip-gram context window


@query(
    "negative_sampling_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
      WHERE doc_id % 20 = 0
    ), vocab AS (
      SELECT word,
             row_number() OVER (ORDER BY count(*) DESC, word) - 1 AS vid
      FROM (SELECT unnest(w) AS word FROM toks) GROUP BY word
    ), vn AS (SELECT count(*) AS vn FROM vocab),
    idx AS (
      SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM toks
    ), pos AS (
      SELECT t.doc_id,
             t.w[t.i] AS center, t.w[t.i + o.o] AS context,
             (t.doc_id * 1000 + t.i) * 10 + o.o + {_NS_WINDOW} AS pair_id
      FROM idx t,
           (SELECT unnest([-{_NS_WINDOW}, -1, 1, {_NS_WINDOW}]) AS o) o
      WHERE t.i + o.o >= 1 AND t.i + o.o <= len(t.w)
    ), neg AS (
      SELECT p.center, p.context,
             -- pair_id * 2654435761 crossed 2^63 at the sf10 decade;
             -- reduce both factors mod 2^31 first (same value, exact)
             (((p.pair_id % 2147483648) * 506952113 + g.g * 40503)
               % 2147483648)
               % (SELECT vn FROM vn) AS nvid
      FROM pos p, generate_series(1, {_NS_K}) AS g(g)
    ), negw AS (
      SELECT n.center, n.context, v.word AS negative
      FROM neg n JOIN vocab v ON v.vid = n.nvid
    )
    SELECT center, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT context) AS BIGINT) AS n_contexts,
           CAST(count(DISTINCT negative) AS BIGINT) AS n_distinct_negs
    FROM negw GROUP BY 1 ORDER BY center
    """,
)
def negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram negative-sampling pair generation (the word2vec/
    contrastive-training data op): positives are (center, context) pairs
    at offsets ±1/±{_NS_WINDOW}; each positive draws {_NS_K} negatives
    from the frequency-ranked vocabulary via a portable integer mix of
    (pair_id, draw) — both engines draw IDENTICAL negatives, so the
    per-center pair/negative census is bit-exact. Doc slice bounds the
    compare size, not the op.

    Scale: pair emission is a narrow per-row explode; the vocabulary id
    assignment is the one rank over the vocab DIMENSION; negatives are a
    map-side hash → broadcast-join against the vocab id table — no
    shuffle carries the pair stream beyond its own rollup.
    """
    toks = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 20 == 0)
        .select("doc_id", F.split(F.trim(F.col("text")), " ").alias("w"))
    )
    vocab = (
        toks.select(F.explode("w").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window

    vocab = vocab.select(
        "word",
        (
            F.row_number().over(Window.orderBy(F.desc("c"), "word")) - 1
        ).alias("vid"),
    )
    vn = vocab.agg(F.count(F.lit(1)).alias("vn"))
    offsets = [-_NS_WINDOW, -1, 1, _NS_WINDOW]
    pos = (
        toks.select(
            "doc_id",
            "w",
            F.posexplode(
                F.expr(
                    f"flatten(transform(sequence(1, size(w)), i -> "
                    f"filter(transform(array({', '.join(str(o) for o in offsets)}), "
                    f"o -> named_struct('pid', (doc_id * 1000 + i) * 10 + o + {_NS_WINDOW}, "
                    f"'c', element_at(w, i), "
                    f"'x', CASE WHEN i + o >= 1 AND i + o <= size(w) "
                    f"THEN element_at(w, i + o) END)), s -> s.x IS NOT NULL)))"
                )
            ).alias("_p", "pr"),
        )
        .select(
            F.col("pr.pid").alias("pair_id"),
            F.col("pr.c").alias("center"),
            F.col("pr.x").alias("context"),
        )
    )
    draws = pos.crossJoin(F.broadcast(vn)).select(
        "pair_id",
        "center",
        "context",
        F.explode(
            F.expr(
                f"transform(sequence(1, {_NS_K}), g -> "
                f"CAST(((pair_id % 2147483648) * 506952113 + g * 40503)"
                f" % 2147483648 % vn AS BIGINT))"
            )
        ).alias("nvid"),
    )
    neg = draws.join(F.broadcast(vocab), draws.nvid == vocab.vid).select(
        "center", "context", F.col("word").alias("negative")
    )
    return (
        neg.groupBy("center")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.count_distinct("context").cast("bigint").alias("n_contexts"),
            F.count_distinct("negative").cast("bigint").alias("n_distinct_negs"),
        )
        .orderBy("center")
    )


_HIST_BUCKETS = 8


@query(
    "equi_depth_histogram_stats",
    oracle=f"""
    WITH o AS (
      SELECT {_CENTS} AS cents FROM orders
    ), n AS (SELECT count(*) AS n FROM o),
    g AS (SELECT cents, count(*) AS c FROM o GROUP BY 1),
    cum AS (
      SELECT cents, c,
             sum(c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum
      FROM g
    ), lab AS (
      SELECT cents, c,
             least(((cum - 1) * {_HIST_BUCKETS}) // (SELECT n FROM n),
                   {_HIST_BUCKETS - 1}) AS bucket
      FROM cum
    )
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS ndv,
           CAST(min(cents) AS BIGINT) AS lo_cents,
           CAST(max(cents) AS BIGINT) AS hi_cents
    FROM lab GROUP BY 1 ORDER BY 1
    """,
)
def equi_depth_histogram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer-grade equi-depth histogram ({_HIST_BUCKETS} buckets) of
    the order-value column — the statistic a cost-based optimizer feeds
    selectivity estimation (ANALYZE TABLE ... FOR COLUMNS builds exactly
    this shape). Bucket boundaries come from value-grouped cumulative
    counts (a whole tie-group lands in one bucket, so depths are equal up
    to tie granularity — the honest equi-depth contract); per bucket the
    report carries row count, NDV, and value bounds, all exact int64.

    Scale: one map-combinable value groupBy + one cumulative window over
    the distinct-value dimension (two-level bucketed at extreme NDV), then
    an {_HIST_BUCKETS}-row rollup.
    """
    o = load(spark, sf_dir, "orders").select(F.expr(_CENTS).alias("cents"))
    n_row = o.agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window as W

    g = o.groupBy("cents").agg(F.count(F.lit(1)).alias("c")).withColumn(
        "vb", F.expr("cents div 1000000")
    )
    # two-level prefix sum over the distinct-value frame (never a
    # single-partition cumulative window): bucket offsets + local cumsum
    bko = (
        g.groupBy("vb")
        .agg(F.sum("c").alias("bc"))
        .select(
            "vb",
            (
                F.sum("bc").over(W.partitionBy().orderBy("vb")) - F.col("bc")
            ).alias("off"),
        )
    )
    wl = W.partitionBy("vb").orderBy("cents").rowsBetween(W.unboundedPreceding, 0)
    lab = (
        g.join(F.broadcast(bko), "vb")
        .withColumn("cum", F.col("off") + F.sum("c").over(wl))
        .crossJoin(F.broadcast(n_row))
        .select(
            "cents",
            "c",
            F.least(
                F.expr(f"((cum - 1) * {_HIST_BUCKETS}) div n"),
                F.lit(_HIST_BUCKETS - 1),
            ).alias("bucket"),
        )
    )
    return (
        lab.groupBy(F.col("bucket").cast("int").alias("bucket"))
        .agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("ndv"),
            F.min("cents").cast("bigint").alias("lo_cents"),
            F.max("cents").cast("bigint").alias("hi_cents"),
        )
        .orderBy("bucket")
    )


@query(
    "sql_registered_udf_report",
    oracle="""
    SELECT label,
           count(*) AS n,
           round(avg(0.5 + (20.0 * CAST(embedding[1] AS DOUBLE))
                     / (2.0 * (1.0 + abs(20.0 * CAST(embedding[1] AS DOUBLE))))),
                 6) AS avg_squash
    FROM embeddings GROUP BY label ORDER BY label
    """,
)
def sql_registered_udf_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-callable vectorized Python UDF: a pandas (Arrow-batched) scalar
    UDF implementing the engine's rational squash p = ½ + x/(2(1+|x|)) is
    registered in the session catalog with ``spark.udf.register`` and
    invoked FROM SQL TEXT — the bridge that lets SQL-only users call
    Python kernels. The squash uses exactly-rounded IEEE ops (no libm),
    so the pandas evaluation matches the oracle's closed form bit-for-bit.

    Scale: ArrowEvalPython batches the column through the worker —
    vectorized, not per-row; a production deployment registers the same
    way on every session via a shared init.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def squash_udf(x: pd.Series) -> pd.Series:
        sx = 20.0 * x
        return 0.5 + sx / (2.0 * (1.0 + sx.abs()))

    spark.udf.register("squash_udf", squash_udf)
    load(spark, sf_dir, "embeddings").createOrReplaceTempView("udf_embeddings")
    return spark.sql(
        """
        SELECT label, count(*) AS n,
               round(avg(squash_udf(CAST(embedding[0] AS DOUBLE))), 6)
                 AS avg_squash
        FROM udf_embeddings GROUP BY label ORDER BY label
        """
    )


@query(
    "bitemporal_asof_join",
    oracle=f"""
    WITH v1 AS (
      SELECT o_orderkey AS k, o_orderstatus AS st, {_CENTS} AS cents,
             0 AS tx_from
      FROM orders
    ), v2 AS (
      -- correction batch recorded at tx time 30: +1000 cents on 1-in-5
      SELECT k, st, cents + 1000 AS cents, 30 AS tx_from
      FROM v1 WHERE k % 5 = 0
    ), hist AS (
      SELECT * FROM v1 UNION ALL SELECT * FROM v2
    ), pick AS (
      SELECT t.label, h.k, h.st, h.cents,
             row_number() OVER (PARTITION BY t.label, h.k
                                ORDER BY h.tx_from DESC) AS r
      FROM hist h
      JOIN (VALUES ('as_of_tx_10', 10), ('as_of_tx_40', 40)) t(label, tx)
        ON h.tx_from <= t.tx
    )
    SELECT label, st AS status, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM pick WHERE r = 1
    GROUP BY 1, 2 ORDER BY label, status
    """,
)
def bitemporal_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal AS-OF read: the order fact carries TRANSACTION-time
    versions (the original load at tx 0, a correction batch recorded at
    tx 30), and the query answers "what did the books say as of tx time
    T?" for T=10 (before the correction landed) and T=40 (after) — the
    latest version with tx_from ≤ T wins per key. The two snapshots
    differ by exactly the correction, which is the audit-trail property
    bitemporal storage exists to provide (cf. scd2/pit for valid-time;
    this is the second time axis).

    Scale: version history is key-partitioned; the AS-OF pick is one
    row_number over (label, key) — at scale the 2-row AS-OF dimension
    broadcasts and the window stays keyed by the fact key.
    """
    base = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.expr(_CENTS).alias("cents"),
        F.lit(0).alias("tx_from"),
    )
    corr = base.where(F.col("k") % 5 == 0).select(
        "k", "st", (F.col("cents") + 1000).alias("cents"), F.lit(30).alias("tx_from")
    )
    hist = base.unionByName(corr)
    asof_dim = spark.createDataFrame(
        [("as_of_tx_10", 10), ("as_of_tx_40", 40)], "label string, tx int"
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("label", "k").orderBy(F.desc("tx_from"))
    picked = (
        hist.join(F.broadcast(asof_dim), F.col("tx_from") <= F.col("tx"))
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
    )
    return (
        picked.groupBy("label", F.col("st").alias("status"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
        .orderBy("label", "status")
    )
