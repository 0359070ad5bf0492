"""Warehouse wave 4: incremental materialized-view maintenance, leave-one-
out target encoding, and skip-gram negative-sampling pair generation.

Numeric discipline as everywhere: exact integer cents/ppm feed every
output; `div` only on non-negative quantities.
"""

from __future__ import annotations

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
      SELECT o.k, o.seg, o.y,
             CAST(((st.s - o.y) * prior.gn + {_TE_M} * prior.gs) * 1000000
                  // ((st.n - 1 + {_TE_M}) * prior.gn) AS BIGINT) AS enc_ppm
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
                f"CAST(((s - y) * gn + {_TE_M} * gs) * 1000000"
                f" div ((n - 1 + {_TE_M}) * gn) AS BIGINT)"
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
             ((p.pair_id * 2654435761 + g.g * 40503) % 2147483648)
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
                f"CAST((pair_id * 2654435761 + g * 40503) % 2147483648 % vn AS BIGINT))"
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
