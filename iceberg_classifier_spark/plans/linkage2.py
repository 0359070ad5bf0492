"""Record-linkage wave 2: sorted-neighborhood blocking and
SymSpell-style delete-blocked spelling correction.

Sorted-neighborhood (Hernández-Stolfo) is the other classic blocking
scheme next to the key-equality blocks `fellegi_sunter_linkage` uses:
sort on a key, compare only rows within a sliding window — candidate
volume is O(n·w) by construction. SymSpell inverts spell-checking into
a pure equi-join: index every 1-delete of every dictionary word, and a
corrupted token finds its corrections by exact key match — no fuzzy
scan, which is why it distributes (the delete index is the broadcast
dimension, the token stream never fans out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.analytics2 import _md5_prefix_sql
from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_SNM_W = 2  # compare each row with the next w rows in sort order


@query(
    "sorted_neighborhood_blocking",
    oracle=f"""
    WITH parts AS (
      SELECT p_partkey, p_name, substr(p_name, 1, 1) AS blk,
             string_split(p_name, ' ') AS toks
      FROM part
    ), led AS (
      SELECT blk, p_name, toks,
             lead(p_name, 1) OVER w AS n1,
             lead(toks, 1) OVER w AS t1,
             lead(p_name, 2) OVER w AS n2,
             lead(toks, 2) OVER w AS t2
      FROM parts
      WINDOW w AS (PARTITION BY blk ORDER BY p_name, p_partkey)
    ), pairs AS (
      SELECT blk, p_name AS na, n1 AS nb, toks AS ta, t1 AS tb
      FROM led WHERE n1 IS NOT NULL
      UNION ALL
      SELECT blk, p_name AS na, n2 AS nb, toks AS ta, t2 AS tb
      FROM led WHERE n2 IS NOT NULL
    ), scored AS (
      SELECT blk,
             CASE WHEN len(list_intersect(ta, tb)) >= 1 THEN 1 ELSE 0 END
               AS shares_token,
             CASE WHEN na = nb THEN 1 ELSE 0 END AS exact_dup,
             CAST(levenshtein(na, nb) AS BIGINT) AS lev
      FROM pairs
    ), blocks AS (
      SELECT blk, CAST(count(*) AS BIGINT) AS n_parts
      FROM parts GROUP BY blk
    )
    SELECT b.blk, b.n_parts,
           CAST(count(s.blk) AS BIGINT) AS n_pairs,
           CAST(coalesce(sum(s.shares_token), 0) AS BIGINT) AS n_match,
           CAST(coalesce(sum(s.exact_dup), 0) AS BIGINT) AS n_exact,
           CAST(coalesce(sum(s.lev), 0) AS BIGINT) AS sum_lev,
           CAST(CASE WHEN count(s.blk) = 0 THEN 0
                ELSE sum(s.shares_token) * 1000000 // count(s.blk) END
             AS BIGINT) AS match_ppm
    FROM blocks b LEFT JOIN scored s ON b.blk = s.blk
    GROUP BY b.blk, b.n_parts ORDER BY b.blk
    """,
)
def sorted_neighborhood_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández-Stolfo) over part names:
    within each first-letter block, sort by (name, key) and emit only
    pairs at sort-distance ≤ w=2 — O(n·w) candidates instead of the
    O(n²) all-pairs a naive matcher generates. Each candidate pair is
    scored by token overlap (2-word names: shares-a-token = Jaccard ≥
    1/3), exact-duplicate flag, and Levenshtein distance; reported per
    block with the match density (ppm).

    Determinism: the neighborhood is defined by the total order
    (p_name, p_partkey) — identical on both engines; all outputs are
    exact integer counts/sums.

    Scale: the sort is PARTITIONED by block prefix (never a global
    single-partition window — the block key is the parallelism unit;
    widen to 2-char prefixes if one letter skews); lead(w) windows keep
    candidate volume linear. The classic SNM trade-off (duplicates
    straddling a block boundary are missed) is the documented price of
    linear candidates.
    """
    parts = load(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.substring("p_name", 1, 1).alias("blk"),
        F.split("p_name", " ").alias("toks"),
    )
    w = Window.partitionBy("blk").orderBy("p_name", "p_partkey")
    led = parts.select(
        "blk",
        "p_name",
        "toks",
        F.lead("p_name", 1).over(w).alias("n1"),
        F.lead("toks", 1).over(w).alias("t1"),
        F.lead("p_name", 2).over(w).alias("n2"),
        F.lead("toks", 2).over(w).alias("t2"),
    )
    p1 = led.filter(F.col("n1").isNotNull()).select(
        "blk",
        F.col("p_name").alias("na"),
        F.col("n1").alias("nb"),
        F.col("toks").alias("ta"),
        F.col("t1").alias("tb"),
    )
    p2 = led.filter(F.col("n2").isNotNull()).select(
        "blk",
        F.col("p_name").alias("na"),
        F.col("n2").alias("nb"),
        F.col("toks").alias("ta"),
        F.col("t2").alias("tb"),
    )
    scored = p1.unionAll(p2).select(
        "blk",
        (F.size(F.array_intersect("ta", "tb")) >= 1)
        .cast("bigint")
        .alias("shares_token"),
        (F.col("na") == F.col("nb")).cast("bigint").alias("exact_dup"),
        F.levenshtein("na", "nb").cast("bigint").alias("lev"),
    )
    blocks = parts.groupBy("blk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts")
    )
    agg = scored.groupBy("blk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("shares_token").cast("bigint").alias("n_match"),
        F.sum("exact_dup").cast("bigint").alias("n_exact"),
        F.sum("lev").cast("bigint").alias("sum_lev"),
    )
    return (
        blocks.join(agg, "blk", "left")
        .select(
            "blk",
            "n_parts",
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("n_match", F.lit(0)).cast("bigint").alias("n_match"),
            F.coalesce("n_exact", F.lit(0)).cast("bigint").alias("n_exact"),
            F.coalesce("sum_lev", F.lit(0)).cast("bigint").alias("sum_lev"),
            F.expr(
                """
                CAST(CASE WHEN coalesce(n_pairs, 0) = 0 THEN 0
                     ELSE coalesce(n_match, 0) * 1000000
                          div coalesce(n_pairs, 0) END AS BIGINT)
                """
            ).alias("match_ppm"),
        )
        .orderBy("blk")
    )


@query(
    "symspell_correction",
    oracle=f"""
    WITH occ AS (
      SELECT doc_id, lang, t.u.p AS pos, t.u.w AS w
      FROM (
        SELECT doc_id, lang,
               list_transform(range(0, len(string_split(text, ' '))),
                 i -> struct_pack(p := i,
                        w := string_split(text, ' ')
                               [CAST(i + 1 AS INTEGER)])) AS l
        FROM documents
      ), unnest(l) AS t(u)
      WHERE len(t.u.w) >= 2
    ), vocab AS (
      SELECT w AS v, CAST(count(*) AS BIGINT) AS freq
      FROM occ GROUP BY w
    ), del_index AS (
      SELECT d.key, v, freq
      FROM (
        SELECT v, freq,
               list_distinct(list_transform(range(0, len(v)),
                 i -> substr(v, 1, CAST(i AS INTEGER))
                      || substr(v, CAST(i + 2 AS INTEGER)))) AS keys
        FROM vocab
      ), unnest(keys) AS d(key)
    ), corrupted AS (
      SELECT doc_id, lang, pos, w,
             substr(w, 1, CAST(
               {_md5_prefix_sql(
                   "CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)"
                   " || ':' || w")} % len(w) AS INTEGER))
             || substr(w, CAST(
               {_md5_prefix_sql(
                   "CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)"
                   " || ':' || w")} % len(w) + 2 AS INTEGER)) AS bad
      FROM occ
    ), cand AS (
      SELECT c.doc_id, c.lang, c.pos, c.w, d.v, d.freq,
             row_number() OVER (PARTITION BY c.doc_id, c.pos
                                ORDER BY d.freq DESC, d.v) AS r,
             count(DISTINCT d.v) OVER (PARTITION BY c.doc_id, c.pos)
               AS n_cand
      FROM corrupted c JOIN del_index d ON c.bad = d.key
    )
    SELECT o.lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(coalesce(sum(CASE WHEN k.v IS NOT NULL THEN 1 ELSE 0 END),
                0) AS BIGINT) AS n_with_candidate,
           CAST(coalesce(sum(CASE WHEN k.v = o.w THEN 1 ELSE 0 END), 0)
             AS BIGINT) AS n_correct,
           CAST(coalesce(sum(CASE WHEN k.n_cand > 1 THEN 1 ELSE 0 END), 0)
             AS BIGINT) AS n_ambiguous,
           CAST(coalesce(sum(CASE WHEN k.v = o.w THEN 1 ELSE 0 END), 0)
                * 1000000 // count(*) AS BIGINT) AS acc_ppm
    FROM occ o LEFT JOIN (SELECT * FROM cand WHERE r = 1) k
      ON o.doc_id = k.doc_id AND o.pos = k.pos
    GROUP BY o.lang ORDER BY o.lang
    """,
)
def symspell_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell-style spelling correction as a pure equi-join: corrupt
    every document token deterministically (delete the character picked
    by an md5 hash of (doc, pos, word)), index every 1-delete of every
    dictionary word, and restore each corrupted token by exact key
    match into that delete index — candidates ranked by corpus
    frequency (lexicographic tiebreak). Reports per-language token
    counts, candidate coverage, restoration accuracy (ppm), and how
    often the delete key was ambiguous (>1 candidate word).

    Determinism: the corrupted-character position is the portable
    md5-prefix hash mod word length (identical on both engines);
    candidate ranking is (freq DESC, word) — exact integers.

    Scale: this is WHY SymSpell beats fuzzy matching at 100 TB — the
    delete index is vocabulary-bounded (a broadcast dimension), the
    token stream is corrupted map-side and joins by exact key; no
    similarity scan ever touches the fact stream. The per-occurrence
    argmax windows partition on (doc, pos) — fact-partitioned, never
    global.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("toks")
    )
    occ = docs.select(
        "doc_id", "lang", F.posexplode("toks").alias("pos", "w")
    ).filter(F.length("w") >= 2)
    vocab = occ.groupBy(F.col("w").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("freq")
    )
    del_index = vocab.select(
        "v",
        "freq",
        F.explode(
            F.expr(
                """
                array_distinct(transform(sequence(0, length(v) - 1),
                  i -> concat(substring(v, 1, i), substr(v, i + 2))))
                """
            )
        ).alias("key"),
    )
    corrupted = occ.select(
        "doc_id",
        "lang",
        "pos",
        "w",
        F.expr(
            """
            concat(substring(w, 1, CAST(
                CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':',
                                            CAST(pos AS STRING), ':', w)),
                          1, 8), 16, 10) AS BIGINT) % length(w) AS INT)),
              substr(w, CAST(
                CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':',
                                            CAST(pos AS STRING), ':', w)),
                          1, 8), 16, 10) AS BIGINT) % length(w) + 2
                AS INT)))
            """
        ).alias("bad"),
    )
    wocc = Window.partitionBy("doc_id", "pos")
    cand = (
        corrupted.join(
            F.broadcast(del_index), corrupted.bad == del_index.key
        )
        .select("doc_id", "lang", "pos", "w", "v", "freq")
        .withColumn(
            "r",
            F.row_number().over(wocc.orderBy(F.desc("freq"), "v")),
        )
        .withColumn(
            "n_cand",
            F.size(F.collect_set("v").over(wocc)),
        )
    )
    best = cand.filter(F.col("r") == 1).select(
        F.col("doc_id").alias("k_doc"),
        F.col("pos").alias("k_pos"),
        F.col("v"),
        F.col("n_cand"),
    )
    joined = occ.join(
        best,
        (occ.doc_id == best.k_doc) & (occ.pos == best.k_pos),
        "left",
    )
    return (
        joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("v").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_with_candidate"),
            F.sum(F.when(F.col("v") == F.col("w"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_correct"),
            F.sum(F.when(F.col("n_cand") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_ambiguous"),
            F.expr(
                """
                CAST(sum(CASE WHEN v = w THEN 1 ELSE 0 END) * 1000000
                     div count(1) AS BIGINT)
                """
            ).alias("acc_ppm"),
        )
        .orderBy("lang")
    )
