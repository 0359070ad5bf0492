"""Text wave 7: self-BLEU and distinct-n generation diversity.

Self-BLEU (Zhu et al., Texygen) measures how much a corpus repeats
itself: each document is scored by BLEU against ALL OTHER documents
as references — high self-BLEU = mode collapse, the standard
diversity red flag for synthetic/generated training data. Distinct-1/
distinct-2 are the cheap companions (unique n-gram ratios). Both
reduce to exact n-gram count algebra, so the whole metric is
oracle-checkable — the clipping maximum over "all other docs" comes
from a global top-2 count per n-gram (max2 when the doc itself holds
the unique max), never a per-pair comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_NGRAM_SQL = """
      SELECT doc_id, source, n.n,
             CASE WHEN n.n = 1 THEN t.toks[CAST(t.i AS INTEGER)]
                  ELSE t.toks[CAST(t.i AS INTEGER)] || ' '
                       || t.toks[CAST(t.i + 1 AS INTEGER)] END AS gram
      FROM (
        SELECT doc_id, source, string_split(trim(text), ' ') AS toks,
               unnest(range(1, len(string_split(trim(text), ' ')) + 1))
                 AS i
        FROM documents
      ) t, (SELECT unnest([1, 2]) AS n) n
      WHERE t.i + n.n - 1 <= len(t.toks)
"""


@query(
    "self_bleu_diversity",
    oracle=f"""
    WITH grams AS ({_NGRAM_SQL}),
    dc AS (
      SELECT doc_id, source, n, gram, CAST(count(*) AS BIGINT) AS c
      FROM grams GROUP BY 1, 2, 3, 4
    ), m1 AS (
      SELECT n, gram, CAST(max(c) AS BIGINT) AS max1
      FROM dc GROUP BY n, gram
    ), at_max AS (
      SELECT d.n, d.gram,
             CAST(count(*) AS BIGINT) AS n_at_max
      FROM dc d JOIN m1 ON d.n = m1.n AND d.gram = m1.gram
      WHERE d.c = m1.max1 GROUP BY d.n, d.gram
    ), m2 AS (
      SELECT d.n, d.gram, CAST(max(d.c) AS BIGINT) AS max2
      FROM dc d JOIN m1 ON d.n = m1.n AND d.gram = m1.gram
      WHERE d.c < m1.max1 GROUP BY d.n, d.gram
    ), clipped AS (
      SELECT d.doc_id, d.source, d.n, d.c,
             CASE WHEN d.c = m1.max1 AND am.n_at_max = 1
                  THEN coalesce(m2.max2, 0) ELSE m1.max1 END AS clip
      FROM dc d
      JOIN m1 ON d.n = m1.n AND d.gram = m1.gram
      JOIN at_max am ON d.n = am.n AND d.gram = am.gram
      LEFT JOIN m2 ON d.n = m2.n AND d.gram = m2.gram
    ), per_doc_n AS (
      SELECT doc_id, source, n,
             CAST(sum(least(c, clip)) AS BIGINT) AS matched,
             CAST(sum(c) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS distinct_grams
      FROM clipped GROUP BY 1, 2, 3
    ), per_doc AS (
      SELECT doc_id, source,
             CAST(round(sqrt(
               (max(CASE WHEN n = 1 THEN matched END) * 1.0
                / max(CASE WHEN n = 1 THEN total END))
               * (max(CASE WHEN n = 2 THEN matched END) * 1.0
                  / greatest(max(CASE WHEN n = 2 THEN total END), 1)))
               * 1000000) AS BIGINT) AS bleu_ppm,
             CAST(max(CASE WHEN n = 1 THEN distinct_grams END) * 1000000
                  // max(CASE WHEN n = 1 THEN total END) AS BIGINT)
               AS distinct1_ppm,
             CAST(max(CASE WHEN n = 2 THEN distinct_grams END) * 1000000
                  // greatest(max(CASE WHEN n = 2 THEN total END), 1)
               AS BIGINT) AS distinct2_ppm
      FROM per_doc_n GROUP BY doc_id, source
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(bleu_ppm) // count(*) AS BIGINT)
             AS mean_self_bleu_ppm,
           CAST(sum(distinct1_ppm) // count(*) AS BIGINT)
             AS mean_distinct1_ppm,
           CAST(sum(distinct2_ppm) // count(*) AS BIGINT)
             AS mean_distinct2_ppm,
           CAST(max(bleu_ppm) AS BIGINT) AS max_self_bleu_ppm
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def self_bleu_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-BLEU diversity audit per source: each document's modified
    1/2-gram precisions against the rest of the corpus as references
    (clip = the global max count of that n-gram in any OTHER document
    — computed as a per-gram top-2, max2 substituting when the doc
    itself uniquely holds the max), BLEU = √(p₁·p₂), quantized to ppm
    per doc BEFORE the source mean — plus distinct-1/distinct-2
    ratios. High self-BLEU + low distinct-n = the mode-collapse
    signature that disqualifies synthetic corpora before training.

    Determinism: every ingredient is exact integer n-gram count
    algebra; the per-doc quantization makes source means exact
    integer sums.

    Scale: the clipping reference is the n-gram dimension's top-2
    (two map-side-combined aggregates — never a doc×doc comparison);
    per-doc precisions group the doc's own bounded n-gram rows.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.split(F.trim(F.col("text")), " ").alias("toks"),
    )
    grams = None
    for n in (1, 2):
        gexpr = (
            "transform(sequence(0, size(toks) - %d), i -> %s)"
            % (
                n,
                "toks[i]"
                if n == 1
                else "concat(toks[i], ' ', toks[i + 1])",
            )
        )
        gn = toks.select(
            "doc_id",
            "source",
            F.lit(n).alias("n"),
            F.explode(F.expr(gexpr)).alias("gram"),
        )
        grams = gn if grams is None else grams.unionAll(gn)
    dc = grams.groupBy("doc_id", "source", "n", "gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    m1 = dc.groupBy("n", "gram").agg(
        F.max("c").cast("bigint").alias("max1")
    )
    at_max = (
        dc.join(m1, ["n", "gram"])
        .filter(F.col("c") == F.col("max1"))
        .groupBy("n", "gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_at_max"))
    )
    m2 = (
        dc.join(m1, ["n", "gram"])
        .filter(F.col("c") < F.col("max1"))
        .groupBy("n", "gram")
        .agg(F.max("c").cast("bigint").alias("max2"))
    )
    clipped = (
        dc.join(m1, ["n", "gram"])
        .join(at_max, ["n", "gram"])
        .join(m2, ["n", "gram"], "left")
        .select(
            "doc_id",
            "source",
            "n",
            "c",
            F.when(
                (F.col("c") == F.col("max1"))
                & (F.col("n_at_max") == 1),
                F.coalesce(F.col("max2"), F.lit(0)),
            )
            .otherwise(F.col("max1"))
            .alias("clip"),
        )
    )
    per_doc_n = clipped.groupBy("doc_id", "source", "n").agg(
        F.sum(F.least(F.col("c"), F.col("clip")))
        .cast("bigint")
        .alias("matched"),
        F.sum("c").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_grams"),
    )
    p1m = F.max(F.when(F.col("n") == 1, F.col("matched")))
    p1t = F.max(F.when(F.col("n") == 1, F.col("total")))
    p2m = F.max(F.when(F.col("n") == 2, F.col("matched")))
    p2t = F.greatest(
        F.max(F.when(F.col("n") == 2, F.col("total"))), F.lit(1)
    )
    d1 = F.max(F.when(F.col("n") == 1, F.col("distinct_grams")))
    d2 = F.max(F.when(F.col("n") == 2, F.col("distinct_grams")))
    per_doc = per_doc_n.groupBy("doc_id", "source").agg(
        F.round(
            F.sqrt((p1m * 1.0 / p1t) * (p2m * 1.0 / p2t)) * 1000000
        )
        .cast("bigint")
        .alias("bleu_ppm"),
        F.expr(
            """
            CAST(max(CASE WHEN n = 1 THEN distinct_grams END) * 1000000
                 div max(CASE WHEN n = 1 THEN total END) AS BIGINT)
            """
        ).alias("distinct1_ppm"),
        F.expr(
            """
            CAST(max(CASE WHEN n = 2 THEN distinct_grams END) * 1000000
                 div greatest(max(CASE WHEN n = 2 THEN total END), 1)
              AS BIGINT)
            """
        ).alias("distinct2_ppm"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr("CAST(sum(bleu_ppm) div count(1) AS BIGINT)").alias(
                "mean_self_bleu_ppm"
            ),
            F.expr(
                "CAST(sum(distinct1_ppm) div count(1) AS BIGINT)"
            ).alias("mean_distinct1_ppm"),
            F.expr(
                "CAST(sum(distinct2_ppm) div count(1) AS BIGINT)"
            ).alias("mean_distinct2_ppm"),
            F.max("bleu_ppm").cast("bigint").alias("max_self_bleu_ppm"),
        )
        .orderBy("source")
    )
