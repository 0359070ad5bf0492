"""Multimodal wave 7: the FUSED image-corpus curation funnel — the vision
twin of ``curated_corpus_pipeline``: decode gate → photometric quality
gate → banded perceptual-hash (aHash) near-dup dedup → per-stage
observability counters. The stages exist individually
(multimodal_image_ahash, image_ahash_neardup,
histogram_equalization_audit); this is the composed shape a vision-corpus
build runs before training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.multimodal4 import (
    _AH_BAND,
    _AH_CAP,
    _AH_HAM,
    _AH_PIX,
    _ahash_frame,
)
from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_BRIGHT_LO, _BRIGHT_HI = 92, 97  # integer mean-pixel bounds (exact int div)


@query(
    "multimodal_curation_pipeline",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
    ), decoded AS (
      SELECT doc_id, substr(text, 1, {_AH_PIX}) AS px
      FROM corpus WHERE length(text) >= {_AH_PIX}
    ), lit AS (
      SELECT doc_id, px,
             list_sum(list_transform(generate_series(1, {_AH_PIX}),
               i -> ord(substr(px, CAST(i AS INTEGER), 1)))) AS tot
      FROM decoded
    ), qkept AS (
      SELECT doc_id, px, tot FROM lit
      WHERE tot // {_AH_PIX} BETWEEN {_BRIGHT_LO} AND {_BRIGHT_HI}
    ), h AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(generate_series(1, {_AH_PIX}),
               i -> CASE WHEN ord(substr(px, CAST(i AS INTEGER), 1))
                              * {_AH_PIX} > tot
                    THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END))
               AS BIGINT) AS ah
      FROM qkept
    ), bands AS (
      SELECT doc_id, ah, g.b, (ah >> (g.b * 16)) & 65535 AS band_key
      FROM h, (SELECT unnest(range(0, {_AH_BAND})) AS b) g
    ), bsz AS (
      SELECT b, band_key, min(doc_id) AS lowest,
             CAST(count(*) AS BIGINT) AS sz
      FROM bands GROUP BY 1, 2
    ), small AS (
      SELECT bands.* FROM bands JOIN bsz USING (b, band_key)
      WHERE bsz.sz <= {_AH_CAP}
    ), rejected AS (
      SELECT DISTINCT db AS doc_id FROM (
        SELECT a.doc_id AS da, b.doc_id AS db, a.ah AS ha, b.ah AS hb
        FROM small a JOIN small b
          ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        UNION ALL
        SELECT s.lowest, m.doc_id, r.ah, m.ah
        FROM bands m JOIN bsz s USING (b, band_key)
                     JOIN h r ON r.doc_id = s.lowest
        WHERE s.sz > {_AH_CAP} AND m.doc_id > s.lowest
      )
      WHERE bit_count(CAST(xor(ha, hb) AS BIGINT)) <= {_AH_HAM}
    ), kept AS (
      SELECT h.doc_id FROM h LEFT JOIN rejected r USING (doc_id)
      WHERE r.doc_id IS NULL
    )
    SELECT * FROM (
      SELECT 1 AS stage_ord, 'corpus' AS stage,
             CAST(count(*) AS BIGINT) AS n_images FROM corpus
      UNION ALL
      SELECT 2, 'decoded', count(*) FROM decoded
      UNION ALL
      SELECT 3, 'brightness_kept', count(*) FROM qkept
      UNION ALL
      SELECT 4, 'neardup_kept', count(*) FROM kept
    ) ORDER BY stage_ord
    """,
)
def multimodal_curation_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The fused image-corpus curation funnel, one registered plan:

    1. decode gate — tiles too short to decode drop
       (``length >= {_AH_PIX}``; the real pipeline's corrupt-bytes gate)
    2. photometric quality — integer mean pixel must sit in
       [{_BRIGHT_LO}, {_BRIGHT_HI}] (over/under-exposed images drop;
       exact integer division, no float boundary)
    3. perceptual near-dup dedup — 62-bit aHash, 16-bit band candidates
       with the {_AH_CAP}-member bucket cap (hot buckets verify members
       against the bucket's min-doc_id representative only — the
       dedup_minhash_skewed star route, semantics shared with
       image_ahash_neardup), hamming ≤ {_AH_HAM} verify, lowest doc_id
       wins

    Emits the per-stage funnel counters a vision-data build reports.

    Scale: stages 1-2 and the hash are one codegen'd scan (per-row byte
    arithmetic); the only shuffles are the band-key equi-join for
    candidates — pair emission bounded by sz·{_AH_CAP}/2 per small
    bucket and sz-1 per hot one, never O(bucket²) (the round-6 sf1
    sweep measured the uncapped funnel at 102 s on a 10×-replicated
    corpus) — and the rejected-set anti-join.
    """
    corpus = load(spark, sf_dir, "documents").select("doc_id", "text")
    decoded = corpus.where(F.length("text") >= _AH_PIX).select(
        "doc_id", F.substring("text", 1, _AH_PIX).alias("px")
    )
    tot = F.expr(
        f"aggregate(transform(sequence(1, {_AH_PIX}),"
        " i -> ascii(substring(px, i, 1))), 0, (a, x) -> a + x)"
    )
    lit = decoded.withColumn("tot", tot)
    qkept = lit.where(
        F.expr(f"tot div {_AH_PIX}").between(_BRIGHT_LO, _BRIGHT_HI)
    )
    # cached: the (doc_id, ah) frame is two longs per surviving image and
    # feeds the band explode, the star representative join, the anti-join
    # and the stage counter — without it each branch re-evaluates the
    # hash kernel over the corpus (measured 40 s → ~3 s at sf0.1)
    h = _ahash_frame(qkept).cache()
    bands_dim = spark.range(0, _AH_BAND).select(
        F.col("id").cast("int").alias("b")
    )
    bands = h.crossJoin(F.broadcast(bands_dim)).select(
        "doc_id",
        "ah",
        "b",
        F.expr("(ah >> (b * 16)) & 65535").alias("band_key"),
    )
    keys = ["b", "band_key"]
    bsz = bands.groupBy(*keys).agg(
        F.min("doc_id").alias("lowest"),
        F.count(F.lit(1)).cast("bigint").alias("sz"),
    )
    small = bands.join(bsz.where(F.col("sz") <= _AH_CAP).select(*keys), keys)
    a, b = small.alias("a"), small.alias("b")
    rej_small = a.join(
        b,
        (F.col("a.b") == F.col("b.b"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.ah").alias("ha"),
        F.col("b.ah").alias("hb"),
        F.col("b.doc_id").alias("doc_id"),
    )
    rep = h.select(F.col("doc_id").alias("lowest"), F.col("ah").alias("ha"))
    rej_star = (
        bands.join(bsz.where(F.col("sz") > _AH_CAP), keys)
        .where(F.col("doc_id") > F.col("lowest"))
        .join(rep, "lowest")
        .select("ha", F.col("ah").alias("hb"), "doc_id")
    )
    rejected = (
        rej_small.unionAll(rej_star)
        .where(F.expr("bit_count(ha ^ hb)") <= _AH_HAM)
        .select("doc_id")
        .distinct()
    )
    kept = h.join(rejected, "doc_id", "left_anti")

    def stage(ord_: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(ord_).alias("stage_ord"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("n_images"),
        ).select("stage_ord", "stage", "n_images")

    return (
        stage(1, "corpus", corpus)
        .unionByName(stage(2, "decoded", decoded))
        .unionByName(stage(3, "brightness_kept", qkept))
        .unionByName(stage(4, "neardup_kept", kept))
        .orderBy("stage_ord")
    )
