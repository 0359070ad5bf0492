"""Multimodal wave 4: banded perceptual-hash near-dup detection and a
histogram-equalization audit.

The aHash near-dup join is the image counterpart of `dedup_simhash`:
split the 62-bit perceptual hash into 4 bands, candidates = pairs
sharing any band (pigeonhole: hamming ≤ 6 guarantees ≥1 clean band of
15/16 bits... with 4 bands any pair within hamming 3·band-misses must
collide somewhere), verify with popcount — candidate volume scales
with collisions, never |images|². Histogram equalization is the
classic contrast transform; its audit form (how much does the CDF
remap spread the histogram) is exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_AH_PIX = 62  # 62-bit hash (positive int64), as multimodal_image_ahash
_AH_BAND = 4  # bands of ~16 bits
_AH_HAM = 6  # near-dup verify threshold
_AH_CAP = 64  # band-bucket cap: bigger buckets emit star pairs via min-id rep


def _ahash_cols() -> str:
    bit = (
        f"CASE WHEN ascii(substring(px, i, 1)) * {_AH_PIX} > tot"
        " THEN {v} ELSE 0 END"
    )
    return (
        f"CAST(aggregate(transform(sequence(1, {_AH_PIX}),"
        f" i -> {bit.format(v='shiftleft(CAST(1 AS BIGINT), i - 1)')}),"
        " CAST(0 AS BIGINT), (a, x) -> a + x) AS BIGINT)"
    )


def _ahash_frame(px_df):
    """(doc_id, ah) from a (doc_id, px) frame via one Arrow-batched numpy
    kernel — the exact integer twin of ``_ahash_cols``.

    The Catalyst spelling re-inlines the ``tot`` sub-aggregate into each
    of the {_AH_PIX} lambda elements (CollapseProject), so every row pays
    O({_AH_PIX}²) interpreted substring/ascii calls — measured 64 s for
    49k rows at sf1. Here: one codepoint matrix per batch, integer-exact
    row sums and shifts (codepoints < 2¹¹, sums < 2¹⁷, shifts < 2⁶²), so
    the hash value is bit-identical to the expression and the oracle.
    """
    import numpy as np
    import pandas as pd

    def batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            # ord() = unicode codepoint = Spark ascii() / DuckDB ord()
            M = np.array(
                [[ord(c) for c in s] for s in pdf["px"]], dtype=np.int64
            )
            tot = M.sum(axis=1)
            bits = (M * _AH_PIX) > tot[:, None]
            ah = (
                bits.astype(np.int64) << np.arange(_AH_PIX, dtype=np.int64)
            ).sum(axis=1)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "ah": ah})

    return px_df.select("doc_id", "px").mapInPandas(
        batches, "doc_id long, ah long"
    )


@query(
    "image_ahash_neardup",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, substr(text, 1, {_AH_PIX}) AS px
      FROM documents WHERE length(text) >= {_AH_PIX}
    ), tot AS (
      SELECT doc_id, px,
             list_sum(list_transform(generate_series(1, {_AH_PIX}),
               i -> ord(substr(px, CAST(i AS INTEGER), 1)))) AS tot
      FROM m
    ), h AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(generate_series(1, {_AH_PIX}),
               i -> CASE WHEN ord(substr(px, CAST(i AS INTEGER), 1))
                              * {_AH_PIX} > tot
                    THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END))
               AS BIGINT) AS ah
      FROM tot
    ), bands AS (
      SELECT doc_id, ah, g.b,
             (ah >> (g.b * 16)) & 65535 AS band_key
      FROM h, (SELECT unnest(range(0, {_AH_BAND})) AS b) g
    ), bsz AS (
      SELECT b, band_key, min(doc_id) AS lowest,
             CAST(count(*) AS BIGINT) AS sz
      FROM bands GROUP BY 1, 2
    ), small AS (
      SELECT bands.* FROM bands JOIN bsz USING (b, band_key)
      WHERE bsz.sz <= {_AH_CAP}
    ), cand AS (
      SELECT DISTINCT da, db FROM (
        SELECT a.doc_id AS da, b.doc_id AS db
        FROM small a JOIN small b
          ON a.b = b.b AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        UNION ALL
        SELECT s.lowest AS da, m.doc_id AS db
        FROM bands m JOIN bsz s USING (b, band_key)
        WHERE s.sz > {_AH_CAP} AND m.doc_id > s.lowest
      )
    ), verified AS (
      SELECT c.da, c.db,
             bit_count(CAST(xor(ha.ah, hb.ah) AS BIGINT)) AS ham
      FROM cand c JOIN h ha ON ha.doc_id = c.da
                  JOIN h hb ON hb.doc_id = c.db
    )
    SELECT CAST((SELECT count(*) FROM h) AS BIGINT) AS n_images,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN ham <= {_AH_HAM} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_neardup,
           CAST(coalesce(min(ham), -1) AS BIGINT) AS min_hamming,
           CAST(CASE WHEN count(*) = 0 THEN 0
                ELSE sum(ham) // count(*) END AS BIGINT) AS mean_hamming
    FROM verified
    """,
)
def image_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate detection over the binary image
    column: 62-bit aHash per image (`multimodal_image_ahash`'s
    brighter-than-mean construction), hashes split into four 16-bit
    bands, candidate pairs ONLY from same-band equality (the simhash
    banding trick ported to images) with HOT-BUCKET CONTROL — a band
    bucket with ≤ {_AH_CAP} members enumerates all pairs, a bigger one
    emits only its star through the min-doc_id representative (the
    dedup_minhash_skewed bucket-min pattern) — then exact hamming
    popcount with the ≤6 near-dup verdict. Keep-one dedup loses
    nothing (every member still links to the representative); the hot
    bucket's member×member clique is what stops being emitted.

    Determinism: hashes are exact integer bit arithmetic; candidates
    and hamming distances are exact; summary is integer counts.

    Scale: pair emission is bounded by sz·{_AH_CAP}/2 per small bucket
    and sz-1 per hot one — O(n·{_AH_CAP}) total, never O(bucket²). The
    round-6 sf1 sweep measured the uncapped plan at 170 s on a
    10×-replicated corpus (every 16-bit band bucket 10× hot); the star
    route makes the same corpus linear. Only (doc_id, b, band_key)
    triples shuffle; hashes rejoin the deduped candidate ids.
    """
    m = (
        load(spark, sf_dir, "documents")
        .where(F.length("text") >= _AH_PIX)
        .select("doc_id", F.substring("text", 1, _AH_PIX).alias("px"))
    )
    # cached: two longs per image, consumed by the band explode, the
    # count and both verify join-backs — uncached, every branch
    # re-evaluates the hash kernel over the corpus
    h = _ahash_frame(m).cache()
    bands_dim = spark.range(0, _AH_BAND).select(
        F.col("id").cast("int").alias("b")
    )
    bands = h.crossJoin(F.broadcast(bands_dim)).select(
        "doc_id",
        "b",
        F.expr("(ah >> (b * 16)) & 65535").alias("band_key"),
    )
    keys = ["b", "band_key"]
    bsz = bands.groupBy(*keys).agg(
        F.min("doc_id").alias("lowest"),
        F.count(F.lit(1)).cast("bigint").alias("sz"),
    )
    small = bands.join(bsz.where(F.col("sz") <= _AH_CAP).select(*keys), keys)
    a = small.alias("a")
    b = small.alias("b")
    cand_small = a.join(
        b,
        (F.col("a.b") == F.col("b.b"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
    cand_star = (
        bands.join(bsz.where(F.col("sz") > _AH_CAP), keys)
        .where(F.col("doc_id") > F.col("lowest"))
        .select(F.col("lowest").alias("da"), F.col("doc_id").alias("db"))
    )
    cand = cand_small.unionAll(cand_star).distinct()
    ha = h.select(F.col("doc_id").alias("da"), F.col("ah").alias("ha"))
    hb = h.select(F.col("doc_id").alias("db"), F.col("ah").alias("hb"))
    verified = (
        cand.join(ha, "da")
        .join(hb, "db")
        .select(F.expr("bit_count(ha ^ hb)").cast("bigint").alias("ham"))
    )
    n_images = h.count()
    return verified.agg(
        F.lit(n_images).cast("bigint").alias("n_images"),
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum(F.when(F.col("ham") <= _AH_HAM, 1).otherwise(0))
        .cast("bigint")
        .alias("n_neardup"),
        F.coalesce(F.min("ham"), F.lit(-1)).cast("bigint").alias(
            "min_hamming"
        ),
        F.expr(
            "CAST(CASE WHEN count(1) = 0 THEN 0"
            " ELSE sum(ham) div count(1) END AS BIGINT)"
        ).alias("mean_hamming"),
    )


_HE_PIX = 64  # first 64 bytes as the grayscale tile


@query(
    "histogram_equalization_audit",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, substr(text, 1, {_HE_PIX}) AS px
      FROM documents WHERE length(text) >= {_HE_PIX}
    ), vals AS (
      SELECT doc_id,
             list_transform(generate_series(1, {_HE_PIX}),
               i -> ord(substr(px, CAST(i AS INTEGER), 1)) // 8) AS v
      FROM m
    ), stats AS (
      SELECT doc_id, v,
             list_sum(list_transform(range(0, 32), lvl ->
               CASE WHEN len(list_filter(v, x -> x = lvl)) > 0
               THEN 1 ELSE 0 END)) AS levels_used,
             list_max(v) - list_min(v) AS dynamic_range
      FROM vals
    ), eq AS (
      SELECT doc_id, levels_used, dynamic_range,
             list_transform(s.v, x ->
               (len(list_filter(s.v, y -> y <= x)) * 31) // {_HE_PIX})
               AS veq
      FROM stats s
    )
    SELECT doc_id,
           CAST(levels_used AS BIGINT) AS levels_used,
           CAST(dynamic_range AS BIGINT) AS dynamic_range,
           CAST(list_max(veq) - list_min(veq) AS BIGINT)
             AS equalized_range,
           CAST(list_sum(list_transform(range(0, 32), lvl ->
             CASE WHEN len(list_filter(veq, x -> x = lvl)) > 0
             THEN 1 ELSE 0 END)) AS BIGINT) AS equalized_levels
    FROM eq ORDER BY doc_id LIMIT 25
    """,
)
def histogram_equalization_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Histogram-equalization audit over 64-byte grayscale tiles
    (5-bit levels): per image, the levels in use and dynamic range
    BEFORE, and the range/levels AFTER the classic CDF remap
    v' = ⌊cdf(v)·31⌋ — equalization's contract is stretching the
    range toward full scale while never inventing levels, and both
    properties are checked here with exact integer arithmetic (the
    audit that decides whether a contrast-normalization stage is
    worth adding to an image-ingest pipeline).

    Determinism: quantized levels, CDF counts, and remapped values
    are all exact integers.

    Scale: per-image array HOFs, map-side (32-level histograms keep
    the per-pixel CDF lookup O(levels)); the LIMIT bounds the output
    frame, not the computation shape — at corpus scale the same audit
    aggregates per source instead of per image.
    """
    m = (
        load(spark, sf_dir, "documents")
        .where(F.length("text") >= _HE_PIX)
        .select("doc_id", F.substring("text", 1, _HE_PIX).alias("px"))
    )
    vals = m.select(
        "doc_id",
        F.expr(
            f"""
            transform(sequence(1, {_HE_PIX}),
              i -> ascii(substring(px, i, 1)) div 8)
            """
        ).alias("v"),
    )
    stats = vals.select(
        "doc_id",
        "v",
        F.expr(
            """
            aggregate(sequence(0, 31), 0, (a, lvl) ->
              a + IF(size(filter(v, x -> x = lvl)) > 0, 1, 0))
            """
        ).alias("levels_used"),
        F.expr("array_max(v) - array_min(v)").alias("dynamic_range"),
    )
    eq = stats.select(
        "doc_id",
        "levels_used",
        "dynamic_range",
        F.expr(
            f"""
            transform(v, x ->
              (size(filter(v, y -> y <= x)) * 31) div {_HE_PIX})
            """
        ).alias("veq"),
    )
    return (
        eq.select(
            "doc_id",
            F.col("levels_used").cast("bigint").alias("levels_used"),
            F.col("dynamic_range").cast("bigint").alias("dynamic_range"),
            F.expr("CAST(array_max(veq) - array_min(veq) AS BIGINT)").alias(
                "equalized_range"
            ),
            F.expr(
                """
                CAST(aggregate(sequence(0, 31), 0, (a, lvl) ->
                  a + IF(size(filter(veq, x -> x = lvl)) > 0, 1, 0))
                  AS BIGINT)
                """
            ).alias("equalized_levels"),
        )
        .orderBy("doc_id")
        .limit(25)
    )
