"""Dedup wave 2: containment (subset) detection and Haar wavelet
energy.

Jaccard resemblance misses QUOTES: a short document wholly contained
in a long one has low Jaccard but containment ≈ 1 — Broder's second
measure, and the one quote/excerpt detection actually needs. The Haar
energy decomposition is the multiresolution view of a series: which
time scales carry the variance (daily noise vs weekly structure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_CONT_N = 5  # shingle width (tokens)
_CONT_DF_CAP = 2000
_CONT_MIN = 500000  # report pairs with max containment >= 0.5 (ppm)


@query(
    "containment_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
    ), sh AS (
      SELECT doc_id, sh
      FROM (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 range(1, greatest(len(ws) - {_CONT_N - 1}, 0) + 1),
                 i -> array_to_string(ws[CAST(i AS BIGINT):
                                        CAST(i + {_CONT_N - 1} AS BIGINT)],
                                      ' ')))) AS sh
        FROM toks
      )
    ), sizes AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1
    ), posting AS (
      SELECT sh, list(doc_id ORDER BY doc_id) AS docs
      FROM sh GROUP BY sh HAVING count(*) <= {_CONT_DF_CAP}
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      WHERE a.sh IN (SELECT sh FROM posting)
      GROUP BY 1, 2
    ), scored AS (
      SELECT p.doc_a, p.doc_b, p.inter, sa.n_sh AS size_a, sb.n_sh AS size_b,
             CAST(p.inter * 1000000 // sa.n_sh AS BIGINT) AS cont_ab_ppm,
             CAST(p.inter * 1000000 // sb.n_sh AS BIGINT) AS cont_ba_ppm
      FROM pairs p
      JOIN sizes sa ON sa.doc_id = p.doc_a
      JOIN sizes sb ON sb.doc_id = p.doc_b
    )
    SELECT doc_a, doc_b, inter, size_a, size_b,
           cont_ab_ppm, cont_ba_ppm,
           (greatest(cont_ab_ppm, cont_ba_ppm) >= 800000
            AND least(size_a, size_b) * 2 <= greatest(size_a, size_b))
             AS subset_excerpt
    FROM scored
    WHERE greatest(cont_ab_ppm, cont_ba_ppm) >= {_CONT_MIN}
    ORDER BY doc_a, doc_b
    """,
)
def containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment (subset) near-dup detection: for candidate document
    pairs, the ASYMMETRIC overlap |A∩B|/|A| and |A∩B|/|B| over
    {_CONT_N}-token shingles — Broder's containment measure, which
    catches quotes and excerpts that Jaccard resemblance
    (dedup_ngram_jaccard) structurally misses (a 50-shingle quote
    inside a 1000-shingle article has Jaccard 0.05 but containment
    1.0). Pairs with max containment ≥ 0.5 are reported; the
    subset_excerpt flag marks high-containment pairs with ≥2× size
    disparity — the quote signature. Intersections and sizes are exact
    ints; containments are exact ppm.

    Scale: candidates come from df-capped shingle POSTING LISTS (the
    dedup_ngram_jaccard nested-explode machinery — pair volume scales
    with collision density, never n²), with each doc's shingle-set size
    carried inside the posting struct so no sizes dimension is joined
    at all. The earlier spelling broadcast the df-filtered shingle SET
    back against the shingle stream — a frame that scales with corpus
    VOCABULARY, which blew past the broadcast ceiling on the 10×-organic
    frame (r8 sweep: Py4JJavaError at sf10, 75M distinct 5-shingles);
    posting lists shuffle once on the shingle key instead and nothing
    here is broadcast.
    """
    from iceberg_classifier_spark.functions import text as T

    shing = load(spark, sf_dir, "documents").select(
        "doc_id",
        T.shingles(F.split(F.trim(F.col("text")), " "), _CONT_N).alias("sh"),
    )
    sh = shing.select(
        "doc_id",
        F.size("sh").cast("bigint").alias("n_sh"),
        F.explode("sh").alias("sh_str"),
    )
    posting = (
        sh.groupBy("sh_str")
        .agg(
            F.sort_array(F.collect_list(F.struct("doc_id", "n_sh"))).alias(
                "lst"
            )
        )
        .filter(F.size("lst") <= _CONT_DF_CAP)
    )
    # nested explode: peak row width is one posting list; sort_array
    # guarantees doc_a < doc_b inside each list
    pairs = (
        posting.select(F.posexplode("lst").alias("i", "a"), "lst")
        .select(
            "a",
            F.explode(F.expr("slice(lst, i + 2, size(lst))")).alias("b"),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("size_a"),
            F.col("b.n_sh").alias("size_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    scored = pairs.select(
        "doc_a",
        "doc_b",
        "inter",
        "size_a",
        "size_b",
        F.expr("CAST(inter * 1000000 div size_a AS BIGINT)").alias(
            "cont_ab_ppm"
        ),
        F.expr("CAST(inter * 1000000 div size_b AS BIGINT)").alias(
            "cont_ba_ppm"
        ),
    )
    return (
        scored.where(
            F.greatest("cont_ab_ppm", "cont_ba_ppm") >= _CONT_MIN
        )
        .select(
            "doc_a",
            "doc_b",
            "inter",
            "size_a",
            "size_b",
            "cont_ab_ppm",
            "cont_ba_ppm",
            (
                (F.greatest("cont_ab_ppm", "cont_ba_ppm") >= 800000)
                & (
                    F.least("size_a", "size_b") * 2
                    <= F.greatest("size_a", "size_b")
                )
            ).alias("subset_excerpt"),
        )
        .orderBy("doc_a", "doc_b")
    )


_HAAR_N = 16  # dyadic window: first 16 days


def _haar_energies() -> list[tuple[int, int, list[tuple[int, int]]]]:
    """(level, block, [(start, width_half)]) detail-coefficient layout
    for a {_HAAR_N}-point Haar transform: level k has N/2^k details,
    each (mean of left half − mean of right half) / 2 over a 2^k block."""
    out = []
    n = _HAAR_N
    k = 1
    while 2**k <= n:
        block = 2**k
        coeffs = [(j * block + 1, block // 2) for j in range(n // block)]
        out.append((k, block, coeffs))
        k += 1
    return out


def _haar_level_sql(coeffs: list[tuple[int, int]], idx) -> str:
    """Sum of squared details for one level — shared expression text;
    idx(start, len) renders an inclusive slice-sum for the dialect."""
    terms = []
    for start, half in coeffs:
        left = idx(start, half)
        right = idx(start + half, half)
        terms.append(
            f"((({left}) / {half}.0 - ({right}) / {half}.0) / 2)"
            f" * ((({left}) / {half}.0 - ({right}) / {half}.0) / 2)"
        )
    return " + ".join(terms)


def _duck_idx(start: int, ln: int) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" xs[{start}:{start + ln - 1}]), (a, v) -> a + v)"
    )


def _spark_idx(start: int, ln: int) -> str:
    return (
        f"aggregate(slice(xs, {start}, {ln}), CAST(0.0 AS DOUBLE),"
        f" (a, v) -> a + v)"
    )


_HAAR_DUCK_LEVELS = {
    k: _haar_level_sql(coeffs, _duck_idx) for k, _, coeffs in _haar_energies()
}
_HAAR_SPARK_LEVELS = {
    k: _haar_level_sql(coeffs, _spark_idx) for k, _, coeffs in _haar_energies()
}

_HAAR_DUCK_UNION = "\nUNION ALL\n".join(
    f"SELECT {k} AS level, {_HAAR_N // (2 ** k)} AS n_coeffs,"
    f" ({expr}) AS energy FROM series"
    for k, expr in _HAAR_DUCK_LEVELS.items()
)


@query(
    "haar_wavelet_energy",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), series AS (
      SELECT list(x ORDER BY day)[1:{_HAAR_N}] AS xs FROM daily
    ), lv AS (
      {_HAAR_DUCK_UNION}
    ), tot AS (
      SELECT {" + ".join(f"({e})" for e in _HAAR_DUCK_LEVELS.values())} AS te
      FROM series
    )
    SELECT CAST(lv.level AS BIGINT) AS level,
           CAST(lv.n_coeffs AS BIGINT) AS n_coeffs,
           round(lv.energy, 6) AS energy,
           round(lv.energy / t.te, 6) AS energy_share
    FROM lv CROSS JOIN tot t ORDER BY level
    """,
)
def haar_wavelet_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet energy decomposition of the daily event-count
    series (first {_HAAR_N} days — a dyadic window): per level k, the
    detail coefficients (half-block mean differences over 2^k-day
    blocks) and their squared energy — the multiresolution answer to
    "which time scale carries the variance" (level 1 = day-to-day
    noise, level 3 = ~weekly structure) that complements the Fourier
    view (ts_decomposition_daily) with localized, O(n) analysis. All
    block sums are ordered folds over slices of the SAME day-sorted
    array; the per-level energies are identical double expression
    trees, 6dp-exact across engines.

    Scale: one map-side-combined groupBy(day); the transform is
    expression work on a bounded array. Long-series wavelets
    distribute as the classic pairwise-reduction pyramid —
    per-partition partial transforms, log-depth merge.
    """
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    series = daily.agg(
        F.expr(
            "slice(transform(array_sort(collect_list(struct(day, x))),"
            f" s -> s.x), 1, {_HAAR_N})"
        ).alias("xs")
    )
    frames = []
    for k, expr in _HAAR_SPARK_LEVELS.items():
        frames.append(
            series.select(
                F.lit(k).cast("bigint").alias("level"),
                F.lit(_HAAR_N // (2**k)).cast("bigint").alias("n_coeffs"),
                F.expr(expr).alias("energy"),
            )
        )
    lv = frames[0]
    for fr in frames[1:]:
        lv = lv.unionByName(fr)
    # fixed-order total (identical expression text in both engines) —
    # never an aggregation whose float order could drift
    te_expr = " + ".join(f"({e})" for e in _HAAR_SPARK_LEVELS.values())
    tot = series.select(F.expr(te_expr).alias("te"))
    return (
        lv.crossJoin(F.broadcast(tot))
        .select(
            "level",
            "n_coeffs",
            F.round("energy", 6).alias("energy"),
            F.round(F.col("energy") / F.col("te"), 6).alias("energy_share"),
        )
        .orderBy("level")
    )
