"""Text wave 4 + experimentation validation: Burrows' Delta stylometry
and A/A test calibration.

Burrows' Delta is the standard authorship-attribution distance
(z-scored function-word frequencies); the A/A harness replays the
Welch test over many deterministic null assignments and checks the
false-positive rate against α — how experimentation platforms validate
their stats machinery end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_BD_TOPW = 10  # most-frequent words = the "function word" profile


@query(
    "stylometry_burrows_delta",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(string_split(trim(text), ' ')) AS word
      FROM documents
    ), topw AS (
      SELECT word FROM (
        SELECT word, count(*) AS c FROM toks GROUP BY 1
        ORDER BY c DESC, word LIMIT {_BD_TOPW}
      )
    ), src_tot AS (
      SELECT source, CAST(count(*) AS BIGINT) AS nt FROM toks GROUP BY 1
    ), cell AS (
      SELECT t.source, t.word, CAST(count(*) AS BIGINT) AS c
      FROM toks t JOIN topw USING (word)
      GROUP BY 1, 2
    ), freq AS (
      SELECT s.source, w.word,
             CAST(coalesce(c.c, 0) * 1000000 // s.nt AS BIGINT) AS fppm
      FROM src_tot s CROSS JOIN topw w
      LEFT JOIN cell c ON c.source = s.source AND c.word = w.word
    ), wstat AS (
      SELECT word,
             CAST(count(*) AS DOUBLE) AS ns,
             CAST(CAST(sum(fppm) AS BIGINT) AS DOUBLE) AS s,
             CAST(CAST(sum(fppm * fppm) AS BIGINT) AS DOUBLE) AS ss
      FROM freq GROUP BY 1
    ), z AS (
      SELECT f.source, f.word,
             (f.fppm - w.s / w.ns)
               / sqrt((w.ss - w.s * w.s / w.ns) / (w.ns - 1)) AS zv
      FROM freq f JOIN wstat w USING (word)
    ), pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(abs(a.zv - b.zv) ORDER BY a.word)),
               (x, v) -> x + v) / {_BD_TOPW} AS delta
      FROM z a JOIN z b ON a.word = b.word AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, round(delta, 6) AS burrows_delta
    FROM pairs ORDER BY src_a, src_b
    """,
)
def stylometry_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between every pair of sources: z-score each
    source's relative frequency (exact ppm) of the top-{_BD_TOPW}
    corpus words across sources, then Delta(a,b) = mean |z_a − z_b| —
    the classic stylometric distance used for authorship attribution
    and, in corpus curation, for spotting sources that are stylistic
    near-clones (crawler mirrors) versus genuinely distinct registers.
    Frequencies are exact integer ppm; per-word z stats come from exact
    sums over the source dimension; each pair's {_BD_TOPW} |Δz| terms
    sum in a word-SORTED ordered fold — bit-exact at 6dp.

    Scale: one token pass (broadcast-pruned to the top-word profile) +
    aggregates on the |sources|×{_BD_TOPW} profile frame; the pair join
    is over the tiny source dimension (profiles, never documents). At
    10⁶ sources, the pair stage becomes the embedding-cosine LSH block
    on the z-vectors — the profile build is unchanged.
    """
    toks = load(spark, sf_dir, "documents").select(
        "source", F.explode(F.split(F.trim(F.col("text")), " ")).alias("word")
    )
    topw = (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "word")
        .limit(_BD_TOPW)
        .select("word")
    )
    src_tot = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("nt")
    )
    cell = (
        toks.join(F.broadcast(topw), "word")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    freq = (
        src_tot.crossJoin(F.broadcast(topw))
        .join(cell, ["source", "word"], "left")
        .select(
            "source",
            "word",
            F.expr("coalesce(c, 0) * 1000000 div nt").cast("bigint").alias(
                "fppm"
            ),
        )
    )
    wstat = freq.groupBy("word").agg(
        F.count(F.lit(1)).cast("double").alias("ns"),
        F.sum("fppm").cast("bigint").cast("double").alias("s"),
        F.sum(F.col("fppm") * F.col("fppm"))
        .cast("bigint")
        .cast("double")
        .alias("ss"),
    )
    z = freq.join(F.broadcast(wstat), "word").select(
        "source",
        "word",
        (
            (F.col("fppm") - F.col("s") / F.col("ns"))
            / F.sqrt(
                (F.col("ss") - F.col("s") * F.col("s") / F.col("ns"))
                / (F.col("ns") - 1)
            )
        ).alias("zv"),
    )
    a = z.select(
        F.col("source").alias("src_a"), F.col("word").alias("wa"), F.col("zv").alias("za")
    )
    b = z.select(
        F.col("source").alias("src_b"), F.col("word").alias("wb"), F.col("zv").alias("zb")
    )
    pairs = (
        a.join(b, (F.col("wa") == F.col("wb")) & (F.col("src_a") < F.col("src_b")))
        .select("src_a", "src_b", "wa", F.abs(F.col("za") - F.col("zb")).alias("dz"))
        .groupBy("src_a", "src_b")
        .agg(
            (
                F.expr(
                    """
                    aggregate(
                      transform(array_sort(collect_list(struct(wa, dz))),
                                x -> x.dz),
                      CAST(0.0 AS DOUBLE), (x, v) -> x + v)
                    """
                )
                / _BD_TOPW
            ).alias("delta")
        )
    )
    return pairs.select(
        "src_a", "src_b", F.round("delta", 6).alias("burrows_delta")
    ).orderBy("src_a", "src_b")


_AA_RUNS = 20  # deterministic null assignments
_HEX = "0123456789abcdef"


@query(
    "aa_test_calibration",
    oracle=f"""
    WITH runs AS (SELECT unnest(range(1, {_AA_RUNS} + 1)) AS run_id),
    assigned AS (
      SELECT r.run_id,
             (strpos('{_HEX}', substr(md5(CAST(e.user_id AS VARCHAR)
                || '_' || CAST(r.run_id AS VARCHAR)), 1, 1)) - 1) % 2
               AS arm,
             CAST(round(e.value * 100) AS BIGINT) AS cents
      FROM events e CROSS JOIN runs r
    ), cell AS (
      SELECT run_id, arm,
             CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) AS s,
             CAST(CAST(sum(cents * cents) AS BIGINT) AS DOUBLE) AS ss,
             CAST(count(*) AS DOUBLE) AS n1
      FROM assigned GROUP BY 1, 2
    ), t AS (
      SELECT run_id,
             max(CASE WHEN arm = 1 THEN s / n1 END) AS m1,
             max(CASE WHEN arm = 0 THEN s / n1 END) AS m0,
             max(CASE WHEN arm = 1
                      THEN (ss - s * s / n1) / (n1 - 1) / n1 END) AS v1,
             max(CASE WHEN arm = 0
                      THEN (ss - s * s / n1) / (n1 - 1) / n1 END) AS v0,
             CAST(max(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_t,
             CAST(max(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_c
      FROM cell GROUP BY 1
    ), scored AS (
      SELECT run_id, n_t, n_c,
             (m1 - m0) / sqrt(v1 + v0) AS tstat
      FROM t
    )
    SELECT run_id, n_t, n_c,
           round(tstat, 6) AS t_stat,
           (abs(tstat) > 1.96) AS false_positive,
           CAST(sum(CASE WHEN abs(tstat) > 1.96 THEN 1 ELSE 0 END)
                OVER () AS BIGINT) AS n_false_positives
    FROM scored ORDER BY run_id
    """,
)
def aa_test_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/A test calibration: replay the Welch two-sample test over
    {_AA_RUNS} deterministic NULL assignments (md5-parity of
    (user_id, run) — no real treatment anywhere) and count how many
    reach |t| > 1.96. A healthy stats pipeline false-positives ≈ 5% of
    runs; a broken one (biased assignment, dependent units, variance
    miscounted) shows up immediately. This is the end-to-end validation
    experimentation platforms run before trusting any real experiment —
    the empirical companion to the closed-form ab_power_analysis. All
    per-arm sums are exact int64; t-stats are identical double
    expressions; the run dimension is {_AA_RUNS} rows.

    Scale: the events×runs expansion is map-only (a {_AA_RUNS}-row
    broadcast), aggregated map-side into {_AA_RUNS}×2 cells — one
    shuffle of dimension-sized partials regardless of corpus size.
    """
    runs = spark.range(1, _AA_RUNS + 1).select(F.col("id").alias("run_id"))
    e = load(spark, sf_dir, "events").select(
        "user_id", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    # randomization is per USER: collapse events to per-user sufficient
    # statistics first (one map-side agg), then expand users × runs — the
    # md5 coin flips per (user, run), not per (event, run), cutting the
    # expanded frame by the events-per-user factor; cell sums of the
    # user partials equal the event-level sums exactly
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_u"),
        F.sum("cents").cast("bigint").alias("s_u"),
        F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("ss_u"),
    )
    assigned = per_user.crossJoin(F.broadcast(runs)).select(
        "run_id",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("user_id").cast("string"),
                            F.lit("_"),
                            F.col("run_id").cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    1,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
        ).alias("arm"),
        "n_u",
        "s_u",
        "ss_u",
    )
    cell = assigned.groupBy("run_id", "arm").agg(
        F.sum("n_u").cast("bigint").alias("n"),
        F.sum("s_u").cast("bigint").cast("double").alias("s"),
        F.sum("ss_u").cast("bigint").cast("double").alias("ss"),
        F.sum("n_u").cast("double").alias("n1"),
    )

    def pick(arm, expr):
        return F.max(F.when(F.col("arm") == arm, expr))

    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n1")) / (
        F.col("n1") - 1
    ) / F.col("n1")
    t = cell.groupBy("run_id").agg(
        pick(1, F.col("s") / F.col("n1")).alias("m1"),
        pick(0, F.col("s") / F.col("n1")).alias("m0"),
        pick(1, var).alias("v1"),
        pick(0, var).alias("v0"),
        pick(1, F.col("n")).cast("bigint").alias("n_t"),
        pick(0, F.col("n")).cast("bigint").alias("n_c"),
    )
    scored = t.select(
        "run_id",
        "n_t",
        "n_c",
        ((F.col("m1") - F.col("m0")) / F.sqrt(F.col("v1") + F.col("v0"))).alias(
            "tstat"
        ),
    )
    from pyspark.sql import Window

    wall = Window.partitionBy()
    return scored.select(
        "run_id",
        "n_t",
        "n_c",
        F.round("tstat", 6).alias("t_stat"),
        (F.abs("tstat") > 1.96).alias("false_positive"),
        F.sum(F.when(F.abs("tstat") > 1.96, 1).otherwise(0))
        .over(wall)
        .cast("bigint")
        .alias("n_false_positives"),
    ).orderBy("run_id")
