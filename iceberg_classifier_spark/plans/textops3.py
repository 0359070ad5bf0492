"""Text wave 3: RAKE keyphrase extraction and a posting-list
delta+varint compression audit — retrieval-stack depth (keyphrases for
indexing, storage accounting for the inverted index itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.functions.text import STOPWORDS
from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_RAKE_STOPS = sorted({w for ws in STOPWORDS.values() for w in ws})
_RAKE_TOPK = 20
_RAKE_MIN = 2
_RAKE_MAX = 4


def _stops_sql() -> str:
    return "[" + ", ".join(f"'{w}'" for w in _RAKE_STOPS) + "]"


@query(
    "rake_keyphrases",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ), pos AS (
      SELECT doc_id, i, w[i] AS tok,
             CASE WHEN list_contains({_stops_sql()}, w[i]) THEN 1 ELSE 0 END
               AS is_stop
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i
            FROM toks)
    ), runs AS (
      SELECT doc_id, i, tok, is_stop,
             sum(is_stop) OVER (PARTITION BY doc_id ORDER BY i
                                ROWS UNBOUNDED PRECEDING) AS run
      FROM pos
    ), words AS (
      -- r10 lean rewrite: the old `list(tok ORDER BY i) GROUP BY doc, run`
      -- built one LIST aggregate state per stopword-free run — a
      -- non-spillable fold that OOM'd an 80 GB DuckDB at sf10 (r9's
      -- documented infeasible-skip). Runs are <= {_RAKE_MAX} words, so
      -- bounded lead()s reconstruct each phrase with NO list state:
      -- every aggregate below has fixed-size or string states, all
      -- spillable.
      SELECT doc_id, run, tok,
             CAST(count(*) OVER (PARTITION BY doc_id, run) AS BIGINT)
               AS rlen,
             row_number() OVER (PARTITION BY doc_id, run ORDER BY i) AS k,
             lead(tok, 1) OVER (PARTITION BY doc_id, run ORDER BY i) AS t2,
             lead(tok, 2) OVER (PARTITION BY doc_id, run ORDER BY i) AS t3,
             lead(tok, 3) OVER (PARTITION BY doc_id, run ORDER BY i) AS t4
      FROM runs WHERE is_stop = 0
    ), wstat AS (
      SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(rlen) AS BIGINT) AS deg
      FROM words WHERE rlen BETWEEN {_RAKE_MIN} AND {_RAKE_MAX}
      GROUP BY 1
    ), pocc AS (
      SELECT concat_ws(' ', tok, t2, t3, t4) AS phrase,
             CAST(count(*) AS BIGINT) AS n_occ
      FROM words
      WHERE k = 1 AND rlen BETWEEN {_RAKE_MIN} AND {_RAKE_MAX}
      GROUP BY 1
    ), scored AS (
      SELECT p.phrase, p.n_occ,
             CAST(sum(w.deg * 1000000 // w.freq) AS BIGINT) AS score_micro
      FROM (SELECT phrase, n_occ, unnest(string_split(phrase, ' ')) AS word
            FROM pocc) p
      JOIN wstat w USING (word)
      GROUP BY 1, 2
    )
    SELECT phrase, n_occ, score_micro,
           CAST(row_number() OVER (ORDER BY score_micro DESC, phrase)
                AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= {_RAKE_TOPK}
    ORDER BY rank
    """,
)
def rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs ({_RAKE_MIN}–{_RAKE_MAX} words);
    each word scores deg/freq (degree = Σ phrase lengths it appears in),
    a phrase scores the sum of its words' ratios — computed in exact
    integer micro-units (deg·10⁶ div freq per word, then an integer sum,
    so the fold order can't matter) — and the corpus-level top-{_RAKE_TOPK}
    keyphrases are reported. The stoplist is the union of the engine's
    language profiles.

    Scale: run-splitting is one per-doc window over the token explode
    (keyed by doc — parallel across docs); word stats and phrase scores
    are map-combinable aggregates; the word-stat join broadcasts the
    vocabulary-sized dim; top-k is a bounded TakeOrdered merge.
    """
    stops = F.array(*[F.lit(w) for w in _RAKE_STOPS])
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("w")
    )
    pos = toks.select(
        "doc_id",
        F.posexplode("w").alias("i", "tok"),
    ).select(
        "doc_id",
        "i",
        "tok",
        F.array_contains(stops, F.col("tok")).cast("int").alias("is_stop"),
    )
    wrun = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = pos.withColumn("run", F.sum("is_stop").over(wrun))
    phr = (
        runs.where(F.col("is_stop") == 0)
        .groupBy("doc_id", "run")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(i, tok))), s -> s.tok)")
            .alias("ph")
        )
        .where(F.size("ph").between(_RAKE_MIN, _RAKE_MAX))
    )
    wstat = (
        phr.select(F.explode("ph").alias("word"), F.size("ph").alias("plen"))
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum("plen").cast("bigint").alias("deg"),
        )
    )
    pocc = phr.groupBy(
        F.array_join("ph", " ").alias("phrase"), F.col("ph")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_occ"))
    scored = (
        pocc.select("phrase", "n_occ", F.explode("ph").alias("word"))
        .join(F.broadcast(wstat), "word")
        .groupBy("phrase", "n_occ")
        .agg(
            F.sum(F.expr("deg * 1000000 div freq")).cast("bigint").alias(
                "score_micro"
            )
        )
    )
    top = scored.orderBy(F.desc("score_micro"), "phrase").limit(_RAKE_TOPK)
    return top.select(
        "phrase",
        "n_occ",
        "score_micro",
        F.row_number()
        .over(Window.orderBy(F.desc("score_micro"), "phrase"))
        .cast("int")
        .alias("rank"),
    ).orderBy("rank")


@query(
    "posting_list_compression_audit",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(trim(text), ' ')))
               AS word
      FROM documents
    ), post AS (
      SELECT word, list(doc_id ORDER BY doc_id) AS ids,
             CAST(count(*) AS BIGINT) AS df
      FROM toks GROUP BY word
    ), gaps AS (
      SELECT word, df,
             list_transform(generate_series(1, len(ids)),
               i -> CASE WHEN i = 1 THEN ids[1] + 1
                         ELSE ids[i] - ids[i - 1] END) AS g
      FROM post
    ), cost AS (
      SELECT word, df,
             CAST(list_sum(list_transform(g, v ->
               CASE WHEN v < 128 THEN 1
                    WHEN v < 16384 THEN 2
                    WHEN v < 2097152 THEN 3
                    WHEN v < 268435456 THEN 4
                    ELSE 5 END)) AS BIGINT) AS vbytes
      FROM gaps
    )
    SELECT CAST(length(printf('%b', df)) - 1 AS INTEGER) AS df_bucket,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(df) AS BIGINT) AS postings,
           CAST(sum(df) * 8 AS BIGINT) AS raw_bytes,
           CAST(sum(vbytes) AS BIGINT) AS varint_bytes,
           CAST(sum(vbytes) * 1000000 // (sum(df) * 8) AS BIGINT)
             AS ratio_ppm
    FROM cost GROUP BY 1 ORDER BY 1
    """,
)
def posting_list_compression_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index storage audit: per term, the sorted doc-id posting
    list is delta-encoded (first gap = id+1 so every gap ≥ 1) and costed
    at varint bytes (1 B under 2⁷, 2 B under 2¹⁴, …) — the Lucene/
    PforDelta-style accounting that decides index layout. Terms roll up
    by ⌊log₂ df⌋ bucket (exact via binary-string length, no float log):
    high-df terms compress hardest (dense ids → tiny gaps), and the
    report quantifies it as varint vs raw-int64 bytes in exact ppm.

    Scale: posting assembly is the standard groupBy(word) with doc-level
    distinct tokens (map-side combined); gap/varint costing is per-row
    JVM list math over each term's own list; the rollup is ~30 buckets.
    """
    toks = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.trim(F.col("text")), " "))).alias(
            "word"
        ),
    )
    post = toks.groupBy("word").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids"),
        F.count(F.lit(1)).cast("bigint").alias("df"),
    )
    cost = post.select(
        "word",
        "df",
        F.expr(
            """
            CAST(aggregate(
              transform(sequence(1, size(ids)),
                i -> CASE WHEN i = 1 THEN element_at(ids, 1) + 1
                          ELSE element_at(ids, i) - element_at(ids, i - 1)
                     END),
              0L,
              (a, v) -> a + CASE WHEN v < 128 THEN 1
                                 WHEN v < 16384 THEN 2
                                 WHEN v < 2097152 THEN 3
                                 WHEN v < 268435456 THEN 4
                                 ELSE 5 END) AS BIGINT)
            """
        ).alias("vbytes"),
    )
    return (
        cost.groupBy(
            (F.length(F.bin("df")) - 1).cast("int").alias("df_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum("df").cast("bigint").alias("postings"),
            (F.sum("df") * 8).cast("bigint").alias("raw_bytes"),
            F.sum("vbytes").cast("bigint").alias("varint_bytes"),
            F.expr(
                "CAST(sum(vbytes) * 1000000 div (sum(df) * 8) AS BIGINT)"
            ).alias("ratio_ppm"),
        )
        .orderBy("df_bucket")
    )


# ---------------------------------------------------------------------------
# Chance-corrected classifier agreement (Cohen's kappa)
# ---------------------------------------------------------------------------


def _kappa_oracle() -> str:
    from iceberg_classifier_spark.plans.textops import _duck_hits, _duck_lang_guess

    hits = ", ".join(f"{_duck_hits(l)} AS h_{l}" for l in sorted(STOPWORDS))
    return f"""
    WITH h AS (
      SELECT doc_id, lang, {hits} FROM documents
    ), g AS (
      SELECT lang AS actual, {_duck_lang_guess()} AS guessed FROM h
    ), cm AS (
      SELECT actual, guessed, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY 1, 2
    ), m AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(CASE WHEN actual = guessed THEN c ELSE 0 END) AS BIGINT)
               AS diag
      FROM cm
    ), rc AS (
      SELECT CAST(sum(r.rt * c.ct) AS BIGINT) AS sum_rc
      FROM (SELECT actual AS k, sum(c) AS rt FROM cm GROUP BY 1) r
      JOIN (SELECT guessed AS k, sum(c) AS ct FROM cm GROUP BY 1) c
        ON r.k = c.k
    )
    SELECT m.n AS n_docs, m.diag AS n_agree,
           CAST(m.diag * 1000000 // m.n AS BIGINT) AS po_ppm,
           CAST(rc.sum_rc * 1000000 // (m.n * m.n) AS BIGINT) AS pe_ppm,
           round((m.diag * m.n - rc.sum_rc) * 1.0
                 / (m.n * m.n - rc.sum_rc), 6) AS kappa
    FROM m CROSS JOIN rc
    """


@query("cohens_kappa_langid", oracle=_kappa_oracle())
def cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the stopword-profile language classifier and
    the labeled language — chance-corrected agreement, the metric that
    exposes a classifier that merely predicts the majority class (raw
    accuracy hides it; lang_id_confusion gives the matrix, this gives the
    one number reviewers ask for). Exact arithmetic throughout: kappa =
    (diag·n − Σ row_k·col_k) / (n² − Σ row_k·col_k) is an integer ratio
    (the 1/n normalizations cancel), so the only float is the final
    6dp display division — bit-exact across engines by construction.

    Scale: one scan builds the confusion matrix map-side (|langs|² cells);
    everything downstream runs on that dimension frame.
    """
    from iceberg_classifier_spark.functions import text as T
    from iceberg_classifier_spark.sources.tables import load as _load

    d = _load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    cm = (
        d.select(F.col("lang").alias("actual"), T.lang_guess(toks).alias("guessed"))
        .groupBy("actual", "guessed")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    m = cm.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.when(F.col("actual") == F.col("guessed"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("diag"),
    )
    r = cm.groupBy(F.col("actual").alias("k")).agg(F.sum("c").alias("rt"))
    c = cm.groupBy(F.col("guessed").alias("k")).agg(F.sum("c").alias("ct"))
    rc = (
        r.join(c, "k")
        .agg(F.sum(F.col("rt") * F.col("ct")).cast("bigint").alias("sum_rc"))
    )
    return (
        m.crossJoin(F.broadcast(rc))
        .select(
            F.col("n").alias("n_docs"),
            F.col("diag").alias("n_agree"),
            F.expr("diag * 1000000 div n").cast("bigint").alias("po_ppm"),
            F.expr("sum_rc * 1000000 div (n * n)").cast("bigint").alias("pe_ppm"),
            F.round(
                (F.col("diag") * F.col("n") - F.col("sum_rc"))
                * 1.0
                / (F.col("n") * F.col("n") - F.col("sum_rc")),
                6,
            ).alias("kappa"),
        )
    )
