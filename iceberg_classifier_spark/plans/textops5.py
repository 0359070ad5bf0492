"""Text wave 5: readability scoring, a full multinomial naive-Bayes
text classifier (train + predict + confusion, all in the engine), and
MOSS-style winnowing fingerprints.

Readability (Flesch / Flesch-Kincaid) is a standard quality gate in
LLM-corpus curation; naive Bayes is the classic count-based text
classifier and distributes as two aggregates and a broadcast join;
winnowing (Schleimer-Wilkerson-Aiken, SIGMOD'03 — the MOSS algorithm)
is the position-aware fingerprinting scheme that guarantees any match
of length ≥ k+w−1 shares a fingerprint, unlike plain minhash which has
no locality guarantee.

Reference: extends the `lang_id` / `quality_score` / `doc_fingerprint`
family (plans/textops.py) with the supervised and locality-sensitive
members of the text-analysis surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.analytics2 import _md5_prefix_sql
from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load, load_parallel


@query(
    "readability_scores",
    oracle="""
    WITH per_doc AS (
      SELECT lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
             CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT)
               AS syllables,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS BIGINT) AS sentences
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(words) AS BIGINT) AS words,
           CAST(sum(syllables) AS BIGINT) AS syllables,
           CAST(sum(sentences) AS BIGINT) AS sentences,
           round(sum(words) * 1.0 / sum(sentences), 4)
             AS words_per_sentence,
           round(sum(syllables) * 1.0 / sum(words), 4)
             AS syllables_per_word,
           round(206.835 - 1.015 * (sum(words) * 1.0 / sum(sentences))
                 - 84.6 * (sum(syllables) * 1.0 / sum(words)), 4)
             AS flesch_ease,
           round(0.39 * (sum(words) * 1.0 / sum(sentences))
                 + 11.8 * (sum(syllables) * 1.0 / sum(words)) - 15.59, 4)
             AS fk_grade
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled Flesch reading-ease and Flesch-Kincaid grade per language:
    206.835 − 1.015·(W/S) − 84.6·(Syl/W) and 0.39·(W/S) +
    11.8·(Syl/W) − 15.59 over exact per-language integer totals of
    words (space tokens), syllables (vowel-group runs `[aeiouy]+` — the
    standard dictionary-free approximation), and sentences
    (`[.!?]+` runs, floored at 1 per doc). Pooled-ratio scoring keeps
    the group statistic a pure function of integer sums — no
    mean-of-floats shuffle-order hazard — which is also the right
    estimator (per-doc Flesch means over-weight short docs).

    Scale: one projection computes three regexp counts per doc
    map-side; the groupBy(lang) carries only integer partial sums with
    map-side combine; scoring runs on the ≤|langs| summary rows.
    """
    d = load(spark, sf_dir, "documents")
    per_doc = d.select(
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("words"),
        F.expr("regexp_count(text, '[aeiouy]+')").cast("bigint").alias(
            "syllables"
        ),
        F.greatest(
            F.expr("regexp_count(text, '[.!?]+')"), F.lit(1)
        )
        .cast("bigint")
        .alias("sentences"),
    )
    g = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("words").cast("bigint").alias("words"),
        F.sum("syllables").cast("bigint").alias("syllables"),
        F.sum("sentences").cast("bigint").alias("sentences"),
    )
    wps = F.col("words") * 1.0 / F.col("sentences")
    spw = F.col("syllables") * 1.0 / F.col("words")
    return g.select(
        "lang",
        "n_docs",
        "words",
        "syllables",
        "sentences",
        F.round(wps, 4).alias("words_per_sentence"),
        F.round(spw, 4).alias("syllables_per_word"),
        F.round(206.835 - 1.015 * wps - 84.6 * spw, 4).alias("flesch_ease"),
        F.round(0.39 * wps + 11.8 * spw - 15.59, 4).alias("fk_grade"),
    ).orderBy("lang")


@query(
    "naive_bayes_lang",
    oracle="""
    WITH docs AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks,
             CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS is_test
      FROM documents
    ), train_tok AS (
      SELECT lang AS c, unnest(toks) AS w FROM docs WHERE is_test = 0
    ), class_tot AS (
      SELECT c, CAST(count(*) AS BIGINT) AS nc FROM train_tok GROUP BY c
    ), vocab AS (
      SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM train_tok
    ), lp AS (
      SELECT t.c, t.w,
             ln((CAST(count(*) AS BIGINT) + 1) * 1.0 / (ct.nc + vo.v))
               AS lpw
      FROM train_tok t
      JOIN class_tot ct ON t.c = ct.c CROSS JOIN vocab vo
      GROUP BY t.c, t.w, ct.nc, vo.v
    ), prior AS (
      SELECT lang AS c,
             ln(count(*) * 1.0
                / (SELECT count(*) FROM docs WHERE is_test = 0)) AS lprior
      FROM docs WHERE is_test = 0 GROUP BY lang
    ), test_cnt AS (
      SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT doc_id, lang, unnest(toks) AS w
            FROM docs WHERE is_test = 1)
      GROUP BY 1, 2, 3
    ), scored AS (
      SELECT tc.doc_id, tc.lang, p.c,
             p.lprior
             + list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list(tc.cnt * coalesce(lp.lpw,
                   ln(1.0 / (ct.nc + (SELECT v FROM vocab))))
                   ORDER BY tc.w)),
                 (a, x) -> a + x) AS score
      FROM test_cnt tc
      CROSS JOIN prior p
      JOIN class_tot ct ON ct.c = p.c
      LEFT JOIN lp ON lp.c = p.c AND lp.w = tc.w
      GROUP BY tc.doc_id, tc.lang, p.c, p.lprior, ct.nc
    ), pred AS (
      SELECT doc_id, lang AS true_lang, c AS pred_lang,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, c) AS r
      FROM scored
    ), conf AS (
      SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
      FROM pred WHERE r = 1 GROUP BY 1, 2
    ), cls_tot AS (
      SELECT true_lang, CAST(sum(n) AS BIGINT) AS tot FROM conf GROUP BY 1
    )
    SELECT c.true_lang, c.pred_lang, c.n,
           CAST(c.n * 1000000 // t.tot AS BIGINT) AS share_ppm
    FROM conf c JOIN cls_tot t USING (true_lang)
    UNION ALL
    SELECT '_all_' AS true_lang, '_all_' AS pred_lang,
           CAST(sum(CASE WHEN true_lang = pred_lang THEN n ELSE 0 END)
             AS BIGINT) AS n,
           CAST(sum(CASE WHEN true_lang = pred_lang THEN n ELSE 0 END)
                * 1000000 // sum(n) AS BIGINT) AS share_ppm
    FROM conf
    ORDER BY true_lang, pred_lang
    """,
)
def naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes trained and evaluated entirely in the
    engine: train on the 80% split (doc_id % 5 ≠ 0) — per-class token
    counts with +1 Laplace smoothing over the shared vocabulary — then
    classify the held-out 20% by argmax of ln π_c + Σ_w n_dw·ln p̂(w|c),
    emitting the confusion matrix with per-true-class recall (ppm) and
    an `_all_` overall-accuracy row. The classic count-based text
    classifier as two aggregates plus a broadcast join — no iterative
    fitting, fully oracle-checkable.

    Determinism: the per-(doc, class) log-likelihood folds cnt·ln p̂
    in token-sorted order (fixed summation order both engines);
    class-score ties break on class name; counts and ppm shares are
    exact integers.

    Scale: the model (|vocab|×|classes| log-probs + priors) is a
    bounded dimension broadcast to the test-token stream; per-doc
    scoring groups by doc_id with bounded fan-in (≤|vocab| terms); the
    confusion matrix is |classes|² rows.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.split("text", " ").alias("toks"),
        (F.col("doc_id") % 5 == 0).cast("int").alias("is_test"),
    )
    train_tok = (
        docs.filter(F.col("is_test") == 0)
        .select(F.col("lang").alias("c"), F.explode("toks").alias("w"))
    )
    class_tot = train_tok.groupBy("c").agg(
        F.count(F.lit(1)).cast("bigint").alias("nc")
    )
    vocab = train_tok.agg(
        F.countDistinct("w").cast("bigint").alias("v")
    )
    lp = (
        train_tok.groupBy("c", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cw"))
        .join(F.broadcast(class_tot), "c")
        .crossJoin(F.broadcast(vocab))
        .select(
            "c",
            "w",
            F.log(
                (F.col("cw") + 1) * 1.0 / (F.col("nc") + F.col("v"))
            ).alias("lpw"),
        )
    )
    n_train = docs.filter(F.col("is_test") == 0).count()
    prior = (
        docs.filter(F.col("is_test") == 0)
        .groupBy(F.col("lang").alias("c"))
        .agg(F.log(F.count(F.lit(1)) * 1.0 / n_train).alias("lprior"))
    )
    test_cnt = (
        docs.filter(F.col("is_test") == 1)
        .select("doc_id", "lang", F.explode("toks").alias("w"))
        .groupBy("doc_id", "lang", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    model = (
        prior.join(class_tot, "c")
        .crossJoin(vocab)
        .select("c", "lprior", "nc", "v")
    )
    joined = (
        test_cnt.crossJoin(F.broadcast(model))
        .join(F.broadcast(lp), ["c", "w"], "left")
        .select(
            "doc_id",
            "lang",
            "c",
            "lprior",
            "w",
            (
                F.col("cnt")
                * F.coalesce(
                    F.col("lpw"),
                    F.log(1.0 / (F.col("nc") + F.col("v"))),
                )
            ).alias("term"),
        )
    )
    scored = joined.groupBy("doc_id", "lang", "c", "lprior").agg(
        F.expr(
            """
            aggregate(transform(array_sort(collect_list(struct(w, term))),
              s -> s.term), CAST(0.0 AS DOUBLE), (a, x) -> a + x)
            """
        ).alias("ll")
    ).select(
        "doc_id",
        "lang",
        "c",
        (F.col("lprior") + F.col("ll")).alias("score"),
    )
    pred = scored.withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.desc("score"), "c")
        ),
    ).filter(F.col("r") == 1)
    conf = pred.groupBy(
        F.col("lang").alias("true_lang"), F.col("c").alias("pred_lang")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cls_tot = conf.groupBy("true_lang").agg(
        F.sum("n").cast("bigint").alias("tot")
    )
    cells = conf.join(cls_tot, "true_lang").select(
        "true_lang",
        "pred_lang",
        "n",
        F.expr("CAST(n * 1000000 div tot AS BIGINT)").alias("share_ppm"),
    )
    summary = conf.agg(
        F.lit("_all_").alias("true_lang"),
        F.lit("_all_").alias("pred_lang"),
        F.sum(F.when(F.col("true_lang") == F.col("pred_lang"), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n"),
        F.expr(
            """
            CAST(sum(CASE WHEN true_lang = pred_lang THEN n ELSE 0 END)
                 * 1000000 div sum(n) AS BIGINT)
            """
        ).alias("share_ppm"),
    )
    return cells.unionAll(summary).orderBy("true_lang", "pred_lang")


_WIN_K = 8  # gram length (chars)
_WIN_W = 4  # winnowing window (grams)


@query(
    "winnowing_fingerprints",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             list_transform(range(0, len(text) - {_WIN_K} + 1),
               p -> {_md5_prefix_sql(
                   f"substr(text, CAST(p + 1 AS INTEGER), {_WIN_K})")})
               AS h
      FROM documents WHERE len(text) >= {_WIN_K + _WIN_W - 1}
    ), sel AS (
      SELECT doc_id, len(h) AS n_grams,
             list_distinct(list_transform(list_transform(
               range(0, len(h) - {_WIN_W} + 1),
               i -> list_reduce(
                 list_prepend(struct_pack(hv := CAST(4294967296 AS BIGINT),
                                          p := CAST(-1 AS BIGINT)),
                   list_transform(range(i, i + {_WIN_W}),
                     j -> struct_pack(hv := h[CAST(j + 1 AS INTEGER)],
                                      p := j))),
                 (a, v) -> CASE WHEN v.hv <= a.hv THEN v ELSE a END)),
               s -> s.hv * 2097152 + s.p)) AS fps
      FROM g
    ), fp_rows AS (
      SELECT doc_id, n_grams, unnest(fps) // 2097152 AS hv FROM sel
    ), shared AS (
      SELECT hv, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
      FROM fp_rows GROUP BY hv
    )
    SELECT f.doc_id,
           CAST(max(f.n_grams) AS BIGINT) AS n_grams,
           CAST(count(*) AS BIGINT) AS n_selected,
           CAST(count(DISTINCT f.hv) AS BIGINT) AS n_distinct,
           CAST(sum(CASE WHEN s.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared,
           CAST(count(*) * 1000000 // max(f.n_grams) AS BIGINT)
             AS density_ppm
    FROM fp_rows f JOIN shared s ON f.hv = s.hv
    GROUP BY f.doc_id ORDER BY f.doc_id
    """,
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing fingerprints (Schleimer-Wilkerson-Aiken): hash all
    k=8 char-grams per document, slide a w=4 window over the hash
    sequence, and select each window's minimum (rightmost on ties) —
    the selection with the guarantee that any verbatim match of length
    ≥ k+w−1 between two documents shares at least one fingerprint,
    the locality property plain minhash (`dedup_minhash_lsh`) lacks.
    Emits per-doc gram/selected/distinct counts, how many selected
    fingerprints also occur in another document (n_shared — the
    plagiarism signal), and selection density (theory: ~2/(w+1)).

    Determinism: gram hashes are the portable md5-prefix bigint
    (hashlib on the Spark side == DuckDB's md5() hex fold); the
    per-window argmin scans left→right keeping ties on the rightmost
    position — the monotonic-deque pass below and the oracle's `<=`
    fold pick identical (hash, position) pairs; 0-based positions on
    both engines.

    Scale: fingerprint selection is per-document work inside an
    Arrow-batched mapInPandas (an O(G) monotonic-deque sliding min per
    doc — the first HOF formulation inlined the gram-hash array into
    every nested-lambda reference and went quadratic in Catalyst);
    only the selected ~2/(w+1) fraction becomes rows; the share join
    groups by fingerprint hash with map-side combine. At 100 TB the
    fp→doc postings get the same df-cap treatment as
    `dedup_ngram_jaccard` if a hash goes viral.
    """
    import hashlib
    from collections import deque

    import pandas as pd

    # one md5 per character gram is exactly the CPU-heavy Python kernel
    # load_parallel exists for — unsplit, the whole winnowing pass runs
    # on the scan's row-group count (2 tasks at 10× data)
    d = load_parallel(spark, sf_dir, "documents").filter(
        F.length("text") >= _WIN_K + _WIN_W - 1
    )

    def select_fps(batches):
        for pdf in batches:
            out_doc, out_ng, out_hv = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                grams = len(text) - _WIN_K + 1
                hs = [
                    int(
                        hashlib.md5(
                            text[p : p + _WIN_K].encode("utf-8")
                        ).hexdigest()[:8],
                        16,
                    )
                    for p in range(grams)
                ]
                # monotonic deque of candidate (pos) with increasing hash;
                # `<=` eviction keeps the RIGHTMOST position on hash ties
                dq: deque[int] = deque()
                seen: set[tuple[int, int]] = set()
                for j in range(grams):
                    while dq and hs[dq[-1]] >= hs[j]:
                        dq.pop()
                    dq.append(j)
                    if dq[0] <= j - _WIN_W:
                        dq.popleft()
                    if j >= _WIN_W - 1:
                        # dq is strictly increasing in hash (equal hashes
                        # evicted on insert → rightmost survivor), so the
                        # head is the window's rightmost minimum
                        seen.add((hs[dq[0]], dq[0]))
                for hv, _pos in seen:
                    out_doc.append(int(doc_id))
                    out_ng.append(grams)
                    out_hv.append(hv)
            yield pd.DataFrame(
                {"doc_id": out_doc, "n_grams": out_ng, "hv": out_hv}
            )

    # cached: the fingerprint rows feed the share count AND the join —
    # uncached the Python winnowing pass (one md5 per k-gram) runs twice
    fp_rows = d.select("doc_id", "text").mapInPandas(
        select_fps, "doc_id long, n_grams long, hv long"
    ).cache()
    shared = fp_rows.groupBy("hv").agg(
        F.countDistinct("doc_id").cast("bigint").alias("nd")
    )
    return (
        fp_rows.join(shared, "hv")
        .groupBy("doc_id")
        .agg(
            F.max("n_grams").cast("bigint").alias("n_grams"),
            F.count(F.lit(1)).cast("bigint").alias("n_selected"),
            F.countDistinct("hv").cast("bigint").alias("n_distinct"),
            F.sum((F.col("nd") > 1).cast("bigint"))
            .cast("bigint")
            .alias("n_shared"),
            F.expr(
                "CAST(count(1) * 1000000 div max(n_grams) AS BIGINT)"
            ).alias("density_ppm"),
        )
        .orderBy("doc_id")
    )
