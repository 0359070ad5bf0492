"""Text wave 8: frequency smoothing, autocomplete, summary-overlap
scoring, and encoding forensics.

`good_turing_smoothing` computes the Simple Good-Turing re-estimated
counts r* = (r+1) N_{r+1}/N_r from the count-of-counts profile — the
classic unseen-mass estimator every smoothed LM builds on;
`prefix_autocomplete_topk` ranks completions under the top typed
prefixes; `rouge_l_pairs` scores LCS-based ROUGE-L F1 between
neighbouring documents of each source via a nested DP fold;
`encoding_anomaly_audit` injects deterministic mojibake into a known
subset and proves the byte-forensics pass recovers exactly that
subset (inject-and-detect, the `corrupt_record_routing` pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load


@query(
    "good_turing_smoothing",
    oracle="""
    WITH toks AS (
      SELECT string_split(text, ' ') AS t FROM documents
    ), tok AS (
      SELECT unnest(list_transform(range(1, greatest(len(t) - 2, 1)),
        i -> t[CAST(i AS INTEGER)] || ' '
          || t[CAST(i + 1 AS INTEGER)] || ' '
          || t[CAST(i + 2 AS INTEGER)] || ' '
          || t[CAST(i + 3 AS INTEGER)])) AS w
      FROM toks
    ), wc AS (
      SELECT w, CAST(count(*) AS BIGINT) AS r FROM tok GROUP BY w
    ), tot AS (
      SELECT CAST(sum(r) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS vocab
      FROM wc
    ), coc AS (
      SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM wc GROUP BY r
    )
    SELECT c.r,
           c.n_r,
           coalesce(c2.n_r, 0) AS n_r_next,
           round(CASE WHEN c2.n_r IS NULL THEN NULL
                 ELSE (c.r + 1) * 1.0 * c2.n_r / c.n_r END, 6) AS r_star,
           round(CASE WHEN c2.n_r IS NULL THEN NULL
                 ELSE (c.r + 1) * 1.0 * c2.n_r / c.n_r / t.n_tokens END,
                 9) AS p_gt,
           round(c.r * 1.0 / t.n_tokens, 9) AS p_mle,
           round((SELECT n_r FROM coc WHERE r = 1) * 1.0 / t.n_tokens,
                 6) AS p0_unseen_mass,
           t.n_tokens, t.vocab
    FROM coc c
    LEFT JOIN coc c2 ON c2.r = c.r + 1
    CROSS JOIN tot t
    WHERE c.r <= 10
    ORDER BY c.r
    """,
)
def good_turing_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple Good-Turing smoothing over the corpus unigram counts:
    for each low frequency r the re-estimated count r* = (r+1)
    N_{r+1}/N_r discounts observed mass toward the unseen, and
    P0 = N_1/N is the total probability the model reserves for
    never-seen words — the estimator underlying Katz backoff and the
    sanity check on any LM's closed-vocabulary assumption. Emits the
    r <= 10 head of the count-of-counts profile with GT vs MLE
    probabilities.

    Determinism: token counts, count-of-counts, and totals are exact
    int64; r*/p are closed-form doubles at the edge.

    Scale: two map-side-combined aggregations (word counts, then
    count-of-counts); the r-profile is a bounded dimension joined to
    itself on r+1. No windows, no corpus-wide sort.
    """
    d = load(spark, sf_dir, "documents")
    # 4-gram token shingles: the type space stays rare-rich at any
    # corpus size (a fixed unigram vocab saturates and empties the
    # low-r profile). sequence(1, 0) is DESCENDING in Spark — the
    # greatest(size-3, 1) guard never emits a reversed range because
    # every document here has >= 4 tokens (matched in the oracle).
    shingles = (
        "transform(sequence(1, greatest(size(t) - 3, 1)),"
        " i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1),"
        " element_at(t, i + 2), element_at(t, i + 3)))"
    )
    wc = (
        d.select(F.split(F.col("text"), " ").alias("t"))
        .select(F.explode(F.expr(shingles)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    )
    tot = wc.agg(
        F.sum("r").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
    )
    coc = wc.groupBy("r").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_r")
    )
    nxt = coc.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_next_raw")
    )
    n1 = coc.filter(F.col("r") == 1).select(
        F.col("n_r").alias("n1")
    )
    return (
        coc.filter(F.col("r") <= 10)
        .join(F.broadcast(nxt), "r", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n1))
        .select(
            "r",
            "n_r",
            F.coalesce(F.col("n_r_next_raw"), F.lit(0)).alias("n_r_next"),
            F.round(
                (F.col("r") + 1) * 1.0 * F.col("n_r_next_raw") / F.col("n_r"),
                6,
            ).alias("r_star"),
            F.round(
                (F.col("r") + 1)
                * 1.0
                * F.col("n_r_next_raw")
                / F.col("n_r")
                / F.col("n_tokens"),
                9,
            ).alias("p_gt"),
            F.round(F.col("r") * 1.0 / F.col("n_tokens"), 9).alias("p_mle"),
            F.round(F.col("n1") * 1.0 / F.col("n_tokens"), 6).alias(
                "p0_unseen_mass"
            ),
            "n_tokens",
            "vocab",
        )
        .orderBy("r")
    )


_AC_PREFIXES = 12  # top typed prefixes kept
_AC_TOPK = 3  # completions per prefix


@query(
    "prefix_autocomplete_topk",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), wc AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tok
      WHERE length(w) >= 2 GROUP BY w
    ), pref AS (
      SELECT substr(w, 1, 2) AS p, w, cnt FROM wc
    ), vol AS (
      SELECT p, CAST(sum(cnt) AS BIGINT) AS prefix_total
      FROM pref GROUP BY p
      ORDER BY prefix_total DESC, p LIMIT {_AC_PREFIXES}
    ), ranked AS (
      SELECT pr.p, pr.w, pr.cnt, v.prefix_total,
             row_number() OVER (PARTITION BY pr.p
                                ORDER BY pr.cnt DESC, pr.w) AS rk
      FROM pref pr JOIN vol v ON pr.p = v.p
    )
    SELECT p AS prefix, rk AS rank, w AS completion, cnt,
           prefix_total,
           CAST(cnt * 1000000 // prefix_total AS BIGINT) AS share_ppm
    FROM ranked WHERE rk <= {_AC_TOPK}
    ORDER BY prefix_total DESC, prefix, rank
    """,
)
def prefix_autocomplete_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-autocomplete index: under each of the top-{_AC_PREFIXES}
    2-character typed prefixes (by token volume), the top-{_AC_TOPK}
    completions by frequency with their share of the prefix's
    traffic — the precomputed prefix -> completions table behind any
    type-ahead box, built corpus-wide.

    Determinism: counts are exact; ranks break ties on (count desc,
    word asc); shares are integer ppm.

    Scale: word counts collapse map-side; the prefix volume head is
    a TakeOrdered LIMIT; the completion rank window partitions BY
    PREFIX (never a global sort), and the prefix filter joins back
    as a broadcast semi-join.
    """
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .withColumn("p", F.substring("w", 1, 2))
    )
    vol = (
        wc.groupBy("p")
        .agg(F.sum("cnt").cast("bigint").alias("prefix_total"))
        .orderBy(F.desc("prefix_total"), "p")
        .limit(_AC_PREFIXES)
    )
    ranked = wc.join(F.broadcast(vol), "p").withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("p").orderBy(F.desc("cnt"), "w")
        ),
    )
    return (
        ranked.filter(F.col("rk") <= _AC_TOPK)
        .select(
            F.col("p").alias("prefix"),
            F.col("rk").alias("rank"),
            F.col("w").alias("completion"),
            "cnt",
            "prefix_total",
            F.expr(
                "CAST(cnt * 1000000 div prefix_total AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy(F.desc("prefix_total"), "prefix", "rank")
    )


_ROUGE_CAP = 30  # tokens per side in the LCS DP


@query(
    "rouge_l_pairs",
    oracle=f"""
    WITH docs AS (
      SELECT source, doc_id,
             list_slice(string_split(text, ' '), 1, {_ROUGE_CAP}) AS ta
      FROM documents
    ), pairs AS (
      SELECT source, doc_id, ta,
             lead(ta) OVER (PARTITION BY source ORDER BY doc_id) AS tb
      FROM docs
    ), scored AS (
      SELECT source, doc_id,
             CAST(len(ta) AS BIGINT) AS na, CAST(len(tb) AS BIGINT) AS nb,
             list_reduce(
               list_prepend(
                 list_transform(range(0, len(tb) + 1),
                                x -> CAST(0 AS DOUBLE)),
                 list_transform(range(1, len(ta) + 1),
                                i -> [CAST(i AS DOUBLE)])),
               (row, v) -> list_reduce(
                 list_prepend([CAST(0 AS DOUBLE)],
                   list_transform(range(1, len(tb) + 1),
                                  j -> [CAST(j AS DOUBLE)])),
                 (nr, u) -> list_concat(nr, [greatest(
                   row[CAST(u[1] + 1 AS INTEGER)],
                   nr[CAST(u[1] AS INTEGER)],
                   row[CAST(u[1] AS INTEGER)]
                     + CASE WHEN tb[CAST(u[1] AS INTEGER)]
                            = ta[CAST(v[1] AS INTEGER)]
                       THEN 1.0 ELSE 0.0 END)])))
               [CAST(len(tb) + 1 AS INTEGER)] AS lcs
      FROM pairs WHERE tb IS NOT NULL
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CAST(lcs AS BIGINT)) AS BIGINT) AS lcs_total,
           round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(2.0 * lcs / (na + nb) ORDER BY doc_id)),
             (a, b) -> a + b)
             / count(*), 6) AS mean_rouge_l_f,
           round(max(2.0 * lcs / (na + nb)), 6) AS max_rouge_l_f
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
)
def rouge_l_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-L (LCS-based F1) between each document and its successor
    within the same source: the longest-common-subsequence DP runs as
    a nested fold (outer over A's tokens, inner over B's positions,
    flat DOUBLE[] DP row — the engine-parity state shape), and
    F = 2·LCS/(|A|+|B|) is the beta=1 ROUGE-L. Per source: pair
    count, total LCS, mean and max F — the near-duplicate /
    template-reuse signal n-gram Jaccard misses when word ORDER
    matters. Token caps at {_ROUGE_CAP} per side bound the DP.

    Determinism: LCS is integer-valued; the per-source mean is a
    doc_id-ordered fold.

    Scale: pairing is a source-partitioned lead() (one shuffle by
    source, no self-join); each DP is O({_ROUGE_CAP}^2) per pair,
    embarrassingly parallel, state bounded at {_ROUGE_CAP}+1 doubles.
    """
    d = load(spark, sf_dir, "documents")
    docs = d.select(
        "source",
        "doc_id",
        F.expr(f"slice(split(text, ' '), 1, {_ROUGE_CAP})").alias("ta"),
    )
    pairs = docs.withColumn(
        "tb",
        F.lead("ta").over(
            Window.partitionBy("source").orderBy("doc_id")
        ),
    ).filter(F.col("tb").isNotNull())
    # the O(cap^2) LCS DP is the textbook Pandas-UDF case: the Catalyst
    # nested-fold formulation builds a fresh array per cell (O(cap^3)
    # copies — measured 14 s at sf0.1); the Arrow-batched UDF runs the
    # classic two-row integer DP per pair (~0.5 s), numerically identical
    # (integer LCS). The oracle keeps the declarative fold.
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies
    # them and the function-local `pd` alias can't resolve at inference;
    # hint-less pandas_udf defaults to the SCALAR eval type we want
    @pandas_udf("double")
    def _lcs(ta_s, tb_s):
        out = []
        for A, B in zip(ta_s, tb_s):
            A = list(A)
            B = list(B)
            prev = [0] * (len(B) + 1)
            for av in A:
                cur = [0]
                for j, bv in enumerate(B, start=1):
                    cur.append(
                        max(
                            prev[j],
                            cur[j - 1],
                            prev[j - 1] + (1 if av == bv else 0),
                        )
                    )
                prev = cur
            out.append(float(prev[len(B)]))
        return pd.Series(out)

    scored = pairs.select(
        "source",
        "doc_id",
        F.size("ta").cast("bigint").alias("na"),
        F.size("tb").cast("bigint").alias("nb"),
        _lcs(F.col("ta"), F.col("tb")).alias("lcs"),
    )
    f_col = 2.0 * F.col("lcs") / (F.col("na") + F.col("nb"))
    return (
        scored.withColumn("f", f_col)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("lcs").cast("bigint"))
            .cast("bigint")
            .alias("lcs_total"),
            F.round(
                F.expr(
                    "aggregate(transform(array_sort(collect_list("
                    "struct(doc_id, f AS ff))), t -> t.ff),"
                    " CAST(0 AS DOUBLE), (a, b) -> a + b)"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("mean_rouge_l_f"),
            F.round(F.max("f"), 6).alias("max_rouge_l_f"),
        )
        .orderBy("source")
    )


@query(
    "encoding_anomaly_audit",
    oracle="""
    WITH corrupted AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 7 = 0
                  THEN text || chr(65533) || chr(65533) || chr(7)
                  ELSE text END AS t,
             CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS injected
      FROM documents
    ), audit AS (
      SELECT source, injected,
             length(t) - length(replace(t, chr(65533), ''))
               AS n_repl,
             CASE WHEN strpos(t, chr(7)) > 0 THEN 1 ELSE 0 END
               AS has_ctrl,
             CAST(length(t) AS BIGINT) AS n_chars
      FROM corrupted
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(injected) AS BIGINT) AS injected_docs,
           CAST(sum(CASE WHEN n_repl > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS repl_char_docs,
           CAST(sum(has_ctrl) AS BIGINT) AS control_char_docs,
           CAST(sum(n_repl) AS BIGINT) AS repl_chars_total,
           CAST(sum(CASE WHEN (n_repl > 0 OR has_ctrl = 1)
                         AND injected = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS true_positives,
           CAST(sum(CASE WHEN (n_repl > 0 OR has_ctrl = 1)
                         AND injected = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS false_positives
    FROM audit
    GROUP BY source
    ORDER BY source
    """,
)
def encoding_anomaly_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding forensics with a built-in ground truth: every 7th
    document is deterministically corrupted in-query (U+FFFD
    replacement characters + a BEL control byte — the classic
    mojibake signature of a double-decode), then the audit pass
    counts replacement characters and control bytes per document and
    the per-source report proves detection recall: true_positives ==
    injected_docs and false_positives == 0 on clean synthetic text.
    The inject-and-detect shape of `corrupt_record_routing`, applied
    to character-encoding quality.

    Determinism: corruption is keyed on doc_id % 7; all counters are
    exact character arithmetic (length-difference counting, locale-
    free).

    Scale: pure per-row string expressions + one map-side-combined
    rollup by source — embarrassingly parallel, no shuffle beyond
    the 20-source aggregate.
    """
    d = load(spark, sf_dir, "documents")
    corrupted = d.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.expr("chr(65533)"),
                F.expr("chr(65533)"),
                F.expr("chr(7)"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("t"),
        F.when(F.col("doc_id") % 7 == 0, 1).otherwise(0).alias("injected"),
    )
    audit = corrupted.select(
        "source",
        "injected",
        (
            F.length("t")
            - F.length(F.expr("replace(t, chr(65533), '')"))
        ).alias("n_repl"),
        F.when(F.expr("instr(t, chr(7))") > 0, 1).otherwise(0).alias(
            "has_ctrl"
        ),
    )
    return (
        audit.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs"),
            F.sum("injected").cast("bigint").alias("injected_docs"),
            F.sum(F.when(F.col("n_repl") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("repl_char_docs"),
            F.sum("has_ctrl").cast("bigint").alias("control_char_docs"),
            F.sum("n_repl").cast("bigint").alias("repl_chars_total"),
            F.sum(
                F.when(
                    ((F.col("n_repl") > 0) | (F.col("has_ctrl") == 1))
                    & (F.col("injected") == 1),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("true_positives"),
            F.sum(
                F.when(
                    ((F.col("n_repl") > 0) | (F.col("has_ctrl") == 1))
                    & (F.col("injected") == 0),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("false_positives"),
        )
        .orderBy("source")
    )
