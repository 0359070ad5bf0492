"""Corpus-curation wave 9: the FUSED end-to-end curation pipeline — the
single most-used LLM-pretraining data shape, chaining every stage the repo
already exposes piecemeal (quality filter -> exact dedup -> benchmark
decontamination -> token-budget selection) into one plan with per-stage
observability counters, the way a production corpus build actually runs.

Reference analogy: the reference repo's train.json -> filtered/augmented
training set assembly (main.py:61-133 data prep feeding main.py:248-317
training) — here generalized to the corpus-curation funnel a 100 TB text
pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_TOKS = "string_split(trim(text), ' ')"
_QMIN = 330_000  # lexical-diversity floor, micro units (u*1e6 div n)
_NMIN, _NMAX = 10, 5000  # token bounds
_GRAM = 8  # decontamination n-gram size
_BUDGET_DIV = 4  # budget = clean token mass div 4


@query(
    "curated_corpus_pipeline",
    headline=True,
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, lang, text, len({_TOKS}) AS n,
             len(list_distinct({_TOKS})) AS u,
             doc_id % 7 = 0 AS is_eval
      FROM documents
    ), train AS (
      SELECT *, (u * 1000000) // n AS q FROM corpus
      WHERE NOT is_eval AND n > 0
    ), qkept AS (
      SELECT * FROM train
      WHERE n BETWEEN {_NMIN} AND {_NMAX} AND q >= {_QMIN}
    ), dkept AS (
      SELECT * FROM (
        SELECT *, min(doc_id) OVER (
          PARTITION BY array_to_string({_TOKS}[1:{_GRAM}], ' ')) AS rep
        FROM qkept) WHERE doc_id = rep
    ), evg AS (
      SELECT DISTINCT g.gram FROM (
        SELECT unnest(list_transform(
                 generate_series({_GRAM}, len({_TOKS})),
                 i -> array_to_string({_TOKS}[i - {_GRAM - 1}:i], ' ')))
               AS gram
        FROM documents WHERE doc_id % 7 = 0
          AND len({_TOKS}) >= {_GRAM}) g
    ), contaminated AS (
      SELECT DISTINCT d.doc_id FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series({_GRAM}, len({_TOKS})),
                 i -> array_to_string({_TOKS}[i - {_GRAM - 1}:i], ' ')))
               AS gram
        FROM dkept WHERE len({_TOKS}) >= {_GRAM}) d
      JOIN evg USING (gram)
    ), clean AS (
      SELECT k.* FROM dkept k LEFT JOIN contaminated c USING (doc_id)
      WHERE c.doc_id IS NULL
    ), b AS (
      SELECT CAST(sum(n) // {_BUDGET_DIV} AS BIGINT) AS budget FROM clean
    ), sel AS (
      SELECT * FROM (
        SELECT clean.*, sum(n) OVER (ORDER BY q DESC, doc_id) AS s
        FROM clean) cum CROSS JOIN b WHERE cum.s <= b.budget
    )
    SELECT * FROM (
      SELECT 1 AS stage_ord, 'corpus' AS stage, '*' AS lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n) AS BIGINT) AS n_tokens FROM corpus
      UNION ALL
      SELECT 2, 'train_after_eval_holdout', '*', count(*),
             CAST(sum(n) AS BIGINT) FROM train
      UNION ALL
      SELECT 3, 'quality_kept', '*', count(*), CAST(sum(n) AS BIGINT)
      FROM qkept
      UNION ALL
      SELECT 4, 'dedup_kept', '*', count(*), CAST(sum(n) AS BIGINT)
      FROM dkept
      UNION ALL
      SELECT 5, 'decontaminated', '*', count(*), CAST(sum(n) AS BIGINT)
      FROM clean
      UNION ALL
      SELECT 6, 'budget_selected', '*', count(*), CAST(sum(n) AS BIGINT)
      FROM sel
      UNION ALL
      SELECT 7, 'budget_selected', lang, count(*), CAST(sum(n) AS BIGINT)
      FROM sel GROUP BY lang
    ) ORDER BY stage_ord, lang
    """,
)
def curated_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fused LLM-corpus curation funnel, one registered plan:

    1. eval holdout (``doc_id % 7 = 0`` stands in for the benchmark suite)
    2. quality filter — token bounds + integer lexical diversity
       (``unique*1e6 div n >= 0.33e6``; exact integers, no float boundary)
    3. prefix-fingerprint dedup — keep the min-doc_id representative per
       8-token document prefix (the boilerplate/prefix-dup collapse of
       Lee et al.'s dedup study, subsuming exact dedup; partitioned
       window keyed on the prefix — production uses xxhash64(prefix))
    4. benchmark decontamination — drop survivors sharing any verbatim
       8-gram with the eval slice. NOTE on the broadcast: in production
       the eval side is a small FIXED benchmark suite (MMLU/GSM8K-sized,
       a few million grams), which is what the forced broadcast assumes;
       this demo's ``doc_id % 7`` stand-in is a 1/7 corpus SLICE whose
       gram set grows linearly with corpus size, so at 100 TB the eval
       frame would exceed the broadcast limit — there, drop the
       ``F.broadcast`` hint and take the shuffled left-semi/anti join
       (both sides explode to grams; the join keys are high-cardinality
       and evenly distributed, so the shuffle is well-behaved)
    5. token-budget selection — greedy by quality until ``Σn div 4`` of
       the clean token mass, via the repo's two-level distributed prefix
       sum (bucket offsets broadcast + within-bucket partitioned cumsum —
       no corpus-wide single-partition sort)

    Emits the per-stage observability counters (docs, tokens) the
    `observe_pipeline_metrics` pattern tracks, plus the selected set's
    per-language composition — the funnel report a data-mixing run reads.

    Scale: stages 1-2 are one codegen'd scan; stage 3 is THE data-sized
    shuffle; stage 4 is an explode + broadcast semi-join on the already-
    reduced survivor set; stage 5 windows are bucket-partitioned. At
    cluster scale, persist the ``dkept`` survivor frame once — every
    later stage (gram branch, budget branch, stage counters) re-reads
    that cached minority instead of rescanning the raw corpus.

    Parity vs the stage-by-stage singles: quality_filter_pipeline,
    dedup (exact), decontaminate_8gram, token_budget_selection.
    """
    toks = F.split(F.trim("text"), " ")
    corpus = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "text",
        F.size(toks).alias("n"),
        F.size(F.array_distinct(toks)).alias("u"),
        (F.col("doc_id") % 7 == 0).alias("is_eval"),
    )
    train_cond = ~F.col("is_eval") & (F.col("n") > 0)
    train = corpus.where(train_cond).withColumn(
        "q", F.expr("(u * 1000000) div n")
    )
    qkept = train.where(
        F.col("n").between(_NMIN, _NMAX) & (F.col("q") >= _QMIN)
    )
    prefix_fp = F.expr(
        f"array_join(slice(split(trim(text), ' '), 1, {_GRAM}), ' ')"
    )
    # cached: the WINDOW OUTPUT (qkept + rep), not qkept — the dedup
    # window is the pipeline's data-sized shuffle, and qkept used to be
    # re-windowed once per consumer (stage-4 counter, gram branch, clean:
    # 3 Sort+Exchange+Window passes in the before plan). Caching after
    # the window runs it exactly once; every consumer is then a cheap
    # filter over the survivor-sized cache (guide §2.4 / §5 — persist the
    # reused minority, remove repeated shuffles)
    wdk = qkept.withColumn(
        "rep", F.min("doc_id").over(Window.partitionBy(prefix_fp))
    ).cache()
    dkept = wdk.where(F.col("doc_id") == F.col("rep")).drop("rep")
    # grams explode over a PROJECTED token array: referencing the raw
    # split(trim(text)) expression inside the transform lambda makes
    # Catalyst re-split the text once per gram (O(tokens²) splits/doc —
    # the measured pathology documented in dedup._shingle_pairs); over an
    # attribute it splits once per row (guide §1.2 step 2)
    gram_over_tk = F.explode(
        F.expr(
            f"transform(sequence(1, size(tk) - {_GRAM - 1}),"
            f" i -> array_join(slice(tk, i, {_GRAM}), ' '))"
        )
    ).alias("gram")
    evg = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 7 == 0)
        .select(toks.alias("tk"))
        .where(F.size("tk") >= _GRAM)
        .select(gram_over_tk)
        .distinct()
    )
    contaminated = (
        dkept.select("doc_id", F.split(F.trim("text"), " ").alias("tk"))
        .where(F.size("tk") >= _GRAM)
        .select("doc_id", gram_over_tk)
        .join(F.broadcast(evg), "gram")
        .select("doc_id")
        .distinct()
    )
    clean = dkept.join(contaminated, "doc_id", "left_anti").cache()
    # two-level distributed prefix sum in (q DESC, doc_id) order
    cb = clean.withColumn("qb", F.expr("q div 4096"))
    bkt = cb.groupBy("qb").agg(F.sum("n").alias("bn"))
    # the token budget is the grand total of the bucket subtotals —
    # derived from bkt instead of a separate clean-wide agg job (exact
    # int64 sums are associative, so Σ bn ≡ Σ n)
    budget = bkt.agg(
        F.expr(f"sum(bn) div {_BUDGET_DIV}").cast("bigint").alias("budget")
    )
    off = bkt.select(
        "qb",
        (
            F.sum("bn").over(Window.partitionBy().orderBy(F.desc("qb")))
            - F.col("bn")
        ).alias("off"),
    )
    wl = (
        Window.partitionBy("qb")
        .orderBy(F.desc("q"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sel = (
        cb.join(F.broadcast(off), "qb")
        .withColumn("s", F.col("off") + F.sum("n").over(wl))
        .crossJoin(F.broadcast(budget))
        .where(F.col("s") <= F.col("budget"))
    )

    def stage(ord_: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(ord_).alias("stage_ord"),
            F.lit(name).alias("stage"),
            F.lit("*").alias("lang"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_tokens"),
        ).select("stage_ord", "stage", "lang", "n_docs", "n_tokens")

    # stages 1 and 2 share ONE corpus scan via conditional aggregation
    # (before: two separate full scans + tokenizations of documents for
    # two counter rows — guide §2.3, aggregate before you shuffle /
    # §1.2 step 1, don't re-read what one pass can answer)
    s12 = corpus.agg(
        F.count(F.lit(1)).cast("bigint").alias("c1"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("t1"),
        F.coalesce(F.sum(F.when(train_cond, 1)), F.lit(0))
        .cast("bigint")
        .alias("c2"),
        F.coalesce(F.sum(F.when(train_cond, F.col("n"))), F.lit(0))
        .cast("bigint")
        .alias("t2"),
    )

    # both counter rows explode out of the SINGLE aggregate row — two
    # sibling .select()s of s12 would be two separate subtrees whose
    # column-pruned aggregates no longer canonicalize equal, defeating
    # AQE stage reuse and paying the corpus scan twice (verified in the
    # plan: two Scan parquet nodes before, one after)
    s12_rows = s12.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("stage_ord"),
                    F.lit("corpus").alias("stage"),
                    F.lit("*").alias("lang"),
                    F.col("c1").alias("n_docs"),
                    F.col("t1").alias("n_tokens"),
                ),
                F.struct(
                    F.lit(2).alias("stage_ord"),
                    F.lit("train_after_eval_holdout").alias("stage"),
                    F.lit("*").alias("lang"),
                    F.col("c2").alias("n_docs"),
                    F.col("t2").alias("n_tokens"),
                ),
            )
        ).alias("r")
    ).select("r.*")

    # stage 6 is the grand total of the per-language stage-7 rows — one
    # rollup pass over sel instead of computing the sel window twice
    # (grouping_id separates the total row; sel rows with NULL lang would
    # collide with the rollup total without it)
    sel_groups = sel.rollup("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_tokens"),
        F.grouping_id().alias("gid"),
    )
    # rollup over EMPTY input emits zero rows (no grand-total row), so the
    # stage-6 row must not depend on sel being non-empty (r10 verdict item
    # 6): anchor it to a literal 1-row frame and left-join the rollup's
    # total row in — one broadcast of a single row, the rollup pass itself
    # is unchanged. On a degenerate (empty-train) corpus this emits the
    # (6, 'budget_selected', '*', 0, 0) row the old global aggregate did.
    total_row = sel_groups.where(F.col("gid") == 1).select(
        "n_docs", "n_tokens"
    )
    stage6 = (
        spark.range(1)
        .join(F.broadcast(total_row), F.lit(True), "left")
        .select(
            F.lit(6).alias("stage_ord"),
            F.lit("budget_selected").alias("stage"),
            F.lit("*").alias("lang"),
            F.coalesce(F.col("n_docs"), F.lit(0).cast("bigint")).alias(
                "n_docs"
            ),
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("bigint")).alias(
                "n_tokens"
            ),
        )
    )
    per_lang = sel_groups.where(F.col("gid") == 0).select(
        F.lit(7).alias("stage_ord"),
        F.lit("budget_selected").alias("stage"),
        "lang",
        "n_docs",
        "n_tokens",
    )
    # stages 3 and 4 share ONE pass over the cached window output: stage 4
    # is the doc_id = rep slice of stage 3's frame, so both counter rows
    # come from one conditional aggregate (same explode-the-agg-row trick
    # as s12 — sibling selects would defeat AQE stage reuse)
    s34 = wdk.agg(
        F.count(F.lit(1)).cast("bigint").alias("c3"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("t3"),
        F.coalesce(F.sum(F.when(F.col("doc_id") == F.col("rep"), 1)), F.lit(0))
        .cast("bigint")
        .alias("c4"),
        F.coalesce(
            F.sum(F.when(F.col("doc_id") == F.col("rep"), F.col("n"))), F.lit(0)
        )
        .cast("bigint")
        .alias("t4"),
    )
    s34_rows = s34.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(3).alias("stage_ord"),
                    F.lit("quality_kept").alias("stage"),
                    F.lit("*").alias("lang"),
                    F.col("c3").alias("n_docs"),
                    F.col("t3").alias("n_tokens"),
                ),
                F.struct(
                    F.lit(4).alias("stage_ord"),
                    F.lit("dedup_kept").alias("stage"),
                    F.lit("*").alias("lang"),
                    F.col("c4").alias("n_docs"),
                    F.col("t4").alias("n_tokens"),
                ),
            )
        ).alias("r")
    ).select("r.*")

    return (
        s12_rows
        .unionByName(s34_rows)
        .unionByName(stage(5, "decontaminated", clean))
        .unionByName(stage6)
        .unionByName(per_lang)
        .orderBy("stage_ord", "lang")
    )
