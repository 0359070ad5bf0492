"""Curation wave 3 — corpus-hygiene operators for a 100 TB training-data
pipeline: sub-document exact dedup, domain-mix rebalancing, PII redaction,
and a shingle-novelty audit.

All arithmetic is integer (micro-units / ppm) so Spark and the DuckDB
oracle hash bit-identically; the only floats are query-edge displays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

# Non-overlapping L-token windows ("lines") are the sub-document dedup unit.
_LINE_TOKENS = 3

# Spark-side: toks -> array of space-joined 3-token lines (trailing
# remainder dropped). sequence(0, n-1) is DESCENDING for n<=0, so the
# empty case must be an explicit empty array, not sequence().
_SPARK_LINES = f"""
    CASE WHEN size(toks) >= {_LINE_TOKENS}
         THEN transform(sequence(0, size(toks) div {_LINE_TOKENS} - 1),
                        i -> array_join(slice(toks, i * {_LINE_TOKENS} + 1,
                                              {_LINE_TOKENS}), ' '))
         ELSE cast(array() as array<string>) END
"""


@query(
    "line_dedup_exact",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
    ), idx AS (
      SELECT doc_id, toks, unnest(range(len(toks) // {_LINE_TOKENS})) AS i
      FROM t WHERE len(toks) >= {_LINE_TOKENS}
    ), ln AS (
      SELECT doc_id, i,
             array_to_string(
               toks[(i * {_LINE_TOKENS} + 1):(i * {_LINE_TOKENS} + {_LINE_TOKENS})],
               ' ') AS line
      FROM idx
    ), flagged AS (
      SELECT doc_id, i, line,
             CASE WHEN doc_id * 1000000 + i
                    <> min(doc_id * 1000000 + i) OVER (PARTITION BY line)
                  THEN 1 ELSE 0 END AS is_dup
      FROM ln
    )
    SELECT doc_id,
           count(*) AS n_lines,
           CAST(sum(is_dup) AS BIGINT) AS n_dup_lines,
           CAST(sum(is_dup) * 1000000 // count(*) AS BIGINT) AS dup_ppm
    FROM flagged GROUP BY doc_id ORDER BY doc_id
    """,
)
def line_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup (RefinedWeb/C4-style line dedup): split each
    document into non-overlapping 3-token lines, keep the first corpus
    occurrence of every distinct line (ordered by doc_id then position),
    and report per-document how many lines are cross-corpus duplicates.

    Scale: one shuffle, partitioned by the line text itself — the same
    hash-partition an exact-dedup pass uses at 100 TB. Keep-first is a
    per-line MIN over an int64 (doc_id, position) encoding, not a sort;
    map-side the explode is pure codegen. Line values could be replaced by
    xxhash64(line) to shrink shuffle width at full scale (the 8-byte-key
    trick dedup_exact already uses); kept as text here so the oracle is a
    plain string comparison.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("toks")
    )
    lines = d.select(
        "doc_id", F.posexplode(F.expr(_SPARK_LINES)).alias("i", "line")
    )
    first = Window.partitionBy("line")
    flagged = lines.withColumn(
        "is_dup",
        (
            F.col("doc_id") * 1000000 + F.col("i")
            != F.min(F.col("doc_id") * 1000000 + F.col("i")).over(first)
        ).cast("int"),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("is_dup").cast("bigint").alias("n_dup_lines"),
            F.expr("sum(is_dup) * 1000000 div count(*)").alias("dup_ppm"),
        )
        .orderBy("doc_id")
    )


@query(
    "domain_mix_weights",
    oracle="""
    WITH per_src AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ), tot AS (
      SELECT *, sum(n_tokens) OVER () AS total_tokens,
             count(*) OVER () AS k
      FROM per_src
    ), base AS (
      SELECT *, n_tokens * 1000000 // total_tokens AS base_ppm,
             row_number() OVER (
               ORDER BY n_tokens * 1000000 % total_tokens DESC, source)
               AS rem_rank,
             1000000 - sum(n_tokens * 1000000 // total_tokens) OVER ()
               AS deficit,
             1000000 // k AS target_base,
             1000000 % k AS target_extra
      FROM tot
    ), shares AS (
      SELECT source, n_docs, n_tokens,
             base_ppm + CASE WHEN rem_rank <= deficit THEN 1 ELSE 0 END
               AS actual_ppm,
             target_base + CASE
               WHEN row_number() OVER (ORDER BY source) <= target_extra
               THEN 1 ELSE 0 END AS target_ppm
      FROM base
    )
    SELECT source, n_docs, n_tokens,
           CAST(actual_ppm AS BIGINT) AS actual_ppm,
           CAST(target_ppm AS BIGINT) AS target_ppm,
           CAST(target_ppm * 1000000 // actual_ppm AS BIGINT) AS weight_micro
    FROM shares ORDER BY source
    """,
)
def domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix rebalancing (the deterministic core of a DoReMi-style
    mixture step): measure each source's actual token share, assign a
    uniform target share, and emit the per-source resampling weight
    target/actual — all in exact ppm/micro-units. Both the actual and the
    target share columns use largest-remainder allocation so each sums to
    exactly 1,000,000 across sources.

    Scale: the heavy pass is one map-side-combinable groupBy(source) over
    the corpus; everything after runs on the source dimension (|sources|
    rows — the empty-frame global windows are dimension-sized by
    construction, never corpus-sized).
    """
    per_src = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split(F.trim(F.col("text")), " ")))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )
    glob = Window.partitionBy()
    tot = per_src.withColumn("total_tokens", F.sum("n_tokens").over(glob)).withColumn(
        "k", F.count("*").over(glob)
    )
    base = (
        tot.withColumn("base_ppm", F.expr("n_tokens * 1000000 div total_tokens"))
        .withColumn(
            "rem_rank",
            F.row_number().over(
                glob.orderBy(
                    F.desc(F.expr("n_tokens * 1000000 % total_tokens")), "source"
                )
            ),
        )
        .withColumn(
            "deficit",
            F.lit(1000000)
            - F.sum(F.expr("n_tokens * 1000000 div total_tokens")).over(glob),
        )
    )
    shares = base.select(
        "source",
        "n_docs",
        "n_tokens",
        (
            F.col("base_ppm")
            + F.when(F.col("rem_rank") <= F.col("deficit"), 1).otherwise(0)
        ).alias("actual_ppm"),
        (
            F.expr("1000000 div k")
            + F.when(
                F.row_number().over(glob.orderBy("source")) <= F.expr("1000000 % k"),
                1,
            ).otherwise(0)
        ).alias("target_ppm"),
    )
    return shares.select(
        "source",
        "n_docs",
        "n_tokens",
        "actual_ppm",
        "target_ppm",
        F.expr("target_ppm * 1000000 div actual_ppm").alias("weight_micro"),
    ).orderBy("source")


_EMAIL_RE = "[a-z0-9]+@[a-z0-9.]+[a-z]"
_PHONE_RE = r"\+1-555-[0-9]{4}"
_IP_RE = r"10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


@query(
    "pii_scrub",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS t
      FROM documents
    ), masked AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT)
               AS n_email,
             CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT)
               AS n_phone,
             CAST(len(regexp_extract_all(t, '{_IP_RE}')) AS BIGINT) AS n_ip,
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                 '{_PHONE_RE}', '[PHONE]', 'g'),
               '{_IP_RE}', '[IP]', 'g') AS scrubbed
      FROM aug
    )
    SELECT doc_id, n_email, n_phone, n_ip,
           CAST(len(scrubbed) AS BIGINT) AS scrubbed_len, scrubbed
    FROM masked ORDER BY doc_id
    """,
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-class PII redaction (email / phone / IPv4) with per-class hit
    counts — the privacy-scrub stage of a curation pipeline. The corpus is
    synthetic word soup with no real PII, so each document is first
    augmented with a deterministic doc_id-derived contact string (both
    engines build the identical string); the masking then runs the real
    three-pattern cascade a production scrub would run.

    Scale: map-only — three regexes inside whole-stage codegen, zero
    shuffles, rewrites the corpus in one pass exactly like
    blocklist_scrub. Patterns are RE2-safe (no backrefs/lookarounds) so
    the Java and DuckDB regex engines agree.
    """
    d = load(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
        ).alias("t"),
    )
    masked = aug.select(
        "doc_id",
        F.regexp_count("t", F.lit(_EMAIL_RE)).cast("bigint").alias("n_email"),
        F.regexp_count("t", F.lit(_PHONE_RE)).cast("bigint").alias("n_phone"),
        F.regexp_count("t", F.lit(_IP_RE)).cast("bigint").alias("n_ip"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("t", _EMAIL_RE, "[EMAIL]"),
                _PHONE_RE,
                "[PHONE]",
            ),
            _IP_RE,
            "[IP]",
        ).alias("scrubbed"),
    )
    return masked.select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ip",
        F.length("scrubbed").cast("bigint").alias("scrubbed_len"),
        "scrubbed",
    ).orderBy("doc_id")


@query(
    "shingle_novelty_curve",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
    ), idx AS (
      SELECT doc_id, toks, unnest(range(len(toks) - 1)) AS i
      FROM t WHERE len(toks) >= 2
    ), sh AS (
      SELECT doc_id, toks[i + 1] || ' ' || toks[i + 2] AS shingle FROM idx
    ), firsts AS (
      SELECT shingle, min(doc_id) AS first_doc
      FROM sh GROUP BY shingle
    ), maxdoc AS (SELECT max(doc_id) AS m FROM documents)
    , bucketed AS (
      SELECT least(first_doc * 10 // (m + 1), 9) AS pos_decile,
             count(*) AS novel_shingles
      FROM firsts, maxdoc GROUP BY 1
    )
    SELECT pos_decile, novel_shingles,
           CAST(sum(novel_shingles) OVER (
             ORDER BY pos_decile ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_vocab
    FROM bucketed ORDER BY pos_decile
    """,
)
def shingle_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth audit: for every distinct 2-token shingle find the
    first document (by doc_id) that contributes it, bucket first
    appearances into ten corpus-position deciles, and report the novelty
    curve (new shingles per decile + cumulative vocabulary). A flattening
    curve is the classic signal that additional crawl data is mostly
    redundant.

    Scale: shingle first-appearance is one map-side-combinable
    groupBy(shingle) MIN; the decile rollup and the 10-row cumulative
    window are dimension-sized. max(doc_id) rides in via a broadcast
    1-row cross join, not a collect.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("toks")
    )
    sh = d.where(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 2),"
                " i -> concat(toks[i], ' ', toks[i + 1]))"
            )
        ).alias("shingle"),
    )
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    maxdoc = load(spark, sf_dir, "documents").agg(
        F.max("doc_id").alias("m")
    )
    bucketed = (
        firsts.crossJoin(F.broadcast(maxdoc))
        .select(
            F.least(F.expr("first_doc * 10 div (m + 1)"), F.lit(9)).alias(
                "pos_decile"
            )
        )
        .groupBy("pos_decile")
        .agg(F.count("*").alias("novel_shingles"))
    )
    w = (
        Window.partitionBy()
        .orderBy("pos_decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return bucketed.select(
        "pos_decile",
        "novel_shingles",
        F.sum("novel_shingles").over(w).cast("bigint").alias("cum_vocab"),
    ).orderBy("pos_decile")


# ---------------------------------------------------------------------------
# BPE merge training. Canonical symbol form: leading/trailing single space,
# DOUBLE space between symbols — so the whole-symbol replace pattern
# ' x  y ' shares no boundary character with an adjacent match and
# left-to-right non-overlapping replace() (identical semantics in Java and
# DuckDB) merges every disjoint occurrence in one pass.
_BPE_MERGES = 5


def _bpe_oracle(k_merges: int) -> str:
    parts = [
        "WITH w AS (SELECT unnest(string_split(trim(text), ' ')) AS word"
        " FROM documents),",
        "v0 AS (SELECT word, count(*) AS freq,"
        r" ' ' || rtrim(regexp_replace(word, '(.)', '\1  ', 'g')) || ' '"
        " AS sym FROM w GROUP BY word)",
    ]
    finals = []
    for k in range(1, k_merges + 1):
        parts.append(
            f", p{k} AS (SELECT toks[i+1] AS x, toks[i+2] AS y,"
            f" sum(freq) AS w FROM (SELECT freq, toks,"
            f" unnest(range(len(toks) - 1)) AS i FROM"
            f" (SELECT freq, string_split(trim(sym), '  ') AS toks"
            f" FROM v{k - 1}) WHERE len(toks) >= 2) GROUP BY 1, 2)"
        )
        parts.append(
            f", b{k} AS (SELECT x, y, w FROM p{k}"
            f" ORDER BY w DESC, x || ' ' || y LIMIT 1)"
        )
        parts.append(
            f", v{k} AS (SELECT word, freq, replace(sym,"
            f" ' ' || (SELECT x FROM b{k}) || '  ' || (SELECT y FROM b{k})"
            f" || ' ',"
            f" ' ' || (SELECT x FROM b{k}) || (SELECT y FROM b{k}) || ' ')"
            f" AS sym FROM v{k - 1})"
        )
        finals.append(
            f"SELECT {k} AS merge_rank, x AS left_sym, y AS right_sym,"
            f" x || y AS merged, CAST(w AS BIGINT) AS pair_count FROM b{k}"
        )
    return (
        "".join(parts)
        + " "
        + " UNION ALL ".join(finals)
        + " ORDER BY merge_rank"
    )


@query("bpe_merge_train", oracle=_bpe_oracle(_BPE_MERGES))
def bpe_merge_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge training (the tokenizer-construction step
    of an LLM data pipeline): count corpus word frequencies once, then run
    5 BPE rounds on the word-frequency dimension — pick the
    highest-weight adjacent symbol pair (lexicographic tiebreak), merge it
    everywhere, repeat. Emits the learned merge table (rank, pair, count),
    which IS a BPE tokenizer's model file. Pair counts are all-adjacent-
    position counts (the standard BPE statistic; overlapping runs like
    'a a a' count twice but merge once — identically on both engines).

    Scale: the corpus contributes exactly one map-side-combinable
    groupBy(word); every merge round then runs on the |vocab| dimension
    (like real BPE trainers, which operate on a word-frequency dict).
    Each round's winning pair is a 1-row aggregate collected to the
    driver — bounded by construction — and the vocab frame is cached per
    round so round k does not recompute rounds 1..k-1.
    """
    d = load(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .withColumn(
            "sym",
            F.concat(
                F.lit(" "),
                F.rtrim(F.regexp_replace("word", "(.)", "$1  ")),
                F.lit(" "),
            ),
        )
        .cache()
    )
    merges = []
    for k in range(1, _BPE_MERGES + 1):
        pairs = (
            vocab.select("freq", F.split(F.trim(F.col("sym")), "  ").alias("toks"))
            .where(F.size("toks") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(toks) - 2),"
                        " i -> struct(toks[i] AS x, toks[i + 1] AS y))"
                    )
                ).alias("p"),
            )
            .groupBy("p.x", "p.y")
            .agg(F.sum("freq").alias("w"))
        )
        best = pairs.orderBy(
            F.desc("w"), F.concat(F.col("x"), F.lit(" "), F.col("y"))
        ).limit(1)
        bx, by, bw = best.collect()[0]  # 1 row by construction
        old = vocab
        vocab = vocab.withColumn(
            "sym",
            F.expr(
                f"replace(sym, ' {bx}  {by} ', ' {bx}{by} ')"
            ),
        ).cache()
        old.unpersist()
        merges.append((k, bx, by, bx + by, int(bw)))
    vocab.unpersist()
    return spark.createDataFrame(
        merges,
        "merge_rank INT, left_sym STRING, right_sym STRING,"
        " merged STRING, pair_count BIGINT",
    ).orderBy("merge_rank")


@query(
    "length_bucket_packing",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
      FROM documents
    ), g AS (SELECT max(n_tok) AS global_max FROM d
    ), b AS (
      SELECT ((n_tok + 15) // 16) * 16 AS bucket_len, n_tok, g.global_max
      FROM d, g
    )
    SELECT bucket_len,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS real_tokens,
           CAST(count(*) * bucket_len AS BIGINT) AS bucket_padded,
           CAST((count(*) * bucket_len - sum(n_tok)) * 1000000
             // (count(*) * bucket_len) AS BIGINT) AS bucket_pad_ppm,
           CAST((count(*) * any_value(global_max) - sum(n_tok)) * 1000000
             // (count(*) * any_value(global_max)) AS BIGINT)
             AS global_pad_ppm
    FROM b GROUP BY bucket_len ORDER BY bucket_len
    """,
)
def length_bucket_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch packing audit: round each document's token
    count up to a multiple of 16 (the padded sequence length its batch
    would use), and report per bucket how much padding that costs vs
    padding every document to the corpus max — the waste length-grouped
    batching eliminates. All ratios in exact integer ppm.

    Scale: one map-side-combinable groupBy on the derived bucket key; the
    corpus max rides in via a broadcast 1-row cross join, not a collect.
    """
    d = load(spark, sf_dir, "documents").select(
        F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint").alias("n_tok")
    )
    g = d.agg(F.max("n_tok").alias("global_max"))
    return (
        d.crossJoin(F.broadcast(g))
        .withColumn("bucket_len", F.expr("((n_tok + 15) div 16) * 16"))
        .groupBy("bucket_len")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("real_tokens"),
            F.expr("count(*) * any_value(bucket_len)").alias("bucket_padded"),
            F.expr(
                "(count(*) * any_value(bucket_len) - sum(n_tok)) * 1000000"
                " div (count(*) * any_value(bucket_len))"
            ).alias("bucket_pad_ppm"),
            F.expr(
                "(count(*) * any_value(global_max) - sum(n_tok)) * 1000000"
                " div (count(*) * any_value(global_max))"
            ).alias("global_pad_ppm"),
        )
        .orderBy("bucket_len")
    )
