"""Text wave 6: BPE tokenizer APPLICATION — encode the vocabulary with
the merges `bpe_merge_train` (plans/curation3.py) learns and audit the
compression.

Training produces the merge table; this op is the other half every
tokenizer ships: apply the merges in rank order to text and measure
fertility (tokens per word) against the char-level baseline. Because
BPE merge application is left-to-right non-overlapping pair
replacement, applying merge (a, b) to the spaced symbol string IS
`replace(sym, ' a  b ', ' ab ')` — so encoding is a fold of string
replaces, no per-symbol loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.curation3 import _BPE_MERGES
from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load


def _bpe_apply_oracle(k_merges: int) -> str:
    parts = [
        "WITH w AS (SELECT unnest(string_split(trim(text), ' ')) AS word"
        " FROM documents),",
        "v0 AS (SELECT word, count(*) AS freq,"
        r" ' ' || rtrim(regexp_replace(word, '(.)', '\1  ', 'g')) || ' '"
        " AS sym FROM w GROUP BY word)",
    ]
    # MATERIALIZED + 1-row cross joins: each v_k is referenced twice
    # (by p_{k+1} and v_{k+1}); without materialization DuckDB inlines
    # the chain and re-evaluates it combinatorially (measured: >5 min
    # for 5 rounds vs milliseconds materialized)
    for k in range(1, k_merges + 1):
        parts.append(
            f", p{k} AS MATERIALIZED (SELECT toks[i+1] AS x,"
            f" toks[i+2] AS y,"
            f" sum(freq) AS w FROM (SELECT freq, toks,"
            f" unnest(range(len(toks) - 1)) AS i FROM"
            f" (SELECT freq, string_split(trim(sym), '  ') AS toks"
            f" FROM v{k - 1}) WHERE len(toks) >= 2) GROUP BY 1, 2)"
        )
        parts.append(
            f", b{k} AS MATERIALIZED (SELECT x, y, w FROM p{k}"
            f" ORDER BY w DESC, x || ' ' || y LIMIT 1)"
        )
        parts.append(
            f", v{k} AS MATERIALIZED (SELECT word, freq, replace(sym,"
            f" ' ' || b.x || '  ' || b.y || ' ',"
            f" ' ' || b.x || b.y || ' ') AS sym"
            f" FROM v{k - 1} CROSS JOIN b{k} b)"
        )
    parts.append(f"""
    , enc AS (
      SELECT word, CAST(freq AS BIGINT) AS freq,
             CAST(len(word) AS BIGINT) AS n_chars,
             CAST(len(string_split(trim(sym), '  ')) AS BIGINT)
               AS n_tokens
      FROM v{k_merges}
    )
    SELECT word, freq, n_chars, n_tokens,
           n_chars - n_tokens AS merged_away,
           CAST(n_tokens * 1000000 // n_chars AS BIGINT)
             AS fertility_ppm
    FROM enc
    UNION ALL
    SELECT '_corpus_' AS word,
           CAST(sum(freq) AS BIGINT) AS freq,
           CAST(sum(freq * n_chars) AS BIGINT) AS n_chars,
           CAST(sum(freq * n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(freq * (n_chars - n_tokens)) AS BIGINT)
             AS merged_away,
           CAST(sum(freq * n_tokens) * 1000000 // sum(freq * n_chars)
             AS BIGINT) AS fertility_ppm
    FROM enc
    ORDER BY word
    """)
    return "".join(parts)


@query("bpe_apply_encode", oracle=_bpe_apply_oracle(_BPE_MERGES))
def bpe_apply_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING with the trained merges: retrain the 5
    `bpe_merge_train` merges (same construction — highest-weight
    adjacent pair per round, lexicographic tiebreak), apply them in
    rank order to every vocabulary word as a fold of left-to-right
    non-overlapping string replaces, and report per-word and corpus
    fertility (BPE tokens per char, ppm) — the apply half of the
    tokenizer that `tokenizer_fertility_audit` (curation4.py) audits
    for a fixed external vocab.

    Determinism: merge selection is (weight DESC, pair) over exact
    integer weights; replacement is the identical left-to-right
    non-overlapping `replace` on both engines; all outputs are exact
    integer counts/ppm.

    Scale: the corpus contributes one map-side-combined word-frequency
    groupBy; the 5 merge rounds and the encoding run on the bounded
    vocabulary dimension (exactly how real BPE trainers/encoders
    operate — on the word-frequency dict, never the raw corpus); each
    round's winner is a 1-row bounded collect.
    """
    d = load(spark, sf_dir, "documents")
    vocab = (
        d.select(
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
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
    for _k in range(_BPE_MERGES):
        pairs = (
            vocab.select(
                "freq", F.split(F.trim(F.col("sym")), "  ").alias("toks")
            )
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
        bx, by, _bw = (
            pairs.orderBy(
                F.desc("w"), F.concat(F.col("x"), F.lit(" "), F.col("y"))
            )
            .limit(1)
            .collect()[0]
        )
        old = vocab
        vocab = vocab.withColumn(
            "sym",
            F.expr(f"replace(sym, ' {bx}  {by} ', ' {bx}{by} ')"),
        ).cache()
        old.unpersist()
    enc = vocab.select(
        "word",
        F.col("freq").cast("bigint").alias("freq"),
        F.length("word").cast("bigint").alias("n_chars"),
        F.size(F.split(F.trim(F.col("sym")), "  "))
        .cast("bigint")
        .alias("n_tokens"),
    )
    per_word = enc.select(
        "word",
        "freq",
        "n_chars",
        "n_tokens",
        (F.col("n_chars") - F.col("n_tokens")).alias("merged_away"),
        F.expr("CAST(n_tokens * 1000000 div n_chars AS BIGINT)").alias(
            "fertility_ppm"
        ),
    )
    corpus = enc.agg(
        F.lit("_corpus_").alias("word"),
        F.sum("freq").cast("bigint").alias("freq"),
        F.sum(F.col("freq") * F.col("n_chars"))
        .cast("bigint")
        .alias("n_chars"),
        F.sum(F.col("freq") * F.col("n_tokens"))
        .cast("bigint")
        .alias("n_tokens"),
        F.sum(F.col("freq") * (F.col("n_chars") - F.col("n_tokens")))
        .cast("bigint")
        .alias("merged_away"),
        F.expr(
            """
            CAST(sum(freq * n_tokens) * 1000000
                 div sum(freq * n_chars) AS BIGINT)
            """
        ).alias("fertility_ppm"),
    )
    vocab.unpersist()
    return per_word.unionAll(corpus).orderBy("word")
