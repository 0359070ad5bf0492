"""Curation wave 7: DSIR importance-resampling weights and phonetic
blocking for record linkage.

DSIR (Data Selection via Importance Resampling, Xie et al. 2023) is the
standard recipe for picking pretraining documents that "look like" a
target domain: hashed n-gram bag models for target and raw pools, then a
per-document log importance weight under the two models. The phonetic
blocking audit measures the candidate-pair reduction a Soundex-style
code buys before any expensive pairwise matcher runs — the knob that
makes entity resolution feasible at catalog scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_HEX = "0123456789abcdef"
_DSIR_B = 64  # hashed-feature buckets
_DSIR_LANG = "en"  # target domain: English documents

_DSIR_SLOT_SQL = (
    f"((strpos('{_HEX}', substr(md5(word), 1, 1)) - 1) * 16"
    f" + strpos('{_HEX}', substr(md5(word), 2, 1)) - 1) % {_DSIR_B}"
)


@query(
    "dsir_importance_weights",
    headline=True,
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(string_split(trim(text), ' ')) AS word
      FROM documents
    ), ds AS (
      SELECT doc_id, CAST({_DSIR_SLOT_SQL} AS BIGINT) AS slot,
             CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    ), raw AS (
      SELECT CAST({_DSIR_SLOT_SQL} AS BIGINT) AS slot,
             CAST(count(*) AS BIGINT) AS cr,
             CAST(sum(CASE WHEN lang = '{_DSIR_LANG}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ct
      FROM toks GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(cr) AS BIGINT) AS tr, CAST(sum(ct) AS BIGINT) AS tt
      FROM raw
    ), lr AS (
      SELECT slot,
             ln((ct + 1) / (CAST(tt AS DOUBLE) + {_DSIR_B}))
               - ln((cr + 1) / (CAST(tr AS DOUBLE) + {_DSIR_B})) AS lw
      FROM raw CROSS JOIN tot
    ), perdoc AS (
      SELECT ds.doc_id,
             CAST(sum(ds.c) AS BIGINT) AS n_tok,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(ds.c * lr.lw ORDER BY ds.slot)), (a, v) -> a + v)
               AS logw
      FROM ds JOIN lr USING (slot) GROUP BY 1
    )
    SELECT p.doc_id, p.n_tok,
           round(p.logw, 6) AS logw,
           round(p.logw / p.n_tok, 6) AS logw_per_tok,
           (p.logw > 0) AS target_like,
           (d.lang = '{_DSIR_LANG}') AS is_target
    FROM perdoc p JOIN documents d USING (doc_id)
    ORDER BY doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): score every document by
    log p_target(d)/p_raw(d) under hashed-unigram bag models — target =
    {_DSIR_LANG!r} docs, raw = whole pool, {_DSIR_B} md5-hashed feature
    buckets with add-one smoothing. Documents with positive weight "look
    like" the target domain and get kept/upsampled in pretraining-data
    selection; the is_target column lets the oracle confirm the weights
    actually separate the domains. Per-bucket counts are exact int64;
    each doc's weight sums its ≤{_DSIR_B} slot contributions in a
    slot-SORTED ordered fold — the repo's standard cross-engine float
    determinism trick — with the log-ratio computed once per slot on the
    {_DSIR_B}-row dimension.

    Scale: two map-side-combinable groupBys over the token stream (per
    (doc, slot) and per slot); the {_DSIR_B}-row model broadcasts into
    the per-doc join, so cost is one shuffle of (doc, slot) cells —
    never vocabulary-sized state per executor. This is the exact shape
    DSIR runs at 100 TB (the paper uses 10k buckets; the constant is a
    config knob).
    """
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("word"),
    )
    slot = (
        F.conv(F.substring(F.md5("word"), 1, 2), 16, 10).cast("bigint")
        % _DSIR_B
    )
    # ONE token pass: the (doc, slot) cells carry lang (constant per
    # doc), so both the per-doc counts AND the per-slot model derive
    # from this single map-side-combined aggregate — no second explode.
    # (A broadcast word→slot dimension was measured SLOWER here — the
    # per-token hash-join probe costs more than codegen'd md5 at this
    # vocabulary size; revisit only when tokens/vocab >> 1e4.)
    #
    # r11: CACHED — cells feeds three branches (perdoc via ds, the lr
    # model, and tot inside lr's broadcast), and their column-pruned
    # copies of this aggregate no longer canonicalize equal, so AQE
    # reused nothing: the r10 plan re-ran the tokenize+md5 corpus pass
    # THREE times (6 parquet scans in
    # plans/r10/dsir_importance_weights_after.txt). cells is the
    # ~40 B/(doc,slot) minority (≤256 rows/doc, ~10× smaller than the
    # token stream it summarizes) — the §5 persist-the-minority case;
    # at cluster scale persist DISK_ONLY per the growing-frame
    # discipline.
    cells = (
        toks.select("doc_id", "lang", slot.alias("slot"))
        .groupBy("doc_id", "lang", "slot")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .cache()
    )
    # lang rides along: it is constant per doc (cells carries it already),
    # so grouping on (doc_id, lang) makes the final documents join — a
    # second parquet scan + broadcast build in the before plan — redundant
    ds = cells.select("doc_id", "lang", "slot", "c")
    raw = cells.groupBy("slot").agg(
        F.sum("c").cast("bigint").alias("cr"),
        F.sum(F.when(F.col("lang") == _DSIR_LANG, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("ct"),
    )
    tot = raw.agg(
        F.sum("cr").cast("bigint").alias("tr"),
        F.sum("ct").cast("bigint").alias("tt"),
    )
    lr = raw.crossJoin(F.broadcast(tot)).select(
        "slot",
        (
            F.log((F.col("ct") + 1) / (F.col("tt").cast("double") + _DSIR_B))
            - F.log((F.col("cr") + 1) / (F.col("tr").cast("double") + _DSIR_B))
        ).alias("lw"),
    )
    perdoc = (
        ds.join(F.broadcast(lr), "slot")
        .select(
            "doc_id",
            "lang",
            "slot",
            "c",
            (F.col("c") * F.col("lw")).alias("contrib"),
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").cast("bigint").alias("n_tok"),
            F.expr(
                """
                aggregate(
                  transform(array_sort(collect_list(struct(slot, contrib))),
                            x -> x.contrib),
                  CAST(0.0 AS DOUBLE), (a, v) -> a + v)
                """
            ).alias("logw"),
        )
    )
    return (
        perdoc
        .select(
            "doc_id",
            "n_tok",
            F.round("logw", 6).alias("logw"),
            F.round(F.col("logw") / F.col("n_tok"), 6).alias("logw_per_tok"),
            (F.col("logw") > 0).alias("target_like"),
            (F.col("lang") == _DSIR_LANG).alias("is_target"),
        )
        .orderBy("doc_id")
    )


# Portable simplified-Soundex: keep the first letter, map the remaining
# consonants to digit classes, drop vowels/h/w/y, collapse runs, pad to 3
# digits. translate() drops chars with no counterpart in BOTH engines.
_PH_FROM = "bfpvcgjkqsxzdtlmnraeiouhwy"
_PH_TO = "111122222222334556"


def _phonetic_sql(col: str, dialect: str) -> str:
    """Same phonetic code in both dialects: Spark regexp_replace is
    global with $1 backrefs; DuckDB needs the 'g' flag and \\1 refs."""
    if dialect == "duckdb":
        collapse = "regexp_replace({m}, '(\\d)\\1+', '\\1', 'g')"
    else:
        collapse = "regexp_replace({m}, '(\\\\d)\\\\1+', '$1')"
    mapped = f"translate(substr({col}, 2), '{_PH_FROM}', '{_PH_TO}')"
    return (
        f"upper(substr({col}, 1, 1)) || rpad(substr("
        + collapse.format(m=mapped)
        + ", 1, 3), 3, '0')"
    )


@query(
    "phonetic_blocking_audit",
    oracle=f"""
    WITH names AS (
      SELECT DISTINCT p_name AS name FROM part
    ), coded AS (
      SELECT name, {_phonetic_sql("name", "duckdb")} AS code FROM names
    ), blocks AS (
      SELECT code, CAST(count(*) AS BIGINT) AS sz FROM coded GROUP BY 1
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS blocked_pairs,
             CAST(max(sz) AS BIGINT) AS max_block
      FROM blocks
    ), names_tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM coded),
    cross_pairs AS (
      SELECT CAST(count(*) AS BIGINT) AS n_fuzzy
      FROM coded a JOIN coded b
        ON a.code = b.code AND a.name < b.name
      WHERE levenshtein(a.name, b.name) <= 3
    )
    SELECT nt.nn AS n_names,
           t.n AS n_blocks,
           t.max_block,
           t.blocked_pairs,
           nt.nn * (nt.nn - 1) // 2 AS allpairs,
           CAST(t.blocked_pairs * 1000000 // (nt.nn * (nt.nn - 1) // 2)
                AS BIGINT) AS pair_ratio_ppm,
           cp.n_fuzzy AS n_fuzzy_matches
    FROM tot t CROSS JOIN names_tot nt CROSS JOIN cross_pairs cp
    """,
)
def phonetic_blocking_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic (simplified-Soundex) blocking audit for entity
    resolution: code every distinct part name with a portable
    first-letter + consonant-class code, then report the block-size
    profile and the candidate-pair REDUCTION the blocking buys versus
    the all-pairs cross join (exact ppm), plus how many fuzzy matches
    (edit distance ≤3) survive inside the blocks. This is the metric
    that decides whether a blocking key is usable before any O(n²)
    matcher runs — complements fuzzy_name_match (first-char blocking)
    with the phonetic key family every linkage library ships. The code
    uses only translate/regexp/substring primitives with identical
    semantics in both engines (translate drops unmapped chars in both).

    Scale: coding is a map-only expression over the DISTINCT name
    dimension; pair counting needs only block sizes (Σ sz·(sz−1)/2) —
    no pair materialization; the in-block fuzzy join touches pairs only
    inside blocks (candidate volume = blocked_pairs, audited by this
    very query).
    """
    names = load(spark, sf_dir, "part").select(
        F.col("p_name").alias("name")
    ).distinct()
    coded = names.select(
        "name", F.expr(_phonetic_sql("name", "spark")).alias("code")
    )
    blocks = coded.groupBy("code").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    tot = blocks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum(F.expr("sz * (sz - 1) div 2")).cast("bigint").alias(
            "blocked_pairs"
        ),
        F.max("sz").cast("bigint").alias("max_block"),
    )
    nt = coded.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    a = coded.select(F.col("name").alias("na"), F.col("code").alias("ca"))
    b = coded.select(F.col("name").alias("nb"), F.col("code").alias("cb"))
    cp = (
        a.join(b, (F.col("ca") == F.col("cb")) & (F.col("na") < F.col("nb")))
        .where(F.levenshtein("na", "nb") <= 3)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_fuzzy"))
    )
    return (
        tot.crossJoin(nt)
        .crossJoin(cp)
        .select(
            F.col("nn").alias("n_names"),
            F.col("n_blocks"),
            "max_block",
            "blocked_pairs",
            F.expr("nn * (nn - 1) div 2").alias("allpairs"),
            F.expr(
                "CAST(blocked_pairs * 1000000 div (nn * (nn - 1) div 2)"
                " AS BIGINT)"
            ).alias("pair_ratio_ppm"),
            F.col("n_fuzzy").alias("n_fuzzy_matches"),
        )
    )
