"""Training-data curation, round 2: repetition filters (Gopher-style),
blocklist scrubbing, deterministic stratified sampling, per-user event
histories, label centroids, int8 embedding quantization, and sketch-based
approximate distincts.

These extend the LLM-data-pipeline surface (SURVEY §2) beyond the
reference's own operators: a 100 TB curation run needs repetition/quality
gates, content scrubbing, reproducible sampling, and compact vector
representations as first-class plan nodes.

Scale notes: every per-document metric here is a shuffle-free codegen'd
higher-order-function fold (the top-bigram counter is an O(n log n)
sort-then-run-length fold over the token array — NOT an explode + groupBy,
which would shuffle the tokenized corpus). The only shuffles are the
intentionally tiny ones: per-lang sample report, per-label centroids
(|labels|×dim rows), per-user histories (bounded by a slice cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.functions import text as T
from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_DUCK_TOKS = "string_split(trim(text), ' ')"

# run-length fold over the sorted bigram array: max multiplicity in one pass
_TOP_RUN = """
aggregate(bg,
  named_struct('prev', cast(null as string), 'run', 0, 'best', 0),
  (acc, x) -> named_struct(
    'prev', x,
    'run', if(x <=> acc.prev, acc.run + 1, 1),
    'best', greatest(acc.best, if(x <=> acc.prev, acc.run + 1, 1))),
  acc -> acc.best)
"""


@query(
    "doc_repetition_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), b AS (
      SELECT doc_id, len(t) AS n, len(list_distinct(t)) AS nd,
             list_transform(generate_series(1, len(t) - 1),
                            i -> t[i] || ' ' || t[i + 1]) AS bg
      FROM t
    ), m AS (
      SELECT doc_id, max(cnt) AS top_n FROM (
        SELECT doc_id, g, count(*) AS cnt
        FROM (SELECT doc_id, unnest(bg) AS g FROM b) GROUP BY 1, 2
      ) GROUP BY 1
    )
    SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens,
           round(CAST(b.nd AS DOUBLE) / b.n, 6) AS distinct_ratio,
           CAST(m.top_n AS BIGINT) AS top_bigram_n,
           round(CAST(m.top_n AS DOUBLE) / (b.n - 1), 6) AS top_bigram_frac,
           (round(CAST(m.top_n AS DOUBLE) / (b.n - 1), 6) >= 0.1
            OR round(CAST(b.nd AS DOUBLE) / b.n, 6) <= 0.5) AS is_repetitive
    FROM b JOIN m USING (doc_id) ORDER BY doc_id
    """,
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gate: distinct-token ratio + most-frequent-
    bigram fraction per document, and a repetitive-document verdict.

    Scale: zero shuffles — bigrams are built with slice+zip_with, sorted,
    and the max multiplicity comes from a single O(n) run-length fold
    (``aggregate`` with a struct accumulator), all inside codegen. The
    naive plan (explode bigrams → groupBy(doc_id, gram) → max count)
    shuffles ~n_tokens rows per document; this shuffles none. The verdict
    compares ROUNDED ratios so the flag cannot flip on float noise.
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", T.tokens("text").alias("t"))
        .withColumn("n", F.size("t"))
        .withColumn("nd", F.size(F.array_distinct("t")))
        .withColumn(
            "bg",
            F.expr(
                "array_sort(zip_with(slice(t, 1, n - 1), slice(t, 2, n - 1),"
                " (a, b) -> concat(a, ' ', b)))"
            ),
        )
        .withColumn("top_n", F.expr(_TOP_RUN))
        .select(
            "doc_id",
            F.col("n").cast("bigint").alias("n_tokens"),
            F.round(F.col("nd").cast("double") / F.col("n"), 6).alias("distinct_ratio"),
            F.col("top_n").cast("bigint").alias("top_bigram_n"),
            F.round(F.col("top_n").cast("double") / (F.col("n") - 1), 6).alias(
                "top_bigram_frac"
            ),
        )
        .withColumn(
            "is_repetitive",
            (F.col("top_bigram_frac") >= 0.1) | (F.col("distinct_ratio") <= 0.5),
        )
        .orderBy("doc_id")
    )


_BLOCK_RE = r"\b(customer|spark|vector)\b"


@query(
    "blocklist_scrub",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BLOCK_RE}')) AS BIGINT) AS n_hits,
           regexp_replace(text, '{_BLOCK_RE}', '[MASKED]', 'g') AS scrubbed
    FROM documents ORDER BY doc_id
    """,
)
def blocklist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-blocklist content scrub (the PII/contraband-removal stage of a
    curation pipeline): count and mask blocklisted terms with word
    boundaries. Per-row regex inside codegen — at 100 TB this is a
    map-only pass that rewrites the corpus with zero shuffles; a real
    deployment swaps the demo blocklist for the policy list.
    """
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(_BLOCK_RE)).cast("bigint").alias("n_hits"),
        F.regexp_replace("text", _BLOCK_RE, "[MASKED]").alias("scrubbed"),
    ).orderBy("doc_id")


@query(
    "sample_stratified_det",
    oracle="""
    SELECT lang,
           count(*) AS n_total,
           CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '19'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           round(CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '19'
                         THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS sample_rate
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def sample_stratified_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling (~10%: md5 prefix <= '19' is 26/256) with
    a per-language acceptance report — the reproducible-subset primitive for
    eval-set carve-outs and pipeline smoke runs.

    Scale: the sampling decision is a pure function of the row key (no RNG
    state, no seed plumbing), so it is stable under retries, repartitions
    and re-runs — the property that matters when the sample defines a
    train/eval boundary. One scan, one tiny per-lang shuffle.
    """
    d = load(spark, sf_dir, "documents")
    keep = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) <= "19"
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_sampled"),
            F.round(
                F.sum(F.when(keep, 1).otherwise(0)).cast("double") / F.count(F.lit(1)),
                6,
            ).alias("sample_rate"),
        )
        .orderBy("lang")
    )


@query(
    "user_event_history",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS first_ts, max(ts) AS last_ts,
           array_to_string((list(event_type ORDER BY ts, event_id))[1:20],
                           ',') AS history
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered interaction history (the sequence-features input for
    behavioral / sessionized training data): event count, first/last
    timestamps, and the first 20 event types ordered by (ts, event_id),
    serialized as a comma-joined string so the result is scalar-typed
    (portable to any result hasher — no array columns at the query edge).

    Scale: the history is capped BEFORE collecting — a row_number window
    on (user_id | ts, event_id) marks the first 20 events and collect_list
    only ever sees ≤20 structs per user, so no executor materializes a
    whale user's full history. The window and the groupBy hash-partition
    on the same key, so the aggregation reuses the window's exchange: one
    shuffle total.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = e.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rn") <= 20,
                                F.struct("rn", "event_type"),
                            )
                        )
                    ),
                    lambda x: x.event_type,
                ),
            ).alias("history"),
        )
        .orderBy("user_id")
    )


@query(
    "embed_label_centroids",
    oracle="""
    WITH e AS (
      SELECT label,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS v6,
             unnest(generate_series(1, len(embedding))) AS pos
      FROM embeddings
    ), d AS (
      SELECT label, pos,
             CAST(floor((2 * CAST(sum(v6) AS DOUBLE) + count(*))
                        / (2.0 * count(*))) AS BIGINT) AS m6
      FROM e GROUP BY 1, 2
    ), q AS (
      SELECT label, pos, m6, m6 / CAST(1000000 AS DOUBLE) AS m FROM d
    ), n AS (
      SELECT label, count(*) AS n_vectors FROM embeddings GROUP BY 1
    ), norms AS (
      SELECT label,
             sqrt(CAST(sum(m6 * m6) AS DOUBLE)) / CAST(1000000 AS DOUBLE)
               AS centroid_norm
      FROM q GROUP BY 1
    )
    SELECT q.label, CAST(n.n_vectors AS BIGINT) AS n_vectors,
           CAST(q.pos AS BIGINT) AS pos, q.m, norms.centroid_norm
    FROM q JOIN n USING (label) JOIN norms USING (label)
    ORDER BY label, pos
    """,
)
def embed_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (class prototypes for nearest-centroid
    classification / cluster seeding) with vector counts and norms, emitted
    as one row per (label, dimension) — the `band_composites` shape — so
    every output column is scalar-typed and value-hashable by any harness.

    Scale: posexplode → groupBy(label, pos) is the transpose-free
    elementwise mean — the shuffle carries |labels|×dim partial sums (map-
    side combined), never whole vectors. All float math is order-proof AND
    rendering-proof: elements are quantized to exact int64 micro-units
    before summing (integer addition commutes; a float sum's rounding
    would depend on partition order), the mean is a half-up integer
    division expressed as floor((2s+n)/(2n)) — no round(x, k) whose
    decimal-rendering rule differs between engines — and the norm is sqrt
    of an exact integer sum of squares. Every output double is computed by
    the identical IEEE expression tree on both engines.
    """
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        "label",
        F.posexplode("embedding").alias("pos0", "v"),
    ).select(
        "label",
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        F.expr("CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)").alias("v6"),
    )
    d = ex.groupBy("label", "pos").agg(
        F.sum("v6").alias("s"), F.count(F.lit(1)).alias("cnt")
    )
    q = d.select(
        "label",
        "pos",
        F.expr(
            "CAST(floor((2 * CAST(s AS DOUBLE) + cnt) / (2.0 * cnt)) AS BIGINT)"
        ).alias("m6"),
    ).withColumn("m", F.col("m6") / F.lit(1000000.0))
    n = e.groupBy("label").agg(F.count(F.lit(1)).cast("bigint").alias("n_vectors"))
    norms = q.groupBy("label").agg(
        (
            F.sqrt(F.sum(F.col("m6") * F.col("m6")).cast("double"))
            / F.lit(1000000.0)
        ).alias("centroid_norm")
    )
    return (
        q.join(F.broadcast(n), "label")
        .join(F.broadcast(norms), "label")
        .select("label", "n_vectors", "pos", "m", "centroid_norm")
        .orderBy("label", "pos")
    )


@query(
    "quantize_embeddings_int8",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), m AS (
      SELECT vec_id, e, list_min(e) AS mn, list_max(e) AS mx FROM v
    )
    SELECT vec_id,
           CAST(round(mn * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)
             AS vmin,
           CAST(round(mx * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)
             AS vmax,
           array_to_string(
             list_transform(e, x -> CAST(CAST(round(((x - mn) / (mx - mn))
                                               * 255) AS INTEGER) - 128
                                         AS VARCHAR)),
             ',') AS qvec
    FROM m ORDER BY vec_id
    """,
)
def quantize_embeddings_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization (4× footprint cut for ANN shards):
    q = round((x − min) / (max − min) · 255) − 128, plus the (min, max)
    dequantization params.

    Scale: pure per-row higher-order functions in codegen, zero shuffles —
    quantizing a 100 TB embedding store is a map-only rewrite. The double
    math uses the identical expression tree on both engines so the rounded
    integers match exactly (both round half-away-from-zero on the
    non-negative scaled values). The int8 vector is emitted comma-joined
    (scalar string, portable to any result hasher); integer→string
    rendering is identical on both engines, unlike doubles.
    """
    e = load(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return (
        e.select("vec_id", v.alias("e"))
        .withColumn("mn", F.array_min("e"))
        .withColumn("mx", F.array_max("e"))
        .select(
            "vec_id",
            F.expr(
                "CAST(round(mn * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)"
            ).alias("vmin"),
            F.expr(
                "CAST(round(mx * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)"
            ).alias("vmax"),
            F.expr(
                "array_join(transform(e, x ->"
                " cast(cast(round(((x - mn) / (mx - mn)) * 255) as int) - 128"
                " as string)), ',')"
            ).alias("qvec"),
        )
        .sortWithinPartitions("vec_id")
    )


@query(
    "events_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS hll_within_5pct
    FROM events GROUP BY 1 ORDER BY event_type
    """,
)
def events_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct users per event type, validated
    in-query against the exact count: the output carries the exact
    cardinality plus a flag asserting the HLL estimate landed within 5%
    (rsd is configured at 2%, so a breach means the sketch is broken).
    The oracle recomputes the exact count and expects the flag TRUE —
    the sketch's accuracy contract is value-checked even though its
    registers are engine-specific (DuckDB's approx_distinct seeds its HLL
    differently, so the raw estimate itself can never hash-match).

    Scale: this is THE cardinality primitive at 100 TB — the HLL sketch is
    a fixed-size mergeable register set, so the shuffle carries ~1.5 KB per
    (group, sketch) instead of one row per distinct user; exact distinct
    shuffles every (event_type, user_id) pair (here it doubles as the
    in-query ground truth).
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("hll_within_5pct"),
        )
        .orderBy("event_type")
    )


@query(
    "sample_weighted_det",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang,
             CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens,
             least(len({_DUCK_TOKS}) / 200.0, 1.0) AS keep_p,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                            list_transform(generate_series(1, 32),
                                           i -> ord(substr(md5(CAST(doc_id AS VARCHAR)), CAST(i AS INTEGER), 1)))),
               (acc, c) -> (acc * {T.FP_BASE} + c) % {T.FP_MOD}) * 1.0
               / {T.FP_MOD} AS u
      FROM documents
    )
    SELECT lang, count(*) AS n_total,
           CAST(sum(CASE WHEN u < keep_p THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           round(sum(CASE WHEN u < keep_p THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS kept_frac,
           round(sum(CASE WHEN u < keep_p THEN n_tokens ELSE 0 END) * 1.0
                 / greatest(sum(CASE WHEN u < keep_p THEN 1 ELSE 0 END), 1),
                 6) AS avg_tokens_kept
    FROM w GROUP BY lang ORDER BY lang
    """,
)
def sample_weighted_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted deterministic sampling: each document's keep
    probability scales with its token count (capped at 1), and the accept
    decision compares that weight against a portable hash of the doc key
    mapped to [0, 1) — weighted sampling with zero RNG state, the
    primitive behind quality-weighted corpus mixing ("sample good docs
    more") in training-data pipelines.

    Scale: accept/reject is a pure per-row function of (key, weight) —
    stable under retries, repartitions and re-runs, trivially parallel,
    exactly reproducible across engines (the hash is the repo's integer
    polynomial fold, so the oracle verifies the SAME sample, not just
    sample-rate statistics). One scan + one tiny per-lang shuffle.
    """
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim("text"), " "))
    keep_p = F.least(n_tokens / 200.0, F.lit(1.0))
    # fold over the 32-char md5 hex of the key: short raw keys would fold
    # to tiny values and accept everything — md5 mixes first
    u = (
        T.rolling_fingerprint(F.md5(F.col("doc_id").cast("string"))) * 1.0
        / T.FP_MOD
    )
    kept = F.when(u < keep_p, 1).otherwise(0)
    return (
        d.select("lang", n_tokens.cast("bigint").alias("n_tokens"),
                 kept.alias("kept"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").cast("bigint").alias("n_kept"),
            F.round(F.sum("kept") / F.count(F.lit(1)), 6).alias("kept_frac"),
            F.round(
                F.sum(F.when(F.col("kept") == 1, F.col("n_tokens")).otherwise(0))
                / F.greatest(F.sum("kept"), F.lit(1)),
                6,
            ).alias("avg_tokens_kept"),
        )
        .orderBy("lang")
    )
