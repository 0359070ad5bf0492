"""Curation wave 4: semantic dedup (SemDeDup), corpus-internal repeated-
span masking (Lee et al. 2022), and tokenizer fertility auditing.

All three are LLM-training-data curation passes over ``documents`` /
``embeddings`` with full DuckDB oracles (portable integer/fixed-point
arithmetic throughout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.functions import arrays as A
from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

SEM_CELL_ROWS = 2048  # target cell population; k = max(16, n/2048)
SEM_TAU = 0.25  # within-cell cosine threshold for "semantic duplicate"


@query(
    "semdedup_cells",
    oracle=f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS DOUBLE)) AS v
      FROM embeddings
    ), n AS (
      SELECT count(*) AS n,
             greatest(16, count(*) // {SEM_CELL_ROWS}) AS k,
             greatest(count(*) // greatest(16, count(*) // {SEM_CELL_ROWS}), 1)
               AS step
      FROM e
    ), g AS (
      -- integer isqrt-ceil of k: floor(sqrt) then bump if it undershoots
      SELECT k, step,
             CAST(floor(sqrt(CAST(k AS DOUBLE))) AS BIGINT)
             + CASE WHEN CAST(floor(sqrt(CAST(k AS DOUBLE))) AS BIGINT)
                         * CAST(floor(sqrt(CAST(k AS DOUBLE))) AS BIGINT) < k
                    THEN 1 ELSE 0 END AS gsize
      FROM n
    ),
    cents AS (
      SELECT CAST(vec_id / (SELECT step FROM n) AS INTEGER) AS cell, v AS cv
      FROM e
      WHERE vec_id % (SELECT step FROM n) = 0
        AND vec_id / (SELECT step FROM n) < (SELECT k FROM n)
    ), coarse AS (
      SELECT cell // (SELECT gsize FROM g) AS grp, cv AS gv
      FROM cents WHERE cell % (SELECT gsize FROM g) = 0
    ), a1 AS (
      SELECT e.vec_id, e.v, c.grp,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_dot_product(e.v, c.gv)
                 / (sqrt(list_dot_product(e.v, e.v))
                    * sqrt(list_dot_product(c.gv, c.gv))) DESC, c.grp) AS r
      FROM e CROSS JOIN coarse c
    ), a2 AS (
      SELECT a.vec_id, a.v, c.cell,
             row_number() OVER (PARTITION BY a.vec_id
               ORDER BY list_dot_product(a.v, c.cv)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(c.cv, c.cv))) DESC, c.cell) AS r
      FROM (SELECT vec_id, v, grp FROM a1 WHERE r = 1) a
      JOIN cents c ON c.cell // (SELECT gsize FROM g) = a.grp
    ), m AS (SELECT vec_id, v, cell FROM a2 WHERE r = 1),
    removed AS (
      SELECT DISTINCT b.vec_id, b.cell
      FROM m a JOIN m b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))) >= {SEM_TAU}
    )
    SELECT m.cell, CAST(count(*) AS BIGINT) AS n_members,
           CAST(count(r.vec_id) AS BIGINT) AS n_removed,
           CAST((count(*) - count(r.vec_id)) * 1000000 // count(*) AS BIGINT)
             AS keep_ppm
    FROM m LEFT JOIN removed r ON r.vec_id = m.vec_id AND r.cell = m.cell
    GROUP BY 1 ORDER BY 1
    """,
)
def semdedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space into
    cells, then inside each cell drop every vector that has a LOWER-id
    semantic duplicate (cosine ≥ τ) — keep-one-per-duplicate-group, the
    curation pass that removed 50% of LAION with no quality loss. Cells
    come from the deterministic stride quantizer (ann_ivf_topk's
    centroids) behind a TWO-LEVEL assignment: vectors pick the best of
    ~√k coarse representatives (every gsize-th fine centroid), then the
    best fine centroid inside the winning group — O(n·√k) cosines, not
    the O(n·k) = O(n²/{SEM_CELL_ROWS}) flat argmax the round-6 sf1 sweep
    measured at 295 s. All cosines are fixed-point-exact, so assignment,
    the removal set, and per-cell keep rates stay bit-identical across
    engines.

    Scale: assignment is O(n·√k) broadcast work; the within-cell verify
    is quadratic ONLY in cell population (|cell| ≈ {SEM_CELL_ROWS} by
    construction since k grows with n) and runs as ONE Arrow-batched
    GEMM per cell via applyInPandas — the n·m dot products a cell needs
    are a single (m×64)·(64×m) matrix multiply whose integer-valued
    entries are exact in float64 in any summation order, so the verdicts
    match the oracle's pairwise expression bit-for-bit. Total work
    O(n·√k + n·{SEM_CELL_ROWS}), linear in n at fixed cell size.
    """
    import math

    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 10000)
        ).alias("v"),
    )
    n = e.count()
    k = max(16, n // SEM_CELL_ROWS)  # cells grow with the corpus
    step = max(n // k, 1)
    isq = math.isqrt(k)
    gsize = isq + (1 if isq * isq < k else 0)  # ceil(sqrt(k)), exact ints
    # r10: the two-level assignment used to run as two explode+window
    # stages (e × coarse reps through an interpreted HOF cosine, then a
    # row_number window per vec_id, twice) — the r10 warm decomposition
    # measured that pair of stages as the whole of semdedup's 18.5×
    # same-frame sf10 ratio (the windows shuffle ~2M WIDE rows carrying
    # the 64-double vector each, and the HOF fold is interpreted per
    # element). The centroid frame is k ≤ n/{SEM_CELL_ROWS} rows — driver
    # -tiny by construction — so assignment is now ONE Arrow-batched
    # numpy pass: a (batch × k) GEMM against the collected centroid
    # matrix, coarse argmax then fine argmax restricted to the winning
    # group's columns. Cosines are the identical dot/(sqrt·sqrt) double
    # expression on integer-exact dots (bit-equal to the JVM fold and
    # the oracle's SQL — the cell_report GEMM's argument), and np.argmax
    # takes the FIRST max, mirroring both windows' (cos DESC, id ASC)
    # tie-break. Zero shuffles until the one groupBy(cell).
    cent_rows = sorted(
        e.where((F.col("vec_id") % step == 0) & (F.col("vec_id") / step < k))
        .select((F.col("vec_id") / step).cast("int").alias("cell"), "v")
        .collect(),
        key=lambda r: r.cell,
    )
    C = np.array([r.v for r in cent_rows], dtype=np.float64)  # (k, 64)
    cell_ids = np.array([r.cell for r in cent_rows], dtype=np.int64)
    cn = np.sqrt((C * C).sum(axis=1))
    grp_of_cell = cell_ids // gsize
    coarse_mask = cell_ids % gsize == 0
    G = C[coarse_mask]
    gn = cn[coarse_mask]
    grp_ids = grp_of_cell[coarse_mask]

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            nv = np.sqrt((V * V).sum(axis=1))
            gcos = (V @ G.T) / (nv[:, None] * gn[None, :])
            best_grp = grp_ids[np.argmax(gcos, axis=1)]
            ccos = (V @ C.T) / (nv[:, None] * cn[None, :])
            ccos[grp_of_cell[None, :] != best_grp[:, None]] = -np.inf
            cell = cell_ids[np.argmax(ccos, axis=1)]
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "v": pdf["v"], "cell": cell}
            )

    m = e.mapInPandas(assign, "vec_id long, v array<double>, cell int")

    def cell_report(pdf: pd.DataFrame) -> pd.DataFrame:
        # one GEMM per cell replaces |cell|²/2 interpreted HOF cosine
        # folds; entries are sums of 64 integer products < 2^36, exact in
        # float64 in any order, and the cosine expression mirrors the
        # oracle's dot / (sqrt(na)·sqrt(nb)) association exactly
        pdf = pdf.sort_values("vec_id", ignore_index=True)
        V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        D = V @ V.T
        s = np.sqrt(np.diag(D))
        C = D / np.outer(s, s)
        dup = np.triu(C >= SEM_TAU, k=1).any(axis=0)  # lower-id dup exists
        nm = len(pdf)
        nr = int(dup.sum())
        return pd.DataFrame(
            {
                "cell": [int(pdf["cell"].iloc[0])],
                "n_members": [nm],
                "n_removed": [nr],
                "keep_ppm": [(nm - nr) * 1_000_000 // nm],
            }
        )

    return (
        m.groupBy("cell")
        .applyInPandas(
            cell_report,
            "cell int, n_members bigint, n_removed bigint, keep_ppm bigint",
        )
        .orderBy("cell")
    )


SPAN_N = 8  # repeated-span gram width (tokens)


@query(
    "repeated_span_mask",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ), grams AS (
      SELECT doc_id, i - 1 AS start,
             array_to_string(w[i:i + {SPAN_N - 1}], ' ') AS gram
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - {SPAN_N - 1}))
                   AS i
            FROM toks WHERE len(w) >= {SPAN_N})
    ), rep AS (
      SELECT gram FROM grams GROUP BY gram
      HAVING count(DISTINCT doc_id) >= 2
    ), hits AS (
      SELECT g.doc_id, g.start FROM grams g JOIN rep USING (gram)
    ), masked AS (
      SELECT doc_id,
             count(DISTINCT start) AS n_spans,
             count(DISTINCT start + o.o) AS n_masked
      FROM hits, (SELECT unnest(range(0, {SPAN_N})) AS o) o
      GROUP BY 1
    )
    SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
           CAST(coalesce(m.n_spans, 0) AS BIGINT) AS n_repeated_spans,
           CAST(coalesce(m.n_masked, 0) AS BIGINT) AS n_masked_tokens,
           CAST(coalesce(m.n_masked, 0) * 1000000 // len(t.w) AS BIGINT)
             AS masked_ppm
    FROM toks t LEFT JOIN masked m USING (doc_id)
    WHERE len(t.w) > 0
    ORDER BY doc_id
    """,
)
def repeated_span_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-internal verbatim-span dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    {SPAN_N}-token gram that occurs verbatim in ≥2 DISTINCT documents
    marks its span for masking; per document the report counts repeated
    span starts, the union of masked token positions (overlapping spans
    merged via distinct positions), and the masked fraction in exact ppm
    — the substring-level dedup that removes boilerplate exact dedup
    misses. Distinct from decontaminate_8gram (train-vs-eval): this is
    train-vs-train.

    Scale: gram emission is a narrow per-row explode; the df filter is a
    map-side-combinable groupBy on the gram (at 100 TB: on its xxhash64,
    shuffling 8-byte keys); only REPEATED grams flow back through the
    equi-join, and the span-union fan-out is a bounded ×{SPAN_N} explode
    of those hits — never of the corpus.
    """
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("w")
    )
    grams = (
        toks.where(F.size("w") >= SPAN_N)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(w) - {SPAN_N - 1}),"
                    f" i -> array_join(slice(w, i, {SPAN_N}), ' '))"
                )
            ).alias("start", "gram"),
        )
    )
    rep = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .where(F.col("ndocs") >= 2)
        .select("gram")
    )
    hits = grams.join(rep, "gram").select("doc_id", "start")
    masked = (
        hits.select(
            "doc_id",
            "start",
            F.explode(F.sequence(F.lit(0), F.lit(SPAN_N - 1))).alias("o"),
        )
        .groupBy("doc_id")
        .agg(
            F.count_distinct("start").alias("n_spans"),
            F.count_distinct(F.col("start") + F.col("o")).alias("n_masked"),
        )
    )
    return (
        toks.where(F.size("w") > 0)
        .join(masked, "doc_id", "left")
        .select(
            "doc_id",
            F.size("w").cast("bigint").alias("n_tokens"),
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_repeated_spans"),
            F.coalesce("n_masked", F.lit(0)).cast("bigint").alias("n_masked_tokens"),
            F.expr(
                "CAST(coalesce(n_masked, 0) * 1000000 div size(w) AS BIGINT)"
            ).alias("masked_ppm"),
        )
        .orderBy("doc_id")
    )


@query(
    "tokenizer_fertility_audit",
    oracle="""
    WITH d AS (
      SELECT lang,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(string_split(trim(text), ' '),
                                          x -> (length(x) + 3) // 4))
                  AS BIGINT) AS n_tokens,
             CAST(length(text) AS BIGINT) AS n_bytes
      FROM documents
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS words,
           CAST(sum(n_tokens) AS BIGINT) AS tokens,
           CAST(sum(n_tokens) * 1000000 // sum(n_words) AS BIGINT)
             AS fertility_ppm,
           CAST(sum(n_bytes) * 1000000 // sum(n_tokens) AS BIGINT)
             AS micro_bytes_per_token
    FROM d GROUP BY 1 ORDER BY 1
    """,
)
def tokenizer_fertility_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit: per language, subword-pieces-per-word
    (the fertility a tokenizer team tracks to spot languages the vocab
    under-serves) and bytes-per-token. The tokenizer stand-in is a
    fixed-width subword segmenter — ceil(len(word)/4) pieces per word,
    the deterministic proxy for a 4-chars-per-piece BPE — so fertility
    varies with each language's word-length mix. Exact integer ppm.

    Scale: map-only per-word arithmetic (one fold per row) + one
    |langs|-row combinable rollup.
    """
    d = load(spark, sf_dir, "documents").select(
        "lang",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint").alias("n_words"),
        F.expr(
            "aggregate(transform(split(trim(text), ' '),"
            " x -> (length(x) + 3) div 4), 0L, (a, x) -> a + x)"
        ).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_bytes"),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("words"),
            F.sum("n_tokens").cast("bigint").alias("tokens"),
            F.expr(
                "CAST(sum(n_tokens) * 1000000 div sum(n_words) AS BIGINT)"
            ).alias("fertility_ppm"),
            F.expr(
                "CAST(sum(n_bytes) * 1000000 div sum(n_tokens) AS BIGINT)"
            ).alias("micro_bytes_per_token"),
        )
        .orderBy("lang")
    )
