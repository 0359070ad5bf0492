"""Search wave 4: MMR diversified re-ranking, simplified silhouette
scoring, and Brier-score decomposition.

Maximal Marginal Relevance (Carbonell-Goldstein '98) is the standard
redundancy-killer between retrieval and the user: greedily pick the
candidate maximizing λ·rel − (1−λ)·max-sim-to-already-picked. The
simplified silhouette validates embedding labels with centroid
distances (O(n·k), vs O(n²) for the exact silhouette). The Murphy
decomposition splits the Brier score into reliability − resolution +
uncertainty — the diagnostic view `calibration_reliability_bins`' ECE
summarizes away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_MMR_Q = 8  # query vectors: vec_id < 8
_MMR_POOL = 12  # relevance-ranked candidate pool per query
_MMR_K = 5  # diversified selections per query
_MMR_LAM = 0.7


def _mmr_oracle() -> str:
    # Greedy MMR unrolled as one chained CTE per selection step: step i
    # scores every remaining candidate by λ·rel − (1−λ)·max sim to the
    # i−1 already-selected, ties broken by relevance rank.
    steps = []
    prev_sel = []  # CTE names holding earlier selections
    for i in range(1, _MMR_K + 1):
        if prev_sel:
            sel_union = " UNION ALL ".join(
                f"SELECT query_id, cand_id FROM {s}" for s in prev_sel
            )
            penalty = f"""
              coalesce((SELECT max(p.sim) FROM pw p
                        JOIN ({sel_union}) s
                          ON p.query_id = c.query_id
                         AND p.a = c.cand_id AND p.b = s.cand_id
                        WHERE s.query_id = c.query_id), 0.0)"""
            not_in = f"""
              AND NOT EXISTS (SELECT 1 FROM ({sel_union}) s
                              WHERE s.query_id = c.query_id
                                AND s.cand_id = c.cand_id)"""
        else:
            penalty = "0.0"
            not_in = ""
        steps.append(f"""
    sel{i} AS (
      SELECT query_id, cand_id, {i} AS select_rank, rel, s AS mmr
      FROM (
        SELECT query_id, cand_id, rel, s,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY s DESC, rnk) AS pick
        FROM (
          SELECT c.query_id, c.cand_id, c.rel, c.rnk,
                 {_MMR_LAM} * c.rel - {1 - _MMR_LAM} * ({penalty}) AS s
          FROM cand c WHERE 1 = 1 {not_in}
        )
      ) WHERE pick = 1
    )""")
        prev_sel.append(f"sel{i}")
    all_sel = " UNION ALL ".join(
        f"SELECT * FROM {s}" for s in prev_sel
    )
    return f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS DOUBLE)) AS v
      FROM embeddings
    ), n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
    ), q AS (SELECT * FROM n WHERE vec_id < {_MMR_Q}),
    cand AS (
      SELECT query_id, cand_id, rel, rnk FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               list_dot_product(q.v, c.v) / (c.nrm * q.nrm) AS rel,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_dot_product(q.v, c.v) / (c.nrm * q.nrm)
                   DESC, c.vec_id) AS rnk
        FROM q JOIN n c ON q.vec_id <> c.vec_id
      ) WHERE rnk <= {_MMR_POOL}
    ), pw AS (
      SELECT ca.query_id, ca.cand_id AS a, cb.cand_id AS b,
             list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) AS sim
      FROM cand ca JOIN cand cb
        ON ca.query_id = cb.query_id AND ca.cand_id <> cb.cand_id
      JOIN n na ON na.vec_id = ca.cand_id
      JOIN n nb ON nb.vec_id = cb.cand_id
    ),{",".join(steps)}
    SELECT query_id, CAST(select_rank AS INTEGER) AS select_rank,
           cand_id, round(rel, 6) AS rel, round(mmr, 6) AS mmr_score
    FROM ({all_sel}) ORDER BY query_id, select_rank
    """


@query("mmr_rerank", oracle=_mmr_oracle())
def mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance re-ranking: each query's top-12
    relevance pool (exact fixed-point cosine) is greedily re-ranked by
    MMR = λ·rel − (1−λ)·max-sim-to-selected (λ=0.7), emitting 5
    diversified picks per query — the Carbonell-Goldstein redundancy
    filter that keeps near-duplicate hits from monopolizing a result
    page (search) or a RAG context window (retrieval for LLMs).

    Determinism: all dot products are exact integers (1e-4 fixed-point
    vectors) so relevance ranks, pairwise sims, and every greedy argmax
    compare identical doubles; ties break on relevance rank. The
    oracle unrolls the same greedy loop as 5 chained CTEs.

    Scale: pool construction is the blocked-GEMM local-top-k shape
    (nothing corpus-sized shuffles); the greedy loop runs per query
    over its own ≤12-candidate group inside Arrow-batched
    applyInPandas, partitioned by query — 10⁶ queries = 10⁶
    independent tiny problems.
    """
    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 10000).cast("long"),
        ).alias("vi"),
    )
    qrows = sorted(
        e.where(F.col("vec_id") < _MMR_Q).collect(), key=lambda r: r.vec_id
    )
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    Q = np.array([r.vi for r in qrows], dtype=np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))

    def pool_blocks(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            M = np.stack(pdf["vi"].to_numpy()).astype(np.float64)
            nn = np.sqrt((M * M).sum(axis=1))
            cos = (M @ Q.T) / (nn[:, None] * qn[None, :])
            rows = []
            for j in range(len(qids)):
                keep = np.flatnonzero(ids != qids[j])
                order = keep[np.lexsort((ids[keep], -cos[keep, j]))][
                    :_MMR_POOL
                ]
                rows += [
                    (int(qids[j]), int(ids[i]), float(cos[i, j]),
                     [int(x) for x in M[i]])
                    for i in order
                ]
            yield pd.DataFrame(
                rows, columns=["query_id", "cand_id", "rel", "vi"]
            )

    pool = e.mapInPandas(
        pool_blocks,
        "query_id long, cand_id long, rel double, vi array<long>",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), "cand_id")
    cand = pool.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= _MMR_POOL
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rnk").reset_index(drop=True)
        V = np.stack(pdf["vi"].to_numpy()).astype(np.float64)
        nn = np.sqrt((V * V).sum(axis=1))
        sim = (V @ V.T) / (nn[:, None] * nn[None, :])
        rel = pdf["rel"].to_numpy(dtype=np.float64)
        n = len(pdf)
        selected: list[int] = []
        out = []
        for step in range(1, min(_MMR_K, n) + 1):
            best, best_s = -1, -np.inf
            for i in range(n):  # rnk order = tiebreak order
                if i in selected:
                    continue
                pen = max((sim[i, j] for j in selected), default=0.0)
                s = _MMR_LAM * rel[i] - (1 - _MMR_LAM) * pen
                if s > best_s:
                    best, best_s = i, s
            selected.append(best)
            out.append(
                (
                    int(pdf["query_id"].iloc[0]),
                    step,
                    int(pdf["cand_id"].iloc[best]),
                    float(rel[best]),
                    float(best_s),
                )
            )
        return pd.DataFrame(
            out,
            columns=["query_id", "select_rank", "cand_id", "rel", "mmr"],
        )

    res = cand.groupBy("query_id").applyInPandas(
        greedy,
        "query_id long, select_rank int, cand_id long, rel double,"
        " mmr double",
    )
    return res.select(
        "query_id",
        "select_rank",
        "cand_id",
        F.round("rel", 6).alias("rel"),
        F.round("mmr", 6).alias("mmr_score"),
    ).orderBy("query_id", "select_rank")


# ---------------------------------------------------------------------------
# Simplified silhouette score for the embedding labels
# ---------------------------------------------------------------------------

@query(
    "silhouette_labels",
    oracle="""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
      FROM embeddings
    ), dims AS (
      SELECT label, d.i AS dim, CAST(sum(v[CAST(d.i AS INTEGER)]) AS BIGINT)
               AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM e, unnest(range(1, len(v) + 1)) AS d(i)
      GROUP BY label, d.i
    ), cents AS (
      SELECT label AS clab, max(n) AS n_members,
             list(s * 1.0 / n ORDER BY dim) AS c
      FROM dims GROUP BY label
    ), dists AS (
      SELECT e.vec_id, e.label, ct.clab,
             sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, len(e.v) + 1),
                 i -> (e.v[CAST(i AS INTEGER)]
                       - ct.c[CAST(i AS INTEGER)])
                      * (e.v[CAST(i AS INTEGER)]
                         - ct.c[CAST(i AS INTEGER)]))),
               (acc, x) -> acc + x)) AS dist
      FROM e CROSS JOIN cents ct
    ), ab AS (
      SELECT vec_id, label,
             max(CASE WHEN clab = label THEN dist END) AS a,
             min(CASE WHEN clab <> label THEN dist END) AS b
      FROM dists GROUP BY vec_id, label
    ), s AS (
      SELECT vec_id, label,
             CAST(round((b - a) / greatest(a, b) * 1000000) AS BIGINT)
               AS s6
      FROM ab
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(s6) // count(*) AS BIGINT) AS mean_sil_ppm,
           CAST(sum(CASE WHEN s6 < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_negative
    FROM s GROUP BY label ORDER BY label
    """,
)
def silhouette_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette of the embedding labels: per point,
    a = distance to its own label centroid, b = nearest other
    centroid, s = (b−a)/max(a,b) — the O(n·k) centroid variant of the
    O(n²) exact silhouette, the standard clustering-validity score
    (negative s = the point sits closer to another cluster). Reported
    per label: mean silhouette (ppm) and the misplaced-point count.

    Determinism: vectors are 1e-4 fixed-point ints so centroid dims
    are identical rationals; each point-centroid distance folds the 64
    dims in fixed index order; per-point s quantizes to int ppm BEFORE
    the group mean so the label aggregate is an exact integer sum (no
    shuffle-order float accumulation).

    Scale: centroids are one map-side-combined groupBy((label, dim))
    — k·d partial sums; the k-row centroid table broadcasts; per-point
    work is k fixed-order folds map-side; the final aggregate carries
    integer partials.
    """
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 10000).cast("long"),
        ).alias("v"),
    )
    dims = (
        e.select("label", F.posexplode("v").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(
            F.sum("val").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    cents = dims.groupBy(F.col("label").alias("clab")).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, s * 1.0 / n))),"
            " x -> x.col2)"
        ).alias("c")
    )
    dists = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "label",
        "clab",
        F.sqrt(
            F.expr(
                """
                aggregate(zip_with(v, c, (x, y) -> (x - y) * (x - y)),
                  CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)
                """
            )
        ).alias("dist"),
    )
    ab = dists.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("clab") == F.col("label"), F.col("dist"))
        ).alias("a"),
        F.min(
            F.when(F.col("clab") != F.col("label"), F.col("dist"))
        ).alias("b"),
    )
    s = ab.select(
        "label",
        F.round(
            (F.col("b") - F.col("a"))
            / F.greatest(F.col("a"), F.col("b"))
            * 1000000
        )
        .cast("bigint")
        .alias("s6"),
    )
    return (
        s.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr("CAST(sum(s6) div count(1) AS BIGINT)").alias(
                "mean_sil_ppm"
            ),
            F.sum((F.col("s6") < 0).cast("bigint"))
            .cast("bigint")
            .alias("n_negative"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Murphy decomposition of the Brier score
# ---------------------------------------------------------------------------

def _brier_oracle() -> str:
    from iceberg_classifier_spark.plans.mlprep import duck_pseudo_prob

    return f"""
    WITH s AS (
      SELECT CAST(label % 2 AS BIGINT) AS y,
             CAST(round({duck_pseudo_prob(0)} * 1000000) AS BIGINT) AS p6
      FROM embeddings
    ), b AS (
      SELECT least(p6 // 100000, 9) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(p6) AS BIGINT) AS sp6,
             CAST(sum(y) AS BIGINT) AS pos
      FROM s GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt,
             CAST(sum(pos) AS BIGINT) AS post,
             (SELECT CAST(sum(p6 * p6) AS BIGINT) FROM s) AS spp,
             (SELECT CAST(sum(p6 * y) AS BIGINT) FROM s) AS spy
      FROM b
    ), terms AS (
      SELECT t.nt, t.post,
             (t.spp - 2000000.0 * t.spy
              + 1000000.0 * 1000000.0 * t.post) / t.nt / 1e12 AS brier,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(n * (sp6 / (n * 1e6) - pos * 1.0 / n)
                      * (sp6 / (n * 1e6) - pos * 1.0 / n)
                    ORDER BY bin)), (a, v) -> a + v) / t.nt AS reliability,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(n * (pos * 1.0 / n - t.post * 1.0 / t.nt)
                      * (pos * 1.0 / n - t.post * 1.0 / t.nt)
                    ORDER BY bin)), (a, v) -> a + v) / t.nt AS resolution
      FROM b CROSS JOIN tot t
      GROUP BY t.nt, t.post, t.spp, t.spy
    )
    SELECT nt AS n,
           round(brier, 6) AS brier,
           round(reliability, 6) AS reliability,
           round(resolution, 6) AS resolution,
           round(post * 1.0 / nt * (1 - post * 1.0 / nt), 6)
             AS uncertainty,
           round(reliability - resolution
                 + post * 1.0 / nt * (1 - post * 1.0 / nt), 6)
             AS brier_binned,
           round(brier - (reliability - resolution
                 + post * 1.0 / nt * (1 - post * 1.0 / nt)), 6)
             AS within_bin_gap
    FROM terms
    """


@query("brier_decomposition", oracle=_brier_oracle())
def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score for the engine's pseudo-
    probability scores against the parity label: BS = reliability −
    resolution + uncertainty over 10 equal-width bins, plus the exact
    unbinned Brier (from integer Σp², Σpy, Σy) and the within-bin gap
    the binned identity leaves behind — the diagnostic that separates
    "probabilities are mis-calibrated" (reliability) from "the model
    can't discriminate" (low resolution), which a single ECE number
    (`calibration_reliability_bins`) conflates.

    Determinism: scores are ppm integers (the mlprep pseudo-prob
    construction), so every sufficient statistic is an exact int64;
    the two 10-term bin folds run in bin order.

    Scale: one map-side-combined bin groupBy + one moment pass;
    everything else is ≤10-row arithmetic.
    """
    from iceberg_classifier_spark.plans.mlprep import pseudo_prob

    s = load(spark, sf_dir, "embeddings").select(
        (F.col("label") % 2).cast("bigint").alias("y"),
        F.round(pseudo_prob(0) * 1000000).cast("bigint").alias("p6"),
    )
    b = s.groupBy(
        F.least(F.expr("p6 div 100000"), F.lit(9)).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("p6").cast("bigint").alias("sp6"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    moments = s.agg(
        F.sum(F.col("p6") * F.col("p6")).cast("bigint").alias("spp"),
        F.sum(F.col("p6") * F.col("y")).cast("bigint").alias("spy"),
    )
    terms = b.crossJoin(F.broadcast(moments)).agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("pos").cast("bigint").alias("post"),
        F.max("spp").alias("spp"),
        F.max("spy").alias("spy"),
        F.expr(
            """
            aggregate(transform(array_sort(collect_list(struct(bin,
                n * (sp6 / (n * 1e6) - pos * 1.0 / n)
                  * (sp6 / (n * 1e6) - pos * 1.0 / n)))), s -> s.col2),
              CAST(0.0 AS DOUBLE), (a, v) -> a + v)
            """
        ).alias("rel_num"),
    )
    # resolution needs the global base rate inside the fold — second pass
    res = (
        b.crossJoin(
            F.broadcast(
                b.agg(
                    F.sum("n").alias("nt2"), F.sum("pos").alias("post2")
                )
            )
        )
        .agg(
            F.expr(
                """
                aggregate(transform(array_sort(collect_list(struct(bin,
                    n * (pos * 1.0 / n - post2 * 1.0 / nt2)
                      * (pos * 1.0 / n - post2 * 1.0 / nt2)))),
                  s -> s.col2), CAST(0.0 AS DOUBLE), (a, v) -> a + v)
                """
            ).alias("res_num")
        )
    )
    out = terms.crossJoin(res)
    base = F.col("post") * 1.0 / F.col("nt")
    brier = (
        F.col("spp")
        - 2000000.0 * F.col("spy")
        + 1000000.0 * 1000000.0 * F.col("post")
    ) / F.col("nt") / 1e12
    reliability = F.col("rel_num") / F.col("nt")
    resolution = F.col("res_num") / F.col("nt")
    unc = base * (1 - base)
    return out.select(
        F.col("nt").alias("n"),
        F.round(brier, 6).alias("brier"),
        F.round(reliability, 6).alias("reliability"),
        F.round(resolution, 6).alias("resolution"),
        F.round(unc, 6).alias("uncertainty"),
        F.round(reliability - resolution + unc, 6).alias("brier_binned"),
        F.round(brier - (reliability - resolution + unc), 6).alias(
            "within_bin_gap"
        ),
    )
