"""Eval wave 5: Bradley-Terry strength estimation and train/test
embedding-leakage scanning.

Bradley-Terry is the pairwise-comparison model behind chess ratings,
LLM arena leaderboards, and reward-model training — fitted here with
the classic minorization-maximization iteration, which is exact
closed-form per step. The leakage scan is the embedding-space
contamination check (near-identical train/test items) that n-gram
decontamination (`decontaminate_8gram`) misses when the duplicate is
paraphrased.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_BT_ITERS = 20


@query(
    "bradley_terry_strengths",
    oracle=f"""
    WITH byarm AS (
      SELECT CAST(ts AS DATE) AS day,
             CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
               WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END
               AS arm,
             CAST(CAST(sum(round(value * 100)) AS BIGINT) * 10000
                  // count(*) AS BIGINT) AS r6
      FROM events GROUP BY 1, 2
    ), duels AS (
      SELECT a.arm AS i, b.arm AS j,
             CAST(sum(CASE WHEN a.r6 > b.r6
                            OR (a.r6 = b.r6 AND a.arm < b.arm)
                      THEN 1 ELSE 0 END) AS BIGINT) AS w,
             CAST(count(*) AS BIGINT) AS n
      FROM byarm a JOIN byarm b
        ON a.day = b.day AND a.arm <> b.arm
      GROUP BY 1, 2
    ), packed AS (
      SELECT list(struct_pack(k := i * 5 + j, w := w, n := n)) AS ents
      FROM duels
    ), mats AS (
      SELECT list_transform(range(0, 25), k ->
               coalesce(list_filter(ents, e -> e.k = k)[1].w, 0)) AS wm,
             list_transform(range(0, 25), k ->
               coalesce(list_filter(ents, e -> e.k = k)[1].n, 0)) AS nm
      FROM packed
    ), fit AS (
      SELECT wm, nm,
        list_reduce(list_prepend(CAST([0.2, 0.2, 0.2, 0.2, 0.2]
            AS DOUBLE[]),
          list_transform(range(1, {_BT_ITERS + 1}),
            i -> CAST([] AS DOUBLE[]))),
          (a, v) -> list_transform(range(0, 5), i2 ->
            (list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(0, 5), j2 ->
                 CAST(wm[CAST(i2 * 5 + j2 + 1 AS INTEGER)] AS DOUBLE))),
               (s2, t2) -> s2 + t2)
             / list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(range(0, 5), j2 ->
                   CASE WHEN j2 = i2 THEN 0.0
                   ELSE nm[CAST(i2 * 5 + j2 + 1 AS INTEGER)]
                        / (a[CAST(i2 + 1 AS INTEGER)]
                           + a[CAST(j2 + 1 AS INTEGER)]) END)),
                 (s2, t2) -> s2 + t2))
            / list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(range(0, 5), i3 ->
                  list_reduce(list_prepend(CAST(0 AS DOUBLE),
                    list_transform(range(0, 5), j3 ->
                      CAST(wm[CAST(i3 * 5 + j3 + 1 AS INTEGER)]
                        AS DOUBLE))), (s3, t3) -> s3 + t3)
                  / list_reduce(list_prepend(CAST(0 AS DOUBLE),
                      list_transform(range(0, 5), j3 ->
                        CASE WHEN j3 = i3 THEN 0.0
                        ELSE nm[CAST(i3 * 5 + j3 + 1 AS INTEGER)]
                             / (a[CAST(i3 + 1 AS INTEGER)]
                                + a[CAST(j3 + 1 AS INTEGER)]) END)),
                      (s3, t3) -> s3 + t3))),
                (s4, t4) -> s4 + t4)))
          AS pi
      FROM mats
    )
    SELECT g.st AS arm,
           CASE g.st WHEN 0 THEN 'click' WHEN 1 THEN 'error'
             WHEN 2 THEN 'purchase' WHEN 3 THEN 'signup' ELSE 'view'
             END AS arm_name,
           CAST(list_sum(list_transform(range(0, 5), j ->
             wm[CAST(g.st * 5 + j + 1 AS INTEGER)])) AS BIGINT) AS wins,
           CAST(list_sum(list_transform(range(0, 5), j ->
             nm[CAST(g.st * 5 + j + 1 AS INTEGER)])) AS BIGINT)
             AS games,
           round(pi[CAST(g.st + 1 AS INTEGER)], 6) AS strength
    FROM fit, (SELECT unnest(range(0, 5)) AS st) g
    ORDER BY arm
    """,
)
def bradley_terry_strengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths for the five event types from daily
    pairwise duels (higher mean daily value wins, lower index on
    exact ties): 20 minorization-maximization iterations
    π_i ← W_i / Σ_{{j≠i}} n_ij/(π_i+π_j), normalized each step — the
    pairwise-preference model behind Elo-style leaderboards and
    reward-model fitting, here as exact engine arithmetic (MM is
    closed-form per step, unlike gradient fits). Reports wins, games,
    and the fitted strength per arm.

    Determinism: duel outcomes are exact integer comparisons of exact
    µ-dollar daily means; W/n pack into fixed-index flat arrays; the
    MM fold runs identical nested double arithmetic on both engines
    (normalization inside the fold keeps the scale pinned).

    Scale: duels aggregate from the bounded (day × arm) frame (the
    self-join is day-keyed); the fit is k² constant-size per
    iteration. Arena-scale item counts swap the dense matrix for the
    sparse (i, j) edge list with the same MM update.
    """
    e = load(spark, sf_dir, "events")
    arm_idx = (
        F.when(F.col("event_type") == "click", 0)
        .when(F.col("event_type") == "error", 1)
        .when(F.col("event_type") == "purchase", 2)
        .when(F.col("event_type") == "signup", 3)
        .otherwise(4)
    )
    byarm = e.groupBy(
        F.col("ts").cast("date").alias("day"), arm_idx.alias("arm")
    ).agg(
        F.expr(
            "CAST(CAST(sum(round(value * 100)) AS BIGINT) * 10000"
            " div count(1) AS BIGINT)"
        ).alias("r6")
    )
    a = byarm.alias("a")
    b = byarm.alias("b")
    duels = (
        a.join(
            b,
            (F.col("a.day") == F.col("b.day"))
            & (F.col("a.arm") != F.col("b.arm")),
        )
        .groupBy(F.col("a.arm").alias("i"), F.col("b.arm").alias("j"))
        .agg(
            F.sum(
                F.when(
                    (F.col("a.r6") > F.col("b.r6"))
                    | (
                        (F.col("a.r6") == F.col("b.r6"))
                        & (F.col("a.arm") < F.col("b.arm"))
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("w"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    packed = duels.agg(
        F.expr("collect_list(struct(i * 5 + j AS k, w, n))").alias("ents")
    )
    mats = packed.select(
        F.expr(
            """
            transform(sequence(0, 24),
              k -> coalesce(get(filter(ents, e -> e.k = k), 0).w, 0L))
            """
        ).alias("wm"),
        F.expr(
            """
            transform(sequence(0, 24),
              k -> coalesce(get(filter(ents, e -> e.k = k), 0).n, 0L))
            """
        ).alias("nm"),
    )
    raw_i = (
        "(aggregate(sequence(0, 4), CAST(0.0 AS DOUBLE),"
        " (s2, j2) -> s2 + CAST(wm[{i} * 5 + j2] AS DOUBLE))"
        " / aggregate(sequence(0, 4), CAST(0.0 AS DOUBLE),"
        " (s2, j2) -> s2 + IF(j2 = {i}, 0.0,"
        " nm[{i} * 5 + j2] / (a[{i}] + a[j2]))))"
    )
    fit = mats.select(
        "wm",
        "nm",
        F.expr(
            f"""
            aggregate(sequence(1, {_BT_ITERS}),
              CAST(array(0.2, 0.2, 0.2, 0.2, 0.2) AS ARRAY<DOUBLE>),
              (a, it) -> transform(sequence(0, 4), i2 ->
                {raw_i.format(i="i2")}
                / aggregate(sequence(0, 4), CAST(0.0 AS DOUBLE),
                    (s4, i3) -> s4 + {raw_i.format(i="i3")})))
            """
        ).alias("pi"),
    )
    arms = spark.range(0, 5).select(F.col("id").cast("int").alias("st"))
    name = (
        F.when(F.col("st") == 0, "click")
        .when(F.col("st") == 1, "error")
        .when(F.col("st") == 2, "purchase")
        .when(F.col("st") == 3, "signup")
        .otherwise("view")
    )
    return (
        fit.crossJoin(F.broadcast(arms))
        .select(
            F.col("st").cast("bigint").alias("arm"),
            name.alias("arm_name"),
            F.expr(
                """
                CAST(aggregate(sequence(0, 4), CAST(0 AS BIGINT),
                  (s, j) -> s + wm[st * 5 + j]) AS BIGINT)
                """
            ).alias("wins"),
            F.expr(
                """
                CAST(aggregate(sequence(0, 4), CAST(0 AS BIGINT),
                  (s, j) -> s + nm[st * 5 + j]) AS BIGINT)
                """
            ).alias("games"),
            F.round(F.expr("pi[st]"), 6).alias("strength"),
        )
        .orderBy("arm")
    )


_LEAK_MOD = 10  # test split: vec_id % 10 == 0
_LEAK_THRESH = [(800000, "n_above_80"), (900000, "n_above_90")]
_LEAK_BANDS = 8  # LSH candidate gate: 8 bands ...
_LEAK_PLANES = 13  # ... of 13 sign planes each (8192 buckets/band)
_LEAK_AUDIT_EVERY = 100  # exact-recall audit on every 100th test id
_LEAK_LEAK_PPM = 800000  # "leak" = best cosine >= 0.8


def _leak_plane(p: int) -> list[float]:
    """±1 hyperplane weights for gate plane ``p``: one Knuth-MMIX LCG
    stream per plane (top bit of each state — well mixed), seeded by the
    plane index. The signs are embedded as LITERALS in both the numpy
    kernel and the oracle SQL, so the engines cannot diverge on plane
    generation. Since r10 the generator lives in functions/planes.py and
    is shared by ann_lsh_topk / ndcg_ann_eval / dedup_embedding_cosine —
    the three ops whose original affine-of-(p*64+j) formula was
    degenerate (every plane identical; see planes.py docstring)."""
    from iceberg_classifier_spark.functions.planes import mmix_plane_signs

    return mmix_plane_signs(p)


def _leak_band_sql(b: int) -> str:
    """Band-``b`` bucket value: 13 sign bits packed little-endian."""
    return " + ".join(
        f"{1 << k} * (CASE WHEN list_dot_product(v, CAST("
        f"{_leak_plane(b * _LEAK_PLANES + k)} AS DOUBLE[])) > 0"
        " THEN 1 ELSE 0 END)"
        for k in range(_LEAK_PLANES)
    )


@query(
    "embedding_leakage_scan",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS DOUBLE)) AS v
      FROM embeddings
    ), n AS (
      SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm,
             [{", ".join(_leak_band_sql(b) for b in range(_LEAK_BANDS))}]
               AS bv
      FROM e
    ), test AS (SELECT * FROM n WHERE vec_id % {_LEAK_MOD} = 0),
    train AS (SELECT * FROM n WHERE vec_id % {_LEAK_MOD} <> 0),
    tb AS (
      SELECT vec_id, g.b AS band, bv[g.b + 1] AS val
      FROM test, (SELECT unnest(range(0, {_LEAK_BANDS})) AS b) g
    ), cb AS (
      SELECT vec_id, g.b AS band, bv[g.b + 1] AS val
      FROM train, (SELECT unnest(range(0, {_LEAK_BANDS})) AS b) g
    ), cand AS (
      SELECT DISTINCT tb.vec_id AS tid, cb.vec_id AS cid
      FROM tb JOIN cb ON tb.band = cb.band AND tb.val = cb.val
    ), gated AS (
      SELECT cand.tid AS vec_id,
             max(CAST(round(list_dot_product(t.v, c.v)
                 / (c.nrm * t.nrm) * 1000000) AS BIGINT)) AS best6
      FROM cand JOIN test t ON t.vec_id = cand.tid
                JOIN train c ON c.vec_id = cand.cid
      GROUP BY 1
    ), audit AS (
      SELECT t.vec_id,
             max(CAST(round(list_dot_product(t.v, c.v)
                 / (c.nrm * t.nrm) * 1000000) AS BIGINT)) AS exact6
      FROM test t JOIN train c ON 1 = 1
      WHERE t.vec_id % {_LEAK_MOD * _LEAK_AUDIT_EVERY} = 0
      GROUP BY 1
    ), joined AS (
      SELECT t.vec_id, t.label, g.best6, a.exact6
      FROM test t
      LEFT JOIN gated g ON g.vec_id = t.vec_id
      LEFT JOIN audit a ON a.vec_id = t.vec_id
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(count(best6) AS BIGINT) AS n_gated,
           CASE WHEN count(best6) = 0 THEN CAST(-1 AS BIGINT)
                ELSE CAST(sum(best6) // count(best6) AS BIGINT)
           END AS mean_best_ppm,
           CAST(coalesce(max(best6), -1) AS BIGINT) AS max_best_ppm,
           {", ".join(
               f"CAST(sum(CASE WHEN best6 >= {t} THEN 1 ELSE 0 END)"
               f" AS BIGINT) AS {c}" for t, c in _LEAK_THRESH)},
           CAST(count(exact6) AS BIGINT) AS n_audit,
           CAST(sum(CASE WHEN exact6 >= {_LEAK_LEAK_PPM} THEN 1 ELSE 0
                    END) AS BIGINT) AS n_leak_exact,
           CAST(sum(CASE WHEN exact6 >= {_LEAK_LEAK_PPM}
                          AND best6 >= {_LEAK_LEAK_PPM} THEN 1 ELSE 0
                    END) AS BIGINT) AS n_leak_caught,
           CASE WHEN sum(CASE WHEN exact6 >= {_LEAK_LEAK_PPM} THEN 1
                              ELSE 0 END) = 0 THEN CAST(1000000 AS BIGINT)
                ELSE CAST(sum(CASE WHEN exact6 >= {_LEAK_LEAK_PPM}
                                    AND best6 >= {_LEAK_LEAK_PPM}
                                   THEN 1 ELSE 0 END) * 1000000
                          // sum(CASE WHEN exact6 >= {_LEAK_LEAK_PPM}
                                      THEN 1 ELSE 0 END) AS BIGINT)
           END AS recall_ppm
    FROM joined GROUP BY label ORDER BY label
    """,
)
def embedding_leakage_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination scan in embedding space: for every
    held-out vector (vec_id % 10 = 0) find its best TRAIN match by
    fixed-point cosine INSIDE a hyperplane-LSH candidate gate
    ({_LEAK_BANDS} bands × {_LEAK_PLANES} sign planes — two vectors are
    candidates iff some band's 13-bit signature collides), and report,
    per label, the gated coverage (n_gated of n_test), the mean/max
    best-match similarity (ppm), the 0.8/0.9 leak-threshold counts,
    AND a built-in recall audit: every {_LEAK_AUDIT_EVERY}th test id is
    also scanned EXACTLY against the full train side, and the output
    carries n_leak_exact / n_leak_caught / recall_ppm — the measured
    probability that a true >=0.8 leak survives the gate (`
    ann_ivf_recall`'s pattern). r9 (round-8 verdict task 6): the r8
    plan was the exact test×train GEMM — best possible exact plan but
    quadratic pair work (16.1× same-frame for 10× data); near-dup
    leaks sit at cos ≈ 0.999 where a 13-bit band collides with
    p ≈ 0.83 per band (≈ 1 − 2e-7 over 8), while random pairs collide
    at ~8/8192 — ~500× less pair work at the same detection power,
    with the audit PROVING the recall on every run.

    Determinism: plane signs are ±1 LITERALS generated by one Python
    function and embedded in both the numpy kernel and the oracle SQL;
    band dots are sums of ±(fixed-point int) — exact in int64 and
    float64 alike — so both engines build bit-identical candidate
    sets; cosine ppms quantize identically as before.

    Scale: signatures are a per-row 64×104 GEMM in the Arrow kernel;
    the gate runs INSIDE the same single mapInPandas pass that streams
    the train corpus — per batch, band values match against the
    broadcast test signature index (sorted arrays + searchsorted, no
    Spark-side join), and only colliding pairs get a dot product. Each
    partition emits one running best per touched test id plus exact
    partials for the audit sample; a final (vec_id → max) merge and
    the label rollup are the only shuffles. The broadcast test block
    is 1/{_LEAK_MOD} of the corpus — bounded for an audit split; a
    full-corpus scan shards the test side and unions, or swaps in
    `ann_ivf_topk`'s bucketed path.
    """
    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 10000).cast("long"),
        ).alias("vi"),
    )
    test_rows = sorted(
        e.where(F.col("vec_id") % _LEAK_MOD == 0).collect(),
        key=lambda r: r.vec_id,
    )
    tids = np.array([r.vec_id for r in test_rows], dtype=np.int64)
    T = np.array([r.vi for r in test_rows], dtype=np.float64)
    tn = np.sqrt((T * T).sum(axis=1))
    n_t = len(tids)
    # gate: ±1 plane matrix (104×64) → per-band packed 13-bit values,
    # pre-sorted per band so the kernel matches via searchsorted
    W = np.array(
        [_leak_plane(p) for p in range(_LEAK_BANDS * _LEAK_PLANES)],
        dtype=np.float64,
    )
    pows = 1 << np.arange(_LEAK_PLANES, dtype=np.int64)

    def _band_vals(X: "np.ndarray") -> "np.ndarray":
        bits = ((X @ W.T) > 0).astype(np.int64)  # (n, bands*planes)
        return bits.reshape(len(X), _LEAK_BANDS, _LEAK_PLANES) @ pows

    tvals = _band_vals(T)
    t_order = [
        np.argsort(tvals[:, b], kind="stable") for b in range(_LEAK_BANDS)
    ]
    t_sorted = [tvals[t_order[b], b] for b in range(_LEAK_BANDS)]
    # exact-recall audit sample: every _LEAK_AUDIT_EVERY'th test id
    smp = tids % (_LEAK_MOD * _LEAK_AUDIT_EVERY) == 0
    Ts, tns, sids = T[smp], tn[smp], tids[smp]
    SENT = -2000000  # sentinel below any cosine ppm; -> NULL downstream
    train = e.where(F.col("vec_id") % _LEAK_MOD != 0)

    def best_blocks(batches):
        for pdf in batches:
            if not len(pdf) or not n_t:
                continue
            M = np.stack(pdf["vi"].to_numpy()).astype(np.float64)
            nn = np.sqrt((M * M).sum(axis=1))
            mvals = _band_vals(M)
            # band-collision pairs: (train row, test row) via the
            # sorted test index — vectorized multi-range gather
            tr_parts, te_parts = [], []
            for b in range(_LEAK_BANDS):
                lo = np.searchsorted(t_sorted[b], mvals[:, b], "left")
                hi = np.searchsorted(t_sorted[b], mvals[:, b], "right")
                cnt = hi - lo
                tot = int(cnt.sum())
                if not tot:
                    continue
                starts = np.cumsum(cnt) - cnt
                pos = (
                    np.arange(tot)
                    - np.repeat(starts, cnt)
                    + np.repeat(lo, cnt)
                )
                tr_parts.append(
                    np.repeat(np.arange(len(M), dtype=np.int64), cnt)
                )
                te_parts.append(t_order[b][pos])
            out_parts = []
            if tr_parts:
                tr = np.concatenate(tr_parts)
                te = np.concatenate(te_parts)
                pair = np.unique(tr * n_t + te)
                tr, te = pair // n_t, pair % n_t
                dots = np.einsum("ij,ij->i", M[tr], T[te])
                # exact HALF-AWAY ties to match DuckDB round()
                # (functions/quantize.py; the trunc(y±0.5) form had a
                # 1-ulp false-up class, r9 advice)
                from iceberg_classifier_spark.functions.quantize import (
                    half_away,
                )

                y = dots / (nn[tr] * tn[te]) * 1000000
                ppm = half_away(y).astype(np.int64)
                best = np.full(n_t, SENT, dtype=np.int64)
                np.maximum.at(best, te, ppm)
                hit = np.unique(te)
                out_parts.append(
                    pd.DataFrame(
                        {
                            "vec_id": tids[hit],
                            "best6": best[hit],
                            "exact6": np.full(len(hit), SENT, np.int64),
                        }
                    )
                )
            if len(sids):
                from iceberg_classifier_spark.functions.quantize import (
                    half_away,
                )

                cos = (M @ Ts.T) / (nn[:, None] * tns[None, :])
                ex = half_away(cos.max(axis=0) * 1000000).astype(np.int64)
                out_parts.append(
                    pd.DataFrame(
                        {
                            "vec_id": sids,
                            "best6": np.full(len(sids), SENT, np.int64),
                            "exact6": ex,
                        }
                    )
                )
            if out_parts:
                yield pd.concat(out_parts, ignore_index=True)

    nearest = (
        train.mapInPandas(
            best_blocks, "vec_id long, best6 long, exact6 long"
        )
        .groupBy("vec_id")
        .agg(F.max("best6").alias("b6"), F.max("exact6").alias("e6"))
    )
    joined = (
        e.where(F.col("vec_id") % _LEAK_MOD == 0)
        .select("vec_id", "label")
        .join(nearest, "vec_id", "left")
        .select(
            "label",
            F.when(F.col("b6") > SENT, F.col("b6")).alias("best6"),
            F.when(F.col("e6") > SENT, F.col("e6")).alias("exact6"),
        )
    )
    leak = F.col("exact6") >= _LEAK_LEAK_PPM
    caught = leak & (F.col("best6") >= _LEAK_LEAK_PPM)
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.count("best6").cast("bigint").alias("n_gated"),
        # FLOOR division to match the oracle's DuckDB `//` exactly: Spark's
        # `div` truncates toward zero, which diverges whenever sum(best6)
        # is negative — possible, since band-colliding pairs can still have
        # negative cosine (r9 advice).
        F.when(F.count("best6") == 0, F.lit(-1))
        .otherwise(
            F.expr(
                "sum(best6) div count(best6) - (CASE WHEN sum(best6) < 0"
                " AND sum(best6) % count(best6) != 0 THEN 1 ELSE 0 END)"
            )
        )
        .cast("bigint")
        .alias("mean_best_ppm"),
        F.coalesce(F.max("best6"), F.lit(-1))
        .cast("bigint")
        .alias("max_best_ppm"),
    ]
    for t, c in _LEAK_THRESH:
        aggs.append(
            F.sum(F.when(F.col("best6") >= t, 1).otherwise(0))
            .cast("bigint")
            .alias(c)
        )
    aggs += [
        F.count("exact6").cast("bigint").alias("n_audit"),
        F.sum(F.when(leak, 1).otherwise(0)).cast("bigint").alias(
            "n_leak_exact"
        ),
        F.sum(F.when(caught, 1).otherwise(0)).cast("bigint").alias(
            "n_leak_caught"
        ),
        F.when(
            F.sum(F.when(leak, 1).otherwise(0)) == 0, F.lit(1000000)
        )
        .otherwise(
            F.expr(
                f"sum(CASE WHEN exact6 >= {_LEAK_LEAK_PPM} AND"
                f" best6 >= {_LEAK_LEAK_PPM} THEN 1 ELSE 0 END)"
                " * 1000000 div"
                f" sum(CASE WHEN exact6 >= {_LEAK_LEAK_PPM}"
                " THEN 1 ELSE 0 END)"
            )
        )
        .cast("bigint")
        .alias("recall_ppm"),
    ]
    return joined.groupBy("label").agg(*aggs).orderBy("label")
