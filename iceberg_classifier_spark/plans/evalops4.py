"""Eval wave 4: paired-classifier comparison (McNemar), inter-rater
agreement (Cohen's κ), 1-D Kalman filtering, and Heaps-law vocabulary
growth.

McNemar is THE test for "is model B actually better than model A on
the same examples" (comparing accuracies with an unpaired test wastes
the pairing and is the classic eval mistake); Cohen's κ corrects raw
agreement for chance. The Kalman filter is the optimal linear state
estimator every telemetry smoother approximates. Heaps' law V ∝ N^β
is the vocabulary-growth curve corpus planners extrapolate before
committing to a tokenizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.mlprep import duck_pseudo_prob, pseudo_prob
from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_PREDS_SQL = f"""
      SELECT CAST(label % 2 AS BIGINT) AS y,
             CASE WHEN {duck_pseudo_prob(0)} >= 0.5 THEN 1 ELSE 0 END AS pa,
             CASE WHEN {duck_pseudo_prob(1)} >= 0.5 THEN 1 ELSE 0 END AS pb
      FROM embeddings
"""


def _preds(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "embeddings").select(
        (F.col("label") % 2).cast("bigint").alias("y"),
        (pseudo_prob(0) >= 0.5).cast("bigint").alias("pa"),
        (pseudo_prob(1) >= 0.5).cast("bigint").alias("pb"),
    )


@query(
    "mcnemar_paired_test",
    oracle=f"""
    WITH preds AS ({_PREDS_SQL})
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
             AS BIGINT) AS b_a_only,
           CAST(sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END)
             AS BIGINT) AS c_b_only,
           CAST(sum(CASE WHEN pa = y THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS acc_a_ppm,
           CAST(sum(CASE WHEN pb = y THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS acc_b_ppm,
           round((abs(sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
                      - sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END))
                  - 1.0)
                 * (abs(sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
                        - sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0
                              END)) - 1.0)
                 / (sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
                    + sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END)),
                 6) AS mcnemar_chi2,
           CASE WHEN (abs(sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0
                              END)
                      - sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0
                            END)) - 1.0)
                     * (abs(sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0
                                END)
                        - sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0
                              END)) - 1.0)
                     / (sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
                        + sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0
                              END)) > 3.841459
                THEN 1 ELSE 0 END AS reject_05
    FROM preds
    """,
)
def mcnemar_paired_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test comparing two classifiers on the SAME examples
    (the engine's two pseudo-prob models thresholded at 0.5): only the
    discordant pairs matter — b = A-right/B-wrong, c = A-wrong/B-right,
    continuity-corrected χ²₁ = (|b−c|−1)²/(b+c) — the paired test that
    replaces the statistically-wrong "compare two accuracy numbers with
    a two-sample test" (pairing removes the shared-example variance).

    Determinism: every statistic is exact integer counts; the χ² is
    one closed-form double, rounded at the edge.

    Scale: a single map-side-combined aggregate over the scored table
    — counts only, no per-example state.
    """
    p = _preds(spark, sf_dir)
    b = F.sum(
        F.when((F.col("pa") == F.col("y")) & (F.col("pb") != F.col("y")), 1)
        .otherwise(0)
    )
    c = F.sum(
        F.when((F.col("pa") != F.col("y")) & (F.col("pb") == F.col("y")), 1)
        .otherwise(0)
    )
    chi2 = (
        (F.abs(b - c) - 1.0) * (F.abs(b - c) - 1.0) / (b + c)
    )
    return p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        b.cast("bigint").alias("b_a_only"),
        c.cast("bigint").alias("c_b_only"),
        F.expr(
            "CAST(sum(CASE WHEN pa = y THEN 1 ELSE 0 END) * 1000000"
            " div count(1) AS BIGINT)"
        ).alias("acc_a_ppm"),
        F.expr(
            "CAST(sum(CASE WHEN pb = y THEN 1 ELSE 0 END) * 1000000"
            " div count(1) AS BIGINT)"
        ).alias("acc_b_ppm"),
        F.round(chi2, 6).alias("mcnemar_chi2"),
        F.when(chi2 > 3.841459, 1).otherwise(0).alias("reject_05"),
    )


@query(
    "cohen_kappa_agreement",
    oracle=f"""
    WITH preds AS ({_PREDS_SQL}),
    counts AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN pa = pb THEN 1 ELSE 0 END) AS BIGINT)
               AS agree,
             CAST(sum(pa) AS BIGINT) AS a1,
             CAST(sum(pb) AS BIGINT) AS b1
      FROM preds
    )
    SELECT n, agree, a1 AS a_positive, b1 AS b_positive,
           round(agree * 1.0 / n, 6) AS po,
           round((a1 * 1.0 * b1 + (n - a1) * 1.0 * (n - b1)) / (n * 1.0 * n),
                 6) AS pe,
           round((agree * 1.0 / n
                  - (a1 * 1.0 * b1 + (n - a1) * 1.0 * (n - b1))
                    / (n * 1.0 * n))
                 / (1.0 - (a1 * 1.0 * b1 + (n - a1) * 1.0 * (n - b1))
                    / (n * 1.0 * n)), 6) AS kappa
    FROM counts
    """,
)
def cohen_kappa_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ between the two pseudo-prob classifiers: observed
    agreement p_o corrected for the chance agreement p_e their marginal
    positive rates imply — κ = (p_o − p_e)/(1 − p_e), the standard
    inter-rater/inter-model agreement scale (κ≈0 = no better than
    chance even when raw agreement looks high; the base-rate trap raw
    percent-agreement falls into).

    Determinism: four exact integer counts; κ is one closed-form
    double expression.

    Scale: a single map-side-combined aggregate — marginals only.
    """
    p = _preds(spark, sf_dir)
    counts = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("pa") == F.col("pb"), 1).otherwise(0))
        .cast("bigint")
        .alias("agree"),
        F.sum("pa").cast("bigint").alias("a1"),
        F.sum("pb").cast("bigint").alias("b1"),
    )
    po = F.col("agree") * 1.0 / F.col("n")
    pe = (
        F.col("a1") * 1.0 * F.col("b1")
        + (F.col("n") - F.col("a1")) * 1.0 * (F.col("n") - F.col("b1"))
    ) / (F.col("n") * 1.0 * F.col("n"))
    return counts.select(
        "n",
        "agree",
        F.col("a1").alias("a_positive"),
        F.col("b1").alias("b_positive"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (1.0 - pe), 6).alias("kappa"),
    )


_KAL_Q = 25.0  # process noise (counts²/day)
_KAL_R = 400.0  # observation noise


@query(
    "kalman_filter_1d",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ), seq AS (
      SELECT list(struct_pack(day := day, x := x) ORDER BY day) AS days
      FROM daily
    ), folded AS (
      SELECT days,
        list_reduce(
          list_prepend(CAST([] AS DOUBLE[]),
            list_transform(days, s -> [CAST(s.x AS DOUBLE)])),
          (a, v) -> CASE WHEN len(a) = 0
            THEN [v[1], {_KAL_R}, v[1], {_KAL_R}]
            ELSE list_concat(
              [a[1] + (a[2] + {_KAL_Q}) / (a[2] + {_KAL_Q} + {_KAL_R})
                      * (v[1] - a[1]),
               (1 - (a[2] + {_KAL_Q}) / (a[2] + {_KAL_Q} + {_KAL_R}))
               * (a[2] + {_KAL_Q})],
              list_concat(list_slice(a, 3, len(a)),
                [a[1] + (a[2] + {_KAL_Q}) / (a[2] + {_KAL_Q} + {_KAL_R})
                        * (v[1] - a[1]),
                 (1 - (a[2] + {_KAL_Q}) / (a[2] + {_KAL_Q} + {_KAL_R}))
                 * (a[2] + {_KAL_Q})]))
          END) AS st
      FROM seq
    )
    SELECT u.s.day AS day, u.s.x AS daily_count,
           round(u.s.est, 4) AS kalman_est,
           round(u.s.p, 4) AS kalman_var
    FROM folded, unnest(list_transform(range(1, len(days) + 1),
      i -> struct_pack(day := days[CAST(i AS INTEGER)].day,
                       x := days[CAST(i AS INTEGER)].x,
                       est := st[CAST(2 * i + 1 AS INTEGER)],
                       p := st[CAST(2 * i + 2 AS INTEGER)]))) AS u(s)
    ORDER BY day
    """,
)
def kalman_filter_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Kalman filter (local-level model) over the daily event-count
    series: predict p←p+q, gain k = p/(p+r), update x←x+k(z−x),
    p←(1−k)p with q=25, r=400 — the optimal linear smoother whose
    steady-state is the EWMA every monitoring stack uses, but with a
    principled, self-adjusting gain and a per-day variance. Emits the
    filtered level and variance per day. State is one flat DOUBLE[]
    ([x, p] head + trace tail) — same DuckDB struct-accumulator
    workaround as `viterbi_regime_decode`.

    Determinism: the fold runs in day order with identical double
    expressions; the trace indexes are exact.

    Scale: the fact table collapses to per-day counts map-side; the
    filter folds once over the bounded day dimension (independent
    fold per metric/series for fleets).
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    seq = daily.agg(
        F.expr("array_sort(collect_list(struct(day, x)))").alias("days")
    )
    q, r = _KAL_Q, _KAL_R
    folded = seq.select(
        "days",
        F.expr(
            f"""
            aggregate(transform(days, s -> CAST(s.x AS DOUBLE)),
              CAST(array() AS ARRAY<DOUBLE>),
              (a, v) -> CASE WHEN size(a) = 0
                THEN array(v, CAST({r} AS DOUBLE), v, CAST({r} AS DOUBLE))
                ELSE concat(
                  array(
                    a[0] + (a[1] + {q}) / (a[1] + {q} + {r}) * (v - a[0]),
                    (1 - (a[1] + {q}) / (a[1] + {q} + {r})) * (a[1] + {q})),
                  slice(a, 3, size(a) - 2),
                  array(
                    a[0] + (a[1] + {q}) / (a[1] + {q} + {r}) * (v - a[0]),
                    (1 - (a[1] + {q}) / (a[1] + {q} + {r})) * (a[1] + {q})))
              END)
            """
        ).alias("st"),
    )
    rows = folded.select(
        F.posexplode(F.col("days")).alias("i", "s"),
        F.col("st"),
    )
    return rows.select(
        F.col("s.day").alias("day"),
        F.col("s.x").alias("daily_count"),
        F.round(
            F.expr("element_at(st, CAST(2 * i + 3 AS INT))"), 4
        ).alias("kalman_est"),
        F.round(
            F.expr("element_at(st, CAST(2 * i + 4 AS INT))"), 4
        ).alias("kalman_var"),
    ).orderBy("day")


@query(
    "heaps_law_fit",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok
      FROM tok GROUP BY doc_id
    ), firsts AS (
      SELECT w, CAST(min(doc_id) AS BIGINT) AS fd FROM tok GROUP BY w
    ), ckpts AS (
      SELECT CAST(power(2, g.i) AS BIGINT) - 1 AS cp
      FROM (SELECT unnest(range(2, 30)) AS i) g
      WHERE power(2, g.i) - 1 <= (SELECT max(doc_id) FROM per_doc)
    ), curve AS (
      SELECT c.cp,
             (SELECT CAST(sum(p.n_tok) AS BIGINT) FROM per_doc p
              WHERE p.doc_id <= c.cp) AS big_n,
             (SELECT CAST(count(*) AS BIGINT) FROM firsts f
              WHERE f.fd <= c.cp) AS v
      FROM ckpts c
    ), pts AS (
      SELECT cp, big_n, v, ln(big_n) AS lx, ln(v) AS ly FROM curve
      WHERE big_n > 0 AND v > 0
    ), fit AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(lx ORDER BY cp)), (a, b) -> a + b) AS sx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(ly ORDER BY cp)), (a, b) -> a + b) AS sy,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(lx * lx ORDER BY cp)), (a, b) -> a + b) AS sxx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(lx * ly ORDER BY cp)), (a, b) -> a + b) AS sxy
      FROM pts
    )
    SELECT k AS n_checkpoints,
           (SELECT max(big_n) FROM curve) AS corpus_tokens,
           (SELECT max(v) FROM curve) AS vocab_size,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
             AS heaps_beta,
           round(exp((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx)
                     / k), 6) AS heaps_k
    FROM fit
    """,
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: V(N) ≈ K·N^β fit by log-log OLS
    over the vocabulary-growth curve sampled at doc-count checkpoints
    2^k−1 — V from each token's FIRST-occurrence doc (min doc_id), N
    from cumulative token counts. β (typically 0.4–0.6 for natural
    text; ~0 for a closed vocabulary like this corpus) is what corpus
    planners extrapolate to size tokenizers and OOV budgets before
    scaling a crawl 100×.

    Determinism: checkpoint N and V are exact integer sums/counts;
    the OLS runs over ≤30 log-spaced points folded in checkpoint
    order.

    Scale: first-occurrence is one map-side-combined min per token;
    checkpointing joins two bounded broadcast dimensions (the 2^k
    grid) against per-doc/per-token aggregates — the curve never
    materializes per-doc cumulative state, and log-spacing keeps the
    fit frame bounded at any corpus size.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tok")
    )
    firsts = tok.groupBy("w").agg(
        F.min("doc_id").cast("bigint").alias("fd")
    )
    max_doc = per_doc.agg(F.max("doc_id")).collect()[0][0]
    cps = [2**i - 1 for i in range(2, 30) if 2**i - 1 <= max_doc]
    ckpts = spark.createDataFrame([(c,) for c in cps], "cp long")
    big_n = (
        per_doc.crossJoin(F.broadcast(ckpts))
        .filter(F.col("doc_id") <= F.col("cp"))
        .groupBy("cp")
        .agg(F.sum("n_tok").cast("bigint").alias("big_n"))
    )
    vs = (
        firsts.crossJoin(F.broadcast(ckpts))
        .filter(F.col("fd") <= F.col("cp"))
        .groupBy("cp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    )
    curve = big_n.join(vs, "cp")
    pts = curve.filter((F.col("big_n") > 0) & (F.col("v") > 0)).select(
        "cp",
        "big_n",
        "v",
        F.log("big_n").alias("lx"),
        F.log("v").alias("ly"),
    )

    def fold(expr: str) -> F.Column:
        return F.expr(
            f"""
            aggregate(transform(array_sort(collect_list(struct(cp,
                ({expr}) AS vv))), s -> s.vv), CAST(0.0 AS DOUBLE),
              (a, b) -> a + b)
            """
        )

    fit = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        fold("lx").alias("sx"),
        fold("ly").alias("sy"),
        fold("lx * lx").alias("sxx"),
        fold("lx * ly").alias("sxy"),
        F.max("big_n").cast("bigint").alias("corpus_tokens"),
        F.max("v").cast("bigint").alias("vocab_size"),
    )
    beta = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return fit.select(
        F.col("k").alias("n_checkpoints"),
        "corpus_tokens",
        "vocab_size",
        F.round(beta, 6).alias("heaps_beta"),
        F.round(
            F.exp((F.col("sy") - beta * F.col("sx")) / F.col("k")), 6
        ).alias("heaps_k"),
    )
