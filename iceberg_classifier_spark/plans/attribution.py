"""Markov-chain removal-effect attribution (Anderl et al. — the
"Markov attribution" every marketing-analytics stack implements).

Journeys are absorbed into conv (first purchase) or null; channels are
the non-purchase event types. The base conversion probability is the
absorption probability of the journey Markov chain from `start`; a
channel's removal effect is how much that probability drops when every
transition into the channel is redirected to null. Credit shares are
the normalized removal effects — the causal-flavored alternative to
the positional rules in `multitouch_attribution`.

Absorption probabilities are computed as the truncated Neumann series
Σ_{k<60} (v·Qᵏ)·r — a fixed-iteration vector fold (geometric
convergence; 60 steps ≈ machine precision for sub-stochastic Q), which
both engines replay as identical nested folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_CHANNELS = ["click", "error", "signup", "view"]  # states 1..4; start=0
_ITERS = 60

_STATE_SQL = (
    "CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2"
    " WHEN 'signup' THEN 3 ELSE 4 END"
)
_CH_NAME_SQL = (
    "CASE s.scen WHEN 1 THEN 'click' WHEN 2 THEN 'error'"
    " WHEN 3 THEN 'signup' ELSE 'view' END"
)


@query(
    "markov_removal_attribution",
    oracle=f"""
    WITH fp AS (
      SELECT user_id, ts AS fts, event_id AS fid FROM (
        SELECT user_id, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'purchase'
      ) WHERE rn = 1
    ), j AS (
      SELECT e.user_id, e.ts, e.event_id, {_STATE_SQL} AS state
      FROM events e LEFT JOIN fp ON e.user_id = fp.user_id
      WHERE e.event_type <> 'purchase'
        AND (fp.user_id IS NULL OR e.ts < fp.fts
             OR (e.ts = fp.fts AND e.event_id < fp.fid))
    ), pairs1 AS (
      SELECT coalesce(lag(state) OVER (PARTITION BY user_id
               ORDER BY ts, event_id), 0) AS i, state AS tj
      FROM j
    ), lastst AS (
      SELECT u.user_id, coalesce(l.state, 0) AS last_state,
             CASE WHEN fp.user_id IS NULL THEN 6 ELSE 5 END AS term
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN (
        SELECT user_id, state, row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM j
      ) l ON u.user_id = l.user_id AND l.rn = 1
      LEFT JOIN fp ON u.user_id = fp.user_id
    ), trans AS (
      SELECT i, tj FROM pairs1
      UNION ALL SELECT last_state AS i, term AS tj FROM lastst
    ), counts AS (
      SELECT i, tj, CAST(count(*) AS BIGINT) AS c FROM trans GROUP BY 1, 2
    ), tot AS (
      SELECT i, CAST(sum(c) AS BIGINT) AS t FROM counts GROUP BY i
    ), probs AS (
      SELECT c.i, c.tj, c.c * 1.0 / t.t AS p
      FROM counts c JOIN tot t ON c.i = t.i
    ), packed AS (
      SELECT list(struct_pack(k := i * 5 + tj, p := p)) FILTER
               (WHERE tj BETWEEN 1 AND 4) AS qents,
             list(struct_pack(k := i, p := p)) FILTER (WHERE tj = 5)
               AS rents
      FROM probs
    ), mats AS (
      SELECT list_transform(range(0, 25),
               k -> coalesce(list_filter(qents, e -> e.k = k)[1].p, 0.0))
               AS qm,
             list_transform(range(0, 5),
               k -> coalesce(list_filter(rents, e -> e.k = k)[1].p, 0.0))
               AS r
      FROM packed
    ), scen AS (
      SELECT s.scen, m.qm AS qm0, m.r,
             list_transform(range(0, 25),
               k -> CASE WHEN s.scen > 0 AND k % 5 = s.scen
                    THEN 0.0 ELSE m.qm[CAST(k + 1 AS INTEGER)] END) AS qm
      FROM mats m, (SELECT unnest([0, 1, 2, 3, 4]) AS scen) s
    ), absorbed AS (
      SELECT scen,
        list_reduce(list_prepend(CAST([0, 1, 0, 0, 0, 0] AS DOUBLE[]),
          list_transform(range(1, {_ITERS} + 1),
            i -> CAST([] AS DOUBLE[]))),
          (a, v) -> [
            a[1] + list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(range(0, 5),
                jj -> a[CAST(jj + 2 AS INTEGER)]
                      * r[CAST(jj + 1 AS INTEGER)])),
              (s2, t2) -> s2 + t2),
            0.0,
            list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(range(0, 5),
                ii -> a[CAST(ii + 2 AS INTEGER)]
                      * qm[CAST(ii * 5 + 2 AS INTEGER)])),
              (s2, t2) -> s2 + t2),
            list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(range(0, 5),
                ii -> a[CAST(ii + 2 AS INTEGER)]
                      * qm[CAST(ii * 5 + 3 AS INTEGER)])),
              (s2, t2) -> s2 + t2),
            list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(range(0, 5),
                ii -> a[CAST(ii + 2 AS INTEGER)]
                      * qm[CAST(ii * 5 + 4 AS INTEGER)])),
              (s2, t2) -> s2 + t2),
            list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(range(0, 5),
                ii -> a[CAST(ii + 2 AS INTEGER)]
                      * qm[CAST(ii * 5 + 5 AS INTEGER)])),
              (s2, t2) -> s2 + t2)
          ])[1] AS p_conv
      FROM scen
    ), base AS (
      SELECT p_conv AS p0 FROM absorbed WHERE scen = 0
    ), effects AS (
      SELECT a.scen, a.p_conv, b.p0,
             greatest(b.p0 - a.p_conv, 0.0) AS eff
      FROM absorbed a CROSS JOIN base b WHERE a.scen > 0
    ), tot_eff AS (
      SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(eff ORDER BY scen)), (x, y) -> x + y) AS te
      FROM effects
    )
    SELECT {_CH_NAME_SQL} AS channel,
           round(s.p0, 6) AS base_conv_prob,
           round(s.p_conv, 6) AS removed_conv_prob,
           round(s.eff, 6) AS removal_effect,
           round(s.eff / t.te, 6) AS attribution_share
    FROM effects s CROSS JOIN tot_eff t
    ORDER BY channel
    """,
)
def markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution: build the journey chain
    (start → channel → … → conv/null, journeys truncated at each
    user's first purchase), estimate transition probabilities from
    exact counts, compute the base conversion probability as the
    absorption probability from start (60-step Neumann series — a
    fixed nested fold, geometrically exact), then for each channel
    re-run the chain with that channel's column removed (redirected to
    null) and credit the channel its normalized conversion drop — the
    data-driven attribution model that replaces positional heuristics
    (`multitouch_attribution`) with path structure.

    Determinism: transition probabilities are exact count ratios; the
    matrix packs into fixed-index flat arrays; all five scenario folds
    run the identical 60 iterations of identical double arithmetic
    (both engines verified on nested captured folds).

    Scale: journey truncation and transition extraction are
    user-partitioned windows over the fact stream; the chain itself is
    a ≤30-cell aggregate — the 5 scenario folds are constant work.
    Removal effects for K channels reuse ONE transition matrix (no
    per-channel data pass).
    """
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.expr(_STATE_SQL).alias("state"),
    )
    wp = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("fuser"),
            F.col("ts").alias("fts"),
            F.col("event_id").alias("fid"),
        )
    )
    j = (
        e.filter(F.col("event_type") != "purchase")
        .join(fp, e.user_id == fp.fuser, "left")
        .filter(
            F.col("fuser").isNull()
            | (F.col("ts") < F.col("fts"))
            | ((F.col("ts") == F.col("fts")) & (F.col("event_id") < F.col("fid")))
        )
        .select("user_id", "ts", "event_id", "state")
    )
    pairs1 = j.select(
        F.coalesce(F.lag("state").over(wp), F.lit(0)).alias("i"),
        F.col("state").alias("tj"),
    )
    last = (
        j.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.desc("ts"), F.desc("event_id")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select(F.col("user_id").alias("luser"), F.col("state").alias("lst"))
    )
    users = e.select("user_id").distinct()
    pairs2 = (
        users.join(last, users.user_id == last.luser, "left")
        .join(fp, users.user_id == fp.fuser, "left")
        .select(
            F.coalesce(F.col("lst"), F.lit(0)).alias("i"),
            F.when(F.col("fuser").isNull(), 6).otherwise(5).alias("tj"),
        )
    )
    counts = pairs1.unionAll(pairs2).groupBy("i", "tj").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = counts.groupBy("i").agg(F.sum("c").alias("t"))
    probs = counts.join(tot, "i").select(
        "i", "tj", (F.col("c") * 1.0 / F.col("t")).alias("p")
    )
    packed = probs.agg(
        F.expr(
            "collect_list(CASE WHEN tj BETWEEN 1 AND 4"
            " THEN struct(i * 5 + tj AS k, p) END)"
        ).alias("qents"),
        F.expr(
            "collect_list(CASE WHEN tj = 5 THEN struct(i AS k, p) END)"
        ).alias("rents"),
    )
    mats = packed.select(
        F.expr(
            """
            transform(sequence(0, 24),
              k -> coalesce(get(filter(qents, e -> e.k = k), 0).p, 0.0))
            """
        ).alias("qm0"),
        F.expr(
            """
            transform(sequence(0, 4),
              k -> coalesce(get(filter(rents, e -> e.k = k), 0).p, 0.0))
            """
        ).alias("r"),
    )
    scen = mats.select(
        F.explode(F.expr("array(0, 1, 2, 3, 4)")).alias("scen"),
        "qm0",
        "r",
    ).select(
        "scen",
        "r",
        F.expr(
            """
            transform(sequence(0, 24),
              k -> IF(scen > 0 AND k % 5 = scen, CAST(0.0 AS DOUBLE),
                      qm0[k]))
            """
        ).alias("qm"),
    )

    def col_sum(j_off: int) -> str:
        return (
            "aggregate(sequence(0, 4), CAST(0.0 AS DOUBLE),"
            f" (s2, ii) -> s2 + a[ii + 1] * qm[ii * 5 + {j_off}])"
        )

    absorbed = scen.select(
        "scen",
        F.expr(
            f"""
            aggregate(sequence(1, {_ITERS}),
              CAST(array(0.0, 1.0, 0.0, 0.0, 0.0, 0.0) AS ARRAY<DOUBLE>),
              (a, it) -> array(
                a[0] + aggregate(sequence(0, 4), CAST(0.0 AS DOUBLE),
                         (s2, jj) -> s2 + a[jj + 1] * r[jj]),
                CAST(0.0 AS DOUBLE),
                {col_sum(1)}, {col_sum(2)}, {col_sum(3)}, {col_sum(4)}))[0]
            """
        ).alias("p_conv"),
    )
    base = absorbed.filter(F.col("scen") == 0).select(
        F.col("p_conv").alias("p0")
    )
    effects = (
        absorbed.filter(F.col("scen") > 0)
        .crossJoin(F.broadcast(base))
        .select(
            "scen",
            "p_conv",
            "p0",
            F.greatest(F.col("p0") - F.col("p_conv"), F.lit(0.0)).alias(
                "eff"
            ),
        )
    )
    tot_eff = effects.agg(
        F.expr(
            """
            aggregate(transform(array_sort(collect_list(struct(scen, eff))),
              s -> s.eff), CAST(0.0 AS DOUBLE), (x, y) -> x + y)
            """
        ).alias("te")
    )
    name = (
        F.when(F.col("scen") == 1, "click")
        .when(F.col("scen") == 2, "error")
        .when(F.col("scen") == 3, "signup")
        .otherwise("view")
    )
    return (
        effects.crossJoin(F.broadcast(tot_eff))
        .select(
            name.alias("channel"),
            F.round("p0", 6).alias("base_conv_prob"),
            F.round("p_conv", 6).alias("removed_conv_prob"),
            F.round("eff", 6).alias("removal_effect"),
            F.round(F.col("eff") / F.col("te"), 6).alias(
                "attribution_share"
            ),
        )
        .orderBy("channel")
    )
