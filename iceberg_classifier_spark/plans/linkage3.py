"""Linkage wave 3: q-gram count-filtered edit-distance join, and a
daily-batch UCB1 bandit replay.

The q-gram join is the database-literature similarity join (Gravano
et al.): block candidate pairs on shared q-grams, prune with the
count filter |G_a ∩ G_b| ≥ max(|G_a|,|G_b|) − k·q, and only then pay
for Levenshtein — the third blocking scheme in the engine next to
sorted-neighborhood (`sorted_neighborhood_blocking`) and delete-
indexing (`symspell_correction`). The UCB replay evaluates a bandit
policy offline against logged daily rewards (the replay method of
Li et al.), the standard pre-deployment check for adaptive routing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_QG_Q = 2  # gram length
_QG_K = 1  # edit-distance threshold


@query(
    "qgram_edit_join",
    oracle=f"""
    WITH names AS (
      SELECT DISTINCT p_name AS nm FROM part
    ), grams AS (
      SELECT nm, g.gr, CAST(count(*) AS BIGINT) AS c
      FROM (
        SELECT nm, unnest(list_transform(
          range(0, len('#' || nm || '#') - {_QG_Q} + 1),
          i -> substr('#' || nm || '#', CAST(i + 1 AS INTEGER), {_QG_Q})))
          AS gr
        FROM names
      ) g GROUP BY nm, g.gr
    ), glen AS (
      SELECT nm, CAST(sum(c) AS BIGINT) AS ng FROM grams GROUP BY nm
    ), shared AS (
      SELECT a.nm AS na, b.nm AS nb,
             CAST(sum(least(a.c, b.c)) AS BIGINT) AS common
      FROM grams a JOIN grams b ON a.gr = b.gr AND a.nm < b.nm
      GROUP BY a.nm, b.nm
    ), filtered AS (
      SELECT s.na, s.nb, s.common, la.ng AS nga, lb.ng AS ngb,
             CASE WHEN s.common >= greatest(la.ng, lb.ng)
                                   - {_QG_K} * {_QG_Q} THEN 1 ELSE 0 END
               AS passes,
             CASE WHEN levenshtein(s.na, s.nb) <= {_QG_K} THEN 1 ELSE 0
               END AS verified
      FROM shared s
      JOIN glen la ON s.na = la.nm
      JOIN glen lb ON s.nb = lb.nm
    )
    SELECT CAST((SELECT count(*) FROM names) AS BIGINT) AS n_strings,
           CAST(count(*) AS BIGINT) AS n_candidate_pairs,
           CAST(sum(passes) AS BIGINT) AS n_passed_filter,
           CAST(sum(CASE WHEN passes = 1 AND verified = 1 THEN 1 ELSE 0
                    END) AS BIGINT) AS n_verified_ed1,
           CAST(sum(CASE WHEN passes = 0 AND verified = 1 THEN 1 ELSE 0
                    END) AS BIGINT) AS n_filter_false_negatives,
           CAST(CASE WHEN sum(passes) = 0 THEN 0
                ELSE sum(CASE WHEN passes = 1 AND verified = 1
                         THEN 1 ELSE 0 END) * 1000000 // sum(passes) END
             AS BIGINT) AS filter_precision_ppm
    FROM filtered
    """,
)
def qgram_edit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-gram count-filtered edit-distance self-join over distinct part
    names: pad with '#', emit 2-grams with multiplicities, generate
    candidates ONLY through the shared-gram equi-join (a < b), prune
    with the count filter common ≥ max(|G_a|,|G_b|) − k·q, and verify
    survivors with Levenshtein ≤ 1 — the Gravano-style similarity join
    that turns a quadratic fuzzy scan into postings + an equi-join.
    Reports candidate/filtered/verified funnel counts, the filter's
    precision, and its false-negative count (which the count-filter
    theorem guarantees to be 0 — the op is a self-checking proof).

    Determinism: all outputs are exact integer counts of set algebra
    over exact gram multisets.

    Scale: gram posting lists are the blocking structure (df-cap hot
    grams as in `dedup_ngram_jaccard` when a gram goes viral);
    Levenshtein runs only on count-filter survivors — at 100 TB the
    expensive verify touches a vanishing fraction of pairs.
    """
    names = load(spark, sf_dir, "part").select("p_name").distinct().select(
        F.col("p_name").alias("nm")
    )
    padded = F.concat(F.lit("#"), F.col("nm"), F.lit("#"))
    grams = (
        names.select(
            "nm",
            F.explode(
                F.expr(
                    f"""
                    transform(sequence(0, length(concat('#', nm, '#'))
                                          - {_QG_Q}),
                      i -> substring(concat('#', nm, '#'), i + 1, {_QG_Q}))
                    """
                )
            ).alias("gr"),
        )
        .groupBy("nm", "gr")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    glen = grams.groupBy("nm").agg(F.sum("c").cast("bigint").alias("ng"))
    a = grams.select(
        F.col("nm").alias("na"), "gr", F.col("c").alias("ca")
    )
    b = grams.select(
        F.col("nm").alias("nb"), "gr", F.col("c").alias("cb")
    )
    shared = (
        a.join(b, "gr")
        .filter(F.col("na") < F.col("nb"))
        .groupBy("na", "nb")
        .agg(
            F.sum(F.least(F.col("ca"), F.col("cb")))
            .cast("bigint")
            .alias("common")
        )
    )
    filtered = (
        shared.join(
            glen.select(F.col("nm").alias("na"), F.col("ng").alias("nga")),
            "na",
        )
        .join(
            glen.select(F.col("nm").alias("nb"), F.col("ng").alias("ngb")),
            "nb",
        )
        .select(
            "na",
            "nb",
            "common",
            (
                F.col("common")
                >= F.greatest(F.col("nga"), F.col("ngb")) - _QG_K * _QG_Q
            )
            .cast("bigint")
            .alias("passes"),
            (F.levenshtein("na", "nb") <= _QG_K)
            .cast("bigint")
            .alias("verified"),
        )
    )
    n_strings = names.count()
    return filtered.agg(
        F.lit(n_strings).cast("bigint").alias("n_strings"),
        F.count(F.lit(1)).cast("bigint").alias("n_candidate_pairs"),
        F.sum("passes").cast("bigint").alias("n_passed_filter"),
        F.sum(
            F.when((F.col("passes") == 1) & (F.col("verified") == 1), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_verified_ed1"),
        F.sum(
            F.when((F.col("passes") == 0) & (F.col("verified") == 1), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_filter_false_negatives"),
        F.expr(
            """
            CAST(CASE WHEN sum(passes) = 0 THEN 0
                 ELSE sum(CASE WHEN passes = 1 AND verified = 1
                          THEN 1 ELSE 0 END) * 1000000 div sum(passes) END
              AS BIGINT)
            """
        ).alias("filter_precision_ppm"),
    )


_ARMS = ["click", "error", "purchase", "signup", "view"]
_UCB_SCALE = 1000000.0  # rewards are µ$/event integers; UCB term scaled


@query(
    "ucb_bandit_replay",
    oracle="""
    WITH byarm AS (
      SELECT CAST(ts AS DATE) AS day, event_type AS arm,
             CAST(CAST(sum(round(value * 100)) AS BIGINT) * 10000
                  // count(*) AS BIGINT) AS r6
      FROM events GROUP BY 1, 2
    ), ents AS (
      SELECT day, list(struct_pack(a := CASE arm
               WHEN 'click' THEN 0 WHEN 'error' THEN 1
               WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
               ELSE 4 END, r := r6)) AS es
      FROM byarm GROUP BY day
    ), daily AS (
      SELECT day,
             list_transform(range(0, 5), k ->
               coalesce(list_filter(es, e -> e.a = k)[1].r, 0)) AS rs
      FROM ents
    ), seq AS (
      SELECT list(struct_pack(day := day, rs := rs) ORDER BY day) AS days
      FROM daily
    ), folded AS (
      SELECT days,
        list_reduce(
          list_prepend(CAST([0, 0,0,0,0,0, 0,0,0,0,0] AS DOUBLE[]),
            list_transform(days, s ->
              list_transform(s.rs, x -> CAST(x AS DOUBLE)))),
          (a, v) -> list_concat(
            [a[1] + 1.0],
            list_concat(
              list_transform(range(0, 5), k ->
                a[CAST(k + 2 AS INTEGER)]
                + CASE WHEN k = list_reduce(
                    list_prepend(CAST([-1, 0] AS DOUBLE[]),
                      list_transform(range(0, 5), j ->
                        [CASE WHEN a[CAST(j + 2 AS INTEGER)] = 0
                              THEN 1e18 - j
                              ELSE a[CAST(j + 7 AS INTEGER)]
                                   / a[CAST(j + 2 AS INTEGER)]
                                   + 1000000.0 * sqrt(2 * ln(a[1] + 1.0)
                                     / a[CAST(j + 2 AS INTEGER)]) END,
                         CAST(j AS DOUBLE)])),
                    (b, c) -> CASE WHEN c[1] > b[1] THEN c ELSE b END)[2]
                  THEN 1.0 ELSE 0.0 END),
              list_concat(
                list_transform(range(0, 5), k ->
                  a[CAST(k + 7 AS INTEGER)]
                  + CASE WHEN k = list_reduce(
                      list_prepend(CAST([-1, 0] AS DOUBLE[]),
                        list_transform(range(0, 5), j ->
                          [CASE WHEN a[CAST(j + 2 AS INTEGER)] = 0
                                THEN 1e18 - j
                                ELSE a[CAST(j + 7 AS INTEGER)]
                                     / a[CAST(j + 2 AS INTEGER)]
                                     + 1000000.0 * sqrt(2 * ln(a[1] + 1.0)
                                       / a[CAST(j + 2 AS INTEGER)]) END,
                           CAST(j AS DOUBLE)])),
                      (b, c) -> CASE WHEN c[1] > b[1] THEN c ELSE b END)[2]
                    THEN v[CAST(k + 1 AS INTEGER)] ELSE 0.0 END),
                list_slice(a, 12, len(a)) ||
                [list_reduce(
                    list_prepend(CAST([-1, 0] AS DOUBLE[]),
                      list_transform(range(0, 5), j ->
                        [CASE WHEN a[CAST(j + 2 AS INTEGER)] = 0
                              THEN 1e18 - j
                              ELSE a[CAST(j + 7 AS INTEGER)]
                                   / a[CAST(j + 2 AS INTEGER)]
                                   + 1000000.0 * sqrt(2 * ln(a[1] + 1.0)
                                     / a[CAST(j + 2 AS INTEGER)]) END,
                         CAST(j AS DOUBLE)])),
                    (b, c) -> CASE WHEN c[1] > b[1] THEN c ELSE b END)[2]]
              ))
          )) AS st
      FROM seq
    )
    SELECT u.s.day AS day,
           CAST(u.s.pick AS BIGINT) AS picked_arm,
           CASE CAST(u.s.pick AS BIGINT)
             WHEN 0 THEN 'click' WHEN 1 THEN 'error'
             WHEN 2 THEN 'purchase' WHEN 3 THEN 'signup'
             ELSE 'view' END AS arm_name,
           CAST((CAST(u.s.rew AS BIGINT) + 50) // 100 AS DOUBLE) / 100
             AS reward_cents
    FROM folded, unnest(list_transform(range(1, len(days) + 1),
      i -> struct_pack(day := days[CAST(i AS INTEGER)].day,
                       pick := st[CAST(11 + i AS INTEGER)],
                       rew := CAST(days[CAST(i AS INTEGER)]
                         .rs[CAST(st[CAST(11 + i AS INTEGER)] + 1
                             AS INTEGER)] AS DOUBLE)))) AS u(s)
    ORDER BY day
    """,
)
def ucb_bandit_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline replay of a UCB1 bandit over the logged daily per-arm
    rewards (mean event value per arm per day, exact µ-dollar
    integers): each day the policy plays argmax of x̄_j + c·√(2·ln t /
    n_j) (unplayed arms first, lowest index on ties), collects that
    arm's logged reward, and updates — the Li-et-al replay method that
    answers "what would adaptive routing have earned" before anything
    ships. Emits the full decision trace (day, arm, collected reward).

    Determinism: rewards are exact integers; the UCB comparison is an
    identical double expression folded in day order; unplayed arms
    rank by 1e18 − j so exploration order is fixed; state is one flat
    DOUBLE[] ([t, n₁..n₅, s₁..s₅] + pick trace).

    Scale: the fact stream collapses to a (day × arm) aggregate
    map-side; the replay folds once over the bounded day dimension
    (independent folds per segment for fleets of policies).
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
    ents = byarm.groupBy("day").agg(
        F.expr("collect_list(struct(arm, r6))").alias("es")
    )
    daily = ents.select(
        "day",
        F.expr(
            """
            transform(sequence(0, 4), k ->
              coalesce(get(filter(es, e -> e.arm = k), 0).r6, 0L))
            """
        ).alias("rs"),
    )
    seq = daily.agg(
        F.expr("array_sort(collect_list(struct(day, rs)))").alias("days")
    )
    # UCB score of arm j given state a (0-based Spark arrays):
    # a[0]=t, a[1+j]=n_j, a[6+j]=s_j; unplayed → 1e18 - j
    ucb_j = (
        "CASE WHEN a[j + 1] = 0 THEN 1e18 - j"
        " ELSE a[j + 6] / a[j + 1]"
        " + 1000000.0 * sqrt(2 * ln(a[0] + 1.0) / a[j + 1]) END"
    )
    argmax = (
        "aggregate(sequence(0, 4), CAST(array(-1.0, 0.0) AS ARRAY<DOUBLE>),"
        f" (b, j) -> IF(({ucb_j}) > b[0],"
        f" array(({ucb_j}), CAST(j AS DOUBLE)), b))[1]"
    )
    folded = seq.select(
        "days",
        F.expr(
            f"""
            aggregate(transform(days, s ->
                transform(s.rs, x -> CAST(x AS DOUBLE))),
              CAST(array(0.0, 0.0,0.0,0.0,0.0,0.0,
                         0.0,0.0,0.0,0.0,0.0) AS ARRAY<DOUBLE>),
              (a, v) -> concat(
                array(a[0] + 1.0),
                transform(sequence(0, 4), k ->
                  a[k + 1] + IF(CAST(k AS DOUBLE) = ({argmax}),
                                1.0, 0.0)),
                transform(sequence(0, 4), k ->
                  a[k + 6] + IF(CAST(k AS DOUBLE) = ({argmax}),
                                v[k], 0.0)),
                slice(a, 12, size(a) - 11),
                array(({argmax}))))
            """
        ).alias("st"),
    )
    rows = folded.select(
        F.posexplode("days").alias("i", "s"), F.col("st")
    )
    pick = F.expr("CAST(element_at(st, CAST(12 + i AS INT)) AS BIGINT)")
    return rows.select(
        F.col("s.day").alias("day"),
        pick.alias("picked_arm"),
        F.when(pick == 0, "click")
        .when(pick == 1, "error")
        .when(pick == 2, "purchase")
        .when(pick == 3, "signup")
        .otherwise("view")
        .alias("arm_name"),
        # exact int64 HALF_UP (motif convention): µ$ rewards have a true
        # 4dp cents expansion — never round the double quotient at 2dp
        (
            F.expr(
                "(CAST(element_at(s.rs, CAST(element_at(st,"
                " CAST(12 + i AS INT)) + 1 AS INT)) AS BIGINT) + 50)"
                " div 100"
            ).cast("double")
            / 100
        ).alias("reward_cents"),
    ).orderBy("day")
