"""Optimal-transport/bandit wave 56: Sinkhorn scaling and EXP3 replay.

- `sinkhorn_transport_plan` — entropic optimal transport between the
  customer-segment and order-priority revenue distributions: Gibbs
  kernel K = exp(-C/eps) on a |rank difference| cost, 10 Sinkhorn
  scaling rounds (u = a/(Kv), v = b/(K'u)) run AS QUERY STAGES, then
  the transport plan, marginal errors, and entropic cost.
- `exp3_bandit_replay` — EXP3 (Auer et al.) adversarial bandit
  replayed over the logged event stream (click/purchase/view arms,
  reward = value > 50) with portable-hash exploration draws and the
  standard replay rule (update only when the algorithm's draw
  matches the logged arm), folded order-pinned.

Determinism: marginals are exact integer ratios; every Sinkhorn
matvec sums 5 identical closed-form terms; the EXP3 fold is the
identical expression template both engines execute over the same
(ts, event_id)-pinned prefix with hash-derived draws.

Scale: Sinkhorn's iterations live entirely on 5-element vector
frames and a 25-cell kernel after two one-pass marginal
aggregations (u -> v -> u is a LINEAR chain, no per-round lineage
fan-out); the bandit replay is inherently sequential, so it folds a
bounded 2000-event prefix (documented) — the standard replay-eval
budget, not a fact-table scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.plans.pipeline_ops import _duck_hex_fold
from iceberg_classifier_spark.sources.tables import load

_OT_EPS = 0.5
_OT_ITERS = 10


def _sink_oracle() -> str:
    head = f"""
    WITH a AS MATERIALIZED (
      SELECT i, n * 1.0 / sum(n) OVER () AS ai FROM (
        SELECT CAST(dense_rank() OVER (ORDER BY c.c_mktsegment)
                 AS BIGINT) AS i,
               CAST(sum(CAST(round(o.o_totalprice) AS BIGINT))
                 AS BIGINT) AS n
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment
      )
    ), b AS MATERIALIZED (
      SELECT j, n * 1.0 / sum(n) OVER () AS bj FROM (
        SELECT CAST(dense_rank() OVER (ORDER BY o_orderpriority)
                 AS BIGINT) AS j,
               CAST(sum(CAST(round(o_totalprice) AS BIGINT))
                 AS BIGINT) AS n
        FROM orders GROUP BY o_orderpriority
      )
    ), kk AS MATERIALIZED (
      SELECT a.i, b.j, exp(-abs(a.i - b.j) / {_OT_EPS}) AS k
      FROM a CROSS JOIN b
    ), v0 AS MATERIALIZED (SELECT j, 1.0 AS v FROM b)"""
    steps = []
    for t in range(1, _OT_ITERS + 1):
        steps.append(f"""
    , u{t} AS MATERIALIZED (
      SELECT a.i, a.ai / sum(kk.k * v.v) AS u
      FROM kk JOIN v{t - 1} v ON v.j = kk.j JOIN a ON a.i = kk.i
      GROUP BY a.i, a.ai
    ), v{t} AS MATERIALIZED (
      SELECT b.j, b.bj / sum(kk.k * u.u) AS v
      FROM kk JOIN u{t} u ON u.i = kk.i JOIN b ON b.j = kk.j
      GROUP BY b.j, b.bj
    )""")
    last = _OT_ITERS
    return head + "".join(steps) + f"""
    , plan AS MATERIALIZED (
      SELECT kk.i, kk.j, u.u * kk.k * v.v AS p,
             abs(kk.i - kk.j) AS c
      FROM kk JOIN u{last} u ON u.i = kk.i
      JOIN v{last} v ON v.j = kk.j
    ), err AS (
      SELECT max(abs(rm - ai)) AS row_err FROM (
        SELECT i, sum(p) AS rm FROM plan GROUP BY i
      ) r JOIN a ON a.i = r.i
    ), errc AS (
      SELECT max(abs(cm - bj)) AS col_err FROM (
        SELECT j, sum(p) AS cm FROM plan GROUP BY j
      ) s JOIN b ON b.j = s.j
    ), cost AS (SELECT sum(p * c) AS tc FROM plan)
    SELECT plan.i AS seg_rank, plan.j AS pri_rank,
           round(plan.p, 6) AS mass,
           round(cost.tc, 6) AS transport_cost,
           round(err.row_err, 6) AS max_row_marginal_err,
           round(errc.col_err, 6) AS max_col_marginal_err
    FROM plan CROSS JOIN cost CROSS JOIN err CROSS JOIN errc
    ORDER BY seg_rank, pri_rank
    """


@query("sinkhorn_transport_plan", oracle=_sink_oracle())
def sinkhorn_transport_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropic optimal transport (Cuturi's Sinkhorn) between the
    revenue distribution over customer segments and over order
    priorities: Gibbs kernel K = exp(-|i-j|/eps) on alphabetical
    ranks, eps = {_OT_EPS}, and {_OT_ITERS} scaling rounds
    u = a/(Kv), v = b/(K'u) executed as chained query stages. Emits
    the 25-cell transport plan, the entropic transport cost, and
    the marginal reconstruction errors (the convergence
    certificate). The coupling-matrix upgrade of `emd_value_drift`
    (1-D closed form) — Sinkhorn generalizes to arbitrary cost
    matrices and is THE scalable OT algorithm (matrix scaling only).

    Determinism: both marginals are exact integer ratios; each
    scaling round sums 5 identical closed-form terms; round 6dp.

    Scale: two one-pass marginal aggregations, then all {_OT_ITERS}
    rounds run on 5-element vector frames against the 25-cell
    kernel; u -> v -> u is a LINEAR dependency chain (each round
    consumes only the previous vector — no lineage fan-out, no
    checkpointing needed).
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    from pyspark.sql import Window

    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    a = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.sum(F.round(F.col("o_totalprice")).cast("bigint"))
            .cast("bigint")
            .alias("n")
        )
        .select(
            F.dense_rank()
            .over(Window.orderBy("c_mktsegment"))
            .cast("bigint")
            .alias("i"),
            (F.col("n") * 1.0 / F.sum("n").over(wall)).alias("ai"),
        )
    )
    b = (
        o.groupBy("o_orderpriority")
        .agg(
            F.sum(F.round(F.col("o_totalprice")).cast("bigint"))
            .cast("bigint")
            .alias("n")
        )
        .select(
            F.dense_rank()
            .over(Window.orderBy("o_orderpriority"))
            .cast("bigint")
            .alias("j"),
            (F.col("n") * 1.0 / F.sum("n").over(wall)).alias("bj"),
        )
    )
    a = a.cache()
    b = b.cache()
    kk = a.select("i").crossJoin(F.broadcast(b.select("j"))).select(
        "i",
        "j",
        F.exp(-F.abs(F.col("i") - F.col("j")) / _OT_EPS).alias("k"),
    ).cache()
    v = b.select("j", F.lit(1.0).alias("v"))
    u = None
    for _ in range(_OT_ITERS):
        u = (
            kk.join(v, "j")
            .groupBy("i")
            .agg(F.sum(F.col("k") * F.col("v")).alias("kv"))
            .join(F.broadcast(a), "i")
            .select("i", (F.col("ai") / F.col("kv")).alias("u"))
        )
        v = (
            kk.join(u, "i")
            .groupBy("j")
            .agg(F.sum(F.col("k") * F.col("u")).alias("ku"))
            .join(F.broadcast(b), "j")
            .select("j", (F.col("bj") / F.col("ku")).alias("v"))
        )
        # eager lineage truncation per round: the scaling vectors are 5
        # rows, but leaving all _OT_ITERS rounds in ONE logical plan makes
        # Catalyst re-analyze a 2·ITERS-deep join/agg tree (measured 10.4 s
        # chained vs 4.6 s truncated at sf0.1) — same numbers, the
        # checkpoint only cuts planning depth (values are materialized
        # rows, so parity with the unrolled-CTE oracle is unchanged)
        u = u.localCheckpoint(eager=True)
        v = v.localCheckpoint(eager=True)
    plan = (
        kk.join(F.broadcast(u), "i")
        .join(F.broadcast(v), "j")
        .select(
            "i",
            "j",
            (F.col("u") * F.col("k") * F.col("v")).alias("p"),
            F.abs(F.col("i") - F.col("j")).cast("double").alias("cdist"),
        )
        .cache()
    )
    row_err = (
        plan.groupBy("i")
        .agg(F.sum("p").alias("rm"))
        .join(F.broadcast(a), "i")
        .agg(F.max(F.abs(F.col("rm") - F.col("ai"))).alias("row_err"))
    )
    col_err = (
        plan.groupBy("j")
        .agg(F.sum("p").alias("cm"))
        .join(F.broadcast(b), "j")
        .agg(F.max(F.abs(F.col("cm") - F.col("bj"))).alias("col_err"))
    )
    cost = plan.agg(F.sum(F.col("p") * F.col("cdist")).alias("tc"))
    return (
        plan.crossJoin(F.broadcast(cost))
        .crossJoin(F.broadcast(row_err))
        .crossJoin(F.broadcast(col_err))
        .select(
            F.col("i").alias("seg_rank"),
            F.col("j").alias("pri_rank"),
            F.round("p", 6).alias("mass"),
            F.round("tc", 6).alias("transport_cost"),
            F.round("row_err", 6).alias("max_row_marginal_err"),
            F.round("col_err", 6).alias("max_col_marginal_err"),
        )
        .orderBy("seg_rank", "pri_rank")
    )


_EXP3_G = 0.1
_EXP3_N = 2000


def _exp3_step(a: str, u: str, arm: str, r: str) -> str:
    """Shared EXP3 fold body. Accumulator: [w1, w2, w3, n_matched,
    reward_sum, n_steps]. Probabilities mix the weight distribution
    with gamma/3 exploration; the draw u picks the arm; on a match
    with the logged arm the chosen weight gets the importance-
    weighted exponential update.
    """
    g = _EXP3_G

    def w(i: int) -> str:
        return a.format(i=i)

    tot = f"({w(1)} + {w(2)} + {w(3)})"
    p = [
        f"((1 - {g}) * {w(i)} / {tot} + {g} / 3.0)" for i in (1, 2, 3)
    ]
    chosen = (
        f"CASE WHEN {u} < {p[0]} THEN 1"
        f" WHEN {u} < {p[0]} + {p[1]} THEN 2 ELSE 3 END"
    )
    new_w = ", ".join(
        f"{w(i)} * CASE WHEN ({chosen}) = {i} AND {arm} = {i}"
        f" THEN exp({g} * {r} / (3.0 * {p[i - 1]})) ELSE 1.0 END"
        for i in (1, 2, 3)
    )
    matched = f"CASE WHEN ({chosen}) = {arm} THEN 1.0 ELSE 0.0 END"
    return (
        f"{new_w},"
        f" {a.format(i=4)} + {matched},"
        f" {a.format(i=5)} + ({matched}) * {r},"
        f" {a.format(i=6)} + 1.0"
    )


_EXP3_DUCK = _exp3_step("a[{i}]", "b[1]", "b[2]", "b[3]")
_EXP3_SPARK = _exp3_step("a[{i}]", "x[0]", "x[1]", "x[2]").replace(
    "a[1]", "a[0]"
).replace("a[2]", "a[1]").replace("a[3]", "a[2]").replace(
    "a[4]", "a[3]"
).replace("a[5]", "a[4]").replace("a[6]", "a[5]")


@query(
    "exp3_bandit_replay",
    oracle=f"""
    WITH logged AS (
      SELECT CAST(epoch_us(ts) AS DOUBLE) AS t,
             CAST(event_id AS DOUBLE) AS eid,
             (CAST({_duck_hex_fold("CAST(event_id AS VARCHAR)", 13)}
              AS DOUBLE) + 0.5) / 4503599627370496 AS u,
             CASE event_type WHEN 'click' THEN 1.0
                  WHEN 'purchase' THEN 2.0 ELSE 3.0 END AS arm,
             CASE WHEN value > 50 THEN 1.0 ELSE 0.0 END AS r
      FROM events WHERE event_type IN ('click', 'purchase', 'view')
      ORDER BY ts, event_id LIMIT {_EXP3_N}
    ), folded AS (
      SELECT list_reduce(
               list_prepend([1.0, 1.0, 1.0, 0.0, 0.0, 0.0],
                 list([u, arm, r] ORDER BY t, eid)),
               (a, b) -> [{_EXP3_DUCK}]) AS acc
      FROM logged
    )
    SELECT CAST(acc[6] AS BIGINT) AS n_steps,
           CAST(acc[4] AS BIGINT) AS n_matched,
           round(acc[4] / acc[6], 6) AS match_rate,
           CAST(acc[5] AS BIGINT) AS replay_reward,
           round(acc[5] / acc[4], 6) AS reward_per_match,
           round(acc[1] / (acc[1] + acc[2] + acc[3]), 4)
             AS w_click_share,
           round(acc[2] / (acc[1] + acc[2] + acc[3]), 4)
             AS w_purchase_share,
           round(acc[3] / (acc[1] + acc[2] + acc[3]), 4)
             AS w_view_share
    FROM folded
    """,
)
def exp3_bandit_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXP3 adversarial bandit (Auer et al. 2002) replayed over the
    logged event stream: arms click/purchase/view, reward =
    (value > 50), exploration gamma = {_EXP3_G}. Each step draws an
    arm from the mixed weight distribution using the portable
    md5-hash uniform of the event id (reproducible exploration —
    both engines draw identically); per the standard offline replay
    rule the weights update with the importance-weighted estimate
    exp(gamma r / (K p)) ONLY when the draw matches the logged arm.
    Emits match rate, replayed reward, and the final weight shares.
    The adversarial (no-stochastic-assumption) complement of
    `ucb_bandit_replay` (optimism) and
    `thompson`-free deterministic evaluation.

    Determinism: draws are exact hash ratios; the fold is the
    identical expression template both engines execute over the
    same (ts, event_id)-pinned prefix; weights stay smooth doubles.

    Scale: bandit replay is inherently sequential, so it folds the
    first {_EXP3_N} logged plays (a TakeOrdered prefix — the
    standard replay-evaluation budget), never a full fact scan into
    one partition.
    """
    ev = load(spark, sf_dir, "events")
    logged = (
        ev.where(F.col("event_type").isin("click", "purchase", "view"))
        .orderBy("ts", "event_id")
        .limit(_EXP3_N)
        .select(
            F.unix_micros("ts").cast("double").alias("t"),
            F.col("event_id").cast("double").alias("eid"),
            (
                (
                    F.conv(
                        F.substring(
                            F.md5(F.col("event_id").cast("string")), 1, 13
                        ),
                        16,
                        10,
                    ).cast("double")
                    + 0.5
                )
                / 4503599627370496
            ).alias("u"),
            F.when(F.col("event_type") == "click", 1.0)
            .when(F.col("event_type") == "purchase", 2.0)
            .otherwise(3.0)
            .alias("arm"),
            F.when(F.col("value") > 50, 1.0).otherwise(0.0).alias("r"),
        )
    )
    folded = logged.agg(
        F.expr(
            "aggregate("
            " array_sort(collect_list(array(t, eid, u, arm, r))),"
            " array(1D, 1D, 1D, 0D, 0D, 0D),"
            f" (a, x0) -> array({_EXP3_SPARK.replace('x[0]', 'x0[2]').replace('x[1]', 'x0[3]').replace('x[2]', 'x0[4]')}))"
        ).alias("acc")
    )
    tot = (
        F.element_at("acc", 1)
        + F.element_at("acc", 2)
        + F.element_at("acc", 3)
    )
    return folded.select(
        F.element_at("acc", 6).cast("bigint").alias("n_steps"),
        F.element_at("acc", 4).cast("bigint").alias("n_matched"),
        F.round(
            F.element_at("acc", 4) / F.element_at("acc", 6), 6
        ).alias("match_rate"),
        F.element_at("acc", 5).cast("bigint").alias("replay_reward"),
        F.round(
            F.element_at("acc", 5) / F.element_at("acc", 4), 6
        ).alias("reward_per_match"),
        # 4dp: ~180 sequential exp() updates accumulate ~1e-6 relative
        # cross-engine drift in the weight vector (1-ulp libm diffs);
        # the integer replay outcomes above stay exact
        F.round(F.element_at("acc", 1) / tot, 4).alias("w_click_share"),
        F.round(F.element_at("acc", 2) / tot, 4).alias(
            "w_purchase_share"
        ),
        F.round(F.element_at("acc", 3) / tot, 4).alias("w_view_share"),
    )
