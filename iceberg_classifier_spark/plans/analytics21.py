"""Analytics wave 21: group-sequential testing, tamper-evident hash
chains, and (s,S) inventory policy replay.

O'Brien-Fleming boundaries are how experiment platforms peek at
results weekly WITHOUT inflating false positives (spend almost no
alpha early, full alpha at the end). Hash chains are the minimal
tamper-evidence structure for append-only data (each digest commits
to everything before it). The (s,S) replay simulates the classic
reorder policy against actual demand — the closed-loop validation
behind `safety_stock_reorder`'s static formulas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_OBF_K = 4
_OBF_ZFINAL = 2.024  # two-sided 5%, 4 equally-spaced looks


@query(
    "obrien_fleming_looks",
    oracle=f"""
    WITH base AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS arm,
             least(CAST((CAST(ts AS DATE) - DATE '2024-01-01') // 7
               AS BIGINT), {_OBF_K - 1}) + 1 AS week,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ), wk AS (
      SELECT week, arm, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS k
      FROM base GROUP BY 1, 2
    ), looks AS (
      SELECT w.week AS look,
             CAST(sum(CASE WHEN w2.arm = 1 THEN w2.n END) AS BIGINT)
               AS n1,
             CAST(sum(CASE WHEN w2.arm = 1 THEN w2.k END) AS BIGINT)
               AS k1,
             CAST(sum(CASE WHEN w2.arm = 0 THEN w2.n END) AS BIGINT)
               AS n0,
             CAST(sum(CASE WHEN w2.arm = 0 THEN w2.k END) AS BIGINT)
               AS k0
      FROM (SELECT DISTINCT week FROM wk) w
      JOIN wk w2 ON w2.week <= w.week
      GROUP BY w.week
    ), z AS (
      SELECT look, n1, k1, n0, k0,
             (k1 * 1.0 / n1 - k0 * 1.0 / n0)
             / sqrt((k1 + k0) * 1.0 / (n1 + n0)
                    * (1 - (k1 + k0) * 1.0 / (n1 + n0))
                    * (1.0 / n1 + 1.0 / n0)) AS zstat
      FROM looks
    )
    SELECT look, n1, k1, n0, k0,
           round(zstat, 6) AS z,
           round({_OBF_ZFINAL} * sqrt({_OBF_K} * 1.0 / look), 6)
             AS obf_boundary,
           CASE WHEN abs(zstat)
                     > {_OBF_ZFINAL} * sqrt({_OBF_K} * 1.0 / look)
                THEN 1 ELSE 0 END AS crossed
    FROM z ORDER BY look
    """,
)
def obrien_fleming_looks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential monitoring with O'Brien-Fleming boundaries:
    weekly interim looks at the purchase-rate difference between the
    two user-parity arms, each look's cumulative two-proportion z
    compared against the OBF boundary z_final·√(K/k) (K=4, 2.024 →
    4.05 / 2.86 / 2.34 / 2.02) — the peeking schedule that makes
    week-1 stops require overwhelming evidence, so the overall α stays
    5% (the fix for the peeking problem `sprt_sequential_test`
    addresses with likelihood ratios).

    Determinism: per-look counts are exact integer cumulative sums;
    z and boundaries are closed-form doubles.

    Scale: one map-side-combined groupBy((week, arm)); looks expand
    over the bounded week dimension.
    """
    e = load(spark, sf_dir, "events")
    base = e.select(
        (F.col("user_id") % 2).cast("bigint").alias("arm"),
        (
            F.least(
                F.floor(
                    F.datediff(
                        F.col("ts").cast("date"),
                        F.lit("2024-01-01").cast("date"),
                    )
                    / 7
                ).cast("bigint"),
                F.lit(_OBF_K - 1),
            )
            + 1
        ).alias("week"),
        (F.col("event_type") == "purchase").cast("bigint").alias("y"),
    )
    wk = base.groupBy("week", "arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("k"),
    )
    weeks = wk.select("week").distinct().select(F.col("week").alias("look"))
    looks = (
        weeks.join(wk, wk.week <= weeks.look)
        .groupBy("look")
        .agg(
            F.sum(F.when(F.col("arm") == 1, F.col("n")))
            .cast("bigint")
            .alias("n1"),
            F.sum(F.when(F.col("arm") == 1, F.col("k")))
            .cast("bigint")
            .alias("k1"),
            F.sum(F.when(F.col("arm") == 0, F.col("n")))
            .cast("bigint")
            .alias("n0"),
            F.sum(F.when(F.col("arm") == 0, F.col("k")))
            .cast("bigint")
            .alias("k0"),
        )
    )
    pbar = (F.col("k1") + F.col("k0")) * 1.0 / (F.col("n1") + F.col("n0"))
    z = (F.col("k1") * 1.0 / F.col("n1") - F.col("k0") * 1.0 / F.col("n0")) / F.sqrt(
        pbar * (1 - pbar) * (1.0 / F.col("n1") + 1.0 / F.col("n0"))
    )
    bound = _OBF_ZFINAL * F.sqrt(_OBF_K * 1.0 / F.col("look"))
    return looks.select(
        "look",
        "n1",
        "k1",
        "n0",
        "k0",
        F.round(z, 6).alias("z"),
        F.round(bound, 6).alias("obf_boundary"),
        F.when(F.abs(z) > bound, 1).otherwise(0).alias("crossed"),
    ).orderBy("look")


@query(
    "hash_chain_audit",
    oracle="""
    WITH leaves AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS mon,
             o_orderkey AS k,
             substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
                        || CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                AS VARCHAR)), 1, 16) AS leaf
      FROM orders
    ), chains AS (
      SELECT mon, CAST(count(*) AS BIGINT) AS n,
             list_reduce(list_prepend('genesis',
               list(leaf ORDER BY k)),
               (a, v) -> substr(md5(a || v), 1, 16)) AS digest
      FROM leaves GROUP BY mon
    ), global AS (
      SELECT list_reduce(list_prepend('genesis',
               list(digest ORDER BY mon)),
               (a, v) -> substr(md5(a || v), 1, 16)) AS root
      FROM chains
    )
    SELECT strftime(c.mon, '%Y-%m') AS month, c.n, c.digest,
           g.root AS global_root
    FROM chains c CROSS JOIN global g
    ORDER BY month
    """,
)
def hash_chain_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tamper-evident hash chains over the orders ledger: per month,
    fold the key-ordered leaf digests md5(key:cents) into a chain
    (digestᵢ = md5(digestᵢ₋₁ ‖ leafᵢ)), then chain the month digests
    into a global root — any mutation, insertion, or reorder anywhere
    in history changes every downstream digest, which is the integrity
    property replication audits and regulatory exports need. Both
    engines replay the identical md5 fold, so the digests themselves
    are the cross-engine proof.

    Determinism: the chain order is (month, orderkey) — total; leaf
    material is exact integer cents.

    Scale: one chain per month partition (parallel across months),
    one 80-element fold for the root; at 10⁹ rows/month the in-month
    chain becomes a two-level chain (chunk chains → chain of chunk
    digests — same structure this op already uses across months).
    """
    o = load(spark, sf_dir, "orders")
    leaves = o.select(
        F.date_trunc("month", F.col("o_orderdate").cast("date"))
        .cast("date")
        .alias("mon"),
        F.col("o_orderkey").alias("k"),
        F.expr(
            "substr(md5(concat(CAST(o_orderkey AS STRING), ':',"
            " CAST(CAST(round(o_totalprice * 100) AS BIGINT)"
            " AS STRING))), 1, 16)"
        ).alias("leaf"),
    )
    chains = leaves.groupBy("mon").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(
            """
            aggregate(transform(array_sort(collect_list(struct(k, leaf))),
                s -> s.leaf), 'genesis',
              (a, v) -> substr(md5(concat(a, v)), 1, 16))
            """
        ).alias("digest"),
    )
    glob = chains.agg(
        F.expr(
            """
            aggregate(transform(array_sort(collect_list(struct(mon,
                digest))), s -> s.digest), 'genesis',
              (a, v) -> substr(md5(concat(a, v)), 1, 16))
            """
        ).alias("root")
    )
    return (
        chains.crossJoin(F.broadcast(glob))
        .select(
            F.date_format("mon", "yyyy-MM").alias("month"),
            "n",
            "digest",
            F.col("root").alias("global_root"),
        )
        .orderBy("month")
    )


_SS_LEAD = 2  # replenishment lead time (days)


@query(
    "ss_inventory_policy_replay",
    oracle=f"""
    WITH dem AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(round(l_quantity)) AS BIGINT) AS d
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_partkey % 7 = 0
      GROUP BY 1
    ), params AS (
      SELECT CAST(round(3.0 * sum(d) / count(*)) AS BIGINT) AS s_small,
             CAST(round(10.0 * sum(d) / count(*)) AS BIGINT) AS s_big,
             CAST(count(*) AS BIGINT) AS n_days
      FROM dem
    ), seq AS (
      SELECT p.s_small, p.s_big, p.n_days,
             list(d ORDER BY day) AS ds
      FROM dem CROSS JOIN params p
      GROUP BY p.s_small, p.s_big, p.n_days
    ), replay AS (
      SELECT s_small, s_big, n_days,
        list_reduce(
          list_prepend(CAST([s_big, 0, 0, 0, 0, 0, 0] AS BIGINT[]),
            list_transform(ds, x -> CAST([x, 0, 0, 0, 0, 0, 0]
              AS BIGINT[]))),
          (a, v) -> [
            greatest(a[1] + a[4] - v[1], 0)
              + CASE WHEN greatest(a[1] + a[4] - v[1], 0) < s_small
                     AND a[5] = 0 AND a[6] = 0
                THEN 0 ELSE 0 END,
            a[2] + CASE WHEN a[1] + a[4] < v[1] THEN 1 ELSE 0 END,
            a[3] + CASE WHEN greatest(a[1] + a[4] - v[1], 0) < s_small
                        AND a[5] = 0 AND a[6] = 0
                   THEN 1 ELSE 0 END,
            a[5],
            a[6],
            CASE WHEN greatest(a[1] + a[4] - v[1], 0) < s_small
                 AND a[5] = 0 AND a[6] = 0
              THEN s_big - greatest(a[1] + a[4] - v[1], 0) ELSE 0 END,
            a[7] + least(a[1] + a[4], v[1])
          ]) AS st
      FROM seq
    )
    SELECT n_days, s_small AS reorder_point, s_big AS order_up_to,
           st[1] AS final_on_hand,
           st[2] AS stockout_days,
           st[3] AS n_reorders,
           CAST(st[7] * 1000000 // (SELECT sum(d) FROM dem) AS BIGINT)
             AS fill_rate_ppm
    FROM replay
    """,
)
def ss_inventory_policy_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s,S) inventory policy replayed against actual daily demand for
    the slow-part family: start at S, each day receive what the two-slot
    pipeline delivers, serve demand (short days count as stockouts,
    served units accrue to the fill rate), and when on-hand drops
    below s with nothing in flight, order up to S — the closed-loop
    simulation that validates the static `safety_stock_reorder`
    formulas against realized demand. State is one flat BIGINT[]
    ([on_hand, stockout_days, n_reorders, arriving_now, pipe_1,
    pipe_2, units_served] — the 2-slot shift register is the lead
    time), folded in day order.

    Determinism: demand, thresholds, and every state transition are
    exact integer arithmetic.

    Scale: one map-side-combined groupBy(day) over the filtered fact
    join (partkey predicate pushed to the scan); the replay folds the
    bounded day dimension once — per-SKU replays are independent
    folds.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 7 == 0)
    dem = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.round("l_quantity")).cast("bigint").alias("d"))
    )
    params = dem.agg(
        F.round(3.0 * F.sum("d") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("s_small"),
        F.round(10.0 * F.sum("d") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("s_big"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("d").cast("bigint").alias("total_demand"),
    )
    seq = dem.crossJoin(F.broadcast(params)).groupBy(
        "s_small", "s_big", "n_days", "total_demand"
    ).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, d))), s -> s.d)"
        ).alias("ds")
    )
    replay = seq.select(
        "s_small",
        "s_big",
        "n_days",
        "total_demand",
        F.expr(
            """
            aggregate(ds,
              CAST(array(s_big, 0, 0, 0, 0, 0, 0) AS ARRAY<BIGINT>),
              (a, v) -> array(
                greatest(a[0] + a[3] - v, CAST(0 AS BIGINT)),
                a[1] + IF(a[0] + a[3] < v, CAST(1 AS BIGINT),
                          CAST(0 AS BIGINT)),
                a[2] + IF(greatest(a[0] + a[3] - v, CAST(0 AS BIGINT))
                          < s_small AND a[4] = 0 AND a[5] = 0,
                          CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
                a[4],
                a[5],
                IF(greatest(a[0] + a[3] - v, CAST(0 AS BIGINT)) < s_small
                   AND a[4] = 0 AND a[5] = 0,
                   s_big - greatest(a[0] + a[3] - v, CAST(0 AS BIGINT)),
                   CAST(0 AS BIGINT)),
                a[6] + least(a[0] + a[3], v)))
            """
        ).alias("st"),
    )
    return replay.select(
        "n_days",
        F.col("s_small").alias("reorder_point"),
        F.col("s_big").alias("order_up_to"),
        F.expr("st[0]").alias("final_on_hand"),
        F.expr("st[1]").alias("stockout_days"),
        F.expr("st[2]").alias("n_reorders"),
        F.expr(
            "CAST(st[6] * 1000000 div total_demand AS BIGINT)"
        ).alias("fill_rate_ppm"),
    )
