"""TSDB/sketch wave 66: Gorilla timestamp compression and Morris
counting.

- `gorilla_dod_encoding_audit` — the Facebook Gorilla delta-of-delta
  timestamp encoding costed exactly over each user's event stream:
  DoD values bucket into the paper's variable-length bit classes
  ('0' bit / 9 / 12 / 16 / 36), total encoded bits against raw
  64-bit storage, with the class mix that explains the ratio — the
  time-series-storage complement of `posting_list_compression_audit`
  (doc-id deltas) and `rle_layout_audit` (sortedness).
- `morris_counter_replay` — Morris's 1978 probabilistic counter
  replayed with three independent portable-hash streams over a
  pinned 2000-event prefix: each counter increments with
  probability 2^-c, the estimate is 2^c - 1, and averaging the
  three replicas shows the variance reduction — the ancestor of
  every modern cardinality sketch, value-checked end to end.

Determinism: deltas and bit classes are exact integer algebra; the
Morris draws are exact hash ratios folded in pinned order.

Scale: Gorilla is two lag windows per user (per-key bounded) plus a
global conditional aggregate; Morris folds a bounded TakeOrdered
prefix (a sketch REPLAY is inherently sequential — production use
is the per-partition combine of many such counters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.plans.pipeline_ops import _duck_hex_fold
from iceberg_classifier_spark.sources.tables import load

_GOR_CLASS = """
    CASE WHEN dod = 0 THEN 1
         WHEN dod BETWEEN -63 AND 64 THEN 9
         WHEN dod BETWEEN -255 AND 256 THEN 12
         WHEN dod BETWEEN -2047 AND 2048 THEN 16
         ELSE 36 END
"""


@query(
    "gorilla_dod_encoding_audit",
    oracle=f"""
    WITH pts AS (
      SELECT user_id, CAST(floor(epoch_us(ts) / 1000000.0) AS BIGINT) AS t,
             event_id
      FROM events
    ), deltas AS (
      SELECT user_id, t,
             t - lag(t) OVER (PARTITION BY user_id
               ORDER BY t, event_id) AS d,
             row_number() OVER (PARTITION BY user_id
               ORDER BY t, event_id) AS rn
      FROM pts
    ), dods AS (
      SELECT user_id, rn,
             d - lag(d) OVER (PARTITION BY user_id ORDER BY rn)
               AS dod
      FROM deltas WHERE d IS NOT NULL
    ), costed AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_dod,
             CAST(sum({_GOR_CLASS}) AS BIGINT) AS dod_bits,
             CAST(sum(CASE WHEN dod = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c_zero,
             CAST(sum(CASE WHEN dod <> 0 AND dod BETWEEN -63 AND 64
                  THEN 1 ELSE 0 END) AS BIGINT) AS c_9,
             CAST(sum(CASE WHEN dod NOT BETWEEN -63 AND 64
                  AND dod BETWEEN -255 AND 256 THEN 1 ELSE 0 END)
               AS BIGINT) AS c_12,
             CAST(sum(CASE WHEN dod NOT BETWEEN -255 AND 256
                  AND dod BETWEEN -2047 AND 2048 THEN 1 ELSE 0 END)
               AS BIGINT) AS c_16,
             CAST(sum(CASE WHEN dod NOT BETWEEN -2047 AND 2048
                  THEN 1 ELSE 0 END) AS BIGINT) AS c_36
      FROM dods WHERE dod IS NOT NULL GROUP BY user_id
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(n_dod) + 2 * count(*) AS BIGINT) AS n_points,
             CAST(sum(96 + dod_bits) AS BIGINT) AS encoded_bits,
             CAST(sum((n_dod + 2) * 64) AS BIGINT) AS raw_bits,
             CAST(sum(c_zero) AS BIGINT) AS n_zero,
             CAST(sum(c_9) AS BIGINT) AS n_9bit,
             CAST(sum(c_12) AS BIGINT) AS n_12bit,
             CAST(sum(c_16) AS BIGINT) AS n_16bit,
             CAST(sum(c_36) AS BIGINT) AS n_36bit
      FROM costed
    )
    SELECT n_users, n_points, raw_bits, encoded_bits,
           round(encoded_bits * 1.0 / raw_bits, 6)
             AS compression_ratio,
           n_zero, n_9bit, n_12bit, n_16bit, n_36bit
    FROM tot
    """,
)
def gorilla_dod_encoding_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Gorilla (Pelkonen et al., VLDB'15) delta-of-delta timestamp
    compression costed exactly per user stream: second-resolution
    timestamps, DoD = delta minus previous delta, bit classes
    '0' -> 1 bit, [-63,64] -> 9, [-255,256] -> 12, [-2047,2048] ->
    16, else 36 bits; per stream a 64-bit header + 32-bit first
    delta, and the fleet-wide encoded-vs-raw ratio plus the class
    mix. Regular heartbeats land in the 1-bit class — the reason
    production TSDBs see ~12x; bursty human event streams (this
    audit's subject) land in the wide classes and show WHY the
    codec's win is workload-dependent.

    Determinism: all deltas, classes, and bit totals are exact
    int64.

    Scale: two lag windows per user (per-key bounded, ONE shuffle),
    then a map-side-combinable global aggregate — no fold, no
    driver-side state.
    """
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        F.floor(F.unix_micros("ts") / 1000000.0).cast("bigint").alias("t"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    deltas = pts.select(
        "user_id",
        (F.col("t") - F.lag("t").over(w)).alias("d"),
        F.row_number().over(w).alias("rn"),
    )
    w2 = Window.partitionBy("user_id").orderBy("rn")
    dods = deltas.where(F.col("d").isNotNull()).select(
        "user_id", (F.col("d") - F.lag("d").over(w2)).alias("dod")
    ).where(F.col("dod").isNotNull())
    bits = F.expr(_GOR_CLASS)
    costed = dods.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dod"),
        F.sum(bits).cast("bigint").alias("dod_bits"),
        F.sum(F.when(F.col("dod") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("c_zero"),
        F.sum(
            F.when(
                (F.col("dod") != 0) & F.col("dod").between(-63, 64), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("c_9"),
        F.sum(
            F.when(
                ~F.col("dod").between(-63, 64)
                & F.col("dod").between(-255, 256),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("c_12"),
        F.sum(
            F.when(
                ~F.col("dod").between(-255, 256)
                & F.col("dod").between(-2047, 2048),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("c_16"),
        F.sum(
            F.when(~F.col("dod").between(-2047, 2048), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("c_36"),
    )
    tot = costed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        (F.sum("n_dod") + 2 * F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_points"),
        F.sum(96 + F.col("dod_bits")).cast("bigint").alias("encoded_bits"),
        F.sum((F.col("n_dod") + 2) * 64).cast("bigint").alias("raw_bits"),
        F.sum("c_zero").cast("bigint").alias("n_zero"),
        F.sum("c_9").cast("bigint").alias("n_9bit"),
        F.sum("c_12").cast("bigint").alias("n_12bit"),
        F.sum("c_16").cast("bigint").alias("n_16bit"),
        F.sum("c_36").cast("bigint").alias("n_36bit"),
    )
    return tot.select(
        "n_users",
        "n_points",
        "raw_bits",
        "encoded_bits",
        F.round(F.col("encoded_bits") * 1.0 / F.col("raw_bits"), 6).alias(
            "compression_ratio"
        ),
        "n_zero",
        "n_9bit",
        "n_12bit",
        "n_16bit",
        "n_36bit",
    )


_MC_N = 2000


def _morris_step(a_fmt: str, u1: str, u2: str, u3: str) -> str:
    """Three independent Morris counters: counter i increments when
    its hash-uniform draw falls below 2^-c_i. Accumulator:
    [c1, c2, c3, n]."""
    def a(i: int) -> str:
        return a_fmt.format(i=i)

    slots = []
    for i, u in ((1, u1), (2, u2), (3, u3)):
        slots.append(
            f"{a(i)} + CASE WHEN {u} * pow(2.0, {a(i)}) < 1.0"
            f" THEN 1.0 ELSE 0.0 END"
        )
    slots.append(f"{a(4)} + 1.0")
    return ", ".join(slots)


_MC_DUCK = _morris_step("a[{i}]", "b[1]", "b[2]", "b[3]")
_MC_SPARK = _morris_step(
    "element_at(a, {i})", "element_at(x, 1)", "element_at(x, 2)",
    "element_at(x, 3)",
)


def _u_duck(salt: int) -> str:
    salted = f"'m{salt}:' || CAST(event_id AS VARCHAR)"
    fold = _duck_hex_fold(salted, 13)
    return f"(CAST({fold} AS DOUBLE) + 0.5) / 4503599627370496"


@query(
    "morris_counter_replay",
    oracle=f"""
    WITH stream AS (
      SELECT CAST(epoch_us(ts) AS DOUBLE) AS t,
             CAST(event_id AS DOUBLE) AS eid,
             {_u_duck(1)} AS u1,
             {_u_duck(2)} AS u2,
             {_u_duck(3)} AS u3
      FROM events ORDER BY ts, event_id LIMIT {_MC_N}
    ), folded AS (
      SELECT list_reduce(
               list_prepend([0.0, 0.0, 0.0, 0.0],
                 list([u1, u2, u3] ORDER BY t, eid)),
               (a, b) -> [{_MC_DUCK}]) AS acc
      FROM stream
    )
    SELECT CAST(acc[4] AS BIGINT) AS true_count,
           CAST(acc[1] AS BIGINT) AS c1,
           CAST(acc[2] AS BIGINT) AS c2,
           CAST(acc[3] AS BIGINT) AS c3,
           round((pow(2.0, acc[1]) - 1 + pow(2.0, acc[2]) - 1
                  + pow(2.0, acc[3]) - 1) / 3.0, 6) AS mean_estimate,
           round(abs((pow(2.0, acc[1]) - 1 + pow(2.0, acc[2]) - 1
                  + pow(2.0, acc[3]) - 1) / 3.0 - acc[4]) / acc[4], 6)
             AS rel_error
    FROM folded
    """,
)
def morris_counter_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morris's probabilistic counter (1978) — count to n in
    log2 log2 n bits — replayed deterministically over the first
    {_MC_N} events with THREE independent portable-hash streams:
    counter i increments when its uniform draw u < 2^-c_i, the
    estimate is 2^c - 1, and the three-replica mean shows the
    averaging that modern sketches institutionalize. The
    historical root of `hll_union_setops` / `theta_sketch_setops`,
    here with every draw reproducible so the whole trajectory is
    value-checked.

    Determinism: draws are exact hash ratios; the fold is the
    identical template over the same (ts, event_id)-pinned prefix.

    Scale: the replay folds a bounded TakeOrdered prefix (sketch
    updates are sequential BY DEFINITION; production decks run one
    counter per partition and merge, which the three replicas
    emulate).
    """
    ev = load(spark, sf_dir, "events")

    def u(salt: int) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"m{salt}:"),
                            F.col("event_id").cast("string"),
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("double")
            + 0.5
        ) / 4503599627370496

    stream = (
        ev.orderBy("ts", "event_id")
        .limit(_MC_N)
        .select(
            F.unix_micros("ts").cast("double").alias("t"),
            F.col("event_id").cast("double").alias("eid"),
            u(1).alias("u1"),
            u(2).alias("u2"),
            u(3).alias("u3"),
        )
    )
    folded = stream.agg(
        F.expr(
            "aggregate("
            " transform(array_sort(collect_list("
            "   struct(t AS t, eid AS eid, u1 AS u1, u2 AS u2,"
            "          u3 AS u3))),"
            "  q -> array(q.u1, q.u2, q.u3)),"
            " array(0D, 0D, 0D, 0D),"
            f" (a, x) -> array({_MC_SPARK}))"
        ).alias("acc")
    )
    est = (
        F.pow(2.0, F.element_at("acc", 1))
        - 1
        + F.pow(2.0, F.element_at("acc", 2))
        - 1
        + F.pow(2.0, F.element_at("acc", 3))
        - 1
    ) / 3.0
    return folded.select(
        F.element_at("acc", 4).cast("bigint").alias("true_count"),
        F.element_at("acc", 1).cast("bigint").alias("c1"),
        F.element_at("acc", 2).cast("bigint").alias("c2"),
        F.element_at("acc", 3).cast("bigint").alias("c3"),
        F.round(est, 6).alias("mean_estimate"),
        F.round(
            F.abs(est - F.element_at("acc", 4)) / F.element_at("acc", 4), 6
        ).alias("rel_error"),
    )
