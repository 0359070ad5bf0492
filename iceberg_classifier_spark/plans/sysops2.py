"""Systems wave 2: admission control, cache modelling, row-pattern
matching, and merge-on-read deletes.

`token_bucket_rate_limit` replays the canonical API-gateway admission
policy per user; `lru_hit_ratio_curve` computes exact LRU stack
distances per user and the hit-ratio-vs-capacity curve (the Mattson
one-pass-all-sizes result); `row_pattern_match_vshape` is a
MATCH_RECOGNIZE analogue — V-shaped (drawdown/recovery) patterns over
per-user value series via run-length islands, an operator Spark SQL
lacks natively; `position_delete_merge_on_read` reconstructs a
lakehouse table from data files + position-delete files and prices
merge-on-read against copy-on-write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_TB_CAP = 3.0  # bucket capacity (burst tokens)
_TB_REFILL_US = 86400e6  # microseconds per token refilled (1/day)


@query(
    "token_bucket_rate_limit",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS us, event_id FROM events
    ), seq AS (
      SELECT user_id,
             list_transform(
               list(struct_pack(us := us, event_id := event_id)
                    ORDER BY us, event_id),
               s -> CAST(s.us AS DOUBLE)) AS t
      FROM ev GROUP BY user_id
    ), folded AS (
      SELECT user_id, CAST(len(t) AS BIGINT) AS events,
        list_reduce(
          list_prepend(CAST([] AS DOUBLE[]),
                       list_transform(t, x -> [x])),
          (a, v) -> CASE WHEN len(a) = 0
            THEN [{_TB_CAP} - 1, v[1], 1.0, 0.0]
            ELSE CASE WHEN least({_TB_CAP},
                   a[1] + (v[1] - a[2]) / {_TB_REFILL_US}) >= 1
              THEN [least({_TB_CAP},
                      a[1] + (v[1] - a[2]) / {_TB_REFILL_US}) - 1,
                    v[1], a[3] + 1, a[4]]
              ELSE [least({_TB_CAP},
                      a[1] + (v[1] - a[2]) / {_TB_REFILL_US}),
                    v[1], a[3], a[4] + 1]
            END
          END) AS st
      FROM seq
    ), per_user AS (
      SELECT user_id, events,
             CAST(st[3] AS BIGINT) AS accepted,
             CAST(st[4] AS BIGINT) AS rejected
      FROM folded
    ), tot AS (
      SELECT CAST(sum(events) AS BIGINT) AS total_events,
             CAST(sum(rejected) AS BIGINT) AS total_rejected
      FROM per_user
    )
    SELECT p.user_id, p.events, p.accepted, p.rejected,
           CAST(p.rejected * 1000000 // p.events AS BIGINT)
             AS reject_ppm,
           t.total_events, t.total_rejected,
           CAST(t.total_rejected * 1000000 // t.total_events AS BIGINT)
             AS global_reject_ppm
    FROM per_user p CROSS JOIN tot t
    ORDER BY p.rejected DESC, p.user_id
    LIMIT 10
    """,
)
def token_bucket_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket admission control replayed per user over the
    event stream: burst capacity 3 tokens, refill 1 token/day (a
    daily-quota policy) — each
    event drains a token if one is available after elapsed-time
    refill, else is throttled. Emits the 10 most-throttled users with
    global accept/reject totals — the gateway-policy what-if every
    rate-limit rollout wants answered from history before it ships.

    Determinism: the fold runs in (ts, event_id) order; timestamps
    are exact integer microseconds represented exactly in doubles
    (< 2^53); accept/reject counters are integral.

    Scale: one shuffle groups events by user; each user's replay is
    an independent flat-DOUBLE[4] fold (state: tokens, last-ts,
    accepted, rejected); the report is a TakeOrdered top-10 over the
    per-user frame.
    """
    e = load(spark, sf_dir, "events")
    seq = (
        e.select(
            "user_id", F.expr("unix_micros(ts)").alias("us"), "event_id"
        )
        .groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(us,"
                " event_id))), s -> CAST(s.us AS DOUBLE))"
            ).alias("t")
        )
    )
    cap, refill = _TB_CAP, _TB_REFILL_US
    folded = seq.select(
        "user_id",
        F.size("t").cast("bigint").alias("events"),
        F.expr(
            f"""
            aggregate(t, CAST(array() AS ARRAY<DOUBLE>),
              (a, v) -> CASE WHEN size(a) = 0
                THEN array({cap} - 1, v, CAST(1 AS DOUBLE),
                           CAST(0 AS DOUBLE))
                ELSE CASE WHEN least({cap},
                       a[0] + (v - a[1]) / {refill}) >= 1
                  THEN array(least({cap},
                         a[0] + (v - a[1]) / {refill}) - 1,
                       v, a[2] + 1, a[3])
                  ELSE array(least({cap},
                         a[0] + (v - a[1]) / {refill}),
                       v, a[2], a[3] + 1)
                END
              END)
            """
        ).alias("st"),
    )
    per_user = folded.select(
        "user_id",
        "events",
        F.expr("CAST(st[2] AS BIGINT)").alias("accepted"),
        F.expr("CAST(st[3] AS BIGINT)").alias("rejected"),
    )
    tot = per_user.agg(
        F.sum("events").cast("bigint").alias("total_events"),
        F.sum("rejected").cast("bigint").alias("total_rejected"),
    )
    return (
        per_user.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "events",
            "accepted",
            "rejected",
            F.expr(
                "CAST(rejected * 1000000 div events AS BIGINT)"
            ).alias("reject_ppm"),
            "total_events",
            "total_rejected",
            F.expr(
                "CAST(total_rejected * 1000000 div total_events"
                " AS BIGINT)"
            ).alias("global_reject_ppm"),
        )
        .orderBy(F.desc("rejected"), "user_id")
        .limit(10)
    )


@query(
    "lru_hit_ratio_curve",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             CAST(ascii(substr(event_type, 1, 1)) AS DOUBLE) AS code,
             epoch_us(ts) AS us, event_id
      FROM events
    ), seq AS (
      SELECT user_id,
             list_transform(
               list(struct_pack(us := us, event_id := event_id,
                                code := code)
                    ORDER BY us, event_id),
               s -> s.code) AS t
      FROM ev GROUP BY user_id
    ), folded AS (
      SELECT user_id,
        list_reduce(
          list_prepend([0.0, 0.0, 0.0, 0.0, 0.0],
                       list_transform(t, x -> [x])),
          (a, v) -> list_concat(
            [a[1] + CASE WHEN list_position(
                      list_slice(a, 6, len(a)), v[1])
                    BETWEEN 1 AND 1 THEN 1.0 ELSE 0.0 END,
             a[2] + CASE WHEN list_position(
                      list_slice(a, 6, len(a)), v[1])
                    BETWEEN 1 AND 2 THEN 1.0 ELSE 0.0 END,
             a[3] + CASE WHEN list_position(
                      list_slice(a, 6, len(a)), v[1])
                    BETWEEN 1 AND 3 THEN 1.0 ELSE 0.0 END,
             a[4] + CASE WHEN list_position(
                      list_slice(a, 6, len(a)), v[1])
                    BETWEEN 1 AND 4 THEN 1.0 ELSE 0.0 END,
             a[5] + 1.0, v[1]],
            list_filter(list_slice(a, 6, len(a)),
                        x -> x != v[1]))) AS st
      FROM seq
    ), per_user AS (
      SELECT user_id,
             CAST(st[1] AS BIGINT) AS h1, CAST(st[2] AS BIGINT) AS h2,
             CAST(st[3] AS BIGINT) AS h3, CAST(st[4] AS BIGINT) AS h4,
             CAST(st[5] AS BIGINT) AS n
      FROM folded
    ), tot AS (
      SELECT CAST(sum(h1) AS BIGINT) AS h1,
             CAST(sum(h2) AS BIGINT) AS h2,
             CAST(sum(h3) AS BIGINT) AS h3,
             CAST(sum(h4) AS BIGINT) AS h4,
             CAST(sum(n) AS BIGINT) AS n
      FROM per_user
    )
    SELECT u.c AS capacity,
           t.n AS accesses,
           CASE u.c WHEN 1 THEN t.h1 WHEN 2 THEN t.h2
                    WHEN 3 THEN t.h3 ELSE t.h4 END AS hits,
           t.n - CASE u.c WHEN 1 THEN t.h1 WHEN 2 THEN t.h2
                          WHEN 3 THEN t.h3 ELSE t.h4 END AS misses,
           round(CASE u.c WHEN 1 THEN t.h1 WHEN 2 THEN t.h2
                          WHEN 3 THEN t.h3 ELSE t.h4 END
                 * 1.0 / t.n, 6) AS hit_ratio
    FROM tot t, unnest([1, 2, 3, 4]) AS u(c)
    ORDER BY capacity
    """,
)
def lru_hit_ratio_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact LRU hit-ratio-vs-capacity curve via stack distances: per
    user, one pass over the access sequence (event types as pages)
    maintains the LRU stack; the reuse distance of each access is its
    stack position, and a hit at capacity c is distance <= c — so ONE
    traversal prices EVERY cache size simultaneously (Mattson 1970),
    the way real cache-sizing studies are done. Emits the global
    curve for capacities 1-4.

    Determinism: accesses fold in (ts, event_id) order; stack codes
    and counters are small integral doubles (exact); the capacity
    indicator is exact integer comparison.

    Scale: one shuffle by user; each fold's state is 5 counters + a
    stack bounded by the page-alphabet size; the final curve is a
    4-row unnest against exact integer totals. For billion-user
    traces the per-user fold shape is unchanged.
    """
    e = load(spark, sf_dir, "events")
    seq = (
        e.select(
            "user_id",
            F.expr(
                "CAST(ascii(substr(event_type, 1, 1)) AS DOUBLE)"
            ).alias("code"),
            F.expr("unix_micros(ts)").alias("us"),
            "event_id",
        )
        .groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(us,"
                " event_id, code))), s -> s.code)"
            ).alias("t")
        )
    )
    pos = "coalesce(array_position(slice(a, 6, size(a) - 5), v), 0)"
    folded = seq.select(
        "user_id",
        F.expr(
            f"""
            aggregate(t,
              array(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                    CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                    CAST(0 AS DOUBLE)),
              (a, v) -> concat(
                array(
                  a[0] + IF({pos} BETWEEN 1 AND 1, 1.0D, 0.0D),
                  a[1] + IF({pos} BETWEEN 1 AND 2, 1.0D, 0.0D),
                  a[2] + IF({pos} BETWEEN 1 AND 3, 1.0D, 0.0D),
                  a[3] + IF({pos} BETWEEN 1 AND 4, 1.0D, 0.0D),
                  a[4] + 1.0D, v),
                filter(slice(a, 6, size(a) - 5), x -> x != v)))
            """
        ).alias("st"),
    )
    per_user = folded.select(
        "user_id",
        F.expr("CAST(st[0] AS BIGINT)").alias("h1"),
        F.expr("CAST(st[1] AS BIGINT)").alias("h2"),
        F.expr("CAST(st[2] AS BIGINT)").alias("h3"),
        F.expr("CAST(st[3] AS BIGINT)").alias("h4"),
        F.expr("CAST(st[4] AS BIGINT)").alias("n"),
    )
    tot = per_user.agg(
        F.sum("h1").cast("bigint").alias("h1"),
        F.sum("h2").cast("bigint").alias("h2"),
        F.sum("h3").cast("bigint").alias("h3"),
        F.sum("h4").cast("bigint").alias("h4"),
        F.sum("n").cast("bigint").alias("n"),
    )
    caps = spark.createDataFrame([(1,), (2,), (3,), (4,)], "c int")
    hits = (
        F.when(F.col("c") == 1, F.col("h1"))
        .when(F.col("c") == 2, F.col("h2"))
        .when(F.col("c") == 3, F.col("h3"))
        .otherwise(F.col("h4"))
    )
    return (
        caps.crossJoin(F.broadcast(tot))
        .select(
            F.col("c").alias("capacity"),
            F.col("n").alias("accesses"),
            hits.alias("hits"),
            (F.col("n") - hits).alias("misses"),
            F.round(hits * 1.0 / F.col("n"), 6).alias("hit_ratio"),
        )
        .orderBy("capacity")
    )


@query(
    "row_pattern_match_vshape",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events
    ), stepped AS (
      SELECT user_id, ts, event_id, v,
             lag(v) OVER w AS pv,
             row_number() OVER w AS rn
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), dirs AS (
      SELECT user_id, ts, rn, v, pv,
             CASE WHEN v > pv THEN 1 WHEN v < pv THEN -1 ELSE 0 END
               AS dir
      FROM stepped WHERE pv IS NOT NULL
    ), grps AS (
      SELECT *, rn - row_number() OVER
               (PARTITION BY user_id, dir ORDER BY rn) AS g
      FROM dirs
    ), runs AS (
      SELECT user_id, dir, g,
             CAST(count(*) AS BIGINT) AS steps,
             min(ts) AS start_ts,
             CAST(min(rn) AS BIGINT) AS start_rn,
             arg_min(pv, rn) AS val_from,
             arg_max(v, rn) AS val_to
      FROM grps GROUP BY user_id, dir, g
    ), ordered AS (
      SELECT *,
             lead(dir) OVER u AS next_dir,
             lead(steps) OVER u AS next_steps,
             lead(val_to) OVER u AS next_val_to,
             lead(start_rn) OVER u AS next_start_rn
      FROM runs
      WINDOW u AS (PARTITION BY user_id ORDER BY start_rn)
    )
    SELECT user_id, start_ts,
           steps AS down_steps, next_steps AS up_steps,
           round((val_from - val_to) / 100.0, 2) AS depth,
           round((next_val_to - val_to) / 100.0, 2) AS recovery
    FROM ordered
    WHERE dir = -1 AND steps >= 2
      AND next_dir = 1 AND next_steps >= 2
      AND next_start_rn = start_rn + steps
    ORDER BY depth DESC, user_id, start_ts
    LIMIT 10
    """,
)
def row_pattern_match_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE analogue (PATTERN (DOWN{2,} UP{2,})): find
    V-shaped patterns — a maximal run of >= 2 strictly-falling steps
    immediately followed by >= 2 strictly-rising steps — in each
    user's event-value series, via run-length islands (dir = sign of
    step, island = rn minus per-direction rank) and a runs-frame
    lead() join. Emits the 10 deepest Vs with their drawdown depth
    and recovery. Spark SQL has no row-pattern matching; this is the
    composition that replaces it at scale.

    Determinism: steps order by (ts, event_id); values are integer
    cents; run aggregation uses arg_min/arg_max on the exact rank.

    Scale: every window partitions by user (and the runs frame is
    ~events/run_length rows); adjacency is checked by exact rank
    arithmetic (next_start_rn = start_rn + steps), not a self-join;
    the output is a TakeOrdered top-10.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = e.select(
        "user_id",
        "ts",
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
    ).select(
        "*",
        F.lag("v").over(w).alias("pv"),
        F.row_number().over(w).alias("rn"),
    )
    dirs = stepped.filter(F.col("pv").isNotNull()).withColumn(
        "dir",
        F.when(F.col("v") > F.col("pv"), 1)
        .when(F.col("v") < F.col("pv"), -1)
        .otherwise(0),
    )
    grps = dirs.withColumn(
        "g",
        F.col("rn")
        - F.row_number().over(
            Window.partitionBy("user_id", "dir").orderBy("rn")
        ),
    )
    runs = grps.groupBy("user_id", "dir", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("steps"),
        F.min("ts").alias("start_ts"),
        F.min("rn").cast("bigint").alias("start_rn"),
        F.expr("min_by(pv, rn)").alias("val_from"),
        F.expr("max_by(v, rn)").alias("val_to"),
    )
    u = Window.partitionBy("user_id").orderBy("start_rn")
    ordered = runs.select(
        "*",
        F.lead("dir").over(u).alias("next_dir"),
        F.lead("steps").over(u).alias("next_steps"),
        F.lead("val_to").over(u).alias("next_val_to"),
        F.lead("start_rn").over(u).alias("next_start_rn"),
    )
    return (
        ordered.filter(
            (F.col("dir") == -1)
            & (F.col("steps") >= 2)
            & (F.col("next_dir") == 1)
            & (F.col("next_steps") >= 2)
            & (F.col("next_start_rn") == F.col("start_rn") + F.col("steps"))
        )
        .select(
            "user_id",
            "start_ts",
            F.col("steps").alias("down_steps"),
            F.col("next_steps").alias("up_steps"),
            F.round((F.col("val_from") - F.col("val_to")) / 100.0, 2).alias(
                "depth"
            ),
            F.round(
                (F.col("next_val_to") - F.col("val_to")) / 100.0, 2
            ).alias("recovery"),
        )
        .orderBy(F.desc("depth"), "user_id", "start_ts")
        .limit(10)
    )


@query(
    "position_delete_merge_on_read",
    oracle="""
    WITH positioned AS (
      SELECT o_orderkey,
             CAST(o_orderkey // 1000 AS BIGINT) AS file_id,
             CAST(row_number() OVER (PARTITION BY o_orderkey // 1000
                                     ORDER BY o_orderkey) - 1
               AS BIGINT) AS pos,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), deletes AS (
      SELECT file_id, pos FROM positioned WHERE o_orderkey % 13 = 0
    ), live AS (
      SELECT p.* FROM positioned p
      ANTI JOIN deletes d
        ON p.file_id = d.file_id AND p.pos = d.pos
    ), per_file AS (
      SELECT p.file_id,
             CAST(count(*) AS BIGINT) AS rows_total,
             CAST(sum(CASE WHEN p.o_orderkey % 13 = 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS rows_deleted
      FROM positioned p GROUP BY p.file_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(rows_total) AS BIGINT) AS total_rows,
           CAST(sum(rows_deleted) AS BIGINT) AS delete_records,
           CAST((SELECT count(*) FROM live) AS BIGINT) AS live_rows,
           CAST((SELECT sum(cents) FROM live) AS BIGINT)
             AS live_cents_checksum,
           CAST(sum(CASE WHEN rows_deleted > 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS files_with_deletes,
           CAST(sum(CASE WHEN rows_deleted > 0 THEN rows_total
                    ELSE 0 END) AS BIGINT) AS cow_rows_rewritten,
           CAST(sum(rows_deleted) * 1000000 // sum(rows_total)
             AS BIGINT) AS mor_write_amp_ppm,
           CAST(sum(CASE WHEN rows_deleted > 0 THEN rows_total
                    ELSE 0 END) * 1000000 // sum(rows_total)
             AS BIGINT) AS cow_write_amp_ppm
    FROM per_file
    """,
)
def position_delete_merge_on_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Merge-on-read with position deletes (the Iceberg v2 / Delta
    deletion-vector shape): orders are laid out into data files
    (1000-key ranges) with in-file row positions; a delete pass
    writes (file_id, pos) tombstones for every 13th key; the MoR
    read reconstructs the live table with one anti-join, and the
    report prices MoR (delete_records written) against CoW
    (cow_rows_rewritten — every row of every touched file),
    with a checksum over the reconstructed rows proving the read.

    Determinism: positions are rank-in-file by key; all counters and
    the checksum are exact int64.

    Scale: position assignment partitions by file (the physical
    layout at write time — no global window); the tombstone side is
    deletes-only and broadcast into the anti-join, which is exactly
    how MoR readers apply deletion vectors file-by-file.
    """
    o = load(spark, sf_dir, "orders")
    positioned = o.select(
        "o_orderkey",
        F.expr("CAST(o_orderkey div 1000 AS BIGINT)").alias("file_id"),
        (
            F.row_number().over(
                Window.partitionBy(
                    F.expr("o_orderkey div 1000")
                ).orderBy("o_orderkey")
            )
            - 1
        )
        .cast("bigint")
        .alias("pos"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    deletes = positioned.filter(F.col("o_orderkey") % 13 == 0).select(
        "file_id", "pos"
    )
    live = positioned.join(
        F.broadcast(deletes), ["file_id", "pos"], "left_anti"
    )
    per_file = positioned.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_total"),
        F.sum(F.when(F.col("o_orderkey") % 13 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("rows_deleted"),
    )
    live_tot = live.agg(
        F.count(F.lit(1)).cast("bigint").alias("live_rows"),
        F.sum("cents").cast("bigint").alias("live_cents_checksum"),
    )
    return (
        per_file.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("rows_total").cast("bigint").alias("total_rows"),
            F.sum("rows_deleted").cast("bigint").alias("delete_records"),
            F.sum(F.when(F.col("rows_deleted") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("files_with_deletes"),
            F.sum(
                F.when(F.col("rows_deleted") > 0, F.col("rows_total"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("cow_rows_rewritten"),
        )
        .crossJoin(F.broadcast(live_tot))
        .select(
            "n_files",
            "total_rows",
            "delete_records",
            "live_rows",
            "live_cents_checksum",
            "files_with_deletes",
            "cow_rows_rewritten",
            F.expr(
                "CAST(delete_records * 1000000 div total_rows AS BIGINT)"
            ).alias("mor_write_amp_ppm"),
            F.expr(
                "CAST(cow_rows_rewritten * 1000000 div total_rows"
                " AS BIGINT)"
            ).alias("cow_write_amp_ppm"),
        )
    )
