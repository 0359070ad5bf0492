"""Operational / infrastructure operators a production pipeline runs
around the analytics: telemetry debounce, conversion-delay distribution,
a watermark-choice lateness audit, Pareto-frontier (skyline) extraction,
differentially-private noisy counts with reproducible noise, rendezvous-
hash shard balancing, and per-dimension quantile normalization.

Numeric discipline unchanged: int64 first, row-local float expressions
from identical integer inputs, micro/ppm integer outputs where exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_DEBOUNCE_US = 5 * 1_000_000


@query(
    "debounce_events",
    oracle=f"""
    WITH e AS (
      SELECT event_type, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), k AS (
      SELECT event_type,
             CASE WHEN prev_ts IS NULL
                  OR ts - prev_ts > INTERVAL 5 SECOND
                  THEN 1 ELSE 0 END AS keep
      FROM e
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(keep) AS BIGINT) AS n_kept,
           CAST((count(*) - sum(keep)) * 1000000 // count(*) AS BIGINT)
             AS dropped_ppm
    FROM k GROUP BY 1 ORDER BY 1
    """,
)
def debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debounce: drop an event when the SAME user fired the SAME
    type within the last 5 seconds (double-click / retry noise), and
    report per-type kept counts and drop rate — the cleanup pass run
    before any engagement metric. Gap math is µs-exact int64, matching
    the oracle's timestamp-interval comparison.

    Scale: one shuffle on (user, type) drives the single lag window;
    the rollup is map-side combinable onto the |types| dimension.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    k = e.withColumn(
        "keep", F.when(gap.isNull() | (gap > _DEBOUNCE_US), 1).otherwise(0)
    )
    return (
        k.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("keep").cast("bigint").alias("n_kept"),
            F.expr("(count(*) - sum(keep)) * 1000000 div count(*)")
            .cast("bigint")
            .alias("dropped_ppm"),
        )
        .orderBy("event_type")
    )


@query(
    "funnel_time_to_convert",
    oracle="""
    WITH su AS (
      SELECT user_id, min(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ), pu AS (
      SELECT su.user_id, min(e.ts) AS purchase_ts
      FROM su JOIN events e
        ON e.user_id = su.user_id AND e.event_type = 'purchase'
       AND e.ts >= su.signup_ts
      GROUP BY 1
    ), d AS (
      SELECT su.user_id,
             CASE WHEN pu.purchase_ts IS NULL THEN -1
                  ELSE CAST(date_diff('microsecond', su.signup_ts,
                                      pu.purchase_ts) // 3600000000
                            AS BIGINT) END AS delay_hours
      FROM su LEFT JOIN pu ON pu.user_id = su.user_id
    )
    SELECT delay_hours, CAST(count(*) AS BIGINT) AS n_users
    FROM d GROUP BY 1 ORDER BY 1
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: hours from a user's FIRST signup to
    their first purchase at-or-after it, bucketed by whole hour
    (unconverted users in bucket -1) — the latency histogram behind
    "how long does activation take", complementing events_funnel's
    conversion counts. Delays are µs-exact integer arithmetic.

    Scale: two map-side-combinable groupBy(user) aggregates; the
    signup-anchored purchase lookup is an equi-join on user_id (the
    signup frame is |users|-sized); the histogram rollup is
    dimension-sized.
    """
    e = load(spark, sf_dir, "events")
    su = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    pu = (
        su.join(
            e.where(F.col("event_type") == "purchase").select(
                "user_id", F.col("ts").alias("pts")
            ),
            "user_id",
        )
        .where(F.col("pts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("pts").alias("purchase_ts"))
    )
    d = su.join(pu, "user_id", "left").select(
        F.when(F.col("purchase_ts").isNull(), F.lit(-1))
        .otherwise(
            F.expr(
                "(unix_micros(purchase_ts) - unix_micros(signup_ts))"
                " div 3600000000"
            )
        )
        .cast("bigint")
        .alias("delay_hours")
    )
    return (
        d.groupBy("delay_hours")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("delay_hours")
    )


_HEX = "0123456789abcdef"


def _duck_hex_fold(expr: str, nchars: int) -> str:
    """DuckDB fold of the first ``nchars`` md5 hex chars into a BIGINT —
    the repo's standard portable hash (identical to Spark's
    conv(substr(md5(x), 1, n), 16, 10))."""
    return f"""list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(generate_series(1, {nchars}),
        k -> CAST(strpos('{_HEX}', substr(md5({expr}), CAST(k AS INTEGER), 1))
                  - 1 AS BIGINT))), (acc, c) -> acc * 16 + c)"""


# lateness categories (upper bounds in seconds, -1 = on-time)
_LATE_BUCKET = """
    CASE WHEN late_us = 0 THEN 'a_on_time'
         WHEN late_us <= 60000000 THEN 'b_under_1m'
         WHEN late_us <= 600000000 THEN 'c_under_10m'
         WHEN late_us <= 3600000000 THEN 'd_under_1h'
         ELSE 'e_over_1h' END
"""


@query(
    "late_arrival_watermark_audit",
    oracle=f"""
    WITH e AS (
      SELECT event_id, ts,
             {_duck_hex_fold("CAST(event_id AS VARCHAR)", 8)} AS akey
      FROM events
    ), hw AS (
      SELECT ts,
             max(ts) OVER (ORDER BY akey, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS high_water
      FROM e
    ), lateness AS (
      SELECT CASE WHEN high_water IS NULL OR ts >= high_water THEN 0
                  ELSE date_diff('microsecond', ts, high_water) END AS late_us
      FROM hw
    )
    SELECT {_LATE_BUCKET} AS bucket,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(late_us) AS BIGINT) AS max_late_us
    FROM lateness GROUP BY 1 ORDER BY 1
    """,
)
def late_arrival_watermark_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-choice audit: measure how far behind the running
    event-time high-water mark each event ARRIVES, and bucket the
    lateness (on-time / <1m / <10m / <1h / >1h) — exactly the
    distribution that tells you what withWatermark() bound keeps 99.x%
    of events. The testdata is written in perfect event-time order, so
    arrival order is simulated as a deterministic hash permutation of
    event_id (the portable md5 fold both engines share) — a worst-case
    shuffled feed. All lateness values are µs-exact int64.

    Scale: the running max is the two-level distributed prefix pattern
    (per-arrival-bucket maxima prefixed on the bucket dimension + a
    bucket-partitioned local window) — never a single-partition global
    window over raw events; the oracle states the same computation as one
    window because DuckDB is single-node anyway.
    """
    e = load(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        F.unix_micros("ts").alias("tus"),
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("akey"),
    )
    # arrival buckets are monotone in the arrival key, so the two-level
    # prefix max composes exactly like a global (akey, event_id) order
    g = e.withColumn("bkt", F.expr("akey div 16777216"))
    bkt = g.groupBy("bkt").agg(F.max("tus").alias("bmax"))
    wb = Window.partitionBy().orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = bkt.select("bkt", F.max("bmax").over(wb).alias("prev_bmax"))
    wl = (
        Window.partitionBy("bkt")
        .orderBy("akey", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lateness = (
        g.join(F.broadcast(off), "bkt")
        .withColumn(
            "high_water",
            F.greatest(
                F.max("tus").over(wl),
                F.col("prev_bmax"),
            ),
        )
        .select(
            F.when(
                F.col("high_water").isNull()
                | (F.col("tus") >= F.col("high_water")),
                F.lit(0),
            )
            .otherwise(F.col("high_water") - F.col("tus"))
            .alias("late_us")
        )
    )
    return (
        lateness.groupBy(F.expr(_LATE_BUCKET).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("late_us").cast("bigint").alias("max_late_us"),
        )
        .orderBy("bucket")
    )


@query(
    "skyline_orders_2d",
    oracle="""
    WITH o AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS d, count(*) AS n
      FROM orders GROUP BY 1, 2
    ), v AS (
      SELECT cents, max(d) AS mx,
             CAST(sum(n) AS BIGINT) AS n_at_cents
      FROM o GROUP BY 1
    ), p AS (
      SELECT cents, mx,
             max(mx) OVER (ORDER BY cents
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pmax
      FROM v
    )
    SELECT o.cents AS cents, o.d AS orderdate, CAST(o.n AS BIGINT) AS n_orders
    FROM o JOIN p ON p.cents = o.cents
    WHERE (p.pmax IS NULL OR o.d > p.pmax) AND o.d = p.mx
    ORDER BY o.cents
    """,
)
def skyline_orders_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query: orders not dominated on
    (lower price, more recent date) — the multi-criteria shortlist
    operator relational engines lack natively. A (cents, date) point
    survives iff its date is the max at its price AND strictly beats the
    best date at any cheaper price, which reduces the O(n²) dominance
    join to one exclusive prefix-max over the sorted price dimension.

    Scale: one map-side-combinable groupBy collapses raw orders to
    distinct (price, date) points; the exclusive prefix max is the
    two-level bucketed construction (range-bucket maxima on the bucket
    dimension + a bucket-partitioned local pass) — never a single-
    partition sweep of the price dimension; the final filter is a
    broadcast join back to the point dimension.
    """
    o = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
            F.to_date("o_orderdate").alias("d"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    v = o.groupBy("cents").agg(
        F.max("d").alias("mx"), F.sum("n").cast("bigint").alias("n_at_cents")
    ).withColumn("bkt", F.expr("cents div 1000000"))
    # two-level exclusive prefix max over the price dimension: bucket
    # maxima prefixed on the bucket dim + a bucket-partitioned local pass
    bkt = v.groupBy("bkt").agg(F.max("mx").alias("bmx"))
    wb = Window.partitionBy().orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = bkt.select("bkt", F.max("bmx").over(wb).alias("pb"))
    wl = (
        Window.partitionBy("bkt")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    p = v.join(F.broadcast(off), "bkt").select(
        "cents",
        "mx",
        F.greatest(F.max("mx").over(wl), F.col("pb")).alias("pmax"),
    )
    return (
        o.join(F.broadcast(p), "cents")
        .where(
            (F.col("pmax").isNull() | (F.col("d") > F.col("pmax")))
            & (F.col("d") == F.col("mx"))
        )
        .select(
            "cents",
            F.col("d").alias("orderdate"),
            F.col("n").cast("bigint").alias("n_orders"),
        )
        .orderBy("cents")
    )


_DP_EPS = 1.0


@query(
    "dp_noisy_counts",
    oracle=f"""
    WITH g AS (
      SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n
      FROM customer GROUP BY 1
    ), u AS (
      SELECT segment, n,
             (CAST({_duck_hex_fold("segment", 13)} AS DOUBLE) + 0.5)
               / 4503599627370496 AS uu
      FROM g
    )
    SELECT segment, n,
           round(n + (-1.0 / {_DP_EPS})
                 * (CASE WHEN uu - 0.5 < 0 THEN -1.0 ELSE 1.0 END)
                 * ln(1 - 2 * abs(uu - 0.5)), 6) AS noisy_count,
           {_DP_EPS} AS epsilon
    FROM u ORDER BY segment
    """,
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (Laplace mechanism, eps=1):
    per-segment customer counts plus Laplace(1/eps) noise drawn by
    inverse-CDF from a uniform derived from the portable md5 hash of the
    segment name — the reproducible-noise variant a testable DP pipeline
    uses (seeded release; both engines derive the identical noise, so the
    release itself is value-checked). u = (hash52 + 0.5) / 2^52 is in
    (0,1) exactly.

    Scale: one map-side-combinable count; noise is a per-row expression
    on the |segments| dimension.
    """
    g = load(spark, sf_dir, "customer").groupBy(
        F.col("c_mktsegment").alias("segment")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    uu = (
        F.conv(F.substring(F.md5("segment"), 1, 13), 16, 10).cast("double")
        + 0.5
    ) / 4503599627370496
    return g.select(
        "segment",
        "n",
        F.round(
            F.col("n")
            + (-1.0 / _DP_EPS)
            * F.when(uu - 0.5 < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
            * F.log(1 - 2 * F.abs(uu - 0.5)),
            6,
        ).alias("noisy_count"),
        F.lit(_DP_EPS).alias("epsilon"),
    ).orderBy("segment")


_N_SHARDS = 8


@query(
    "rendezvous_shard_balance",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, s.s AS shard,
             {_duck_hex_fold("CAST(doc_id AS VARCHAR) || ':' || CAST(s.s AS VARCHAR)", 8)}
               AS wt
      FROM documents, (SELECT unnest(range({_N_SHARDS})) AS s) s
    ), pick AS (
      SELECT doc_id, shard FROM w
      QUALIFY row_number() OVER (PARTITION BY doc_id
                                 ORDER BY wt DESC, shard) = 1
    ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) * 1000000 // tot.n AS BIGINT) AS share_ppm
    FROM pick CROSS JOIN tot GROUP BY 1, tot.n ORDER BY 1
    """,
)
def rendezvous_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: each document
    goes to the shard with the max portable hash(doc, shard) — the
    consistent-placement scheme whose property (removing a shard only
    remaps that shard's keys) makes it the standard for distributed
    caches/stores — plus the balance report (share per shard in ppm).

    Scale: per-row map computing 8 hash weights and an argmax (no
    explode, no shuffle); the balance rollup is map-side combinable onto
    the |shards| dimension. The oracle states the same argmax via an
    unnested QUALIFY because DuckDB folds hashes more verbosely.
    """
    d = load(spark, sf_dir, "documents").select("doc_id")
    wts = [
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(str(s)))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias(f"w{s}")
        for s in range(_N_SHARDS)
    ]
    g = d.select("doc_id", *wts)
    mx = F.greatest(*[F.col(f"w{s}") for s in range(_N_SHARDS)])
    pick = F.when(F.col("w0") == mx, 0)
    for s in range(1, _N_SHARDS):
        pick = pick.when(F.col(f"w{s}") == mx, s)
    tot = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        g.select(pick.cast("bigint").alias("shard"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "n_docs",
            F.expr("n_docs * 1000000 div n").cast("bigint").alias("share_ppm"),
        )
        .orderBy("shard")
    )


@query(
    "quantile_normalize_embeddings",
    oracle="""
    WITH x AS (
      SELECT vec_id, j.j AS pos,
             CAST(round(CAST(embedding[j.j + 1] AS DOUBLE) * 10000)
                  AS BIGINT) AS v
      FROM embeddings, (SELECT unnest(range(64)) AS j) j
    ), n AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n
             FROM embeddings),
    r AS (
      SELECT vec_id, pos,
             row_number() OVER (PARTITION BY pos ORDER BY v, vec_id) AS rk
      FROM x
    )
    SELECT vec_id, CAST(pos AS BIGINT) AS pos,
           CAST((2 * rk - 1) * 1000000 // (2 * n.n) AS BIGINT) AS q_micro
    FROM r CROSS JOIN n WHERE vec_id < 4 ORDER BY vec_id, pos
    """,
)
def quantile_normalize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension quantile normalization of the embedding matrix: each
    value is replaced by its mid-rank quantile (2k-1)/(2n) within its
    dimension — the distribution-flattening transform used before
    quantile-based product quantization or rank-based similarity. Values
    are fixed-point 1e-4 ints with vec_id tiebreaks, so every rank (and
    the exact integer micro-quantile) is engine-identical. Output: the
    normalized rows for the first 4 vectors.

    Scale: posexplode then ONE shuffle partitioned by dimension (64
    partitions of n values each) for the rank window — at extreme n swap
    each dimension's rank for the two-level value-bucket cumulative
    count ks_two_sample uses. The vec_id<4 slice runs after ranking by
    necessity (ranks need every row); it bounds only the OUTPUT.
    """
    x = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.posexplode(
            F.transform(
                "embedding",
                lambda e: F.round(e.cast("double") * 10000).cast("bigint"),
            )
        ).alias("pos", "v"),
    )
    n = load(spark, sf_dir, "embeddings").agg(
        F.count_distinct("vec_id").cast("bigint").alias("n")
    )
    w = Window.partitionBy("pos").orderBy("v", "vec_id")
    r = x.withColumn("rk", F.row_number().over(w))
    return (
        r.crossJoin(F.broadcast(n))
        .where(F.col("vec_id") < 4)
        .select(
            "vec_id",
            F.col("pos").cast("bigint").alias("pos"),
            # rk is a 32-bit row_number: widen before *1e6 (overflows
            # int32 past rank ~1073, hit at sf0.1 under ANSI)
            F.expr(
                "(2 * CAST(rk AS BIGINT) - 1) * 1000000 div (2 * n)"
            )
            .cast("bigint")
            .alias("q_micro"),
        )
        .orderBy("vec_id", "pos")
    )
