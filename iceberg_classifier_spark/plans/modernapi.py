"""Spark 4 modern-API surface: VARIANT semi-structured shredding and
query-attached Observation metrics.

VARIANT is Spark 4's open-ended semi-structured type (binary-encoded JSON
with typed path access) — the schema-on-read answer for event payloads that
evolve faster than tables. Observation attaches aggregate metrics to a node
of a running query so pipelines self-report row counts / domain stats
without a second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load


@query(
    "variant_shred_analytics",
    oracle="""
    SELECT event_type AS t, count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
           round(avg(CAST(props ->> 'k' AS BIGINT)), 6) AS avg_k,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def variant_shred_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion path: each event becomes a nested JSON document,
    is parsed to a VARIANT (``parse_json``), and typed columns are shredded
    back out with ``variant_get`` paths — then aggregated. The oracle
    aggregates the original relational columns, so the whole
    document→variant→typed-path trip must preserve every value exactly.

    Scale: VARIANT keeps the binary-encoded document columnar and prunable
    — ``variant_get`` is a JVM expression (whole-stage codegen, no UDF) and
    only the accessed paths are decoded, so schema-drifting 100 TB event
    feeds skip the brittle pre-declared-schema ETL without paying a
    row-at-a-time parse. The demo synthesizes the documents from the table
    (deterministically) because the corpus ships relational.
    """
    ev = load(spark, sf_dir, "events")
    doc = ev.select(
        F.to_json(
            F.struct(
                F.col("event_type").alias("t"),
                F.struct(
                    F.col("value").alias("v"),
                    F.col("user_id").alias("u"),
                    F.get_json_object("props", "$.k").cast("bigint").alias("k"),
                ).alias("m"),
            )
        ).alias("js")
    )
    v = doc.select(F.parse_json("js").alias("var"))
    shredded = v.select(
        F.variant_get("var", "$.t", "string").alias("t"),
        F.variant_get("var", "$.m.v", "double").alias("v"),
        F.variant_get("var", "$.m.u", "bigint").alias("u"),
        F.variant_get("var", "$.m.k", "bigint").alias("k"),
    )
    return (
        shredded.groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("v") * 100).cast("bigint")).alias("cents"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.countDistinct("u").alias("n_users"),
        )
        .orderBy("t")
    )


@query(
    "observe_pipeline_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS rows_kept,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents_total,
           min(o_custkey) AS cust_min, max(o_custkey) AS cust_max
    FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1996
    """,
)
def observe_pipeline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-attached observability: an ``Observation`` rides the filtered
    scan and reports row count, exact-cents revenue, and key bounds as a
    side effect of the SAME job — no second pass over the data. The op
    returns the observed metrics as a one-row DataFrame; the oracle
    recomputes them relationally, so the instrumented numbers must equal
    the ground truth.

    Scale: at 100 TB a monitoring re-scan doubles the bill — ``observe``
    accumulates per-task partial aggregates inside the running stages
    (commutative metrics only, no distinct), which is exactly the shape of
    production data-quality gates (row counts, checksum totals, domain
    bounds) on every pipeline run.
    """
    # Run the observed job on a cloned session (shared SparkContext, own
    # state). Spark 4's SparkSession.observationManager is a LAZY val that
    # this op would otherwise initialize on the caller's session — it is
    # not java-serializable, and once initialized it breaks closure
    # serialization for any later MLlib model.transform whose captured
    # trainingSummary references the session (observe → logreg.transform
    # in one session throws NotSerializableException: ObservationManager).
    # Isolating the Observation on a throwaway clone keeps the caller's
    # session clean; the clone costs no JVM/executor startup.
    obs_spark = spark.newSession()
    obs = Observation("orders_1996_metrics")
    o = (
        load(obs_spark, sf_dir, "orders")
        .where(F.year(F.to_date("o_orderdate")) == 1996)
        .observe(
            obs,
            F.count(F.lit(1)).alias("rows_kept"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "cents_total"
            ),
            F.min("o_custkey").alias("cust_min"),
            F.max("o_custkey").alias("cust_max"),
        )
    )
    o.count()  # one action drives the scan; metrics arrive as a side effect
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["rows_kept"]),
                int(m["cents_total"]),
                int(m["cust_min"]),
                int(m["cust_max"]),
            )
        ],
        "rows_kept bigint, cents_total bigint, cust_min bigint, cust_max bigint",
    )


@query(
    "hll_union_setops",
    oracle="""
    WITH pr AS (
      SELECT DISTINCT o_orderpriority AS p, o_custkey AS k FROM orders
    ), n AS (
      SELECT p, count(*) AS exact_n FROM pr GROUP BY 1
    ), inter AS (
      SELECT x.p AS pa, y.p AS pb, count(*) AS exact_inter
      FROM pr x JOIN pr y ON x.k = y.k AND x.p < y.p
      GROUP BY 1, 2
    )
    SELECT a.p AS pa, b.p AS pb,
           CAST(a.exact_n AS BIGINT) AS exact_a,
           CAST(b.exact_n AS BIGINT) AS exact_b,
           CAST(a.exact_n + b.exact_n - coalesce(i.exact_inter, 0) AS BIGINT)
             AS exact_union,
           TRUE AS union_within_5pct
    FROM n a JOIN n b ON a.p < b.p
    LEFT JOIN inter i ON i.pa = a.p AND i.pb = b.p
    ORDER BY pa, pb
    """,
)
def hll_union_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-cardinality algebra on Spark's built-in Datasketches HLL
    surface: one ``hll_sketch_agg`` sketch per order priority, pairwise
    ``hll_union`` + ``hll_sketch_estimate``, validated in-query against
    the exact inclusion-exclusion union — the output carries the exact
    cardinalities plus a flag asserting every union estimate landed
    within 5% (lgConfigK=12 → rsd ≈1.6%; a breach means the union merge
    is broken). The oracle recomputes the exact side and expects the flag
    TRUE, so the sketch's accuracy contract is value-checked even though
    the binary registers are engine-specific. The portable-hash theta op
    (`theta_sketch_setops`) carries the full bit-exact cross-engine
    oracle; this is the production path — a binary, mergeable,
    persistable sketch.

    Scale: sketches are fixed-size (lgConfigK=12 → 4 KB) and merge
    associatively, so distinct-users-per-segment over 100 TB is one
    map-side-combined pass, and cross-segment unions cost microseconds on
    stored sketches instead of re-scanning raw keys. (HLL has no
    intersection operator — inclusion-exclusion on union estimates is the
    standard workaround, shown here.)
    """
    o = load(spark, sf_dir, "orders")
    sk = o.groupBy(F.col("o_orderpriority").alias("p")).agg(
        F.hll_sketch_agg("o_custkey", F.lit(12)).alias("sk"),
        F.countDistinct("o_custkey").alias("exact_n"),
    )
    a, b = sk.alias("a"), sk.alias("b")
    pairs = a.join(F.broadcast(b), F.col("a.p") < F.col("b.p"))
    est_union = F.hll_sketch_estimate(F.hll_union("a.sk", "b.sk"))
    dua = o.select(F.col("o_orderpriority").alias("p"), F.col("o_custkey").alias("k")).distinct()
    exu = (
        dua.alias("x")
        .join(dua.alias("y"), F.col("x.k") == F.col("y.k"))
        .where(F.col("x.p") < F.col("y.p"))
        .groupBy(F.col("x.p").alias("pa"), F.col("y.p").alias("pb"))
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    exact_union = (
        F.col("exact_a") + F.col("exact_b") - F.coalesce("exact_inter", F.lit(0))
    )
    return (
        pairs.select(
            F.col("a.p").alias("pa"),
            F.col("b.p").alias("pb"),
            est_union.alias("est_union"),
            F.col("a.exact_n").alias("exact_a"),
            F.col("b.exact_n").alias("exact_b"),
        )
        .join(exu, ["pa", "pb"], "left")
        .select(
            "pa",
            "pb",
            "exact_a",
            "exact_b",
            exact_union.cast("bigint").alias("exact_union"),
            (
                F.abs(F.col("est_union") - exact_union) <= 0.05 * exact_union
            ).alias("union_within_5pct"),
        )
        .orderBy("pa", "pb")
    )


@query(
    "melt_unpivot_metrics",
    oracle="""
    WITH wide AS (
      SELECT n.n_name AS nation,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum,
             CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents_max
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n ON n.n_nationkey = c_nationkey
      GROUP BY 1
    )
    SELECT nation, metric, value
    FROM (UNPIVOT wide ON n_orders, cents_sum, cents_max
          INTO NAME metric VALUE value)
    ORDER BY nation, metric
    """,
)
def melt_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape through the native DataFrame.unpivot (melt)
    API — Spark 3.4+'s built-in inverse of pivot: per-nation order metrics
    (count, cents sum, cents max) unpivoted to (nation, metric, value)
    rows, the shape metric stores and plotting layers ingest.

    Scale: the wide frame is one broadcast-dim star join + combinable agg
    on the nation dimension; unpivot itself is a zero-shuffle Expand (each
    input row emits |metrics| rows map-side).
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    cents = "CAST(round(o_totalprice * 100) AS BIGINT)"
    wide = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.expr(cents)).cast("bigint").alias("cents_sum"),
            F.max(F.expr(cents)).cast("bigint").alias("cents_max"),
        )
    )
    return wide.unpivot(
        ids=["nation"],
        values=["n_orders", "cents_sum", "cents_max"],
        variableColumnName="metric",
        valueColumnName="value",
    ).orderBy("nation", "metric")
