"""Governance wave 2: snapshot-expiry orphan classification and
column-entropy compressibility ranking.

Expiring old table-format snapshots is the maintenance job every
lakehouse runs nightly — the hard part is classifying which data files
become deletable (referenced only by expired snapshots) versus orphans
(never committed at all, e.g. failed-write leftovers) versus live.
Column entropy ranks where dictionary/RLE encoding will pay — the
profiling input to layout decisions (rle_layout_audit measures one
layout; this ranks all columns).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_SNAPS = (1, 2, 3, 4, 5)
_RETAINED = (4, 5)  # expire 1-3, keep last two
_EXP_FILE_ROWS = 256
_N_TEMP = 10  # uncommitted write-job leftovers
_HEX = "0123456789abcdef"


def _member_sql(f: str, s: int) -> str:
    """File f is referenced by snapshot s iff its md5 digit < 13 (~81%
    — models per-snapshot rewrite churn)."""
    return (
        f"(strpos('{_HEX}', substr(md5(CAST({f} AS VARCHAR) || '#snap{s}'),"
        f" 1, 1)) - 1) < 13"
    )


def _member_spark(f: str, s: int) -> str:
    return (
        f"CAST(conv(substr(md5(CAST(concat(CAST({f} AS STRING), '#snap{s}')"
        f" AS BINARY)), 1, 1), 16, 10) AS INT) < 13"
    )


@query(
    "snapshot_expiry_orphans",
    oracle=f"""
    WITH data_files AS (
      SELECT o_orderkey // {_EXP_FILE_ROWS} AS file_id,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM orders GROUP BY 1
    ), temp_files AS (
      SELECT (SELECT max(file_id) FROM data_files) + t.i + 1 AS file_id,
             CAST(0 AS BIGINT) AS n_rows
      FROM (SELECT unnest(range(1, {_N_TEMP} + 1)) AS i) t
    ), all_files AS (
      SELECT * FROM data_files UNION ALL SELECT * FROM temp_files
    ), flags AS (
      SELECT file_id, n_rows,
             (file_id <= (SELECT max(file_id) FROM data_files))
               AND ({" OR ".join(_member_sql("file_id", s) for s in _RETAINED)})
               AS in_retained,
             (file_id <= (SELECT max(file_id) FROM data_files))
               AND ({" OR ".join(_member_sql("file_id", s) for s in _SNAPS)})
               AS in_any
      FROM all_files
    ), classed AS (
      SELECT CASE WHEN in_retained THEN 'live'
                  WHEN in_any THEN 'expirable'
                  ELSE 'orphan' END AS class,
             n_rows
      FROM flags
    )
    SELECT class, CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(n_rows) AS BIGINT) AS n_rows
    FROM classed GROUP BY 1 ORDER BY class
    """,
)
def snapshot_expiry_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-expiry file classification: against a 5-snapshot log
    (md5-derived per-snapshot file membership modeling rewrite churn,
    snapshots {_RETAINED} retained) plus {_N_TEMP} never-committed
    temp files, classify every on-disk file as live (referenced by a
    retained snapshot), expirable (referenced only by expired
    snapshots — deletable after expiry), or orphan (referenced by
    nothing — failed-write leftovers the orphan-sweep removes). This
    is `expire_snapshots` + `remove_orphan_files`, the nightly
    lakehouse maintenance pair, as exact set algebra over the manifest
    dimension.

    Scale: the audit never reads data rows — file sizes come from
    manifest row counts, membership flags are map-only expressions on
    the file dimension, and the classification is one dimension-sized
    aggregate; real table formats run this exact query over their
    manifest files.
    """
    data_files = (
        load(spark, sf_dir, "orders")
        .groupBy(F.expr(f"o_orderkey div {_EXP_FILE_ROWS}").alias("file_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
    mx = data_files.agg(F.max("file_id").alias("max_fid"))
    temp_files = (
        spark.range(1, _N_TEMP + 1)
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("max_fid") + F.col("id") + 1).alias("file_id"),
            F.lit(0).cast("bigint").alias("n_rows"),
        )
    )
    all_files = data_files.unionByName(temp_files).crossJoin(F.broadcast(mx))
    in_retained = " OR ".join(
        _member_spark("file_id", s) for s in _RETAINED
    )
    in_any = " OR ".join(_member_spark("file_id", s) for s in _SNAPS)
    flags = all_files.select(
        "file_id",
        "n_rows",
        F.expr(f"(file_id <= max_fid) AND ({in_retained})").alias(
            "in_retained"
        ),
        F.expr(f"(file_id <= max_fid) AND ({in_any})").alias("in_any"),
    )
    classed = flags.select(
        F.when(F.col("in_retained"), "live")
        .when(F.col("in_any"), "expirable")
        .otherwise("orphan")
        .alias("class"),
        "n_rows",
    )
    return (
        classed.groupBy("class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )
        .orderBy("class")
    )


# (table, column) pairs to profile
_ENT_COLS = [
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("lineitem", "l_returnflag"),
    ("lineitem", "l_linestatus"),
    ("part", "p_brand"),
    ("part", "p_type"),
    ("customer", "c_mktsegment"),
    ("events", "event_type"),
]

_ENT_ORACLE = "SELECT * FROM (\n" + "\nUNION ALL\n".join(
    f"""
    SELECT '{t}.{c}' AS column_name,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(-list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(n * ln(CAST(n AS DOUBLE) / tot) / tot ORDER BY v)),
             (a, x) -> a + x) / ln(2), 6) AS entropy_bits,
           round(-list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(n * ln(CAST(n AS DOUBLE) / tot) / tot ORDER BY v)),
             (a, x) -> a + x)
             / CASE WHEN count(*) = 1 THEN 1.0
                    ELSE ln(CAST(count(*) AS DOUBLE)) END, 6)
             AS normalized_entropy
    FROM (
      SELECT v, n, CAST(sum(n) OVER () AS DOUBLE) AS tot
      FROM (SELECT {c} AS v, CAST(count(*) AS BIGINT) AS n
            FROM {t} GROUP BY 1)
    )
    """
    for t, c in _ENT_COLS
) + "\n) ORDER BY entropy_bits, column_name"


@query("column_entropy_ranking", oracle=_ENT_ORACLE)
def column_entropy_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon-entropy ranking of categorical columns across the star
    schema: per column, the value-histogram entropy in bits and its
    normalized form H/ln|V| — the profiling statistic that predicts
    dictionary/RLE encoding benefit and sort-key candidacy (lowest
    entropy → best compression → rank first in the layout order;
    pairs with rle_layout_audit which measures one chosen layout).
    Each column's ≤|V| histogram terms sum in a value-SORTED ordered
    fold, so the entropies are bit-exact across engines.

    Scale: one map-side-combined value histogram per column (the same
    pass a stats collector runs); entropy evaluates on the value
    dimension. High-cardinality columns would cap the histogram with
    a CMS/top-k sketch and an 'other' bucket — same fold.
    """
    frames = []
    for t, c in _ENT_COLS:
        hist = (
            load(spark, sf_dir, t)
            .groupBy(F.col(c).alias("v"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        tot = hist.agg(F.sum("n").cast("double").alias("tot"))
        ent = (
            hist.crossJoin(F.broadcast(tot))
            .select(
                "v",
                "n",
                (
                    F.col("n")
                    * F.log(F.col("n").cast("double") / F.col("tot"))
                    / F.col("tot")
                ).alias("term"),
            )
            .agg(
                F.sum("n").cast("bigint").alias("n_rows"),
                F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
                F.expr(
                    """
                    aggregate(
                      transform(array_sort(collect_list(struct(v, term))),
                                x -> x.term),
                      CAST(0.0 AS DOUBLE), (a, x) -> a + x)
                    """
                ).alias("hsum"),
            )
            .select(
                F.lit(f"{t}.{c}").alias("column_name"),
                "n_rows",
                "n_distinct",
                F.round(-F.col("hsum") / math.log(2), 6).alias(
                    "entropy_bits"
                ),
                F.round(
                    -F.col("hsum")
                    / F.when(F.col("n_distinct") == 1, 1.0).otherwise(
                        F.log(F.col("n_distinct").cast("double"))
                    ),
                    6,
                ).alias("normalized_entropy"),
            )
        )
        frames.append(ent)
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.orderBy("entropy_bits", "column_name")
