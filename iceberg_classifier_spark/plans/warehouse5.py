"""Warehouse wave 5: transaction-layer accounting — OCC conflict
detection and CoW-vs-MoR write amplification.

These are the table-format mechanics under every lakehouse MERGE:
optimistic concurrency checks whether two concurrent commits touched
the same files (Delta/Iceberg validation), and the CoW/MoR choice
trades write amplification against read amplification. Both are exact
integer accounting over file-granularity metadata — the part of the
transaction layer that IS a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_OCC_FILE_ROWS = 256  # rows per file in the orderkey-range layout
# committed first: compaction rewriting files 0-9; then two updaters
_OCC_COMPACT_HI = 9
_OCC_UPD_FAR = (20, 29)  # range-localized update, no overlap
_OCC_UPD_NEAR = (5, 14)  # overlaps the compaction's files 5-9


@query(
    "occ_conflict_detection",
    oracle=f"""
    WITH files AS (
      SELECT o_orderkey, o_orderkey // {_OCC_FILE_ROWS} AS file_id
      FROM orders
    ), t AS (
      SELECT 'txn1_compact_0_9' AS txn, file_id,
             0 <= 1 AS committed_first
      FROM files WHERE file_id <= {_OCC_COMPACT_HI}
      UNION ALL
      SELECT 'txn2_update_far', file_id, 1 <= 0
      FROM files
      WHERE file_id BETWEEN {_OCC_UPD_FAR[0]} AND {_OCC_UPD_FAR[1]}
      UNION ALL
      SELECT 'txn3_update_near', file_id, 1 <= 0
      FROM files
      WHERE file_id BETWEEN {_OCC_UPD_NEAR[0]} AND {_OCC_UPD_NEAR[1]}
    ), per AS (
      SELECT txn, CAST(count(*) AS BIGINT) AS n_keys,
             CAST(count(DISTINCT file_id) AS BIGINT) AS n_files,
             CAST(count(DISTINCT CASE WHEN file_id <= {_OCC_COMPACT_HI}
                                      THEN file_id END) AS BIGINT)
               AS shared_with_committed,
             bool_or(committed_first) AS committed_first
      FROM t GROUP BY 1
    )
    SELECT txn, n_keys, n_files, shared_with_committed,
           (NOT committed_first AND shared_with_committed > 0)
             AS must_retry
    FROM per ORDER BY txn
    """,
)
def occ_conflict_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimistic-concurrency commit validation at file granularity —
    the classic compaction-vs-writer race: a compaction that rewrote
    files 0-{_OCC_COMPACT_HI} commits first; a range-localized update
    of files {_OCC_UPD_FAR[0]}-{_OCC_UPD_FAR[1]} validates cleanly
    (no shared files — commits), while one touching files
    {_OCC_UPD_NEAR[0]}-{_OCC_UPD_NEAR[1]} overlaps the rewritten set
    and must retry — the Delta/Iceberg conflict rule, exercised so BOTH
    verdicts appear. File sets are exact DISTINCT projections over a
    {_OCC_FILE_ROWS}-rows-per-file range layout; the verdict is an
    exact intersection count against the committed snapshot.

    Scale: validation reads manifests, never data — touched-file sets
    are metadata-dimension DISTINCT aggregates and the overlap test is
    a dimension join; this is why OCC stays cheap on petabyte tables.
    """
    files = load(spark, sf_dir, "orders").select(
        F.expr(f"o_orderkey div {_OCC_FILE_ROWS}").alias("file_id")
    )
    t1 = files.where(F.col("file_id") <= _OCC_COMPACT_HI).select(
        F.lit("txn1_compact_0_9").alias("txn"),
        "file_id",
        F.lit(True).alias("committed_first"),
    )
    t2 = files.where(
        F.col("file_id").between(*_OCC_UPD_FAR)
    ).select(
        F.lit("txn2_update_far").alias("txn"),
        "file_id",
        F.lit(False).alias("committed_first"),
    )
    t3 = files.where(
        F.col("file_id").between(*_OCC_UPD_NEAR)
    ).select(
        F.lit("txn3_update_near").alias("txn"),
        "file_id",
        F.lit(False).alias("committed_first"),
    )
    t = t1.unionByName(t2).unionByName(t3)
    per = t.groupBy("txn").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.count_distinct("file_id").cast("bigint").alias("n_files"),
        F.count_distinct(
            F.when(F.col("file_id") <= _OCC_COMPACT_HI, F.col("file_id"))
        )
        .cast("bigint")
        .alias("shared_with_committed"),
        F.bool_or("committed_first").alias("committed_first"),
    )
    return per.select(
        "txn",
        "n_keys",
        "n_files",
        "shared_with_committed",
        (~F.col("committed_first") & (F.col("shared_with_committed") > 0)).alias(
            "must_retry"
        ),
    ).orderBy("txn")


_MOR_FILE_ROWS = 256  # rows per data file (orderkey-range layout)


@query(
    "cow_vs_mor_write_amplification",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderkey // {_MOR_FILE_ROWS} AS file_id,
             o_orderstatus, CAST(day(o_orderdate) AS BIGINT) AS d
      FROM orders
    ), fsz AS (
      SELECT file_id, CAST(count(*) AS BIGINT) AS rows_in_file
      FROM base GROUP BY 1
    ), upd AS (
      SELECT o_orderkey, file_id FROM base
      WHERE o_orderstatus = 'O' AND d > 25
    ), updn AS (
      SELECT CAST(count(*) AS BIGINT) AS n_updated,
             CAST(count(DISTINCT file_id) AS BIGINT) AS n_files_touched
      FROM upd
    ), cow AS (
      SELECT CAST(sum(f.rows_in_file) AS BIGINT) AS rows_written
      FROM fsz f
      WHERE f.file_id IN (SELECT DISTINCT file_id FROM upd)
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_base,
             CAST(count(DISTINCT file_id) AS BIGINT) AS n_base_files
      FROM base
    )
    SELECT * FROM (
      SELECT 'copy_on_write' AS strategy,
             u.n_updated, u.n_files_touched,
             c.rows_written,
             CAST(c.rows_written * 100 // u.n_updated AS BIGINT)
               AS write_amp_x100,
             t.n_base AS read_rows_per_scan
      FROM updn u CROSS JOIN cow c CROSS JOIN tot t
      UNION ALL
      SELECT 'merge_on_read',
             u.n_updated, u.n_files_touched,
             u.n_updated,
             CAST(100 AS BIGINT),
             t.n_base + u.n_updated
      FROM updn u CROSS JOIN tot t
    ) ORDER BY strategy
    """,
)
def cow_vs_mor_write_amplification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Copy-on-write vs merge-on-read accounting for one upsert batch
    (late open orders) against a {_MOR_FILE_ROWS}-rows-per-file layout:
    CoW rewrites EVERY row of every touched file (rows_written /
    n_updated = the write amplification, exact ×100), MoR writes only
    the deltas (amplification 1.00) but every subsequent scan must
    merge base + delta rows (read_rows_per_scan) — the exact tradeoff
    table-format tuning guides quantify, here as an exact-integer query
    over the same metadata a real engine keeps in manifests.

    Scale: file sizes and touched sets are metadata aggregates
    (map-side combinable, file-granularity row counts); the CoW rewrite
    cost is a semi-join of the file-size dimension against touched
    files. Nothing touches data rows except the one base count —
    which a real format reads from manifest statistics too.
    """
    base = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(f"o_orderkey div {_MOR_FILE_ROWS}").alias("file_id"),
        "o_orderstatus",
        F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
    )
    fsz = base.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_in_file")
    )
    upd = base.where((F.col("o_orderstatus") == "O") & (F.col("d") > 25))
    updn = upd.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_updated"),
        F.count_distinct("file_id").cast("bigint").alias("n_files_touched"),
    )
    cow = (
        fsz.join(upd.select("file_id").distinct(), "file_id", "left_semi")
        .agg(F.sum("rows_in_file").cast("bigint").alias("rows_written"))
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_base"),
        F.count_distinct("file_id").cast("bigint").alias("n_base_files"),
    )
    r1 = (
        updn.crossJoin(F.broadcast(cow))
        .crossJoin(F.broadcast(tot))
        .select(
            F.lit("copy_on_write").alias("strategy"),
            "n_updated",
            "n_files_touched",
            "rows_written",
            F.expr("CAST(rows_written * 100 div n_updated AS BIGINT)").alias(
                "write_amp_x100"
            ),
            F.col("n_base").alias("read_rows_per_scan"),
        )
    )
    r2 = updn.crossJoin(F.broadcast(tot)).select(
        F.lit("merge_on_read").alias("strategy"),
        "n_updated",
        "n_files_touched",
        F.col("n_updated").alias("rows_written"),
        F.lit(100).cast("bigint").alias("write_amp_x100"),
        (F.col("n_base") + F.col("n_updated")).alias("read_rows_per_scan"),
    )
    return r1.unionByName(r2).orderBy("strategy")
