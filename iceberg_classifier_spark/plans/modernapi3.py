"""Modern-API wave 3: Spark 4 SQL scripting (procedural BEGIN/END) and
the Arrow-native mapInArrow batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_BISECT_ITERS = 8
_BISECT_HI = 60_000_000  # cents upper bound for the order-value search


@query(
    "sql_scripting_bisection",
    oracle=f"""
    WITH RECURSIVE o AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    ), n AS (SELECT count(*) AS n FROM o),
    s(i, lo, hi) AS (
      SELECT 0, CAST(0 AS BIGINT), CAST({_BISECT_HI} AS BIGINT)
      UNION ALL
      SELECT i + 1,
        CASE WHEN (SELECT count(*) FROM o WHERE cents <= (lo + hi) // 2) * 2
                  >= (SELECT n FROM n)
             THEN lo ELSE (lo + hi) // 2 END,
        CASE WHEN (SELECT count(*) FROM o WHERE cents <= (lo + hi) // 2) * 2
                  >= (SELECT n FROM n)
             THEN (lo + hi) // 2 ELSE hi END
      FROM s WHERE i < {_BISECT_ITERS}
    )
    SELECT hi AS median_upper_cents, lo AS lower_cents,
           (SELECT n FROM n) AS n_orders,
           (SELECT count(*) FROM o WHERE cents <= s.hi) AS n_below
    FROM s WHERE i = {_BISECT_ITERS}
    """,
)
def sql_scripting_bisection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL scripting (procedural BEGIN…END with DECLARE / WHILE /
    IF / scalar-subquery SET): an {_BISECT_ITERS}-step bisection narrows
    the median order value to a cents bracket — each iteration issues one
    aggregate query and branches on the result, the control-flow shape
    (iterate-until-converged driven by data) that previously needed
    driver-side Python. The DuckDB oracle replays the identical walk as a
    recursive CTE, so the bracket, counts, and iteration arithmetic are
    bit-exact.

    Scale: each loop step is one pushed-down count(*) scan (at 100 TB the
    histogram would be pre-aggregated once and bisected driver-side, cf.
    two_pass_median — this op is about the scripting surface, and its
    per-step query IS the right distributed plan).
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("script_orders")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(f"""
    BEGIN
      DECLARE lo BIGINT DEFAULT 0;
      DECLARE hi BIGINT DEFAULT {_BISECT_HI};
      DECLARE mid BIGINT DEFAULT 0;
      DECLARE i INT DEFAULT 0;
      DECLARE below BIGINT DEFAULT 0;
      DECLARE n BIGINT DEFAULT 0;
      SET n = (SELECT count(*) FROM script_orders);
      WHILE i < {_BISECT_ITERS} DO
        SET mid = (lo + hi) DIV 2;
        SET below = (SELECT count(*) FROM script_orders
                     WHERE CAST(round(o_totalprice * 100) AS BIGINT) <= mid);
        IF below * 2 >= n THEN
          SET hi = mid;
        ELSE
          SET lo = mid;
        END IF;
        SET i = i + 1;
      END WHILE;
      SELECT hi AS median_upper_cents, lo AS lower_cents, n AS n_orders,
             (SELECT count(*) FROM script_orders
              WHERE CAST(round(o_totalprice * 100) AS BIGINT) <= hi)
               AS n_below;
    END
    """)


@query(
    "arrow_native_doc_stats",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(text) - length(replace(text, 'a', '')) AS BIGINT)
             AS n_a
    FROM documents ORDER BY doc_id
    """,
)
def arrow_native_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native batch processing via ``mapInArrow``: per-document
    stats computed entirely with pyarrow.compute kernels on RecordBatches
    — no pandas materialization at all, the zero-copy sibling of
    mapInPandas for kernels that stay columnar (utf8_length /
    split_pattern list lengths / substring counts here; in production,
    Arrow-native tokenizers and codecs).

    Scale: per-batch columnar compute, no shuffle; compared to
    mapInPandas this skips the Arrow→pandas→Arrow conversion entirely,
    which matters when the kernel is cheap relative to conversion cost.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    d = load(spark, sf_dir, "documents").select("doc_id", "text")

    def stats(batches):
        for b in batches:
            text = b.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(
                        pc.list_value_length(pc.split_pattern(text, " ")),
                        pa.int64(),
                    ),
                    pc.cast(pc.count_substring(text, "a"), pa.int64()),
                ],
                ["doc_id", "n_chars", "n_tokens", "n_a"],
            )

    return d.mapInArrow(
        stats, "doc_id long, n_chars long, n_tokens long, n_a long"
    ).orderBy("doc_id")


@query(
    "sql_udf_revenue_report",
    oracle="""
    WITH buckets AS (SELECT unnest(generate_series(0, 4)) AS qty_bucket),
    l AS (
      SELECT least(CAST(l_quantity AS BIGINT) // 10, 4) AS qty_bucket,
             l_extendedprice * (1 - l_discount) AS rev,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
      FROM lineitem
    )
    SELECT b.qty_bucket,
           CAST(count(l.rev) AS BIGINT) AS n_items,
           round(coalesce(sum(l.rev), 0), 2) AS revenue,
           CAST(coalesce(sum(l.ret), 0) AS BIGINT) AS n_returned
    FROM buckets b LEFT JOIN l USING (qty_bucket)
    GROUP BY 1 ORDER BY 1
    """,
)
def sql_udf_revenue_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language UDFs (Spark 4: CREATE FUNCTION ... RETURN <expr> /
    RETURN TABLE) driving a revenue report: a scalar SQL UDF computes the
    discounted price and a table-valued SQL UDF generates the
    quantity-bucket dimension the report left-joins against. Both are
    declarative SQL bodies — Catalyst INLINES them into the calling plan
    (no Python boundary, full codegen/pushdown), which is exactly why SQL
    UDFs are the right tool for shared business logic at 100 TB where a
    Python UDF would serialize every row.

    Scale: after inlining, the plan is a plain scan + map-side-combined
    agg joined to a 5-row generated dimension — identical to hand-written
    SQL.
    """
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_sqludf_v"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)"
        " RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION qty_buckets(n INT)"
        " RETURNS TABLE(qty_bucket BIGINT)"
        " RETURN SELECT explode(sequence(0, n - 1))"
    )
    return spark.sql(
        """
        WITH l AS (
          SELECT least(CAST(l_quantity AS BIGINT) div 10, 4) AS qty_bucket,
                 disc_price(l_extendedprice, l_discount) AS rev,
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
          FROM lineitem_sqludf_v
        )
        SELECT b.qty_bucket,
               CAST(count(l.rev) AS BIGINT) AS n_items,
               round(coalesce(sum(l.rev), 0), 2) AS revenue,
               CAST(coalesce(sum(l.ret), 0) AS BIGINT) AS n_returned
        FROM qty_buckets(5) b LEFT JOIN l USING (qty_bucket)
        GROUP BY 1 ORDER BY 1
        """
    )
