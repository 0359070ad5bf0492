"""Layout wave: Hilbert-curve clustering (the Z-order upgrade).

Hilbert indexes preserve 2-D locality strictly better than Morton/Z
order (no diagonal jumps), which is why lakehouse engines added
OPTIMIZE ... HILBERT next to ZORDER. The xy2d transform is four
unrolled rounds of the standard bit recursion — shared SQL text in both
engines, exact integers throughout — and the audit reports the same
per-bucket dimension spans zorder_cluster reports, so the two layouts
are directly comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_HGRID = 16  # 16x16 grid -> 4-bit axes, Hilbert d in 0..255


def _hilbert_sql() -> str:
    """Chained-CTE unroll of xy2d: h0(xb, yb, x, y, d) -> h4 with the
    final Hilbert index d. Validated by the permutation + unit-step
    adjacency property test in tests/test_units.py."""
    out = ""
    for i, s in enumerate((8, 4, 2, 1), start=1):
        out += f""",
    h{i} AS (
      SELECT xb, yb,
             d + {s * s} * (CASE WHEN rx = 1 THEN 3 - ry ELSE ry END) AS d,
             CASE WHEN ry = 0
                  THEN (CASE WHEN rx = 1 THEN {s} - 1 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN ry = 0
                  THEN (CASE WHEN rx = 1 THEN {s} - 1 - x ELSE x END)
                  ELSE y END AS y
      FROM (
        SELECT xb, yb, d, x, y,
               CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END AS rx,
               CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END AS ry
        FROM h{i - 1}
      )
    )"""
    return out


# idiv: integer-division operator — Spark spells it `div`, DuckDB `//`
_HILBERT_AUDIT = """
    cells AS (
      SELECT DISTINCT xb, yb FROM hilbert_grid
    ), h0 AS (
      SELECT xb, yb, xb AS x, yb AS y, CAST(0 AS BIGINT) AS d FROM cells
    )HILBERT_ROUNDS,
    hd AS (SELECT xb, yb, d AS hval FROM h4),
    j AS (
      SELECT g.xb, g.yb, g.cust_off, g.day_off, g.crange, g.drange, hd.hval
      FROM hilbert_grid g JOIN hd USING (xb, yb)
    )
    SELECT CAST(hval IDIV 16 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(cust_off) AS BIGINT) AS cust_lo,
           CAST(max(cust_off) AS BIGINT) AS cust_hi,
           CAST(min(day_off) AS BIGINT) AS day_lo,
           CAST(max(day_off) AS BIGINT) AS day_hi,
           round(CAST(max(cust_off) - min(cust_off) AS DOUBLE)
                 / any_value(crange), 6) AS cust_span_frac,
           round(CAST(max(day_off) - min(day_off) AS DOUBLE)
                 / any_value(drange), 6) AS day_span_frac
    FROM j GROUP BY 1 ORDER BY bucket
"""


def _hilbert_audit(idiv: str) -> str:
    return _HILBERT_AUDIT.replace("HILBERT_ROUNDS", _hilbert_sql()).replace(
        "IDIV", idiv
    )


@query(
    "hilbert_curve_cluster",
    oracle=f"""
    WITH o AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS od FROM orders
    ), r AS (
      SELECT min(o_custkey) AS minc, max(o_custkey) AS maxc,
             min(od) AS mind, max(od) AS maxd
      FROM o
    ), hilbert_grid AS (
      SELECT o.o_custkey - r.minc AS cust_off,
             datediff('day', r.mind, o.od) AS day_off,
             (o.o_custkey - r.minc) * {_HGRID}
               // (r.maxc - r.minc + 1) AS xb,
             CAST(datediff('day', r.mind, o.od) AS BIGINT) * {_HGRID}
               // (datediff('day', r.mind, r.maxd) + 1) AS yb,
             r.maxc - r.minc AS crange,
             datediff('day', r.mind, r.maxd) AS drange
      FROM o CROSS JOIN r
    ),
    {_hilbert_audit("//")}
    """,
)
def hilbert_curve_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering of orders on (custkey, orderdate): both
    dimensions normalized to a {_HGRID}×{_HGRID} grid, the Hilbert
    index computed by four unrolled rounds of the classic xy2d bit
    recursion (validated by a permutation + unit-step-adjacency unit
    test), rows assigned to 16 Hilbert-range buckets, and per-bucket
    min/max spans reported on BOTH dimensions — zorder_cluster's exact
    audit, so the two layouts compare row-for-row. Hilbert's buckets
    stay contiguous squares (no Morton diagonal jumps), the reason
    lakehouse OPTIMIZE added it as the better data-skipping layout.
    All arithmetic is exact integers; the curve transform runs on the
    ≤{_HGRID * _HGRID}-cell dimension, never per row.

    Scale: min/max normalization is one tiny broadcast pre-aggregate;
    the per-row work is grid bucketing (map-only); the cell→Hilbert
    dimension broadcasts back into the fact join. Writing the layout is
    then repartitionByRange(hval) — identical to the Z-order path.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("od")
    )
    r = o.agg(
        F.min("o_custkey").alias("minc"),
        F.max("o_custkey").alias("maxc"),
        F.min("od").alias("mind"),
        F.max("od").alias("maxd"),
    )
    g = o.crossJoin(F.broadcast(r)).select(
        (F.col("o_custkey") - F.col("minc")).alias("cust_off"),
        F.datediff("od", "mind").alias("day_off"),
        F.expr(f"(o_custkey - minc) * {_HGRID} div (maxc - minc + 1)").alias(
            "xb"
        ),
        F.expr(
            f"CAST(datediff(od, mind) AS BIGINT) * {_HGRID}"
            " div (datediff(maxd, mind) + 1)"
        ).alias("yb"),
        (F.col("maxc") - F.col("minc")).alias("crange"),
        F.datediff("maxd", "mind").alias("drange"),
    )
    g.createOrReplaceTempView("hilbert_grid")
    return spark.sql("WITH " + _hilbert_audit("div").lstrip())
