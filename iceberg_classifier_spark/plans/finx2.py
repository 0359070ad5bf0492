"""Finance wave 69: IRR root-finding and bond-math risk measures.

- `irr_bisection` — the internal rate of return of a project paying
  half of 1995's revenue upfront to receive 1996's monthly revenue
  stream, solved by 24 bisection rounds run AS QUERY STAGES (each
  round one NPV aggregation over the 12-flow frame at the interval
  midpoint) — the root-finding pattern `sql_scripting_bisection`
  uses for medians, applied to the finance primitive every
  valuation needs.
- `duration_convexity_cashflow` — Macaulay/modified duration and
  convexity of the 24-month revenue stream at a fixed 1%/month
  discount rate: the first- and second-order interest-rate
  sensitivities, plus the duration-predicted vs exact repricing for
  a 50bp shock (the convexity correction made visible).

Determinism: monthly flows are exact int64; every NPV/duration term
is an identical closed form; bisection intervals halve identically
both engines.

Scale: ONE fact pass to the bounded month frame; each bisection
round is one 12-row aggregation (Spark truncates per-round lineage
with eager localCheckpoint — the iterative pattern); duration is a
single pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_IRR_ITERS = 24


def _irr_oracle() -> str:
    head = """
    WITH flows AS MATERIALIZED (
      SELECT CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
             sum(CAST(round(o_totalprice) AS BIGINT)) / 1000000.0
               AS cf
      FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1996
      GROUP BY 1
    ), outlay AS MATERIALIZED (
      SELECT sum(CAST(round(o_totalprice) AS BIGINT)) / 2000000.0
        AS c0
      FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995
    ), b0 AS MATERIALIZED (SELECT 0.0 AS lo, 1.0 AS hi)"""
    steps = []
    for k in range(1, _IRR_ITERS + 1):
        p = k - 1
        steps.append(f"""
    , n{k} AS MATERIALIZED (
      SELECT (SELECT (lo + hi) / 2 FROM b{p}) AS mid,
             (SELECT sum(cf / pow(1 + (SELECT (lo + hi) / 2
                FROM b{p}), t)) FROM flows)
             - (SELECT c0 FROM outlay) AS npv
    ), b{k} AS MATERIALIZED (
      SELECT CASE WHEN n.npv > 0 THEN n.mid ELSE p.lo END AS lo,
             CASE WHEN n.npv > 0 THEN p.hi ELSE n.mid END AS hi
      FROM b{p} p CROSS JOIN n{k} n
    )""")
    last = _IRR_ITERS
    return head + "".join(steps) + f"""
    SELECT round((b.lo + b.hi) / 2, 6) AS irr_monthly,
           round(pow(1 + (b.lo + b.hi) / 2, 12) - 1, 6)
             AS irr_annualized,
           round((SELECT sum(cf) FROM flows)
                 - (SELECT c0 FROM outlay), 6) AS undiscounted_gain_m,
           CAST({_IRR_ITERS} AS BIGINT) AS n_iterations,
           round(b.hi - b.lo, 9) AS bracket_width
    FROM b{last} b
    """


@query("irr_bisection", oracle=_irr_oracle())
def irr_bisection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Internal rate of return of buying 1996's monthly revenue
    stream ($M) for half of 1995's total: {_IRR_ITERS} bisection
    rounds on the monthly rate in [0, 1], each round ONE NPV
    aggregation over the 12-flow frame at the interval midpoint
    (NPV is monotone decreasing in the rate for this sign pattern,
    so bisection is guaranteed). Emits the monthly and annualized
    IRR and the final bracket width (2^-{_IRR_ITERS} ~ 6e-8 — the
    convergence certificate). The root-finding finance primitive
    missing between `sharpe_sortino_daily` (returns) and
    `revenue_recognition_waterfall` (schedules).

    Determinism: flows are exact integer dollars scaled to $M; each
    bisection step halves the identical interval on both engines
    (the branch compares identically-derived doubles).

    Scale: TWO filtered fact passes (year predicates at the scan)
    to 12+1 bounded rows; each of the {_IRR_ITERS} rounds is one
    12-row aggregation — Spark truncates round lineage with eager
    localCheckpoint (the iterative pattern).
    """
    o = load(spark, sf_dir, "orders")
    flows = (
        o.where(F.year(F.col("o_orderdate").cast("date")) == 1996)
        .groupBy(
            F.month(F.col("o_orderdate").cast("date"))
            .cast("bigint")
            .alias("t")
        )
        .agg(
            (
                F.sum(F.round(F.col("o_totalprice")).cast("bigint"))
                / 1000000.0
            ).alias("cf")
        )
        .localCheckpoint(eager=True)
    )
    outlay = (
        o.where(F.year(F.col("o_orderdate").cast("date")) == 1995)
        .agg(
            (
                F.sum(F.round(F.col("o_totalprice")).cast("bigint"))
                / 2000000.0
            ).alias("c0")
        )
        .localCheckpoint(eager=True)
    )
    bounds = spark.range(1).select(
        F.lit(0.0).alias("lo"), F.lit(1.0).alias("hi")
    )
    for _ in range(_IRR_ITERS):
        npv = (
            flows.crossJoin(F.broadcast(bounds))
            .crossJoin(F.broadcast(outlay))
            .agg(
                (
                    F.sum(
                        F.col("cf")
                        / F.pow(
                            1 + (F.col("lo") + F.col("hi")) / 2, F.col("t")
                        )
                    )
                    - F.max("c0")
                ).alias("npv"),
                F.max((F.col("lo") + F.col("hi")) / 2).alias("mid"),
            )
        )
        bounds = (
            bounds.crossJoin(F.broadcast(npv))
            .select(
                F.when(F.col("npv") > 0, F.col("mid"))
                .otherwise(F.col("lo"))
                .alias("lo"),
                F.when(F.col("npv") > 0, F.col("hi"))
                .otherwise(F.col("mid"))
                .alias("hi"),
            )
            .localCheckpoint(eager=True)
        )
    gain = flows.agg(F.sum("cf").alias("sumcf")).crossJoin(
        F.broadcast(outlay)
    )
    return bounds.crossJoin(F.broadcast(gain)).select(
        F.round((F.col("lo") + F.col("hi")) / 2, 6).alias("irr_monthly"),
        F.round(
            F.pow(1 + (F.col("lo") + F.col("hi")) / 2, 12) - 1, 6
        ).alias("irr_annualized"),
        F.round(F.col("sumcf") - F.col("c0"), 6).alias(
            "undiscounted_gain_m"
        ),
        F.lit(_IRR_ITERS).cast("bigint").alias("n_iterations"),
        F.round(F.col("hi") - F.col("lo"), 9).alias("bracket_width"),
    )


_DC_RATE = 0.01  # monthly discount rate
_DC_SHOCK = 0.005  # 50bp parallel shock


@query(
    "duration_convexity_cashflow",
    oracle=f"""
    WITH flows AS (
      SELECT (year(CAST(o_orderdate AS DATE)) - 1995) * 12
               + month(CAST(o_orderdate AS DATE)) AS t,
             sum(CAST(round(o_totalprice) AS BIGINT)) / 1000000.0
               AS cf
      FROM orders
      WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)
      GROUP BY 1
    ), mom AS (
      SELECT sum(cf / pow(1 + {_DC_RATE}, t)) AS pv,
             sum(t * cf / pow(1 + {_DC_RATE}, t)) AS tpv,
             sum(t * (t + 1) * cf / pow(1 + {_DC_RATE}, t)) AS ttpv,
             sum(cf / pow(1 + {_DC_RATE} + {_DC_SHOCK}, t))
               AS pv_shocked
      FROM flows
    )
    SELECT round(pv, 6) AS pv_m,
           round(tpv / pv, 6) AS macaulay_duration_months,
           round(tpv / pv / (1 + {_DC_RATE}), 6)
             AS modified_duration_months,
           round(ttpv / (pv * pow(1 + {_DC_RATE}, 2)), 6)
             AS convexity,
           round(pv_shocked / pv - 1, 6) AS exact_repricing,
           round(-(tpv / pv / (1 + {_DC_RATE})) * {_DC_SHOCK}, 6)
             AS duration_approx,
           round(-(tpv / pv / (1 + {_DC_RATE})) * {_DC_SHOCK}
                 + 0.5 * (ttpv / (pv * pow(1 + {_DC_RATE}, 2)))
                   * {_DC_SHOCK} * {_DC_SHOCK}, 6)
             AS duration_convexity_approx
    FROM mom
    """,
)
def duration_convexity_cashflow(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Macaulay and modified duration plus convexity of the 24-month
    1995-96 revenue stream at a {_DC_RATE:.0%}/month discount rate,
    and the proof that convexity matters: the EXACT repricing under
    a {_DC_SHOCK:.1%} parallel shock against the first-order
    duration approximation and the duration+convexity second-order
    one (the latter must land closer — visible in the outputs).
    The interest-rate-risk complement of `irr_bisection` (level)
    and `var_cvar_daily` (distributional risk).

    Determinism: flows are exact integer dollars scaled to $M; all
    sensitivities are single-pass closed forms rounded 6dp.

    Scale: ONE filtered fact pass to 24 month rows, one moment
    aggregation — map-side combinable end to end.
    """
    o = load(spark, sf_dir, "orders")
    flows = (
        o.where(F.year(F.col("o_orderdate").cast("date")).isin(1995, 1996))
        .groupBy(
            (
                (F.year(F.col("o_orderdate").cast("date")) - 1995) * 12
                + F.month(F.col("o_orderdate").cast("date"))
            ).alias("t")
        )
        .agg(
            (
                F.sum(F.round(F.col("o_totalprice")).cast("bigint"))
                / 1000000.0
            ).alias("cf")
        )
    )
    disc = F.pow(1 + _DC_RATE, F.col("t"))
    mom = flows.agg(
        F.sum(F.col("cf") / disc).alias("pv"),
        F.sum(F.col("t") * F.col("cf") / disc).alias("tpv"),
        F.sum(F.col("t") * (F.col("t") + 1) * F.col("cf") / disc).alias(
            "ttpv"
        ),
        F.sum(
            F.col("cf") / F.pow(1 + _DC_RATE + _DC_SHOCK, F.col("t"))
        ).alias("pv_shocked"),
    )
    mod_d = F.col("tpv") / F.col("pv") / (1 + _DC_RATE)
    conv = F.col("ttpv") / (F.col("pv") * F.pow(F.lit(1 + _DC_RATE), 2))
    return mom.select(
        F.round("pv", 6).alias("pv_m"),
        F.round(F.col("tpv") / F.col("pv"), 6).alias(
            "macaulay_duration_months"
        ),
        F.round(mod_d, 6).alias("modified_duration_months"),
        F.round(conv, 6).alias("convexity"),
        F.round(F.col("pv_shocked") / F.col("pv") - 1, 6).alias(
            "exact_repricing"
        ),
        F.round(-mod_d * _DC_SHOCK, 6).alias("duration_approx"),
        F.round(
            -mod_d * _DC_SHOCK + 0.5 * conv * _DC_SHOCK * _DC_SHOCK, 6
        ).alias("duration_convexity_approx"),
    )
