"""Analytics wave 9: Holt-Winters seasonal smoothing and second-price
auction clearing.

Holt-Winters completes the exponential-smoothing family
(exp_smoothing_forecast = level+trend; this adds the additive weekly
seasonal component — the default baseline for seasonal operational
series). Second-price clearing is the ad-exchange settlement kernel:
winner pays the runner-up's bid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_HW_A = 0.4  # level
_HW_B = 0.2  # trend
_HW_G = 0.3  # seasonal
_HW_P = 7  # weekly seasonality
_HW_H = 7  # forecast horizon (days)

# State array: [level, trend, s_0..s_{P-1}] where s_i is the seasonal
# term for phase i; the current phase rotates with the fold index.
# Seeds: level = first value, trend = 0, seasonals = 0 (additive).
# Update at step t (value v, phase p = (t-1) % P, 0-based state slots):
#   lvl' = A*(v - s_p) + (1-A)*(lvl + tr)
#   tr'  = B*(lvl' - lvl) + (1-B)*tr
#   s_p' = G*(v - lvl') + (1-G)*s_p


def _hw_spark() -> str:
    lvl_new = f"{_HW_A} * (v.x - acc[CAST(2 + (v.i - 1) % {_HW_P} AS INT)]) + {1 - _HW_A} * (acc[0] + acc[1])"
    return f"""
        aggregate(
          zip_with(slice(xs, 2, size(xs) - 1),
                   sequence(1, size(xs) - 1),
                   (x, i) -> struct(x AS x, i AS i)),
          array(xs[0], CAST(0.0 AS DOUBLE){", CAST(0.0 AS DOUBLE)" * _HW_P}),
          (acc, v) -> transform(
            sequence(0, {_HW_P + 1}),
            j -> CASE
              WHEN j = 0 THEN {lvl_new}
              WHEN j = 1 THEN {_HW_B} * (({lvl_new}) - acc[0]) + {1 - _HW_B} * acc[1]
              WHEN j = CAST(2 + (v.i - 1) % {_HW_P} AS INT)
                THEN {_HW_G} * (v.x - ({lvl_new})) + {1 - _HW_G} * acc[CAST(j AS INT)]
              ELSE acc[CAST(j AS INT)]
            END)
        )
    """


def _hw_duck() -> str:
    lvl_new = f"{_HW_A} * (v[1] - acc[CAST(3 + (v[2] - 1) % {_HW_P} AS BIGINT)]) + {1 - _HW_A} * (acc[1] + acc[2])"
    return f"""
        list_reduce(
          list_prepend(
            list_prepend(xs[1], list_prepend(CAST(0.0 AS DOUBLE),
              {"list_prepend(CAST(0.0 AS DOUBLE), " * (_HW_P - 1)}
              [CAST(0.0 AS DOUBLE)]{")" * (_HW_P - 1)})),
            list_transform(range(1, len(xs)),
                           i -> [xs[i + 1], CAST(i AS DOUBLE)])
          ),
          (acc, v) -> list_transform(
            range(0, {_HW_P + 2}),
            j -> CASE
              WHEN j = 0 THEN {lvl_new}
              WHEN j = 1 THEN {_HW_B} * (({lvl_new}) - acc[1]) + {1 - _HW_B} * acc[2]
              WHEN j = CAST(2 + (v[2] - 1) % {_HW_P} AS BIGINT)
                THEN {_HW_G} * (v[1] - ({lvl_new})) + {1 - _HW_G} * acc[CAST(j + 1 AS BIGINT)]
              ELSE acc[CAST(j + 1 AS BIGINT)]
            END)
        )
    """


@query(
    "holt_winters_daily",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), series AS (
      SELECT list(x ORDER BY day) AS xs, CAST(count(*) AS BIGINT) AS n
      FROM daily
    ), fit AS (
      SELECT n, ({_hw_duck()}) AS st FROM series
    )
    SELECT n AS n_days,
           round(st[1], 6) AS level,
           round(st[2], 6) AS trend,
           round(st[CAST(3 + ((n - 1) % {_HW_P}) AS BIGINT)], 6)
             AS next_seasonal,
           round(st[1] + {_HW_H} * st[2]
                 + st[CAST(3 + ((n + {_HW_H} - 2) % {_HW_P}) AS BIGINT)], 6)
             AS forecast_{_HW_H}d
    FROM fit
    """,
)
def holt_winters_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive triple smoothing (α={_HW_A}, β={_HW_B},
    γ={_HW_G}, weekly period {_HW_P}) of the daily event-count series,
    with the {_HW_H}-day-ahead forecast level + h·trend + matching
    seasonal — the default seasonal baseline forecaster, completing the
    smoothing family (ffill → Holt → Holt-Winters). The recurrence
    carries a {_HW_P + 2}-slot state vector [level, trend, s₀..s₆]
    through ONE ordered array fold (day-sorted, identical
    left-to-right IEEE updates in both engines — the
    exp_smoothing_forecast pattern extended to vector state), so even
    the seasonal components carry a full 6dp value oracle.

    Scale: one map-side-combined groupBy(day); the fold runs over the
    calendar-bounded day array with O(P) state — for series beyond
    array scale the linear recurrence distributes as matrix prefix
    products, seasonality included (the state update is affine).
    """
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    series = daily.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, x))), s -> s.x)"
        ).alias("xs"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    fit = series.select("n", F.expr(_hw_spark()).alias("st"))
    return fit.select(
        F.col("n").alias("n_days"),
        F.round(F.col("st")[0], 6).alias("level"),
        F.round(F.col("st")[1], 6).alias("trend"),
        F.round(
            F.element_at(
                F.col("st"), ((F.col("n") - 1) % _HW_P + 3).cast("int")
            ),
            6,
        ).alias("next_seasonal"),
        F.round(
            F.col("st")[0]
            + _HW_H * F.col("st")[1]
            + F.element_at(
                F.col("st"),
                ((F.col("n") + _HW_H - 2) % _HW_P + 3).cast("int"),
            ),
            6,
        ).alias(f"forecast_{_HW_H}d"),
    )


@query(
    "second_price_auction_clearing",
    oracle="""
    WITH bids AS (
      SELECT date_trunc('hour', ts) AS slot, user_id AS bidder,
             CAST(round(value * 100) AS BIGINT) AS bid,
             event_id
      FROM events WHERE event_type = 'view'
    ), ranked AS (
      SELECT slot, bidder, bid,
             row_number() OVER (PARTITION BY slot
                                ORDER BY bid DESC, event_id) AS rk,
             CAST(count(*) OVER (PARTITION BY slot) AS BIGINT) AS n_bids
      FROM bids
    ), cleared AS (
      SELECT f.slot, f.bidder AS winner, f.bid AS first_bid,
             s.bid AS second_bid, f.n_bids
      FROM ranked f JOIN ranked s
        ON f.slot = s.slot AND f.rk = 1 AND s.rk = 2
    )
    SELECT slot, winner, n_bids, first_bid, second_bid,
           second_bid AS revenue_cents,
           first_bid - second_bid AS winner_surplus_cents
    FROM cleared ORDER BY slot
    """,
)
def second_price_auction_clearing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Second-price (Vickrey) auction clearing per hourly slot: view
    events are bids (user = bidder, value = bid); the highest bid wins
    but pays the SECOND-highest — the ad-exchange settlement rule that
    makes truthful bidding dominant. Reports per-slot winner, clearing
    revenue, and winner surplus (first − second), all exact cents with
    event-id tiebreaks.

    Scale: one slot-partitioned top-2 window (bounded per-slot rank,
    never global) and a self-join of the two rank-1/rank-2 dimension
    frames — the shape a real exchange runs per auction batch; revenue
    rollups aggregate map-side from the cleared dimension.
    """
    from pyspark.sql import Window

    bids = load(spark, sf_dir, "events").where(
        F.col("event_type") == "view"
    ).select(
        F.date_trunc("hour", F.col("ts")).alias("slot"),
        F.col("user_id").alias("bidder"),
        F.round(F.col("value") * 100).cast("bigint").alias("bid"),
        "event_id",
    )
    w = Window.partitionBy("slot").orderBy(F.desc("bid"), "event_id")
    wc = Window.partitionBy("slot")
    ranked = bids.select(
        "slot",
        "bidder",
        "bid",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wc).cast("bigint").alias("n_bids"),
    )
    f = ranked.where(F.col("rk") == 1).select(
        "slot",
        F.col("bidder").alias("winner"),
        F.col("bid").alias("first_bid"),
        "n_bids",
    )
    s = ranked.where(F.col("rk") == 2).select(
        F.col("slot").alias("slot2"), F.col("bid").alias("second_bid")
    )
    return (
        f.join(s, F.col("slot") == F.col("slot2"))
        .select(
            "slot",
            "winner",
            "n_bids",
            "first_bid",
            "second_bid",
            F.col("second_bid").alias("revenue_cents"),
            (F.col("first_bid") - F.col("second_bid")).alias(
                "winner_surplus_cents"
            ),
        )
        .orderBy("slot")
    )
