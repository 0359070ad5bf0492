"""Robust-estimation + checksum-DQ wave: Huber means via fixed IRLS
rounds, and Luhn check-digit auditing.

The Huber M-estimator is the standard middle ground between the mean
(efficient, fragile) and the median (robust, noisy) — here with the
iteratively-reweighted solve made fully deterministic by running the
weighted sums over the SORTED distinct-value dimension, one CTE per
round. Luhn check digits are the classic self-validating-identifier
scheme (cards, IMEI); the audit generates and validates them as an
exact digit fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_HUBER_K = 1000  # tuning constant, cents


def _w(mu: str) -> str:
    """Huber weight min(1, k/|x−μ|) — shared expression text."""
    return (
        f"least(CAST(1.0 AS DOUBLE), {_HUBER_K}"
        f" / greatest(abs(cents - {mu}), CAST(0.001 AS DOUBLE)))"
    )


def _round_duck(mu: str) -> str:
    return f"""
      list_reduce(list_prepend(CAST(0 AS DOUBLE),
        list(c * {_w(mu)} * cents ORDER BY cents)), (a, v) -> a + v)
      / list_reduce(list_prepend(CAST(0 AS DOUBLE),
        list(c * {_w(mu)} ORDER BY cents)), (a, v) -> a + v)
    """


def _round_spark(mu_col: str) -> str:
    # mu rides along in the collected struct (constant per group), so
    # the fold lambda reads it per element — no nested aggregate
    return f"""
      aggregate(transform(array_sort(collect_list(struct(cents, c,
                    {mu_col} AS mu))),
                  s -> s.c * least(CAST(1.0 AS DOUBLE), {_HUBER_K}
                         / greatest(abs(s.cents - s.mu),
                                    CAST(0.001 AS DOUBLE))) * s.cents),
                CAST(0.0 AS DOUBLE), (a, v) -> a + v)
      / aggregate(transform(array_sort(collect_list(struct(cents, c,
                      {mu_col} AS mu))),
                    s -> s.c * least(CAST(1.0 AS DOUBLE), {_HUBER_K}
                           / greatest(abs(s.cents - s.mu),
                                      CAST(0.001 AS DOUBLE)))),
                  CAST(0.0 AS DOUBLE), (a, v) -> a + v)
    """


@query(
    "huber_mean_irls",
    oracle=f"""
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ), g AS (
      SELECT event_type, cents, CAST(count(*) AS BIGINT) AS c
      FROM v GROUP BY 1, 2
    ), m0 AS (
      SELECT event_type,
             CAST(sum(c) AS BIGINT) AS n_all,
             CAST(sum(c * cents) AS BIGINT) AS s_all,
             CAST(CAST(sum(c * cents) AS BIGINT) AS DOUBLE)
               / CAST(sum(c) AS BIGINT) AS mu0
      FROM g GROUP BY 1
    ), m1 AS (
      SELECT g.event_type, any_value(m0.n_all) AS n_all,
             any_value(m0.s_all) AS s_all,
             ({_round_duck("m0.mu0")}) AS mu1
      FROM g JOIN m0 USING (event_type)
      GROUP BY g.event_type
    ), m2 AS (
      SELECT g.event_type, any_value(m1.n_all) AS n_all,
             any_value(m1.s_all) AS s_all,
             ({_round_duck("m1.mu1")}) AS mu2
      FROM g JOIN m1 USING (event_type)
      GROUP BY g.event_type
    )
    SELECT event_type, CAST(n_all AS BIGINT) AS n,
           round(CAST(s_all AS DOUBLE) / n_all / 100, 6) AS plain_mean,
           round(mu2 / 100, 6) AS huber_mean,
           round((mu2 - CAST(s_all AS DOUBLE) / n_all) / 100, 6)
             AS robust_shift
    FROM m2 ORDER BY event_type
    """,
)
def huber_mean_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber M-estimated mean per event type via two fixed IRLS rounds
    (k={_HUBER_K} cents): start at the plain mean, reweight each value
    by w = min(1, k/|x−μ|), recompute the weighted mean, repeat — the
    robust location estimate that keeps near-full efficiency on clean
    data while capping outlier influence (trimmed_winsor_price cuts a
    fixed fraction; Huber adapts to the residuals). Each round is its
    own pass over the value-grouped distinct-cents dimension with the
    previous mean joined back as a scalar, and the weighted sums run in
    value-SORTED ordered folds — the inherently iterative float
    estimate still carries a full 6dp oracle.

    Scale: one map-side-combined (type, cents) aggregate; each IRLS
    round is an O(|distinct values|) fold on the bounded dimension
    with a broadcast of the |types|-row previous-round means — rounds
    cost dimension work, never corpus passes.
    """
    v = load(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    g = v.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    m0 = g.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n_all"),
        F.sum(F.col("c") * F.col("cents")).cast("bigint").alias("s_all"),
        (
            F.sum(F.col("c") * F.col("cents")).cast("bigint").cast("double")
            / F.sum("c").cast("bigint")
        ).alias("mu0"),
    )
    m1 = (
        g.join(F.broadcast(m0), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("n_all").alias("n_all"),
            F.any_value("s_all").alias("s_all"),
            F.expr(_round_spark("mu0")).alias("mu1"),
        )
    )
    m2 = (
        g.join(F.broadcast(m1), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("n_all").alias("n_all"),
            F.any_value("s_all").alias("s_all"),
            F.expr(_round_spark("mu1")).alias("mu2"),
        )
    )
    return m2.select(
        "event_type",
        F.col("n_all").cast("bigint").alias("n"),
        F.round(F.col("s_all").cast("double") / F.col("n_all") / 100, 6).alias(
            "plain_mean"
        ),
        F.round(F.col("mu2") / 100, 6).alias("huber_mean"),
        F.round(
            (F.col("mu2") - F.col("s_all").cast("double") / F.col("n_all"))
            / 100,
            6,
        ).alias("robust_shift"),
    ).orderBy("event_type")


@query(
    "luhn_checksum_audit",
    oracle="""
    WITH ids AS (SELECT c_custkey AS id FROM customer),
    digits AS (
      SELECT id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, CAST(len(CAST(id AS VARCHAR)) + 1
                                            AS BIGINT)),
                 i -> CAST(
                   CASE WHEN i % 2 = 1 THEN
                     CASE WHEN 2 * CAST(substr(reverse(CAST(id AS VARCHAR)),
                                               CAST(i AS INTEGER), 1)
                                        AS BIGINT) > 9
                          THEN 2 * CAST(substr(reverse(CAST(id AS VARCHAR)),
                                               CAST(i AS INTEGER), 1)
                                        AS BIGINT) - 9
                          ELSE 2 * CAST(substr(reverse(CAST(id AS VARCHAR)),
                                               CAST(i AS INTEGER), 1)
                                        AS BIGINT) END
                   ELSE CAST(substr(reverse(CAST(id AS VARCHAR)),
                                    CAST(i AS INTEGER), 1) AS BIGINT)
                   END AS BIGINT))),
               (a, v) -> a + v) AS luhn_sum
      FROM ids
    ), coded AS (
      SELECT id, (10 - luhn_sum % 10) % 10 AS check_digit
      FROM digits
    )
    SELECT CAST(count(*) AS BIGINT) AS n_ids,
           CAST(sum(CASE WHEN check_digit = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_zero_check,
           CAST(min(id * 10 + check_digit) AS BIGINT) AS min_full_id,
           CAST(max(id * 10 + check_digit) AS BIGINT) AS max_full_id,
           CAST(sum(check_digit) AS BIGINT) AS sum_check_digits
    FROM coded
    """,
)
def luhn_checksum_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn check-digit generation audit: compute the mod-10 check
    digit for every customer id (double every second digit from the
    right, subtract 9 above 9, sum — the card/IMEI self-validation
    scheme) and summarize the issued identifier space — the DQ
    primitive for validating externally-sourced account numbers at
    ingestion (a single corrupted digit always flips the checksum).
    The digit walk is an exact integer ordered fold over the reversed
    decimal string, identical in both engines (validated against
    python's reference Luhn in tests/test_units.py).

    Scale: map-only expression work per row plus one global aggregate;
    validation at ingestion is the same expression in a filter.
    """
    ids = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id")
    )
    luhn_sum = F.expr(
        """
        aggregate(
          transform(sequence(1, length(CAST(id AS STRING))),
            i -> CAST(
              CASE WHEN i % 2 = 1 THEN
                CASE WHEN 2 * CAST(substr(reverse(CAST(id AS STRING)), i, 1)
                                   AS BIGINT) > 9
                     THEN 2 * CAST(substr(reverse(CAST(id AS STRING)), i, 1)
                                   AS BIGINT) - 9
                     ELSE 2 * CAST(substr(reverse(CAST(id AS STRING)), i, 1)
                                   AS BIGINT) END
              ELSE CAST(substr(reverse(CAST(id AS STRING)), i, 1) AS BIGINT)
              END AS BIGINT)),
          CAST(0 AS BIGINT), (a, v) -> a + v)
        """
    )
    coded = ids.select(
        "id",
        ((10 - luhn_sum % 10) % 10).alias("check_digit"),
    )
    return coded.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ids"),
        F.sum(F.when(F.col("check_digit") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero_check"),
        F.min(F.col("id") * 10 + F.col("check_digit"))
        .cast("bigint")
        .alias("min_full_id"),
        F.max(F.col("id") * 10 + F.col("check_digit"))
        .cast("bigint")
        .alias("max_full_id"),
        F.sum("check_digit").cast("bigint").alias("sum_check_digits"),
    )
