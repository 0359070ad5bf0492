"""ML scoring wave 3: fully-oracled logistic regression.

`logreg_irls_histogram` fits a 1-feature logistic regression by exact
IRLS/Newton iterations over a binned-feature binomial histogram — the
grouped-data formulation that makes every iteration a bounded-frame
aggregate, so the whole trajectory (not just the converged answer) is
value-checked against the DuckDB oracle. The in-engine, full-oracle
counterpart to the rows-only `mllib_logreg_cv` (MLlib LBFGS cannot be
value-oracled; this can). Same materialized-CTE-per-iteration oracle
and repr-literal driver loop as `gaussian_mixture_em`
(analytics28.py).

Reference surface: the reference trains sigmoid-output CNN heads with
log-loss (main.py:160-180); this is the same Bernoulli-likelihood
optimization run to numerical convergence in closed iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_IRLS_ITERS = 6
# 1e-3 feature bins: the binomial histogram stays bounded (~hundreds
# of rows) at any corpus size
_XBIN = "CAST(round(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT)"
_XBIN_SPARK = "CAST(round(CAST(embedding[0] AS DOUBLE) * 1000) AS BIGINT)"


def _irls_oracle(iters: int) -> str:
    parts = [f"""
    WITH hist AS (
      SELECT {_XBIN} AS xb,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN label >= 5 THEN 1 ELSE 0 END)
               AS BIGINT) AS y
      FROM embeddings GROUP BY 1
    ), par0 AS MATERIALIZED (
      SELECT CAST(0.0 AS DOUBLE) AS b0, CAST(0.0 AS DOUBLE) AS b1
    )"""]
    for k in range(1, iters + 1):
        parts.append(f""", st{k} AS MATERIALIZED (
      SELECT sum(h.y - h.n * (1 / (1 + exp(-(p.b0 + p.b1 * h.xb
               / 1000.0))))) AS g0,
             sum((h.xb / 1000.0) * (h.y - h.n * (1 / (1 + exp(-(p.b0
               + p.b1 * h.xb / 1000.0)))))) AS g1,
             sum(h.n * (1 / (1 + exp(-(p.b0 + p.b1 * h.xb / 1000.0))))
                 * (1 - 1 / (1 + exp(-(p.b0 + p.b1 * h.xb
                    / 1000.0))))) AS h00,
             sum((h.xb / 1000.0) * h.n * (1 / (1 + exp(-(p.b0 + p.b1
                 * h.xb / 1000.0)))) * (1 - 1 / (1 + exp(-(p.b0
                 + p.b1 * h.xb / 1000.0))))) AS h01,
             sum((h.xb / 1000.0) * (h.xb / 1000.0) * h.n
                 * (1 / (1 + exp(-(p.b0 + p.b1 * h.xb / 1000.0))))
                 * (1 - 1 / (1 + exp(-(p.b0 + p.b1 * h.xb
                    / 1000.0))))) AS h11,
             max(p.b0) AS b0p, max(p.b1) AS b1p
      FROM hist h CROSS JOIN par{k - 1} p
    ), par{k} AS MATERIALIZED (
      SELECT b0p + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01)
               AS b0,
             b1p + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01)
               AS b1
      FROM st{k}
    )""")
    parts.append(f""", fin AS (
      SELECT p.b0, p.b1,
             CAST(sum(h.n) AS BIGINT) AS n_rows,
             CAST(sum(h.y) AS BIGINT) AS n_pos,
             sum(-(h.y * ln(1 / (1 + exp(-(p.b0 + p.b1 * h.xb
                   / 1000.0))))
                   + (h.n - h.y) * ln(1 - 1 / (1 + exp(-(p.b0 + p.b1
                     * h.xb / 1000.0)))))) AS nll
      FROM hist h CROSS JOIN par{iters} p
      GROUP BY p.b0, p.b1
    )
    SELECT n_rows, n_pos,
           round(b0, 6) AS b0,
           round(b1, 6) AS b1,
           round(nll / n_rows, 6) AS log_loss,
           round(-(n_pos * 1.0 / n_rows) * ln(n_pos * 1.0 / n_rows)
                 - (1 - n_pos * 1.0 / n_rows)
                   * ln(1 - n_pos * 1.0 / n_rows), 6)
             AS null_log_loss,
           CAST({iters} AS BIGINT) AS irls_iterations
    FROM fin
    """)
    return "".join(parts)


@query("logreg_irls_histogram", oracle=_irls_oracle(_IRLS_ITERS))
def logreg_irls_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression by exact IRLS over a binomial histogram:
    the embedding feature bins to 1e-3 (bounded cells, each carrying
    binomial counts (n, y)), and {_IRLS_ITERS} Newton steps solve the
    2x2 system (gradient, Fisher information) in closed form per
    iteration — grouped-data logistic regression, identical in the
    limit to row-level fitting but with every data pass a bounded
    aggregate. Emits coefficients, final mean log-loss, and the null
    (intercept-only) log-loss it must beat. Unlike `mllib_logreg_cv`
    (LBFGS, rows-only check), this trajectory is value-matched
    against the oracle iteration by iteration.

    Determinism: the histogram is exact int64; each iteration's
    sums are identical double expressions over the same bounded
    frame, with parameters replayed as repr-round-tripped literals
    (the `gaussian_mixture_em` pattern).

    Scale: ONE fact-table pass builds the histogram; all Newton
    iterations run on the ~600-cell frame — the 100 TB shape for
    GLM fitting (bin, aggregate, iterate on the driver-sized
    sufficient frame).
    """
    e = load(spark, sf_dir, "embeddings")
    hist = (
        e.groupBy(F.expr(_XBIN_SPARK).alias("xb"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("label") >= 5, 1).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
        .cache()
    )
    b0, b1 = 0.0, 0.0
    for _ in range(_IRLS_ITERS):
        p = f"(1 / (1 + exp(-({b0!r} + {b1!r} * xb / 1000.0))))"
        row = hist.agg(
            F.expr(f"sum(y - n * {p})").alias("g0"),
            F.expr(f"sum((xb / 1000.0) * (y - n * {p}))").alias("g1"),
            F.expr(f"sum(n * {p} * (1 - {p}))").alias("h00"),
            F.expr(
                f"sum((xb / 1000.0) * n * {p} * (1 - {p}))"
            ).alias("h01"),
            F.expr(
                f"sum((xb / 1000.0) * (xb / 1000.0) * n * {p}"
                f" * (1 - {p}))"
            ).alias("h11"),
        ).collect()[0]
        g0, g1 = float(row["g0"]), float(row["g1"])
        h00, h01, h11 = (
            float(row["h00"]),
            float(row["h01"]),
            float(row["h11"]),
        )
        det = h00 * h11 - h01 * h01
        b0 = b0 + (h11 * g0 - h01 * g1) / det
        b1 = b1 + (h00 * g1 - h01 * g0) / det
    p = f"(1 / (1 + exp(-({b0!r} + {b1!r} * xb / 1000.0))))"
    fin = hist.agg(
        F.sum("n").cast("bigint").alias("n_rows"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.expr(
            f"sum(-(y * ln({p}) + (n - y) * ln(1 - {p})))"
        ).alias("nll"),
    ).collect()[0]
    hist.unpersist()
    import math

    n_rows, n_pos = int(fin["n_rows"]), int(fin["n_pos"])
    pi = n_pos / n_rows
    return spark.createDataFrame(
        [
            (
                n_rows,
                n_pos,
                round(b0, 6),
                round(b1, 6),
                round(float(fin["nll"]) / n_rows, 6),
                round(-pi * math.log(pi) - (1 - pi) * math.log(1 - pi), 6),
                _IRLS_ITERS,
            )
        ],
        "n_rows long, n_pos long, b0 double, b1 double,"
        " log_loss double, null_log_loss double, irls_iterations long",
    )
