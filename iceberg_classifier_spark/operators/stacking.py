"""Submission ensembling — the reference's sub_stacking.py re-expressed.

The reference concatenates M submission CSVs column-wise in pandas and
combines them (sub_stacking.py:31-90). Column-wise concat does not scale;
here submissions live in LONG form (id, model_id, prob) and every stacking
mode is a single groupBy(id) aggregate — map-side combinable, one shuffle,
skew-free (ids are unique).

Modes (sub_stacking.py:40-90): Mean, Median, PushOut+Median, MinMax+Mean,
MinMax+Median, MinMax+BestBase, with cutoff_lo=0.8, cutoff_hi=0.2 — note
the reference names them backwards; `lo`/`hi` here follow its semantics:
"all probs > 0.8" → confident-1, "all probs < 0.2" → confident-0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CUTOFF_HI = 0.8
CUTOFF_LO = 0.2


def stack_stats(long_subs: DataFrame, id_col: str = "id", prob_col: str = "prob") -> DataFrame:
    """Per-id ensemble stats over a long (id, model_id, prob) frame."""
    p = F.col(prob_col)
    return long_subs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_models"),
        F.max(p).alias("p_max"),
        F.min(p).alias("p_min"),
        F.avg(p).alias("p_mean"),
        F.median(p).alias("p_median"),
        F.min((p > CUTOFF_HI).cast("int")).cast("boolean").alias("all_hi"),
        F.max((p < CUTOFF_LO).cast("int")).cast("int").alias("_any_lo_tmp"),
        F.min((p < CUTOFF_LO).cast("int")).cast("boolean").alias("all_lo"),
    ).drop("_any_lo_tmp")


def stack(
    long_subs: DataFrame,
    mode: str,
    base: DataFrame | None = None,
    id_col: str = "id",
    prob_col: str = "prob",
) -> DataFrame:
    """Return (id, prob) stacked by ``mode``.

    ``base`` (id, prob) is required for MinMax+BestBase — it is the
    reference's hand-picked best single submission (sub_stacking.py:10).
    """
    s = stack_stats(long_subs, id_col, prob_col)
    if mode == "Mean":
        out = s.select(id_col, F.col("p_mean").alias(prob_col))
    elif mode == "Median":
        out = s.select(id_col, F.col("p_median").alias(prob_col))
    elif mode == "PushOut+Median":
        out = s.select(
            id_col,
            F.when(F.col("all_hi"), F.lit(1.0))
            .when(F.col("all_lo"), F.lit(0.0))
            .otherwise(F.col("p_median"))
            .alias(prob_col),
        )
    elif mode in ("MinMax+Mean", "MinMax+Median"):
        mid = F.col("p_mean") if mode == "MinMax+Mean" else F.col("p_median")
        out = s.select(
            id_col,
            F.when(F.col("all_hi"), F.col("p_max"))
            .when(F.col("all_lo"), F.col("p_min"))
            .otherwise(mid)
            .alias(prob_col),
        )
    elif mode == "MinMax+BestBase":
        if base is None:
            raise ValueError("MinMax+BestBase requires a base submission")
        b = base.select(F.col(id_col), F.col(prob_col).alias("_p_base"))
        out = s.join(b, id_col).select(
            id_col,
            F.when(F.col("all_hi"), F.col("p_max"))
            .when(F.col("all_lo"), F.col("p_min"))
            .otherwise(F.col("_p_base"))
            .alias(prob_col),
        )
    else:
        raise ValueError(f"unknown stacking mode {mode!r}")
    return out
