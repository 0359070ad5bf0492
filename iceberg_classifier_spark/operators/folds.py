"""Deterministic stratified fold assignment and train/val splits.

The reference uses sklearn's StratifiedKFold(n_splits=8, shuffle=True,
random_state=16) (main.py:252) and StratifiedShuffleSplit. On a cluster,
seeded global shuffles are hostile (they imply a total order); instead we
stratify with ``row_number() over (partition by label order by id) % K`` —
deterministic, seed-free, one shuffle on the label key, and exactly
balanced within every stratum. Same guarantees the reference wants
(every stratum spread evenly over folds), cluster-native execution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_stratified_folds(
    df: DataFrame, label_col: str, id_col: str, k: int, fold_col: str = "fold"
) -> DataFrame:
    w = Window.partitionBy(label_col).orderBy(id_col)
    return df.withColumn(
        fold_col, ((F.row_number().over(w) - 1) % k).cast("int")
    )


def stratified_split(
    df: DataFrame,
    label_col: str,
    id_col: str,
    val_fraction: float = 0.25,
    split_col: str = "split",
) -> DataFrame:
    """Stratified train/val split: every ``round(1/val_fraction)``-th row of
    each stratum (in id order) goes to val. Deterministic and exact."""
    every = max(2, round(1.0 / val_fraction))
    w = Window.partitionBy(label_col).orderBy(id_col)
    return df.withColumn(
        split_col,
        F.when((F.row_number().over(w) - 1) % every == 0, F.lit("val")).otherwise(
            F.lit("train")
        ),
    )
