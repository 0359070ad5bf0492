"""Evaluation metrics as single-pass DataFrame aggregates.

The reference scores with sklearn.metrics.log_loss (main.py:313-314).
Implemented as map-side-combinable aggregations — one pass, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EPS = 1e-15  # sklearn log_loss clipping


def clipped(p: Column) -> Column:
    return F.least(F.greatest(p, F.lit(EPS)), F.lit(1 - EPS))


def log_loss_expr(label: Column, p: Column) -> Column:
    """Per-row binary cross-entropy with sklearn's probability clipping."""
    pc = clipped(p)
    return -(label * F.log(pc) + (1 - label) * F.log(1 - pc))


def log_loss(df: DataFrame, label_col: str, prob_col: str) -> float:
    row = df.agg(
        F.avg(log_loss_expr(F.col(label_col), F.col(prob_col))).alias("ll")
    ).first()
    return float(row["ll"])


def accuracy_expr(label: Column, p: Column, threshold: float = 0.5) -> Column:
    pred = (p > threshold).cast("double")
    return F.avg((pred == label).cast("double"))
