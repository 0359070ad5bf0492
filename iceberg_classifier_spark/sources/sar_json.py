"""Reference-format SAR JSON ingest.

The reference loads Kaggle train/test JSON with pandas (main.py:50-61):
records of {id, band_1: float[5625], band_2: float[5625], inc_angle
(number or the string "na"), is_iceberg}. Spark-first version: explicit
schema (inc_angle read permissively as string), "na" → NULL coercion, and
the reference's forward-fill imputation as a window op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

SAR_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("band_1", ArrayType(DoubleType())),
        StructField("band_2", ArrayType(DoubleType())),
        StructField("inc_angle", StringType()),  # may be "na" → coerced below
        StructField("is_iceberg", DoubleType()),
    ]
)


def read_sar_json(spark: SparkSession, path: str, multiline: bool = True) -> DataFrame:
    """Load reference-style JSON; inc_angle 'na'/invalid → NULL
    (pd.to_numeric(errors='coerce'), main.py:56-57)."""
    df = spark.read.schema(SAR_SCHEMA).option("multiLine", multiline).json(path)
    return df.withColumn(
        "inc_angle",
        F.when(F.lower(F.col("inc_angle")) == "na", None)
        .otherwise(F.col("inc_angle"))
        .cast("double"),
    )


def ffill_inc_angle(df: DataFrame) -> DataFrame:
    """train['inc_angle'].fillna(method='pad') (main.py:58) — last valid
    observation in id order, as a window op."""
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(
        "inc_angle", F.last("inc_angle", ignorenulls=True).over(w)
    )
