"""Output sinks: submission CSV + partitioned parquet."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_submission(df: DataFrame, path: str) -> str:
    """Kaggle-style single-file CSV (id, is_iceberg) — ref main.py:320-324.

    Spark writes a directory of part files; for the single-file contract we
    coalesce(1) (submission frames are small by definition) and move the
    part out. Large exports should use write_parquet instead.
    """
    tmp = path + ".spark-tmp"
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    shutil.move(part, path)
    shutil.rmtree(tmp)
    return path


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> str:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return path
