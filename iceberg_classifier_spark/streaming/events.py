"""Structured Streaming over the events table.

``readStream`` on the parquet directory with an event-time watermark and
tumbling-window aggregation; the availableNow trigger drains the source
deterministically (batch-equivalent semantics), so the streaming answer is
oracle-checkable against plain SQL. In production the same plan runs
unmodified against a Kafka/file stream with late data bounded by the
watermark.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.sources.tables import table_path


def hourly_counts_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Windowed streaming aggregation, drained with availableNow into a
    memory sink; returns the materialized result."""
    # raw file schema (ts = long nanos under the nanosAsLong flag), NOT the
    # converted schema from tables.load
    batch_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    # FileStreamSource requires a directory; testdata ships a single parquet
    # file, so stage a symlink dir (the production layout IS a directory of
    # arriving files — this adapter only exists for the single-file testdata).
    stage = os.path.join(
        tempfile.gettempdir(), f"events_stream_{os.path.basename(os.path.normpath(sf_dir))}"
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(table_path(sf_dir, "events"), link)
    stream = spark.readStream.schema(batch_schema).parquet(stage)
    # nanos ts arrives as long under the nanosAsLong flag (see tables.py)
    if dict(stream.dtypes)["ts"] == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    sink = f"stream_hourly_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)
