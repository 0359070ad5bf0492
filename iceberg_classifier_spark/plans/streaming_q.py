"""Streaming queries exposed through the driver contract."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.streaming.events import hourly_counts_stream


@query(
    "streaming_event_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour_start, event_type
    """,
)
def streaming_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming watermark+window aggregation drained with the
    availableNow trigger — must equal the batch answer exactly (streaming
    correctness property), which is what the SQL oracle asserts."""
    return hourly_counts_stream(spark, sf_dir).orderBy("hour_start", "event_type")
