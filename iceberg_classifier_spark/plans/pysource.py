"""PySpark 4 Python DataSource API surface: a custom partitioned JSONL
source registered with ``spark.dataSource.register`` and driven through
``spark.read.format(...)`` — the extension point for ingesting formats and
systems Spark has no built-in connector for.

The demo stages events as JSON-lines text (Jackson writes doubles with
shortest round-trip repr, so the values survive exactly), then reads them
back through the custom source — one InputPartition per file — and
aggregates. The oracle runs the same aggregate on the ORIGINAL table: a
lossless-roundtrip proof, not a file-order-dependent check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


@query(
    "python_datasource_jsonl",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def python_datasource_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (pyspark.sql.datasource): JSONL reader with
    one InputPartition per staged file, registered and consumed via the
    standard ``spark.read.format("jsonl_py")`` path, then aggregated; the
    oracle aggregates the pre-roundtrip table (exact integer cents), so any
    loss or duplication in the connector fails the hash.

    Scale: ``partitions()`` enumerates splits on the driver (cheap listing)
    and each executor streams its files through Arrow batches — the same
    split/enumerate shape as a JVM FileSourceScan, so parallelism tracks
    file count; the aggregate after it is ordinary map-side-combined
    Spark. Python-side parsing is the price of the extension point — for
    hot formats promote to a JVM reader or parse with pyarrow per batch.
    """
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    tag = sf_dir.strip("/").replace("/", "_")
    path = f"/tmp/icebergspark_jsonl_src_{tag}"
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    ev.select(
        F.to_json(F.struct("event_id", "user_id", "event_type", "value")).alias(
            "value"
        )
    ).repartition(4).write.mode("overwrite").text(path)

    class JsonlSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "jsonl_py"

        def schema(self) -> str:
            return _SCHEMA

        def reader(self, schema):
            return JsonlReader(self.options["path"])

    class JsonlReader(DataSourceReader):
        def __init__(self, path: str):
            self.path = path

        def partitions(self):
            import glob

            return [
                InputPartition(p) for p in sorted(glob.glob(self.path + "/part-*"))
            ]

        def read(self, partition):
            import json

            with open(partition.value) as f:
                for line in f:
                    if not line.strip():
                        continue
                    d = json.loads(line)
                    yield (
                        d.get("event_id"),
                        d.get("user_id"),
                        d.get("event_type"),
                        d.get("value"),
                    )

    spark.dataSource.register(JsonlSource)
    src = (
        spark.read.format("jsonl_py").schema(_SCHEMA).option("path", path).load()
    )
    return (
        src.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )
