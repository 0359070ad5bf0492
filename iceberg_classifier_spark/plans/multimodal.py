"""Multimodal (binary) column plumbing.

Pattern for 100 TB multimodal corpora: media lives in opaque ``binary``
columns next to typed metadata; decode / feature-extraction runs as
Arrow-batched Pandas UDFs over ``mapInPandas`` so bytes never round-trip
through Python row-by-row. The decode kernel itself is stubbed here
(image/audio libs are not in this container — see ``decode_image``);
the schema, batching, partitioning, and UDF plumbing are real and tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

FAKE_MAGIC = b"IMG"


def decode_image(data: bytes):  # pragma: no cover - scale path stub
    """Real deployments plug PIL/libvips here. Not available in this
    container, so decoding real image formats is explicitly unsupported."""
    raise NotImplementedError(
        "image decode requires an imaging library (PIL/libvips); "
        "wire it in deploy environments — the Spark plumbing around this "
        "stub (binary column, mapInPandas batching) is production-shaped"
    )


@query(
    "multimodal_meta",
    oracle="""
    WITH m AS (
      SELECT doc_id, 'IMG' || text AS payload, lang FROM documents
    )
    SELECT doc_id,
           CAST(length(payload) AS BIGINT) AS n_bytes,
           'fake/v1' AS format,
           CAST(list_sum(list_transform(generate_series(1, length(payload)),
                                        i -> ord(substr(payload, CAST(i AS INTEGER), 1))))
                % 65521 AS BIGINT) AS checksum
    FROM m ORDER BY doc_id
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column + typed metadata + Arrow-batched feature
    extraction (byte length / format tag / adler-style checksum).

    The payload is synthesized (magic prefix + document bytes) since
    testdata carries no real media; the pipeline — binary column in,
    mapInPandas over byte buffers, scalar features out — is the real
    100 TB shape.
    """
    import pandas as pd

    d = load(spark, sf_dir, "documents")
    m = d.select(
        "doc_id",
        F.concat(F.lit(FAKE_MAGIC.decode()), F.col("text")).cast("binary").alias(
            "payload"
        ),
    )

    def extract(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "format": "fake/v1",
                    "checksum": payloads.map(lambda b: sum(b) % 65521),
                }
            )

    return m.mapInPandas(
        extract, "doc_id long, n_bytes long, format string, checksum long"
    ).orderBy("doc_id")
