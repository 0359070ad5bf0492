"""Streaming wave 2: INCREMENTAL corpus dedup — new documents arrive as
micro-batches and are checked against the already-accepted corpus via a
persistent MinHash/LSH band-key signature store, foreachBatch-MERGEd per
batch. Marries the repo's two existing pieces (dedup_minhash_lsh's
signature machinery, streaming_foreachbatch_upsert's versioned-store
MERGE harness) into the shape a production corpus ingest actually runs:
the 100 TB corpus is deduped ONCE, then each day's increment only pays
for its own signatures plus a key-join against the store.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.functions import text as T
from iceberg_classifier_spark.plans.dedup import (
    MH_P,
    N_BANDS,
    N_MINHASH,
    _MH_A,
    _MH_A_SQL,
    _MH_B,
    _MH_B_SQL,
)
from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import table_path
from iceberg_classifier_spark.streaming.events import streaming_shuffle

_ROWS_PER_BAND = N_MINHASH // N_BANDS


def _band_keys(d: DataFrame) -> DataFrame:
    """(doc_id, band, band_hash) LSH keys — the same Broder construction
    as dedup_minhash_lsh (one md5-prefix base hash per 3-shingle, the
    shared (a_i, b_i) universal-hash family, {N_BANDS} bands ×
    {_ROWS_PER_BAND} rows), emitted as band keys only: per-row array
    math, no shuffle."""
    sh = d.select(
        "doc_id", T.shingles(T.tokens("text"), 3).alias("sh")
    ).where(F.size("sh") > 0)
    hs = sh.select(
        "doc_id",
        F.transform(
            "sh",
            lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast(
                "bigint"
            ),
        ).alias("hv"),
    )

    def family_member(i):
        return lambda h: (F.lit(_MH_A[i]) * h + F.lit(_MH_B[i])) % F.lit(MH_P)

    sig = hs.select(
        "doc_id",
        F.array(
            *[
                F.array_min(F.transform("hv", family_member(i)))
                for i in range(N_MINHASH)
            ]
        ).alias("sig"),
    )
    return sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at(
                                F.col("sig"), b * _ROWS_PER_BAND + r + 1
                            ).cast("string")
                            for r in range(_ROWS_PER_BAND)
                        ],
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band", "band_hash"),
    )


def _doc_thirds_stream(spark: SparkSession, sf_dir: str):
    """documents as THREE micro-batches split at doc_id thirds (cuts at
    ``max_id div 3`` / ``2*max_id div 3``), one file per trigger, in
    arrival order = doc_id order — so "earlier batch" always means
    "smaller doc_id" and the incremental acceptance rule matches the
    batch oracle."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = os.stat(table_path(sf_dir, "documents"))
    stage = os.path.join(
        tempfile.gettempdir(),
        f"docs_thirds_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{src.st_mtime_ns:x}_{src.st_size:x}",
    )
    if not os.path.exists(os.path.join(stage, "c_tail.parquet")):
        os.makedirs(stage, exist_ok=True)
        t = pq.read_table(table_path(sf_dir, "documents"))
        max_id = pc.max(t["doc_id"]).as_py()
        c1, c2 = max_id // 3, (2 * max_id) // 3
        parts = {
            "a_early.parquet": t.filter(pc.less_equal(t["doc_id"], c1)),
            "b_mid.parquet": t.filter(
                pc.and_(
                    pc.greater(t["doc_id"], c1),
                    pc.less_equal(t["doc_id"], c2),
                )
            ),
            "c_tail.parquet": t.filter(pc.greater(t["doc_id"], c2)),
        }
        for i, (name, part) in enumerate(parts.items()):
            path = os.path.join(stage, name)
            pq.write_table(part, path)
            os.utime(path, (1_700_000_000 + i * 100,) * 2)

    batch_schema = spark.read.parquet(table_path(sf_dir, "documents")).schema
    return (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )


def _bands_oracle(src: str = "documents") -> str:
    """CTE chain computing (doc_id, band, key) LSH band keys for ``src``
    — the DuckDB mirror of ``_band_keys`` (same md5-prefix base hash +
    universal-hash family as dedup_minhash_lsh's oracle)."""
    return f"""
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 2),
               i -> string_split(text, ' ')[i] || ' ' ||
                    string_split(text, ' ')[i+1] || ' ' ||
                    string_split(text, ' ')[i+2])) AS s
      FROM {src}
    ), hs AS (
      SELECT doc_id, list_transform(s, sg ->
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(generate_series(1, 8),
            k -> CAST(strpos('0123456789abcdef',
                   substr(md5(sg), CAST(k AS INTEGER), 1)) - 1 AS BIGINT))),
          (acc, c) -> acc * 16 + c)) AS hv
      FROM sh WHERE len(s) > 0
    ), hashed AS (
      SELECT doc_id, seed,
             min((({_MH_A_SQL})[seed + 1] * h + ({_MH_B_SQL})[seed + 1])
                 % {MH_P}) AS mh
      FROM (SELECT doc_id, unnest(hv) AS h FROM hs),
           (SELECT unnest(generate_series(0, {N_MINHASH - 1})) AS seed)
      GROUP BY 1, 2
    ), bands AS (
      SELECT doc_id, seed // {_ROWS_PER_BAND} AS band,
             string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS key
      FROM hashed GROUP BY 1, 2
    )
"""


_BANDS_ORACLE = _bands_oracle("documents")


@query(
    "streaming_minhash_dedup",
    oracle=f"""
    WITH {_BANDS_ORACLE},
    cuts AS (
      SELECT max(doc_id) // 3 AS c1, (2 * max(doc_id)) // 3 AS c2
      FROM documents
    ), assigned AS (
      SELECT d.doc_id,
             CASE WHEN d.doc_id <= c.c1 THEN 0
                  WHEN d.doc_id <= c.c2 THEN 1 ELSE 2 END AS batch_id
      FROM documents d CROSS JOIN cuts c
    ), sharer AS (
      SELECT a.doc_id,
             min(bb.doc_id) AS lowest_sharer
      FROM assigned a
      JOIN bands ba ON ba.doc_id = a.doc_id
      JOIN bands bb ON bb.band = ba.band AND bb.key = ba.key
                   AND bb.doc_id < a.doc_id
      GROUP BY 1
    ), flagged AS (
      SELECT a.doc_id, a.batch_id,
             CASE
               WHEN s.doc_id IS NULL THEN 'accepted'
               WHEN sa.batch_id < a.batch_id THEN 'rejected_vs_store'
               ELSE 'rejected_in_batch'
             END AS outcome
      FROM assigned a
      LEFT JOIN sharer s ON s.doc_id = a.doc_id
      LEFT JOIN assigned sa ON sa.doc_id = s.lowest_sharer
    )
    SELECT CAST(batch_id AS BIGINT) AS batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN outcome = 'accepted' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_accepted,
           CAST(sum(CASE WHEN outcome = 'rejected_vs_store' THEN 1 ELSE 0
                END) AS BIGINT) AS n_rejected_vs_store,
           CAST(sum(CASE WHEN outcome = 'rejected_in_batch' THEN 1 ELSE 0
                END) AS BIGINT) AS n_rejected_in_batch
    FROM flagged GROUP BY batch_id ORDER BY batch_id
    """,
)
def streaming_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup gate: documents arrive as three doc_id-ordered
    micro-batches; each batch's MinHash/LSH band keys are checked against
    the persistent signature store of every previously seen document
    (shared band ⇒ near-dup candidate ⇒ rejected), then within the batch
    (lowest doc_id per band bucket wins), and the batch's keys are MERGEd
    into the store for the next increment. The final per-batch funnel
    (accepted / rejected-vs-store / rejected-in-batch) must equal the
    batch-mode rule "rejected iff any lower-doc_id document shares a band
    key" — which is what the oracle computes globally.

    Scale: the store grows with the ACCEPTED+SEEN key set, not the stream
    length, and each increment pays one signature pass over its own docs
    plus an equi-join keyed on (band, band_hash) against the store — at
    100 TB/day this is the only corpus-dedup shape that avoids re-signing
    the historical corpus (production: store as a bucketed table on the
    band key so the daily join is shuffle-free on the store side;
    signature math is identical to dedup_minhash_lsh, cited there).
    """
    stream = _doc_thirds_stream(spark, sf_dir)
    run = uuid.uuid4().hex[:8]
    state_root = os.path.join(tempfile.gettempdir(), f"mh_store_{run}")
    store_versions: list[str] = []
    stats: list[tuple[int, int, int, int, int]] = []

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        keys = _band_keys(batch_df).cache()
        n_docs = batch_df.count()
        # vs-store rejections: any band key already present in the store
        if store_versions:
            store = sess.read.parquet(store_versions[-1])
            vs_store = (
                keys.join(store, ["band", "band_hash"], "left_semi")
                .select("doc_id")
                .distinct()
            )
        else:
            vs_store = keys.select("doc_id").where(F.lit(False))
        # in-batch rejections: a lower-doc_id batch sibling shares a bucket
        in_batch = (
            keys.withColumn(
                "mn",
                F.min("doc_id").over(Window.partitionBy("band", "band_hash")),
            )
            .where(F.col("doc_id") > F.col("mn"))
            .select("doc_id")
            .distinct()
            .join(vs_store, "doc_id", "left_anti")
        )
        n_vs = vs_store.count()
        n_in = in_batch.count()
        stats.append(
            (batch_id, n_docs, n_docs - n_vs - n_in, n_vs, n_in)
        )
        # MERGE all seen keys (accepted AND rejected — the rule is "any
        # lower doc shares", so every seen key gates future arrivals).
        # APPEND-ONLY: only keys not already in the store are written, so
        # each increment costs O(new keys), never an O(history) store
        # rewrite — at 100 TB/day the rewrite would dominate the job.
        new_keys = keys.select("band", "band_hash").dropDuplicates(
            ["band", "band_hash"]
        )
        if store_versions:
            new_keys = new_keys.join(
                sess.read.parquet(store_versions[0]),
                ["band", "band_hash"],
                "left_anti",
            )
        store_dir = (
            store_versions[0]
            if store_versions
            else os.path.join(state_root, "store")
        )
        new_keys.write.mode("append").parquet(store_dir)
        if not store_versions:
            store_versions.append(store_dir)
        keys.unpersist()

    with streaming_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(merge)
            .option("checkpointLocation", os.path.join(state_root, "_chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.createDataFrame(
        sorted(stats),
        "batch_id bigint, n_docs bigint, n_accepted bigint,"
        " n_rejected_vs_store bigint, n_rejected_in_batch bigint",
    ).orderBy("batch_id")
