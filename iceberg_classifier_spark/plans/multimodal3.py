"""Multimodal wave 3: audio zero-crossing/silence analysis and the
integral-image (summed-area table) primitive.

ZCR + silence segmentation is the first-pass audio triage every
speech pipeline runs before anything expensive (VAD precursor); the
summed-area table is the O(1)-box-query primitive behind Haar
features, box blurs, and adaptive thresholding. Both follow the
engine's multimodal policy: the byte/grid plumbing is real and
Arrow-batched; a real codec replaces the byte interpretation
(functions/imaging.py documents the stub policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_ZCR_FRAME = 64
_SIL_TAU_SQ = 1200  # silent frame: mean centered energy < 1200 (≈ σ<34.6)


@query(
    "multimodal_audio_zcr_silence",
    oracle=f"""
    WITH m AS (SELECT doc_id, text AS payload FROM documents),
    fr AS (
      SELECT doc_id,
             CAST(length(payload) // {_ZCR_FRAME} AS BIGINT) AS n_frames,
             payload
      FROM m WHERE length(payload) >= {_ZCR_FRAME}
    ), per_frame AS (
      SELECT doc_id, n_frames,
             list_transform(generate_series(1, n_frames), f ->
               CAST(list_sum(list_transform(
                 generate_series((f - 1) * {_ZCR_FRAME} + 1,
                                 f * {_ZCR_FRAME} - 1),
                 i -> CASE WHEN (ord(substr(payload, CAST(i AS INTEGER),
                                      1)) > 128)
                            <> (ord(substr(payload,
                                      CAST(i + 1 AS INTEGER), 1)) > 128)
                      THEN 1 ELSE 0 END)) AS BIGINT)) AS zc,
             list_transform(generate_series(1, n_frames), f ->
               CASE WHEN list_sum(list_transform(
                 generate_series((f - 1) * {_ZCR_FRAME} + 1,
                                 f * {_ZCR_FRAME}),
                 i -> (ord(substr(payload, CAST(i AS INTEGER), 1)) - 128)
                      * (ord(substr(payload, CAST(i AS INTEGER), 1))
                         - 128)))
                 < {_SIL_TAU_SQ} * {_ZCR_FRAME} THEN 1 ELSE 0 END)
               AS sil
      FROM fr
    ), runs AS (
      SELECT doc_id, n_frames, zc, sil,
             list_reduce(list_prepend(CAST([0, 0] AS BIGINT[]),
               list_transform(sil, s -> CAST([s, 0] AS BIGINT[]))),
               (a, v) -> [CASE WHEN v[1] = 1 THEN a[1] + 1 ELSE 0 END,
                          greatest(a[2], CASE WHEN v[1] = 1
                                         THEN a[1] + 1 ELSE 0 END)])[2]
               AS longest_silence
      FROM per_frame
    )
    SELECT doc_id, n_frames,
           CAST(zc[1] * 1000000 // ({_ZCR_FRAME} - 1) AS BIGINT)
             AS zcr_first_ppm,
           CAST(list_max(zc) * 1000000 // ({_ZCR_FRAME} - 1) AS BIGINT)
             AS zcr_max_ppm,
           CAST(list_sum(sil) AS BIGINT) AS n_silent,
           longest_silence
    FROM runs ORDER BY doc_id
    """,
)
def multimodal_audio_zcr_silence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Zero-crossing rate and silence segmentation over the binary
    "audio" column: bytes as unsigned 8-bit samples centered at 128,
    framed at 64 samples; per frame the ZCR (sign changes / 63, ppm)
    and a silence flag (mean centered energy < τ² — an EXACT integer
    comparison Σ(x−128)² < τ²·N); per doc the first/max ZCR, silent-
    frame count, and the longest consecutive silent run (the VAD
    precursor that decides what a speech pipeline even transcribes).

    Determinism: every statistic is exact integer arithmetic — ZCR
    counts, energy comparisons, and the run-length fold ([current,
    best] flat state) — no floats anywhere.

    Scale: framing, ZCR, energy, and run-lengths all run inside one
    Arrow-batched numpy kernel (vectorized diff/reshape — no Spark-
    side explode of the sample stream); output is one row per doc.
    """
    import numpy as np
    import pandas as pd

    d = load(spark, sf_dir, "documents")
    m = d.select("doc_id", F.col("text").cast("binary").alias("payload"))

    def kernel(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                    np.int64
                )
                n = len(a) // _ZCR_FRAME
                if n < 1:
                    continue
                fr = a[: n * _ZCR_FRAME].reshape(n, _ZCR_FRAME)
                above = fr > 128
                zc = (above[:, 1:] != above[:, :-1]).sum(axis=1)
                energy = ((fr - 128) ** 2).sum(axis=1)
                sil = energy < _SIL_TAU_SQ * _ZCR_FRAME
                cur = best = 0
                for s in sil:
                    cur = cur + 1 if s else 0
                    best = max(best, cur)
                rows.append(
                    (
                        int(doc_id),
                        int(n),
                        int(zc[0]) * 1000000 // (_ZCR_FRAME - 1),
                        int(zc.max()) * 1000000 // (_ZCR_FRAME - 1),
                        int(sil.sum()),
                        int(best),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_frames",
                    "zcr_first_ppm",
                    "zcr_max_ppm",
                    "n_silent",
                    "longest_silence",
                ],
            )

    return m.mapInPandas(
        kernel,
        "doc_id long, n_frames long, zcr_first_ppm long,"
        " zcr_max_ppm long, n_silent long, longest_silence long",
    ).orderBy("doc_id")


_II_W = 8  # embeddings are 64-dim → 8×8 grids


@query(
    "integral_image_boxsum",
    oracle=f"""
    WITH g AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
      FROM embeddings
    ), sat AS (
      SELECT vec_id, label, v,
             list_transform(range(0, {_II_W * _II_W}), k ->
               CAST(list_sum(list_transform(range(0, {_II_W * _II_W}),
                 k2 -> CASE WHEN k2 // {_II_W} <= k // {_II_W}
                             AND k2 % {_II_W} <= k % {_II_W}
                       THEN v[CAST(k2 + 1 AS INTEGER)] ELSE 0 END))
                 AS BIGINT)) AS ii
      FROM g
    ), boxes AS (
      SELECT vec_id, label,
             ii[{_II_W * _II_W}] AS total,
             ii[CAST(5 * {_II_W} + 6 AS INTEGER)]
               - ii[CAST(1 * {_II_W} + 6 AS INTEGER)]
               - ii[CAST(5 * {_II_W} + 2 AS INTEGER)]
               + ii[CAST(1 * {_II_W} + 2 AS INTEGER)] AS center_box,
             CAST(list_sum(list_transform(range(0, {_II_W * _II_W}),
               k -> CASE WHEN k // {_II_W} BETWEEN 2 AND 5
                          AND k % {_II_W} BETWEEN 2 AND 5
                     THEN v[CAST(k + 1 AS INTEGER)] ELSE 0 END))
               AS BIGINT) AS center_direct
      FROM sat
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(total) AS BIGINT) AS sum_total,
           CAST(sum(center_box) AS BIGINT) AS sum_center_box,
           CAST(sum(CASE WHEN center_box = center_direct THEN 1 ELSE 0
                    END) AS BIGINT) AS n_identity_ok
    FROM boxes GROUP BY label ORDER BY label
    """,
)
def integral_image_boxsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Summed-area table (integral image) over the 8×8 fixed-point
    grids the embedding vectors form: II(y,x) = Σ_{{y'≤y, x'≤x}} v and
    the O(1) box query II(y₂,x₂) − II(y₁−1,x₂) − II(y₂,x₁−1) +
    II(y₁−1,x₁−1) for the center 4×4 box — the constant-time-region-
    sum primitive behind Haar cascades, box blurs, and adaptive
    thresholding. Every grid also recomputes the center box directly
    and reports the identity match count — a built-in proof the SAT
    algebra is exact (it must be: all values are fixed-point int64).

    Determinism: pure integer prefix sums and differences — the Arrow
    kernel's np.cumsum over int64 and the oracle's masked list_sum are
    the same exact integers.

    Scale: r8 shipped this as a transform×aggregate Catalyst fold —
    O(W⁴) interpreted HOF steps per row (4,096 at W=8), the cost class
    the r8 verdict flagged (24.9× same-frame for 10× data, 320.9 s at
    sf10). Now the docstring's promised plan: the two-pass O(W²) SAT
    (row-prefix then column-prefix) as one vectorized np.cumsum pair
    inside an Arrow kernel (the JL-projection GEMM fix is the
    template), with per-batch LABEL PARTIALS so only (label, 4 int64)
    rows ever shuffle — map-side combine done in the kernel itself.
    """
    import numpy as np
    import pandas as pd

    g = load(spark, sf_dir, "embeddings").select(
        "label",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 10000).cast("long"),
        ).alias("v"),
    )
    w = _II_W

    def sat_partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = (
                np.stack(pdf["v"].to_numpy())
                .astype(np.int64)
                .reshape(-1, w, w)
            )
            # the SAT: row-prefix then column-prefix, O(W^2) per grid
            ii = V.cumsum(axis=1).cumsum(axis=2)
            part = pd.DataFrame(
                {
                    "label": pdf["label"].to_numpy(),
                    "total": ii[:, w - 1, w - 1],
                    "center_box": ii[:, 5, 5]
                    - ii[:, 1, 5]
                    - ii[:, 5, 1]
                    + ii[:, 1, 1],
                    "center_direct": V[:, 2:6, 2:6].sum(axis=(1, 2)),
                }
            )
            part["ok"] = (
                part["center_box"] == part["center_direct"]
            ).astype(np.int64)
            agg = part.groupby("label", as_index=False).agg(
                n=("total", "size"),
                sum_total=("total", "sum"),
                sum_center_box=("center_box", "sum"),
                n_identity_ok=("ok", "sum"),
            )
            yield agg

    # label keeps the source column's type (int32 in the parquet) so the
    # output schema is unchanged from the pre-kernel plan
    partials = g.mapInPandas(
        sat_partials,
        "label int, n long, sum_total long, sum_center_box long,"
        " n_identity_ok long",
    )
    return (
        partials.groupBy("label")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("sum_total").cast("bigint").alias("sum_total"),
            F.sum("sum_center_box").cast("bigint").alias("sum_center_box"),
            F.sum("n_identity_ok").cast("bigint").alias("n_identity_ok"),
        )
        .orderBy("label")
    )
