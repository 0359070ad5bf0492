"""Multimodal wave 5: spectral shape features and the DCT perceptual
hash.

`audio_spectral_centroid` extends the FFT path (multimodal2) from
"which bin peaks" to the spectral-SHAPE features real audio curation
filters on — centroid, bandwidth, rolloff — against a fully ANALYTIC
oracle (two exact-bin tones make every feature a closed-form rational
of the fundamental). `image_phash_dct` is the classic pHash: 2-D
DCT-II of an 8x8 tile, low-frequency block, median-threshold bits —
computed with numpy GEMM on the Spark side and re-derived in pure SQL
folds on the oracle side from the SAME literal cosine basis (the
`rotate_augment` shared-literal-grid trick), so a wrong basis, scan
order, or threshold flips the hash and fails the value check.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_SC_N = 64  # samples per clip
_SC_RATE = 8000
_SC_A = 12000  # fundamental amplitude
_SC_H = 6000  # 3rd-harmonic amplitude (exact 2:1)
_SC_GATE = 0.01  # noise gate: drop bins < 1% of peak


@query(
    "audio_spectral_centroid",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, CAST(2 + doc_id % 9 AS BIGINT) AS f0
      FROM documents
    )
    SELECT doc_id, f0,
           round(5.0 * f0 / 3 * {_SC_RATE} / {_SC_N}, 2)
             AS centroid_hz,
           round(sqrt(8.0) / 3 * f0 * {_SC_RATE} / {_SC_N}, 2)
             AS bandwidth_hz,
           CAST(3 * f0 AS BIGINT) AS rolloff85_bin,
           CAST(3 * f0 * {_SC_RATE} / {_SC_N} AS BIGINT) AS rolloff85_hz
    FROM base
    ORDER BY doc_id
    """,
)
def audio_spectral_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral-shape features over synthesized audio: each doc seeds
    a PCM16 clip with a fundamental at bin f0 = 2+(id%9) and a
    half-amplitude 3rd harmonic; after the RIFF/WAVE roundtrip
    (functions/audio.py) and rfft, a 1%-of-peak noise gate isolates
    the two signal bins and the job reports spectral centroid,
    bandwidth, and the 85% rolloff — the shape features audio
    curation pipelines filter on (speech vs music vs noise). The
    oracle computes every value ANALYTICALLY: exact-bin tones under a
    rectangular window give |X[f0]| = N·A/2 and |X[3f0]| = N·H/2, so
    centroid = (5/3)f0·Δf, bandwidth = (√8/3)f0·Δf, and the 85%
    rolloff lands exactly on the harmonic (cumulative 2/3 < 0.85 at
    f0). Codec byte order, gate, or magnitude-weighting bugs all
    break the closed forms.

    Determinism: the int16 rounding noise sits ~5 orders below the
    gated bins; surviving magnitudes are exact rationals of N·A/2,
    making 2dp rounding stable
    (the residual leakage into the signal bins is ~1e-3 Hz).

    Scale: map-only Arrow kernel, no shuffle before the output sort
    — the 100 TB audio-featurization shape.
    """
    import numpy as np
    import pandas as pd

    from iceberg_classifier_spark.functions.audio import (
        decode_wav,
        encode_wav,
    )

    m = load(spark, sf_dir, "documents").select("doc_id")

    def kernel(batches):
        k = np.arange(_SC_N)
        dfreq = _SC_RATE / _SC_N
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                f0 = 2 + int(doc_id) % 9
                sig = np.round(
                    _SC_A * np.sin(2 * np.pi * f0 * k / _SC_N)
                    + _SC_H * np.sin(2 * np.pi * 3 * f0 * k / _SC_N)
                ).astype("<i2")
                rate, dec = decode_wav(encode_wav(sig, _SC_RATE))
                spec = np.abs(np.fft.rfft(dec.astype(np.float64)))
                spec[0] = 0.0  # drop DC
                spec[spec < _SC_GATE * spec.max()] = 0.0
                # integer-magnitude quantization: exact-bin tones have
                # |X| = N*A/2, an exact multiple of N; snapping the
                # surviving bins to multiples of N removes the int16
                # rounding leakage (±3 of 384000) entirely
                spec = np.round(spec / _SC_N) * _SC_N
                bins = np.arange(len(spec), dtype=np.float64)
                tot = spec.sum()
                cent = (bins * spec).sum() / tot
                bw = math.sqrt(
                    ((bins - cent) ** 2 * spec).sum() / tot
                )
                cum = np.cumsum(spec)
                roll = int(np.searchsorted(cum, 0.85 * tot))
                rows.append(
                    (
                        int(doc_id),
                        f0,
                        round(cent * dfreq, 2),
                        round(bw * dfreq, 2),
                        roll,
                        int(roll * rate / _SC_N),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "f0",
                    "centroid_hz",
                    "bandwidth_hz",
                    "rolloff85_bin",
                    "rolloff85_hz",
                ],
            )

    return m.mapInPandas(
        kernel,
        "doc_id long, f0 long, centroid_hz double, bandwidth_hz double,"
        " rolloff85_bin long, rolloff85_hz long",
    ).orderBy("doc_id")


# orthonormal DCT-II basis B[u][i] = alpha(u) cos((2i+1) u pi / 16),
# materialized once as Python float literals so the numpy kernel and
# the SQL oracle consume bit-identical constants
_DCT_B = [
    [
        (math.sqrt(1.0 / 8) if u == 0 else math.sqrt(2.0 / 8))
        * math.cos((2 * i + 1) * u * math.pi / 16)
        for i in range(8)
    ]
    for u in range(8)
]
_PH_CLASSES = 25
_PH_COEFFS = [(u, v) for u in range(4) for v in range(4) if (u, v) != (0, 0)]


def _phash_coeff_sql(u: int, v: int) -> str:
    """SQL for DCT coefficient (u,v) of the 64-pixel list `p`
    (1-based), as a sum over rows of basis-weighted column sums."""
    outer = []
    for i in range(8):
        inner = " + ".join(
            f"p[{i * 8 + j + 1}] * {_DCT_B[v][j]!r}" for j in range(8)
        )
        outer.append(f"{_DCT_B[u][i]!r} * ({inner})")
    return " + ".join(outer)


def _phash_oracle() -> str:
    coeffs = ",\n             ".join(
        f"round({_phash_coeff_sql(u, v)}, 6) AS c_{u}_{v}"
        for u, v in _PH_COEFFS
    )
    clist = ", ".join(f"c_{u}_{v}" for u, v in _PH_COEFFS)
    bits = " + ".join(
        f"CASE WHEN c_{u}_{v} > med THEN CAST({1 << k} AS BIGINT)"
        f" ELSE 0 END"
        for k, (u, v) in enumerate(_PH_COEFFS)
    )
    return f"""
    WITH classes AS (
      SELECT doc_id % {_PH_CLASSES} AS cls,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY 1
    ), tiles AS (
      SELECT cls, n_docs,
             list_transform(range(0, 64),
               idx -> CAST((cls * 131 + idx * 37) % 256 AS DOUBLE)) AS p
      FROM classes
    ), coefs AS (
      SELECT cls, n_docs,
             {coeffs}
      FROM tiles
    ), meds AS (
      SELECT cls, n_docs,
             list_sort([{clist}])[8] AS med,
             {clist}
      FROM coefs
    )
    SELECT cls AS class_id, n_docs,
           CAST({bits} AS BIGINT) AS phash15
    FROM meds
    ORDER BY class_id
    """


@query("image_phash_dct", oracle=_phash_oracle())
def image_phash_dct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual DCT hash (pHash): each of the {_PH_CLASSES} tile
    classes (8x8 synthetic grayscale tiles keyed by doc_id mod 25)
    runs through the orthonormal 2-D DCT-II; the 4x4 low-frequency
    block minus DC gives 15 coefficients; bits are coefficient >
    median (8th order statistic of 15) in (u,v) scan order — the
    standard near-duplicate image fingerprint, robust to brightness
    and high-frequency noise where aHash (multimodal_image_ahash) is
    not. The Spark side computes the DCT as one numpy GEMM (B P B^T)
    per tile inside mapInPandas; the oracle re-derives every
    coefficient in pure SQL folds from the SAME literal cosine basis
    — transposed basis, wrong scan order, or an off-median threshold
    all change phash15 and fail the value check.

    Determinism: both sides share literal basis constants and round
    coefficients to 6dp before comparison (coefficient gaps are O(1);
    GEMM-vs-SQL summation order differs far below the rounding).

    Scale: the hash is computed once per tile CLASS (bounded dim),
    then joined back to doc counts map-side — at 100 TB the same
    kernel runs per image over a binary column, and the hash feeds
    the banded Hamming join `image_ahash_neardup` already exercises.
    """
    import numpy as np
    import pandas as pd

    d = load(spark, sf_dir, "documents")
    classes = d.groupBy(
        (F.col("doc_id") % _PH_CLASSES).alias("cls")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))

    B = np.array(_DCT_B, dtype=np.float64)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for cls, n_docs in zip(pdf["cls"], pdf["n_docs"]):
                idx = np.arange(64, dtype=np.int64)
                tile = ((int(cls) * 131 + idx * 37) % 256).astype(
                    np.float64
                ).reshape(8, 8)
                C = B @ tile @ B.T
                vals = np.array(
                    [round(float(C[u, v]), 6) for u, v in _PH_COEFFS]
                )
                med = float(np.sort(vals)[7])
                h = 0
                for k, x in enumerate(vals):
                    if x > med:
                        h |= 1 << k
                rows.append((int(cls), int(n_docs), h))
            yield pd.DataFrame(
                rows, columns=["class_id", "n_docs", "phash15"]
            )

    return classes.mapInPandas(
        kernel, "class_id long, n_docs long, phash15 long"
    ).orderBy("class_id")
