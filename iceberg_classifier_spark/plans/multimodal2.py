"""Multimodal wave 2: spectral analysis (FFT) over the audio path.

The dominant-frequency job is the canonical audio feature extractor:
decode PCM, window, FFT, pick the peak bin. Here each clip is
synthesized at a doc-derived fundamental plus a half-amplitude second
harmonic, round-tripped through the real RIFF/WAVE codec, and analyzed
with numpy's rfft — while the DuckDB oracle predicts the answer
ANALYTICALLY (the fundamental bin, its frequency in Hz, and the 2:1
magnitude ratio). The values only match if the codec roundtrip and the
spectral pipeline are both correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_FFT_N = 64  # samples per clip (power of two, exact bins)
_FFT_RATE = 8000
_FFT_A = 12000  # fundamental amplitude (int16 headroom for the sum)
_FFT_H = 6000  # second-harmonic amplitude (exact 2:1 ratio)


@query(
    "multimodal_fft_dominant",
    oracle=f"""
    SELECT doc_id,
           CAST(3 + doc_id % 13 AS BIGINT) AS synth_bin,
           CAST(3 + doc_id % 13 AS BIGINT) AS dominant_bin,
           CAST((3 + doc_id % 13) * {_FFT_RATE} // {_FFT_N} AS BIGINT)
             AS dominant_hz,
           0 = 0 AS bins_match,
           CAST(2.0 AS DOUBLE) AS harmonic_ratio_r1
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_fft_dominant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-frequency extraction over synthesized audio clips: each
    document id seeds a {_FFT_N}-sample PCM16 clip — a fundamental at
    bin 3+(id%13) (amplitude {_FFT_A}) plus its second harmonic at
    half amplitude — which round-trips through the REAL RIFF/WAVE codec
    (functions/audio.py) and then through numpy's rfft inside an
    Arrow-batched mapInPandas kernel; the job reports the argmax
    spectral bin, its Hz, and the fundamental:harmonic magnitude ratio.
    The oracle never runs an FFT — it predicts every output
    analytically (exact-bin sines under a rectangular window put
    |X[f]| = N·A/2 exactly, so the ratio is 2.0 and the argmax is the
    fundamental) — which means a wrong codec byte order, an off-by-one
    bin, or a mis-scaled spectrum all fail the value check.

    Scale: map-only Arrow kernel (no shuffle before the output sort);
    this decode→window→FFT→argmax shape is exactly the 100 TB
    audio-featurization job, with the synthesized clip standing in for
    a real binary column (the container has no audio libs — the codec
    and FFT are numpy-only and real).
    """
    import numpy as np
    import pandas as pd

    from iceberg_classifier_spark.functions.audio import decode_wav, encode_wav

    m = load(spark, sf_dir, "documents").select("doc_id")

    def kernel(batches):
        k = np.arange(_FFT_N)
        for pdf in batches:
            ids, sb, db, hz, match, ratio = [], [], [], [], [], []
            for doc_id in pdf["doc_id"]:
                f0 = 3 + int(doc_id) % 13
                sig = np.round(
                    _FFT_A * np.sin(2 * np.pi * f0 * k / _FFT_N)
                    + _FFT_H * np.sin(2 * np.pi * 2 * f0 * k / _FFT_N)
                ).astype("<i2")
                rate, dec = decode_wav(encode_wav(sig, _FFT_RATE))
                spec = np.abs(np.fft.rfft(dec.astype(np.float64)))
                dom = int(spec[1:].argmax()) + 1  # skip DC
                ids.append(int(doc_id))
                sb.append(f0)
                db.append(dom)
                hz.append(dom * rate // _FFT_N)
                match.append(dom == f0)
                ratio.append(round(float(spec[f0] / spec[2 * f0]), 1))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "synth_bin": sb,
                    "dominant_bin": db,
                    "dominant_hz": hz,
                    "bins_match": match,
                    "harmonic_ratio_r1": ratio,
                }
            )

    return (
        m.mapInPandas(
            kernel,
            "doc_id long, synth_bin long, dominant_bin long,"
            " dominant_hz long, bins_match boolean,"
            " harmonic_ratio_r1 double",
        )
        .orderBy("doc_id")
    )
