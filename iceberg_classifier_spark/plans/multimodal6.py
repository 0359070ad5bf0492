"""Multimodal wave 53: real PNG decode and mu-law companding.

- `multimodal_png_decode` — each document's bytes become the pixels
  of a REAL PNG file (signature, IHDR, zlib IDAT with genuine
  CRC-32s, None/Sub/Up scanline filters), decoded back by the
  pure-numpy+zlib parser in functions/imaging.py; per-image stats
  come off the DECODED array, so the values match the byte-derived
  oracle only if chunk walk, CRC verify, inflate, and unfiltering
  are all correct. Completes the real-codec family
  (BMP / PPM / WAV / PNG).
- `multimodal_mulaw_snr` — continuous mu-law (mu=255) companding of
  each document's byte stream as PCM in [-1, 1): encode to 8-bit,
  expand back, report the per-language signal-to-quantization-noise
  ratio — the telephony (G.711-family) DSP kernel as an
  Arrow-batched numpy op with a full SQL oracle.

Determinism: PNG stats reduce to exact integer byte sums; mu-law
signal power is an exact dyadic sum, quantization uses the shared
floor(v+0.5) rule, and per-doc SNR quantizes to micro-dB before the
per-language exact mean.

Scale: both ops are one Arrow-batched mapInPandas over the scan
(per-row numpy work, a few scalars out per doc); aggregation frames
are language-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_PNG_W = 8
_PNG_MAX_H = 8


@query(
    "multimodal_png_decode",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, text,
             least(length(text) // {3 * _PNG_W}, {_PNG_MAX_H}) AS h
      FROM documents
      WHERE length(text) >= {3 * _PNG_W} AND doc_id % 3 = 1
    ), px AS (
      SELECT doc_id, h, h * {3 * _PNG_W} AS npx,
             list_transform(generate_series(1, h * {3 * _PNG_W}),
                            i -> ord(substr(text, CAST(i AS INTEGER), 1)))
               AS b
      FROM m
    )
    SELECT doc_id,
           CAST({_PNG_W} AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           TRUE AS crc_checked,
           round(CAST(list_sum(b) AS DOUBLE) / npx, 6) AS mean_pixel,
           CAST(list_sum(b[1:{3 * _PNG_W}]) AS BIGINT) AS first_row_sum,
           CAST(list_sum(b[(npx - {3 * _PNG_W} + 1):npx]) AS BIGINT)
             AS last_row_sum
    FROM px ORDER BY doc_id
    """,
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-format PNG decode: each sampled document's bytes become
    the pixel array of a genuine PNG (8-byte signature, IHDR, one
    zlib-deflated IDAT, IEND — every chunk carrying its real CRC-32,
    scanlines filtered None/Sub/Up by row), which
    functions/imaging.py:decode_png parses back: chunk walk with
    CRC verification, inflate, and all-five-filter unfiltering.
    Stats come off the DECODED array, and the oracle derives the
    same numbers straight from the source bytes — they agree only
    if the whole codec path is correct (the Sub/Up rows make
    skipping unfiltering detectably wrong, and first/last row sums
    pin scanline order). Cites reference main.py:49-66 (its decode
    is JSON floats; this is the binary-corpus analogue).

    Scale: encode+decode+stats run inside ONE Arrow-batched
    mapInPandas (numpy + stdlib zlib per image, rows <= 8x8); no
    Spark-side explode; 6 scalars per doc out; the orderBy is the
    presentation edge.
    """
    import numpy as np
    import pandas as pd

    from iceberg_classifier_spark.functions.imaging import (
        decode_image as _decode,
        encode_png as _enc,
    )

    m = (
        load(spark, sf_dir, "documents")
        .where((F.length("text") >= 3 * _PNG_W) & (F.col("doc_id") % 3 == 1))
        .select("doc_id", F.col("text").cast("binary").alias("payload"))
    )

    def stats(batches):
        for pdf in batches:
            ids, ws, hs, mp, fr, lr = [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                h = min(len(b) // (3 * _PNG_W), _PNG_MAX_H)
                pix = np.frombuffer(
                    b, np.uint8, count=h * 3 * _PNG_W
                ).reshape(h, _PNG_W, 3)
                img = _decode(_enc(pix))  # real PNG bytes through sniffer
                ids.append(doc_id)
                ws.append(img.shape[1])
                hs.append(img.shape[0])
                mp.append(int(img.sum(dtype=np.int64)) / img.size)
                fr.append(int(img[0].sum(dtype=np.int64)))
                lr.append(int(img[-1].sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "crc_checked": [True] * len(ids),
                    "mean_pixel": mp,
                    "first_row_sum": fr,
                    "last_row_sum": lr,
                }
            )

    return (
        m.mapInPandas(
            stats,
            "doc_id long, width int, height int, crc_checked boolean, "
            "mean_pixel double, first_row_sum long, last_row_sum long",
        )
        .select(
            "doc_id",
            "width",
            "height",
            "crc_checked",
            F.round("mean_pixel", 6).alias("mean_pixel"),
            "first_row_sum",
            "last_row_sum",
        )
        .orderBy("doc_id")
    )


_MU = 255.0


@query(
    "multimodal_mulaw_snr",
    oracle=f"""
    WITH samples AS (
      SELECT doc_id, lang,
             list_transform(generate_series(1, length(text)),
               i -> (ord(substr(text, CAST(i AS INTEGER), 1)) - 128)
                    / 128.0) AS xs
      FROM documents
    ), coded AS (
      SELECT doc_id, lang, len(xs) AS n,
             list_sum(list_transform(xs, x -> x * x)) AS signal,
             list_sum(list_transform(xs, x ->
               pow(x - (CASE WHEN x = 0 THEN 0.0
                 ELSE (CASE WHEN x < 0 THEN -1.0 ELSE 1.0 END)
                   * (exp(abs(floor((CASE WHEN x < 0 THEN -1.0
                        ELSE 1.0 END)
                        * ln(1 + {_MU} * abs(x)) / ln(1 + {_MU})
                        * 127 + 0.5)) / 127 * ln(1 + {_MU})) - 1)
                   / {_MU} END), 2))) AS err
      FROM samples
    ), perdoc AS (
      SELECT lang,
             CAST(round(CASE WHEN err <= 0 THEN 999.0
               ELSE 10 * ln(signal / err) / ln(10.0) END * 1000000)
               AS BIGINT) AS snr_micro
      FROM coded WHERE signal > 0
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(snr_micro) * 1.0 / count(*) / 1000000.0, 6)
             AS mean_snr_db,
           round(min(snr_micro) / 1000000.0, 6) AS min_snr_db,
           round(max(snr_micro) / 1000000.0, 6) AS max_snr_db
    FROM perdoc GROUP BY lang ORDER BY lang
    """,
)
def multimodal_mulaw_snr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous mu-law (mu=255) companding of each document's byte
    stream interpreted as PCM in [-1, 1): encode
    y = floor(sign(x) ln(1+mu|x|)/ln(1+mu) * 127 + 0.5) to 8 bits,
    expand x' = sign(y)(e^(|y|/127 ln(1+mu)) - 1)/mu, and report the
    per-language signal-to-quantization-noise ratio — logarithmic
    companding holds SNR roughly flat across levels, which is why
    telephony (G.711 family) uses it; a linear 8-bit quantizer would
    collapse on quiet signals. The companding complement of
    `quantize_embeddings_int8` (linear) and `multimodal_audio_rms`
    (level metering).

    Determinism: signal power is an exact dyadic sum (each x^2 =
    k/16384); quantization uses the shared floor(v+0.5) rule so both
    engines pick identical codes; per-doc SNR quantizes to micro-dB
    before the exact per-language mean.

    Scale: the Spark side is ONE Arrow-batched mapInPandas running
    the vectorized numpy companding kernel (the real DSP path —
    no per-sample Python); 2 scalars per doc out, language-bounded
    aggregation after.
    """
    import numpy as np
    import pandas as pd

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("text").cast("binary").alias("payload")
    )

    def kernel(batches):
        lnmu = float(np.log(1.0 + _MU))
        for pdf in batches:
            langs, sigs, errs = [], [], []
            for lang, payload in zip(pdf["lang"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), np.uint8)
                x = (b.astype(np.float64) - 128.0) / 128.0
                s = np.sign(x)
                # np.log(1 + v), NOT log1p: the oracle's ln(1 + v) must
                # see the identical double or a boundary code can flip
                y = np.floor(
                    s * np.log(1.0 + _MU * np.abs(x)) / lnmu * 127 + 0.5
                )
                xr = np.sign(y) * (np.exp(np.abs(y) / 127 * lnmu) - 1) / _MU
                langs.append(lang)
                sigs.append(float(np.sum(x * x)))
                errs.append(float(np.sum((x - xr) ** 2)))
            yield pd.DataFrame(
                {"lang": langs, "signal": sigs, "err": errs}
            )

    coded = d.mapInPandas(kernel, "lang string, signal double, err double")
    perdoc = coded.where(F.col("signal") > 0).select(
        "lang",
        F.round(
            F.when(F.col("err") <= 0, 999.0).otherwise(
                10 * F.log(F.col("signal") / F.col("err")) / F.log(F.lit(10.0))
            )
            * 1000000
        )
        .cast("bigint")
        .alias("snr_micro"),
    )
    return (
        perdoc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(
                F.sum("snr_micro") * 1.0 / F.count(F.lit(1)) / 1000000.0, 6
            ).alias("mean_snr_db"),
            F.round(F.min("snr_micro") / 1000000.0, 6).alias("min_snr_db"),
            F.round(F.max("snr_micro") / 1000000.0, 6).alias("max_snr_db"),
        )
        .orderBy("lang")
    )
