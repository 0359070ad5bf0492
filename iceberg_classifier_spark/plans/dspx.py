"""DSP/hash/number-theory wave 71: Goertzel detection, avalanche
quality, and key factor structure.

- `goertzel_tone_detect` — the Goertzel algorithm (the O(N) single-
  bin DFT behind DTMF detection) folded over each document's first
  64 byte-samples for bin k=5, WITH the direct cos/sin DFT computed
  alongside: the two must agree to 1e-6 relative on every document
  (an in-query mathematical identity certificate), summarized per
  language.
- `hash_avalanche_audit` — avalanche quality of the repo's portable
  md5 hash family: Hamming distance between the 52-bit hashes of
  adjacent keys, whose distribution must match Binomial(52, 1/2)
  (mean 26) for a well-mixing hash — the audit underwriting every
  hash-blocked operator in this engine.
- `key_prime_factor_audit` — smallest-prime-factor distribution of
  the order keys against the exact Eratosthenes densities
  (share with spf = p is (1/p) * prod over q < p of (1 - 1/q)) —
  synthetic-key randomness forensics in the `benford_digit_audit` /
  `price_ending_bias` family.

Determinism: byte samples are exact; both DFT forms are identical
IEEE recursions/sums; hashes and factor classes are exact integer
algebra; theoretical densities are Python-precomputed literals.

Scale: every operator is stateless per-row work (64-step fold /
hash pair / CASE chain) into small aggregates — embarrassingly
parallel, no shuffle beyond the final combines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.plans.pipeline_ops import _duck_hex_fold
from iceberg_classifier_spark.sources.tables import load

_GZ_N = 64
_GZ_K = 5
_GZ_COEF = f"(2.0 * cos(2.0 * 3.141592653589793 * {_GZ_K} / {_GZ_N}))"
_GZ_COS = f"cos(2.0 * 3.141592653589793 * {_GZ_K} / {_GZ_N})"


def _gz_step(a_fmt: str, x: str) -> str:
    """Goertzel recurrence s = x + coef*s1 - s2. Acc: [s1, s2]."""
    def a(i: int) -> str:
        return a_fmt.format(i=i)

    s_new = f"({x} + {_GZ_COEF} * {a(1)} - {a(2)})"
    return f"{s_new}, {a(1)}"


_GZ_DUCK = _gz_step("a[{i}]", "b[1]")
_GZ_SPARK = _gz_step("element_at(a, {i})", "x")


@query(
    "goertzel_tone_detect",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, lang,
             list_transform(generate_series(1, {_GZ_N}),
               i -> (ord(substr(text, CAST(i AS INTEGER), 1)) - 128)
                    / 128.0) AS xs
      FROM documents WHERE length(text) >= {_GZ_N}
    ), folded AS (
      SELECT doc_id, lang, xs,
             list_reduce(
               list_prepend([0.0, 0.0],
                 list_transform(xs, v -> [v])),
               (a, b) -> [{_GZ_DUCK}]) AS g
      FROM docs
    ), direct AS (
      SELECT doc_id, lang,
             g[1] * g[1] + g[2] * g[2]
               - {_GZ_COEF} * g[1] * g[2] AS p_goertzel,
             pow(list_sum(list_transform(generate_series(1, {_GZ_N}),
               n -> xs[n] * cos(2.0 * 3.141592653589793 * {_GZ_K}
                    * (n - 1) / {_GZ_N}))), 2)
             + pow(list_sum(list_transform(generate_series(1, {_GZ_N}),
               n -> xs[n] * sin(2.0 * 3.141592653589793 * {_GZ_K}
                    * (n - 1) / {_GZ_N}))), 2) AS p_direct
      FROM folded
    ), checked AS (
      SELECT lang,
             CAST(round(p_goertzel * 100) AS BIGINT) AS pg_centi,
             CASE WHEN p_direct > 1e-9
                  AND abs(p_goertzel / p_direct - 1) < 1e-6
                  THEN 1 ELSE 0 END AS agree,
             CASE WHEN p_direct > 1e-9 THEN 1 ELSE 0 END AS testable
      FROM direct
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(pg_centi) * 1.0 / count(*) / 100.0, 4)
             AS mean_bin5_power,
           CAST(sum(testable) AS BIGINT) AS n_testable,
           CAST(sum(agree) AS BIGINT) AS n_identity_ok,
           CAST(sum(agree) = sum(testable) AS BOOLEAN)
             AS identity_holds
    FROM checked GROUP BY lang ORDER BY lang
    """,
)
def goertzel_tone_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goertzel single-bin spectral detection (the O(N) DTMF-decoder
    algorithm) for bin k={_GZ_K} over each document's first {_GZ_N}
    byte-samples: the two-term recurrence
    s_n = x_n + 2cos(w) s_(n-1) - s_(n-2) yields bin power
    s1^2 + s2^2 - 2cos(w) s1 s2, and the DIRECT DFT (cos/sin sums)
    is computed alongside — the per-document identity
    |goertzel/direct - 1| < 1e-6 must hold wherever power is
    nonzero, making the operator self-certifying. Per-language
    summary. The recursive-filter complement of
    `multimodal_fft_dominant` (full spectrum) and `periodogram_daily`
    (business series).

    Determinism: samples are exact dyadic rationals; both engines
    fold the identical {_GZ_N}-step recurrence and identical direct
    sums; powers quantize to micro-units before the language mean.

    Scale: stateless per-document work (a 64-step fold + 128 trig
    terms) into a per-language aggregate — no shuffle of raw docs.
    """
    d = load(spark, sf_dir, "documents").where(
        F.length("text") >= _GZ_N
    )
    docs = d.select(
        "doc_id",
        "lang",
        F.expr(
            f"transform(sequence(1, {_GZ_N}),"
            " i -> (ascii(substring(text, i, 1)) - 128) / 128.0)"
        ).alias("xs"),
    )
    folded = docs.select(
        "doc_id",
        "lang",
        "xs",
        F.expr(
            "aggregate(xs, array(0D, 0D),"
            f" (a, x) -> array({_GZ_SPARK}))"
        ).alias("g"),
    )
    direct = folded.select(
        "lang",
        (
            F.expr("g[0] * g[0] + g[1] * g[1]")
            - F.expr(f"{_GZ_COEF} * g[0] * g[1]")
        ).alias("p_goertzel"),
        (
            F.pow(
                F.expr(
                    f"aggregate(transform(sequence(1, {_GZ_N}),"
                    f" n -> xs[n - 1] * cos(2.0 * 3.141592653589793"
                    f" * {_GZ_K} * (n - 1) / {_GZ_N})),"
                    " 0D, (acc, t) -> acc + t)"
                ),
                2,
            )
            + F.pow(
                F.expr(
                    f"aggregate(transform(sequence(1, {_GZ_N}),"
                    f" n -> xs[n - 1] * sin(2.0 * 3.141592653589793"
                    f" * {_GZ_K} * (n - 1) / {_GZ_N})),"
                    " 0D, (acc, t) -> acc + t)"
                ),
                2,
            )
        ).alias("p_direct"),
    )
    checked = direct.select(
        "lang",
        # centi-units: bin powers reach ~4e3, so 1e-16 relative libm
        # drift is ~4e-7 absolute — far below the 5e-3 rounding
        # boundary (micro-units flipped on ~half the docs)
        F.round(F.col("p_goertzel") * 100)
        .cast("bigint")
        .alias("pg_centi"),
        F.when(
            (F.col("p_direct") > 1e-9)
            & (F.abs(F.col("p_goertzel") / F.col("p_direct") - 1) < 1e-6),
            1,
        )
        .otherwise(0)
        .alias("agree"),
        F.when(F.col("p_direct") > 1e-9, 1).otherwise(0).alias("testable"),
    )
    return (
        checked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(
                F.sum("pg_centi") * 1.0 / F.count(F.lit(1)) / 100.0, 4
            ).alias("mean_bin5_power"),
            F.sum("testable").cast("bigint").alias("n_testable"),
            F.sum("agree").cast("bigint").alias("n_identity_ok"),
            (F.sum("agree") == F.sum("testable")).alias("identity_holds"),
        )
        .orderBy("lang")
    )


@query(
    "hash_avalanche_audit",
    oracle=f"""
    WITH hashes AS (
      SELECT o_orderkey AS k,
             {_duck_hex_fold("CAST(o_orderkey AS VARCHAR)", 13)} AS h1,
             {_duck_hex_fold("CAST(o_orderkey + 1 AS VARCHAR)", 13)}
               AS h2
      FROM orders
    ), dist AS (
      SELECT k, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hd
      FROM hashes
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(hd * 1.0), 6) AS mean_hamming,
           round(26.0, 6) AS expected_hamming,
           round(stddev_samp(hd * 1.0), 6) AS sd_hamming,
           CAST(min(hd) AS BIGINT) AS min_hamming,
           CAST(max(hd) AS BIGINT) AS max_hamming,
           round((avg(hd * 1.0) - 26.0)
                 / (sqrt(13.0) / sqrt(count(*))), 6) AS z_vs_binomial,
           CAST(abs((avg(hd * 1.0) - 26.0)
                / (sqrt(13.0) / sqrt(count(*)))) < 3 AS BOOLEAN)
             AS avalanche_ok
    FROM dist
    """,
)
def hash_avalanche_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avalanche quality of the repo's portable md5 hash family (the
    one behind every hash-blocked operator here): for each order
    key, the Hamming distance between the 52-bit hashes of k and
    k+1 — a minimal input perturbation. A well-mixing hash gives
    Binomial(52, 1/2) distances: mean 26, variance 13; the z-test
    of the observed mean against that null is the pass/fail.
    Complements `hash_collision_audit` (output collisions) with the
    INPUT-sensitivity axis.

    Determinism: hashes and bit counts are exact integer algebra;
    the z statistic is one closed form of exact moments.

    Scale: two hashes + one XOR/popcount per row, stateless map
    work into a single moment aggregate.
    """
    o = load(spark, sf_dir, "orders")

    def h(expr: F.Column) -> F.Column:
        return F.conv(
            F.substring(F.md5(expr.cast("string")), 1, 13), 16, 10
        ).cast("bigint")

    dist = o.select(
        F.expr(
            "bit_count("
            "CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1,"
            " 13), 16, 10) AS BIGINT)"
            " ^ CAST(conv(substring(md5(CAST(o_orderkey + 1 AS STRING))"
            ", 1, 13), 16, 10) AS BIGINT))"
        )
        .cast("bigint")
        .alias("hd")
    )
    z = (F.avg(F.col("hd") * 1.0) - 26.0) / (
        F.sqrt(F.lit(13.0)) / F.sqrt(F.count(F.lit(1)))
    )
    return dist.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.avg(F.col("hd") * 1.0), 6).alias("mean_hamming"),
        F.round(F.lit(26.0), 6).alias("expected_hamming"),
        F.round(F.stddev_samp(F.col("hd") * 1.0), 6).alias("sd_hamming"),
        F.min("hd").cast("bigint").alias("min_hamming"),
        F.max("hd").cast("bigint").alias("max_hamming"),
        F.round(z, 6).alias("z_vs_binomial"),
        (F.abs(z) < 3).alias("avalanche_ok"),
    )


_PRIMES = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]


def _spf_density(p: int) -> float:
    dens = 1.0 / p
    for q in _PRIMES:
        if q >= p:
            break
        dens *= 1.0 - 1.0 / q
    return dens


_SPF_CASE = (
    "CASE "
    + " ".join(
        f"WHEN k % {p} = 0 THEN {p}" for p in _PRIMES
    )
    + " ELSE 0 END"
)


@query(
    "key_prime_factor_audit",
    oracle=f"""
    WITH keys AS (
      SELECT o_orderkey AS k FROM orders
    ), spf AS (
      SELECT CAST({_SPF_CASE} AS BIGINT) AS p FROM keys
    ), counts AS (
      SELECT p, CAST(count(*) AS BIGINT) AS n FROM spf GROUP BY 1
    ), theory AS (
      {" UNION ALL ".join(
          f"SELECT CAST({p} AS BIGINT) AS p, {_spf_density(p)!r} AS th"
          for p in _PRIMES
      )}
      UNION ALL SELECT 0, {1.0 - sum(_spf_density(p) for p in _PRIMES)!r}
    ), tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM counts)
    SELECT t.p AS smallest_prime_factor,
           COALESCE(c.n, 0) AS n_keys,
           round(COALESCE(c.n, 0) * 1.0 / tot.nn, 6) AS observed_share,
           round(t.th, 6) AS theoretical_share,
           round(abs(COALESCE(c.n, 0) * 1.0 / tot.nn - t.th), 6)
             AS abs_gap
    FROM theory t LEFT JOIN counts c ON c.p = t.p CROSS JOIN tot
    ORDER BY smallest_prime_factor
    """,
)
def key_prime_factor_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smallest-prime-factor census of the order keys against the
    exact sieve densities: the share of integers whose smallest
    prime factor is p equals (1/p) prod over primes q < p of
    (1 - 1/q) (~1/2 for 2, ~1/6 for 3, ...), with class 0 for keys
    {_PRIMES[-1]}-rough (no factor <= {_PRIMES[-1]}). Large gaps
    flag structured key generators (sequential-with-stride, parity-
    biased allocators) that break hash- and modulo-based sampling —
    the number-theoretic sibling of `benford_digit_audit` and
    `price_ending_bias`.

    Determinism: the factor class is one exact CASE chain; densities
    are Python-precomputed literals; all counts exact int64.

    Scale: one stateless map pass over the keys into a <=11-row
    class frame.
    """
    o = load(spark, sf_dir, "orders")
    spf = o.select(
        F.expr(_SPF_CASE.replace("k %", "o_orderkey %"))
        .cast("bigint")
        .alias("p")
    )
    counts = spf.groupBy("p").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    rows = [(p, _spf_density(p)) for p in _PRIMES]
    rows.append((0, 1.0 - sum(_spf_density(p) for p in _PRIMES)))
    theory = spark.createDataFrame(rows, ["p", "th"]).select(
        F.col("p").cast("bigint").alias("p"), "th"
    )
    tot = counts.agg(F.sum("n").cast("bigint").alias("nn"))
    return (
        theory.join(counts, "p", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("p").alias("smallest_prime_factor"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_keys"),
            F.round(
                F.coalesce(F.col("n"), F.lit(0)) * 1.0 / F.col("nn"), 6
            ).alias("observed_share"),
            F.round("th", 6).alias("theoretical_share"),
            F.round(
                F.abs(
                    F.coalesce(F.col("n"), F.lit(0)) * 1.0 / F.col("nn")
                    - F.col("th")
                ),
                6,
            ).alias("abs_gap"),
        )
        .orderBy("smallest_prime_factor")
    )
