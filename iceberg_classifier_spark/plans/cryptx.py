"""Crypto wave 74: Shamir secret sharing, exactly audited.

- `shamir_secret_sharing_audit` — (3,2)-threshold Shamir sharing of
  each order's low byte over GF(257): coefficients from the
  portable hash, shares y_i = s + a1 x + a2 x^2 (mod 257) at
  x = 1,2,3, Lagrange reconstruction at 0 from all three shares
  (the fixed-weight identity s = 3y1 - 3y2 + y3 mod 257), which
  must recover EVERY secret; and the under-threshold 'attack'
  (two shares read as a degree-1 polynomial) which must succeed
  only at the chance rate ~1/257 — both properties value-checked
  over the whole table. Pure modular arithmetic, no crypto library.

Determinism: secrets, coefficients, shares, and reconstructions are
exact integer algebra off the portable md5 hash.

Scale: stateless per-row modular math into a 2-rate aggregate —
embarrassingly parallel; the same plan shards keys at any volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.plans.pipeline_ops import _duck_hex_fold
from iceberg_classifier_spark.sources.tables import load

_P = 257


def _coef_duck(salt: str) -> str:
    fold = _duck_hex_fold(f"'{salt}:' || CAST(o_orderkey AS VARCHAR)", 13)
    return f"({fold} % {_P})"


@query(
    "shamir_secret_sharing_audit",
    oracle=f"""
    WITH shared AS (
      SELECT o_orderkey % {_P} AS s,
             {_coef_duck("sa1")} AS a1,
             {_coef_duck("sa2")} AS a2
      FROM orders
    ), shares AS (
      SELECT s,
             (s + a1 * 1 + a2 * 1) % {_P} AS y1,
             (s + a1 * 2 + a2 * 4) % {_P} AS y2,
             (s + a1 * 3 + a2 * 9) % {_P} AS y3,
             a2
      FROM shared
    ), recon AS (
      SELECT s, a2,
             ((3 * y1 - 3 * y2 + y3) % {_P} + {_P}) % {_P} AS s3,
             ((2 * y1 - y2) % {_P} + {_P}) % {_P} AS s2
      FROM shares
    )
    SELECT CAST(count(*) AS BIGINT) AS n_secrets,
           CAST(sum(CASE WHEN s3 = s THEN 1 ELSE 0 END) AS BIGINT)
             AS n_reconstructed,
           CAST(sum(CASE WHEN s3 = s THEN 1 ELSE 0 END) = count(*)
             AS BOOLEAN) AS all_reconstructed,
           CAST(sum(CASE WHEN s2 = s THEN 1 ELSE 0 END) AS BIGINT)
             AS n_two_share_hits,
           round(sum(CASE WHEN s2 = s THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS two_share_hit_rate,
           round(1.0 / {_P}, 6) AS chance_rate,
           CAST(sum(CASE WHEN a2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_degenerate_polys
    FROM recon
    """,
)
def shamir_secret_sharing_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(3,2)-threshold Shamir secret sharing over GF({_P}) audited on
    every order: the secret is the key's residue, the quadratic's
    coefficients come from the portable md5 hash (reproducible
    randomness), shares evaluate the polynomial at x = 1,2,3, and
    reconstruction uses the fixed Lagrange-at-zero identity
    s = 3y1 - 3y2 + y3 (mod {_P}). Both defining properties are
    value-checked table-wide: three shares recover EVERY secret
    (all_reconstructed must be true), while two shares — read as the
    best degree-1 guess 2y1 - y2 — succeed only when a2 = 0, i.e.
    at the ~1/{_P} chance rate (two_share_hit_rate equals
    n_degenerate_polys / n, the information-theoretic hiding
    guarantee made measurable). Joins `verhoeff_checksum_audit` and
    `hash_chain_audit` in the integrity/crypto family.

    Determinism: everything is exact modular integer algebra off
    the portable hash.

    Scale: one stateless map pass into a single aggregate row — the
    identical plan shards secrets at any key volume.
    """
    o = load(spark, sf_dir, "orders")

    def coef(salt: str) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{salt}:"),
                            F.col("o_orderkey").cast("string"),
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("bigint")
            % _P
        )

    shared = o.select(
        (F.col("o_orderkey") % _P).alias("s"),
        coef("sa1").alias("a1"),
        coef("sa2").alias("a2"),
    )
    shares = shared.select(
        "s",
        "a2",
        ((F.col("s") + F.col("a1") * 1 + F.col("a2") * 1) % _P).alias("y1"),
        ((F.col("s") + F.col("a1") * 2 + F.col("a2") * 4) % _P).alias("y2"),
        ((F.col("s") + F.col("a1") * 3 + F.col("a2") * 9) % _P).alias("y3"),
    )
    recon = shares.select(
        "s",
        "a2",
        (
            ((3 * F.col("y1") - 3 * F.col("y2") + F.col("y3")) % _P + _P)
            % _P
        ).alias("s3"),
        (((2 * F.col("y1") - F.col("y2")) % _P + _P) % _P).alias("s2"),
    )
    return recon.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_secrets"),
        F.sum(F.when(F.col("s3") == F.col("s"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_reconstructed"),
        (
            F.sum(F.when(F.col("s3") == F.col("s"), 1).otherwise(0))
            == F.count(F.lit(1))
        ).alias("all_reconstructed"),
        F.sum(F.when(F.col("s2") == F.col("s"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_two_share_hits"),
        F.round(
            F.sum(F.when(F.col("s2") == F.col("s"), 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("two_share_hit_rate"),
        F.round(F.lit(1.0 / _P), 6).alias("chance_rate"),
        F.sum(F.when(F.col("a2") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_degenerate_polys"),
    )
