"""Graph/DQ/estimation wave 60: SimRank, the Verhoeff automaton, and
serial-number estimation.

- `simrank_nations` — SimRank (Jeh-Widom) structural similarity on
  the directed nation-level trade graph (supplier nation -> customer
  nation), 5 iterations of s(a,b) = C/(|I(a)||I(b)|) sum over
  in-neighbor pairs, run as chained sparse-frame query stages;
  reports the top similar nation pairs.
- `verhoeff_checksum_audit` — the Verhoeff dihedral-group check
  digit computed AND re-verified in-query for every order key: the
  d-table folds in closed form over D5 (rotation/reflection
  algebra), the permutation table as a generated 8x10 CASE; the
  round-trip validity share must be exactly 1 — a self-certifying
  table-driven automaton, the stronger sibling of
  `luhn_checksum_audit`.
- `keyspace_cardinality_estimate` — the German-tank (serial-number)
  estimator of the maximum order key from a deterministic 1-in-7
  key sample: m + m/k - 1, with the relative error against the true
  maximum — the classic trick for estimating unseen keyspace from
  samples.

Determinism: edges/in-degrees/digits/keys are exact integers; the
SimRank sums span bounded in-neighbor pairs; the Verhoeff fold is
pure integer group algebra.

Scale: SimRank reduces the fact table to a <=625-cell nation-pair
frame (ONE pass) and iterates there; Verhoeff is a stateless
per-row fold (embarrassingly parallel); the estimator is one
filtered aggregation with the predicate on the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_SR_C = 0.8
_SR_ITERS = 5
_SR_TOPK = 10


def _simrank_oracle() -> str:
    head = """
    WITH edges AS MATERIALIZED (
      SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE s.s_nationkey <> c.c_nationkey
    ), indeg AS MATERIALIZED (
      SELECT dst, CAST(count(*) AS BIGINT) AS din
      FROM edges GROUP BY 1
    ), s0 AS MATERIALIZED (
      SELECT dst AS a, dst AS b, 1.0 AS s FROM indeg
    )"""
    steps = []
    for t in range(1, _SR_ITERS + 1):
        steps.append(f"""
    , u{t} AS MATERIALIZED (
      SELECT e1.dst AS a, e2.dst AS b,
             {_SR_C} / (da.din * db.din) * sum(s.s) AS s
      FROM edges e1 JOIN edges e2 ON e1.dst <> e2.dst
      JOIN s{t - 1} s ON s.a = e1.src AND s.b = e2.src
      JOIN indeg da ON da.dst = e1.dst
      JOIN indeg db ON db.dst = e2.dst
      GROUP BY e1.dst, e2.dst, da.din, db.din
    ), s{t} AS MATERIALIZED (
      SELECT a, b, s FROM u{t}
      UNION ALL
      SELECT dst, dst, 1.0 FROM indeg
    )""")
    return head + "".join(steps) + f"""
    SELECT CAST(a AS BIGINT) AS nation_a, CAST(b AS BIGINT) AS nation_b,
           round(s, 6) AS simrank
    FROM s{_SR_ITERS} WHERE a < b
    ORDER BY round(s, 6) DESC, nation_a, nation_b
    LIMIT {_SR_TOPK}
    """


@query("simrank_nations", oracle=_simrank_oracle())
def simrank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimRank structural similarity (Jeh-Widom 2002) on the directed
    nation trade graph (supplier nation -> customer nation edges,
    self-loops dropped): two nations are similar when similar
    nations ship to them — s(a,b) = C/(|I(a)||I(b)|) sum of s(i,j)
    over in-neighbor pairs, C={_SR_C}, {_SR_ITERS} iterations from
    the identity, diagonal pinned to 1 each round. Reports the
    top-{_SR_TOPK} pairs. The recursive-structural complement of
    `link_prediction_jaccard` (one-hop overlap) and
    `graph_degree_assortativity` (degree mixing).

    Determinism: the edge set and in-degrees are exact; each
    iteration's sums span bounded in-neighbor pairs (<=625-cell
    frames) with identical closed-form terms; the top-k orders by
    the ROUNDED score with lexicographic tie-breaks (sister pairs
    tie exactly, so raw-float ordering would be engine-dependent).

    Scale: ONE four-way fact join pass reduces everything to the
    <=625-cell nation-pair frame; all {_SR_ITERS} iterations join
    bounded frames only (s_t is consumed once per round — linear
    lineage).
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .distinct()
        .cache()
    )
    indeg = edges.groupBy("dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("din")
    ).cache()
    sim = indeg.select(
        F.col("dst").alias("a"), F.col("dst").alias("b"), F.lit(1.0).alias("s")
    )
    e1 = edges.select(F.col("src").alias("ia"), F.col("dst").alias("a"))
    e2 = edges.select(F.col("src").alias("ib"), F.col("dst").alias("b"))
    da = indeg.select(F.col("dst").alias("a"), F.col("din").alias("da"))
    db = indeg.select(F.col("dst").alias("b"), F.col("din").alias("db"))
    for _ in range(_SR_ITERS):
        upd = (
            e1.join(F.broadcast(e2), F.col("a") != F.col("b"))
            .join(
                sim.withColumnRenamed("a", "ia").withColumnRenamed(
                    "b", "ib"
                ),
                ["ia", "ib"],
            )
            .join(F.broadcast(da), "a")
            .join(F.broadcast(db), "b")
            .groupBy("a", "b", "da", "db")
            .agg(
                (
                    _SR_C / (F.col("da") * F.col("db")) * F.sum("s")
                ).alias("s")
            )
            .select("a", "b", "s")
        )
        sim = upd.unionByName(
            indeg.select(
                F.col("dst").alias("a"),
                F.col("dst").alias("b"),
                F.lit(1.0).alias("s"),
            )
        )
    return (
        sim.where(F.col("a") < F.col("b"))
        .select(
            F.col("a").cast("bigint").alias("nation_a"),
            F.col("b").cast("bigint").alias("nation_b"),
            F.round("s", 6).alias("simrank"),
        )
        .orderBy(F.desc("simrank"), "nation_a", "nation_b")
        .limit(_SR_TOPK)
    )


# Verhoeff tables: d = D5 dihedral composition (closed form below),
# p = the fixed position permutation, inv = group inverses
_VER_P = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9],
    [1, 5, 7, 6, 2, 8, 3, 0, 9, 4],
    [5, 8, 0, 3, 7, 9, 6, 1, 4, 2],
    [8, 9, 1, 6, 0, 4, 3, 5, 2, 7],
    [9, 4, 5, 3, 1, 2, 6, 8, 7, 0],
    [4, 2, 8, 6, 5, 7, 3, 9, 0, 1],
    [2, 7, 9, 3, 8, 0, 6, 4, 1, 5],
    [7, 0, 4, 6, 9, 1, 3, 2, 5, 8],
]
_VER_INV = [0, 4, 3, 2, 1, 5, 6, 7, 8, 9]


def _d_expr(j: str, k: str) -> str:
    """Closed-form Verhoeff d-table: composition in the dihedral
    group D5 (indices 0-4 rotations, 5-9 reflections)."""
    return f"""(CASE
      WHEN {j} < 5 AND {k} < 5 THEN ({j} + {k}) % 5
      WHEN {j} < 5 THEN (({j} + ({k} - 5)) % 5) + 5
      WHEN {k} < 5 THEN (((({j} - 5) - {k}) % 5 + 5) % 5) + 5
      ELSE (((({j} - 5) - ({k} - 5)) % 5 + 5) % 5) END)"""


def _p_expr(pos: str, dig: str) -> str:
    rows = " ".join(
        f"WHEN {i} THEN (CASE {dig} "
        + " ".join(f"WHEN {d} THEN {v}" for d, v in enumerate(_VER_P[i]))
        + " END)"
        for i in range(8)
    )
    return f"(CASE CAST({pos} AS INT) {rows} END)"


def _inv_expr(c: str) -> str:
    return (
        f"(CASE CAST({c} AS INT) "
        + " ".join(f"WHEN {d} THEN {v}" for d, v in enumerate(_VER_INV))
        + " END)"
    )


def _ver_step(c: str, pos: str, dig: str) -> str:
    """One Verhoeff automaton step: c <- d[c][p[pos % 8][digit]],
    pos <- pos + 1. Same text instantiated for both engines."""
    perm = _p_expr(f"{pos} % 8", dig)
    return f"{_d_expr(c, perm)}, {pos} + 1"


# generation fold (positions from 1, c from 0) and verification fold
# (positions from 0, c from 0) — DuckDB accumulators are 1-indexed
# lists with [digit] elements; Spark arrays index 0-based with scalar
# elements
_VER_DUCK = _ver_step("acc[1]", "acc[2]", "b[1]")


def _d_flat() -> list[int]:
    """The d-table materialized from the same dihedral closed form the
    oracle's CASE text encodes (guaranteed-identical values)."""
    out = []
    for j in range(10):
        for k in range(10):
            if j < 5 and k < 5:
                out.append((j + k) % 5)
            elif j < 5:
                out.append(((j + (k - 5)) % 5) + 5)
            elif k < 5:
                out.append(((((j - 5) - k) % 5 + 5) % 5) + 5)
            else:
                out.append((((j - 5) - (k - 5)) % 5 + 5) % 5)
    return out


_D_ARR = "array(" + ",".join(str(v) for v in _d_flat()) + ")"
_P_ARR = "array(" + ",".join(
    str(v) for row in _VER_P for v in row
) + ")"
# Spark-side automaton step as two O(1) array-literal lookups — the CASE
# form inlines the 80-branch p-table four times inside the d-table CASE
# per step (interpreted lambdas don't CSE; measured 8.8 s at sf0.1 vs
# ~1 s with table lookups). Same tables, same values, same fold.
_VER_SPARK = (
    f"CAST(element_at({_D_ARR}, CAST(acc[0] * 10"
    f" + element_at({_P_ARR},"
    f" CAST((acc[1] % 8) * 10 + x + 1 AS INT)) + 1 AS INT)) AS DOUBLE),"
    " acc[1] + 1"
)

_DIGITS_DUCK = (
    "list_transform(generate_series(1, length(ks)),"
    " i -> [CAST(CAST(substr(ks, CAST(length(ks) - i + 1 AS INTEGER),"
    " 1) AS INTEGER) AS DOUBLE)])"
)
_DIGITS_SPARK = (
    "transform(sequence(1, length(ks)),"
    " i -> CAST(substring(ks, length(ks) - i + 1, 1) AS DOUBLE))"
)


@query(
    "verhoeff_checksum_audit",
    oracle=f"""
    WITH keys AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS ks FROM orders
    ), gen AS (
      SELECT ks,
             list_reduce(
               list_prepend([0.0, 1.0], {_DIGITS_DUCK}),
               (acc, b) -> [{_VER_DUCK}]) AS g
      FROM keys
    ), signed AS (
      SELECT ks, CAST({_inv_expr("g[1]")} AS BIGINT) AS check_digit,
             ks || CAST({_inv_expr("g[1]")} AS VARCHAR) AS full_ks
      FROM gen
    ), verified AS (
      SELECT check_digit,
             list_reduce(
               list_prepend([0.0, 0.0],
                 list_transform(generate_series(1, length(full_ks)),
                   i -> [CAST(CAST(substr(full_ks,
                     CAST(length(full_ks) - i + 1 AS INTEGER), 1)
                     AS INTEGER) AS DOUBLE)])),
               (acc, b) -> [{_VER_DUCK}]) AS v
      FROM signed
    )
    SELECT check_digit,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN v[1] = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_valid,
           round(sum(CASE WHEN v[1] = 0 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS valid_share
    FROM verified GROUP BY check_digit ORDER BY check_digit
    """,
)
def verhoeff_checksum_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verhoeff check digits computed AND re-verified in-query for
    every order key: the d-table is the dihedral group D5 evaluated
    in closed form (rotation/reflection algebra — no 100-branch
    lookup), the position permutation is the standard 8x10 table,
    and the generated digit is appended and run back through the
    verification automaton, whose final state must be 0 for every
    key (valid_share = 1.0 per check-digit bucket is the
    self-certifying property; Verhoeff catches ALL single-digit and
    adjacent-transposition errors, which `luhn_checksum_audit`'s
    mod-10 scheme cannot). Emits the check-digit distribution.

    Determinism: pure integer group algebra folded over each key's
    digits in fixed right-to-left order — both engines execute the
    identical automaton text.

    Scale: a stateless per-row fold over <=12 digits —
    embarrassingly parallel map work with one tiny 10-bucket
    aggregation; no shuffle of raw keys.
    """
    o = load(spark, sf_dir, "orders")
    keys = o.select(F.col("o_orderkey").cast("string").alias("ks"))
    gen = keys.select(
        "ks",
        F.expr(
            f"aggregate({_DIGITS_SPARK}, array(0D, 1D),"
            f" (acc, x) -> array({_VER_SPARK}))"
        ).alias("g"),
    )
    signed = gen.select(
        "ks",
        F.expr(f"CAST({_inv_expr('g[0]')} AS BIGINT)").alias("check_digit"),
        F.expr(
            f"concat(ks, CAST(CAST({_inv_expr('g[0]')} AS INT) AS STRING))"
        ).alias("full_ks"),
    )
    verified = signed.select(
        "check_digit",
        F.expr(
            "aggregate("
            " transform(sequence(1, length(full_ks)),"
            "  i -> CAST(substring(full_ks, length(full_ks) - i + 1, 1)"
            "       AS DOUBLE)),"
            " array(0D, 0D),"
            f" (acc, x) -> array({_VER_SPARK}))"
        ).alias("v"),
    )
    return (
        verified.groupBy("check_digit")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum(F.when(F.expr("v[0]") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_valid"),
            F.round(
                F.sum(F.when(F.expr("v[0]") == 0, 1).otherwise(0))
                * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("valid_share"),
        )
        .orderBy("check_digit")
    )


_GT_MOD = 7


@query(
    "keyspace_cardinality_estimate",
    oracle=f"""
    WITH sample AS (
      SELECT CAST(max(o_orderkey) AS BIGINT) AS m,
             CAST(count(*) AS BIGINT) AS k
      FROM orders WHERE o_orderkey % {_GT_MOD} = 0
    ), truth AS (
      SELECT CAST(max(o_orderkey) AS BIGINT) AS true_max FROM orders
    )
    SELECT s.k AS n_sampled, s.m AS sample_max,
           round(s.m + s.m * 1.0 / s.k - 1, 6) AS est_max_key,
           t.true_max,
           round(abs(s.m + s.m * 1.0 / s.k - 1 - t.true_max)
                 / t.true_max, 6) AS rel_error
    FROM sample s CROSS JOIN truth t
    """,
)
def keyspace_cardinality_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """German-tank (serial-number) estimation of the maximum order
    key from the deterministic 1-in-{_GT_MOD} key sample: the UMVU
    estimator m + m/k - 1 from the sample maximum m and sample size
    k, audited against the true maximum. The sampling-theory trick
    behind estimating a table's unseen keyspace (or a partition's
    row span) from a cheap sample — complements
    `capture_recapture_estimate` (two-sample overlap) and
    `selfjoin_size_estimate` (frequency moments).

    Determinism: both aggregates are exact integer min/max/count;
    the estimator is one closed form rounded 6dp.

    Scale: one filtered aggregation (modulo predicate evaluated at
    the scan) plus one plain max — both map-side combinable.
    """
    o = load(spark, sf_dir, "orders")
    sample = o.where(F.col("o_orderkey") % _GT_MOD == 0).agg(
        F.max("o_orderkey").cast("bigint").alias("m"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    truth = o.agg(F.max("o_orderkey").cast("bigint").alias("true_max"))
    est = F.col("m") + F.col("m") * 1.0 / F.col("k") - 1
    return sample.crossJoin(F.broadcast(truth)).select(
        F.col("k").alias("n_sampled"),
        F.col("m").alias("sample_max"),
        F.round(est, 6).alias("est_max_key"),
        "true_max",
        F.round(
            F.abs(est - F.col("true_max")) / F.col("true_max"), 6
        ).alias("rel_error"),
    )
