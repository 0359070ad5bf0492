"""Eval/text wave 46: correlated-AUC comparison, MTLD lexical
diversity, and ordinal effect size.

- `delong_auc_comparison` — DeLong's test for two CORRELATED AUCs
  (same documents, two scorers: n_chars vs whitespace token count,
  label lang='en'): exact midrank placements off bounded score-value
  histograms, structural-component variances/covariance in exact
  half-unit integers, z statistic + 5% decision.
- `mtld_lexical_diversity` — per-document MTLD (McCarthy-Jarvis
  Measure of Textual Lexical Diversity, forward pass, TTR factor
  threshold 0.72) folded order-pinned over each token stream,
  summarized per language in exact micro-units.
- `cliffs_delta_priority` — Cliff's delta ordinal effect size (and
  Vargha-Delaney A) between URGENT and LOW order values from one
  dollar-histogram pass — the effect-size complement of
  `mann_whitney_u`'s p-value.

Determinism: placements/wins/ties are exact int64 off value
histograms; per-doc MTLD quantizes to micro-units before averaging;
every fold runs on an explicitly sorted bounded list.

Scale: DeLong joins the fact frame against two BROADCAST bounded
placement frames (distinct score values), then one conditional
moment agg; MTLD is per-doc-local (the per-key stateful shape);
Cliff's delta is one histogram pass + a bounded ordered window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load


@query(
    "delong_auc_comparison",
    oracle="""
    WITH pts AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             CAST(n_chars AS BIGINT) AS u,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS v
      FROM documents
    ), nn AS (
      SELECT CAST(sum(y) AS BIGINT) AS n1,
             CAST(sum(1 - y) AS BIGINT) AS n0
      FROM pts
    ), hu AS (
      SELECT u AS val,
             CAST(sum(y) AS BIGINT) AS cp,
             CAST(sum(1 - y) AS BIGINT) AS cn
      FROM pts GROUP BY 1
    ), pu AS (
      SELECT val,
             2 * COALESCE(sum(cn) OVER (ORDER BY val
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + cn AS h10,
             2 * ((SELECT n1 FROM nn)
                  - COALESCE(sum(cp) OVER (ORDER BY val
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0) - cp)
               + cp AS h01
      FROM hu
    ), hv AS (
      SELECT v AS val,
             CAST(sum(y) AS BIGINT) AS cp,
             CAST(sum(1 - y) AS BIGINT) AS cn
      FROM pts GROUP BY 1
    ), pv AS (
      SELECT val,
             2 * COALESCE(sum(cn) OVER (ORDER BY val
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + cn AS h10,
             2 * ((SELECT n1 FROM nn)
                  - COALESCE(sum(cp) OVER (ORDER BY val
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0) - cp)
               + cp AS h01
      FROM hv
    ), joined AS (
      SELECT p.y,
             CASE WHEN p.y = 1 THEN a.h10 ELSE a.h01 END AS hu,
             CASE WHEN p.y = 1 THEN b.h10 ELSE b.h01 END AS hv
      FROM pts p JOIN pu a ON a.val = p.u JOIN pv b ON b.val = p.v
    ), mom AS (
      SELECT y,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(hu) AS BIGINT) AS su,
             CAST(sum(hv) AS BIGINT) AS sv,
             CAST(sum(hu * hu) AS BIGINT) AS suu,
             CAST(sum(hv * hv) AS BIGINT) AS svv,
             CAST(sum(hu * hv) AS BIGINT) AS suv
      FROM joined GROUP BY 1
    ), fin AS (
      SELECT t.n1, t.n0,
             p.su * 1.0 / (2.0 * t.n0 * t.n1) AS auc_u,
             p.sv * 1.0 / (2.0 * t.n0 * t.n1) AS auc_v,
             ((p.suu - p.su * 1.0 / p.n * p.su) / (p.n - 1)
                / (4.0 * t.n0 * t.n0)) / t.n1
             + ((q.suu - q.su * 1.0 / q.n * q.su) / (q.n - 1)
                / (4.0 * t.n1 * t.n1)) / t.n0 AS var_u,
             ((p.svv - p.sv * 1.0 / p.n * p.sv) / (p.n - 1)
                / (4.0 * t.n0 * t.n0)) / t.n1
             + ((q.svv - q.sv * 1.0 / q.n * q.sv) / (q.n - 1)
                / (4.0 * t.n1 * t.n1)) / t.n0 AS var_v,
             ((p.suv - p.su * 1.0 / p.n * p.sv) / (p.n - 1)
                / (4.0 * t.n0 * t.n0)) / t.n1
             + ((q.suv - q.su * 1.0 / q.n * q.sv) / (q.n - 1)
                / (4.0 * t.n1 * t.n1)) / t.n0 AS cov_uv
      FROM nn t,
           (SELECT * FROM mom WHERE y = 1) p,
           (SELECT * FROM mom WHERE y = 0) q
    )
    SELECT n1 AS n_pos, n0 AS n_neg,
           round(auc_u, 6) AS auc_chars,
           round(auc_v, 6) AS auc_tokens,
           round(auc_u - auc_v, 6) AS auc_diff,
           round(sqrt(var_u + var_v - 2 * cov_uv), 6) AS se_diff,
           round((auc_u - auc_v)
                 / sqrt(var_u + var_v - 2 * cov_uv), 6) AS z_stat,
           CAST(abs((auc_u - auc_v)
                / sqrt(var_u + var_v - 2 * cov_uv)) > 1.959964
             AS BOOLEAN) AS significant_5pct
    FROM fin
    """,
)
def delong_auc_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeLong's test for two correlated AUCs: both scorers (n_chars
    and whitespace token count) rank the SAME documents against the
    label lang='en', so their AUC difference needs the structural-
    component covariance, not independent variances. Placements
    V10/V01 come exactly from bounded score-value histograms (2x
    half-unit integers: h10 = 2*neg_below + neg_tied per positive,
    h01 = 2*pos_above + pos_tied per negative); variances and the
    covariance are sample moments of those exact integers; z =
    dAUC / sqrt(var_u + var_v - 2cov). The correlated-comparison
    complement of `roc_auc_exact` (one AUC) and
    `mcnemar_paired_test` (paired decisions).

    Determinism: every placement and moment is exact int64; the
    closed-form variance assembly is double arithmetic rounded 6dp.

    Scale: two bounded histogram passes + ordered windows over
    DISTINCT score values only; the fact frame then joins those two
    broadcast placement tables and reduces map-side to 2 moment
    rows — no per-pair work, no global sort of raw documents.
    """
    d = load(spark, sf_dir, "documents")
    pts = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.col("n_chars").cast("bigint").alias("u"),
        F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint").alias("v"),
    )
    nn = pts.agg(
        F.sum("y").cast("bigint").alias("n1"),
        F.sum(1 - F.col("y")).cast("bigint").alias("n0"),
    )

    def placements(col: str) -> DataFrame:
        h = pts.groupBy(F.col(col).alias("val")).agg(
            F.sum("y").cast("bigint").alias("cp"),
            F.sum(1 - F.col("y")).cast("bigint").alias("cn"),
        )
        w = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, -1)
        return (
            h.crossJoin(F.broadcast(nn))
            .select(
                "val",
                (
                    2 * F.coalesce(F.sum("cn").over(w), F.lit(0)) + F.col("cn")
                ).alias("h10"),
                (
                    2
                    * (
                        F.col("n1")
                        - F.coalesce(F.sum("cp").over(w), F.lit(0))
                        - F.col("cp")
                    )
                    + F.col("cp")
                ).alias("h01"),
            )
        )

    pu = placements("u")
    pv = placements("v")
    joined = (
        pts.join(F.broadcast(pu), pts["u"] == pu["val"])
        .drop("val")
        .withColumnRenamed("h10", "h10u")
        .withColumnRenamed("h01", "h01u")
        .join(F.broadcast(pv), pts["v"] == pv["val"])
        .drop("val")
        .select(
            "y",
            F.when(F.col("y") == 1, F.col("h10u"))
            .otherwise(F.col("h01u"))
            .alias("hu"),
            F.when(F.col("y") == 1, F.col("h10"))
            .otherwise(F.col("h01"))
            .alias("hv"),
        )
    )
    mom = joined.groupBy("y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("hu").cast("bigint").alias("su"),
        F.sum("hv").cast("bigint").alias("sv"),
        F.sum(F.col("hu") * F.col("hu")).cast("bigint").alias("suu"),
        F.sum(F.col("hv") * F.col("hv")).cast("bigint").alias("svv"),
        F.sum(F.col("hu") * F.col("hv")).cast("bigint").alias("suv"),
    )
    p = mom.where(F.col("y") == 1).alias("p")
    q = mom.where(F.col("y") == 0).alias("q")
    fin = (
        F.broadcast(nn).crossJoin(F.broadcast(p)).crossJoin(F.broadcast(q))
    )

    def s_comp(side: str, a: str, b: str, denom_col: str):
        # sample covariance of the half-unit placements on one class
        # side, scaled back to V units by (2*denom)^2
        return (
            (
                F.col(f"{side}.s{a}{b}")
                - F.col(f"{side}.s{a}") * 1.0 / F.col(f"{side}.n") * F.col(f"{side}.s{b}")
            )
            / (F.col(f"{side}.n") - 1)
            / (4.0 * F.col(denom_col) * F.col(denom_col))
        )

    # structural components: positives scale by n0 (V10 = h/(2 n0)),
    # negatives by n1
    var_u = s_comp("p", "u", "u", "n0") / F.col("n1") + s_comp(
        "q", "u", "u", "n1"
    ) / F.col("n0")
    var_v = s_comp("p", "v", "v", "n0") / F.col("n1") + s_comp(
        "q", "v", "v", "n1"
    ) / F.col("n0")
    cov_uv = s_comp("p", "u", "v", "n0") / F.col("n1") + s_comp(
        "q", "u", "v", "n1"
    ) / F.col("n0")
    auc_u = F.col("p.su") * 1.0 / (2.0 * F.col("n0") * F.col("n1"))
    auc_v = F.col("p.sv") * 1.0 / (2.0 * F.col("n0") * F.col("n1"))
    se = F.sqrt(var_u + var_v - 2 * cov_uv)
    return fin.select(
        F.col("n1").alias("n_pos"),
        F.col("n0").alias("n_neg"),
        F.round(auc_u, 6).alias("auc_chars"),
        F.round(auc_v, 6).alias("auc_tokens"),
        F.round(auc_u - auc_v, 6).alias("auc_diff"),
        F.round(se, 6).alias("se_diff"),
        F.round((auc_u - auc_v) / se, 6).alias("z_stat"),
        (F.abs((auc_u - auc_v) / se) > 1.959964).alias("significant_5pct"),
    )


_MTLD_TTR = 0.72


# Packed-BIGINT MTLD fold (r10): accumulator and token are each ONE
# int64, so list_reduce/aggregate allocates NO per-step lists and the
# per-doc token list is LIST(BIGINT) — 8 bytes/token vs the previous
# nested [p, pp] DOUBLE-list representation (~40+ bytes/token plus a
# fresh 4-element accumulator list per fold step). That representation
# is what made the sf10 oracle a non-spillable 80 GB list fold (r9's
# documented infeasible-skip); the packed fold runs the identical
# recurrence in exact integer arithmetic. Field layout (15 bits each,
# docs are <= ~100 tokens so the 32767 bound has 300x headroom —
# guarded by test_mtld_packing_bounds):
#   acc   = window_start * 2^45 + types * 2^30 + tokens * 2^15 + factors
#   token = p * 2^15 + prev_pos(p)
# The TTR test (types+new)/(tokens+1) < 0.72 is evaluated in the exact
# integer form 25*(types+new) < 18*(tokens+1), which is equivalent for
# all ratios of ints <= 32767 (a ratio is either exactly 18/25 — both
# forms say "not below" — or at least ~1.2e-6 away, 10 orders above
# double rounding error).
_MTLD_P45 = 1 << 45
_MTLD_P30 = 1 << 30
_MTLD_P15 = 1 << 15
_MTLD_INIT = _MTLD_P45  # window_start=1, types=tokens=factors=0


def _mtld_step_packed(a: str, b: str, div: str) -> str:
    """Shared packed MTLD fold body instantiated for both engines
    (``div`` is ``//`` for DuckDB, ``div`` for Spark SQL)."""
    ws = f"({a} {div} {_MTLD_P45})"
    ty = f"(({a} {div} {_MTLD_P30}) % {_MTLD_P15})"
    tk = f"(({a} {div} {_MTLD_P15}) % {_MTLD_P15})"
    fac = f"({a} % {_MTLD_P15})"
    p = f"({b} {div} {_MTLD_P15})"
    pp = f"({b} % {_MTLD_P15})"
    new = f"(CASE WHEN {pp} < {ws} THEN 1 ELSE 0 END)"
    return (
        f"CASE WHEN 25 * ({ty} + {new}) < 18 * ({tk} + 1)"
        f" THEN ({p} + 1) * {_MTLD_P45} + ({fac} + 1)"
        f" ELSE {ws} * {_MTLD_P45} + ({ty} + {new}) * {_MTLD_P30}"
        f" + ({tk} + 1) * {_MTLD_P15} + {fac} END"
    )


def _mtld_factors(acc: str, div: str) -> str:
    """Completed factors + the partial-factor remainder, from the packed
    accumulator — identical double arithmetic on both engines."""
    ty = f"(({acc} {div} {_MTLD_P30}) % {_MTLD_P15})"
    tk = f"(({acc} {div} {_MTLD_P15}) % {_MTLD_P15})"
    fac = f"({acc} % {_MTLD_P15})"
    return (
        f"{fac} + CASE WHEN {tk} > 0"
        f" THEN (1.0 - {ty} / CAST({tk} AS DOUBLE)) / (1.0 - {_MTLD_TTR})"
        " ELSE 0.0 END"
    )


_MTLD_DUCK = _mtld_step_packed("a", "b", "//")
_MTLD_SPARK = _mtld_step_packed("a", "b", "div")


@query(
    "mtld_lexical_diversity",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(string_split(trim(text), ' ')) AS w,
             generate_subscripts(string_split(trim(text), ' '), 1) AS p
      FROM documents
    ), prevpos AS (
      SELECT doc_id, lang, CAST(p AS BIGINT) AS p,
             CAST(COALESCE(lag(p) OVER (PARTITION BY doc_id, w
               ORDER BY p), 0) AS BIGINT) AS pp
      FROM toks
    ), folded AS (
      SELECT doc_id, any_value(lang) AS lang,
             CAST(count(*) AS BIGINT) AS n_toks,
             list_reduce(
               list_prepend(CAST({_MTLD_INIT} AS BIGINT),
                            list(p * {_MTLD_P15} + pp ORDER BY p)),
               (a, b) -> {_MTLD_DUCK}) AS acc
      FROM prevpos GROUP BY doc_id
    ), scored AS (
      SELECT lang, n_toks, {_mtld_factors("acc", "//")} AS factors
      FROM folded
    ), micro AS (
      SELECT lang,
             CAST(round(CASE WHEN factors = 0
               THEN n_toks * 1000000.0
               ELSE n_toks * 1000000.0 / factors END) AS BIGINT) AS m
      FROM scored
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST((2 * sum(m) + count(*)) // (2 * count(*)) AS DOUBLE)
             / 1000000 AS mean_mtld,
           CAST(min(m) AS DOUBLE) / 1000000 AS min_mtld,
           CAST(max(m) AS DOUBLE) / 1000000 AS max_mtld
    FROM micro GROUP BY lang ORDER BY lang
    """,
)
def mtld_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MTLD (Measure of Textual Lexical Diversity, McCarthy & Jarvis
    2010, forward pass): walk each document's token stream keeping a
    running type-token ratio; every time TTR drops below 0.72 one
    'factor' completes and the window resets; the remainder
    contributes a partial factor (1 - TTR)/(1 - 0.72). MTLD =
    n_tokens / factors — the length-robust diversity measure next to
    `vocab_oov_rate` (fixed vocab) and `doc_entropy_filter`
    (character entropy). Summarized per language.

    Determinism: the fold consumes each doc's tokens in text order
    (no sort needed — both engines preserve split order); TTR
    comparisons are identical IEEE divisions; per-doc MTLD quantizes
    to exact micro-units BEFORE the cross-doc average so the group
    mean is an exact integer ratio.

    Scale: entirely per-document work (the per-key stateful shape) —
    the prev-occurrence window shuffles once on (doc_id, word), the
    fold once on doc_id, both per-doc bounded; the fold accumulator
    is 4 flat doubles (the seen SET is never materialized — "new
    type in window" reduces to prev_pos < window_start), so state
    stays O(1) per document regardless of vocabulary.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.posexplode(F.split(F.trim(F.col("text")), " ")).alias("p0", "w"),
    ).select("doc_id", "lang", (F.col("p0") + 1).alias("p"), "w")
    wprev = Window.partitionBy("doc_id", "w").orderBy("p")
    prevpos = toks.select(
        "doc_id",
        "lang",
        F.col("p").cast("bigint").alias("p"),
        F.coalesce(F.lag("p").over(wprev), F.lit(0))
        .cast("bigint")
        .alias("pp"),
    )
    folded = (
        prevpos.groupBy("doc_id")
        .agg(
            F.first("lang").alias("lang"),
            F.count(F.lit(1)).cast("bigint").alias("n_toks"),
            F.array_sort(
                F.collect_list(F.col("p") * _MTLD_P15 + F.col("pp"))
            ).alias("xs"),
        )
        .select(
            "lang",
            "n_toks",
            F.expr(
                f"aggregate(xs, CAST({_MTLD_INIT} AS BIGINT),"
                f" (a, b) -> {_MTLD_SPARK})"
            ).alias("acc"),
        )
    )
    scored = folded.select(
        "lang",
        "n_toks",
        F.expr(_mtld_factors("acc", "div")).alias("factors"),
    )
    micro = scored.select(
        "lang",
        F.round(
            F.when(
                F.col("factors") == 0, F.col("n_toks") * 1000000.0
            ).otherwise(F.col("n_toks") * 1000000.0 / F.col("factors"))
        )
        .cast("bigint")
        .alias("m"),
    )
    return (
        micro.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            # integer HALF_UP mean + exact micro-int min/max (6dp values
            # need no float round at all)
            F.expr(
                "CAST((2 * sum(m) + count(*)) div (2 * count(*))"
                " AS DOUBLE) / 1000000"
            ).alias("mean_mtld"),
            (F.min("m").cast("double") / 1000000).alias("min_mtld"),
            (F.max("m").cast("double") / 1000000).alias("max_mtld"),
        )
        .orderBy("lang")
    )


@query(
    "cliffs_delta_priority",
    oracle="""
    WITH vals AS (
      SELECT CAST(round(o_totalprice) AS BIGINT) AS val,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN 1 ELSE 0 END) AS BIGINT) AS cx,
             CAST(sum(CASE WHEN o_orderpriority = '5-LOW'
                      THEN 1 ELSE 0 END) AS BIGINT) AS cy
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(cx) AS BIGINT) AS nx,
             CAST(sum(cy) AS BIGINT) AS ny
      FROM vals
    ), placed AS (
      SELECT val, cx, cy,
             COALESCE(CAST(sum(cy) OVER (ORDER BY val
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) AS y_lt
      FROM vals
    ), pairs AS (
      SELECT CAST(sum(cx * y_lt) AS BIGINT) AS wins,
             CAST(sum(cx * ((SELECT ny FROM tot) - y_lt - cy))
               AS BIGINT) AS losses,
             CAST(sum(cx * cy) AS BIGINT) AS ties
      FROM placed
    )
    SELECT t.nx AS n_urgent, t.ny AS n_low,
           p.wins, p.losses, p.ties,
           round((p.wins - p.losses) * 1.0 / (t.nx * t.ny), 6)
             AS cliffs_delta,
           round((2.0 * p.wins + p.ties) / (2.0 * t.nx * t.ny), 6)
             AS vd_a,
           CASE WHEN abs((p.wins - p.losses) * 1.0 / (t.nx * t.ny))
                     < 0.147 THEN 'negligible'
                WHEN abs((p.wins - p.losses) * 1.0 / (t.nx * t.ny))
                     < 0.33 THEN 'small'
                WHEN abs((p.wins - p.losses) * 1.0 / (t.nx * t.ny))
                     < 0.474 THEN 'medium'
                ELSE 'large' END AS magnitude
    FROM pairs p CROSS JOIN tot t
    """,
)
def cliffs_delta_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta ordinal effect size between URGENT and LOW order
    values: delta = (#(x>y) - #(x<y)) / (nx*ny) with all pair counts
    taken exactly from one dollar-value histogram (wins = sum over
    cells of cx * y_below — the prefix-sum identity again, no pair
    join), plus the Vargha-Delaney A probability-of-superiority and
    the Romano magnitude label. The assumption-free effect-size
    complement of `mann_whitney_u` (significance) and
    `welch_ttest_priority` (mean difference).

    Determinism: wins/losses/ties are exact int64; delta and A are
    single divisions rounded 6dp.

    Scale: ONE filtered fact pass (predicate pushed to the scan) to
    the bounded dollar-cell frame; the prefix window and pair
    algebra run on those cells only.
    """
    o = load(spark, sf_dir, "orders")
    vals = (
        o.where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy(F.round(F.col("o_totalprice")).cast("bigint").alias("val"))
        .agg(
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("cx"),
            F.sum(
                F.when(F.col("o_orderpriority") == "5-LOW", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("cy"),
        )
    )
    tot = vals.agg(
        F.sum("cx").cast("bigint").alias("nx"),
        F.sum("cy").cast("bigint").alias("ny"),
    )
    w = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, -1)
    placed = vals.crossJoin(F.broadcast(tot)).select(
        "val",
        "cx",
        "cy",
        "nx",
        "ny",
        F.coalesce(F.sum("cy").over(w).cast("bigint"), F.lit(0)).alias(
            "y_lt"
        ),
    )
    pairs = placed.agg(
        F.max("nx").alias("nx"),
        F.max("ny").alias("ny"),
        F.sum(F.col("cx") * F.col("y_lt")).cast("bigint").alias("wins"),
        F.sum(F.col("cx") * (F.col("ny") - F.col("y_lt") - F.col("cy")))
        .cast("bigint")
        .alias("losses"),
        F.sum(F.col("cx") * F.col("cy")).cast("bigint").alias("ties"),
    )
    delta = (F.col("wins") - F.col("losses")) * 1.0 / (
        F.col("nx") * F.col("ny")
    )
    return pairs.select(
        F.col("nx").alias("n_urgent"),
        F.col("ny").alias("n_low"),
        "wins",
        "losses",
        "ties",
        F.round(delta, 6).alias("cliffs_delta"),
        F.round(
            (2.0 * F.col("wins") + F.col("ties"))
            / (2.0 * F.col("nx") * F.col("ny")),
            6,
        ).alias("vd_a"),
        F.when(F.abs(delta) < 0.147, "negligible")
        .when(F.abs(delta) < 0.33, "small")
        .when(F.abs(delta) < 0.474, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )
