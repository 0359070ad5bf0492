"""Analytics wave 5 — network structure, metric decomposition,
experimentation, and corpus-card reporting: degree assortativity of the
trade graph, mix-vs-rate decomposition of a period-over-period metric
change, stratified uplift with deterministic quartiles, a one-row dataset
"nutrition label", and a Kneser-Ney-smoothed bigram LM table.

Same numeric discipline as the other waves: int64 counts and moments
everywhere; per-row floats only from identical integer inputs; no
shuffle-order float sums (each output row's float math is row-local).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

_O_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


@query(
    "graph_degree_assortativity",
    oracle="""
    WITH w AS MATERIALIZED (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS n_li
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ), wt AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(n_li) AS BIGINT) AS total FROM w
    ), e AS MATERIALIZED (
      -- w and e are each referenced several times below; without
      -- MATERIALIZED DuckDB re-inlines the 4-table star join into every
      -- reference (431 s at sf0.1, hours at sf1 — the kcore CTE class)
      SELECT src, dst FROM w CROSS JOIN wt
      WHERE n_li * n_pairs > total
    ), outd AS (
      SELECT src, CAST(count(*) AS BIGINT) AS od FROM e GROUP BY 1
    ), ind AS (
      SELECT dst, CAST(count(*) AS BIGINT) AS idg FROM e GROUP BY 1
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(od) AS BIGINT) AS sx, CAST(sum(idg) AS BIGINT) AS sy,
             CAST(sum(od * idg) AS BIGINT) AS sxy,
             CAST(sum(od * od) AS BIGINT) AS sxx,
             CAST(sum(idg * idg) AS BIGINT) AS syy
      FROM e JOIN outd USING (src) JOIN ind USING (dst)
    ), nodes AS (
      SELECT CAST(count(DISTINCT v) AS BIGINT) AS n_nodes
      FROM (SELECT src AS v FROM e UNION SELECT dst FROM e)
    )
    SELECT n AS n_edges, n_nodes,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             AS assortativity
    FROM m CROSS JOIN nodes
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed degree assortativity of the heavy-edge nation trade graph
    (pairs with above-average lineitem volume): Pearson correlation of
    (out-degree of buyer, in-degree of supplier) across edges — negative
    r means hub buyers trade with niche suppliers (disassortative), the
    standard network-topology diagnostic. Moments are exact int64; only
    the final r is a double.

    Scale: the fact tables collapse to a distinct nation-pair edge list
    in one star-join pass (the same shape motif_trade_triangles uses,
    iceberg_classifier_spark/plans/advanced.py:32); degrees and moments
    run on the |nations|^2-bounded edge dimension with broadcast joins.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    w = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_li"))
    )
    wt = w.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("n_li").cast("bigint").alias("total"),
    )
    # above-average-volume edges only: a complete trade graph has uniform
    # degrees (zero variance, r undefined); the heavy-edge subgraph is the
    # structure worth measuring — same integer cross-multiply cut as
    # motif_trade_triangles (no float mean at the membership boundary)
    e = (
        w.crossJoin(F.broadcast(wt))
        .where(F.col("n_li") * F.col("n_pairs") > F.col("total"))
        .select("src", "dst")
    )
    outd = e.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("od"))
    ind = e.groupBy("dst").agg(F.count(F.lit(1)).cast("bigint").alias("idg"))
    m = (
        e.join(F.broadcast(outd), "src")
        .join(F.broadcast(ind), "dst")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("od").cast("bigint").alias("sx"),
            F.sum("idg").cast("bigint").alias("sy"),
            F.sum(F.col("od") * F.col("idg")).cast("bigint").alias("sxy"),
            F.sum(F.col("od") * F.col("od")).cast("bigint").alias("sxx"),
            F.sum(F.col("idg") * F.col("idg")).cast("bigint").alias("syy"),
        )
    )
    nodes = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    )
    return m.crossJoin(F.broadcast(nodes)).select(
        F.col("n").alias("n_edges"),
        "n_nodes",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                )
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                    "double"
                )
            ),
            6,
        ).alias("assortativity"),
    )


@query(
    "mix_shift_decomposition",
    oracle=f"""
    WITH o AS (
      SELECT c_mktsegment AS seg,
             CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 1 ELSE 2 END
               AS period,
             {_O_CENTS} AS cents
      FROM orders JOIN customer ON c_custkey = o_custkey
    ), per AS (
      SELECT seg,
             CAST(sum(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN period = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN period = 1 THEN cents ELSE 0 END) AS BIGINT)
               AS s1,
             CAST(sum(CASE WHEN period = 2 THEN cents ELSE 0 END) AS BIGINT)
               AS s2
      FROM o GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(n1) AS BIGINT) AS t1, CAST(sum(n2) AS BIGINT) AS t2
      FROM per
    )
    SELECT seg AS segment, n1, n2,
           CAST(n1 * 1000000 // t1 AS BIGINT) AS w1_ppm,
           CAST(n2 * 1000000 // t2 AS BIGINT) AS w2_ppm,
           CAST(s1 * 10000 // n1 AS BIGINT) AS r1_microdollar,
           CAST(s2 * 10000 // n2 AS BIGINT) AS r2_microdollar,
           round((CAST(n2 AS DOUBLE) / t2 - CAST(n1 AS DOUBLE) / t1)
                 * (CAST(s1 AS DOUBLE) / n1 / 100), 6) AS mix_effect,
           round(CAST(n1 AS DOUBLE) / t1
                 * (CAST(s2 AS DOUBLE) / n2 - CAST(s1 AS DOUBLE) / n1) / 100,
                 6) AS rate_effect,
           round((CAST(n2 AS DOUBLE) / t2 - CAST(n1 AS DOUBLE) / t1)
                 * (CAST(s2 AS DOUBLE) / n2 - CAST(s1 AS DOUBLE) / n1) / 100,
                 6) AS interaction
    FROM per CROSS JOIN tot ORDER BY segment
    """,
)
def mix_shift_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix-shift (Oaxaca-style) decomposition of the period-over-period
    change in average order value: per market segment, how much of the
    change comes from the segment's weight moving (mix), its own average
    moving (rate), and the cross term — the "why did the metric move"
    report analysts reach for first. Weights and rates are published as
    exact ppm / micro-dollar integers; the three effect columns are
    row-local doubles from identical int64 inputs (no cross-row float
    sum anywhere).

    Scale: one broadcast-dim join + a single map-side-combinable
    conditional agg per segment; everything after runs on the |segments|
    dimension with a broadcast 1-row total.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    per = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("seg"),
            (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            .cast("int")
            .alias("p1"),
            F.expr(_O_CENTS).alias("cents"),
        )
        .groupBy("seg")
        .agg(
            F.sum("p1").cast("bigint").alias("n1"),
            F.sum(1 - F.col("p1")).cast("bigint").alias("n2"),
            F.sum(F.col("p1") * F.col("cents")).cast("bigint").alias("s1"),
            F.sum((1 - F.col("p1")) * F.col("cents")).cast("bigint").alias("s2"),
        )
    )
    tot = per.agg(
        F.sum("n1").cast("bigint").alias("t1"),
        F.sum("n2").cast("bigint").alias("t2"),
    )
    w1 = F.col("n1").cast("double") / F.col("t1")
    w2 = F.col("n2").cast("double") / F.col("t2")
    r1 = F.col("s1").cast("double") / F.col("n1") / 100
    r2 = F.col("s2").cast("double") / F.col("n2") / 100
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("seg").alias("segment"),
            "n1",
            "n2",
            F.expr("n1 * 1000000 div t1").cast("bigint").alias("w1_ppm"),
            F.expr("n2 * 1000000 div t2").cast("bigint").alias("w2_ppm"),
            F.expr("s1 * 10000 div n1").cast("bigint").alias("r1_microdollar"),
            F.expr("s2 * 10000 div n2").cast("bigint").alias("r2_microdollar"),
            F.round((w2 - w1) * r1, 6).alias("mix_effect"),
            F.round(w1 * (r2 - r1), 6).alias("rate_effect"),
            F.round((w2 - w1) * (r2 - r1), 6).alias("interaction"),
        )
        .orderBy("segment")
    )


@query(
    "uplift_stratified",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
             CAST(user_id % 2 = 0 AS INTEGER) AS treated,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1
    ), g AS (
      SELECT n_ev, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY 1
    ), b AS (
      SELECT n_ev,
             least((sum(c) OVER (ORDER BY n_ev ROWS UNBOUNDED PRECEDING) - 1)
                   * 4 // (sum(c) OVER ()), 3) + 1 AS stratum
      FROM g
    ), st AS (
      SELECT u.*, b.stratum FROM u JOIN b USING (n_ev)
    )
    SELECT CAST(stratum AS BIGINT) AS stratum,
           CAST(sum(treated) AS BIGINT) AS n_treated,
           CAST(sum(1 - treated) AS BIGINT) AS n_control,
           CAST(sum(treated * conv) AS BIGINT) AS conv_treated,
           CAST(sum((1 - treated) * conv) AS BIGINT) AS conv_control,
           CAST(sum(treated * conv) * 1000000
                // nullif(sum(treated), 0) AS BIGINT) AS rate_treated_ppm,
           CAST(sum((1 - treated) * conv) * 1000000
                // nullif(sum(1 - treated), 0) AS BIGINT)
             AS rate_control_ppm,
           CAST(sum(treated * conv) * 1000000 // nullif(sum(treated), 0)
                - sum((1 - treated) * conv) * 1000000
                  // nullif(sum(1 - treated), 0)
                AS BIGINT) AS uplift_ppm
    FROM st GROUP BY 1 ORDER BY 1
    """,
)
def uplift_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified uplift analysis: users bucketed into activity quartiles
    by VALUE-GROUPED cumulative-count arithmetic (tie groups of n_ev land
    in one stratum together — the curriculum_quality_schedule /
    ks_two_sample bucketing, replacing the r2 ntile whose unpartitioned
    window single-threaded the whole user dimension), treatment assigned
    by the deterministic id-parity split an A/B system would persist,
    outcome = ever purchased; per-stratum conversion rates and uplift in
    exact integer ppm — the confounder-adjusted effect readout (activity
    correlates with conversion; stratifying separates that from the
    treatment signal, and an id-parity placebo should read ~0 uplift).

    Scale: one map-side-combinable groupBy(user) collapses events to a
    per-user row; quartile bounds come from one cumulative window over
    the tiny distinct-n_ev dimension and broadcast-join back; the stratum
    rollup is ≤4 rows. No per-user global rank anywhere.
    """
    e = load(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
    ).withColumn("treated", (F.col("user_id") % 2 == 0).cast("int"))
    g = u.groupBy("n_ev").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wc = (
        Window.partitionBy()
        .orderBy("n_ev")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    b = (
        g.select(
            "n_ev",
            F.sum("c").over(wc).alias("cum"),
            F.sum("c").over(Window.partitionBy()).alias("n"),
        )
        .select(
            "n_ev",
            (F.least(F.expr("(cum - 1) * 4 div n"), F.lit(3)) + 1).alias(
                "stratum"
            ),
        )
    )
    st = u.join(F.broadcast(b), "n_ev")
    return (
        st.groupBy(F.col("stratum").cast("bigint").alias("stratum"))
        .agg(
            F.sum("treated").cast("bigint").alias("n_treated"),
            F.sum(1 - F.col("treated")).cast("bigint").alias("n_control"),
            F.sum(F.col("treated") * F.col("conv"))
            .cast("bigint")
            .alias("conv_treated"),
            F.sum((1 - F.col("treated")) * F.col("conv"))
            .cast("bigint")
            .alias("conv_control"),
            F.expr("sum(treated * conv) * 1000000 div nullif(sum(treated), 0)")
            .cast("bigint")
            .alias("rate_treated_ppm"),
            F.expr(
                "sum((1 - treated) * conv) * 1000000"
                " div nullif(sum(1 - treated), 0)"
            )
            .cast("bigint")
            .alias("rate_control_ppm"),
            F.expr(
                "sum(treated * conv) * 1000000 div nullif(sum(treated), 0)"
                " - sum((1 - treated) * conv) * 1000000"
                "   div nullif(sum(1 - treated), 0)"
            )
            .cast("bigint")
            .alias("uplift_ppm"),
        )
        .orderBy("stratum")
    )


@query(
    "dataset_card_report",
    oracle="""
    WITH d AS (
      SELECT doc_id, text, lang, source,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
      FROM documents
    ), base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(count(*) - count(DISTINCT text) AS BIGINT) AS dup_docs
      FROM d
    ), vocab AS (
      SELECT CAST(count(DISTINCT word) AS BIGINT) AS distinct_tokens
      FROM (SELECT unnest(string_split(trim(text), ' ')) AS word FROM d)
    ), src AS (
      SELECT CAST(sum(c * c) AS BIGINT) AS sum_sq
      FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM d GROUP BY source)
    )
    SELECT n_docs, n_tokens, distinct_tokens, n_langs, n_sources, dup_docs,
           CAST(n_tokens * 1000000 // n_docs AS BIGINT) AS mean_tokens_micro,
           CAST(dup_docs * 1000000 // n_docs AS BIGINT) AS dup_ppm,
           CAST((n_docs * n_docs - sum_sq) * 1000000
                // (n_docs * n_docs) AS BIGINT) AS simpson_diversity_micro
    FROM base CROSS JOIN vocab CROSS JOIN src
    """,
)
def dataset_card_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset "nutrition label" (the summary block of a dataset
    card): corpus size, vocabulary, language/source spread, exact-dup
    rate, and Simpson diversity of the source mix — every figure an exact
    integer (ppm / micro units), assembled from independent combinable
    aggregates.

    Scale: three corpus passes (doc stats, vocabulary dedup, source
    counts), each map-side combinable; the three 1-row results broadcast-
    cross-join into the final row. No corpus-sized shuffle beyond the
    distinct-token dedup, which is the same hash partition any vocabulary
    build pays.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint").alias("n_tok"),
    )
    base = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.count_distinct("lang").cast("bigint").alias("n_langs"),
        F.count_distinct("source").cast("bigint").alias("n_sources"),
        (F.count(F.lit(1)) - F.count_distinct("text"))
        .cast("bigint")
        .alias("dup_docs"),
    )
    vocab = (
        d.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("word"))
        .agg(F.count_distinct("word").cast("bigint").alias("distinct_tokens"))
    )
    src = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_sq"))
    )
    return (
        base.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(src))
        .select(
            "n_docs",
            "n_tokens",
            "distinct_tokens",
            "n_langs",
            "n_sources",
            "dup_docs",
            F.expr("n_tokens * 1000000 div n_docs")
            .cast("bigint")
            .alias("mean_tokens_micro"),
            F.expr("dup_docs * 1000000 div n_docs")
            .cast("bigint")
            .alias("dup_ppm"),
            F.expr(
                "(n_docs * n_docs - sum_sq) * 1000000 div (n_docs * n_docs)"
            )
            .cast("bigint")
            .alias("simpson_diversity_micro"),
        )
    )


_KN_D = 0.75
_KN_HEADS = 20
_KN_TOPK = 3


@query(
    "kn_bigram_lm",
    oracle=f"""
    WITH t AS (
      SELECT string_split(trim(text), ' ') AS toks FROM documents
    ), pr AS (
      SELECT toks[i + 1] AS v, toks[i + 2] AS w
      FROM (SELECT toks, unnest(range(len(toks) - 1)) AS i
            FROM t WHERE len(toks) >= 2)
    ), cb AS (
      SELECT v, w, CAST(count(*) AS BIGINT) AS c FROM pr GROUP BY 1, 2
    ), heads AS (
      SELECT v, CAST(sum(c) AS BIGINT) AS cv,
             CAST(count(*) AS BIGINT) AS fanout,
             row_number() OVER (ORDER BY sum(c) DESC, v) AS rk
      FROM cb GROUP BY 1
    ), cont AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n1w FROM cb GROUP BY 1
    ), btot AS (SELECT CAST(count(*) AS BIGINT) AS b FROM cb),
    scored AS (
      SELECT h.v AS head, cb.w AS nxt,
             (greatest(cb.c - {_KN_D}, 0) / h.cv)
             + ({_KN_D} * h.fanout / h.cv)
               * (CAST(cont.n1w AS DOUBLE) / btot.b) AS p
      FROM cb JOIN heads h ON h.v = cb.v AND h.rk <= {_KN_HEADS}
      JOIN cont ON cont.w = cb.w CROSS JOIN btot
    )
    SELECT head, nxt, round(p, 6) AS kn_prob,
           CAST(row_number() OVER (PARTITION BY head ORDER BY p DESC, nxt)
                AS INTEGER) AS rank
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY head ORDER BY p DESC, nxt)
            <= {_KN_TOPK}
    ORDER BY head, rank
    """,
)
def kn_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney-smoothed bigram LM table (absolute discount d=0.75):
    for the 20 highest-count head words, the top-3 continuations by
    P_KN(w|v) = max(c(vw)-d,0)/c(v) + d*N1+(v.)/c(v) * N1+(.w)/|bigrams|
    — the continuation-probability smoothing real n-gram LM pipelines
    (KenLM-style) use, one step past lm_doc_score's add-1. Every input
    (c(vw), c(v), fan-outs, type counts) is an exact int64; P_KN is the
    identical IEEE expression on both engines so ranking and 6dp values
    are bit-exact.

    Scale: one map-side-combinable bigram count; heads/continuation
    dimensions derive from it with combinable aggs; the head filter
    broadcasts so only the 20 heads' posting rows survive to the window.
    """
    t = load(spark, sf_dir, "documents").select(
        F.split(F.trim(F.col("text")), " ").alias("toks")
    )
    pr = t.where(F.size("toks") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 2),"
                " i -> struct(toks[i] AS v, toks[i + 1] AS w))"
            )
        ).alias("p")
    ).select("p.v", "p.w")
    cb = pr.groupBy("v", "w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    # top-20 heads via TakeOrdered — never a rank window over the full
    # head-word dimension
    heads = (
        cb.groupBy("v")
        .agg(
            F.sum("c").cast("bigint").alias("cv"),
            F.count(F.lit(1)).cast("bigint").alias("fanout"),
        )
        .orderBy(F.desc("cv"), "v")
        .limit(_KN_HEADS)
    )
    cont = cb.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("n1w"))
    btot = cb.agg(F.count(F.lit(1)).cast("bigint").alias("b"))
    p = (
        F.greatest(F.col("c") - _KN_D, F.lit(0.0)) / F.col("cv")
        + (_KN_D * F.col("fanout") / F.col("cv"))
        * (F.col("n1w").cast("double") / F.col("b"))
    )
    scored = (
        cb.join(F.broadcast(heads), "v")
        .join(cont, "w")
        .crossJoin(F.broadcast(btot))
        .select(F.col("v").alias("head"), F.col("w").alias("nxt"), p.alias("p"))
    )
    wr = Window.partitionBy("head").orderBy(F.desc("p"), "nxt")
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("int"))
        .where(F.col("rank") <= _KN_TOPK)
        .select("head", "nxt", F.round("p", 6).alias("kn_prob"), "rank")
        .orderBy("head", "rank")
    )
