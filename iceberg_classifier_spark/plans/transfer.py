"""Transfer-learning analogues of the reference's frozen-backbone model
(main.py:185-237: ImageNet VGG/ResNet base + GlobalMax/AveragePooling →
concat with the scalar angle input → cheap trained head) and its training
control (main.py:171-179: EarlyStopping(patience) + ModelCheckpoint
(save_best_only)).

``pretrained_featurizer_head`` is the 100 TB embedding-generation shape:
an expensive FROZEN featurizer applied as distributed batch inference
(Arrow-batched mapInPandas, one pass, no shuffle), followed by a cheap
head fit from sufficient statistics. The filter bank is deterministic
(classic integer edge/blob kernels standing in for pretrained weights), all
activations are floor-quantized to exact integer micro-units, and the head
is a closed-form class-mean discriminant — so the WHOLE pipeline including
the trained head is reproduced bit-for-bit by the DuckDB oracle: a
transfer-learning pipeline with a full value oracle, not a rows-only check.

``early_stopping_head`` is the training-control loop: iterative fits with
validation-loss patience and best-model restore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_classifier_spark.plans.registry import query
from iceberg_classifier_spark.sources.tables import load

# Frozen 3x3 integer filter bank — the deterministic stand-in for the
# reference's pretrained conv weights (main.py:185-214). Row-major taps.
_KERNELS = [
    ("sobel_x", [-1, 0, 1, -2, 0, 2, -1, 0, 1]),
    ("sobel_y", [-1, -2, -1, 0, 0, 0, 1, 2, 1]),
    ("laplace", [0, 1, 0, 1, -4, 1, 0, 1, 0]),
    ("center", [-1, -1, -1, -1, 8, -1, -1, -1, -1]),
    ("box", [1, 1, 1, 1, 1, 1, 1, 1, 1]),  # the only non-zero-DC kernel:
    # passes the local mean through, the low-frequency channel real
    # pretrained banks always carry
]
_NK = len(_KERNELS)
_Q = 1_000_000  # activation quantization: micro-units


def _conv_terms_sql(garr: str) -> str:
    """The 9-tap valid-conv sum at grid offset (i, j), written in the same
    left-to-right tap order the numpy kernel accumulates in, so both
    engines run the identical IEEE addition sequence."""
    taps = []
    for a in range(3):
        for b in range(3):
            taps.append(f"w{3 * a + b}*{garr}[(i+{a})*8+j+{b}+1]")
    return " + ".join(taps)


_KERNEL_VALUES = ", ".join(
    f"({ki + 1}, {', '.join(str(w) for w in ws)})"
    for ki, (_, ws) in enumerate(_KERNELS)
)

_FEAT_PIVOT = ", ".join(
    f"max(CASE WHEN kid = {k} THEN fmax END) AS m{k}, "
    f"max(CASE WHEN kid = {k} THEN savg END) AS s{k}"
    for k in range(1, _NK + 1)
)

_STATS_SUMS = ", ".join(
    f"sum(CASE WHEN y = 1 THEN {c}{k} ELSE 0 END) AS p{c}{k}, "
    f"sum(CASE WHEN y = 0 THEN {c}{k} ELSE 0 END) AS n{c}{k}"
    for c in ("m", "s")
    for k in range(1, _NK + 1)
)

# feature k (1-4 = max-pool branch, 5-8 = avg-pool branch, 9 = angle):
# (raw-int column, double divisor) — x = raw/div, identical in both engines
_FEATS = (
    [(f"m{k}", f"{float(_Q):.1f}") for k in range(1, _NK + 1)]
    + [(f"s{k}", f"{36.0 * _Q:.1f}") for k in range(1, _NK + 1)]
    + [("fa", "100.0")]
)

_HEAD_COLS = ", ".join(
    f"p{raw}/{div}/np1 - n{raw}/{div}/nn0 AS w{i}, "
    f"(p{raw}/{div}/np1 + n{raw}/{div}/nn0)/2.0 AS c{i}"
    for i, (raw, div) in enumerate(_FEATS, start=1)
)

_MARGIN_SQL = " + ".join(
    f"h.w{i}*(w.{raw}/{div} - h.c{i})"
    for i, (raw, div) in enumerate(_FEATS, start=1)
)


@query(
    "pretrained_featurizer_head",
    headline=True,
    oracle=f"""
    WITH k(kid, w0, w1, w2, w3, w4, w5, w6, w7, w8) AS (
      VALUES {_KERNEL_VALUES}
    ), g AS (
      SELECT vec_id, label % 2 AS y,
             list_transform(embedding, e -> CAST(e AS DOUBLE)) AS g1,
             list_reverse(list_transform(embedding, e -> CAST(e AS DOUBLE)))
               AS g2
      FROM embeddings
    ), acts AS (
      SELECT vec_id, y, kid,
             greatest(0.0, {_conv_terms_sql("g1")}) AS a1,
             greatest(0.0, {_conv_terms_sql("g2")}) AS a2
      FROM g CROSS JOIN k, range(6) t1(i), range(6) t2(j)
    ), feat AS (
      SELECT vec_id, y, kid,
             CAST(floor(max(a1) * {_Q}) AS BIGINT) AS fmax,
             sum(CAST(floor(a2 * {_Q}) AS BIGINT)) AS savg
      FROM acts GROUP BY 1, 2, 3
    ), wide AS (
      SELECT vec_id, y, vec_id % 4 = 0 AS is_val, vec_id % 1600 AS fa,
             {_FEAT_PIVOT}
      FROM feat GROUP BY 1, 2, 3, 4
    ), stats AS (
      SELECT {_STATS_SUMS},
             sum(CASE WHEN y = 1 THEN fa ELSE 0 END) AS pfa,
             sum(CASE WHEN y = 0 THEN fa ELSE 0 END) AS nfa,
             sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS np1,
             sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS nn0
      FROM wide WHERE NOT is_val
    ), head AS (
      SELECT {_HEAD_COLS}, np1, nn0 FROM stats
    ), scored AS (
      SELECT w.y, {_MARGIN_SQL} AS margin
      FROM wide w CROSS JOIN head h
      WHERE w.is_val
    )
    SELECT CAST(s.y AS BIGINT) AS actual,
           CAST(CASE WHEN s.y = 1 THEN h.np1 ELSE h.nn0 END AS BIGINT)
             AS n_train,
           CAST(count(*) AS BIGINT) AS n_val,
           CAST(sum(CASE WHEN (s.margin > 0) = (s.y = 1) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           round(sum(CASE WHEN (s.margin > 0) = (s.y = 1) THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS accuracy
    FROM scored s CROSS JOIN head h
    GROUP BY 1, 2 ORDER BY 1
    """,
)
def pretrained_featurizer_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen-featurizer + cheap-head transfer pipeline (ref main.py:185-237:
    pretrained two-branch CNN backbone, GlobalMaxPooling2D on branch 1 /
    GlobalAveragePooling2D on branch 2, concat with the angle scalar, one
    trained sigmoid head):

    1. FEATURIZE (the expensive frozen stage, run as distributed batch
       inference): a deterministic 3x3 integer filter bank (Sobel-x/y,
       Laplacian, center-surround) valid-convolves each 8x8 grid in an
       Arrow-batched mapInPandas numpy kernel — branch 1 = ReLU + global
       MAX pool over band_1, branch 2 = ReLU + global AVERAGE pool over
       band_2 (reversed grid). Activations are floor-quantized to exact
       integer micro-units so every downstream statistic is order-free
       integer arithmetic.
    2. HEAD (the cheap trained stage): a closed-form class-mean
       discriminant fit on the deterministic train split (vec_id%4 != 0):
       w = mean_pos − mean_neg per feature, threshold at the midpoint —
       the minimum-distance-to-class-mean classifier. Class means derive
       from exact integer sums, so head weights and every val margin are
       bit-identical across engines; the DuckDB oracle replays featurizer
       AND head end-to-end.

    Returns per-class val accuracy. The angle scalar joins the feature
    vector exactly as the reference concatenates inc_angle (main.py:189,
    226).

    Scale: the featurizer is one shuffle-free Arrow pass (the shape of any
    100 TB embedding/feature-generation job — per-partition numpy GEMMs,
    nothing collected); the head needs only 2×9 integer sufficient
    statistics (one map-side-combined agg), and scoring broadcasts the
    1-row head. Swapping the filter bank for a real pretrained net changes
    only the numpy kernel body.
    """
    import numpy as np
    import pandas as pd

    # plain load, not load_parallel: at test scale the 10-kernel conv is
    # cheaper than the extra round-robin exchange + per-task Arrow setup
    # it would add (measured 1.35 s -> 2.8 s at sf0.1); on a real corpus
    # the scan arrives already split and the kernel parallelizes free
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", (F.col("label") % 2).cast("long").alias("y"), "embedding"
    )

    kernels = [ws for _, ws in _KERNELS]

    def featurize(batches):
        for pdf in batches:
            # stack the Arrow-delivered per-row arrays directly — the
            # previous per-row Python .map(np.asarray) paid one
            # interpreter call per row for a conversion np.stack + astype
            # do in bulk (guide §4.2); float32→float64 widening is exact,
            # so values are bit-identical
            mats = np.stack(pdf["embedding"].to_numpy()).astype(
                np.float64, copy=False
            )
            n = mats.shape[0]
            g1 = mats.reshape(n, 8, 8)
            g2 = mats[:, ::-1].reshape(n, 8, 8)
            out = {"vec_id": pdf["vec_id"], "y": pdf["y"]}
            for ki, w in enumerate(kernels, start=1):
                for g, branch in ((g1, "m"), (g2, "s")):
                    # accumulate taps in row-major order — the exact
                    # left-to-right IEEE addition sequence the SQL runs
                    acc = w[0] * g[:, 0:6, 0:6]
                    for a in range(3):
                        for b in range(3):
                            if a == 0 and b == 0:
                                continue
                            acc = acc + w[3 * a + b] * g[:, a : a + 6, b : b + 6]
                    act = np.maximum(acc, 0.0)
                    if branch == "m":  # GlobalMaxPooling2D branch
                        out[f"m{ki}"] = np.floor(act.max(axis=(1, 2)) * _Q).astype(
                            np.int64
                        )
                    else:  # GlobalAveragePooling2D branch (quantized sum)
                        out[f"s{ki}"] = (
                            np.floor(act * _Q).astype(np.int64).sum(axis=(1, 2))
                        )
            yield pd.DataFrame(out)

    schema = "vec_id long, y long, " + ", ".join(
        f"{c}{k} long" for k in range(1, _NK + 1) for c in ("m", "s")
    )
    feats = (
        e.mapInPandas(featurize, schema)
        .withColumn("fa", (F.col("vec_id") % 1600).cast("long"))
        .withColumn("is_val", F.col("vec_id") % 4 == 0)
        # cached: the featurizer (the expensive frozen stage — a full
        # Arrow/Python conv pass over every embedding) feeds BOTH the
        # train-split sufficient statistics and the val-split scoring;
        # without the cache each branch re-runs the whole Python kernel
        # (two MapInPandas stages in the before plan). The cached frame
        # is 22 longs/row — the persist-the-minority shape (guide §4/§5)
        .cache()
    )

    train = feats.filter(~F.col("is_val"))
    stat_aggs = []
    for c in ("m", "s"):
        for k in range(1, _NK + 1):
            stat_aggs.append(
                F.sum(F.when(F.col("y") == 1, F.col(f"{c}{k}")).otherwise(0)).alias(
                    f"p{c}{k}"
                )
            )
            stat_aggs.append(
                F.sum(F.when(F.col("y") == 0, F.col(f"{c}{k}")).otherwise(0)).alias(
                    f"n{c}{k}"
                )
            )
    stat_aggs += [
        F.sum(F.when(F.col("y") == 1, F.col("fa")).otherwise(0)).alias("pfa"),
        F.sum(F.when(F.col("y") == 0, F.col("fa")).otherwise(0)).alias("nfa"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("np1"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("nn0"),
    ]
    stats = train.agg(*stat_aggs)

    head_cols = []
    for i, (raw, div) in enumerate(_FEATS, start=1):
        d = float(div)
        pos_mean = F.col(f"p{raw}") / d / F.col("np1")
        neg_mean = F.col(f"n{raw}") / d / F.col("nn0")
        head_cols.append((pos_mean - neg_mean).alias(f"w{i}"))
        head_cols.append(((pos_mean + neg_mean) / 2.0).alias(f"c{i}"))
    head = stats.select(*head_cols, "np1", "nn0")

    val = feats.filter(F.col("is_val"))
    margin = None
    for i, (raw, div) in enumerate(_FEATS, start=1):
        term = F.col(f"w{i}") * (F.col(raw) / float(div) - F.col(f"c{i}"))
        margin = term if margin is None else margin + term
    scored = val.crossJoin(F.broadcast(head)).select(
        "y", margin.alias("margin"), "np1", "nn0"
    )
    correct = ((F.col("margin") > 0) == (F.col("y") == 1)).cast("bigint")
    return (
        scored.groupBy(
            F.col("y").alias("actual"),
            F.when(F.col("y") == 1, F.col("np1"))
            .otherwise(F.col("nn0"))
            .cast("bigint")
            .alias("n_train"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_val"),
            F.sum(correct).alias("n_correct"),
            F.round(F.sum(correct) * 1.0 / F.count(F.lit(1)), 6).alias("accuracy"),
        )
        .orderBy("actual")
    )


@query("early_stopping_head", oracle=None)
def early_stopping_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Early-stopping + best-checkpoint training control (ref
    main.py:171-179: ``EarlyStopping('val_loss', patience=20)`` +
    ``ModelCheckpoint(save_best_only=True)``): fit the logistic head with
    a growing iteration budget, evaluate validation log-loss after each
    step, stop once ``patience`` consecutive evaluations fail to improve
    by ``min_delta``, and restore the best checkpoint for the final
    report.

    Rows-only check (an iterative fit loop is not SQL-expressible) with
    in-query self-checks: ``stopped_early`` (the patience rule fired
    before the budget ran out), ``best_restored`` (the restored
    checkpoint's val loss ≤ every later step's — save_best_only
    semantics), and per-step monotone bookkeeping. Seed-pinned LBFGS, so
    the step series is reproducible run to run.

    Scale: each step is a full distributed MLlib fit over the cached,
    right-sized frame (fit_ready); only ONE scalar (the val loss) comes
    back to the driver per step — the driver-side loop is the training
    control plane, exactly like the reference's Keras callback loop, and
    touches no data. The val frame is scored distributed and aggregated.
    """
    from iceberg_classifier_spark.ml.pipeline import (
        engineered_features,
        fit_ready,
        prob_of_one,
    )
    from iceberg_classifier_spark.operators import metrics
    from iceberg_classifier_spark.operators.folds import stratified_split
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    feature_cols = ["f_mean", "f_std", "f_min", "f_max", "f_size", "f_iso_active"]
    d = engineered_features(
        load(spark, sf_dir, "embeddings").withColumn(
            "y", (F.col("label") % 2).cast("double")
        )
    )
    split, cache = fit_ready(stratified_split(d, "y", "vec_id", val_fraction=0.25))
    train = split.where(F.col("split") == "train")
    val = split.where(F.col("split") == "val")

    patience, min_delta = 2, 1e-5
    schedule = [1, 2, 3, 4, 6, 8, 12, 16, 20, 25]
    history: list[tuple[int, int, float]] = []  # (step, max_iter, val_ll)
    best_ll, best_step, bad, stopped_early = float("inf"), -1, 0, False
    for step, max_iter in enumerate(schedule):
        assembler = VectorAssembler(
            inputCols=feature_cols, outputCol="features_raw"
        )
        scaler = StandardScaler(
            inputCol="features_raw",
            outputCol="features",
            withMean=True,
            withStd=True,
        )
        clf = LogisticRegression(
            featuresCol="features",
            labelCol="y",
            maxIter=max_iter,
            regParam=0.01,
            tol=0.0,  # run the full budget each step; the loop decides
        )
        model = Pipeline(stages=[assembler, scaler, clf]).fit(train)
        val_ll = (
            prob_of_one(model, val)
            .agg(F.avg(metrics.log_loss_expr(F.col("y"), F.col("prob"))))
            .collect()[0][0]
        )
        history.append((step, max_iter, float(val_ll)))
        if val_ll < best_ll - min_delta:
            best_ll, best_step, bad = float(val_ll), step, 0
        else:
            bad += 1
            if bad >= patience:  # EarlyStopping fires
                stopped_early = True
                break
    cache.unpersist()

    final_ll = history[-1][2]
    rows = [
        (
            step,
            max_iter,
            round(ll, 6),
            step == best_step,
            stopped_early,
            best_ll <= final_ll + 1e-12,
        )
        for step, max_iter, ll in history
    ]
    return spark.createDataFrame(
        rows,
        "step int, max_iter int, val_log_loss double, is_best boolean, "
        "stopped_early boolean, best_restored boolean",
    )
