"""Mirror of the driver's correctness gate: for every registered query with
an oracle, run the Spark plan and the DuckDB SQL on the same parquet and
compare row-count, schema (column names), and values order-insensitively.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from iceberg_classifier_spark.plans.registry import load_all_queries

REGISTRY = load_all_queries()
ORACLE_QUERIES = sorted(n for n, qd in REGISTRY.items() if qd.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, qd in REGISTRY.items() if qd.oracle is None)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            # lists (array columns) → tuple of rounded floats for sortability
            def conv(v):
                if isinstance(v, (list, tuple, np.ndarray)):
                    return tuple(
                        round(float(x), 6) if isinstance(x, (int, float, np.floating)) else x
                        for x in v
                    )
                return v

            df[c] = s.map(conv)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, duck, sf_dir):
    qd = REGISTRY[name]
    got = normalize(qd.fn(spark, sf_dir).toPandas())
    exp = normalize(duck.execute(qd.oracle).df())
    assert list(got.columns) == list(exp.columns), f"{name}: schema mismatch"
    assert len(got) == len(exp), f"{name}: row count {len(got)} != {len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g) and pd.api.types.is_float_dtype(e):
            assert np.allclose(g, e, rtol=1e-9, atol=1e-9, equal_nan=True), (
                f"{name}.{c}: max abs diff {np.nanmax(np.abs(g - e))}"
            )
            # np.allclose treats -0.0 == +0.0, but the driver's value hash
            # does NOT (r9's one red row was exactly this split) — flag
            # zero cells whose IEEE signbit differs between the engines.
            gz = np.asarray(g, dtype=float)
            ez = np.asarray(e, dtype=float)
            both_zero = (gz == 0.0) & (ez == 0.0)
            sz = both_zero & (np.signbit(gz) != np.signbit(ez))
            assert not sz.any(), (
                f"{name}.{c}: {int(sz.sum())} signed-zero splits "
                "(-0.0 vs +0.0 — driver hash distinguishes these)"
            )
        else:
            mism = (g.astype(str) != e.astype(str)).sum()
            assert mism == 0, f"{name}.{c}: {mism} mismatched cells"


# Every rows-only (non-SQL-oracled) entry must carry in-query self-check
# flag columns, and this test asserts they are all TRUE — a silently
# degraded fit (model losing to the constant baseline, broken eigenbasis,
# early stopping never firing) turns the row red instead of passing on
# `count() >= 0`. A new rows-only query without an entry here fails fast.
ROWS_ONLY_FLAGS = {
    "cnn_sgd_grid_classifier": ["train_beats_baseline", "loss_decreased"],
    "cnn_sgd_val_early_stop": [
        "stopped_early",
        "val_improved",
        "best_restored",
    ],
    "early_stopping_head": ["stopped_early", "best_restored"],
    "mllib_als_recs": ["sane"],
    "mllib_gbt": ["train_beats_baseline", "val_not_degenerate"],
    "mllib_grid_search_cv": ["cv_auc_sane"],
    "mllib_logreg_cv": ["train_beats_baseline", "oof_not_degenerate"],
    "mllib_mlp_cv": ["train_beats_baseline", "oof_not_degenerate"],
    "mllib_word2vec": ["sane"],
    "tta_ten_crop_predict": ["sane"],
}


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_self_checks(name, spark, sf_dir):
    assert name in ROWS_ONLY_FLAGS, (
        f"{name}: rows-only query must declare its self-check flag columns"
    )
    rows = REGISTRY[name].fn(spark, sf_dir).collect()
    assert len(rows) > 0, f"{name}: empty result"
    for flag in ROWS_ONLY_FLAGS[name]:
        bad = [r for r in rows if not r[flag]]
        assert not bad, (
            f"{name}: self-check flag {flag!r} is FALSE on {len(bad)}/"
            f"{len(rows)} rows — the fit degraded; first: {bad[0]}"
        )


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
