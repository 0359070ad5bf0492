"""Round-11 optimization guards.

Each test pins a property a round-11 change established (OPTIMIZATION_r11.md)
so a later refactor that silently reintroduces the removed work or the closed
edge fails here instead of only showing up as a bench regression.
"""

from __future__ import annotations

from iceberg_classifier_spark.plans.registry import load_all_queries

REGISTRY = load_all_queries()


def test_curated_stage6_row_survives_empty_train(spark, tmp_path):
    # degenerate corpus: every doc_id is an eval holdout (doc_id % 7 == 0)
    # so train/qkept/sel are all EMPTY. rollup over empty input emits zero
    # rows (no grand-total row), so the stage-6 counter must come from the
    # anchored 1-row left join, not from the rollup's gid==1 row
    # (r10 verdict item 6 — latent semantics divergence the oracle can't
    # see until a degenerate frame triggers it).
    docs = spark.createDataFrame(
        [(7 * k, "w1 w2 w3", "en", "s", 8) for k in range(5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    rows = REGISTRY["curated_corpus_pipeline"].fn(spark, sf).collect()
    spark.catalog.clearCache()
    by_ord = {}
    for r in rows:
        by_ord.setdefault(r.stage_ord, []).append(r)
    assert 6 in by_ord, (
        "curated_corpus_pipeline: the stage-6 (budget_selected total) row "
        "vanished on an empty-train corpus — it must be emitted "
        "unconditionally (anchored 1-row left join over the rollup total)."
    )
    (s6,) = by_ord[6]
    assert s6.n_docs == 0 and s6.n_tokens == 0
    # stage 1 still counts the raw corpus
    (s1,) = by_ord[1]
    assert s1.n_docs == 5
    # no per-language stage-7 rows exist for an empty selection
    assert 7 not in by_ord
