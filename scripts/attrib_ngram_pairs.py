"""Pair-emission attribution for dedup_ngram_jaccard (the r6/r9 method,
now a committed script): counts the TRUE work the posting-list kernel
must do on a frame — postings, distinct shingles, max document frequency,
and the capped/uncapped pair emissions sum(df*(df-1)/2) — so a scale
ratio can be split into "more work per unit" (plan debt) vs "more units
of work" (data property). r9 used these counters to exonerate the 18.9x
sf10 ratio (23.6x true capped-pair growth under generator v2's ~N/10
verbatim designation); generator v3 designates exactly ONE verbatim
group per doc, so this re-baselines the attribution on v3 frames.

Usage: python scripts/attrib_ngram_pairs.py out.json sf_dir [sf_dir ...]
(each sf_dir becomes a key in the artifact, named by its basename)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_classifier_spark.plans.dedup import (  # noqa: E402
    NGRAM_DF_CAP,
    _DUCK_SHINGLES,
)


def measure(sf_dir: str) -> dict[str, int]:
    import duckdb

    con = duckdb.connect()
    row = con.execute(
        f"""
        WITH d AS (
          SELECT doc_id, text
          FROM read_parquet('{sf_dir}/documents.parquet')
        ), sh AS (
          SELECT doc_id, unnest({_DUCK_SHINGLES}) AS shingle FROM d
        ), df AS (
          SELECT shingle, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY 1
        )
        SELECT (SELECT count(*) FROM d) AS n_docs,
               (SELECT count(*) FROM sh) AS n_postings,
               (SELECT count(*) FROM df) AS n_shingles,
               (SELECT max(df) FROM df) AS max_df,
               (SELECT sum(df * (df - 1) // 2) FROM df
                WHERE df <= {NGRAM_DF_CAP}) AS pair_emissions,
               (SELECT sum(df * (df - 1) // 2) FROM df)
                 AS pair_emissions_uncapped
        """
    ).fetchone()
    keys = [
        "n_docs",
        "n_postings",
        "n_shingles",
        "max_df",
        "pair_emissions",
        "pair_emissions_uncapped",
    ]
    return {k: int(v) for k, v in zip(keys, row)}


def main() -> None:
    out_path = sys.argv[1]
    out = {os.path.basename(d.rstrip("/")): measure(d) for d in sys.argv[2:]}
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
