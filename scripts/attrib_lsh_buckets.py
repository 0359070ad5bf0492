"""Bucket-occupancy attribution for the r10 MMIX hyperplane fix.

Measures, against the real embeddings table (numpy replay of the exact
plan-time sign matrices — buckets are engine-identical by construction):

- ann_lsh_topk / ndcg_ann_eval: distinct 8-plane buckets populated (of
  2^8), occupancy histogram, and the per-query candidate-scan fraction
  (own-bucket occupancy / corpus). The r9-degenerate formula put the
  whole corpus in 2 buckets → fraction ~0.5; independent planes should
  land ~2^-8 on a spread corpus.
- dedup_embedding_cosine: distinct buckets per band (of 2^COS_ROWS=16)
  and the fraction of (label, band) bucket memberships that fall in
  oversized (> COS_CAP) buckets — the star-route share. With one
  effective plane that share was structural; with 4 independent planes
  per band it should drop toward the label-size-driven floor.

Usage: python scripts/attrib_lsh_buckets.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_classifier_spark.functions.planes import mmix_plane_signs  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "ATTRIB_r10_lsh_buckets.json"

    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT vec_id, label, list_transform(embedding,"
        " x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS DOUBLE)) AS v"
        f" FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    labels = np.array([r[1] for r in rows], dtype=np.int64)
    V = np.array([r[2] for r in rows], dtype=np.float64)
    n = len(ids)

    out: dict[str, object] = {"sf_dir": sf_dir, "corpus": n}

    # --- ann_lsh_topk: 8 planes -> one 8-bit bucket per vector
    N_PLANES, N_QUERIES = 8, 8
    W = np.array([mmix_plane_signs(p) for p in range(N_PLANES)], dtype=np.float64)
    bits = (V @ W.T) > 0
    buckets = bits @ (1 << np.arange(N_PLANES, dtype=np.int64))
    uniq, counts = np.unique(buckets, return_counts=True)
    qmask = ids < N_QUERIES
    qsizes = [int(counts[uniq == b][0]) for b in buckets[qmask]]
    out["ann_lsh"] = {
        "planes": N_PLANES,
        "bucket_space": 1 << N_PLANES,
        "distinct_buckets": int(len(uniq)),
        "occupancy_min": int(counts.min()),
        "occupancy_median": float(np.median(counts)),
        "occupancy_max": int(counts.max()),
        "candidate_scan_fraction_per_query": round(
            float(np.mean([s / n for s in qsizes])), 6
        ),
        "degenerate_formula_fraction_was": 0.5,
    }

    # --- dedup_embedding_cosine: 8 bands x 4 planes, blocked by (label, band, bucket)
    COS_BANDS, COS_ROWS, COS_CAP = 8, 4, 64
    W2 = np.array(
        [mmix_plane_signs(p) for p in range(COS_BANDS * COS_ROWS)],
        dtype=np.float64,
    )
    bits2 = (V @ W2.T) > 0
    pows = 1 << np.arange(COS_ROWS, dtype=np.int64)
    band_stats = []
    star_members = 0
    total_members = 0
    pair_emits_small = 0
    for b in range(COS_BANDS):
        bb = bits2[:, b * COS_ROWS : (b + 1) * COS_ROWS] @ pows
        key = labels * 16 + bb  # (label, bucket) composite per band
        u, c = np.unique(key, return_counts=True)
        band_stats.append(int(len(np.unique(bb))))
        star_members += int(c[c > COS_CAP].sum())
        total_members += int(c.sum())
        small = c[c <= COS_CAP]
        pair_emits_small += int((small * (small - 1) // 2).sum())
    out["dedup_embedding_cosine"] = {
        "bands": COS_BANDS,
        "bucket_space_per_band": 1 << COS_ROWS,
        "distinct_buckets_per_band": band_stats,
        "star_route_member_fraction": round(star_members / total_members, 6),
        "small_bucket_pair_emissions": pair_emits_small,
    }

    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
