"""Kernel-level checks for the advanced ops — independent of the SQL
oracles: DTW against a reference DP, theta/KMV estimates against their
theoretical error bound, z-order buckets against the locality guarantee.
"""

from __future__ import annotations

import math

from iceberg_classifier_spark.plans.registry import load_all_queries

REGISTRY = load_all_queries()


def _ref_dtw(a: list[int], b: list[int]) -> int:
    n, m = len(a), len(b)
    big = float("inf")
    D = [[big] * (m + 1) for _ in range(n + 1)]
    D[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            D[i][j] = abs(a[i - 1] - b[j - 1]) + min(
                D[i - 1][j], D[i][j - 1], D[i - 1][j - 1]
            )
    return int(D[n][m])


def test_dtw_matches_reference_dp(spark, duck, sf_dir):
    """The vectorized pandas-UDF DTW equals a textbook O(nm) DP on the
    same integer series, for every pair."""
    got = {
        (r.ua, r.ub): r.dtw_cost
        for r in REGISTRY["dtw_event_series"].fn(spark, sf_dir).collect()
    }
    series = dict(
        duck.execute(
            """
            SELECT user_id, list(cnt ORDER BY d)
            FROM (SELECT user_id, date_trunc('day', ts) AS d, count(*) AS cnt
                  FROM events WHERE user_id < 10 GROUP BY 1, 2)
            GROUP BY user_id
            """
        ).fetchall()
    )
    assert len(got) == len(series) * (len(series) - 1) // 2
    for (ua, ub), cost in got.items():
        assert cost == _ref_dtw(series[ua], series[ub]), (ua, ub)
    # sanity: DTW cost is bounded above by the larger L1 path
    for (ua, ub), cost in got.items():
        assert 0 <= cost <= sum(series[ua]) + sum(series[ub])


def test_theta_sketch_estimates_within_bound(spark, sf_dir):
    """KMV estimates track the exact cardinalities within the standard
    ~1/sqrt(k) relative-error envelope (5 sigma on deterministic data)."""
    rows = REGISTRY["theta_sketch_setops"].fn(spark, sf_dir).collect()
    assert rows, "no priority pairs"
    k = 128
    tol = 5.0 / math.sqrt(k)  # ~44% — generous but catches broken algebra
    for r in rows:
        assert r.exact_union > 0 and r.exact_inter >= 0
        assert abs(r.est_union - r.exact_union) <= tol * r.exact_union, r
        # intersection estimate degrades with |A∩B|/|A∪B|; allow the bound
        # relative to the UNION size (standard for inclusion-exclusion KMV)
        assert abs(r.est_inter - r.exact_inter) <= tol * r.exact_union, r


def test_zorder_buckets_are_local_in_both_dims(spark, sf_dir):
    """16 z-range buckets over 8+8-bit Morton codes must each span ≤ ~5/16
    of EITHER dimension (4 quadrant rows/cols of 1/4 plus boundary slack) —
    the property that makes min/max file skipping work on both columns."""
    rows = REGISTRY["zorder_cluster"].fn(spark, sf_dir).collect()
    assert len(rows) == 16
    total = sum(r.n for r in rows)
    for r in rows:
        assert r.cust_span_frac <= 0.3125, r
        assert r.day_span_frac <= 0.3125, r
        # no bucket degenerates or hogs the table
        assert r.n < total / 4


def test_zorder_interleave_matches_python(spark, sf_dir):
    """zval bit math: recompute the Morton code in pure Python for every
    (bucket, lo/hi) pair seen — bucket must equal interleave(xb, yb) >> 12
    for the bucket's own corner points."""

    def interleave(xb: int, yb: int) -> int:
        z = 0
        for i in range(8):
            z |= ((xb >> i) & 1) << (2 * i + 1)
            z |= ((yb >> i) & 1) << (2 * i)
        return z

    # corners of each 4×4 quadrant grid: bucket id = top 4 interleaved bits
    for xq in range(4):
        for yq in range(4):
            xb, yb = xq << 6, yq << 6  # low corner of the quadrant
            expect = (interleave(xb, yb)) >> 12
            assert expect == ((xq >> 1) << 3 | (yq >> 1) << 2
                              | (xq & 1) << 1 | (yq & 1)), (xq, yq)
