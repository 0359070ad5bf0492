"""Exact cross-engine quantization helpers for numpy/Arrow kernels."""

from __future__ import annotations

import numpy as np


def half_away(y: "np.ndarray") -> "np.ndarray":
    """Round half AWAY from zero, exactly — the tie rule of DuckDB's
    ``round()`` and Spark's ``F.round``.

    ``np.round`` alone is half-to-EVEN, which diverged from both engines
    at an exact .5e-6 tie (first fired in resize_bilinear at sf10, r9).
    The r9 fix ``trunc(y + copysign(0.5, y))`` repaired ties but can
    round UP a value 1 ulp BELOW a .5 boundary, because the addition
    itself rounds to the boundary (r9 advice). ``np.round`` is correctly
    rounded for every non-tie, so: take ``np.round``, then overwrite
    ONLY the exact-tie cells with the away-from-zero result.
    """
    y = np.asarray(y, dtype=np.float64)
    r = np.round(y)
    tie = np.abs(y - np.trunc(y)) == 0.5
    if tie.any():
        r = np.where(tie, np.trunc(y) + np.copysign(1.0, y), r)
    return r
