"""Flattened H×W grid (image) ops as pure index-permutation expressions.

The reference treats 75×75 SAR bands as numpy grids (np.fliplr at
10-crop.py:241, corner/center crops at 10-crop.py:240-255). Here a grid is
a row-major ``array<float>`` column; flips and crops are permutations
computed with ``F.transform`` over an index sequence — JVM-side, exact
(no float arithmetic), shuffle-free, and independent of grid size, so the
same op serves 8×8 test vectors and 75×75 production bands.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _gather(a: Column, idx: Column) -> Column:
    """a[idx] for each idx in the (0-based) index array."""
    return F.transform(idx, lambda i: F.element_at(a, i + 1))


def _indices(n: int) -> Column:
    return F.sequence(F.lit(0), F.lit(n - 1))


def flip_h(a: Column | str, height: int, width: int) -> Column:
    """np.fliplr: (r, c) → (r, W-1-c)."""
    a = F.col(a) if isinstance(a, str) else a
    idx = F.transform(
        _indices(height * width),
        lambda i: (i / width).cast("int") * width + (width - 1 - i % width),
    )
    return _gather(a, idx)


def flip_v(a: Column | str, height: int, width: int) -> Column:
    """np.flipud: (r, c) → (H-1-r, c)."""
    a = F.col(a) if isinstance(a, str) else a
    idx = F.transform(
        _indices(height * width),
        lambda i: (height - 1 - (i / width).cast("int")) * width + i % width,
    )
    return _gather(a, idx)


def crop(a: Column | str, height: int, width: int, r0: int, c0: int, ch: int, cw: int) -> Column:
    """Extract the ch×cw sub-grid at (r0, c0) from an H×W grid."""
    a = F.col(a) if isinstance(a, str) else a
    idx = F.transform(
        _indices(ch * cw),
        lambda i: (F.lit(r0) + (i / cw).cast("int")) * width + F.lit(c0) + i % cw,
    )
    return _gather(a, idx)


def ten_crop(a: Column | str, height: int, width: int, ch: int, cw: int) -> Column:
    """The reference's 10-crop TTA (10-crop.py:240-255): four corners +
    center of the grid and of its horizontal flip → array of 10 crops."""
    a = F.col(a) if isinstance(a, str) else a
    rc = [
        (0, 0),
        (0, width - cw),
        (height - ch, 0),
        (height - ch, width - cw),
        ((height - ch) // 2, (width - cw) // 2),
    ]
    flipped = flip_h(a, height, width)
    crops = [crop(a, height, width, r, c, ch, cw) for r, c in rc] + [
        crop(flipped, height, width, r, c, ch, cw) for r, c in rc
    ]
    return F.array(*crops)
