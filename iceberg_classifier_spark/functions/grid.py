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


def shift(a: Column | str, height: int, width: int, dy: int, dx: int) -> Column:
    """Translate the grid by (dy, dx) with zero fill (the reference's
    width/height_shift_range augmentation, main.py:151-152, as a
    deterministic op): out(r, c) = in(r-dy, c-dx) or 0.0 off-grid."""
    a = F.col(a) if isinstance(a, str) else a
    def pick(i):
        r = (i / width).cast("int") - dy
        c = i % width - dx
        return F.when(
            (r >= 0) & (r < height) & (c >= 0) & (c < width),
            F.element_at(a, (r * width + c + 1).cast("int")),
        ).otherwise(F.lit(0.0))
    return F.transform(_indices(height * width), pick)


def rot90(a: Column | str, height: int, width: int) -> Column:
    """np.rot90 (CCW): out(r, c) = in(c, W-1-r) — with the output shaped
    W×H. Pure index permutation (exact, no interpolation); arbitrary-angle
    rotation (main.py:155) needs the interpolating kernel (resize path)."""
    a = F.col(a) if isinstance(a, str) else a
    idx = F.transform(
        _indices(height * width),
        # output is W rows × H cols: out index i → (r=i/H, c=i%H)
        lambda i: (i % height) * width + (width - 1 - (i / height).cast("int")),
    )
    return _gather(a, idx)
