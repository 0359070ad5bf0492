"""Pure-numpy image codecs for the multimodal pipeline.

The container ships no imaging library (PIL/libvips), so real-format
decode is implemented directly on the byte layout for formats simple
enough to parse with numpy alone: uncompressed Windows BMP (the standard
54-byte BITMAPFILEHEADER + BITMAPINFOHEADER layout, 24-bit BGR and 8-bit
grayscale). This replaces the round-2 ``decode_image`` stub: a BMP
payload now round-trips bytes → header parse → padded-row deinterleave →
bottom-up flip → (H, W, 3) RGB array, all vectorized (one ``frombuffer``
+ reshape/slice per image — no per-pixel Python).

Reference surface: the reference pipeline decodes its band arrays from
JSON floats (AnnabellaZhang/Iceberg-Classifier main.py:49-66); this
module is the binary-format analogue for corpora whose media arrives as
real image files.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_HEADER_BYTES = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an uncompressed 24-bit BMP.

    Writes the canonical layout: 'BM' magic, 54-byte header, rows stored
    bottom-up, channels interleaved BGR, each row zero-padded to a 4-byte
    boundary. Used to synthesize *real-format* payloads in tests and
    queries (deterministic bytes in → deterministic file out).
    """
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp expects (H, W, 3) uint8 RGB")
    stride = (w * 3 + 3) // 4 * 4
    size = BMP_HEADER_BYTES + stride * h
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", size, 0, 0, BMP_HEADER_BYTES,  # file header
        40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0,  # info header
    )
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    return header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed BMP into an (H, W, 3) uint8 RGB array.

    Parses the real on-disk format: magic, pixel-array offset (u32 @10),
    width (i32 @18), height (i32 @22, sign = row order), bit depth
    (u16 @28, 24-bit BGR or 8-bit grayscale), compression (u32 @30, must
    be BI_RGB). Rows are stride-padded to 4 bytes; positive height means
    bottom-up storage, so the array is flipped to top-down on return.
    """
    if len(data) < BMP_HEADER_BYTES or data[:2] != b"BM":
        raise ValueError("not a BMP file (missing 'BM' magic)")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    width, height = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (method {compression})")
    if bpp not in (8, 24):
        raise NotImplementedError(f"{bpp}-bit BMP (only 8/24 supported)")
    flip = height > 0
    height = abs(height)
    stride = (width * bpp // 8 + 3) // 4 * 4
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * height, offset=pix_off)
    rows = raw.reshape(height, stride)
    if bpp == 24:
        img = rows[:, : width * 3].reshape(height, width, 3)[:, :, ::-1]  # BGR→RGB
    else:  # 8-bit grayscale → replicate channels
        img = np.repeat(rows[:, :width, None], 3, axis=2)
    if flip:
        img = img[::-1]
    return np.ascontiguousarray(img)


def decode_image(data: bytes) -> np.ndarray:
    """Decode a binary image payload by sniffing the format magic.

    BMP decodes natively (pure numpy, above). Other formats (PNG/JPEG)
    need a compression codec not present in this container and raise —
    wire PIL/libvips here in deploy environments; the Spark plumbing
    (binary column, Arrow-batched mapInPandas) is format-agnostic.
    """
    if data[:2] == b"BM":
        return decode_bmp(data)
    raise NotImplementedError(
        "only BMP decodes without an imaging library; plug PIL/libvips "
        "for PNG/JPEG in deploy environments"
    )
