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


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a binary PPM (P6): ASCII
    header ``P6 <w> <h> 255`` then raw RGB bytes, top-down."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_ppm expects (H, W, 3) uint8 RGB")
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode a binary PPM (P6): whitespace/comment-tolerant header parse
    (width, height, maxval ≤ 255), then one frombuffer + reshape of the
    raw top-down RGB payload."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM (missing magic)")
    # header tokens after the magic: width, height, maxval; '#' starts a
    # comment running to end-of-line
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raw pixels
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    img = np.frombuffer(data, dtype=np.uint8, count=h * w * 3, offset=pos)
    return np.ascontiguousarray(img.reshape(h, w, 3))


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a real PNG: 8-byte
    signature, IHDR (8-bit, color type 2 truecolor, no interlace),
    one zlib-compressed IDAT, IEND — each chunk carrying its genuine
    CRC-32. Scanline filters cycle None/Sub/Up by row so a decoder
    must actually implement unfiltering (not just inflate) to get the
    pixels back.
    """
    import zlib

    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png expects (H, W, 3) uint8 RGB")
    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    raw = bytearray()
    prior = np.zeros(w * 3, dtype=np.uint8)
    for r in range(h):
        row = pixels[r].reshape(-1)
        f = r % 3
        if f == 0:
            filt = row
        elif f == 1:  # Sub: subtract left neighbor (bpp=3)
            left = np.concatenate([np.zeros(3, np.uint8), row[:-3]])
            filt = (row.astype(np.int16) - left).astype(np.uint8)
        else:  # Up: subtract prior row
            filt = (row.astype(np.int16) - prior).astype(np.uint8)
        raw.append(f)
        raw.extend(filt.tobytes())
        prior = row
    idat = zlib.compress(bytes(raw), 6)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit truecolor PNG into an (H, W, 3) uint8 RGB array.

    The real format walk: signature check, chunk iteration with CRC-32
    verification of every chunk, IHDR parse (8-bit depth, color type 2,
    interlace 0 supported), IDAT concatenation + zlib inflate, then
    per-scanline unfiltering of all five standard filter types
    (None/Sub/Up/Average/Paeth).
    """
    import zlib

    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    w = h = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError("truncated PNG (chunk extends past end of data)")
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">II5B", payload
            )
            if depth != 8 or ctype != 2 or interlace != 0:
                raise NotImplementedError(
                    "only 8-bit truecolor non-interlaced PNG supported"
                )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT decompression failed: {exc}") from exc
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch (truncated IDAT)")
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        f = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).astype(np.int16)
        prior = out[r - 1].astype(np.int16) if r else np.zeros(stride, np.int16)
        if f == 0:
            recon = line
        elif f == 2:  # Up
            recon = (line + prior) & 0xFF
        else:
            # Sub/Average/Paeth need the reconstructed left neighbor —
            # sequential in pixels, vector across channels (bpp=3)
            recon = np.zeros(stride, dtype=np.int16)
            for i in range(0, stride, 3):
                a = recon[i - 3 : i] if i else np.zeros(3, np.int16)
                b = prior[i : i + 3]
                c = prior[i - 3 : i] if i else np.zeros(3, np.int16)
                x = line[i : i + 3]
                if f == 1:  # Sub
                    recon[i : i + 3] = (x + a) & 0xFF
                elif f == 3:  # Average
                    recon[i : i + 3] = (x + (a + b) // 2) & 0xFF
                elif f == 4:  # Paeth
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                    )
                    recon[i : i + 3] = (x + pred) & 0xFF
                else:
                    raise ValueError(f"unknown PNG filter {f}")
        out[r] = recon.astype(np.uint8)
    return np.ascontiguousarray(out.reshape(h, w, 3))


def decode_image(data: bytes) -> np.ndarray:
    """Decode a binary image payload by sniffing the format magic.

    BMP, binary PPM (P6), and 8-bit truecolor PNG decode natively
    (pure numpy + stdlib zlib, above). JPEG needs a DCT codec not
    present in this container and raises — wire PIL/libvips here in
    deploy environments; the Spark plumbing (binary column,
    Arrow-batched mapInPandas) is format-agnostic.
    """
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(data)
    raise NotImplementedError(
        "only BMP/PPM/PNG decode without an imaging library; plug "
        "PIL/libvips for JPEG in deploy environments"
    )
