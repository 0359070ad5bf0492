"""Pure-numpy RIFF/WAVE codec (PCM16 mono).

Real on-disk format, no audio library: ``encode_wav`` writes the genuine
44-byte RIFF header (RIFF size, ``fmt `` chunk with PCM tag / channel
count / sample rate / block align, ``data`` chunk size) followed by
little-endian int16 samples; ``decode_wav`` walks the chunk list (not
fixed offsets — real WAV files may carry LIST/INFO chunks before data),
validates the PCM format tag, and reinterprets the payload with one
``np.frombuffer``. Compressed / multi-channel / non-16-bit files raise
``NotImplementedError`` — the honest unsupported-codec guard, same policy
as functions/imaging.py.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_HEADER_BYTES = 44


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode mono int16 samples as a PCM16 RIFF/WAVE file."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav expects a 1-D int16 array")
    data = samples.astype("<i2").tobytes()
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,  # fmt chunk size
        1,  # PCM
        1,  # mono
        rate,
        rate * 2,  # byte rate
        2,  # block align
        16,  # bits per sample
        b"data",
        len(data),
    )
    return header + data


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM16 mono WAV; returns (sample_rate, int16 samples)."""
    if len(data) < WAV_HEADER_BYTES or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    audio_format = channels = rate = bits = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            audio_format, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
        elif cid == b"data":
            payload = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if audio_format is None or payload is None:
        raise ValueError("missing fmt /data chunk")
    if audio_format != 1:
        raise NotImplementedError(f"compressed WAV (format tag {audio_format})")
    if bits != 16 or channels != 1:
        raise NotImplementedError(f"{channels}ch/{bits}-bit WAV (PCM16 mono only)")
    return rate, np.frombuffer(payload, dtype="<i2")
