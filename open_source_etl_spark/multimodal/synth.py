"""Spec-compliant synthetic media generators (stdlib only).

Unlike the byte-blob fakes in ``schema.with_media_payload``, these emit
REAL container formats — a RIFF/WAVE file written by the stdlib ``wave``
module and a hand-assembled 24-bit uncompressed BMP — so the decode
kernels in ``decode.py`` exercise genuine format parsing (RIFF chunk
walk, DIB header fields, 4-byte BMP row padding), not a stand-in.  Every
parameter is a pure function of ``doc_id``, which is what lets a DuckDB
oracle predict the decoded values without being able to parse the bytes
itself: Spark's side of the differential check must get them by decoding.
"""

from __future__ import annotations

import io
import struct
import wave


def wav_params(doc_id: int) -> tuple[int, int, int]:
    """(framerate, n_frames, amplitude) for the square-wave fixture."""
    framerate = 8000 + (doc_id % 4) * 4000
    n_frames = 400 + (doc_id % 100) * 8
    amplitude = 1000 + (doc_id % 50) * 100
    return framerate, n_frames, amplitude


def make_wav_bytes(doc_id: int) -> bytes:
    """Mono 16-bit PCM RIFF/WAVE: a ±amplitude square wave (exact integer
    peak and RMS — no float in the ground truth)."""
    framerate, n_frames, amplitude = wav_params(doc_id)
    samples = b"".join(
        struct.pack("<h", amplitude if i % 2 == 0 else -amplitude)
        for i in range(n_frames)
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(samples)
    return buf.getvalue()


def bmp_params(doc_id: int) -> tuple[int, int, tuple[int, int, int]]:
    """(width, height, (r, g, b)) for the solid-color fixture.  Widths
    include non-multiples of 4 so decoders must honor BMP row padding."""
    width = 16 + doc_id % 17
    height = 8 + doc_id % 8
    color = (doc_id % 256, (doc_id * 7) % 256, (doc_id * 13) % 256)
    return width, height, color


def make_bmp_bytes(doc_id: int) -> bytes:
    """Uncompressed 24-bit bottom-up BMP (BITMAPINFOHEADER), rows padded
    to 4 bytes per the spec."""
    width, height, (r, g, b) = bmp_params(doc_id)
    row = bytes((b, g, r)) * width
    pad = (4 - (len(row) % 4)) % 4
    pixel_data = (row + b"\x00" * pad) * height
    dib = struct.pack(
        "<IiiHHIIiiII",
        40,  # BITMAPINFOHEADER size
        width,
        height,  # positive → bottom-up row order
        1,  # planes
        24,  # bits per pixel
        0,  # BI_RGB (uncompressed)
        len(pixel_data),
        2835,  # 72 DPI in px/m
        2835,
        0,
        0,
    )
    offset = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", offset + len(pixel_data), 0, 0, offset
    )
    return header + dib + pixel_data


def png_params(doc_id: int) -> tuple[int, int, tuple[int, int, int]]:
    """(width, height, (r, g, b)) for the solid-color PNG fixture.
    Distinct formulas from bmp_params so a decoder can't pass by reading
    the wrong synthesizer."""
    width = 12 + doc_id % 19
    height = 6 + doc_id % 11
    color = ((doc_id * 3) % 256, (doc_id * 11) % 256, (doc_id * 17) % 256)
    return width, height, color


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def make_png_bytes(doc_id: int) -> bytes:
    """Real compressed PNG: 8-bit/channel RGB (color type 2), scanlines
    filtered then zlib-DEFLATEd into IDAT, CRC-32 on every chunk.  The
    filter type CYCLES per row (row % 5 → None/Sub/Up/Average/Paeth), so
    a decoder must implement all five unfilters — a solid-color image
    under Sub/Up/Average/Paeth still produces nontrivial filtered bytes,
    while the ground-truth channel means stay exact integers."""
    import zlib

    width, height, (r, g, b) = png_params(doc_id)
    bpp = 3  # bytes per pixel
    row = bytes((r, g, b)) * width
    prev = bytes(len(row))
    scanlines = []
    for y in range(height):
        f = y % 5
        filt = bytearray(len(row))
        for x in range(len(row)):
            left = row[x - bpp] if x >= bpp else 0
            up = prev[x]
            up_left = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) // 2
            else:
                pred = _paeth(left, up, up_left)
            filt[x] = (row[x] - pred) & 0xFF
        scanlines.append(bytes([f]) + bytes(filt))
        prev = row
    idat = zlib.compress(b"".join(scanlines))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
