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
