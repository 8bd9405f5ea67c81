"""Multimodal columns (EXT, SURVEY.md §2B): image/audio/video as opaque
binary columns with typed metadata, processed by Arrow-batched
``mapInPandas`` pipelines.

Uncompressed formats decode FOR REAL with the stdlib: RIFF/WAVE via the
``wave`` module and 24-bit BMP via hand struct parsing (``synth.py``
generates spec-compliant fixtures; ``decode_wav_real``/``decode_bmp_real``
parse them back, differentially checked against formula oracles).  The
container has no compressed-codec libraries, but the compressed codec
families are decoded in pure stdlib anyway — PNG (DEFLATE + scanline
unfilters, all color types, Adam7), JPEG (baseline through progressive
with restart intervals), GIF (variable-width LZW), FLAC, WebP VP8L,
TIFF, MP3 (every B.7 Huffman table incl. linbits escapes, requant,
stereo, exact filterbank — ``dec_mp3.py``) and H.264 CAVLC intra +
integer-pel inter (multi-ref, B/weighted/direct) — with the remaining
depth (CABAC, fractional-pel motion, and kin) behind declared
``NotImplementedError`` boundaries that name their spec clause and
carry rejection tests — while everything Spark-side is real and tested: the struct
schemas, the binary payload plumbing, the mapInPandas batch iteration,
row expansion (frame sampling), and the partitioning posture (media rows
are large → size partitions by bytes, never collect payloads to the
driver).
"""

from .schema import (
    IMAGE_META_SCHEMA,
    MEDIA_SCHEMA,
    with_media_payload,
)

# decode re-exports are LAZY (PEP 562): a Spark worker importing a
# split-out family module (dec_mp3, ...) must not execute decode.py
# as a side effect of this package's __init__.
_DECODE_NAMES = frozenset({
    "audio_chunk_energy", "decode_bmp_real", "decode_wav_real",
    "synthesize_bmp", "synthesize_wav", "wav_window_features",
    "block_mean_resize", "byte_histogram", "perceptual_hash",
    "decode_image_meta", "sample_frames",
})


def __getattr__(name):
    if name in _DECODE_NAMES:
        from . import decode

        value = getattr(decode, name)
        globals()[name] = value
        return value
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r}"
    )

__all__ = [
    "MEDIA_SCHEMA",
    "IMAGE_META_SCHEMA",
    "with_media_payload",
    "audio_chunk_energy",
    "block_mean_resize",
    "byte_histogram",
    "perceptual_hash",
    "decode_image_meta",
    "decode_wav_real",
    "decode_bmp_real",
    "synthesize_wav",
    "synthesize_bmp",
    "wav_window_features",
    "sample_frames",
]
