"""Multimodal columns (EXT, SURVEY.md §2B): image/audio/video as opaque
binary columns with typed metadata, processed by Arrow-batched
``mapInPandas`` pipelines.

The container has no image/audio codecs, so the *decode kernels* are
stubbed — ``decode.py`` raises ``NotImplementedError`` on the real path
and ships a deterministic fake for tests — while everything Spark-side is
real and tested: the struct schemas, the binary payload plumbing, the
mapInPandas batch iteration, row expansion (frame sampling), and the
partitioning posture (media rows are large → size partitions by bytes,
never collect payloads to the driver).
"""

from .decode import (
    audio_chunk_energy,
    block_mean_resize,
    byte_histogram,
    perceptual_hash,
    decode_image_meta,
    sample_frames,
)
from .schema import (
    IMAGE_META_SCHEMA,
    MEDIA_SCHEMA,
    with_media_payload,
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
    "sample_frames",
]
