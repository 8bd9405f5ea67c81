"""Multimodal-column queries: binary payload plumbing through Arrow-batched
``mapInPandas`` kernels, oracle-checked end to end (EXT, SURVEY.md §2B).

The payloads are synthesized deterministically from document text
(``multimodal.schema.with_media_payload``), so the fake decode kernels are
fully reproducible in DuckDB SQL — the *plumbing* under test (struct
schemas, batch iteration, row expansion) is exactly what a real codec
kernel would ride on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..multimodal import decode_image_meta, sample_frames, with_media_payload
from ..registry import query


@query(
    "multimodal_image_meta",
    oracle="""
    SELECT
      doc_id,
      octet_length(encode(text)) AS n_bytes,
      sha256(text) AS sha,
      CAST(64 + octet_length(encode(text)) % 577 AS INTEGER) AS width,
      CAST(64 + (octet_length(encode(text)) * 31) % 421 AS INTEGER) AS height,
      CAST(3 AS INTEGER) AS n_channels
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image metadata extraction: documents → media struct (binary payload
    + typed metadata) → ``mapInPandas`` decode kernel.  Deterministic fake
    header parse (dimensions are a pure function of byte length); the real
    codec site raises ``NotImplementedError`` (no image libs here)."""
    docs = load_table(spark, sf_dir, "documents")
    media = with_media_payload(docs)
    return decode_image_meta(media, codec="fake").orderBy("doc_id")


@query(
    "multimodal_frame_sample",
    # DuckDB substring() is varchar-only; the fixture text is pure ASCII
    # (verified at every SF), so char slicing == the kernel's byte slicing
    # and sha256(varchar) hashes the same UTF-8 bytes.
    oracle="""
    SELECT
      d.doc_id,
      f.idx AS frame_idx,
      sha256(substring(d.text, f.idx * 100 + 1, 100)) AS frame_sha
    FROM documents d,
      LATERAL (
        SELECT unnest(generate_series(0, length(d.text) // 100 - 1, 10)) AS idx
      ) f
    ORDER BY d.doc_id, f.idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-frame sampling shape: the payload is treated as fixed-size
    frames and every 10th frame is emitted — a row-EXPANDING mapInPandas
    kernel (1 media row → n_frames/stride frame rows), the plumbing real
    frame extraction uses.  Zero shuffle; embarrassingly parallel."""
    docs = load_table(spark, sf_dir, "documents")
    media = with_media_payload(docs)
    return sample_frames(media, frame_bytes=100, stride=10).orderBy(
        "doc_id", "frame_idx"
    )


@query(
    "multimodal_audio_energy",
    # the fixture text is pure ASCII, so byte values == character codes:
    # the oracle reconstructs the kernel's per-chunk energy with ord()
    oracle="""
    SELECT
      d.doc_id,
      c.i AS chunk_idx,
      400 AS n_samples,
      list_sum(list_transform(range(1, 401),
               j -> ord(substring(d.text, c.i * 400 + j, 1)))) AS energy,
      list_max(list_transform(range(1, 401),
               j -> ord(substring(d.text, c.i * 400 + j, 1)))) AS peak
    FROM documents d,
      LATERAL (
        SELECT unnest(generate_series(0, length(d.text) // 400 - 1)) AS i
      ) c
    ORDER BY d.doc_id, c.i
    """,
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality kernel: payload as a PCM sample stream, windowed
    into 400-sample chunks with per-chunk energy/peak via a vectorized
    mapInPandas kernel (the VAD/loudness pre-filter shape)."""
    from ..multimodal.decode import audio_chunk_energy

    docs = load_table(spark, sf_dir, "documents")
    media = with_media_payload(docs)
    return audio_chunk_energy(media, chunk_samples=400).orderBy(
        "doc_id", "chunk_idx"
    )


@query(
    "multimodal_resize_blockmean",
    # resized[i] = sum(block_i) // 8 — exact integer math, so the oracle
    # rebuilds every resized byte from the ASCII char codes
    oracle="""
    WITH r AS (
      SELECT d.doc_id,
             length(d.text) AS n_in,
             length(d.text) // 8 AS n_out,
             list_transform(range(0, length(d.text) // 8), i ->
               list_sum(list_transform(range(1, 9),
                 j -> ord(substring(d.text, CAST(i * 8 + j AS INTEGER), 1)))) // 8
             ) AS resized
      FROM documents d)
    SELECT doc_id,
           CAST(n_in AS INTEGER) AS n_in,
           CAST(n_out AS INTEGER) AS n_out,
           CAST(list_sum(resized) AS BIGINT) AS checksum,
           list_transform(resized[1:8], x -> CAST(x AS BIGINT)) AS head
    FROM r
    ORDER BY doc_id
    """,
)
def multimodal_resize_blockmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample kernel: block-mean the payload byte stream by 8
    (the 1-D thumbnail shape).  Integer floor-mean per block keeps the
    mapInPandas kernel bit-exact against the SQL oracle."""
    from ..multimodal.decode import block_mean_resize

    docs = load_table(spark, sf_dir, "documents")
    media = with_media_payload(docs)
    return block_mean_resize(media, factor=8).orderBy("doc_id")


@query(
    "multimodal_feature_histogram",
    oracle="""
    WITH h AS (
      SELECT d.doc_id,
             length(d.text) AS n_bytes,
             list_transform(range(0, 16), b ->
               CAST(length(list_filter(range(1, length(d.text) + 1),
                 j -> ord(substring(d.text, CAST(j AS INTEGER), 1)) // 16 = b)) AS BIGINT)
             ) AS hist
      FROM documents d)
    SELECT doc_id,
           CAST(n_bytes AS INTEGER) AS n_bytes,
           hist,
           CAST(list_indexof(hist, list_aggregate(hist, 'max')) - 1 AS INTEGER) AS top_bin
    FROM h
    ORDER BY doc_id
    """,
)
def multimodal_feature_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction kernel: fixed-width 16-bin byte histogram per
    media row (the embed/classify step of a multimodal pipeline) with an
    argmax ``top_bin``; vectorized numpy inside mapInPandas, zero shuffle."""
    from ..multimodal.decode import byte_histogram

    docs = load_table(spark, sf_dir, "documents")
    media = with_media_payload(docs)
    return byte_histogram(media).orderBy("doc_id")
