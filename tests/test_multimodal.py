"""Multimodal plumbing tests: media struct schema, decode kernels, the
real-codec stub contract, and UDF-surface registration.

Oracle parity for the registered queries runs in test_oracle_parity; these
cover the library API and the parts parity can't see (the stubbed path).
"""

from __future__ import annotations

import pytest

from open_source_etl_spark.functions.udfs import register_all
from open_source_etl_spark.catalog import load_table
from open_source_etl_spark.multimodal import (
    audio_chunk_energy,
    block_mean_resize,
    byte_histogram,
    decode_image_meta,
    sample_frames,
    with_media_payload,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return with_media_payload(load_table(spark, sf_dir, "documents"))


def test_media_struct_shape(media):
    t = media.schema["media"].dataType
    assert [f.name for f in t.fields] == ["kind", "source", "n_bytes", "payload"]
    row = media.select("media.kind", "media.n_bytes", "media.payload").first()
    assert row.kind == "image"
    assert row.n_bytes == len(row.payload)


def test_real_codec_path_is_stubbed(media):
    """The real decode site must raise NotImplementedError (no codec libs
    in this container) — and raise it from inside the distributed kernel,
    proving the plumbing reaches the codec call."""
    df = decode_image_meta(media.limit(1), codec="real")
    with pytest.raises(Exception, match="NotImplementedError|image library"):
        df.collect()


def test_unknown_codec_rejected(media):
    with pytest.raises(ValueError, match="unknown codec"):
        decode_image_meta(media, codec="webp")


def test_frame_sampling_counts(media, spark):
    """Row expansion: each doc yields floor(bytes/100) frames sampled at
    stride 10 → ceil(n_frames/10) rows."""
    import pyspark.sql.functions as F

    frames = sample_frames(media, frame_bytes=100, stride=10)
    got = {r.doc_id: r.n for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    sizes = {r.doc_id: r.n_bytes for r in media.select("doc_id", "media.n_bytes").collect()}
    for doc_id, n_bytes in sizes.items():
        n_frames = n_bytes // 100
        expected = (n_frames + 9) // 10 if n_frames else 0
        assert got.get(doc_id, 0) == expected


def test_audio_chunk_energy_matches_bytes(media):
    """Windowed PCM features: each 400-byte chunk's energy/peak must equal
    the plain-Python reduction over the same payload slice."""
    one = media.orderBy("doc_id").limit(1)
    payload = bytes(one.select("media.payload").first()[0])
    rows = audio_chunk_energy(one, chunk_samples=400).orderBy("chunk_idx").collect()
    assert len(rows) == len(payload) // 400
    for r in rows:
        chunk = payload[r.chunk_idx * 400 : (r.chunk_idx + 1) * 400]
        assert r.n_samples == 400
        assert r.energy == sum(chunk)
        assert r.peak == max(chunk)


def test_audio_real_codec_is_stubbed(media):
    df = audio_chunk_energy(media.limit(1), codec="real")
    with pytest.raises(Exception, match="NotImplementedError|audio library"):
        df.collect()


def test_block_mean_resize_matches_bytes(media):
    one = media.orderBy("doc_id").limit(1)
    payload = bytes(one.select("media.payload").first()[0])
    r = block_mean_resize(one, factor=8).first()
    n_out = len(payload) // 8
    resized = [sum(payload[i * 8 : (i + 1) * 8]) // 8 for i in range(n_out)]
    assert (r.n_in, r.n_out) == (len(payload), n_out)
    assert r.checksum == sum(resized)
    assert list(r.head) == resized[:8]


def test_byte_histogram_matches_bytes(media):
    one = media.orderBy("doc_id").limit(1)
    payload = bytes(one.select("media.payload").first()[0])
    r = byte_histogram(one).first()
    hist = [0] * 16
    for b in payload:
        hist[b >> 4] += 1
    assert list(r.hist) == hist
    assert r.top_bin == hist.index(max(hist))
    assert r.n_bytes == len(payload)


def test_udf_surface_registers_for_sql(spark):
    register_all(spark)
    out = spark.sql(
        "SELECT net_revenue(CAST(10.0 AS DOUBLE), CAST(0.1 AS DOUBLE)) AS r"
    ).first()
    assert abs(out.r - 9.0) < 1e-12
