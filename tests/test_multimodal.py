"""Multimodal plumbing: binary payloads survive the Arrow round trip and
the mapInPandas feature extractor matches a driver-side golden."""

from __future__ import annotations

import hashlib

import pytest

from quant_market_data_pipeline_spark.llm.multimodal import (
    extract_media_features,
    fake_decode,
    media_from_documents,
    real_decode_stub,
)
from quant_market_data_pipeline_spark.sources.tables import load_table


def test_media_features_match_golden(spark):
    docs = load_table(spark, "documents", "/root/testdata/sf0.001").limit(50)
    media = media_from_documents(docs)
    feats = {r["media_id"]: r for r in extract_media_features(media).collect()}

    for row in docs.collect():
        payload = row["text"].encode("utf-8")
        h = hashlib.sha256(payload).hexdigest()
        f = feats[row["doc_id"]]
        assert f["n_bytes"] == len(payload)
        assert f["sha256"] == h
        assert (f["width"], f["height"]) == (64 + ord(h[0]), 64 + ord(h[1]))
        assert f["n_frames"] == (len(payload) % 7) + 1


def test_media_schema_binary_roundtrip(spark):
    docs = load_table(spark, "documents", "/root/testdata/sf0.001").limit(5)
    media = media_from_documents(docs).collect()
    for m in media:
        assert isinstance(m["payload"], (bytes, bytearray))
        assert m["meta"]["origin"].startswith("src")


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_decode_stub(b"x", "image")


def test_fake_decode_deterministic():
    assert fake_decode(b"abc", "image") == fake_decode(b"abc", "image")


def test_stdlib_codec_bmp_roundtrip():
    from quant_market_data_pipeline_spark.llm.multimodal import (
        encode_bmp,
        stdlib_decode,
    )

    blob = encode_bmp(17, 9, seed=42)
    # real BMP: magic, declared size == actual size, 4-byte-padded rows
    assert blob[:2] == b"BM"
    assert len(blob) == 54 + ((17 * 3 + 3) // 4) * 4 * 9
    assert stdlib_decode(blob, "image") == (17, 9, 1)


def test_stdlib_codec_wav_roundtrip_and_chunk_walk():
    import struct

    from quant_market_data_pipeline_spark.llm.multimodal import (
        encode_wav,
        stdlib_decode,
    )

    blob = encode_wav(123, 16000, seed=7)
    assert len(blob) == 44 + 2 * 123
    assert stdlib_decode(blob, "audio") == (16000, 1, 123)
    # non-canonical file: a LIST chunk (odd size -> pad byte) before data
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    shuffled = blob[:12] + extra + blob[12:]
    shuffled = (
        shuffled[:4]
        + struct.pack("<I", len(shuffled) - 8)
        + shuffled[8:]
    )
    assert stdlib_decode(shuffled, "audio") == (16000, 1, 123)


def test_stdlib_codec_falls_back_to_fake_for_text():
    from quant_market_data_pipeline_spark.llm.multimodal import (
        fake_decode,
        stdlib_decode,
    )

    payload = "BMarley was here".encode()  # 'BM' prefix but not a BMP
    assert stdlib_decode(payload, "image") == fake_decode(payload, "image")


def test_media_codec_roundtrip_query(spark):
    from quant_market_data_pipeline_spark.queries import load_all

    reg = load_all()
    out = (
        reg["media_codec_roundtrip"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(out) > 0
    by_id = {r["media_id"]: r for r in out}
    even = by_id[min(i for i in by_id if i % 2 == 0)]
    odd = by_id[min(i for i in by_id if i % 2 == 1)]
    assert even["kind"] == "image" and even["n_frames"] == 1
    assert odd["kind"] == "audio" and odd["height"] == 1
    assert odd["n_bytes"] == 44 + 2 * odd["n_frames"]


def test_stdlib_codec_sub_byte_wav_no_crash():
    """4-bit (IMA ADPCM-style) WAV: bits < 8 must not divide by zero in
    the executor UDF — n_samples reports 0 (unknown) instead."""
    import struct

    data = b"\x12\x34\x56\x78"
    blob = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 17, 1, 8000, 4055, 256, 4)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    from quant_market_data_pipeline_spark.llm.multimodal import stdlib_decode

    assert stdlib_decode(blob, "audio") == (8000, 1, 0)


def test_sample_frames_chunked_flush(spark):
    """A payload expanding past the flush threshold must stream out in
    multiple output batches with identical rows/order to the naive path
    (bounded-memory claim of sample_frames)."""
    import pandas as pd
    from pyspark.sql import types as T

    from quant_market_data_pipeline_spark.llm import multimodal as mm

    # 5 blobs x 40 frames each, flush threshold forced tiny so the
    # chunking path actually executes (production threshold is 65536)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    rows = [(i, "video", bytes([i]) * 10) for i in range(5)]
    media = spark.createDataFrame(rows, schema)

    def decode_40(payload, kind):
        return (1, 1, 40)

    old = mm._FRAME_FLUSH_ROWS
    mm._FRAME_FLUSH_ROWS = 7
    try:
        chunked = (
            mm.sample_frames(media.coalesce(1), every_n=1, decode_fn=decode_40)
            .toPandas()
        )
    finally:
        mm._FRAME_FLUSH_ROWS = old
    plain = (
        mm.sample_frames(media.coalesce(1), every_n=1, decode_fn=decode_40)
        .toPandas()
    )
    assert len(chunked) == 5 * 40
    pd.testing.assert_frame_equal(
        chunked.sort_values(["media_id", "frame_idx"]).reset_index(drop=True),
        plain.sort_values(["media_id", "frame_idx"]).reset_index(drop=True),
    )
