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
