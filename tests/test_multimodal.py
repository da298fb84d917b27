"""Unit tests for the multimodal plumbing: binary schema, Arrow batch flow,
decode-stub determinism, frame-sample explosion arithmetic."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F
from pyspark.sql import types as T

from stock_etl_pipeline_spark.datasets import load_table
from stock_etl_pipeline_spark.multimodal import (
    FEATURE_SCHEMA,
    attach_media_columns,
    decode_media,
    extract_media_features,
    frame_sample_stub,
)

SF = "/root/testdata/sf0.001"


def test_media_columns_binary_typed(spark):
    media = attach_media_columns(load_table(spark, SF, "documents"))
    assert media.schema["content"].dataType == T.BinaryType()
    assert media.schema["media_type"].dataType == T.StringType()
    types = {r[0] for r in media.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_feature_extraction_one_to_one(spark):
    docs = load_table(spark, SF, "documents")
    feats = extract_media_features(attach_media_columns(docs))
    assert feats.schema == FEATURE_SCHEMA
    assert feats.count() == docs.count()  # 1:1, no drops
    # spot-check digest correctness against driver-side hashing
    doc = docs.filter(F.col("doc_id") == 0).collect()[0]
    feat = feats.filter(F.col("doc_id") == 0).collect()[0]
    assert feat["digest"] == hashlib.md5(doc["text"].encode()).hexdigest()
    assert feat["n_bytes"] == len(doc["text"].encode())
    assert feat["decoder"] == "stub"


def test_decode_stub_deterministic():
    w1, h1, d1 = decode_media(b"same bytes", "image")
    w2, h2, d2 = decode_media(b"same bytes", "image")
    assert (w1, h1, d1) == (w2, h2, d2)
    assert d1 == "stub" and 64 <= w1 < 80 and 64 <= h1 < 80


def test_frame_sample_counts(spark):
    docs = load_table(spark, SF, "documents")
    media = attach_media_columns(docs)
    frames = frame_sample_stub(media, every_n_bytes=64)
    videos = media.filter(F.col("media_type") == "video")
    # ceil(n_bytes / 64) frames per video item
    expected = videos.select(
        F.ceil(F.length(F.col("content")) / 64).cast("long").alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert frames.count() == expected
    assert frames.filter(F.col("byte_offset") % 64 != 0).count() == 0
