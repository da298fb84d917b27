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


# --- pillow decode branch via a sys.modules-injected fake -------------------
# Pillow is not in this image (and installs are off-limits), so the real
# decode branch is exercised the same way the Delta MERGE branch is: a fake
# PIL.Image whose open() yields known dims, or raises (corrupt bytes).


def _install_fake_pil(monkeypatch, *, width=None, height=None, raises=False):
    import sys
    import types

    class _Im:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class FakeImage:
        @staticmethod
        def open(buf):
            if raises:
                raise OSError("cannot identify image file")
            im = _Im()
            im.width, im.height = width, height
            return im

    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = FakeImage.open
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)


def test_decode_pillow_path(monkeypatch):
    from stock_etl_pipeline_spark.multimodal import _make_decoder

    _install_fake_pil(monkeypatch, width=123, height=45)
    assert _make_decoder()(b"\x89PNG...", "image") == (123, 45, "pillow")


def test_decode_corrupt_image_flagged(monkeypatch):
    from stock_etl_pipeline_spark.multimodal import _make_decoder

    _install_fake_pil(monkeypatch, raises=True)
    assert _make_decoder()(b"not an image", "image") == (-1, -1, "corrupt")


def test_decode_non_image_skips_decoder(monkeypatch):
    """audio/video blobs never enter the image decoder, even when present."""
    from stock_etl_pipeline_spark.multimodal import _make_decoder

    _install_fake_pil(monkeypatch, raises=True)
    w, h, mode = _make_decoder()(b"riff-ish bytes", "audio")
    assert mode == "stub" and w >= 64 and h >= 64


# --- real PNG decode via the pure-stdlib branch ------------------------------
# The container has no native image library, so REAL byte-stream decode is
# proven with the stdlib PNG decoder: fixtures below are genuine PNG files
# (zlib-deflated IDAT, correct CRCs) encoded with every scanline filter.


def _png_bytes(pixels, width, height, channels, filters=None):
    """Encode raw pixel bytes as a real PNG (test-side encoder): applies the
    requested per-row filter (default 0/None) then deflates — exercising the
    decoder's unfilter path against known ground truth."""
    import struct
    import zlib

    color = {1: 0, 3: 2, 4: 6, 2: 4}[channels]
    stride = width * channels
    filters = filters or [0] * height
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        line = bytearray(pixels[y * stride : (y + 1) * stride])
        f = filters[y]
        enc = bytearray(line)
        if f == 1:  # Sub
            for x in range(stride - 1, channels - 1, -1):
                enc[x] = (line[x] - line[x - channels]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                enc[x] = (line[x] - prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                enc[x] = (line[x] - ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[x] = (line[x] - pr) & 0xFF
        raw += bytes([f]) + enc
        prev = line

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_all_filters_roundtrip():
    from stock_etl_pipeline_spark.multimodal import decode_png

    w, h, ch = 5, 6, 3
    pixels = bytes((x * 37 + 11) % 256 for x in range(w * h * ch))
    for f in range(5):
        blob = _png_bytes(pixels, w, h, ch, filters=[f] * h)
        gw, gh, got = decode_png(blob)
        assert (gw, gh) == (w, h)
        assert got == pixels, f"filter {f} unfilter mismatch"
    # mixed filters across rows, RGBA and greyscale geometry too
    blob = _png_bytes(pixels, w, h, ch, filters=[0, 1, 2, 3, 4, 2])
    assert decode_png(blob)[2] == pixels
    grey = bytes((x * 3) % 256 for x in range(4))
    assert decode_png(_png_bytes(grey, 2, 2, 1))[2] == grey
    rgba = bytes(range(16))
    assert decode_png(_png_bytes(rgba, 2, 2, 4))[2] == rgba


def test_png_decode_rejects_corruption():
    import pytest

    from stock_etl_pipeline_spark.multimodal import decode_png

    blob = bytearray(_png_bytes(bytes(12), 2, 2, 3))
    blob[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"plain text")
    with pytest.raises(ValueError):
        decode_png(_png_bytes(bytes(12), 2, 2, 3)[:-24])  # truncated mid-IDAT


def test_png_decode_truncated_inside_crc_is_valueerror():
    # a stream cut INSIDE a chunk CRC used to escape as struct.error,
    # breaking the documented raises-ValueError contract
    import pytest

    from stock_etl_pipeline_spark.multimodal import decode_png

    blob = _png_bytes(bytes(12), 2, 2, 3)
    for cut in (len(blob) - 1, len(blob) - 3, 8 + 4 + 4 + 13 + 2):
        with pytest.raises(ValueError):
            decode_png(blob[:cut])


def test_png_decode_bounds_decompression_bomb():
    # a tiny IDAT claiming huge dims must be rejected BEFORE inflating,
    # and an IDAT inflating past the declared size must not OOM
    import struct
    import zlib

    import pytest

    from stock_etl_pipeline_spark.multimodal import decode_png

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    # 1) absurd declared dims: rejected at IHDR, no inflate attempted
    ihdr = struct.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 2, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 1024))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="too large"):
        decode_png(bomb)

    # 2) plausible dims, oversized deflate payload: bounded inflate turns
    # it into a size mismatch instead of materializing the whole stream
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    oversize = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * (1 << 22)))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(oversize)

    # 3) corrupt deflate bytes surface as ValueError, not zlib.error
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", b"\xde\xad\xbe\xef")
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IDAT"):
        decode_png(bad)


def test_real_png_decoded_end_to_end(spark):
    """extract_media_features over REAL PNG byte-streams: the stdlib branch
    reports true dimensions with decoder='png-stdlib'; corrupt PNGs route to
    'corrupt'; non-PNG images keep the deterministic stub."""
    w, h, ch = 7, 3, 3
    good = _png_bytes(bytes((x * 5) % 256 for x in range(w * h * ch)), w, h, ch, filters=[4] * h)
    bad = bytearray(good)
    bad[-5] ^= 0x01  # corrupt IEND CRC... inside IDAT-decoded region? -> CRC fail
    rows = [
        (1, "image", bytes(good), "s"),
        (2, "image", bytes(bad), "s"),
        (3, "image", b"JFIF-ish bytes, not png", "s"),
        (4, "audio", bytes(good), "s"),  # non-image: decoder never runs
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, content binary, source string"
    )
    got = {
        r["doc_id"]: (r["width"], r["height"], r["decoder"])
        for r in extract_media_features(media).collect()
    }
    assert got[1] == (w, h, "png-stdlib")
    assert got[2] == (-1, -1, "corrupt")
    assert got[3][2] == "stub"
    assert got[4][2] == "stub"
