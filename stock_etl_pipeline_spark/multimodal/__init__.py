"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with Arrow-batched feature extraction over ``mapInPandas``.

The Spark-side plumbing is real and tested — schema, partitioning, UDF
signature, Arrow batch shape. The actual media DECODE is stubbed: the
container has no image/audio libraries, so ``decode_media`` tries the real
decoder import and falls back to a clearly-marked deterministic fake
(dimensions derived from the content digest). Swapping in a real decoder
changes ONE function; every distributed concern stays as-is.

Scale notes: media bytes are the widest column by orders of magnitude —
the design keeps them out of every shuffle. Features are extracted in a
narrow ``mapInPandas`` pass straight off the scan (no exchange before
extraction), and downstream analytics carry only the extracted features.
Batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
against executor memory (media rows are huge — set it low for real media).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), nullable=False),
        T.StructField("media_type", T.StringType(), nullable=False),
        T.StructField("content", T.BinaryType(), nullable=True),
        T.StructField("source", T.StringType(), nullable=True),
    ]
)

MEDIA_TYPES = ("image", "audio", "video")

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def attach_media_columns(documents: DataFrame) -> DataFrame:
    """Derive a deterministic media table from ``documents``: the text bytes
    stand in for encoded media content (UTF-8 → binary), media_type cycles
    by doc_id. This is the fixture path — a real pipeline reads
    ``spark.read.format("binaryFile")`` or parquet with a binary column."""
    return documents.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % len(MEDIA_TYPES)).cast("int") + 1,
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        "source",
    )


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _make_png_decoder():
    """Factory for the pure-stdlib PNG decoder (dynamic function → cloudpickle
    ships it by value inside the mapInPandas closure, like _make_decoder).

    A REAL decode, not a header probe: chunk CRCs are verified, the IDAT
    stream is inflated, and every scanline filter (None/Sub/Up/Average/Paeth)
    is reversed to raw pixel bytes. Supports the common subset — 8-bit
    greyscale/RGB/(A), non-interlaced — and raises on anything else or on
    corrupt input. Per-byte Python loops are fine here by design: this is the
    fixture-scale decode branch proving the plumbing end-to-end; a production
    deployment swaps in a native decoder (Pillow branch below) and keeps
    every distributed concern unchanged."""

    def decode_png(content: bytes) -> tuple[int, int, bytes]:
        import struct
        import zlib

        if content[:8] != _PNG_MAGIC:
            raise ValueError("not a PNG")
        pos = 8
        width = height = channels = None
        idat = b""
        saw_iend = False
        while pos + 12 <= len(content):
            (ln,), typ = struct.unpack(">I", content[pos : pos + 4]), content[pos + 4 : pos + 8]
            # a stream cut anywhere inside the chunk body or its CRC must
            # surface as the documented ValueError, not a struct.error
            if pos + 12 + ln > len(content):
                raise ValueError("truncated chunk")
            data = content[pos + 8 : pos + 8 + ln]
            (crc,) = struct.unpack(">I", content[pos + 8 + ln : pos + 12 + ln])
            if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
                raise ValueError("chunk CRC mismatch")
            if typ == b"IHDR":
                if len(data) != 13:
                    raise ValueError("bad IHDR length")
                width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
                if depth != 8 or interlace != 0:
                    raise ValueError("unsupported PNG variant")
                channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
                if channels is None:
                    raise ValueError("unsupported color type")
                if not width or not height:
                    raise ValueError("zero-sized image")
                # sanity-bound dims BEFORE any inflate: a crafted IHDR
                # must not license an unbounded allocation downstream
                if (width * channels + 1) * height > 1 << 28:
                    raise ValueError("image too large")
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                saw_iend = True
                break
            pos += 12 + ln
        if width is None or not idat:
            raise ValueError("missing IHDR/IDAT")
        if not saw_iend:  # stream ended before a complete IEND: truncated
            raise ValueError("truncated stream (no IEND)")
        stride = width * channels
        expected = (stride + 1) * height
        # bounded inflate: a tiny crafted IDAT can expand arbitrarily
        # (decompression bomb) — cap the output at expected+1 so an
        # oversized stream shows up as a size mismatch, not an OOM
        try:
            dec = zlib.decompressobj()
            raw = dec.decompress(idat, expected + 1)
        except zlib.error as e:  # corrupt deflate stream → documented error
            raise ValueError(f"bad IDAT stream: {e}") from e
        if len(raw) != expected:
            raise ValueError("pixel data size mismatch")
        out = bytearray()
        prev = bytearray(stride)
        for y in range(height):
            f = raw[y * (stride + 1)]
            line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
            if f == 1:  # Sub
                for x in range(channels, stride):
                    line[x] = (line[x] + line[x - channels]) & 0xFF
            elif f == 2:  # Up
                for x in range(stride):
                    line[x] = (line[x] + prev[x]) & 0xFF
            elif f == 3:  # Average
                for x in range(stride):
                    a = line[x - channels] if x >= channels else 0
                    line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
            elif f == 4:  # Paeth
                for x in range(stride):
                    a = line[x - channels] if x >= channels else 0
                    b = prev[x]
                    c = prev[x - channels] if x >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    line[x] = (line[x] + pr) & 0xFF
            elif f != 0:
                raise ValueError(f"bad filter byte {f}")
            out += line
            prev = line
        return width, height, bytes(out)

    return decode_png


# Module-level twin for direct testing; the mapInPandas closure builds its
# own by-value copy via the factory.
decode_png = _make_png_decoder()


def _make_decoder():
    """Build the per-blob decode function as a DYNAMIC function so cloudpickle
    serializes it by value: the mapInPandas closure must not reference a
    module-level attribute, or executors whose Python path lacks this package
    (driver launched from another cwd, no --py-files) fail with
    ModuleNotFoundError. A factory-made closure ships its own code object."""

    png = _make_png_decoder()  # by-value sibling closure

    def decode(content: bytes, media_type: str) -> tuple[int, int, str]:
        import hashlib

        digest = hashlib.md5(content).hexdigest()
        if media_type == "image":
            try:  # native decoder path (not installed in this container)
                import io

                from PIL import Image  # type: ignore

                with Image.open(io.BytesIO(content)) as im:
                    return im.width, im.height, "pillow"
            except ImportError:
                pass
            except Exception:
                return -1, -1, "corrupt"
            if content[:8] == _PNG_MAGIC:
                # real stdlib decode: inflate + unfilter to pixels; a PNG
                # that fails mid-decode is corrupt, not stub-able
                try:
                    w, h, _pixels = png(content)
                    return w, h, "png-stdlib"
                except Exception:
                    return -1, -1, "corrupt"
        # Deterministic fake: dims from the digest (portable: ord of hex).
        width = 64 + (ord(digest[0]) % 16)
        height = 64 + (ord(digest[1]) % 16)
        return width, height, "stub"

    return decode


# Public stub — swap this ONE function for a real decoder deployment.
decode_media = _make_decoder()


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction: one narrow ``mapInPandas`` pass.

    The iterator-of-batches signature streams Arrow batches through Python
    without materializing a partition; output rows stay 1:1 with input.
    """
    import pandas as pd

    decode = _make_decoder()  # fresh dynamic closure → pickled by value

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            content = pdf["content"]
            dims = [
                decode(bytes(c), mt)
                for c, mt in zip(content, pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(c)) for c in content],
                    "digest": [hashlib.md5(bytes(c)).hexdigest() for c in content],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "decoder": [d[2] for d in dims],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing for video: explode one row per sampled offset
    (the decode of each frame is the same stub boundary). Demonstrates the
    1:N mapInPandas shape without shipping bytes through a shuffle."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("byte_offset", T.LongType()),
            T.StructField("frame_digest", T.StringType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = {"doc_id": [], "frame_no": [], "byte_offset": [], "frame_digest": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                blob = bytes(content)
                for frame_no, off in enumerate(range(0, len(blob), every_n_bytes)):
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(frame_no)
                    rows["byte_offset"].append(off)
                    rows["frame_digest"].append(
                        hashlib.md5(blob[off : off + every_n_bytes]).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return media.filter(F.col("media_type") == "video").mapInPandas(batches, schema)
