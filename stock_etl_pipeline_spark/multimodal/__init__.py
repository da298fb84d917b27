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


def _make_decoder():
    """Build the per-blob decode function as a DYNAMIC function so cloudpickle
    serializes it by value: the mapInPandas closure must not reference a
    module-level attribute, or executors whose Python path lacks this package
    (driver launched from another cwd, no --py-files) fail with
    ModuleNotFoundError. A factory-made closure ships its own code object."""

    def decode(content: bytes, media_type: str) -> tuple[int, int, str]:
        import hashlib

        digest = hashlib.md5(content).hexdigest()
        if media_type == "image":
            try:  # real decoder path (not installed in this container)
                import io

                from PIL import Image  # type: ignore

                with Image.open(io.BytesIO(content)) as im:
                    return im.width, im.height, "pillow"
            except ImportError:
                pass
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
