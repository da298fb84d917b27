"""Multimodal-column queries: binary content + typed metadata with
Arrow-batched feature extraction (multimodal/ module).

The decode itself is stubbed (no media libs in the container — see
multimodal.decode_media); everything distributed is real: binary columns,
mapInPandas signatures, Arrow batch flow, 1:N frame explosion. Oracles
exploit that the fixture media bytes are the documents' UTF-8 text (pure
ASCII in the testdata), so DuckDB can recompute byte counts, digests, and
frame digests with string functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..datasets import load_table
from ..multimodal import attach_media_columns, extract_media_features, frame_sample_stub
from . import spec

_MEDIA_TYPE_SQL = "['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1]"

_MEDIA_FEATURES_ORACLE = f"""
SELECT doc_id,
  {_MEDIA_TYPE_SQL} AS media_type,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS digest,
  CAST(64 + (ascii(substring(md5(text), 1, 1)) % 16) AS INTEGER) AS width,
  CAST(64 + (ascii(substring(md5(text), 2, 1)) % 16) AS INTEGER) AS height,
  'stub' AS decoder
FROM documents
""".strip()


@spec("multimodal_features", oracle=_MEDIA_FEATURES_ORACLE, tags=("multimodal", "binary", "pandas_udf"))
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media → per-item features in one narrow mapInPandas pass
    (n_bytes, content digest, stub-decoded dimensions). No shuffle touches
    the media bytes; only the thin feature rows move downstream."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_media_features(attach_media_columns(docs))


_FRAME_SAMPLE_ORACLE = """
SELECT doc_id,
  CAST(i / 64 AS INTEGER) AS frame_no,
  CAST(i AS BIGINT) AS byte_offset,
  md5(substring(text, CAST(i + 1 AS INTEGER), 64)) AS frame_digest
FROM (
  SELECT doc_id, text,
    unnest(generate_series(0, CAST(length(text) - 1 AS BIGINT), 64)) AS i
  FROM documents
  WHERE doc_id % 3 = 2
)
""".strip()


@spec("multimodal_frame_sample", oracle=_FRAME_SAMPLE_ORACLE, tags=("multimodal", "binary", "explode"))
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: 1:N mapInPandas explosion, one row per
    sampled 64-byte frame with its digest (decode stubbed, flow real)."""
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample_stub(attach_media_columns(docs), every_n_bytes=64)
