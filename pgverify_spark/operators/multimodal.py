"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference extension: a 100 TB training pipeline carries
image/audio/video as opaque ``binary`` columns with typed metadata, and
runs decode / feature-extract / resize / frame-sample as Arrow-batched
Python over ``mapInPandas``.  The decode step itself is STUBBED here
(image/audio libraries are not available in this environment —
``NotImplementedError`` behind ``decode_stub``) but everything Spark
cares about is real and tested: the binary column, the schema contract,
the Arrow batch shapes, and the deterministic feature extraction, which
is oracle-checked against DuckDB blob functions.

Scale: ``mapInPandas`` streams Arrow record batches through one Python
worker per core with no shuffle; payload bytes never pass through the
driver.  Feature extraction is a pure projection — partitioning is
whatever the source had, which is exactly right.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from pgverify_spark.functions.canonical import DIALECT_DUCKDB, hex_prefix_int_sql

#: Schema of the extracted-feature output (driver contract: stable).
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, checksum string, media_type string, "
    "width int, height int"
)

_MEDIA_TYPES = ("image/png", "image/jpeg", "audio/wav")


def attach_payload(df: DataFrame) -> DataFrame:
    """Attach an opaque binary payload column (here: UTF-8 text bytes
    standing in for image bytes) — the ingestion half of the plumbing."""
    return df.selectExpr("doc_id", "encode(text, 'UTF-8') AS payload")


def decode_stub(payload: bytes) -> None:
    """Placeholder for a real decoder (PIL / libav).  Not available in
    this environment; the feature extractor uses deterministic
    hash-derived pseudo-features instead."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; wire PIL/av here in production"
    )


def _features_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction (runs on executors)."""
    for pdf in it:
        digests = [hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]]
        h48 = [int(d[:12], 16) for d in digests]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                "checksum": digests,
                # deterministic pseudo-decode: a real decoder would parse
                # the container header here (see decode_stub)
                "media_type": [_MEDIA_TYPES[h % len(_MEDIA_TYPES)] for h in h48],
                "width": [64 + h % 1920 for h in h48],
                "height": [64 + (h // 1920) % 1080 for h in h48],
            }
        )


def extract_features(df: DataFrame) -> DataFrame:
    """Binary payload -> typed metadata via Arrow-batched mapInPandas."""
    return attach_payload(df).mapInPandas(_features_batch, FEATURE_SCHEMA)


def extract_features_oracle_sql(table: str) -> str:
    """DuckDB twin: the payload is UTF-8 text bytes, so md5(text) equals
    the Python md5 of the payload and blob length is octet_length."""
    h48 = hex_prefix_int_sql("md5(text)", DIALECT_DUCKDB)
    media = (
        f"CASE ({h48} % 3) WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg' "
        "ELSE 'audio/wav' END"
    )
    return (
        "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
        "md5(text) AS checksum, "
        f"{media} AS media_type, "
        f"CAST(64 + ({h48} % 1920) AS INT) AS width, "
        f"CAST(64 + (({h48} // 1920) % 1080) AS INT) AS height "
        f"FROM {table}"
    )
