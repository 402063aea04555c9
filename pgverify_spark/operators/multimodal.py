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


#: Output schema of the resize stub.
RESIZE_SCHEMA = "doc_id bigint, width int, height int, checksum string"
#: Characters per pseudo-video frame for the frame sampler.
FRAME_CHARS = 128
FRAME_SAMPLE_SCHEMA = "doc_id bigint, frame_idx int, frame_checksum string"


def resize_images(df: DataFrame, width: int = 64, height: int = 48) -> DataFrame:
    """Resize plumbing: Arrow-batched 1->1 projection over payload bytes.

    A real implementation decodes and resamples pixels (``decode_stub``);
    here the "resized" artifact is a deterministic checksum of
    (payload, target size), so the batch shape, schema contract and
    partitioning behavior are real and oracle-checkable.
    """

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"|{width}x{height}".encode()
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "checksum": [
                        hashlib.md5(bytes(p) + tag).hexdigest() for p in pdf["payload"]
                    ],
                }
            )

    return attach_payload(df).mapInPandas(batch, RESIZE_SCHEMA)


def resize_images_oracle_sql(table: str, width: int = 64, height: int = 48) -> str:
    return (
        f"SELECT doc_id, {width} AS width, {height} AS height, "
        f"md5(text || '|{width}x{height}') AS checksum FROM {table}"
    )


def frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing: Arrow-batched 1->N fan-out — each payload
    is treated as a frame sequence (``FRAME_CHARS`` characters per frame)
    and every ``every_n``-th frame is emitted as its own row, the shape a
    real video sampler produces.  Frame identity is the md5 of the frame
    slice, so the fan-out is oracle-checkable end-to-end.
    """

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            sums: list[str] = []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                t = bytes(p).decode("utf-8")
                for i in range(0, len(t) // FRAME_CHARS, every_n):
                    ids.append(did)
                    idxs.append(i)
                    sums.append(
                        hashlib.md5(
                            t[i * FRAME_CHARS : (i + 1) * FRAME_CHARS].encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_checksum": sums}
            )

    return attach_payload(df).mapInPandas(batch, FRAME_SAMPLE_SCHEMA)


def frame_sample_oracle_sql(table: str, every_n: int = 2) -> str:
    fc = FRAME_CHARS
    return (
        f"SELECT doc_id, CAST(i AS INT) AS frame_idx, "
        f"md5(substr(text, CAST(i * {fc} + 1 AS INT), {fc})) AS frame_checksum FROM "
        f"(SELECT doc_id, text, unnest(range(0, length(text) // {fc})) AS i "
        f"FROM {table}) t WHERE i % {every_n} = 0"
    )


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
