"""Multimodal columns: real binary media payloads + real decode.

Beyond-reference extension (the reference verifies cross-database table
equality, SURVEY.md §2.3; it has no media tooling): a 100 TB training
pipeline carries image/audio/video as opaque ``binary`` columns and
runs decode / feature-extract / resize / frame-sample as Arrow-batched
Python over ``mapInPandas``.

No image/audio *libraries* exist in this environment, so the media
formats are the classic codec-free containers — 24-bit uncompressed
BMP, binary PPM (P6), and PCM16 WAV — parsed and synthesized with
``struct``/numpy only.  The decode path is REAL: it sniffs magic bytes,
walks container headers (RIFF chunks, BMP's bottom-up BGR rows, PPM's
ASCII header), and the extracted dimensions/durations and resized-pixel
checksums are verified against a DuckDB oracle that predicts them from
the synthesis formulas — a decoder that mis-parsed a header offset, or
forgot BMP's row flip or BGR order, fails the value-hash immediately.
Swapping in PIL/libav for compressed formats changes only the body of
``decode_media``; every schema, batch shape and plan stays as-is.

Payload synthesis is deterministic from md5(text) (``_h48``), so both
engines can derive the expected features without shipping bytes into
SQL; the Spark side measures them from the actual decoded container.

Scale: ``mapInPandas`` streams Arrow record batches through one Python
worker per core with no shuffle; payload bytes never pass through the
driver and never shuffle (synthesis, decode and feature extraction fuse
into one stage over the source partitioning).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from pgverify_spark.functions.canonical import DIALECT_DUCKDB, hex_prefix_int_sql

# ---------------------------------------------------------------------------
# Deterministic synthesis parameters (mirrored in the oracle SQL)
# ---------------------------------------------------------------------------

#: kind = h48 % 3 -> 0: BMP image, 1: PPM image, 2: WAV audio.
MEDIA_TYPES = ("image/bmp", "image/x-portable-pixmap", "audio/wav")
#: pixel-formula seed modulus (prime < 256).
SEED_MOD = 251
#: image dims: w in 4..32, h in 4..26 (small; pixel count is w*h*3 bytes).
W_BASE, W_DIV, W_MOD = 4, 3, 29
H_BASE, H_DIV, H_MOD = 4, 97, 23
#: WAV: PCM16 mono at a fixed rate; sample count in 256..4351.
SAMPLE_RATE = 8000
NS_BASE, NS_DIV, NS_MOD = 256, 7, 4096
#: samples per video-style "frame" for the frame sampler.
FRAME_SAMPLES = 256


def _h48(text: str) -> int:
    return int(hashlib.md5(text.encode()).hexdigest()[:12], 16)


def _params(h48: int) -> tuple[int, int, int, int, int]:
    """(kind, seed, width, height, n_samples) from the doc hash."""
    return (
        h48 % 3,
        h48 % SEED_MOD,
        W_BASE + (h48 // W_DIV) % W_MOD,
        H_BASE + (h48 // H_DIV) % H_MOD,
        NS_BASE + (h48 // NS_DIV) % NS_MOD,
    )


def _rgb_plane(seed: int, w: int, h: int) -> np.ndarray:
    """(h, w, 3) uint8 gradient pixels — formulas mirrored in the oracle."""
    y, x = np.mgrid[0:h, 0:w]
    r = (seed + 7 * x + 13 * y) % 256
    g = (2 * seed + 11 * x + 5 * y) % 256
    b = (3 * seed + 3 * x + 17 * y) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def _pcm(seed: int, n: int) -> np.ndarray:
    """n int16 samples — formula mirrored in the oracle."""
    i = np.arange(n, dtype=np.int64)
    return ((seed * 31 + 11 * i) % 65536 - 32768).astype(np.int16)


def _make_bmp(seed: int, w: int, h: int) -> bytes:
    """24bpp uncompressed BMP: bottom-up rows, BGR order, 4-byte row pad."""
    px = _rgb_plane(seed, w, h)
    pad = (-3 * w) % 4
    stride = 3 * w + pad
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = px[::-1, :, ::-1].reshape(h, 3 * w)  # flip rows, RGB->BGR
    body = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + body


def _make_ppm(seed: int, w: int, h: int) -> bytes:
    """Binary PPM (P6): ASCII header + top-down RGB rows, no padding."""
    return f"P6\n{w} {h}\n255\n".encode() + _rgb_plane(seed, w, h).tobytes()


def _make_wav(seed: int, n: int) -> bytes:
    """Canonical 44-byte RIFF/WAVE header + PCM16LE mono samples."""
    body = _pcm(seed, n).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(body), b"WAVE",
        b"fmt ", 16, 1, 1, SAMPLE_RATE, SAMPLE_RATE * 2, 2, 16,
        b"data", len(body),
    )
    return hdr + body


def synthesize_media(df: DataFrame) -> DataFrame:
    """(doc_id, payload) — a real binary media column derived
    deterministically from each document's text hash (the ingestion half
    of the plumbing; in production this column comes off object storage).
    """

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for text in pdf["text"]:
                kind, seed, w, h, n = _params(_h48(text))
                if kind == 0:
                    payloads.append(_make_bmp(seed, w, h))
                elif kind == 1:
                    payloads.append(_make_ppm(seed, w, h))
                else:
                    payloads.append(_make_wav(seed, n))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return df.select("doc_id", "text").mapInPandas(batch, "doc_id bigint, payload binary")


# ---------------------------------------------------------------------------
# Decode — real container parsing (struct/numpy only, no codecs)
# ---------------------------------------------------------------------------

def decode_media(payload: bytes) -> dict:
    """Parse a BMP/PPM/WAV container into typed metadata + raw content.

    Returns ``media_type, width, height, sample_rate, n_samples,
    duration_us`` plus the decoded content: ``pixels`` as an (h, w, 3)
    top-down RGB uint8 array for images, ``samples`` as an int16 array
    for audio.  Raises ``ValueError`` on an unknown or malformed
    container (unknown magic, unsupported bpp, truncated body).
    """
    if payload[:2] == b"BM":
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        data_off = struct.unpack_from("<I", payload, 10)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        if bpp != 24 or planes != 1 or h <= 0 or w <= 0:
            raise ValueError(f"unsupported BMP (bpp={bpp}, {w}x{h})")
        stride = (3 * w + 3) // 4 * 4
        body = np.frombuffer(payload, np.uint8, count=h * stride, offset=data_off)
        rows = body.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
        return {
            "media_type": "image/bmp",
            "width": w,
            "height": h,
            "sample_rate": None,
            "n_samples": None,
            "duration_us": None,
            "pixels": rows[::-1, :, ::-1],  # bottom-up BGR -> top-down RGB
            "samples": None,
        }
    if payload[:2] == b"P6":
        # header: "P6" <ws> width <ws> height <ws> maxval <single ws>
        fields, pos = [], 2
        while len(fields) < 3:
            while payload[pos : pos + 1].isspace():
                pos += 1
            start = pos
            while not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxval = fields
        if maxval != 255:
            raise ValueError(f"unsupported PPM maxval {maxval}")
        px = np.frombuffer(payload, np.uint8, count=3 * w * h, offset=pos)
        return {
            "media_type": "image/x-portable-pixmap",
            "width": w,
            "height": h,
            "sample_rate": None,
            "n_samples": None,
            "duration_us": None,
            "pixels": px.reshape(h, w, 3),
            "samples": None,
        }
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # walk RIFF chunks for fmt and data (real files interleave others)
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid, clen = struct.unpack_from("<4sI", payload, pos)
            if cid == b"fmt ":
                fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
            elif cid == b"data":
                data = payload[pos + 8 : pos + 8 + clen]
            pos += 8 + clen + (clen & 1)
        if fmt is None or data is None:
            raise ValueError("WAV missing fmt/data chunk")
        audio_fmt, channels, rate, _, _, bits = fmt
        if audio_fmt != 1 or bits != 16 or channels != 1:
            raise ValueError(f"unsupported WAV (fmt={audio_fmt}, {bits}bit x{channels})")
        samples = np.frombuffer(data, "<i2")
        return {
            "media_type": "audio/wav",
            "width": None,
            "height": None,
            "sample_rate": rate,
            "n_samples": len(samples),
            "duration_us": len(samples) * 1_000_000 // rate,
            "pixels": None,
            "samples": samples,
        }
    raise ValueError(f"unknown container magic {payload[:4]!r}")


# ---------------------------------------------------------------------------
# Feature extraction
# ---------------------------------------------------------------------------

#: Schema of the extracted-feature output (driver contract: stable).
FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, width int, height int, "
    "sample_rate int, n_samples int, duration_us bigint"
)


#: ``features_from_payloads`` error policies: a corrupt container
#: either fails the job ("fail", the default — a verification engine
#: should not silently eat bad bytes), is dropped ("skip"), or is kept
#: as an auditable row with media_type 'invalid' and NULL metadata
#: ("mark" — the curation-pipeline default, so bad-blob *rates* are
#: measurable downstream).
DECODE_POLICIES = ("fail", "skip", "mark")


def features_from_payloads(
    payloads: DataFrame, on_error: str = "fail"
) -> DataFrame:
    """(doc_id, payload) -> typed metadata via real container decode —
    the production entry point (payloads come off object storage);
    :func:`extract_features` is this over the deterministic synthetic
    column.  ``on_error`` sets the corrupt-container policy (see
    ``DECODE_POLICIES``); decode stays Arrow-batched ``mapInPandas``
    with payload bytes never shuffling whatever the policy."""
    if on_error not in DECODE_POLICIES:
        raise ValueError(f"on_error must be one of {DECODE_POLICIES}, got {on_error!r}")

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    m = decode_media(bytes(p))
                except ValueError:
                    if on_error == "fail":
                        raise
                    if on_error == "skip":
                        continue
                    rows.append((did, "invalid", len(p), None, None, None, None, None))
                    continue
                rows.append(
                    (did, m["media_type"], len(p), m["width"], m["height"],
                     m["sample_rate"], m["n_samples"], m["duration_us"])
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "n_bytes", "width", "height",
                         "sample_rate", "n_samples", "duration_us"],
            ).astype({"width": "Int32", "height": "Int32", "sample_rate": "Int32",
                      "n_samples": "Int32", "duration_us": "Int64"})

    return payloads.mapInPandas(batch, FEATURE_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Binary payload -> typed metadata, via real container decode in
    Arrow-batched ``mapInPandas`` (synthesis and decode fuse into one
    scan stage; payload bytes never shuffle)."""
    return features_from_payloads(synthesize_media(df))


def _oracle_params(table: str) -> str:
    """WITH-clause body deriving (kind, seed, w, h, ns) per doc in DuckDB."""
    h48 = hex_prefix_int_sql("md5(text)", DIALECT_DUCKDB)
    return (
        f"params AS (SELECT doc_id, h48 % 3 AS kind, h48 % {SEED_MOD} AS seed, "
        f"{W_BASE} + (h48 // {W_DIV}) % {W_MOD} AS w, "
        f"{H_BASE} + (h48 // {H_DIV}) % {H_MOD} AS h, "
        f"{NS_BASE} + (h48 // {NS_DIV}) % {NS_MOD} AS ns "
        f"FROM (SELECT doc_id, {h48} AS h48 FROM {table}) t)"
    )


def extract_features_oracle_sql(table: str) -> str:
    """DuckDB twin: predicts every decoded feature (including exact
    container byte size) from the synthesis formulas — BMP is 54-byte
    headers + 4-byte-padded rows, PPM is an ASCII header + 3wh, WAV is a
    44-byte header + 2 bytes per sample."""
    return (
        f"WITH {_oracle_params(table)} "
        "SELECT doc_id, "
        f"CASE kind WHEN 0 THEN '{MEDIA_TYPES[0]}' WHEN 1 THEN '{MEDIA_TYPES[1]}' "
        f"ELSE '{MEDIA_TYPES[2]}' END AS media_type, "
        "CAST(CASE kind WHEN 0 THEN 54 + ((3 * w + 3) // 4) * 4 * h "
        "WHEN 1 THEN 9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR)) + 3 * w * h "
        "ELSE 44 + 2 * ns END AS BIGINT) AS n_bytes, "
        "CAST(CASE WHEN kind IN (0, 1) THEN w END AS INT) AS width, "
        "CAST(CASE WHEN kind IN (0, 1) THEN h END AS INT) AS height, "
        f"CAST(CASE WHEN kind = 2 THEN {SAMPLE_RATE} END AS INT) AS sample_rate, "
        "CAST(CASE WHEN kind = 2 THEN ns END AS INT) AS n_samples, "
        f"CAST(CASE WHEN kind = 2 THEN ns * 1000000 // {SAMPLE_RATE} END AS BIGINT) AS duration_us "
        "FROM params"
    )


# ---------------------------------------------------------------------------
# Resize (images): decode -> nearest-neighbor resample -> canonical checksum
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = "doc_id bigint, width int, height int, checksum string"


def _canon_pixels_md5(px: np.ndarray) -> str:
    """md5 of the engine-neutral pixel rendering 'r,g,b;' row-major —
    the form the oracle reproduces with string_agg."""
    flat = px.reshape(-1, 3)
    s = "".join(f"{r},{g},{b};" for r, g, b in flat)
    return hashlib.md5(s.encode()).hexdigest()


def resize_images(df: DataFrame, width: int = 64, height: int = 48) -> DataFrame:
    """Decode each image payload and nearest-neighbor resample it to
    (width, height); audio rows are routed out (a real pipeline sends
    them to the audio path).  The output checksum hashes the actual
    resized pixel buffer, so a decoder that mis-handled BMP's bottom-up
    BGR rows or PPM's header produces the wrong value, not just a
    different-looking image.

    Scale shape: pure 1->1 Arrow projection fused over the source scan;
    nearest-neighbor index math is numpy on the executor, no shuffle.
    """

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                m = decode_media(bytes(p))
                if m["pixels"] is None:
                    continue
                px = m["pixels"]
                sy = (np.arange(height) * m["height"]) // height
                sx = (np.arange(width) * m["width"]) // width
                rows.append((did, width, height, _canon_pixels_md5(px[sy][:, sx])))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "checksum"])

    return synthesize_media(df).mapInPandas(batch, RESIZE_SCHEMA)


def resize_images_oracle_sql(table: str, width: int = 64, height: int = 48) -> str:
    """DuckDB twin: regenerates the resized pixel stream from the
    synthesis formulas + the same nearest-neighbor index map and hashes
    the identical canonical rendering."""
    return (
        f"WITH {_oracle_params(table)}, "
        f"imgs AS (SELECT doc_id, seed, w, h FROM params WHERE kind IN (0, 1)), "
        f"cells AS (SELECT doc_id, seed, w, h, unnest(range(0, {width * height})) AS idx FROM imgs), "
        f"px AS (SELECT doc_id, idx, "
        f"(seed + 7 * sx + 13 * sy) % 256 AS r, "
        f"(2 * seed + 11 * sx + 5 * sy) % 256 AS g, "
        f"(3 * seed + 3 * sx + 17 * sy) % 256 AS b "
        f"FROM (SELECT doc_id, seed, idx, ((idx % {width}) * w) // {width} AS sx, "
        f"((idx // {width}) * h) // {height} AS sy FROM cells) t) "
        f"SELECT doc_id, {width} AS width, {height} AS height, "
        "md5(string_agg(CAST(r AS VARCHAR) || ',' || CAST(g AS VARCHAR) || ',' || "
        "CAST(b AS VARCHAR) || ';', '' ORDER BY idx)) AS checksum "
        "FROM px GROUP BY doc_id"
    )


# ---------------------------------------------------------------------------
# Frame sampling (audio): decode -> fixed windows -> every Nth window
# ---------------------------------------------------------------------------

FRAME_SAMPLE_SCHEMA = "doc_id bigint, frame_idx int, frame_checksum string"


def frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Sample every ``every_n``-th fixed-size window ("frame") of each
    audio payload's decoded PCM stream — the 1->N fan-out shape a video
    frame sampler produces, here over the one time-indexed medium the
    codec-free containers provide.  Frame identity hashes the actual
    decoded samples (canonical 'v;' rendering), oracle-checkable
    end-to-end; the ragged tail (< FRAME_SAMPLES samples) is dropped,
    as frame samplers do.
    """

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, sums = [], [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                m = decode_media(bytes(p))
                if m["samples"] is None:
                    continue
                s = m["samples"]
                for f in range(0, len(s) // FRAME_SAMPLES, every_n):
                    win = s[f * FRAME_SAMPLES : (f + 1) * FRAME_SAMPLES]
                    canon = "".join(f"{v};" for v in win)
                    ids.append(did)
                    idxs.append(f)
                    sums.append(hashlib.md5(canon.encode()).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_checksum": sums}
            )

    return synthesize_media(df).mapInPandas(batch, FRAME_SAMPLE_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual image hash (aHash) + image dedup over the REAL decoder
# ---------------------------------------------------------------------------

#: aHash grid: 7 rows x 9 cols = 63 bits, so the packed hash fits a
#: signed BIGINT in both engines (an 8x8 grid's bit 63 would overflow).
AHASH_H, AHASH_W = 7, 9

AHASH_SCHEMA = "doc_id bigint, ahash bigint"


def image_ahash(df: DataFrame) -> DataFrame:
    """Perceptual average-hash of each image payload: decode (real BMP/
    PPM parsing), nearest-neighbor downsample to a 7x9 grid, integer
    grayscale ``(r+g+b) DIV 3``, threshold each cell against the integer
    grid mean, pack the 63 bits into a BIGINT.  Audio rows route out.

    The standard image-dedup primitive: near-identical images (re-
    encodes, minor crops/rescales) agree on most bits, byte-identical
    pixels agree on all.  Every step is integer arithmetic, so the
    DuckDB twin recomputes the exact hash from the synthesis formulas —
    a decoder bug (row flip, BGR order, header offset) flips bits and
    fails the value hash.

    Scale shape: 1->1 Arrow projection fused over the scan; 8 bytes out
    per image; no shuffle.
    """

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes = [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                m = decode_media(bytes(p))
                if m["pixels"] is None:
                    continue
                px = m["pixels"].astype(np.int64)
                sy = (np.arange(AHASH_H) * m["height"]) // AHASH_H
                sx = (np.arange(AHASH_W) * m["width"]) // AHASH_W
                gray = px[sy][:, sx].sum(axis=-1) // 3  # (7, 9) ints
                mean = int(gray.sum()) // (AHASH_H * AHASH_W)
                bits = gray.reshape(-1) > mean  # row-major: idx = y*9+x
                h = sum(1 << i for i, b in enumerate(bits) if b)
                ids.append(did)
                hashes.append(h)
            yield pd.DataFrame({"doc_id": ids, "ahash": hashes})

    return synthesize_media(df).mapInPandas(batch, AHASH_SCHEMA)


def image_ahash_oracle_sql(table: str) -> str:
    """DuckDB twin: the same 63 grid cells from the synthesis formulas,
    same integer grayscale/mean/threshold, same bit packing."""
    hw = AHASH_H * AHASH_W
    return (
        f"WITH {_oracle_params(table)}, "
        "imgs AS (SELECT doc_id, seed, w, h FROM params WHERE kind IN (0, 1)), "
        f"cells AS (SELECT doc_id, seed, w, h, unnest(range(0, {hw})) AS idx FROM imgs), "
        "gr AS (SELECT doc_id, idx, "
        "((seed + 7 * sx + 13 * sy) % 256 + (2 * seed + 11 * sx + 5 * sy) % 256 "
        "+ (3 * seed + 3 * sx + 17 * sy) % 256) // 3 AS gray "
        f"FROM (SELECT doc_id, seed, idx, ((idx % {AHASH_W}) * w) // {AHASH_W} AS sx, "
        f"((idx // {AHASH_W}) * h) // {AHASH_H} AS sy FROM cells) t), "
        f"m AS (SELECT doc_id, sum(gray) // {hw} AS mean FROM gr GROUP BY doc_id) "
        "SELECT gr.doc_id, CAST(sum(CASE WHEN gray > mean "
        "THEN (CAST(1 AS BIGINT) << idx) ELSE 0 END) AS BIGINT) AS ahash "
        "FROM gr JOIN m ON gr.doc_id = m.doc_id GROUP BY gr.doc_id"
    )


def image_dup_groups(df: DataFrame) -> DataFrame:
    """Perceptual-duplicate image groups: documents whose image payloads
    share an aHash — the multimodal twin of ``dedup.exact_dup_groups``
    (same output convention: sorted comma-joined ids, groups >= 2).
    One 8-byte-per-image hash groupBy; payload bytes never shuffle.
    """
    from pyspark.sql import functions as F

    return (
        image_ahash(df)
        .groupBy("ahash")
        .agg(
            F.count("doc_id").alias("n_imgs"),
            F.expr(
                "concat_ws(',', transform(array_sort(collect_list(doc_id)), "
                "x -> CAST(x AS STRING)))"
            ).alias("doc_ids"),
        )
        .filter("n_imgs >= 2")
    )


def image_dup_groups_oracle_sql(table: str) -> str:
    return (
        "SELECT ahash, count(doc_id) AS n_imgs, "
        "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids "
        f"FROM ({image_ahash_oracle_sql(table)}) a "
        "GROUP BY ahash HAVING count(doc_id) >= 2"
    )


#: audio fingerprint: 63 energy windows (bits fit a signed BIGINT).
AFP_WINDOWS = 63

AUDIO_FP_SCHEMA = "doc_id bigint, audio_fp bigint, n_windows int"


def audio_fingerprint(df: DataFrame) -> DataFrame:
    """Energy-profile fingerprint of each audio payload — the WAV
    analog of :func:`image_ahash`, completing the multimodal dedup
    triad: decode (real RIFF walk), split the PCM stream into 63 equal
    windows, sum |sample| per window (exact int64), threshold each
    window's energy against the integer mean, pack 63 bits.

    Re-encodes and padding-trims of the same recording agree on most
    bits; byte-identical audio agrees on all — group on the fp exactly
    like ``image_dup_groups``.  Streams shorter than 63 samples are
    fingerprinted over k = n_samples windows (n_windows < 63 marks
    them); only a zero-length stream emits fp 0 with n_windows 0.
    NOTE: the oracle twin hard-codes k = 63 because the synthesized
    payloads guarantee n_samples >= 256; the short-stream (0 < n < 63)
    branch is covered by unit tests, not by the oracle pairing.

    Scale shape: 1->1 Arrow projection, 12 bytes per clip out, no
    shuffle; the oracle recomputes the exact bits from the PCM formula.
    """

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fps, nw = [], [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                m = decode_media(bytes(p))
                if m["samples"] is None:
                    continue
                h, k = _audio_fp_bits(m["samples"])
                ids.append(did); fps.append(h); nw.append(k)
            yield pd.DataFrame({"doc_id": ids, "audio_fp": fps, "n_windows": nw})

    return synthesize_media(df).mapInPandas(batch, AUDIO_FP_SCHEMA)


def _audio_fp_bits(samples) -> tuple[int, int]:
    """(fp, k) for one PCM stream — pure so the short-stream branch
    (0 < n < 63, unreachable through synthesize_media's >= 256-sample
    payloads) is unit-testable directly."""
    s = np.abs(samples.astype(np.int64))
    n = len(s)
    k = min(AFP_WINDOWS, n)
    if k == 0:
        return 0, 0
    # sample i belongs to window w = i*k // n — so window w covers
    # [ceil(w*n/k), ceil((w+1)*n/k)), the exact integer partition the
    # oracle reproduces per-sample
    bounds = (np.arange(k + 1) * n + k - 1) // k
    energies = np.add.reduceat(s, bounds[:-1])
    mean = int(energies.sum()) // k
    return sum(1 << i for i, e in enumerate(energies) if e > mean), k


def audio_fingerprint_oracle_sql(table: str) -> str:
    """DuckDB twin: regenerates |PCM| per sample from the synthesis
    formula, aggregates the same integer window energies (window id =
    ``i * k // n`` reproduces the reduceat bounds), same mean/threshold
    and bit packing."""
    k = AFP_WINDOWS
    return (
        f"WITH {_oracle_params(table)}, "
        "aud AS (SELECT doc_id, seed, ns FROM params WHERE kind = 2), "
        f"samp AS (SELECT doc_id, ns, i, "
        "abs((seed * 31 + 11 * i) % 65536 - 32768) AS a "
        "FROM (SELECT doc_id, seed, ns, unnest(range(0, ns)) AS i FROM aud) t), "
        # sample i -> window w = i*k // n (ns >= 256 > k, so all k
        # windows are non-empty and the mean divisor is exactly k)
        f"win AS (SELECT doc_id, (i * {k}) // ns AS w, a FROM samp), "
        "en AS (SELECT doc_id, w, sum(a) AS e FROM win GROUP BY doc_id, w), "
        f"m AS (SELECT doc_id, sum(e) // {k} AS mean FROM en GROUP BY doc_id) "
        "SELECT en.doc_id, CAST(sum(CASE WHEN e > mean "
        "THEN (CAST(1 AS BIGINT) << w) ELSE 0 END) AS BIGINT) AS audio_fp, "
        "CAST(count(*) AS INT) AS n_windows "
        "FROM en JOIN m ON en.doc_id = m.doc_id GROUP BY en.doc_id"
    )


def frame_sample_oracle_sql(table: str, every_n: int = 2) -> str:
    fs = FRAME_SAMPLES
    return (
        f"WITH {_oracle_params(table)}, "
        "aud AS (SELECT doc_id, seed, ns FROM params WHERE kind = 2), "
        f"frames AS (SELECT doc_id, seed, unnest(range(0, ns // {fs})) AS f FROM aud), "
        f"keep AS (SELECT * FROM frames WHERE f % {every_n} = 0), "
        f"samp AS (SELECT doc_id, f, j, "
        f"(seed * 31 + 11 * (f * {fs} + j)) % 65536 - 32768 AS v "
        f"FROM (SELECT doc_id, seed, f, unnest(range(0, {fs})) AS j FROM keep) t) "
        "SELECT doc_id, CAST(f AS INT) AS frame_idx, "
        "md5(string_agg(CAST(v AS VARCHAR) || ';', '' ORDER BY j)) AS frame_checksum "
        "FROM samp GROUP BY doc_id, f"
    )
