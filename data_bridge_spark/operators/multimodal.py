"""Multimodal (binary) column operators (SURVEY.md §2C9).

The reference moves opaque blobs around as BytesIO buffers (reference
``app/utils/extractor.py:29-50``); at scale the same idea is a
``BinaryType`` column with typed metadata columns beside it. The decode /
feature-extract step is a ``mapInPandas`` batch UDF whose *plumbing*
(schema, batch iteration, partitioning) is real; the actual image/audio
codec is stubbed behind ``decode_image`` because codec libraries are not
in this environment — a deterministic fake keeps the pipeline testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_bridge_spark.catalog import Tables
from data_bridge_spark.registry import register


def decode_image(payload: bytes) -> "object":
    """Real codec goes here (PIL/cv2 are not installed in this container).

    The mapInPandas plumbing around this stub — Arrow batches of binary
    payloads in, fixed-schema feature rows out — is the production shape.
    """
    raise NotImplementedError("image codecs not available in this environment")


def _fake_features(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for decode+feature-extract: byte length,
    first-byte 'channel', mean byte value."""
    n = len(payload)
    return n, payload[0] if n else 0, (sum(payload) / n) if n else 0.0


@register(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           MD5(text) AS payload_md5
    FROM documents
    """,
    tags=("multimodal", "binary"),
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: materialize a BinaryType payload column
    (UTF-8 bytes of `text` stand in for image bytes), compute size and
    content hash JVM-side. At 100 TB this is the manifest pass that runs
    before any expensive decode."""
    t = Tables(spark, sf_dir)
    payload = F.encode(F.col("text"), "utf-8")
    return t.documents.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
    )


@register(
    "mm_frame_sample",
    # byte-exact for ANY payload: chunk the uppercase-hex encoding (2
    # chars per byte, so byte offset 64 = hex offset 128) and fingerprint
    # the hex — DuckDB's md5 only hashes VARCHAR, and a raw byte chunk
    # can split a codepoint (not representable as VARCHAR), so the
    # canonical frame fingerprint is md5(hex(bytes)) on both sides
    oracle="""
    WITH src AS (
        SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
        FROM documents WHERE doc_id < 100
    )
    SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
           CAST(length(substr(h, CAST(i*128+1 AS INT), 128)) // 2 AS INTEGER) AS n_bytes,
           md5(substr(h, CAST(i*128+1 AS INT), 128)) AS frame_md5
    FROM src, UNNEST(range(CAST(ceil(n / 64.0) AS BIGINT))) AS t(i)
    """,
    tags=("multimodal", "udf"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: one binary blob →
    N fixed-stride 'frames' (here: 64-byte chunks standing in for decoded
    frames), emitted as (doc_id, frame_idx, frame_bytes, frame_md5) rows
    via mapInPandas. A real video path swaps the chunker for a codec; the
    schema, batching, and fan-out shape are what matter at scale."""
    import hashlib

    t = Tables(spark, sf_dir)
    src = t.documents.filter(F.col("doc_id") < 100).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        stride, width = 64, 64
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "n_bytes": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # NULL payload has no frames (oracle: UNNEST of NULL range)
                for idx, off in enumerate(range(0, len(payload), stride)):
                    chunk = payload[off : off + width]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["n_bytes"].append(len(chunk))
                    # canonical fingerprint = md5 over the uppercase hex
                    # encoding (cross-engine replayable for any bytes —
                    # see the oracle comment)
                    out["frame_md5"].append(
                        hashlib.md5(chunk.hex().upper().encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return src.mapInPandas(
        sample_frames,
        schema="doc_id long, frame_idx integer, n_bytes integer, frame_md5 string",
    )


@register(
    "mm_features",
    # byte-level reproduction in DuckDB: hex() the payload and parse two
    # hex digits per byte; int sums are exact, so the final double divide
    # matches Python's sum(payload)/n bit-for-bit
    oracle="""
    WITH src AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n
        FROM documents
    ),
    b AS (
        SELECT doc_id, n,
               list_transform(range(1, n + 1), i ->
                 (strpos('0123456789ABCDEF', substr(h, CAST(2*i-1 AS INT), 1)) - 1) * 16
                 + (strpos('0123456789ABCDEF', substr(h, CAST(2*i AS INT), 1)) - 1)) AS bytes
        FROM src
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
           CAST(CASE WHEN n > 0 THEN bytes[1] ELSE 0 END AS INTEGER) AS first_byte,
           CASE WHEN n > 0 THEN CAST(list_aggregate(bytes, 'sum') AS DOUBLE) / n
                ELSE 0.0 END AS mean_byte
    FROM b
    """,
    tags=("multimodal", "udf"),
)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas: Arrow
    batches stream through Python once, output schema is fixed and typed.
    Swap `_fake_features` for `decode_image` + a real model at will — the
    Spark-side contract does not change."""
    t = Tables(spark, sf_dir)
    src = t.documents.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload -> (NULL, 0, 0.0), the oracle's CASE result
            feats = [
                _fake_features(p) if p is not None else (None, 0, 0.0)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [f[0] for f in feats],
                    "first_byte": [f[1] for f in feats],
                    "mean_byte": [f[2] for f in feats],
                }
            )

    return src.mapInPandas(
        extract, schema="doc_id long, n_bytes long, first_byte integer, mean_byte double"
    )
