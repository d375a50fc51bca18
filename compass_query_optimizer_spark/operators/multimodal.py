"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a metadata struct.
The Spark-side plumbing — schema, Arrow batch shape, `mapInPandas`
signature, partitioning — is real and oracle-tested; the actual media
decode is stubbed (no image/audio libraries in this container) behind
``decode_payload`` which raises ``NotImplementedError`` for real media
kinds and provides a deterministic fake for the "text/utf-8" kind used in
tests and oracles.

Scale design: mapInPandas streams Arrow batches (zero-copy into pandas),
so per-batch Python overhead is amortized; payload bytes never shuffle —
feature extraction happens in the scan stage, and only the (small) feature
rows move.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from compass_query_optimizer_spark.catalog import load_tables
from compass_query_optimizer_spark.registry import query

# payload row: opaque bytes + typed metadata (kind, encoding)
PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload_len", T.IntegerType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def decode_payload(kind: str, payload: bytes):
    """Decode an opaque media payload.

    Real decoders (image resize, audio resample, video frame-sample) need
    libs not present in this container — STUB: only the deterministic
    "text/utf-8" kind is implemented; media kinds raise.
    """
    if kind == "text/utf-8":
        return payload.decode("utf-8")
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires external codecs; "
        "plug a decoder in here (the Spark plumbing around it is complete)"
    )


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: binary payload → feature row (vectorized per
    Arrow batch). 'Frame sampling' for the text kind = 1 frame per 64
    bytes, mirroring how a video sampler would emit one row per frame
    group."""
    import hashlib

    for pdf in batches:
        lens = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "payload_len": lens.astype("int32"),
                "payload_md5": pdf["payload"].map(
                    lambda b: hashlib.md5(b).hexdigest()
                ),
                "n_frames": ((lens + 63) // 64).astype("int32"),
            }
        )


def payloads_from_documents(docs: DataFrame) -> DataFrame:
    """Wrap the documents table as a multimodal payload table (utf-8 bytes
    as the opaque payload — deterministic stand-in for media bytes)."""
    return docs.select(
        "doc_id",
        F.lit("text/utf-8").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def featurize(payloads: DataFrame) -> DataFrame:
    return payloads.mapInPandas(extract_features, schema=FEATURE_SCHEMA)


@query(
    "mm_payload_features",
    """
    SELECT doc_id, 'text/utf-8' AS kind,
           CAST(octet_length(encode(text)) AS INTEGER) AS payload_len,
           md5(text) AS payload_md5,
           CAST((octet_length(encode(text)) + 63) // 64 AS INTEGER) AS n_frames
    FROM documents
    ORDER BY doc_id
    """,
    doc="multimodal plumbing end-to-end: binary payload column → "
    "mapInPandas (Arrow batches) feature extraction; md5 proves the bytes "
    "survived the Spark→Arrow→pandas round trip intact",
    tags=("multimodal", "pandas-udf"),
)
def mm_payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return featurize(payloads_from_documents(t["documents"])).orderBy("doc_id")
