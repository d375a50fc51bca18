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


FRAME_BYTES = 64  # frame group size for the deterministic text-kind sampler
FRAME_STRIDE = 2  # sample every 2nd frame

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas frame sampler: one output row per sampled frame — the
    row-exploding shape a video frame-sampler has (N input rows → M output
    rows). Frames = consecutive FRAME_BYTES-byte windows, every
    FRAME_STRIDE-th kept."""
    import hashlib

    for pdf in batches:
        ids, idxs, md5s = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for k in range(0, (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES, FRAME_STRIDE):
                ids.append(doc_id)
                idxs.append(k)
                md5s.append(
                    hashlib.md5(
                        payload[k * FRAME_BYTES : (k + 1) * FRAME_BYTES]
                    ).hexdigest()
                )
        yield pd.DataFrame(
            {"doc_id": ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame_md5": md5s}
        )


def resize_image(kind: str, payload: bytes, w: int, h: int) -> bytes:
    """Image resize stub. Real decoders (PIL/opencv) are absent in this
    container — STUB: the deterministic "image/fake" kind treats the payload
    as a row-major grayscale square and average-pools it to w×h; real image
    kinds raise until a codec is plugged in."""
    import math

    import numpy as np

    if kind != "image/fake":
        raise NotImplementedError(
            f"image decode for kind={kind!r} requires external codecs"
        )
    side = int(math.isqrt(len(payload)))
    img = np.frombuffer(payload[: side * side], dtype=np.uint8).reshape(side, side)
    ys = (np.arange(h) * side) // h
    xs = (np.arange(w) * side) // w
    return img[np.ix_(ys, xs)].tobytes()


@query(
    "mm_frame_sample",
    f"""
    SELECT doc_id, CAST(s.k AS INTEGER) AS frame_idx,
           md5(substr(text, CAST(s.k * {FRAME_BYTES} + 1 AS INTEGER), {FRAME_BYTES})) AS frame_md5
    FROM documents,
         UNNEST(range(0, CAST(ceil(length(text) / {FRAME_BYTES}.0) AS BIGINT), {FRAME_STRIDE})) AS s(k)
    ORDER BY doc_id, frame_idx
    """,
    doc="multimodal frame sampling: mapInPandas explodes each payload into "
    "every-2nd 64-byte frame row (the video frame-sample shape); oracle "
    "rebuilds frames with substr+md5",
    tags=("multimodal", "pandas-udf"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    payloads = payloads_from_documents(t["documents"])
    return payloads.mapInPandas(sample_frames, schema=FRAME_SCHEMA).orderBy(
        "doc_id", "frame_idx"
    )


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


def extract_features_arrow(batches):
    """mapInArrow worker: the same features as :func:`extract_features`
    computed directly on pyarrow RecordBatches — no Arrow→pandas→Arrow
    conversion, so per-batch overhead drops to the hash loop itself. The
    preferred boundary when payload batches are large (media bytes):
    pandas would copy every binary cell into Python objects; pyarrow
    buffers are zero-copy views."""
    import hashlib

    import pyarrow as pa

    for batch in batches:
        payload = batch.column(batch.schema.get_field_index("payload"))
        lens = pa.compute.binary_length(payload).cast(pa.int32())
        md5s = pa.array(
            [hashlib.md5(v.as_py()).hexdigest() for v in payload], pa.string()
        )
        n_frames = pa.compute.cast(
            pa.compute.divide(
                pa.compute.add(pa.compute.cast(lens, pa.int64()), 63), 64
            ),
            pa.int32(),
        )
        yield pa.RecordBatch.from_arrays(
            [
                batch.column(batch.schema.get_field_index("doc_id")),
                batch.column(batch.schema.get_field_index("kind")),
                lens,
                md5s,
                n_frames,
            ],
            names=["doc_id", "kind", "payload_len", "payload_md5", "n_frames"],
        )


def featurize_arrow(payloads: DataFrame) -> DataFrame:
    """Arrow-native twin of :func:`featurize` via mapInArrow."""
    return payloads.mapInArrow(extract_features_arrow, schema=FEATURE_SCHEMA)
