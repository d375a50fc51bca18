"""Multimodal decode/resize stubs: deterministic fake kinds work, real
media kinds raise until a codec is plugged in."""

from __future__ import annotations

import numpy as np
import pytest

from compass_query_optimizer_spark.operators.multimodal import (
    decode_payload,
    resize_image,
)


def test_resize_fake_image_average_pool():
    side = 8
    img = np.arange(side * side, dtype=np.uint8)
    out = resize_image("image/fake", img.tobytes(), 4, 4)
    got = np.frombuffer(out, dtype=np.uint8).reshape(4, 4)
    # nearest sampling at stride 2 over an 8x8 ramp
    expect = img.reshape(8, 8)[::2, ::2]
    assert np.array_equal(got, expect)


def test_real_media_kinds_raise():
    with pytest.raises(NotImplementedError):
        resize_image("image/png", b"\x89PNG...", 2, 2)
    with pytest.raises(NotImplementedError):
        decode_payload("video/mp4", b"...")
    assert decode_payload("text/utf-8", b"abc") == "abc"


def test_featurize_arrow_matches_pandas_path(spark):
    """The mapInArrow variant must produce byte-identical features to the
    mapInPandas path (same schema, same rows) — it's the lower-overhead
    boundary for large media payloads."""
    from compass_query_optimizer_spark.operators.multimodal import (
        featurize,
        featurize_arrow,
        payloads_from_documents,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = payloads_from_documents(docs)
    a = sorted(map(tuple, featurize_arrow(p).collect()))
    b = sorted(map(tuple, featurize(p).collect()))
    assert a == b and len(a) == docs.count()
