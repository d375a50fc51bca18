"""Regression tests for the round-7 ADVICE findings.

- the four round-7 text operators (kl_drift, hash_classifier,
  curriculum_stages, epoch_budget) must tokenize the SAME way as their
  DuckDB oracles on punctuated text, not just on single-space word salad
  (the fixture corpus is punctuation-free, so the driver gate could pass
  vacuously while the engines diverge on real text)
- emb_label_centroid_sim must stay exact past the ~38k same-sign
  vectors/label point where int64 products overflow (decimal widening)
- sim_ann_ivfpq must fail loudly on corpora <= IVF_K vectors instead of
  returning a silently-empty result from an empty residual codebook
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from compass_query_optimizer_spark.operators.embeddings import (
    QUANT,
    emb_label_centroid_sim,
)
from compass_query_optimizer_spark.operators.similarity import (
    EMBED_DIM,
    IVF_K,
    sim_ann_ivfpq,
)
from compass_query_optimizer_spark.registry import all_queries
from tests.test_oracle import _norm_rows

PUNCT_TEXTS = [
    "Hello, world! This is doc #%d -- with punctuation; really?",
    "price: $1,299.99 (was $1,499) ... a 13%% discount!!",
    "e-mail me at user%d@example.com; or don't.",
    "tabs\tand\nnewlines\nand   runs   of    spaces",
    "UPPER Case MiXeD 42 tokens & symbols *** %d ***",
    "trailing punctuation matters.",
    "",
    "   ",
    "one-token",
]


def _write_punct_docs(path) -> None:
    n = 60
    rows = []
    for i in range(n):
        text = PUNCT_TEXTS[i % len(PUNCT_TEXTS)]
        if "%d" in text:
            text = text % i
        rows.append(
            (
                i,
                text,
                ["en", "de", "fr"][i % 3],
                ["web", "books"][i % 2],
                len(text),
            )
        )
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(path / "documents.parquet"))


FOUR_OPS = (
    "text_kl_drift",
    "text_hash_classifier",
    "text_curriculum_stages",
    "text_epoch_budget",
)


@pytest.fixture(scope="module")
def punct_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("punct_docs")
    _write_punct_docs(d)
    return d


@pytest.mark.parametrize("name", FOUR_OPS)
def test_tokenizer_parity_on_punctuated_text(name, spark, punct_dir):
    """Spark result == DuckDB oracle on text full of punctuation/case/
    digits — the exact regime where whitespace-split and regex-extract
    tokenizers diverge."""
    spec = all_queries()[name]
    sdf = spec.build(spark, str(punct_dir))
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{punct_dir}/documents.parquet'"
    )
    res = con.execute(spec.oracle_text())
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]

    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows) and len(srows) > 0
    _, nsrows = _norm_rows(scols, srows)
    _, ndrows = _norm_rows(dcols, drows)
    assert nsrows == ndrows, f"{name} diverges from oracle on punctuation"


# ------------------------------------------------ centroid-sim overflow
def test_label_centroid_sim_exact_past_int64(spark, tmp_path):
    """Components of 100.0 quantize to 1e6; 500 vectors/label give
    per-dim sums of 5e8 whose 64-dim dot (1.6e19) overflows int64 —
    the decimal(38,0) widening must keep the matrix exact anyway."""
    n_per = 500
    vecs, labels = [], []
    for lbl, base in ((0, 100.0), (1, 99.0)):
        for i in range(n_per):
            v = [base] * EMBED_DIM
            # vary one dim so the two labels aren't collinear
            v[0] = base + (1.0 if lbl else -1.0)
            vecs.append(v)
            labels.append(lbl)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    # exact expectation with python bigints
    def qsum(base, d0):
        s = [n_per * int(round(base * QUANT))] * EMBED_DIM
        s[0] = n_per * int(round(d0 * QUANT))
        return s

    sums = {0: qsum(100.0, 99.0), 1: qsum(99.0, 100.0)}
    exp = {}
    for a in (0, 1):
        for b in (0, 1):
            if a > b:
                continue
            dot = sum(x * y for x, y in zip(sums[a], sums[b]))
            na = sum(x * x for x in sums[a])
            nb = sum(x * x for x in sums[b])
            assert max(dot, na, nb) > 2**63  # the regime under test
            exp[(a, b)] = round(dot / (math.sqrt(na) * math.sqrt(nb)), 6)

    got = {
        (r["label_a"], r["label_b"]): r["cos"]
        for r in emb_label_centroid_sim(spark, str(tmp_path)).collect()
    }
    assert got == exp


# ------------------------------------------------ ivfpq tiny-corpus guard
def test_ivfpq_tiny_corpus_fails_loudly(spark, tmp_path):
    n = IVF_K  # stride 1 → empty offset-1 residual codebook
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [[float(i + j) for j in range(EMBED_DIM)] for i in range(n)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    with pytest.raises(ValueError, match="requires more than"):
        sim_ann_ivfpq(spark, str(tmp_path))
