"""Regression tests for the round-1 ADVICE findings.

- short-doc shingle guard (sequence(1,0) = [1,0] crash in Spark)
- short-text char-gram guard (position-0 substr emits short grams)
- schema-aware residual rewrite (numeric / string literals untouched)
- JVM sketch build null-key parity with the Arrow build
- salted_join join-type restriction
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from compass_query_optimizer_spark.operators.dedup import (
    _spark_shingles,
    char_gram_array,
)
from compass_query_optimizer_spark.plans.fagms import (
    SKETCH_BUCKETS,
    SKETCH_ROWS,
    Sketch,
    build_sketches,
    build_sketches_arrow,
    numpy_update,
    seeds_for_class,
)
from compass_query_optimizer_spark.plans.graph import parse_join_query
from compass_query_optimizer_spark.plans.optimizer import _rewrite_residual


# ------------------------------------------------------- short-doc guards
def test_short_docs_produce_no_shingles(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one two"), (4, "one two three four")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["shingle"])
        for r in _spark_shingles(docs).collect()
    }
    # docs 1-3 have < 3 tokens → zero shingles, no crash
    assert got == {(4, "one two three"), (4, "two three four")}


def test_short_texts_produce_no_char_grams(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "ab"), (4, "abc"), (5, "abcd")],
        "doc_id long, text string",
    )
    rows = df.select(
        "doc_id", char_gram_array(F.col("text")).alias("g")
    ).collect()
    grams = {r["doc_id"]: list(r["g"]) for r in rows}
    assert grams[1] == [] and grams[2] == [] and grams[3] == []
    assert grams[4] == ["abc"]
    assert grams[5] == ["abc", "bcd"]
    # every emitted gram is exactly N chars (oracle's length(...)=N filter)
    assert all(len(g) == 3 for gs in grams.values() for g in gs)


# -------------------------------------------------------- residual rewrite
def test_residual_rewrite_spares_numeric_literals():
    spec = parse_join_query(
        "SELECT COUNT(*) FROM orders o, lineitem l "
        "WHERE o.o_orderkey = l.l_orderkey "
        "AND l.l_extendedprice > 0.5 * o.o_totalprice"
    )
    assert spec.post_filters == ["l.l_extendedprice > 0.5 * o.o_totalprice"]
    out = _rewrite_residual(spec.post_filters[0], spec)
    assert out == "l__l_extendedprice > 0.5 * o__o_totalprice"


def test_residual_rewrite_spares_string_literals():
    spec = parse_join_query(
        "SELECT COUNT(*) FROM orders o, lineitem l "
        "WHERE o.o_orderkey = l.l_orderkey "
        "AND (l.l_comment = 'o.k. 1.5' OR o.o_comment = l.l_comment)"
    )
    out = _rewrite_residual(spec.post_filters[0], spec)
    assert out == "(l__l_comment = 'o.k. 1.5' OR o__o_comment = l__l_comment)"


def test_residual_rewrite_only_known_aliases():
    spec = parse_join_query(
        "SELECT COUNT(*) FROM orders o, lineitem l "
        "WHERE o.o_orderkey = l.l_orderkey AND o.x = l.y"
    )
    out = _rewrite_residual("zz.col > o.x", spec)
    assert out == "zz.col > o__x"  # zz is not an alias of this query


# --------------------------------------------- null-key sketch build parity
def test_jvm_build_null_keys_match_arrow(spark):
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 500, 4000).astype(float)
    keys[rng.random(4000) < 0.1] = np.nan  # ~10% null FKs (IMDB-style)
    df = spark.createDataFrame(pd.DataFrame({"k": keys})).select(
        F.col("k").cast("long").alias("k")
    )
    seeds = {"k": seeds_for_class("eq:nulltest")}

    cnt_jvm, sk_jvm = build_sketches(df, seeds)
    cnt_arrow, sk_arrow = build_sketches_arrow(df, seeds, nrows_hint=4000)

    # survivor count includes null-key rows on BOTH paths
    assert cnt_jvm == cnt_arrow == 4000
    # counters exclude null keys on both paths, and agree with the twin
    twin = Sketch(np.zeros((SKETCH_ROWS, SKETCH_BUCKETS)), seeds["k"])
    numpy_update(twin, keys[~np.isnan(keys)].astype(np.int64))
    assert np.array_equal(sk_jvm["k"].counters, twin.counters)
    assert np.array_equal(sk_arrow["k"].counters, twin.counters)


# ------------------------------------------------------------- salted_join
def test_salted_join_rejects_outer(spark):
    from compass_query_optimizer_spark.operators.skew import salted_join

    a = spark.range(10).withColumnRenamed("id", "k")
    b = spark.range(3).withColumnRenamed("id", "k")
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError):
            salted_join(a, b, "k", how=how)
    # supported types still run
    assert salted_join(a, b, "k", how="left").count() == 10
    assert salted_join(a, b, "k", how="left_anti").count() == 7
