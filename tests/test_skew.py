"""Salted join equals the plain join, row for row, under heavy key skew."""

from __future__ import annotations

from pyspark.sql import functions as F

from compass_query_optimizer_spark.operators.skew import salted_join


def test_salted_join_matches_plain(spark):
    # 90% of the large side lands on one key — the skew shape
    large = spark.range(20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .cast("long").alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") + 1000).alias("dim")
    )
    plain = large.join(small, "k").collect()
    salted = salted_join(large, small, "k").collect()
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))
    assert len(plain) == 20_000  # every large row matched exactly once


def test_salted_left_join(spark):
    large = spark.range(1000).select((F.col("id") % 150).alias("k"), "id")
    small = spark.range(100).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    plain = large.join(small, "k", "left").collect()
    salted = salted_join(large, small, "k", how="left").collect()
    assert sorted(map(lambda r: tuple(str(x) for x in r), salted)) == sorted(
        map(lambda r: tuple(str(x) for x in r), plain)
    )
