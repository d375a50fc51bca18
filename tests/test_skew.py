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


def test_capped_topn_matches_plain_window(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from compass_query_optimizer_spark.operators.skew import capped_topn

    # one hot key with 20k rows, several cold keys
    df = spark.range(21_000).select(
        F.when(F.col("id") < 20_000, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 7).cast("string")))
        .alias("k"),
        (F.col("id") * 2_654_435_761 % 1_000_003).alias("score"),
        F.col("id"),
    )
    order = [F.col("score").desc(), F.col("id")]
    capped = capped_topn(df, "k", order, n=5)
    w = Window.partitionBy("k").orderBy(*order)
    plain = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )
    assert sorted(map(tuple, capped.collect())) == sorted(map(tuple, plain.collect()))


def test_capped_topn_first_window_is_salted(spark):
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.operators.skew import capped_topn

    df = spark.range(100).select(
        F.lit("k").alias("k"), F.col("id").alias("score"), F.col("id")
    )
    capped = capped_topn(df, "k", [F.col("score").desc(), F.col("id")], n=3)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    # phase-1 window must partition on (key, salt): the salt column name
    # appears in a window partition spec
    assert "__salt" in plan
