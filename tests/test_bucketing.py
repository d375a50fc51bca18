"""Bucketed co-located join is exchange-free; partitioned layout prunes —
the write-time layout levers the 100 TB design leans on."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from compass_query_optimizer_spark.sources.bucketing import (
    colocated_join,
    write_bucketed,
    write_partitioned,
)


@pytest.fixture(scope="module")
def bucketed(spark):
    facts = spark.range(10_000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") * 2).alias("a")
    )
    dims = spark.range(8_000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") + 7).alias("b")
    )
    write_bucketed(facts, "t_bucket_l", "k", n_buckets=8, sort_cols="k")
    write_bucketed(dims, "t_bucket_r", "k", n_buckets=8, sort_cols="k")
    yield
    spark.sql("DROP TABLE IF EXISTS t_bucket_l")
    spark.sql("DROP TABLE IF EXISTS t_bucket_r")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    # broadcast would bypass bucketing at this tiny size; force SMJ to see
    # the exchange-free property the layout buys at scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = colocated_join(spark, "t_bucket_l", "t_bucket_r", "k")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
        # and it is still correct
        assert df.count() == 10_000 * 16  # 20/500-key × 16 dim rows per key
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_partitioned_table_prunes(spark):
    df = spark.range(1000).select(
        (F.col("id") % 4).cast("int").alias("p"), F.col("id").alias("v")
    )
    write_partitioned(df, "t_part", "p")
    try:
        q = spark.table("t_part").filter(F.col("p") == 2)
        plan = q._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # static pruning: partition filter present, no data-filter on p
        assert "PartitionFilters" in plan
        assert q.count() == 250
        got = [r["p"] for r in q.select("p").distinct().collect()]
        assert got == [2]
    finally:
        spark.sql("DROP TABLE IF EXISTS t_part")
