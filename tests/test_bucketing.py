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


def test_clustered_write_has_disjoint_file_ranges(spark, tmp_path):
    """write_clustered must produce files whose [min,max] footer stats
    along the clustering key are pairwise disjoint — the property that
    lets parquet predicate pushdown skip files on range filters."""
    import glob

    import pyarrow.parquet as pq

    from compass_query_optimizer_spark.sources.bucketing import write_clustered

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "events_by_ts")
    write_clustered(df, out, "ts", n_files=6)

    ranges = []
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == "ts"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},{hi2})"

    # row count preserved
    assert spark.read.parquet(out).count() == df.count()


def test_zorder_write_localizes_both_dimensions(spark, tmp_path):
    """Z-order clustering on (user bucket, time bucket) must leave each
    output file covering a small sub-rectangle of the 2-D space — the
    property that lets min/max stats skip files on predicates over EITHER
    dimension. Compare against the global ranges."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.sources.bucketing import (
        write_clustered_zorder,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df = ev.select(
        F.pmod(F.col("user_id"), F.lit(256)).cast("long").alias("ub"),
        F.pmod(F.col("event_id") * 37, F.lit(256)).cast("long").alias("tb"),
        "event_id",
    )
    out = str(tmp_path / "events_z")
    write_clustered_zorder(df, out, ["ub", "tb"], bits=8, n_files=8)

    def col_range(md, name):
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for i in range(md.row_group(rg).num_columns):
                c = md.row_group(rg).column(i)
                if c.path_in_schema == name:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        return lo, hi

    files = glob.glob(f"{out}/*.parquet")
    assert len(files) >= 4
    areas = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        ulo, uhi = col_range(md, "ub")
        tlo, thi = col_range(md, "tb")
        areas.append((uhi - ulo + 1) * (thi - tlo + 1))
    global_area = 256 * 256
    # every file must cover a strict sub-rectangle; on average much smaller
    assert max(areas) < global_area
    assert sum(areas) / len(areas) < global_area / 2
    assert spark.read.parquet(out).count() == df.count()
