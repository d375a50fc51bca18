"""Bucketed & partitioned table layout for co-located joins and pruning.

The reference fragments tables by insert order only (Fragmenter/
InsertOrderFragmenter.h:39) and rebuilds join hash tables per query; at
100 TB the Spark-native answers are:

- **bucketing**: pre-shuffle both fact tables into the same number of
  buckets on the join key at write time → repeated joins on that key skip
  the exchange entirely (SortMergeJoin with zero ShuffleExchange);
- **partitioned layout**: directory-partition on a low-cardinality column
  → static partition pruning for literal predicates and dynamic partition
  pruning (DPP) when the filter arrives through a dim-table join.

Both are write-time declarations; every downstream query benefits with no
code changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
) -> None:
    """Persist ``df`` as a bucketed managed parquet table. Joins between
    tables bucketed identically on the join key are exchange-free."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *cols)
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sc)
    w.saveAsTable(table)


def write_partitioned(
    df: DataFrame, table: str, partition_cols: list[str] | str
) -> None:
    """Persist ``df`` directory-partitioned (hive layout) for partition
    pruning: static for literal filters, dynamic through joins (DPP)."""
    cols = (
        [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    )
    df.write.mode("overwrite").format("parquet").partitionBy(*cols).saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str] | str
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key — planner
    produces a shuffle-free SortMergeJoin."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str] | str,
    n_files: int = 8,
) -> None:
    """Persist ``df`` as parquet range-clustered on ``cluster_cols``:
    ``repartitionByRange`` + ``sortWithinPartitions`` makes each output
    file's min/max footer stats disjoint along the clustering key, so
    range predicates skip whole files and row groups at read time — the
    OSS-Spark analog of 1-D Z-order/liquid clustering, declared once at
    write time. Range predicates on the key then read O(selectivity) of
    the data instead of all of it."""
    cols = [cluster_cols] if isinstance(cluster_cols, str) else list(cluster_cols)
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_key(cols, bits: int = 8):
    """Interleave the low `bits` bits of 2+ non-negative integer columns
    into one z-order (Morton) key — a pure codegen bit expression, no UDF.

    Sorting by the key makes a contiguous key range map to a bounded
    rectangle in the column space, so per-file min/max stats stay tight on
    EVERY clustered dimension at once — multi-dimensional file skipping
    from a single sort key. Callers quantize each column into [0, 2^bits)
    first (e.g. `pmod(col, 2**bits)` or a rank bucket)."""
    from pyspark.sql import functions as F

    ncols = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * ncols + j))
    return z


def write_clustered_zorder(
    df: DataFrame,
    path: str,
    quantized_cols: list[str],
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Persist ``df`` parquet files clustered along a z-order of
    ``quantized_cols`` (each already an integer in [0, 2^bits)): the
    multi-dimensional generalization of :func:`write_clustered`."""
    z = zorder_key(quantized_cols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Registered correctness gate: clustered write + range-filtered read-back
# ---------------------------------------------------------------------------

_CLUSTER_LO, _CLUSTER_HI = 100, 500

_CLUSTERED_ORACLE = f"""
SELECT COUNT(*) AS cnt,
       MIN(l_orderkey) AS min_ok,
       MAX(l_orderkey) AS max_ok,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_price
FROM lineitem
WHERE l_orderkey BETWEEN {_CLUSTER_LO} AND {_CLUSTER_HI}
"""


def _register():
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.catalog import load_tables
    from compass_query_optimizer_spark.registry import query

    @query(
        "bucket_clustered_scan",
        _CLUSTERED_ORACLE,
        doc="write-time clustering round-trip, oracle-gated: lineitem is "
        "rewritten through write_clustered (repartitionByRange + "
        "sortWithinPartitions on l_orderkey → disjoint per-file min/max "
        "footer stats), read back with a range predicate, and aggregated; "
        "the oracle runs the same range aggregate on the ORIGINAL table, "
        "so the gate proves the clustered layout is lossless and the "
        "range filter lands on the pushed parquet stats path. At 100 TB "
        "the same declaration makes range scans read O(selectivity) "
        "files instead of all of them (file-skipping is asserted "
        "separately in tests/test_bucketing.py)",
        tags=("layout", "clustering", "pushdown"),
    )
    def bucket_clustered_scan(spark, sf_dir: str):
        import hashlib
        import os

        from compass_query_optimizer_spark.session import scratch_dir

        li = load_tables(spark, sf_dir)["lineitem"].select(
            "l_orderkey", "l_quantity", "l_extendedprice"
        )
        # per-sf_dir content tag inside the process-scoped scratch root:
        # reruns in one session overwrite a single dir (no per-run temp
        # leak, round-9 advice) and concurrent processes never share a
        # path (round-10 advice: bench + pytest racing one fixture)
        tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
        path = os.path.join(scratch_dir(spark, "clustered", tag), "data")
        write_clustered(li, path, "l_orderkey", n_files=8)
        back = spark.read.parquet(path).filter(
            F.col("l_orderkey").between(_CLUSTER_LO, _CLUSTER_HI)
        )
        return back.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("l_orderkey").alias("min_ok"),
            F.max("l_orderkey").alias("max_ok"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )


_register()
