"""Catalog: explicit schemas + table loading.

The reference keeps a persistent SQLite-backed catalog of TableDescriptor /
ColumnDescriptor with fixed DDL-declared schemas and no inference
(mapd-core/Catalog/Catalog.h, Catalog/TableDescriptor.h:41). We mirror that
discipline: every table the engine serves has an explicit StructType; loads
validate the parquet footer schema against it rather than trusting
inference. Dictionary encoding / fixed-width encodings in the reference
(Shared/sqltypes.h:113-120) are storage details handled by Parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# The driver-generated TPC-H-ish star + events stream table + training-data
# tables (documents, embeddings). See TESTDATA.md.
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = tuple(SCHEMAS)

# Parquet columns physically stored as TIMESTAMP(NANOS,false): Spark has no
# nanos timestamp type, so they are read as long (legacy.parquet.nanosAsLong)
# and converted to TIMESTAMP_NTZ (microseconds) at load.
NANOS_TS_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _ensure_read_conf(spark: SparkSession) -> None:
    """Confs the loader depends on, settable at runtime — applied here so
    queries work on any externally created session (the driver's)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table, checking the footer schema field names/types match
    the declared catalog schema (names + type classes; nullability is a
    storage detail)."""
    from pyspark.sql import functions as F

    _ensure_read_conf(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    for c in NANOS_TS_COLS.get(name, ()):
        dtype = df.schema[c].dataType
        if isinstance(dtype, T.LongType):
            # integer `div`, not `/`: float division of nanos (≈1.7e18)
            # exceeds double's 2^53 exact range and drifts by ±1 µs
            df = df.withColumn(
                c,
                F.timestamp_micros(F.expr(f"{c} div 1000")).cast("timestamp_ntz"),
            )
        elif isinstance(dtype, T.TimestampType):
            # micros stored with isAdjustedToUTC=true reads as LTZ; the
            # session is pinned UTC, so the cast keeps the UTC wall time
            df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
    declared = SCHEMAS.get(name)
    if declared is not None:
        got = [(f.name, type(f.dataType).__name__) for f in df.schema.fields]
        want = [(f.name, type(f.dataType).__name__) for f in declared.fields]
        if got != want:
            raise ValueError(f"schema drift for {name}: {got} != {want}")
    return df


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Widen a narrow scan before per-row-expensive transforms.

    A dimension-sized parquet table arrives as one input split, which
    serializes CPU-heavy per-row work (shingling, md5 hashing, vector
    arithmetic) on a single core while the other 31 idle. When the scan has
    fewer partitions than the session's shuffle parallelism, round-robin
    repartition to the shuffle width — the extra exchange moves only the
    narrow base rows, far cheaper than the serialized compute it unlocks.
    At production scale the input already has thousands of splits and this
    is a no-op (we never *shrink* a wide input).

    The width is DATA-SIZED, not a fixed conf: the consumers of this
    exchange run per-row-expensive transforms whose MAP-SIDE partial-
    aggregation state (minhash/PQ-encode/argmin hash maps) lives per task,
    so a fixed width that is right at bench scale starves at 20× the rows
    — the round-8 1M-vector sweep measured sim_ann_pq at 268.5 s with 32
    fixed partitions (GC/spill) vs 24.7 s at 128, a 10.9× cliff from
    sizing alone. Target = plan-time scan-size estimate (parquet footer
    stats, no job) divided into ~4 MiB slices, clamped to
    [shuffle width, 1024]; AQE cannot help here because the cost sits on
    the map side of the exchange, where the partition count is this one.
    """
    sess = df.sparkSession
    if target is None:
        width = int(sess.conf.get("spark.sql.shuffle.partitions", "32"))
        try:
            est = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
            target = min(1024, max(width, est // (4 << 20)))
        except Exception:  # stats unavailable (non-classic session, etc.)
            target = width
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


# (session id, sf_dir) -> loaded frames. A DataFrame is a reusable logical
# plan; caching skips re-reading ten parquet footers + schema validation on
# every query build (the reference's catalog similarly keeps descriptors
# resident, Catalog/Catalog.cpp).
_LOADED: dict[tuple[int, str], dict[str, DataFrame]] = {}


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register: bool = True
) -> dict[str, DataFrame]:
    """Load every catalog table from ``sf_dir``; optionally register each as
    a temp view (the analog of the reference's persistent catalog tables —
    queries address them by name via spark.sql)."""
    key = (id(spark), sf_dir)
    tables = _LOADED.get(key)
    if tables is None:
        tables = {}
        for name in TABLE_NAMES:
            path = table_path(sf_dir, name)
            if not os.path.exists(path):
                continue
            tables[name] = load_table(spark, sf_dir, name)
        _LOADED[key] = tables
    if register:
        for name, df in tables.items():
            df.createOrReplaceTempView(name)
    return dict(tables)
