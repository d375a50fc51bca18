"""COPY FROM / COPY TO parity: delimited import and export.

The reference's `COPY t FROM 'file' WITH (...)` is a multithreaded CSV
parser with configurable delimiter/header/quote/escape/null-string and a
max_reject threshold (Parser/ParserNode.cpp:2368 CopyTableStmt,
Import/Importer.h:59 CopyParams, Import/Importer.cpp). `COPY (query) TO
'file'` exports a result set as CSV (Parser/ParserNode.cpp:2683
ExportQueryStmt). Archives (gz/bz2) are handled natively by Spark's text
datasource via filename codec inference; S3 via the hadoop-aws scheme when
configured on the cluster.

Spark-first: both map onto `spark.read.csv` / `df.write.csv` with an
explicit declared schema (the reference coerces to DDL-declared types, no
inference — SURVEY.md §1.1). `max_reject` maps to PERMISSIVE mode with a
corrupt-record column counted after load; the reference aborts the COPY
when rejects exceed the threshold, and so do we.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class CopyParams:
    """Mirrors Import/Importer.h:59 CopyParams (reference defaults)."""

    delimiter: str = ","
    null_str: str = "\\N"
    has_header: bool = True
    quoted: bool = True
    quote: str = '"'
    escape: str = '"'
    line_delim: str = "\n"
    max_reject: int = 100_000
    threads: int = 0  # 0 = let Spark pick (task parallelism)


_CORRUPT = "_corrupt_record"


def copy_from(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    params: CopyParams | None = None,
) -> tuple[DataFrame, int]:
    """COPY FROM: load delimited file(s) at ``path`` into a DataFrame with
    the declared ``schema``. Returns (rows, rejected_count); raises when
    rejects exceed ``max_reject`` like the reference's COPY abort."""
    p = params or CopyParams()
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    reader = (
        spark.read.schema(read_schema)
        .option("sep", p.delimiter)
        .option("header", p.has_header)
        .option("nullValue", p.null_str)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
    )
    if p.line_delim != "\n":
        reader = reader.option("lineSep", p.line_delim)
    if p.quoted:
        reader = reader.option("quote", p.quote).option("escape", p.escape)
    else:
        reader = reader.option("quote", "")
    df = reader.csv(path)
    df = df.cache()  # one read serves both the reject count and the caller
    rejected = df.filter(F.col(_CORRUPT).isNotNull()).count()
    if rejected > p.max_reject:
        df.unpersist()
        raise ValueError(
            f"COPY aborted: {rejected} rejected rows > max_reject={p.max_reject}"
        )
    return df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT), rejected


def copy_to(
    df: DataFrame,
    path: str,
    params: CopyParams | None = None,
) -> None:
    """COPY (query) TO 'path': CSV export of a result set."""
    p = params or CopyParams()
    writer = (
        df.write.mode("overwrite")
        .option("sep", p.delimiter)
        .option("header", p.has_header)
        .option("nullValue", p.null_str)
    )
    if p.quoted:
        writer = writer.option("quote", p.quote).option("escape", p.escape)
    writer.csv(path)


def to_arrow(df: DataFrame):
    """Arrow result sink (QueryEngine/ArrowResultSet.cpp, sql_execute_df):
    a query result as a pyarrow Table, zero-copy from Spark's Arrow
    collect path."""
    return df.toArrow()
