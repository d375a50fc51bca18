"""DDL / DML surface: tables, views, CTAS, INSERT.

The reference executes DDL directly against its SQLite-backed catalog
(Parser/ParserNode.h:876-1137: CREATE/DROP/TRUNCATE/RENAME TABLE, CREATE
VIEW, CTAS; ParserNode.cpp:1502-1533 INSERT VALUES / INSERT-SELECT; UPDATE
and DELETE are parsed but rejected, ParserNode.cpp:1550). Spark-first:
everything is Spark SQL DDL against the session catalog — managed parquet
tables under ``spark.sql.warehouse.dir``, temp views for the reference's
views (which are query aliases, not materialized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def create_table(
    spark: SparkSession, name: str, schema: T.StructType, replace: bool = False
) -> None:
    ddl_cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    stmt = "CREATE OR REPLACE TABLE" if replace else "CREATE TABLE"
    spark.sql(f"{stmt} {name} ({ddl_cols}) USING parquet")


def create_table_as(spark: SparkSession, name: str, query: str) -> None:
    """CTAS (ParserNode.h:913 CreateTableAsSelectStmt)."""
    spark.sql(f"CREATE TABLE {name} USING parquet AS {query}")


def create_view(spark: SparkSession, name: str, query: str) -> None:
    """Reference views are stored query aliases (ParserNode.h CREATE VIEW)
    — temp views here, re-expanded at plan time exactly like Calcite does."""
    spark.sql(f"CREATE OR REPLACE TEMP VIEW {name} AS {query}")


def drop_table(spark: SparkSession, name: str, if_exists: bool = True) -> None:
    spark.sql(f"DROP TABLE {'IF EXISTS ' if if_exists else ''}{name}")


def drop_view(spark: SparkSession, name: str) -> None:
    spark.catalog.dropTempView(name)

def truncate_table(spark: SparkSession, name: str) -> None:
    spark.sql(f"TRUNCATE TABLE {name}")


def rename_table(spark: SparkSession, old: str, new: str) -> None:
    spark.sql(f"ALTER TABLE {old} RENAME TO {new}")


def rename_column(spark: SparkSession, table: str, old: str, new: str) -> None:
    """RenameColumnStmt (ParserNode.h:965).

    Metadata-only where the catalog supports it (v2 catalogs); the v1
    session catalog rejects RENAME COLUMN on parquet tables, so fall back
    to a CTAS swap — rewrite-then-rename, the same visible end state."""
    from pyspark.errors import AnalysisException

    try:
        spark.sql(f"ALTER TABLE {table} RENAME COLUMN {old} TO {new}")
        return
    except AnalysisException:
        pass
    cols = ", ".join(
        f"{c} AS {new}" if c == old else c for c in spark.table(table).columns
    )
    tmp = f"{table}__rename_tmp"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    spark.sql(f"CREATE TABLE {tmp} USING parquet AS SELECT {cols} FROM {table}")
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")


def show_create_table(spark: SparkSession, name: str) -> str:
    """ShowCreateTableStmt (ParserNode.h:1282): the reconstructed DDL."""
    return spark.sql(f"SHOW CREATE TABLE {name}").collect()[0][0]


def create_database(spark: SparkSession, name: str, if_not_exists: bool = True) -> None:
    """CreateDBStmt (ParserNode.h:1352); Spark namespaces are the analog
    of the reference's per-catalog databases."""
    spark.sql(f"CREATE DATABASE {'IF NOT EXISTS ' if if_not_exists else ''}{name}")


def drop_database(spark: SparkSession, name: str, cascade: bool = False) -> None:
    """DropDBStmt (ParserNode.h:1373)."""
    spark.sql(f"DROP DATABASE IF EXISTS {name}{' CASCADE' if cascade else ''}")


def insert_values(spark: SparkSession, name: str, rows: list[tuple]) -> None:
    """INSERT VALUES (ParserNode.h:1464 InsertValuesStmt): row append."""
    df = spark.createDataFrame(rows, schema=spark.table(name).schema)
    df.write.insertInto(name)


def insert_select(spark: SparkSession, name: str, query: str) -> None:
    """INSERT-SELECT (ParserNode.h:1484)."""
    spark.sql(f"INSERT INTO {name} {query}")


def insert_dataframe(df: DataFrame, name: str) -> None:
    df.write.insertInto(name)
