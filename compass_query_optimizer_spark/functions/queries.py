"""Dialect-shim queries in the correctness gate.

``dialect_shim`` exercises the MapD-dialect rewrites end-to-end: the Spark
side runs the MapD text through functions/dialect.py (DATEADD → TIMESTAMPADD,
DATEDIFF → TIMESTAMPDIFF, DATEPART → EXTRACT, ROUND_TO_DIGIT → ROUND,
TRUNCATE → toward-zero digits, ILIKE passthrough); the oracle is the ANSI
equivalent DuckDB runs directly. Same answer ⇒ the shim preserves the
reference's function semantics (RelAlgTranslator.cpp:831,1004-1035).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from compass_query_optimizer_spark.registry import query

# MapD-dialect text (what a reference user would type)
DIALECT_SQL = """
SELECT event_type,
       DATEPART('year', ts) AS yr,
       COUNT(*) AS cnt,
       ROUND_TO_DIGIT(SUM(value), 2) AS sum_value,
       TRUNCATE(ROUND_TO_DIGIT(AVG(value), 4), 1) AS avg_trunc
FROM events
WHERE DATEDIFF('day', ts, DATEADD('day', 3, ts)) = 3
  AND CHAR_LENGTH(event_type) >= 4
  AND event_type ILIKE '%C%'
GROUP BY event_type, DATEPART('year', ts)
"""

_ORACLE = """
SELECT event_type,
       CAST(EXTRACT(year FROM ts) AS INT) AS yr,
       COUNT(*) AS cnt,
       ROUND(SUM(value), 2) AS sum_value,
       FLOOR(ROUND(AVG(value), 4) * 10) / 10 AS avg_trunc
FROM events
WHERE 3 = 3
  AND LENGTH(event_type) >= 4
  AND event_type ILIKE '%C%'
GROUP BY event_type, EXTRACT(year FROM ts)
"""


@query(
    "dialect_shim",
    _ORACLE,
    doc="MapD-dialect SQL (DATEADD/DATEDIFF/DATEPART/ROUND_TO_DIGIT/"
    "TRUNCATE/ILIKE) translated by functions/dialect.py and executed as "
    "Spark SQL; oracle is the hand-written ANSI equivalent",
    tags=("dialect", "functions"),
)
def dialect_shim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compass_query_optimizer_spark.functions.dialect import compass_sql

    return compass_sql(spark, DIALECT_SQL, sf_dir)
