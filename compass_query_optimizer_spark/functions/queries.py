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


# Synthetic-but-deterministic coordinates derived from events columns: the
# point is exercising the geo scalar functions, not the data.
_GEO_ORACLE = """
WITH pts AS (
  SELECT event_id,
         (CAST(user_id % 170 AS DOUBLE) - 85.0)  AS lat1,
         (CAST(event_id % 350 AS DOUBLE) - 175.0) AS lon1,
         (CAST((user_id + 37) % 170 AS DOUBLE) - 85.0) AS lat2,
         (CAST((event_id + 113) % 350 AS DOUBLE) - 175.0) AS lon2
  FROM events WHERE event_id % 97 = 0
)
SELECT event_id,
       ROUND(2.0 * 6372797.560856 * ASIN(SQRT(
         SIN(RADIANS(lat2 - lat1) / 2) * SIN(RADIANS(lat2 - lat1) / 2)
         + COS(RADIANS(lat1)) * COS(RADIANS(lat2))
           * SIN(RADIANS(lon2 - lon1) / 2) * SIN(RADIANS(lon2 - lon1) / 2)
       )), 1) AS dist_m,
       ROUND(RADIANS(lon1) * 6378137.0, 1) AS merc_x,
       ROUND(6378137.0 * LN(TAN(0.25 * PI() + 0.5 * RADIANS(lat1))), 1) AS merc_y
FROM pts
ORDER BY event_id
"""


@query(
    "geo_functions",
    _GEO_ORACLE,
    doc="geo scalar helpers (ExtensionFunctions.hpp:236-600): haversine "
    "distance_in_meters + WGS84→Web-Mercator conversion as codegen'd "
    "column expressions",
    tags=("functions", "geo"),
)
def geo_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.catalog import load_tables
    from compass_query_optimizer_spark.functions.geo import (
        conv_4326_900913_x,
        conv_4326_900913_y,
        distance_in_meters,
    )

    t = load_tables(spark, sf_dir)
    pts = (
        t["events"]
        .filter(F.col("event_id") % 97 == 0)
        .select(
            "event_id",
            ((F.col("user_id") % 170).cast("double") - 85.0).alias("lat1"),
            ((F.col("event_id") % 350).cast("double") - 175.0).alias("lon1"),
            (((F.col("user_id") + 37) % 170).cast("double") - 85.0).alias("lat2"),
            (((F.col("event_id") + 113) % 350).cast("double") - 175.0).alias("lon2"),
        )
    )
    return pts.select(
        "event_id",
        F.round(
            distance_in_meters(
                F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
            ),
            1,
        ).alias("dist_m"),
        F.round(conv_4326_900913_x(F.col("lon1")), 1).alias("merc_x"),
        F.round(conv_4326_900913_y(F.col("lat1")), 1).alias("merc_y"),
    ).orderBy("event_id")


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
