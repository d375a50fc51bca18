"""COMPASS-optimized queries registered in the correctness gate.

``compass_count_multijoin`` runs the flagship JOB-shaped COUNT(*) through
the full COMPASS pipeline (sketch push-down → join-order search → enforced
left-deep chain); the oracle is the plain SQL — so the correctness gate
proves the optimizer preserves semantics while choosing its own order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from compass_query_optimizer_spark.registry import query
from compass_query_optimizer_spark.workload import FLAGSHIP_SQL


@query(
    "compass_count_multijoin",
    FLAGSHIP_SQL,
    doc="the flagship 6-way COUNT(*) executed through the COMPASS "
    "sketch-based join-order optimizer (plans/): same answer as plain "
    "SQL, order chosen by Fast-AGMS estimates",
    tags=("compass", "join"),
)
def compass_count_multijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    return CompassOptimizer(spark).execute_count(FLAGSHIP_SQL, sf_dir)
