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


# JOB workloads reuse the same table under multiple aliases (e.g. q29 uses
# info_type twice); the planner must key sketches, seeds, and graph nodes on
# the alias, exactly like the reference's (table_id, node_id) pairs
# (FilterPushDownSketch.cpp:88-91). This query proves that end-to-end.
SELF_JOIN_SQL = """
SELECT COUNT(*) AS cnt
FROM lineitem l1, lineitem l2, part p, orders o
WHERE l1.l_partkey = p.p_partkey AND l2.l_partkey = p.p_partkey
  AND l1.l_orderkey = o.o_orderkey
  AND p.p_size <= 5 AND o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R' AND l2.l_linestatus = 'F'
"""


@query(
    "compass_self_join",
    SELF_JOIN_SQL,
    doc="self-join under two aliases through the COMPASS optimizer: "
    "alias-keyed sketches and per-alias filters (the reference's "
    "(table_id, node_id) discipline)",
    tags=("compass", "join", "self-join"),
)
def compass_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    return CompassOptimizer(spark).execute_count(SELF_JOIN_SQL, sf_dir)
