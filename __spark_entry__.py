"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      → flagship query on sf0.001
queries()         → every implemented operator (SURVEY.md §2 + training-data ops)
oracle_sql()      → DuckDB-equivalent SQL per query (the correctness gate)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the JOB-shaped COUNT(*) multi-way join planned by the
    COMPASS sketch optimizer (sketch push-down → join-order search →
    enforced left-deep chain) on sf0.001."""
    from compass_query_optimizer_spark.session import configure
    from compass_query_optimizer_spark.registry import all_queries

    configure(spark)
    return all_queries()["compass_count_multijoin"].build(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from compass_query_optimizer_spark.registry import all_queries
    from compass_query_optimizer_spark.session import configure

    def with_conf(build):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # the driver hands us its own plain session; apply the engine's
            # runtime-settable confs (shuffle partitions, AQE, UTC) first
            configure(spark)
            return build(spark, sf_dir)

        return run

    return {name: with_conf(spec.build) for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from compass_query_optimizer_spark.registry import all_queries

    return {
        name: spec.oracle_text()
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
