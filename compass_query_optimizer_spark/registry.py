"""Query registry: every engine capability is declared as a QuerySpec.

A QuerySpec pairs a Spark DataFrame builder with (where expressible) an
ANSI-SQL oracle string that DuckDB runs over the same parquet tables. This
mirrors the reference's differential-oracle test strategy, which runs every
query against both MapD and an embedded SQLite and compares row-by-row
(mapd-core/Tests/ExecuteTest.cpp:130-343, SQLiteComparator).

Column-name discipline: the Spark builder and the oracle MUST produce the
same column names (the comparator sorts columns by name before hashing).
Derived doubles are rounded identically on both sides to absorb
floating-point accumulation-order differences between engines.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

# builder(spark, sf_dir) -> DataFrame; tables are registered as temp views
QueryBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    build: QueryBuilder
    # DuckDB-runnable ANSI SQL; None → rows-only check. A zero-arg callable
    # defers oracle construction to gate time — oracles that materialize
    # fixtures or bake file paths must NOT run at import (enumerating the
    # registry should never touch the filesystem).
    oracle: Optional[str | Callable[[], str]]
    doc: str = ""
    tags: tuple = field(default_factory=tuple)

    def oracle_text(self) -> Optional[str]:
        """Resolve the oracle to SQL text (invoking a deferred builder)."""
        if callable(self.oracle):
            self.oracle = self.oracle()
        return self.oracle


_REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in _REGISTRY:
        raise ValueError(f"duplicate query name {spec.name}")
    _REGISTRY[spec.name] = spec
    return spec


def query(name: str, oracle: Optional[str], doc: str = "", tags: tuple = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def wrap(fn: QueryBuilder) -> QueryBuilder:
        register(QuerySpec(name=name, build=fn, oracle=oracle, doc=doc, tags=tags))
        return fn

    return wrap


def all_queries() -> dict[str, QuerySpec]:
    # import for registration side effects
    import compass_query_optimizer_spark.workload  # noqa: F401
    import compass_query_optimizer_spark.operators.dedup  # noqa: F401
    import compass_query_optimizer_spark.operators.similarity  # noqa: F401
    import compass_query_optimizer_spark.operators.text  # noqa: F401
    import compass_query_optimizer_spark.operators.temporal  # noqa: F401
    import compass_query_optimizer_spark.operators.privacy  # noqa: F401
    import compass_query_optimizer_spark.operators.versioning  # noqa: F401
    import compass_query_optimizer_spark.operators.curation  # noqa: F401
    import compass_query_optimizer_spark.operators.embeddings  # noqa: F401
    import compass_query_optimizer_spark.operators.multimodal  # noqa: F401
    import compass_query_optimizer_spark.plans.queries  # noqa: F401
    import compass_query_optimizer_spark.plans.job_corpus  # noqa: F401
    import compass_query_optimizer_spark.functions.queries  # noqa: F401
    import compass_query_optimizer_spark.streaming.queries  # noqa: F401

    return dict(_REGISTRY)
