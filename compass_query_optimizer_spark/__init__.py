"""compass_query_optimizer_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capabilities of
yizenov/compass_query_optimizer (COMPASS, SIGMOD 2021: online sketch-based
query optimization, layered on the MapD 3.6.1 analytical SQL engine).

Architecture (see SURVEY.md for the full blueprint):

- The reference's relational operator surface (scans, filters, projections,
  hash joins, group-by aggregation, sort/top-k, scalar functions) maps to
  Spark DataFrame / Spark SQL built-ins — declared logically, optimized by
  Catalyst, executed by Tungsten whole-stage codegen.
- The COMPASS-specific piece — Fast-AGMS sketches built per filtered base
  table, pairwise/multi-way join-size estimation, and a branch-and-bound
  join-order search — is rebuilt in ``plans/`` as a driver-side planning
  pass whose output is a left-deep ``df.join`` chain.
- Large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal plumbing) live in ``operators/``.

Nothing in this package is a port of the reference's C++/CUDA execution
machinery; reference files are cited in docstrings only to document parity.
"""

__version__ = "0.1.0"

from compass_query_optimizer_spark.session import get_spark  # noqa: F401
from compass_query_optimizer_spark.catalog import load_tables  # noqa: F401

# Public operator API: a reference user switching engines gets the query
# surface via compass_sql / the registry, and the generic operators here.
from compass_query_optimizer_spark.functions.dialect import compass_sql  # noqa: F401
from compass_query_optimizer_spark.operators.temporal import (  # noqa: F401
    asof_join,
    range_join_count,
)
from compass_query_optimizer_spark.operators.skew import (  # noqa: F401
    capped_topn,
    salted_join,
)
from compass_query_optimizer_spark.operators.privacy import pii_scan, redact_pii  # noqa: F401
from compass_query_optimizer_spark.operators.versioning import snapshot_diff  # noqa: F401
from compass_query_optimizer_spark.sources.bucketing import (  # noqa: F401
    colocated_join,
    write_bucketed,
    write_clustered,
    write_partitioned,
)
