"""Per-catalog materialized collapse-frame artifacts.

Round-10 closing profile: at JOB fixture scale 160 the corpus frontier is
no longer any per-query plan — it is the SAME 5.76M-row collapse-skipped
cast_info frame being re-assembled (scanned, projected, and EXCHANGED
into its first join) by every query that touches it (top stages by
executorRunTime, shuffleRead 5,760,254 rows, ~100 queries deep).

The collapsed chain frame of an UNFILTERED table is a per-catalog
constant — exactly like the table's sketch template — so it is persisted
once per catalog as a parquet table BUCKETED on its chain join key, and
chain assembly reads the artifact instead of rebuilding the frame:

- the scan becomes a narrow pre-projected (and, for collapsing tables,
  pre-aggregated) parquet read, and
- the bucketed scan reports ``HashPartitioning(bucket_col, n_buckets)``,
  so the join-side Exchange of the multi-million-row frame disappears
  from every subsequent query that joins the table on that key.

This is the execution-side analog of the sketch template store
(SURVEY.md §1.3): the reference persists per-catalog sketch templates
across queries (mapd-core/Catalog/Catalog.h:579 uploadSketches /
saveSketches); here the artifact carries the frame's ROWS, not its
sketch, because Spark's scan layer can serve partitioning metadata from
a bucketed table where the reference's buffer pool would re-read.

Artifacts are a performance lever, never a correctness dependency: every
path returns None on failure and the caller falls back to inline frame
assembly. Storage lives under the process-scoped scratch root
(session.scratch_dir), so concurrent processes never race a shared path
and a session rebuilds at most once per (table, key-set, bucket key).
"""

from __future__ import annotations

import hashlib
import os
import sys
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def _artifact_name(
    tag: object, table: str, key_cols: list[str], bucket_col: str, skip: bool
) -> str:
    payload = "|".join(
        [str(tag), table, ",".join(key_cols), bucket_col, str(int(skip))]
    )
    return "cqos_frame_" + hashlib.md5(payload.encode()).hexdigest()[:16]


def get_or_build_frame(
    spark: SparkSession,
    tag: object,
    table: str,
    key_cols: list[str],
    bucket_col: str,
    skip: bool,
    build: Callable[[], DataFrame],
) -> tuple[DataFrame, bool] | None:
    """Return ``(artifact_df, reused)`` for the collapse frame of
    ``table`` under ``key_cols``, building and registering it on first
    use in this session; None when the artifact can't be served (any
    failure — the caller assembles the frame inline).

    ``skip`` distinguishes the two frame kinds (they share a cache key
    space but never a key): a collapse-SKIPPED frame stores the bare key
    columns (multiplicity 1 is implied — storing a constant column would
    waste the scan), a collapsing frame stores keys plus ``__cnt``. The
    bucket count follows the session's shuffle partitioning so the
    bucketed scan's HashPartitioning lines up with what the chain's
    exchanges would have produced."""
    name = _artifact_name(tag, table, key_cols, bucket_col, skip)
    try:
        if spark.catalog.tableExists(name):
            return spark.table(name), True
        from compass_query_optimizer_spark.session import scratch_dir

        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        root = scratch_dir(
            spark, "frames", hashlib.md5(str(tag).encode()).hexdigest()[:12]
        )
        (
            build()
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, bucket_col)
            .option("path", os.path.join(root, name))
            .saveAsTable(name)
        )
        return spark.table(name), False
    except Exception as e:
        print(f"  frame-store artifact {table} skipped: {e}", file=sys.stderr)
        return None
