"""LSH/SimHash parameters are env-tunable; oracle parity must hold at ANY
setting because the DuckDB SQL is generated from the same constants. Run a
non-default configuration end-to-end in a subprocess (the constants are
read once at import)."""

from __future__ import annotations

import os
import subprocess
import sys

_CODE = """
import duckdb
from pyspark.sql import SparkSession
from compass_query_optimizer_spark.registry import all_queries
from compass_query_optimizer_spark.operators import dedup, similarity
assert dedup.SIMHASH_BITS == 48 and dedup.SIMHASH_BLOCKS == 4
assert dedup.SIMHASH_BLOCK_BITS == 12 and dedup.SIMHASH_MAXDIST == 3
assert similarity.N_PLANES == 12
spark = (SparkSession.builder.master("local[8]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
con = duckdb.connect()
for t in ("documents", "embeddings"):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'")
for name in ("dedup_simhash", "sim_ann_lsh"):
    spec = all_queries()[name]
    s = sorted(tuple(str(c) for c in r) for r in spec.build(spark, "/root/testdata/sf0.001").collect())
    d = sorted(tuple(str(c) for c in r) for r in con.execute(spec.oracle_text()).fetchall())
    assert s == d, f"{name}: spark {len(s)} rows != oracle {len(d)}"
print("ok")
"""


def test_nondefault_params_keep_oracle_parity():
    env = dict(
        os.environ,
        SPARK_GRAFT_SIMHASH_BITS="48",
        SPARK_GRAFT_SIMHASH_BLOCKS="4",
        SPARK_GRAFT_ANN_LSH_BITS="12",
    )
    out = subprocess.run(
        [sys.executable, "-c", _CODE],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().endswith("ok")
