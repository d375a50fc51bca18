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
assert dedup.SIMHASH_BITS == 32 and dedup.SIMHASH_BLOCKS == 4
assert dedup.SIMHASH_BLOCK_BITS == 8 and dedup.SIMHASH_MAXDIST == 3
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
        SPARK_GRAFT_SIMHASH_BITS="32",
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


_FAST_HASH_CODE = """
from pyspark.sql import SparkSession
from compass_query_optimizer_spark.functions import hashing
assert not hashing.PORTABLE_HASH
spark = (SparkSession.builder.master("local[8]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
from pyspark.sql import functions as F
df = spark.createDataFrame([("a",), ("b",), (None,)], "s string")
vals = [r.h for r in df.select(hashing.spark_portable_hash(F.col("s")).alias("h")).collect()]
assert all(v is None or 0 <= v < (1 << 48) for v in vals)
# end-to-end: exact-dup docs still collapse to one minhash group
from compass_query_optimizer_spark.registry import all_queries
rows = all_queries()["dedup_minhash_lsh"].build(spark, "/root/testdata/sf0.001").collect()
assert len(rows) > 0  # the sf corpus has injected near-dups; fast hash finds pairs
print("ok")
"""


def test_fast_hash_mode_is_consistent():
    """SPARK_GRAFT_PORTABLE_HASH=0 swaps md5 for xxhash64: same 48-bit
    non-negative contract, dedup still finds the injected near-dups (no
    DuckDB parity expected in this mode)."""
    env = dict(os.environ, SPARK_GRAFT_PORTABLE_HASH="0")
    out = subprocess.run(
        [sys.executable, "-c", _FAST_HASH_CODE],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().endswith("ok")


def test_auto_bits_grows_with_corpus_size():
    """Round-5 directive: LSH widths must track corpus size at plan time
    instead of being fixed defaults — and the SQL twin must agree exactly,
    or the oracle would bucket differently from the engine."""
    import duckdb

    from compass_query_optimizer_spark.functions.hashing import (
        auto_bits,
        duck_auto_bits,
    )
    from compass_query_optimizer_spark.operators.dedup import simhash_block_bits
    from compass_query_optimizer_spark.operators.similarity import ann_lsh_bits

    sizes = [0, 1, 100, 1_000, 10_000, 100_000, 10**6, 10**8, 10**9]
    for fn, lo, hi in ((ann_lsh_bits, 6, 20), (simhash_block_bits, 4, 12)):
        widths = [fn(n) for n in sizes]
        assert widths == sorted(widths), f"{fn.__name__} not monotone: {widths}"
        assert widths[0] == lo and widths[-1] == hi, (fn.__name__, widths)
        assert len(set(widths)) > 2, f"{fn.__name__} never adapts: {widths}"

    con = duckdb.connect()
    for n in sizes + [31, 32, 33, 63, 64, 65, 4095, 4096, 4097]:
        for target, lo, hi in ((32, 6, 20), (2, 4, 12)):
            py = auto_bits(n, target, lo, hi)
            sql = con.execute(
                f"SELECT {duck_auto_bits(str(n), target, lo, hi)}"
            ).fetchone()[0]
            assert py == sql, (n, target, py, sql)
