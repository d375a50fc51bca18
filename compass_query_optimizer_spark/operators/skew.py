"""Skew-mitigation join: explicit key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting is the deterministic fallback when one build-side
key dominates so heavily that even split partitions bottleneck — the
100 TB version of the reference's single-node "TooManyHashEntries" wall
(JoinHashTable.h:53).

``salted_join(large, small, on)`` spreads each large-side row across
``n_salt`` shuffle partitions via a deterministic per-row salt and
replicates the small side ``n_salt``× with `explode` — an equi-join on
(key, salt) whose result is row-identical to the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    n_salt: int = 16,
) -> DataFrame:
    """Join with the large side salted across ``n_salt`` sub-keys.

    The salt is derived from a hash of the large side's full row (xxhash64,
    deterministic), so repeated runs shuffle identically; the small side is
    exploded n_salt×. Output is row-identical to a plain ``large.join(small,
    on, how)`` for ``how`` in {inner, left, left_semi, cross} — large-side
    rows appear once per salt value they hash to (exactly one). Right/full
    outer joins are rejected: the replicated small side would emit each
    unmatched small row n_salt times instead of once."""
    if how not in {"inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "cross"}:
        raise ValueError(
            f"salted_join does not support how={how!r}: the small side is "
            "replicated n_salt times, so right/full-outer unmatched rows "
            "would be duplicated"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salt))
    big = large.withColumn(SALT_COL, salt.cast("int"))
    rep = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return big.join(rep, keys + [SALT_COL], how).drop(SALT_COL)


def capped_topn(
    df: DataFrame,
    key: list[str] | str,
    order_by: list,
    n: int,
    n_salt: int = 32,
) -> DataFrame:
    """Skew-safe top-N per key: two-level row_number capping.

    A plain `row_number() OVER (PARTITION BY key ...)` funnels every row of
    a hot key through ONE task — the mega-source failure mode for
    per-domain caps at 100 TB. Here rows are first capped to `n` within
    (key, salt) — n_salt parallel tasks per key — then the ≤ n_salt·n
    survivors per key are re-capped globally. Both windows are keyed; the
    second sees at most n_salt·n rows per key regardless of input skew.

    `order_by` are Column sort expressions (must be a total order, e.g. a
    unique tie-break column last) — the same ordering drives both levels,
    so the result is row-identical to the single-window top-n.
    """
    from pyspark.sql.window import Window

    keys = [key] if isinstance(key, str) else list(key)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    w1 = Window.partitionBy(*keys, SALT_COL).orderBy(*order_by)
    w2 = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(SALT_COL, salt.cast("int"))
        .withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= n)
        .withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= n)
        .drop(SALT_COL, "__rn1", "__rn")
    )


# ---------------------------------------------------------------------------
# Registered correctness gate: salted join is row-identical to a plain join
# ---------------------------------------------------------------------------

_SALTED_ORACLE = """
WITH d AS (
  SELECT event_type, COUNT(*) AS type_total FROM events GROUP BY event_type
)
SELECT e.event_type,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT)
         AS sum_value_cents,
       MAX(d.type_total) AS type_total
FROM events e JOIN d USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
"""


def _register():
    # local import: skew.py is also used by operators that load before the
    # registry (avoids a cycle at package-import time)
    from pyspark.sql import SparkSession

    from compass_query_optimizer_spark.catalog import load_tables
    from compass_query_optimizer_spark.registry import query

    @query(
        "skew_salted_join",
        _SALTED_ORACLE,
        doc="skew-mitigation salted join, oracle-gated: events (every "
        "event_type is a hot key — 5 keys over the whole table) join a "
        "tiny per-type dim through salted_join, which spreads each hot "
        "key across 16 (key, salt) sub-keys and explodes the dim side "
        "16x; the oracle is the PLAIN join + aggregate, so the gate "
        "proves the salt/replicate/drop dance is row-exact. The "
        "deterministic xxhash64 row salt keeps reruns shuffle-identical; "
        "at 100 TB this is the fallback when one key defeats even AQE "
        "skew splitting",
        tags=("skew", "join"),
    )
    def skew_salted_join(spark: SparkSession, sf_dir: str):
        t = load_tables(spark, sf_dir)
        ev = t["events"]
        dim = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("type_total"))
        joined = salted_join(ev, dim, on="event_type", n_salt=16)
        return (
            joined.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                # integer cents, not ROUND(SUM(double),2): value is DOUBLE
                # and every event_type group spans the whole table, so the
                # 16-way salted join's accumulation order vs DuckDB's plain
                # join could flake a 2-decimal round near a .005 boundary;
                # summing int64 cents is order-independent and exact
                F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                    "sum_value_cents"
                ),
                F.max("type_total").alias("type_total"),
            )
            .orderBy("event_type")
        )


_register()
