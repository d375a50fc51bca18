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


# A genuine cross-alias residual predicate (with a float literal AND string
# literals) — not expressible as a per-table filter or an equi-join edge, so
# it must survive the planner's alias.col → alias__col rewrite untouched
# inside literals and numbers (plans/optimizer.py _rewrite_residual).
RESIDUAL_SQL = """
SELECT COUNT(*) AS cnt
FROM lineitem l, orders o, customer c
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND c.c_mktsegment = 'BUILDING'
  AND l.l_extendedprice > 0.5 * o.o_totalprice
  AND (l.l_returnflag = 'R' OR o.o_orderpriority = '1-URGENT')
"""


@query(
    "compass_residual_filter",
    RESIDUAL_SQL,
    doc="COMPASS-planned join with a cross-alias post-join residual "
    "(float literal + string literals): exercises the schema-aware "
    "residual rewrite the naive \\w+\\.\\w+ substitution would corrupt",
    tags=("compass", "join", "residual"),
)
def compass_residual_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    return CompassOptimizer(spark).execute_count(RESIDUAL_SQL, sf_dir)


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


# Grouped form: COUNT(*) GROUP BY through the same eager-aggregation chain.
# The count-form text below is what the planner parses (join graph + filters);
# the GROUP BY columns are passed programmatically and ride the multiplicity
# chain like residual columns — the oracle runs the real grouped SQL.
GROUPED_COUNT_SQL = """
SELECT COUNT(*) AS cnt
FROM lineitem l, orders o, customer c, nation n
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n.n_nationkey
  AND o.o_orderstatus = 'F' AND l.l_returnflag = 'R'
"""

GROUPED_COUNT_ORACLE = """
SELECT n.n_name, COUNT(*) AS cnt
FROM lineitem l, orders o, customer c, nation n
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n.n_nationkey
  AND o.o_orderstatus = 'F' AND l.l_returnflag = 'R'
GROUP BY n.n_name
ORDER BY n.n_name
"""


@query(
    "compass_grouped_count",
    GROUPED_COUNT_ORACLE,
    doc="grouped COUNT(*) over a COMPASS-planned 4-way join via eager "
    "aggregation: group columns ride the multiplicity chain, so the "
    "grouped count never materializes join rows — each table collapses "
    "to (keys, multiplicity) and the final aggregate keys on the group "
    "columns. Same answers as the plain GROUP BY SQL",
    tags=("compass", "join", "grouped"),
)
def compass_grouped_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    return (
        CompassOptimizer(spark)
        .execute_count(GROUPED_COUNT_SQL, sf_dir, group_by=[("n", "n_name")])
        .orderBy("n_name")
    )


# SUM through the multiplicity chain (Yan & Larson's class-1 aggregates):
# the measure table collapses to (keys -> cnt, SUM(x)); SUM over the join
# = Σ per-key sums × Π other tables' multiplicities. Same planner text as
# the grouped count; the measure rides programmatically.
SUM_ORACLE = """
SELECT ROUND(CAST(SUM(l.l_extendedprice) AS DOUBLE), 2) AS sum_rev,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem l, orders o, customer c, nation n
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n.n_nationkey
  AND o.o_orderstatus = 'F' AND l.l_returnflag = 'R'
"""

GROUPED_SUM_ORACLE = """
SELECT n.n_name,
       ROUND(CAST(SUM(l.l_extendedprice) AS DOUBLE), 2) AS sum_rev,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem l, orders o, customer c, nation n
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n.n_nationkey
  AND o.o_orderstatus = 'F' AND l.l_returnflag = 'R'
GROUP BY n.n_name
ORDER BY n.n_name
"""


@query(
    "compass_sum_multijoin",
    SUM_ORACLE,
    doc="SUM(measure) + COUNT(*) over a COMPASS-planned 4-way join via "
    "eager aggregation (Yan & Larson VLDB'95 class-1): the measure table "
    "collapses to (keys, cnt, Σx), other tables to (keys, cnt), and the "
    "chain multiplies the running sum by partner multiplicities — SUM "
    "over the join without ever materializing join rows. Same answers as "
    "the plain SQL",
    tags=("compass", "join", "sum"),
)
def compass_sum_multijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    df = CompassOptimizer(spark).execute_count(
        GROUPED_COUNT_SQL, sf_dir, measure=("l", "l_extendedprice")
    )
    return df.select(
        F.round(F.col("agg_val").cast("double"), 2).alias("sum_rev"), "cnt"
    )


@query(
    "compass_grouped_sum",
    GROUPED_SUM_ORACLE,
    doc="grouped SUM + COUNT over the COMPASS-planned join: group columns "
    "ride the multiplicity chain, the measure rides as a running "
    "per-group sum — the eager-aggregation generalization of "
    "compass_grouped_count",
    tags=("compass", "join", "sum", "grouped"),
)
def compass_grouped_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    df = CompassOptimizer(spark).execute_count(
        GROUPED_COUNT_SQL,
        sf_dir,
        group_by=[("n", "n_name")],
        measure=("l", "l_extendedprice"),
    )
    return df.select(
        "n_name",
        F.round(F.col("agg_val").cast("double"), 2).alias("sum_rev"),
        "cnt",
    ).orderBy("n_name")


AVG_ORACLE = """
SELECT ROUND(CAST(AVG(l.l_extendedprice) AS DOUBLE), 2) AS avg_price,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem l, orders o, customer c, nation n
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n.n_nationkey
  AND o.o_orderstatus = 'F' AND l.l_returnflag = 'R'
"""


@query(
    "compass_avg_multijoin",
    AVG_ORACLE,
    doc="AVG over the COMPASS-planned join via eager aggregation: AVG is "
    "not a new chain op — it is the class-1 SUM divided by the COUNT the "
    "chain already carries (Yan & Larson VLDB'95 §4: AVG decomposes into "
    "(SUM, COUNT) partials), so one multiplicity-chain pass yields both "
    "and the division happens on the one-row result",
    tags=("compass", "join", "avg"),
)
def compass_avg_multijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    df = CompassOptimizer(spark).execute_count(
        GROUPED_COUNT_SQL, sf_dir, measure=("l", "l_extendedprice")
    )
    return df.select(
        F.round(
            (F.col("agg_val") / F.col("cnt")).cast("double"), 2
        ).alias("avg_price"),
        "cnt",
    )


COUNT_DISTINCT_ORACLE = """
SELECT CAST(COUNT(DISTINCT c.c_nationkey) AS BIGINT) AS nd_nation,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem l, orders o, customer c, nation n
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n.n_nationkey
  AND o.o_orderstatus = 'F' AND l.l_returnflag = 'R'
"""

GROUPED_COUNT_DISTINCT_ORACLE = """
SELECT n.n_name,
       CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS nd_cust,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem l, orders o, customer c, nation n
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n.n_nationkey
  AND o.o_orderstatus = 'F' AND l.l_returnflag = 'R'
GROUP BY n.n_name
ORDER BY n.n_name
"""


@query(
    "compass_count_distinct_multijoin",
    COUNT_DISTINCT_ORACLE,
    doc="precise COUNT(DISTINCT) over the COMPASS-planned join via eager "
    "aggregation (class-3): the measure table collapses to per-key "
    "distinct-value SETS which ride the multiplicity chain untouched "
    "(multiplicity-insensitive, like min/max), re-aggregations union "
    "them, and the final aggregate counts the union — exact, join rows "
    "never materialize. The reference executes precise count-distinct "
    "(QueryEngine/CountDistinct.h bitmap/set paths)",
    tags=("compass", "join", "count_distinct"),
)
def compass_count_distinct_multijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    df = CompassOptimizer(spark).execute_count(
        GROUPED_COUNT_SQL,
        sf_dir,
        measure=("c", "c_nationkey"),
        measure_op="count_distinct",
    )
    return df.select(F.col("agg_val").alias("nd_nation"), "cnt")


@query(
    "compass_grouped_count_distinct",
    GROUPED_COUNT_DISTINCT_ORACLE,
    doc="grouped precise COUNT(DISTINCT) through the eager chain: group "
    "columns ride as keys, per-key distinct sets union across "
    "re-aggregations, final count per group — the set-valued analog of "
    "compass_grouped_sum",
    tags=("compass", "join", "count_distinct", "grouped"),
)
def compass_grouped_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    df = CompassOptimizer(spark).execute_count(
        GROUPED_COUNT_SQL,
        sf_dir,
        group_by=[("n", "n_name")],
        measure=("c", "c_custkey"),
        measure_op="count_distinct",
    )
    return df.select(
        "n_name", F.col("agg_val").alias("nd_cust"), "cnt"
    ).orderBy("n_name")


# HLL sketch registers are engine-specific, so (exactly like
# q11_approx_count_distinct) the gate checks the EXACT count both engines
# agree on plus the sketch estimate's published error bound holding.
# Datasketches HLL at the default lgConfigK=12 has rsd ≈ 1.04/sqrt(2^12)
# ≈ 1.63%; 3·rsd is the q11 acceptance band.
HLL_ORACLE = """
SELECT CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS exact_nd,
       TRUE AS within_rsd
FROM lineitem l, orders o, customer c, nation n
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n.n_nationkey
  AND o.o_orderstatus = 'F' AND l.l_returnflag = 'R'
"""


@query(
    "compass_count_distinct_hll",
    HLL_ORACLE,
    doc="approx COUNT(DISTINCT) through the eager chain via Datasketches "
    "HLL: the measure table collapses to a CONSTANT-SIZE sketch per key "
    "(~KB at any cardinality — the scale path where the exact class-3 "
    "set grows with distinct count), sketches union at re-aggregations, "
    "the final estimate is rsd-bounded. Gate = exact count (both "
    "engines agree) + |estimate − exact| ≤ 3·rsd·exact, the "
    "q11_approx_count_distinct acceptance pattern",
    tags=("compass", "join", "count_distinct", "approx", "sketch"),
)
def compass_count_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    rsd = 1.04 / (2**12) ** 0.5  # default lgConfigK=12
    opt = CompassOptimizer(spark)
    plan = opt.plan(GROUPED_COUNT_SQL, sf_dir)
    approx = opt.build_count_join(
        plan, measure=("c", "c_custkey"), measure_op="count_distinct_hll"
    ).select(F.col("agg_val").alias("approx_nd"))
    exact = opt.build_count_join(
        plan, measure=("c", "c_custkey"), measure_op="count_distinct"
    ).select(F.col("agg_val").alias("exact_nd"))
    return exact.crossJoin(approx).select(
        "exact_nd",
        (
            F.abs(F.col("approx_nd") - F.col("exact_nd"))
            <= 3 * rsd * F.col("exact_nd")
        ).alias("within_rsd"),
    )


# count_distinct_auto acceptance: the route is plan-time data-dependent
# (exact at small scale, HLL once the NDV estimate crosses the cap), so the
# gate uses the q11/HLL pattern — the exact count both engines agree on,
# plus the engine's answer landing inside HLL's 3·rsd band (which the
# exact routes satisfy with error 0).
AUTO_DISTINCT_ORACLE = """
SELECT CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS exact_nd,
       TRUE AS within_band
FROM lineitem l, orders o, customer c, nation n
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n.n_nationkey
  AND o.o_orderstatus = 'F' AND l.l_returnflag = 'R'
"""


@query(
    "compass_count_distinct_auto",
    AUTO_DISTINCT_ORACLE,
    doc="COUNT(DISTINCT o_orderkey) — a HIGH-cardinality measure — through "
    "the eager chain with plan-time carrier routing (the reference's "
    "approx↔precise switch, RelAlgExecutor.cpp:1350-1418 + "
    "CountDistinctDescriptor): one stats job (NDV estimate + min/max) on "
    "the push-down frame picks packed-bitmap (dense ints), exact "
    "collect_set (bounded NDV), or constant-size HLL (everything else). "
    "o_orderkey's range exceeds the bitmap cap and its NDV crosses the "
    "exact cap at sf≥0.01, so this entry exercises the HLL route at gate "
    "scale — the path that keeps an unbounded measure from flattening "
    "the full distinct set into one executor at 100 TB. Gate = exact "
    "count + 3·rsd acceptance band (the q11 pattern)",
    tags=("compass", "join", "count_distinct", "auto"),
)
def compass_count_distinct_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    rsd = 1.04 / (2**12) ** 0.5  # Datasketches HLL default lgConfigK=12
    opt = CompassOptimizer(spark)
    plan = opt.plan(GROUPED_COUNT_SQL, sf_dir)
    routed = opt.build_count_join(
        plan, measure=("o", "o_orderkey"), measure_op="count_distinct_auto"
    ).select(F.col("agg_val").alias("routed_nd"))
    exact = opt.build_count_join(
        plan, measure=("o", "o_orderkey"), measure_op="count_distinct"
    ).select(F.col("agg_val").alias("exact_nd"))
    return exact.crossJoin(routed).select(
        "exact_nd",
        (
            F.abs(F.col("routed_nd") - F.col("exact_nd"))
            <= 3 * rsd * F.col("exact_nd")
        ).alias("within_band"),
    )


BITMAP_DISTINCT_ORACLE = """
SELECT CAST(COUNT(DISTINCT c.c_nationkey) AS BIGINT) AS nd_nation,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem l, orders o, customer c, nation n
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n.n_nationkey
  AND o.o_orderstatus = 'F' AND l.l_returnflag = 'R'
"""


@query(
    "compass_count_distinct_bitmap",
    BITMAP_DISTINCT_ORACLE,
    doc="exact COUNT(DISTINCT) through the eager chain on the packed-"
    "bitmap carrier (the reference's CountDistinctImplType::Bitmap, "
    "QueryEngine/CountDistinct.h): c_nationkey's plan-time range (25 "
    "values) fits one 64-bit word, so every key combination carries a "
    "FIXED 8-byte bitmap instead of a value set — native bit_or at the "
    "seed, through every re-aggregation, and at the final popcount. "
    "Exact at ANY row count with constant per-key state; auto-routing "
    "picks this carrier whenever the measure is integral and dense",
    tags=("compass", "join", "count_distinct", "bitmap"),
)
def compass_count_distinct_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    df = CompassOptimizer(spark).execute_count(
        GROUPED_COUNT_SQL,
        sf_dir,
        measure=("c", "c_nationkey"),
        measure_op="count_distinct_bitmap",
    )
    return df.select(F.col("agg_val").alias("nd_nation"), "cnt")


GROUPED_AUTO_DISTINCT_ORACLE = """
SELECT n.n_name,
       CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS nd_cust,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem l, orders o, customer c, nation n
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n.n_nationkey
  AND o.o_orderstatus = 'F' AND l.l_returnflag = 'R'
GROUP BY n.n_name
ORDER BY n.n_name
"""


@query(
    "compass_grouped_distinct_auto",
    GROUPED_AUTO_DISTINCT_ORACLE,
    doc="grouped COUNT(DISTINCT c_custkey) per nation through the eager "
    "chain with plan-time carrier routing: c_custkey is integral and "
    "dense (range ≈ corpus customers), so at gate scale the auto route "
    "lands on the packed bitmap — every (group, key) row carries "
    "⌈range/64⌉ fixed words, bit_or-merged through the chain, "
    "popcounted per group at the end. EXACT (so the oracle is the plain "
    "grouped COUNT DISTINCT) while per-key state stays constant-size — "
    "the grouped form of the reference's Bitmap impl; at ranges past "
    "the cap the same entry degrades to set/HLL automatically",
    tags=("compass", "join", "count_distinct", "auto", "grouped"),
)
def compass_grouped_distinct_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    df = CompassOptimizer(spark).execute_count(
        GROUPED_COUNT_SQL,
        sf_dir,
        group_by=[("n", "n_name")],
        measure=("c", "c_custkey"),
        measure_op="count_distinct_auto",
    )
    return df.select(
        "n_name", F.col("agg_val").cast("long").alias("nd_cust"), "cnt"
    ).orderBy("n_name")


SUM_DISTINCT_ORACLE = """
SELECT ROUND(CAST(SUM(DISTINCT c.c_acctbal) AS DOUBLE), 2) AS sum_bal,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem l, orders o, customer c, nation n
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n.n_nationkey
  AND o.o_orderstatus = 'F' AND l.l_returnflag = 'R'
"""


@query(
    "compass_sum_distinct",
    SUM_DISTINCT_ORACLE,
    doc="SUM(DISTINCT) through the eager chain — the duplicate-SENSITIVE "
    "aggregate over duplicate-INSENSITIVE state: per-key distinct-value "
    "sets ride the multiplicity chain untouched (a join multiplying a "
    "row's count must NOT multiply its distinct sum — exactly why "
    "class-1 SUM and class-3 sets need different carriers), unions at "
    "re-aggregations, and the final aggregate sums the union once. "
    "Completes the Yan & Larson measure-class matrix next to "
    "COUNT(DISTINCT)",
    tags=("compass", "join", "sum_distinct"),
)
def compass_sum_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    df = CompassOptimizer(spark).execute_count(
        GROUPED_COUNT_SQL,
        sf_dir,
        measure=("c", "c_acctbal"),
        measure_op="sum_distinct",
    )
    return df.select(
        F.round(F.col("agg_val").cast("double"), 2).alias("sum_bal"), "cnt"
    )


MINMAX_ORACLE = """
SELECT ROUND(CAST(MIN(l.l_extendedprice) AS DOUBLE), 2) AS min_price,
       ROUND(CAST(MAX(l.l_extendedprice) AS DOUBLE), 2) AS max_price,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem l, orders o, customer c, nation n
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n.n_nationkey
  AND o.o_orderstatus = 'F' AND l.l_returnflag = 'R'
"""


@query(
    "compass_minmax_multijoin",
    MINMAX_ORACLE,
    doc="MIN + MAX over the COMPASS-planned join via eager aggregation "
    "(class-2, duplicate-insensitive): the measure table collapses to "
    "per-key extremes, partner multiplicities are irrelevant, and "
    "re-aggregations take the extreme over surviving key combinations — "
    "the lazy half of Yan & Larson, exact at any scale",
    tags=("compass", "join", "minmax"),
)
def compass_minmax_multijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    # plan ONCE (push-down counts + sketches + order search), then build
    # both extreme chains from the shared plan — execute_count per op
    # would repeat the whole planning pass
    opt = CompassOptimizer(spark)
    plan = opt.plan(GROUPED_COUNT_SQL, sf_dir)
    lo = opt.build_count_join(
        plan, measure=("l", "l_extendedprice"), measure_op="min"
    ).select(
        F.round(F.col("agg_val").cast("double"), 2).alias("min_price"), "cnt"
    )
    hi = opt.build_count_join(
        plan, measure=("l", "l_extendedprice"), measure_op="max"
    ).select(F.round(F.col("agg_val").cast("double"), 2).alias("max_price"))
    return lo.crossJoin(hi).select("min_price", "max_price", "cnt")


GROUPED_MINMAX_ORACLE = """
SELECT n.n_name,
       ROUND(CAST(MIN(l.l_extendedprice) AS DOUBLE), 2) AS min_price,
       ROUND(CAST(MAX(l.l_extendedprice) AS DOUBLE), 2) AS max_price,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem l, orders o, customer c, nation n
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n.n_nationkey
  AND o.o_orderstatus = 'F' AND l.l_returnflag = 'R'
GROUP BY n.n_name
ORDER BY n.n_name
"""


@query(
    "compass_grouped_minmax",
    GROUPED_MINMAX_ORACLE,
    doc="grouped MIN + MAX through the eager chain: group columns ride as "
    "keys, per-key extremes stay multiplicity-free across re-aggregations "
    "— completes the grouped-measure symmetry (grouped COUNT / SUM / "
    "COUNT-DISTINCT / MIN-MAX all execute through the same planned chain). "
    "One planning pass feeds both extreme chains, joined on the group key",
    tags=("compass", "join", "minmax", "grouped"),
)
def compass_grouped_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    opt = CompassOptimizer(spark)
    plan = opt.plan(GROUPED_COUNT_SQL, sf_dir)
    lo = opt.build_count_join(
        plan,
        group_by=[("n", "n_name")],
        measure=("l", "l_extendedprice"),
        measure_op="min",
    ).select(
        "n_name",
        F.round(F.col("agg_val").cast("double"), 2).alias("min_price"),
        "cnt",
    )
    hi = opt.build_count_join(
        plan,
        group_by=[("n", "n_name")],
        measure=("l", "l_extendedprice"),
        measure_op="max",
    ).select(
        "n_name", F.round(F.col("agg_val").cast("double"), 2).alias("max_price")
    )
    return lo.join(hi, "n_name").select(
        "n_name", "min_price", "max_price", "cnt"
    ).orderBy("n_name")


# LEFT OUTER through the eager chain (Yan & Larson VLDB'95 §5 extends the
# aggregate push-down to outer joins; the reference executes LEFT joins as
# levels of the same left-deep chain, RelAlgExecutor.cpp:2635-2644
# left_deep_join_types). The planner text stays the conjunctive inner
# shape; the outer alias rides programmatically like group_by/measure, and
# its per-alias filter is ON-clause semantics (pre-join — a WHERE filter
# on the nullable side would silently turn the join inner).
LEFT_OUTER_SQL = """
SELECT COUNT(*) AS cnt
FROM customer c, nation n, orders o
WHERE c.c_nationkey = n.n_nationkey AND o.o_custkey = c.c_custkey
  AND n.n_regionkey <= 2 AND o.o_orderstatus = 'F'
"""

LEFT_OUTER_ORACLE = """
SELECT ROUND(CAST(SUM(o.o_totalprice) AS DOUBLE), 2) AS sum_open,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN orders o
  ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
WHERE n.n_regionkey <= 2
"""

GROUPED_LEFT_OUTER_ORACLE = """
SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS cnt
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN orders o
  ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
WHERE n.n_regionkey <= 2
GROUP BY n.n_name
ORDER BY n.n_name
"""


@query(
    "compass_count_left_outer",
    LEFT_OUTER_ORACLE,
    doc="SUM + COUNT(*) below a LEFT OUTER join via the eager multiplicity "
    "chain: orders collapses to (o_custkey → cnt, Σ o_totalprice) BEFORE "
    "the null-extending join, the chain multiplies by coalesce(cnt, 1) — "
    "an unmatched customer survives exactly once — and the riding sum "
    "needs no coalesce because SQL aggregates skip the NULLs "
    "null-extension produces. The outer alias is legalized to the tail of "
    "the sketch-searched order ((A ⋈ B) ⟕ C ≡ (A ⟕ C) ⋈ B only when B "
    "never references C). Exact vs the plain LEFT JOIN SQL",
    tags=("compass", "join", "outer"),
)
def compass_count_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    df = CompassOptimizer(spark).execute_count(
        LEFT_OUTER_SQL,
        sf_dir,
        measure=("o", "o_totalprice"),
        outer={"o"},
    )
    return df.select(
        F.round(F.col("agg_val").cast("double"), 2).alias("sum_open"), "cnt"
    )


@query(
    "compass_grouped_count_left_outer",
    GROUPED_LEFT_OUTER_ORACLE,
    doc="grouped COUNT(*) below a LEFT OUTER join through the eager chain: "
    "group columns ride the multiplicity chain across the null-extending "
    "join, unmatched customers contribute multiplicity 1 to their "
    "nation's count — the grouped form of compass_count_left_outer. "
    "Join rows never materialize on either side of the outer join",
    tags=("compass", "join", "outer", "grouped"),
)
def compass_grouped_count_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    return (
        CompassOptimizer(spark)
        .execute_count(
            LEFT_OUTER_SQL,
            sf_dir,
            group_by=[("n", "n_name")],
            outer={"o"},
        )
        .orderBy("n_name")
    )


# Several riding measures in ONE chain pass: compass_grouped_minmax runs
# one chain per extreme and joins the results; the multi-measure chain
# carries every aggregate's channel through the SAME joins and
# re-aggregations, so SUM + MIN + MAX + COUNT over the 4-way join costs
# one planning pass and one scan of each table.
MULTI_MEASURE_ORACLE = """
SELECT n.n_name,
       ROUND(CAST(SUM(l.l_extendedprice) AS DOUBLE), 2) AS sum_rev,
       ROUND(CAST(MIN(l.l_extendedprice) AS DOUBLE), 2) AS min_price,
       ROUND(CAST(MAX(l.l_extendedprice) AS DOUBLE), 2) AS max_price,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem l, orders o, customer c, nation n
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n.n_nationkey
  AND o.o_orderstatus = 'F' AND l.l_returnflag = 'R'
GROUP BY n.n_name
ORDER BY n.n_name
"""


@query(
    "compass_multi_measure",
    MULTI_MEASURE_ORACLE,
    doc="grouped SUM + MIN + MAX + COUNT in ONE eager chain pass: each "
    "measure rides its own channel through the same collapsed joins and "
    "re-aggregations (sum scales by partner multiplicity, extremes pass "
    "untouched), so a multi-aggregate report costs one planning pass and "
    "ONE scan per table — where the per-measure form runs a chain per "
    "aggregate and joins the results. Plan-locked to a single lineitem "
    "scan",
    tags=("compass", "join", "grouped", "multi-measure"),
)
def compass_multi_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    df = CompassOptimizer(spark).execute_count(
        GROUPED_COUNT_SQL,
        sf_dir,
        group_by=[("n", "n_name")],
        measures=[
            ("l", "l_extendedprice", "sum"),
            ("l", "l_extendedprice", "min"),
            ("l", "l_extendedprice", "max"),
        ],
    )
    return df.select(
        "n_name",
        F.round(F.col("agg_val0").cast("double"), 2).alias("sum_rev"),
        F.round(F.col("agg_val1").cast("double"), 2).alias("min_price"),
        F.round(F.col("agg_val2").cast("double"), 2).alias("max_price"),
        "cnt",
    ).orderBy("n_name")


# AVG below a LEFT OUTER join needs COUNT(col), not COUNT(*): the
# null-extended rows count toward the join's multiplicity but NOT toward
# AVG's denominator. The `count` measure op (class-1: per-key non-null
# count riding as a multiplicity-scaled sum) supplies the denominator;
# one multi-measure chain carries SUM and COUNT(col) together and the
# division happens on the 25-row grouped result.
AVG_LEFT_OUTER_ORACLE = """
SELECT n.n_name,
       ROUND(CAST(AVG(o.o_totalprice) AS DOUBLE), 2) AS avg_open,
       CAST(COUNT(o.o_totalprice) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN orders o
  ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
WHERE n.n_regionkey <= 2
GROUP BY n.n_name
ORDER BY n.n_name
"""


@query(
    "compass_avg_left_outer",
    AVG_LEFT_OUTER_ORACLE,
    doc="AVG below the LEFT OUTER join via one multi-measure chain: "
    "SUM(o_totalprice) and COUNT(o_totalprice) ride together, and AVG = "
    "sum/count divides on the grouped result — COUNT(col), not "
    "COUNT(*), because null-extended rows count toward the join's "
    "multiplicity but not AVG's denominator. The `count` op is Yan & "
    "Larson class-1: a per-key non-null count scaled by partner "
    "multiplicity exactly like SUM",
    tags=("compass", "join", "outer", "avg", "multi-measure"),
)
def compass_avg_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    df = CompassOptimizer(spark).execute_count(
        LEFT_OUTER_SQL,
        sf_dir,
        group_by=[("n", "n_name")],
        measures=[
            ("o", "o_totalprice", "sum"),
            ("o", "o_totalprice", "count"),
        ],
        outer={"o"},
    )
    return df.select(
        "n_name",
        F.round(
            F.when(
                F.col("agg_val1") > 0, F.col("agg_val0") / F.col("agg_val1")
            ).cast("double"),
            2,
        ).alias("avg_open"),
        F.col("agg_val1").cast("long").alias("n_orders"),
        "cnt",
    ).orderBy("n_name")


# Measures owned by DIFFERENT aliases in one chain: lineitem's SUM and
# orders' MIN/COUNT each seed on their own table's collapse and meet in
# the shared chain — the general groupjoin shape (a revenue sum and an
# order-value floor in one report) that per-measure chains would pay two
# planning passes for.
CROSS_TABLE_MEASURES_ORACLE = """
SELECT n.n_name,
       ROUND(CAST(SUM(l.l_extendedprice) AS DOUBLE), 2) AS sum_rev,
       ROUND(CAST(MIN(o.o_totalprice) AS DOUBLE), 2) AS min_order,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem l, orders o, customer c, nation n
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n.n_nationkey
  AND o.o_orderstatus = 'F' AND l.l_returnflag = 'R'
GROUP BY n.n_name
ORDER BY n.n_name
"""


@query(
    "compass_cross_table_measures",
    CROSS_TABLE_MEASURES_ORACLE,
    doc="measures owned by DIFFERENT aliases in ONE chain: "
    "SUM(l.l_extendedprice) seeds on lineitem's collapse, "
    "MIN(o.o_totalprice) on orders', and both channels ride the shared "
    "joins — the sum scaling by every partner's multiplicity (including "
    "orders'), the extreme passing untouched. One planning pass, one "
    "scan per table, where per-measure chains would run the pipeline "
    "twice",
    tags=("compass", "join", "grouped", "multi-measure"),
)
def compass_cross_table_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    df = CompassOptimizer(spark).execute_count(
        GROUPED_COUNT_SQL,
        sf_dir,
        group_by=[("n", "n_name")],
        measures=[
            ("l", "l_extendedprice", "sum"),
            ("o", "o_totalprice", "min"),
        ],
    )
    return df.select(
        "n_name",
        F.round(F.col("agg_val0").cast("double"), 2).alias("sum_rev"),
        F.round(F.col("agg_val1").cast("double"), 2).alias("min_order"),
        "cnt",
    ).orderBy("n_name")
