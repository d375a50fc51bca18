"""Relational operator surface (SURVEY.md §2) as oracle-checked queries.

Each query exercises a cluster of reference operators and maps them to the
idiomatic Spark DataFrame form. Reference parity citations are given per
query. All run against the driver testdata star schema (TESTDATA.md).

Scale notes (100 TB design intent):
- Every filter is expressed declaratively so Catalyst pushes it into the
  parquet scan (PushedFilters) and prunes columns (ReadSchema).
- Dimension-side joins (region/nation/supplier at real TPC-H ratios) are
  broadcast by Spark automatically under autoBroadcastJoinThreshold; fact-
  fact joins shuffle on the join key and benefit from AQE skew handling.
- Aggregations rely on partial (map-side) aggregation; no Python touches
  the hot path in any query here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from compass_query_optimizer_spark.catalog import load_tables
from compass_query_optimizer_spark.registry import query

# ---------------------------------------------------------------------------
# Aggregation / scan / filter (reference: GroupByAndAggregate.cpp strategy
# table, SURVEY §2.4; filter qual splitting RelAlgExecutor.cpp:2679-2684)
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                         AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)      AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 2)                              AS avg_qty,
           ROUND(AVG(l_extendedprice), 2)                         AS avg_price,
           ROUND(AVG(l_discount), 4)                              AS avg_disc,
           COUNT(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="scan+filter+hash agg: SUM/AVG/COUNT, partial+final reduction "
    "(ref ResultSetReduction.cpp:116)",
    tags=("agg", "filter"),
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q02_topk_parts",
    """
    SELECT p_partkey, p_name, p_brand, p_retailprice
    FROM part
    WHERE p_size > 10
    ORDER BY p_retailprice DESC, p_partkey
    LIMIT 15
    """,
    doc="ORDER BY + LIMIT top-k (ref StreamingTopN.cpp, TopKSort.cu → Spark "
    "TakeOrderedAndProject)",
    tags=("sort", "topk"),
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_size") > 10)
        .select("p_partkey", "p_name", "p_brand", "p_retailprice")
        .orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
        .limit(15)
    )


@query(
    "q03_shipping_priority",
    """
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="3-way equi hash join + agg + top-k (ref JoinHashTable.cpp, "
    "left-deep probe chain IRCodegen.cpp:527)",
    tags=("join", "agg", "topk"),
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < cutoff)
    li = t["lineitem"].filter(F.col("l_shipdate") > cutoff)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q04_semi_join_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_discount > 0.05)
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="IN-subquery → left semi join (ref rewrites IN-subquery to a "
    "materialized InIntegerSet filter, RelAlgTranslator.cpp:427; Spark "
    "plans a SMJ/BHJ semi join instead)",
    tags=("join", "subquery"),
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    keys = t["lineitem"].filter(F.col("l_discount") > 0.05).select("l_orderkey")
    return (
        t["orders"]
        .filter(F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        .join(keys, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q05_local_supplier_volume",
    """
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="6-way join with cycle (c_nationkey=s_nationkey), broadcast dims + "
    "shuffled fact joins; the JOB-like shape COMPASS optimizes",
    tags=("join", "agg"),
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    region = F.broadcast(t["region"].filter(F.col("r_name") == "ASIA"))
    nation = F.broadcast(t["nation"])
    supplier = t["supplier"]
    orders = t["orders"].filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    return (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@query(
    "q06_forecast_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="single-table scan w/ range + BETWEEN (ref kBW_EQ, sqldefs.h:29-54) "
    "predicates pushed to parquet; ungrouped agg",
    tags=("filter", "agg"),
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


# The JOB workload shape: SELECT COUNT(*) over a multi-way join with string
# predicates (ref queries/*.sql.sq.cnt are all of this form).
FLAGSHIP_SQL = """
    SELECT COUNT(*) AS cnt
    FROM region, nation, customer, orders, lineitem, part
    WHERE r_regionkey = n_regionkey
      AND n_nationkey = c_nationkey
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND l_partkey = p_partkey
      AND r_name <> 'EUROPE'
      AND (p_name LIKE '%gear%' OR p_name LIKE '%widget%')
      AND c_mktsegment IN ('BUILDING', 'MACHINERY')
      AND o_orderstatus = 'F'
"""


@query(
    "q07_count_star_multijoin",
    FLAGSHIP_SQL,
    doc="JOB-shaped COUNT(*) 6-way join with LIKE/IN/<> predicates — the "
    "reference's benchmark query form (queries/1a.sql.sq.cnt)",
    tags=("join", "job"),
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(FLAGSHIP_SQL)


@query(
    "q08_group_having",
    """
    SELECT c_nationkey, COUNT(*) AS n_cust, ROUND(AVG(c_acctbal), 2) AS avg_bal
    FROM customer
    GROUP BY c_nationkey
    HAVING COUNT(*) > 40
    ORDER BY c_nationkey
    """,
    doc="HAVING = post-agg filter (ref ParserNode.cpp:1030)",
    tags=("agg",),
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        )
        .filter(F.col("n_cust") > 40)
        .orderBy("c_nationkey")
    )


@query(
    "q09_distinct",
    """
    SELECT DISTINCT c_mktsegment, c_nationkey
    FROM customer
    WHERE c_acctbal > 0
    ORDER BY c_mktsegment, c_nationkey
    """,
    doc="SELECT DISTINCT = aggregate on all projected cols (ref "
    "RelAlgAbstractInterpreter.cpp:1558)",
    tags=("agg",),
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    )


@query(
    "q10_agg_kinds",
    """
    SELECT o_orderstatus,
           COUNT(*)                              AS n,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           ROUND(MIN(o_totalprice), 2)           AS min_price,
           ROUND(MAX(o_totalprice), 2)           AS max_price,
           ROUND(SUM(o_totalprice), 2)           AS sum_price,
           ROUND(AVG(o_totalprice), 2)           AS avg_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="every reference agg kind except sketch: COUNT/COUNT DISTINCT/MIN/"
    "MAX/SUM/AVG (ref sqldefs.h:66; precise count-distinct bitmap "
    "CountDistinct.h → Spark hash-based distinct agg)",
    tags=("agg",),
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("o_custkey").alias("n_cust"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q11_approx_count_distinct",
    # HLL register layouts differ across engines, so the approx value itself
    # is not comparable — but its error bound IS: oracle the exact count plus
    # the |approx−exact| ≤ 3·rsd·exact acceptance boolean (a real check: a
    # broken HLL fails it, and both engines agree on the exact side)
    """
    SELECT COUNT(DISTINCT user_id) AS exact_users, TRUE AS within_rsd
    FROM events
    """,
    doc="APPROX_COUNT_DISTINCT (ref HyperLogLog.h:88 → Spark "
    "approx_count_distinct); gate checks exact count + the 3·rsd error "
    "bound holding, since raw HLL values legitimately differ per engine",
    tags=("agg", "approx"),
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    rsd = 0.02
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .agg(
            F.approx_count_distinct("user_id", rsd).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 3 * rsd * F.col("exact_users")
            ).alias("within_rsd"),
        )
    )


@query(
    "q12_case_cast_in",
    """
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'hot'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'warm'
                ELSE 'cold' END                        AS heat,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price_dec,
           COUNT(*)                                    AS n
    FROM orders
    WHERE CAST(o_orderkey AS VARCHAR) NOT LIKE '%999'
    GROUP BY 1
    ORDER BY heat
    """,
    doc="CASE WHEN (ref CaseIR.cpp) + CAST incl. decimal (CastIR.cpp) + IN "
    "value list (InValues, Analyzer.h:502); decimal sums are exact so no "
    "rounding epsilon is involved",
    tags=("expr",),
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    heat = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hot")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "warm")
        .otherwise("cold")
    )
    return (
        t["orders"]
        .filter(~F.col("o_orderkey").cast("string").like("%999"))
        .groupBy(heat.alias("heat"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("sum_price_dec"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("heat")
    )


@query(
    "q13_date_functions",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)    AS yr,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS qtr,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS mon,
           COUNT(*)                                           AS n,
           CAST(MIN(EXTRACT(doy FROM o_orderdate)) AS INTEGER) AS first_doy,
           CAST(MAX(DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS INTEGER) AS max_days_since
    FROM orders
    WHERE o_orderdate + INTERVAL 30 DAY < TIMESTAMP '2001-01-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY yr, qtr, mon
    """,
    doc="EXTRACT/DATE_TRUNC/DATEDIFF/interval arithmetic (ref "
    "ExtractFromTime.h:64-78, DateTruncate.h:42-57, DateAdd.h, "
    "DateTimePlusRewrite.cpp)",
    tags=("datetime",),
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    od = F.col("o_orderdate")
    return (
        t["orders"]
        .filter(
            od + F.expr("INTERVAL 30 DAY")
            < F.lit("2001-01-01 00:00:00").cast("timestamp")
        )
        .groupBy(
            F.year(od).alias("yr"),
            F.quarter(od).alias("qtr"),
            F.date_trunc("month", od).alias("mon"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.dayofyear(od)).alias("first_doy"),
            F.max(F.datediff(od.cast("date"), F.lit("1995-01-01").cast("date"))).alias(
                "max_days_since"
            ),
        )
        .orderBy("yr", "qtr", "mon")
    )


@query(
    "q14_string_functions",
    """
    SELECT p_partkey, p_name,
           CAST(LENGTH(p_name) AS INTEGER)      AS name_len,
           UPPER(p_brand)                       AS brand_u,
           SUBSTR(p_type, 1, 3)                 AS type3
    FROM part
    WHERE p_name LIKE '%gear%'
       OR p_name ILIKE '%WIDGET%'
       OR regexp_matches(p_name, '^(red|blue) ')
    ORDER BY p_partkey
    """,
    doc="LIKE/ILIKE/REGEXP + LENGTH/CHAR_LENGTH (ref StringLike.cpp:225, "
    "Regexp.cpp, StringOpsIR.cpp, ILIKE translate RelAlgTranslator.cpp:751)",
    tags=("string",),
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(
            F.col("p_name").like("%gear%")
            | F.col("p_name").ilike("%WIDGET%")
            | F.col("p_name").rlike("^(red|blue) ")
        )
        .select(
            "p_partkey",
            "p_name",
            F.length("p_name").alias("name_len"),
            F.upper("p_brand").alias("brand_u"),
            F.substring("p_type", 1, 3).alias("type3"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q15_left_outer_join",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_cust,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_inactive
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderstatus = 'P'
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="LEFT OUTER equi join w/ extra join-side predicate (ref "
    "JoinType::LEFT, RelAlgExecutor.cpp:2635-2644). NOTE counts customers "
    "×matching-P-orders plus unmatched customers",
    tags=("join", "outer"),
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"]
    return (
        t["customer"]
        .join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderstatus") == "P"),
            "left",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("n_inactive"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q16_scalar_subquery",
    """
    SELECT o_orderpriority, COUNT(*) AS n_big
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="scalar subquery executed first, constant substituted (ref "
    "RelAlgTranslator.cpp:257; Spark plans a subquery broadcast)",
    tags=("subquery",),
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"]
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_big
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "q17_limit_offset",
    """
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price
    FROM orders
    ORDER BY o_orderkey
    LIMIT 20 OFFSET 100
    """,
    doc="ORDER BY LIMIT OFFSET (ref RelSort{collation,limit,offset}, "
    "RelAlgExecutor.cpp:1201 executeSort)",
    tags=("sort",),
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price"))
        .orderBy("o_orderkey")
        .offset(100)
        .limit(20)
    )


@query(
    "q18_array_ops",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER)                  AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6)           AS first_val,
           ROUND(CAST(embedding[len(embedding)] AS DOUBLE), 6) AS last_val,
           ROUND(list_sum(CAST(embedding AS DOUBLE[])), 4)  AS vec_sum
    FROM embeddings
    WHERE label = 1
    ORDER BY vec_id
    """,
    doc="array ops: subscript/ITEM, array_size, array fold (ref kARRAY, "
    "ArrayOps.cpp:32-64, UNNEST → explode covered in tests)",
    tags=("array",),
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    emb = F.col("embedding")
    return (
        t["embeddings"]
        .filter(F.col("label") == 1)
        .select(
            "vec_id",
            F.size(emb).alias("dim"),
            F.round(F.element_at(emb, 1).cast("double"), 6).alias("first_val"),
            F.round(F.element_at(emb, F.size(emb)).cast("double"), 6).alias("last_val"),
            F.round(
                F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x.cast("double")), 4
            ).alias("vec_sum"),
        )
        .orderBy("vec_id")
    )


@query(
    "q19_in_integer_set",
    """
    SELECT l_returnflag, COUNT(*) AS n
    FROM lineitem
    WHERE l_partkey IN (3, 17, 33, 64, 129, 257, 511, 733, 1024, 1337,
                        1513, 1777, 1801, 1899, 1951)
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="large integer IN list (ref InIntegerSet / InValuesBitmap.cpp → "
    "Spark isin over a pushed-down OR set)",
    tags=("filter",),
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    keys = [3, 17, 33, 64, 129, 257, 511, 733, 1024, 1337, 1513, 1777, 1801, 1899, 1951]
    return (
        t["lineitem"]
        .filter(F.col("l_partkey").isin(keys))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag")
    )


@query(
    "q20_null_semantics",
    """
    SELECT c_mktsegment,
           COUNT(*)            AS n_rows,
           COUNT(bal_or_null)  AS n_notnull,
           CAST(SUM(CASE WHEN bal_or_null IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           ROUND(AVG(bal_or_null), 2) AS avg_notnull
    FROM (
      SELECT c_mktsegment,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_or_null
      FROM customer
    ) t
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="3VL null semantics: IS NULL / null-skipping aggs (ref "
    "NullableValue.h sentinel nulls, *_skip_val agg variants "
    "RuntimeFunctions.cpp:459)",
    tags=("nulls",),
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    bal = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal"))
    return (
        t["customer"]
        .select("c_mktsegment", bal.alias("bal_or_null"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("bal_or_null").alias("n_notnull"),
            F.sum(F.when(F.col("bal_or_null").isNull(), 1).otherwise(0)).alias("n_null"),
            F.round(F.avg("bal_or_null"), 2).alias("avg_notnull"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q21_cross_join_small",
    """
    SELECT r_name, s.seg, COUNT(*) AS n
    FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) s
    GROUP BY r_name, s.seg
    ORDER BY r_name, s.seg
    """,
    doc="cartesian/loop join (ref JoinLoop.h nested-loop fallback, "
    "allow_loop_joins for trivially small inputs → Spark BNLJ)",
    tags=("join", "cross"),
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    segs = t["customer"].select(F.col("c_mktsegment").alias("seg")).distinct()
    return (
        t["region"]
        .crossJoin(segs)
        .groupBy("r_name", "seg")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("r_name", "seg")
    )


@query(
    "q22_math_functions",
    """
    SELECT p_size,
           ROUND(ABS(MIN(p_retailprice - 1000)), 4)          AS abs_min,
           ROUND(SUM(FLOOR(p_retailprice) + CEIL(p_retailprice)), 2) AS floor_ceil_sum,
           CAST(SUM(CAST(p_partkey AS BIGINT) % 7) AS BIGINT) AS mod_sum,
           ROUND(AVG(LN(p_retailprice + 1)), 6)              AS avg_ln,
           ROUND(AVG(SQRT(p_retailprice)), 6)                AS avg_sqrt,
           ROUND(AVG(POWER(p_retailprice, 0.5)), 6)          AS avg_pow
    FROM part
    GROUP BY p_size
    ORDER BY p_size
    """,
    doc="math extension functions: ABS/FLOOR/CEIL/MOD/LN/POWER (ref "
    "ExtensionFunctions.hpp:35-235, ArithmeticIR.cpp)",
    tags=("expr", "math"),
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    p = F.col("p_retailprice")
    return (
        t["part"]
        .groupBy("p_size")
        .agg(
            F.round(F.abs(F.min(p - 1000)), 4).alias("abs_min"),
            F.round(
                F.sum(F.floor(p).cast("double") + F.ceil(p).cast("double")), 2
            ).alias("floor_ceil_sum"),
            F.sum(F.col("p_partkey").cast("bigint") % 7).alias("mod_sum"),
            F.round(F.avg(F.log(p + 1)), 6).alias("avg_ln"),
            F.round(F.avg(F.sqrt(p)), 6).alias("avg_sqrt"),
            F.round(F.avg(F.pow(p, F.lit(0.5))), 6).alias("avg_pow"),
        )
        .orderBy("p_size")
    )


@query(
    "q23_events_rollup",
    """
    SELECT DATE_TRUNC('hour', ts) AS hr, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase')
    GROUP BY 1, 2
    ORDER BY hr, event_type
    LIMIT 200
    """,
    doc="event-stream batch rollup: the batch-view equivalent of the "
    "streaming ingest path (ref only ingests streams, StreamImporter.cpp; "
    "our streaming/ module adds true readStream ingest)",
    tags=("agg", "events"),
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("event_type").isin("click", "view", "purchase"))
        .groupBy(F.date_trunc("hour", "ts").alias("hr"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("hr", "event_type")
        .limit(200)
    )


@query(
    "q24_sessionization",
    """
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM sess
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    doc="gap-based sessionization via session_window (30-min inactivity "
    "gap): the hypertable-rollup-shaped custom grouping the reference "
    "lacks; oracle reconstructs sessions with lag+cumsum window fns",
    tags=("agg", "events", "session"),
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("user_id", F.session_window(F.col("ts"), "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "q25_window_functions",
    """
    WITH ranked AS (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER w AS rn,
             RANK() OVER w AS rnk,
             ROUND(SUM(o.o_totalprice) OVER (PARTITION BY c.c_mktsegment
                                             ORDER BY o.o_totalprice DESC, o.o_orderkey
                                             ROWS UNBOUNDED PRECEDING), 2) AS run_sum,
             LAG(o.o_orderkey) OVER w AS prev_key
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WINDOW w AS (PARTITION BY c.c_mktsegment
                   ORDER BY o.o_totalprice DESC, o.o_orderkey)
    )
    SELECT c_mktsegment, o_orderkey, o_totalprice,
           CAST(rn AS INTEGER) AS rn, CAST(rnk AS INTEGER) AS rnk,
           run_sum, prev_key
    FROM ranked WHERE rn <= 5
    ORDER BY c_mktsegment, rn
    """,
    doc="window functions (beyond parity: the reference parses OVER but "
    "rejects it, SURVEY.md §2.5): ROW_NUMBER / RANK / running SUM / LAG "
    "per market segment with deterministic tie-breaks, top-5 per segment",
    tags=("window", "beyond-parity"),
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    j = t["orders"].join(
        t["customer"], F.col("o_custkey") == F.col("c_custkey")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        j.select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.round(
                F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)),
                2,
            ).alias("run_sum"),
            F.lag("o_orderkey").over(w).alias("prev_key"),
        )
        .filter(F.col("rn") <= 5)
        .orderBy("c_mktsegment", "rn")
    )


@query(
    "q26_set_operations",
    """
    SELECT 'except' AS op, COUNT(*) AS n FROM (
      SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect', COUNT(*) FROM (
      SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'union_all', COUNT(*) FROM (
      SELECT c_nationkey FROM customer UNION ALL SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'union_distinct', COUNT(*) FROM (
      SELECT c_nationkey FROM customer UNION SELECT s_nationkey FROM supplier)
    ORDER BY op
    """,
    doc="set operations (beyond parity: the reference planner rejects "
    "UNION/INTERSECT/EXCEPT, Planner/Planner.cpp:69, SURVEY.md §2.7): "
    "UNION ALL / UNION DISTINCT / INTERSECT / EXCEPT over nation keys",
    tags=("setops", "beyond-parity"),
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").alias("k"))
    s = t["supplier"].select(F.col("s_nationkey").alias("k"))

    def counted(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(op).alias("op"), "n"
        )

    return (
        counted("except", c.distinct().exceptAll(s.distinct()))
        .unionAll(counted("intersect", c.distinct().intersectAll(s.distinct())))
        .unionAll(counted("union_all", c.unionAll(s)))
        .unionAll(counted("union_distinct", c.unionAll(s).distinct()))
        .orderBy("op")
    )


@query(
    "q27_grouping_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER)  AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER)  AS g_status,
           SUM(l_quantity)                          AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)           AS sum_price,
           COUNT(*)                                 AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="GROUPING SETS / ROLLUP (beyond parity: the reference RA dispatch "
    "throws for any grouping-set node, RelAlgAbstractInterpreter.cpp:1522; "
    "SURVEY.md §2.4 'Not present'): per-(flag,status) subtotals, per-flag "
    "subtotals, and the grand total in ONE pass — Spark expands rollup "
    "into a single Expand+hash-agg, so at 100 TB this is one scan + one "
    "shuffle instead of three queries. GROUPING() markers disambiguate "
    "rollup NULLs from genuine NULL group keys.",
    tags=("agg", "beyond-parity"),
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy(
            "g_flag",
            "g_status",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "q28_not_exists_anti_join",
    """
    SELECT c.c_nationkey AS nation_key,
           COUNT(*) AS n_custs,
           ROUND(AVG(c.c_acctbal), 2) AS avg_bal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    ORDER BY nation_key
    """,
    doc="NOT EXISTS -> left-anti hash join (beyond parity: the reference "
    "has no semi/anti join operators, SURVEY.md §2.3 'Not present'; its IN "
    "materializes the subquery driver-side into an InIntegerSet filter, "
    "RelAlgTranslator.cpp:427). Spark keeps it distributed: the filtered "
    "orders side shuffles on o_custkey, never through the driver, and the "
    "priority filter is pushed into the orders scan.",
    tags=("join", "beyond-parity"),
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nation_key"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        )
        .orderBy("nation_key")
    )


@query(
    "q29_full_outer_join",
    """
    WITH c AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust
               FROM customer
               WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9500.0
               GROUP BY 1),
         s AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp
               FROM supplier WHERE s_acctbal > 5000.0 GROUP BY 1)
    SELECT COALESCE(c.k, s.k) AS nation_key, c.n_cust, s.n_supp
    FROM c FULL OUTER JOIN s ON c.k = s.k
    ORDER BY nation_key
    """,
    doc="FULL OUTER join (beyond parity: the reference supports only "
    "INNER/LEFT, Shared/sqldefs.h:74, SURVEY.md §2.3 'Not present': "
    "RIGHT/FULL OUTER). Thresholds chosen so BOTH sides have unmatched "
    "nation keys — the nullable sides are genuinely exercised. Pre-"
    "aggregating each side before the join keeps the outer join on "
    "already-reduced keys: at 100 TB the shuffle carries one row per "
    "nation, not per customer.",
    tags=("join", "beyond-parity"),
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = (
        t["customer"]
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9500.0))
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        t["supplier"]
        .filter(F.col("s_acctbal") > 5000.0)
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, c["k"] == s["k"], "full_outer")
        .select(
            F.coalesce(c["k"], s["k"]).alias("nation_key"),
            "n_cust",
            "n_supp",
        )
        .orderBy("nation_key")
    )


@query(
    "q30_pivot",
    """
    SELECT user_id % 10 AS user_bucket,
           COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS error,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS view
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    doc="PIVOT (beyond parity: no pivot in the reference's parser). Uses "
    "Spark's native pivot with an EXPLICIT value list — omitting it would "
    "add a driver-blocking distinct pass over 100 TB to discover columns, "
    "and make the output schema data-dependent. Pivot lowers to one "
    "hash-aggregate shuffle on the grouping key, same cost as the "
    "conditional-aggregation SQL the oracle runs.",
    tags=("aggregate", "beyond-parity"),
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir)["events"]
    types = ["click", "error", "purchase", "signup", "view"]
    piv = (
        events.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", types)
        .count()
    )
    return piv.select(
        "user_bucket",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in types],
    ).orderBy("user_bucket")


@query(
    "q31_market_basket",
    """
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
    doc="market-basket co-occurrence (beyond parity): part pairs bought in "
    "the same order, top pairs by support. The self-join keys on "
    "l_orderkey, so pair generation is bounded by per-order basket size "
    "(~O(k^2) for k items per order), never corpus-quadratic; the pair "
    "aggregate map-side combines before the shuffle",
    tags=("join", "beyond-parity", "analytics"),
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = t["lineitem"].select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = t["lineitem"].select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, (a["ok"] == b["ok"]) & (a["part_a"] < b["part_b"]))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(20)
    )


@query(
    "q32_correlated_agg_subquery",
    """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l1
    WHERE l_quantity < (
      SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l1.l_partkey
    )
    """,
    doc="correlated aggregate subquery (TPC-H Q17 shape): the per-part "
    "average is correlated on l_partkey. Catalyst decorrelates it into a "
    "per-part aggregate joined back — one keyed shuffle, never a "
    "per-row subquery loop (the reference would reject the correlation; "
    "beyond parity)",
    tags=("subquery", "beyond-parity"),
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    part_avg = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q33_lateral_topn",
    """
    SELECT n.n_name AS nation, t.c_name, ROUND(t.c_acctbal, 2) AS acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name
      LIMIT 2
    ) t
    ORDER BY nation, acctbal DESC, t.c_name
    """,
    doc="LATERAL correlated derived table (beyond parity; Spark 4 native "
    "LATERAL): top-2 customers per nation. Spark decorrelates the "
    "LATERAL limit into a keyed window — per-key top-n, no per-row "
    "re-execution",
    tags=("join", "beyond-parity"),
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, register=True)
    return spark.sql(
        """
        SELECT n.n_name AS nation, t.c_name, ROUND(t.c_acctbal, 2) AS acctbal
        FROM nation n, LATERAL (
          SELECT c_name, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name
          LIMIT 2
        ) t
        ORDER BY nation, acctbal DESC, t.c_name
        """
    )


@query(
    "q34_not_in_null_trap",
    """
    SELECT
      (SELECT COUNT(*) FROM customer
       WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation
                                 WHERE n_name = 'NO_SUCH_NATION'))
          AS not_in_empty,
      (SELECT COUNT(*) FROM customer
       WHERE c_nationkey NOT IN (SELECT CASE WHEN n_name = 'GERMANY'
                                             THEN NULL
                                             ELSE n_nationkey END
                                 FROM nation))
          AS not_in_with_null,
      (SELECT COUNT(*) FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM nation n
                         WHERE (CASE WHEN n.n_name = 'GERMANY' THEN NULL
                                     ELSE n.n_nationkey END) = c.c_nationkey
                           AND n.n_name <> 'GERMANY'))
          AS not_exists_with_null
    """,
    doc="the NOT IN null trap (3VL torture test): NOT IN over an empty "
    "subquery keeps every row; NOT IN over a subquery containing one NULL "
    "keeps NO rows (x <> NULL is UNKNOWN, so the conjunction can never be "
    "TRUE); the NOT EXISTS rewrite of the same predicate is null-immune: "
    "it keeps exactly the rows whose key matches NO non-German nation — "
    "i.e. only the German-keyed customers. Engines that rewrite NOT IN to "
    "anti join without the null guard get this wrong — both Spark (null-"
    "aware anti join) and DuckDB handle it, and the counts must agree",
    tags=("predicate", "3vl", "subquery"),
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, register=True)
    return spark.sql(
        """
        SELECT
          (SELECT COUNT(*) FROM customer
           WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation
                                     WHERE n_name = 'NO_SUCH_NATION'))
              AS not_in_empty,
          (SELECT COUNT(*) FROM customer
           WHERE c_nationkey NOT IN (SELECT CASE WHEN n_name = 'GERMANY'
                                                 THEN NULL
                                                 ELSE n_nationkey END
                                     FROM nation))
              AS not_in_with_null,
          (SELECT COUNT(*) FROM customer c
           WHERE NOT EXISTS (SELECT 1 FROM nation n
                             WHERE (CASE WHEN n.n_name = 'GERMANY' THEN NULL
                                         ELSE n.n_nationkey END) = c.c_nationkey
                               AND n.n_name <> 'GERMANY'))
              AS not_exists_with_null
        """
    )


@query(
    "q35_grouping_cube",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER)  AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER)  AS g_status,
           SUM(l_quantity)                          AS sum_qty,
           COUNT(*)                                 AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="CUBE (beyond parity, completing the grouping-sets family next to "
    "q27's ROLLUP): all four grouping combinations — (flag, status), "
    "per-flag, per-status, grand total — in ONE Expand+hash-agg pass; the "
    "per-status subtotal is the lattice cell ROLLUP can't produce. "
    "GROUPING() markers disambiguate expansion NULLs from data NULLs",
    tags=("agg", "beyond-parity"),
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy(
            "g_flag",
            "g_status",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
        .select(
            "l_returnflag", "l_linestatus", "g_flag", "g_status",
            "sum_qty", "n_rows",
        )
    )


@query(
    "q36_multiset_ops",
    """
    SELECT 'intersect_all' AS op, COUNT(*) AS n FROM (
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
      INTERSECT ALL
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O')
    UNION ALL
    SELECT 'except_all', COUNT(*) FROM (
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
      EXCEPT ALL
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O')
    ORDER BY op
    """,
    doc="multiset set operations (beyond parity, completing q26's family): "
    "INTERSECT ALL keeps min(count_left, count_right) copies of each "
    "value and EXCEPT ALL keeps max(0, left − right) — bag semantics the "
    "DISTINCT variants erase; both engines implement them natively and "
    "the cardinalities must agree exactly",
    tags=("setop", "beyond-parity"),
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    f = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    o = t["orders"].filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    ia = f.intersectAll(o).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect_all").alias("op"), "n"
    )
    ea = f.exceptAll(o).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except_all").alias("op"), "n"
    )
    return ia.unionByName(ea).orderBy("op")


@query(
    "q37_listagg",
    """
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
               AS priorities,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
    FROM orders
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="ordered string aggregation (LISTAGG ... WITHIN GROUP, new in "
    "Spark 4; DuckDB's string_agg ORDER BY is the oracle twin): "
    "the aggregate that turns a group into a stable composite key or a "
    "human-readable rollup (distinct order priorities per status). The "
    "WITHIN GROUP ordering makes the result "
    "partitioning-independent, which unordered collect_list/array_join "
    "is not",
    tags=("agg", "beyond-parity"),
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, register=True)
    # DISTINCT inside listagg trips a Spark 4.1 ClassCastException when the
    # optimizer rewires the aggregate's children (ListAgg.
    # withNewChildrenInternal casts the delimiter child to SortOrder), so
    # the distinct happens in a subquery and listagg stays plain
    return spark.sql(
        """
        SELECT o_orderstatus,
               listagg(o_orderpriority, ',')
                 WITHIN GROUP (ORDER BY o_orderpriority) AS priorities,
               CAST(COUNT(*) AS BIGINT) AS n_priorities
        FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders)
        GROUP BY o_orderstatus ORDER BY o_orderstatus
        """
    )


@query(
    "q38_qualify",
    """
    SELECT c.c_name, o.o_orderkey,
           ROUND(CAST(o.o_totalprice AS DOUBLE), 2) AS totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY o.o_custkey
      ORDER BY o.o_orderdate DESC, o.o_orderkey
    ) = 1
    ORDER BY c.c_name
    """,
    doc="QUALIFY-clause semantics (filter on a window function — the "
    "top-1-per-group idiom modern dialects ship as first-class syntax; "
    "DuckDB's native QUALIFY is the oracle): latest order per BUILDING "
    "customer, ROW_NUMBER ordered by (o_orderdate DESC, o_orderkey) so "
    "same-day ties break deterministically. Spark has no QUALIFY "
    "keyword; the engine lowers it to the equivalent window + filter, "
    "which Catalyst executes as one (o_custkey)-partitioned window after "
    "the join — no self-join, no argmax subquery",
    tags=("window", "dialect", "beyond-parity"),
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    joined = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_mktsegment") == "BUILDING")
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey")
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "c_name",
            "o_orderkey",
            F.round(F.col("o_totalprice").cast("double"), 2).alias("totalprice"),
        )
        .orderBy("c_name")
    )


@query(
    "q39_range_frames",
    """
    WITH daily AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             SUM(o_totalprice) AS day_rev
      FROM orders GROUP BY o_custkey, CAST(o_orderdate AS DATE)
    )
    SELECT o_custkey, d,
           ROUND(SUM(day_rev) OVER (
             PARTITION BY o_custkey ORDER BY d
             RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW
           ), 2) AS rev_7d
    FROM daily
    WHERE o_custkey < 100
    ORDER BY o_custkey, d
    """,
    doc="RANGE-frame window over event TIME (trailing 7-day revenue per "
    "customer): the frame is value-based — it spans a calendar window, "
    "not a row count, so gaps in the order history are handled "
    "correctly where a ROWS frame silently is not. Spark's rangeBetween "
    "is numeric-only, so the engine orders by epoch days with a "
    "[-6, 0] range — semantically identical to DuckDB's native "
    "RANGE BETWEEN INTERVAL frame, which is the oracle",
    tags=("window", "frames", "beyond-parity"),
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    daily = (
        t["orders"]
        .filter(F.col("o_custkey") < 100)
        .groupBy(
            "o_custkey", F.col("o_orderdate").cast("date").alias("d")
        )
        .agg(F.sum("o_totalprice").alias("day_rev"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-6, 0)
    )
    return (
        daily.select(
            "o_custkey",
            "d",
            F.round(F.sum("day_rev").over(w), 2).alias("rev_7d"),
        )
        .orderBy("o_custkey", "d")
    )


@query(
    "q40_percentile_within_group",
    """
    SELECT o_orderstatus,
           ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice), 2)
               AS median_price,
           ROUND(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY o_totalprice), 2)
               AS p90_price,
           ROUND(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY o_totalprice), 2)
               AS median_disc
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="ordered-set aggregates (PERCENTILE_CONT / PERCENTILE_DISC WITHIN "
    "GROUP): exact interpolated and discrete quantiles per group — the "
    "ANSI ordered-set syntax both engines now ship natively (Spark 3.4+ "
    "percentile_cont; DuckDB quantile family). Exact percentiles sort "
    "within each group, so at scale prefer approx_percentile "
    "(text_percentile_approx) unless the gate requires exactness",
    tags=("agg", "percentile", "beyond-parity"),
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, register=True)
    return spark.sql(
        """
        SELECT o_orderstatus,
               ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice), 2)
                   AS median_price,
               ROUND(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY o_totalprice), 2)
                   AS p90_price,
               ROUND(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY o_totalprice), 2)
                   AS median_disc
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


_PIVOT_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "q41_pivot",
    """
    SELECT o_orderstatus,
           COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS "1-URGENT",
           COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS "2-HIGH",
           COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
           COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED')
               AS "4-NOT SPECIFIED",
           COUNT(*) FILTER (o_orderpriority = '5-LOW') AS "5-LOW"
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="PIVOT surface (long → wide reshaping): order counts per status "
    "pivoted across the five priorities. The pivot values are declared "
    "explicitly — Spark's two-pass value discovery is a hidden extra job "
    "and non-deterministic column order at scale — so the plan is ONE "
    "hash aggregate with five conditional counts (what the oracle "
    "spells as COUNT(*) FILTER), never a per-value scan. Absent cells "
    "coalesce to 0 to match SQL's empty-count semantics",
    tags=("agg", "pivot", "beyond-parity"),
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    wide = (
        t["orders"]
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PIVOT_PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).cast("long").alias(p)
            for p in _PIVOT_PRIORITIES
        ],
    ).orderBy("o_orderstatus")


@query(
    "q42_recursive_cte",
    """
    WITH RECURSIVE chain(k, depth) AS (
      SELECT CAST(1 AS BIGINT) AS k, 0 AS depth
      UNION ALL
      SELECT c.c_custkey AS k, chain.depth + 1 AS depth
      FROM customer c JOIN chain ON (c.c_custkey >> 1) = chain.k
      WHERE c.c_custkey BETWEEN 2 AND 255
    )
    SELECT CAST(depth AS INTEGER) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           ROUND(SUM(c2.c_acctbal), 2) AS sum_acctbal
    FROM chain JOIN customer c2 ON c2.c_custkey = chain.k
    GROUP BY depth ORDER BY depth
    """,
    doc="recursive CTE (WITH RECURSIVE, new in Spark 4.0): transitive "
    "closure over a synthetic management chain (parent = custkey >> 1, "
    "a 255-node binary hierarchy) — per-depth node counts and balance "
    "rollup. Spark executes the fixpoint as iterated UnionLoop steps; "
    "each iteration is one distributed join of the frontier against the "
    "(filtered, pushed-down) customer scan, so depth-d closure costs d "
    "bounded joins, not a quadratic self-join — the same iterate-to-"
    "fixpoint shape as dedup_clusters_star, but expressed declaratively",
    tags=("recursive", "beyond-parity"),
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, register=True)
    return spark.sql(
        """
        WITH RECURSIVE chain(k, depth) AS (
          SELECT CAST(1 AS BIGINT) AS k, 0 AS depth
          UNION ALL
          SELECT c.c_custkey AS k, chain.depth + 1 AS depth
          FROM customer c JOIN chain ON shiftright(c.c_custkey, 1) = chain.k
          WHERE c.c_custkey BETWEEN 2 AND 255
        )
        SELECT CAST(depth AS INTEGER) AS depth,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               ROUND(SUM(c2.c_acctbal), 2) AS sum_acctbal
        FROM chain JOIN customer c2 ON c2.c_custkey = chain.k
        GROUP BY depth ORDER BY depth
        """
    )


@query(
    "q43_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority))
    ORDER BY g_status, g_prio,
             o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="explicit GROUPING SETS (the lattice CUBE and ROLLUP are sugar "
    "for): exactly three chosen groupings in ONE Expand+hash-agg pass, "
    "with GROUPING() markers disambiguating real NULLs from subtotal "
    "rows. Completes the grouping trio with q27 (ROLLUP) and q35 "
    "(CUBE); NULLS FIRST pinned on both engines because their default "
    "null sort order differs",
    tags=("agg", "grouping-sets", "beyond-parity"),
)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, register=True)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        ORDER BY g_status, g_prio,
                 o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@query(
    "q44_session_window",
    """
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    ),
    per_session AS (
      SELECT user_id, sid, COUNT(*) AS n_events,
             CAST(date_diff('microsecond', MIN(ts),
                            MAX(ts) + INTERVAL 30 MINUTE) AS BIGINT)
                 AS dur_us
      FROM s GROUP BY user_id, sid
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(dur_us) AS BIGINT) AS total_dur_us
    FROM per_session GROUP BY user_id ORDER BY user_id
    """,
    doc="NATIVE session windows (F.session_window, Spark's dynamic-gap "
    "session operator — one hash aggregate with session merge, no lag "
    "window pass) checked against the classical lag+cumsum derivation "
    "the oracle runs: per user, session count, event count, and total "
    "session duration (last event + 30-min gap, microsecond-exact "
    "integers). The batch twin of stream_session_window through a "
    "DIFFERENT operator than events_sessionize's window derivation — "
    "three independent implementations of one semantics, all agreeing",
    tags=("session", "window", "beyond-parity"),
)
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    t = load_tables(spark, sf_dir)
    # explicit LTZ cast: the session pins timestampType=TIMESTAMP_NTZ and
    # unix_micros rejects NTZ; the session timezone is UTC so the instant
    # is unchanged (same note as streaming/queries.py)
    ev = t["events"].select(
        "user_id", F.col("ts").cast(T.TimestampType()).alias("ts")
    )
    per_session = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return (
        per_session.select(
            "user_id",
            "n_events",
            (
                F.unix_micros(F.col("w.end")) - F.unix_micros(F.col("w.start"))
            ).alias("dur_us"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("dur_us").cast("long").alias("total_dur_us"),
        )
        .orderBy("user_id")
    )


@query(
    "q45_window_distinct_count",
    """
    SELECT user_id, event_id,
           CAST(COUNT(DISTINCT event_type)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS INTEGER) AS n_types_so_far
    FROM events
    ORDER BY user_id, ts, event_id
    """,
    doc="DISTINCT aggregate over a running window frame — per user, how "
    "many distinct event types have appeared up to each event. Spark "
    "has no native COUNT(DISTINCT) window function, so the engine "
    "re-expresses it as size(collect_set() OVER w) — per-frame state is "
    "bounded by the event-type alphabet (6 values), never the frame "
    "length, so the running set stays O(|alphabet|) per row at 100 TB. "
    "The oracle runs DuckDB's native windowed DISTINCT; (ts, event_id) "
    "ordering makes every frame prefix total-order deterministic",
    tags=("window", "distinct", "beyond-parity"),
)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t["events"]
        .select(
            "user_id",
            "event_id",
            F.size(F.collect_set("event_type").over(w)).alias("n_types_so_far"),
            "ts",
        )
        .orderBy("user_id", "ts", "event_id")
        .drop("ts")
    )


@query(
    "q46_ignore_nulls_fill",
    """
    SELECT user_id, event_id, event_type,
           LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS last_purchase_value
    FROM events
    ORDER BY user_id, ts, event_id
    """,
    doc="IGNORE NULLS window semantics as a forward-fill: each event "
    "carries the most recent purchase value of its user (NULL before "
    "the first purchase). Spark expresses it as F.last(col, "
    "ignorenulls=True) over a running frame, the oracle as DuckDB's "
    "LAST_VALUE(... IGNORE NULLS); values pass through untouched (no "
    "float arithmetic), so the comparison is bit-exact. The gap-fill "
    "primitive events_gap_fill builds on, exposed as a plain window "
    "surface entry",
    tags=("window", "ignore-nulls", "beyond-parity"),
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t["events"]
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.last(
                F.when(F.col("event_type") == "purchase", F.col("value")),
                ignorenulls=True,
            )
            .over(w)
            .alias("last_purchase_value"),
            "ts",
        )
        .orderBy("user_id", "ts", "event_id")
        .drop("ts")
    )


@query(
    "q47_unpivot",
    """
    WITH u AS (
      UNPIVOT (SELECT l_quantity, l_extendedprice, l_discount FROM lineitem)
      ON l_quantity, l_extendedprice, l_discount
      INTO NAME metric VALUE val
    )
    SELECT metric, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(CAST(round(val * 100) AS BIGINT)) / 100.0, 2) AS total
    FROM u GROUP BY metric ORDER BY metric
    """,
    doc="UNPIVOT (wide→long melt, the inverse of q30/q41's PIVOT): three "
    "lineitem measure columns melt into (metric, val) rows, then one "
    "aggregate per metric. Spark's native DataFrame.unpivot lowers to a "
    "single Expand node — one scan, rows×3 output, no join or union of "
    "three scans. Totals sum exact integer cents (doubles summed in "
    "shuffled order would diverge between engines), divided back once",
    tags=("surface", "unpivot", "beyond-parity"),
)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    u = t["lineitem"].unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "val",
    )
    return (
        u.groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.round(F.col("val") * 100).cast("long")) / 100.0, 2
            ).alias("total"),
        )
        .orderBy("metric")
    )
