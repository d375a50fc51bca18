"""Typed-fixture differential oracle + JOB-shaped join-order corpus.

Mirrors the reference's test strategy (SURVEY.md §5): ExecuteTest.cpp runs
every query against MapD and embedded SQLite and compares row-by-row with
float tolerance (SQLiteComparator, Tests/ExecuteTest.cpp:130-343); here the
same SQL runs on Spark and DuckDB over identical parquet. The JOB corpus
exercises the COMPASS optimizer on the query shapes it was built for
(queries/1a.sql.sq.cnt, 29a self-alias stress, sketch-template shape)."""

from __future__ import annotations

import math

import duckdb
import pytest

from compass_query_optimizer_spark.fixtures import (
    write_mini_imdb,
    write_typed_test,
)
from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer


# ----------------------------------------------------------- typed_test (A)
@pytest.fixture(scope="module")
def typed(spark, tmp_path_factory):
    path = write_typed_test(spark, str(tmp_path_factory.mktemp("typed")))
    spark.read.parquet(path).createOrReplaceTempView("typed_test")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW typed_test AS SELECT * FROM '{path}/*.parquet'")
    return con


def _cell_eq(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    try:
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) == math.isnan(fb)
        return math.isclose(fa, fb, rel_tol=1e-6, abs_tol=1e-9)
    except (TypeError, ValueError):
        return str(a) == str(b)


def c(spark, duck_con, sql: str, duck_sql: str | None = None):
    """The reference's `c(query, dt)` differential helper."""
    s = [tuple(r) for r in spark.sql(sql).collect()]
    d = [tuple(r) for r in duck_con.execute(duck_sql or sql).fetchall()]
    assert len(s) == len(d), f"row count {len(s)} != {len(d)} for {sql}"
    s_sorted = sorted(s, key=lambda r: tuple(str(x) for x in r))
    d_sorted = sorted(d, key=lambda r: tuple(str(x) for x in r))
    for rs, rd in zip(s_sorted, d_sorted):
        assert len(rs) == len(rd) and all(
            _cell_eq(a, b) for a, b in zip(rs, rd)
        ), f"row mismatch {rs} != {rd} for {sql}"


TYPED_QUERIES = [
    # aggregates over every numeric type, null skipping
    "SELECT COUNT(*) AS c, SUM(x) AS sx, AVG(y) AS ay, MIN(z) AS mz, MAX(t) AS mt FROM typed_test",
    "SELECT SUM(f) AS sf, AVG(ff) AS aff, MIN(fn) AS mfn, MAX(d) AS md, SUM(dn) AS sdn FROM typed_test",
    "SELECT COUNT(y) AS cy, COUNT(null_str) AS cn, COUNT(DISTINCT x) AS dx, COUNT(DISTINCT str) AS ds FROM typed_test",
    # group-by + having on strings with nulls
    "SELECT str, COUNT(*) AS c FROM typed_test GROUP BY str",
    "SELECT fixed_str, SUM(x) AS sx FROM typed_test GROUP BY fixed_str HAVING SUM(x) > 50",
    # filters per type
    "SELECT COUNT(*) AS c FROM typed_test WHERE x = 7 AND y BETWEEN 42 AND 43",
    "SELECT COUNT(*) AS c FROM typed_test WHERE b",
    "SELECT COUNT(*) AS c FROM typed_test WHERE z < 0 OR t >= 1002",
    "SELECT COUNT(*) AS c FROM typed_test WHERE fn IS NULL",
    "SELECT COUNT(*) AS c FROM typed_test WHERE o IS NOT NULL",
    "SELECT COUNT(*) AS c FROM typed_test WHERE str IN ('foo','baz')",
    "SELECT COUNT(*) AS c FROM typed_test WHERE str LIKE 'ba%' AND real_str LIKE '%_ba%'",
    "SELECT COUNT(*) AS c FROM typed_test WHERE u > 0 AND ofd < 0",
    "SELECT COUNT(*) AS c FROM typed_test WHERE ufq < ofq",
    # CASE / CAST
    "SELECT CASE WHEN x = 7 THEN 'seven' ELSE 'eight' END AS cw, COUNT(*) AS c FROM typed_test GROUP BY 1",
    "SELECT CAST(x AS DOUBLE) AS xd, CAST(dd AS DOUBLE) AS ddd FROM typed_test WHERE x = 8",
    # decimal arithmetic
    "SELECT SUM(dd) AS sdd, AVG(dd_notnull) AS add FROM typed_test",
    # date/time functions
    "SELECT EXTRACT(YEAR FROM m) AS y, EXTRACT(MONTH FROM m) AS mo, COUNT(*) AS c FROM typed_test GROUP BY 1, 2",
    "SELECT DATE_TRUNC('day', m) AS dt, COUNT(*) AS c FROM typed_test GROUP BY 1",
    "SELECT o, COUNT(*) AS c FROM typed_test GROUP BY o",
    # order by + limit/offset determinism
    "SELECT x, y, z FROM typed_test ORDER BY z, x, y LIMIT 5",
    "SELECT t, f FROM typed_test ORDER BY t DESC, f LIMIT 4 OFFSET 2",
    # arrays
    "SELECT element_at(arr_i32, 1) AS a0 FROM typed_test WHERE arr_i32 IS NOT NULL AND x = 7",
    "SELECT SUM(e) AS s FROM (SELECT EXPLODE(arr_i32) AS e FROM typed_test)",
]

DUCK_OVERRIDES = {
    # Spark [] is 0-based, element_at/DuckDB [] are 1-based
    "SELECT element_at(arr_i32, 1) AS a0 FROM typed_test WHERE arr_i32 IS NOT NULL AND x = 7":
        "SELECT arr_i32[1] AS a0 FROM typed_test WHERE arr_i32 IS NOT NULL AND x = 7",
    # Spark 1-based [] vs DuckDB 1-based [] agree; EXPLODE → UNNEST
    "SELECT SUM(e) AS s FROM (SELECT EXPLODE(arr_i32) AS e FROM typed_test)":
        "SELECT SUM(e) AS s FROM (SELECT UNNEST(arr_i32) AS e FROM typed_test)",
    # DuckDB date_trunc('day') yields DATE; Spark yields TIMESTAMP
    "SELECT DATE_TRUNC('day', m) AS dt, COUNT(*) AS c FROM typed_test GROUP BY 1":
        "SELECT CAST(DATE_TRUNC('day', m) AS TIMESTAMP) AS dt, COUNT(*) AS c "
        "FROM typed_test GROUP BY 1",
}


@pytest.mark.parametrize("sql", TYPED_QUERIES)
def test_typed_differential(spark, typed, sql):
    c(spark, typed, sql, DUCK_OVERRIDES.get(sql))


# ------------------------------------------------------------ mini_imdb (B)
JOB_1A = """
SELECT COUNT(*) AS cnt
FROM company_type ct, movie_companies mc, title t, movie_info_idx mi_idx, info_type it
WHERE ct.kind = 'production companies' AND it.info = 'top 250 rank'
  AND mc.note NOT LIKE '%(as Metro-Goldwyn-Mayer Pictures)%'
  AND (mc.note LIKE '%(co-production)%' OR mc.note LIKE '%(presents)%')
  AND ct.id = mc.company_type_id AND t.id = mc.movie_id
  AND t.id = mi_idx.movie_id AND mi_idx.info_type_id = it.id
"""

JOB_29A = """
SELECT COUNT(*) AS cnt
FROM cast_info ci, title t, name n, role_type rt, char_name chn,
     info_type it1, info_type it2, movie_info mi, person_info pi
WHERE ci.movie_id = t.id AND ci.person_id = n.id AND ci.role_id = rt.id
  AND ci.person_role_id = chn.id
  AND mi.movie_id = t.id AND mi.info_type_id = it1.id
  AND pi.person_id = n.id AND pi.info_type_id = it2.id
  AND it1.info = 'genres' AND it2.info = 'mini biography'
  AND ci.note LIKE '(voice%' AND n.gender = 'f'
  AND t.production_year BETWEEN 1980 AND 2010
"""

JOB_TEMPLATE = """
SELECT COUNT(*) AS cnt
FROM movie_companies mc, title t, movie_keyword mk, keyword k, company_name cn
WHERE mc.movie_id = t.id AND mk.movie_id = t.id
  AND mk.keyword_id = k.id AND mc.company_id = cn.id
"""

# 6a family: keyword + cast + gender, IN-list over keywords
JOB_6A = """
SELECT COUNT(*) AS cnt
FROM cast_info ci, keyword k, movie_keyword mk, name n, title t
WHERE k.keyword IN ('character-name-in-title', 'murder', 'hero')
  AND n.gender = 'm' AND t.production_year > 1990
  AND k.id = mk.keyword_id AND t.id = mk.movie_id AND t.id = ci.movie_id
  AND ci.person_id = n.id
"""

# 11-ish family: OR-chain country codes + company join + link tables
JOB_11 = """
SELECT COUNT(*) AS cnt
FROM company_name cn, company_type ct, movie_companies mc, movie_link ml,
     link_type lt, title t
WHERE (cn.country_code = '[us]' OR cn.country_code = '[de]')
  AND ct.kind = 'production companies'
  AND cn.id = mc.company_id AND ct.id = mc.company_type_id
  AND mc.movie_id = t.id AND ml.movie_id = t.id AND ml.link_type_id = lt.id
"""

# 13-ish family: ratings range + year BETWEEN over two fact tables
JOB_13 = """
SELECT COUNT(*) AS cnt
FROM movie_info_idx mii, info_type it, title t, kind_type kt, movie_info mi
WHERE it.info = 'rating' AND mii.info > '8.0'
  AND t.production_year BETWEEN 1960 AND 2005 AND kt.kind = 'movie'
  AND mii.info_type_id = it.id AND mii.movie_id = t.id
  AND t.kind_id = kt.id AND mi.movie_id = t.id
"""


@pytest.fixture(scope="module")
def imdb(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mini_imdb"))
    paths = write_mini_imdb(spark, d)
    tables = {n: spark.read.parquet(p) for n, p in paths.items()}
    con = duckdb.connect()
    for n, p in paths.items():
        con.execute(f"CREATE VIEW {n} AS SELECT * FROM '{p}/*.parquet'")
    return tables, con


@pytest.mark.parametrize(
    "sql",
    [JOB_1A, JOB_29A, JOB_TEMPLATE, JOB_6A, JOB_11, JOB_13],
    ids=["1a", "29a_self_alias", "template", "6a_inlist", "11_orchain", "13_ranges"],
)
def test_job_corpus_golden_counts(spark, imdb, sql):
    tables, con = imdb
    golden = con.execute(sql).fetchone()[0]
    # the differential only means something on a non-empty result: a filter
    # literal that misses the fixture entirely gives 0 == 0 for any plan
    assert golden > 0
    opt = CompassOptimizer(spark)
    got = opt.execute_count(sql, tables=tables).collect()[0]["cnt"]
    assert got == golden
    # plan-quality property: chosen order never costs more than the
    # size-descending fallback (BASELINE.md plan-quality metric)
    from compass_query_optimizer_spark.plans.search import fallback_order, order_cost

    plan = opt.plan(sql, tables=tables)
    if not plan.search.fallback:
        fb = fallback_order(plan.pushdown.stats)
        assert plan.search.cost <= order_cost(plan.graph, plan.pushdown.stats, fb) * 1.001
