"""The reference's full validation surface: all 113 JOB queries
(queries/*.sql.sq.cnt — the corpus COMPASS was built and benchmarked on,
README.md:56-57) parsed, planned and executed against DuckDB goldens.

The driver correctness gate runs the complete corpus (plans/job_corpus.py
`job_corpus` entry); here we keep a fast representative subset green in
pytest plus structural checks over all 113, and the full sweep behind
SPARK_GRAFT_FULL_JOB=1.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from compass_query_optimizer_spark.fixtures import ensure_job_fixture
from compass_query_optimizer_spark.plans.graph import JoinGraph, parse_join_query
from compass_query_optimizer_spark.plans.job_corpus import (
    families,
    fixture_counts,
    job_oracle_sql,
    job_tables,
    load_corpus,
    run_corpus,
)


def test_corpus_loads_and_parses():
    corpus = load_corpus()
    assert len(corpus) == 113
    assert len(families()) == 33
    for qid, sql in corpus.items():
        assert "COUNT(*)" in sql.upper(), qid
        spec = parse_join_query(sql)
        g = JoinGraph(spec)
        # every JOB query is a connected equi-join graph with per-alias
        # filters only (no cross-alias residuals in this corpus)
        assert g.is_connected(), qid
        assert not spec.post_filters, qid
        assert len(spec.tables) >= 4, qid


def test_fixture_covers_every_filter():
    """Each corpus query selects ≥1 row on the fixture (the correlated
    'franchise cluster' guarantees non-trivial differential evidence —
    a query that returns 0 everywhere can't catch a join that loses rows)."""
    con = duckdb.connect()
    res = con.execute(job_oracle_sql()).fetchall()
    assert len(res) == 113
    zeros = [q for q, c in res if not c]
    assert zeros == [], f"queries with empty results on fixture: {zeros}"


@pytest.fixture(scope="module")
def oracle_counts():
    return {q: c for q, c in duckdb.connect().execute(job_oracle_sql()).fetchall()}


# one query per family keeps the pytest loop < ~40 s; the driver gate and
# SPARK_GRAFT_FULL_JOB=1 cover all 113
_SUBSET = [qs[0] for qs in families().values()]


def test_job_subset_matches_duckdb(spark, oracle_counts):
    got = dict(run_corpus(spark, mode="compass", query_ids=_SUBSET))
    bad = {q: (got[q], oracle_counts[q]) for q in _SUBSET if got[q] != oracle_counts[q]}
    assert not bad, f"COMPASS vs DuckDB mismatches: {bad}"


def test_fallback_mode_same_answers(spark, oracle_counts):
    """Join order must never change semantics: the size-descending
    fallback order returns identical counts on a sample."""
    sample = _SUBSET[::8]
    got = dict(run_corpus(spark, mode="fallback", query_ids=sample))
    assert got == {q: oracle_counts[q] for q in sample}


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FULL_JOB"),
    reason="full 113-query sweep (~2 min) — driver gate covers it; set SPARK_GRAFT_FULL_JOB=1",
)
def test_job_full_corpus(spark, oracle_counts):
    got = dict(run_corpus(spark, mode="compass"))
    bad = {q: (c, oracle_counts[q]) for q, c in got.items() if c != oracle_counts[q]}
    assert not bad


def test_fixture_counts_metadata_only():
    paths = ensure_job_fixture()
    counts = fixture_counts(paths)
    assert counts["cast_info"] >= 36000
    assert set(counts) == set(paths)


def test_eager_count_matches_plain_and_oracle(spark):
    """The eager-aggregation count plan (build_count_join) must compute the
    same COUNT(*) as the raw-join count and DuckDB for a corpus sample —
    the multiplicity algebra (SUM of per-key count products, re-aggregated
    onto surviving keys) is an exact rewrite, not an approximation. The
    sample includes residual-predicate and self-join queries."""
    import duckdb

    from compass_query_optimizer_spark.fixtures import ensure_job_fixture
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    corpus = load_corpus()
    sample = ["1a", "6a", "11b", "17a", "29a", "33c"]
    tables, counts = job_tables(spark, scale=1)
    paths = ensure_job_fixture(scale=1)
    con = duckdb.connect()
    for n, p in paths.items():
        con.execute(f"CREATE VIEW {n} AS SELECT * FROM '{p}'")
    opt = CompassOptimizer(spark)
    for qid in sample:
        eager = int(
            opt.execute_count(
                corpus[qid], tables=tables, counts=counts, eager=True,
                count_cache_tag="eager_gate_x1",
            ).collect()[0]["cnt"]
        )
        plain = int(
            opt.execute_count(
                corpus[qid], tables=tables, counts=counts, eager=False,
                count_cache_tag="eager_gate_x1",
            ).collect()[0]["cnt"]
        )
        want = con.execute(corpus[qid]).fetchone()[0]
        assert eager == plain == want, (qid, eager, plain, want)


def test_grouped_eager_count_matches_raw_join(spark):
    """Grouped eager counts must equal the raw-join GROUP BY, including
    when the re-aggregation step fires mid-chain (forced with
    eager_reagg_min_rows=0) — group columns must survive every shrink."""
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.pushdown import PushdownConfig
    from compass_query_optimizer_spark.plans.queries import GROUPED_COUNT_SQL

    sf = "/root/testdata/sf0.001"
    opt = CompassOptimizer(spark, config=PushdownConfig(eager_reagg_min_rows=0.0))
    eager = {
        r["n_name"]: r["cnt"]
        for r in opt.execute_count(
            GROUPED_COUNT_SQL, sf, group_by=[("n", "n_name")], eager=True
        ).collect()
    }
    plain = {
        r["n_name"]: r["cnt"]
        for r in opt.execute_count(
            GROUPED_COUNT_SQL, sf, group_by=[("n", "n_name")], eager=False
        ).collect()
    }
    assert eager and eager == plain

def test_compass_raw_mode_same_answers(spark, oracle_counts):
    """compass_raw (COMPASS order, eager-count algebra OFF — the bench
    A/B's attribution mode) counts the materialized join and must agree
    with the oracle on a sample."""
    sample = _SUBSET[::8]
    got = dict(run_corpus(spark, mode="compass_raw", query_ids=sample))
    assert got == {q: oracle_counts[q] for q in sample}


def test_eager_sum_matches_raw_join(spark):
    """The SUM generalization of the multiplicity algebra: eager
    SUM(measure) must equal the raw-join SUM to double precision, grouped
    and ungrouped, including when the mid-chain re-aggregation fires
    (forced with eager_reagg_min_rows=0). The measure column must never
    appear in any group key."""
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.pushdown import PushdownConfig
    from compass_query_optimizer_spark.plans.queries import GROUPED_COUNT_SQL

    sf = "/root/testdata/sf0.001"
    opt = CompassOptimizer(spark, config=PushdownConfig(eager_reagg_min_rows=0.0))
    measure = ("l", "l_extendedprice")

    e = opt.execute_count(
        GROUPED_COUNT_SQL, sf, measure=measure, eager=True
    ).collect()[0]
    p = opt.execute_count(
        GROUPED_COUNT_SQL, sf, measure=measure, eager=False
    ).collect()[0]
    assert e["cnt"] == p["cnt"] > 0
    assert abs(e["agg_val"] - p["agg_val"]) <= 1e-6 * abs(p["agg_val"])

    eg = {
        r["n_name"]: (r["agg_val"], r["cnt"])
        for r in opt.execute_count(
            GROUPED_COUNT_SQL, sf, group_by=[("n", "n_name")],
            measure=measure, eager=True,
        ).collect()
    }
    pg = {
        r["n_name"]: (r["agg_val"], r["cnt"])
        for r in opt.execute_count(
            GROUPED_COUNT_SQL, sf, group_by=[("n", "n_name")],
            measure=measure, eager=False,
        ).collect()
    }
    assert eg.keys() == pg.keys() and eg
    for k in eg:
        assert eg[k][1] == pg[k][1]
        assert abs(eg[k][0] - pg[k][0]) <= 1e-6 * abs(pg[k][0])


def test_eager_sum_empty_join_is_null(spark):
    """SQL SUM semantics over the empty join: agg_val NULL, cnt 0 —
    exactly what the plain plan and any SQL engine produce."""
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    sql = """
    SELECT COUNT(*) AS cnt
    FROM lineitem l, orders o
    WHERE l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'NO_SUCH'
    """
    row = CompassOptimizer(spark).execute_count(
        sql, "/root/testdata/sf0.001", measure=("l", "l_extendedprice"),
        eager=True,
    ).collect()[0]
    assert row["cnt"] == 0 and row["agg_val"] is None


def test_eager_minmax_matches_raw_join(spark):
    """Class-2 (duplicate-insensitive) measures: eager MIN/MAX must equal
    the raw-join extremes exactly — multiplicities must NOT scale them,
    including when the mid-chain re-aggregation fires."""
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.pushdown import PushdownConfig
    from compass_query_optimizer_spark.plans.queries import GROUPED_COUNT_SQL

    sf = "/root/testdata/sf0.001"
    opt = CompassOptimizer(spark, config=PushdownConfig(eager_reagg_min_rows=0.0))
    measure = ("l", "l_extendedprice")
    for op in ("min", "max"):
        e = opt.execute_count(
            GROUPED_COUNT_SQL, sf, measure=measure, measure_op=op, eager=True
        ).collect()[0]
        p = opt.execute_count(
            GROUPED_COUNT_SQL, sf, measure=measure, measure_op=op, eager=False
        ).collect()[0]
        # extremes pass through untouched — exact equality, no tolerance
        assert e["agg_val"] == p["agg_val"] and e["cnt"] == p["cnt"] > 0, op
        # grouped form: per-group extremes must also be exactly equal
        eg = {
            r["n_name"]: (r["agg_val"], r["cnt"])
            for r in opt.execute_count(
                GROUPED_COUNT_SQL, sf, group_by=[("n", "n_name")],
                measure=measure, measure_op=op, eager=True,
            ).collect()
        }
        pg = {
            r["n_name"]: (r["agg_val"], r["cnt"])
            for r in opt.execute_count(
                GROUPED_COUNT_SQL, sf, group_by=[("n", "n_name")],
                measure=measure, measure_op=op, eager=False,
            ).collect()
        }
        assert eg == pg and eg, op


def test_eager_sum_on_job_query(spark):
    """The measure algebra applies unchanged to the reference's own
    workload shape: SUM(t.id) through JOB 17a's 7-way zipf-skewed join
    must match DuckDB exactly (exact integers through the multiplicity
    chain). At fixture scale 10 this query's join product is ~4e7 rows —
    the regime where the raw plan was a DNF-class member — and the eager
    sum still answers in seconds (SCALE.md records the measurement)."""
    import duckdb

    from compass_query_optimizer_spark.fixtures import (
        FIXTURE_VERSION,
        ensure_job_fixture,
    )
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    sql = load_corpus()["17a"]
    tables, counts = job_tables(spark, scale=1)
    row = CompassOptimizer(spark).execute_count(
        sql, tables=tables, counts=counts, measure=("t", "id"),
        count_cache_tag=f"mini_imdb_v{FIXTURE_VERSION}_x1",
    ).collect()[0]
    con = duckdb.connect()
    for n, p in ensure_job_fixture(scale=1).items():
        con.execute(f"CREATE VIEW {n} AS SELECT * FROM '{p}'")
    want_sum, want_cnt = con.execute(
        sql.replace("COUNT(*)", "SUM(t.id), COUNT(*)", 1)
    ).fetchone()
    assert int(row["agg_val"]) == int(want_sum)
    assert int(row["cnt"]) == int(want_cnt)
