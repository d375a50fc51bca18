"""The reference's full benchmark workload: all 113 JOB queries through the
COMPASS planner, differentially checked against DuckDB.

The Join Order Benchmark is public (Leis et al., "How Good Are Query
Optimizers, Really?", PVLDB 9(3), 2015; github.com/gregrahn/
join-order-benchmark). The reference ships COUNT(*) variants of all 113
queries as its validation + benchmark corpus (queries/*.sql.sq.cnt,
README.md:56-57) and runs each through sketch push-down + join-order
search; ``job_queries.json`` vendors those public count-form texts so this
repo is standalone.

Execution model: the corpus runs over the deterministic mini-IMDB fixture
(fixtures.ensure_job_fixture — pyarrow-materialized parquet both engines
read byte-identically). Planning artifacts are shared across the corpus:
base cardinalities come from parquet footer metadata (zero Spark jobs) and
Fast-AGMS sketches hit the in-memory template cache keyed by
(table, filter, join-class) — the analog of the reference's persisted
sketch templates, which exist precisely because JOB re-plans the same
tables 113 times (Catalog/Catalog.h:579 uploadSketches).

The ``job_corpus`` registry entry is the correctness gate: one row per
query, COMPASS-planned Spark count vs DuckDB running the identical SQL
over the identical parquet.
"""

from __future__ import annotations

import json
import os
import re
import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession

from compass_query_optimizer_spark.fixtures import FIXTURE_VERSION, ensure_job_fixture
from compass_query_optimizer_spark.registry import query

_CORPUS_PATH = os.path.join(os.path.dirname(__file__), "job_queries.json")
_corpus_cache: dict[str, str] | None = None


def load_corpus() -> dict[str, str]:
    """query id ('1a'…'33c') -> COUNT(*) SQL text."""
    global _corpus_cache
    if _corpus_cache is None:
        with open(_CORPUS_PATH) as fh:
            _corpus_cache = json.load(fh)
    return _corpus_cache


def families() -> dict[str, list[str]]:
    """JOB family number -> its query ids ('1' -> ['1a','1b','1c','1d'])."""
    fams: dict[str, list[str]] = {}
    for qid in load_corpus():
        fams.setdefault(re.match(r"(\d+)", qid).group(1), []).append(qid)
    return {k: sorted(v) for k, v in sorted(fams.items(), key=lambda kv: int(kv[0]))}


def fixture_counts(paths: dict[str, str]) -> dict[str, int]:
    """Base cardinalities from parquet footers — no Spark jobs at all (the
    scan-free path a catalog would use for table-level stats)."""
    import pyarrow.parquet as pq

    return {n: pq.ParquetFile(p).metadata.num_rows for n, p in paths.items()}


def job_tables(spark: SparkSession, scale: int = 1) -> tuple[dict[str, DataFrame], dict[str, int]]:
    paths = ensure_job_fixture(scale=scale)
    tables = {n: spark.read.parquet(p) for n, p in paths.items()}
    return tables, fixture_counts(paths)


def run_corpus(
    spark: SparkSession,
    mode: str = "compass",
    query_ids: list[str] | None = None,
    scale: int = 1,
    max_workers: int = 6,
    tables: dict[str, DataFrame] | None = None,
    counts: dict[str, int] | None = None,
    per_query_timeout: float | None = None,
    with_timing: bool = False,
) -> list[tuple]:
    """Execute (a subset of) the corpus; returns sorted (query_id, cnt)
    pairs, or (query_id, cnt, wall_sec) triples when ``with_timing`` —
    the per-query rows make A/B regressions attributable query-by-query
    instead of only via mode totals.

    mode='compass'     — sketch-chosen join order (the engine's planner)
    mode='compass_raw' — same order, eager-aggregation COUNT disabled
                         (counts the materialized join) — isolates the
                         join-order win from the multiplicity-algebra win
    mode='fallback'    — size-descending order (MapD default heuristic),
                         same push-down, for A/B join-order comparisons
    mode='sparksql'    — plain spark.sql over the original text (Catalyst's
                         own plan; CBO reordering is off per session.py)

    ``per_query_timeout`` (seconds) cancels a query's Spark job group when
    it exceeds the budget and records its count as None (DNF). Unordered
    FROM lists through a reorder-free planner can go combinatorial —
    sparksql mode at fixture scale 10 has queries whose intermediate blows
    past 10^10 tuples, which is the pathology COMPASS exists to avoid; a
    wall-clock A/B has to survive measuring it.
    """
    import threading

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    corpus = load_corpus()
    ids = sorted(query_ids if query_ids is not None else corpus)
    cache_tag = None
    if tables is None or counts is None:
        tables, counts = job_tables(spark, scale=scale)
        # known catalog → tag the sketch/count caches with version+scale so
        # templates amortize across the 113 queries but never leak between
        # differently-scaled fixtures in one process
        cache_tag = f"mini_imdb_v{FIXTURE_VERSION}_x{scale}"

    if mode == "sparksql":
        for n, df in tables.items():
            df.createOrReplaceTempView(n)

        def run_one(qid: str) -> int:
            return int(spark.sql(corpus[qid]).collect()[0][0])

    elif mode in ("compass", "compass_raw", "fallback"):
        # SPARK_GRAFT_CORPUS_BROADCAST_CAP (bytes; default 0 = session
        # default) caps AUTO broadcasts for planner modes. Measured both
        # ways before defaulting OFF: an 8 MB cap is −21-27% on the
        # scale-160 tail (2a 28.9→21.0 s — the driver's single-threaded
        # HashedRelation build of 400-720k-row sides serializes the join)
        # but +92% on the full scale-10 corpus (63.8→122.4 s — the same
        # cap kills broadcasts that are the right call when the other
        # side is larger). A static byte threshold cannot be right at
        # both scales; the targeted fix for the pathological case lives
        # in build_count_join (raw-alias prefix SHUFFLE_HASH hint).
        cap = int(os.environ.get("SPARK_GRAFT_CORPUS_BROADCAST_CAP", "0"))
        if cap > 0:
            for _k in ("spark.sql.autoBroadcastJoinThreshold",
                       "spark.sql.adaptive.autoBroadcastJoinThreshold"):
                spark.conf.set(_k, str(cap))
        opt = CompassOptimizer(spark)

        def run_one(qid: str) -> int:
            df = opt.execute_count(
                corpus[qid],
                tables=tables,
                counts=counts,
                use_fallback=(mode == "fallback"),
                count_cache_tag=cache_tag,
                eager=False if mode == "compass_raw" else None,
            )
            return int(df.collect()[0]["cnt"])

    else:
        raise ValueError(f"unknown mode {mode!r}")

    def one(qid: str) -> tuple:
        t0 = time.perf_counter()

        def _ret(cnt: int | None) -> tuple:
            if with_timing:
                return qid, cnt, round(time.perf_counter() - t0, 2)
            return qid, cnt

        if per_query_timeout is None:
            return _ret(run_one(qid))
        # job-group cancellation: pinned-thread mode maps this Python
        # thread to one JVM thread, so the group tags only this query
        sc = spark.sparkContext
        group = f"corpus-{mode}-{qid}"
        sc.setJobGroup(group, f"JOB {qid} ({mode})", interruptOnCancel=True)
        timer = threading.Timer(
            per_query_timeout, lambda: sc.cancelJobGroup(group)
        )
        timer.start()
        try:
            return _ret(run_one(qid))
        except Exception:
            return _ret(None)  # cancelled (DNF) or failed under cancellation
        finally:
            timer.cancel()

    # concurrent Spark actions: each query is a small job chain; threads
    # overlap scheduling latency exactly like concurrent cluster clients
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return sorted(pool.map(one, ids))


def warm_corpus_templates(
    spark: SparkSession,
    scale: int = 1,
    max_workers: int = 6,
    query_ids: list[str] | None = None,
) -> list[tuple[str, float, float | None]]:
    """Plan (without executing) every corpus query so the tagged template
    cache holds each table's sketches — the analog of the reference
    pre-building its sketch-templates file. After warming, an A/B of
    compass vs fallback execution times measures JOIN-ORDER quality alone,
    not who paid the one-time sketch pass.

    Returns per-query plan quality for free: (query_id, chosen_cost,
    fallback_cost) — the Σ-of-estimated-intermediates metric the search
    minimizes, fallback_cost None when the search itself fell back.

    Warming also dispatches the per-catalog collapse-frame artifact
    builds (optimizer.dispatch_frame_builds) and drains them before
    returning: the artifacts are per-catalog constants exactly like the
    sketch templates, so the one-time cost belongs to the warm pass —
    the corpus then executes in steady state, reading finished bucketed
    artifacts instead of racing their writes (the scale-160 A/B measured
    that contention at +11 s on single queries)."""
    from compass_query_optimizer_spark.plans.frame_store import wait_for_builds
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    corpus = load_corpus()
    ids = sorted(query_ids if query_ids is not None else corpus)
    tables, counts = job_tables(spark, scale=scale)
    cache_tag = f"mini_imdb_v{FIXTURE_VERSION}_x{scale}"
    opt = CompassOptimizer(spark)

    def one(qid: str) -> tuple[str, float, float | None]:
        plan = opt.plan(
            corpus[qid], tables=tables, counts=counts, count_cache_tag=cache_tag
        )
        opt.dispatch_frame_builds(plan)
        return qid, plan.search.cost, plan.fallback_cost

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        out = sorted(pool.map(one, ids))
    wait_for_builds()
    return out


def job_oracle_sql() -> str:
    """One DuckDB statement covering the whole corpus: CTE views over the
    fixture parquet + one scalar-subquery COUNT per query."""
    paths = ensure_job_fixture()
    ctes = ",\n".join(
        f"{n} AS (SELECT * FROM read_parquet('{p}'))" for n, p in sorted(paths.items())
    )
    subs = "\nUNION ALL\n".join(
        f"SELECT '{qid}' AS query_id, ({sql}) AS cnt"
        for qid, sql in sorted(load_corpus().items())
    )
    return f"WITH {ctes}\nSELECT * FROM (\n{subs}\n) ORDER BY query_id"


@query(
    "job_corpus",
    job_oracle_sql,  # deferred: materializing the fixture at import would
    # make `import registry` write parquet and bake absolute paths
    doc="all 113 JOB queries (the reference's entire benchmark corpus, "
    "queries/*.sql.sq.cnt) planned by COMPASS sketch push-down + join-order "
    "search over the mini-IMDB fixture; oracle = DuckDB running the "
    "identical SQL on the identical parquet",
    tags=("compass", "join", "job", "corpus"),
)
def job_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = run_corpus(spark, mode="compass")
    return spark.createDataFrame(rows, "query_id string, cnt long").orderBy("query_id")
