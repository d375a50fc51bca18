"""Selection push-down with sketch feedback (COMPASS step 1).

For each base table of a join query, ascending by size (FilterPushDownSketch
.cpp:125-304 evaluateAndPushDown):

1. apply the table's own conjuncts;
2. run ONE distributed aggregation that both counts survivors and builds a
   Fast-AGMS sketch per join column (the kFAGMS_SKETCH pseudo-aggregate,
   RelAlgExecutor.cpp:1623);
3. if survivors ≤ min(max_selectivity·|T|, max_size) the filtered table is
   considered selective: it is cached (Spark's analog of the reference
   splicing the materialized filtered table into the DAG) and the final
   join chain reuses the cached scan. Otherwise only the sketch is kept
   and the filter stays a lazy predicate (the reference reverts the
   push-down, FilterPushDownSketch.cpp:273-284);
4. tables below min_table_rows skip filtering and reuse template sketches
   (sketch templates: Catalog.h:579 uploadSketches, sketch-templates/).

Thresholds mirror COMPASS_init_variables.txt:3-5 (200 rows / 5% / 10,000).
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from compass_query_optimizer_spark.plans.fagms import (
    Sketch,
    build_sketches,
    build_sketches_arrow,
    seeds_for_class,
)
from compass_query_optimizer_spark.plans.graph import JoinGraph
from compass_query_optimizer_spark.plans.search import TableStats


@dataclass
class PushdownConfig:
    min_table_rows: int = 200  # PUSH_DOWN_MIN_TABLE_SIZE_SK
    max_selectivity: float = 0.05  # PUSH_DOWN_MAX_SELECTIVITY_SK
    max_size: int = 10_000  # PUSH_DOWN_MAX_SIZE
    broadcast_rows: int = 1_000_000  # selective sides below this get a hint
    # Absolute anti-broadcast bar (round 9 at 1M raw rows; round 10
    # re-keyed on the COLLAPSED frame estimate — the cached key-NDV when
    # the collapse probe measured one, else the filtered row count — and
    # lowered to 300k by interleaved A/B): chain partners whose collapsed
    # estimate exceeds this carry a SHUFFLE_HASH pin, because AQE's
    # shuffle-bytes heuristic otherwise broadcast-converts the narrow
    # frame and the driver single-threadedly hash-builds it (~16.5 µs/row
    # measured: 5.76M rows = 95 s on JOB 17a at fixture scale 160; the
    # 400-720k frames of the 2-family = 20-30 s/query). Measured at 300k:
    # 2-family solo at scale 160 falls 76.9 → 22.5 s (2a 29.7→7.7) with
    # identical counts, and the full scale-10 corpus is unregressed
    # (79.2 s default vs 80.6 s, interleaved fresh-process pairs; the
    # contended pair favored 300k outright, 127.5 vs 103.8 s). In the
    # eager chain the prefix is already hash-partitioned by the previous
    # re-agg exchange, so a shuffled-hash join costs one ≤~1M-row partner
    # shuffle (often AQE-reusable) against a serial driver build that
    # scales with rows — past ~300k the trade never favors broadcast.
    # Env-overridable for A/B (SPARK_GRAFT_ANTIBROADCAST_ROWS).
    antibroadcast_rows: int = field(
        default_factory=lambda: int(
            os.environ.get("SPARK_GRAFT_ANTIBROADCAST_ROWS", "300000")
        )
    )
    # Relative anti-broadcast band (round 10; DEFAULT OFF since round 11):
    # pin SHUFFLE_HASH on a chain partner whose estimated collapsed size is
    # COMPARABLE to the prefix's sketch estimate (within this factor either
    # way) — the theory being that when the two sides are within 4× of each
    # other, neither broadcast direction is right. Round-10 measurement
    # showed the guard is a NO-OP on its intended target: the sketch
    # underestimates the 2-family prefix ~10× (est 53,345 vs 509,508
    # actual), so the band never fires where it was aimed, and the 2-family
    # was actually converted by re-keying the ABSOLUTE bar on the collapsed
    # estimate (above). A guard that trusts prefix estimates just shown to
    # be 10× off where it matters risks perf-only misfires at unintended
    # ratios, so it ships disabled — an opt-in A/B knob
    # (SPARK_GRAFT_BROADCAST_REL_FACTOR), same precedent as
    # SPARK_GRAFT_CORPUS_BROADCAST_CAP. The absolute collapsed-estimate bar
    # is the one default mechanism on the hint path.
    broadcast_relative_factor: float = field(
        default_factory=lambda: float(
            os.environ.get("SPARK_GRAFT_BROADCAST_REL_FACTOR", "0")
        )
    )
    broadcast_floor_rows: int = 100_000
    # Per-catalog collapse-frame artifact store (round 11; plans/
    # frame_store.py): an UNFILTERED chain partner whose collapsed-frame
    # estimate meets this bar is materialized ONCE per catalog as a
    # parquet table bucketed on its chain join key, and every later query
    # in the session reads the artifact — killing the repeated scan +
    # multi-million-row join-side Exchange that the round-10 profile
    # showed to be the entire scale-160 corpus frontier (the same 5.76M-
    # row cast_info frame re-assembled per query). 0 disables; env knob
    # for A/B (SPARK_GRAFT_FRAME_STORE_ROWS). Bar measured at scale 160
    # (round 11, warm-dispatched builds, 6-way corpus, fresh process per
    # arm): 500k bar = 109.6 s corpus wall — the mid-size (0.5-2M)
    # artifacts pin their joins to the 32-bucket layout where AQE's
    # runtime choices (coalesced exchanges, broadcast) were already
    # winning, costing +3-5 s on the 16/17/19 families and cancelling the
    # big-frame wins; 2M bar = 84.9 s / 0 DNF vs 105.6 s store-OFF (-20%,
    # measured from the WORSE box position), keeping exactly the
    # multi-million-row frames (cast_info 5.76M, movie_info 7.3M) whose
    # repeated Exchange was the measured frontier (6-family 12.1 -> 3.7 s
    # in-corpus). The bar is a frame-row threshold, so eligibility scales
    # with the catalog, not with this box.
    frame_store_min_rows: int = field(
        default_factory=lambda: int(
            os.environ.get("SPARK_GRAFT_FRAME_STORE_ROWS", "2000000")
        )
    )
    # Async-by-default artifact builds (round-11 measurement fix): the
    # synchronous build put a 5.76M-row bucketed write on the first
    # query's wall and DNF'd three corpus queries under the 90 s timeout
    # (12b/18a/19d at scale 160); async dispatches the write to its own
    # thread, the first query assembles inline, later queries read the
    # artifact. sync=True blocks on the build (tests; A/B knob).
    frame_store_sync: bool = field(
        default_factory=lambda: os.environ.get(
            "SPARK_GRAFT_FRAME_STORE_SYNC", "0"
        )
        == "1"
    )
    arrow_build: bool = True  # mapInPandas sketch build (vs JVM groupBy)
    parallel_tables: int = 8  # concurrent per-table sketch passes
    # eager COUNT(*) aggregation (optimizer.build_count_join): re-aggregate
    # the prefix after EVERY join (threshold 0). An estimate-based skip
    # ("don't pay the exchange on prefixes the sketch says are small") was
    # the round-5..7 default at 100k and was measured in round 8 to be
    # worthless at its best and catastrophic at its worst: the full corpus
    # at fixture scale 10 is 38.9 s vs 39.2 s (identical), while JOB 8c at
    # scale 80 is 92.4 s gated vs 7.8 s always — the zipf tail is exactly
    # where sketch estimates UNDERESTIMATE, so the gate skips the shrink
    # on the prefixes that explode (the same reason the estimate-based
    # eager on/off gate was rejected in round 6). Raise only with a
    # measured reason.
    eager_reagg_min_rows: float = 0.0
    # count_distinct_auto routing — the Spark twin of the reference's
    # plan-time approx↔precise switch (RelAlgExecutor.cpp:1350-1418) and
    # its CountDistinctDescriptor bitmap-vs-set choice. Integral measures
    # whose plan-time value range fits distinct_bitmap_max_range bits take
    # the exact packed-bitmap route (fixed 8·range/64 bytes per key);
    # otherwise NDV estimates up to distinct_exact_max_ndv take the exact
    # collect_set route (the final union row stays bounded); anything
    # bigger carries a constant-size HLL sketch instead — approximate,
    # but immune to the one-row set flatten that OOMs at 100 TB.
    distinct_bitmap_max_range: int = 4_096  # bits (64 words max per key)
    distinct_exact_max_ndv: int = 4_096  # plan-time NDV estimate cap
    # Eager-chain seed collapse skip: a fact table whose referenced-key
    # combinations are nearly distinct (cast_info's (movie, person, role)
    # is 99.6% unique at JOB scale 40) pays a full shuffle for a ~no-op
    # groupBy. When a cached plan-time NDV estimate of the key struct says
    # ndv ≥ ratio × rows, the seed skips the collapse and enters the chain
    # raw with multiplicity 1 — semantically identical (collapse is
    # idempotent; the first post-join re-aggregation shrinks anyway), one
    # big exchange cheaper. Tables at or below collapse_skip_min_rows
    # always collapse (the exchange is cheap and the NDV job isn't worth
    # scheduling).
    collapse_skip_ndv_ratio: float = 0.9
    collapse_skip_min_rows: int = 500_000
    # Structural re-agg deferral (round 9): skip the post-join re-agg
    # while ALL of a just-joined collapse-skipped alias's key columns
    # survive in the keep set — the groupBy provably cannot shrink below
    # that alias's matched-row count, so the hypothesis was that the
    # exchange is pure overhead. MEASURED FALSE, decisively: solo JOB at
    # fixture scale 160, deferral on vs off — 6f 171.7 s vs 3.5 s (49×),
    # 8c 46.5 s vs 25.8 s, identical counts. Row-count no-shrink is the
    # wrong cost model: the "useless" re-agg still (a) combines the
    # multiplicity columns map-side before the exchange, (b) gives AQE a
    # materialized stats point to re-plan the next join from, and (c)
    # bounds the sort input of the next sort-merge join. Third skip-the-
    # shrink idea to die by measurement (round-6 eager on/off gate,
    # round-8 estimate-gated re-agg, this). Knob stays for re-measurement.
    reagg_defer_raw_keys: bool = False


@dataclass
class PushdownResult:
    stats: dict[str, TableStats]
    frames: dict[str, DataFrame]  # alias -> (possibly cached) filtered frame
    materialized: set[str] = field(default_factory=set)  # aliases kept cached


# (dataset_tag, table, filter_sql, sorted class keys) -> (count, sketches);
# predicate-free
# tables of repeated queries reuse their sketches across plans, the analog of
# the reference's persisted sketch templates (round-trip to disk via
# plans/templates.py).
_TEMPLATE_CACHE: dict[tuple, tuple[int, dict[str, Sketch]]] = {}
_TEMPLATE_LOCK = threading.Lock()


def _template_lock() -> threading.Lock:
    return _TEMPLATE_LOCK


def clear_template_cache() -> None:
    with _TEMPLATE_LOCK:
        _TEMPLATE_CACHE.clear()


def run_pushdown(
    spark: SparkSession,
    graph: JoinGraph,
    base_tables: dict[str, DataFrame],
    base_counts: dict[str, int],
    config: PushdownConfig | None = None,
    dataset_tag: str | None = None,
) -> PushdownResult:
    """base_tables/base_counts are keyed by *alias* (self-joins get one
    entry per alias, sharing the underlying scan).

    ``dataset_tag`` identifies the catalog the tables came from (sf_dir,
    fixture version+scale, …) and keys the template cache; with no tag the
    cache is bypassed entirely — a table name alone is NOT a safe key when
    one process plans the same schema at several scales (scale-1 sketches
    silently reused for scale-2 would corrupt plan quality)."""
    config = config or PushdownConfig()
    spec = graph.spec
    stats: dict[str, TableStats] = {}
    frames: dict[str, DataFrame] = {}
    materialized: set[str] = set()

    def one_table(alias: str) -> tuple[str, int, dict[str, Sketch], DataFrame, bool]:
        base = base_tables[alias]
        filter_sql = spec.filters.get(alias)
        join_cols = graph.join_cols(alias)
        col_seeds = {c: seeds_for_class(graph.class_key(alias, c)) for c in join_cols}

        filtered = base.filter(filter_sql) if filter_sql else base
        tiny = base_counts[alias] < config.min_table_rows

        cache_key = (
            dataset_tag,
            spec.tables[alias],
            None if tiny else filter_sql,
            tuple(sorted((c, graph.class_key(alias, c)) for c in join_cols)),
        )
        if dataset_tag is None:
            cached = None
        else:
            with _TEMPLATE_LOCK:
                cached = _TEMPLATE_CACHE.get(cache_key)
        if cached is not None:
            count, sketches = cached
        else:
            # tiny tables skip the filter for sketching (template behavior)
            if config.arrow_build:
                count, sketches = build_sketches_arrow(
                    base if tiny else filtered,
                    col_seeds,
                    nrows_hint=base_counts[alias],
                )
            else:
                count, sketches = build_sketches(
                    base if tiny else filtered, col_seeds
                )
            if dataset_tag is not None:
                with _TEMPLATE_LOCK:
                    _TEMPLATE_CACHE[cache_key] = (count, sketches)

        selective = (
            filter_sql is not None
            and not tiny
            and count <= min(config.max_selectivity * base_counts[alias], config.max_size)
        )
        return alias, count, sketches, filtered, selective

    # the per-table passes are independent Spark jobs; run them concurrently
    # (the reference runs them ascending by size on one device — on a
    # cluster, concurrent small jobs overlap their scheduling latency)
    aliases = sorted(spec.tables, key=lambda a: base_counts[a])
    with ThreadPoolExecutor(max_workers=max(1, config.parallel_tables)) as pool:
        results = list(pool.map(one_table, aliases))

    for alias, count, sketches, filtered, selective in results:
        frames[alias] = filtered
        if selective:
            frames[alias] = filtered.cache()
            materialized.add(alias)
        stats[alias] = TableStats(rows=count, sketches=sketches)

    return PushdownResult(stats=stats, frames=frames, materialized=materialized)
