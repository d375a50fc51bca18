"""COMPASS planner tests: parser/graph, sketch properties, distributed
build exactness, search quality, end-to-end semantics preservation.

Mirrors the reference's validation approach (SURVEY.md §5: property tests —
sketch estimate within error bounds; chosen order never worse than the
size-descending fallback)."""

from __future__ import annotations

import collections

import numpy as np
import pytest

from compass_query_optimizer_spark.plans.fagms import (
    SKETCH_BUCKETS,
    SKETCH_ROWS,
    Sketch,
    build_sketches,
    estimate_two_way,
    numpy_update,
    seeds_for_class,
)
from compass_query_optimizer_spark.plans.graph import JoinGraph, parse_join_query
from compass_query_optimizer_spark.plans.search import (
    TableStats,
    choose_join_order,
    fallback_order,
    order_cost,
)
from compass_query_optimizer_spark.workload import FLAGSHIP_SQL

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------- graph
def test_parse_flagship():
    spec = parse_join_query(FLAGSHIP_SQL)
    assert set(spec.tables) == {"region", "nation", "customer", "orders", "lineitem", "part"}
    assert len(spec.join_preds) == 5
    assert set(spec.filters) == {"region", "part", "customer", "orders"}
    assert not spec.post_filters
    g = JoinGraph(spec)
    assert g.is_connected()
    # custkey and o_custkey share one equality class → same seeds
    assert g.class_key("customer", "c_custkey") == g.class_key("orders", "o_custkey")


def test_parse_aliased_job_style():
    sql = """
    SELECT COUNT(*) FROM info_type AS it1, info_type AS it2, movie_info AS mi
    WHERE it1.id = mi.info_type_id AND it2.id = mi.movie_id
      AND it1.info = 'rating' AND mi.note LIKE '%x%'
    """
    spec = parse_join_query(sql)
    assert spec.tables == {"it1": "info_type", "it2": "info_type", "mi": "movie_info"}
    assert ("it1", "id", "mi", "info_type_id") in spec.join_preds
    assert spec.filters["it1"] == "info = 'rating'"
    assert "note LIKE '%x%'" in spec.filters["mi"]


def test_seed_sharing_is_deterministic():
    a = seeds_for_class("eq:x")
    b = seeds_for_class("eq:x")
    c = seeds_for_class("eq:y")
    assert np.array_equal(a.a, b.a) and np.array_equal(a.sv, b.sv)
    assert not np.array_equal(a.a, c.a)


# --------------------------------------------------------------------- sketch
def _true_join(k1, k2):
    c1, c2 = collections.Counter(k1.tolist()), collections.Counter(k2.tolist())
    return sum(v * c2.get(k, 0) for k, v in c1.items())


@pytest.mark.parametrize("dist", ["uniform", "skewed"])
def test_sketch_estimate_accuracy(dist):
    rng = np.random.default_rng(11)
    if dist == "uniform":
        k1 = rng.integers(0, 2000, 30000)
        k2 = rng.integers(0, 2000, 20000)
    else:  # zipf-ish skew: the case sketches exist for
        k1 = (rng.zipf(1.5, 30000) % 2000)
        k2 = (rng.zipf(1.5, 20000) % 2000)
    seeds = seeds_for_class("eq:acc")
    s1 = Sketch(np.zeros((SKETCH_ROWS, SKETCH_BUCKETS)), seeds)
    s2 = Sketch(np.zeros((SKETCH_ROWS, SKETCH_BUCKETS)), seeds)
    numpy_update(s1, k1)
    numpy_update(s2, k2)
    est, true = estimate_two_way(s1, s2), _true_join(k1, k2)
    assert true > 0
    assert abs(est - true) / true < 0.25, f"{dist}: est={est} true={true}"


def test_distributed_build_matches_numpy(spark):
    import pandas as pd

    rng = np.random.default_rng(3)
    keys = rng.integers(-100, 5000, 20000)  # include negatives
    df = spark.createDataFrame(pd.DataFrame({"k": keys}))
    seeds = {"k": seeds_for_class("eq:z")}
    cnt, sk = build_sketches(df, seeds)
    twin = Sketch(np.zeros((SKETCH_ROWS, SKETCH_BUCKETS)), seeds["k"])
    numpy_update(twin, keys)
    assert cnt == len(keys)
    assert np.array_equal(sk["k"].counters, twin.counters)


# --------------------------------------------------------------------- search
def _mini_graph():
    sql = """
    SELECT COUNT(*) FROM region, nation, customer, orders
    WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
      AND c_custkey = o_custkey
    """
    return JoinGraph(parse_join_query(sql))


def _stats_from_keys(graph, keysets):
    stats = {}
    for alias, cols in keysets.items():
        sketches = {}
        for col, keys in cols.items():
            s = Sketch(
                np.zeros((SKETCH_ROWS, SKETCH_BUCKETS)),
                seeds_for_class(graph.class_key(alias, col)),
            )
            numpy_update(s, np.asarray(keys))
            sketches[col] = s
        stats[alias] = TableStats(
            rows=len(next(iter(cols.values()))), sketches=sketches
        )
    return stats


def test_search_beats_or_ties_fallback():
    rng = np.random.default_rng(5)
    g = _mini_graph()
    stats = _stats_from_keys(
        g,
        {
            "region": {"r_regionkey": np.arange(5)},
            "nation": {
                "n_regionkey": rng.integers(0, 5, 25),
                "n_nationkey": np.arange(25),
            },
            "customer": {
                "c_nationkey": rng.integers(0, 25, 1500),
                "c_custkey": np.arange(1500),
            },
            "orders": {"o_custkey": rng.integers(0, 1500, 15000)},
        },
    )
    res = choose_join_order(g, stats, budget=100)
    assert not res.fallback
    assert sorted(res.order) == sorted(g.spec.tables)
    fb_cost = order_cost(g, stats, fallback_order(stats))
    assert res.cost <= fb_cost + 1e-9
    # connectivity: each prefix joins something already present
    seen = {res.order[0]}
    for a in res.order[1:]:
        assert any(b in seen for (b, _, _) in g.adj[a]), "cartesian prefix"
        seen.add(a)


def test_search_budget_respected():
    g = _mini_graph()
    stats = _stats_from_keys(
        g,
        {
            "region": {"r_regionkey": np.arange(5)},
            "nation": {
                "n_regionkey": np.arange(25) % 5,
                "n_nationkey": np.arange(25),
            },
            "customer": {
                "c_nationkey": np.arange(100) % 25,
                "c_custkey": np.arange(100),
            },
            "orders": {"o_custkey": np.arange(300) % 100},
        },
    )
    res = choose_join_order(g, stats, budget=3)
    assert res.expansions <= 3 or res.fallback


# ----------------------------------------------------------------- end-to-end
def test_compass_preserves_semantics(spark):
    from compass_query_optimizer_spark.catalog import load_tables
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    opt = CompassOptimizer(spark)
    got = opt.execute_count(FLAGSHIP_SQL, SF).collect()[0].cnt
    load_tables(spark, SF)
    want = spark.sql(FLAGSHIP_SQL).collect()[0].cnt
    assert got == want


def test_compass_plan_shape(spark):
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    plan = CompassOptimizer(spark).plan(FLAGSHIP_SQL, SF)
    assert not plan.search.fallback
    assert plan.fallback_cost is not None
    assert plan.search.cost <= plan.fallback_cost + 1e-9
    # the filtered selective tables should be the string-predicate dims
    assert plan.pushdown.stats["lineitem"].rows > 0


def test_explain_report(spark):
    """EXPLAIN analog: the report must show the chosen order, per-table
    push-down outcomes, prefix estimates, and (with physical=True) Spark's
    formatted physical plan."""
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    opt = CompassOptimizer(spark)
    plan = opt.plan(FLAGSHIP_SQL, SF)
    txt = opt.explain(plan)
    assert "COMPASS plan:" in txt and " ⋈ " in txt
    assert "mode=sketch search" in txt
    assert "fallback_cost=" in txt
    for alias in plan.search.order:
        assert f"{alias} (" in txt
    assert "prefix size estimates" in txt

    full = opt.explain(plan, physical=True)
    assert "spark physical plan:" in full
    assert "== Physical Plan ==" in full

    # the eager count plan pre-aggregates every table before joining:
    # its physical dump must show per-table partial aggregates (the
    # multiplicity collapse), which the row-producing join has none of
    cnt = opt.explain(plan, physical=True, count=True)
    assert "== Physical Plan ==" in cnt
    assert cnt.count("HashAggregate") > full.count("HashAggregate")
    assert "eager aggregation: count(*) via multiplicity chain" in cnt

    # the measure-op variants are inspectable through the same surface
    # (round-6 verdict #3: the algebra claim must be EXPLAIN-visible)
    m = opt.explain(
        plan, count=True, measure=("lineitem", "l_extendedprice"),
        measure_op="sum", group_by=[("orders", "o_orderstatus")],
    )
    assert "eager aggregation: sum(lineitem.l_extendedprice) + count(*)" in m
    assert "group by orders.o_orderstatus" in m
    mcd = opt.explain(
        plan, physical=True, count=True,
        measure=("lineitem", "l_extendedprice"), measure_op="count_distinct",
    )
    assert "count_distinct(lineitem.l_extendedprice)" in mcd
    # the set-valued chain really is in the physical plan (collect_set
    # partials on the measure table)
    assert "collect_set" in mcd


def test_distinct_auto_route_flips_at_thresholds(spark):
    """count_distinct_auto resolves per the reference's plan-time switch
    (RelAlgExecutor.cpp:1350-1418 / CountDistinctDescriptor): dense ints
    within the bitmap cap -> bitmap; NDV within the exact cap -> set;
    else HLL. The SAME measure column flips route as the caps move."""
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.pushdown import PushdownConfig
    from compass_query_optimizer_spark.plans.queries import GROUPED_COUNT_SQL

    def route(cfg, measure):
        opt = CompassOptimizer(spark, config=cfg)
        plan = opt.plan(GROUPED_COUNT_SQL, SF)
        op, _ = opt._resolve_distinct_route(plan, measure, "count_distinct_auto")
        assert plan.extras["distinct_route"]["route"] == op
        return op

    m = ("c", "c_custkey")  # integral, range ~1.5k, NDV ~1.5k at sf0.001
    # wide bitmap cap: dense int fits -> bitmap
    assert route(PushdownConfig(distinct_bitmap_max_range=1 << 20), m) == (
        "count_distinct_bitmap"
    )
    # bitmap ruled out, exact cap generous -> exact collect_set
    assert route(
        PushdownConfig(distinct_bitmap_max_range=8, distinct_exact_max_ndv=10**9), m
    ) == "count_distinct"
    # both caps tiny -> the constant-size sketch carrier
    assert route(
        PushdownConfig(distinct_bitmap_max_range=8, distinct_exact_max_ndv=8), m
    ) == "count_distinct_hll"
    # a string measure can never take the bitmap route, no matter how
    # wide the cap — auto falls through to the NDV decision (the o frame
    # is filtered to o_orderstatus='F', NDV 1, so cap 0 forces HLL)
    s = ("o", "o_orderstatus")
    assert route(
        PushdownConfig(distinct_bitmap_max_range=1 << 20, distinct_exact_max_ndv=0), s
    ) == "count_distinct_hll"


def test_distinct_routes_agree_on_the_answer(spark):
    """All three carriers answer the same COUNT(DISTINCT) on a bounded
    measure — bitmap and set exactly, HLL within its 3-rsd band — and the
    explicit bitmap request on a non-bitmappable measure fails loudly."""
    import pytest

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.queries import GROUPED_COUNT_SQL

    opt = CompassOptimizer(spark)
    plan = opt.plan(GROUPED_COUNT_SQL, SF)
    m = ("c", "c_nationkey")
    vals = {}
    for op in ("count_distinct", "count_distinct_bitmap", "count_distinct_hll"):
        vals[op] = opt.build_count_join(plan, measure=m, measure_op=op).collect()[
            0
        ]["agg_val"]
    assert vals["count_distinct_bitmap"] == vals["count_distinct"]
    rsd = 1.04 / (2**12) ** 0.5
    assert abs(vals["count_distinct_hll"] - vals["count_distinct"]) <= (
        3 * rsd * vals["count_distinct"]
    )
    # grouped bitmap: per-nation distinct nationkey is exactly 1
    grouped = opt.build_count_join(
        plan, group_by=[("n", "n_name")], measure=m,
        measure_op="count_distinct_bitmap",
    ).collect()
    assert len(grouped) == 25 and all(r["agg_val"] == 1 for r in grouped)
    with pytest.raises(ValueError, match="bitmap"):
        opt.build_count_join(
            plan, measure=("o", "o_orderstatus"),
            measure_op="count_distinct_bitmap",
        )


def test_distinct_route_explain_surface(spark):
    """The routing decision is EXPLAIN-visible (the round-6/7 rule: every
    algebra claim must be inspectable)."""
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.queries import GROUPED_COUNT_SQL

    opt = CompassOptimizer(spark)
    plan = opt.plan(GROUPED_COUNT_SQL, SF)
    txt = opt.explain(
        plan, count=True, measure=("c", "c_nationkey"),
        measure_op="count_distinct_auto",
    )
    assert "count-distinct route: count_distinct_bitmap" in txt
    assert "ndv≈" in txt and "range=[0, 24]" in txt
    # and the bitmap chain is real in the physical plan: bit_or partials
    phys = opt.explain(
        plan, physical=True, count=True, measure=("c", "c_nationkey"),
        measure_op="count_distinct_bitmap",
    )
    assert "bit_or" in phys and "collect_set" not in phys


def test_left_outer_eager_matches_raw_join(spark):
    """The null-extension multiplicity algebra (coalesce(cnt,1); NULL
    measures skipped) must reproduce the raw LEFT JOIN's COUNT(*) and SUM
    exactly — including the unmatched rows the sf0.001 fixture contains."""
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.queries import LEFT_OUTER_SQL

    opt = CompassOptimizer(spark)
    eager = opt.execute_count(
        LEFT_OUTER_SQL, SF, measure=("o", "o_totalprice"), outer={"o"}
    ).collect()[0]
    raw = opt.execute_count(
        LEFT_OUTER_SQL, SF, measure=("o", "o_totalprice"), outer={"o"},
        eager=False,
    ).collect()[0]
    assert eager["cnt"] == raw["cnt"] > 0
    assert abs(float(eager["agg_val"]) - float(raw["agg_val"])) < 1e-6
    # the fixture must exercise null extension: COUNT(*) of the outer join
    # strictly exceeds the matched-only inner count
    inner = opt.execute_count(
        LEFT_OUTER_SQL, SF, measure=("o", "o_totalprice")
    ).collect()[0]
    assert eager["cnt"] > 0 and inner["cnt"] != eager["cnt"]


def test_left_outer_grouped_eager_matches_raw(spark):
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.queries import LEFT_OUTER_SQL

    opt = CompassOptimizer(spark)
    eager = {
        r["n_name"]: r["cnt"]
        for r in opt.execute_count(
            LEFT_OUTER_SQL, SF, group_by=[("n", "n_name")], outer={"o"}
        ).collect()
    }
    raw = {
        r["n_name"]: r["cnt"]
        for r in opt.execute_count(
            LEFT_OUTER_SQL, SF, group_by=[("n", "n_name")], outer={"o"},
            eager=False,
        ).collect()
    }
    assert eager == raw and len(eager) > 0


def test_left_outer_validation_errors(spark):
    """Outer aliases joining each other, or leaving no inner prefix, must
    fail loudly at plan time — a silent wrong order would corrupt counts."""
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.queries import LEFT_OUTER_SQL

    opt = CompassOptimizer(spark)
    with pytest.raises(ValueError, match="non-outer"):
        opt.plan(LEFT_OUTER_SQL, SF, outer={"c", "o"})
    with pytest.raises(ValueError, match="inner prefix"):
        opt.plan(LEFT_OUTER_SQL, SF, outer={"c", "o", "n"})


def test_left_outer_inner_measure_scales_by_coalesced_multiplicity(spark):
    """A measure on an INNER table below a LEFT OUTER join: unmatched
    prefix rows keep their running sum × 1 (coalesce(cnt, 1)), matched
    rows scale by the outer multiplicity — SUM(c.c_acctbal) over the
    outer join, exactly."""
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.queries import LEFT_OUTER_SQL

    opt = CompassOptimizer(spark)
    eager = opt.execute_count(
        LEFT_OUTER_SQL, SF, measure=("c", "c_acctbal"), outer={"o"}
    ).collect()[0]
    raw = opt.execute_count(
        LEFT_OUTER_SQL, SF, measure=("c", "c_acctbal"), outer={"o"},
        eager=False,
    ).collect()[0]
    assert eager["cnt"] == raw["cnt"] > 0
    assert abs(float(eager["agg_val"]) - float(raw["agg_val"])) < 1e-4


def test_left_outer_count_distinct_skips_null_extension(spark):
    """COUNT(DISTINCT o.col) below the outer join: null-extended rows
    contribute no value (SQL's rule), which the set carrier honors
    because collect_list drops the NULL arrays unmatched rows carry."""
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.queries import LEFT_OUTER_SQL

    opt = CompassOptimizer(spark)
    eager = opt.execute_count(
        LEFT_OUTER_SQL, SF, measure=("o", "o_orderpriority"),
        measure_op="count_distinct", outer={"o"},
    ).collect()[0]
    raw = opt.execute_count(
        LEFT_OUTER_SQL, SF, measure=("o", "o_orderpriority"),
        measure_op="count_distinct", outer={"o"}, eager=False,
    ).collect()[0]
    assert eager["agg_val"] == raw["agg_val"] > 0
    assert eager["cnt"] == raw["cnt"]


def test_multi_measure_eager_matches_raw(spark):
    """All channels of a multi-measure chain must agree with the raw join
    — and with the single-measure chains they replace."""
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.queries import GROUPED_COUNT_SQL

    opt = CompassOptimizer(spark)
    ms = [
        ("l", "l_extendedprice", "sum"),
        ("l", "l_extendedprice", "min"),
        ("l", "l_extendedprice", "max"),
    ]
    eager = opt.execute_count(GROUPED_COUNT_SQL, SF, measures=ms).collect()[0]
    raw = opt.execute_count(
        GROUPED_COUNT_SQL, SF, measures=ms, eager=False
    ).collect()[0]
    assert eager["cnt"] == raw["cnt"] > 0
    for i in range(3):
        assert abs(
            float(eager[f"agg_val{i}"]) - float(raw[f"agg_val{i}"])
        ) < 1e-4
    single = opt.execute_count(
        GROUPED_COUNT_SQL, SF, measure=("l", "l_extendedprice")
    ).collect()[0]
    assert abs(float(eager["agg_val0"]) - float(single["agg_val"])) < 1e-4


def test_multi_measure_rejects_routed_carriers(spark):
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.queries import GROUPED_COUNT_SQL

    opt = CompassOptimizer(spark)
    with pytest.raises(ValueError, match="single-measure"):
        opt.execute_count(
            GROUPED_COUNT_SQL,
            SF,
            measures=[("l", "l_extendedprice", "count_distinct_auto")],
        )


def test_multi_measure_below_left_outer(spark):
    """Multi-measure channels and null-extension multiplicity compose:
    SUM + MIN + MAX of the outer side below the LEFT OUTER join, each
    channel skipping the NULLs null-extension produces."""
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.queries import LEFT_OUTER_SQL

    opt = CompassOptimizer(spark)
    ms = [
        ("o", "o_totalprice", "sum"),
        ("o", "o_totalprice", "min"),
        ("o", "o_totalprice", "max"),
    ]
    eager = opt.execute_count(
        LEFT_OUTER_SQL, SF, measures=ms, outer={"o"}
    ).collect()[0]
    raw = opt.execute_count(
        LEFT_OUTER_SQL, SF, measures=ms, outer={"o"}, eager=False
    ).collect()[0]
    assert eager["cnt"] == raw["cnt"] > 0
    for i in range(3):
        assert abs(
            float(eager[f"agg_val{i}"]) - float(raw[f"agg_val{i}"])
        ) < 1e-4


def test_count_measure_op_matches_raw_and_scales(spark):
    """COUNT(col) as a class-1 rider: per-key non-null counts scale by
    partner multiplicity exactly like SUM — including below the outer
    join, where COUNT(col) < COUNT(*) whenever unmatched rows exist."""
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.queries import (
        GROUPED_COUNT_SQL,
        LEFT_OUTER_SQL,
    )

    opt = CompassOptimizer(spark)
    # inner: COUNT(col) == COUNT(*) when the column is never null
    eager = opt.execute_count(
        GROUPED_COUNT_SQL, SF, measure=("l", "l_extendedprice"),
        measure_op="count",
    ).collect()[0]
    raw = opt.execute_count(
        GROUPED_COUNT_SQL, SF, measure=("l", "l_extendedprice"),
        measure_op="count", eager=False,
    ).collect()[0]
    assert eager["agg_val"] == raw["agg_val"] == eager["cnt"] > 0
    # outer: COUNT(col) counts only matched rows, COUNT(*) counts all
    outer = opt.execute_count(
        LEFT_OUTER_SQL, SF, measure=("o", "o_totalprice"),
        measure_op="count", outer={"o"},
    ).collect()[0]
    outer_raw = opt.execute_count(
        LEFT_OUTER_SQL, SF, measure=("o", "o_totalprice"),
        measure_op="count", outer={"o"}, eager=False,
    ).collect()[0]
    assert outer["agg_val"] == outer_raw["agg_val"]
    assert outer["agg_val"] < outer["cnt"]


def test_explain_reports_outer_and_multi_measure(spark):
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.queries import LEFT_OUTER_SQL

    opt = CompassOptimizer(spark)
    plan = opt.plan(LEFT_OUTER_SQL, SF, outer={"o"})
    rpt = opt.explain(
        plan,
        count=True,
        measures=[("o", "o_totalprice", "sum"), ("o", "o_totalprice", "count")],
    )
    assert "⟕ o" in rpt  # the outer alias is marked in the order line
    assert "null-extend at the chain tail" in rpt
    assert "sum(o.o_totalprice) + count(o.o_totalprice)" in rpt
    assert "one chain, one channel per measure" in rpt


def test_cross_table_measures_eager_matches_raw(spark):
    """Measures owned by different aliases: each seeds on its own table's
    collapse; the sum scales by the OTHER measure table's multiplicity
    too, the extreme never scales."""
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.queries import GROUPED_COUNT_SQL

    opt = CompassOptimizer(spark)
    ms = [("l", "l_extendedprice", "sum"), ("o", "o_totalprice", "min")]
    eager = opt.execute_count(GROUPED_COUNT_SQL, SF, measures=ms).collect()[0]
    raw = opt.execute_count(
        GROUPED_COUNT_SQL, SF, measures=ms, eager=False
    ).collect()[0]
    assert eager["cnt"] == raw["cnt"] > 0
    assert abs(float(eager["agg_val0"]) - float(raw["agg_val0"])) < 1e-4
    assert abs(float(eager["agg_val1"]) - float(raw["agg_val1"])) < 1e-6


def test_collapse_skip_gates_on_ndv_and_size(spark):
    """The seed-collapse skip must (a) fire only above the size floor,
    (b) fire only for near-distinct keys, (c) never fire on filtered
    tables, and (d) leave the answer unchanged when forced on."""
    from compass_query_optimizer_spark.plans.job_corpus import job_tables, load_corpus
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.pushdown import PushdownConfig

    corpus = load_corpus()
    tables, counts = job_tables(spark, scale=1)
    # force the probe by dropping the size floor: cast_info's keys are
    # near-distinct at every scale, so the skip fires
    opt = CompassOptimizer(spark, config=PushdownConfig(collapse_skip_min_rows=1))
    plan = opt.plan(corpus["8c"], tables=tables, counts=counts)
    skipped = opt.build_count_join(plan)  # builds lazily; probes run now
    info = plan.extras.get("collapse_skipped", {})
    assert info.get("ci", {}).get("skip") is True
    # filtered aliases (rt, cn) must never be probed
    assert "rt" not in info and "cn" not in info
    forced = skipped.collect()[0]["cnt"]
    # default config: floor keeps the probe off at scale 1 — same answer
    base = CompassOptimizer(spark).execute_count(
        corpus["8c"], tables=tables, counts=counts
    ).collect()[0]["cnt"]
    assert forced == base > 0


def test_reagg_deferred_while_raw_alias_keys_survive(spark):
    """The structural re-agg deferral is DEFAULT-OFF (measured 49× worse
    on JOB 6f at scale 160 — see PushdownConfig.reagg_defer_raw_keys),
    but the knob must stay correct for re-measurement: forced on, it
    must (a) record the deferral, (b) leave the answer unchanged vs the
    default plan."""
    from compass_query_optimizer_spark.plans.job_corpus import job_tables, load_corpus
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.pushdown import PushdownConfig

    corpus = load_corpus()
    tables, counts = job_tables(spark, scale=1)
    # 17a: ci carries (person_id, movie_id); after ci joins, person_id is
    # still needed by n and movie_id by t — both keys survive, so the
    # deferral must fire. Size floor dropped so the skip probe runs at
    # test scale, and the ndv ratio lowered to 0.85 because the scale-1
    # fixture's ci pair is 89.2% distinct (at scale 40+ it is 94-99.6%)
    opt = CompassOptimizer(
        spark,
        config=PushdownConfig(
            collapse_skip_min_rows=1,
            collapse_skip_ndv_ratio=0.85,
            reagg_defer_raw_keys=True,
        ),
    )
    plan = opt.plan(corpus["17a"], tables=tables, counts=counts)
    deferred = opt.build_count_join(plan)
    assert plan.extras.get("collapse_skipped", {}).get("ci", {}).get("skip")
    assert "ci" in plan.extras.get("reagg_deferred", []), plan.extras
    forced = deferred.collect()[0]["cnt"]
    base = CompassOptimizer(spark).execute_count(
        corpus["17a"], tables=tables, counts=counts
    ).collect()[0]["cnt"]
    assert forced == base > 0


def test_raw_alias_prefix_pins_shuffle_hash_joins(spark):
    """While a collapse-skipped alias's full key set still rides the
    prefix, the chain hints SHUFFLE_HASH on the prefix side — AQE's
    shuffle-bytes heuristic otherwise converts the next join to broadcast
    and single-threads a multi-million-row HashedRelation build on the
    driver (JOB 8c at fixture scale 160: 27.3 s → 6.4 s solo). At test
    scale the floor is dropped so the skip fires; the trace must show the
    raw alias live exactly until its keys drop out of keep, and the
    answer must match the default plan."""
    from compass_query_optimizer_spark.plans.job_corpus import job_tables, load_corpus
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.pushdown import PushdownConfig

    corpus = load_corpus()
    tables, counts = job_tables(spark, scale=1)
    opt = CompassOptimizer(
        spark, config=PushdownConfig(collapse_skip_min_rows=1)
    )
    plan = opt.plan(corpus["8c"], tables=tables, counts=counts)
    df = opt.build_count_join(plan)
    skips = {
        a: i["skip"] for a, i in plan.extras.get("collapse_skipped", {}).items()
    }
    assert any(skips.values()), skips  # at least one raw alias in 8c
    trace = dict(plan.extras.get("raw_live_trace", []))
    raw = {a for a, s in skips.items() if s}
    assert any(set(live) & raw for live in trace.values()), trace
    forced = df.collect()[0]["cnt"]
    base = CompassOptimizer(spark).execute_count(
        corpus["8c"], tables=tables, counts=counts
    ).collect()[0]["cnt"]
    assert forced == base > 0


def test_comparable_sides_band_logic():
    """The round-10 relative anti-broadcast guard fires ONLY inside the
    band where the partner's plan-time estimate is within
    broadcast_relative_factor of the prefix's: a tiny partner must stay
    broadcastable (dim table), and a partner vastly larger than the prefix
    must stay silent too (AQE broadcasting the tiny PREFIX is the right
    call there — the static byte cap that ignored this direction was
    measured +92% at scale 10). Pure decision-logic test, no JVM."""
    from types import SimpleNamespace

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.pushdown import PushdownConfig

    cfg = PushdownConfig(
        broadcast_relative_factor=4.0, broadcast_floor_rows=100_000
    )
    self = SimpleNamespace(
        config=cfg,
        _frame_size_estimate=lambda plan, alias: plan.pushdown.stats[
            alias
        ].rows,
    )
    decide = CompassOptimizer._comparable_sides

    def plan(rows_by_alias, prefix_estimates):
        return SimpleNamespace(
            extras={},
            pushdown=SimpleNamespace(
                stats={
                    a: SimpleNamespace(rows=r)
                    for a, r in rows_by_alias.items()
                }
            ),
            search=SimpleNamespace(prefix_estimates=prefix_estimates),
        )

    order = ["a", "b", "c"]
    est_ab = {frozenset(["a", "b"]): 500_000.0}
    # comparable sides (500k prefix est vs 400k partner): fire
    p = plan({"a": 10, "b": 10, "c": 400_000}, est_ab)
    assert decide(self, p, order, 2, "c") is True
    # tiny partner below the floor: never fire, broadcast is right
    p = plan({"a": 10, "b": 10, "c": 50_000}, est_ab)
    assert decide(self, p, order, 2, "c") is False
    # partner far above the band (tiny prefix should broadcast INTO it)
    p = plan({"a": 10, "b": 10, "c": 900_000}, {frozenset(["a", "b"]): 1e3})
    assert decide(self, p, order, 2, "c") is False
    # partner far below the band relative to a huge prefix: broadcast
    p = plan({"a": 10, "b": 10, "c": 200_000}, {frozenset(["a", "b"]): 1e8})
    assert decide(self, p, order, 2, "c") is False
    # factor 0 disables outright
    self0 = SimpleNamespace(
        config=PushdownConfig(broadcast_relative_factor=0.0),
        _frame_size_estimate=self._frame_size_estimate,
    )
    p = plan({"a": 10, "b": 10, "c": 400_000}, est_ab)
    assert decide(self0, p, order, 2, "c") is False
    # position 1: the singleton seed frame is the prefix estimate
    p = plan({"a": 300_000, "b": 400_000, "c": 10}, {})
    assert decide(self, p, ["a", "b", "c"], 1, "b") is True
    # missing prefix estimate: stay silent rather than guess
    p = plan({"a": 10, "b": 10, "c": 400_000}, {})
    assert decide(self, p, order, 2, "c") is False


def test_relative_antibroadcast_count_parity(spark):
    """With the floor dropped so the band guard fires at test scale, the
    count must be identical to the default plan — the hint changes the
    physical join strategy, never the answer — and the plan trace must
    record which aliases were pinned."""
    from compass_query_optimizer_spark.plans.job_corpus import (
        job_tables,
        load_corpus,
    )
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.pushdown import PushdownConfig

    corpus = load_corpus()
    tables, counts = job_tables(spark, scale=1)
    opt = CompassOptimizer(
        spark,
        config=PushdownConfig(
            broadcast_relative_factor=4.0, broadcast_floor_rows=1
        ),
    )
    plan = opt.plan(corpus["2a"], tables=tables, counts=counts)
    df = opt.build_count_join(plan)
    forced = df.collect()[0]["cnt"]
    assert plan.extras.get("relative_antibroadcast"), (
        "floor=1 at scale 1 must put at least one 2a chain partner "
        "inside the band"
    )
    base = CompassOptimizer(spark).execute_count(
        corpus["2a"], tables=tables, counts=counts
    ).collect()[0]["cnt"]
    assert forced == base > 0


def test_collapse_frame_artifact_count_parity(spark):
    """Round-11 frame store: with the bar dropped so every eligible chain
    partner is served from the per-catalog bucketed artifact, the count
    must equal the default inline-assembly plan (the artifact stores
    exactly the frame the chain would build), the plan trace must record
    which aliases were served, and a SECOND plan through the same session
    must reuse the registered tables instead of rebuilding — the whole
    point is amortizing one build across a 113-query corpus."""
    from compass_query_optimizer_spark.plans.job_corpus import (
        job_tables,
        load_corpus,
    )
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.pushdown import PushdownConfig

    corpus = load_corpus()
    tables, counts = job_tables(spark, scale=1)
    opt = CompassOptimizer(
        spark,
        config=PushdownConfig(frame_store_min_rows=1, frame_store_sync=True),
    )
    plan = opt.plan(
        corpus["8c"], tables=tables, counts=counts, count_cache_tag="fs-gate"
    )
    forced = opt.build_count_join(plan).collect()[0]["cnt"]
    arts = plan.extras.get("collapse_artifacts")
    assert arts, "bar=1 must serve at least one 8c partner from the store"
    base = (
        CompassOptimizer(
            spark, config=PushdownConfig(frame_store_min_rows=0)
        )
        .execute_count(
            corpus["8c"], tables=tables, counts=counts,
            count_cache_tag="fs-gate-off",
        )
        .collect()[0]["cnt"]
    )
    assert forced == base > 0
    plan2 = opt.plan(
        corpus["8c"], tables=tables, counts=counts, count_cache_tag="fs-gate"
    )
    assert opt.build_count_join(plan2).collect()[0]["cnt"] == base
    arts2 = plan2.extras["collapse_artifacts"]
    assert arts2 and all(v["reused"] for v in arts2.values())
    # the artifact scan must expose its bucketed distribution: the frame's
    # join-side Exchange is the cost the store exists to remove
    assert all(v["bucket_col"] for v in arts2.values())


def test_frame_store_async_build_never_blocks_first_query(spark):
    """Round-11 async fix: with frame_store_sync=False (the runtime
    default) the FIRST plan must fall back to inline assembly — the
    artifact write belongs to the catalog, not to whichever query
    touches the frame first (three scale-160 corpus queries DNF'd under
    the synchronous build). After the background build thread drains,
    a later plan must serve the bucketed artifact with the identical
    count."""
    from compass_query_optimizer_spark.plans import frame_store
    from compass_query_optimizer_spark.plans.job_corpus import (
        job_tables,
        load_corpus,
    )
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.pushdown import PushdownConfig

    corpus = load_corpus()
    tables, counts = job_tables(spark, scale=1)
    opt = CompassOptimizer(
        spark,
        config=PushdownConfig(frame_store_min_rows=1, frame_store_sync=False),
    )
    known = set(frame_store._BUILDS)
    plan = opt.plan(
        corpus["8c"], tables=tables, counts=counts, count_cache_tag="fs-async"
    )
    base = opt.build_count_join(plan).collect()[0]["cnt"]
    # first touch: builds dispatched, nothing served synchronously
    assert "collapse_artifacts" not in plan.extras
    new = set(frame_store._BUILDS) - known
    assert new, "first touch must dispatch at least one background build"
    for n in new:
        frame_store._BUILDS[n].join(timeout=120)
    plan2 = opt.plan(
        corpus["8c"], tables=tables, counts=counts, count_cache_tag="fs-async"
    )
    assert opt.build_count_join(plan2).collect()[0]["cnt"] == base > 0
    arts = plan2.extras.get("collapse_artifacts")
    assert arts, "drained build must serve the artifact to later plans"


def test_dispatch_frame_builds_reaches_steady_state(spark):
    """Round-11 warm-dispatch: dispatch_frame_builds on a freshly planned
    query must kick off the same background builds chain assembly would
    (same artifact cache keys — _referenced_cols is shared), and after
    wait_for_builds drains them, the FIRST build_count_join through a new
    optimizer must already be served from the store with the identical
    count. This is the steady-state guarantee warm_corpus_templates now
    provides to the corpus run."""
    from compass_query_optimizer_spark.plans import frame_store
    from compass_query_optimizer_spark.plans.job_corpus import (
        job_tables,
        load_corpus,
    )
    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
    from compass_query_optimizer_spark.plans.pushdown import PushdownConfig

    corpus = load_corpus()
    tables, counts = job_tables(spark, scale=1)
    cfg = PushdownConfig(frame_store_min_rows=1, frame_store_sync=False)
    opt = CompassOptimizer(spark, config=cfg)
    known = set(frame_store._BUILDS)
    plan = opt.plan(
        corpus["6a"], tables=tables, counts=counts, count_cache_tag="fs-warm"
    )
    n = opt.dispatch_frame_builds(plan)
    assert n > 0, "bar=1 must find store-eligible aliases in 6a"
    assert set(frame_store._BUILDS) - known, "dispatch must start builds"
    frame_store.wait_for_builds(timeout=120)
    # fresh optimizer, same tag: very first execution reads the artifacts
    opt2 = CompassOptimizer(spark, config=cfg)
    plan2 = opt2.plan(
        corpus["6a"], tables=tables, counts=counts, count_cache_tag="fs-warm"
    )
    got = opt2.build_count_join(plan2).collect()[0]["cnt"]
    arts = plan2.extras.get("collapse_artifacts")
    assert arts, "first post-warm execution must be served from the store"
    base = (
        CompassOptimizer(spark, config=PushdownConfig(frame_store_min_rows=0))
        .execute_count(
            corpus["6a"], tables=tables, counts=counts,
            count_cache_tag="fs-warm-off",
        )
        .collect()[0]["cnt"]
    )
    assert got == base > 0


def test_antibroadcast_bar_keys_on_collapsed_estimate():
    """The absolute anti-broadcast bar must consult the COLLAPSED frame
    estimate: a 2M-row table whose referenced keys collapse to 50k rows
    SHOULD broadcast (the driver build is of the collapsed frame), while
    a collapse-skipped table enters raw and counts at full size."""
    from types import SimpleNamespace

    from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer

    est = CompassOptimizer._frame_size_estimate
    self = SimpleNamespace()

    def plan(rows, collapse_info):
        return SimpleNamespace(
            extras=(
                {"collapse_skipped": {"x": collapse_info}}
                if collapse_info
                else {}
            ),
            pushdown=SimpleNamespace(stats={"x": SimpleNamespace(rows=rows)}),
        )

    # collapsed: estimate is the measured key-NDV
    p = plan(2_000_000, {"skip": False, "ndv": 50_000, "rows": 2_000_000})
    assert est(self, p, "x") == 50_000
    # collapse skipped: the frame enters raw at full row count
    p = plan(2_000_000, {"skip": True, "ndv": 1_990_000, "rows": 2_000_000})
    assert est(self, p, "x") == 2_000_000
    # no probe ran: filtered row count is the (upper-bound) estimate
    p = plan(416_136, None)
    assert est(self, p, "x") == 416_136


def test_antibroadcast_env_knobs(monkeypatch):
    """The A/B measurement knobs must reach a freshly-constructed config
    (they are read at instantiation, not import, so in-process tests and
    fresh subprocesses both see them)."""
    from compass_query_optimizer_spark.plans.pushdown import PushdownConfig

    monkeypatch.setenv("SPARK_GRAFT_ANTIBROADCAST_ROWS", "123456")
    monkeypatch.setenv("SPARK_GRAFT_BROADCAST_REL_FACTOR", "2.5")
    cfg = PushdownConfig()
    assert cfg.antibroadcast_rows == 123456
    assert cfg.broadcast_relative_factor == 2.5
    monkeypatch.delenv("SPARK_GRAFT_ANTIBROADCAST_ROWS")
    monkeypatch.delenv("SPARK_GRAFT_BROADCAST_REL_FACTOR")
    cfg = PushdownConfig()
    assert cfg.antibroadcast_rows == 300_000
    # round 11: the relative band defaults OFF (measured a no-op on its
    # target — it trusts sketch prefix estimates that are ~10x off exactly
    # where mid-size frames live; the collapsed-estimate absolute bar is
    # the one default mechanism). The knob stays for opt-in A/B.
    assert cfg.broadcast_relative_factor == 0.0
