#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <scale factor>}

The headline set spans the engine surface: scan-heavy aggregation, top-k,
multi-way joins (plain and COMPASS-optimized), the events rollup, and the
training-data operators (dedup, similarity, text). Timing is end-to-end per
query: plan build + execution + driver collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "q01_pricing_summary",        # scan-heavy group-by aggregation
    "q02_topk_parts",             # join + top-k (TakeOrderedAndProject)
    "q05_local_supplier_volume",  # 6-table join + agg
    "q07_count_star_multijoin",   # JOB-shaped COUNT(*) multi-join
    "compass_count_multijoin",    # same shape through the COMPASS optimizer
    "q23_events_rollup",          # event-time windowed rollup
    "compass_self_join",          # self-join aliases through the planner
    "dedup_exact",                # hash-groupBy dedup on documents
    "dedup_minhash_lsh",          # MinHash+LSH near-dup
    "dedup_simhash",              # simhash fingerprint + pigeonhole join
    "sim_topk_bruteforce",        # brute-force cosine top-k on embeddings
    "sim_ann_lsh",                # LSH-bucketed ANN (scale path)
    "sim_ann_ivf",                # IVF-flat ANN (bounded-scan scale path)
    "text_quality",               # text quality scoring
    "mm_frame_sample",            # multimodal frame sampling via Arrow
    "stream_window_rollup",       # Structured Streaming windowed rollup
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from compass_query_optimizer_spark.session import get_spark
    from compass_query_optimizer_spark.registry import all_queries

    spark = get_spark(app_name="compass-bench")
    specs = all_queries()

    # warm-up: JVM codegen + parquet footer reads are one-time costs that
    # would otherwise land entirely on the first timed query
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # best-of-2: the box shows 2x run-to-run noise under concurrent load;
    # min is the stable estimate of what the plan actually costs
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = specs[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spec.build(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]:.3f}s", file=sys.stderr)

    # plan-quality metric (BASELINE.md): Σ estimated intermediate sizes of
    # the sketch-chosen order vs the size-descending fallback on the
    # flagship join — ratio ≤ 1.0 means the optimizer's order is no worse
    plan_quality = None
    try:
        from compass_query_optimizer_spark.plans.optimizer import CompassOptimizer
        from compass_query_optimizer_spark.plans.search import (
            fallback_order,
            order_cost,
        )
        from compass_query_optimizer_spark.workload import FLAGSHIP_SQL

        plan = CompassOptimizer(spark).plan(FLAGSHIP_SQL, sf_dir)
        if not plan.search.fallback:
            fb_cost = order_cost(
                plan.graph, plan.pushdown.stats, fallback_order(plan.pushdown.stats)
            )
            plan_quality = {
                "chosen_cost": round(plan.search.cost, 1),
                "fallback_cost": round(fb_cost, 1),
                "ratio": round(plan.search.cost / fb_cost, 4) if fb_cost else None,
            }
    except Exception as e:  # bench must still emit its line
        print(f"  plan-quality skipped: {e}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "plan_quality": plan_quality,
            }
        )
    )


if __name__ == "__main__":
    main()
