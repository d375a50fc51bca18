"""Solo per-query probe: time + plan for a handful of registry entries.

Round-12 measurement harness (guide §1): runs each named query in THIS
process (fresh-JVM isolation comes from invoking the script once per
A/B arm), times build+collect (the bench's timed action) N times, and
optionally dumps .explain("formatted") to a file.

Usage:
  python tools/solo_probe.py q1 q2 ... [--runs 3] [--plans DIR]
        [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir for <q>_<tag>.txt")
    ap.add_argument("--tag", default="probe", help="plan filename suffix")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from compass_query_optimizer_spark.session import get_spark
    from compass_query_optimizer_spark.registry import all_queries

    spark = get_spark(app_name="solo-probe")
    specs = all_queries()
    # same warm-up as bench.py: JVM codegen + parquet footer one-time costs
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()

    for name in args.queries:
        spec = specs[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = spec.build(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}_{args.tag}.txt"),
                      "w") as f:
                f.write(plan)
        samples = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            spec.build(spark, args.sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        print(f"{name}: min={min(samples):.3f}s  "
              f"samples=[{', '.join(f'{s:.3f}' for s in samples)}]",
              flush=True)


if __name__ == "__main__":
    main()
