#!/usr/bin/env python
"""Optimization probe (round 12): isolate named queries with the noop sink
(guide §1.4 — eagerly computes every column, no sink cost, no count()-style
column pruning) and capture their ``explain("formatted")`` plans.

Usage:
    python tools/opt_probe.py [--plans-dir plans/r12] [--suffix before] q1 q2 ...

Per query it prints min-of-3 noop-materialization seconds (after one warmup)
and writes ``<plans-dir>/<query>_<suffix>.txt``. Jobs are labelled via
``setJobDescription`` so a live UI session maps stages to queries."""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from conceptnetwork_spark import get_spark, registry  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    plans_dir = os.path.join(ROOT, "plans", "r12")
    suffix = "before"
    reps = 3
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--plans-dir":
            plans_dir = os.path.join(ROOT, next(it))
        elif a == "--suffix":
            suffix = next(it)
        elif a == "--reps":
            reps = int(next(it))
        else:
            names.append(a)
    os.makedirs(plans_dir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    # prime file cache + JVM like bench.py does
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    results: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        spark.sparkContext.setJobDescription(f"probe:{name}")
        # warmup (codegen) then timed noop materializations
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        results[name] = round(best, 3)
        ex = plan.count("Exchange")
        py = sum(plan.count(k) for k in
                 ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                  "MapInArrow", "FlatMapGroupsInPandas", "FlatMapCoGroupsInPandas"))
        print(f"{name}: noop_min={best:.3f}s exchanges={ex} python_nodes={py}",
              flush=True)

    print("TOTAL", round(sum(results.values()), 3))
    spark.stop()


if __name__ == "__main__":
    main()
