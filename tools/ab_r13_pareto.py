#!/usr/bin/env python
"""Interleaved A/B for d09_pareto_abc: `tot` via a second unpartitioned
window (orderBy(lit(1))) vs the SAME window spec as `cum` (desc r,
l_partkey) with an unbounded frame — same ordering lets Spark compute both
in one Window exec (one exchange+sort instead of two). DECIMAL sums are
order-exact, so the value cannot change."""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from conceptnetwork_spark import get_spark, registry  # noqa: E402
from conceptnetwork_spark.catalog import Catalog  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def fused(spark, sf_dir):
    li = Catalog(spark, sf_dir).lineitem
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("r")
    )
    wc = Window.orderBy(F.desc("r"), "l_partkey")
    c = rev.select(
        "l_partkey",
        "r",
        F.sum("r").over(wc).alias("cum"),
        F.sum("r").over(
            wc.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("tot"),
    )
    cls = c.select(
        F.when(F.col("cum") * 10 <= F.col("tot") * 7, "A")
        .when(F.col("cum") * 10 <= F.col("tot") * 9, "B")
        .otherwise("C")
        .alias("abc_class"),
        "r",
        "tot",
    )
    return (
        cls.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("r").cast("double"), 4).alias("class_revenue"),
            F.round(
                F.sum("r").cast("double") / F.max("tot").cast("double"), 4
            ).alias("share"),
        )
        .orderBy("abc_class")
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(app_name="ab-pareto")
    spark.sparkContext.setLogLevel("ERROR")
    cur = registry.queries()["d09_pareto_abc"]
    a = cur(spark, SF).collect()
    b = fused(spark, SF).collect()
    assert a == b, f"differ:\n{a}\n{b}"
    print(f"results identical ({len(a)} rows)")
    reps = int(os.environ.get("AB_REPS", "6"))
    t_old, t_new = [], []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"pareto:old:{i}")
        t0 = time.perf_counter(); noop(cur(spark, SF)); t_old.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(f"pareto:new:{i}")
        t0 = time.perf_counter(); noop(fused(spark, SF)); t_new.append(time.perf_counter() - t0)
    print(f"old min={min(t_old):.3f} med={sorted(t_old)[len(t_old)//2]:.3f} | "
          f"new min={min(t_new):.3f} med={sorted(t_new)[len(t_new)//2]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
