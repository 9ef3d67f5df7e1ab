#!/usr/bin/env python
"""Interleaved same-session A/B for the r13 rewrites (d14_kalman_1d,
d14_holt_linear, d10_key_discovery): OLD shape inlined here, NEW shape from
the registry; alternated in one Spark session, min-of-N noop timings per
shape (the only measurement this sandbox's CPU-allocation swings cannot
fake — see OPTIMIZATION_r12.md)."""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from conceptnetwork_spark import get_spark, registry  # noqa: E402
from conceptnetwork_spark.catalog import Catalog  # noqa: E402
from conceptnetwork_spark.operators.relational import (  # noqa: E402
    HOLT_ALPHA,
    HOLT_BETA,
    KALMAN_P0,
    KALMAN_Q,
    KALMAN_R,
    _KEY_PAIRS,
    _KEY_SINGLE,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _daily(spark):
    e = Catalog(spark, SF).events
    return e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.min("value").alias("y")
    )


def old_holt(spark, sf_dir):
    daily = _daily(spark)

    def holt(pdf):
        pdf = pdf.sort_values("day")
        ys = pdf["y"].tolist()
        l, b = ys[0], 0.0
        for y in ys[1:]:
            l_new = HOLT_ALPHA * y + (1 - HOLT_ALPHA) * (l + b)
            b = HOLT_BETA * (l_new - l) + (1 - HOLT_BETA) * b
            l = l_new
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_days": [len(ys)],
                "level": [round(l, 4)],
                "trend": [round(b, 4)],
                "forecast_1": [round(l + b, 4)],
            }
        )

    return (
        daily.groupBy("user_id")
        .applyInPandas(
            holt,
            schema="user_id LONG, n_days LONG, level DOUBLE, trend DOUBLE, "
            "forecast_1 DOUBLE",
        )
        .orderBy("user_id")
    )


def old_kalman(spark, sf_dir):
    daily = _daily(spark)

    def kalman(pdf):
        pdf = pdf.sort_values("day")
        ys = pdf["y"].tolist()
        x, p = ys[0], KALMAN_P0
        for y in ys[1:]:
            pq = p + KALMAN_Q
            k = pq / (pq + KALMAN_R)
            x = x + k * (y - x)
            p = (1 - k) * pq
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_days": [len(ys)],
                "estimate": [round(x, 4)],
                "variance": [round(p, 4)],
                "next_gain": [
                    round((p + KALMAN_Q) / (p + KALMAN_Q + KALMAN_R), 4)
                ],
            }
        )

    return (
        daily.groupBy("user_id")
        .applyInPandas(
            kalman,
            schema="user_id LONG, n_days LONG, estimate DOUBLE, "
            "variance DOUBLE, next_gain DOUBLE",
        )
        .orderBy("user_id")
    )


def old_key_discovery(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    total = o.count()
    branches = []
    for c in _KEY_SINGLE:
        branches.append(
            o.agg(
                F.lit(c).alias("candidate"),
                F.lit(total).cast("long").alias("n_rows"),
                F.countDistinct(c).cast("long").alias("n_distinct"),
                (F.countDistinct(c) == total).alias("is_key"),
                F.round(F.countDistinct(c) / float(total), 4).alias(
                    "uniqueness"
                ),
            )
        )
    for a, b in _KEY_PAIRS:
        d = o.select(a, b).distinct()
        branches.append(
            d.agg(
                F.lit(f"{a}+{b}").alias("candidate"),
                F.lit(total).cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_distinct"),
                (F.count(F.lit(1)) == total).alias("is_key"),
                F.round(F.count(F.lit(1)) / float(total), 4).alias(
                    "uniqueness"
                ),
            )
        )
    out = branches[0]
    for br in branches[1:]:
        out = out.unionAll(br)
    return out.orderBy("candidate")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(app_name="ab-r13")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    pairs = [
        ("d14_holt_linear", old_holt, qs["d14_holt_linear"]),
        ("d14_kalman_1d", old_kalman, qs["d14_kalman_1d"]),
        ("d10_key_discovery", old_key_discovery, qs["d10_key_discovery"]),
    ]
    reps = int(os.environ.get("AB_REPS", "6"))
    # warm both shapes once, assert identical results first
    for name, old, new in pairs:
        a = old(spark, SF).collect()
        b = new(spark, SF).collect()
        assert a == b, f"{name}: results differ"
        print(f"{name}: results identical ({len(a)} rows)")
    for name, old, new in pairs:
        t_old, t_new = [], []
        for i in range(reps):
            for label, fn, sink in (("old", old, t_old), ("new", new, t_new)):
                spark.sparkContext.setJobDescription(f"{name}:{label}:{i}")
                t0 = time.perf_counter()
                noop(fn(spark, SF))
                sink.append(time.perf_counter() - t0)
        print(
            f"{name}: old min={min(t_old):.3f} med={sorted(t_old)[len(t_old)//2]:.3f} | "
            f"new min={min(t_new):.3f} med={sorted(t_new)[len(t_new)//2]:.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
