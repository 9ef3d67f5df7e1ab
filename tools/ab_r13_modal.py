#!/usr/bin/env python
"""Interleaved A/B: d10_modal_values current per-column shape (8 scans of
orders: 4 counts subtrees + 4 stats subtrees) vs a melted one-scan shape
(stack to (column_name, v) rows -> one groupBy(column, v) cell relation ->
per-column stats + windowed top-1 from the cells). VERDICT r12 ask #4."""

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
from conceptnetwork_spark.operators.relational import (  # noqa: E402
    _PROFILE_COLS,
    _profile_val,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def melted_modal(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    pairs = ", ".join(
        f"'{c}', {_profile_val(c, 'STRING')}" for c in _PROFILE_COLS
    )
    melted = o.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {pairs}) as (column_name, v)"
        )
    )
    cells = melted.groupBy("column_name", "v").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("column_name").orderBy(F.desc("cnt"), F.asc("v"))
    stats = cells.groupBy("column_name").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("v").isNull(), F.col("cnt"))), F.lit(0)
        ).cast("long").alias("n_null"),
        F.count("v").cast("long").alias("n_distinct"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    top = (
        cells.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "column_name",
            F.col("v").alias("top_value"),
            F.col("cnt").cast("long").alias("top_count"),
        )
    )
    return stats.join(top, "column_name").select(
        "column_name", "n", "n_null", "n_distinct", "min_v", "max_v",
        "top_value", "top_count",
    ).orderBy("column_name")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(app_name="ab-modal")
    spark.sparkContext.setLogLevel("ERROR")
    cur = registry.queries()["d10_modal_values"]
    a = cur(spark, SF).collect()
    b = melted_modal(spark, SF).collect()
    assert a == b, f"results differ:\n{a}\n{b}"
    print(f"results identical ({len(a)} rows)")
    reps = int(os.environ.get("AB_REPS", "6"))
    t_old, t_new = [], []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"modal:old:{i}")
        t0 = time.perf_counter(); noop(cur(spark, SF)); t_old.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(f"modal:new:{i}")
        t0 = time.perf_counter(); noop(melted_modal(spark, SF)); t_new.append(time.perf_counter() - t0)
    print(f"old min={min(t_old):.3f} med={sorted(t_old)[len(t_old)//2]:.3f} | "
          f"new min={min(t_new):.3f} med={sorted(t_new)[len(t_new)//2]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
