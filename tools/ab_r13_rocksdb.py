#!/usr/bin/env python
"""Interleaved A/B (VERDICT r12 ask #6): default HDFS-backed state store vs
RocksDB provider with changelog checkpointing, on the streaming queries whose
cost is micro-batch state-commit machinery. Provider is a session conf read
at query start, so it scopes per run; results asserted identical first."""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from conceptnetwork_spark import get_spark, registry  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["d26_stream_session_window", "d26_append_finalize", "d25_stream_upsert"]

ROCKS = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
CHANGELOG = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
PROVIDER = "spark.sql.streaming.stateStore.providerClass"


@contextmanager
def rocksdb(spark):
    prev = spark.conf.get(PROVIDER, None)
    spark.conf.set(PROVIDER, ROCKS)
    spark.conf.set(CHANGELOG, "true")
    try:
        yield
    finally:
        if prev:
            spark.conf.set(PROVIDER, prev)
        else:
            spark.conf.unset(PROVIDER)
        spark.conf.unset(CHANGELOG)


def main():
    spark = get_spark(app_name="ab-rocksdb")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    reps = int(os.environ.get("AB_REPS", "5"))
    for name in QUERIES:
        fn = qs[name]
        a = fn(spark, SF).collect()
        with rocksdb(spark):
            b = fn(spark, SF).collect()
        assert a == b, f"{name}: results differ under RocksDB provider"
        print(f"{name}: results identical ({len(a)} rows)")
        t_hdfs, t_rocks = [], []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name}:hdfs:{i}")
            t0 = time.perf_counter()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            t_hdfs.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(f"{name}:rocksdb:{i}")
            t0 = time.perf_counter()
            with rocksdb(spark):
                fn(spark, SF).write.format("noop").mode("overwrite").save()
            t_rocks.append(time.perf_counter() - t0)
        print(
            f"{name}: hdfs min={min(t_hdfs):.3f} med={sorted(t_hdfs)[len(t_hdfs)//2]:.3f} | "
            f"rocksdb min={min(t_rocks):.3f} med={sorted(t_rocks)[len(t_rocks)//2]:.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
