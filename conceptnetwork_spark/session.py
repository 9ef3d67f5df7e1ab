"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]`` but every knob here is chosen for the
1000-executor / 100 TB design point and degrades gracefully locally:

- AQE on: runtime partition coalescing, skew-join splitting, and
  join-strategy switching replace hand-tuning per scale factor.
- ``autoBroadcastJoinThreshold`` left at default (10 MB): dimension tables
  (region/nation/customer at TPC-H shapes) broadcast automatically; fact-fact
  joins shuffle. Explicit ``F.broadcast`` hints are still applied in the
  operator layer where we *know* a side is dimension-sized.
- Arrow enabled: every pandas_udf / applyInPandas / mapInPandas crossing is
  Arrow-batched (the reference's ``tf.train.batch`` row->columnar pivot,
  ``conceptnetwork/network.py:240-245``, is exactly this and is free here).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (naive timestamps) bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "conceptnetwork-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master``/``shuffle_partitions`` default from ``SPARK_GRAFT_CPUS`` so the
    same entry points serve tests (local[*]) and the driver's bench.
    """
    # vendored-protobuf fallback must be on PYTHONPATH BEFORE the JVM (and
    # therefore its Python workers) launches — transformWithStateInPandas'
    # state client imports google.protobuf inside the worker process
    from conceptnetwork_spark.protoshim import ensure_protobuf

    ensure_protobuf()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0)
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus if cpus else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no nanos
        # timestamp type, so read as long and let the catalog convert to
        # microsecond timestamps in-plan (see Catalog.NANOS_TS_COLS).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local-mode driver == all 32 executor threads in one JVM; an 8g heap
        # GC-thrashes once a long session accumulates shuffle/codegen state
        # (measured: late-session queries inflate ~10x at 8g, flat at 24g)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # UI off by default (test noise); SPARK_GRAFT_UI=1 enables it so
        # tools/shuffle_audit.py can read per-stage shuffle/spill bytes from
        # the status REST API — the only stable metrics surface PySpark has.
        # retainedStages must outlast a full 360-query sweep (>1000 stages,
        # the default cap): an evicted stage silently shrinks the audit's
        # cumulative totals, weakening the over-cap gate with negative deltas
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") else "false",
        )
        .config("spark.ui.retainedStages", "100000")
        .config("spark.ui.retainedJobs", "100000")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    return builder.getOrCreate()
