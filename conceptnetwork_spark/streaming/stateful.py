"""Custom stateful streaming operator: per-key running totals via
``applyInPandasWithState`` (SURVEY §2.2 D25-D28 companion — the "custom
stateful operator" surface Structured Streaming exposes beyond the built-in
window/dedup operators).

The reference has no streaming at all (SURVEY §2.1: Beam pipeline is
batch-only), so this is part of the mandated engine extension surface. The
operator keeps (count, sum) per key in explicit GroupState, updates it each
micro-batch, and emits the running value — the building block for
streaming feature backfills (e.g. "events seen per user so far" as a model
feature).

Correctness contract: with all input replayed, the final per-key totals
equal the batch groupBy — pytest forces multiple micro-batches
(maxFilesPerTrigger=1 over a multi-file copy of events) so state genuinely
carries across batches.

Scale: state is partitioned by key across executors (RocksDB-backed state
store in production configs); per-batch work is Arrow-batched pandas.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from conceptnetwork_spark.catalog import Catalog, fix_nanos
from conceptnetwork_spark.registry import register
from conceptnetwork_spark.streaming.ops import await_finished

_OUT_SCHEMA = "user_id long, n_events long, sum_value double"
_STATE_SCHEMA = "n long, s double"


def _update_totals(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
    )


def running_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame -> per-user running (count, sum(value)) with
    explicit state; emits the updated total once per key per micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_totals(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> DataFrame:
    """Replay events through ``running_totals`` in n_files micro-batches
    (maxFilesPerTrigger=1) and return the FINAL per-user totals.

    The multi-file staging forces state to carry across micro-batches —
    a single-batch run would never exercise ``state.exists``.
    """
    ev = Catalog(spark, sf_dir).events
    stage = os.path.join(
        tempfile.gettempdir(), f"stateful_src_{uuid.uuid4().hex[:8]}"
    )
    ev.repartition(n_files).write.mode("overwrite").parquet(stage)

    schema = spark.read.parquet(stage).schema
    stream = fix_nanos(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage),
        "events",
    )
    table = f"stateful_totals_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"ckpt_{table}")
    # State-store sizing: streaming state is partitioned by the shuffle
    # partition count AT QUERY START and each partition pays per-batch
    # commit I/O. 150 user keys across 32 stores x 4 batches is pure fixed
    # overhead, so scope a smaller count to this query (a real production
    # knob — state partitions are sized to key cardinality, not to the
    # batch-side CPU count; checkpointed state pins it for the query's life).
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            running_totals(stream)
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        await_finished(q, 180)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # update-mode memory sink appends one row per key per batch; the final
    # totals are the per-key max (counts are monotone)
    from pyspark.sql import functions as F

    return (
        spark.table(table)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("sum_value"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# D25/D28 companion — Spark 4 native stateful API (transformWithStateInPandas)
# --------------------------------------------------------------------------
def _twsp_available() -> bool:
    """transformWithStateInPandas needs the StatefulProcessor API (Spark 4+)
    AND google.protobuf (its state-server wire protocol). The container
    ships no protobuf, so ensure_protobuf() falls back to the vendored
    pure-Python runtime (conceptnetwork_spark/vendor/, public wire-format
    implementation) — a real installation always takes precedence."""
    from conceptnetwork_spark.protoshim import ensure_protobuf

    if not ensure_protobuf():
        return False
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def run_first_seen_stats(
    spark: SparkSession, sf_dir: str, n_files: int = 3
) -> DataFrame:
    """Per-user (first_seen, n_events) via ``transformWithStateInPandas`` —
    the Spark-4 arbitrary-stateful API (typed ValueState, RocksDB state
    store) that supersedes applyInPandasWithState. State carries across
    micro-batches (maxFilesPerTrigger=1 over a staged multi-file copy), and
    the final emission per key must equal the batch MIN(ts)/COUNT(*).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from conceptnetwork_spark.protoshim import ship_to_workers

    # the state client runs in the Python WORKER; if the vendored protobuf
    # shim is active, ship it there (addPyFile) in case this session's JVM
    # predates ensure_protobuf()'s PYTHONPATH export
    ship_to_workers(spark)

    class FirstSeenProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "agg",
                StructType(
                    [
                        StructField("first_ts", TimestampType()),
                        StructField("n", LongType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            first_ts, n = (
                self._state.get() if self._state.exists() else (None, 0)
            )
            for pdf in rows:
                n += len(pdf)
                batch_min = pdf["ts"].min()
                if first_ts is None or batch_min < first_ts:
                    first_ts = batch_min
            self._state.update((first_ts, n))
            yield pd.DataFrame(
                {"user_id": [key[0]], "first_seen": [first_ts], "n_events": [n]}
            )

        def close(self) -> None:
            pass

    ev = Catalog(spark, sf_dir).events
    stage = os.path.join(
        tempfile.gettempdir(), f"tws_src_{uuid.uuid4().hex[:8]}"
    )
    ev.repartition(n_files).write.mode("overwrite").parquet(stage)
    schema = spark.read.parquet(stage).schema
    stream = fix_nanos(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage),
        "events",
    )
    table = f"first_seen_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"ckpt_{table}")
    # transformWithState requires the RocksDB state store (bundled in
    # Spark 4); scope it + a key-sized state partition count to this query
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            stream.groupBy("user_id")
            .transformWithStateInPandas(
                FirstSeenProcessor(),
                outputStructType="user_id long, first_seen timestamp, n_events long",
                outputMode="Update",
                timeMode="None",
            )
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        await_finished(q, 180)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
    from pyspark.sql import functions as F

    return (
        spark.table(table)
        .groupBy("user_id")
        .agg(
            F.max_by("first_seen", "n_events").alias("first_seen"),
            F.max("n_events").alias("n_events"),
        )
        .orderBy("user_id")
    )


# Explicit, LOUD gating (not a silent conditional): TWSP_AVAILABLE is the
# single source of truth, registry._load_all() warns on the driver when the
# dependency is missing, and tests/test_streaming.py asserts registration
# state matches the environment. On any real Spark 4 cluster (protobuf
# ships with the distribution) the query registers and certifies like
# every other.
TWSP_AVAILABLE = _twsp_available()

if TWSP_AVAILABLE:

    @register(
        "d25_first_seen_tws",
        oracle="""
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_seen_s,
               COUNT(*) AS n_events
        FROM events GROUP BY user_id ORDER BY user_id
        """,
    )
    def d25_first_seen_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Spark-4 native stateful operator (transformWithStateInPandas +
        typed ValueState + RocksDB store), oracle-checked end to end: events
        replayed in 3 micro-batches; the final per-user (first_seen, count)
        must equal the batch MIN(ts)/COUNT(*) — cross-batch ValueState
        carry-over is load-bearing for the hash to match."""
        from pyspark.sql import functions as F

        out = run_first_seen_stats(spark, sf_dir, n_files=3)
        return out.select(
            "user_id",
            F.date_format("first_seen", "yyyy-MM-dd HH:mm:ss").alias(
                "first_seen_s"
            ),
            "n_events",
        ).orderBy("user_id")


@register(
    "d25_stateful_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def d25_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator, oracle-checked end to end: events
    replayed in 4 micro-batches through applyInPandasWithState; with all
    input replayed, the final per-key GroupState totals must equal the plain
    batch GROUP BY — state carry-over across batches is load-bearing for
    the hash to match."""
    from pyspark.sql import functions as F

    out = run_stateful_totals(spark, sf_dir, n_files=4)
    return out.select(
        "user_id", "n_events", F.round("sum_value", 4).alias("sum_value")
    ).orderBy("user_id")
