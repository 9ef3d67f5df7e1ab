"""Custom Python data source (the Spark-4 ``pyspark.sql.datasource`` API):
a partitioned deterministic generator source, registered as ``synthrange``.

This is the extension point for reading formats Spark has no built-in
connector for (internal RPC feeds, bespoke binary logs) WITHOUT leaving
Python: the engine calls ``partitions()`` once for the split plan and then
``read(partition)`` on executors — so a well-written source parallelizes
exactly like a file scan. The generator here is closed-form on purpose:
row i -> (i, i*i % 97, md5-derived label), so a DuckDB oracle can recompute
every byte and the driver hash-checks the full source -> DataFrame path
(split planning, per-partition iteration, type mapping).

Scale note: ``partitions()`` returns ``n_parts`` independent slices; the
per-partition generator never materializes the whole range. A real source
would map partitions to file splits / shard ids the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from conceptnetwork_spark.registry import register

SYNTH_N = 20_000
SYNTH_PARTS = 8


class _SynthRangeReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", SYNTH_N))
        self.n_parts = int(options.get("partitions", SYNTH_PARTS))

    def partitions(self):
        return [InputPartition(p) for p in range(self.n_parts)]

    def read(self, partition):
        # contiguous slice per partition; bounds derived, never materialized
        per = (self.n + self.n_parts - 1) // self.n_parts
        lo = partition.value * per
        hi = min(lo + per, self.n)
        for i in range(lo, hi):
            yield (i, (i * i) % 97)


class SynthRangeSource(DataSource):
    @classmethod
    def name(cls):
        return "synthrange"

    def schema(self):
        return "i bigint, v bigint"

    def reader(self, schema):
        return _SynthRangeReader(self.options)


def register_python_source(spark: SparkSession) -> None:
    """Idempotent per-session registration of the custom source."""
    key = "_cn_synthrange_registered"
    if not getattr(spark, key, False):
        spark.dataSource.register(SynthRangeSource)
        setattr(spark, key, True)


@register(
    "d01_python_datasource",
    oracle=f"""
    SELECT CAST(i AS BIGINT) AS i,
           CAST((i * i) % 97 AS BIGINT) AS v
    FROM range(0, {SYNTH_N}) t(i)
    WHERE (i * i) % 97 < 50
    ORDER BY i
    """,
)
def d01_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end custom Python data source: register ``synthrange``, read
    it with 8 planned partitions, filter and project. The oracle recomputes
    the generator in SQL, so split planning, per-partition iteration and
    Arrow type mapping are all on the hash. (The filter does NOT push into
    a Python source — pushdown requires implementing the source's filter
    API — so it runs as a post-scan Filter; the plan test pins the
    partition count instead.)"""
    register_python_source(spark)
    df = (
        spark.read.format("synthrange")
        .option("n", str(SYNTH_N))
        .option("partitions", str(SYNTH_PARTS))
        .load()
    )
    return df.where(F.col("v") < 50).orderBy("i")


# --------------------------------------------------------------------------
# D1/D25 bridge (round 5) — the STREAMING side of the Python data source
# API: SimpleDataSourceStreamReader (driver-side prefetch, offset dict
# bookkeeping, deterministic replay via readBetweenOffsets).
# --------------------------------------------------------------------------
STREAM_CHUNK = 4_096


class _SynthRangeStreamReader:
    """Bounded deterministic stream: each read() returns the next chunk of
    the same closed-form rows the batch reader generates, as
    (iterator, next_offset); past n it returns an empty iterator with an
    unchanged offset (a quiesced source). readBetweenOffsets regenerates
    any committed range exactly — the replayability contract that makes
    the source usable with checkpoint recovery."""

    def __init__(self, options):
        self.n = int(options.get("n", SYNTH_N))
        self.chunk = int(options.get("chunk", STREAM_CHUNK))

    def initialOffset(self):
        return {"offset": 0}

    def read(self, start):
        lo = start["offset"]
        hi = min(lo + self.chunk, self.n)
        if hi == lo:
            # quiesced: pyspark's prefetch cache validates an unchanged
            # offset by calling next() on the batch — so the empty batch
            # must be an ITERATOR, not a list (datasource_internal.py
            # add_result_to_cache)
            return (iter(()), {"offset": lo})
        # a LIST, not a generator: the prefetched batch lives in the
        # driver-side replay cache, which copy.copy()s entries before
        # chaining — a list copy is position-free and re-iterable
        return ([(i, (i * i) % 97) for i in range(lo, hi)], {"offset": hi})

    def readBetweenOffsets(self, start, end):
        return [(i, (i * i) % 97) for i in range(start["offset"], end["offset"])]

    def commit(self, end):
        pass


def _simple_stream_reader(self, schema):
    return _SynthRangeStreamReader(self.options)


# attach to the same source class: one format name ("synthrange") serves
# spark.read AND spark.readStream, exactly like a built-in connector
SynthRangeSource.simpleStreamReader = _simple_stream_reader


@register(
    "d01_python_stream_source",
    oracle=f"""
    SELECT CAST(i AS BIGINT) AS i,
           CAST((i * i) % 97 AS BIGINT) AS v
    FROM range(0, {SYNTH_N}) t(i)
    WHERE (i * i) % 97 < 50
    ORDER BY i
    """,
)
def d01_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python source read as a STREAM (Spark-4
    SimpleDataSourceStreamReader): offsets advance one chunk per
    micro-batch, the memory sink accumulates until the bounded source
    quiesces, and the final content must equal the batch read — the same
    closed-form oracle as d01_python_datasource, so offset bookkeeping,
    chunked prefetch, and stream-side type mapping are all on the hash.

    Scale shape: the Simple reader variant prefetches on the DRIVER — the
    right trade for low-volume control-plane feeds (this source's use
    case); high-volume sources implement the partitioned streamReader the
    same way the batch reader plans partitions."""
    import time as _time
    import uuid as _uuid

    register_python_source(spark)
    stream = (
        spark.readStream.format("synthrange")
        .option("n", str(SYNTH_N))
        .option("chunk", str(STREAM_CHUNK))
        .load()
        .where(F.col("v") < 50)
    )
    name = f"pystream_{_uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    # bounded source: stop once every chunk has been ingested (the source
    # quiesces at n; expected row count is known in closed form)
    expected = sum(1 for i in range(SYNTH_N) if (i * i) % 97 < 50)
    deadline = _time.time() + 120
    try:
        while _time.time() < deadline:
            if not q.isActive:
                # fail fast with the underlying error instead of spinning
                # out the deadline and masking it as a TimeoutError
                exc = q.exception()
                if exc is not None:
                    raise exc
            if spark.table(name).count() >= expected:
                break
            _time.sleep(0.5)
        else:
            raise TimeoutError(f"stream never reached {expected} rows")
    finally:
        q.stop()
    return spark.table(name).orderBy("i")
