"""Streaming batch-equivalence tests (SURVEY §5.4): replay the events table
through real readStream pipelines and assert equality with the batch forms."""

import pytest

from conceptnetwork_spark.registry import queries
from conceptnetwork_spark.streaming import ops
from tests.conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.slow
def test_stream_windowed_agg_equals_batch(spark):
    streamed = ops.run_windowed_stream(spark, SF_SMOKE)
    batch = queries()["d26_tumbling_window"](spark, SF_SMOKE)
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _rows(streamed, cols) == _rows(batch, cols)


@pytest.mark.slow
def test_stream_dedup_equals_batch(spark):
    streamed = ops.run_stream_dedup(spark, SF_SMOKE)
    batch = queries()["d28_keyed_dedup"](spark, SF_SMOKE)
    assert _rows(streamed, ["event_id"]) == _rows(batch, ["event_id"])


@pytest.mark.slow
def test_stream_ingest_counts(spark):
    df = queries()["d25_stream_ingest"](spark, SF_SMOKE)
    rows = {r.event_type: r.n_events for r in df.collect()}
    batch = spark.read.parquet(f"{SF_SMOKE}/events.parquet").groupBy("event_type").count()
    expected = {r.event_type: r["count"] for r in batch.collect()}
    assert rows == expected


@pytest.mark.slow
def test_stateful_running_totals_equals_batch(spark):
    """applyInPandasWithState totals across forced multi-batch replay must
    equal the batch groupBy."""
    from pyspark.sql import functions as F

    from conceptnetwork_spark.catalog import Catalog
    from conceptnetwork_spark.streaming.stateful import run_stateful_totals

    streamed = run_stateful_totals(spark, SF_SMOKE)
    ev = Catalog(spark, SF_SMOKE).events
    batch = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value")
    )
    s = {(r.user_id, r.n_events, round(r.sum_value, 6)) for r in streamed.collect()}
    b = {(r.user_id, r.n_events, round(r.sum_value, 6)) for r in batch.collect()}
    assert s == b
