"""Streaming batch-equivalence tests (SURVEY §5.4): replay the events table
through real readStream pipelines and assert equality with the batch forms."""

import pytest

from conceptnetwork_spark.registry import queries
from conceptnetwork_spark.streaming import ops
from tests.conftest import SF_ORACLE, SF_SMOKE


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.slow
def test_stream_windowed_agg_equals_batch(spark):
    streamed = ops.run_windowed_stream(spark, SF_SMOKE)
    batch = queries()["d26_tumbling_window"](spark, SF_SMOKE)
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _rows(streamed, cols) == _rows(batch, cols)


@pytest.mark.slow
def test_stream_session_window_equals_batch(spark):
    streamed = ops.run_session_window_stream(spark, SF_SMOKE)
    batch = queries()["d27_session_window"](spark, SF_SMOKE)
    cols = ["user_id", "session_start", "n_events", "sum_value"]
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


@pytest.mark.slow
def test_late_data_dropped_beyond_watermark(spark, tmp_path):
    """Pin the D26 late-data contract: a row arriving after the watermark
    passed its window's end is dropped from the appended result."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    def write(name, rows, mtime):
        t = pa.table({
            "ts": pa.array([datetime(2024, 1, 1, *hm) for hm in rows],
                           type=pa.timestamp("us")),
            "event_type": pa.array(["e"] * len(rows)),
        })
        p = str(tmp_path / name)
        pq.write_table(t, p)
        os.utime(p, (mtime, mtime))

    # Spark's two-watermark semantics (3.4+): batch N evicts state at the
    # watermark computed from batches 0..N-1, but FILTERS late input at the
    # watermark of batch N-1 — so a late row is dropped once it arrives two
    # batches after the data that advanced the watermark.
    # batch 0 (on-time): 10:15, 11:30, 12:50 -> watermark becomes 12:40
    write("f1.parquet", [(10, 15), (11, 30), (12, 50)], 1_700_000_000)
    # batch 1 (on-time): 12:55; eviction at 12:40 emits the 10:00 and 11:00
    # windows; late-filter watermark becomes 12:40 for the NEXT batch
    write("f2.parquet", [(12, 55)], 1_700_000_100)
    # batch 2: 10:20 is LATE (10:20 < 12:40) -> dropped by the filter
    write("f3.parquet", [(10, 20)], 1_700_000_200)

    from conceptnetwork_spark.streaming.ops import run_windowed_append_stream

    schema = "ts timestamp, event_type string"
    out = run_windowed_append_stream(spark, str(tmp_path / "*.parquet"), schema)
    got = {(r.window_start, r.n_events) for r in out.collect()}
    # late 10:20 row must NOT bump the 10:00 window; the 12:00 window never
    # finalizes (watermark stops at 12:45 < 13:00) so only two windows emit
    assert got == {("2024-01-01 10:00:00", 1), ("2024-01-01 11:00:00", 1)}, got


@pytest.mark.slow
def test_stream_stream_join_equals_batch(spark):
    """Watermarked interval stream-stream join over static input must emit
    exactly the batch attribution pairs (nothing dropped, nothing extra)."""
    streamed = ops.run_stream_stream_join(spark, SF_SMOKE)
    batch = queries()["d25_stream_stream_join"](spark, SF_SMOKE)
    cols = ["view_id", "purchase_id", "user_id", "view_ts"]
    assert _rows(streamed, cols) == _rows(batch, cols)


@pytest.mark.slow
def test_stream_static_join_equals_batch(spark):
    """Stream-static enrichment (static side broadcast per micro-batch)
    must equal the batch join+rollup."""
    streamed = ops.run_stream_static_join(spark, SF_SMOKE)
    batch = queries()["d25_stream_static_join"](spark, SF_SMOKE)
    cols = ["n_name", "event_type", "n_events", "sum_value"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_transform_with_state_gating(spark):
    """The Spark-4 transformWithStateInPandas query registers only where its
    protobuf dependency exists; in either case the registry stays coherent."""
    from conceptnetwork_spark.streaming import stateful
    from conceptnetwork_spark.registry import queries, oracles

    assert stateful.TWSP_AVAILABLE == stateful._twsp_available()
    if stateful.TWSP_AVAILABLE:
        assert "d25_first_seen_tws" in queries()
        assert "d25_first_seen_tws" in oracles()
    else:
        assert "d25_first_seen_tws" not in queries()


@pytest.mark.slow
def test_update_mode_multi_emission(spark):
    """Update mode must actually RE-EMIT windows across the two
    parity-split micro-batches: the raw update log must be strictly longer
    than the folded final state (same-window rows emitted in both batches),
    else the staging degenerated to one batch and the oracle proves
    nothing."""
    import uuid

    from pyspark.sql import functions as F

    from conceptnetwork_spark.catalog import fix_nanos

    stage = ops._stage_parity_batches(spark, SF_SMOKE)
    schema = spark.read.parquet(stage).schema
    stream = fix_nanos(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage),
        "events",
    )
    agg = (
        stream.withWatermark("ts", "90 days")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    name = f"upd_probe_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    ops.await_finished(q, 120)
    log = spark.table(name)
    n_log = log.count()
    n_windows = log.select("w").distinct().count()
    assert n_log > n_windows, (
        f"update log {n_log} rows == {n_windows} distinct windows: "
        "no window was re-emitted; parity staging is not multi-batch"
    )


def test_late_drop_metrics_exact_count(spark):
    """numRowsDroppedByWatermark counts rows reaching the STATE STORE —
    after partial+merge aggregation that is exactly one row per expired
    window, so the reported drops must equal the number of DISTINCT
    hour-windows among the staged late rows (measured semantics; the raw
    late-row count is larger), and finalized windows must have been
    emitted."""
    from pyspark.sql import functions as F

    row = queries()["d26_late_drop_metrics"](spark, SF_SMOKE).collect()[0]
    expected = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .where(F.col("ts") < "2024-01-02 00:00:00")
        .select(F.date_trunc("hour", "ts").alias("h"))
        .distinct()
        .count()
    )
    assert row.late_rows_dropped == expected, (
        f"dropped {row.late_rows_dropped} != distinct late windows {expected}"
    )
    assert row.windows_emitted > 0


@pytest.mark.slow
def test_stream_stream_join_skewed_key_eight_batches(spark, tmp_path):
    """VERDICT r4 item 7 — skew resilience of the stream-stream join: eight
    genuine micro-batches (one per event-time hour, maxFilesPerTrigger=1)
    with ONE user carrying ~30% of all events (the shape a 100x events
    table actually has). Pins two behaviors at once: (a) the watermarked
    interval join's result still equals the batch join on identical input
    — the hot key's state is handled exactly, not sampled or dropped; and
    (b) state EVICTION really happens as the watermark advances across
    batches (summed numRowsRemoved > 0), so per-key state — including the
    hot key's — stays bounded by the event-time interval, not by stream
    length. That bound is the scale story: a skewed key inflates one
    partition's state by its share of ONE watermark window, never by its
    share of the whole stream."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    # deterministic skewed fixture: 8 hourly files x 200 rows; user 7 takes
    # 30% of every hour, the rest spread over users 0..19
    stage = tmp_path / "skewed_events"
    stage.mkdir()
    rows_per = 200
    for h in range(8):
        ids, users, types, tss, vals = [], [], [], [], []
        for i in range(rows_per):
            ids.append(h * rows_per + i)
            cold = (i * 13) % 19  # 0..18 -> skip 7 so the hot share is exact
            users.append(7 if i % 10 < 3 else (cold if cold < 7 else cold + 1))
            types.append("view" if i % 2 == 0 else "purchase")
            tss.append(
                (1704067200 + h * 3600 + (i * 7) % 60 * 60 + (i * 11) % 60)
                * 1_000_000
            )  # 2024-01-01T00:00Z base, microseconds
            vals.append(round(0.5 + (i % 40) * 0.25, 2))
        t = pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
                "value": pa.array(vals, pa.float64()),
            }
        )
        path = stage / f"b{h}.parquet"
        pq.write_table(t, str(path))
        import os as _os

        base = _os.path.getmtime(str(path))
        _os.utime(str(path), (base + h - 8, base + h - 8))  # arrival order

    hot_share = 3 / 10
    batch = spark.read.parquet(str(stage))
    assert abs(batch.where(F.col("user_id") == 7).count() / batch.count() - hot_share) < 0.01

    def sides(df):
        views = df.where(F.col("event_type") == "view").select(
            F.col("event_id").alias("view_id"),
            "user_id",
            F.col("ts").alias("v_ts"),
        )
        purchases = df.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        return views, purchases

    cond = lambda: (  # noqa: E731
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") < F.col("v_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    bv, bp = sides(batch)
    expected = _rows(
        bv.join(bp, cond()).select("view_id", "purchase_id"),
        ["view_id", "purchase_id"],
    )
    assert expected, "fixture must produce matches"

    schema = batch.schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        str(stage)
    )
    sv, sp = sides(stream)
    joined = (
        sv.withWatermark("v_ts", "90 minutes")
        .join(
            sp.withWatermark("p_ts", "90 minutes"),
            cond(),
        )
        .select("view_id", "purchase_id")
    )
    name = f"skew_join_{_uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    ops.await_finished(q, 180)
    got = _rows(spark.table(name), ["view_id", "purchase_id"])
    assert got == expected  # hot key exact, nothing dropped

    n_batches = sum(
        1 for p in q.recentProgress if p["numInputRows"] and p["numInputRows"] > 0
    )
    assert n_batches >= 8, f"expected >=8 micro-batches, saw {n_batches}"
    removed = sum(
        op.get("numRowsRemoved", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert removed > 0, "watermark advance across batches must evict join state"


def test_pinned_spark_minor_for_measured_streaming_semantics():
    """Version sentinel (VERDICT r5 item 4): several streaming oracles
    encode MEASURED Spark 4.1 behaviors rather than documented contracts —
    the stream-stream outer-join eviction bounds and emission model
    (streaming/ops.py: d25_stream_full_outer / _right_outer / _semi_join,
    "Emission model (measured, Spark 4.1)" comments), the TWS event-time
    timer firing rule W = max(ts) - delay on the final availableNow batch
    (streaming/stateful.py: run_cohort_maturation), and the late-agg
    admission nuance (d26 late-data metrics). A Spark minor bump can
    legitimately change any of them; fail HERE with a pointer instead of
    mysteriously in five closed-form oracles."""
    import pyspark

    major_minor = ".".join(pyspark.__version__.split(".")[:2])
    assert major_minor == "4.1", (
        f"pyspark {pyspark.__version__}: re-measure the empirically-pinned "
        "streaming semantics (grep 'measured, Spark 4.1' in "
        "conceptnetwork_spark/streaming/) and update this pin"
    )


@pytest.mark.slow
def test_tws_state_holds_at_million_keys(spark, tmp_path):
    """State-cardinality stress (VERDICT r6 ask #6): the TWS operators are
    oracle-certified at sf0.1 (~10^4 keys); a 100x events table implies
    ~10^6 distinct users, so run the IDENTICAL production FirstSeen
    processor (typed ValueState, RocksDB store) over a synthetic
    1,000,000-key / 2,500,000-row input in 4 micro-batches and pin that
    typed state does not degrade at that key count:

    - parity: the folded final emissions equal batch MIN(ts)/COUNT(*)
      (compared via count/sum/hash checksums, never a 10^6-row collect),
    - exactness of state size: numRowsTotal == n_keys after the last batch
      (state is per-key, not per-event),
    - bounded per-batch memory: the store's reported memoryUsedBytes stays
      under 1 KB/key every batch (RocksDB keeps the working set bounded;
      a HDFSBackedStateStore-style all-in-heap regression would blow this)."""
    from conceptnetwork_spark.streaming import stateful

    if not stateful.TWSP_AVAILABLE:
        pytest.skip("transformWithStateInPandas needs a protobuf runtime")
    import uuid

    from pyspark.sql import functions as F

    from conceptnetwork_spark.protoshim import ship_to_workers

    ship_to_workers(spark)
    n_keys, n_rows, n_files = 1_000_000, 2_000_000, 3
    src = str(tmp_path / "events_1m")
    (
        spark.range(n_rows)
        .select(
            (F.col("id") % n_keys).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + (F.col("id") * 37) % 86_400
            ).alias("ts"),
        )
        .repartition(n_files)
        .write.parquet(src)
    )
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    table = f"tws1m_{uuid.uuid4().hex[:8]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    # state partitions sized to key cardinality (the production knob the
    # small-key harness pins at 8): 10^6 keys / 32 partitions ~ 31k keys
    # per state store — measured 33.5 s per 10^5 keys at this width
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            stream.groupBy("user_id")
            .transformWithStateInPandas(
                stateful.first_seen_processor(),
                outputStructType=stateful.FIRST_SEEN_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        ops.await_finished(q, 540)
        state_ops = [
            p["stateOperators"][0]
            for p in q.recentProgress
            if p.get("stateOperators")
        ]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )

    assert state_ops, "no state-operator progress reported"
    assert state_ops[-1]["numRowsTotal"] == n_keys, state_ops[-1]["numRowsTotal"]
    worst = max(op["memoryUsedBytes"] for op in state_ops)
    assert worst < n_keys * 1_000, f"state memory {worst} B for {n_keys} keys"

    final = (
        spark.table(table)
        .groupBy("user_id")
        .agg(
            F.max_by("first_seen", "n_events").alias("first_seen"),
            F.max("n_events").alias("n_events"),
        )
    )
    batch = (
        spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_seen"), F.count(F.lit(1)).alias("n_events"))
    )

    def checksum(df):
        # bit_xor, not sum, over the row hashes: order-independent AND
        # overflow-free under ANSI mode (SUM of 10^6 xxhash64 longs throws
        # ARITHMETIC_OVERFLOW)
        r = df.agg(
            F.count(F.lit(1)).alias("k"),
            F.sum("n_events").alias("s"),
            F.bit_xor(F.xxhash64("user_id", "first_seen", "n_events")).alias("h"),
        ).collect()[0]
        return (r.k, r.s, r.h)

    assert checksum(final) == checksum(batch)


@pytest.mark.slow
@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
def test_stream_session_window_cross_batch_merge(spark, sf_dir, tmp_path):
    """r9 VERDICT ask #4: the state-MERGE arm of d26_stream_session_window
    must be exercised, not vacuously true — (i) an EMITTED session's
    events straddle a micro-batch boundary, proving the session fused
    across state-store commits; (ii) the open tail is real: a non-zero
    count of batch sessions is withheld at the final watermark (the
    6/150/1006 fired/withheld methodology from streaming/stateful.py,
    applied to session windows).

    The registered query's equal-count chunking turns out NEVER to cut a
    session on this data (events are ~hours apart per user vs the 30-min
    gap; verified empirically at both SFs — zero straddles), so the pin
    would be vacuous on the stock staging. Instead the test re-chunks the
    REAL events table with the split placed mid-session: the boundary
    falls between the first and second event of the largest finalized
    multi-event session, so exactly that session MUST be merged across
    batches; its emitted row must carry the full batch (n_events,
    sum_value) — a partial, unmerged emission would differ."""
    import os
    from datetime import timedelta

    from pyspark.sql import functions as F

    from conceptnetwork_spark.catalog import Catalog
    from conceptnetwork_spark.streaming.ops import (
        SESSION_STREAM_DELAY,
        SESSION_STREAM_GAP,
        run_session_stream_on_stage,
    )

    ev = Catalog(spark, sf_dir).events.select("ts", "event_id", "user_id", "value")
    final_wm = ev.agg(
        F.timestamp_millis(F.unix_millis(F.max("ts"))).alias("m")
    ).collect()[0]["m"] - timedelta(hours=2)

    # batch truth with raw extents
    batch = (
        ev.groupBy(F.session_window("ts", SESSION_STREAM_GAP).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.min("ts").alias("first_ts"),
        )
        .select("user_id", "w.start", "w.end", "n_events", "sum_value", "first_ts")
        .collect()
    )
    finalized = [r for r in batch if r.end <= final_wm]
    multi = [r for r in finalized if r.n_events >= 2]
    assert multi, "fixture degenerate: no finalized multi-event session"
    target = max(multi, key=lambda r: (r.n_events, r.first_ts))

    # split the stream right after the target session's FIRST event: its
    # remaining events land in chunk 1, forcing a state-store gap merge
    import pandas as pd

    pdf = ev.orderBy("ts", "event_id").toPandas()
    pdf["ts"] = pdf["ts"].dt.tz_localize("UTC").dt.as_unit("us")
    cutoff = pd.Timestamp(target.first_ts, tz="UTC")
    lo = pdf[pdf["ts"] <= cutoff]
    hi = pdf[pdf["ts"] > cutoff]
    assert len(lo) and len(hi)
    stage = str(tmp_path / "merge_chunks")
    os.makedirs(stage)
    for i, part in enumerate((lo, hi)):
        path = os.path.join(stage, f"b{i}.parquet")
        part.to_parquet(path, index=False)
        base = os.path.getmtime(path)
        os.utime(path, (base + i - 2, base + i - 2))

    res = run_session_stream_on_stage(spark, stage)
    emitted = res.collect()

    key = target.start.strftime("%Y-%m-%d %H:%M:%S")
    got = [
        r for r in emitted if r.user_id == target.user_id and r.session_start == key
    ]
    assert len(got) == 1, (
        f"target session (user {target.user_id} @ {key}) not emitted exactly "
        f"once: {got} — cross-batch merge failed or session split in two"
    )
    assert got[0].n_events == target.n_events, (
        f"merged session emitted PARTIAL counts: {got[0].n_events} vs batch "
        f"{target.n_events}"
    )
    assert got[0].sum_value == target.sum_value
    assert SESSION_STREAM_DELAY == "2 hours"  # final_wm above must match
    # (ii) append-mode withholding is non-vacuous: open sessions remain
    withheld = len(batch) - len(emitted)
    assert withheld > 0, "every session finalized — watermark gate vacuous"


@pytest.mark.slow
def test_stream_session_window_watermark_tie(spark, tmp_path):
    """r9 ADVICE pin: the oracle finalizes sessions with
    MAX(ts) + gap <= watermark (INCLUSIVE). Constructed ms-exact fixture:
    user 1's session ends exactly AT the final watermark (to the
    millisecond), user 2's ends 1 ms past it, user 3's ends well before.
    Pins Spark's append-mode session eviction inclusivity against the
    oracle's closed form instead of assuming it."""
    import os
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    from conceptnetwork_spark.streaming.ops import run_session_stream_on_stage

    utc = timezone.utc
    # final max ts M = 12:00:00.000 -> watermark W = M - 2h = 10:00:00.000
    M = datetime(2024, 3, 1, 12, 0, 0, tzinfo=utc)

    def write(path, rows, mtime_off):
        t = pa.table(
            {
                "ts": pa.array(
                    [ts for ts, _, _ in rows], type=pa.timestamp("us", tz="UTC")
                ),
                "user_id": pa.array(
                    [u for _, u, _ in rows], type=pa.int64()
                ),
                "value": pa.array([v for _, _, v in rows], type=pa.float64()),
            }
        )
        pq.write_table(t, path)
        base = os.path.getmtime(path)
        os.utime(path, (base + mtime_off, base + mtime_off))

    stage = str(tmp_path / "tie_chunks")
    os.makedirs(stage)
    # chunk 0 (early events): user 3 ends 08:30 << W; user 1's last event
    # 09:30:00.000 -> end 10:00:00.000 == W exactly; user 2's last event
    # 09:30:00.001 -> end 10:00:00.001 = W + 1 ms
    write(
        os.path.join(stage, "b0.parquet"),
        [
            (datetime(2024, 3, 1, 8, 0, 0, tzinfo=utc), 3, 1.0),
            (datetime(2024, 3, 1, 9, 20, 0, tzinfo=utc), 1, 1.0),
            (datetime(2024, 3, 1, 9, 30, 0, tzinfo=utc), 1, 2.0),
            (datetime(2024, 3, 1, 9, 30, 0, 1000, tzinfo=utc), 2, 4.0),
        ],
        -2,
    )
    # chunk 1: the watermark driver at M (its own session stays open)
    write(
        os.path.join(stage, "b1.parquet"),
        [(M, 99, 8.0)],
        -1,
    )

    res = run_session_stream_on_stage(spark, stage)
    rows = {r.user_id: r for r in res.collect()}
    assert set(rows) == {1, 3}, (
        f"expected users 1 (end == W, inclusive) and 3 (end < W) emitted, "
        f"users 2 (end = W + 1 ms) and 99 (open) withheld; got {sorted(rows)}"
    )
    assert rows[1].n_events == 2 and rows[1].session_end == "2024-03-01 10:00:00"
    assert rows[3].n_events == 1


def test_d26_stream_drift_psi_withholds_unfinalized_days(spark, ddb):
    """The streamed PSI must carry the append-mode contract: days whose
    end has NOT passed the final watermark (max ts - 2h, ms-truncated)
    are withheld. The last event day always fails that bar (its end is
    ~24h past any same-day watermark), so the result must not contain it
    while the unwatermarked batch grid does."""
    from conceptnetwork_spark import registry
    from tests.conftest import SF_ORACLE

    out = registry.queries()["d26_stream_drift_psi"](spark, SF_ORACLE).toPandas()
    all_days = ddb.execute(
        f"SELECT COUNT(DISTINCT date_trunc('day', ts)) "
        f"FROM '{SF_ORACLE}/events.parquet'"
    ).fetchone()[0]
    assert len(out) < all_days, "no day was withheld — watermark not applied"
    last_day = ddb.execute(
        f"SELECT strftime(MAX(date_trunc('day', ts)), '%Y-%m-%d') "
        f"FROM '{SF_ORACLE}/events.parquet'"
    ).fetchone()[0]
    assert last_day not in set(out["day"])
    # PSI is a non-negative divergence by construction
    assert (out["psi"] >= 0).all()
