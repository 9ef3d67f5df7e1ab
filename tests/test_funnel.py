"""d27_funnel ORDER semantics on crafted rows: a later-stage event that
precedes its gate event must NOT count (the property that distinguishes a
funnel from per-type counts)."""

from pyspark.sql import functions as F

from conceptnetwork_spark.streaming.ops import d27_funnel


def _run(spark, rows, tmp_path):
    """Stage crafted events as a one-table sf dir and run the real query."""
    df = spark.createDataFrame(
        [
            (i, ts, uid, et, 0.0, "{}")
            for i, (uid, et, ts) in enumerate(rows)
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = d27_funnel(spark, str(tmp_path))
    return {r.stage: r.n_users for r in out.collect()}

def test_funnel_order_gates_stages(spark, tmp_path):
    rows = [
        # u1: full ordered journey -> counts at all three stages
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:05:00"),
        (1, "purchase", "2024-01-01 10:10:00"),
        # u2: purchase BEFORE the first view's click -> stage 3 must NOT count
        (2, "purchase", "2024-01-01 09:00:00"),
        (2, "view", "2024-01-01 10:00:00"),
        (2, "click", "2024-01-01 10:05:00"),
        # u3: click before view -> stages 2 and 3 must NOT count
        (3, "click", "2024-01-01 09:00:00"),
        (3, "view", "2024-01-01 10:00:00"),
        # u4: never viewed -> no stage counts despite click+purchase
        (4, "click", "2024-01-01 10:00:00"),
        (4, "purchase", "2024-01-01 11:00:00"),
    ]
    got = _run(spark, rows, tmp_path)
    assert got == {"1_view": 3, "2_click": 2, "3_purchase": 1}


def test_funnel_simultaneous_events_count(spark, tmp_path):
    # ts >= gate is inclusive: same-timestamp progression advances the funnel
    rows = [
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:00:00"),
        (1, "purchase", "2024-01-01 10:00:00"),
    ]
    got = _run(spark, rows, tmp_path)
    assert got == {"1_view": 1, "2_click": 1, "3_purchase": 1}
