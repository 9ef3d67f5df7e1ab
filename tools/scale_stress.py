#!/usr/bin/env python
"""Scale-stress the heaviest shufflers beyond sf0.1 (VERDICT r8 ask #8).

Builds a FACTOR-x blow-up of the sf0.1 tables (default 10x: ~6M-row
lineitem, 1.5M orders, 1M events, 50k documents) with join-consistent key
offsets per copy — l_orderkey/o_orderkey shift together so every lineitem
still matches exactly one order; dim tables (region nation customer
supplier part, embeddings) stay as-is so FK references remain valid — then
runs the top-10 shufflers from SHUFFLE_r09.json against it and reads the
per-query shuffle-write / spill deltas from the status REST API (same
mechanics as tools/shuffle_audit.py).

Gates (the 100-TB posture check the sf0.1 audit can't give):
  - ZERO disk spill on every query (partitions must still fit in memory
    at 10x), and
  - <2 GB shuffled per query (sub-linear or linear growth only; a
    super-linear jump means a lost broadcast or quadratic fanout that
    sf0.1 was too small to expose).

The staged dir is idempotent per (source fingerprint, factor) under /tmp.
Prints one JSON line; exits nonzero on any gate violation. Run via
`pytest -m slow tests/test_scale_stress.py` or directly.

`--factor N` (default 10) stages an N-x blow-up instead; the shuffle cap
scales LINEARLY with the factor (2 GB at 10x, 20 GB at 100x) so the gate
stays "linear growth or better" at every tier, and the zero-spill gate is
unchanged — partitions must still fit in executor memory at the stressed
scale (raise SPARK_GRAFT_DRIVER_MEM for tiers beyond what a 24 GB local
heap honestly models; a 100x run is ~sf10 = 60M-row lineitem on one node).
`--queries a,b,c` restricts the run (large tiers re-run the heaviest
shapes, not all ten).

`--skew P` stages a hot-key variant: ~P% of the blown-up events rows are
re-pointed at ONE user_id (event_id stays unique), the power-law shape a
uniform blow-up can't produce. Probe the user_id-exchange queries against
it: partial aggregation and distinct-first designs absorb the hot key
map-side; AQE splits skewed join partitions; per-key WINDOWS are the
honest worst case (a window over one key cannot be split — the hot task
is the straggler bound, and the gate is completion without failure).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SHUFFLE_CAP_BYTES = 2 * 1024**3
FACTOR = 10
KEY_OFF = 1 << 24  # > any sf0.1 key, divisible by 2^16 so a%m, b%m domains hold

# top-10 by shuffle_write in SHUFFLE_r10.json (sf0.1, full 376-query audit,
# noop-sink materialization — the count()-era list missed the pure-window
# shufflers because count() pruned their Window operators away entirely)
TOP10 = [
    "d33_als_recs",
    "d09_q21_waiting",
    "d23_grouped_map",
    "d09_percentiles",
    "d13_rank_dense",
    "d31_containment",
    "d23_mean_center",
    "d14_window_running",
    "d16_sql_scripting",
    "d26_stream_session_window",
]

BLOWUP_KEYS = {
    # table -> columns shifted by copy*KEY_OFF (join-consistent: lineitem
    # and orders shift the SAME orderkey so each copy is a closed join
    # subgraph; custkey/partkey/suppkey stay in the un-blown dim domain)
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}
COPY_TABLES = ["region", "nation", "customer", "supplier", "part", "embeddings"]


HOT_USER = KEY_OFF * 1024 + 7  # outside every shifted user_id domain


def build_scaled_dir(
    spark, src_sf: str, factor: int = FACTOR, skew_pct: int = 0
) -> str:
    from pyspark.sql import functions as F

    from conceptnetwork_spark.sources.formats import _sf_fingerprint

    tag = f"skew{skew_pct}_" if skew_pct else ""
    out = os.path.join(
        "/tmp", f"cn_spark_scale{factor}x_{tag}{_sf_fingerprint(src_sf)}"
    )
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    for t, keys in BLOWUP_KEYS.items():
        df = spark.read.parquet(os.path.join(src_sf, f"{t}.parquet"))
        df = df.withColumn(
            "_copy", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
        )
        for k in keys:
            # long arithmetic: copy*KEY_OFF overflows int32 past factor 127
            df = df.withColumn(
                k,
                F.col(k).cast("long")
                + F.col("_copy").cast("long") * F.lit(KEY_OFF).cast("long"),
            )
        if skew_pct and t == "events":
            # Hot-key variant: ~skew_pct% of the blown-up event rows land
            # on ONE user (deterministic hash pick over the non-original
            # copies; event_id stays unique). At factor 100 / skew 20 the
            # hot user holds ~2M of 10M events vs a ~670-row median — the
            # power-law reality the skew probes exercise.
            df = df.withColumn(
                "user_id",
                F.when(
                    (F.col("_copy") > 0)
                    & (
                        F.pmod(F.xxhash64("event_id", "_copy"), F.lit(100))
                        < skew_pct
                    ),
                    F.lit(HOT_USER).cast("long"),
                ).otherwise(F.col("user_id")),
            )
        df.drop("_copy").write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    import shutil

    for t in COPY_TABLES:
        src = os.path.join(src_sf, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copyfile(src, dst)
    with open(marker, "w") as fh:
        fh.write("ok")
    return out


def _stage_totals(
    ui_url: str, app_id: str, quiesce: bool = False
) -> dict[str, int]:
    """Sum shuffle/spill bytes over all stages. With ``quiesce``, poll
    until two consecutive reads agree (the status listener lags job
    completion — without this, a heavy stage's bytes land in the NEXT
    query's delta window)."""
    if quiesce:
        prev = _stage_totals(ui_url, app_id)
        for _ in range(20):
            time.sleep(0.5)
            cur = _stage_totals(ui_url, app_id)
            if cur == prev:
                return cur
            prev = cur
        return prev
    url = f"{ui_url}/api/v1/applications/{app_id}/stages"
    data = json.loads(urllib.request.urlopen(url, timeout=10).read())
    out = {"shuffle_write": 0, "mem_spill": 0, "disk_spill": 0}
    for s in data:
        out["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        out["mem_spill"] += s.get("memoryBytesSpilled", 0)
        out["disk_spill"] += s.get("diskBytesSpilled", 0)
    return out


def main() -> None:
    os.environ["SPARK_GRAFT_UI"] = "1"
    argv = sys.argv[1:]
    factor = FACTOR
    names = list(TOP10)
    skew_pct = 0
    if "--factor" in argv:
        factor = int(argv[argv.index("--factor") + 1])
    if "--queries" in argv:
        names = argv[argv.index("--queries") + 1].split(",")
    if "--skew" in argv:
        skew_pct = int(argv[argv.index("--skew") + 1])
    pos = [
        a
        for i, a in enumerate(argv)
        if not a.startswith("--")
        and (i == 0 or argv[i - 1] not in ("--factor", "--queries", "--skew"))
    ]
    src_sf = pos[0] if pos else "/root/testdata/sf0.1"
    cap_bytes = SHUFFLE_CAP_BYTES * factor // FACTOR

    from conceptnetwork_spark import registry
    from conceptnetwork_spark.session import get_spark

    # Shuffle partition count must scale WITH the data (the knob a real
    # cluster turns: partitions sized so each fits executor memory at the
    # target SF). The 10x gate keeps the session default (32) — that IS
    # the posture being tested at that tier; beyond 10x the data outgrows
    # a fixed-32 layout by construction, so partitions grow linearly,
    # keeping per-partition bytes constant across tiers. AQE still
    # coalesces the small post-shuffle ends.
    # capped at 320: per-reducer bytes stay <=~100 MB through 1000x on this
    # corpus (q21's 22 GB / 320 = 70 MB), and the bypass writer's
    # one-open-file-per-reducer-per-task cost stays bounded; beyond 1000x
    # raise the cap with the data
    shuffle_parts = (
        None if factor <= FACTOR else min(32 * factor // FACTOR, 320)
    )
    if shuffle_parts and shuffle_parts > 200:
        # Above spark.shuffle.sort.bypassMergeThreshold (200) the
        # combine-less shuffles (joins, distinct exchanges) switch from
        # the bypass-merge writer to the sort-based writer, whose normal
        # record buffering is REPORTED as memory/disk spill — measured
        # here at 100x: q21 "spilled" 489 MB at 320 reducers yet 0 at 32,
        # with identical operators. Raising the threshold to the reducer
        # count keeps the writer choice constant across tiers so the
        # zero-spill gate keeps meaning OPERATOR memory pressure (agg
        # hash tables, join sorts), not shuffle-writer mechanics. This is
        # a core conf (JVM-launch only), hence the submit-args route.
        os.environ["PYSPARK_SUBMIT_ARGS"] = (
            f"--conf spark.shuffle.sort.bypassMergeThreshold={shuffle_parts}"
            " pyspark-shell"
        )
    spark = get_spark(app_name="scale-stress", shuffle_partitions=shuffle_parts)
    spark.sparkContext.setLogLevel("ERROR")
    ui_url = spark.sparkContext.uiWebUrl
    if not ui_url:
        print("FATAL: Spark UI disabled", file=sys.stderr)
        sys.exit(2)
    app_id = spark.sparkContext.applicationId

    sf_dir = build_scaled_dir(spark, src_sf, factor, skew_pct)
    qs = registry.queries()
    per: dict[str, dict] = {}
    failures: list[str] = []
    before = _stage_totals(ui_url, app_id, quiesce=True)
    for name in names:
        t0 = time.perf_counter()
        try:
            # noop sink, not count() — count() lets Catalyst prune unused
            # outputs (windows feeding pruned columns vanish entirely);
            # the noop writer pays for the full output schema (see
            # tools/shuffle_audit.py for the measured case)
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as ex:
            failures.append(name)
            print(f"# FAIL {name}: {str(ex)[:200]}", file=sys.stderr)
            before = _stage_totals(ui_url, app_id, quiesce=True)
            continue
        after = _stage_totals(ui_url, app_id, quiesce=True)
        per[name] = {
            **{k: max(0, after[k] - before[k]) for k in after},
            "sec": round(time.perf_counter() - t0, 2),
        }
        before = after

    over = {
        n: m["shuffle_write"]
        for n, m in per.items()
        if m["shuffle_write"] > cap_bytes
    }
    spilled = {n: m["disk_spill"] for n, m in per.items() if m["disk_spill"]}
    record = {
        "metric": f"scale_stress_{factor}x"
        + (f"_skew{skew_pct}" if skew_pct else ""),
        "factor": factor,
        "skew_pct": skew_pct,
        "cap_bytes": cap_bytes,
        "src_sf": src_sf,
        "failures": failures,
        "over_cap": over,
        "disk_spilled": spilled,
        "per_query": per,
    }
    print(json.dumps(record))
    spark.stop()
    sys.exit(1 if (over or spilled or failures) else 0)


if __name__ == "__main__":
    main()
