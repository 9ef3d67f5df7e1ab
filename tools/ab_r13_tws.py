#!/usr/bin/env python
"""Interleaved A/B: d25_type_counts_tws with the old containsKey+getValue
MapState access (3 state-server RPCs per (user, type, batch)) vs the new
single-getValue form (2 RPCs). Old processor inlined; new from registry."""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from conceptnetwork_spark import get_spark, registry  # noqa: E402
from conceptnetwork_spark.streaming.stateful import (  # noqa: E402
    _run_tws_update_log,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_type_counts(spark, sf_dir):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    class TypeCountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "counts",
                StructType([StructField("t", StringType())]),
                StructType([StructField("n", LongType())]),
            )

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                for t, d in pdf.groupby("event_type")["event_type"].count().items():
                    cur = (
                        self._counts.getValue((t,))[0]
                        if self._counts.containsKey((t,))
                        else 0
                    )
                    self._counts.updateValue((t,), (cur + int(d),))
            items = sorted((t[0], n[0]) for t, n in self._counts.iterator())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(items),
                    "event_type": [t for t, _ in items],
                    "n_events": [n for _, n in items],
                }
            )

        def close(self) -> None:
            pass

    raw = _run_tws_update_log(
        spark,
        sf_dir,
        TypeCountProcessor(),
        "user_id long, event_type string, n_events long",
        3,
    )
    return (
        raw.groupBy("user_id", "event_type")
        .agg(F.max("n_events").cast("long").alias("n_events"))
        .orderBy("user_id", "event_type")
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(app_name="ab-tws")
    spark.sparkContext.setLogLevel("ERROR")
    new = registry.queries()["d25_type_counts_tws"]
    a = old_type_counts(spark, SF).collect()
    b = new(spark, SF).collect()
    assert a == b, "results differ"
    print(f"results identical ({len(a)} rows)")
    reps = int(os.environ.get("AB_REPS", "4"))
    t_old, t_new = [], []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"tws:old:{i}")
        t0 = time.perf_counter(); noop(old_type_counts(spark, SF)); t_old.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(f"tws:new:{i}")
        t0 = time.perf_counter(); noop(new(spark, SF)); t_new.append(time.perf_counter() - t0)
    print(f"old min={min(t_old):.3f} med={sorted(t_old)[len(t_old)//2]:.3f} | "
          f"new min={min(t_new):.3f} med={sorted(t_new)[len(t_new)//2]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
