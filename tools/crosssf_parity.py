#!/usr/bin/env python
"""Standing cross-SF parity gate (VERDICT r4 item 9): run the FULL strict
oracle comparison (type-strict per-cell, the driver-hash-equivalent gate
from tests/oracle_utils) at a scale factor the pytest suite does NOT use,
so sf-dependent luck (thresholds, fixture staging, closed-form streaming
watermark oracles that happen to hold at one sf) can't recur.

Usage (from the repo root, once per round; record the line in BASELINE.md):
    python tools/crosssf_parity.py [sf_dir]      # default /root/testdata/sf0.001
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # staged-fixture queries (csv/json/text/binary sources, schema
    # evolution) embed absolute staged paths in their lazy oracle SQL;
    # both sides must stage from THE SAME sf dir
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import duckdb

    from conceptnetwork_spark import registry
    from conceptnetwork_spark.catalog import TABLES
    from conceptnetwork_spark.session import get_spark
    from tests.oracle_utils import assert_oracle_match

    spark = get_spark(app_name="crosssf-parity")
    spark.sparkContext.setLogLevel("ERROR")
    ddb = duckdb.connect()
    for t in TABLES:
        ddb.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = registry.queries(), registry.oracles()
    t0 = time.perf_counter()
    failures: list[tuple[str, str]] = []
    for name in sorted(oracles):
        try:
            assert_oracle_match(qs[name](spark, sf_dir), ddb, oracles[name], name)
        except Exception as ex:  # record every failure, keep sweeping
            failures.append((name, str(ex)[:200]))
            print(f"FAIL {name}: {ex}", file=sys.stderr)
    elapsed = round(time.perf_counter() - t0, 1)
    print(
        f"cross-sf parity @ {sf_dir}: "
        f"{len(oracles) - len(failures)}/{len(oracles)} oracle queries match, "
        f"{len(failures)} failures, {elapsed} s"
    )
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
