#!/usr/bin/env python
"""Strict oracle parity for NAMED queries at one or more SF dirs.

Usage:
    python tools/parity_some.py sfdir1[,sfdir2,...] q1 q2 ...

Same comparator as the full crosssf_parity gate (type- and
sign-of-zero-strict cell comparison from tests/oracle_utils), restricted to
the named queries so a single optimization can be re-verified in seconds.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    sf_dirs = sys.argv[1].split(",")
    names = sys.argv[2:]

    import duckdb

    from conceptnetwork_spark import registry
    from conceptnetwork_spark.catalog import TABLES
    from conceptnetwork_spark.session import get_spark
    from tests.oracle_utils import assert_oracle_match

    spark = get_spark(app_name="parity-some")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    failures = 0
    for sf_dir in sf_dirs:
        # staged-fixture oracles resolve their staged paths via this env
        # var AT FETCH TIME — set it BEFORE fetching the oracle SQL for
        # each SF (fetching once up front pins every SF to the first
        # staging and produces phantom mismatches)
        os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
        oracles = registry.oracles()
        ddb = duckdb.connect()
        for t in TABLES:
            ddb.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name in names:
            try:
                assert_oracle_match(
                    qs[name](spark, sf_dir), ddb, oracles[name], name
                )
                print(f"OK   {name} @ {sf_dir}")
            except Exception as ex:
                failures += 1
                print(f"FAIL {name} @ {sf_dir}: {str(ex)[:300]}")
        ddb.close()
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
