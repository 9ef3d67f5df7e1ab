"""End-to-end runner CLI (reference R4, ``examples/trainer/runner.py``).

Reference phases: test -> git commit -> Beam dataprep (Direct|Dataflow) ->
train (local|CloudML), with ``--dfnetwork`` output reuse. Engine phases:
pytest -> Spark dataprep (cached by R2 name) -> MLlib fit. The git and
cloud-submit phases are environment concerns, intentionally out of engine
scope; process boundaries collapse into one SparkSession.

Usage:
    python -m conceptnetwork_spark.runner --input lines.txt --output /tmp/run
        [--notest] [--force-dataprep] [--train]
"""

from __future__ import annotations

import argparse
import subprocess
import sys

from conceptnetwork_spark.session import get_spark
from conceptnetwork_spark.sources.dataprep import run_dataprep


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="newline-delimited raw input")
    ap.add_argument("--output", required=True, help="output root for dataprep runs")
    ap.add_argument("--notest", action="store_true", help="skip the pytest phase")
    ap.add_argument("--force-dataprep", action="store_true", help="ignore cached output")
    ap.add_argument("--train", action="store_true", help="fit the OLS demo pipeline")
    args = ap.parse_args(argv)

    if not args.notest:  # phase 1: test (runner.py:41-47)
        rc = subprocess.call([sys.executable, "-m", "pytest", "tests/", "-x", "-q"])
        if rc != 0:
            return rc

    spark = get_spark(app_name="conceptnetwork-runner")

    # phase 2: dataprep with R2-named cached output (runner.py:62-97)
    from tests.test_concept_network import MinimalConcept
    from conceptnetwork_spark.network import Network

    net = Network().add(MinimalConcept("origin")).add(MinimalConcept("tgt", target=True))
    out = run_dataprep(
        spark, net, args.input, args.output, force=args.force_dataprep
    )
    print(f"dataprep output: {out}")

    # phase 3: train (runner.py:98-114) — MLlib pipeline on the encoded data
    if args.train:
        from pyspark.sql import functions as F

        from conceptnetwork_spark.operators.ml import fit_transform_evaluate

        df = net.read(spark, out).select(
            F.col("origin.candidate_id").alias("x"),
            F.col("tgt.candidate_id").alias("y"),
        )
        _, _, mse = fit_transform_evaluate(df, ["x"], "y")
        print(f"train mse: {mse}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
