"""Dataprep pipeline: the engine form of the reference's Beam job.

Reference (``examples/trainer/networks/preprocess.py:42-70``):

    ReadFromText | FlatMap(parse_example) | Map(network.preprocess)
                 | WriteToTFRecord(gzip, ExampleProtoCoder)

Engine (same shape, natively lazy — the IR is the Catalyst plan):

    spark.read.text | parse/filter select | Network.preprocess | write.parquet

plus the reference's output-reuse caching (``runner.py:62,94-97``: a named
previous run skips re-preprocessing): ``run_dataprep`` keys the output path
by the Network's deterministic R2 name and skips when the output exists.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from conceptnetwork_spark.network import Network


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """S1: newline-delimited text source -> one 'value' column."""
    return spark.read.text(path)


def parse_lines(df: DataFrame, min_fields: int = 2, sep: str = ",") -> DataFrame:
    """P1 (FlatMap parse) semantics pinned by FIXTURES.md A4: skip blank and
    malformed lines, pass the rest through. One->(0|1) flat map expressed
    relationally as a filter (Catalyst-visible, WholeStageCodegen'd)."""
    v = F.trim(F.col("value"))
    return df.where(
        (v != "") & (F.size(F.split(v, sep)) >= min_fields)
    ).select(v.alias("value"))


def run_dataprep(
    spark: SparkSession,
    network: Network,
    input_path: str,
    output_root: str,
    raw_cols: dict[str, str] | None = None,
    force: bool = False,
) -> str:
    """Full dataprep job with R2-named output + skip-if-exists caching.

    Returns the output path. ``raw_cols`` defaults to feeding every concept
    the single 'value' column (the minimal-network shape where each concept
    parses the same raw line, minimal_network.py:25-36).
    """
    out = os.path.join(output_root, str(network))
    if not force and os.path.exists(os.path.join(out, "_SUCCESS")):
        return out  # --dfnetwork reuse: prior run's output is the cache
    lines = parse_lines(read_text(spark, input_path))
    if raw_cols is None:
        raw_cols = {name: "value" for name in network.concepts}
    encoded = network.preprocess(lines, raw_cols)
    network.write(encoded, out)
    return out
