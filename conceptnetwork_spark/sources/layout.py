"""Partitioned-directory layout: partition pruning for time/key-sliced scans.

The complement of `sources/bucketed.py` in the 100 TB layout story: bucketing
co-locates JOIN keys; directory partitioning prunes SCANS. A 100 TB fact
table laid out as `path/part_col=v/...` lets Spark skip whole directories:

- **static pruning** — a literal predicate on the partition column never
  reads the excluded partitions (it is resolved at planning time, visible
  as `PartitionFilters` on the scan);
- **dynamic partition pruning (DPP)** — when the partition column is a join
  key and the other side carries a selective filter, Spark builds the set
  of surviving keys at runtime and prunes the fact scan with it (visible
  as a `dynamicpruning` subquery in the plan). This is what makes
  star-schema queries touch 1% of a date-partitioned fact.

Rules of thumb encoded here (and asserted in tests):
- partition on LOW-cardinality columns only (date buckets, categories —
  each value is a directory; 10k+ values = small-file death);
- derive the partition column at write time (e.g. `year(o_orderdate)`) and
  keep the source column too, so non-partition queries are unaffected;
- combine with `sortWithinPartitions` on a secondary key so min/max row-group
  stats prune within each directory as well.

Reference anchor: the reference's single materialization point is the Beam
TFRecord sink (`examples/trainer/networks/preprocess.py:61-67`) with no
layout control at all; this module is where the engine's dataprep sink makes
layout decisions instead.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    derive: dict[str, Column] | None = None,
    sort_col: str | None = None,
    max_records_per_file: int = 5_000_000,
) -> None:
    """Materialize `df` under `path` as a Hive-style partitioned directory
    tree. `derive` adds computed partition columns (e.g.
    `{"o_year": F.year("o_orderdate")}`) before the write; `sort_col` sorts
    within each output file so row-group min/max stats stay selective.
    One shuffle (repartition on the partition columns) avoids the
    many-small-files failure mode of per-task partition fan-out."""
    out = df
    for name, expr in (derive or {}).items():
        out = out.withColumn(name, expr)
    out = out.repartition(*[F.col(c) for c in partition_cols])
    if sort_col is not None:
        out = out.sortWithinPartitions(*partition_cols, sort_col)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned tree; partition columns come back as real columns
    and predicates on them prune directories before any file is opened."""
    return spark.read.parquet(path)
