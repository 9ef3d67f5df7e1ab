"""Bucketed-table layout: shuffle-free co-located joins (SURVEY §4).

At 100 TB the dominant cost of a fact-fact equi-join is the shuffle of both
sides. Bucketing fixes the partitioning AT WRITE TIME: both tables are
hash-clustered into the same number of buckets on the join key, so at read
time Spark's physical planner sees matching output partitionings and plans
the sort-merge join with NO Exchange on either side — the shuffle is paid
once when the data lands, then amortized over every subsequent join on that
key. This is the engine's answer to the reference's one-shot materialization
step (the Beam dataprep write, ``examples/trainer/networks/preprocess.py:
61-67``): the dataprep sink is where layout decisions belong.

Local note: bucketed tables must go through the session catalog
(``saveAsTable`` — bucket metadata lives in the metastore, not the files),
with an explicit ``path`` option so data lands under the caller's directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    path: str,
    n_buckets: int = 8,
) -> None:
    """Materialize ``df`` hash-clustered (and sorted) on ``key`` into
    ``n_buckets`` buckets. Pay the shuffle here, once."""
    (
        df.repartition(n_buckets, key)
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket spec (metastore-backed read —
    a plain ``spark.read.parquet`` on the same files would lose the layout
    and reintroduce the shuffle)."""
    return spark.table(table)


def cocluster_join(
    spark: SparkSession, left: str, right: str, key: str, force_merge: bool = False
) -> DataFrame:
    """Join two same-bucketed tables on their cluster key with no shuffle:
    matching bucket partitionings satisfy the join's distribution
    requirement, so the plan has no shuffle Exchange on either input
    (asserted in tests). ``force_merge`` pins the sort-merge strategy —
    at real fact-fact scale neither side broadcasts and SMJ over aligned
    buckets is the plan; locally the planner may broadcast the small side
    instead (also shuffle-free)."""
    l, r = read_bucketed(spark, left), read_bucketed(spark, right)
    if force_merge:
        l = l.hint("merge")
    return l.join(r, key)
