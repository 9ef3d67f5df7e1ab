"""Reproducible-sampling tests: engine-portable hash bucketing, the
leakage-safety (stable membership) property, and rough uniformity."""

import pyspark.sql.functions as F

from conceptnetwork_spark.operators.sampling import (
    assign_split,
    hash_bucket,
    hash_sample,
)


def test_hash_bucket_matches_python_md5(spark):
    """The bucket must be a pure function of the key's md5 — cross-checked
    against hashlib so ANY engine (or offline job) can re-derive it."""
    import hashlib

    df = spark.range(500).select(F.col("id"))
    got = {r.id: r.b for r in df.select("id", hash_bucket(F.col("id")).alias("b")).collect()}
    for k, b in got.items():
        expected = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 100
        assert b == expected, k


def test_split_membership_stable_under_growth(spark):
    """Adding new rows must never move an existing row across splits —
    the property that prevents train/test leakage on re-ingestion."""
    small = assign_split(spark.range(200), "id")
    big = assign_split(spark.range(1000), "id")
    s = {r.id: r.split for r in small.collect()}
    b = {r.id: r.split for r in big.collect()}
    assert all(b[k] == v for k, v in s.items())


def test_split_fractions_roughly_nominal(spark):
    """md5 buckets are uniform: 80/10/10 split of 20k keys lands within a
    few percent of nominal."""
    counts = {
        r.split: r.n
        for r in assign_split(spark.range(20_000), "id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert abs(counts["train"] / 20_000 - 0.80) < 0.02
    assert abs(counts["val"] / 20_000 - 0.10) < 0.01
    assert abs(counts["test"] / 20_000 - 0.10) < 0.01


def test_hash_sample_is_subset_and_idempotent(spark):
    """Sampling twice gives the identical row set (no per-partition seed
    dependence), and a 10% sample is a subset of a 20% sample — monotone
    fractions, the property seeded sampling lacks."""
    df = spark.range(5_000)
    s10a = {r.id for r in hash_sample(df, "id", 10).collect()}
    s10b = {r.id for r in hash_sample(df.repartition(7), "id", 10).collect()}
    s20 = {r.id for r in hash_sample(df, "id", 20).collect()}
    assert s10a == s10b
    assert s10a <= s20
