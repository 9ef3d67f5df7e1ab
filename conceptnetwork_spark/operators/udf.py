"""Python UDF surface: pandas scalar UDF, grouped-map, UDTF-shaped one→many.

SURVEY §2.2 D22-D24, faithful to the reference's three Python-code-per-record
shapes: ``beam.Map(network.preprocess)`` scalar encode (P2,
``examples/trainer/networks/preprocess.py:57-58``), per-concept
feature_engineering (P9/P10, ``conceptnetwork/concept.py:48-51``), and
``beam.FlatMap(parse_example)`` one→many (P1, ``preprocess.py:54-55``).

Engine stance: UDFs are the *slow path* — every crossing here is
Arrow-batched (pandas_udf / applyInPandas / mapInPandas), never row-at-a-time
Python. Rounding happens JVM-side AFTER the UDF so Spark's HALF_UP matches
the oracle (pandas .round is banker's rounding — a real cross-engine trap).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType

from conceptnetwork_spark.catalog import Catalog
from conceptnetwork_spark.registry import register


# --------------------------------------------------------------------------
# D22 — pandas scalar UDF (must hash-match the relational D2 form)
# --------------------------------------------------------------------------
@pandas_udf(IntegerType())
def _first_char_class(names: pd.Series) -> pd.Series:
    """Vectorized re-expression of D2's CASE: 'c'-initial -> 0 else 1."""
    return (names.str.slice(0, 1).str.lower() != "c").astype("int32")


@register(
    "d22_pandas_udf",
    oracle="""
    SELECT c_custkey,
           CASE WHEN lower(substr(c_name, 1, 1)) = 'c' THEN 0 ELSE 1 END AS g
    FROM customer ORDER BY c_custkey
    """,
)
def d22_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as d02_case_parse but through an Arrow-batched pandas
    UDF — pins the UDF data path (types, nulls, batching) to the relational
    answer."""
    c = Catalog(spark, sf_dir).customer
    return c.select(
        "c_custkey", _first_char_class(F.col("c_name")).alias("g")
    ).orderBy("c_custkey")


# --------------------------------------------------------------------------
# D23 — grouped-map (applyInPandas) / UDAF surface
# --------------------------------------------------------------------------
def _mean_center(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf["centered_raw"] = pdf["l_quantity"] - pdf["l_quantity"].mean()
    return pdf[["l_orderkey", "l_linenumber", "l_returnflag", "centered_raw"]]


@register(
    "d23_grouped_map",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           ROUND(l_quantity - AVG(l_quantity) OVER (PARTITION BY l_returnflag), 4)
             AS centered
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
)
def d23_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mean-centering via applyInPandas; oracle is the equivalent
    window SQL.

    Scale note: l_returnflag has ~3 distinct values, so the grouped-map form
    concentrates data on 3 tasks — fine for the API-surface check, but the
    *scalable* form of this computation is the broadcast-mean join
    (`mean_center_scalable`), which keeps the row stream fully parallel.
    """
    li = Catalog(spark, sf_dir).lineitem.select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    out = li.groupBy("l_returnflag").applyInPandas(
        _mean_center,
        schema="l_orderkey long, l_linenumber int, l_returnflag string, centered_raw double",
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round("centered_raw", 4).alias("centered"),
    ).orderBy("l_orderkey", "l_linenumber")


def mean_center_scalable(df: DataFrame, key: str, value: str) -> DataFrame:
    """100 TB-safe mean-centering: tiny per-key mean agg broadcast back onto
    the stream — no low-cardinality grouped shuffle of the full data."""
    means = df.groupBy(key).agg(F.avg(value).alias("__mean"))
    return df.join(F.broadcast(means), key).withColumn(
        "centered_raw", F.col(value) - F.col("__mean")
    ).drop("__mean")


# --------------------------------------------------------------------------
# D24 — UDTF surface (one row -> many)
# --------------------------------------------------------------------------
@register(
    "d24_explode_words",
    oracle="""
    SELECT p_partkey, t.word AS word
    FROM part, unnest(string_split(p_name, ' ')) AS t(word)
    ORDER BY p_partkey, word
    """,
)
def d24_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One->many via explode(split(...)) — JVM-native generator, the fast
    path for the reference's FlatMap parse shape (P1)."""
    p = Catalog(spark, sf_dir).part
    return (
        p.select("p_partkey", F.explode(F.split("p_name", " ")).alias("word"))
        .orderBy("p_partkey", "word")
    )


def flatmap_parse(df: DataFrame, schema: str, parse_iter) -> DataFrame:
    """General one->many Python escape hatch: ``mapInPandas`` with an
    iterator-of-batches UDF (Arrow both ways). ``parse_iter`` maps a
    pd.DataFrame batch to an iterator of output pd.DataFrames. This is the
    faithful P1 (`beam.FlatMap`) surface for non-relational parsers."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield from parse_iter(pdf)

    return df.mapInPandas(gen, schema=schema)
