"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All declared queries live in ``conceptnetwork_spark.registry``; operator
modules self-register with their oracle SQL next to the implementation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from conceptnetwork_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: the end-to-end LLM dataprep
    composite (D34) — quality gate → lang-ID → exact dedup → token count →
    leakage-safe split, one fused Catalyst plan."""
    from conceptnetwork_spark.operators.pipeline import d34_llm_dataprep

    return d34_llm_dataprep(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every deterministic declared query."""
    return registry.oracles()
