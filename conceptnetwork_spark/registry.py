"""Declared-query registry: name -> (Spark builder, optional DuckDB oracle).

Every operator the engine claims (SURVEY §2.2) registers here. The driver
contract (``__spark_entry__.py``) is generated from this registry:
``queries()`` returns the builders, ``oracle_sql()`` the ANSI-SQL oracles.

Builders have signature ``(spark, sf_dir) -> DataFrame`` and must:
- end with a total-order ``orderBy`` over a key suffix,
- ``ROUND(x, 4)`` every float column,
- alias every computed column identically to the oracle SQL.

Ops with engine-specific semantics (approx sketches, LSH, streaming) register
with ``oracle=None`` -> the driver records a weaker rows-only check, and the
pytest suite carries the real assertion (tolerance / recall / equivalence).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Declared:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


REGISTRY: dict[str, Declared] = {}


def register(name: str, oracle: str | None = None):
    """Decorator declaring one engine query with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate declared query {name!r}")
        REGISTRY[name] = Declared(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {d.name: d.fn for d in REGISTRY.values()}


def oracles() -> dict[str, str]:
    _load_all()
    return {d.name: d.oracle for d in REGISTRY.values() if d.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers declared queries."""
    global _LOADED
    if _LOADED:
        return
    from conceptnetwork_spark.operators import (  # noqa: F401
        relational,
        subqueries,
        composite2,
        composite3,
        graph,
        sampling,
        scalar,
        udf,
        dedup,
        similarity,
        text,
        multimodal,
        ml,
    )
    from conceptnetwork_spark.streaming import ops, stateful  # noqa: F401

    _LOADED = True
